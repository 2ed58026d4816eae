"""Banded (tile x window) sparse-conv compute: MXU one-hot gathers.

The coordinate engine keeps every voxel set SORTED BY PACKED KEY
(sparse/packing.py).  Consequence: for any fixed kernel offset d, the gather
indices kmap[d, :] are produced by looking up `key(out_voxel) + delta(d)` in the
sorted table — a MONOTONE map up to field-carry exceptions.  Over a tile of
`tile` consecutive output voxels, the source rows therefore live in a narrow
window of the feature table.

That turns the HBM row-gather (measured ~7 ns/row on v5e, issue-bound — the
governing constraint per PERFORMANCE.md) into a dense one-hot matmul on the MXU:

    out[c] += onehot(kmap[k, c] - base[tile(c)]) @ feats_W_k[base : base + win]

measured at ~3.4 ns/row-equivalent INCLUDING the accumulate over all K offsets
(78 TFLOP/s sustained).  This is the fused gather+matmul kernel ROADMAP item 1
called for, written in Pallas with the one-hot built in-register (an XLA
one-hot formulation materializes GBs of one-hot traffic and measured no faster
than the gather path; Pallas take_along_axis fails to lower on this toolchain
and scalar-loop Pallas gathers measured 50x slower).

Correctness is unconditional: the banded path is used only when every
(tile, offset) band fits its window (`ok` reduced over the whole batch, one
lax.cond per conv — under vmap a cond would decay to running BOTH paths).
Degenerate inputs fall back to the plain take_along_axis path, which is also
the reference implementation the tests golden-check against.

Replaces: MinkowskiEngine's CUDA gather/GEMM/scatter convolution kernels
(reference models/minkgl.py:39-60,100-107 delegate to ME).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

DEFAULT_SUB = 384
DEFAULT_TILE = 128


def _plain_gather_conv(feats: jnp.ndarray, kmap: jnp.ndarray, kernel: jnp.ndarray
                       ) -> jnp.ndarray:
    """Reference path: out[o] = sum_k feats[kmap[k,o]] @ W[k] via row gathers.

    feats (B, C_in, F_in), kmap (B, K, C_out) sentinel C_in, kernel (K, Fi, Fo).
    """
    b, c_in, f_in = feats.shape
    feats_p = jnp.concatenate([feats, jnp.zeros((b, 1, f_in), feats.dtype)], axis=1)
    c_out = kmap.shape[-1]
    f_out = kernel.shape[-1]

    def step(acc, xs):
        idx_k, w_k = xs
        g = jnp.take_along_axis(feats_p, idx_k[..., None], axis=1)
        return acc + jnp.einsum("bcf,fo->bco", g, w_k,
                                preferred_element_type=jnp.float32), None

    acc0 = jnp.zeros((b, c_out, f_out), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (jnp.swapaxes(kmap, 0, 1), kernel))
    return acc


def band_layout_union(kmap: jnp.ndarray, c_in: int, sub: int, tile: int):
    """Band layout for the VMEM-resident conv kernel: per (batch, offset, tile)
    an 8-aligned absolute sub-window start into the feature table, such that
    all of that tile's gathers for that offset land inside [start, start+sub).
    The kernel's one-hot compare + matmul then run over `sub` columns — the
    VPU one-hot build is the inner-loop cost and scales with the compare width.

    Returns (starts (B, T, K) int32 multiples of 8, rel (B, T, K, tile) int32
    in [0, sub] with sub marking invalid, ok () bool — True iff every band
    fits; callers lax.cond to the plain gather path otherwise).
    """
    b, k, c_out = kmap.shape
    assert c_out % tile == 0, (c_out, tile)
    t = c_out // tile
    km = kmap.reshape(b, k, t, tile)
    valid = km < c_in
    big = jnp.int32(2**30)
    lo_k = jnp.min(jnp.where(valid, km, big), axis=-1)      # (B, K, T)
    hi_k = jnp.max(jnp.where(valid, km, -1), axis=-1)       # (B, K, T)
    any_k = jnp.any(valid, axis=-1)
    # per-offset ABSOLUTE sub-window start, 16-aligned (bf16 sublane
    # granularity), within [0, c_in - sub]
    start = jnp.clip((jnp.where(any_k, lo_k, 0) // 16) * 16, 0, max(c_in - sub, 0))
    fits_sub = ~any_k | (hi_k - start < sub)
    ok = jnp.all(fits_sub)
    rel = jnp.where(valid, km - start[..., None], sub)
    rel = jnp.transpose(rel, (0, 2, 1, 3)).reshape(b, t, k, tile).astype(jnp.int32)
    starts = jnp.transpose(start, (0, 2, 1)).astype(jnp.int32)  # (B, T, K)
    return starts, rel, ok


def _pallas_banded_conv(feats: jnp.ndarray, starts: jnp.ndarray,
                        rel: jnp.ndarray, kernel: jnp.ndarray,
                        sub: int, tile: int, interpret: bool = False
                        ) -> jnp.ndarray:
    """Pallas kernel: grid over (B, T); the whole per-cloud feature table rides
    as a VMEM input block (every EgoNN level table is <= 5 MB — no manual DMA,
    Mosaic pipelines the block fetch), and each offset's gather is an
    in-register one-hot matmul over an (8-aligned) sub-window slice of it.

    The one-hot (tile, sub) never touches HBM — built from an iota compare and
    fed straight to the MXU, which is what makes this faster than both the XLA
    row-gather (issue-bound ~7 ns/row) and an XLA one-hot formulation (which
    materializes GBs of one-hot traffic).

    feats (B, C_in, 128) bf16; starts (B, T, K) int32 (multiples of 16);
    rel (B, T, K, tile) int32 in [0, sub]; kernel (K, 128, F_out).
    Returns (B, T, tile, F_out) f32.

    Toolchain notes (bisected on this Mosaic build): DMA into a scratch with
    lane dim < 128 crashes the remote compiler, as does any bf16 DMA — avoided
    entirely here by keeping feats f32 and casting sub-window slices in-kernel;
    per-offset metadata rides in scalar-prefetch (an SMEM tensor input with a
    non-tileable block shape is rejected).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, k_vol, _ = rel.shape
    c_in = feats.shape[1]
    f_out = kernel.shape[-1]
    assert feats.shape[-1] == 128 and kernel.shape[1] == 128
    assert feats.dtype == jnp.bfloat16  # halves the VMEM block (the level-0
    # table is 8 MB in f32 — over the 16 MB scoped-vmem budget with headroom)

    def body(starts_ref, rel_ref, feats_ref, kern_ref, out_ref):
        bi = pl.program_id(0)
        ti = pl.program_id(1)
        iota = jax.lax.broadcasted_iota(jnp.int32, (tile, sub), 1)

        def k_step(k, acc):
            dk = pl.multiple_of(starts_ref[bi, ti, k], 16)
            sub_w = feats_ref[0, pl.ds(dk, sub), :]
            rel_k = rel_ref[0, 0, k, :]
            oh = (rel_k[:, None] == iota).astype(jnp.bfloat16)
            g = jnp.dot(oh, sub_w, preferred_element_type=jnp.float32)
            return acc + jnp.dot(g.astype(jnp.bfloat16),
                                 kern_ref[k].astype(jnp.bfloat16),
                                 preferred_element_type=jnp.float32)

        out_ref[0, 0] = jax.lax.fori_loop(
            0, k_vol, k_step, jnp.zeros((tile, f_out), jnp.float32)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # starts
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, 1, k_vol, tile), lambda bi, ti, *_: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_in, 128), lambda bi, ti, *_: (bi, 0, 0),
                         memory_space=pltpu.VMEM),  # whole per-cloud table
            pl.BlockSpec(memory_space=pltpu.VMEM),  # kernel weights
        ],
        out_specs=pl.BlockSpec((1, 1, tile, f_out), lambda bi, ti, *_: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, tile, f_out), jnp.float32),
        interpret=interpret,
    )(starts, rel, feats, kernel)


def banded_conv_pallas(feats: jnp.ndarray, kmap: jnp.ndarray,
                       kernel: jnp.ndarray, sub: int = DEFAULT_SUB,
                       tile: int = DEFAULT_TILE,
                       interpret: bool = False) -> jnp.ndarray:
    """out[b, c] = sum_k feats[b, kmap[b, k, c]] @ kernel[k] via the Pallas
    banded kernel, with an exact whole-batch fallback (lax.cond).

    feats (B, C_in, F_in) any float dtype; kmap (B, K, C_out) sentinel C_in;
    kernel (K, F_in, F_out).  Returns (B, C_out, F_out) float32.
    """
    b, c_in, f_in = feats.shape
    c_out = kmap.shape[-1]
    f_out = kernel.shape[-1]
    if c_out % tile != 0 or f_in > 128 or c_in % 16 != 0:
        return _plain_gather_conv(feats, kmap, kernel)
    sub = min(sub, c_in)  # small tables: the sub-window IS the table
    t = c_out // tile
    starts, rel, ok = band_layout_union(kmap, c_in, sub, tile)
    f_pad = 128 - f_in
    feats_p = feats.astype(jnp.bfloat16)
    if f_pad:
        feats_p = jnp.pad(feats_p, ((0, 0), (0, 0), (0, f_pad)))
    kernel_p = jnp.pad(kernel, ((0, 0), (0, f_pad), (0, 0))) if f_pad else kernel

    def fast():
        out = _pallas_banded_conv(feats_p, starts, rel, kernel_p, sub, tile,
                                  interpret=interpret)
        return out.reshape(b, c_out, f_out)

    return jax.lax.cond(ok, fast, lambda: _plain_gather_conv(feats, kmap, kernel))
