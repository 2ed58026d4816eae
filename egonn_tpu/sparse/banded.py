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

Band-overflow policy: out-of-window neighbors are treated as absent (the
drop-and-report policy of voxel capacity overflow — graceful, never garbage);
`ok` band-fit flags are computed for every call and asserted on real pyramids
by the on-chip test tier.  EGONN_BANDED_FALLBACK=1 wraps every call in a
lax.cond exact fallback instead (measured ~6 ms/batch of pure cond overhead),
and EGONN_BANDED=0 selects the exact gather engine outright — which is also
the reference implementation the tests golden-check against.

Replaces: MinkowskiEngine's CUDA gather/GEMM/scatter convolution kernels
(reference models/minkgl.py:39-60,100-107 delegate to ME).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Band-overflow policy.  Each banded kernel degrades GRACEFULLY when a band
# exceeds its window: out-of-window neighbors are simply treated as absent
# (one-hot rows match nothing; lookups return the sentinel) — the same
# drop-and-report policy as voxel capacity overflow, never garbage.  The
# lax.cond exact-fallback wrappers guarantee bit-exactness instead, but cost
# ~6 ms per batch in cond overhead alone (~30 conds x ~0.2 ms, measured —
# bench 243 vs 205 clouds/s).  Default is therefore fallback OFF; the `ok`
# band-fit flags remain available (and are asserted on real pyramids by
# tests/test_banded_tpu.py), EGONN_BANDED_FALLBACK=1 restores the lax.cond
# wrappers, and EGONN_BANDED=0 selects the exact gather engine outright.
FALLBACK = os.environ.get("EGONN_BANDED_FALLBACK", "0") == "1"
# (Channel-packing of narrow-channel conv tables was built and A/B'd on chip
# in three variants — lane-roll, pre-shifted weight-select, concatenated-lane
# matmul — and ALL lost to the unpacked kernel: 207/339/198 vs 430 clouds/s
# (rounds 2-4).  The alignment work costs more than the smaller one-hot build
# saves at these channel widths; the machinery was deleted after round 4.)

DEFAULT_SUB = 384      # compare width of the lookup/zrun kernels
DEFAULT_STRIDE = 128   # window-table row stride; sub must cover band + stride
DEFAULT_TILE = 128

# One-hot build micro-variant for the conv kernel (the dominant VPU cost).
# EGONN_OH_CENTER: the CENTER offset of an odd self kernel always gathers the
# voxel itself (kmap_self[center, c] == c), so its gather is a masked slice of
# the tile's own rows — no one-hot, no first MXU dot.  Strictly less work;
# round-5 on-chip A/B measured never-slower (legacy workload 410.2/412.6 vs
# base 389.3-411.4; lidar 459.0 vs 457.9) — default ON.  Bit-exactness vs
# the one-hot form is pinned by tests/test_banded.py.
# (A bf16 one-hot COMPARE was tried round 5 and is impossible on this target:
# Mosaic rejects arith.cmpf on the packed vector<8x128x2xbf16> — "Target does
# not support this comparison" — i.e. the v5e VPU has no native 16-bit vector
# compare, so the one-hot build is irreducibly 32-bit-lane bound.)
OH_CENTER = os.environ.get("EGONN_OH_CENTER", "1") == "1"

# ---------------------------------------------------------------------------
# Band-width calibration (sparse/calibrate.py).  The hardcoded widths above
# were sized from synthetic LiDAR probes; denser real-world clouds can exceed
# them, falling into drop-and-report.  A calibration pass measures the actual
# required width per kernel on a data sample and overrides the defaults here.
# Keys: "conv:{c_in}:{c_out}" (banded conv sub), "zrun:{c}:{kz}" (zrun compare
# width), "lookup:{c}" (banded_lookup compare width).  Values are final
# compare widths (already rounded/margined by the calibrator).  Loaded from
# EGONN_BAND_CALIB=<path.json> or set programmatically.
_CALIBRATION: dict = {}


def set_band_calibration(table) -> None:
    """Install a calibration table (e.g. from sparse/calibrate.py); None/{}
    clears it back to the hardcoded defaults."""
    global _CALIBRATION
    _CALIBRATION = {str(k): int(v) for k, v in (table or {}).items()}


def get_band_calibration() -> dict:
    return dict(_CALIBRATION)


def _calibrated(key: str, default: int) -> int:
    return _CALIBRATION.get(key, default)


_calib_path = os.environ.get("EGONN_BAND_CALIB")
if _calib_path and os.path.exists(_calib_path):
    import json as _json

    with open(_calib_path) as _f:
        set_band_calibration(_json.load(_f))
    del _f
del _calib_path


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


def conv_sub_width(c_in: int, c_out: int, sub: int | None = None) -> int:
    """The banded conv kernel's compare width for a given map shape.  Must be
    used by both banded_conv_pallas and the band-fit reporting so the health
    checks audit the width actually compiled.

    Down-style maps (c_in > c_out) gather from a FINER (larger) table: a tile
    of coarse outputs spans ~(c_in/c_out) x more source rows with large local
    variance — measured max span 808 at tile 128 on (augmented) LiDAR (down
    maps L3/L4, round-3 probe; round-2 measured 794) -> 1024.

    Self maps (c_in == c_out): a tile of 128 consecutive sorted outputs
    gathers within span <= 243 on all EgoNN levels (round-3 probe over
    rotated/jittered LiDAR; worst at L2) — 256 fits with exact 16-aligned
    starts, cutting the dominant VPU one-hot build cost 33% vs 384.  Overflow
    on denser data degrades to drop-and-report (band_ok flags at
    train/eval/bench surface it; EGONN_BANDED_FALLBACK=1 restores exact
    lax.cond fallbacks).

    A calibration table (set_band_calibration / EGONN_BAND_CALIB) overrides
    both DEFAULTS with widths measured on real data; an explicitly passed
    `sub` always wins (measurement/A-B callers)."""
    explicit = sub is not None
    sub = sub if explicit else DEFAULT_SUB
    sub = max(sub, 1024) if c_in > c_out else min(sub, 256)
    if not explicit:
        sub = _calibrated(f"conv:{c_in}:{c_out}", sub)
    return min(sub, c_in)  # small tables: the sub-window IS the table


def band_layout_union(kmap: jnp.ndarray, c_in: int, sub: int, tile: int):
    """Band layout for the VMEM-resident conv kernel: per (batch, offset, tile)
    a 16-aligned absolute sub-window start into the feature table (bf16
    sublane granularity — the Pallas kernel asserts pl.multiple_of(start, 16)),
    such that all of that tile's gathers for that offset land inside
    [start, start+sub).  The kernel's one-hot compare + matmul then run over
    `sub` columns — the VPU one-hot build is the inner-loop cost and scales
    with the compare width.

    Returns (starts (B, T, K) int32 multiples of 16, rel (B, T, K, tile) int32
    in [0, sub] with sub marking invalid, ok () bool — True iff every band
    fits; callers lax.cond to the plain gather path otherwise, active (B, T)
    int32 — 0 for tiles whose gathers are ALL sentinel).

    `active` drives the kernel's whole-tile skip: voxels are sorted with
    MAXKEY padding last, so capacity slack beyond a cloud's occupancy forms a
    contiguous tail of all-sentinel tiles (measured 59-99% of rows at EgoNN
    levels 3-7 on LiDAR-scale clouds); the kernel writes zeros for those tiles
    without running the K-offset loop.  Exactness is unconditional — an
    all-sentinel tile's one-hots match nothing, so its output is zero either
    way.

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
    start = jnp.clip((jnp.where(any_k, lo_k, 0) // 16) * 16,
                     0, max(c_in - sub, 0))
    fits_sub = ~any_k | (hi_k - start < sub)
    ok = jnp.all(fits_sub)
    rel = jnp.where(valid, km - start[..., None], sub)
    rel = jnp.transpose(rel, (0, 2, 1, 3)).reshape(b, t, k, tile).astype(jnp.int32)
    starts = jnp.transpose(start, (0, 2, 1)).astype(jnp.int32)  # (B, T, K)
    active = jnp.any(any_k, axis=1).astype(jnp.int32)           # (B, T)
    return starts, rel, ok, active


def _pallas_banded_conv(feats: jnp.ndarray, starts: jnp.ndarray,
                        rel: jnp.ndarray, kernel: jnp.ndarray,
                        sub: int, tile: int,
                        active: jnp.ndarray | None = None,
                        epi_sb: jnp.ndarray | None = None,
                        epi_valid: jnp.ndarray | None = None,
                        epi_relu: bool = False,
                        self_center: bool = False,
                        interpret: bool = False) -> jnp.ndarray:
    """Pallas kernel: grid over (B, T); the whole per-cloud feature table rides
    as a VMEM input block (every EgoNN level table is <= 5 MB — no manual DMA,
    Mosaic pipelines the block fetch), and each offset's gather is an
    in-register one-hot matmul over a (16-aligned) sub-window slice of it.

    The one-hot (tile, sub) never touches HBM — built from an iota compare and
    fed straight to the MXU, which is what makes this faster than both the XLA
    row-gather (issue-bound ~7 ns/row) and an XLA one-hot formulation (which
    materializes GBs of one-hot traffic).

    feats (B, C_in, 128) bf16; starts (B, T, K) int32 (multiples of 16);
    rel (B, T, K, tile) int32 in [0, sub]; kernel (K, 128, F_out).
    Returns (B, T, tile, F_out) f32.

    Optional fused epilogue (inference: BN folds to a per-channel affine):
    `epi_sb` (2, F_out) f32 rides whole in VMEM — row 0 scale, row 1 bias;
    `epi_valid` (B, T, tile) i32 row-validity (the level mask, tiled);
    `epi_relu` statically enables max(., 0).  Applied in-register on the f32
    accumulator before the output write: out = valid * relu(acc * s + b).
    Saves the separate XLA elementwise pass (one read+write of the whole
    (B, C, F) activation per conv+BN+ReLU chain) that the opaque pallas_call
    boundary otherwise forces.  Skipped (all-sentinel) tiles still write zeros:
    their rows are padding (mask 0), and valid-masking zeroes them anyway.

    Toolchain notes (bisected on this Mosaic build): DMA into a scratch with
    lane dim < 128 crashes the remote compiler, as does any bf16 DMA — avoided
    entirely here by keeping feats f32 and casting sub-window slices in-kernel;
    per-offset metadata rides in scalar-prefetch (an SMEM tensor input with a
    non-tileable block shape is rejected).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, k_vol, _ = rel.shape
    c_rows = feats.shape[1]
    assert feats.shape[-1] == 128
    assert kernel.shape[1] == 128
    f_out = kernel.shape[-1]
    assert feats.dtype == jnp.bfloat16  # halves the VMEM block (the level-0
    # table is 8 MB in f32 — over the 16 MB scoped-vmem budget with headroom)
    if active is None:
        active = jnp.ones((b, t), jnp.int32)
    has_epi = epi_sb is not None
    if has_epi:
        assert epi_valid is not None and epi_sb.shape == (2, f_out), epi_sb.shape

    def body(*refs):
        if has_epi:
            (starts_ref, act_ref, rel_ref, feats_ref, kern_ref,
             sb_ref, valid_ref, out_ref) = refs
        else:
            starts_ref, act_ref, rel_ref, feats_ref, kern_ref, out_ref = refs
            sb_ref = valid_ref = None
        ti = pl.program_id(1)

        # whole-tile skip: capacity slack past a cloud's occupancy is a
        # contiguous tail of all-sentinel tiles (59-99% of rows at deep EgoNN
        # levels) whose output is zero by construction — write it directly
        @pl.when(act_ref[0, 0, ti] == 0)
        def _skip():
            out_ref[0, 0] = jnp.zeros((tile, f_out), jnp.float32)

        @pl.when(act_ref[0, 0, ti] != 0)
        def _compute():
            iota = jax.lax.broadcasted_iota(jnp.int32, (tile, sub), 1)

            # precision pinned to DEFAULT: a global jax_default_matmul_precision
            # of "highest" (e.g. the test conftest) would request an fp32
            # contract on bf16 operands, which this Mosaic build rejects
            prec = jax.lax.Precision.DEFAULT

            def k_step(k, acc):
                rel_k = rel_ref[0, 0, k, :]
                # minor-dim inserts ((n,) -> (n,1)) only lower for 32-bit
                # types on this Mosaic build (module docstring): reshape the
                # int32 vector FIRST, then convert/compare in 2D
                rel_k2 = rel_k[:, None]
                if self_center and k == k_vol // 2:
                    # the center offset of an odd SELF kernel gathers the voxel
                    # itself (kmap[center, c] == c): a masked slice of the
                    # tile's own rows replaces the one-hot + gather dot
                    rows = feats_ref[0, pl.ds(ti * tile, tile), :]
                    # bf16 mask-multiply: broadcasting an i1 (tile, 1)
                    # condition across lanes also trips Mosaic's 32-bit rule
                    vmask = (rel_k2 != sub).astype(jnp.bfloat16)
                    gb = rows * vmask
                else:
                    dk = pl.multiple_of(starts_ref[0, ti, k], 16)
                    sub_w = feats_ref[0, pl.ds(dk, sub), :]
                    oh = (rel_k2 == iota).astype(jnp.bfloat16)
                    g = jnp.dot(oh, sub_w, preferred_element_type=jnp.float32,
                                precision=prec)
                    gb = g.astype(jnp.bfloat16)
                return acc + jnp.dot(gb, kern_ref[k].astype(jnp.bfloat16),
                                     preferred_element_type=jnp.float32,
                                     precision=prec)

            # statically unrolled over offsets: lax.fori_loop's per-iteration
            # overhead measured ~2x the whole kernel (L1 7.7 -> 3.3 ms unrolled)
            acc = jnp.zeros((tile, f_out), jnp.float32)
            for k in range(k_vol):
                acc = k_step(k, acc)
            if has_epi:
                acc = acc * sb_ref[0:1, :] + sb_ref[1:2, :]
                if epi_relu:
                    acc = jnp.maximum(acc, 0.0)
                vm = valid_ref[0, 0, 0, :].reshape(tile, 1)
                acc = jnp.where(vm != 0, acc, 0.0)
            out_ref[0, 0] = acc

    # Per-CLOUD scalars ride as an SMEM INPUT BLOCK (fetched once per cloud,
    # ~8 KB), not scalar-prefetch: a prefetched array is whole-batch resident
    # in the 1 MB SMEM and overflows at the reference batch-128 envelope
    # (observed compile OOM); per-STEP blocks measured ~20% slower end-to-end.
    in_specs = [
        pl.BlockSpec((1, t, k_vol), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, 1, t), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.SMEM),  # per-tile active flags
        pl.BlockSpec((1, 1, k_vol, tile), lambda bi, ti: (bi, ti, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c_rows, 128), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),  # whole per-cloud table
        pl.BlockSpec(memory_space=pltpu.VMEM),  # kernel weights
    ]
    operands = [starts, active[:, None, :], rel, feats, kernel]
    if has_epi:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),  # (2, F_out) affine epilogue
            # validity rides 4D (B, T, 1, tile) so the (1, 1, 1, tile) block
            # satisfies Mosaic's last-two-dims tiling rule (dim -2 equals the
            # array dim; a (1, 1, tile) block over (B, T, tile) is rejected)
            pl.BlockSpec((1, 1, 1, tile), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),  # row validity
        ]
        operands += [epi_sb.astype(jnp.float32),
                     epi_valid.astype(jnp.int32)[:, :, None, :]]
    return pl.pallas_call(
        body,
        grid=(b, t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, tile, f_out), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, tile, f_out), jnp.float32),
        interpret=interpret,
    )(*operands)


def banded_conv_pallas(feats: jnp.ndarray, kmap: jnp.ndarray,
                       kernel: jnp.ndarray, sub: int | None = None,
                       tile: int = DEFAULT_TILE,
                       epi: tuple | None = None,
                       self_map: bool = False,
                       interpret: bool = False) -> jnp.ndarray:
    """out[b, c] = sum_k feats[b, kmap[b, k, c]] @ kernel[k] via the Pallas
    banded kernel, with an exact whole-batch fallback (lax.cond).

    feats (B, C_in, F_in) any float dtype; kmap (B, K, C_out) sentinel C_in;
    kernel (K, F_in, F_out).  Returns (B, C_out, F_out) float32.

    epi (scale (F_out,), bias (F_out,), relu: bool, mask (B, C_out)) fuses the
    inference-mode BN affine + ReLU + row mask into the kernel's output write
    (see _pallas_banded_conv); fallback paths apply the same math in XLA.

    self_map: caller promises kmap is a stride-1 SELF kernel map (or its
    offset-reversed backward) — i.e. for odd K the center offset maps every
    valid voxel to itself.  Enables the center-identity fast path
    (EGONN_OH_CENTER); must NOT be set for arbitrary gather maps.
    """
    b, c_in, f_in = feats.shape
    c_out = kmap.shape[-1]
    f_out = kernel.shape[-1]

    def _epi_xla(out):
        if epi is None:
            return out
        scale, bias, relu, mask = epi
        y = out * scale + bias
        if relu:
            y = jnp.maximum(y, 0.0)
        return jnp.where(mask[..., None], y, 0.0)

    if c_out % tile != 0 or f_in > 128 or c_in % 16 != 0:
        return _epi_xla(_plain_gather_conv(feats, kmap, kernel))
    sub = conv_sub_width(c_in, c_out, sub)
    t = c_out // tile
    # odd SELF kernels (k^3 self maps, forward or offset-reversed backward)
    # always map the center offset to the voxel itself — the kernel slices the
    # tile's own rows instead of building a one-hot (EGONN_OH_CENTER)
    k_vol = kmap.shape[1]
    self_center = (OH_CENTER and self_map and c_in == c_out
                   and k_vol % 2 == 1 and k_vol > 1)
    starts, rel, ok, active = band_layout_union(kmap, c_in, sub, tile)
    f_pad = 128 - f_in
    feats_p = feats.astype(jnp.bfloat16)
    if f_pad:
        feats_p = jnp.pad(feats_p, ((0, 0), (0, 0), (0, f_pad)))
    kernel_p = jnp.pad(kernel, ((0, 0), (0, f_pad), (0, 0))) if f_pad else kernel

    if epi is not None:
        scale, bias, _, mask = epi
        epi_sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])
        epi_valid = mask.reshape(b, c_out // tile, tile).astype(jnp.int32)
    else:
        epi_sb = epi_valid = None

    def fast():
        out = _pallas_banded_conv(feats_p, starts, rel, kernel_p, sub, tile,
                                  active=active, epi_sb=epi_sb,
                                  epi_valid=epi_valid,
                                  epi_relu=bool(epi[2]) if epi else False,
                                  self_center=self_center,
                                  interpret=interpret)
        return out.reshape(b, c_out, f_out)

    if not FALLBACK:
        return fast()
    return jax.lax.cond(ok, fast,
                        lambda: _epi_xla(_plain_gather_conv(feats, kmap, kernel)))


def tdown_sub_width(c_fine: int, c_coarse: int, sub: int | None = None) -> int:
    """Window width for the TRANSPOSED down conv (banded_tdown_pallas).

    The window covers, per coarse tile, the fine-row hull [first fine row with
    parent >= tile_lo, last fine row with parent < tile_hi] — the same span
    band_layout_union measures on kmap_down, plus the wider 128-row start
    alignment (the kernel slices the fine table and the up-map chunks at
    128-row granularity) and the hull slack from non-monotone parents.
    Calibration key "tdown:{c_fine}:{c_coarse}"; the default derives from the
    kmap-down conv width + one 128 chunk of alignment/hull margin."""
    explicit = sub is not None
    if not explicit:
        sub = conv_sub_width(c_fine, c_coarse) + 128
        sub = _calibrated(f"tdown:{c_fine}:{c_coarse}", sub)
    sub = -(-sub // 128) * 128  # 128-chunked window
    return min(sub, c_fine)


def tdown_layout(up_parent: jnp.ndarray, c_coarse: int, sub: int,
                 tile: int = DEFAULT_TILE):
    """Per-coarse-tile 128-aligned window starts into the FINE table, computed
    from the up map alone (no kmap_down -> no inversion scatter).

    Parents are near-monotone in (key-sorted) fine index — the same banded
    invariant kmap_down rides — so the fine rows feeding coarse tile t lie in
    the hull [first i: cummax(parent) >= t*tile, last i: revcummin(parent) <
    (t+1)*tile].  Returns starts (B, T) int32 multiples of 128 and ok ()
    bool — True iff every hull fits the `sub` window (out-of-window children
    are dropped by the kernel: the standard drop-and-report band policy)."""
    b, c_fine = up_parent.shape
    t = c_coarse // tile
    valid = up_parent < c_coarse
    lo = jnp.where(valid, up_parent, -1)
    m = jax.lax.cummax(lo, axis=1)                                   # nondecr
    hi = jnp.where(valid, up_parent, jnp.int32(2**30))
    rm = jnp.flip(jax.lax.cummin(jnp.flip(hi, 1), axis=1), 1)        # nondecr
    bounds = jnp.arange(t, dtype=jnp.int32) * tile
    # first/end = searchsorted(monotone, bound) = count of entries < bound —
    # one fused compare+reduce pass instead of a per-query while loop
    # (searchsorted lowered to ~0.25 ms of serial whiles across the pyramid)
    first = jnp.sum(m[:, :, None] < bounds[None, None, :], axis=1,
                    dtype=jnp.int32)
    end = jnp.sum(rm[:, :, None] < (bounds + tile)[None, None, :], axis=1,
                  dtype=jnp.int32)
    starts = jnp.clip((first // 128) * 128, 0, max(c_fine - sub, 0))
    ok = jnp.all(end - starts <= sub)
    return starts.astype(jnp.int32), ok


def plain_tdown(feats: jnp.ndarray, up_parent: jnp.ndarray,
                up_koffset: jnp.ndarray, kernel: jnp.ndarray,
                c_coarse: int) -> jnp.ndarray:
    """Exact XLA transposed down conv: out[p] = sum over fine children i of p
    of feats[i] @ W[up_koffset[i]].  Identical math to the kmap_down gather
    conv (each (parent, slot) pair has at most one child).  Used as the
    non-TPU path and the parity reference for the Pallas kernel."""
    b, c_fine, f_in = feats.shape
    f_out = kernel.shape[-1]
    v = jnp.zeros((b, c_fine, f_out), jnp.float32)
    for s in range(kernel.shape[0]):
        sel = (up_koffset == s)[..., None].astype(feats.dtype)
        v = v + jnp.einsum("bcf,fo->bco", feats * sel, kernel[s],
                           preferred_element_type=jnp.float32)
    return jax.vmap(
        lambda vv, p: jnp.zeros((c_coarse, f_out), jnp.float32)
        .at[p].add(vv, mode="drop")
    )(v, up_parent)


def _pallas_banded_tdown(feats: jnp.ndarray, starts: jnp.ndarray,
                         par2d: jnp.ndarray, ko2d: jnp.ndarray,
                         kernel: jnp.ndarray, sub: int, tile: int,
                         active: jnp.ndarray,
                         epi_sb: jnp.ndarray | None = None,
                         epi_valid: jnp.ndarray | None = None,
                         epi_relu: bool = False,
                         interpret: bool = False) -> jnp.ndarray:
    """Pallas kernel: TRANSPOSED k=2 s=2 down conv driven by the up map.

    Per coarse tile, one window of the FINE table feeds all 8 kernel slots:
    the one-hot is built by comparing the windowed up-parent values (lanes)
    against the tile's coarse rows (sublanes) — ONE compare pass — then each
    slot masks it by its up-koffset row and runs the same two MXU dots as the
    kmap_down conv (same shapes, same accumulation order -> bit-identical
    output).  Replaces: 8 per-slot one-hot builds AND the kmap_down inversion
    scatter (which XLA dead-code-eliminates from inference graphs once
    nothing consumes kmap_down).

    feats (B, c_fine, 128) bf16; starts (B, T) int32 multiples of 128;
    par2d/ko2d (B, 1, c_fine) int32 (up maps, lane-major);
    kernel (8, 128, F_out) f32.  Returns (B, T, tile, F_out) f32.
    Children outside a tile's window contribute zero (drop-and-report, see
    tdown_layout's ok flag).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, c_fine, _ = feats.shape
    t = starts.shape[1]
    k_slots = kernel.shape[0]
    f_out = kernel.shape[-1]
    assert sub % 128 == 0 and c_fine % 128 == 0 and feats.dtype == jnp.bfloat16
    has_epi = epi_sb is not None
    if has_epi:
        assert epi_valid is not None and epi_sb.shape == (2, f_out)

    def body(*refs):
        if has_epi:
            (starts_ref, act_ref, par_ref, ko_ref, feats_ref, kern_ref,
             sb_ref, valid_ref, out_ref) = refs
        else:
            (starts_ref, act_ref, par_ref, ko_ref, feats_ref, kern_ref,
             out_ref) = refs
            sb_ref = valid_ref = None
        ti = pl.program_id(1)

        @pl.when(act_ref[0, 0, ti] == 0)
        def _skip():
            out_ref[0, 0] = jnp.zeros((tile, f_out), jnp.float32)

        @pl.when(act_ref[0, 0, ti] != 0)
        def _compute():
            prec = jax.lax.Precision.DEFAULT
            base = ti * tile
            dk = pl.multiple_of(starts_ref[0, 0, ti], 128)
            iota_p = jax.lax.broadcasted_iota(jnp.int32, (tile, sub), 0)
            # up maps ride lane-major (B, 1, c_fine): the window is ONE
            # 128-granular lane-dim dynamic slice, so the full (tile, sub)
            # one-hot comes from a single compare — no per-chunk staging.
            # (A per-chunk register-resident variant with 72 small dots
            # measured WORSE: tdown L1 1.48 vs 1.02 ms/batch — small dots
            # don't pipeline; and the earlier (tile, sub) scratch roundtrip
            # cost ~0.3 ms/batch over this form.)
            prow = par_ref[0, 0:1, pl.ds(dk, sub)]                  # (1, sub)
            oh = ((prow - base) == iota_p).astype(jnp.bfloat16)     # (tile, sub)
            ko_row = ko_ref[0, 0:1, pl.ds(dk, sub)]                 # (1, sub)
            win = feats_ref[0, pl.ds(dk, sub), :]                   # (sub, 128)
            acc = jnp.zeros((tile, f_out), jnp.float32)
            for s in range(k_slots):
                ohs = oh * (ko_row == s).astype(jnp.bfloat16)
                gs = jnp.dot(ohs, win, preferred_element_type=jnp.float32,
                             precision=prec)
                acc = acc + jnp.dot(gs.astype(jnp.bfloat16),
                                    kern_ref[s].astype(jnp.bfloat16),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
            if has_epi:
                acc = acc * sb_ref[0:1, :] + sb_ref[1:2, :]
                if epi_relu:
                    acc = jnp.maximum(acc, 0.0)
                vm = valid_ref[0, 0, 0, :].reshape(tile, 1)
                acc = jnp.where(vm != 0, acc, 0.0)
            out_ref[0, 0] = acc

    in_specs = [
        pl.BlockSpec((1, 1, t), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.SMEM),  # window starts
        pl.BlockSpec((1, 1, t), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.SMEM),  # per-tile active flags
        pl.BlockSpec((1, 1, c_fine), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),  # whole per-cloud up-parent
        pl.BlockSpec((1, 1, c_fine), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),  # whole per-cloud up-koffset
        pl.BlockSpec((1, c_fine, 128), lambda bi, ti: (bi, 0, 0),
                     memory_space=pltpu.VMEM),  # whole per-cloud fine table
        pl.BlockSpec(memory_space=pltpu.VMEM),  # kernel weights
    ]
    operands = [starts[:, None, :], active[:, None, :], par2d, ko2d, feats, kernel]
    if has_epi:
        in_specs += [
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tile), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [epi_sb.astype(jnp.float32),
                     epi_valid.astype(jnp.int32)[:, :, None, :]]
    return pl.pallas_call(
        body,
        grid=(b, t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, tile, f_out), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, tile, f_out), jnp.float32),
        interpret=interpret,
    )(*operands)


def banded_tdown_pallas(feats: jnp.ndarray, up_parent: jnp.ndarray,
                        up_koffset: jnp.ndarray, kernel: jnp.ndarray,
                        c_coarse: int, mask_coarse: jnp.ndarray,
                        sub: int | None = None, tile: int = DEFAULT_TILE,
                        epi: tuple | None = None,
                        interpret: bool = False) -> jnp.ndarray:
    """Transposed down conv via the banded Pallas kernel (see
    _pallas_banded_tdown), with the exact XLA path as fallback.

    feats (B, c_fine, F_in) fine-level features; up_parent/up_koffset
    (B, c_fine) the fine level's up map; kernel (8, F_in, F_out);
    mask_coarse (B, c_coarse) coarse row validity.  Returns
    (B, c_coarse, F_out) float32.  `epi` as banded_conv_pallas.
    """
    b, c_fine, f_in = feats.shape
    f_out = kernel.shape[-1]

    def _epi_xla(out):
        if epi is None:
            return out
        scale, bias, relu, mask = epi
        y = out * scale + bias
        if relu:
            y = jnp.maximum(y, 0.0)
        return jnp.where(mask[..., None], y, 0.0)

    if c_coarse % tile != 0 or f_in > 128 or c_fine % 128 != 0:
        return _epi_xla(plain_tdown(feats, up_parent, up_koffset, kernel,
                                    c_coarse))
    sub = tdown_sub_width(c_fine, c_coarse, sub)
    t = c_coarse // tile
    starts, ok = tdown_layout(up_parent, c_coarse, sub, tile)
    active = mask_coarse.reshape(b, t, tile).any(-1).astype(jnp.int32)
    feats_p = feats.astype(jnp.bfloat16)
    f_pad = 128 - f_in
    if f_pad:
        feats_p = jnp.pad(feats_p, ((0, 0), (0, 0), (0, f_pad)))
    kernel_p = jnp.pad(kernel, ((0, 0), (0, f_pad), (0, 0))) if f_pad else kernel
    par2d = up_parent[:, None, :].astype(jnp.int32)   # lane-major (B, 1, c_fine)
    ko2d = up_koffset[:, None, :].astype(jnp.int32)

    if epi is not None:
        scale, bias, _, mask = epi
        epi_sb = jnp.stack([scale.astype(jnp.float32), bias.astype(jnp.float32)])
        epi_valid = mask.reshape(b, t, tile).astype(jnp.int32)
    else:
        epi_sb = epi_valid = None

    def fast():
        out = _pallas_banded_tdown(feats_p, starts, par2d, ko2d, kernel_p,
                                   sub, tile, active, epi_sb=epi_sb,
                                   epi_valid=epi_valid,
                                   epi_relu=bool(epi[2]) if epi else False,
                                   interpret=interpret)
        return out.reshape(b, c_coarse, f_out)

    if not FALLBACK:
        return fast()
    return jax.lax.cond(ok, fast,
                        lambda: _epi_xla(plain_tdown(feats, up_parent,
                                                     up_koffset, kernel,
                                                     c_coarse)))


def _pallas_banded_dw(feats: jnp.ndarray, starts: jnp.ndarray,
                      rel: jnp.ndarray, g: jnp.ndarray,
                      sub: int, tile: int,
                      active: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused conv-weight gradient: dW[k] = sum_o feats[kmap[k, o]]^T g[o].

    The XLA backward (_conv_dkernel in sparse/conv.py) re-gathers every
    offset's activations through HBM (~7 ns/row issue-bound — multi-GB of
    row-gather traffic per conv at the reference batch-128 envelope).  Here the
    gather is the SAME in-register one-hot MXU matmul as the banded forward,
    and the dW contraction `gathered^T @ g_tile` runs on the MXU too; dW
    accumulates in a VMEM output block revisited across the whole (B, T) grid
    (TPU grids iterate sequentially, the standard Pallas reduction pattern).

    feats (B, C_rows, 128) bf16; starts (B, T, K); rel (B, T, K, tile);
    g (B, T, tile, F_out) f32 cotangent tiles; active (B, T).
    Returns (K, 128, F_out) f32 summed over batch and tiles.  Out-of-window
    neighbors contribute zero — the same drop policy as the banded forward on
    the same kmap, so the gradient matches the function actually computed.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, k_vol, _ = rel.shape
    c_rows = feats.shape[1]
    f_out = g.shape[-1]
    assert feats.dtype == jnp.bfloat16 and feats.shape[-1] == 128

    def body(starts_ref, act_ref, rel_ref, feats_ref, g_ref, out_ref):
        bi, ti = pl.program_id(0), pl.program_id(1)

        @pl.when((bi == 0) & (ti == 0))
        def _init():
            out_ref[...] = jnp.zeros((k_vol, 128, f_out), jnp.float32)

        @pl.when(act_ref[0, 0, ti] != 0)
        def _acc():
            iota = jax.lax.broadcasted_iota(jnp.int32, (tile, sub), 1)
            prec = jax.lax.Precision.DEFAULT
            gt = g_ref[0, 0].astype(jnp.bfloat16)  # (tile, F_out)
            for k in range(k_vol):
                dk = pl.multiple_of(starts_ref[0, ti, k], 16)
                sub_w = feats_ref[0, pl.ds(dk, sub), :]
                rel_k = rel_ref[0, 0, k, :]
                oh = (rel_k[:, None] == iota).astype(jnp.bfloat16)
                gth = jnp.dot(oh, sub_w, preferred_element_type=jnp.float32,
                              precision=prec).astype(jnp.bfloat16)
                # contract the tile axis of both operands: (128, F_out)
                dwk = jax.lax.dot_general(
                    gth, gt, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
                out_ref[k] += dwk

    return pl.pallas_call(
        body,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, t, k_vol), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, t), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, k_vol, tile), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_rows, 128), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile, f_out), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_vol, 128, f_out), lambda bi, ti: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_vol, 128, f_out), jnp.float32),
        interpret=interpret,
    )(starts, active[:, None, :], rel, feats, g)


def banded_conv_dw(feats: jnp.ndarray, kmap: jnp.ndarray, g: jnp.ndarray,
                   fallback_fn=None, sub: int | None = None,
                   tile: int = DEFAULT_TILE, interpret: bool = False):
    """dW for out[o] = sum_k feats[kmap[k, o]] @ W[k] via the banded dW kernel.

    feats (B, C_in, F_in); kmap (B, K, C_out) sentinel C_in; g (B, C_out, F_out)
    cotangent.  Returns (K, F_in, F_out) f32, or None when the map shape is not
    banded-eligible (caller falls back to the XLA gather backward).

    Band policy mirrors banded_conv_pallas: with EGONN_BANDED_FALLBACK=1 a
    band overflow lax.conds to `fallback_fn` (the exact gather backward);
    by default out-of-window neighbors drop — the same neighbors the banded
    FORWARD on this kmap dropped, so the gradient is consistent with the
    function actually computed.
    """
    b, c_in, f_in = feats.shape
    k_vol, c_out = kmap.shape[1], kmap.shape[2]
    f_out = g.shape[-1]
    if c_out % tile != 0 or f_in > 128 or c_in % 16 != 0:
        return None
    # Use the SAME window the forward compiled (conv_sub_width) so the drop
    # set matches exactly.
    subw = conv_sub_width(c_in, c_out, sub)
    starts, rel, ok, active = band_layout_union(kmap, c_in, subw, tile)
    feats_p = feats.astype(jnp.bfloat16)
    if f_in < 128:
        feats_p = jnp.pad(feats_p, ((0, 0), (0, 0), (0, 128 - f_in)))
    t = c_out // tile
    g_t = g.astype(jnp.float32).reshape(b, t, tile, f_out)

    def fast():
        dw = _pallas_banded_dw(feats_p, starts, rel, g_t, subw, tile,
                               active, interpret=interpret)
        return dw[:, :f_in, :]

    if not FALLBACK or fallback_fn is None:
        return fast()
    return jax.lax.cond(ok, fast, lambda: fallback_fn(feats, kmap, g))


# ---------------------------------------------------------------------------
# Banded sorted-key LOOKUP: the kernel-map construction engine
# ---------------------------------------------------------------------------

def _pallas_banded_lookup(queries_t: jnp.ndarray, rows: jnp.ndarray,
                          win_table: jnp.ndarray, c_in: int,
                          sub: int, tile: int, stride: int = 128,
                          active: jnp.ndarray | None = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Positions of query keys in a sorted table, banded: grid over (B, T);
    per offset k, ONE precomputed window row of the table is compared against
    the tile's queries entirely in-register — zero HBM gathers.

    queries_t (B, T, K, tile) int32 (MAXKEY = invalid); rows (B, T, K) int32
    window-row index (the window = table[row*128 : row*128 + sub]);
    win_table (R, sub) int32 with R = ceil(c_in/128) overlapping windows.
    Returns (B, T, K, tile) int32 positions, c_in where absent/invalid.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, k_vol, tile_ = queries_t.shape
    maxkey = 2**31 - 1  # python literal: a traced scalar would be a captured const
    if active is None:
        active = jnp.ones((b, t), jnp.int32)

    def body(rows_ref, act_ref, q_ref, win_ref, out_ref):
        ti = pl.program_id(1)

        # whole-tile skip (see _pallas_banded_conv): all-MAXKEY tiles resolve
        # to the sentinel without running the K compare passes
        @pl.when(act_ref[0, 0, ti] == 0)
        def _skip():
            out_ref[0, 0] = jnp.full((k_vol, tile_), c_in, jnp.int32)

        @pl.when(act_ref[0, 0, ti] != 0)
        def _compute():
            def k_step(k, _):
                row_k = rows_ref[0, ti, k]
                win_row = win_ref[0, pl.ds(row_k, 1), :]       # (1, sub)
                q = q_ref[0, 0, k, :]                          # (tile,)
                eq = q[:, None] == win_row                     # (tile, sub)
                # keys are unique: at most one match, so ONE masked iota-sum
                # gives both presence (s == 0 means absent) and position
                # (s - 1).  (Mosaic's argmax lowering is f32-only; this is
                # also one fewer reduce pass than any() + argmax.)
                jj = jax.lax.broadcasted_iota(jnp.int32, (tile_, sub), 1)
                s = jnp.sum(jnp.where(eq, jj + 1, 0), axis=1)
                found = (s > 0) & (q != maxkey)
                out_ref[0, 0, k, :] = jnp.where(found, row_k * stride + s - 1,
                                                c_in)
                return 0

            for k in range(k_vol):  # statically unrolled (conv kernel note)
                k_step(k, 0)

    return pl.pallas_call(
        body,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, t, k_vol), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.SMEM),  # see conv kernel SMEM note
            pl.BlockSpec((1, 1, t), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.SMEM),  # per-tile active flags
            pl.BlockSpec((1, 1, k_vol, tile), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win_table.shape[1], sub), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),   # per-cloud window table
        ],
        out_specs=pl.BlockSpec((1, 1, k_vol, tile), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, k_vol, tile), jnp.int32),
        interpret=interpret,
    )(rows, active[:, None, :], queries_t, win_table)


def make_window_table(sorted_keys: jnp.ndarray, sub: int,
                      stride: int = 128) -> jnp.ndarray:
    """(B, C) sorted keys -> (B, R, sub) overlapping windows at `stride`:
    row r = keys[stride*r : stride*r + sub], MAXKEY-padded past the end.
    Built from static shifted slices — no gathers.  A finer stride (64) wastes
    less of `sub` on alignment slack, so the compare width can shrink from 384
    to 256 (the compare-all passes are the kernels' dominant cost)."""
    b, c = sorted_keys.shape
    maxkey = jnp.int32(2**31 - 1)
    r = -(-c // stride)
    padded = jnp.concatenate(
        [sorted_keys, jnp.full((b, sub), maxkey, jnp.int32)], axis=1
    )
    return jnp.stack(
        [padded[:, i * stride : i * stride + sub] for i in range(r)], axis=1
    )




def _band_prepass(sorted_keys: jnp.ndarray, q_first: jnp.ndarray,
                  q_last: jnp.ndarray, any_valid: jnp.ndarray,
                  sub: int, stride: int):
    """Window-row indices per (batch, tile, offset) + band-fit flag, gather-free
    (dense compares against the stride-spaced boundary keys)."""
    boundaries = sorted_keys[:, ::stride]                    # (B, R)
    r = boundaries.shape[1]
    cnt_first = jnp.sum(boundaries[:, None, None, :] <= q_first[..., None],
                        axis=-1).astype(jnp.int32)
    cnt_last = jnp.sum(boundaries[:, None, None, :] <= q_last[..., None],
                       axis=-1).astype(jnp.int32)
    row_first = jnp.clip(cnt_first - 1, 0, r - 1)
    row_last = jnp.clip(cnt_last - 1, 0, r - 1)
    fits = ~any_valid | ((row_last - row_first) * stride + stride <= sub)
    ok = jnp.all(fits)
    rows = jnp.transpose(jnp.where(any_valid, row_first, 0), (0, 2, 1))  # (B,T,K)
    return rows, ok


def banded_lookup(sorted_keys: jnp.ndarray, queries: jnp.ndarray,
                  sub: int | None = None, tile: int = DEFAULT_TILE,
                  stride: int = DEFAULT_STRIDE, interpret: bool = False):
    """Find positions of `queries` in per-cloud MAXKEY-padded sorted key arrays.

    sorted_keys (B, C_in) int32; queries (B, K, C_out) int32 (MAXKEY invalid;
    per offset k each tile's valid queries must be close in key order — true
    for kernel-map queries, which are out_key + packed offset delta).
    Returns (positions (B, K, C_out) int32 with sentinel C_in, ok () bool).
    The window-row pre-pass is gather-free: dense compares against the
    128-stride boundary keys.
    """
    b, c_in = sorted_keys.shape
    if sub is None:
        sub = min(_calibrated(f"lookup:{c_in}", DEFAULT_SUB), c_in)
    _, k_vol, c_out = queries.shape
    assert c_out % tile == 0
    t = c_out // tile
    maxkey = jnp.int32(2**31 - 1)

    q4 = queries.reshape(b, k_vol, t, tile)
    valid = q4 != maxkey
    q_first = jnp.min(jnp.where(valid, q4, maxkey), axis=-1)  # (B, K, T)
    q_last = jnp.max(jnp.where(valid, q4, -1), axis=-1)
    any_valid = jnp.any(valid, axis=-1)
    rows, ok = _band_prepass(sorted_keys, q_first, q_last, any_valid, sub, stride)
    q_t = jnp.transpose(q4, (0, 2, 1, 3))                   # (B, T, K, tile)
    win_table = make_window_table(sorted_keys, sub, stride)
    active = jnp.any(any_valid, axis=1).astype(jnp.int32)   # (B, T)

    def fast():
        pos = _pallas_banded_lookup(q_t, rows, win_table, c_in, sub, tile,
                                    stride, active=active, interpret=interpret)
        return jnp.transpose(pos, (0, 2, 1, 3)).reshape(b, k_vol, c_out)

    def slow():
        from egonn_tpu.sparse.packing import lookup_sorted

        return jax.vmap(lambda sk, q: lookup_sorted(sk, q, sentinel=c_in))(
            sorted_keys, queries
        )

    if not FALLBACK:
        return fast(), ok
    return jax.lax.cond(ok, fast, slow), ok


# ---------------------------------------------------------------------------
# Z-run presence: the conv0 (all-ones stem) kernel-map engine
# ---------------------------------------------------------------------------

def _pallas_zrun_presence(q_lo_t: jnp.ndarray, rows: jnp.ndarray,
                          win_table: jnp.ndarray, kz: int,
                          sub: int, tile: int, stride: int = 128,
                          active: jnp.ndarray | None = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Presence bitmasks of kz CONSECUTIVE keys per query, banded.

    EgoNN's stem convolves constant-ones features (reference
    datasets/dataset_utils.py:80), so its kernel map only needs neighbor
    PRESENCE — and the kz z-offsets of one (dx, dy) column are consecutive
    packed keys.  One masked reduce per xy-offset yields all kz presence bits:

        bits = sum over window of (0 <= win - q_lo < kz) ? 1 << (win - q_lo) : 0

    (keys are unique, so the sum is a bitwise OR) — kz times fewer VPU passes
    than kz separate lookups.

    q_lo_t (B, T, Kxy, tile) int32 base queries (MAXKEY invalid); rows
    (B, T, Kxy) window-row indices; win_table (B, R, sub).
    Returns (B, T, Kxy, tile) int32 bitmasks.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, kxy, tile_ = q_lo_t.shape
    assert kz <= 8  # bits fit comfortably; val & 7 below assumes this
    if active is None:
        active = jnp.ones((b, t), jnp.int32)

    def body(rows_ref, act_ref, q_ref, win_ref, out_ref):
        ti = pl.program_id(1)

        # whole-tile skip (see _pallas_banded_conv): all-MAXKEY tiles have no
        # present neighbors by definition
        @pl.when(act_ref[0, 0, ti] == 0)
        def _skip():
            out_ref[0, 0] = jnp.zeros((kxy, tile_), jnp.int32)

        @pl.when(act_ref[0, 0, ti] != 0)
        def _compute():
            ones = jnp.ones((sub, 128), jnp.bfloat16)  # full lane width: an
            # 8-lane RHS crashes the remote Mosaic compiler at small-cap shapes

            def k_step(k, _):
                row_k = rows_ref[0, ti, k]
                win_row = win_ref[0, pl.ds(row_k, 1), :]       # (1, sub)
                q = q_ref[0, 0, k, :]                          # (tile,)
                val = win_row - q[:, None]                     # (tile, sub)
                # unsigned compare: uint32(val) < kz == (0 <= val < kz) in one
                # op; q == MAXKEY (invalid) would "match" the table's MAXKEY
                # padding (val == 0) — mask it out
                hit = (val.astype(jnp.uint32) < kz) & (q[:, None] != 2**31 - 1)
                # lane reduction on the MXU (27% faster than a VPU jnp.sum
                # here — the VPU is this kernel's bottleneck, the MXU is
                # idle): bit weights 2^val are exact in bf16 (kz <= 8 ->
                # values <= 128) and the f32 accumulation of <= sub terms
                # <= 255 is exact.  2^val built by EXPONENT-FIELD BITCAST
                # ((val+127) << 23 reinterpreted as f32 — exact for val in
                # [0, kz)) instead of int->f32 convert + exp2: all-integer
                # VPU ops on the kernel's bottleneck unit
                sh = pltpu.bitcast(
                    jnp.where(hit, (val + 127) << 23, 0), jnp.float32)
                # precision pinned to DEFAULT (see the conv kernel note: a
                # global "highest" would request an fp32 contract on bf16
                # operands, which this Mosaic build rejects)
                s = jnp.dot(sh.astype(jnp.bfloat16), ones,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                out_ref[0, 0, k, :] = s[:, 0].astype(jnp.int32)
                return 0

            for k in range(kxy):  # statically unrolled (see conv kernel note)
                k_step(k, 0)

    return pl.pallas_call(
        body,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, t, kxy), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.SMEM),  # see conv kernel SMEM note
            pl.BlockSpec((1, 1, t), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.SMEM),  # per-tile active flags
            pl.BlockSpec((1, 1, kxy, tile), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win_table.shape[1], sub), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, kxy, tile), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, kxy, tile), jnp.int32),
        interpret=interpret,
    )(rows, active[:, None, :], q_lo_t, win_table)


def zrun_presence(sorted_keys: jnp.ndarray, q_lo: jnp.ndarray, kz: int,
                  sub: int | None = None, tile: int = DEFAULT_TILE,
                  stride: int = DEFAULT_STRIDE, interpret: bool = False):
    """Presence bits of [q, q+kz) for each base query in per-cloud sorted keys.

    sorted_keys (B, C_in); q_lo (B, Kxy, C_out) int32 (MAXKEY invalid).
    Returns (bits (B, Kxy, C_out) int32, ok () bool).  When ok is False the
    caller must use a fallback — this function does NOT cond internally
    because the fallback shape differs per use."""
    b, c_in = sorted_keys.shape
    if sub is None:
        sub = min(_calibrated(f"zrun:{c_in}:{kz}", DEFAULT_SUB), c_in)
    _, kxy, c_out = q_lo.shape
    assert c_out % tile == 0
    t = c_out // tile
    maxkey = jnp.int32(2**31 - 1)

    q4 = q_lo.reshape(b, kxy, t, tile)
    valid = q4 != maxkey
    q_first = jnp.min(jnp.where(valid, q4, maxkey), axis=-1)
    q_last = jnp.max(jnp.where(valid, q4 + (kz - 1), -1), axis=-1)
    any_valid = jnp.any(valid, axis=-1)
    rows, ok = _band_prepass(sorted_keys, q_first, q_last, any_valid, sub, stride)
    q_t = jnp.transpose(q4, (0, 2, 1, 3))
    win_table = make_window_table(sorted_keys, sub, stride)
    active = jnp.any(any_valid, axis=1).astype(jnp.int32)
    bits = _pallas_zrun_presence(q_t, rows, win_table, kz, sub, tile,
                                 stride, active=active, interpret=interpret)
    return jnp.transpose(bits, (0, 2, 1, 3)).reshape(b, kxy, c_out), ok


def _pallas_zrun_rank(q_lo_t: jnp.ndarray, rows: jnp.ndarray,
                      win_table: jnp.ndarray, kz: int,
                      sub: int, tile: int, stride: int = 128,
                      active: jnp.ndarray | None = None,
                      interpret: bool = False):
    """Presence bitmask AND rank per z-run base query, banded.

    Like _pallas_zrun_presence plus a second reduce giving rank(q_lo) = #keys
    < q_lo — from which the POSITION of every present key q_lo + j follows
    as rank + popcount(bits & ((1 << j) - 1)) (keys of one column are
    consecutive, so present ones occupy consecutive table rows).  This serves
    the k^3 self kernel maps with kz times fewer passes than per-key lookups.

    Returns (bits, rank) each (B, T, Kxy, tile) int32.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, kxy, tile_ = q_lo_t.shape
    assert kz <= 8
    if active is None:
        active = jnp.ones((b, t), jnp.int32)

    def body(rows_ref, act_ref, q_ref, win_ref, bits_ref, rank_ref):
        ti = pl.program_id(1)

        # whole-tile skip (see _pallas_banded_conv).  Skipped rank is 0 —
        # downstream position decode masks by the presence bits, which are 0
        @pl.when(act_ref[0, 0, ti] == 0)
        def _skip():
            bits_ref[0, 0] = jnp.zeros((kxy, tile_), jnp.int32)
            rank_ref[0, 0] = jnp.zeros((kxy, tile_), jnp.int32)

        @pl.when(act_ref[0, 0, ti] != 0)
        def _compute():
            ones = jnp.ones((sub, 128), jnp.bfloat16)  # full lane width: an
            # 8-lane RHS crashes the remote Mosaic compiler at small-cap shapes

            def k_step(k, _):
                row_k = rows_ref[0, ti, k]
                win_row = win_ref[0, pl.ds(row_k, 1), :]       # (1, sub)
                q = q_ref[0, 0, k, :]                          # (tile,)
                val = win_row - q[:, None]                     # (tile, sub)
                # unsigned compare folds (0 <= val < kz) into one op;
                # q == MAXKEY (invalid) would "match" the table's MAXKEY
                # padding — mask it out
                hit = (val.astype(jnp.uint32) < kz) & (q[:, None] != 2**31 - 1)
                lt = val < 0
                # BOTH lane reductions ride ONE MXU dot (the VPU is the
                # kernel's bottleneck; see _pallas_zrun_presence): encode
                #   M = 2^val (hit)  +  512 * (val < 0)
                # (disjoint conditions; every value — powers of two <= 128 and
                # 512 — is exact in bf16, and the f32 accumulation is exact:
                # sum <= 255 + 512*sub < 2^24).  Decode: bits = S & 511,
                # in-window count = S >> 9.  Both encodings built by
                # EXPONENT-FIELD BITCAST (see _pallas_zrun_presence): hit and
                # lt are disjoint, so one integer select chain replaces the
                # exp2 + f32 add
                mb = jnp.where(hit, (val + 127) << 23, 0)
                mb = jnp.where(lt, (9 + 127) << 23, mb)  # 512.0f == 2^9
                m = pltpu.bitcast(mb, jnp.float32)
                # precision pinned to DEFAULT (see the conv kernel note)
                s = jnp.dot(m.astype(jnp.bfloat16), ones,
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
                s_i = s[:, 0].astype(jnp.int32)
                bits_ref[0, 0, k, :] = s_i & 511
                # MAXKEY pads and later keys compare >= q, so the count covers
                # exactly the in-window keys below q; keys before the window
                # are all < q by the boundary choice: absolute rank =
                # row*stride + cnt
                rank_ref[0, 0, k, :] = row_k * stride + (s_i >> 9)
                return 0

            for k in range(kxy):  # statically unrolled (see conv kernel note)
                k_step(k, 0)

    return pl.pallas_call(
        body,
        grid=(b, t),
        in_specs=[
            pl.BlockSpec((1, t, kxy), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.SMEM),  # see conv kernel SMEM note
            pl.BlockSpec((1, 1, t), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.SMEM),  # per-tile active flags
            pl.BlockSpec((1, 1, kxy, tile), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, win_table.shape[1], sub), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, kxy, tile), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, kxy, tile), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, t, kxy, tile), jnp.int32),
            jax.ShapeDtypeStruct((b, t, kxy, tile), jnp.int32),
        ),
        interpret=interpret,
    )(rows, active[:, None, :], q_lo_t, win_table)


def zrun_rank(sorted_keys: jnp.ndarray, q_lo: jnp.ndarray, kz: int,
              sub: int | None = None, tile: int = DEFAULT_TILE,
              stride: int = DEFAULT_STRIDE, interpret: bool = False):
    """(bits, rank, ok) for z-run base queries — see _pallas_zrun_rank.

    sorted_keys (B, C_in); q_lo (B, Kxy, C_out) int32 (MAXKEY invalid).
    bits/rank (B, Kxy, C_out) int32."""
    b, c_in = sorted_keys.shape
    if sub is None:
        sub = min(_calibrated(f"zrun:{c_in}:{kz}", DEFAULT_SUB), c_in)
    _, kxy, c_out = q_lo.shape
    assert c_out % tile == 0
    t = c_out // tile
    maxkey = jnp.int32(2**31 - 1)

    q4 = q_lo.reshape(b, kxy, t, tile)
    valid = q4 != maxkey
    q_first = jnp.min(jnp.where(valid, q4, maxkey), axis=-1)
    q_last = jnp.max(jnp.where(valid, q4 + (kz - 1), -1), axis=-1)
    any_valid = jnp.any(valid, axis=-1)
    rows, ok = _band_prepass(sorted_keys, q_first, q_last, any_valid, sub, stride)
    q_t = jnp.transpose(q4, (0, 2, 1, 3))
    win_table = make_window_table(sorted_keys, sub, stride)
    active = jnp.any(any_valid, axis=1).astype(jnp.int32)
    bits, rank = _pallas_zrun_rank(q_t, rows, win_table, kz, sub, tile,
                                   stride, active=active, interpret=interpret)
    tr = lambda a: jnp.transpose(a, (0, 2, 1, 3)).reshape(b, kxy, c_out)  # noqa: E731
    return tr(bits), tr(rank), ok


def zrun_fit(sorted_keys: jnp.ndarray, q_lo: jnp.ndarray, kz: int,
             sub: int | None = None, stride: int = DEFAULT_STRIDE,
             tile: int = DEFAULT_TILE):
    """Band-fit flag for a zrun presence/rank call WITHOUT running the kernel:
    the same gather-free prepass zrun_presence/zrun_rank run internally.
    Returns a () bool (traced)."""
    b, c_in = sorted_keys.shape
    if sub is None:
        sub = min(_calibrated(f"zrun:{c_in}:{kz}", DEFAULT_SUB), c_in)
    _, kxy, c_out = q_lo.shape
    if c_out % tile != 0:
        return jnp.bool_(True)  # banded path unused at this shape
    t = c_out // tile
    maxkey = jnp.int32(2**31 - 1)
    q4 = q_lo.reshape(b, kxy, t, tile)
    valid = q4 != maxkey
    q_first = jnp.min(jnp.where(valid, q4, maxkey), axis=-1)
    q_last = jnp.max(jnp.where(valid, q4 + (kz - 1), -1), axis=-1)
    any_valid = jnp.any(valid, axis=-1)
    _, ok = _band_prepass(sorted_keys, q_first, q_last, any_valid, sub, stride)
    return ok


def band_fit_report_traced(pyramid, spec) -> dict:
    """band_fit_report with traced (jnp scalar bool) values — usable inside jit
    so evaluators/bench can compute it alongside a forward pass."""
    report = {}
    for l in range(spec.num_levels + 1):
        lvl = pyramid[l]
        # conv-stage bands (banded_conv_pallas over kmap_self / kmap_down).
        # Level 0 runs sparse_conv_ones when conv0_ones (no banded conv).
        if lvl.kmap_self is not None and not (l == 0 and spec.conv0_ones):
            cs = spec.capacities[l]
            sub_s = conv_sub_width(cs, cs)
            ok_f = band_layout_union(lvl.kmap_self, cs, sub_s, DEFAULT_TILE)[2]
            ok_r = band_layout_union(lvl.kmap_self[:, ::-1, :], cs,
                                     sub_s, DEFAULT_TILE)[2]
            report[f"self_L{l}"] = jnp.logical_and(ok_f, ok_r)
        if lvl.kmap_down is not None:
            cd = spec.capacities[l - 1]
            sub_d = conv_sub_width(cd, spec.capacities[l])
            report[f"down_L{l}"] = band_layout_union(
                lvl.kmap_down, cd, sub_d, DEFAULT_TILE)[2]
            # transposed down conv (eval path): up-map hull windows
            fine = pyramid[l - 1]
            if fine.up_parent is not None and cd % 128 == 0 \
                    and spec.capacities[l] % DEFAULT_TILE == 0:
                sub_t = tdown_sub_width(cd, spec.capacities[l])
                report[f"tdown_L{l}"] = tdown_layout(
                    fine.up_parent, spec.capacities[l], sub_t, DEFAULT_TILE)[1]
        # map-BUILD bands: the zrun kernels that constructed kmap_self.  An
        # overflow here yields a wrong kernel map that the conv-stage check
        # above can still score healthy (the map itself is in-band), so the
        # build-time prepass is re-evaluated from the level's coords.
        from egonn_tpu.sparse.pyramid import (
            _use_banded_lookup, _xy_offsets, _zrun_queries,
        )

        if lvl.kmap_self is not None \
                and spec.capacities[l] % 128 == 0 and _use_banded_lookup():

            k = spec.conv0_kernel_size if l == 0 else spec.block_kernel_size
            pack_l = spec.pack_at(l)
            from egonn_tpu.sparse.packing import pack_keys

            keys_l = jax.vmap(lambda c, m: pack_keys(c, m, pack_l))(
                lvl.coords, lvl.mask)
            q_lo, _, _ = jax.vmap(
                lambda c, m: _zrun_queries(c, m, _xy_offsets(k), k, -(k // 2),
                                           pack_l)
            )(lvl.coords, lvl.mask)
            report[f"zbuild_L{l}"] = zrun_fit(keys_l, q_lo, kz=k)
    return report


def band_fit_report(pyramid, spec) -> dict:
    """Band-fit health check for the drop-and-report overflow policy.

    Returns {name: ok} for every banded kernel a forward/backward pass will
    run on this pyramid: self-conv bands (forward and offset-reversed backward)
    at the conv sub-width, down-conv bands at the widened down sub-width, and
    the zrun map-BUILD bands (re-derived from each level's coords — a build
    overflow produces a wrong kmap that conv-stage checks alone cannot see).
    All True means the banded engine's outputs are bit-identical to the exact
    gather engine on this data; a False pinpoints where out-of-window
    neighbors were dropped.  The trainer logs this periodically
    (train/trainer.py) and evaluators surface it per run (eval/evaluator.py),
    mirroring the per-level `Level.n_unique` capacity-overflow diagnostics.
    """
    return {k: bool(v) for k, v in band_fit_report_traced(pyramid, spec).items()}
