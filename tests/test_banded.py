"""Banded Pallas conv engine vs the plain gather path.

The golden sparse-conv tests (test_sparse_conv.py) verify the gather path
against brute force at f32 precision; this module verifies the banded engine
(sparse/banded.py) agrees with the gather path.  On CPU the kernel runs in
Pallas interpret mode, so shapes are kept small.

The banded path computes in bf16 (matching the TPU MXU production pass), so
comparisons are at bf16 tolerance against a bf16-quantized plain path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egonn_tpu.ops.quantization import PolarQuantizer
from egonn_tpu.sparse.banded import (
    _plain_gather_conv,
    band_layout_union,
    banded_conv_pallas,
)
from egonn_tpu.sparse.pyramid import egonn_pyramid_spec, build_pyramid


def _real_pyramid(rng, b=2, n=4096, cap0=1024):
    theta = rng.uniform(0, 2 * np.pi, (b, n))
    r = np.abs(rng.normal(25, 18, (b, n))).clip(2, 80)
    z = rng.uniform(-1, 10, (b, n))
    clouds = jnp.asarray(
        np.stack([r * np.cos(theta), r * np.sin(theta), z], -1).astype(np.float32)
    )
    mask = jnp.ones((b, n), bool)
    q = PolarQuantizer([1.0, 0.3, 0.2])
    spec = egonn_pyramid_spec(cap0=cap0, num_levels=3, min_out_level=1)
    res = jax.vmap(lambda pc, mm: q.quantize(pc, mm, spec.capacities[0],
                                             need_index=False))(clouds, mask)
    return build_pyramid(res.coords_t, res.mask, spec, keys0=res.keys)


def _plain_bf16(feats, kmap, kernel):
    """Plain path with inputs quantized to bf16 — the banded path's numerics."""
    f16 = feats.astype(jnp.bfloat16).astype(jnp.float32)
    k16 = kernel.astype(jnp.bfloat16).astype(jnp.float32)
    return _plain_gather_conv(f16, kmap, k16)


@pytest.mark.slow  # compile-heavy golden (suite-time budget)
def test_banded_matches_plain_on_real_bands(rng):
    """On a real sorted-key pyramid the bands fit and the Pallas (interpret)
    kernel reproduces the gather conv at bf16 tolerance."""
    pyr = _real_pyramid(rng)
    lvl = pyr[1]
    kmap = lvl.kmap_self
    c = kmap.shape[-1]
    f = 16
    feats = jnp.asarray(
        (rng.standard_normal((2, c, f)) * np.asarray(lvl.mask)[..., None]
         ).astype(np.float32)
    )
    kernel = jnp.asarray(rng.standard_normal((27, f, f)).astype(np.float32) * 0.2)

    _, _, ok, _ = band_layout_union(kmap, c, min(384, c), 128)
    assert bool(ok), "real pyramid bands must fit the default sub-window"

    got = banded_conv_pallas(feats, kmap, kernel, interpret=True)
    want = _plain_bf16(feats, kmap, kernel)
    err = float(jnp.max(jnp.abs(got - want)))
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    assert err / scale < 3e-2, err / scale


@pytest.mark.parametrize("f_in", [32, 64])
@pytest.mark.parametrize("mode", ["wsel", "roll"])
def test_banded_packed_matches_plain(rng, f_in, mode, monkeypatch):
    """Channel-packed kernels (f_in 32 -> pack 4, 64 -> pack 2) reproduce the
    gather conv bit-for-bit at bf16 numerics, on a real self map AND a real
    down-style map (c_in > c_out), in BOTH group-alignment modes ("wsel"
    pre-shifted weight variants, "roll" lane rotations).  Packing is opt-in
    (EGONN_CONV_PACK=1), so enable it explicitly here to keep the path
    covered."""
    import egonn_tpu.sparse.banded as banded_mod
    from egonn_tpu.sparse.banded import conv_band_params

    monkeypatch.setattr(banded_mod, "PACK_ENABLED", True)
    monkeypatch.setattr(banded_mod, "PACK_MODE", mode)
    pyr = _real_pyramid(rng)
    for lvl_in, kmap in [(pyr[1], pyr[1].kmap_self), (pyr[1], pyr[2].kmap_down)]:
        c_in = lvl_in.coords.shape[-1]
        k = kmap.shape[1]
        pack, sub = conv_band_params(c_in, kmap.shape[-1], f_in)
        assert pack == 128 // f_in, (pack, f_in)
        feats = jnp.asarray(
            (rng.standard_normal((2, c_in, f_in))
             * np.asarray(lvl_in.mask)[..., None]).astype(np.float32)
        )
        kernel = jnp.asarray(
            rng.standard_normal((k, f_in, f_in)).astype(np.float32) * 0.2)
        got = banded_conv_pallas(feats, kmap, kernel, interpret=True)
        want = _plain_bf16(feats, kmap, kernel)
        err = float(jnp.max(jnp.abs(got - want)))
        scale = float(jnp.max(jnp.abs(want))) + 1e-9
        assert err / scale < 3e-2, (err / scale, kmap.shape)


def test_packed_modes_bit_identical(rng, monkeypatch):
    """"wsel", "wcat" and "roll" group alignment produce bit-identical outputs
    (same nonzero partial products, f32 accumulation, +0.0 terms exact;
    "wcat" computes the same columns in one wider dot)."""
    import egonn_tpu.sparse.banded as banded_mod

    monkeypatch.setattr(banded_mod, "PACK_ENABLED", True)
    pyr = _real_pyramid(rng)
    lvl, kmap = pyr[1], pyr[1].kmap_self
    c_in = lvl.coords.shape[-1]
    k, f_in = kmap.shape[1], 32
    feats = jnp.asarray(
        (rng.standard_normal((2, c_in, f_in))
         * np.asarray(lvl.mask)[..., None]).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((k, f_in, f_in)).astype(np.float32) * 0.2)
    outs = {}
    for mode in ("wsel", "roll", "wcat"):
        monkeypatch.setattr(banded_mod, "PACK_MODE", mode)
        outs[mode] = np.asarray(banded_conv_pallas(feats, kmap, kernel, interpret=True))
    np.testing.assert_array_equal(outs["wsel"], outs["roll"])
    np.testing.assert_array_equal(outs["wsel"], outs["wcat"])


def test_packed_layout_rel_encoding(rng):
    """band_layout_union(pack>1): starts are 16-aligned packed rows and rel
    decodes to (packed row, lane group) = (km // pack - start, km % pack)."""
    from egonn_tpu.sparse.banded import band_layout_union

    pack, sub, tile = 4, 80, 128
    c_in = 1024
    base = rng.integers(0, c_in - sub * pack, size=(1, 3, 2))
    kmap = (base[..., None] + rng.integers(0, sub * pack - 64, size=(1, 3, 2, tile))
            ).reshape(1, 3, 2 * tile).astype(np.int32)
    starts, rel, ok, _ = band_layout_union(jnp.asarray(kmap), c_in, sub, tile,
                                        pack=pack)
    assert bool(ok)
    s = np.asarray(starts)
    r = np.asarray(rel)
    assert np.all(s % 16 == 0)
    km = kmap.reshape(1, 3, 2, tile).transpose(0, 2, 1, 3)
    np.testing.assert_array_equal(km // pack - s[..., None], r >> 2)
    np.testing.assert_array_equal(km % pack, r & 3)


def test_banded_fallback_on_scattered_kmap(rng, monkeypatch):
    """A random (non-banded) kmap must trip the ok flag, and with the lax.cond
    fallback enabled (EGONN_BANDED_FALLBACK semantics) produce EXACTLY the
    plain path's output via the fallback branch."""
    import egonn_tpu.sparse.banded as banded_mod

    monkeypatch.setattr(banded_mod, "FALLBACK", True)
    b, k, c = 2, 8, 512
    kmap = jnp.asarray(rng.integers(0, c + 1, size=(b, k, c)).astype(np.int32))
    feats = jnp.asarray(rng.standard_normal((b, c, 8)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((k, 8, 8)).astype(np.float32))
    _, _, ok, _ = band_layout_union(kmap, c, 384, 128)
    assert not bool(ok)
    got = banded_conv_pallas(feats, kmap, kernel, interpret=True)
    want = _plain_gather_conv(feats, kmap, kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_banded_sentinel_rows_are_zero(rng):
    """Outputs whose kmap entries are all-sentinel must come out exactly 0."""
    b, k, c = 1, 8, 256
    kmap = np.full((b, k, c), c, np.int32)
    kmap[:, :, :128] = rng.integers(0, 16, size=(b, k, 128))  # banded block
    feats = jnp.asarray(rng.standard_normal((b, c, 8)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((k, 8, 8)).astype(np.float32))
    got = np.asarray(banded_conv_pallas(feats, jnp.asarray(kmap), kernel,
                                        interpret=True))
    assert np.all(got[:, 128:] == 0)


def test_banded_epilogue_matches_manual(rng):
    """The fused affine+ReLU+mask epilogue (epi=...) matches the same math
    applied in XLA on the un-fused kernel output (to fma-association ulps)."""
    pyr = _real_pyramid(rng)
    lvl = pyr[1]
    kmap = lvl.kmap_self
    b, c = lvl.mask.shape
    f = 16
    feats = jnp.asarray(
        (rng.standard_normal((b, c, f)) * np.asarray(lvl.mask)[..., None]
         ).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((27, f, f)).astype(np.float32) * 0.2)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, f).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(f).astype(np.float32))
    for relu in (True, False):
        got = banded_conv_pallas(feats, kmap, kernel,
                                 epi=(scale, bias, relu, lvl.mask),
                                 interpret=True)
        raw = banded_conv_pallas(feats, kmap, kernel, interpret=True)
        want = raw * scale + bias
        if relu:
            want = jnp.maximum(want, 0.0)
        want = jnp.where(lvl.mask[..., None], want, 0.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)
        # structure is exact: masked rows are exactly zero
        assert np.all(np.asarray(got)[~np.asarray(lvl.mask)] == 0)


def _bits_from_kmap(kmap, cap, k):
    """Pack a (B, XY*k, C) kernel map's presence pattern into the aligned
    (B, XY, C) bit-field layout of Level.stem_bits."""
    b, kk, c = kmap.shape
    pres = (np.asarray(kmap) != cap).reshape(b, kk // k, k, c)
    return jnp.asarray(
        np.sum(pres.astype(np.int64) << np.arange(k)[None, None, :, None],
               axis=2).astype(np.int32))


def test_stem_lut_matches_ones_conv(rng):
    """stem_lut_conv (interpret) and stem_bits_conv_xla both reproduce the
    kmap validity matmul (sparse_conv_ones) on a real pyramid's level 0."""
    from egonn_tpu.sparse.banded import stem_bits_conv_xla, stem_lut_conv
    from egonn_tpu.sparse.conv import sparse_conv_ones

    pyr = _real_pyramid(rng)
    lvl = pyr[0]
    cap = lvl.mask.shape[-1]
    k = 5
    kmap = lvl.kmap_self
    assert kmap.shape[1] == k ** 3
    bits = _bits_from_kmap(kmap, cap, k)
    f = 16
    kernel = jnp.asarray(rng.standard_normal((k ** 3, 1, f)).astype(np.float32) * 0.2)
    want = sparse_conv_ones(kmap, kernel, cap)
    got_xla = stem_bits_conv_xla(bits, kernel, k)
    np.testing.assert_allclose(np.asarray(got_xla), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    got_lut = stem_lut_conv(bits, kernel, k, interpret=True)
    err = float(jnp.max(jnp.abs(got_lut - want)))
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    assert err / scale < 3e-2, err / scale  # LUT rows are bf16-rounded sums

    # fused epilogue variant: same math as XLA-applied epilogue on the raw out
    s = jnp.asarray(rng.uniform(0.5, 2.0, f).astype(np.float32))
    b = jnp.asarray(rng.standard_normal(f).astype(np.float32))
    got_e = stem_lut_conv(bits, kernel, k, epi=(s, b, True, lvl.mask),
                          interpret=True)
    want_e = jnp.where(lvl.mask[..., None],
                       jnp.maximum(got_lut * s + b, 0.0), 0.0)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               rtol=1e-5, atol=1e-6)


def test_stem_bits_grads_match_autodiff(rng):
    """sparse_conv_ones_bits' custom VJP (scanned dW re-derivation) matches
    autodiff of the plane-unpack einsum."""
    from egonn_tpu.sparse.banded import stem_bits_conv_xla
    from egonn_tpu.sparse.conv import sparse_conv_ones_bits

    pyr = _real_pyramid(rng)
    lvl = pyr[0]
    cap = lvl.mask.shape[-1]
    k = 5
    bits = _bits_from_kmap(lvl.kmap_self, cap, k)
    f = 8
    kernel = jnp.asarray(rng.standard_normal((k ** 3, 1, f)).astype(np.float32) * 0.2)
    cot = jnp.asarray(rng.standard_normal((bits.shape[0], cap, f)).astype(np.float32))
    g1 = jax.grad(lambda w: jnp.sum(sparse_conv_ones_bits(bits, w, k) * cot))(kernel)
    g2 = jax.grad(lambda w: jnp.sum(stem_bits_conv_xla(bits, w, k) * cot))(kernel)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-5)


def test_band_layout_union_alignment(rng):
    kmap = jnp.asarray(rng.integers(0, 64, size=(1, 4, 256)).astype(np.int32))
    starts, rel, ok, _ = band_layout_union(kmap, 512, 128, 128)
    assert bool(ok)
    assert np.all(np.asarray(starts) % 16 == 0)
    assert np.asarray(rel).max() <= 128


def test_banded_lookup_matches_reference(rng):
    """banded_lookup positions == lookup_sorted on real kernel-map queries."""
    from egonn_tpu.sparse.banded import banded_lookup
    from egonn_tpu.sparse.packing import MAXKEY, lookup_sorted, pack_keys
    from egonn_tpu.sparse.pyramid import egonn_pyramid_spec

    pyr = _real_pyramid(rng)
    spec = egonn_pyramid_spec(cap0=1024, num_levels=3, min_out_level=1)
    keys = jax.vmap(lambda c, m: pack_keys(c, m, spec.pack_at(1)))(
        pyr[1].coords, pyr[1].mask)
    keys = jnp.sort(keys, axis=1)
    c = keys.shape[1]
    # queries: keys shifted by small packed deltas (the kernel-map pattern)
    deltas = np.array([0, 1, -1, 2048, -2048], np.int32)  # dz, dy steps
    queries = jnp.stack([jnp.where(keys != MAXKEY, keys + d, MAXKEY)
                         for d in deltas], axis=1)  # (B, K, C)
    pos_ref = jax.vmap(lambda sk, q: lookup_sorted(sk, q, sentinel=c))(keys, queries)
    pos_band, ok = banded_lookup(keys, queries, interpret=True)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(pos_band), np.asarray(pos_ref))


def test_zrun_presence_matches_lookup(rng):
    """zrun_presence bits == per-key membership from lookup_sorted."""
    from egonn_tpu.sparse.banded import zrun_presence
    from egonn_tpu.sparse.packing import MAXKEY, lookup_sorted, pack_keys
    from egonn_tpu.sparse.pyramid import egonn_pyramid_spec

    pyr = _real_pyramid(rng)
    spec = egonn_pyramid_spec(cap0=1024, num_levels=3, min_out_level=1)
    keys = jax.vmap(lambda c, m: pack_keys(c, m, spec.pack_at(1)))(
        pyr[1].coords, pyr[1].mask)
    keys = jnp.sort(keys, axis=1)
    c = keys.shape[1]
    kz = 3
    q_lo = jnp.where(keys != MAXKEY, keys - 1, MAXKEY)[:, None, :]  # (B,1,C)
    bits, ok = zrun_presence(keys, q_lo, kz=kz, interpret=True)
    assert bool(ok)
    for j in range(kz):
        qj = jnp.where(q_lo[:, 0] != MAXKEY, q_lo[:, 0] + j, MAXKEY)
        pos = jax.vmap(lambda sk, q: lookup_sorted(sk, q, sentinel=c))(
            keys, qj[:, None, :])[:, 0]
        present_ref = np.asarray(pos) < c
        present_bits = (np.asarray(bits[:, 0]) >> j) & 1
        np.testing.assert_array_equal(present_bits.astype(bool), present_ref)


def test_banded_dw_matches_gather_backward(rng):
    """The fused banded dW kernel (banded_conv_dw) reproduces the exact XLA
    re-gather backward at bf16 tolerance on a real pyramid's self and down
    kernel maps."""
    from egonn_tpu.sparse.banded import banded_conv_dw
    from egonn_tpu.sparse.conv import _conv_dkernel_gather

    pyr = _real_pyramid(rng)
    for kmap, c_in, lbl in [
        (pyr[1].kmap_self, pyr[1].coords.shape[-1], "self_L1"),
        (pyr[1].kmap_down, pyr[0].coords.shape[-1], "down_L1"),
    ]:
        k_vol = kmap.shape[1]
        c_out = kmap.shape[-1]
        f_in, f_out = 16, 24
        feats = jnp.asarray(rng.standard_normal((2, c_in, f_in)).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((2, c_out, f_out)).astype(np.float32))

        got = banded_conv_dw(feats, kmap, g, interpret=True)
        assert got is not None and got.shape == (k_vol, f_in, f_out), lbl
        # exact backward with bf16-quantized operands (the kernel's numerics)
        want = _conv_dkernel_gather(
            feats.astype(jnp.bfloat16).astype(jnp.float32), kmap,
            g.astype(jnp.bfloat16).astype(jnp.float32))
        err = float(jnp.max(jnp.abs(got - want)))
        scale = float(jnp.max(jnp.abs(want))) + 1e-9
        assert err / scale < 3e-2, (lbl, err / scale)


def test_banded_dw_packed_window_layout(rng, monkeypatch):
    """With channel packing enabled, the dW layout derives from the forward's
    PACKED window (same drop set); on fitting bands it still matches the exact
    backward."""
    import egonn_tpu.sparse.banded as bd
    from egonn_tpu.sparse.banded import banded_conv_dw
    from egonn_tpu.sparse.conv import _conv_dkernel_gather

    monkeypatch.setattr(bd, "PACK_ENABLED", True)
    pyr = _real_pyramid(rng)
    kmap = pyr[1].kmap_self
    c_in = pyr[1].coords.shape[-1]
    f_in, f_out = 32, 16  # pack = 128 // 32 = 4
    feats = jnp.asarray(rng.standard_normal((2, c_in, f_in)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((2, kmap.shape[-1], f_out)
                                        ).astype(np.float32))
    got = banded_conv_dw(feats, kmap, g, interpret=True)
    want = _conv_dkernel_gather(
        feats.astype(jnp.bfloat16).astype(jnp.float32), kmap,
        g.astype(jnp.bfloat16).astype(jnp.float32))
    err = float(jnp.max(jnp.abs(got - want)))
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    assert err / scale < 3e-2, err / scale


def test_banded_dw_ineligible_returns_none(rng):
    from egonn_tpu.sparse.banded import banded_conv_dw

    feats = jnp.zeros((1, 48, 16), jnp.float32)  # c_in % 16 == 0 but c_out % 128 != 0
    kmap = jnp.zeros((1, 8, 96), jnp.int32)
    g = jnp.zeros((1, 96, 8), jnp.float32)
    assert banded_conv_dw(feats, kmap, g, interpret=True) is None
