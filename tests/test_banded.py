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


def test_banded_dw_ineligible_returns_none(rng):
    from egonn_tpu.sparse.banded import banded_conv_dw

    feats = jnp.zeros((1, 48, 16), jnp.float32)  # c_in % 16 == 0 but c_out % 128 != 0
    kmap = jnp.zeros((1, 8, 96), jnp.int32)
    g = jnp.zeros((1, 96, 8), jnp.float32)
    assert banded_conv_dw(feats, kmap, g, interpret=True) is None


def test_plain_tdown_matches_kmap_conv(rng):
    """The transposed down conv (up-map driven) computes the SAME function as
    the kmap_down gather conv: each (parent, slot) has at most one child."""
    from egonn_tpu.sparse.banded import plain_tdown

    pyr = _real_pyramid(rng)
    fine, coarse = pyr[0], pyr[1]
    c_fine = fine.coords.shape[-1]
    c_coarse = coarse.coords.shape[-1]
    f_in, f_out = 16, 24
    feats = jnp.asarray(
        (rng.standard_normal((2, c_fine, f_in))
         * np.asarray(fine.mask)[..., None]).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((8, f_in, f_out)).astype(np.float32) * 0.3)

    got = plain_tdown(feats, fine.up_parent, fine.up_koffset, kernel, c_coarse)
    want = _plain_gather_conv(feats, coarse.kmap_down, kernel)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow  # compile-heavy golden (suite-time budget)
def test_banded_tdown_matches_kmap_conv(rng):
    """Pallas (interpret) transposed down conv == the banded kmap_down conv
    at bf16 numerics, including the fused epilogue."""
    from egonn_tpu.sparse.banded import banded_tdown_pallas, tdown_layout

    pyr = _real_pyramid(rng)
    fine, coarse = pyr[0], pyr[1]
    c_fine = fine.coords.shape[-1]
    c_coarse = coarse.coords.shape[-1]
    f_in, f_out = 16, 24
    feats = jnp.asarray(
        (rng.standard_normal((2, c_fine, f_in))
         * np.asarray(fine.mask)[..., None]).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((8, f_in, f_out)).astype(np.float32) * 0.3)

    _, ok = tdown_layout(fine.up_parent, c_coarse, min(512, c_fine), 128)
    assert bool(ok), "real pyramid up-map hulls must fit the window"

    got = banded_tdown_pallas(feats, fine.up_parent, fine.up_koffset, kernel,
                              c_coarse, coarse.mask, interpret=True)
    want = banded_conv_pallas(feats, coarse.kmap_down, kernel, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-2, atol=1e-4)

    # fused epilogue parity (affine + relu + mask)
    scale = jnp.asarray(rng.uniform(0.5, 1.5, (f_out,)).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal((f_out,)).astype(np.float32))
    epi = (scale, bias, True, coarse.mask)
    got_e = banded_tdown_pallas(feats, fine.up_parent, fine.up_koffset, kernel,
                                c_coarse, coarse.mask, epi=epi, interpret=True)
    want_e = jnp.where(coarse.mask[..., None],
                       jnp.maximum(want * scale + bias, 0.0), 0.0)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               rtol=3e-2, atol=1e-4)


@pytest.mark.slow  # compile-heavy golden (suite-time budget)
def test_onehot_variants_bit_identical(rng, monkeypatch):
    """EGONN_OH_CENTER (center-offset identity for self maps) must be
    BIT-identical to the baseline one-hot kernel on a real self map — forward
    and offset-reversed (the custom-VJP backward's view).  (The bf16 one-hot
    compare variant was removed: the v5e VPU has no native bf16 vector
    compare — Mosaic "Target does not support this comparison".)"""
    from egonn_tpu.sparse import banded

    pyr = _real_pyramid(rng)
    lvl = pyr[1]
    kmap = lvl.kmap_self
    c = kmap.shape[-1]
    f = 16
    feats = jnp.asarray(
        (rng.standard_normal((2, c, f)) * np.asarray(lvl.mask)[..., None]
         ).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal((27, f, f)).astype(np.float32) * 0.2)

    monkeypatch.setattr(banded, "OH_CENTER", False)
    base = banded_conv_pallas(feats, kmap, kernel, self_map=True, interpret=True)

    monkeypatch.setattr(banded, "OH_CENTER", True)
    got_ct = banded_conv_pallas(feats, kmap, kernel, self_map=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(got_ct))

    # offset-reversed self map (the custom-VJP backward's view) stays exact too
    base_r = None
    for ct in (False, True):
        monkeypatch.setattr(banded, "OH_CENTER", ct)
        out = banded_conv_pallas(feats, kmap[:, ::-1, :], kernel,
                                 self_map=True, interpret=True)
        if base_r is None:
            base_r = out
        else:
            np.testing.assert_array_equal(np.asarray(base_r), np.asarray(out))
