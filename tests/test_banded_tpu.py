"""On-chip validation of the banded kernel engine (skipped off-TPU).

CI runs the interpret-mode parity tests (test_banded.py) on CPU; this module
re-runs the full engine-vs-reference comparison on real TPU hardware at
production shapes — kernel-map positions must be BIT-IDENTICAL to the gather
engine, and the banded conv must match it at the production bf16 matmul pass.

Run: EGONN_TEST_TPU=1 PYTHONPATH=/root/.axon_site:. \
     python -m pytest tests/test_banded_tpu.py -q
(conftest forces the CPU backend unless EGONN_TEST_TPU=1; this module skips
itself when the backend is not a TPU).
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(jax.default_backend() != "tpu",
                       reason="requires real TPU (conftest forces CPU in CI)"),
]


@pytest.fixture(scope="module")
def real_pyramid_pair():
    from egonn_tpu.ops.quantization import PolarQuantizer
    from egonn_tpu.sparse import conv as sconv
    from egonn_tpu.sparse.pyramid import build_pyramid, egonn_pyramid_spec

    b, n, cap0 = 4, 32768, 8192
    rng = np.random.default_rng(0)
    th = rng.uniform(0, 2 * np.pi, (b, n))
    rr = np.abs(rng.normal(25, 18, (b, n))).clip(2, 80)
    z = rng.uniform(-6, 10, (b, n))
    clouds = jnp.asarray(np.stack([rr * np.cos(th), rr * np.sin(th), z], -1
                                  ).astype(np.float32))
    mask = jnp.ones((b, n), bool)
    q = PolarQuantizer([1.0, 0.3, 0.2])
    spec = egonn_pyramid_spec(cap0=cap0, num_levels=7, min_out_level=3)
    res = jax.jit(lambda c, m: jax.vmap(
        lambda pc, mm: q.quantize(pc, mm, cap0, need_index=False))(c, m)
    )(clouds, mask)

    p_banded = jax.jit(lambda c, m, k: build_pyramid(c, m, spec, keys0=k))(
        res.coords_t, res.mask, res.keys)
    sconv.set_banded(False)
    p_ref = jax.jit(lambda c, m, k: build_pyramid(c, m, spec, keys0=k))(
        res.coords_t, res.mask, res.keys)
    sconv.set_banded(True)
    return p_banded, p_ref, spec


def test_kernel_maps_bit_identical(real_pyramid_pair):
    p_banded, p_ref, spec = real_pyramid_pair
    cap0 = spec.capacities[0]
    # level 0 is presence-only under conv0_ones: compare validity patterns
    ref_valid = np.asarray(p_ref[0].kmap_self) < cap0
    np.testing.assert_array_equal(
        np.asarray(p_banded[0].kmap_self) < cap0, ref_valid)
    for l in range(1, spec.num_levels + 1):
        np.testing.assert_array_equal(
            np.asarray(p_banded[l].kmap_self), np.asarray(p_ref[l].kmap_self),
            err_msg=f"self map L{l}")
        np.testing.assert_array_equal(
            np.asarray(p_banded[l].kmap_down), np.asarray(p_ref[l].kmap_down),
            err_msg=f"down map L{l}")
        np.testing.assert_array_equal(
            np.asarray(p_banded[l - 1].up_parent), np.asarray(p_ref[l - 1].up_parent),
            err_msg=f"up map L{l - 1}")


@pytest.mark.parametrize("f,style", [(64, "self"), (32, "self"), (128, "self"),
                                     (32, "down"), (64, "down")])
def test_banded_conv_matches_gather_at_bf16(real_pyramid_pair, f, style):
    """Banded conv vs the exact gather engine across the EgoNN channel
    widths, on self AND down-style maps."""
    from egonn_tpu.sparse.banded import _plain_gather_conv, banded_conv_pallas

    p_banded, _, _ = real_pyramid_pair
    rng = np.random.default_rng(1)
    if style == "self":
        lvl_in, kmap = p_banded[2], p_banded[2].kmap_self
    else:
        lvl_in, kmap = p_banded[2], p_banded[3].kmap_down
    c = lvl_in.coords.shape[-1]
    feats = jnp.asarray(
        (rng.standard_normal((kmap.shape[0], c, f))
         * np.asarray(lvl_in.mask)[..., None]).astype(np.float32))
    k = kmap.shape[1]
    kernel = jnp.asarray(rng.standard_normal((k, f, f)).astype(np.float32) * 0.1)
    got = jax.jit(lambda x: banded_conv_pallas(x, kmap, kernel))(feats)
    # the gather path at default TPU precision also quantizes to bf16, so the
    # two engines agree to float equality up to accumulation order
    want = jax.jit(lambda x: _plain_gather_conv(x, kmap, kernel))(feats)
    err = float(jnp.max(jnp.abs(got - want)))
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    assert err / scale < 3e-3, err / scale


def test_banded_conv_epilogue_on_chip(real_pyramid_pair):
    """The fused affine+ReLU+mask epilogue (FUSE_BN_EVAL path) matches the
    same math applied in XLA on the un-fused on-chip kernel output; masked
    rows come out exactly zero."""
    from egonn_tpu.sparse.banded import banded_conv_pallas

    p_banded, _, _ = real_pyramid_pair
    lvl = p_banded[2]
    kmap = lvl.kmap_self
    rng = np.random.default_rng(2)
    b, c = lvl.mask.shape
    f = 64
    feats = jnp.asarray(
        (rng.standard_normal((b, c, f))
         * np.asarray(lvl.mask)[..., None]).astype(np.float32))
    kernel = jnp.asarray(
        rng.standard_normal((kmap.shape[1], f, f)).astype(np.float32) * 0.1)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, f).astype(np.float32))
    bias = jnp.asarray(rng.standard_normal(f).astype(np.float32))
    got = jax.jit(lambda x: banded_conv_pallas(
        x, kmap, kernel, epi=(scale, bias, True, lvl.mask)))(feats)
    raw = jax.jit(lambda x: banded_conv_pallas(x, kmap, kernel))(feats)
    want = jnp.where(lvl.mask[..., None],
                     jnp.maximum(raw * scale + bias, 0.0), 0.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
    assert np.all(np.asarray(got)[~np.asarray(lvl.mask)] == 0)


def test_banded_dw_on_chip(real_pyramid_pair):
    """Fused banded dW kernel vs the exact XLA re-gather backward on real
    Mosaic at production-like shapes (self + down maps)."""
    from egonn_tpu.sparse.banded import banded_conv_dw
    from egonn_tpu.sparse.conv import _conv_dkernel_gather

    pyr = real_pyramid_pair[0] if isinstance(real_pyramid_pair, tuple) \
        else real_pyramid_pair
    rng = np.random.default_rng(13)
    for kmap, c_in in [(pyr[1].kmap_self, pyr[1].coords.shape[-1]),
                       (pyr[1].kmap_down, pyr[0].coords.shape[-1])]:
        b = kmap.shape[0]
        c_out = kmap.shape[-1]
        f_in, f_out = 32, 64
        feats = jnp.asarray(rng.standard_normal((b, c_in, f_in)
                                                ).astype(np.float32))
        g = jnp.asarray(rng.standard_normal((b, c_out, f_out)
                                            ).astype(np.float32))
        got = jax.device_get(jax.jit(
            lambda f, m, gg: banded_conv_dw(f, m, gg))(feats, kmap, g))
        want = jax.device_get(jax.jit(lambda f, m, gg: _conv_dkernel_gather(
            f.astype(jnp.bfloat16).astype(jnp.float32), m,
            gg.astype(jnp.bfloat16).astype(jnp.float32)))(feats, kmap, g))
        err = np.max(np.abs(got - want))
        scale = np.max(np.abs(want)) + 1e-9
        assert err / scale < 3e-2, err / scale
