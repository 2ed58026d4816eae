"""End-to-end model forward tests on small synthetic clouds (CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egonn_tpu.models.factory import create_egonn_model, create_minkloc_model
from egonn_tpu.ops.quantization import PolarQuantizer
from egonn_tpu.sparse.pyramid import PyramidSpec, build_pyramid, egonn_pyramid_spec


class _MP:
    """Minimal ModelParams stand-in."""

    def __init__(self, model="egonn"):
        self.model = model
        self.quantizer = PolarQuantizer([2.0, 1.0, 0.5])
        self.cap0 = 512
        self.output_dim = 256
        self.feature_size = 256
        self.planes = [32, 64, 64]
        self.layers = [1, 1, 1]
        self.num_top_down = 1
        self.conv0_kernel_size = 5
        self.block = "BasicBlock"
        self.pooling = "GeM"


def synth_cloud(rng, n=2048):
    theta = rng.uniform(0, 2 * np.pi, n)
    r = rng.uniform(2, 60, n)
    z = rng.uniform(-2, 8, n)
    return np.stack([r * np.cos(theta), r * np.sin(theta), z], 1).astype(np.float32)


@pytest.fixture(scope="module")
def egonn_forward():
    mp = _MP()
    built = create_egonn_model(mp, cap0=512)
    spec = built.pyramid_spec

    rng = np.random.default_rng(0)
    b = 2
    clouds = np.stack([synth_cloud(rng) for _ in range(b)])

    q = built.quantizer

    @jax.jit
    def quant(pc):
        res = jax.vmap(lambda p: q.quantize(p, jnp.ones(p.shape[0], bool), spec.capacities[0]))(pc)
        return res.coords_t, res.mask

    coords, mask = quant(jnp.asarray(clouds))

    @jax.jit
    def fwd(variables, coords, mask):
        pyr = build_pyramid(coords, mask, spec)
        return built.model.apply(variables, pyr, q, train=False)

    pyr0 = jax.jit(lambda c, m: build_pyramid(c, m, spec))(coords, mask)
    variables = jax.jit(lambda k, p: built.model.init(k, p, q, train=False))(
        jax.random.PRNGKey(0), pyr0
    )
    y = fwd(variables, coords, mask)
    return built, spec, variables, y, coords, mask


@pytest.mark.slow  # compile-heavy golden (suite-time budget)
def test_fused_bn_eval_matches_unfused(egonn_forward, monkeypatch):
    """Eval-mode BN/ReLU epilogue fusion (FUSE_BN_EVAL) changes only the
    op association (x*s' + b' vs (x-m)*rsqrt*s + b): forwards must agree to
    fp tolerance on every output."""
    import egonn_tpu.sparse.conv as sconv

    built, spec, variables, _, coords, mask = egonn_forward
    q = built.quantizer

    def fwd():
        pyr = jax.jit(lambda c, m: build_pyramid(c, m, spec))(coords, mask)
        return built.model.apply(variables, pyr, q, train=False)

    monkeypatch.setattr(sconv, "FUSE_BN_EVAL", True)
    y_fused = fwd()
    monkeypatch.setattr(sconv, "FUSE_BN_EVAL", False)
    y_plain = fwd()
    for key in ("global", "descriptors", "keypoints", "sigma"):
        a, b = np.asarray(y_fused[key]), np.asarray(y_plain[key])
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5, err_msg=key)


def test_egonn_output_shapes(egonn_forward):
    built, spec, variables, y, coords, mask = egonn_forward
    b = coords.shape[0]
    assert y["global"].shape == (b, 256)
    c3 = spec.capacities[3]
    assert y["descriptors"].shape == (b, c3, 128)
    assert y["keypoints"].shape == (b, c3, 3)
    assert y["sigma"].shape == (b, c3, 1)
    assert y["kp_mask"].shape == (b, c3)
    for k in ("global", "descriptors", "keypoints", "sigma"):
        assert np.isfinite(np.asarray(y[k])).all(), k


def test_egonn_local_descriptors_normalized(egonn_forward):
    _, _, _, y, _, _ = egonn_forward
    desc = np.asarray(y["descriptors"])
    m = np.asarray(y["kp_mask"])
    norms = np.linalg.norm(desc[m], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-4)


def test_egonn_sigma_positive(egonn_forward):
    _, _, _, y, _, _ = egonn_forward
    sig = np.asarray(y["sigma"])
    m = np.asarray(y["kp_mask"])
    assert (sig[m] >= 0).all()


def test_egonn_keypoints_near_voxels(egonn_forward):
    # keypoints must lie within their stride-8 polar supervoxel (+/- half size offset)
    built, spec, _, y, coords, mask = egonn_forward
    kp = np.asarray(y["keypoints"])
    m = np.asarray(y["kp_mask"])
    r = np.linalg.norm(kp[m][:, :2], axis=-1)
    assert r.max() < 120.0  # sane range given 60 m clouds + supervoxel size


def test_egonn_param_count(egonn_forward):
    # EgoNN with 27-offset 128x128 block kernels: ~4.7M params (the ME reference
    # has the same kernel shapes (K, in, out))
    built, _, variables, _, _, _ = egonn_forward
    n = sum(x.size for x in jax.tree.leaves(variables["params"]))
    assert 3e6 < n < 8e6, n


def test_minkloc_forward():
    mp = _MP(model="MinkLoc")
    built = create_minkloc_model(mp, cap0=512)
    spec = built.pyramid_spec
    rng = np.random.default_rng(1)
    clouds = np.stack([synth_cloud(rng, 1024)])
    q = built.quantizer
    res = jax.jit(
        jax.vmap(lambda p: q.quantize(p, jnp.ones(p.shape[0], bool), spec.capacities[0]))
    )(jnp.asarray(clouds))
    pyr = jax.jit(lambda c, m: build_pyramid(c, m, spec))(res.coords_t, res.mask)
    variables = jax.jit(lambda k, p: built.model.init(k, p, q, train=False))(
        jax.random.PRNGKey(0), pyr
    )
    y = jax.jit(lambda v, p: built.model.apply(v, p, q, train=False))(variables, pyr)
    assert y["global"].shape == (1, 256)
    assert np.isfinite(np.asarray(y["global"])).all()


def test_minkloc_full_topdown():
    """num_top_down == num_bottom_up: the last lateral comes from conv0
    (reference models/minkfpn.py:54-61,72-73)."""
    mp = _MP(model="MinkLoc")
    mp.num_top_down = 3
    built = create_minkloc_model(mp, cap0=512)
    spec = built.pyramid_spec
    rng = np.random.default_rng(2)
    clouds = np.stack([synth_cloud(rng, 1024)])
    q = built.quantizer
    res = jax.jit(
        jax.vmap(lambda p: q.quantize(p, jnp.ones(p.shape[0], bool), spec.capacities[0]))
    )(jnp.asarray(clouds))
    pyr = jax.jit(lambda c, m: build_pyramid(c, m, spec))(res.coords_t, res.mask)
    variables = jax.jit(lambda k, p: built.model.init(k, p, q, train=False))(
        jax.random.PRNGKey(0), pyr
    )
    y = jax.jit(lambda v, p: built.model.apply(v, p, q, train=False))(variables, pyr)
    assert y["global"].shape == (1, 256)
    assert np.isfinite(np.asarray(y["global"])).all()
