"""Smoke tests for the generic sparse ResNet scaffolding."""
import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.models.resnet import ResNetBase
from egonn_tpu.sparse.pyramid import PyramidSpec, build_pyramid


def test_resnet_basic_and_bottleneck(rng):
    cap = 128
    coords = rng.integers(-4, 5, size=(1, 3, cap)).astype(np.int32)
    mask = np.ones((1, cap), bool)
    spec = PyramidSpec(
        capacities=(cap,) * 5,
        conv0_kernel_size=3,
        self_levels=(1, 2, 3, 4),
        up_levels=(),
    )
    pyr = jax.jit(lambda c, m: build_pyramid(c, m, spec))(
        jnp.asarray(coords), jnp.asarray(mask)
    )
    feats0 = jnp.asarray(rng.standard_normal((1, cap, 4)).astype(np.float32))
    for block, exp in (("BasicBlock", 1), ("Bottleneck", 4), ("SEBottleneck", 4)):
        net = ResNetBase(in_channels=4, planes=(8, 16, 16, 32), layers=(1, 1, 1, 1),
                         block=block, conv0_kernel_size=3, init_dim=8)
        variables = jax.jit(lambda k, p, f: net.init(k, p, f, False))(
            jax.random.PRNGKey(0), pyr, feats0
        )
        out = jax.jit(lambda v, p, f: net.apply(v, p, f, False))(variables, pyr, feats0)
        assert set(out) == {1, 2, 3, 4}
        assert out[4].shape == (1, cap, 32 * exp)
        assert np.isfinite(np.asarray(out[4])).all()
