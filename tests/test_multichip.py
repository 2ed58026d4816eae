"""Sharded-training tests on a real 8-CPU-device mesh.

conftest.py forces ``jax_platforms=cpu`` + ``jax_num_cpu_devices=8`` before
backend init, so these tests exercise actual multi-device sharding (grad psum,
embedding all-gather for the global miner) — not a single-device simulation.
"""
import pytest

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from egonn_tpu.config import TrainingParams
from egonn_tpu.models.factory import model_factory
from egonn_tpu.parallel.mesh import make_mesh
from egonn_tpu.sparse.pyramid import build_pyramid
from egonn_tpu.train.state import init_train_state, make_optimizer
from egonn_tpu.train.trainer import make_train_step


def test_eight_cpu_devices_present():
    devs = jax.devices()
    assert len(devs) == 8, f"conftest should yield 8 CPU devices, got {len(devs)}"
    assert devs[0].platform == "cpu"


def _clouds(b, n, seed):
    r = np.random.default_rng(seed)
    th = r.uniform(0, 2 * np.pi, (b, n))
    rad = r.uniform(2, 50, (b, n))
    z = r.uniform(-1, 8, (b, n))
    return np.stack([rad * np.cos(th), rad * np.sin(th), z], -1).astype(np.float32)


def test_sharded_train_step_matches_single_device():
    """The dp-sharded combined step must produce the same loss and parameter
    update as the identical step run unsharded on one device."""
    n_dev, n = 8, 512
    params = TrainingParams("config/config_egonn.txt", "model_configs/egonn.txt",
                            require_dataset=False)
    params.model_params.cap0 = 256
    params.model_params.num_points = n
    built = model_factory(params.model_params, cap0=256)
    q, spec, model = built.quantizer, built.pyramid_spec, built.model

    tx = make_optimizer(params)
    step_fn, _, _ = make_train_step(built, params, tx)

    c2 = jnp.asarray(_clouds(2, n, 0))
    res = jax.vmap(lambda pc, mm: q.quantize(pc, mm, spec.capacities[0], need_index=False))(
        c2, jnp.ones((2, n), bool))
    pyr = jax.jit(lambda r: build_pyramid(r.coords_t, r.mask, spec, keys0=r.keys))(res)
    variables = jax.jit(lambda k, p: model.init(k, p, q, train=False))(
        jax.random.PRNGKey(0), pyr)
    state = init_train_state(variables, tx)

    b, lb = 2 * n_dev, n_dev
    pos = np.zeros((b, b), bool)
    for i in range(0, b, 2):
        pos[i, i + 1] = pos[i + 1, i] = True
    g = {"clouds": _clouds(b, n, 1), "point_mask": np.ones((b, n), bool),
         "positives_mask": pos, "negatives_mask": ~pos & ~np.eye(b, dtype=bool)}
    l = {"anc_clouds": _clouds(lb, n, 2), "anc_mask": np.ones((lb, n), bool),
         "pos_clouds": _clouds(lb, n, 2), "pos_mask": np.ones((lb, n), bool),
         "t_gt": np.tile(np.eye(4, dtype=np.float32), (lb, 1, 1))}

    # single device run
    s1, stats1 = step_fn(state, g, l, jax.random.PRNGKey(3), jnp.float32(1e-3),
                         train=True)
    loss1 = float(stats1["loss"])

    # sharded run: batch axis over the 8-device mesh, state replicated
    mesh = make_mesh(n_dev)
    shard = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    g_s = {k: jax.device_put(v, shard if k in ("clouds", "point_mask") else repl)
           for k, v in g.items()}
    l_s = {k: jax.device_put(v, shard) for k, v in l.items()}
    state_r = jax.tree.map(lambda x: jax.device_put(x, repl), state)
    with mesh:
        s2, stats2 = step_fn(state_r, g_s, l_s, jax.random.PRNGKey(3),
                             jnp.float32(1e-3), train=True)
    loss2 = float(stats2["loss"])

    assert np.isfinite(loss1) and np.isfinite(loss2)
    np.testing.assert_allclose(loss1, loss2, rtol=1e-4)
    # Parameter updates agree to Adam noise scale: cross-device reduction order
    # shifts grads at ulp level and first-step Adam (~sign(g)*lr) amplifies
    # near-zero grads, so exact equality is not achievable; a wrong sharding
    # (e.g. per-shard miner) would shift the loss above and blow well past this.
    diffs = jax.tree.map(lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
                         s1.params, jax.tree.map(np.asarray, s2.params))
    assert max(jax.tree.leaves(diffs)) < 5e-3
