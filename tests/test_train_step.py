"""One combined train step (global triplet + local 6DoF halves) on tiny shapes —
guards the full training path (preprocess -> forwards -> losses -> custom-VJP
backward -> optimizer) in CI."""
import pytest

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'

import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.config import TrainingParams
from egonn_tpu.models.factory import model_factory
from egonn_tpu.sparse.pyramid import build_pyramid
from egonn_tpu.train.state import init_train_state, make_optimizer
from egonn_tpu.train.trainer import make_train_step


def test_train_step_runs_and_updates(rng):
    params = TrainingParams("config/config_egonn.txt", "model_configs/egonn.txt",
                            require_dataset=False)
    params.model_params.cap0 = 512
    params.model_params.num_points = 1024
    built = model_factory(params.model_params, cap0=512)
    n = 1024

    def clouds(b, seed):
        r = np.random.default_rng(seed)
        th = r.uniform(0, 2 * np.pi, (b, n))
        rad = r.uniform(2, 50, (b, n))
        z = r.uniform(-1, 8, (b, n))
        return np.stack([rad * np.cos(th), rad * np.sin(th), z], -1).astype(np.float32)

    tx = make_optimizer(params)
    step_fn, _, _ = make_train_step(built, params, tx)

    q, spec, model = built.quantizer, built.pyramid_spec, built.model
    c2 = jnp.asarray(clouds(2, 0))
    res = jax.vmap(lambda pc, mm: q.quantize(pc, mm, spec.capacities[0], need_index=False))(
        c2, jnp.ones((2, n), bool))
    pyr = jax.jit(lambda r: build_pyramid(r.coords_t, r.mask, spec, keys0=r.keys))(res)
    variables = jax.jit(lambda k, p: model.init(k, p, q, train=False))(
        jax.random.PRNGKey(0), pyr)
    state = init_train_state(variables, tx)

    b, lb = 4, 2
    pos = np.zeros((b, b), bool)
    for i in range(0, b, 2):
        pos[i, i + 1] = pos[i + 1, i] = True
    g = {"clouds": clouds(b, 1), "point_mask": np.ones((b, n), bool),
         "positives_mask": pos, "negatives_mask": ~pos & ~np.eye(b, dtype=bool)}
    l = {"anc_clouds": clouds(lb, 2), "anc_mask": np.ones((lb, n), bool),
         "pos_clouds": clouds(lb, 2), "pos_mask": np.ones((lb, n), bool),
         "t_gt": np.tile(np.eye(4, dtype=np.float32), (lb, 1, 1))}

    state2, stats = step_fn(state, g, l, jax.random.PRNGKey(3), jnp.float32(1e-3),
                            train=True)
    assert np.isfinite(float(stats["loss"]))
    assert np.isfinite(float(stats["local_loss"]))
    # parameters actually changed
    d = jax.tree.map(lambda a, b_: float(jnp.max(jnp.abs(a - b_))),
                     state.params, state2.params)
    assert max(jax.tree.leaves(d)) > 0
    # all grads were finite: another step from the new state also works
    state3, stats3 = step_fn(state2, g, l, jax.random.PRNGKey(4), jnp.float32(1e-3),
                             train=True)
    assert np.isfinite(float(stats3["loss"]))
    # eval mode runs without mutating state
    _, stats_eval = step_fn(state3, g, l, jax.random.PRNGKey(5), jnp.float32(1e-3),
                            train=False)
    assert np.isfinite(float(stats_eval["loss"]))
    # VAL PARITY (reference datasets/dataset_utils.py:24-27: global_val has NO
    # transform): the val step must not augment, so two different step rngs
    # must produce bit-identical stats
    _, stats_eval2 = step_fn(state3, g, l, jax.random.PRNGKey(99),
                             jnp.float32(1e-3), train=False)
    assert float(stats_eval["global_loss"]) == float(stats_eval2["global_loss"])
    assert float(stats_eval["loss"]) == float(stats_eval2["loss"])
    # the headline "loss" stat is the TOTAL (global + local), not just global
    assert float(stats_eval["loss"]) == pytest.approx(
        float(stats_eval["global_loss"]) + float(stats_eval["local_loss"]),
        rel=1e-5)
