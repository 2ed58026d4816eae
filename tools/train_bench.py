"""Train-step decomposition bench at the reference training envelope.

Times, on the current backend (TPU via axon, or CPU), each slice of the
combined train step at the published EgoNN config scale — batch 128 global +
8 local pairs, 65k-point clouds (reference config/config_egonn.txt) — so the
backward/optimizer surcharge over pure forward compute is attributable:

  quantize+pyramid : device preprocess only (the data-side floor)
  forward          : all three model forwards + both losses, no grad
  global_grad      : value_and_grad of the global half only
  full_step        : fwd+bwd+optimizer on global+local (do_train's step)

Tunnel-safe methodology as bench.py: varied inputs per iteration, N chained
executions, one device_get at the end.

Env knobs: EGONN_TB_BATCH (128), EGONN_TB_LOCAL (8), EGONN_TB_POINTS (65536),
EGONN_TB_ITERS (3), EGONN_TB_ONLY (comma list of slice names).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


_SEED = [0]


def _clouds(rng, b, n):
    if os.environ.get("EGONN_TB_CLOUDS",
                      os.environ.get("EGONN_BENCH_CLOUDS", "legacy")) == "lidar":
        from egonn_tpu.data.lidar_sim import lidar_scan_clouds

        _SEED[0] += 1
        return lidar_scan_clouds(b, n, seed=_SEED[0])
    th = rng.uniform(0, 2 * np.pi, (b, n))
    rad = np.abs(rng.normal(25, 18, (b, n))).clip(2, 80)
    z = rng.uniform(-1, 10, (b, n))
    return np.stack([rad * np.cos(th), rad * np.sin(th), z], -1).astype(np.float32)


def main():
    from egonn_tpu.utils.tunnel import platform_or_cpu_fallback
    platform = platform_or_cpu_fallback()

    import jax
    import jax.numpy as jnp

    from egonn_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache(jax.config)

    from egonn_tpu.config import TrainingParams
    from egonn_tpu.models.factory import model_factory
    from egonn_tpu.data.pipeline import device_preprocess_global
    from egonn_tpu.sparse.pyramid import build_pyramid
    from egonn_tpu.train.state import init_train_state, make_optimizer
    from egonn_tpu.train.trainer import make_train_step

    b = int(os.environ.get("EGONN_TB_BATCH", "128"))
    lb = int(os.environ.get("EGONN_TB_LOCAL", "8"))
    n = int(os.environ.get("EGONN_TB_POINTS", "65536"))
    iters = int(os.environ.get("EGONN_TB_ITERS", "3"))
    only = os.environ.get("EGONN_TB_ONLY")
    only = set(only.split(",")) if only else None

    params = TrainingParams("config/config_egonn.txt", "model_configs/egonn.txt",
                            require_dataset=False)
    params.model_params.cap0 = 16384
    params.model_params.num_points = n
    built = model_factory(params.model_params, cap0=16384)
    q, spec, model = built.quantizer, built.pyramid_spec, built.model

    tx = make_optimizer(params)
    step_fn, gl_loss_fn, loc_loss_fn = make_train_step(built, params, tx)

    rng = np.random.default_rng(0)
    g = {
        "clouds": jnp.asarray(_clouds(rng, b, n)),
        "point_mask": jnp.ones((b, n), bool),
        "positives_mask": jnp.asarray(
            np.kron(np.eye(b // 2, dtype=bool), np.ones((2, 2), bool))
            & ~np.eye(b, dtype=bool)),
        "negatives_mask": jnp.asarray(
            ~np.kron(np.eye(b // 2, dtype=bool), np.ones((2, 2), bool))),
    }
    l = {
        "anc_clouds": jnp.asarray(_clouds(rng, lb, n)),
        "anc_mask": jnp.ones((lb, n), bool),
        "pos_clouds": jnp.asarray(_clouds(rng, lb, n)),
        "pos_mask": jnp.ones((lb, n), bool),
        "t_gt": jnp.tile(jnp.eye(4, dtype=jnp.float32), (lb, 1, 1)),
    }

    res = jax.vmap(lambda pc, m: q.quantize(pc, m, spec.capacities[0], need_index=False))(
        g["clouds"][:2], g["point_mask"][:2])
    pyr0 = jax.jit(lambda r: build_pyramid(r.coords_t, r.mask, spec, keys0=r.keys))(res)
    variables = jax.jit(lambda k, p: model.init(k, p, q, train=False))(
        jax.random.PRNGKey(0), pyr0)
    state = init_train_state(variables, tx)

    key = jax.random.PRNGKey(1)

    @jax.jit
    def preprocess(clouds, mask, rng_key):
        p = device_preprocess_global(clouds, mask, q, spec, rng_key=rng_key,
                                     aug_mode=params.aug_mode)
        # depend on every pyramid leaf so nothing is dead-code-eliminated
        return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(p))

    @jax.jit
    def forward_only(st, g, l, rng_key):
        vs = {"params": st.params, "batch_stats": st.batch_stats}
        pg = device_preprocess_global(g["clouds"], g["point_mask"], q, spec,
                                      rng_key=rng_key, aug_mode=params.aug_mode)
        yg = model.apply(vs, pg, q, train=False)
        gl, _ = gl_loss_fn(yg["global"], g["positives_mask"], g["negatives_mask"])
        pa = device_preprocess_global(l["anc_clouds"], l["anc_mask"], q, spec)
        y1 = model.apply(vs, pa, q, train=False)
        pp = device_preprocess_global(l["pos_clouds"], l["pos_mask"], q, spec)
        y2 = model.apply(vs, pp, q, train=False)
        ll, _ = loc_loss_fn(
            l["anc_clouds"], l["anc_mask"], y1["keypoints"], y1["sigma"],
            y1["descriptors"], y1["kp_mask"], l["pos_clouds"], l["pos_mask"],
            y2["keypoints"], y2["sigma"], y2["descriptors"], y2["kp_mask"],
            l["t_gt"])
        return gl + ll

    @jax.jit
    def global_grad(st, g, rng_key):
        def loss_fn(p):
            vs = {"params": p, "batch_stats": st.batch_stats}
            pg = device_preprocess_global(g["clouds"], g["point_mask"], q, spec,
                                          rng_key=rng_key, aug_mode=params.aug_mode)
            yg, _ = model.apply(vs, pg, q, train=True, mutable=["batch_stats"])
            gl, _ = gl_loss_fn(yg["global"], g["positives_mask"], g["negatives_mask"])
            return gl
        val, grads = jax.value_and_grad(loss_fn)(st.params)
        return val, jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), grads, 0.0)

    def time_slice(name, fn, args_maker):
        # args_maker: callable(i) -> args tuple (varied per iteration)
        out = fn(*args_maker(0))
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
        arglist = [args_maker(i + 1) for i in range(iters)]
        _ = jax.device_get(jax.tree_util.tree_leaves(arglist[-1])[0][:1])
        t0 = time.perf_counter()
        for a in arglist:
            out = fn(*a)
        _ = jax.device_get(jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / iters
        print(json.dumps({"slice": name, "ms": round(dt * 1e3, 1),
                          "platform": platform}))
        return dt

    def vary(i):
        return jnp.asarray(np.float32(i) * 1e-4)

    results = {}
    if only is None or "quantize" in only:
        results["quantize"] = time_slice(
            "quantize+pyramid", preprocess,
            lambda i: (g["clouds"] + vary(i), g["point_mask"], jax.random.fold_in(key, i)))
    if only is None or "forward" in only:
        results["forward"] = time_slice(
            "forward", forward_only,
            lambda i: (state, {**g, "clouds": g["clouds"] + vary(i)}, l,
                       jax.random.fold_in(key, i)))
    if only is None or "global_grad" in only:
        results["global_grad"] = time_slice(
            "global_grad", global_grad,
            lambda i: (state, {**g, "clouds": g["clouds"] + vary(i)},
                       jax.random.fold_in(key, i)))
    if only is None or "full" in only:
        results["full"] = time_slice(
            "full_step", lambda st, gg, ll, k: step_fn(st, gg, ll, k, 1e-3, True)[1]["loss"],
            lambda i: (state, {**g, "clouds": g["clouds"] + vary(i)}, l,
                       jax.random.fold_in(key, i)))
    print(json.dumps({"summary": {k: round(v * 1e3, 1) for k, v in results.items()},
                      "batch": b, "local": lb, "points": n, "platform": platform}))


if __name__ == "__main__":
    main()
