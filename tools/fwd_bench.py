"""Forward decomposition bench at bench.py shapes (batch 8 x 65k -> 16k voxels).

Times each slice of the inference hot path separately so perf work targets the
real wall (same tunnel-safe methodology as bench.py: varied inputs, N chained
executions, one device_get):

  quantize      : polar quantize + pack/sort/dedup only
  pyramid       : quantize + full 8-level coordinate pyramid/kernel maps
  forward       : full path (bench.py's measured quantity)
  model_only    : model.apply on a PREBUILT pyramid (forward minus data prep;
                  not additive with the above since quantize/pyramid overlap)

Env: EGONN_FB_ITERS (20), EGONN_FB_BATCH (8), EGONN_FB_ONLY (comma list).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    from egonn_tpu.utils.tunnel import platform_or_cpu_fallback
    platform = platform_or_cpu_fallback()

    import jax
    import jax.numpy as jnp
    from egonn_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache(jax.config)

    from egonn_tpu.models.factory import create_egonn_model
    from egonn_tpu.ops.quantization import PolarQuantizer
    from egonn_tpu.sparse.pyramid import build_pyramid

    b = int(os.environ.get("EGONN_FB_BATCH", "8"))
    iters = int(os.environ.get("EGONN_FB_ITERS", "20"))
    only = os.environ.get("EGONN_FB_ONLY")
    only = set(only.split(",")) if only else None
    num_points, cap0 = 65536, 16384

    class MP:
        model = "egonn"
        quantizer = PolarQuantizer([1.0, 0.3, 0.2])
        cap0 = 16384

    built = create_egonn_model(MP(), cap0=cap0)
    model, quantizer, spec = built.model, built.quantizer, built.pyramid_spec

    rng = np.random.default_rng(0)
    workload = os.environ.get("EGONN_FB_CLOUDS",
                              os.environ.get("EGONN_BENCH_CLOUDS", "legacy"))
    seed_ctr = [0]

    def clouds_np():
        if workload == "lidar":
            from egonn_tpu.data.lidar_sim import lidar_scan_clouds

            seed_ctr[0] += 1
            return lidar_scan_clouds(b, num_points, seed=seed_ctr[0])
        th = rng.uniform(0, 2 * np.pi, (b, num_points))
        rad = np.abs(rng.normal(25, 18, (b, num_points))).clip(2, 80)
        z = rng.uniform(-1, 10, (b, num_points))
        return np.stack([rad * np.cos(th), rad * np.sin(th), z], -1).astype(np.float32)

    clouds = jnp.asarray(clouds_np())
    mask = jnp.ones((b, num_points), bool)

    def quant(c, m):
        return jax.vmap(lambda pc, mm: quantizer.quantize(
            pc, mm, spec.capacities[0], need_index=False))(c, m)

    def mk_pyr(c, m):
        res = quant(c, m)
        return build_pyramid(res.coords_t, res.mask, spec, keys0=res.keys)

    mk_pyr_j = jax.jit(mk_pyr)
    pyr = mk_pyr_j(clouds, mask)
    variables = jax.jit(lambda k, p: model.init(k, p, quantizer, train=False))(
        jax.random.PRNGKey(0), pyr)

    def pyr_checksum(p):
        # depends on EVERY pyramid leaf (coords, masks, kernel maps, up maps,
        # stem bits) so XLA cannot dead-code-eliminate the map construction
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree_util.tree_leaves(p))

    slices = {
        "quantize": jax.jit(lambda c, m: quant(c, m).keys),
        "pyramid": jax.jit(lambda c, m: pyr_checksum(mk_pyr(c, m))),
        # exactly bench.py's measured quantity: (global, sigma) keeps both heads live
        "forward": jax.jit(lambda c, m: (lambda y: (y["global"], y["sigma"]))(
            model.apply(variables, mk_pyr(c, m), quantizer, train=False))),
    }

    variants = [jnp.asarray(clouds_np()) for _ in range(iters)]
    _ = jax.device_get(variants[-1][:1, :1])

    def force(y):
        leaf = jax.tree_util.tree_leaves(y)[0]
        return jax.device_get(jnp.ravel(leaf)[:1])

    out = {}
    for name, fn in slices.items():
        if only and name not in only:
            continue
        _ = force(fn(variants[0], mask))
        t0 = time.perf_counter()
        for v in variants:
            y = fn(v, mask)
        _ = force(y)
        out[name] = (time.perf_counter() - t0) / iters * 1e3

    # model_only: prebuild iters pyramids, then time apply alone
    if only is None or "model_only" in only:
        pyrs = [mk_pyr_j(v, mask) for v in variants]
        app = jax.jit(lambda p: (lambda y: (y["global"], y["sigma"]))(
            model.apply(variables, p, quantizer, train=False)))
        _ = force(app(pyrs[0]))
        t0 = time.perf_counter()
        for p in pyrs:
            y = app(p)
        _ = force(y)
        out["model_only"] = (time.perf_counter() - t0) / iters * 1e3

    print(json.dumps({"platform": platform, "batch": b, "iters": iters,
                      "ms_per_batch": {k: round(v, 2) for k, v in out.items()}}))


if __name__ == "__main__":
    main()
