"""Rotation-robustness evaluation CLI.

Parity with reference eval/evaluate_with_rotations.py: rotates query clouds
0..180 deg in 10-deg steps about +z and reports Recall@N per rotation; results
pickled next to the eval set.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser(description="Rotation-robustness evaluation")
    parser.add_argument("--dataset_root", type=str, required=True)
    parser.add_argument("--dataset_type", type=str, required=True,
                        choices=["mulran", "southbay", "kitti", "synthetic"])
    parser.add_argument("--eval_set_pickle", "--eval_set", dest="eval_set_pickle",
                        type=str, required=True)
    parser.add_argument("--model_config", type=str, required=True)
    parser.add_argument("--weights", type=str, default=None)
    parser.add_argument("--radius", nargs="+", type=float, default=[5, 20],
                        help="True Positive thresholds in meters")
    parser.add_argument("--n_samples", type=int, default=None,
                        help="Number of elements sampled from the query "
                             "sequence (deterministic stride sampling)")
    parser.add_argument("--step_deg", type=float, default=10.0)
    parser.add_argument("--max_deg", type=float, default=180.0)
    parser.add_argument("--out", type=str, default=None)
    parser.add_argument("--dp", action="store_true",
                        help="Shard the rotation sweep's embedding batches "
                             "over all local devices (data-parallel mesh)")
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args()

    import numpy as np
    import jax

    from egonn_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache(jax.config)

    from egonn_tpu.config import ModelParams
    from egonn_tpu.eval.rotations import RotationEvaluator
    from egonn_tpu.models.factory import model_factory
    from egonn_tpu.train.state import load_checkpoint

    model_params = ModelParams(args.model_config)
    built = model_factory(model_params)
    if args.weights:
        state, step = load_checkpoint(args.weights)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        print(f"Loaded checkpoint step {step}")
    else:
        raise SystemExit("--weights is required")

    mesh = None
    if args.dp:
        from egonn_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()
        print(f"rotation sweep sharded over {mesh.size} devices")

    thetas = list(np.arange(0.0, args.max_deg + 1e-6, args.step_deg))
    ev = RotationEvaluator(args.dataset_root, args.dataset_type,
                           args.eval_set_pickle, built,
                           num_points=model_params.num_points,
                           thetas_deg=thetas, radius=args.radius,
                           n_samples=args.n_samples, debug=args.debug,
                           mesh=mesh)
    results = ev.evaluate(variables)
    for theta, m in results.items():
        r = m["recall"]
        parts = "  ".join(f"r={rad}m R@1={rec[0]:.3f}" for rad, rec in r.items())
        print(f"theta={theta:5.1f} deg: {parts}")

    out = args.out or os.path.join(
        args.dataset_root, f"rotations_{os.path.basename(args.eval_set_pickle)}")
    with open(out, "wb") as f:
        pickle.dump(results, f)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
