"""Evaluate EgoNN / MinkLoc models — CLI-compatible with the reference
eval/evaluate.py.

Usage:
    python evaluate.py --dataset_root <root> --dataset_type mulran \
        --eval_set test_Sejong01_Sejong02.pickle \
        --model_config model_configs/egonn.txt --weights <ckpt_dir> \
        [--radius 5 20] [--n_k 128 256] [--icp_refine]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _mesh(args):
    if not args.dp:
        return None
    from egonn_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    print(f"evaluation sharded over {mesh.size} devices")
    return mesh


def main():
    parser = argparse.ArgumentParser(description="Evaluate model on a dataset")
    parser.add_argument("--dataset_root", type=str, required=True)
    parser.add_argument("--dataset_type", type=str, required=True,
                        choices=["mulran", "southbay", "kitti", "synthetic"])
    parser.add_argument("--eval_set_pickle", "--eval_set", dest="eval_set_pickle",
                        type=str, required=True)
    parser.add_argument("--model_config", type=str, required=True)
    parser.add_argument("--weights", type=str, default=None,
                        help="Checkpoint directory (orbax)")
    parser.add_argument("--radius", nargs="+", type=float, default=[5, 20])
    parser.add_argument("--n_k", nargs="+", type=int, default=[128])
    parser.add_argument("--icp_refine", action="store_true")
    parser.add_argument("--icp_point2plane", action="store_true",
                        help="Use point-to-plane ICP for the GT refinement "
                             "(reference misc/point_clouds.py:52-60)")
    parser.add_argument("--ransac_hypotheses", type=int, default=1024,
                        help="Parallel RANSAC hypotheses; 10240 matches the "
                             "reference's 10k-iteration Open3D budget "
                             "(eval/evaluate.py:396)")
    parser.add_argument("--ignore_keypoint_regressor", action="store_true",
                        help="Ablation: keypoints at supervoxel centres "
                             "(reference eval/evaluate.py:468-469)")
    parser.add_argument("--ignore_keypoint_saliency", action="store_true",
                        help="Ablation: select n_k RANDOM keypoints instead of "
                             "lowest-sigma (reference eval/evaluate.py:354-357)")
    parser.add_argument("--n_samples", type=int, default=None,
                        help="Number of elements sampled from the query "
                             "sequence (reference eval/evaluate.py:421; "
                             "deterministic stride sampling here)")
    parser.add_argument("--global_only", action="store_true",
                        help="Skip the 6DoF local evaluation")
    parser.add_argument("--dp", action="store_true",
                        help="Shard embedding batches over all local devices "
                             "(data-parallel mesh)")
    parser.add_argument("--debug", action="store_true")
    args = parser.parse_args()

    import jax

    from egonn_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache(jax.config)

    from egonn_tpu.config import ModelParams
    from egonn_tpu.eval.evaluator import Evaluator, GLEvaluator
    from egonn_tpu.models.factory import model_factory
    from egonn_tpu.train.state import load_checkpoint

    from egonn_tpu.data.pipeline import resolve_num_points

    model_params = ModelParams(args.model_config)
    model_params.num_points = resolve_num_points(model_params, args.dataset_type)
    model_params.num_points_explicit = True  # resolved; downstream uses as-is
    model_params.print()
    built = model_factory(model_params)
    if args.ignore_keypoint_regressor:
        import dataclasses

        built = dataclasses.replace(
            built, model=built.model.clone(ignore_keypoint_regressor=True))
        print("Ignore keypoints regressor: True")

    if args.weights and args.weights.endswith((".pth", ".pt")):
        # reference torch checkpoint (README.md:122-125): convert transparently
        # so `evaluate.py --weights model_egonn_20210916_1104.pth` is the
        # one-command parity check
        from egonn_tpu.utils.checkpoint_convert import load_reference_checkpoint

        variables = load_reference_checkpoint(args.weights,
                                              model=model_params.model)
        print(f"Converted reference torch checkpoint {args.weights} "
              f"({model_params.model} layout)")
    elif args.weights:
        state, step = load_checkpoint(args.weights)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        print(f"Loaded checkpoint step {step} from {args.weights}")
    else:
        # random init (e.g. smoke evaluation)
        import jax.numpy as jnp
        import numpy as np

        from egonn_tpu.sparse.pyramid import build_pyramid

        n = model_params.num_points
        clouds = jnp.asarray(np.zeros((1, n, 3), np.float32))
        mask = jnp.zeros((1, n), bool)
        res = jax.vmap(
            lambda pc, mm: built.quantizer.quantize(pc, mm, built.pyramid_spec.capacities[0])
        )(clouds, mask)
        pyr = jax.jit(lambda c, m: build_pyramid(c, m, built.pyramid_spec))(
            res.coords_t, res.mask
        )
        variables = jax.jit(
            lambda k, p: built.model.init(k, p, built.quantizer, train=False)
        )(jax.random.PRNGKey(0), pyr)
        print("WARNING: evaluating a randomly initialized model (no --weights)")

    if args.global_only or built.model_type != "egonn":
        ev = Evaluator(args.dataset_root, args.dataset_type, args.eval_set_pickle,
                       built, num_points=model_params.num_points,
                       radius=args.radius, n_samples=args.n_samples,
                       debug=args.debug, mesh=_mesh(args))
        metrics = ev.evaluate(variables)
        for r, rec in metrics["recall"].items():
            print(f"Radius {r} m  Recall@1: {rec[0]:.4f}  Recall@5: {rec[min(4, len(rec)-1)]:.4f}  "
                  f"1%: {metrics['one_percent_recall'][r]:.4f}")
    else:
        ev = GLEvaluator(args.dataset_root, args.dataset_type, args.eval_set_pickle,
                         built, num_points=model_params.num_points,
                         radius=args.radius, n_k=args.n_k,
                         icp_refine=args.icp_refine,
                         icp_point2plane=args.icp_point2plane, debug=args.debug,
                         n_hypotheses=args.ransac_hypotheses,
                         n_samples=args.n_samples,
                         ignore_keypoint_saliency=args.ignore_keypoint_saliency,
                         mesh=_mesh(args))
        global_metrics, local_metrics = ev.evaluate(variables)
        ev.print_results(global_metrics, local_metrics)


if __name__ == "__main__":
    main()
