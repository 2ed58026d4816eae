"""Train EgoNN (TPU) — CLI-compatible with the reference training/train.py.

Usage:
    python train.py --config config/config_egonn.txt \
                    --model_config model_configs/egonn.txt [--debug] [--epochs N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from egonn_tpu.config import TrainingParams  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="Train EgoNN model (TPU)")
    parser.add_argument("--config", type=str, required=True,
                        help="Path to configuration file")
    parser.add_argument("--model_config", type=str, required=True,
                        help="Path to the model-specific configuration file")
    parser.add_argument("--debug", dest="debug", action="store_true")
    parser.add_argument("--visualize", dest="visualize", action="store_true",
                        help="Accepted for reference-CLI parity; the reference "
                             "trainer takes this parameter and never consumes "
                             "it (training/trainer.py:51)")
    parser.add_argument("--epochs", type=int, default=None,
                        help="Override the number of epochs")
    parser.add_argument("--weights_path", type=str, default="weights")
    parser.add_argument("--resume", type=str, default=None,
                        help="Checkpoint directory (weights_path/model_name) of "
                             "a previous run: restores params/batch_stats/"
                             "optimizer/epoch + the expanded batch size and "
                             "continues training into the same directory")
    parser.set_defaults(debug=False, visualize=False)
    args = parser.parse_args()

    import jax

    from egonn_tpu.utils.compcache import enable_persistent_cache
    enable_persistent_cache(jax.config)
    if args.debug:
        jax.config.update("jax_debug_nans", True)  # torch detect_anomaly analogue

    print(f"Training config path: {args.config}")
    print(f"Model config path: {args.model_config}")
    print(f"Debug mode: {args.debug}")
    print(f"Visualize: {args.visualize}")

    params = TrainingParams(args.config, args.model_config)
    if args.epochs is not None:
        params.epochs = args.epochs
    params.print()

    from egonn_tpu.train.trainer import do_train

    do_train(params, debug=args.debug, weights_path=args.weights_path,
             resume_from=args.resume)


if __name__ == "__main__":
    main()
