"""Calibrate the banded engine's window widths on a data sample.

Samples clouds from a dataset (any type the loaders support, or the synthetic
set), measures the band width every banded kernel actually needs
(sparse/calibrate.py), and writes a calibration JSON consumable via
EGONN_BAND_CALIB by train.py / evaluate.py / bench.py:

    python tools/calibrate_bands.py --dataset_root <root> --dataset_type mulran \
        --model_config model_configs/egonn.txt --out bands_mulran.json \
        [--n_samples 64] [--margin 1.25]
    EGONN_BAND_CALIB=bands_mulran.json python evaluate.py ...

Replaces the hardcoded 256/1024 compare widths (sized on synthetic probes —
PERFORMANCE.md band-overflow policy) with dataset-measured ones, so denser
clouds never rely on the drop-and-report overflow policy.
"""
import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--dataset_type", required=True,
                    choices=["mulran", "southbay", "kitti", "synthetic"])
    ap.add_argument("--model_config", required=True)
    ap.add_argument("--out", required=True, help="output calibration JSON")
    ap.add_argument("--n_samples", type=int, default=64,
                    help="number of scans to sample")
    ap.add_argument("--margin", type=float, default=1.25,
                    help="safety factor on the measured requirement")
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import numpy as np

    from egonn_tpu.config import ModelParams
    from egonn_tpu.data.base import get_pointcloud_loader
    from egonn_tpu.data.pipeline import resolve_num_points
    from egonn_tpu.models.factory import model_factory
    from egonn_tpu.sparse.calibrate import calibrate_from_clouds, save_calibration

    mp = ModelParams(args.model_config)
    mp.num_points = resolve_num_points(mp, args.dataset_type)
    built = model_factory(mp, cap0=mp.cap0)

    exts = {"mulran": "**/*.bin", "kitti": "**/*.bin",
            "southbay": "**/*.pcd", "synthetic": "**/*.bin"}
    files = sorted(glob.glob(os.path.join(args.dataset_root,
                                          exts[args.dataset_type]),
                             recursive=True))
    if not files:
        raise SystemExit(f"no scans under {args.dataset_root}")
    stride = max(1, len(files) // args.n_samples)
    files = files[::stride][:args.n_samples]
    loader = get_pointcloud_loader(args.dataset_type)

    n = mp.num_points
    clouds = np.zeros((len(files), n, 3), np.float32)
    masks = np.zeros((len(files), n), bool)
    for i, f in enumerate(files):
        pc = np.asarray(loader(f), np.float32)
        k = min(len(pc), n)
        clouds[i, :k] = pc[:k, :3]
        masks[i, :k] = True

    table = calibrate_from_clouds(clouds, masks, built.quantizer,
                                  built.pyramid_spec, margin=args.margin,
                                  batch=args.batch)
    save_calibration(table, args.out)
    print(f"calibrated {len(table)} band widths from {len(files)} scans "
          f"-> {args.out}")
    for k in sorted(table):
        print(f"  {k:>20} = {table[k]}")


if __name__ == "__main__":
    main()
