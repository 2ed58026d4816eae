"""Rotation-robustness evaluation: recall as a function of query-cloud z-rotation.

Parity with the reference eval/evaluate_with_rotations.py (jac99/Egonn): rotate
every query cloud by theta in {0, 10, ..., 180} degrees about +z, recompute the
query embeddings, and report Recall@N per rotation (the map set is embedded once).
Results are returned as {theta_deg: recall_dict} and can be pickled by the caller.

The rotation is applied on host by wrapping the point-cloud loader (a 3x3
matmul on the raw cloud before padding); every rotation still reuses the one
compiled embedding program, since the device sees the same padded shapes.
"""
from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from egonn_tpu.eval.evaluator import Evaluator


class RotationEvaluator(Evaluator):
    def __init__(self, *args, thetas_deg: Sequence[float] = tuple(range(0, 181, 10)),
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.thetas_deg = list(thetas_deg)

    def evaluate(self, variables) -> Dict[float, Dict]:
        map_e = self.compute_embeddings(variables, self.eval_set.map_set)
        results: Dict[float, Dict] = {}
        base_loader = self.pc_loader
        for theta in self.thetas_deg:
            rad = np.radians(theta)
            c, s = np.cos(rad), np.sin(rad)
            rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], np.float32)

            class RotatedLoader:
                def __call__(self, path, _base=base_loader, _rot=rot):
                    return (_base(path) @ _rot.T).astype(np.float32)

            self.pc_loader = RotatedLoader()
            query_e = self.compute_embeddings(variables, self.eval_set.query_set)
            results[theta] = self.compute_recall(map_e["global"], query_e["global"])
            self.pc_loader = base_loader
        return results
