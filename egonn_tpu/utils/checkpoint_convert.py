"""Convert a reference (jac99/Egonn) torch state_dict checkpoint into this
framework's flax parameter pytree.

The published checkpoint `weights/model_egonn_20210916_1104.pth`
(reference README.md:122-125) is a bare `model.state_dict()` of the MinkGL
module built by models/model_factory.py:31-78.  This converter maps every
torch/MinkowskiEngine tensor onto the corresponding flax parameter:

* ME convolution kernels are stored (K, in, out) with the kernel offsets
  enumerated in ME's region order; our kernels are (K, in, out) with C-order
  (dx, dy, dz) offsets (sparse/pyramid.kernel_offsets).  Both enumerate the odd
  hypercube [-r, r]^3; ME iterates the FIRST coordinate fastest (x fastest),
  we iterate the LAST fastest (z fastest) — a fixed permutation handled here.
* 1x1 ME kernels are (in, out) matrices -> ours likewise.
* MinkowskiBatchNorm carries .bn.{weight,bias,running_mean,running_var} ->
  SparseBatchNorm {scale, bias} + batch_stats {mean, var}.
* torch Linear weight (out, in) -> ours (in, out) transposed.
* ECA's nn.Conv1d weight (1, 1, k) -> our (k,) vector.
* GeM's p (1,) -> ours (1,).

Requires torch only to unpickle the .pth (CPU).  Verification against the real
checkpoint is pending its availability (the blob is absent from this mount —
reference .MISSING_LARGE_BLOBS); the mapping is exercised by a synthetic
state_dict round-trip test.
"""
from __future__ import annotations

import itertools
from typing import Dict

import numpy as np


def me_offset_permutation(kernel_size: int) -> np.ndarray:
    """Permutation p with ours[k] = theirs[p[k]].

    ME enumerates hypercube offsets with the first coordinate fastest
    (x-major increments: (-r..r, y, z) sweeps x first); we enumerate C-order
    (z fastest).  For kernel_size k the ME index of offset (dx, dy, dz) is
    (dx+r) + (dy+r)*k + (dz+r)*k^2; ours is (dx+r)*k^2 + (dy+r)*k + (dz+r).
    """
    r = kernel_size // 2 if kernel_size % 2 == 1 else 0
    rng = (
        range(-r, r + 1) if kernel_size % 2 == 1 else range(0, kernel_size)
    )
    perm = []
    for dx, dy, dz in itertools.product(rng, repeat=3):  # our C-order
        me_idx = (dx + r) + (dy + r) * kernel_size + (dz + r) * kernel_size ** 2
        perm.append(me_idx)
    return np.asarray(perm)


def _conv(sd, name, kernel_size):
    w = np.asarray(sd[name])
    if w.ndim == 2:  # 1x1 kernel, (in, out)
        return w
    return w[me_offset_permutation(kernel_size)]


def _bn(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.bn.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bn.bias"]),
    }, {
        "mean": np.asarray(sd[f"{prefix}.bn.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.bn.running_var"]),
    }


def _linear(sd, prefix):
    out = {"weight": np.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _block(sd, prefix, use_eca):
    """ECABasicBlock / BasicBlock (reference layers/eca_block.py:39-73)."""
    params: Dict = {}
    stats: Dict = {}
    params["conv1"] = {"kernel": _conv(sd, f"{prefix}.conv1.kernel", 3)}
    params["norm1"], stats["norm1"] = _bn(sd, f"{prefix}.norm1")
    params["conv2"] = {"kernel": _conv(sd, f"{prefix}.conv2.kernel", 3)}
    params["norm2"], stats["norm2"] = _bn(sd, f"{prefix}.norm2")
    if use_eca and f"{prefix}.eca.conv.weight" in sd:
        params["eca"] = {"conv": np.asarray(sd[f"{prefix}.eca.conv.weight"])[0, 0]}
    if f"{prefix}.downsample.0.kernel" in sd:
        params["downsample_conv"] = {"kernel": _conv(sd, f"{prefix}.downsample.0.kernel", 1)}
        params["downsample_norm"], stats["downsample_norm"] = _bn(
            sd, f"{prefix}.downsample.1")
    return params, stats


def _mlp2(sd, prefix):
    """2-layer heads: reference nn.Sequential indices 0 and 2."""
    return {"fc1": _linear(sd, f"{prefix}.net.0.linear"),
            "fc2": _linear(sd, f"{prefix}.net.2.linear")}


def _head(sd, prefix, in_levels):
    params: Dict = {}
    for lvl in in_levels:
        params[f"conv1x1_{lvl}"] = {"kernel": _conv(sd, f"{prefix}.conv1x1.{lvl}.kernel", 1)}
    for lvl in range(min(in_levels) + 1, max(in_levels) + 1):
        params[f"tconv_{lvl}"] = {"kernel": _conv(sd, f"{prefix}.tconv.{lvl}.kernel", 2)}
    return params


def convert_egonn_state_dict(sd: Dict, planes=(32, 64, 64, 128, 128, 128, 128),
                             global_in_levels=(5, 6, 7), local_in_levels=(3, 4),
                             use_eca: bool = True):
    """torch state_dict -> {'params': ..., 'batch_stats': ...} for models.MinkGL."""
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    params: Dict = {}
    stats: Dict = {}

    trunk_p: Dict = {}
    trunk_s: Dict = {}
    trunk_p["conv0"] = {"kernel": _conv(sd, "trunk.convs.0.kernel", 5)}
    trunk_p["bn0"], trunk_s["bn0"] = _bn(sd, "trunk.bn.0")
    for i in range(1, len(planes) + 1):
        trunk_p[f"conv{i}"] = {"kernel": _conv(sd, f"trunk.convs.{i}.kernel", 2)}
        trunk_p[f"bn{i}"], trunk_s[f"bn{i}"] = _bn(sd, f"trunk.bn.{i}")
        bp, bs = _block(sd, f"trunk.blocks.{i}.0", use_eca)
        trunk_p[f"block{i}_0"] = bp
        trunk_s[f"block{i}_0"] = bs
    params["trunk"] = trunk_p
    stats["trunk"] = trunk_s

    params["global_head"] = _head(sd, "global_head", global_in_levels)
    params["local_head"] = _head(sd, "local_head", local_in_levels)
    params["global_descriptor_decoder"] = _mlp2(sd, "global_descriptor_decoder")
    params["local_descriptor_decoder"] = _mlp2(sd, "local_descriptor_decoder")
    params["local_keypoint_regressor"] = _mlp2(sd, "local_keypoint_regressor")
    params["local_sigma_regressor"] = _mlp2(sd, "local_sigma_regressor")
    params["global_pooling"] = {"gem": {"p": np.asarray(sd["global_pooling.pooling.p"])}}

    return {"params": params, "batch_stats": stats}


def load_reference_checkpoint(path: str):
    """Load a reference .pth and convert (torch CPU unpickle)."""
    import torch

    sd = torch.load(path, map_location="cpu")
    return convert_egonn_state_dict(sd)
