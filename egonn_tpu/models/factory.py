"""Model factory — builds the flax model + pyramid spec from ModelParams,
mirroring the reference models/model_factory.py (jac99/Egonn).

`create_egonn_model` hardcodes the published EgoNN architecture
(reference models/model_factory.py:31-78): ECA blocks, planes
[32, 64, 64, 128, 128, 128, 128], global head on levels {5,6,7} -> 128ch -> 256-d
descriptor with GeM, local head on levels {3,4} -> 64ch -> 128-d L2-normalized
descriptors + keypoint/sigma regressors.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

from egonn_tpu.config import ModelParams
from egonn_tpu.models.minkgl import MinkGL
from egonn_tpu.models.minkloc import MinkLoc
from egonn_tpu.ops.quantization import Quantizer
from egonn_tpu.sparse.pyramid import PyramidSpec, egonn_pyramid_spec


@dataclass
class BuiltModel:
    model: object            # flax module (MinkGL or MinkLoc)
    quantizer: Quantizer
    pyramid_spec: PyramidSpec
    model_type: str          # 'egonn' | 'minkloc' | 'minkloc3d'


def create_egonn_model(model_params: ModelParams, cap0: int | None = None) -> BuiltModel:
    model_name = model_params.model
    if model_name != "egonn":
        raise NotImplementedError(f"Unknown model: {model_name}")

    planes = (32, 64, 64, 128, 128, 128, 128)
    layers = (1, 1, 1, 1, 1, 1, 1)
    global_in_levels = (5, 6, 7)
    local_in_levels = (3, 4)

    model = MinkGL(
        trunk_planes=planes,
        trunk_layers=layers,
        conv0_kernel_size=5,
        block="ECABasicBlock",
        in_channels=1,
        global_in_levels=global_in_levels,
        global_map_channels=128,
        global_descriptor_size=256,
        global_pool_method="GeM",
        global_normalize=False,
        local_in_levels=local_in_levels,
        local_map_channels=64,
        local_descriptor_size=128,
        local_normalize=True,
    )
    min_out = min(min(global_in_levels), min(local_in_levels))
    spec = egonn_pyramid_spec(
        cap0=cap0 or model_params.cap0, num_levels=len(planes), min_out_level=min_out
    )
    return BuiltModel(model, model_params.quantizer, spec, "egonn")


def create_minkloc_model(model_params: ModelParams, cap0: int | None = None,
                         frozen_minkloc3d: bool = False) -> BuiltModel:
    """MinkLoc (global-only) — reference models/minkloc.py; the frozen variant
    reproduces third_party/minkloc3d/minkloc.py (planes 32/64/64, 1 top-down,
    GeM, feature_size=output_dim=256)."""
    if frozen_minkloc3d:
        planes, layers, num_top_down, conv0, block, pooling = (
            (32, 64, 64), (1, 1, 1), 1, 5, "BasicBlock", "GeM")
        feature_size = output_dim = 256
    else:
        planes = tuple(model_params.planes)
        layers = tuple(model_params.layers)
        num_top_down = model_params.num_top_down
        conv0 = model_params.conv0_kernel_size
        block = model_params.block
        pooling = model_params.pooling
        feature_size = model_params.feature_size
        output_dim = model_params.output_dim

    model = MinkLoc(
        in_channels=1,
        feature_size=feature_size,
        output_dim=output_dim,
        planes=planes,
        layers=layers,
        num_top_down=num_top_down,
        conv0_kernel_size=conv0,
        block=block,
        pooling_method=pooling,
    )
    num_levels = len(planes)
    caps = tuple(
        max(256, (cap0 or model_params.cap0) >> min(l, 4)) for l in range(num_levels + 1)
    )
    spec = PyramidSpec(
        capacities=caps,
        conv0_kernel_size=conv0,
        block_kernel_size=3,
        self_levels=tuple(range(1, num_levels + 1)),
        up_levels=tuple(range(0, num_levels)),
        conv0_ones=True,  # MinkLoc also feeds all-ones 1-channel features
    )
    return BuiltModel(model, model_params.quantizer, spec, "minkloc")


def model_factory(model_params: ModelParams, cap0: int | None = None) -> BuiltModel:
    name = model_params.model or ""
    if name == "MinkLoc3D":
        return create_minkloc_model(model_params, cap0, frozen_minkloc3d=True)
    if "MinkLoc" in name or "MinkFPN" in name:
        return create_minkloc_model(model_params, cap0)
    if "egonn" in name:
        return create_egonn_model(model_params, cap0)
    raise NotImplementedError(f"Model not implemented: {name}")
