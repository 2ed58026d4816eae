"""MinkGL — the unified global+local EgoNN network, TPU-native.

Architecture parity with the reference models/minkgl.py (jac99/Egonn):

* MinkTrunk (:68-158): stem conv k=5 s=1 -> per level i in 1..7 (conv k=2 s=2 + BN +
  ReLU + residual block); level i has tensor stride 2^i; returns {level: feats} for
  levels >= min_out_level.  Trunk convs/BNs are re-initialized kaiming-fan_out /
  (1, 0) (:113-119).
* MinkHead (:14-65): 1x1 conv on the max input level, then per level downwards a
  transposed k=2 s=2 conv landing on the trunk's coordinates plus a 1x1-projected
  lateral skip.
* MinkGL (:228-315): global branch = head(levels 5,6,7) -> DescriptorDecoder
  (128->192->256, unnormalized) -> GeM pooling; local branch = head(levels 3,4) ->
  descriptors (64->96->128, L2-normalized), keypoint tanh-offset regressor, softplus
  sigma regressor; keypoints decoded via quantizer.keypoint_position on the
  absolute stride-8 supervoxel coordinates (:296-304).

TPU-native differences: all per-batch-element lists become padded (B, C, ...) buffers
with masks; the coordinate pyramid is precomputed once per batch (sparse/pyramid.py)
and shared by trunk and both heads, exactly as ME's coordinate manager is.
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from egonn_tpu.models.layers import (
    BasicBlock,
    DescriptorDecoder,
    MLPRegressor,
    PoolingWrapper,
    SparseConv,
    SparseConv1x1,
    SparseConvTranspose2x2,
    l2_normalize,
)
from egonn_tpu.ops.quantization import Quantizer
from egonn_tpu.sparse.norm import SparseBatchNorm
from egonn_tpu.sparse.types import Pyramid, masked


class MinkTrunk(nn.Module):
    """Bottom-up trunk.  planes[i-1] is the block output width at level i."""

    in_channels: int
    planes: Tuple[int, ...]
    layers: Tuple[int, ...]
    conv0_kernel_size: int = 5
    block: str = "ECABasicBlock"  # 'BasicBlock' | 'ECABasicBlock'
    min_out_level: int = 1

    @nn.compact
    def __call__(self, pyramid: Pyramid, feats0: Optional[jnp.ndarray], train: bool
                 ) -> Dict[int, jnp.ndarray]:
        from egonn_tpu.sparse import conv as sconv
        from egonn_tpu.sparse.conv import activation_dtype

        use_eca = self.block == "ECABasicBlock"
        k0 = self.conv0_kernel_size ** 3
        inplanes = self.planes[0]
        # Stem: conv k=5 s=1 + BN + ReLU at level 0. feats0=None engages the
        # all-ones fast path (EgoNN input features are constant 1): the kmap
        # validity matmul (a packed-bits LUT stem variant was A/B'd on chip
        # twice and LOST, 375 vs 430 clouds/s round 4 — deleted).
        conv0 = SparseConv(self.in_channels, inplanes, k0, kaiming=True,
                           name="conv0")
        bn0 = SparseBatchNorm(inplanes, name="bn0")
        lvl0 = pyramid[0]
        x = conv0(feats0, lvl0.kmap_self)
        x = x.astype(activation_dtype())  # bf16 activation flow on TPU
        x = bn0(x, lvl0.mask, train)
        x = nn.relu(x)
        x = masked(x, lvl0.mask)

        from egonn_tpu.sparse import conv as sconv

        out: Dict[int, jnp.ndarray] = {}
        for i, (plane, n_blocks) in enumerate(zip(self.planes, self.layers), start=1):
            lvl = pyramid[i]
            prev = pyramid[i - 1]
            conv_i = SparseConv(inplanes, inplanes, 8, kaiming=True, name=f"conv{i}")
            bn_i = SparseBatchNorm(inplanes, name=f"bn{i}")
            if not train and sconv.FUSE_BN_EVAL:
                # eval: BN affine + ReLU + mask fused into the conv epilogue;
                # up maps passed so the transposed down conv (sparse_tdown)
                # can skip kmap_down entirely
                s, bshift = bn_i.affine()
                x = conv_i(x, lvl.kmap_down, prev.up_parent, prev.up_koffset,
                           epi=(s, bshift, True, lvl.mask))
            else:
                x = conv_i(x, lvl.kmap_down, prev.up_parent, prev.up_koffset)
                x = bn_i(x, lvl.mask, train)
                x = nn.relu(x)
            for j in range(n_blocks):
                x = BasicBlock(
                    inplanes if j == 0 else plane,
                    plane,
                    use_eca=use_eca,
                    name=f"block{i}_{j}",
                )(x, lvl, train)
            inplanes = plane
            if i >= self.min_out_level:
                out[i] = x
        return out


class MinkHead(nn.Module):
    """Top-down FPN head over the shared pyramid (reference models/minkgl.py:14-65)."""

    in_levels: Tuple[int, ...]
    in_channels: Tuple[int, ...]
    out_channels: int

    @nn.compact
    def __call__(self, pyramid: Pyramid, trunk_out: Dict[int, jnp.ndarray], train: bool
                 ) -> jnp.ndarray:
        in_d = dict(zip(self.in_levels, self.in_channels))
        min_level, max_level = min(self.in_levels), max(self.in_levels)
        y = SparseConv1x1(in_d[max_level], self.out_channels, name=f"conv1x1_{max_level}")(
            trunk_out[max_level]
        )
        for level in range(max_level - 1, min_level - 1, -1):
            y = SparseConvTranspose2x2(
                self.out_channels, self.out_channels, name=f"tconv_{level + 1}"
            )(y, pyramid[level], pyramid[level + 1])
            if level in in_d:
                lateral = SparseConv1x1(
                    in_d[level], self.out_channels, name=f"conv1x1_{level}"
                )(trunk_out[level])
                y = y + lateral
        return masked(y, pyramid[min_level].mask)


class MinkGL(nn.Module):
    """Unified global + local descriptor network."""

    trunk_planes: Tuple[int, ...]
    trunk_layers: Tuple[int, ...]
    conv0_kernel_size: int = 5
    block: str = "ECABasicBlock"
    in_channels: int = 1

    global_in_levels: Tuple[int, ...] = (5, 6, 7)
    global_map_channels: int = 128
    global_descriptor_size: int = 256
    global_pool_method: str = "GeM"
    global_normalize: bool = False

    local_in_levels: Tuple[int, ...] = (3, 4)
    local_map_channels: int = 64
    local_descriptor_size: int = 128
    local_normalize: bool = True

    # Ablation: keypoints at supervoxel centres (reference models/minkgl.py:263-265)
    ignore_keypoint_regressor: bool = False

    @property
    def min_out_level(self) -> int:
        lo = len(self.trunk_planes)
        if self.global_in_levels:
            lo = min(lo, min(self.global_in_levels))
        if self.local_in_levels:
            lo = min(lo, min(self.local_in_levels))
        return lo

    @nn.compact
    def __call__(self, pyramid: Pyramid, quantizer: Quantizer,
                 feats0: Optional[jnp.ndarray] = None, train: bool = False,
                 disable_global_head: bool = False, disable_local_head: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        trunk_out = MinkTrunk(
            in_channels=self.in_channels,
            planes=self.trunk_planes,
            layers=self.trunk_layers,
            conv0_kernel_size=self.conv0_kernel_size,
            block=self.block,
            min_out_level=self.min_out_level,
            name="trunk",
        )(pyramid, feats0, train)

        y: Dict[str, jnp.ndarray] = {}

        if not disable_global_head:
            g_channels = tuple(self.trunk_planes[i - 1] for i in self.global_in_levels)
            xg = MinkHead(self.global_in_levels, g_channels, self.global_map_channels,
                          name="global_head")(pyramid, trunk_out, train)
            xg = DescriptorDecoder(self.global_map_channels, self.global_descriptor_size,
                                   normalize=False, name="global_descriptor_decoder")(xg)
            if self.global_normalize:
                xg = l2_normalize(xg)
            g_level = min(self.global_in_levels)
            g_mask = pyramid[g_level].mask
            y["global"] = PoolingWrapper(
                self.global_pool_method, self.global_descriptor_size,
                self.global_descriptor_size, name="global_pooling",
            )(masked(xg, g_mask), g_mask)

        if self.local_in_levels and not disable_local_head:
            l_channels = tuple(self.trunk_planes[i - 1] for i in self.local_in_levels)
            xl = MinkHead(self.local_in_levels, l_channels, self.local_map_channels,
                          name="local_head")(pyramid, trunk_out, train)
            l_level = min(self.local_in_levels)
            lvl = pyramid[l_level]
            y["descriptors"] = masked(
                DescriptorDecoder(self.local_map_channels, self.local_descriptor_size,
                                  normalize=self.local_normalize,
                                  name="local_descriptor_decoder")(xl),
                lvl.mask,
            )
            kp_offset = MLPRegressor(self.local_map_channels, 3, "tanh",
                                     name="local_keypoint_regressor")(xl)
            if self.ignore_keypoint_regressor:
                kp_offset = jnp.zeros_like(kp_offset)
            # absolute level-0 voxel units (multiples of the stride), as ME's .C
            stride = 2 ** l_level
            coords_abs = lvl.coords_rows * stride  # (B, C, 3) row layout (small)
            kp_pos = quantizer.keypoint_position(
                coords_abs, jnp.full((3,), stride, jnp.float32), kp_offset
            )
            y["keypoints"] = masked(kp_pos, lvl.mask)
            y["kp_mask"] = lvl.mask
            y["sigma"] = masked(
                MLPRegressor(self.local_map_channels, 1, "softplus",
                             name="local_sigma_regressor")(xl),
                lvl.mask,
            )
        return y
