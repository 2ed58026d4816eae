"""MinkLoc (global-descriptor-only) model + MinkFPN backbone, TPU-native.

Parity with reference models/minkfpn.py + models/minkloc.py (jac99/Egonn):
conv0 (k=conv0_kernel_size, s=1) -> num_bottom_up levels of (conv k=2 s=2 + BN +
ReLU + block) -> 1x1 conv to `out_channels` -> num_top_down iterations of
(transposed k=2 s=2 conv + 1x1 lateral skip-add) -> pooling.

The third_party/minkloc3d/minkloc.py pretrained-compat variant is the same module
with frozen hyperparameters (planes 32/64/64, 1 top-down, GeM) — built via
factory.create_minkloc_model(frozen_minkloc3d=True).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from egonn_tpu.models.layers import (
    BasicBlock,
    PoolingWrapper,
    SparseConv,
    SparseConv1x1,
    SparseConvTranspose2x2,
)
from egonn_tpu.sparse.norm import SparseBatchNorm
from egonn_tpu.sparse.types import Pyramid, masked


class MinkFPN(nn.Module):
    in_channels: int
    out_channels: int
    num_top_down: int = 1
    conv0_kernel_size: int = 5
    block: str = "BasicBlock"
    layers: Tuple[int, ...] = (1, 1, 1)
    planes: Tuple[int, ...] = (32, 64, 64)

    @nn.compact
    def __call__(self, pyramid: Pyramid, feats0: Optional[jnp.ndarray], train: bool):
        nb = len(self.layers)
        ntd = self.num_top_down
        assert 0 <= ntd <= nb
        use_eca = self.block == "ECABasicBlock"
        use_se = self.block == "SEBasicBlock"

        from egonn_tpu.sparse import conv as sconv

        inplanes = self.planes[0]
        conv0 = SparseConv(self.in_channels, inplanes,
                           self.conv0_kernel_size ** 3, name="conv0")
        bn0 = SparseBatchNorm(inplanes, name="bn0")
        lvl0 = pyramid[0]
        x = conv0(feats0, lvl0.kmap_self)
        x = bn0(x, lvl0.mask, train)
        x = nn.relu(x)
        x = masked(x, lvl0.mask)

        feature_maps = []  # (level, feats, channels)
        if ntd == nb:
            feature_maps.append((0, x, inplanes))

        from egonn_tpu.sparse import conv as sconv

        for ndx, (plane, n_blocks) in enumerate(zip(self.planes, self.layers)):
            level = ndx + 1
            lvl = pyramid[level]
            prev = pyramid[level - 1]
            conv_l = SparseConv(inplanes, inplanes, 8, name=f"conv{level}")
            bn_l = SparseBatchNorm(inplanes, name=f"bn{level}")
            if not train and sconv.FUSE_BN_EVAL:
                # eval: BN affine + ReLU + mask fused into the conv epilogue
                s, b = bn_l.affine()
                x = conv_l(x, lvl.kmap_down, prev.up_parent, prev.up_koffset,
                           epi=(s, b, True, lvl.mask))
            else:
                x = conv_l(x, lvl.kmap_down, prev.up_parent, prev.up_koffset)
                x = bn_l(x, lvl.mask, train)
                x = nn.relu(x)
            for j in range(n_blocks):
                block_cls = BasicBlock
                if use_se:
                    from egonn_tpu.models.senet import SEBasicBlock

                    block_cls = SEBasicBlock
                x = block_cls(
                    inplanes if j == 0 else plane,
                    plane,
                    use_eca=use_eca,
                    kaiming=False,
                    name=f"block{level}_{j}",
                )(x, lvl, train)
            inplanes = plane
            if nb - 1 - ntd <= ndx < nb - 1:
                feature_maps.append((level, x, plane))

        assert len(feature_maps) == ntd

        x = SparseConv1x1(self.planes[-1], self.out_channels, name="conv1x1_0")(x)
        level = nb
        for ndx in range(ntd):
            level -= 1
            x = SparseConvTranspose2x2(self.out_channels, self.out_channels,
                                       name=f"tconv{ndx}")(x, pyramid[level],
                                                           pyramid[level + 1])
            lat_level, lat_feats, lat_ch = feature_maps[-ndx - 1]
            assert lat_level == level
            x = x + SparseConv1x1(lat_ch, self.out_channels,
                                  name=f"conv1x1_{ndx + 1}")(lat_feats)
        return masked(x, pyramid[level].mask), level


class MinkLoc(nn.Module):
    in_channels: int
    feature_size: int
    output_dim: int
    planes: Tuple[int, ...]
    layers: Tuple[int, ...]
    num_top_down: int
    conv0_kernel_size: int
    block: str = "BasicBlock"
    pooling_method: str = "GeM"

    @nn.compact
    def __call__(self, pyramid: Pyramid, quantizer=None,
                 feats0: Optional[jnp.ndarray] = None, train: bool = False,
                 **_: object) -> Dict[str, jnp.ndarray]:
        x, level = MinkFPN(
            in_channels=self.in_channels,
            out_channels=self.feature_size,
            num_top_down=self.num_top_down,
            conv0_kernel_size=self.conv0_kernel_size,
            block=self.block,
            layers=self.layers,
            planes=self.planes,
            name="backbone",
        )(pyramid, feats0, train)
        mask = pyramid[level].mask
        pooled = PoolingWrapper(self.pooling_method, self.feature_size,
                                self.output_dim, name="pooling")(x, mask)
        return {"global": pooled}
