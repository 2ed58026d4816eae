"""Generic sparse ResNet scaffolding + standard variants.

Parity with reference models/resnet.py (jac99/Egonn): ResNetBase with a stem conv
followed by stages of (stride-2 conv + residual blocks), `_make_layer`-style
1x1+BN downsample paths on channel change, and the ResNet14/18/34/50/101 variant
table.  Used as generic backbone scaffolding (MinkFPN-style models); the shipped
EgoNN configs use MinkTrunk/MinkFPN directly.
"""
from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from egonn_tpu.models.layers import BasicBlock, SparseConv, SparseConv1x1
from egonn_tpu.sparse.norm import SparseBatchNorm
from egonn_tpu.sparse.types import Pyramid, masked


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 residual block, expansion 4 (ME resnet_block.Bottleneck)."""

    inplanes: int
    planes: int
    use_eca: bool = False  # interface parity with BasicBlock
    kaiming: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, feats, level, train: bool):
        from egonn_tpu.sparse import conv as sconv

        out_ch = self.planes * self.expansion
        out = SparseConv1x1(self.inplanes, self.planes, name="conv1")(feats)
        out = SparseBatchNorm(self.planes, name="norm1")(out, level.mask, train)
        out = nn.relu(out)
        conv2 = SparseConv(self.planes, self.planes, 27, name="conv2")
        norm2 = SparseBatchNorm(self.planes, name="norm2")
        if not train and sconv.FUSE_BN_EVAL:
            # eval: BN affine + ReLU + mask fused into the conv epilogue
            s, b = norm2.affine()
            out = conv2(out, level.kmap_self, epi=(s, b, True, level.mask))
        else:
            out = conv2(out, level.kmap_self)
            out = norm2(out, level.mask, train)
            out = nn.relu(out)
        out = SparseConv1x1(self.planes, out_ch, name="conv3")(out)
        out = SparseBatchNorm(out_ch, name="norm3")(out, level.mask, train)
        if self.inplanes != out_ch:
            residual = SparseConv1x1(self.inplanes, out_ch, name="downsample_conv")(feats)
            residual = SparseBatchNorm(out_ch, name="downsample_norm")(
                residual, level.mask, train)
        else:
            residual = feats
        return masked(nn.relu(out + residual), level.mask)


class ResNetBase(nn.Module):
    """Stem + 4 stages over pyramid levels 1..4; returns {level: feats}.

    planes/layers follow the torchvision convention; block is 'BasicBlock',
    'Bottleneck', or 'SEBottleneck' (reference layers/senet_block.py:92-132).
    The pyramid must provide self maps at levels 1..len(layers).
    """

    in_channels: int
    planes: Tuple[int, ...] = (64, 128, 256, 512)
    layers: Tuple[int, ...] = (1, 1, 1, 1)
    block: str = "BasicBlock"
    conv0_kernel_size: int = 5
    init_dim: int = 64

    @nn.compact
    def __call__(self, pyramid: Pyramid, feats0, train: bool) -> Dict[int, jnp.ndarray]:
        if self.block == "BasicBlock":
            block_cls, expansion = BasicBlock, 1
        elif self.block == "SEBottleneck":
            from egonn_tpu.models.senet import SEBottleneck

            block_cls, expansion = SEBottleneck, 4
        else:
            block_cls, expansion = Bottleneck, 4

        x = SparseConv(self.in_channels, self.init_dim,
                       self.conv0_kernel_size ** 3, name="conv0")(
            feats0, pyramid[0].kmap_self)
        x = SparseBatchNorm(self.init_dim, name="bn0")(x, pyramid[0].mask, train)
        x = nn.relu(x)
        x = masked(x, pyramid[0].mask)

        from egonn_tpu.sparse import conv as sconv

        inplanes = self.init_dim
        out: Dict[int, jnp.ndarray] = {}
        for i, (plane, n_blocks) in enumerate(zip(self.planes, self.layers), start=1):
            lvl = pyramid[i]
            prev = pyramid[i - 1]
            conv_i = SparseConv(inplanes, inplanes, 8, name=f"conv{i}")
            bn_i = SparseBatchNorm(inplanes, name=f"bn{i}")
            if not train and sconv.FUSE_BN_EVAL:
                # eval: BN affine + ReLU + mask fused into the conv epilogue
                s, b = bn_i.affine()
                x = conv_i(x, lvl.kmap_down, prev.up_parent, prev.up_koffset,
                           epi=(s, b, True, lvl.mask))
            else:
                x = conv_i(x, lvl.kmap_down, prev.up_parent, prev.up_koffset)
                x = bn_i(x, lvl.mask, train)
                x = nn.relu(x)
            for j in range(n_blocks):
                x = block_cls(
                    inplanes if j == 0 else plane * expansion,
                    plane,
                    name=f"block{i}_{j}",
                )(x, lvl, train)
            inplanes = plane * expansion
            out[i] = x
        return out


# Variant table (reference models/resnet.py:138-160)
def ResNet14(in_channels):  # noqa: N802
    return ResNetBase(in_channels=in_channels, block="BasicBlock", layers=(1, 1, 1, 1))


def ResNet18(in_channels):  # noqa: N802
    return ResNetBase(in_channels=in_channels, block="BasicBlock", layers=(2, 2, 2, 2))


def ResNet34(in_channels):  # noqa: N802
    return ResNetBase(in_channels=in_channels, block="BasicBlock", layers=(3, 4, 6, 3))


def ResNet50(in_channels):  # noqa: N802
    return ResNetBase(in_channels=in_channels, block="Bottleneck", layers=(3, 4, 6, 3))


def ResNet101(in_channels):  # noqa: N802
    return ResNetBase(in_channels=in_channels, block="Bottleneck", layers=(3, 4, 23, 3))
