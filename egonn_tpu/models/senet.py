"""Squeeze-Excitation blocks — flax, masked.

Parity with the reference layers/senet_block.py (jac99/Egonn): SELayer = masked
global avg pool -> Linear(C, C/r) -> ReLU -> Linear(C/r, C) -> sigmoid ->
broadcast-multiply; SEBasicBlock applies it after the second conv.  Available for
MinkLoc configs (`block = SEBasicBlock`); the published EgoNN uses ECA instead.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from egonn_tpu.models.layers import Linear, SparseConv, SparseConv1x1
from egonn_tpu.sparse.norm import SparseBatchNorm, broadcast_mul, global_avg_pool
from egonn_tpu.sparse.types import Level, masked


class SELayer(nn.Module):
    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        y = global_avg_pool(feats, mask)  # (B, C)
        y = Linear(self.channels, self.channels // self.reduction, name="fc1")(y)
        y = nn.relu(y)
        y = Linear(self.channels // self.reduction, self.channels, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return broadcast_mul(feats, y)


class SEBasicBlock(nn.Module):
    """BasicBlock + SE after conv2 (reference :55-90).  Interface matches
    models/layers.BasicBlock so MinkFPN can swap blocks."""

    inplanes: int
    planes: int
    use_eca: bool = False  # ignored; kept for interface parity
    kaiming: bool = False
    reduction: int = 16

    @nn.compact
    def __call__(self, feats: jnp.ndarray, level: Level, train: bool) -> jnp.ndarray:
        from egonn_tpu.sparse import conv as sconv

        conv1 = SparseConv(self.inplanes, self.planes, 27, kaiming=self.kaiming,
                           name="conv1")
        norm1 = SparseBatchNorm(self.planes, name="norm1")
        conv2 = SparseConv(self.planes, self.planes, 27, kaiming=self.kaiming,
                           name="conv2")
        norm2 = SparseBatchNorm(self.planes, name="norm2")
        if not train and sconv.FUSE_BN_EVAL:
            # eval: BN affine (+ReLU) + mask fused into the conv epilogues
            s1, b1 = norm1.affine()
            out = conv1(feats, level.kmap_self, epi=(s1, b1, True, level.mask))
            s2, b2 = norm2.affine()
            out = conv2(out, level.kmap_self, epi=(s2, b2, False, level.mask))
        else:
            out = conv1(feats, level.kmap_self)
            out = norm1(out, level.mask, train)
            out = nn.relu(out)
            out = conv2(out, level.kmap_self)
            out = norm2(out, level.mask, train)
        out = SELayer(self.planes, reduction=self.reduction, name="se")(out, level.mask)
        if self.inplanes != self.planes:
            residual = SparseConv1x1(self.inplanes, self.planes, kaiming=self.kaiming,
                                     name="downsample_conv")(feats)
            residual = SparseBatchNorm(self.planes, name="downsample_norm")(
                residual, level.mask, train)
        else:
            residual = feats
        return masked(nn.relu(out + residual), level.mask)


class SEBottleneck(nn.Module):
    """Bottleneck (1x1 -> 3^3 -> 1x1, expansion 4) + SE after conv3 (reference
    layers/senet_block.py:92-132).  Interface matches models/resnet.Bottleneck."""

    inplanes: int
    planes: int
    use_eca: bool = False  # ignored; interface parity
    kaiming: bool = False
    reduction: int = 16
    expansion: int = 4

    @nn.compact
    def __call__(self, feats: jnp.ndarray, level: Level, train: bool) -> jnp.ndarray:
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
        out = SELayer(out_ch, reduction=self.reduction, name="se")(out, level.mask)
        if self.inplanes != out_ch:
            residual = SparseConv1x1(self.inplanes, out_ch, name="downsample_conv")(feats)
            residual = SparseBatchNorm(out_ch, name="downsample_norm")(
                residual, level.mask, train)
        else:
            residual = feats
        return masked(nn.relu(out + residual), level.mask)
