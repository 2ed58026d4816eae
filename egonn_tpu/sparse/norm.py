"""Masked batch norm and global pooling over padded sparse voxel buffers.

Replaces ME.MinkowskiBatchNorm / MinkowskiGlobal{Max,Avg}Pooling /
MinkowskiBroadcastMultiplication (reference models/minkgl.py:102-107,
layers/pooling.py:46-86, layers/eca_block.py:16-36).

Semantics: BN statistics are computed per channel over ALL valid voxels of the
whole batch (exactly torch BatchNorm1d over the flat N dimension, which is what
MinkowskiBatchNorm does).  eps=1e-5, momentum=0.1, biased variance for
normalization, unbiased for the running estimate — torch parity.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class SparseBatchNorm(nn.Module):
    """Masked BatchNorm over (B, C, F) voxel features with (B, C) validity mask.

    setup-style (not @nn.compact) so `affine()` can expose the eval-mode
    per-channel affine for fusion into a preceding conv's Pallas epilogue
    (sparse/conv.py FUSE_BN_EVAL) — same param/variable tree either way.
    """

    features: int
    momentum: float = 0.1
    eps: float = 1e-5

    def setup(self):
        self._scale = self.param("scale", nn.initializers.ones, (self.features,))
        self._bias = self.param("bias", nn.initializers.zeros, (self.features,))
        self._ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((self.features,), jnp.float32)
        )
        self._ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((self.features,), jnp.float32)
        )

    def affine(self) -> tuple:
        """Eval-mode BN as a per-channel affine: y = x * s + b with
        s = scale/sqrt(var+eps), b = bias - mean*s.  Algebraically identical
        to __call__(train=False) (before masking); associates the same ops
        differently, so ulp-level fp differences only."""
        s = self._scale * jax.lax.rsqrt(self._ra_var.value + self.eps)
        return s, self._bias - self._ra_mean.value * s

    def __call__(self, feats: jnp.ndarray, mask: jnp.ndarray, train: bool) -> jnp.ndarray:
        scale, bias = self._scale, self._bias
        ra_mean, ra_var = self._ra_mean, self._ra_var

        if train:
            m = mask[..., None].astype(jnp.float32)
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            x = feats.astype(jnp.float32) * m
            mean = jnp.sum(x, axis=(0, 1)) / cnt
            var = jnp.sum((x - mean) ** 2 * m, axis=(0, 1)) / cnt  # biased
            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (feats.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        # preserve the input activation dtype (bf16 activation flow keeps the
        # elementwise/BN HBM traffic halved; stats stay f32 above)
        return (y * mask[..., None].astype(y.dtype)).astype(feats.dtype)


def global_avg_pool(feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean over voxels: (B, C, F), (B, C) -> (B, F).
    ME.MinkowskiGlobalAvgPooling equivalent."""
    m = mask[..., None].astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(m, axis=1), 1.0)
    # reduce in f32: a bf16 sum over ~16k voxels loses mantissa
    return jnp.sum(feats.astype(jnp.float32) * m, axis=1) / cnt


def global_max_pool(feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked max over voxels. ME.MinkowskiGlobalMaxPooling equivalent."""
    neg = jnp.finfo(feats.dtype).min
    x = jnp.where(mask[..., None], feats, neg)
    return jnp.max(x, axis=1)


def broadcast_mul(feats: jnp.ndarray, per_cloud: jnp.ndarray) -> jnp.ndarray:
    """Multiply every voxel's features by a per-cloud (B, F) vector.
    ME.MinkowskiBroadcastMultiplication equivalent."""
    return feats * per_cloud[:, None, :].astype(feats.dtype)
