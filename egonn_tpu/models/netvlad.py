"""NetVLAD pooling with optional Gating Context — flax, masked-variable-length.

Parity with the reference layers/netvlad.py (jac99/Egonn): NetVLADLoupe computes
soft-assignment over `cluster_size` clusters (1x1 conv == matmul + optional BN over
the assignment logits), aggregates residuals against learned cluster centers,
intra-normalizes per cluster, flattens, projects to output_dim with a hidden
weight, then L2-normalizes; GatingContext applies a learned sigmoid gate.

TPU-native: instead of ME decomposed_features + pad_sequence (reference
layers/pooling.py:100-104), features arrive as padded (B, C, F) with a (B, C)
mask; masked softmax assignment handles variable voxel counts exactly.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from egonn_tpu.models.layers import l2_normalize


def _trunc_normal(stddev):
    return nn.initializers.truncated_normal(stddev=stddev)


class GatingContext(nn.Module):
    dim: int
    add_batch_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        w = self.param("gating_weights", _trunc_normal(1.0 / math.sqrt(self.dim)),
                       (self.dim, self.dim))
        gates = x @ w
        if self.add_batch_norm:
            gates = nn.BatchNorm(use_running_average=not train, name="bn")(gates)
        else:
            b = self.param("gating_biases", _trunc_normal(1.0 / math.sqrt(self.dim)),
                           (self.dim,))
            gates = gates + b
        return x * jax.nn.sigmoid(gates)


class NetVLADLoupe(nn.Module):
    feature_size: int
    cluster_size: int
    output_dim: int
    gating: bool = True
    add_batch_norm: bool = True

    @nn.compact
    def __call__(self, feats: jnp.ndarray, mask: jnp.ndarray, train: bool = False
                 ) -> jnp.ndarray:
        b, c, f = feats.shape
        assert f == self.feature_size
        k = self.cluster_size
        std = 1.0 / math.sqrt(f)

        cluster_w = self.param("cluster_weights", _trunc_normal(std), (f, k))
        activation = feats @ cluster_w  # (B, C, K)
        if self.add_batch_norm:
            activation = nn.BatchNorm(use_running_average=not train,
                                      name="cluster_bn")(activation)
        else:
            biases = self.param("cluster_biases", _trunc_normal(std), (k,))
            activation = activation + biases
        # masked softmax over clusters; padded voxels contribute nothing
        activation = jax.nn.softmax(activation, axis=-1)
        activation = activation * mask[..., None]

        a_sum = jnp.sum(activation, axis=1, keepdims=True)  # (B, 1, K)
        cluster_w2 = self.param("cluster_weights2", _trunc_normal(std), (1, f, k))
        a = a_sum * cluster_w2  # (B, F, K)

        vlad = jnp.einsum("bck,bcf->bfk", activation, feats) - a  # (B, F, K)
        # intra-normalization per cluster column, then global L2
        vlad = l2_normalize(vlad, axis=1)
        vlad = vlad.reshape(b, f * k)
        vlad = l2_normalize(vlad, axis=1)

        hidden_w = self.param("hidden1_weights",
                              _trunc_normal(1.0 / math.sqrt(f * k)),
                              (f * k, self.output_dim))
        vlad = vlad @ hidden_w
        if self.gating:
            vlad = GatingContext(self.output_dim, add_batch_norm=self.add_batch_norm,
                                 name="context_gating")(vlad, train)
        return vlad
