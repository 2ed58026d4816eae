"""Building-block flax modules: ME-parity sparse conv wrappers, ECA attention,
GeM / MAC / SPoC pooling, descriptor/keypoint/sigma regressors.

Re-implements (TPU-native) the reference's layers/eca_block.py, layers/pooling.py,
models/minkgl.py:161-225 and the MinkowskiEngine modules they wrap.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.sparse import conv as sconv
from egonn_tpu.sparse.norm import SparseBatchNorm, broadcast_mul, global_avg_pool, global_max_pool
from egonn_tpu.sparse.types import Level, masked


def me_conv_init(kernel_volume: int, in_channels: int):
    """MinkowskiConvolution.reset_parameters: uniform(-s, s) with
    s = 1/sqrt(in_channels * kernel_volume)."""
    s = 1.0 / math.sqrt(max(1, in_channels * kernel_volume))
    return nn.initializers.uniform(scale=2 * s, offset=-s) if hasattr(nn.initializers, "uniform") else None


def _uniform(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


def kaiming_me(kernel_volume: int, out_channels: int):
    """ME.utils.kaiming_normal_(kernel, mode='fan_out', relu) on an (K, in, out)
    kernel: torch computes fan_out = size(0) * prod(sizes[2:]) = K * out."""
    std = math.sqrt(2.0 / max(1, kernel_volume * out_channels))

    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


class SparseConv(nn.Module):
    """Stride-1 k^3 sparse conv (kernel map = level.kmap_self) or, with
    `down=True`, the k=2 s=2 downsampling conv (kernel map = level.kmap_down).
    No bias (ME convs default bias=False)."""

    in_channels: int
    out_channels: int
    kernel_volume: int
    kaiming: bool = False  # trunk convs get kaiming fan_out re-init

    @nn.compact
    def __call__(self, feats: jnp.ndarray, kmap: jnp.ndarray,
                 up_parent: jnp.ndarray | None = None,
                 up_koffset: jnp.ndarray | None = None,
                 epi: tuple | None = None) -> jnp.ndarray:
        init = (
            kaiming_me(self.kernel_volume, self.out_channels)
            if self.kaiming
            else _uniform(1.0 / math.sqrt(max(1, self.in_channels * self.kernel_volume)))
        )
        kernel = self.param(
            "kernel", init, (self.kernel_volume, self.in_channels, self.out_channels)
        )
        if feats is None:
            # all-ones single-channel input: occupancy fast path (EgoNN stem)
            n_in = kmap.shape[-1]  # self-map: C_in == C_out
            return sconv.sparse_conv_ones(kmap, kernel, n_in)
        if epi is not None:
            # eval-only fused conv + BN-affine (+ReLU) + mask: the custom-VJP
            # wrappers below are a backward-pass concern — never differentiated
            if (up_parent is not None and self.kernel_volume == 8
                    and sconv.TDOWN):
                # transposed form: consumes the up map, so kmap_down (and its
                # inversion scatter) is dead code in the inference jit
                mask = epi[3]
                return sconv.sparse_tdown(feats, up_parent, up_koffset,
                                          kernel, mask.shape[-1], mask,
                                          epi=epi)
            return sconv.sparse_conv(feats, kmap, kernel, epi=epi,
                                     self_map=self.kernel_volume in (27, 125, 343))
        if up_parent is not None:
            # k=2 s=2 downsampling conv: gather-only backward via the up map
            return sconv.sparse_conv_down(feats, kmap, up_parent, up_koffset, kernel)
        if self.kernel_volume in (27, 125, 343):
            # symmetric odd self-kernel: gather-only backward via offset reversal
            return sconv.sparse_conv_sym(feats, kmap, kernel)
        return sconv.sparse_conv(feats, kmap, kernel)


class SparseConv1x1(nn.Module):
    """1x1 conv; ME stores its kernel as an (in, out) matrix, kaiming fan_out on a
    2-D tensor uses fan_out = size(0) = in_channels."""

    in_channels: int
    out_channels: int
    kaiming: bool = False

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        if self.kaiming:
            std = math.sqrt(2.0 / max(1, self.in_channels))
            init = lambda k, s, d=jnp.float32: std * jax.random.normal(k, s, d)  # noqa: E731
        else:
            init = _uniform(1.0 / math.sqrt(max(1, self.in_channels)))
        kernel = self.param("kernel", init, (self.in_channels, self.out_channels))
        return sconv.sparse_conv1x1(feats, kernel)


class SparseConvTranspose2x2(nn.Module):
    """Transposed k=2 s=2 conv onto the recorded finer level (FPN top-down)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, feats: jnp.ndarray, fine_level: Level,
                 coarse_level: Level | None = None) -> jnp.ndarray:
        # ME transpose init: n = out_channels * kernel_volume
        init = _uniform(1.0 / math.sqrt(max(1, self.out_channels * 8)))
        kernel = self.param("kernel", init, (8, self.in_channels, self.out_channels))
        if coarse_level is not None and coarse_level.kmap_down is not None:
            return sconv.sparse_tconv2x2_vjp(
                feats, fine_level.up_parent, fine_level.up_koffset,
                coarse_level.kmap_down, kernel)
        return sconv.sparse_tconv2x2(feats, fine_level.up_parent, fine_level.up_koffset, kernel)


class Linear(nn.Module):
    """torch.nn.Linear-parity dense layer (per-voxel MLP); default torch init."""

    in_features: int
    out_features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        bound = 1.0 / math.sqrt(max(1, self.in_features))
        w = self.param("weight", _uniform(bound), (self.in_features, self.out_features))
        y = x @ w
        if self.use_bias:
            b = self.param("bias", _uniform(bound), (self.out_features,))
            y = y + b
        return y


class ECALayer(nn.Module):
    """Efficient Channel Attention (reference layers/eca_block.py:11-36):
    masked global avg pool -> 1-D conv over channels (adaptive kernel size from
    log2(C)) -> sigmoid -> broadcast multiply."""

    channels: int
    gamma: int = 2
    b: int = 1

    @nn.compact
    def __call__(self, feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        t = int(abs((np.log2(self.channels) + self.b) / self.gamma))
        k_size = t if t % 2 else t + 1
        # torch Conv1d default init: uniform(-1/sqrt(in_ch*k), ...) with in_ch=1
        w = self.param("conv", _uniform(1.0 / math.sqrt(k_size)), (k_size,))
        y = global_avg_pool(feats, mask)  # (B, C)
        # 1-D convolution along the channel axis, 'same' padding, no bias
        pad = (k_size - 1) // 2
        y = jax.vmap(lambda row: jnp.convolve(jnp.pad(row, pad), w[::-1], mode="valid"))(y)
        y = jax.nn.sigmoid(y)
        return broadcast_mul(feats, y)


class BasicBlock(nn.Module):
    """ME resnet_block BasicBlock: conv3 -> BN -> relu -> conv3 -> BN (+ECA)
    -> +residual -> relu.  Stride always 1 here (reference models/minkgl.py:121-134);
    channel changes use a 1x1+BN downsample path."""

    inplanes: int
    planes: int
    use_eca: bool = False
    kaiming: bool = True  # trunk re-inits all its convs

    @nn.compact
    def __call__(self, feats: jnp.ndarray, level: Level, train: bool) -> jnp.ndarray:
        conv1 = SparseConv(self.inplanes, self.planes, 27, kaiming=self.kaiming,
                           name="conv1")
        norm1 = SparseBatchNorm(self.planes, name="norm1")
        conv2 = SparseConv(self.planes, self.planes, 27, kaiming=self.kaiming,
                           name="conv2")
        norm2 = SparseBatchNorm(self.planes, name="norm2")
        fuse = not train and sconv.FUSE_BN_EVAL
        if fuse:
            # eval: BN folds to a per-channel affine — fuse it (+ReLU, +mask)
            # into the conv kernel's output write (sparse/conv.py FUSE_BN_EVAL)
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
        if self.use_eca:
            out = ECALayer(self.planes, name="eca")(out, level.mask)
        if self.inplanes != self.planes:
            residual = SparseConv1x1(self.inplanes, self.planes, kaiming=self.kaiming,
                                     name="downsample_conv")(feats)
            residual = SparseBatchNorm(self.planes, name="downsample_norm")(
                residual, level.mask, train
            )
        else:
            residual = feats
        return masked(nn.relu(out + residual), level.mask)


class GeM(nn.Module):
    """Generalized-mean pooling (reference layers/pooling.py:72-86): learnable p
    (init 3), clamp(min=eps) then p-power, masked average, 1/p-power."""

    eps: float = 1e-6
    p_init: float = 3.0

    @nn.compact
    def __call__(self, feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        p = self.param("p", lambda k: jnp.full((1,), self.p_init, jnp.float32))
        x = jnp.clip(feats, self.eps, None) ** p
        x = global_avg_pool(masked(x, mask), mask)
        # clouds with zero valid voxels (bucket padding) pool to 0; 0**(1/p) has
        # an infinite derivative, so clamp at eps**p (== GeM of an eps-feature)
        x = jnp.maximum(x, self.eps ** p)
        return x ** (1.0 / p)


class PoolingWrapper(nn.Module):
    """Dispatch over pooling methods (reference layers/pooling.py:13-43)."""

    pool_method: str
    in_dim: int
    output_dim: int

    @nn.compact
    def __call__(self, feats: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        if self.pool_method == "MAC":
            assert self.in_dim == self.output_dim
            return global_max_pool(masked(feats, mask), mask)
        if self.pool_method == "SPoC":
            assert self.in_dim == self.output_dim
            return global_avg_pool(masked(feats, mask), mask)
        if self.pool_method == "GeM":
            assert self.in_dim == self.output_dim
            return GeM(name="gem")(feats, mask)
        if self.pool_method in ("netvlad", "netvladgc"):
            from egonn_tpu.models.netvlad import NetVLADLoupe

            return NetVLADLoupe(
                feature_size=self.in_dim,
                cluster_size=64,
                output_dim=self.output_dim,
                gating=self.pool_method == "netvladgc",
                add_batch_norm=True,
                name="netvlad",
            )(feats, mask)
        raise NotImplementedError(f"Unknown pooling method: {self.pool_method}")


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """torch.nn.functional.normalize parity: x / max(||x||, eps).

    Gradient-safe on all-zero rows (padding): the norm is computed as
    sqrt(max(sum(x^2), eps^2)) so its derivative stays finite at 0 — a bare
    jnp.linalg.norm has a NaN gradient there that poisons the whole backward."""
    nsq = jnp.sum(x * x, axis=axis, keepdims=True)
    n = jnp.sqrt(jnp.maximum(nsq, eps * eps))
    return x / n


class DescriptorDecoder(nn.Module):
    """2-layer MLP decoder (reference models/minkgl.py:207-225):
    in -> mid -> out with mid = out + (in - out)//2, optional L2 normalization."""

    in_channels: int
    out_channels: int
    normalize: bool = True

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        mid = self.out_channels + (self.in_channels - self.out_channels) // 2
        x = Linear(self.in_channels, mid, name="fc1")(feats)
        x = nn.relu(x)
        x = Linear(mid, self.out_channels, name="fc2")(x)
        if self.normalize:
            x = l2_normalize(x)
        return x


class MLPRegressor(nn.Module):
    """Linear -> ReLU -> Linear -> activation (keypoint/sigma/saliency regressors,
    reference models/minkgl.py:161-204)."""

    in_channels: int
    out_channels: int
    activation: str  # 'tanh' | 'softplus' | 'sigmoid'
    reduction: int = 2

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        mid = self.in_channels // self.reduction
        x = Linear(self.in_channels, mid, name="fc1")(feats)
        x = nn.relu(x)
        x = Linear(mid, self.out_channels, name="fc2")(x)
        if self.activation == "tanh":
            return jnp.tanh(x)
        if self.activation == "softplus":
            return jax.nn.softplus(x)
        if self.activation == "sigmoid":
            return jax.nn.sigmoid(x)
        raise NotImplementedError(self.activation)
