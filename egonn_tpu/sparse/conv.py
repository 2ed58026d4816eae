"""Sparse convolution compute: gather -> matmul -> accumulate programs over the
kernel maps produced by egonn_tpu.sparse.pyramid.

This replaces MinkowskiEngine's C++/CUDA convolution kernels
(ME.MinkowskiConvolution / MinkowskiConvolutionTranspose, used throughout the
reference models/minkgl.py and models/resnet.py) with XLA-native programs:

* `sparse_conv`: out[o] = sum_k feats[kmap[k, o]] @ W[k]; a lax.scan over the K
  kernel offsets, each step one batched (B, C, F_in) x (F_in, F_out) matmul on the
  MXU. Missing neighbors gather a zero row (sentinel index == C_in).
* `sparse_conv_ones`: fast path for the stem conv when input features are the
  constant 1 (EgoNN feeds all-ones 1-channel features — reference
  datasets/dataset_utils.py:80): the gather degenerates to the kmap validity
  pattern, one (B, C, K) x (K, F_out) matmul, no scan.
* `sparse_tconv2x2`: transposed k=2 s=2 conv onto the recorded finer coordinate
  set. Each fine voxel has exactly one parent and kernel slot, so this is a gather
  plus 8 slot-masked matmuls.

All functions are shape-static, differentiable, vmap/pjit-friendly.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

# Banded Pallas conv engine (sparse/banded.py): ~2x the gather path on v5e by
# turning HBM row-gathers into in-VMEM one-hot MXU matmuls over sorted-key
# bands.  Exact fallback built in (lax.cond when a band overflows its window).
# Default on; EGONN_BANDED=0 reverts to the pure gather path (tests use that
# for f32-exact golden comparisons — the banded path computes in bf16, which
# matches the production default matmul precision but not precision=highest).
USE_BANDED = os.environ.get("EGONN_BANDED", "1") == "1"

# Fuse eval-mode BN affine + ReLU + row mask into the conv output write
# (models pass an `epi` tuple when train=False).  Saves one XLA elementwise
# read+write pass over every (B, C, F) activation that follows an opaque
# pallas_call.  EGONN_FUSE_BN=0 restores the module-by-module eval path
# (identical math, associated differently: x*(s*rsqrt) + (b - m*s*rsqrt)
# vs (x-m)*rsqrt*s + b — ulp-level differences only).
FUSE_BN_EVAL = os.environ.get("EGONN_FUSE_BN", "1") == "1"

# Fused banded dW backward (sparse/banded.py::banded_conv_dw): the conv-weight
# gradient's per-offset re-gathers move from XLA HBM row-gathers onto the
# banded kernel's in-VMEM one-hot MXU path.  EGONN_BANDED_DW=0 restores the
# XLA re-gather backward (A/B switch).
BANDED_DW = os.environ.get("EGONN_BANDED_DW", "1") == "1"

# Transposed down conv for inference (sparse/banded.py::banded_tdown_pallas):
# the eval-path k=2 s=2 down conv consumes the up map directly instead of
# kmap_down, making the kmap_down inversion scatters (the trace's largest
# XLA fusions, ~1.5 ms/batch at bench shapes) dead code in inference jits.
# EGONN_TDOWN=0 restores the kmap_down gather conv (A/B switch).
TDOWN = os.environ.get("EGONN_TDOWN", "1") == "1"


def set_banded(enabled: bool) -> None:
    """Toggle the banded conv engine (affects subsequent traces only)."""
    global USE_BANDED
    USE_BANDED = enabled


def set_fuse_bn(enabled: bool) -> None:
    """Toggle eval-mode BN/ReLU epilogue fusion (affects subsequent traces)."""
    global FUSE_BN_EVAL
    FUSE_BN_EVAL = enabled


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def activation_dtype():
    """Storage dtype for trunk/head activations.  EGONN_BF16_ACTS=1 stores
    them bf16 on TPU — halves activation memory (relevant at the batch-128
    envelope), measured perf-neutral on the inference bench (the conv kernels
    compute in bf16 either way), so default off to keep training numerics
    byte-stable."""
    if os.environ.get("EGONN_BF16_ACTS", "0") == "1" and _on_tpu():
        return jnp.bfloat16
    return jnp.float32


def _pad_zero_row(feats: jnp.ndarray) -> jnp.ndarray:
    """Append a zero feature row per cloud so the sentinel index C_in gathers 0."""
    b, _, f = feats.shape
    return jnp.concatenate([feats, jnp.zeros((b, 1, f), feats.dtype)], axis=1)


def _conv_dkernel_gather(feats: jnp.ndarray, kmap: jnp.ndarray, g: jnp.ndarray
                         ) -> jnp.ndarray:
    """Exact XLA dW: re-gather per offset (memory-free but HBM-gather bound)."""
    feats_p = _pad_zero_row(feats)

    def step(_, idx_k):
        gth = jnp.take_along_axis(feats_p, idx_k[..., None], axis=1)
        return None, jnp.einsum("bcf,bco->fo", gth, g,
                                preferred_element_type=jnp.float32)

    _, dk = jax.lax.scan(step, None, jnp.swapaxes(kmap, 0, 1))
    return dk


def _conv_dkernel(feats: jnp.ndarray, kmap: jnp.ndarray, g: jnp.ndarray
                  ) -> jnp.ndarray:
    """dL/dkernel for out[o] = sum_k feats[kmap[k,o]] @ W[k]:
    dW[k] = gathered_k^T @ g.  On TPU the gather + contraction run fused in
    the banded Pallas dW kernel (sparse/banded.py::banded_conv_dw); otherwise
    (or for non-banded-eligible map shapes) the XLA re-gather backward."""
    if USE_BANDED and BANDED_DW and _on_tpu():
        from egonn_tpu.sparse.banded import banded_conv_dw

        dw = banded_conv_dw(feats, kmap, g, fallback_fn=_conv_dkernel_gather)
        if dw is not None:
            return dw
    return _conv_dkernel_gather(feats, kmap, g)


@jax.custom_vjp
def sparse_conv_sym(feats: jnp.ndarray, kmap: jnp.ndarray, kernel: jnp.ndarray
                    ) -> jnp.ndarray:
    """Stride-1 self-convolution over a SYMMETRIC offset set (odd k^3 kernels).

    Same forward as sparse_conv, but with a custom backward exploiting offset
    symmetry: the transpose of gathering offset d is gathering offset -d, so
    dfeats = sparse_conv(g, kmap reversed along K, W^T per offset) — a pure
    gather program.  The default autodiff instead (a) saves all K gathered
    activations for the backward (observed 2.7 GB per level per train step at
    batch 128) and (b) lowers the transpose to colliding scatter-adds, which
    serialize on TPU.
    """
    return sparse_conv(feats, kmap, kernel, self_map=True)


def _sym_fwd(feats, kmap, kernel):
    return sparse_conv(feats, kmap, kernel, self_map=True), (feats, kmap, kernel)


def _sym_bwd(res, g):
    feats, kmap, kernel = res
    # reverse the offset axis: C-order product of a centered range maps -d to
    # index K-1-k
    kmap_rev = kmap[:, ::-1, :]
    kernel_t = jnp.swapaxes(kernel, 1, 2)
    # the reversed self map is itself a self map (center stays center)
    dfeats = sparse_conv(g, kmap_rev, kernel_t, self_map=True)
    dkernel = _conv_dkernel(feats, kmap, g)
    return dfeats, None, dkernel


sparse_conv_sym.defvjp(_sym_fwd, _sym_bwd)


@jax.custom_vjp
def sparse_conv_down(feats: jnp.ndarray, kmap_down: jnp.ndarray,
                     up_parent: jnp.ndarray, up_koffset: jnp.ndarray,
                     kernel: jnp.ndarray) -> jnp.ndarray:
    """k=2 s=2 downsampling conv with a gather-only backward.

    The transpose of the down conv IS the transposed conv: dfeats[fine f] =
    g[parent(f)] @ W[koffset(f)]^T — exactly sparse_tconv2x2 with W^T."""
    return sparse_conv(feats, kmap_down, kernel)


def _down_fwd(feats, kmap_down, up_parent, up_koffset, kernel):
    return sparse_conv(feats, kmap_down, kernel), (
        feats, kmap_down, up_parent, up_koffset, kernel)


def _down_bwd(res, g):
    feats, kmap_down, up_parent, up_koffset, kernel = res
    kernel_t = jnp.swapaxes(kernel, 1, 2)
    dfeats = sparse_tconv2x2(g, up_parent, up_koffset, kernel_t)
    dkernel = _conv_dkernel(feats, kmap_down, g)
    return dfeats, None, None, None, dkernel


sparse_conv_down.defvjp(_down_fwd, _down_bwd)


@jax.custom_vjp
def sparse_tconv2x2_vjp(feats_coarse: jnp.ndarray, up_parent: jnp.ndarray,
                        up_koffset: jnp.ndarray, kmap_down: jnp.ndarray,
                        kernel: jnp.ndarray) -> jnp.ndarray:
    """Transposed k=2 s=2 conv with a gather-only backward: dfeats_coarse =
    down-conv of g with W^T (kmap_down of the coarse level)."""
    return sparse_tconv2x2(feats_coarse, up_parent, up_koffset, kernel)


def _tconv_fwd(feats_coarse, up_parent, up_koffset, kmap_down, kernel):
    out = sparse_tconv2x2(feats_coarse, up_parent, up_koffset, kernel)
    return out, (feats_coarse, up_parent, up_koffset, kmap_down, kernel)


def _tconv_bwd(res, g):
    feats_coarse, up_parent, up_koffset, kmap_down, kernel = res
    kernel_t = jnp.swapaxes(kernel, 1, 2)
    dfeats = sparse_conv(g, kmap_down, kernel_t)
    # dW[k] = sum over fine voxels with koffset k of in[parent]^T g
    feats_p = _pad_zero_row(feats_coarse)
    gathered = jnp.take_along_axis(feats_p, up_parent[..., None], axis=1)

    def step(_, k):
        sel = (up_koffset == k)[..., None].astype(g.dtype)
        return None, jnp.einsum("bcf,bco->fo", gathered * sel, g,
                                preferred_element_type=jnp.float32)

    _, dkernel = jax.lax.scan(step, None, jnp.arange(8, dtype=jnp.int32))
    return dfeats, None, None, None, dkernel


sparse_tconv2x2_vjp.defvjp(_tconv_fwd, _tconv_bwd)


def sparse_conv(feats: jnp.ndarray, kmap: jnp.ndarray, kernel: jnp.ndarray,
                epi: tuple | None = None, self_map: bool = False) -> jnp.ndarray:
    """Sparse convolution.

    feats:  (B, C_in, F_in) — padding rows must be zero (use types.masked).
    kmap:   (B, K, C_out) int32 gather indices into C_in (sentinel C_in -> zero).
    kernel: (K, F_in, F_out).
    Returns (B, C_out, F_out); padding rows of the output coordinate set come out
    zero automatically (their kmap entries are all-sentinel).

    epi = (scale (F_out,), bias (F_out,), relu: bool, mask (B, C_out)) fuses an
    inference-mode BN affine + ReLU + row mask into the conv's output write
    (Pallas epilogue on TPU; an XLA elementwise tail otherwise).  Inference
    only — the epilogue has no VJP (eval forwards are never differentiated).

    self_map: kmap is a stride-1 self kernel map (or its offset-reversed
    backward) — enables the banded kernel's center-identity path.
    """
    if USE_BANDED and _on_tpu():
        from egonn_tpu.sparse.banded import banded_conv_pallas

        return banded_conv_pallas(feats, kmap, kernel, epi=epi,
                                  self_map=self_map).astype(feats.dtype)

    from egonn_tpu.sparse.banded import _plain_gather_conv

    out = _plain_gather_conv(feats, kmap, kernel)
    if epi is not None:
        scale, bias, relu, mask = epi
        out = out * scale + bias
        if relu:
            out = jnp.maximum(out, 0.0)
        out = jnp.where(mask[..., None], out, 0.0)
    return out.astype(feats.dtype)


def sparse_tdown(feats: jnp.ndarray, up_parent: jnp.ndarray,
                 up_koffset: jnp.ndarray, kernel: jnp.ndarray,
                 c_coarse: int, mask_coarse: jnp.ndarray,
                 epi: tuple | None = None) -> jnp.ndarray:
    """k=2 s=2 down conv in TRANSPOSED form: driven by the fine level's up map
    (up_parent/up_koffset, both (B, c_fine)) instead of kmap_down, so
    inference graphs never materialize the kmap_down inversion scatter.

    Identical math and accumulation order to sparse_conv(feats, kmap_down,
    kernel) — each (parent, slot) pair has at most one child.  Inference
    only (no VJP; training keeps the kmap_down path whose backward the
    pyramid's dual maps serve)."""
    from egonn_tpu.sparse import banded

    if USE_BANDED and _on_tpu():
        return banded.banded_tdown_pallas(
            feats, up_parent, up_koffset, kernel, c_coarse, mask_coarse,
            epi=epi).astype(feats.dtype)
    out = banded.plain_tdown(feats, up_parent, up_koffset, kernel, c_coarse)
    if epi is not None:
        scale, bias, relu, mask = epi
        out = out * scale + bias
        if relu:
            out = jnp.maximum(out, 0.0)
        out = jnp.where(mask[..., None], out, 0.0)
    return out.astype(feats.dtype)


def sparse_conv_ones(kmap: jnp.ndarray, kernel: jnp.ndarray, n_in_rows: int,
                     dtype=jnp.float32) -> jnp.ndarray:
    """Stem conv over constant-ones 1-channel features.

    out[b, c] = sum_k [kmap[b, k, c] valid] * kernel[k, 0, :] — a single matmul of
    the occupancy pattern against the (K, F_out) weight matrix.
    """
    valid = (kmap < n_in_rows).astype(dtype)  # (B, K, C_out)
    w = kernel[:, 0, :]  # (K, F_out)
    return jnp.einsum("bkc,ko->bco", valid, w, preferred_element_type=jnp.float32).astype(dtype)


def sparse_conv1x1(feats: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """1x1 convolution — a plain channel matmul, no coordinate logic.

    feats (B, C, F_in), kernel (F_in, F_out)."""
    return jnp.einsum("bcf,fo->bco", feats, kernel, preferred_element_type=jnp.float32).astype(feats.dtype)


def sparse_tconv2x2(feats_coarse: jnp.ndarray, up_parent: jnp.ndarray,
                    up_koffset: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Transposed k=2 s=2 convolution from level l+1 onto level l's coordinates.

    feats_coarse: (B, C_coarse, F_in); up_parent: (B, C_fine) index into C_coarse
    (sentinel C_coarse); up_koffset: (B, C_fine) in [0, 8); kernel: (8, F_in, F_out).
    """
    feats_p = _pad_zero_row(feats_coarse)
    g = jnp.take_along_axis(feats_p, up_parent[..., None], axis=1)  # (B, C_fine, F_in)
    b, c_fine, _ = g.shape
    f_out = kernel.shape[-1]

    # out[b,c] = g[b,c] @ kernel[koffset[b,c]] — 8 slot-masked matmuls via scan.
    def step(acc, xs):
        k, w_k = xs
        sel = (up_koffset == k)[..., None].astype(g.dtype)
        return acc + jnp.einsum(
            "bcf,fo->bco", g * sel, w_k, preferred_element_type=jnp.float32
        ), None

    acc0 = jnp.zeros((b, c_fine, f_out), jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, (jnp.arange(8, dtype=jnp.int32), kernel))
    return acc.astype(feats_coarse.dtype)
