"""Device-side point cloud augmentations (jit-compiled, batched).

Re-implements the reference datasets/augmentation.py semantics with jax PRNG:

* TrainTransform aug_mode 1: jitter (sigma .1, clip .2) -> remove random points
  (r in 0..0.1) -> random translation (<= 0.3) -> remove random block (p=.4)
* aug_mode 2 additionally inserts a random z-rotation (max_theta=180) before the
  block removal (reference :17-24).
* TrainSetTransform (whole-batch transform): aug_mode 1: z-rot (max 5 deg) + random
  axis flips p=[.25,.25,0]; aug_mode 2: flips only (reference :33-48).

Removal augmentations ZERO the point coordinates instead of deleting them
(reference :201, :238) — the zeroed points then quantize into the origin voxel,
preserving the reference's voxel statistics.

All functions operate on (N, 3) clouds and vmap over batches; a validity mask rides
along untouched (removals zero coords rather than invalidate, for parity).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def jitter_points(key, pc: jnp.ndarray, sigma: float = 0.1, clip: float = 0.2) -> jnp.ndarray:
    noise = jnp.clip(sigma * jax.random.normal(key, pc.shape), -clip, clip)
    return pc + noise


def remove_random_points(key, pc: jnp.ndarray, r_min: float = 0.0, r_max: float = 0.1) -> jnp.ndarray:
    """Zero the coords of a random fraction r ~ U(r_min, r_max) of points."""
    k1, k2 = jax.random.split(key)
    r = jax.random.uniform(k1, (), minval=r_min, maxval=r_max)
    u = jax.random.uniform(k2, (pc.shape[0],))
    drop = u < r
    return jnp.where(drop[:, None], 0.0, pc)


def random_translation(key, pc: jnp.ndarray, max_delta: float = 0.3) -> jnp.ndarray:
    """Reference RandomTranslation: trans = max_delta * randn(1, 3)."""
    t = max_delta * jax.random.normal(key, (1, 3))
    return pc + t


def rotz_matrix(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]]).reshape(3, 3)


def random_rotation_z(key, pc: jnp.ndarray, max_theta_deg: float = 180.0) -> jnp.ndarray:
    """Rotation about +z by theta ~ U(-max, max) degrees.  The reference rotates by
    coords @ R (not R^T) (datasets/augmentation.py:90) — preserved."""
    theta = (np.pi * max_theta_deg / 180.0) * 2.0 * (jax.random.uniform(key, ()) - 0.5)
    r = rotz_matrix(theta)
    return pc @ r


def remove_random_block(key, pc: jnp.ndarray, mask: jnp.ndarray, p: float = 0.4,
                        scale=(0.02, 0.33), ratio=(0.3, 3.3)) -> jnp.ndarray:
    """Zero points inside a random fronto-parallel (x, y) cuboid
    (reference :205-239). mask marks valid points for the bbox computation."""
    ks = jax.random.split(key, 5)
    big = 1e9
    mx = jnp.where(mask[:, None], pc, big)
    mn = jnp.where(mask[:, None], pc, -big)
    min_c = jnp.min(mx, axis=0)
    max_c = jnp.max(mn, axis=0)
    span = max_c - min_c
    area = span[0] * span[1]
    erase_area = jax.random.uniform(ks[0], (), minval=scale[0], maxval=scale[1]) * area
    aspect = jax.random.uniform(ks[1], (), minval=ratio[0], maxval=ratio[1])
    h = jnp.sqrt(erase_area * aspect)
    w = jnp.sqrt(erase_area / aspect)
    x = min_c[0] + jax.random.uniform(ks[2], ()) * (span[0] - w)
    y = min_c[1] + jax.random.uniform(ks[3], ()) * (span[1] - h)
    inside = (
        (x < pc[:, 0]) & (pc[:, 0] < x + w) & (y < pc[:, 1]) & (pc[:, 1] < y + h)
    )
    apply = jax.random.uniform(ks[4], ()) < p
    return jnp.where((inside & apply)[:, None], 0.0, pc)


def random_flip(key, pc: jnp.ndarray, p=(0.25, 0.25, 0.0)) -> jnp.ndarray:
    """Flip at most one axis, chosen by cumulative probability (reference :51-71)."""
    r = jax.random.uniform(key, ())
    csum = np.cumsum(p)
    sign_x = jnp.where(r <= csum[0], -1.0, 1.0)
    sign_y = jnp.where((r > csum[0]) & (r <= csum[1]), -1.0, 1.0)
    sign_z = jnp.where((r > csum[1]) & (r <= csum[2]), -1.0, 1.0)
    return pc * jnp.array([sign_x, sign_y, sign_z])


def train_transform(key, pc: jnp.ndarray, mask: jnp.ndarray, aug_mode: int = 2) -> jnp.ndarray:
    """Per-element TrainTransform (reference :10-30)."""
    ks = jax.random.split(key, 5)
    pc = jitter_points(ks[0], pc)
    pc = remove_random_points(ks[1], pc)
    pc = random_translation(ks[2], pc)
    if aug_mode == 2:
        pc = random_rotation_z(ks[3], pc, 180.0)
    elif aug_mode != 1:
        raise NotImplementedError(f"Unknown aug_mode: {aug_mode}")
    pc = remove_random_block(ks[4], pc, mask)
    return pc


def train_set_transform(key, pc_batch: jnp.ndarray, aug_mode: int = 2) -> jnp.ndarray:
    """Whole-batch TrainSetTransform — the SAME transform applied to every cloud
    (reference :33-48, applied to the concatenated batch)."""
    k1, k2 = jax.random.split(key)
    b, n, _ = pc_batch.shape
    flat = pc_batch.reshape(b * n, 3)
    if aug_mode == 1:
        flat = random_rotation_z(k1, flat, 5.0)
        flat = random_flip(k2, flat)
    elif aug_mode == 2:
        flat = random_flip(k2, flat)
    else:
        raise NotImplementedError(f"Unknown aug_mode: {aug_mode}")
    return flat.reshape(b, n, 3)
