"""Device-side voxel hash tables: the TPU-native replacement for MinkowskiEngine's
coordinate manager (sparse_quantize dedup + kernel-map construction).

Design
------
Everything is a fixed-shape, jit-compilable program:

* A hash table is a flat int32 array of size `table_size` (power of two, >= 2x the
  number of keys) storing row indices into the coordinate array; empty slots hold the
  sentinel `N` (number of rows).
* Insertion is vectorized parallel linear probing: every not-yet-placed row
  scatter-mins its row id into its current slot; winners stay, rows that discover an
  occupant with identical coordinates become duplicates pointing at the occupant,
  everyone else advances one slot.  A `lax.while_loop` iterates until all rows are
  resolved (expected 2-4 rounds at load factor <= 0.5).
* Lookup probes linearly from the hashed slot until it finds a matching occupant or an
  empty slot (linear-probing invariant: a present key is always reachable before the
  first empty slot on its chain).

These two primitives implement both `ME.utils.sparse_quantize` (voxel dedup, keeping
the FIRST point per voxel — reference datasets/quantization.py:42) and ME's kernel
maps (gather indices for sparse convolutions — see egonn_tpu.sparse.conv).

All functions operate on a single cloud; batch via `jax.vmap`.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def table_size_for(n: int) -> int:
    """Power-of-two table size giving load factor <= 0.5."""
    return max(8, next_pow2(2 * n))


def hash_coords(coords: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Hash (..., 3) int32 coords into [0, table_size). table_size must be pow2."""
    c = coords.astype(jnp.uint32)
    h = c[..., 0] * jnp.uint32(0x9E3779B1)
    h = h ^ (c[..., 1] * jnp.uint32(0x85EBCA77))
    h = h ^ (c[..., 2] * jnp.uint32(0xC2B2AE3D))
    # Final avalanche (xxhash-style) so low bits depend on all coords.
    h = h ^ (h >> jnp.uint32(15))
    h = h * jnp.uint32(0x2C1B3C6D)
    h = h ^ (h >> jnp.uint32(12))
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


class HashTable(NamedTuple):
    """Immutable voxel hash table over a fixed coordinate array."""

    slots: jnp.ndarray   # (T,) int32 row ids; empty slots hold n_rows
    coords: jnp.ndarray  # (N, 3) int32 backing coordinates
    mask: jnp.ndarray    # (N,) bool — valid rows

    @property
    def n_rows(self) -> int:
        return self.coords.shape[0]

    @property
    def table_size(self) -> int:
        return self.slots.shape[0]


def build_table(coords: jnp.ndarray, mask: jnp.ndarray, table_size: int | None = None):
    """Insert all valid rows of `coords` into a fresh table.

    Returns (HashTable, canonical) where canonical[i] is, for every valid row i, the
    smallest row index holding identical coordinates (itself if it is the first
    occurrence); invalid rows get sentinel N.  `is_first = canonical == arange(N)`.
    """
    n = coords.shape[0]
    if table_size is None:
        table_size = table_size_for(n)
    sent = jnp.int32(n)
    rows = jnp.arange(n, dtype=jnp.int32)
    slots = jnp.full((table_size,), sent, dtype=jnp.int32)
    slot = hash_coords(coords, table_size)
    done = ~mask
    canonical = jnp.full((n,), sent, dtype=jnp.int32)

    def cond(state):
        done, _, _, _ = state
        return jnp.any(~done)

    def body(state):
        done, slot, slots, canonical = state
        active = ~done
        # Phase 1: inspect current slot.  If it already holds identical coords, this
        # row is a duplicate of the occupant.
        occ0 = slots[slot]
        empty0 = occ0 == sent
        dup0 = active & ~empty0 & jnp.all(
            coords[jnp.clip(occ0, 0, n - 1)] == coords, axis=-1
        )
        canonical = jnp.where(dup0, occ0, canonical)
        done = done | dup0
        # Phase 2: rows whose slot was empty at round start race for it via
        # scatter-min.  Occupied slots are never attempted, so placements are final.
        attempt = ~done & empty0
        cand = jnp.where(attempt, rows, sent)
        slots = slots.at[slot].min(cand)
        occ1 = slots[slot]
        won = attempt & (occ1 == rows)
        # Race losers whose coords match the winner's are duplicates of the winner.
        lost_dup = attempt & ~won & jnp.all(
            coords[jnp.clip(occ1, 0, n - 1)] == coords, axis=-1
        )
        canonical = jnp.where(won, rows, jnp.where(lost_dup, occ1, canonical))
        done = done | won | lost_dup
        slot = jnp.where(done, slot, (slot + 1) & (table_size - 1))
        return done, slot, slots, canonical

    done, slot, slots, canonical = jax.lax.while_loop(
        cond, body, (done, slot, slots, canonical)
    )
    return HashTable(slots=slots, coords=coords, mask=mask), canonical


def lookup(table: HashTable, queries: jnp.ndarray, qmask: jnp.ndarray) -> jnp.ndarray:
    """Find row indices of `queries` (..., 3) in the table.

    Returns int32 array of query shape[:-1]; missing / masked-out queries get -1.
    """
    n = table.n_rows
    tsize = table.table_size
    sent = jnp.int32(n)
    qshape = queries.shape[:-1]
    q = queries.reshape(-1, 3)
    qm = qmask.reshape(-1)
    slot = hash_coords(q, tsize)
    result = jnp.full(q.shape[:1], -1, dtype=jnp.int32)
    done = ~qm

    def cond(state):
        done, _, _ = state
        return jnp.any(~done)

    def body(state):
        done, slot, result = state
        occ = table.slots[slot]
        empty = occ == sent
        occ_coords = table.coords[jnp.clip(occ, 0, n - 1)]
        hit = ~done & ~empty & jnp.all(occ_coords == q, axis=-1)
        result = jnp.where(hit, occ, result)
        done = done | empty | hit
        slot = jnp.where(done, slot, (slot + 1) & (tsize - 1))
        return done, slot, result

    done, slot, result = jax.lax.while_loop(cond, body, (done, slot, result))
    return result.reshape(qshape)


class UniqueResult(NamedTuple):
    coords: jnp.ndarray     # (capacity, 3) int32 unique coords (pad rows garbage)
    mask: jnp.ndarray       # (capacity,) bool
    index: jnp.ndarray      # (capacity,) int32 source-row index of the kept (first)
                            # point per voxel; 0 on pad rows
    n_unique: jnp.ndarray   # () int32 — number of unique voxels BEFORE truncation
    canonical: jnp.ndarray  # (N,) int32 canonical source row per input row (see
                            # build_table); useful to map points -> voxels


def unique_coords(coords: jnp.ndarray, mask: jnp.ndarray, capacity: int) -> UniqueResult:
    """Fixed-capacity voxel dedup — the `ME.utils.sparse_quantize(return_index=True)`
    equivalent (reference datasets/quantization.py:42).

    Keeps the first point (lowest source row) per voxel, in source order.  If more
    than `capacity` unique voxels exist, the later ones (by source order) are dropped;
    `n_unique` reports the pre-truncation count so callers can detect overflow.
    """
    n = coords.shape[0]
    sent = jnp.int32(n)
    rows = jnp.arange(n, dtype=jnp.int32)
    _, canonical = build_table(coords, mask)
    is_first = canonical == rows
    key = jnp.where(is_first, rows, sent)
    order = jax.lax.sort(key)[:capacity]
    out_mask = order < sent
    index = jnp.where(out_mask, order, 0)
    out_coords = coords[index]
    n_unique = jnp.sum(is_first).astype(jnp.int32)
    return UniqueResult(out_coords, out_mask, index, n_unique, canonical)
