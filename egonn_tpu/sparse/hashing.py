"""DEPRECATED on the hot path — kept as a measured design alternative + fixture.

Device-side voxel hash tables were the first coordinate-engine design; they are
superseded by the sort-based engine in sparse/packing.py (measured ~100x faster
on TPU because parallel linear-probing insertion scatters collide and serialize
— see PERFORMANCE.md design-space table).  Nothing on the model/train/eval path
imports this module; it remains as (a) the reference implementation its tests
golden-check packing.py against, and (b) documentation of why hash tables lose
on TPU.

Original design notes follow.

Device-side voxel hash tables: the TPU-native replacement for MinkowskiEngine's
coordinate manager (sparse_quantize dedup + kernel-map construction).

TPU layout notes (the design is shaped by tile padding):

* Coordinates are carried TRANSPOSED as (3, N) int32 ("coords_t").  TPU tiles pad
  the last two dims to (8, 128); an (N, 3) int32 array pads its 3-wide minor dim to
  128 lanes — a 42x memory blowup that OOMs HBM at kernel-map scale.
* Probe verification never gathers 3-component coordinates.  Each row gets TWO
  independent 32-bit fingerprints (a combined 64-bit hash); equality of both is the
  match test.  A false match needs a 2^-64 fingerprint collision on the same probe
  chain — negligible.  All per-probe traffic is therefore flat (N,) int32 arrays.

Design
------
Everything is a fixed-shape, jit-compilable program:

* A hash table is a flat int32 array of size `table_size` (power of two, >= 2x the
  number of keys) storing row indices into the coordinate array; empty slots hold
  the sentinel `N`.
* Insertion is vectorized parallel linear probing: every not-yet-placed row
  scatter-mins its row id into its current slot — but only into slots observed
  EMPTY at round start, so placements are final; rows that discover an occupant
  with identical fingerprints become duplicates pointing at the occupant; everyone
  else advances one slot.  A `lax.while_loop` iterates until all rows resolve
  (2-4 rounds at load factor <= 0.5).
* Lookup probes linearly from the hashed slot until a matching occupant or an
  empty slot (linear-probing invariant).

These two primitives implement both `ME.utils.sparse_quantize` (voxel dedup,
keeping the FIRST point per voxel — reference datasets/quantization.py:42) and
ME's kernel maps (gather indices for sparse convolutions — sparse/conv.py).

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


def _rotl(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def _murmur3(c: jnp.ndarray, seed: int) -> jnp.ndarray:
    """murmur3-style sequential mix of (3, ...) coords.  Sequential chaining (not
    XOR-of-products) makes different seeds give effectively independent functions —
    XOR-of-products fingerprints collide together on small coordinates because the
    low product bits are multiplier-independent."""
    h = jnp.uint32(seed) * jnp.ones_like(c[0], dtype=jnp.uint32)
    for i in range(3):
        k = c[i].astype(jnp.uint32) * jnp.uint32(0xCC9E2D51)
        k = _rotl(k, 15)
        k = k * jnp.uint32(0x1B873593)
        h = h ^ k
        h = _rotl(h, 13)
        h = h * jnp.uint32(5) + jnp.uint32(0xE6546B64)
    h = h ^ (h >> jnp.uint32(16))
    h = h * jnp.uint32(0x85EBCA6B)
    h = h ^ (h >> jnp.uint32(13))
    h = h * jnp.uint32(0xC2B2AE35)
    h = h ^ (h >> jnp.uint32(16))
    return h


def hash_coords(coords_t: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """Hash (3, ...) int32 coords into [0, table_size). table_size must be pow2."""
    h = _murmur3(coords_t, 0x9E3779B1)
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def fingerprints(coords_t: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Two independent 32-bit fingerprints of (3, ...) coords (as int32)."""
    f1 = _murmur3(coords_t, 0x1F123BB5)
    f2 = _murmur3(coords_t, 0x6A09E667)
    return f1.astype(jnp.int32), f2.astype(jnp.int32)


class HashTable(NamedTuple):
    """Immutable voxel hash table over a fixed coordinate array."""

    slots: jnp.ndarray     # (T,) int32 row ids; empty slots hold n_rows
    coords_t: jnp.ndarray  # (3, N) int32 backing coordinates
    fp1: jnp.ndarray       # (N,) int32 fingerprint 1 per row
    fp2: jnp.ndarray       # (N,) int32 fingerprint 2 per row
    mask: jnp.ndarray      # (N,) bool — valid rows

    @property
    def n_rows(self) -> int:
        return self.coords_t.shape[1]

    @property
    def table_size(self) -> int:
        return self.slots.shape[0]


def build_table(coords_t: jnp.ndarray, mask: jnp.ndarray,
                table_size: int | None = None):
    """Insert all valid rows of `coords_t` (3, N) into a fresh table.

    Returns (HashTable, canonical) where canonical[i] is, for every valid row i,
    the smallest row index holding identical coordinates (itself if first);
    invalid rows get sentinel N.
    """
    n = coords_t.shape[1]
    if table_size is None:
        table_size = table_size_for(n)
    sent = jnp.int32(n)
    rows = jnp.arange(n, dtype=jnp.int32)
    slots = jnp.full((table_size,), sent, dtype=jnp.int32)
    slot = hash_coords(coords_t, table_size)
    fp1, fp2 = fingerprints(coords_t)
    done = ~mask
    canonical = jnp.full((n,), sent, dtype=jnp.int32)

    def same_as(occ):
        """Does each row's coord equal the occupant's? (fingerprint equality)"""
        idx = jnp.clip(occ, 0, n - 1)
        return (fp1[idx] == fp1) & (fp2[idx] == fp2)

    def cond(state):
        done, _, _, _ = state
        return jnp.any(~done)

    def body(state):
        done, slot, slots, canonical = state
        active = ~done
        # Phase 1: inspect current slot; identical occupant => duplicate.
        occ0 = slots[slot]
        empty0 = occ0 == sent
        dup0 = active & ~empty0 & same_as(occ0)
        canonical = jnp.where(dup0, occ0, canonical)
        done = done | dup0
        # Phase 2: race for slots observed empty; placements are final.
        attempt = ~done & empty0
        cand = jnp.where(attempt, rows, sent)
        slots = slots.at[slot].min(cand)
        occ1 = slots[slot]
        won = attempt & (occ1 == rows)
        lost_dup = attempt & ~won & same_as(occ1)
        canonical = jnp.where(won, rows, jnp.where(lost_dup, occ1, canonical))
        done = done | won | lost_dup
        slot = jnp.where(done, slot, (slot + 1) & (table_size - 1))
        return done, slot, slots, canonical

    done, slot, slots, canonical = jax.lax.while_loop(
        cond, body, (done, slot, slots, canonical)
    )
    table = HashTable(slots=slots, coords_t=coords_t, fp1=fp1, fp2=fp2, mask=mask)
    return table, canonical


def lookup(table: HashTable, queries_t: jnp.ndarray, qmask: jnp.ndarray) -> jnp.ndarray:
    """Find row indices of `queries_t` (3, ...) in the table.

    Returns int32 array of the query's trailing shape; missing / masked-out
    queries get -1.
    """
    n = table.n_rows
    tsize = table.table_size
    sent = jnp.int32(n)
    qshape = queries_t.shape[1:]
    q = queries_t.reshape(3, -1)
    qm = qmask.reshape(-1)
    slot = hash_coords(q, tsize)
    qf1, qf2 = fingerprints(q)
    result = jnp.full(q.shape[1:], -1, dtype=jnp.int32)
    done = ~qm

    def cond(state):
        done, _, _ = state
        return jnp.any(~done)

    def body(state):
        done, slot, result = state
        occ = table.slots[slot]
        empty = occ == sent
        idx = jnp.clip(occ, 0, n - 1)
        hit = ~done & ~empty & (table.fp1[idx] == qf1) & (table.fp2[idx] == qf2)
        result = jnp.where(hit, occ, result)
        done = done | empty | hit
        slot = jnp.where(done, slot, (slot + 1) & (tsize - 1))
        return done, slot, result

    done, slot, result = jax.lax.while_loop(cond, body, (done, slot, result))
    return result.reshape(qshape)


class UniqueResult(NamedTuple):
    coords_t: jnp.ndarray   # (3, capacity) int32 unique coords (pad rows garbage)
    mask: jnp.ndarray       # (capacity,) bool
    index: jnp.ndarray      # (capacity,) int32 source-row of the kept (first) point
    n_unique: jnp.ndarray   # () int32 — unique count BEFORE truncation
    canonical: jnp.ndarray  # (N,) int32 canonical source row per input row


def unique_coords(coords_t: jnp.ndarray, mask: jnp.ndarray, capacity: int
                  ) -> UniqueResult:
    """Fixed-capacity voxel dedup — `ME.utils.sparse_quantize(return_index=True)`
    equivalent (reference datasets/quantization.py:42).

    Keeps the first point (lowest source row) per voxel, in source order; voxels
    beyond `capacity` are dropped (n_unique reports the true count).
    """
    n = coords_t.shape[1]
    sent = jnp.int32(n)
    rows = jnp.arange(n, dtype=jnp.int32)
    _, canonical = build_table(coords_t, mask)
    is_first = canonical == rows
    key = jnp.where(is_first, rows, sent)
    order = jax.lax.sort(key)[:capacity]
    out_mask = order < sent
    index = jnp.where(out_mask, order, 0)
    out_coords = coords_t[:, index]
    n_unique = jnp.sum(is_first).astype(jnp.int32)
    return UniqueResult(out_coords, out_mask, index, n_unique, canonical)
