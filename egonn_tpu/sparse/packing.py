"""Packed-key sorted voxel sets: the TPU-fast coordinate engine.

Why not a hash table?  TPU scatters with potentially-colliding indices execute
(mostly) serially, so parallel linear-probing insertion (sparse/hashing.py) costs
seconds per batch on real hardware.  This module replaces it with sort-based
primitives whose every op is a dense vectorized gather / sort / cumsum:

* Coordinates pack into ONE int32 key: (c+off_x) << (by+bz) | (c+off_y) << bz |
  (c+off_z), with a configurable bit budget summing to <= 31.  LiDAR voxel ranges
  fit easily (default 10/10/11 bits with offsets (512, 512, 1024) covers theta in
  [0, 512), ring/xy in [-512, 512), z in [-1024, 1024) voxel units at EVERY pyramid
  level — floor-division only shrinks magnitudes).  Out-of-range voxels are dropped
  and counted.
* Dedup (`sorted_unique`) = stable sort by key (+ row payload) -> run-start
  detection -> cumsum rank -> one UNIQUE-index scatter to compact.  "First point
  per voxel" (reference datasets/quantization.py:42 semantics) holds because the
  stable sort keeps equal keys in source order.
* Kernel maps / lookups = bucketed compare-all over the sorted key array
  (lookup_sorted: one contiguous bucket row-gather + dense compares per query)
  — no data-dependent loops at all.

The resulting voxel sets are SORTED BY KEY (a deterministic spatial order), which
also makes downstream gathers cache-friendlier.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

MAXKEY = jnp.int32(2**31 - 1)  # sorts to the end; also the "invalid" marker


@dataclass(frozen=True)
class PackSpec:
    """Bit budget and offsets mapping signed voxel coords to a positive int32 key."""

    bits: Tuple[int, int, int] = (10, 10, 11)
    offsets: Tuple[int, int, int] = (512, 512, 1024)

    def __post_init__(self):
        assert sum(self.bits) <= 31, "packed key must fit in a positive int32"


DEFAULT_PACK = PackSpec()


def pack_keys(coords_t: jnp.ndarray, mask: jnp.ndarray, spec: PackSpec = DEFAULT_PACK
              ) -> jnp.ndarray:
    """(3, N) int32 coords + (N,) mask -> (N,) int32 keys; invalid/out-of-range
    entries get MAXKEY."""
    bx, by, bz = spec.bits
    ox, oy, oz = spec.offsets
    x = coords_t[0] + ox
    y = coords_t[1] + oy
    z = coords_t[2] + oz
    in_range = (
        (x >= 0) & (x < (1 << bx)) & (y >= 0) & (y < (1 << by))
        & (z >= 0) & (z < (1 << bz))
    )
    key = (x << (by + bz)) | (y << bz) | z
    return jnp.where(mask & in_range, key, MAXKEY)


def unpack_keys(keys: jnp.ndarray, spec: PackSpec = DEFAULT_PACK) -> jnp.ndarray:
    """(N,) keys -> (3, N) coords (valid entries only; MAXKEY rows are garbage)."""
    bx, by, bz = spec.bits
    ox, oy, oz = spec.offsets
    z = (keys & ((1 << bz) - 1)) - oz
    y = ((keys >> bz) & ((1 << by) - 1)) - oy
    x = ((keys >> (by + bz)) & ((1 << bx) - 1)) - ox
    return jnp.stack([x, y, z], axis=0)


def compact_ranked(vals: jnp.ndarray, keep: jnp.ndarray, capacity: int,
                   payload: jnp.ndarray | None = None):
    """Order-preserving compaction of kept entries to the front WITHOUT a
    second sort: LSB-first conditional left-shifts.

    Kept element j must land at rank[j] = cumsum(keep)[j] - 1; its displacement
    delta = j - rank is NON-DECREASING over kept positions, which makes the
    per-bit shifts collision-free: at stage s (all remaining deltas multiples
    of s) a mover lands on a stayer only if their final targets coincide —
    impossible for distinct ranks.  Holes get delta 0 (never move, freely
    overwritten).  Replaces the compaction-by-second-sort (measured 2.4 ms for
    8x65k lax.sort on v5e vs ~1.2 ms for this loop; a Pallas in-VMEM variant
    of the same loop measured 5.7 ms — Mosaic lane rolls cost more than the
    XLA concatenate passes).

    Returns (vals (capacity,) with MAXKEY past the kept count, payload
    (capacity,) or None zero-padded, total_kept () int32)."""
    n = vals.shape[0]
    c = jnp.cumsum(keep.astype(jnp.int32))
    delta = jnp.where(keep, jnp.arange(n, dtype=jnp.int32) - (c - 1), 0)
    v = jnp.where(keep, vals, MAXKEY)
    p = None if payload is None else jnp.where(keep, payload, 0)
    nbits = max(1, (n - 1).bit_length())
    for bi in range(nbits):
        s = 1 << bi
        d_sh = jnp.concatenate([delta[s:], jnp.zeros((s,), jnp.int32)])
        take = (d_sh & s) != 0
        v_sh = jnp.concatenate([v[s:], jnp.full((s,), MAXKEY, v.dtype)])
        v = jnp.where(take, v_sh, v)
        if p is not None:
            p_sh = jnp.concatenate([p[s:], jnp.zeros((s,), p.dtype)])
            p = jnp.where(take, p_sh, p)
        delta = jnp.where(take, d_sh - s, delta)
    total = c[-1]
    if capacity > n:  # callers keep capacity <= n; pad for API robustness
        v = jnp.concatenate([v, jnp.full((capacity - n,), MAXKEY, v.dtype)])
        if p is not None:
            p = jnp.concatenate([p, jnp.zeros((capacity - n,), p.dtype)])
    have = jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(total, capacity)
    v = jnp.where(have, v[:capacity], MAXKEY)
    if p is not None:
        p = jnp.where(have, p[:capacity], 0)
    return v, p, total


# (Round-5 measured dead end, deleted: compaction by INVERSE RANK LOOKUP — a
# bucketed searchsorted over the cumulative keep-count + one row gather.
# Bit-identical, but the bucketed count is O(capacity * n/bucket) dense
# compares (~10x the shift loop's element ops): bench 365 vs 458 clouds/s.
# The LSB-first shift loop below stays the compaction engine.)
def compact_kept(vals: jnp.ndarray, keep: jnp.ndarray, capacity: int,
                 payload: jnp.ndarray | None = None):
    """Order-preserving compaction of kept entries to the front."""
    return compact_ranked(vals, keep, capacity, payload)


class SortedUnique(NamedTuple):
    keys: jnp.ndarray      # (capacity,) int32 sorted unique keys, MAXKEY padded
    coords_t: jnp.ndarray  # (3, capacity) int32 coords of unique voxels
    mask: jnp.ndarray      # (capacity,) bool
    index: jnp.ndarray     # (capacity,) int32 FIRST source row per voxel (0 on
                           # pads); all-zero when need_index=False
    n_unique: jnp.ndarray  # () int32 unique count incl. beyond-capacity overflow


def sorted_unique(coords_t: jnp.ndarray | None, mask: jnp.ndarray | None,
                  capacity: int, spec: PackSpec = DEFAULT_PACK,
                  keys: jnp.ndarray | None = None,
                  need_index: bool = True,
                  assume_sorted: bool = False) -> SortedUnique:
    """Fixed-capacity voxel dedup keeping the first (lowest source row) point per
    voxel; output sorted by packed key.  `ME.utils.sparse_quantize` equivalent.

    need_index=False skips the source-row payload (single-operand sort — ~2x
    cheaper; EgoNN's features are constant 1 so the model never needs it) and
    permits coords_t=None (coords are then reconstructed from `keys`, which must
    be given).
    assume_sorted=True skips the sort entirely (caller promises keys are already
    ascending).  NOTE: halve_keys output does NOT qualify — halving breaks the
    lexicographic order (see halve_keys CAUTION); no production caller uses this
    today."""
    if keys is None:
        keys = pack_keys(coords_t, mask, spec)
    n = keys.shape[0]
    assert need_index is False or coords_t is not None
    if assume_sorted:
        sorted_keys = keys
        sorted_rows = jnp.arange(n, dtype=jnp.int32) if need_index else None
    elif need_index:
        rows = jnp.arange(n, dtype=jnp.int32)
        sorted_keys, sorted_rows = jax.lax.sort((keys, rows), num_keys=1,
                                                is_stable=True)
    else:
        # plain lax.sort: an in-VMEM Pallas bitonic network was built and
        # A/B'd on chip (round 4) and LOST, 411 vs 430 clouds/s — XLA's
        # HBM-streamed merge passes beat the VMEM network at 65k keys
        sorted_keys = jax.lax.sort(keys)
        sorted_rows = None
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), sorted_keys[:-1]])
    is_first = (sorted_keys != prev) & (sorted_keys != MAXKEY)

    # Compaction by rank-shift (compact_ranked), not a second sort or scatter:
    # a TPU scatter executes serially (~4.6 ns/element measured on v5e:
    # 2.4 ms for the 8x65k batch), a second lax.sort costs the same 2.4 ms,
    # and the shift loop ~1.2 ms.  Lowest keys kept on overflow — identical
    # to the old rank<capacity policy.
    if sorted_rows is not None:
        out_keys, out_rows, _ = compact_kept(sorted_keys, is_first, capacity,
                                             payload=sorted_rows)
        out_mask = out_keys != MAXKEY
        out_coords = coords_t[:, out_rows]
    else:
        out_keys, _, _ = compact_kept(sorted_keys, is_first, capacity)
        out_mask = out_keys != MAXKEY
        out_rows = jnp.zeros((capacity,), jnp.int32)
        # coordinates reconstructed losslessly from the packed keys
        out_coords = jnp.where(out_mask[None, :], unpack_keys(out_keys, spec), 0)
    n_unique = jnp.sum(is_first).astype(jnp.int32)
    return SortedUnique(out_keys, out_coords, out_mask, out_rows, n_unique)


def halve_keys(keys: jnp.ndarray, spec: PackSpec = DEFAULT_PACK) -> jnp.ndarray:
    """Packed key of floor(coord/2) computed directly on the key.

    Valid because (c + o) // 2 == c // 2 + o // 2 for even offsets.  Requires all
    offsets divisible by 2 at every level used (the defaults 512/512/1024 support
    7+ levels); MAXKEY maps to MAXKEY.  CAUTION: halving does NOT preserve the
    sorted order of a key array (collapsing a higher field defers the comparison
    to lower fields) — re-sort before using as a lookup table."""
    bx, by, bz = spec.bits
    z = (keys & ((1 << bz) - 1)) >> 1
    y = ((keys >> bz) & ((1 << by) - 1)) >> 1
    x = ((keys >> (by + bz)) & ((1 << bx) - 1)) >> 1
    halved = (x << (by + bz)) | (y << bz) | z
    return jnp.where(keys == MAXKEY, MAXKEY, halved)


def halved_spec(spec: PackSpec) -> PackSpec:
    """PackSpec whose offsets correspond to once-halved coordinates."""
    return PackSpec(spec.bits, tuple(o // 2 for o in spec.offsets))


def lookup_sorted(sorted_keys: jnp.ndarray, query_keys: jnp.ndarray,
                  sentinel: int, bucket: int = 64,
                  chunk: int = 1 << 14) -> jnp.ndarray:
    """Find positions of query keys in a MAXKEY-padded sorted key array.

    Returns int32 indices; missing/invalid queries get `sentinel`
    (use the capacity so gathers hit the zero pad row).

    Implementation note (TPU): binary search costs log2(cap) rounds of scalar
    gathers — measured ~2.4 s for 16M queries on v5e.  Instead we do a bucketed
    compare-all: the table is viewed as (cap/bucket, bucket); a query finds its
    bucket by counting boundary keys <= q (dense vectorized compares), row-gathers
    the bucket (contiguous, HBM-bandwidth-friendly), and locates the key with one
    more compare-all + argmax.  No data-dependent loops, one gather round.
    """
    cap = sorted_keys.shape[0]
    if cap % bucket != 0:
        bucket = 1 << max(0, (cap & -cap).bit_length() - 1)  # largest pow2 divisor
        bucket = min(bucket, 64)
    nb = cap // bucket
    table = sorted_keys.reshape(nb, bucket)
    boundaries = table[:, 0]  # (nb,)

    qshape = query_keys.shape
    q = query_keys.reshape(-1)
    m = q.shape[0]

    def body(qc):
        # bucket index = (# boundaries <= q) - 1, clamped
        cnt = jnp.sum(boundaries[None, :] <= qc[:, None], axis=1).astype(jnp.int32)
        b = jnp.clip(cnt - 1, 0, nb - 1)
        rows = table[b]  # (chunk, bucket) contiguous row gather
        eq = rows == qc[:, None]
        found = jnp.any(eq, axis=1) & (qc != MAXKEY)
        within = jnp.argmax(eq, axis=1).astype(jnp.int32)
        pos = b * bucket + within
        return jnp.where(found, pos, sentinel)

    if m <= chunk:
        return body(q).reshape(qshape)
    # The (M, bucket) row-gather intermediate materializes (~M*bucket*4 bytes);
    # under vmap the batch axis rides INSIDE the map body, so the live chunk is
    # B*chunk*bucket*4 bytes — 2 GB at the reference's max batch 128 with the
    # default chunk.  Without chunking, a batch-128 train step tried to allocate
    # 67 GB here (observed OOM).
    n_chunks = -(-m // chunk)
    pad = n_chunks * chunk - m
    qp = jnp.concatenate([q, jnp.full((pad,), MAXKEY, q.dtype)])
    out = jax.lax.map(body, qp.reshape(n_chunks, chunk))
    return out.reshape(-1)[:m].reshape(qshape)

