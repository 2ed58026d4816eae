"""In-VMEM Pallas bitonic sorter for packed voxel keys.

Why: the coordinate engine's remaining wall is `lax.sort` — XLA's TPU sort
streams every merge pass through HBM, so the 8x65k level-0 key sort plus the
dedup chain's dual sorts cost ~4.5 ms of the ~22 ms inference batch.  A 65k
int32 array is 256 KB — the WHOLE bitonic network fits in VMEM, so one
pallas_call can run all log2(n)*(log2(n)+1)/2 compare-exchange passes without
touching HBM in between.

Layout strategy (TPU-shaped, no lane rolls, no gathers — both measured slow on
this toolchain, see PERFORMANCE.md):

* the n keys live as an (R, 128) tile, element i at (row i // 128, lane i % 128);
* passes with stride >= 128 flip a ROW bit: reshape rows to (C, 2, t, 128) and
  compare the two halves — pure sublane addressing, no cross-lane movement;
* passes with stride < 128 flip a LANE bit: hop into a TRANSPOSED layout
  (each 128x128 block transposed, "T layout") where lane bits become row bits,
  and run the same reshape-compare there.  Bitonic structure groups all
  stride<128 passes at the tail of each merge stage, so the whole sort needs
  only 2*(log2(n)-7)+2 transpose sessions.
* the ascending/descending direction of element i in stage k is bit k of i —
  a broadcasted-iota mask in either layout.

Direction masks use the index bit decomposition
  normal layout: i = row*128 + lane  (lane = bits 0..6, row = bits 7..)
  T layout:      i = g*16384 + lane*128 + trow  (trow = original lane = bits
                 0..6, lane = original row%128 = bits 7..13, g = bits 14..)
where the T view is stored 2-D as (G*128, 128) with row index g*128 + trow.

Capability notes: int32 only, non-negative keys (MAXKEY = 2^31-1 pads sort
last), n is padded to a power of two >= 16384 (the T layout needs full 128x128
blocks).  Optional int32 payloads ride the same swaps, and equal keys
tie-break on the FIRST payload — i.e. with payloads the sort is the
lexicographic (key, payload0) sort (equivalent to a stable key sort when
payload0 is the row index).  The tie-break is also what keeps internal pads
(key MAXKEY, payload 2^31-1) from displacing real MAXKEY-keyed pairs out of
the [:n] output slice at non-power-of-two n.

Replaces: XLA lax.sort in `packing.sorted_unique(need_index=False)` and the
dedup chain's dual sorts (reference counterpart: ME's sparse_quantize /
coordinate-manager, e.g. /root/reference/datasets/quantization.py:42).
Gated by EGONN_PSORT (off until the on-chip A/B lands).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAXKEY = jnp.int32(2**31 - 1)
LANES = 128
MIN_N = 16384  # smallest supported instance: one full 128x128 T block

PSORT = os.environ.get("EGONN_PSORT", "0") == "1"
# Compare-exchange implementation: "reshape" pairs rows via a (C, 2, t, 128)
# view (sub-8-row views may force Mosaic relayouts); "roll" pairs rows via two
# whole-array sublane rolls + selects (more data movement, no odd views).
CE_MODE = os.environ.get("EGONN_PSORT_CE", "reshape")


def _bit_mask_normal(R: int, k: int) -> jnp.ndarray:
    """(R, 128) int32 0/1: bit k of the element index i = row*128 + lane.

    int32 (not bool): Mosaic promotes i1-vector logical ops through i8 and the
    i8->i1 trunci is unsupported on hardware — masks stay integer and only
    compares (which produce i1 feeding a select directly) make booleans."""
    if k <= 6:
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
        return (lane >> k) & 1
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    return (row >> (k - 7)) & 1


def _bit_mask_T(RT: int, k: int) -> jnp.ndarray:
    """(RT, 128) int32 0/1: bit k of i in the transposed layout (module doc)."""
    if k <= 6:
        row = jax.lax.broadcasted_iota(jnp.int32, (RT, LANES), 0)
        return (row >> k) & 1  # bits of the original lane (trow % 128)
    if k <= 13:
        lane = jax.lax.broadcasted_iota(jnp.int32, (RT, LANES), 1)
        return (lane >> (k - 7)) & 1  # bits of the original row % 128
    row = jax.lax.broadcasted_iota(jnp.int32, (RT, LANES), 0)
    return (row >> (k - 7)) & 1  # bits of g (trow // 128)


def _ce_reshape(vs, t_rows: int, desc: jnp.ndarray):
    """Pair rows via a (C, 2, t, 128) view of the (R, 128) array."""
    R = vs[0].shape[0]
    C = R // (2 * t_rows)

    def rs(a):
        return a.reshape(C, 2, t_rows, LANES)

    k4 = rs(vs[0])
    a, b = k4[:, 0], k4[:, 1]
    d = rs(desc)[:, 0]  # int32 0/1
    one, zero = jnp.int32(1), jnp.int32(0)
    gt = jnp.where(a > b, one, zero)
    lt = jnp.where(a < b, one, zero)
    if len(vs) > 1:
        # lexicographic tie-break on the FIRST payload: makes the sort stable
        # for unique payloads and — critically — orders real (MAXKEY, pos<n)
        # entries before internal (MAXKEY, pad>=n) ones, so the kept slice is
        # a permutation of the caller's pairs (see bitonic_sort pad note)
        p4 = rs(vs[1])
        pa, pb = p4[:, 0], p4[:, 1]
        eq = jnp.where(a == b, one, zero)
        gt = gt | (eq & jnp.where(pa > pb, one, zero))
        lt = lt | (eq & jnp.where(pa < pb, one, zero))
    # int32-select of int32 masks: no i1-vector logical ops reach Mosaic
    swap = jnp.where(d == 1, lt, gt) == 1
    outs = []
    for v in vs:
        v4 = rs(v)
        x, y = v4[:, 0], v4[:, 1]
        outs.append(
            jnp.stack([jnp.where(swap, y, x), jnp.where(swap, x, y)], 1)
            .reshape(R, LANES)
        )
    return outs


def _ce_roll(vs, t_rows: int, desc: jnp.ndarray):
    """Pair rows via two whole-array sublane rolls + selects (no odd views).

    A row's partner is row XOR t: the lower ("a") half of each 2t-group reads
    roll(-t), the upper half roll(+t).  Bitonic pairs never cross a 2t-aligned
    group boundary, and the boundary rows select the in-range roll, so the
    wrap-around garbage is never chosen."""
    R = vs[0].shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 0)
    b_half = (row // t_rows) & 1  # int32: 0 = lower ("a") half, 1 = upper
    a_half = b_half == 0

    def partner(v):
        return jnp.where(a_half, jnp.roll(v, -t_rows, axis=0),
                         jnp.roll(v, t_rows, axis=0))

    one, zero = jnp.int32(1), jnp.int32(0)
    k = vs[0]
    kp = partner(k)
    gt = jnp.where(k > kp, one, zero)
    lt = jnp.where(k < kp, one, zero)
    if len(vs) > 1:
        p = vs[1]
        pp = partner(p)
        eq = jnp.where(k == kp, one, zero)
        gt = gt | (eq & jnp.where(p > pp, one, zero))
        lt = lt | (eq & jnp.where(p < pp, one, zero))
    # "a" of an ascending pair keeps the min; "b" keeps the max; flipped when
    # the block sorts descending.  int32 xor (i1 xor promotes through i8 in
    # Mosaic and the trunci back is unsupported on hardware).
    take_min = ((1 - b_half) ^ desc) == 1
    swap = jnp.where(take_min, gt, lt) == 1
    outs = []
    for v in vs:
        outs.append(jnp.where(swap, partner(v), v))
    return outs


def _ce(vs, t_rows: int, desc: jnp.ndarray):
    """One compare-exchange pass at row-stride t_rows.

    vs: list of (R, 128) int32 arrays — keys first, payloads after; swaps are
    decided on the keys and applied to all.  desc: (R, 128) int32 0/1, 1 where
    the element's bitonic block sorts descending (uniform across each pair)."""
    if CE_MODE == "roll":
        return _ce_roll(vs, t_rows, desc)
    return _ce_reshape(vs, t_rows, desc)


def _transpose_blocks(v: jnp.ndarray) -> jnp.ndarray:
    """Per-128x128-block transpose; its own inverse.  (R, 128) -> (R, 128)."""
    G = v.shape[0] // LANES
    return v.reshape(G, LANES, LANES).swapaxes(1, 2).reshape(G * LANES, LANES)


def _sort_body(n: int, n_payload: int, *refs):
    R = n // LANES
    K = n.bit_length() - 1  # n = 2**K
    ins, outs = refs[: 1 + n_payload], refs[1 + n_payload:]
    vs = [r[0] for r in ins]  # (R, 128)

    vs = [_transpose_blocks(v) for v in vs]
    # stages whose passes are all lane-strided (stride < 128) run in T layout
    for k in range(1, min(7, K) + 1):
        for j in range(k - 1, -1, -1):
            vs = _ce(vs, 1 << j, _bit_mask_T(R, k))
    for k in range(8, K + 1):
        vs = [_transpose_blocks(v) for v in vs]
        for j in range(k - 1, 6, -1):  # row-strided passes (stride >= 128)
            vs = _ce(vs, 1 << (j - 7), _bit_mask_normal(R, k))
        vs = [_transpose_blocks(v) for v in vs]
        for j in range(6, -1, -1):  # lane-strided tail, back in T layout
            vs = _ce(vs, 1 << j, _bit_mask_T(R, k))
    vs = [_transpose_blocks(v) for v in vs]
    for o, v in zip(outs, vs):
        o[0] = v


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sort_call(keys3, payloads3, interpret=False):
    b, R, _ = keys3.shape
    n = R * LANES
    n_payload = len(payloads3)
    spec = pl.BlockSpec((1, R, LANES), lambda bi: (bi, 0, 0),
                        memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((b, R, LANES), jnp.int32)
                 for _ in range(1 + n_payload)]
    res = pl.pallas_call(
        functools.partial(_sort_body, n, n_payload),
        grid=(b,),
        in_specs=[spec] * (1 + n_payload),
        out_specs=[spec] * (1 + n_payload),
        out_shape=out_shape,
        interpret=interpret,
    )(keys3, *payloads3)
    return res


def bitonic_sort(keys: jnp.ndarray, *payloads: jnp.ndarray,
                 interpret: bool = False):
    """Ascending sort of int32 keys along the last axis, payloads permuted
    alongside; equal keys order by the first payload (lexicographic
    (key, payload0) sort — stable when payload0 is the row index).
    keys: (..., n) non-negative int32; real payload values must be < 2^31-1
    (the internal pad marker).  Internally pads n to a power of two >= 16384.
    Returns (keys, *payloads) sorted."""
    shape = keys.shape
    n = shape[-1]
    n_pad = max(MIN_N, 1 << (n - 1).bit_length())
    lead = shape[:-1]
    b = 1
    for d in lead:
        b *= d
    k2 = keys.reshape(b, n)
    p2 = [p.reshape(b, n).astype(jnp.int32) for p in payloads]
    if n_pad != n:
        pad = ((0, 0), (0, n_pad - n))
        k2 = jnp.pad(k2, pad, constant_values=2**31 - 1)
        # pad payloads with int32 max: the compare-exchange tie-breaks equal
        # keys on the first payload, so real (MAXKEY, payload) pairs sort
        # strictly before internal pads and the [:n] slice returns exactly the
        # caller's pairs (requires real payloads < 2^31-1, true for all engine
        # uses — row indices)
        p2 = [jnp.pad(p, pad, constant_values=2**31 - 1) for p in p2]
    k3 = k2.reshape(b, n_pad // LANES, LANES)
    p3 = [p.reshape(b, n_pad // LANES, LANES) for p in p2]
    res = _sort_call(k3, p3, interpret=interpret)
    outs = [r.reshape(b, n_pad)[:, :n].reshape(shape) for r in res]
    return outs[0] if not payloads else tuple(outs)


def use_psort(n: int) -> bool:
    """Engine gate: Pallas sort on TPU for instances big enough to matter."""
    if not PSORT or n < 8192:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
