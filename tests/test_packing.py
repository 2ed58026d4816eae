"""Direct unit tests for the packed-key coordinate engine primitives.

`compact_ranked` is a shift-network (LSB-first conditional left-shifts) whose
collision-freedom argument is subtle; it is verified here against a trivial
numpy oracle over randomized masks and the structured edge cases (empty, full,
overflow past capacity, single survivor at the far end).  `sorted_unique` is
additionally checked end-to-end for first-point-per-voxel semantics, which the
pyramid tests only exercise indirectly.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egonn_tpu.sparse.packing import (
    DEFAULT_PACK,
    MAXKEY,
    compact_ranked,
    pack_keys,
    sorted_unique,
)


def _oracle(vals, keep, capacity, payload=None):
    kept_v = vals[keep][:capacity]
    out_v = np.full((capacity,), int(MAXKEY), vals.dtype)
    out_v[: kept_v.size] = kept_v
    out_p = None
    if payload is not None:
        kept_p = payload[keep][:capacity]
        out_p = np.zeros((capacity,), payload.dtype)
        out_p[: kept_p.size] = kept_p
    return out_v, out_p, int(keep.sum())


@pytest.mark.parametrize("n,capacity", [(128, 128), (128, 64), (257, 300), (1024, 256)])
def test_compact_ranked_matches_oracle(n, capacity):
    rng = np.random.default_rng(0)
    fn = jax.jit(compact_ranked, static_argnums=2)
    for density in (0.0, 0.03, 0.5, 0.97, 1.0):
        vals = rng.integers(0, 2**30, n).astype(np.int32)
        keep = rng.uniform(size=n) < density
        payload = rng.integers(0, n, n).astype(np.int32)
        got_v, got_p, got_n = fn(jnp.asarray(vals), jnp.asarray(keep), capacity,
                                 jnp.asarray(payload))
        want_v, want_p, want_n = _oracle(vals, keep, capacity, payload)
        np.testing.assert_array_equal(np.asarray(got_v), want_v)
        np.testing.assert_array_equal(np.asarray(got_p), want_p)
        assert int(got_n) == want_n


def test_compact_ranked_edge_cases():
    fn = jax.jit(compact_ranked, static_argnums=2)
    n = 96
    vals = np.arange(n, dtype=np.int32)
    # single survivor at the far end must travel the full distance
    keep = np.zeros(n, bool)
    keep[-1] = True
    got_v, _, got_n = fn(jnp.asarray(vals), jnp.asarray(keep), 8, None)
    assert int(got_n) == 1 and int(got_v[0]) == n - 1
    assert np.all(np.asarray(got_v[1:]) == int(MAXKEY))
    # no payload path, none kept
    got_v, got_p, got_n = fn(jnp.asarray(vals), jnp.zeros(n, bool), 8, None)
    assert got_p is None and int(got_n) == 0
    assert np.all(np.asarray(got_v) == int(MAXKEY))


def test_sorted_unique_first_point_per_voxel():
    """Duplicate voxels keep the FIRST source row (reference
    datasets/quantization.py:42 stable-sort semantics)."""
    rng = np.random.default_rng(1)
    n, cap = 512, 256
    coords = rng.integers(-4, 4, (3, n)).astype(np.int32)  # many duplicates
    mask = rng.uniform(size=n) < 0.9
    res = jax.jit(sorted_unique, static_argnums=(2,))(
        jnp.asarray(coords), jnp.asarray(mask), cap)
    keys = np.asarray(pack_keys(jnp.asarray(coords), jnp.ones(n, bool), DEFAULT_PACK))
    keys_m = np.where(mask, keys, int(MAXKEY))
    # oracle: first occurrence per key, sorted by key
    order = np.argsort(keys_m, kind="stable")
    sk, sr = keys_m[order], order
    first = np.concatenate([[True], sk[1:] != sk[:-1]]) & (sk != int(MAXKEY))
    want_keys, want_rows = sk[first][:cap], sr[first][:cap]
    got_keys = np.asarray(res.keys)[np.asarray(res.mask)]
    got_rows = np.asarray(res.index)[np.asarray(res.mask)]
    np.testing.assert_array_equal(got_keys, want_keys)
    np.testing.assert_array_equal(got_rows, want_rows)
    np.testing.assert_array_equal(
        np.asarray(res.coords_t)[:, np.asarray(res.mask)], coords[:, want_rows])

