import pytest

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'

import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.sparse.hashing import build_table, lookup, table_size_for, unique_coords


def random_coords_t(rng, n, lo=-50, hi=50):
    """(3, n) transposed coordinate layout (see sparse/hashing.py)."""
    return rng.integers(lo, hi, size=(3, n)).astype(np.int32)


def test_build_and_lookup_roundtrip(rng):
    n = 512
    coords = random_coords_t(rng, n)
    mask = np.ones(n, dtype=bool)
    mask[500:] = False
    table, canonical = build_table(jnp.asarray(coords), jnp.asarray(mask))

    found = np.asarray(lookup(table, jnp.asarray(coords), jnp.asarray(mask)))
    for i in range(500):
        assert found[i] >= 0
        assert (coords[:, found[i]] == coords[:, i]).all()
    assert (found[500:] == -1).all()


def test_lookup_missing_returns_minus_one(rng):
    coords = random_coords_t(rng, 100, 0, 10)
    mask = np.ones(100, dtype=bool)
    table, _ = build_table(jnp.asarray(coords), jnp.asarray(mask))
    queries = np.array([[99, -5], [99, -5], [99, -5]], dtype=np.int32)
    found = np.asarray(lookup(table, jnp.asarray(queries), jnp.ones(2, dtype=bool)))
    assert (found == -1).all()


def test_canonical_is_first_occurrence(rng):
    coords = random_coords_t(rng, 1000, 0, 5)  # 125 possible voxels, many dups
    mask = np.ones(1000, dtype=bool)
    _, canonical = build_table(jnp.asarray(coords), jnp.asarray(mask))
    canonical = np.asarray(canonical)
    seen = {}
    for i in range(1000):
        c = tuple(coords[:, i])
        if c not in seen:
            seen[c] = i
        assert canonical[i] == seen[c], i


def test_unique_coords_matches_numpy(rng):
    n = 2000
    coords = random_coords_t(rng, n, -8, 8)
    mask = np.ones(n, dtype=bool)
    mask[1900:] = False
    res = unique_coords(jnp.asarray(coords), jnp.asarray(mask), capacity=n)

    valid = coords[:, :1900].T  # (N, 3) rows for numpy
    _, first_idx = np.unique(valid, axis=0, return_index=True)
    first_idx = np.sort(first_idx)

    assert int(res.n_unique) == len(first_idx)
    got_idx = np.asarray(res.index)[np.asarray(res.mask)]
    np.testing.assert_array_equal(got_idx, first_idx)
    got_coords = np.asarray(res.coords_t)[:, np.asarray(res.mask)].T
    np.testing.assert_array_equal(got_coords, valid[first_idx])


def test_unique_coords_overflow_truncates(rng):
    coords = random_coords_t(rng, 500, -100, 100)  # nearly all unique
    mask = np.ones(500, dtype=bool)
    res = unique_coords(jnp.asarray(coords), jnp.asarray(mask), capacity=64)
    assert res.coords_t.shape == (3, 64)
    assert int(res.mask.sum()) == 64
    assert int(res.n_unique) > 64


def test_vmapped_unique(rng):
    b, n = 4, 256
    coords = rng.integers(-6, 6, size=(b, 3, n)).astype(np.int32)
    mask = np.ones((b, n), dtype=bool)
    fn = jax.vmap(lambda c, m: unique_coords(c, m, capacity=n))
    res = fn(jnp.asarray(coords), jnp.asarray(mask))
    for i in range(b):
        _, first_idx = np.unique(coords[i].T, axis=0, return_index=True)
        assert int(res.n_unique[i]) == len(first_idx)


def test_table_size_for():
    assert table_size_for(0) == 8
    assert table_size_for(100) == 256
    assert table_size_for(128) == 256
    assert table_size_for(129) == 512
