import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.sparse.hashing import build_table, lookup, table_size_for, unique_coords


def random_coords(rng, n, lo=-50, hi=50):
    return rng.integers(lo, hi, size=(n, 3)).astype(np.int32)


def test_build_and_lookup_roundtrip(rng):
    n = 512
    coords = random_coords(rng, n)
    mask = np.ones(n, dtype=bool)
    mask[500:] = False
    table, canonical = build_table(jnp.asarray(coords), jnp.asarray(mask))

    # lookup of every valid coordinate must return a row with identical coords
    found = np.asarray(lookup(table, jnp.asarray(coords), jnp.asarray(mask)))
    for i in range(500):
        assert found[i] >= 0
        assert (coords[found[i]] == coords[i]).all()
    # masked-out queries return -1
    assert (found[500:] == -1).all()


def test_lookup_missing_returns_minus_one(rng):
    coords = random_coords(rng, 100, 0, 10)
    mask = np.ones(100, dtype=bool)
    table, _ = build_table(jnp.asarray(coords), jnp.asarray(mask))
    queries = np.array([[99, 99, 99], [-5, -5, -5]], dtype=np.int32)
    found = np.asarray(lookup(table, jnp.asarray(queries), jnp.ones(2, dtype=bool)))
    assert (found == -1).all()


def test_canonical_is_first_occurrence(rng):
    # many duplicates in a small coordinate range
    coords = random_coords(rng, 1000, 0, 5)  # 125 possible voxels
    mask = np.ones(1000, dtype=bool)
    _, canonical = build_table(jnp.asarray(coords), jnp.asarray(mask))
    canonical = np.asarray(canonical)
    # numpy reference: canonical = first row with identical coords
    seen = {}
    for i, c in enumerate(map(tuple, coords)):
        if c not in seen:
            seen[c] = i
        assert canonical[i] == seen[c], i


def test_unique_coords_matches_numpy(rng):
    n = 2000
    coords = random_coords(rng, n, -8, 8)
    mask = np.ones(n, dtype=bool)
    mask[1900:] = False
    res = unique_coords(jnp.asarray(coords), jnp.asarray(mask), capacity=n)

    valid = coords[:1900]
    _, first_idx = np.unique(valid, axis=0, return_index=True)
    first_idx = np.sort(first_idx)

    got_n = int(res.n_unique)
    assert got_n == len(first_idx)
    got_idx = np.asarray(res.index)[np.asarray(res.mask)]
    np.testing.assert_array_equal(got_idx, first_idx)
    got_coords = np.asarray(res.coords)[np.asarray(res.mask)]
    np.testing.assert_array_equal(got_coords, valid[first_idx])


def test_unique_coords_overflow_truncates(rng):
    coords = random_coords(rng, 500, -100, 100)  # nearly all unique
    mask = np.ones(500, dtype=bool)
    res = unique_coords(jnp.asarray(coords), jnp.asarray(mask), capacity=64)
    assert res.coords.shape == (64, 3)
    assert int(res.mask.sum()) == 64
    assert int(res.n_unique) > 64  # overflow detectable


def test_vmapped_unique(rng):
    b, n = 4, 256
    coords = rng.integers(-6, 6, size=(b, n, 3)).astype(np.int32)
    mask = np.ones((b, n), dtype=bool)
    fn = jax.vmap(lambda c, m: unique_coords(c, m, capacity=n))
    res = fn(jnp.asarray(coords), jnp.asarray(mask))
    for i in range(b):
        _, first_idx = np.unique(coords[i], axis=0, return_index=True)
        assert int(res.n_unique[i]) == len(first_idx)


def test_table_size_for():
    assert table_size_for(0) == 8
    assert table_size_for(100) == 256
    assert table_size_for(128) == 256
    assert table_size_for(129) == 512
