"""Pallas bitonic sorter (sparse/bitonic.py) — interpret-mode parity vs
numpy/lax sort, payload-pair integrity under duplicate keys, and engine
integration (the sorted_unique / dedup-chain swap points produce identical
pyramids)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egonn_tpu.sparse.bitonic import MAXKEY, bitonic_sort


@pytest.mark.parametrize("n", [16384, 65536])
def test_sorts_random_keys(n):
    rng = np.random.default_rng(0)
    x = rng.integers(0, 2**31 - 1, size=(2, n), dtype=np.int32)
    s = bitonic_sort(jnp.asarray(x), interpret=True)
    np.testing.assert_array_equal(np.asarray(s), np.sort(x, axis=-1))


@pytest.mark.parametrize("n", [9856, 12345])
def test_non_power_of_two_padding(n):
    """Non-power sizes pad with MAXKEY internally; real keys come back first."""
    rng = np.random.default_rng(1)
    x = rng.integers(0, 2**20, size=(1, n), dtype=np.int32)
    x[0, n // 2:] = int(MAXKEY)  # caller-side pads mix with internal pads
    s = bitonic_sort(jnp.asarray(x), interpret=True)
    np.testing.assert_array_equal(np.asarray(s), np.sort(x, axis=-1))


def test_payload_follows_unique_keys():
    rng = np.random.default_rng(2)
    x = rng.permutation(16384).astype(np.int32).reshape(1, -1)
    p = np.arange(16384, dtype=np.int32).reshape(1, -1)
    ks, ps = bitonic_sort(jnp.asarray(x), jnp.asarray(p), interpret=True)
    order = np.argsort(x[0], kind="stable")
    np.testing.assert_array_equal(np.asarray(ks)[0], x[0][order])
    np.testing.assert_array_equal(np.asarray(ps)[0], p[0][order])


def test_duplicate_keys_keep_pairs_intact():
    """With duplicate keys the output must be a permutation of the input
    (key, payload) PAIRS (and, with the payload tie-break, exactly the
    lexicographic (key, payload) order)."""
    rng = np.random.default_rng(3)
    x = rng.integers(0, 512, size=(1, 16384), dtype=np.int32)
    p = np.arange(16384, dtype=np.int32).reshape(1, -1)
    ks, ps = bitonic_sort(jnp.asarray(x), jnp.asarray(p), interpret=True)
    ks, ps = np.asarray(ks)[0], np.asarray(ps)[0]
    np.testing.assert_array_equal(ks, np.sort(x[0]))
    np.testing.assert_array_equal(x[0][ps], ks)
    assert len(set(ps.tolist())) == 16384


def test_padded_maxkey_pairs_survive_the_slice():
    """Regression: at non-power-of-two n with real MAXKEY-keyed entries
    (exactly the dedup chain's (down_keys, fine_pos) sorts at capacities like
    9856), internal pads must NOT displace real pairs from the [:n] output —
    the payload tie-break guarantees the result is a permutation of the
    inputs and matches the lexicographic lax.sort."""
    rng = np.random.default_rng(7)
    n, valid = 9856, 9000
    k = np.full((1, n), 2**31 - 1, dtype=np.int32)
    k[0, :valid] = rng.integers(0, 2**20, valid)
    p = np.arange(n, dtype=np.int32).reshape(1, -1)
    ks, ps = bitonic_sort(jnp.asarray(k), jnp.asarray(p), interpret=True)
    ks, ps = np.asarray(ks)[0], np.asarray(ps)[0]
    assert sorted(ps.tolist()) == list(range(n))  # sp IS a permutation
    order = np.lexsort((p[0], k[0]))
    np.testing.assert_array_equal(ks, k[0][order])
    np.testing.assert_array_equal(ps, p[0][order])


def test_vmap_batches_the_kernel():
    rng = np.random.default_rng(4)
    x = rng.integers(0, 2**30, size=(3, 16384), dtype=np.int32)
    s = jax.vmap(lambda k: bitonic_sort(k, interpret=True))(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(s), np.sort(x, axis=-1))


@pytest.mark.slow  # compile-heavy golden (suite-time budget)
def test_pyramid_identical_with_psort_engine(monkeypatch):
    """Swap the engine's sort sites to the Pallas sorter (interpret mode) and
    require the ENTIRE pyramid to be bit-identical."""
    import egonn_tpu.sparse.packing as packing
    import egonn_tpu.sparse.pyramid as pyr_mod
    from egonn_tpu.ops.quantization import PolarQuantizer
    from egonn_tpu.sparse.pyramid import build_pyramid, egonn_pyramid_spec

    q = PolarQuantizer([1.0, 0.3, 0.2])
    spec = egonn_pyramid_spec(cap0=512, num_levels=4)
    rng = np.random.default_rng(5)
    b, n = 2, 2048
    th = rng.uniform(0, 2 * np.pi, (b, n))
    rr = np.abs(rng.normal(25, 18, (b, n))).clip(2, 80)
    z = rng.uniform(-2, 8, (b, n))
    clouds = jnp.asarray(np.stack([rr * np.cos(th), rr * np.sin(th), z], -1
                                  ).astype(np.float32))
    mask = jnp.ones((b, n), bool)

    def mk():
        def f(c, m):
            res = jax.vmap(lambda pc, mm: q.quantize(pc, mm, spec.capacities[0],
                                                     need_index=False))(c, m)
            return build_pyramid(res.coords_t, res.mask, spec, keys0=res.keys)
        return jax.jit(f)(clouds, mask)

    base = mk()
    interp_sort = functools.partial(bitonic_sort, interpret=True)
    monkeypatch.setattr(pyr_mod, "_use_psort", lambda n: True)
    monkeypatch.setattr(pyr_mod, "_bitonic_sort", interp_sort)
    # packing.sorted_unique re-imports per call; patch the module it pulls from
    import egonn_tpu.sparse.bitonic as bitonic_mod
    monkeypatch.setattr(bitonic_mod, "use_psort", lambda n: True)
    monkeypatch.setattr(bitonic_mod, "bitonic_sort", interp_sort)
    alt = mk()

    for la, lb in zip(base, alt):
        np.testing.assert_array_equal(np.asarray(la.coords), np.asarray(lb.coords))
        np.testing.assert_array_equal(np.asarray(la.mask), np.asarray(lb.mask))
        if la.up_parent is not None:
            np.testing.assert_array_equal(np.asarray(la.up_parent),
                                          np.asarray(lb.up_parent))
        if la.kmap_self is not None:
            np.testing.assert_array_equal(np.asarray(la.kmap_self),
                                          np.asarray(lb.kmap_self))


def test_roll_ce_matches_reshape_ce():
    """The two compare-exchange implementations (EGONN_PSORT_CE) agree
    pass-by-pass.  Tested outside the pallas interpreter (rolls are
    pathologically slow under interpret; on-chip they lower natively) —
    the kernel differs only in which _ce body runs."""
    import egonn_tpu.sparse.bitonic as bm

    rng = np.random.default_rng(6)
    R = 256  # direction bits up to 15 exist, so even t=64 gets real coverage
    k = jnp.asarray(rng.integers(0, 64, size=(R, 128), dtype=np.int32))  # many ties
    p = jnp.asarray(np.arange(R * 128, dtype=np.int32).reshape(R, 128))
    tested = 0
    for t in [1, 2, 4, 8, 32, 64]:
        stride_bit = t.bit_length() - 1 + 7  # element-index bit flipped at row-stride t
        for kbit in [stride_bit + 1, stride_bit + 2]:
            if kbit > 14:
                continue  # the network always has direction bit k > stride bit j
            desc = bm._bit_mask_normal(R, kbit)
            a = bm._ce_reshape([k, p], t, desc)
            b = bm._ce_roll([k, p], t, desc)
            for x, y in zip(a, b):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y)), (t, kbit)
            tested += 1
    assert tested >= 10  # every stride incl. t=64 actually exercised


def test_sorted_unique_first_point_with_psort(monkeypatch):
    """need_index=True via the Pallas sorter keeps FIRST-point-per-voxel
    semantics exactly (row-index tie-break == stable key sort)."""
    import functools

    import egonn_tpu.sparse.bitonic as bm
    from egonn_tpu.sparse.packing import sorted_unique

    rng = np.random.default_rng(8)
    n, cap = 4096, 1024
    coords = rng.integers(-40, 40, size=(3, n)).astype(np.int32)
    coords[:, 2048:] = coords[:, :2048]  # guaranteed duplicates, later rows
    mask = np.ones((n,), bool)

    base = sorted_unique(jnp.asarray(coords), jnp.asarray(mask), cap)
    monkeypatch.setattr(bm, "use_psort", lambda n: True)
    monkeypatch.setattr(bm, "bitonic_sort",
                        functools.partial(bitonic_sort, interpret=True))
    alt = sorted_unique(jnp.asarray(coords), jnp.asarray(mask), cap)
    np.testing.assert_array_equal(np.asarray(base.keys), np.asarray(alt.keys))
    np.testing.assert_array_equal(np.asarray(base.index), np.asarray(alt.index))
    np.testing.assert_array_equal(np.asarray(base.coords_t), np.asarray(alt.coords_t))
