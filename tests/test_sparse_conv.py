"""Golden tests for the sparse convolution engine: compare against brute-force
numpy implementations of the same semantics on tiny hand-checkable voxel sets.

Note: build_pyramid canonicalizes level 0 (sorted by packed key); tests read the
level-0 ordering back via coords/source_index and permute features accordingly."""
import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.sparse.conv import (
    sparse_conv,
    sparse_conv1x1,
    sparse_conv_ones,
    sparse_tconv2x2,
)
from egonn_tpu.sparse.pyramid import (
    PyramidSpec,
    build_pyramid,
    kernel_offsets,
)


def make_voxels(rng, b=2, cap=64, n_valid=40, lo=-4, hi=5):
    coords = np.zeros((b, cap, 3), dtype=np.int32)
    mask = np.zeros((b, cap), dtype=bool)
    for i in range(b):
        pts = rng.choice((hi - lo) ** 3, size=n_valid, replace=False)
        c = np.stack([pts // (hi - lo) ** 2, (pts // (hi - lo)) % (hi - lo), pts % (hi - lo)], 1)
        coords[i, :n_valid] = c + lo
        mask[i, :n_valid] = True
    return coords, mask


def spec_for(cap, num_levels=2, conv0=3):
    return PyramidSpec(
        capacities=tuple([cap] * (num_levels + 1)),
        conv0_kernel_size=conv0,
        block_kernel_size=3,
        self_levels=tuple(range(1, num_levels + 1)),
        up_levels=tuple(range(0, num_levels)),
    )


def build(coords, mask, spec):
    pyr = jax.jit(lambda c, m: build_pyramid(c, m, spec))(
        jnp.asarray(coords.transpose(0, 2, 1)), jnp.asarray(mask)
    )
    l0_coords = np.swapaxes(np.asarray(pyr[0].coords), 1, 2)  # (B, cap, 3) sorted
    l0_mask = np.asarray(pyr[0].mask)
    src = np.asarray(pyr[0].source_index)
    return pyr, l0_coords, l0_mask, src


def dense_conv_reference(coords, mask, feats, kernel, offsets):
    """out[o] = sum_k feats[coord o + offset_k] @ kernel[k] (numpy brute force)."""
    n, f_in = feats.shape
    f_out = kernel.shape[-1]
    table = {tuple(c): i for i, c in enumerate(coords) if mask[i]}
    out = np.zeros((n, f_out), dtype=np.float64)
    for oi in range(n):
        if not mask[oi]:
            continue
        for k, d in enumerate(offsets):
            j = table.get(tuple(coords[oi] + d))
            if j is not None:
                out[oi] += feats[j] @ kernel[k]
    return out


def test_self_conv_matches_dense(rng):
    b, cap, f_in, f_out = 2, 64, 8, 16
    coords, mask = make_voxels(rng, b, cap)
    spec = spec_for(cap, num_levels=1, conv0=3)
    pyr, l0c, l0m, src = build(coords, mask, spec)
    feats_in = rng.standard_normal((b, cap, f_in)).astype(np.float32)
    feats = np.take_along_axis(feats_in, src[..., None], axis=1) * l0m[..., None]
    kernel = rng.standard_normal((27, f_in, f_out)).astype(np.float32)

    out = np.asarray(sparse_conv(jnp.asarray(feats), pyr[0].kmap_self, jnp.asarray(kernel)))
    offsets = kernel_offsets(3)
    for i in range(b):
        ref = dense_conv_reference(l0c[i], l0m[i], feats[i], kernel, offsets)
        np.testing.assert_allclose(out[i][l0m[i]], ref[l0m[i]], rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(out[i][~l0m[i]], 0.0)


def test_downsample_coords_and_conv(rng):
    b, cap, f_in, f_out = 2, 64, 4, 8
    coords, mask = make_voxels(rng, b, cap)
    spec = spec_for(cap, num_levels=1)
    pyr, l0c, l0m, src = build(coords, mask, spec)

    # level-1 coords = unique floor(coords/2)
    for i in range(b):
        expect = np.unique(coords[i][mask[i]] // 2, axis=0)
        got = np.asarray(pyr[1].coords[i]).T[np.asarray(pyr[1].mask[i])]
        got = np.unique(got, axis=0)
        np.testing.assert_array_equal(got, expect)

    feats = rng.standard_normal((b, cap, f_in)).astype(np.float32) * l0m[..., None]
    kernel = rng.standard_normal((8, f_in, f_out)).astype(np.float32)
    out = np.asarray(sparse_conv(jnp.asarray(feats), pyr[1].kmap_down, jnp.asarray(kernel)))

    offsets = kernel_offsets(2)
    for i in range(b):
        l1c = np.asarray(pyr[1].coords[i]).T
        l1m = np.asarray(pyr[1].mask[i])
        table = {tuple(c): j for j, c in enumerate(l0c[i]) if l0m[i][j]}
        for oi in range(cap):
            if not l1m[oi]:
                continue
            ref = np.zeros(f_out)
            for k, d in enumerate(offsets):
                j = table.get(tuple(2 * l1c[oi] + d))
                if j is not None:
                    ref += feats[i][j] @ kernel[k]
            np.testing.assert_allclose(out[i, oi], ref, rtol=1e-4, atol=1e-4)


def test_tconv_matches_reference(rng):
    b, cap, f_in, f_out = 2, 64, 4, 8
    coords, mask = make_voxels(rng, b, cap)
    spec = spec_for(cap, num_levels=1)
    pyr, l0c, l0m, src = build(coords, mask, spec)

    feats1 = rng.standard_normal((b, cap, f_in)).astype(np.float32)
    feats1 *= np.asarray(pyr[1].mask)[..., None]
    kernel = rng.standard_normal((8, f_in, f_out)).astype(np.float32)
    out = np.asarray(
        sparse_tconv2x2(jnp.asarray(feats1), pyr[0].up_parent, pyr[0].up_koffset, jnp.asarray(kernel))
    )
    for i in range(b):
        l1c = np.asarray(pyr[1].coords[i]).T
        l1m = np.asarray(pyr[1].mask[i])
        table = {tuple(c): j for j, c in enumerate(l1c) if l1m[j]}
        for oi in range(cap):
            if not l0m[i][oi]:
                np.testing.assert_array_equal(out[i, oi], 0.0)
                continue
            parent = tuple(l0c[i][oi] // 2)
            bits = l0c[i][oi] - 2 * np.asarray(parent)
            slot = 4 * bits[0] + 2 * bits[1] + bits[2]
            assert parent in table  # parent always exists (no overflow here)
            ref = feats1[i][table[parent]] @ kernel[slot]
            np.testing.assert_allclose(out[i, oi], ref, rtol=1e-4, atol=1e-4)


def test_conv_ones_fast_path_matches_general(rng):
    b, cap, f_out = 2, 64, 16
    coords, mask = make_voxels(rng, b, cap)
    spec = spec_for(cap, num_levels=1, conv0=5)
    pyr, l0c, l0m, src = build(coords, mask, spec)
    kernel = rng.standard_normal((125, 1, f_out)).astype(np.float32)

    ones = (np.ones((b, cap, 1)) * l0m[..., None]).astype(np.float32)
    general = np.asarray(sparse_conv(jnp.asarray(ones), pyr[0].kmap_self, jnp.asarray(kernel)))
    fast = np.asarray(sparse_conv_ones(pyr[0].kmap_self, jnp.asarray(kernel), cap))
    np.testing.assert_allclose(fast, general, rtol=1e-4, atol=1e-4)


def test_conv1x1(rng):
    feats = rng.standard_normal((2, 16, 4)).astype(np.float32)
    w = rng.standard_normal((4, 8)).astype(np.float32)
    out = np.asarray(sparse_conv1x1(jnp.asarray(feats), jnp.asarray(w)))
    np.testing.assert_allclose(out, feats @ w, rtol=1e-5, atol=1e-5)


def test_conv_is_differentiable(rng):
    b, cap, f_in, f_out = 1, 32, 4, 4
    coords, mask = make_voxels(rng, b, cap, n_valid=20)
    spec = spec_for(cap, num_levels=1)
    pyr, l0c, l0m, src = build(coords, mask, spec)
    feats = jnp.asarray(
        (rng.standard_normal((b, cap, f_in)) * l0m[..., None]).astype(np.float32)
    )
    kernel = jnp.asarray(rng.standard_normal((27, f_in, f_out)).astype(np.float32))

    def loss(k, f):
        return jnp.sum(sparse_conv(f, pyr[0].kmap_self, k) ** 2)

    gk, gf = jax.grad(loss, argnums=(0, 1))(kernel, feats)
    assert np.isfinite(np.asarray(gk)).all() and np.abs(np.asarray(gk)).sum() > 0
    assert np.isfinite(np.asarray(gf)).all() and np.abs(np.asarray(gf)).sum() > 0


def test_pyramid_jits(rng):
    coords, mask = make_voxels(rng, 2, 64)
    spec = spec_for(64, num_levels=2)
    pyr, _, _, _ = build(coords, mask, spec)
    assert pyr.num_levels == 3
    assert pyr[2].coords.shape == (2, 3, 64)


def test_custom_vjp_grads_match_autodiff(rng):
    """The gather-only backwards (sym/down/tconv) must equal plain autodiff."""
    from egonn_tpu.sparse.conv import (
        sparse_conv_down,
        sparse_conv_sym,
        sparse_tconv2x2_vjp,
    )

    b, cap, f_in, f_out = 2, 64, 4, 6
    coords, mask = make_voxels(rng, b, cap)
    spec = spec_for(cap, num_levels=1)
    pyr, l0c, l0m, src = build(coords, mask, spec)
    feats = jnp.asarray(
        (rng.standard_normal((b, cap, f_in)) * l0m[..., None]).astype(np.float32))
    k27 = jnp.asarray(rng.standard_normal((27, f_in, f_out)).astype(np.float32))
    k8 = jnp.asarray(rng.standard_normal((8, f_in, f_out)).astype(np.float32))
    cot = jnp.asarray(rng.standard_normal((b, cap, f_out)).astype(np.float32))

    # symmetric self conv
    g1 = jax.grad(lambda f, k: jnp.sum(sparse_conv(f, pyr[0].kmap_self, k) * cot),
                  argnums=(0, 1))(feats, k27)
    g2 = jax.grad(lambda f, k: jnp.sum(sparse_conv_sym(f, pyr[0].kmap_self, k) * cot),
                  argnums=(0, 1))(feats, k27)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4)

    # down conv
    g1 = jax.grad(lambda f, k: jnp.sum(sparse_conv(f, pyr[1].kmap_down, k) * cot),
                  argnums=(0, 1))(feats, k8)
    g2 = jax.grad(
        lambda f, k: jnp.sum(
            sparse_conv_down(f, pyr[1].kmap_down, pyr[0].up_parent,
                             pyr[0].up_koffset, k) * cot),
        argnums=(0, 1))(feats, k8)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4)

    # transposed conv
    feats1 = jnp.asarray(
        (rng.standard_normal((b, cap, f_in)) * np.asarray(pyr[1].mask)[..., None]
         ).astype(np.float32))
    g1 = jax.grad(
        lambda f, k: jnp.sum(
            sparse_tconv2x2(f, pyr[0].up_parent, pyr[0].up_koffset, k) * cot),
        argnums=(0, 1))(feats1, k8)
    g2 = jax.grad(
        lambda f, k: jnp.sum(
            sparse_tconv2x2_vjp(f, pyr[0].up_parent, pyr[0].up_koffset,
                                pyr[1].kmap_down, k) * cot),
        argnums=(0, 1))(feats1, k8)
    for a, c in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), rtol=1e-4, atol=1e-4)
