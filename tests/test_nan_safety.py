"""Gradient NaN-safety regression tests for degenerate inputs (zero distances,
all-zero padding rows, empty masks) — the 0*inf=NaN class of backward bugs."""
import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.losses.keypoint import keypoint_corr_loss
from egonn_tpu.losses.triplet import batch_hard_triplet_loss, pairwise_l2
from egonn_tpu.models.layers import GeM, l2_normalize


def test_pairwise_l2_grad_finite_at_zero(rng):
    x = jnp.asarray(rng.standard_normal((6, 4)).astype(np.float32))

    def f(x):
        return jnp.sum(pairwise_l2(x, x))  # self-diagonal is exactly 0

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_triplet_loss_grad_finite_with_duplicate_embeddings(rng):
    # identical embeddings => many exact-zero distances
    emb = jnp.asarray(np.repeat(rng.standard_normal((4, 8)), 2, axis=0).astype(np.float32))
    b = emb.shape[0]
    pos = np.zeros((b, b), bool)
    for i in range(0, b, 2):
        pos[i, i + 1] = pos[i + 1, i] = True
    neg = ~pos & ~np.eye(b, dtype=bool)

    def f(e):
        loss, _ = batch_hard_triplet_loss(e, jnp.asarray(pos), jnp.asarray(neg), 0.2)
        return loss

    g = jax.grad(f)(emb)
    assert np.isfinite(np.asarray(g)).all()


def test_l2_normalize_grad_finite_on_zero_rows():
    x = jnp.zeros((3, 8))

    def f(x):
        return jnp.sum(l2_normalize(x) ** 2)

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()


def test_gem_grad_finite_on_empty_cloud(rng):
    feats = jnp.asarray(rng.standard_normal((2, 16, 8)).astype(np.float32))
    mask = jnp.asarray(np.array([[True] * 16, [False] * 16]))  # cloud 1 empty
    gem = GeM()
    variables = gem.init(jax.random.PRNGKey(0), feats, mask)

    def f(v, x):
        return jnp.sum(gem.apply(v, x, mask))

    gv, gx = jax.grad(f, argnums=(0, 1))(variables, feats)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(gv))
    assert np.isfinite(np.asarray(gx)).all()


def test_keypoint_loss_grad_finite_with_padding(rng):
    b, n, k, dd = 2, 32, 16, 8
    pc = rng.standard_normal((b, n, 3)).astype(np.float32)
    pcm = np.ones((b, n), bool)
    pcm[:, 20:] = False
    kp = rng.standard_normal((b, k, 3)).astype(np.float32)
    kpm = np.ones((b, k), bool)
    kpm[:, 10:] = False
    sig = np.abs(rng.standard_normal((b, k, 1))).astype(np.float32) * kpm[..., None]
    dsc = rng.standard_normal((b, k, dd)).astype(np.float32) * kpm[..., None]
    t = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))

    def f(kp_, sig_, dsc_):
        loss, _ = keypoint_corr_loss(
            jnp.asarray(pc), jnp.asarray(pcm), kp_, sig_, dsc_, jnp.asarray(kpm),
            jnp.asarray(pc), jnp.asarray(pcm), kp_, sig_, dsc_, jnp.asarray(kpm),
            jnp.asarray(t), beta=4.0,
        )
        return loss

    gs = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(kp), jnp.asarray(sig), jnp.asarray(dsc)
    )
    for g in gs:
        assert np.isfinite(np.asarray(g)).all()
