"""RANSAC registration tests: recover a known transform from noisy matches."""
import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.ops.geometry import rotation_error_deg, rotz
from egonn_tpu.ops.ransac import kabsch, mutual_matches, ransac_6dof


def make_pair(rng, k=96, n_outliers=24, noise=0.05):
    kp1 = rng.uniform(-40, 40, (k, 3)).astype(np.float32)
    t = rotz(rng.uniform(0, np.pi)).astype(np.float32)
    t[:3, 3] = rng.uniform(-5, 5, 3)
    kp2 = (kp1 @ t[:3, :3].T + t[:3, 3] + rng.normal(0, noise, (k, 3))).astype(np.float32)
    # descriptors: matched pairs share a random descriptor; outliers random
    d = rng.standard_normal((k, 16)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    d1 = d.copy()
    d2 = d.copy()
    d2[:n_outliers] = rng.standard_normal((n_outliers, 16))
    d2[:n_outliers] /= np.linalg.norm(d2[:n_outliers], axis=1, keepdims=True)
    return kp1, d1, kp2, d2, t


def test_kabsch_exact(rng):
    p = rng.standard_normal((10, 3)).astype(np.float32)
    t = rotz(0.7)
    t[:3, 3] = [1.0, -2.0, 0.5]
    q = p @ t[:3, :3].T + t[:3, 3]
    m = np.asarray(kabsch(jnp.asarray(p), jnp.asarray(q), jnp.ones(10)))
    np.testing.assert_allclose(m, t, atol=1e-5)


def test_mutual_matches(rng):
    d = rng.standard_normal((20, 8)).astype(np.float32)
    idx2, valid = mutual_matches(
        jnp.asarray(d), jnp.ones(20, bool), jnp.asarray(d), jnp.ones(20, bool)
    )
    np.testing.assert_array_equal(np.asarray(idx2), np.arange(20))
    assert np.asarray(valid).all()


def test_ransac_recovers_transform(rng):
    kp1, d1, kp2, d2, t_gt = make_pair(rng)
    k = len(kp1)
    res = jax.jit(
        lambda key: ransac_6dof(
            key, jnp.asarray(kp1), jnp.asarray(d1), jnp.ones(k, bool),
            jnp.asarray(kp2), jnp.asarray(d2), jnp.ones(k, bool),
            n_hypotheses=256,
        )
    )(jax.random.PRNGKey(0))
    t_est = np.asarray(res.transform)
    rte = np.linalg.norm(t_est[:3, 3] - t_gt[:3, 3])
    rre = float(rotation_error_deg(jnp.asarray(t_est[:3, :3]), jnp.asarray(t_gt[:3, :3])))
    assert rte < 0.5, rte
    assert rre < 2.0, rre
    assert int(res.n_inliers) > 50


def test_ransac_handles_masked_keypoints(rng):
    kp1, d1, kp2, d2, t_gt = make_pair(rng, k=64, n_outliers=8)
    m1 = np.ones(64, bool)
    m1[50:] = False  # padding rows with garbage coords
    kp1[50:] = 1e6
    res = jax.jit(
        lambda key: ransac_6dof(
            key, jnp.asarray(kp1), jnp.asarray(d1), jnp.asarray(m1),
            jnp.asarray(kp2), jnp.asarray(d2), jnp.ones(64, bool),
            n_hypotheses=256,
        )
    )(jax.random.PRNGKey(1))
    t_est = np.asarray(res.transform)
    assert np.isfinite(t_est).all()
    rte = np.linalg.norm(t_est[:3, 3] - t_gt[:3, 3])
    assert rte < 1.0, rte
