"""Loss-function tests against brute-force numpy implementations of the reference
semantics (models/loss.py, models/loss_utils.py)."""
import numpy as np
import jax.numpy as jnp

from egonn_tpu.losses.keypoint import keypoint_corr_loss
from egonn_tpu.losses.triplet import batch_hard_triplet_loss, pairwise_l2


def np_batch_hard_triplet(emb, pos, neg, margin):
    b = emb.shape[0]
    dist = np.linalg.norm(emb[:, None] - emb[None, :], axis=-1)
    losses = []
    n_valid = 0
    for a in range(b):
        if not pos[a].any() or not neg[a].any():
            continue
        n_valid += 1
        dp = np.where(pos[a], dist[a], 0.0)
        p = dp.argmax()
        dn = np.where(neg[a], dist[a], np.inf)
        n = dn.argmin()
        d_ap = dist[a, p]
        d_an = min(dist[a, n], dist[p, n])  # swap=True
        losses.append(max(0.0, d_ap - d_an + margin))
    losses = np.array(losses)
    nz = losses[losses > 0]
    loss = nz.mean() if len(nz) else 0.0
    return loss, n_valid, len(nz)


def test_triplet_loss_matches_bruteforce(rng):
    b, d = 16, 8
    emb = rng.standard_normal((b, d)).astype(np.float32)
    labels = rng.integers(0, 4, b)
    pos = (labels[:, None] == labels[None, :]) & ~np.eye(b, dtype=bool)
    neg = labels[:, None] != labels[None, :]
    # knock out positives for some anchors
    pos[3] = False
    loss, stats = batch_hard_triplet_loss(
        jnp.asarray(emb), jnp.asarray(pos), jnp.asarray(neg), margin=0.2
    )
    ref_loss, n_valid, n_nz = np_batch_hard_triplet(emb, pos, neg, 0.2)
    np.testing.assert_allclose(float(loss), ref_loss, rtol=1e-4)
    assert int(stats["num_triplets"]) == n_valid
    assert int(stats["num_non_zero_triplets"]) == n_nz


def test_triplet_loss_zero_when_easy(rng):
    # positives at distance ~0, negatives far -> zero loss
    emb = np.zeros((4, 2), np.float32)
    emb[2:] = 100.0
    pos = np.zeros((4, 4), bool)
    pos[0, 1] = pos[1, 0] = pos[2, 3] = pos[3, 2] = True
    neg = np.zeros((4, 4), bool)
    neg[0, 2] = neg[1, 2] = neg[2, 0] = neg[3, 0] = True
    loss, stats = batch_hard_triplet_loss(jnp.asarray(emb), jnp.asarray(pos), jnp.asarray(neg), 0.2)
    assert float(loss) == 0.0
    assert int(stats["num_non_zero_triplets"]) == 0
    assert int(stats["num_triplets"]) == 4


def np_keypoint_corr_loss(pc1, kp1, s1, d1, pc2, kp2, s2, d2, m, gammas):
    """Brute-force reference per pair (models/loss.py:66-86, loss_utils.py)."""
    gamma_chamfer, gamma_p2p, gamma_c, beta = gammas
    kp1t = kp1 @ m[:3, :3].T + m[:3, 3]
    dist = np.linalg.norm(kp1t[:, None] - kp2[None, :], axis=-1)
    s1 = s1[:, 0]
    s2 = s2[:, 0]
    mi1, mni1 = dist.min(1), dist.argmin(1)
    mi2, mni2 = dist.min(0), dist.argmin(0)
    s12 = (s1 + s2[mni1]) / 2
    l1 = (np.log(s12) + mi1 / s12).mean()
    s21 = (s2 + s1[mni2]) / 2
    l2 = (np.log(s21) + mi2 / s21).mean()
    loss = gamma_chamfer * 0.5 * (l1 + l2)
    # p2p
    p1 = np.linalg.norm(kp1[:, None] - pc1[None, :], axis=-1).min(1).mean()
    p2 = np.linalg.norm(kp2[:, None] - pc2[None, :], axis=-1).min(1).mean()
    loss = loss + gamma_p2p * 0.5 * (p1 + p2)
    # correspondence
    sel = mi1 <= 0.5
    sim = (d1[sel] @ d2.T) * np.exp(beta)
    tgt = mni1[sel]
    lse = np.log(np.exp(sim - sim.max(1, keepdims=True)).sum(1)) + sim.max(1)
    ce = (lse - sim[np.arange(len(tgt)), tgt]).mean() if sel.any() else 0.0
    return loss + gamma_c * ce


def test_keypoint_corr_loss_matches_bruteforce(rng):
    b, n, k, dd = 3, 64, 24, 16
    pc1 = rng.standard_normal((b, n, 3)).astype(np.float32) * 5
    pc2 = rng.standard_normal((b, n, 3)).astype(np.float32) * 5
    kp1 = rng.standard_normal((b, k, 3)).astype(np.float32) * 5
    s1 = rng.uniform(0.1, 2.0, (b, k, 1)).astype(np.float32)
    d1 = rng.standard_normal((b, k, dd)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    s2 = rng.uniform(0.1, 2.0, (b, k, 1)).astype(np.float32)
    d2 = rng.standard_normal((b, k, dd)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    # kp2 = transformed kp1 + noise so correspondences exist
    ms = []
    kp2 = np.zeros_like(kp1)
    for i in range(b):
        th = rng.uniform(0, np.pi)
        m = np.eye(4, dtype=np.float32)
        m[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        m[:3, 3] = rng.standard_normal(3)
        ms.append(m)
        kp1t = kp1[i] @ m[:3, :3].T + m[:3, 3]
        kp2[i] = kp1t + rng.standard_normal((k, 3)).astype(np.float32) * 0.1
    ms = np.stack(ms)

    gammas = (1.0, 1.0, 1.0, 4.0)
    full = np.ones((b, n), bool)
    fullk = np.ones((b, k), bool)
    loss, metrics = keypoint_corr_loss(
        jnp.asarray(pc1), jnp.asarray(full), jnp.asarray(kp1), jnp.asarray(s1),
        jnp.asarray(d1), jnp.asarray(fullk),
        jnp.asarray(pc2), jnp.asarray(full), jnp.asarray(kp2), jnp.asarray(s2),
        jnp.asarray(d2), jnp.asarray(fullk),
        jnp.asarray(ms), gamma_c=gammas[2], gamma_chamfer=gammas[0],
        gamma_p2p=gammas[1], beta=gammas[3],
    )
    ref = np.mean([
        np_keypoint_corr_loss(pc1[i], kp1[i], s1[i], d1[i], pc2[i], kp2[i], s2[i],
                              d2[i], ms[i], gammas)
        for i in range(b)
    ])
    np.testing.assert_allclose(float(loss), ref, rtol=2e-3)
    assert 0.0 <= float(metrics["repeatability"]) <= 1.0


def test_keypoint_loss_respects_masks(rng):
    """Padding entries must not change the result."""
    b, n, k, dd = 2, 32, 16, 8
    def randpair(n_valid_pc, n_valid_kp):
        pc = rng.standard_normal((b, n, 3)).astype(np.float32) * 3
        pcm = np.zeros((b, n), bool)
        pcm[:, :n_valid_pc] = True
        kp = rng.standard_normal((b, k, 3)).astype(np.float32) * 3
        kpm = np.zeros((b, k), bool)
        kpm[:, :n_valid_kp] = True
        s = rng.uniform(0.2, 1.0, (b, k, 1)).astype(np.float32)
        d = rng.standard_normal((b, k, dd)).astype(np.float32)
        return pc, pcm, kp, kpm, s, d

    pc1, pcm1, kp1, kpm1, s1, d1 = randpair(20, 10)
    pc2, pcm2, kp2, kpm2, s2, d2 = randpair(24, 12)
    ms = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))

    args = lambda junk: (
        jnp.asarray(np.where(pcm1[..., None], pc1, junk)), jnp.asarray(pcm1),
        jnp.asarray(kp1), jnp.asarray(s1), jnp.asarray(d1), jnp.asarray(kpm1),
        jnp.asarray(np.where(pcm2[..., None], pc2, junk)), jnp.asarray(pcm2),
        jnp.asarray(kp2), jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(kpm2),
        jnp.asarray(ms),
    )
    l1, _ = keypoint_corr_loss(*args(0.0))
    l2, _ = keypoint_corr_loss(*args(123.0))
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_pairwise_l2(rng):
    x = rng.standard_normal((10, 4)).astype(np.float32)
    y = rng.standard_normal((7, 4)).astype(np.float32)
    got = np.asarray(pairwise_l2(jnp.asarray(x), jnp.asarray(y)))
    ref = np.linalg.norm(x[:, None] - y[None, :], axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-5)
