"""Global-descriptor losses: batch-hard triplet / contrastive with boolean masks.

One fused on-device kernel replacing the reference's pytorch_metric_learning stack
(models/loss.py:95-204): the B x B distance matrix, hardest-positive (max) /
hardest-negative (min) mining, TripletMarginLoss(margin, swap=True) with
AvgNonZeroReducer, and the miner statistics used for dynamic batch expansion
(training/trainer.py:269-278 reads num_non_zero_triplets / num_triplets).

All outputs are jnp scalars so the whole thing lives inside the jitted train step;
under data parallelism, all-gather embeddings+masks first (parallel/mesh.py) so
mining sees the full global batch.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

EPS = 1e-12
BIG = 1e9


def pairwise_l2(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distance matrix (N, M) computed stably in f32.

    Gradient-safe at zero distance: sqrt'(0) = inf would poison the whole
    gradient with 0*inf = NaN (the self-diagonal of an embedding distance matrix
    is exactly 0), so the zero branch is excluded from the sqrt via double-where
    — matching torch.cdist's subgradient-0-at-0 behavior."""
    sq = (
        jnp.sum(x**2, axis=-1)[:, None]
        + jnp.sum(y**2, axis=-1)[None, :]
        - 2.0 * (x @ y.T)
    )
    sq = jnp.clip(sq, 0.0, None)
    pos = sq > 0.0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, sq, 1.0)), 0.0)


def mine_hardest(dist: jnp.ndarray, positives_mask: jnp.ndarray,
                 negatives_mask: jnp.ndarray):
    """Reference HardTripletMinerWithMasks.mine (models/loss.py:114-129):
    per anchor, hardest positive = max masked distance, hardest negative = min.

    Returns (valid (B,), p_idx (B,), n_idx (B,), hardest_pos_dist, hardest_neg_dist,
    stats dict). Rows without any positive or negative are invalid.
    """
    a1p_keep = jnp.any(positives_mask, axis=1)
    a2n_keep = jnp.any(negatives_mask, axis=1)
    valid = a1p_keep & a2n_keep

    pos_d = jnp.where(positives_mask, dist, 0.0)
    hardest_pos = jnp.max(pos_d, axis=1)
    # index from a -1 fill so ties at distance 0 still select a TRUE positive
    p_idx = jnp.argmax(jnp.where(positives_mask, dist, -1.0), axis=1)

    neg_d = jnp.where(negatives_mask, dist, jnp.inf)
    hardest_neg = jnp.min(neg_d, axis=1)
    n_idx = jnp.argmin(neg_d, axis=1)

    def _mstat(x, keep, fn, fill):
        return fn(jnp.where(keep, x, fill))

    stats = {
        # miner stats over kept rows (reference takes max/mean/min over the
        # hardest_*_dist vectors of kept rows)
        "max_pos_pair_dist": _mstat(hardest_pos, a1p_keep, jnp.max, -BIG),
        "min_pos_pair_dist": _mstat(hardest_pos, a1p_keep, jnp.min, BIG),
        "mean_pos_pair_dist": jnp.sum(jnp.where(a1p_keep, hardest_pos, 0.0))
        / jnp.maximum(jnp.sum(a1p_keep), 1),
        "max_neg_pair_dist": _mstat(jnp.where(jnp.isfinite(hardest_neg), hardest_neg, 0.0), a2n_keep, jnp.max, -BIG),
        "min_neg_pair_dist": _mstat(jnp.where(jnp.isfinite(hardest_neg), hardest_neg, BIG), a2n_keep, jnp.min, BIG),
        "mean_neg_pair_dist": jnp.sum(jnp.where(a2n_keep, jnp.where(jnp.isfinite(hardest_neg), hardest_neg, 0.0), 0.0))
        / jnp.maximum(jnp.sum(a2n_keep), 1),
    }
    return valid, p_idx, n_idx, hardest_pos, hardest_neg, stats


def batch_hard_triplet_loss(embeddings: jnp.ndarray, positives_mask: jnp.ndarray,
                            negatives_mask: jnp.ndarray, margin: float
                            ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """BatchHardTripletLossWithMasks (reference models/loss.py:146-172).

    TripletMarginLoss(margin, swap=True) over the mined (a, hardest-p, hardest-n)
    triplets with AvgNonZeroReducer: mean over strictly-positive losses.
    """
    b = embeddings.shape[0]
    dist = pairwise_l2(embeddings, embeddings)
    valid, p_idx, n_idx, d_ap, d_an, stats = mine_hardest(
        dist, positives_mask, negatives_mask
    )
    # swap: use the smaller of d(a, n) and d(p, n)
    d_pn = dist[p_idx, n_idx]
    d_neg = jnp.minimum(jnp.where(jnp.isfinite(d_an), d_an, BIG), d_pn)
    losses = jnp.clip(d_ap - d_neg + margin, 0.0, None)
    losses = jnp.where(valid, losses, 0.0)
    nonzero = losses > 0.0
    num_non_zero = jnp.sum(nonzero)
    loss = jnp.sum(losses) / jnp.maximum(num_non_zero, 1)

    stats = dict(stats)
    stats.update(
        loss=loss,
        avg_embedding_norm=jnp.mean(jnp.linalg.norm(embeddings, axis=-1)),
        num_non_zero_triplets=num_non_zero.astype(jnp.float32),
        num_triplets=jnp.sum(valid).astype(jnp.float32),
    )
    return loss, stats


def batch_hard_contrastive_loss(embeddings: jnp.ndarray, positives_mask: jnp.ndarray,
                                negatives_mask: jnp.ndarray, pos_margin: float,
                                neg_margin: float
                                ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """BatchHardContrastiveLossWithMasks (reference models/loss.py:175-204):
    ContrastiveLoss over the mined pairs — pos pairs relu(d_ap - pos_margin), neg
    pairs relu(neg_margin - d_an), each averaged over its nonzero entries."""
    dist = pairwise_l2(embeddings, embeddings)
    valid, p_idx, n_idx, d_ap, d_an, stats = mine_hardest(
        dist, positives_mask, negatives_mask
    )
    d_an = jnp.where(jnp.isfinite(d_an), d_an, 0.0)
    pos_l = jnp.where(valid, jnp.clip(d_ap - pos_margin, 0.0, None), 0.0)
    neg_l = jnp.where(valid, jnp.clip(neg_margin - d_an, 0.0, None), 0.0)
    pos_nz = jnp.sum(pos_l > 0)
    neg_nz = jnp.sum(neg_l > 0)
    pos_loss = jnp.sum(pos_l) / jnp.maximum(pos_nz, 1)
    neg_loss = jnp.sum(neg_l) / jnp.maximum(neg_nz, 1)
    loss = pos_loss + neg_loss

    stats = dict(stats)
    stats.update(
        loss=loss,
        avg_embedding_norm=jnp.mean(jnp.linalg.norm(embeddings, axis=-1)),
        pos_pairs_above_threshold=pos_nz.astype(jnp.float32),
        neg_pairs_above_threshold=neg_nz.astype(jnp.float32),
        pos_loss=pos_loss,
        neg_loss=neg_loss,
        num_pairs=2.0 * jnp.sum(valid).astype(jnp.float32),
    )
    return loss, stats
