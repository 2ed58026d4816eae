"""Local (keypoint + correspondence) losses, fully vectorized over the batch.

Replaces the reference's per-batch-element Python loop (models/loss.py:32-92) and
torch.cdist chains (models/loss_utils.py) with masked, vmapped device kernels:

* KeypointLoss (USIP-style probabilistic chamfer + point-to-point; reference
  models/loss_utils.py:11-95): symmetric chamfer between transformed keypoints of
  cloud1 and keypoints of cloud2, sigma-weighted (log s + d/s with s the mean of the
  anchor's sigma and its match's sigma), plus mean distance of each keypoint set to
  its own point cloud.
* CorrespondenceLoss (reference models/loss_utils.py:98-139): cross-entropy over the
  desc1 @ desc2^T * exp(beta) similarity matrix, rows restricted to keypoints whose
  transformed position has a true match within dist_th.

All inputs are padded (K, ...) buffers with masks. Semantics match the reference on
the valid entries; means are over valid entries only.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from egonn_tpu.losses.triplet import pairwise_l2
from egonn_tpu.ops.geometry import apply_transform

BIG = 1e9


def _masked_mean(x, mask):
    return jnp.sum(jnp.where(mask, x, 0.0)) / jnp.maximum(jnp.sum(mask), 1)


def keypoint_loss_single(pc1, pc1_mask, kp1, sigma1, kp1_mask,
                         pc2, pc2_mask, kp2, sigma2, kp2_mask,
                         dist12, gamma_chamfer=1.0, gamma_p2p=1.0,
                         repeatability_dist_th=0.5):
    """One cloud pair. dist12: (K1, K2) distances between transformed kp1 and kp2,
    already masked (invalid entries >= BIG)."""
    sigma1 = sigma1[:, 0]
    sigma2 = sigma2[:, 0]

    min_dist1 = jnp.min(dist12, axis=1)
    min_ndx1 = jnp.argmin(dist12, axis=1)
    min_dist2 = jnp.min(dist12, axis=0)
    min_ndx2 = jnp.argmin(dist12, axis=0)

    # probabilistic chamfer: log(s12) + d/s12, s12 = (sigma1 + sigma2[match])/2
    s12 = (sigma1 + sigma2[min_ndx1]) / 2.0
    s12 = jnp.maximum(s12, 1e-12)
    loss1 = _masked_mean(jnp.log(s12) + jnp.minimum(min_dist1, BIG) / s12, kp1_mask)
    s21 = (sigma2 + sigma1[min_ndx2]) / 2.0
    s21 = jnp.maximum(s21, 1e-12)
    loss2 = _masked_mean(jnp.log(s21) + jnp.minimum(min_dist2, BIG) / s21, kp2_mask)

    metrics: Dict[str, jnp.ndarray] = {}
    metrics["repeatability"] = _masked_mean(
        (min_dist1 <= repeatability_dist_th).astype(jnp.float32), kp1_mask
    )
    metrics["chamfer_pure"] = 0.5 * (
        _masked_mean(min_dist1, kp1_mask) + _masked_mean(min_dist2, kp2_mask)
    )
    w12 = (1.0 / s12) / jnp.maximum(_masked_mean(1.0 / s12, kp1_mask), 1e-12)
    w21 = (1.0 / s21) / jnp.maximum(_masked_mean(1.0 / s21, kp2_mask), 1e-12)
    metrics["chamfer_weighted"] = 0.5 * _masked_mean(w12 * min_dist1, kp1_mask) + \
        0.5 * _masked_mean(w21 * min_dist2, kp2_mask)
    metrics["mean_sigma"] = 0.5 * (
        _masked_mean(s12, kp1_mask) + _masked_mean(s21, kp2_mask)
    )

    loss = gamma_chamfer * 0.5 * (loss1 + loss2)
    metrics["loss_chamfer"] = loss

    # point-to-point: distance of each keypoint to its own cloud
    d1 = pairwise_l2(kp1, pc1)
    d1 = jnp.where(pc1_mask[None, :], d1, BIG)
    d2 = pairwise_l2(kp2, pc2)
    d2 = jnp.where(pc2_mask[None, :], d2, BIG)
    p2p = 0.5 * (
        _masked_mean(jnp.min(d1, axis=1), kp1_mask)
        + _masked_mean(jnp.min(d2, axis=1), kp2_mask)
    )
    metrics["loss_p2p"] = p2p
    loss = loss + gamma_p2p * p2p
    metrics["keypoint_loss"] = loss
    return loss, metrics


def correspondence_loss_single(desc1, kp1_mask, desc2, kp2_mask, dist12,
                               beta=1.0, dist_th=0.5):
    """One cloud pair (reference models/loss_utils.py:108-139)."""
    min_dist1 = jnp.min(dist12, axis=1)
    target = jnp.argmin(dist12, axis=1)
    row_sel = kp1_mask & (min_dist1 <= dist_th)

    sim = (desc1 @ desc2.T) * jnp.exp(beta)
    logits = jnp.where(kp2_mask[None, :], sim, -BIG)
    logz = jax.nn.logsumexp(logits, axis=1)
    tgt_logit = jnp.take_along_axis(logits, target[:, None], axis=1)[:, 0]
    ce = logz - tgt_logit
    n_sel = jnp.sum(row_sel)
    loss = jnp.sum(jnp.where(row_sel, ce, 0.0)) / jnp.maximum(n_sel, 1)

    pred = jnp.argmax(logits, axis=1)
    tp = jnp.sum(jnp.where(row_sel, (pred == target).astype(jnp.float32), 0.0))
    metrics = {
        "correspondence_loss": loss,
        "matching_keypoints": n_sel.astype(jnp.float32),
        "matching_descriptors": tp,
        # Reference quirk kept for metric fidelity: pos_similarity is the mean of
        # ARGMAX INDICES, not values (models/loss_utils.py:127 uses torch.max(...)[1])
        "pos_similarity": jnp.sum(jnp.where(row_sel, pred.astype(jnp.float32), 0.0))
        / jnp.maximum(n_sel, 1),
        "neg_similarity": _neg_similarity(logits, sim, target, row_sel, kp2_mask),
    }
    return loss, metrics


def _neg_similarity(logits, sim, target, row_sel, kp2_mask):
    """Reference models/loss_utils.py:128-130: zero out the columns that are
    targets of the selected rows, then mean over rows of the max."""
    k2 = sim.shape[1]
    tgt_cols = jnp.zeros((k2,), bool).at[jnp.where(row_sel, target, 0)].set(
        jnp.where(row_sel, True, False), mode="drop"
    )
    neg = jnp.where(tgt_cols[None, :], 0.0, jnp.where(kp2_mask[None, :], sim, -BIG))
    return _masked_mean(jnp.max(neg, axis=1), row_sel)


def keypoint_corr_loss(clouds1, clouds1_mask, kp1, sigma1, desc1, kp1_mask,
                       clouds2, clouds2_mask, kp2, sigma2, desc2, kp2_mask,
                       t_gt, gamma_c=1.0, gamma_k=1.0, gamma_chamfer=1.0,
                       gamma_p2p=1.0, beta=1.0, dist_th=0.5
                       ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """KeypointCorrLoss over a batch of pairs (reference models/loss.py:32-92).

    Shapes: clouds* (B, N, 3) + (B, N) masks, kp*/sigma*/desc* (B, K, ...) +
    (B, K) masks, t_gt (B, 4, 4). Returns (mean loss, mean metrics).
    """

    def single(pc1, pc1_m, k1, s1, d1, k1_m, pc2, pc2_m, k2, s2, d2, k2_m, m_gt):
        kp1_trans = apply_transform(k1, m_gt)
        dist12 = pairwise_l2(kp1_trans, k2)
        dist12 = jnp.where(k1_m[:, None] & k2_m[None, :], dist12, BIG)

        kp_loss, km = keypoint_loss_single(
            pc1, pc1_m, k1, s1, k1_m, pc2, pc2_m, k2, s2, k2_m, dist12,
            gamma_chamfer=gamma_chamfer, gamma_p2p=gamma_p2p,
            repeatability_dist_th=dist_th,
        )
        corr_loss, cm = correspondence_loss_single(
            d1, k1_m, d2, k2_m, dist12, beta=beta, dist_th=dist_th
        )
        loss = gamma_k * kp_loss + gamma_c * corr_loss
        metrics = {"kp_per_cloud": 0.5 * (jnp.sum(k1_m) + jnp.sum(k2_m)).astype(jnp.float32)}
        metrics.update(km)
        metrics.update(cm)
        metrics["loss"] = loss
        return loss, metrics

    losses, metrics = jax.vmap(single)(
        clouds1, clouds1_mask, kp1, sigma1, desc1, kp1_mask,
        clouds2, clouds2_mask, kp2, sigma2, desc2, kp2_mask, t_gt,
    )
    mean_metrics = {k: jnp.mean(v) for k, v in metrics.items()}
    return jnp.mean(losses), mean_metrics


def make_losses(params):
    """Reference models/loss.py:12-29 — build (global_loss_fn, local_loss_fn)
    from TrainingParams."""
    from functools import partial

    from egonn_tpu.losses.triplet import (
        batch_hard_contrastive_loss,
        batch_hard_triplet_loss,
    )

    if params.loss == "BatchHardTripletMarginLoss":
        gl_loss_fn = partial(batch_hard_triplet_loss, margin=params.margin)
    elif params.loss == "BatchHardContrastiveLoss":
        gl_loss_fn = partial(
            batch_hard_contrastive_loss,
            pos_margin=params.pos_margin,
            neg_margin=params.neg_margin,
        )
    else:
        raise NotImplementedError(f"Unknown loss: {params.loss}")

    if params.loss_gammas is not None:
        gamma_chamfer, gamma_p2p, gamma_c, beta = params.loss_gammas
    else:
        gamma_chamfer, gamma_p2p, gamma_c, beta = 1.0, 1.0, 1.0, 2.0
    loc_loss_fn = partial(
        keypoint_corr_loss,
        gamma_c=gamma_c,
        gamma_chamfer=gamma_chamfer,
        gamma_p2p=gamma_p2p,
        beta=beta,
    )
    return gl_loss_fn, loc_loss_fn
