"""Training orchestration: the jitted combined train step + the epoch loop.

Loop-structure parity with the reference training/trainer.py (jac99/Egonn):

* each step processes one GLOBAL batch (batch-hard triplet on global descriptors)
  and one LOCAL batch (keypoint + correspondence losses on cloud pairs), with ONE
  optimizer update for the summed gradients (reference :160-193 accumulates both
  backwards before optimizer.step()).
* zip truncation: an epoch has min(#global_batches, #local_batches) steps
  (reference :140-141).
* batches without positives or negatives are skipped (reference :153-158).
* per-epoch stat averaging, LR schedule stepped per epoch, checkpoints every
  save_freq epochs + final, dynamic batch expansion when the non-zero-triplet
  ratio drops below batch_expansion_th (reference :203-278).
* secondary dataset: the reference BUILDS a secondary_train loader
  (datasets/dataset_utils.py:184-192) that its loop never consumes (the epoch
  zips only global+local, :141).  We replicate that behavior: the config keys
  are accepted (config.py) and no secondary batches are drawn.

TPU-native differences: the whole hot path — augmentation, quantization, pyramid,
both forwards, both losses, optimizer — is ONE jitted program per batch-size
bucket; host work is file IO and batch assembly only (overlapped via Prefetcher).
Under a multi-chip mesh the same step is compiled with axis-0-sharded batch inputs;
XLA inserts the all-gather for the global BxB mining matrix (parallel/mesh.py).
"""
from __future__ import annotations

import os
import time
from dataclasses import dataclass
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.config import TrainingParams, get_datetime
from egonn_tpu.data.base import TrainingDataset
from egonn_tpu.data.local_dataset import Training6DOFDataset, make_local_batch
from egonn_tpu.data.pipeline import (
    GlobalBatch,
    LocalBatch,
    Prefetcher,
    device_preprocess_global,
    make_global_batch,
)
from egonn_tpu.data.samplers import BatchSampler
from egonn_tpu.losses.keypoint import make_losses
from egonn_tpu.models.factory import BuiltModel, model_factory
from egonn_tpu.sparse.pyramid import build_pyramid
from egonn_tpu.train.state import (
    TrainState,
    apply_updates_with_lr,
    init_train_state,
    make_lr_schedule,
    make_optimizer,
    save_checkpoint,
)


def expansion_buckets(batch_size: int, limit: int, rate: Optional[float],
                      multiple_of: int = 1) -> List[int]:
    """The exact batch sizes dynamic expansion can produce — each is one compiled
    shape (reference datasets/samplers.py:79-90).  With `multiple_of` > 1 every
    bucket is rounded UP to that multiple (a data-parallel mesh shards the batch
    axis evenly across devices; the extra rows are mask-padded)."""
    sizes = [batch_size]
    if rate:
        b = batch_size
        while b < limit:
            b = min(int(b * rate), limit)
            sizes.append(b)
    if multiple_of > 1:
        sizes = sorted({-(-b // multiple_of) * multiple_of for b in sizes})
    return sizes


def resolve_mesh(mesh_opt: str | int | None):
    """Resolve the [TRAIN] mesh option to a Mesh or None (single device)."""
    from egonn_tpu.parallel.mesh import make_mesh

    if mesh_opt in (None, "off", "0", "1", 0, 1):
        return None
    n = len(jax.devices()) if mesh_opt == "auto" else int(mesh_opt)
    if n <= 1:
        return None
    return make_mesh(n)


def make_train_step(built: BuiltModel, params_cfg: TrainingParams, tx):
    """Build the jitted combined (global + local) train step."""
    model, quantizer, spec = built.model, built.quantizer, built.pyramid_spec
    gl_loss_fn, loc_loss_fn = make_losses(params_cfg)
    aug_mode = params_cfg.aug_mode

    def forward(variables, clouds, mask, rng, train, augment):
        pyr = device_preprocess_global(
            clouds, mask, quantizer, spec, rng_key=rng if augment else None,
            aug_mode=aug_mode,
        )
        if train:
            y, mut = model.apply(variables, pyr, quantizer, train=True,
                                 mutable=["batch_stats"])
            return y, mut["batch_stats"]
        return model.apply(variables, pyr, quantizer, train=False), variables["batch_stats"]

    def step(state: TrainState, g: Dict, l: Dict, rng, lr, train: bool):
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            # augment only in the train phase: the reference's global_val dataset
            # has NO transform (datasets/dataset_utils.py:24-27)
            yg, bs1 = forward(variables, g["clouds"], g["point_mask"], rng, train, train)
            gl_loss, gl_stats = gl_loss_fn(
                yg["global"], g["positives_mask"], g["negatives_mask"]
            )
            variables = {"params": params, "batch_stats": bs1}
            y1, bs2 = forward(variables, l["anc_clouds"], l["anc_mask"], None, train, False)
            variables = {"params": params, "batch_stats": bs2}
            y2, bs3 = forward(variables, l["pos_clouds"], l["pos_mask"], None, train, False)
            loc_loss, loc_stats = loc_loss_fn(
                l["anc_clouds"], l["anc_mask"],
                y1["keypoints"], y1["sigma"], y1["descriptors"], y1["kp_mask"],
                l["pos_clouds"], l["pos_mask"],
                y2["keypoints"], y2["sigma"], y2["descriptors"], y2["kp_mask"],
                l["t_gt"],
            )
            total = gl_loss + loc_loss
            stats = {}
            stats.update({k: v for k, v in gl_stats.items() if k != "loss"})
            stats.update({k: v for k, v in loc_stats.items() if k != "loss"})
            # headline "loss" is the TOTAL both halves step on (one optimizer
            # update for global+local, reference training/trainer.py:160-193)
            stats.update({"global_loss": gl_loss, "local_loss": loc_loss,
                          "loss": total})
            return total, (stats, bs3)

        if train:
            (_, (stats, new_bs)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = apply_updates_with_lr(state.params, updates, lr)
            state = state.replace(params=new_params, batch_stats=new_bs,
                                  opt_state=new_opt)
        else:
            _, (stats, _) = loss_fn(state.params)
        return state, stats

    return jax.jit(step, static_argnames=("train",)), gl_loss_fn, loc_loss_fn


@dataclass
class EpochStats:
    phase: str
    stats: Dict[str, float]


def print_stats(stats: Dict[str, float], phase: str):
    """Reference training/trainer.py:18-43."""
    if "num_triplets" in stats:
        print(
            f"{phase} - Global loss: {stats['global_loss']:.6f}    "
            f"Embedding norm: {stats['avg_embedding_norm']:.4f}   "
            f"Triplets (all/active): {stats['num_triplets']:.1f}/"
            f"{stats['num_non_zero_triplets']:.1f}"
        )
    if "mean_pos_pair_dist" in stats:
        print(
            "Pos dist (min/mean/max): {:.4f}/{:.4f}/{:.4f}   "
            "Neg dist (min/mean/max): {:.4f}/{:.4f}/{:.4f}".format(
                stats["min_pos_pair_dist"], stats["mean_pos_pair_dist"],
                stats["max_pos_pair_dist"], stats["min_neg_pair_dist"],
                stats["mean_neg_pair_dist"], stats["max_neg_pair_dist"],
            )
        )
    if "local_loss" in stats:
        print(
            f"Local loss: {stats['local_loss']:.4f}   "
            f"loss chamfer: {stats['loss_chamfer']:.4f}   "
            f"loss p2p: {stats['loss_p2p']:.4f}  "
            f"desc. loss: {stats['correspondence_loss']:.4f}"
        )
        print(
            f"repeat.: {stats['repeatability']:0.3f}   "
            f"match. descriptors: {stats['matching_descriptors']:0.3f}"
        )


def do_train(params: TrainingParams, debug: bool = False, weights_path: str = "weights",
             log_fn=None, dataset_type: Optional[str] = None,
             resume_from: Optional[str] = None):
    """Full training loop.  log_fn(metrics_dict) is the wandb.log stand-in.

    resume_from: a checkpoint directory written by a previous run (the
    `weights_path/model_name` orbax dir).  Training restores the full state
    (params, batch_stats, optimizer, epoch) plus the sampler's expanded batch
    size, continues the LR schedule from the restored epoch, and keeps saving
    into the SAME directory.  All per-epoch randomness (sampler batches, local
    shuffle, augmentation keys) is derived from (seed, epoch), so a resume at
    an epoch boundary reproduces the uninterrupted run bit-exactly
    (tests/test_resume.py).  Upgrade over the reference, which saves bare
    state_dicts and cannot resume (reference training/trainer.py:218-219)."""
    dataset_type = dataset_type or params.dataset
    built = model_factory(params.model_params)
    if resume_from is not None:
        resume_from = resume_from.rstrip("/")
        model_name = os.path.basename(resume_from)
        weights_path = os.path.dirname(resume_from) or "."
    else:
        model_name = f"model_{params.model_params.model}_{get_datetime()}"
    os.makedirs(weights_path, exist_ok=True)
    print(f"Model name: {model_name}")

    if log_fn is None:
        # wandb stand-in (reference training/trainer.py:106-111): JSONL metrics
        # file, mirrored to wandb when configured
        from egonn_tpu.utils.logging import MetricsLogger

        cfg = {k: v for k, v in vars(params).items() if k != "model_params"}
        logger = MetricsLogger(weights_path, model_name, config=cfg)
        log_fn = logger.log

    from egonn_tpu.data.pipeline import resolve_num_points

    num_points = resolve_num_points(params.model_params, dataset_type)

    # datasets (reference datasets/dataset_utils.py:18-43)
    from egonn_tpu.data.augmentation import train_transform  # noqa: F401  (device-side)

    train_ds = TrainingDataset(params.dataset_folder, dataset_type, params.train_file)
    val_ds = (
        TrainingDataset(params.dataset_folder, dataset_type, params.val_file)
        if params.val_file
        else None
    )
    local_train_ds = Training6DOFDataset(
        params.dataset_folder, dataset_type, params.train_file,
        params.model_params.quantizer, rot_max=params.rot_max,
        trans_max=params.trans_max,
    )
    local_val_ds = (
        Training6DOFDataset(
            params.dataset_folder, dataset_type, params.val_file,
            params.model_params.quantizer, rot_max=params.rot_max,
            trans_max=params.trans_max,
        )
        if params.val_file
        else None
    )

    # data-parallel mesh over local devices (SURVEY.md §2.5 TPU-native plan):
    # batch axis sharded, params/optimizer replicated, XLA inserts the
    # all-gather for the global BxB miner and the grad psum over ICI
    mesh = resolve_mesh(getattr(params, "mesh", "auto"))
    n_dev = mesh.size if mesh is not None else 1
    if mesh is not None:
        print(f"Data-parallel mesh over {n_dev} devices "
              f"({jax.devices()[0].platform}); batch buckets rounded to "
              f"multiples of {n_dev}")

    # seeded samplers + per-epoch reseeding (set_epoch below): epoch E's batch
    # sequence depends only on (seed, epoch, batch_size), which makes resume at
    # an epoch boundary bit-exact
    sampler = BatchSampler(
        train_ds, batch_size=params.batch_size,
        batch_size_limit=params.batch_size_limit,
        batch_expansion_rate=params.batch_expansion_rate,
        seed=0,
    )
    val_sampler = (BatchSampler(val_ds, batch_size=params.batch_size_limit, seed=0)
                   if val_ds else None)
    buckets = expansion_buckets(
        params.batch_size, params.batch_size_limit, params.batch_expansion_rate,
        multiple_of=n_dev,
    )

    # auto-calibrate the banded engine's window widths on this dataset BEFORE
    # any jit traces (widths are captured at trace time).  The measurement
    # runs on DEVICE-AUGMENTED pyramids (several aug seeds through the
    # training preprocess, aug_mode=params.aug_mode): device-side
    # jitter/rotation/translation is exactly what widened bands past an
    # un-augmented sample in the past (round-3 L2-L4 silent overflow,
    # PERFORMANCE.md), so the calibration now covers the augmentation
    # distribution directly with the standard 1.25 margin instead of an
    # un-augmented sample + hand-set 1.5.  The per-epoch band-fit audit below
    # still guards the tail of the distribution.
    if os.environ.get("EGONN_AUTO_CALIB", "1") != "0":
        from egonn_tpu.eval.evaluator import _banded_active
        from egonn_tpu.sparse import banded as _banded

        if _banded_active() and not _banded.FALLBACK:
            from egonn_tpu.data.pipeline import pad_cloud
            from egonn_tpu.sparse.calibrate import auto_calibrate_cached

            def _load_sample(n_sample=16):
                stride = max(1, len(train_ds) // n_sample)
                ids = list(range(0, len(train_ds), stride))[:n_sample]
                clouds = np.zeros((len(ids), num_points, 3), np.float32)
                masks = np.zeros((len(ids), num_points), bool)
                for i, ndx in enumerate(ids):
                    pc, _ = train_ds[ndx]
                    clouds[i], masks[i] = pad_cloud(
                        np.asarray(pc, np.float32), num_points)
                return clouds, masks

            auto_calibrate_cached(
                ["train", params.dataset_folder, dataset_type, num_points,
                 list(built.pyramid_spec.capacities), "aug", params.aug_mode],
                _load_sample, built.quantizer, built.pyramid_spec,
                margin=1.25, aug_mode=params.aug_mode)

    tx = make_optimizer(params)
    lr_sched = make_lr_schedule(params)
    step_fn, _, _ = make_train_step(built, params, tx)

    # init
    rng = jax.random.PRNGKey(0)
    init_cloud = np.zeros((2, num_points, 3), np.float32)
    init_mask = np.zeros((2, num_points), bool)
    def _init_pyr(c, m):
        res = jax.vmap(
            lambda pc, mm: built.quantizer.quantize(pc, mm, built.pyramid_spec.capacities[0], need_index=False)
        )(c, m)
        return build_pyramid(res.coords_t, res.mask, built.pyramid_spec, keys0=res.keys)

    init_pyr = jax.jit(_init_pyr)(jnp.asarray(init_cloud), jnp.asarray(init_mask))
    variables = jax.jit(
        lambda k, p: built.model.init(k, p, built.quantizer, train=False)
    )(rng, init_pyr)
    state = init_train_state(variables, tx)
    start_epoch = 1
    if resume_from is not None:
        from egonn_tpu.train.state import load_checkpoint, load_checkpoint_meta

        state, ck_step = load_checkpoint(resume_from, template=jax.device_get(state))
        meta = load_checkpoint_meta(resume_from, ck_step)
        if "sampler_batch_size" in meta:
            sampler.batch_size = int(meta["sampler_batch_size"])
        start_epoch = int(jax.device_get(state.epoch)) + 1
        print(f"Resumed from {resume_from} step {ck_step}: epoch {start_epoch}, "
              f"batch_size {sampler.batch_size}")
    if mesh is not None:
        from egonn_tpu.parallel.mesh import batch_sharding, replicated

        shard_s = batch_sharding(mesh)
        repl_s = replicated(mesh)
        state = jax.tree.map(lambda x: jax.device_put(x, repl_s), state)

    all_stats: Dict[str, List[Dict[str, float]]] = {"train": [], "val": []}
    test_evaluator = None  # built lazily ONCE — a fresh GLEvaluator per eval
    # would carry fresh jit caches (VERDICT r1 weak #6)
    last_global = None  # last train batch, for the per-epoch health audit
    self_audit_fn = [None]  # cached audit jit (compiled once, reused per epoch)

    from egonn_tpu.utils import tracing

    for epoch in range(start_epoch, params.epochs + 1):
        t_epoch = time.time()
        lr = float(lr_sched(epoch - 1))
        # ALL of this epoch's randomness derives from (seed, epoch) — never
        # from a stream threaded across epochs — so resume is bit-exact
        sampler.set_epoch(epoch)
        if val_sampler is not None:
            val_sampler.set_epoch(epoch)
        local_train_ds.set_epoch(epoch)
        if local_val_ds is not None:
            local_val_ds.set_epoch(epoch)
        epoch_rng = jax.random.fold_in(rng, epoch)
        # phase-scoped profiler capture (SURVEY §5): one epoch, past the
        # compile storm, into EGONN_TRACE_DIR/train_epochN
        trace_ctx = tracing.capture(
            f"train_epoch{epoch}",
            enabled=epoch == min(tracing.trace_epoch(), params.epochs))
        trace_ctx.__enter__()
        phases = ["train"] + (["val"] if val_ds else [])
        for phase_idx, phase in enumerate(phases):
            ds = train_ds if phase == "train" else val_ds
            lds = local_train_ds if phase == "train" else local_val_ds
            smp = sampler if phase == "train" else val_sampler
            phase_rng = jax.random.fold_in(epoch_rng, phase_idx)
            local_ids = list(lds.valid_ids)
            np.random.default_rng([0, epoch, phase_idx]).shuffle(local_ids)
            # local batches hold real pairs only (no mask-padding path), so the
            # mesh requires the size to divide evenly — round up and note it
            lbs = -(-params.local_batch_size // n_dev) * n_dev
            if lbs != params.local_batch_size and epoch == 1 and phase == "train":
                print(f"local_batch_size {params.local_batch_size} -> {lbs} "
                      f"(multiple of {n_dev} mesh devices)")
            local_batches = [
                local_ids[i : i + lbs] for i in range(0, len(local_ids) - lbs + 1, lbs)
            ]

            def batches():
                for bi, (gids, lids) in enumerate(zip(smp, local_batches)):
                    with tracing.annotate("batch_prep"):
                        g = make_global_batch(ds, gids, num_points, buckets)
                        l = make_local_batch(lds, lids, num_points)
                    yield g, l

            running: List[Dict[str, float]] = []
            for count, (g, l) in enumerate(Prefetcher(batches)):
                if phase == "train":
                    last_global = g
                if debug and count >= 2:
                    break
                if g.positives_mask.sum() == 0 or g.negatives_mask.sum() == 0:
                    print("WARNING: Skipping batch without positive or negative examples")
                    continue
                step_rng = jax.random.fold_in(phase_rng, count)
                gdict = {
                    "clouds": g.clouds, "point_mask": g.point_mask,
                    "positives_mask": g.positives_mask,
                    "negatives_mask": g.negatives_mask,
                }
                ldict = {
                    "anc_clouds": l.anc_clouds, "anc_mask": l.anc_mask,
                    "pos_clouds": l.pos_clouds, "pos_mask": l.pos_mask,
                    "t_gt": l.t_gt,
                }
                if mesh is not None:
                    # batch axis sharded; the BxB masks are replicated (the
                    # miner consumes the all-gathered embedding matrix)
                    gdict = {
                        k: jax.device_put(
                            v, shard_s if k in ("clouds", "point_mask") else repl_s)
                        for k, v in gdict.items()
                    }
                    ldict = {k: jax.device_put(v, shard_s)
                             for k, v in ldict.items()}
                with tracing.step_annotation(f"{phase}_step", step_num=count):
                    state, stats = step_fn(
                        state, gdict, ldict, step_rng, jnp.float32(lr),
                        train=phase == "train",
                    )
                    running.append({k: float(v) for k, v in stats.items()})

            if running:
                epoch_stats = {k: float(np.mean([r[k] for r in running]))
                               for k in running[0]}
                all_stats[phase].append(epoch_stats)
                print_stats(epoch_stats, phase)
            else:
                print(f"WARNING: {phase} epoch produced ZERO steps — check that "
                      "tuples have positives and both loaders are non-empty")

        trace_ctx.__exit__(None, None, None)
        state = state.replace(epoch=state.epoch + 1)

        # per-EPOCH band-fit + voxel-capacity health check on the last train
        # batch (one cheap jit; both overflow classes share the
        # drop-and-report policy — all-ok means this epoch's banded outputs
        # were bit-identical to the exact gather engine and no level
        # truncated voxels; see sparse/banded.py + sparse/pyramid.py).
        # Every epoch so an overflow can corrupt gradients for at most one
        # epoch before it is surfaced (tests/test_band_fit.py pins the
        # warning latency).
        if last_global is not None:
            try:
                from egonn_tpu.data.pipeline import device_preprocess_global
                from egonn_tpu.sparse.banded import band_fit_report_traced
                from egonn_tpu.sparse.conv import USE_BANDED, _on_tpu
                from egonn_tpu.sparse.pyramid import capacity_report_traced

                banded_live = USE_BANDED and _on_tpu()
                spec_ = built.pyramid_spec

                if self_audit_fn[0] is None:
                    def _audit(c, m, k):
                        pyr = device_preprocess_global(
                            c, m, built.quantizer, spec_, rng_key=k,
                            aug_mode=params.aug_mode)
                        bands = (band_fit_report_traced(pyr, spec_)
                                 if banded_live else {})
                        return bands, capacity_report_traced(pyr, spec_)

                    self_audit_fn[0] = jax.jit(_audit)
                bands, caps = jax.device_get(self_audit_fn[0](
                    jnp.asarray(last_global.clouds),
                    jnp.asarray(last_global.point_mask),
                    jax.random.PRNGKey(epoch)))
                bad = [k for k, v in bands.items() if not v]
                if bad:
                    from egonn_tpu.sparse.banded import FALLBACK
                    if FALLBACK:
                        print(f"note: band overflow in {bad} — exact "
                              "lax.cond fallback engaged (no drops)")
                    else:
                        print(f"WARNING: band overflow (neighbors "
                              f"dropped) in {bad} — calibrate widths "
                              "(tools/calibrate_bands.py + "
                              "EGONN_BAND_CALIB) or set "
                              "EGONN_BANDED_FALLBACK=1")
                bad_cap = {k: (int(n), int(c)) for k, (n, c) in caps.items()
                           if int(n) > int(c)}
                if bad_cap:
                    detail = ", ".join(f"{k}: {n} > {c}"
                                       for k, (n, c) in sorted(bad_cap.items()))
                    print(f"WARNING: voxel-capacity overflow ({detail}) — "
                          "densest voxels beyond each capacity dropped; raise "
                          "PyramidSpec capacities / model cap0 or calibrate "
                          "them (sparse/calibrate.py calibrate_capacities)")
            except Exception as e:
                print(f"WARNING: band-fit check failed: {e}")

        # periodic in-training evaluation on the test set (reference :258-265)
        if params.test_file and epoch % 10 == 0:
            try:
                from egonn_tpu.eval.evaluator import GLEvaluator

                if test_evaluator is None:
                    test_evaluator = GLEvaluator(
                        params.dataset_folder, dataset_type,
                        params.test_file, built, num_points=num_points,
                        k=20, n_samples=100, n_k=(128,), mesh=mesh)
                ev = test_evaluator
                gm, lm = ev.evaluate(
                    {"params": state.params, "batch_stats": state.batch_stats})
                ev.print_results(gm, lm)
                if log_fn is not None:
                    log_fn({"epoch": epoch, "test": {
                        "recall@1": {r: float(v[0]) for r, v in gm["recall"].items()},
                        **{f"local_{k}": v for k, v in lm.get(128, {}).items()},
                    }})
            except Exception as e:  # eval must never kill training
                print(f"WARNING: in-training eval failed: {e}")

        if log_fn is not None and all_stats["train"]:
            log_fn({"epoch": epoch, "lr": lr, "train": all_stats["train"][-1],
                    **({"val": all_stats["val"][-1]} if all_stats["val"] else {})})

        # dynamic batch expansion (reference :269-278) — decided BEFORE the
        # checkpoint so the saved sampler_batch_size is the size the NEXT
        # epoch will run with (resume must continue the expanded trajectory)
        if params.batch_expansion_th is not None and all_stats["train"]:
            es = all_stats["train"][-1]
            if "num_non_zero_triplets" in es and es["num_triplets"] > 0:
                rnz = es["num_non_zero_triplets"] / es["num_triplets"]
                if rnz < params.batch_expansion_th:
                    sampler.expand_batch()

        if epoch % params.save_freq == 0:
            save_checkpoint(os.path.join(weights_path, model_name), state, epoch,
                            extra_meta={"sampler_batch_size": sampler.batch_size})
        print(f"epoch {epoch} took {time.time() - t_epoch:.1f}s (lr {lr:.2e})")

    save_checkpoint(os.path.join(weights_path, model_name), state, params.epochs,
                    extra_meta={"sampler_batch_size": sampler.batch_size})
    return state, all_stats, model_name
