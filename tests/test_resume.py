"""Checkpoint resume: a run killed at an epoch boundary and resumed must
reproduce the uninterrupted run bit-exactly.

This is the SURVEY §5 checkpoint/resume contract ("full train-state
checkpointing with resume — an upgrade over the reference, which cannot
resume"; contrast reference training/trainer.py:218-219 which torch.saves a
bare state_dict and has no restore path).  Bit-exactness is achievable because
every piece of per-epoch randomness in do_train derives from (seed, epoch):
the sampler reseeds per epoch (BatchSampler.set_epoch), the local-pair shuffle
uses np.random.default_rng([0, epoch, phase]), and augmentation keys come from
fold_in(fold_in(key, epoch), phase/count) — no RNG stream is threaded across
epochs.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # fast tier: pytest -m 'not slow'

import jax


def _params(root, train_p, val_p):
    from egonn_tpu.config import TrainingParams

    params = TrainingParams("config/config_egonn.txt", "model_configs/egonn.txt",
                            require_dataset=False)
    params.dataset_folder = root
    params.train_file = train_p
    params.val_file = val_p
    params.test_file = None
    params.batch_size = 8
    params.batch_size_limit = 16
    params.batch_expansion_rate = 1.4
    # force an expansion after every epoch so resume must restore the expanded
    # batch size to stay on the uninterrupted trajectory
    params.batch_expansion_th = 1.1
    params.local_batch_size = 4
    params.save_freq = 1
    params.mesh = "off"
    params.model_params.cap0 = 256
    params.model_params.num_points = 512
    params.model_params.num_points_explicit = True
    return params


def test_resume_matches_uninterrupted(tmp_path):
    from egonn_tpu.data.synthetic import generate_synthetic_dataset
    from egonn_tpu.train.trainer import do_train

    root = str(tmp_path / "synth")
    train_p, val_p, _ = generate_synthetic_dataset(
        root, n_scans=32, extent=60.0, scan_radius=40.0, max_points=2048, seed=0)

    # uninterrupted: 2 epochs
    p_full = _params(root, train_p, val_p)
    p_full.epochs = 2
    state_full, _, _ = do_train(p_full, weights_path=str(tmp_path / "w_full"),
                                log_fn=lambda m: None, dataset_type="synthetic")

    # interrupted: 1 epoch, then resume to 2
    p_half = _params(root, train_p, val_p)
    p_half.epochs = 1
    _, _, name = do_train(p_half, weights_path=str(tmp_path / "w_half"),
                          log_fn=lambda m: None, dataset_type="synthetic")
    ckpt_dir = str(tmp_path / "w_half" / name)

    p_res = _params(root, train_p, val_p)
    p_res.epochs = 2
    state_res, _, _ = do_train(p_res, log_fn=lambda m: None,
                               dataset_type="synthetic", resume_from=ckpt_dir)

    assert int(state_res.epoch) == int(state_full.epoch) == 2
    flat_full = jax.tree.leaves(jax.device_get(state_full.params))
    flat_res = jax.tree.leaves(jax.device_get(state_res.params))
    for a, b in zip(flat_full, flat_res):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(jax.device_get(state_full.batch_stats)),
                    jax.tree.leaves(jax.device_get(state_res.batch_stats))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(jax.device_get(state_full.opt_state)),
                    jax.tree.leaves(jax.device_get(state_res.opt_state))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_restores_expanded_batch_size(tmp_path):
    """The sampler's dynamically expanded batch size survives the checkpoint:
    without the sidecar meta a resume would restart at batch 32 with a wrong
    LR-equivalent trajectory (VERDICT r4 missing #2)."""
    from egonn_tpu.train.state import load_checkpoint_meta, save_checkpoint
    from egonn_tpu.train.state import TrainState
    import jax.numpy as jnp

    state = TrainState(params={"w": jnp.zeros((2,))}, batch_stats={},
                       opt_state=(), epoch=jnp.asarray(3, jnp.int32))
    d = str(tmp_path / "ck")
    save_checkpoint(d, state, 3, extra_meta={"sampler_batch_size": 63})
    assert load_checkpoint_meta(d, 3) == {"sampler_batch_size": 63}
    assert load_checkpoint_meta(d, 99) == {}  # sidecar-less step


def test_sampler_set_epoch_deterministic():
    """set_epoch makes batch generation a pure function of (seed, epoch)."""
    from egonn_tpu.data.samplers import BatchSampler

    class DS:
        queries = {i: None for i in range(40)}

        def get_positives(self, ndx):
            return [(ndx + 1) % 40, (ndx + 2) % 40]

    a = BatchSampler(DS(), batch_size=8, seed=0)
    b = BatchSampler(DS(), batch_size=8, seed=0)
    a.set_epoch(5)
    b.set_epoch(3)
    first_b = list(b)
    b.set_epoch(5)
    assert list(a) == list(b)
    a.set_epoch(3)
    assert list(a) == first_b


def test_trainer_capacity_audit_warns_within_one_epoch(tmp_path, capsys):
    """VERDICT r4 task 3/4: a cloud denser than the capacity table must
    surface a voxel-capacity warning within ONE epoch (the audit runs every
    epoch on the last train batch)."""
    from egonn_tpu.data.synthetic import generate_synthetic_dataset
    from egonn_tpu.train.trainer import do_train

    root = str(tmp_path / "synth")
    train_p, val_p, _ = generate_synthetic_dataset(
        root, n_scans=24, extent=60.0, scan_radius=40.0, max_points=2048, seed=0)

    params = _params(root, train_p, val_p)
    params.epochs = 1
    params.batch_expansion_th = None
    params.val_file = None
    # tiny capacity: the synthetic scans have >> 64 occupied voxels
    params.model_params.cap0 = 64
    do_train(params, weights_path=str(tmp_path / "w"), log_fn=lambda m: None,
             dataset_type="synthetic")
    out = capsys.readouterr().out
    assert "voxel-capacity overflow" in out
