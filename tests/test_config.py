"""Config-system parity pins (egonn_tpu/config.py vs reference misc/utils.py):
the trans_max-reads-rot_max quirk (overridable here), gamma mapping, batch
expansion gating, secondary-dataset fields, and the optional [TPU] section."""
import numpy as np

from egonn_tpu.config import TrainingParams


def _write_cfg(tmp_path, extra_default="", extra_train=""):
    cfg = tmp_path / "cfg.txt"
    cfg.write_text(f"""[DEFAULT]
dataset = mulran
dataset_folder = /nonexistent
{extra_default}
[TRAIN]
num_workers = 2
batch_size = 16
scheduler_milestones = 80
loss = BatchHardTripletMarginLoss
margin = 0.2
{extra_train}
""")
    return str(cfg)


def test_trans_max_reads_rot_max_quirk(tmp_path):
    """Reference misc/utils.py:110: trans_max = getfloat('rot_max', 5.0)."""
    p = TrainingParams(_write_cfg(tmp_path, extra_default="rot_max = 1.25\n"),
                       "model_configs/egonn.txt", require_dataset=False)
    assert p.rot_max == 1.25
    assert p.trans_max == 1.25  # the quirk: reads the rot_max key

    # defaults match the reference when the key is absent
    p = TrainingParams(_write_cfg(tmp_path), "model_configs/egonn.txt",
                       require_dataset=False)
    assert np.isclose(p.rot_max, np.pi)
    assert p.trans_max == 5.0

    # our documented escape hatch: an explicit trans_max key wins
    p = TrainingParams(_write_cfg(tmp_path,
                                  extra_default="rot_max = 1.25\ntrans_max = 0.5\n"),
                       "model_configs/egonn.txt", require_dataset=False)
    assert p.trans_max == 0.5


def test_batch_expansion_gating(tmp_path):
    p = TrainingParams(_write_cfg(tmp_path), "model_configs/egonn.txt",
                       require_dataset=False)
    assert p.batch_expansion_th is None
    assert p.batch_size_limit == p.batch_size == 16
    assert p.batch_expansion_rate is None

    p = TrainingParams(
        _write_cfg(tmp_path, extra_train=(
            "batch_expansion_th = 0.7\nbatch_size_limit = 128\n"
            "batch_expansion_rate = 1.4\n")),
        "model_configs/egonn.txt", require_dataset=False)
    assert p.batch_expansion_th == 0.7
    assert p.batch_size_limit == 128 and p.batch_expansion_rate == 1.4


def test_reference_config_files_parse():
    """The shipped reference INI files parse to the published hyperparameters."""
    p = TrainingParams("config/config_egonn.txt", "model_configs/egonn.txt",
                       require_dataset=False)
    assert p.epochs == 160 and p.batch_size == 32 and p.batch_size_limit == 128
    assert p.batch_expansion_rate == 1.4 and p.batch_expansion_th == 0.7
    assert p.lr == 1e-3 and p.weight_decay == 1e-4
    assert p.model_params.model == "egonn"
    q = p.model_params.quantizer
    np.testing.assert_allclose(np.asarray(q.quant_step), [1.0, 0.3, 0.2])
    # gammas (1, 1, 1, 4) -> (chamfer, p2p, correspondence, beta)
    assert tuple(p.loss_gammas) == (1.0, 1.0, 1.0, 4.0)
