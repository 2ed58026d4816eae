"""Band-width calibration (sparse/calibrate.py): requirement semantics must
match the fit flags exactly, calibration must override the compiled widths,
and a dataset that overflows the shipped defaults must come out overflow-free
after calibration (VERDICT r3 item 4)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from egonn_tpu.sparse import banded
from egonn_tpu.sparse.calibrate import (
    _conv_requirement,
    _zrun_requirement,
    band_requirements_traced,
    calibrate_from_clouds,
    finalize_table,
)


@pytest.fixture(autouse=True)
def _clean_calibration():
    banded.set_band_calibration(None)
    yield
    banded.set_band_calibration(None)


def _random_kmap(rng, b, k, c_out, c_in, spread):
    """Kernel map whose gathers cluster near the (sorted) output position with
    +-spread jitter — the banded invariant at a controllable band width."""
    base = np.linspace(0, c_in - 1, c_out, dtype=np.int64)
    idx = base[None, None, :] + rng.integers(-spread, spread + 1, (b, k, c_out))
    idx = np.clip(idx, 0, c_in - 1)
    sentinel = rng.random((b, k, c_out)) < 0.1
    return jnp.asarray(np.where(sentinel, c_in, idx).astype(np.int32))


def test_conv_requirement_is_minimal_fitting_sub():
    rng = np.random.default_rng(0)
    c = 1024
    for spread in (5, 60, 200):
        kmap = _random_kmap(rng, 2, 27, c, c, spread)
        req = int(_conv_requirement(kmap, c))
        assert 0 < req <= c
        ok_at_req = bool(banded.band_layout_union(kmap, c, req, 128)[2])
        assert ok_at_req, (spread, req)
        if req > 1:
            ok_below = bool(banded.band_layout_union(kmap, c, req - 1, 128)[2])
            assert not ok_below, (spread, req)


def test_zrun_requirement_matches_zrun_fit():
    rng = np.random.default_rng(1)
    c = 512
    keys = np.sort(rng.choice(2**20, (2, c), replace=False).astype(np.int32), axis=1)
    base = np.linspace(0, 2**20 - 1, 256, dtype=np.int64)
    q_lo = base[None, None, :] + rng.integers(-500, 500, (2, 9, 256))
    q_lo = jnp.asarray(np.clip(q_lo, 0, 2**20).astype(np.int32))
    keys = jnp.asarray(keys)
    req = int(_zrun_requirement(keys, q_lo, kz=3))
    assert req % banded.DEFAULT_STRIDE == 0 and req > 0
    assert bool(banded.zrun_fit(keys, q_lo, kz=3, sub=req))
    if req > banded.DEFAULT_STRIDE:
        assert not bool(banded.zrun_fit(keys, q_lo, kz=3,
                                        sub=req - banded.DEFAULT_STRIDE))


def test_calibration_overrides_compiled_widths():
    assert banded.conv_sub_width(1024, 1024) == 256      # shipped self default
    assert banded.conv_sub_width(2048, 1024) == 1024     # shipped down default
    banded.set_band_calibration({"conv:1024:1024": 512, "conv:2048:1024": 1536,
                                 "zrun:512:3": 640})
    assert banded.conv_sub_width(1024, 1024) == 512
    assert banded.conv_sub_width(2048, 1024) == 1536
    # zrun picks the calibrated width: a fit that fails at the default-safe
    # width must pass once calibration raises it
    rng = np.random.default_rng(2)
    c = 512
    keys = jnp.asarray(
        np.sort(rng.choice(2**20, (1, c), replace=False).astype(np.int32), axis=1))
    # queries scattered uniformly: each tile's band spans the whole table,
    # guaranteeing the requirement exceeds the 384 default
    q_lo = jnp.asarray(rng.integers(0, 2**20, (1, 9, 256)).astype(np.int32))
    req = int(_zrun_requirement(keys, q_lo, kz=3))
    assert req > 384, req
    assert not bool(banded.zrun_fit(keys, q_lo, kz=3, sub=384))
    banded.set_band_calibration({"zrun:512:3": req})
    assert bool(banded.zrun_fit(keys, q_lo, kz=3))  # default arg, calibrated


def test_finalize_table_margin_and_quantum():
    table = finalize_table({"conv:1024:1024": 243, "zrun:512:5": 0,
                            "conv:2048:1024": 1})
    assert "zrun:512:5" not in table                  # never exercised
    assert table["conv:1024:1024"] == 384             # 243*1.25 -> 304 -> 384
    assert table["conv:2048:1024"] == 128             # floored at one stride


@pytest.mark.slow
def test_synthetic_eval_set_calibrates_to_zero_overflow(tmp_path):
    """The done-criterion (VERDICT r3 item 4): the 16k-point synthetic eval
    scans at 8k voxel capacity — the exact regime that overflowed self_L1/L2
    in round 3 (RESULTS.md band-overflow section) — must show band_fit
    failures with the shipped widths and NONE after calibration."""
    import glob

    from egonn_tpu.data.base import get_pointcloud_loader
    from egonn_tpu.data.synthetic import generate_synthetic_dataset
    from egonn_tpu.models.factory import create_egonn_model
    from egonn_tpu.ops.quantization import PolarQuantizer
    from egonn_tpu.sparse.banded import band_fit_report
    from egonn_tpu.sparse.pyramid import build_pyramid

    root = str(tmp_path / "synth")
    generate_synthetic_dataset(root, n_scans=16, extent=160.0, scan_radius=60.0,
                               max_points=16384, seed=0)
    loader = get_pointcloud_loader("synthetic")
    files = sorted(glob.glob(root + "/scans/*.bin"))[:8]

    class MP:
        model = "egonn"
        quantizer = PolarQuantizer([1.0, 0.3, 0.2])
        cap0 = 8192

    built = create_egonn_model(MP(), cap0=8192)
    spec, quantizer = built.pyramid_spec, built.quantizer

    n, b = 16384, 2
    clouds, masks = [], []
    for f in files:
        pc = loader(f)
        k = min(len(pc), n)
        buf = np.zeros((n, 3), np.float32)
        buf[:k] = pc[:k]
        m = np.zeros((n,), bool)
        m[:k] = True
        clouds.append(buf)
        masks.append(m)
    clouds, masks = np.stack(clouds), np.stack(masks)

    def mk(c, m):
        res = jax.vmap(lambda pc, mm: quantizer.quantize(
            pc, mm, spec.capacities[0], need_index=False))(c, m)
        return build_pyramid(res.coords_t, res.mask, spec, keys0=res.keys)

    mkj = jax.jit(mk)

    def all_bad():
        bad = []
        for i in range(0, len(clouds), b):
            rep = band_fit_report(mkj(jnp.asarray(clouds[i:i + b]),
                                      jnp.asarray(masks[i:i + b])), spec)
            bad += [k for k, v in rep.items() if not v]
        return sorted(set(bad))

    assert all_bad(), "probe regression: the r3 overflow regime no longer overflows"

    table = calibrate_from_clouds(clouds, masks, quantizer, spec, batch=b)
    # zrun widths must be present even though CPU never runs the banded lookup
    assert any(k.startswith("zrun:") for k in table), table
    banded.set_band_calibration(table)
    assert all_bad() == []


@pytest.mark.slow
def test_evaluator_auto_calibration(tmp_path, monkeypatch):
    """Evaluator._maybe_calibrate installs a dataset-measured table before the
    first forward traces and caches it per dataset+config (~/.cache/egonn_tpu);
    second construction loads the cache; EGONN_AUTO_CALIB=0 disables."""
    from egonn_tpu.config import ModelParams
    from egonn_tpu.data.synthetic import generate_synthetic_dataset
    from egonn_tpu.eval.evaluator import Evaluator
    from egonn_tpu.models.factory import model_factory
    import egonn_tpu.eval.evaluator as evmod
    from egonn_tpu.sparse import banded

    root = str(tmp_path / "synth")
    _, _, eval_p = generate_synthetic_dataset(
        root, n_scans=12, extent=60.0, scan_radius=40.0, max_points=2048, seed=3)

    mp = ModelParams("model_configs/egonn.txt")
    mp.cap0 = 256
    mp.num_points = 512
    mp.num_points_explicit = True
    built = model_factory(mp, cap0=mp.cap0)

    # the banded engine is TPU-only; force the evaluator's gate on so the
    # calibration logic (pure jnp, runs anywhere) is exercised on CPU
    monkeypatch.setattr(evmod, "_banded_active", lambda: True)
    monkeypatch.setenv("HOME", str(tmp_path))  # isolate the cache dir
    banded.set_band_calibration({})
    try:
        ev = Evaluator(root, "synthetic", eval_p, built, num_points=512)
        ev._maybe_calibrate()
        table = banded.get_band_calibration()
        assert table, "auto-calibration installed no table"
        assert any(k.startswith("conv:") for k in table)
        import glob
        caches = glob.glob(str(tmp_path / ".cache" / "egonn_tpu" / "*.json"))
        assert len(caches) == 1

        # second evaluator: loads the cache instead of re-measuring
        banded.set_band_calibration({})
        ev2 = Evaluator(root, "synthetic", eval_p, built, num_points=512)
        ev2._maybe_calibrate()
        assert banded.get_band_calibration() == table

        # kill switch
        banded.set_band_calibration({})
        monkeypatch.setenv("EGONN_AUTO_CALIB", "0")
        ev3 = Evaluator(root, "synthetic", eval_p, built, num_points=512)
        ev3._maybe_calibrate()
        assert banded.get_band_calibration() == {}
    finally:
        banded.set_band_calibration({})


@pytest.mark.slow
def test_trainer_auto_calibration(tmp_path, monkeypatch):
    """do_train installs a dataset-measured band table (margin 1.5 for
    augmentation headroom) before its first jit traces, cached like the
    evaluator's."""
    import glob

    import egonn_tpu.eval.evaluator as evmod
    from egonn_tpu.config import TrainingParams
    from egonn_tpu.data.synthetic import generate_synthetic_dataset
    from egonn_tpu.sparse import banded
    from egonn_tpu.train.trainer import do_train

    root = str(tmp_path / "synth")
    train_p, val_p, _ = generate_synthetic_dataset(
        root, n_scans=24, extent=60.0, scan_radius=40.0, max_points=2048, seed=5)

    params = TrainingParams("config/config_egonn.txt", "model_configs/egonn.txt",
                            require_dataset=False)
    params.dataset_folder = root
    params.train_file = train_p
    params.val_file = None
    params.test_file = None
    params.epochs = 1
    params.batch_size = params.batch_size_limit = 4
    params.batch_expansion_rate = None
    params.batch_expansion_th = None
    params.local_batch_size = 4
    params.mesh = None
    params.model_params.cap0 = 256
    params.model_params.num_points = 512
    params.model_params.num_points_explicit = True

    monkeypatch.setattr(evmod, "_banded_active", lambda: True)
    monkeypatch.setenv("HOME", str(tmp_path))
    banded.set_band_calibration({})
    try:
        do_train(params, debug=True, weights_path=str(tmp_path / "w"),
                 log_fn=lambda m: None, dataset_type="synthetic")
        table = banded.get_band_calibration()
        assert table and any(k.startswith("conv:") for k in table)
        caches = glob.glob(str(tmp_path / ".cache" / "egonn_tpu" / "*.json"))
        assert len(caches) == 1
    finally:
        banded.set_band_calibration({})
