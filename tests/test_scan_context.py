"""ScanContext baseline (eval/scan_context.py) and the rotation-robustness
evaluator (eval/rotations.py) — host-side protocol tests.

Reference counterparts: third_party/scan_context/scan_context.py and
eval/evaluate_with_rotations.py (jac99/Egonn)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.eval.scan_context import (
    ScanContext,
    ScanContextManager,
    distance_sc,
    pt2rs,
    sc2rk,
)


def _rot_z(points, theta):
    c, s = np.cos(theta), np.sin(theta)
    R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    return points @ R.T


def test_pt2rs_cells():
    sc = ScanContext(num_sector=60, num_ring=20, max_length=80)
    # a point at 10 m along +x: theta = pi after the +pi shift -> sector 30
    pts = np.array([[10.0, 0.0, 0.0]])
    r, s = pt2rs(pts, sc.gap_ring, sc.gap_sector)
    assert r[0] == int(10.0 // sc.gap_ring) == 2
    assert s[0] == 30
    # just above the -x axis: atan2 -> ~pi, +pi shift -> ~2*pi - eps -> last sector
    pts = np.array([[-10.0, 1e-5, 0.0]])
    _, s = pt2rs(pts, sc.gap_ring, sc.gap_sector)
    assert s[0] == 59


def test_descriptor_max_height_semantics():
    sc = ScanContext(num_sector=60, num_ring=20, max_length=80, lidar_height=2.0)
    # two points in the same cell: descriptor keeps the MAX height (+2 m shift)
    pts = np.array([[10.0, 0.0, 1.0], [10.05, 0.0, 3.0], [90.0, 0.0, 5.0]])
    d = sc(pts)
    assert d.shape == (20, 60)
    assert np.isclose(d[2, 30], 5.0)  # max(1, 3) + lidar_height
    assert d.sum() == d[2, 30]  # the 90 m point is beyond max_length: dropped
    # negative heights clip at 0 (reference semantics)
    d2 = sc(np.array([[10.0, 0.0, -5.0]]))
    assert d2[2, 30] == 0.0


def test_ring_key_rotation_invariant(rng):
    sc = ScanContext()
    pts = np.stack([rng.uniform(-60, 60, 512), rng.uniform(-60, 60, 512),
                    rng.uniform(-1, 4, 512)], 1)
    rk1 = sc2rk(sc(pts))
    rk2 = sc2rk(sc(_rot_z(pts, np.radians(42.0))))
    # ring keys are per-ring means -> invariant up to cell-boundary jitter
    np.testing.assert_allclose(rk1, rk2, atol=0.35)


def test_column_shift_rerank_recovers_rotation(rng):
    sc = ScanContext(num_sector=60)
    pts = np.stack([rng.uniform(-60, 60, 2048), rng.uniform(-60, 60, 2048),
                    rng.uniform(-1, 4, 2048)], 1)
    shift_sectors = 7
    rotated = _rot_z(pts, shift_sectors * sc.gap_sector)
    dist, yaw = distance_sc(sc(pts), sc(rotated))
    assert dist < 0.15  # near-match once the shift is found
    # yaw step granularity: within one sector of the true shift
    assert min((yaw - shift_sectors) % 60, (shift_sectors - yaw) % 60) <= 1
    # a different cloud is far
    other = np.stack([rng.uniform(-60, 60, 2048), rng.uniform(-60, 60, 2048),
                      rng.uniform(-1, 4, 2048)], 1)
    dist_other, _ = distance_sc(sc(pts), sc(other))
    assert dist_other > dist + 0.1


def test_manager_retrieval_under_rotation(rng):
    mgr = ScanContextManager(max_capacity=64)
    clouds = [
        np.stack([rng.uniform(-60, 60, 1024), rng.uniform(-60, 60, 1024),
                  rng.uniform(-1, 4, 1024)], 1)
        for _ in range(6)
    ]
    for c in clouds:
        mgr.add_node(c)
    target = 3
    query = _rot_z(clouds[target], np.radians(30.0))
    nn, d, yaw = mgr.query(query, k=3, reranking=True)
    assert nn[0] == target and d[0] < 0.2
    nn_plain, d_none, _ = mgr.query(clouds[target], k=1, reranking=False)
    assert nn_plain[0] == target and d_none is None


@pytest.mark.slow  # compile-heavy golden (suite-time budget)
def test_rotation_evaluator_theta0_matches_base(tmp_path, rng):
    from egonn_tpu.config import TrainingParams
    from egonn_tpu.data.synthetic import generate_synthetic_dataset
    from egonn_tpu.eval.evaluator import Evaluator
    from egonn_tpu.eval.rotations import RotationEvaluator
    from egonn_tpu.models.factory import model_factory
    from egonn_tpu.sparse.pyramid import build_pyramid

    root = str(tmp_path / "synth")
    _, _, eval_p = generate_synthetic_dataset(
        root, n_scans=16, extent=60.0, scan_radius=40.0, max_points=2048, seed=0)
    params = TrainingParams("config/config_egonn.txt", "model_configs/egonn.txt",
                            require_dataset=False)
    params.model_params.cap0 = 256
    built = model_factory(params.model_params, cap0=256)
    n = 512
    q, spec, model = built.quantizer, built.pyramid_spec, built.model
    th = rng.uniform(0, 2 * np.pi, (2, n))
    rad = rng.uniform(2, 50, (2, n))
    z = rng.uniform(-1, 8, (2, n))
    c2 = jnp.asarray(np.stack([rad * np.cos(th), rad * np.sin(th), z], -1
                              ).astype(np.float32))
    res = jax.vmap(lambda pc, mm: q.quantize(pc, mm, spec.capacities[0],
                                             need_index=False))(
        c2, jnp.ones((2, n), bool))
    pyr = jax.jit(lambda r: build_pyramid(r.coords_t, r.mask, spec, keys0=r.keys))(res)
    variables = jax.jit(lambda k, p: model.init(k, p, q, train=False))(
        jax.random.PRNGKey(0), pyr)

    base = Evaluator(root, "synthetic", eval_p, built, num_points=n, batch_size=8)
    base_recall = base.evaluate(variables)["recall"]
    rot = RotationEvaluator(root, "synthetic", eval_p, built, num_points=n,
                            batch_size=8, thetas_deg=[0.0, 90.0])
    results = rot.evaluate(variables)
    assert set(results) == {0.0, 90.0}
    r0 = {float(k): v for k, v in results[0.0]["recall"].items()}
    for radius, want in base_recall.items():
        np.testing.assert_allclose(r0[float(radius)], want)
