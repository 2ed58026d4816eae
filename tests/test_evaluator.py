"""GLEvaluator protocol options: query subsampling (--n_samples) and the
random-keypoint ablation (--ignore_keypoint_saliency), on the synthetic set."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np


@pytest.mark.slow  # compile-heavy golden (suite-time budget)
def test_gl_evaluator_n_samples_and_saliency_ablation(tmp_path, rng):
    from egonn_tpu.config import TrainingParams
    from egonn_tpu.data.synthetic import generate_synthetic_dataset
    from egonn_tpu.eval.evaluator import GLEvaluator
    from egonn_tpu.models.factory import model_factory
    from egonn_tpu.sparse.pyramid import build_pyramid

    root = str(tmp_path / "synth")
    _, _, eval_p = generate_synthetic_dataset(
        root, n_scans=24, extent=60.0, scan_radius=40.0, max_points=4096, seed=0)

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

    ev = GLEvaluator(root, "synthetic", eval_p, built, num_points=n,
                     batch_size=8, n_k=[16], n_hypotheses=64,
                     n_samples=4, ignore_keypoint_saliency=True)
    # --n_samples subsamples the query sequence (reference eval/evaluate.py:421)
    assert len(ev.eval_set.query_set) == 4
    global_metrics, local_metrics = ev.evaluate(variables)
    assert set(global_metrics["recall"]) == {5.0, 20.0}
    # random-keypoint ablation still returns a full local-metrics dict when
    # pairs are eligible, and never selects invalid keypoints ahead of valid
    emb = ev.compute_embeddings(variables, ev.eval_set.query_set,
                                with_local=True, n_k=16)
    kp_valid = emb["kp_valid"]
    sigma = emb["sigma"]
    # under the ablation the selected sigmas are NOT sorted ascending for at
    # least one cloud (they would be under saliency selection)
    finite = np.where(kp_valid, sigma, np.nan)
    unsorted = [
        bool(np.any(np.diff(row[~np.isnan(row)]) < 0)) for row in finite
    ]
    assert any(unsorted)
    # validity-first: a selected-invalid slot implies the cloud ran out of
    # valid keypoints entirely at that rank
    n_valid_total = kp_valid.sum(axis=1)
    for i, nv in enumerate(n_valid_total):
        assert kp_valid[i, :nv].all()


@pytest.mark.slow  # compile-heavy (capacity fit recompiles; suite-time budget)
def test_evaluator_auto_capcalib(tmp_path, rng, monkeypatch):
    """EGONN_AUTO_CAPCALIB=1 fits the evaluator's capacity table to the
    dataset before tracing: deep levels shrink to measured occupancy,
    embeddings match the unfitted evaluator (capacities are padding only),
    and the capacity health check passes under the fitted table."""
    from egonn_tpu.config import TrainingParams
    from egonn_tpu.data.synthetic import generate_synthetic_dataset
    from egonn_tpu.eval.evaluator import Evaluator
    from egonn_tpu.models.factory import model_factory
    from egonn_tpu.sparse.pyramid import build_pyramid

    root = str(tmp_path / "synth")
    _, _, eval_p = generate_synthetic_dataset(
        root, n_scans=16, extent=60.0, scan_radius=40.0, max_points=4096, seed=0)

    params = TrainingParams("config/config_egonn.txt", "model_configs/egonn.txt",
                            require_dataset=False)
    params.model_params.cap0 = 1024
    built = model_factory(params.model_params, cap0=1024)
    n = 2048
    q, spec, model = built.quantizer, built.pyramid_spec, built.model
    th = rng.uniform(0, 2 * np.pi, (2, n))
    rad = rng.uniform(2, 50, (2, n))
    z = rng.uniform(-1, 8, (2, n))
    c2 = jnp.asarray(np.stack([rad * np.cos(th), rad * np.sin(th), z], -1
                              ).astype(np.float32))
    res = jax.vmap(lambda pc, mm: q.quantize(pc, mm, spec.capacities[0],
                                             need_index=False))(
        c2, jnp.ones((2, n), bool))
    pyr = jax.jit(lambda r: build_pyramid(r.coords_t, r.mask, spec,
                                          keys0=r.keys))(res)
    variables = jax.jit(lambda k, p: model.init(k, p, q, train=False))(
        jax.random.PRNGKey(0), pyr)

    ev_plain = Evaluator(root, "synthetic", eval_p, built, num_points=n,
                         batch_size=8)
    e_plain = ev_plain.compute_embeddings(variables, ev_plain.eval_set.map_set)

    monkeypatch.setenv("EGONN_AUTO_CAPCALIB", "1")
    ev_fit = Evaluator(root, "synthetic", eval_p, built, num_points=n,
                       batch_size=8)
    e_fit = ev_fit.compute_embeddings(variables, ev_fit.eval_set.map_set)
    fitted = ev_fit.built.pyramid_spec.capacities
    assert fitted[0] == spec.capacities[0]
    assert fitted != spec.capacities, "fit should change at least one level"
    assert fitted[-1] <= spec.capacities[-1]
    # same model weights, same voxels -> same descriptors (capacity = padding)
    np.testing.assert_allclose(e_fit["global"], e_plain["global"],
                               rtol=1e-3, atol=1e-4)
    # the fitted levels hold on this data (L0 is the unfitted BUDGET — these
    # deliberately dense test scans overflow it, and the report says so)
    assert ev_fit.capacity_ok is not None
    for l in range(1, len(fitted)):
        assert ev_fit.capacity_ok[f"cap_L{l}"][2], ev_fit.capacity_ok
    assert not ev_fit.capacity_ok["cap_L0"][2]
