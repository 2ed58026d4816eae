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
