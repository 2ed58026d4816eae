"""Pod-scale rotation eval (VERDICT r3 item 7): the rotation-robustness sweep
sharded over an 8-device data mesh must produce recalls identical to the
unsharded run (BASELINE.json config 5's multi-chip path)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest


@pytest.mark.slow
def test_rotation_eval_sharded_matches_unsharded(tmp_path):
    from egonn_tpu.data.synthetic import generate_synthetic_dataset
    from egonn_tpu.eval.rotations import RotationEvaluator
    from egonn_tpu.models.factory import create_egonn_model
    from egonn_tpu.ops.quantization import PolarQuantizer
    from egonn_tpu.parallel.mesh import make_mesh
    from egonn_tpu.sparse.pyramid import build_pyramid

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh (tests/conftest.py)")

    root = str(tmp_path / "synth")
    _, _, eval_p = generate_synthetic_dataset(
        root, n_scans=24, extent=60.0, scan_radius=40.0, max_points=4096, seed=0)

    class MP:
        model = "egonn"
        quantizer = PolarQuantizer([2.0, 1.0, 0.5])
        cap0 = 256

    built = create_egonn_model(MP(), cap0=256)
    n = 512
    q, spec, model = built.quantizer, built.pyramid_spec, built.model
    rng = np.random.default_rng(0)
    th = rng.uniform(0, 2 * np.pi, (1, n))
    rad = rng.uniform(2, 50, (1, n))
    z = rng.uniform(-1, 8, (1, n))
    c1 = jnp.asarray(np.stack([rad * np.cos(th), rad * np.sin(th), z], -1
                              ).astype(np.float32))
    res = jax.vmap(lambda pc, mm: q.quantize(pc, mm, spec.capacities[0],
                                             need_index=False))(
        c1, jnp.ones((1, n), bool))
    pyr = jax.jit(lambda r: build_pyramid(r.coords_t, r.mask, spec, keys0=r.keys))(res)
    variables = jax.jit(lambda k, p: model.init(k, p, q, train=False))(
        jax.random.PRNGKey(0), pyr)

    thetas = (0.0, 90.0, 180.0)
    kwargs = dict(num_points=n, batch_size=4, thetas_deg=thetas)
    ev_plain = RotationEvaluator(root, "synthetic", eval_p, built, **kwargs)
    ev_mesh = RotationEvaluator(root, "synthetic", eval_p, built,
                                mesh=make_mesh(8), **kwargs)
    # mesh batch size rounds up to a multiple of the device count
    assert ev_mesh.batch_size % 8 == 0

    r_plain = ev_plain.evaluate(variables)
    r_mesh = ev_mesh.evaluate(variables)
    assert set(r_plain) == set(thetas) == set(r_mesh)
    for theta in thetas:
        for rad_m in r_plain[theta]["recall"]:
            np.testing.assert_allclose(
                r_mesh[theta]["recall"][rad_m], r_plain[theta]["recall"][rad_m],
                atol=0, err_msg=f"theta={theta} radius={rad_m}")
