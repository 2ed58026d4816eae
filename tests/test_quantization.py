import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.ops.geometry import cartesian_to_polar, polar_to_cartesian
from egonn_tpu.ops.quantization import (
    CartesianQuantizer,
    PolarQuantizer,
    quantize_np,
)


def make_cloud(rng, n=1000):
    cart = rng.random((n, 3), dtype=np.float32)
    cart[:, 0] = cart[:, 0] * 200.0 - 100.0
    cart[:, 1] = cart[:, 1] * 200.0 - 100.0
    cart[:, 2] = cart[:, 2] * 30.0 - 10.0
    return cart


def test_polar_roundtrip(rng):
    pc = make_cloud(rng)
    polar = np.asarray(cartesian_to_polar(jnp.asarray(pc)))
    assert polar[:, 0].min() >= 0.0 and polar[:, 0].max() <= 360.0
    back = np.asarray(polar_to_cartesian(jnp.asarray(polar)))
    np.testing.assert_allclose(back, pc, atol=1e-3)


def test_polar_quantizer_residual(rng):
    # Mirrors the reference self-test (datasets/quantization.py:106-118):
    # quantize -> dequantize residual bounded by half the voxel diagonal.
    pc = make_cloud(rng)
    q = PolarQuantizer([0.5, 0.3, 0.2])
    res = q.quantize(jnp.asarray(pc), jnp.ones(len(pc), dtype=bool), capacity=len(pc))
    mask = np.asarray(res.mask)
    back = np.asarray(q.dequantize(res.coords_t.T))[mask]
    orig = pc[np.asarray(res.index)[mask]]
    dist = np.linalg.norm(back - orig, axis=1)
    # max residual: half voxel diagonal; at r<=142 m a 0.5 deg sector is ~1.24 m wide
    max_sector = 142.0 * np.radians(0.5)
    bound = 0.5 * np.sqrt(max_sector**2 + 0.3**2 + 0.2**2) + 1e-3
    assert dist.max() <= bound, dist.max()
    assert dist.mean() < 0.5


def test_polar_quantizer_matches_numpy(rng):
    # Device output is key-sorted; numpy reference is source-ordered — compare as
    # (voxel -> first source index) maps.
    pc = make_cloud(rng, 500)
    q = PolarQuantizer([1.0, 0.3, 0.2])
    res = q.quantize(jnp.asarray(pc), jnp.ones(len(pc), dtype=bool), capacity=len(pc))
    coords_np, index_np = quantize_np(q, pc)
    ref = {tuple(c): i for c, i in zip(coords_np, index_np)}
    mask = np.asarray(res.mask)
    got_coords = np.asarray(res.coords_t).T[mask]
    got_index = np.asarray(res.index)[mask]
    assert len(got_coords) == len(ref)
    for c, i in zip(got_coords, got_index):
        assert ref[tuple(c)] == i  # first source point per voxel


def test_cartesian_quantizer(rng):
    pc = make_cloud(rng, 500)
    q = CartesianQuantizer(0.3)
    res = q.quantize(jnp.asarray(pc), jnp.ones(len(pc), dtype=bool), capacity=len(pc))
    mask = np.asarray(res.mask)
    back = np.asarray(q.dequantize(res.coords_t.T))[mask]
    orig = pc[np.asarray(res.index)[mask]]
    dist = np.linalg.norm(back - orig, axis=1)
    assert dist.max() <= 0.5 * np.sqrt(3) * 0.3 + 1e-5


def test_keypoint_position_at_center_offset_zero():
    # With offset 0, keypoint = center of the CORNER fine voxel of the supervoxel
    # (reference semantics: (coords + 0.5) * step, coords being multiples of stride).
    q = CartesianQuantizer(0.2)
    coords = jnp.asarray([[8, 8, 8]], dtype=jnp.int32)  # stride-8 supervoxel corner
    kp = np.asarray(q.keypoint_position(coords, 8, jnp.zeros((1, 3))))
    np.testing.assert_allclose(kp, [[8.5 * 0.2] * 3], atol=1e-6)
    # offset 1 moves by stride*step/2
    kp2 = np.asarray(q.keypoint_position(coords, 8, jnp.ones((1, 3))))
    np.testing.assert_allclose(kp2 - kp, [[0.5 * 8 * 0.2] * 3], atol=1e-6)


def test_polar_keypoint_position_matches_dequantize():
    q = PolarQuantizer([1.0, 0.3, 0.2])
    coords = jnp.asarray([[16, 32, -8]], dtype=jnp.int32)
    kp = np.asarray(q.keypoint_position(coords, 8, jnp.zeros((1, 3))))
    deq = np.asarray(q.dequantize(coords))
    np.testing.assert_allclose(kp, deq, atol=1e-6)


def test_negative_z_floor_semantics():
    q = CartesianQuantizer(1.0)
    pc = jnp.asarray([[-0.5, -1.5, -2.5]], dtype=jnp.float32)
    res = q.quantize(pc, jnp.ones(1, dtype=bool), capacity=4)
    np.testing.assert_array_equal(np.asarray(res.coords_t)[:, 0], [-1, -2, -3])
