"""The realistic LiDAR simulator (data/lidar_sim.py) must produce clouds whose
per-level voxel occupancy FITS the default EgoNN capacity table — the property
the bench workload's "65k pts, 16k voxels" label promises (the old uniform
generator put ~65k points in ~65k unique voxels, 4x over cap0, and its
truncated pyramid still overflowed L1/L2 by ~55%)."""
import numpy as np
import pytest

from egonn_tpu.data.lidar_sim import lidar_scan_clouds


def _occupancies(clouds, steps=(1.0, 0.3, 0.2), levels=8):
    x, y, z = clouds[..., 0], clouds[..., 1], clouds[..., 2]
    theta = 180.0 + np.degrees(np.arctan2(y, x))
    r = np.sqrt(x ** 2 + y ** 2)
    c0 = np.stack([np.floor(theta / steps[0]), np.floor(r / steps[1]),
                   np.floor(z / steps[2])], -1).astype(np.int64)
    out = []
    for l in range(levels):
        cl = c0 // (2 ** l) if l else c0
        out.append(max(len(np.unique(cl[i], axis=0))
                       for i in range(clouds.shape[0])))
    return out


def test_lidar_clouds_fit_default_capacities():
    caps = (16384, 9856, 6656, 4096, 2560, 1664, 1408, 1024)
    clouds = lidar_scan_clouds(4, 65536, seed=3)
    occ = _occupancies(clouds)
    for l, (o, c) in enumerate(zip(occ, caps)):
        assert o <= c, f"L{l}: occupancy {o} exceeds capacity {c}"
    # the workload must actually be LiDAR-scale, not trivially sparse
    assert occ[0] > 14000, occ[0]
    assert occ[1] > 7000, occ[1]


def test_lidar_clouds_shape_and_range():
    clouds = lidar_scan_clouds(2, 8192, seed=0)
    assert clouds.shape == (2, 8192, 3) and clouds.dtype == np.float32
    r = np.sqrt(clouds[..., 0] ** 2 + clouds[..., 1] ** 2)
    assert float(r.min()) >= 2.0 - 1e-3 and float(r.max()) <= 80.0 + 1e-3
    # different seeds -> different scans
    other = lidar_scan_clouds(2, 8192, seed=1)
    assert not np.allclose(clouds, other)


@pytest.mark.slow  # iterated-fit compiles (suite-time budget)
def test_calibrate_capacities_fits_and_shrinks():
    """calibrate_capacities covers measured occupancy with margin and shrinks
    grossly oversized deep levels (the slack everything capacity-proportional
    pays for)."""
    import jax.numpy as jnp

    from egonn_tpu.ops.quantization import PolarQuantizer
    from egonn_tpu.sparse.calibrate import calibrate_capacities
    from egonn_tpu.sparse.pyramid import egonn_pyramid_spec

    q = PolarQuantizer([1.0, 0.3, 0.2])
    spec = egonn_pyramid_spec(cap0=2048, num_levels=4)
    clouds = lidar_scan_clouds(4, 8192, seed=0)
    masks = np.ones(clouds.shape[:2], bool)
    caps = calibrate_capacities(jnp.asarray(clouds), jnp.asarray(masks), q,
                                spec, margin=1.15)
    assert caps[0] == spec.capacities[0]  # level 0 is the budget, not a fit
    assert all(c % 128 == 0 or c == spec.capacities[0] for c in caps)
    occ = _occupancies(clouds, levels=5)
    # L0 may overflow the small test budget; fitted levels measure the
    # TRUNCATED pyramid, so compare against a rebuild under the fitted spec
    from dataclasses import replace
    import jax

    from egonn_tpu.sparse.pyramid import build_pyramid, capacity_report

    spec2 = replace(spec, capacities=caps)

    def mk(c, m):
        res = jax.vmap(lambda pc, mm: q.quantize(
            pc, mm, spec2.capacities[0], need_index=False))(c, m)
        return build_pyramid(res.coords_t, res.mask, spec2, keys0=res.keys,
                             n_unique0=res.n_unique)

    rep = capacity_report(
        jax.jit(mk)(jnp.asarray(clouds), jnp.asarray(masks)), spec2)
    for l in range(1, 5):
        assert rep[f"cap_L{l}"][2], (l, rep)
    del occ
