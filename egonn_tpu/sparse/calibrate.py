"""Band-width calibration for the banded sparse engine.

The banded kernels (sparse/banded.py) compare each output tile's queries
against a fixed-width window of the sorted voxel table.  The shipped widths
(256 self / 1024 down / 384 zrun-lookup) were sized from synthetic LiDAR
probes; denser clouds can exceed them, in which case out-of-window neighbors
are dropped (drop-and-report policy — correct but lossy, surfaced by the
band_ok flags at train/eval/bench).

This module closes that loop: measure the width each banded kernel ACTUALLY
needs on a sample of real data, add a safety margin, and install the result
as a calibration table (banded.set_band_calibration / EGONN_BAND_CALIB json)
that every kernel and every band-fit audit then uses.  The intended flow —
cached per dataset + config, mirroring how the reference sizes nothing
because MinkowskiEngine's hash maps are unbounded:

    table = calibrate_from_clouds(clouds, masks, quantizer, spec)   # once
    save_calibration(table, path)                                    # cache
    EGONN_BAND_CALIB=path python train.py / evaluate.py ...          # use

Requirement semantics mirror the fit flags exactly:
* conv bands (band_layout_union): fit iff hi - 16-aligned(lo) < sub, so the
  required width is max(hi - aligned_lo) + 1 over valid (batch, offset, tile)
  cells, for the forward AND offset-reversed (backward) maps.
* zrun / lookup bands (_band_prepass): fit iff (row_last - row_first) *
  stride + stride <= sub, so the requirement is the max of that expression.
"""
from __future__ import annotations

import json
from typing import Dict, Iterable

import jax
import jax.numpy as jnp

from egonn_tpu.sparse.banded import DEFAULT_STRIDE, DEFAULT_TILE


def _conv_requirement(kmap: jnp.ndarray, c_in: int, tile: int = DEFAULT_TILE
                      ) -> jnp.ndarray:
    """Required conv sub-width for this kernel map: the smallest `sub` for
    which band_layout_union reports ok (ignoring the end-of-table clip, which
    only ever relaxes the requirement)."""
    b, k, c_out = kmap.shape
    if c_out % tile != 0:
        return jnp.int32(0)  # banded path unused at this shape
    km = kmap.reshape(b, k, c_out // tile, tile)
    valid = km < c_in
    big = jnp.int32(2**30)
    lo = jnp.min(jnp.where(valid, km, big), axis=-1)
    hi = jnp.max(jnp.where(valid, km, -1), axis=-1)
    any_k = jnp.any(valid, axis=-1)
    start = (lo // 16) * 16
    return jnp.max(jnp.where(any_k, hi - start + 1, 0)).astype(jnp.int32)


def _prepass_requirement(sorted_keys: jnp.ndarray, q_first: jnp.ndarray,
                         q_last: jnp.ndarray, any_valid: jnp.ndarray,
                         stride: int = DEFAULT_STRIDE) -> jnp.ndarray:
    """Required zrun/lookup compare width under _band_prepass semantics."""
    boundaries = sorted_keys[:, ::stride]
    r = boundaries.shape[1]
    cnt_first = jnp.sum(boundaries[:, None, None, :] <= q_first[..., None],
                        axis=-1).astype(jnp.int32)
    cnt_last = jnp.sum(boundaries[:, None, None, :] <= q_last[..., None],
                       axis=-1).astype(jnp.int32)
    row_first = jnp.clip(cnt_first - 1, 0, r - 1)
    row_last = jnp.clip(cnt_last - 1, 0, r - 1)
    req = (row_last - row_first) * stride + stride
    return jnp.max(jnp.where(any_valid, req, 0)).astype(jnp.int32)


def _zrun_requirement(sorted_keys: jnp.ndarray, q_lo: jnp.ndarray, kz: int,
                      tile: int = DEFAULT_TILE) -> jnp.ndarray:
    b, c_in = sorted_keys.shape
    _, kxy, c_out = q_lo.shape
    if c_out % tile != 0:
        return jnp.int32(0)
    maxkey = jnp.int32(2**31 - 1)
    q4 = q_lo.reshape(b, kxy, c_out // tile, tile)
    valid = q4 != maxkey
    q_first = jnp.min(jnp.where(valid, q4, maxkey), axis=-1)
    q_last = jnp.max(jnp.where(valid, q4 + (kz - 1), -1), axis=-1)
    any_valid = jnp.any(valid, axis=-1)
    return _prepass_requirement(sorted_keys, q_first, q_last, any_valid)


def _tdown_requirement(up_parent: jnp.ndarray, c_coarse: int,
                       tile: int = DEFAULT_TILE) -> jnp.ndarray:
    """Required window for the transposed down conv: the widest per-coarse-tile
    up-map hull, measured exactly as banded.tdown_layout lays windows out
    (cummax/revcummin hull, 128-aligned starts)."""
    if c_coarse % tile != 0 or up_parent.shape[1] % 128 != 0:
        return jnp.int32(0)  # banded tdown unused at this shape
    valid = up_parent < c_coarse
    lo = jnp.where(valid, up_parent, -1)
    m = jax.lax.cummax(lo, axis=1)
    hi = jnp.where(valid, up_parent, jnp.int32(2**30))
    rm = jnp.flip(jax.lax.cummin(jnp.flip(hi, 1), axis=1), 1)
    t = c_coarse // tile
    bounds = jnp.arange(t, dtype=jnp.int32) * tile
    first = jnp.sum(m[:, :, None] < bounds[None, None, :], axis=1,
                    dtype=jnp.int32)
    end = jnp.sum(rm[:, :, None] < (bounds + tile)[None, None, :], axis=1,
                  dtype=jnp.int32)
    return jnp.max(end - (first // 128) * 128)


def band_requirements_traced(pyramid, spec) -> Dict[str, jnp.ndarray]:
    """Required band widths for every banded kernel a forward/backward pass
    runs on this pyramid — the same enumeration as banded.band_fit_report,
    but returning the needed width instead of an ok flag at the current one.
    Keys are calibration-table keys (banded._calibrated)."""
    from egonn_tpu.sparse.packing import pack_keys
    from egonn_tpu.sparse.pyramid import _xy_offsets, _zrun_queries

    req: Dict[str, jnp.ndarray] = {}

    def _acc(key, value):
        req[key] = jnp.maximum(req[key], value) if key in req else value

    for l in range(spec.num_levels + 1):
        lvl = pyramid[l]
        if lvl.kmap_self is not None and not (l == 0 and spec.conv0_ones):
            cs = spec.capacities[l]
            _acc(f"conv:{cs}:{cs}",
                 jnp.maximum(_conv_requirement(lvl.kmap_self, cs),
                             _conv_requirement(lvl.kmap_self[:, ::-1, :], cs)))
        if lvl.kmap_down is not None:
            cd = spec.capacities[l - 1]
            _acc(f"conv:{cd}:{spec.capacities[l]}",
                 _conv_requirement(lvl.kmap_down, cd))
            # transposed down conv window (banded_tdown_pallas): the up-map
            # hull per coarse tile, with the kernel's 128-aligned starts
            _acc(f"tdown:{cd}:{spec.capacities[l]}",
                 _tdown_requirement(pyramid[l - 1].up_parent,
                                    spec.capacities[l]))
        # zrun requirements are computed regardless of whether THIS platform
        # uses the banded lookup (it is TPU-only): a table calibrated on CPU
        # must still carry the zrun widths the TPU run will need
        if lvl.kmap_self is not None \
                and spec.capacities[l] % 128 == 0:
            k = spec.conv0_kernel_size if l == 0 else spec.block_kernel_size
            pack_l = spec.pack_at(l)
            keys_l = jax.vmap(lambda c, m: pack_keys(c, m, pack_l))(
                lvl.coords, lvl.mask)
            q_lo, _, _ = jax.vmap(
                lambda c, m: _zrun_queries(c, m, _xy_offsets(k), k, -(k // 2),
                                           pack_l)
            )(lvl.coords, lvl.mask)
            _acc(f"zrun:{spec.capacities[l]}:{k}",
                 _zrun_requirement(keys_l, q_lo, kz=k))
    return req


def finalize_table(measured: Dict[str, int], margin: float = 1.25,
                   quantum: int = 128) -> Dict[str, int]:
    """Measured requirements -> installable calibration table: apply the
    safety margin (density can exceed the calibration sample's), round up to
    the lane quantum, and floor at one window stride.  Entries whose sample
    never exercised the kernel (requirement 0) are omitted."""
    table = {}
    for key, req in measured.items():
        req = int(req)
        if req <= 0:
            continue
        width = max(int(req * margin), DEFAULT_STRIDE)
        width = -(-width // quantum) * quantum
        table[key] = width
    return table


def calibrate_from_pyramids(pyramids: Iterable, spec, margin: float = 1.25
                            ) -> Dict[str, int]:
    """Max the measured requirements over a sample of built pyramids."""
    req_fn = jax.jit(lambda p: band_requirements_traced(p, spec))
    measured: Dict[str, int] = {}
    for pyr in pyramids:
        for key, val in jax.device_get(req_fn(pyr)).items():
            measured[key] = max(measured.get(key, 0), int(val))
    return finalize_table(measured, margin=margin)


def calibrate_from_clouds(clouds, masks, quantizer, spec, margin: float = 1.25,
                          batch: int = 8, aug_mode: int | None = None,
                          aug_seeds: int = 4) -> Dict[str, int]:
    """clouds (N, P, 3) float32 + masks (N, P) bool -> calibration table.

    aug_mode: when set, band requirements are measured on DEVICE-AUGMENTED
    pyramids — `aug_seeds` independent augmentation draws per batch through
    the training preprocess (data/pipeline.py device_preprocess_global), plus
    one un-augmented pass.  Training calibration must use this: device-side
    jitter/rotation/translation is precisely what widened bands past the
    un-augmented measurement in the past (round-3 L2-L4 silent overflow,
    PERFORMANCE.md band-overflow section)."""
    import numpy as np

    from egonn_tpu.sparse.pyramid import build_pyramid

    def mk(c, m):
        res = jax.vmap(lambda pc, mm: quantizer.quantize(
            pc, mm, spec.capacities[0], need_index=False))(c, m)
        return build_pyramid(res.coords_t, res.mask, spec, keys0=res.keys)

    mk_j = jax.jit(mk)
    n = clouds.shape[0]
    # pad the tail slice by repetition so every batch compiles to one shape
    idx = [np.minimum(np.arange(i, i + batch), n - 1)
           for i in range(0, n, batch)]

    def pyramids():
        for ii in idx:
            c = jnp.asarray(clouds[ii])
            m = jnp.asarray(masks[ii])
            yield mk_j(c, m)
            if aug_mode is not None:
                from egonn_tpu.data.pipeline import device_preprocess_global

                aug_j = jax.jit(lambda cc, mm, k: device_preprocess_global(
                    cc, mm, quantizer, spec, rng_key=k, aug_mode=aug_mode))
                for s in range(aug_seeds):
                    yield aug_j(c, m, jax.random.PRNGKey(s))

    return calibrate_from_pyramids(pyramids(), spec, margin=margin)


def calibrate_capacities(clouds, masks, quantizer, spec, margin: float = 1.15,
                         batch: int = 8, quantum: int = 128,
                         floor: int = 256, max_rounds: int = 4) -> tuple:
    """Fit the per-level capacity table to measured occupancy: the smallest
    margin-padded, `quantum`-rounded capacities covering every level's TRUE
    unique-voxel count (Level.n_unique counts beyond-capacity voxels too) on
    the sample.  Level 0 keeps spec.capacities[0] — it is the workload/memory
    budget, not a fit.  Returns a new capacities tuple for PyramidSpec;
    oversized levels shrink (the deep EgoNN levels measure 1-30% occupancy on
    LiDAR — everything capacity-proportional speeds up) and undersized ones
    grow (no more silent truncation).

    A level measured below a TRUNCATING level sees only the truncated set and
    undercounts, so the fit iterates: measure under the current capacities,
    install the fitted ones, re-measure, until the table is stable (at most
    `max_rounds` compiles — offline, cached by the auto-calibration flow)."""
    import numpy as np
    from dataclasses import replace

    from egonn_tpu.sparse.pyramid import build_pyramid

    n = clouds.shape[0]
    idx = [np.minimum(np.arange(i, i + batch), n - 1)
           for i in range(0, n, batch)]
    cur = spec
    for _ in range(max_rounds):
        def occ(c, m, cur=cur):
            res = jax.vmap(lambda pc, mm: quantizer.quantize(
                pc, mm, cur.capacities[0], need_index=False))(c, m)
            pyr = build_pyramid(res.coords_t, res.mask, cur, keys0=res.keys,
                                n_unique0=res.n_unique)
            return [jnp.max(pyr[l].n_unique) for l in range(cur.num_levels + 1)]

        occ_j = jax.jit(occ)
        worst = [0] * (cur.num_levels + 1)
        for ii in idx:
            for l, v in enumerate(jax.device_get(
                    occ_j(jnp.asarray(clouds[ii]), jnp.asarray(masks[ii])))):
                worst[l] = max(worst[l], int(v))
        caps = [spec.capacities[0]]
        for l in range(1, cur.num_levels + 1):
            c = max(floor, -(-int(worst[l] * margin) // quantum) * quantum)
            caps.append(min(c, spec.capacities[0]))
        caps = tuple(caps)
        if caps == cur.capacities:
            break
        cur = replace(cur, capacities=caps)
    return cur.capacities


def save_calibration(table: Dict[str, int], path: str) -> None:
    with open(path, "w") as f:
        json.dump(table, f, indent=1, sort_keys=True)


def load_calibration(path: str) -> Dict[str, int]:
    with open(path) as f:
        return {str(k): int(v) for k, v in json.load(f).items()}


def auto_calibrate_cached(ident_obj, load_sample_fn, quantizer, spec,
                          margin: float = 1.25, batch: int = 8,
                          aug_mode: int | None = None) -> bool:
    """Install a calibration table for this process: from the per-config disk
    cache (~/.cache/egonn_tpu) when present, else by measuring a fresh sample
    (load_sample_fn() -> (clouds, masks) numpy arrays) and caching the result.

    Shared by the Evaluator and the trainer so every entry point gets the same
    calibrate-once-per-dataset flow.  A table already installed (e.g. via
    EGONN_BAND_CALIB) wins.  Returns True when a table is installed."""
    import hashlib
    import os

    from egonn_tpu.sparse import banded

    if banded.get_band_calibration():
        return True
    ident = json.dumps(ident_obj, sort_keys=True, default=str)
    cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "egonn_tpu")
    cache = os.path.join(
        cache_dir, f"bands_{hashlib.sha1(ident.encode()).hexdigest()[:16]}.json")
    if os.path.exists(cache):
        banded.set_band_calibration(load_calibration(cache))
        print(f"band calibration loaded from {cache}")
        return True
    clouds, masks = load_sample_fn()
    table = calibrate_from_clouds(clouds, masks, quantizer, spec,
                                  margin=margin, batch=min(batch, len(clouds)),
                                  aug_mode=aug_mode)
    banded.set_band_calibration(table)
    os.makedirs(cache_dir, exist_ok=True)
    save_calibration(table, cache)
    print(f"band widths calibrated on {len(clouds)} scans -> {cache}")
    return True
