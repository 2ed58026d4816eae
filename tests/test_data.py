"""Data-layer tests: PCD reader (binary + LZF-compressed), native LZF codec,
augmentation semantics, sampler, synthetic dataset, batch assembly."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from egonn_tpu.data.pcd import read_pcd_xyz, write_pcd_binary, write_pcd_binary_compressed
from egonn_tpu.data.pipeline import make_global_batch, pad_cloud, round_to_bucket
from egonn_tpu.data.samplers import BatchSampler
from egonn_tpu.data.synthetic import generate_synthetic_dataset
from egonn_tpu.utils.native import _lzf_decompress_py, lzf_compress_py, lzf_decompress


def test_lzf_roundtrip_native_and_python(rng):
    data = rng.integers(0, 256, 10000).astype(np.uint8).tobytes()
    comp = lzf_compress_py(data)
    assert lzf_decompress(comp, len(data)) == data          # native C++ (or fallback)
    assert _lzf_decompress_py(comp, len(data)) == data      # pure python


def test_lzf_decodes_backreferences():
    # A stream with a real back-reference: literal "abc" then copy 5 bytes from
    # offset 3 back => "abcabcab".
    stream = bytes([0x02, ord("a"), ord("b"), ord("c")])  # literal run of 3
    # ctrl: len=3 -> (len-2)=3 -> ctrl byte (3<<5)|0 then offset byte 2 (ref = out-1-2)
    stream += bytes([(3 << 5) | 0, 2])
    out = lzf_decompress(stream, 8)
    assert out == b"abcabcab"


def test_pcd_binary_and_compressed(tmp_path, rng):
    xyz = rng.standard_normal((500, 3)).astype(np.float32)
    p1 = os.path.join(tmp_path, "a.pcd")
    p2 = os.path.join(tmp_path, "b.pcd")
    write_pcd_binary(p1, xyz)
    write_pcd_binary_compressed(p2, xyz)
    np.testing.assert_allclose(read_pcd_xyz(p1), xyz, atol=0)
    np.testing.assert_allclose(read_pcd_xyz(p2), xyz, atol=0)


def test_pad_cloud(rng):
    pc = rng.standard_normal((10, 3)).astype(np.float32)
    out, mask = pad_cloud(pc, 16)
    assert mask.sum() == 10 and (out[10:] == 0).all()
    out2, mask2 = pad_cloud(np.tile(pc, (3, 1)), 16)
    assert mask2.all() and out2.shape == (16, 3)


def test_round_to_bucket():
    assert round_to_bucket(30, [32, 44, 61]) == 32
    assert round_to_bucket(45, [32, 44, 61]) == 61
    assert round_to_bucket(100, [32, 44, 61]) == 61


def test_synthetic_dataset_and_sampler(tmp_path):
    root = str(tmp_path)
    # extent shrunk so consecutive scans (~perimeter/n apart) fall within the
    # 10 m positive radius
    train, val, ev = generate_synthetic_dataset(root, n_scans=32, extent=60.0,
                                                max_points=2048)
    from egonn_tpu.data.base import TrainingDataset

    ds = TrainingDataset(root, "synthetic", train)
    assert len(ds) > 0
    pc, ndx = ds[0]
    assert pc.shape[1] == 3

    sampler = BatchSampler(ds, batch_size=8, seed=0)
    batches = list(sampler)
    assert batches, "sampler yielded no batches"
    for b in batches:
        assert len(b) % 2 == 0 and len(b) >= 4
        # consecutive pairs are (anchor, positive)
        for i in range(0, len(b), 2):
            assert b[i + 1] in ds.queries[b[i]].positives or \
                b[i] in ds.queries[b[i + 1]].positives

    g = make_global_batch(ds, batches[0], num_points=2048, buckets=[8, 16])
    assert g.clouds.shape[0] in (8, 16)
    assert g.positives_mask.any() and g.negatives_mask.any()
    assert not g.positives_mask.diagonal().any()  # self is not its own positive


def test_augmentation_semantics(rng):
    from egonn_tpu.data.augmentation import (
        random_flip,
        random_rotation_z,
        remove_random_block,
        remove_random_points,
        train_set_transform,
    )

    key = jax.random.PRNGKey(0)
    pc = jnp.asarray(rng.standard_normal((256, 3)).astype(np.float32) * 10)

    # z-rotation preserves z and radii
    out = random_rotation_z(key, pc, 180.0)
    np.testing.assert_allclose(np.asarray(out[:, 2]), np.asarray(pc[:, 2]), atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(out[:, :2]), axis=1),
        np.linalg.norm(np.asarray(pc[:, :2]), axis=1), rtol=1e-4, atol=1e-4,
    )

    # removals ZERO coordinates (reference semantics), never change the count
    out = remove_random_points(key, pc, 0.5, 0.5)
    zeroed = np.all(np.asarray(out) == 0, axis=1)
    assert 0.3 < zeroed.mean() < 0.7
    out = remove_random_block(jax.random.PRNGKey(3), pc, jnp.ones(256, bool), p=1.0)
    assert out.shape == pc.shape

    # flip touches at most one axis sign
    out = np.asarray(random_flip(jax.random.PRNGKey(1), pc))
    flipped = [not np.allclose(out[:, i], np.asarray(pc)[:, i]) for i in range(3)]
    assert sum(flipped) <= 1 and not flipped[2]

    # set transform applies the SAME flip to every cloud in the batch
    batch = jnp.stack([pc, pc])
    out = np.asarray(train_set_transform(jax.random.PRNGKey(2), batch, aug_mode=2))
    np.testing.assert_allclose(out[0], out[1], atol=0)
