"""Trainer utility tests: expansion buckets, LR schedules, sampler expansion,
evaluator recall protocol on synthetic embeddings."""
import numpy as np

from egonn_tpu.train.trainer import expansion_buckets


def test_expansion_buckets_reference_schedule():
    # reference schedule: batch 32, limit 128, rate 1.4 (int truncation each step)
    assert expansion_buckets(32, 128, 1.4) == [32, 44, 61, 85, 118, 128]
    assert expansion_buckets(64, 64, None) == [64]


def test_lr_schedules():
    from egonn_tpu.train.state import make_lr_schedule

    class P:
        scheduler = "MultiStepLR"
        scheduler_milestones = [80]
        lr = 1e-3
        epochs = 160

    s = make_lr_schedule(P())
    assert abs(float(s(0)) - 1e-3) < 1e-9
    assert abs(float(s(100)) - 1e-4) < 1e-9

    class P2:
        scheduler = "CosineAnnealingLR"
        lr = 1e-3
        min_lr = 1e-5
        epochs = 100

    s2 = make_lr_schedule(P2())
    assert abs(float(s2(0)) - 1e-3) < 1e-9
    assert float(s2(100)) < 1.2e-4


def test_sampler_expand():
    from egonn_tpu.data.samplers import BatchSampler

    class DS:
        queries = {i: None for i in range(100)}

        def get_positives(self, i):
            return [j for j in (i - 1, i + 1) if 0 <= j < 100]

    s = BatchSampler(DS(), batch_size=32, batch_size_limit=128,
                     batch_expansion_rate=1.4, seed=0)
    sizes = [s.batch_size]
    for _ in range(10):
        s.expand_batch()
        sizes.append(s.batch_size)
    assert max(sizes) == 128
    assert sizes[:6] == [32, 44, 61, 85, 118, 128]


def test_recall_protocol_synthetic_embeddings(tmp_path, rng):
    """Recall@N on embeddings engineered so query i's nearest map embedding is a
    known distance away geographically."""
    import pickle

    from egonn_tpu.data.base import EvaluationSet, EvaluationTuple
    from egonn_tpu.eval.evaluator import Evaluator

    n = 20
    map_pos = np.stack([np.arange(n) * 10.0, np.zeros(n)], 1).astype(np.float32)
    # queries colocated with map elements
    query_pos = map_pos + np.array([1.0, 0.0], np.float32)

    map_set = [EvaluationTuple(i, f"m{i}", map_pos[i], np.eye(4)) for i in range(n)]
    query_set = [EvaluationTuple(i, f"q{i}", query_pos[i], np.eye(4)) for i in range(n)]
    es = EvaluationSet(query_set, map_set)
    es.save(str(tmp_path / "es.pickle"))

    ev = Evaluator.__new__(Evaluator)
    ev.eval_set = es
    ev.radius = (5, 20)
    ev.k = 10

    # perfect embeddings: query i closest to map i
    emb_map = np.eye(n, 8, dtype=np.float64) if n <= 8 else rng.standard_normal((n, 8))
    emb_map = rng.standard_normal((n, 8))
    emb_query = emb_map + rng.normal(0, 1e-3, emb_map.shape)
    m = ev.compute_recall(emb_map, emb_query)
    assert m["recall"][5][0] == 1.0  # top-1 is the colocated element (1 m away)

    # adversarial embeddings: query i retrieves map (i+10) % n, which is >= 50 m off
    emb_query_bad = np.roll(emb_map, 10, axis=0)
    m2 = ev.compute_recall(emb_map, emb_query_bad)
    assert m2["recall"][5][0] == 0.0
    assert m2["recall"][20][0] == 0.0


def test_visualize_helpers(tmp_path):
    """Headless render smoke test (reference misc/point_clouds.py:8-28)."""
    import numpy as np

    from egonn_tpu.utils.visualize import draw_pc, draw_registration_result

    rng = np.random.default_rng(0)
    pc1 = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    pc2 = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    t = np.eye(4, dtype=np.float32)
    p1 = draw_pc(pc1, out_path=str(tmp_path / "pc.png"))
    p2 = draw_registration_result(pc1, pc2, t,
                                  out_path=str(tmp_path / "reg.png"),
                                  keypoints=pc1[:10])
    import os

    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0
