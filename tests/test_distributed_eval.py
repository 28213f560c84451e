"""Multi-host evaluator state merging: sharded accumulation + merge must
equal single-evaluator accumulation (the reference gathers per-rank state
via comm.gather, model/evaluation/cityscapes_evaluation.py evaluate())."""

import numpy as np

from uni_encoder_tpu.evaluation.evaluator import allgather_object
from uni_encoder_tpu.evaluation.metrics import APAccumulator, ConfusionMatrix, PQStat


def test_allgather_object_single_process():
    assert allgather_object({"a": [1, 2]}) == [{"a": [1, 2]}]


def test_confusion_matrix_merge():
    rng = np.random.RandomState(0)
    gts = [rng.randint(0, 19, (16, 16)).astype(np.uint8) for _ in range(6)]
    preds = [rng.randint(0, 19, (16, 16)).astype(np.uint8) for _ in range(6)]

    full = ConfusionMatrix(19)
    for g, p in zip(gts, preds):
        full.update(g, p)

    shard_a, shard_b = ConfusionMatrix(19), ConfusionMatrix(19)
    for g, p in zip(gts[:3], preds[:3]):
        shard_a.update(g, p)
    for g, p in zip(gts[3:], preds[3:]):
        shard_b.update(g, p)
    shard_a.merge(shard_b)
    np.testing.assert_array_equal(shard_a.mat, full.mat)
    assert shard_a.miou()[0] == full.miou()[0]


def test_pqstat_merge():
    a, b = PQStat(5), PQStat(5)
    a.tp[1], a.fp[2], a.fn[3], a.iou[1] = 3, 1, 2, 2.5
    b.tp[1], b.fp[2], b.fn[4], b.iou[1] = 1, 2, 1, 0.5
    a.merge(b)
    assert a.tp[1] == 4 and a.fp[2] == 3 and a.fn[3] == 2 and a.fn[4] == 1
    assert a.iou[1] == 3.0


def _random_instances(rng, n, h=24, w=24, k=3):
    masks = [rng.rand(h, w) > 0.6 for _ in range(n)]
    classes = rng.randint(0, k, n)
    scores = rng.rand(n)
    return masks, classes, scores


def test_ap_accumulator_merge_equals_joint():
    rng = np.random.RandomState(1)
    images = []
    for _ in range(4):
        pm, pc, ps = _random_instances(rng, 5)
        gm, gc, _ = _random_instances(rng, 4)
        crowd = rng.rand(4) > 0.8
        images.append((pm, pc, ps, gm, gc, crowd))

    full = APAccumulator(3)
    for pm, pc, ps, gm, gc, crowd in images:
        full.update(pm, pc, ps, gm, gc, crowd)

    shards = [APAccumulator(3), APAccumulator(3)]
    for i, (pm, pc, ps, gm, gc, crowd) in enumerate(images):
        shards[i % 2].update(pm, pc, ps, gm, gc, crowd)
    shards[0].merge(shards[1])

    assert shards[0].summarize() == full.summarize()


def test_dataset_evaluator_merge_state_protocol():
    """The evaluator-level state()/merge_state() round-trip, exercised with
    the depth evaluator (list-of-metrics state, no file IO needed)."""
    from uni_encoder_tpu.evaluation.cityscapes import CityscapesDepthEvaluator

    full = CityscapesDepthEvaluator("d")
    full.reset()
    rng = np.random.RandomState(2)
    ms = [rng.rand(7) for _ in range(6)]
    full.metrics = list(ms)

    a, b = CityscapesDepthEvaluator("d"), CityscapesDepthEvaluator("d")
    a.reset(), b.reset()
    a.metrics, b.metrics = list(ms[:2]), list(ms[2:])
    a.merge_state([a.state(), b.state()])
    # merge_state replaces with the union of shard states
    np.testing.assert_allclose(np.stack(a.metrics), np.stack(ms))
    assert a.evaluate() == full.evaluate()


def test_allgather_transport_roundtrip():
    """Exercise the pickle -> pad -> stack -> unpickle transport itself with
    an injected fake collective simulating 3 processes with different-size
    payloads (the real multihost path uses the same code with
    process_allgather injected)."""
    import numpy as np

    from uni_encoder_tpu.evaluation.evaluator import allgather_object

    payloads = [
        {"rank": 0, "data": list(range(100))},
        {"rank": 1, "data": "short"},
        {"rank": 2, "data": np.arange(7.0)},
    ]
    from uni_encoder_tpu.evaluation.evaluator import _pack_object, _pad_to

    packed = [_pack_object(p) for p in payloads]
    max_size = max(p.size for p in packed)

    calls = {"n": 0}

    def fake_allgather(local):
        # emulate each process contributing its own row
        calls["n"] += 1
        if local.dtype == np.int64:  # size exchange
            return np.stack([np.asarray([p.size], np.int64) for p in packed])
        assert local.size == max_size
        return np.stack([_pad_to(p, max_size) for p in packed])

    out = allgather_object(payloads[0], _allgather=fake_allgather)
    assert calls["n"] == 2
    assert out[0] == payloads[0]
    assert out[1] == payloads[1]
    np.testing.assert_array_equal(out[2]["data"], payloads[2]["data"])
