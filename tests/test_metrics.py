"""Correctness of the native metric implementations (PQ / mIoU / AP)."""

import numpy as np

from uni_encoder_tpu.evaluation.metrics import APAccumulator, ConfusionMatrix, PQStat


def test_miou_perfect_and_partial():
    cm = ConfusionMatrix(3)
    gt = np.array([[0, 0, 1], [1, 2, 255]])
    cm.update(gt, gt)
    miou, iou = cm.miou()
    assert miou == 1.0

    cm2 = ConfusionMatrix(2)
    gt = np.array([0, 0, 1, 1])
    pred = np.array([0, 1, 1, 1])
    cm2.update(gt, pred)
    # class 0: inter 1, union 2 -> 0.5 ; class 1: inter 2, union 3 -> 2/3
    _, iou = cm2.miou()
    np.testing.assert_allclose(iou, [0.5, 2 / 3])


def test_pq_perfect_match():
    stat = PQStat(3)
    seg = np.zeros((8, 8), np.int64)
    seg[:4] = 1
    seg[4:] = 2
    info = [
        {"id": 1, "category_id": 0, "isthing": False},
        {"id": 2, "category_id": 1, "isthing": True},
    ]
    gt_info = [
        {"id": 1, "category_id": 0, "iscrowd": 0},
        {"id": 2, "category_id": 1, "iscrowd": 0},
    ]
    stat.update(seg, info, seg, gt_info)
    res = stat.summarize([1], [0])
    assert res["PQ"] == 100.0 and res["SQ"] == 100.0 and res["RQ"] == 100.0


def test_pq_false_positive_and_negative():
    stat = PQStat(2)
    gt = np.zeros((4, 4), np.int64)
    gt[:2] = 1  # one GT segment of class 0
    pred = np.zeros((4, 4), np.int64)
    pred[2:] = 5  # one predicted segment of class 0 — IoU 0 with GT
    stat.update(
        pred, [{"id": 5, "category_id": 0, "isthing": True}],
        gt, [{"id": 1, "category_id": 0, "iscrowd": 0}],
    )
    res = stat.summarize([0], [])
    # TP=0, FP=1, FN=1 -> PQ 0
    assert res["PQ"] == 0.0


def test_pq_void_heavy_prediction_not_fp():
    stat = PQStat(2)
    gt = np.zeros((4, 4), np.int64)  # all void
    pred = np.zeros((4, 4), np.int64)
    pred[:] = 7
    stat.update(pred, [{"id": 7, "category_id": 0, "isthing": True}], gt, [])
    assert stat.fp[0] == 0  # >50% void overlap: ignored


def test_ap_perfect():
    acc = APAccumulator(2)
    m1 = np.zeros((8, 8), bool); m1[:4, :4] = True
    m2 = np.zeros((8, 8), bool); m2[4:, 4:] = True
    acc.update([m1, m2], np.array([0, 1]), np.array([0.9, 0.8]),
               [m1, m2], np.array([0, 1]), np.array([False, False]))
    res = acc.summarize()
    assert res["AP"] == 100.0 and res["AP50"] == 100.0


def test_ap_half_iou():
    acc = APAccumulator(1)
    gt = np.zeros((8, 8), bool); gt[:, :4] = True
    pred = np.zeros((8, 8), bool); pred[:, 2:6] = True  # IoU = 16/48 = 1/3
    acc.update([pred], np.array([0]), np.array([0.9]), [gt], np.array([0]), np.array([False]))
    res = acc.summarize()
    assert res["AP50"] == 0.0  # below 0.5 IoU


def test_ap_crowd_ignored():
    acc = APAccumulator(1)
    gt = np.ones((8, 8), bool)
    pred = np.ones((8, 8), bool)
    acc.update([pred], np.array([0]), np.array([0.9]), [gt], np.array([0]), np.array([True]))
    res = acc.summarize()
    # only crowd GT: no countable GT -> class skipped entirely
    assert res["AP"] == 0.0 and acc.n_gt[0] == 0


def test_exact_ap_sweep_hand_computed():
    """Exact (non-interpolated) PR sweep: 2 GT, preds = [perfect match at
    score .9, miss at score .8] => AP = 0.5*1.0 + 0*0.5 = 50.0 at every IoU
    threshold; GT-as-prediction scores 100."""
    import numpy as np

    from uni_encoder_tpu.evaluation.metrics import APAccumulator

    g1 = np.zeros((16, 16), bool); g1[0:4, 0:4] = True
    g2 = np.zeros((16, 16), bool); g2[8:12, 8:12] = True
    p_miss = np.zeros((16, 16), bool); p_miss[12:16, 0:4] = True

    acc = APAccumulator(1, interpolation="exact")
    acc.update([g1.copy(), p_miss], np.array([0, 0]), np.array([0.9, 0.8]),
               [g1, g2], np.array([0, 0]), np.array([False, False]))
    out = acc.summarize()
    assert abs(out["AP"] - 50.0) < 1e-9, out
    assert abs(out["AP50"] - 50.0) < 1e-9, out

    acc2 = APAccumulator(1, interpolation="exact")
    acc2.update([g1.copy(), g2.copy()], np.array([0, 0]), np.array([0.9, 0.8]),
                [g1, g2], np.array([0, 0]), np.array([False, False]))
    out2 = acc2.summarize()
    assert abs(out2["AP"] - 100.0) < 1e-9, out2
