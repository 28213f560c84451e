"""Randomized cross-checks of the native scorers against naive brute-force
restatements (VERDICT r2: the only available substitute for the absent
panopticapi/cityscapesscripts in this environment).

Each scorer's matching contract is restated here with plain per-segment
loops over raw masks — no shared code with evaluation/metrics.py — and both
are run over hundreds of random scenes with crowd/void regions, empty
segments, duplicate classes, and degenerate cases.
"""

import numpy as np
import pytest

from uni_encoder_tpu.evaluation.metrics import (
    APAccumulator,
    ConfusionMatrix,
    PQStat,
)

C = 5  # classes


def _random_scene(rng, H=24, W=32, max_segs=8, void_p=0.15):
    """Random (seg_map, info) pair: ids 1..n painted as random rectangles
    over background 0 (void)."""
    seg = np.zeros((H, W), np.int32)
    n = rng.randint(0, max_segs + 1)
    info = []
    for sid in range(1, n + 1):
        y0, x0 = rng.randint(0, H - 1), rng.randint(0, W - 1)
        y1, x1 = rng.randint(y0 + 1, H + 1), rng.randint(x0 + 1, W + 1)
        seg[y0:y1, x0:x1] = sid
        info.append(
            {"id": sid, "category_id": int(rng.randint(0, C)), "iscrowd": int(rng.rand() < 0.25)}
        )
    # later rectangles overwrite earlier ones: drop fully-covered segments'
    # entries with probability 0 (keep them: zero-area segments are a legal
    # edge case the scorer must handle)
    if void_p > 0:
        seg[rng.rand(H, W) < void_p] = 0
    return seg, info


def _pq_brute(pred_seg, pred_info, gt_seg, gt_info, num_classes):
    """Plain panopticapi restatement: per-pair mask IoU with void-corrected
    union, IoU>0.5 matches, crowd gt excluded from matching; unmatched
    non-crowd gt -> FN; unmatched pred -> FP unless >50% covered by void +
    same-class crowd."""
    iou = np.zeros(num_classes)
    tp = np.zeros(num_classes, np.int64)
    fp = np.zeros(num_classes, np.int64)
    fn = np.zeros(num_classes, np.int64)
    void = gt_seg == 0

    matched_g, matched_p = set(), set()
    for g in gt_info:
        if g["iscrowd"]:
            continue
        gm = gt_seg == g["id"]
        for p in pred_info:
            if p["category_id"] != g["category_id"]:
                continue
            pm = pred_seg == p["id"]
            inter = int((gm & pm).sum())
            union = int(gm.sum()) + int(pm.sum()) - inter - int((pm & void).sum())
            v = inter / union if union > 0 else 0.0
            if v > 0.5:
                cat = g["category_id"]
                tp[cat] += 1
                iou[cat] += v
                matched_g.add(g["id"])
                matched_p.add(p["id"])

    for g in gt_info:
        gm_area = int((gt_seg == g["id"]).sum())
        if g["iscrowd"]:
            continue
        if g["id"] not in matched_g and gm_area > 0:
            fn[g["category_id"]] += 1

    for p in pred_info:
        if p["id"] in matched_p:
            continue
        pm = pred_seg == p["id"]
        area = int(pm.sum())
        if area == 0:
            continue
        ignore = pm & void
        for g in gt_info:
            if g["iscrowd"] and g["category_id"] == p["category_id"]:
                ignore = ignore | (pm & (gt_seg == g["id"]))
        if int(ignore.sum()) / area > 0.5:
            continue
        fp[p["category_id"]] += 1
    return iou, tp, fp, fn


@pytest.mark.parametrize("chunk", range(4))
def test_pq_fuzz_vs_bruteforce(chunk):
    rng = np.random.RandomState(100 + chunk)
    for _ in range(60):
        gt_seg, gt_info = _random_scene(rng)
        pred_seg, pred_info = _random_scene(rng, void_p=0.0)
        for p in pred_info:
            p.pop("iscrowd", None)
            p["isthing"] = bool(rng.rand() < 0.5)

        stat = PQStat(C)
        stat.update(pred_seg, pred_info, gt_seg, gt_info)
        iou, tp, fp, fn = _pq_brute(pred_seg, pred_info, gt_seg, gt_info, C)
        np.testing.assert_array_equal(stat.tp, tp)
        np.testing.assert_array_equal(stat.fp, fp)
        np.testing.assert_array_equal(stat.fn, fn)
        np.testing.assert_allclose(stat.iou, iou, atol=1e-12)


def test_pq_merge_equals_single():
    rng = np.random.RandomState(7)
    scenes = []
    for _ in range(8):
        gt_seg, gt_info = _random_scene(rng)
        pred_seg, pred_info = _random_scene(rng, void_p=0.0)
        for p in pred_info:
            p["isthing"] = True
        scenes.append((pred_seg, pred_info, gt_seg, gt_info))
    one = PQStat(C)
    for s in scenes:
        one.update(*s)
    a, b = PQStat(C), PQStat(C)
    for s in scenes[:3]:
        a.update(*s)
    for s in scenes[3:]:
        b.update(*s)
    a.merge(b)
    np.testing.assert_array_equal(one.tp, a.tp)
    np.testing.assert_array_equal(one.fp, a.fp)
    np.testing.assert_array_equal(one.fn, a.fn)
    np.testing.assert_allclose(one.iou, a.iou)
    th, st = [0, 1], [2, 3, 4]
    for k, v in one.summarize(th, st).items():
        assert abs(v - a.summarize(th, st)[k]) < 1e-9


# ---------------------------------------------------------------------- AP
def _ap_brute(images, num_classes, thresholds, n_gt_override=None):
    """Plain restatement of the cityscapesscripts-style evaluation: per image
    and class, predictions in descending score greedily take the best
    still-free gt with IoU >= t (crowd gt: IoU = inter/pred_area, matching a
    crowd marks the prediction ignored rather than TP); exact-sweep AP =
    rectangle rule over the exact PR curve."""
    ap_per_class = {}
    for c in range(num_classes):
        dets = []  # (score, tp_at_t: dict, ignored)
        n_gt = 0
        for (pm, pc, ps, gm, gc, gcrowd) in images:
            pi = [i for i in range(len(pm)) if pc[i] == c]
            gi = [j for j in range(len(gm)) if gc[j] == c]
            n_gt += sum(1 for j in gi if not gcrowd[j])
            order = sorted(pi, key=lambda i: -ps[i])
            rec = {i: {"score": ps[i], "tp": {}, "ign": False} for i in order}
            for t in thresholds:
                free = {j: True for j in gi}
                for i in order:
                    best_iou, best_j = t, None
                    for j in gi:
                        if not gcrowd[j] and not free[j]:
                            continue
                        inter = int((pm[i] & gm[j]).sum())
                        denom = int(pm[i].sum()) if gcrowd[j] else int(pm[i].sum()) + int(gm[j].sum()) - inter
                        v = inter / denom if denom > 0 else 0.0
                        if v >= best_iou:
                            best_iou, best_j = v, j
                    if best_j is not None:
                        if gcrowd[best_j]:
                            rec[i]["ign"] = True
                        else:
                            free[best_j] = False
                            rec[i]["tp"][t] = True
            dets.extend(rec.values())
        if n_gt == 0:
            continue
        if not dets:
            ap_per_class[c] = 0.0
            continue
        dets.sort(key=lambda d: -d["score"])
        aps = []
        for t in thresholds:
            tps = [d["tp"].get(t, False) for d in dets if not (d["ign"] and not d["tp"].get(t, False))]
            if not tps:
                aps.append(0.0)
                continue
            tp_c = fp_c = 0
            area = 0.0
            prev_recall = 0.0
            for is_tp in tps:
                if is_tp:
                    tp_c += 1
                else:
                    fp_c += 1
                recall = tp_c / n_gt
                precision = tp_c / (tp_c + fp_c)
                area += (recall - prev_recall) * precision
                prev_recall = recall
            aps.append(area)
        ap_per_class[c] = float(np.mean(aps))
    return ap_per_class


@pytest.mark.parametrize("chunk", range(2))
def test_ap_fuzz_vs_bruteforce(chunk):
    rng = np.random.RandomState(200 + chunk)
    TH = APAccumulator.IOU_THRESHOLDS
    for _ in range(12):
        acc = APAccumulator(C, interpolation="exact")
        images = []
        for _img in range(3):
            n_p, n_g = rng.randint(0, 6), rng.randint(0, 6)
            pm = [
                (lambda m: m)(np.zeros((16, 20), bool)) for _ in range(n_p)
            ]
            for m in pm:
                y0, x0 = rng.randint(0, 15), rng.randint(0, 19)
                m[y0 : y0 + rng.randint(1, 10), x0 : x0 + rng.randint(1, 12)] = True
            gm = [np.zeros((16, 20), bool) for _ in range(n_g)]
            for m in gm:
                y0, x0 = rng.randint(0, 15), rng.randint(0, 19)
                m[y0 : y0 + rng.randint(1, 10), x0 : x0 + rng.randint(1, 12)] = True
            pc = rng.randint(0, C, n_p)
            ps = rng.rand(n_p)
            gc = rng.randint(0, C, n_g)
            gcrowd = rng.rand(n_g) < 0.25
            acc.update(pm, pc, ps, gm, gc, gcrowd)
            images.append((pm, pc, ps, gm, gc, gcrowd))

        want = _ap_brute(images, C, list(TH))
        got = acc.summarize()
        want_present = [want[c] for c in sorted(want)]
        want_ap = 100 * float(np.mean(want_present)) if want_present else 0.0
        assert abs(got["AP"] - want_ap) < 1e-9, (got["AP"], want_ap)


def test_ap_merge_equals_single():
    rng = np.random.RandomState(9)
    def scene():
        n_p, n_g = rng.randint(1, 5), rng.randint(1, 5)
        mk = lambda: (np.arange(16 * 20).reshape(16, 20) % rng.randint(2, 9)) == 0
        return ([mk() for _ in range(n_p)], rng.randint(0, C, n_p), rng.rand(n_p),
                [mk() for _ in range(n_g)], rng.randint(0, C, n_g), rng.rand(n_g) < 0.2)
    scenes = [scene() for _ in range(6)]
    one = APAccumulator(C, "exact")
    for s in scenes:
        one.update(*s)
    a, b = APAccumulator(C, "exact"), APAccumulator(C, "exact")
    for s in scenes[:2]:
        a.update(*s)
    for s in scenes[2:]:
        b.update(*s)
    a.merge(b)
    ra, rb = one.summarize(), a.summarize()
    assert abs(ra["AP"] - rb["AP"]) < 1e-9 and abs(ra["AP50"] - rb["AP50"]) < 1e-9


# -------------------------------------------------------------------- mIoU
def test_confusion_matrix_fuzz_vs_bruteforce():
    rng = np.random.RandomState(11)
    for _ in range(50):
        gt = rng.randint(0, C + 1, (20, 25))
        gt[gt == C] = 255  # ignore label
        pred = rng.randint(0, C, (20, 25))
        cm = ConfusionMatrix(C, ignore_label=255)
        cm.update(gt, pred)
        m = np.zeros((C, C), np.int64)
        for g in range(C):
            for p in range(C):
                m[g, p] = int(((gt == g) & (pred == p)).sum())
        np.testing.assert_array_equal(np.asarray(cm.mat), m)
