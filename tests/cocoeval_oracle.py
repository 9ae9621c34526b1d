"""Test-only oracle: a faithful numpy restatement of pycocotools' COCOeval
(bbox + keypoints), used to validate ``centernet_tpu.utils.coco_eval``.

pycocotools is not installable in this environment, so this module restates
the published COCO evaluation protocol following the structure of
``cocoeval.py`` (params -> per-(img,cat) ious -> evaluateImg over area
ranges -> accumulate -> summarize), deliberately written in the original's
shape (gtm/dtm match matrices, dtIg/gtIg ignore vectors, -1 sentinel
precision) so that any semantic divergence in the production evaluator —
which is written in a different, stream-accumulating style — shows up as a
numeric mismatch in the property tests rather than being reproduced here.

Like tests/reference_numpy.py this file exists to restate an external
contract; it is not shipped in the package.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
KPT_SIGMAS = np.array([
    0.026, 0.025, 0.025, 0.035, 0.035, 0.079, 0.079, 0.072, 0.072,
    0.062, 0.062, 0.107, 0.107, 0.087, 0.087, 0.089, 0.089,
])


def _iou_bbox(d, g, iscrowd):
    """xywh IoU; crowd gts use intersection / det-area (maskUtils.iou)."""
    ious = np.zeros((len(d), len(g)))
    for j, gb in enumerate(g):
        for i, db in enumerate(d):
            ix = min(db[0] + db[2], gb[0] + gb[2]) - max(db[0], gb[0])
            iy = min(db[1] + db[3], gb[1] + gb[3]) - max(db[1], gb[1])
            if ix <= 0 or iy <= 0:
                continue
            inter = ix * iy
            da = db[2] * db[3]
            u = da if iscrowd[j] else da + gb[2] * gb[3] - inter
            if u > 0:
                ious[i, j] = inter / u
    return ious


def _iou_oks(dts, gts):
    """computeOks: rows=dts, cols=gts (note pycocotools computes [dt, gt])."""
    ious = np.zeros((len(dts), len(gts)))
    vars_ = (KPT_SIGMAS * 2) ** 2
    k = len(KPT_SIGMAS)
    for j, gt in enumerate(gts):
        g = np.array(gt["keypoints"], np.float64)
        xg, yg, vg = g[0::3], g[1::3], g[2::3]
        k1 = np.count_nonzero(vg > 0)
        bb = gt["bbox"]
        x0, x1 = bb[0] - bb[2], bb[0] + bb[2] * 2
        y0, y1 = bb[1] - bb[3], bb[1] + bb[3] * 2
        for i, dt in enumerate(dts):
            d = np.array(dt["keypoints"], np.float64)
            xd, yd = d[0::3], d[1::3]
            if k1 > 0:
                dx = xd - xg
                dy = yd - yg
            else:
                z = np.zeros(k)
                dx = np.maximum(z, x0 - xd) + np.maximum(z, xd - x1)
                dy = np.maximum(z, y0 - yd) + np.maximum(z, yd - y1)
            e = (dx ** 2 + dy ** 2) / vars_ / (
                gt["area"] + np.spacing(1)) / 2
            if k1 > 0:
                e = e[vg > 0]
            ious[i, j] = np.sum(np.exp(-e)) / e.shape[0] if e.shape[0] else 0.0
    return ious


def _gt_ignore(g, iou_type):
    ig = g.get("ignore", 0) or g.get("iscrowd", 0)
    if iou_type == "keypoints":
        nk = g.get("num_keypoints")
        if nk is None:
            nk = int((np.array(g["keypoints"], np.float64)[2::3] > 0).sum())
        ig = ig or nk == 0
    return int(bool(ig))


def _dt_area(d, iou_type):
    if iou_type == "keypoints":
        kp = np.array(d["keypoints"], np.float64)
        x, y = kp[0::3], kp[1::3]
        return (x.max() - x.min()) * (y.max() - y.min())
    return d["bbox"][2] * d["bbox"][3]


def _evaluate_img(gts, dts, ious, arng, max_det, iou_type):
    """cocoeval.evaluateImg: returns (dtm!=0-and-not-ignored is derived
    later) the match/ignore state for one (img, cat, area)."""
    for g in gts:
        area = g.get("area", g["bbox"][2] * g["bbox"][3])
        g["_ignore"] = 1 if (
            _gt_ignore(g, iou_type) or area < arng[0] or area > arng[1]
        ) else 0
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gts = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dts = [dts[i] for i in dtind][:max_det]
    iscrowd = [int(g.get("iscrowd", 0)) for g in gts]
    ious_s = ious[:, gtind] if len(ious) > 0 else ious

    T = len(IOU_THRS)
    G, D = len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gts])
    dt_ig = np.zeros((T, D))
    if len(ious_s) > 0:
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dts):
                iou = min(t, 1 - 1e-10)
                m = -1
                for gind in range(G):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious_s[dind, gind] < iou:
                        continue
                    iou = ious_s[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = gts[m]["id"]
                gtm[tind, m] = d["id"]
    a = np.array(
        [_dt_area(d, iou_type) < arng[0] or _dt_area(d, iou_type) > arng[1]
         for d in dts]
    ).reshape((1, D))
    dt_ig = np.logical_or(
        dt_ig, np.logical_and(dtm == 0, np.repeat(a, T, 0))
    )
    return {
        "dtMatches": dtm,
        "dtScores": [d["score"] for d in dts],
        "gtIgnore": gt_ig,
        "dtIgnore": dt_ig,
    }


class OracleCocoEval:
    """pycocotools.COCOeval restatement for bbox / keypoints results."""

    def __init__(self, gt_dataset, iou_type="bbox"):
        self.iou_type = iou_type
        self.imgs = [im["id"] for im in gt_dataset["images"]]
        if iou_type == "keypoints":
            self.cats = [c["id"] for c in gt_dataset["categories"]
                         if c.get("keypoints")] or [1]
            self.max_dets = 20
            self.areas = ["all", "small", "medium", "large"]
        else:
            self.cats = sorted(c["id"] for c in gt_dataset["categories"])
            self.max_dets = 100
            self.areas = ["all", "small", "medium", "large"]
        self._gts = {}
        for ann in gt_dataset["annotations"]:
            self._gts.setdefault(
                (ann["image_id"], ann["category_id"]), []
            ).append(dict(ann))

    def evaluate(self, results):
        dts = {}
        for i, r in enumerate(results):
            d = dict(r)
            d["id"] = i + 1
            dts.setdefault((r["image_id"], r["category_id"]), []).append(d)

        T, R = len(IOU_THRS), len(REC_THRS)
        K, A = len(self.cats), len(self.areas)
        precision = -np.ones((T, R, K, A))

        # evaluateImg results per (cat, area, img)
        eval_imgs = {}
        for k, cat in enumerate(self.cats):
            for img in self.imgs:
                gts = [dict(g) for g in self._gts.get((img, cat), [])]
                dt = sorted(
                    dts.get((img, cat), []), key=lambda d: -d["score"]
                )[: self.max_dets]
                if not gts and not dt:
                    continue
                if self.iou_type == "keypoints":
                    ious = _iou_oks(dt, gts) if dt and gts else np.zeros(
                        (len(dt), len(gts)))
                else:
                    crowd = [int(g.get("iscrowd", 0)) for g in gts]
                    ious = (_iou_bbox(
                        np.array([d["bbox"] for d in dt], np.float64),
                        np.array([g["bbox"] for g in gts], np.float64),
                        crowd) if dt and gts
                        else np.zeros((len(dt), len(gts))))
                for a, aname in enumerate(self.areas):
                    eval_imgs[(k, a, img)] = _evaluate_img(
                        [dict(g) for g in gts], [dict(d) for d in dt],
                        ious, AREA_RNG[aname], self.max_dets, self.iou_type)

        # accumulate
        for k in range(K):
            for a in range(A):
                es = [eval_imgs.get((k, a, img)) for img in self.imgs]
                es = [e for e in es if e is not None]
                if not es:
                    continue
                dt_scores = np.concatenate(
                    [np.array(e["dtScores"]) for e in es])
                inds = np.argsort(-dt_scores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dtMatches"] for e in es], axis=1)[:, inds]
                dt_ig = np.concatenate(
                    [e["dtIgnore"] for e in es], axis=1)[:, inds]
                gt_ig = np.concatenate([e["gtIgnore"] for e in es])
                npig = np.count_nonzero(gt_ig == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(
                    np.logical_not(dtm), np.logical_not(dt_ig))
                tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                for t in range(T):
                    tp, fp = tp_sum[t], fp_sum[t]
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros(R)
                    pr = pr.tolist()
                    for i in range(len(pr) - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds_r = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(inds_r):
                        if pi < len(pr):
                            q[ri] = pr[pi]
                    precision[t, :, k, a] = q
        self.precision = precision
        return self

    def stats(self):
        def _ap(tind=slice(None), area="all"):
            a = self.areas.index(area)
            p = self.precision[tind, :, :, a]
            p = p[p > -1]
            return float(np.mean(p)) if p.size else -1.0

        return {
            "ap": _ap(),
            "ap_50": _ap(slice(0, 1)),
            "ap_75": _ap(slice(5, 6)),
            "ap_S": _ap(area="small"),
            "ap_M": _ap(area="medium"),
            "ap_L": _ap(area="large"),
        }
