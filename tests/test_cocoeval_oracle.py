"""Validate the numpy COCO evaluator against the reference COCOeval oracle.

The reference's vendored ``cocoeval.py``/``coco.py`` are pure Python except
for ``mask.iou`` (Cython). We import them with a numpy bbIoU stub injected
(the same formula as ``ct_tpu.data.cocoeval.bbox_iou_xywh``, so both sides
see bit-identical IoUs and threshold comparisons can't flip), feed both
evaluators an identical synthetic dataset exercising crowds, ignore flags,
all area ranges, empty categories and >100 detections/image, and assert the
12 summary stats AND the full precision/recall tensors match.

Oracle: /root/reference/utils/pycocotools/cocoeval.py (evaluate :121,
accumulate :315, summarize :422) via /root/reference/utils/pycocotools/
coco.py ``loadRes`` (:297-356).
"""

import importlib.util
import json
import sys
import types

import numpy as np
import pytest

from conftest import has_reference
from ct_tpu.data.cocoeval import COCOEvaluator, bbox_iou_xywh
from ct_tpu.data.coco import CocoIndex

REF_PKG = "/root/reference/utils/pycocotools"


def _stub_iou(d, g, iscrowd):
    d = np.asarray(d, np.float64).reshape(-1, 4)
    g = np.asarray(g, np.float64).reshape(-1, 4)
    return bbox_iou_xywh(d, g, np.asarray(iscrowd, bool))


def _load_reference_cocoeval():
    pkg = types.ModuleType("refpycoco")
    pkg.__path__ = [REF_PKG]
    sys.modules["refpycoco"] = pkg
    mask_stub = types.ModuleType("refpycoco.mask")
    mask_stub.iou = _stub_iou
    sys.modules["refpycoco.mask"] = mask_stub

    def _mod(name, path):
        spec = importlib.util.spec_from_file_location(name, path)
        m = importlib.util.module_from_spec(spec)
        sys.modules[name] = m
        spec.loader.exec_module(m)
        return m

    coco = _mod("refpycoco.coco", REF_PKG + "/coco.py")
    cocoeval = _mod("refpycoco.cocoeval", REF_PKG + "/cocoeval.py")
    return coco.COCO, cocoeval.COCOeval


def make_synthetic(seed=0, n_imgs=10, n_cats=4, dets_per_img=110):
    """GT + detections covering crowds, ignores, all area ranges, an empty
    category (no GT), images with no annotations, and maxDets truncation."""
    rng = np.random.RandomState(seed)
    images = [
        {"id": i + 1, "width": 640, "height": 480, "file_name": f"{i}.jpg"}
        for i in range(n_imgs)
    ]
    # non-contiguous, unsorted category ids to exercise the id mapping
    cat_ids = [30, 10, 40, 20][:n_cats]
    cats = [{"id": c, "name": f"cat{c}", "supercategory": "x"}
            for c in cat_ids]
    gt_cat_ids = cat_ids[:-1]  # last category has detections but no GT

    def rand_box():
        w = float(rng.uniform(4, 320))
        h = float(rng.uniform(4, 320))
        x = float(rng.uniform(0, 640 - w))
        y = float(rng.uniform(0, 480 - h))
        return [x, y, w, h]

    anns, aid = [], 1
    for im in images[:-1]:  # last image has no annotations
        for _ in range(rng.randint(1, 8)):
            bbox = rand_box()
            ann = {
                "id": aid, "image_id": im["id"],
                "category_id": int(gt_cat_ids[rng.randint(len(gt_cat_ids))]),
                "bbox": bbox, "area": bbox[2] * bbox[3],
                "iscrowd": int(rng.rand() < 0.15),
            }
            if rng.rand() < 0.1:
                ann["ignore"] = 1
            anns.append(ann)
            aid += 1

    dets = []
    for im in images:
        for _ in range(dets_per_img):  # >100 → exercises maxDets=100 cap
            dets.append({
                "image_id": im["id"],
                "category_id": int(cat_ids[rng.randint(n_cats)]),
                "bbox": rand_box(), "score": float(rng.rand()),
            })
    for a in anns:  # jittered copies of GT = plausible true positives
        if rng.rand() < 0.8:
            x, y, w, h = a["bbox"]
            dets.append({
                "image_id": a["image_id"], "category_id": a["category_id"],
                "bbox": [x + rng.uniform(-5, 5), y + rng.uniform(-5, 5),
                         max(4.0, w + rng.uniform(-8, 8)),
                         max(4.0, h + rng.uniform(-8, 8))],
                "score": float(rng.uniform(0.5, 1.0)),
            })
    gt = {"images": images, "annotations": anns, "categories": cats}
    return gt, dets


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
@pytest.mark.parametrize("seed", [0, 7])
def test_cocoeval_matches_reference_oracle(tmp_path, seed):
    COCO, COCOeval = _load_reference_cocoeval()
    gt, dets = make_synthetic(seed=seed)

    gt_path = str(tmp_path / "gt.json")
    dt_path = str(tmp_path / "dt.json")
    with open(gt_path, "w") as f:
        json.dump(gt, f)
    with open(dt_path, "w") as f:
        json.dump(dets, f)

    # numpy-2 shim: the vintage oracle uses the removed np.float/int aliases
    added = []
    for alias, real in (("float", np.float64), ("int", np.int64),
                        ("bool", np.bool_)):
        if alias not in np.__dict__:
            setattr(np, alias, real)
            added.append(alias)
    try:
        coco_gt = COCO(gt_path)
        coco_dt = coco_gt.loadRes(dt_path)
        E = COCOeval(coco_gt, coco_dt, "bbox")
        E.evaluate()
        E.accumulate()
        E.summarize()
    finally:
        for alias in added:
            delattr(np, alias)

    index = CocoIndex(gt_path)
    cat_map = {c: i for i, c in enumerate(sorted(index.cats.keys()), 1)}
    ours = COCOEvaluator(index, cat_map)
    stats = ours.evaluate(dets)

    keys = ["AP", "AP50", "AP75", "APs", "APm", "APl",
            "AR1", "AR10", "AR100", "ARs", "ARm", "ARl"]
    np.testing.assert_allclose(
        [stats[k] for k in keys], E.stats, rtol=1e-9, atol=1e-12,
        err_msg=str(keys),
    )
    np.testing.assert_allclose(
        ours.eval_result["precision"], E.eval["precision"],
        rtol=1e-9, atol=1e-12,
    )
    np.testing.assert_allclose(
        ours.eval_result["recall"], E.eval["recall"],
        rtol=1e-9, atol=1e-12,
    )


def test_native_bb_iou_matches_numpy_xywh():
    """Tie the native bbIoU into the same convention the evaluator uses."""
    from ct_tpu import native

    rng = np.random.RandomState(3)
    d = np.abs(rng.randn(40, 4)) * 50
    g = np.abs(rng.randn(25, 4)) * 50
    crowd = rng.rand(25) < 0.3
    d_xyxy = d.copy()
    d_xyxy[:, 2:] += d_xyxy[:, :2]
    g_xyxy = g.copy()
    g_xyxy[:, 2:] += g_xyxy[:, :2]
    ours = bbox_iou_xywh(d, g, crowd)
    nat = native.bb_iou(d_xyxy, g_xyxy, crowd.astype(np.uint8))
    np.testing.assert_allclose(nat, ours, rtol=2e-5, atol=2e-6)
