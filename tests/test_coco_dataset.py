"""COCODetection end-to-end on a synthetic mini-COCO tree.

Covers the dataset class the COCO CLIs drive (reference
/root/reference/data/coco.py:70-345): construction over predefined
splits, bbox clipping to [x1,y1,x2,y2,label], the gt-roidb pickle cache,
the nonvoc/voc category remap, and detections → COCO stats round-trip
through the vendored evaluator.
"""

import os
import pickle

import numpy as np
import pytest

from fixtures import COCO_FIXTURE_CATS, make_mini_coco


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    return make_mini_coco(str(tmp_path_factory.mktemp("coco")))


def _dataset(coco_root, sets=(("2014", "split_nonvoc_train"),)):
    from ct_tpu.data.coco import COCODetection

    return COCODetection(coco_root, list(sets))


def test_construction_and_samples(coco_root):
    ds = _dataset(coco_root)
    assert len(ds) == 8
    assert ds.num_classes == len(COCO_FIXTURE_CATS)
    img, target = ds[0]
    assert img.ndim == 3 and img.shape[2] == 3
    assert target.shape[1] == 6           # [x1,y1,x2,y2,label,weight]
    assert (target[:, 5] == 1.0).all()    # unit mixup weights
    labels = target[:, 4]
    assert labels.min() >= 1 and labels.max() <= len(COCO_FIXTURE_CATS)
    h, w = img.shape[:2]
    assert (target[:, 0] >= 0).all() and (target[:, 2] <= w - 1).all()
    assert (target[:, 1] >= 0).all() and (target[:, 3] <= h - 1).all()
    assert ds.pull_image(3).shape == ds[3][0].shape


def test_multi_set_concatenation(coco_root):
    ds = _dataset(coco_root, (("2014", "split_nonvoc_train"),
                              ("2014", "split_nonvoc_valminusminival")))
    # the valminusminival fixture split is empty — ids come from train only
    assert len(ds) == 8


def test_roidb_cache_roundtrip(coco_root):
    ds1 = _dataset(coco_root)
    cache = os.path.join(coco_root, "cache",
                         "split_nonvoc_train2014_gt_roidb.pkl")
    assert os.path.exists(cache)
    ds2 = _dataset(coco_root)   # second build loads the pickle
    for a, b in zip(ds1.annotations, ds2.annotations):
        np.testing.assert_array_equal(a, b)
    with open(cache, "rb") as f:
        assert len(pickle.load(f)) == len(ds1)


def test_nonvoc_voc_remap_on_full_category_set(tmp_path):
    """With all 80 COCO categories present, the nonvoc split must keep 60
    and the voc split 20, remapped to contiguous 1-based labels
    (reference data/coco.py:135-145)."""
    import json

    from ct_tpu.data.coco import (
        NONVOC_CAT_INDICES, VOC_CAT_INDICES, COCODetection,
    )

    root = str(tmp_path)
    os.makedirs(os.path.join(root, "annotations"))
    os.makedirs(os.path.join(root, "images", "train2014"))
    cats = [{"id": i + 1, "name": f"cat{i:02d}", "supercategory": "x"}
            for i in range(80)]
    payload = {"images": [], "annotations": [], "categories": cats}
    for split, idxs in (("nonvoc", NONVOC_CAT_INDICES),
                        ("voc", VOC_CAT_INDICES)):
        with open(os.path.join(
                root, "annotations",
                f"split_{split}_instances_train2014.json"), "w") as f:
            json.dump(payload, f)
        ds = COCODetection(root, [("2014", f"split_{split}_train")])
        assert ds.num_classes == len(idxs)
        assert sorted(ds.coco_cat_id_to_contiguous.values()) == \
            list(range(1, len(idxs) + 1))
        assert set(ds.coco_cat_id_to_contiguous) == \
            {c + 1 for c in idxs}


def test_perfect_detections_score_ap1(coco_root):
    ds = _dataset(coco_root, (("2014", "split_nonvoc_minival"),))
    assert len(ds) == 6
    n_cls = ds.num_classes + 1
    all_boxes = [[[] for _ in range(len(ds))] for _ in range(n_cls)]
    for i in range(len(ds)):
        ann = ds.annotations[i]
        for x1, y1, x2, y2, cls in ann:
            all_boxes[int(cls)][i].append([x1, y1, x2, y2, 0.9])
    for j in range(1, n_cls):
        all_boxes[j] = [np.asarray(r, np.float64).reshape(-1, 5)
                        for r in all_boxes[j]]
    stats = ds.evaluate_detections(all_boxes, str(
        os.path.join(coco_root, "out")))
    assert stats is not None
    ap = stats.get("AP") if isinstance(stats, dict) else stats[0]
    if ap is None:   # stats dict keyed differently: take the first value
        ap = next(iter(stats.values()))
    assert float(ap) > 0.99, stats
