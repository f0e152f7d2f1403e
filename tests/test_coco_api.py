"""CocoIndex pycocotools-API parity vs the reference COCO class (oracle).

The reference ``coco.py`` is pure Python except for ``mask`` (Cython);
we inject our own ``ct_tpu.data.mask`` module as the stub — it is
API-compatible and independently golden-tested (tests/test_mask_api.py) —
so the oracle's loadRes/annToRLE control flow runs on the same RLE backend
and any divergence is in the index/filter logic under test.

Oracle: /root/reference/utils/pycocotools/coco.py:85-433.
"""

import importlib.util
import json
import sys
import types

import numpy as np
import pytest

from conftest import has_reference
from ct_tpu.data.coco import CocoIndex
from ct_tpu.data import mask as mask_api

REF_PKG = "/root/reference/utils/pycocotools"


def _load_reference_coco():
    pkg = types.ModuleType("refpycoco2")
    pkg.__path__ = [REF_PKG]
    sys.modules["refpycoco2"] = pkg
    sys.modules["refpycoco2.mask"] = mask_api
    spec = importlib.util.spec_from_file_location(
        "refpycoco2.coco", REF_PKG + "/coco.py"
    )
    m = importlib.util.module_from_spec(spec)
    sys.modules["refpycoco2.coco"] = m
    spec.loader.exec_module(m)
    return m.COCO


def make_dataset(seed=0):
    rng = np.random.RandomState(seed)
    images = [
        {"id": i + 1, "width": 64, "height": 48, "file_name": f"{i}.jpg"}
        for i in range(6)
    ]
    cats = [
        {"id": 7, "name": "dog", "supercategory": "animal"},
        {"id": 3, "name": "cat", "supercategory": "animal"},
        {"id": 11, "name": "car", "supercategory": "vehicle"},
    ]
    anns, aid = [], 1
    for im in images[:-1]:
        for _ in range(rng.randint(1, 5)):
            w = float(rng.uniform(3, 30))
            h = float(rng.uniform(3, 30))
            x = float(rng.uniform(0, 64 - w))
            y = float(rng.uniform(0, 48 - h))
            # polygon: the bbox rectangle (so annToMask is well-defined)
            poly = [[x, y, x, y + h, x + w, y + h, x + w, y]]
            anns.append({
                "id": aid, "image_id": im["id"],
                "category_id": int([7, 3, 11][rng.randint(3)]),
                "bbox": [x, y, w, h], "area": w * h,
                "iscrowd": int(rng.rand() < 0.2),
                "segmentation": poly,
            })
            aid += 1
    # one uncompressed-RLE annotation
    anns.append({
        "id": aid, "image_id": 1, "category_id": 7,
        "bbox": [0.0, 0.0, 8.0, 8.0], "area": 64.0, "iscrowd": 0,
        "segmentation": {"size": [48, 64],
                         "counts": [10, 20, 30, 40, 48 * 64 - 100]},
    })
    return {"images": images, "annotations": anns, "categories": cats}


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    if not has_reference():
        pytest.skip("reference not mounted")
    gt = make_dataset()
    path = str(tmp_path_factory.mktemp("coco") / "gt.json")
    with open(path, "w") as f:
        json.dump(gt, f)
    COCO = _load_reference_coco()
    return COCO(path), CocoIndex(path)


def test_get_ann_ids_filters(pair):
    ref, ours = pair
    cases = [
        dict(),
        dict(imgIds=[1, 3]),
        dict(imgIds=2),
        dict(catIds=[7]),
        dict(catIds=[3, 11]),
        dict(imgIds=[1, 2, 4], catIds=[7, 3]),
        dict(areaRng=[50, 400]),
        dict(iscrowd=True),
        dict(iscrowd=False),
        dict(imgIds=[1], catIds=[7], areaRng=[0, 1e5], iscrowd=False),
        dict(imgIds=[999]),
    ]
    for kw in cases:
        assert ours.getAnnIds(**kw) == ref.getAnnIds(**kw), kw


def test_get_cat_ids_filters(pair):
    ref, ours = pair
    cases = [
        dict(),
        dict(catNms=["dog"]),
        dict(catNms=["dog", "car"]),
        dict(supNms=["animal"]),
        dict(supNms="vehicle"),
        dict(catIds=[3, 11]),
        dict(catNms=["dog", "cat"], supNms=["animal"], catIds=[3]),
        dict(catNms=["nothing"]),
    ]
    for kw in cases:
        assert ours.getCatIds(**kw) == ref.getCatIds(**kw), kw


def test_get_img_ids_filters(pair):
    ref, ours = pair
    cases = [
        dict(),
        dict(imgIds=[1, 2]),
        dict(catIds=[7]),
        dict(catIds=[7, 3]),          # images containing BOTH cats
        dict(imgIds=[1, 2, 3], catIds=[11]),
        dict(catIds=[999]),
    ]
    for kw in cases:
        assert sorted(ours.getImgIds(**kw)) == sorted(ref.getImgIds(**kw)), kw


def test_load_methods(pair):
    ref, ours = pair
    ids = ref.getAnnIds(imgIds=[1, 2])
    assert ours.loadAnns(ids) == ref.loadAnns(ids)
    assert ours.loadCats([7, 11]) == ref.loadCats([7, 11])
    assert ours.loadImgs([2, 4]) == ref.loadImgs([2, 4])
    assert ours.loadImgs(3) == ref.loadImgs(3)


def test_load_res_bbox(pair, tmp_path):
    ref, ours = pair
    rng = np.random.RandomState(1)
    dets = []
    for img_id in [1, 2, 3]:
        for _ in range(5):
            w, h = float(rng.uniform(3, 30)), float(rng.uniform(3, 30))
            dets.append({
                "image_id": img_id,
                "category_id": int([7, 3, 11][rng.randint(3)]),
                "bbox": [float(rng.uniform(0, 30)), float(rng.uniform(0, 18)),
                         w, h],
                "score": float(rng.rand()),
            })
    dt_path = str(tmp_path / "dt.json")
    with open(dt_path, "w") as f:
        json.dump(dets, f)

    r_ref = ref.loadRes(dt_path)
    r_ours = ours.loadRes(dt_path)
    ids = sorted(r_ref.anns.keys())
    assert sorted(r_ours.anns.keys()) == ids
    for i in ids:
        a, b = r_ref.anns[i], r_ours.anns[i]
        for k in ("image_id", "category_id", "score", "iscrowd"):
            assert a[k] == b[k]
        np.testing.assert_allclose(a["bbox"], b["bbox"])
        np.testing.assert_allclose(a["area"], b["area"])
        np.testing.assert_allclose(
            np.asarray(a["segmentation"], float),
            np.asarray(b["segmentation"], float),
        )
    # numpy [N,7] input path
    arr = np.asarray([[1, 2.0, 3.0, 10.0, 12.0, 0.9, 7]])
    a = ours.loadRes(arr).anns[1]
    b = ref.loadRes(arr).anns[1]
    assert a["image_id"] == b["image_id"] == 1
    np.testing.assert_allclose(a["bbox"], b["bbox"])
    # results referencing unknown images must be rejected
    with pytest.raises(AssertionError):
        ours.loadRes([{"image_id": 777, "category_id": 7,
                       "bbox": [0, 0, 1, 1], "score": 0.5}])


def test_ann_to_rle_and_mask(pair):
    ref, ours = pair
    for aid in sorted(ours.anns.keys()):
        ann = ours.anns[aid]
        m_ref = ref.annToMask(ref.anns[aid])
        m_ours = ours.annToMask(ann)
        np.testing.assert_array_equal(m_ref, m_ours)
        # polygon anns: the mask must cover ≈ the bbox rectangle
        if isinstance(ann["segmentation"], list):
            x, y, w, h = ann["bbox"]
            assert abs(m_ours.sum() - w * h) / (w * h) < 0.2
