"""Native C++ library (NMS, RLE) vs numpy/reference oracles."""

import numpy as np
import pytest

from conftest import has_reference, import_reference
from ct_tpu import native
from ct_tpu.ops.nms import nms_numpy

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def random_dets(rng, n):
    mins = rng.uniform(0, 200, size=(n, 2))
    sizes = rng.uniform(10, 100, size=(n, 2))
    boxes = np.concatenate([mins, mins + sizes], axis=1)
    scores = rng.uniform(0, 1, size=(n, 1))
    return np.concatenate([boxes, scores], axis=1).astype(np.float32)


def test_cpu_nms_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    for _ in range(10):
        dets = random_dets(rng, 128)
        assert native.cpu_nms(dets, 0.45) == nms_numpy(dets, 0.45)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_cpu_nms_matches_reference_py_cpu_nms():
    import_reference()
    from utils.nms.py_cpu_nms import py_cpu_nms

    rng = np.random.RandomState(1)
    for _ in range(5):
        dets = random_dets(rng, 200)
        assert native.cpu_nms(dets, 0.5) == py_cpu_nms(dets, 0.5)


def test_soft_nms_decays_scores():
    dets = np.asarray([
        [0, 0, 10, 10, 0.9],
        [1, 1, 11, 11, 0.8],     # heavy overlap with the first
        [50, 50, 60, 60, 0.7],   # isolated
    ], np.float32)
    work = dets.copy()
    keep = native.cpu_soft_nms(work, iou_thresh=0.3, method=2)
    assert 0 in keep and 2 in keep
    assert work[1, 4] < 0.8  # overlapped score decayed
    assert np.isclose(work[2, 4], 0.7, atol=1e-6)  # isolated unchanged


def test_bb_iou_matches_numpy():
    rng = np.random.RandomState(2)
    a = random_dets(rng, 7)[:, :4]
    b = random_dets(rng, 9)[:, :4]
    got = native.bb_iou(a, b)
    ax1, ay1, ax2, ay2 = a[:, 0:1], a[:, 1:2], a[:, 2:3], a[:, 3:4]
    bx1, by1, bx2, by2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    iw = np.maximum(np.minimum(ax2, bx2) - np.maximum(ax1, bx1), 0)
    ih = np.maximum(np.minimum(ay2, by2) - np.maximum(ay1, by1), 0)
    inter = iw * ih
    union = ((ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter)
    np.testing.assert_allclose(got, inter / union, rtol=1e-5)


def test_rle_roundtrip():
    rng = np.random.RandomState(3)
    mask = (rng.rand(37, 53) > 0.7).astype(np.uint8)
    rle = native.rle_encode(mask)
    np.testing.assert_array_equal(native.rle_decode(rle), mask)
    assert native.rle_area(rle) == int(mask.sum())


def test_rle_merge_and_iou():
    a = np.zeros((20, 20), np.uint8)
    b = np.zeros((20, 20), np.uint8)
    a[2:10, 2:10] = 1   # 64 px
    b[6:14, 6:14] = 1   # 64 px, 16 px overlap
    ra, rb = native.rle_encode(a), native.rle_encode(b)
    union = native.rle_merge(ra, rb, intersect=False)
    inter = native.rle_merge(ra, rb, intersect=True)
    assert native.rle_area(union) == int((a | b).sum())
    assert native.rle_area(inter) == int((a & b).sum())
    expected_iou = (a & b).sum() / (a | b).sum()
    assert np.isclose(native.rle_iou(ra, rb), expected_iou, atol=1e-9)
    # crowd: intersection / area(a)
    assert np.isclose(native.rle_iou(ra, rb, iscrowd=True),
                      (a & b).sum() / a.sum(), atol=1e-9)


def test_rle_bbox_roundtrip():
    mask = np.zeros((30, 40), np.uint8)
    mask[5:12, 7:20] = 1
    rle = native.rle_encode(mask)
    np.testing.assert_array_equal(native.rle_to_bbox(rle), [7, 5, 13, 7])
    rle2 = native.rle_from_bbox([7, 5, 13, 7], 30, 40)
    np.testing.assert_array_equal(native.rle_decode(rle2), mask)


def test_rle_from_poly_square():
    # an axis-aligned square polygon rasterizes like the bbox fill
    rle = native.rle_from_poly([5, 5, 15, 5, 15, 15, 5, 15], 20, 20)
    mask = native.rle_decode(rle)
    assert mask[10, 10] == 1 and mask[0, 0] == 0
    assert abs(int(mask.sum()) - 100) <= 20  # boundary convention slack


def test_rle_string_roundtrip():
    rng = np.random.RandomState(4)
    mask = (rng.rand(25, 31) > 0.6).astype(np.uint8)
    rle = native.rle_encode(mask)
    s = native.rle_to_string(rle)
    back = native.rle_from_string(s, 25, 31)
    np.testing.assert_array_equal(back["counts"], rle["counts"])


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_rle_string_matches_reference_codec():
    """Our varint codec must be byte-compatible with the vendored
    pycocotools (so COCO json 'counts' strings interoperate)."""
    try:
        import_reference()
        from utils.pycocotools import mask as ref_mask
    except ImportError:
        pytest.skip("reference pycocotools C extension not built")
    rng = np.random.RandomState(5)
    m = np.asfortranarray((rng.rand(18, 22) > 0.5).astype(np.uint8))
    ref = ref_mask.encode(m)
    ours = native.rle_to_string(native.rle_encode(np.ascontiguousarray(m)))
    assert ours == ref["counts"]


def test_bb_nms():
    bbs = np.asarray([
        [0, 0, 10, 10],
        [1, 1, 10, 10],
        [50, 50, 5, 5],
    ], np.float64)
    keep = native.bb_nms(bbs, 0.5)
    assert keep.tolist() == [True, False, True]
