"""pycocotools.mask-compatible wrapper over the native RLE library."""

import numpy as np
import pytest

from ct_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_mask_api_roundtrip_and_ops():
    from ct_tpu.data import mask

    rng = np.random.RandomState(0)
    m = (rng.rand(33, 47) > 0.65).astype(np.uint8)
    rle = mask.encode(m)
    assert isinstance(rle["counts"], bytes)
    np.testing.assert_array_equal(mask.decode(rle), m)
    assert mask.area(rle) == m.sum()

    m2 = np.zeros_like(m)
    m2[5:20, 10:30] = 1
    rle2 = mask.encode(m2)
    union = mask.merge([rle, rle2])
    assert mask.area(union) == int((m | m2).sum())
    inter = mask.merge([rle, rle2], intersect=True)
    assert mask.area(inter) == int((m & m2).sum())

    bb = mask.toBbox(rle2)
    np.testing.assert_array_equal(bb, [10, 5, 20, 15])

    # xywh box IoU incl. crowd semantics
    dt = np.asarray([[0, 0, 10, 10]], float)
    gt = np.asarray([[0, 0, 10, 10], [5, 5, 10, 10]], float)
    iou = mask.iou(dt, gt, [0, 0])
    np.testing.assert_allclose(iou[0, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 25 / 175, atol=1e-6)
    iou_crowd = mask.iou(dt, gt, [0, 1])
    np.testing.assert_allclose(iou_crowd[0, 1], 25 / 100, atol=1e-6)

    # polygons and boxes through frPyObjects
    sq = mask.frPyObjects([2.0, 2.0, 10.0, 8.0], 20, 20)  # xywh box
    assert mask.area(sq) == 80
    poly = mask.frPyObjects([[2, 2, 12, 2, 12, 12, 2, 12]], 20, 20)
    assert mask.area(poly[0]) == 100


def test_stacked_encode_decode():
    from ct_tpu.data import mask

    rng = np.random.RandomState(1)
    stack = (rng.rand(16, 18, 3) > 0.5).astype(np.uint8)
    rles = mask.encode(stack)
    assert len(rles) == 3
    back = mask.decode(rles)
    np.testing.assert_array_equal(back, stack)
