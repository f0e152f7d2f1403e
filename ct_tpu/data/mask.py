"""pycocotools.mask-compatible API over the native RLE library.

Capability parity with the reference's vendored wrapper
(/root/reference/utils/pycocotools/mask.py:81-104): ``encode``, ``decode``,
``merge``, ``area``, ``iou``, ``toBbox``, ``frPyObjects`` — with COCO-json
compatible dicts (``counts`` as the compressed varint byte string).
"""

from __future__ import annotations

from typing import List, Sequence, Union

import numpy as np

from ct_tpu import native


def _compress(rle: dict) -> dict:
    return {"size": rle["size"], "counts": native.rle_to_string(rle)}


def _decompress(obj: dict) -> dict:
    counts = obj["counts"]
    if isinstance(counts, (bytes, str)):
        if isinstance(counts, str):
            counts = counts.encode()
        h, w = obj["size"]
        return native.rle_from_string(counts, h, w)
    return {"size": obj["size"], "counts": np.asarray(counts, np.uint32)}


def encode(mask: np.ndarray) -> Union[dict, List[dict]]:
    """Binary mask [H, W] (or [H, W, N] F-order) → compressed RLE dict(s)."""
    if mask.ndim == 3:
        return [encode(mask[:, :, i]) for i in range(mask.shape[2])]
    return _compress(native.rle_encode(np.ascontiguousarray(mask)))


def decode(rle: Union[dict, Sequence[dict]]) -> np.ndarray:
    if isinstance(rle, (list, tuple)):
        return np.stack([decode(r) for r in rle], axis=2)
    return native.rle_decode(_decompress(rle))


def area(rle: Union[dict, Sequence[dict]]):
    if isinstance(rle, (list, tuple)):
        return np.asarray([area(r) for r in rle])
    return native.rle_area(_decompress(rle))


def merge(rles: Sequence[dict], intersect: bool = False) -> dict:
    out = _decompress(rles[0])
    for r in rles[1:]:
        out = native.rle_merge(out, _decompress(r), intersect=intersect)
    return _compress(out)


def toBbox(rle: Union[dict, Sequence[dict]]):
    if isinstance(rle, (list, tuple)):
        return np.stack([toBbox(r) for r in rle])
    return native.rle_to_bbox(_decompress(rle))


def iou(dt, gt, iscrowd):
    """IoU matrix between detections and ground truths.

    dt/gt: [N, 4] xywh boxes (ndarray) or lists of RLE dicts; iscrowd is a
    per-gt flag sequence (crowd → intersection / det-area).
    """
    iscrowd = np.asarray(iscrowd, bool)

    def _as_boxes(x):
        # pycocotools semantics: ndarray [N,4] OR a list of 4-number
        # sequences means xywh boxes (the vendored COCOeval passes plain
        # lists for iouType='bbox', cocoeval.py:182-183)
        if isinstance(x, np.ndarray):
            return x
        if isinstance(x, (list, tuple)) and (
            not x or (isinstance(x[0], (list, tuple, np.ndarray))
                      and len(x[0]) == 4)
        ):
            return np.asarray(x, np.float64).reshape(-1, 4)
        return None

    d_arr, g_arr = _as_boxes(dt), _as_boxes(gt)
    if d_arr is not None and g_arr is not None:
        dt, gt = d_arr, g_arr
    if isinstance(dt, np.ndarray) and isinstance(gt, np.ndarray):
        d = dt.astype(np.float32).reshape(-1, 4)
        g = gt.astype(np.float32).reshape(-1, 4)
        d_xyxy = np.concatenate([d[:, :2], d[:, :2] + d[:, 2:]], axis=1)
        g_xyxy = np.concatenate([g[:, :2], g[:, :2] + g[:, 2:]], axis=1)
        return native.bb_iou(d_xyxy, g_xyxy, iscrowd.astype(np.uint8))
    dts = [_decompress(r) for r in dt]
    gts = [_decompress(r) for r in gt]
    out = np.zeros((len(dts), len(gts)))
    for i, dr in enumerate(dts):
        for j, gr in enumerate(gts):
            out[i, j] = native.rle_iou(dr, gr, bool(iscrowd[j]))
    return out


def frPyObjects(objs, h: int, w: int):
    """Polygons / xywh boxes / uncompressed RLEs → compressed RLE(s)."""
    if isinstance(objs, (list, tuple)) and objs and isinstance(
        objs[0], (list, tuple, np.ndarray)
    ):
        return [frPyObjects(o, h, w) for o in objs]
    if isinstance(objs, dict):
        return _compress(_decompress(objs))
    arr = np.asarray(objs, np.float64).reshape(-1)
    if arr.size == 4:
        return _compress(native.rle_from_bbox(arr, h, w))
    return _compress(native.rle_from_poly(arr, h, w))
