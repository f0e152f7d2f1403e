"""ctypes bindings for the native host library (NMS, RLE/bbIoU).

The native layer mirrors the reference's C/Cython/CUDA extensions
(/root/reference/utils/nms/, /root/reference/utils/pycocotools/maskApi.c)
with C++ built by ``make`` (no pybind11 in this image — plain C ABI via
ctypes). If the shared library is missing, it is built on first use; if no
compiler is available, callers should fall back to the numpy oracles
(``ct_tpu.ops.nms.nms_numpy``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libctnative.so")
_lib: Optional[ctypes.CDLL] = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR], check=True,
                       capture_output=True, text=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native build failed: %s", e)
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    i = ctypes.c_int
    d = ctypes.c_double
    f = ctypes.c_float

    lib.ct_cpu_nms.restype = i
    lib.ct_cpu_nms.argtypes = [f32p, i, f, i32p]
    lib.ct_cpu_soft_nms.restype = i
    lib.ct_cpu_soft_nms.argtypes = [f32p, i, f, f, f, i, i32p]
    lib.ct_bb_iou.restype = None
    lib.ct_bb_iou.argtypes = [f32p, i, f32p, i, u8p, f32p]
    lib.ct_rle_encode.restype = i
    lib.ct_rle_encode.argtypes = [u8p, i, i, u32p, i]
    lib.ct_rle_decode.restype = None
    lib.ct_rle_decode.argtypes = [u32p, i, i, i, u8p]
    lib.ct_rle_area.restype = ctypes.c_uint64
    lib.ct_rle_area.argtypes = [u32p, i]
    lib.ct_rle_merge.restype = i
    lib.ct_rle_merge.argtypes = [u32p, i, u32p, i, i, i, i, u32p, i]
    lib.ct_rle_iou.restype = d
    lib.ct_rle_iou.argtypes = [u32p, i, u32p, i, i, i, i]
    lib.ct_rle_to_bbox.restype = None
    lib.ct_rle_to_bbox.argtypes = [u32p, i, i, i, f64p]
    lib.ct_rle_from_bbox.restype = i
    lib.ct_rle_from_bbox.argtypes = [f64p, i, i, u32p, i]
    lib.ct_rle_from_poly.restype = i
    lib.ct_rle_from_poly.argtypes = [f64p, i, i, i, u32p, i]
    lib.ct_rle_to_string.restype = i
    lib.ct_rle_to_string.argtypes = [u32p, i, ctypes.c_char_p, i]
    lib.ct_rle_from_string.restype = i
    lib.ct_rle_from_string.argtypes = [ctypes.c_char_p, i, u32p, i]
    lib.ct_bb_nms.restype = None
    lib.ct_bb_nms.argtypes = [f64p, i, d, u8p]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


# ---- NMS ------------------------------------------------------------------


def cpu_nms(dets: np.ndarray, thresh: float) -> list:
    """Greedy NMS over [N, 5] (x1,y1,x2,y2,score); +1 area convention.
    Falls back to the numpy oracle if the native lib is unavailable."""
    lib = load()
    dets = np.ascontiguousarray(dets, np.float32)
    if lib is None:
        from ct_tpu.ops.nms import nms_numpy

        return nms_numpy(dets, thresh)
    keep = np.empty(len(dets), np.int32)
    n = lib.ct_cpu_nms(dets, len(dets), thresh, keep)
    return keep[:n].tolist()


def cpu_soft_nms(dets: np.ndarray, iou_thresh: float = 0.3,
                 sigma: float = 0.5, score_thresh: float = 0.001,
                 method: int = 1) -> list:
    """Soft-NMS (0=hard, 1=linear, 2=gaussian); modifies scores in place."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    dets = np.ascontiguousarray(dets, np.float32)
    keep = np.empty(len(dets), np.int32)
    n = lib.ct_cpu_soft_nms(dets, len(dets), iou_thresh, sigma,
                            score_thresh, method, keep)
    return keep[:n].tolist()


def bb_iou(boxes_a: np.ndarray, boxes_b: np.ndarray,
           b_is_crowd: Optional[np.ndarray] = None) -> np.ndarray:
    """Pairwise IoU of xyxy boxes ([N,4]×[M,4] → [N,M])."""
    lib = load()
    a = np.ascontiguousarray(boxes_a, np.float32).reshape(-1, 4)
    b = np.ascontiguousarray(boxes_b, np.float32).reshape(-1, 4)
    crowd = np.ascontiguousarray(
        b_is_crowd if b_is_crowd is not None else np.zeros(len(b)), np.uint8
    )
    if lib is None:
        from ct_tpu.ops import boxes as B
        import jax.numpy as jnp

        return np.asarray(B.iou(jnp.asarray(a), jnp.asarray(b)))
    out = np.empty((len(a), len(b)), np.float32)
    lib.ct_bb_iou(a, len(a), b, len(b), crowd, out)
    return out


# ---- RLE ------------------------------------------------------------------


def rle_encode(mask: np.ndarray) -> dict:
    """Binary [H, W] mask → COCO-style RLE dict {'size': [h, w], 'counts'}."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    h, w = mask.shape
    col_major = np.ascontiguousarray(mask.T.reshape(-1), np.uint8)
    cap = h * w + 2
    cnts = np.empty(cap, np.uint32)
    m = lib.ct_rle_encode(col_major, h, w, cnts, cap)
    return {"size": [h, w], "counts": cnts[:m].copy()}


def rle_decode(rle: dict) -> np.ndarray:
    lib = load()
    h, w = rle["size"]
    cnts = np.ascontiguousarray(rle["counts"], np.uint32)
    mask = np.empty(h * w, np.uint8)
    lib.ct_rle_decode(cnts, len(cnts), h, w, mask)
    return mask.reshape(w, h).T


def rle_area(rle: dict) -> int:
    cnts = np.ascontiguousarray(rle["counts"], np.uint32)
    return int(load().ct_rle_area(cnts, len(cnts)))


def rle_merge(a: dict, b: dict, intersect: bool = False) -> dict:
    lib = load()
    h, w = a["size"]
    ca = np.ascontiguousarray(a["counts"], np.uint32)
    cb = np.ascontiguousarray(b["counts"], np.uint32)
    cap = len(ca) + len(cb) + 2
    out = np.empty(cap, np.uint32)
    m = lib.ct_rle_merge(ca, len(ca), cb, len(cb), h, w, int(intersect),
                         out, cap)
    return {"size": [h, w], "counts": out[:m].copy()}


def rle_iou(a: dict, b: dict, iscrowd: bool = False) -> float:
    lib = load()
    h, w = a["size"]
    ca = np.ascontiguousarray(a["counts"], np.uint32)
    cb = np.ascontiguousarray(b["counts"], np.uint32)
    return float(lib.ct_rle_iou(ca, len(ca), cb, len(cb), h, w,
                                int(iscrowd)))


def rle_to_bbox(rle: dict) -> np.ndarray:
    lib = load()
    h, w = rle["size"]
    cnts = np.ascontiguousarray(rle["counts"], np.uint32)
    bb = np.empty(4, np.float64)
    lib.ct_rle_to_bbox(cnts, len(cnts), h, w, bb)
    return bb


def rle_from_bbox(bbox_xywh, h: int, w: int) -> dict:
    lib = load()
    bb = np.ascontiguousarray(bbox_xywh, np.float64)
    cap = h * w + 2
    out = np.empty(cap, np.uint32)
    m = lib.ct_rle_from_bbox(bb, h, w, out, cap)
    return {"size": [h, w], "counts": out[:m].copy()}


def rle_from_poly(xy_pairs, h: int, w: int) -> dict:
    lib = load()
    xy = np.ascontiguousarray(xy_pairs, np.float64).reshape(-1)
    k = len(xy) // 2
    cap = h * w + 2
    out = np.empty(cap, np.uint32)
    m = lib.ct_rle_from_poly(xy, k, h, w, out, cap)
    return {"size": [h, w], "counts": out[:m].copy()}


def rle_to_string(rle: dict) -> bytes:
    lib = load()
    cnts = np.ascontiguousarray(rle["counts"], np.uint32)
    cap = 8 * len(cnts) + 16
    buf = ctypes.create_string_buffer(cap)
    n = lib.ct_rle_to_string(cnts, len(cnts), buf, cap)
    return buf.raw[:n]


def rle_from_string(s: bytes, h: int, w: int) -> dict:
    lib = load()
    cap = len(s) + 2
    out = np.empty(cap, np.uint32)
    m = lib.ct_rle_from_string(s, len(s), out, cap)
    return {"size": [h, w], "counts": out[:m].copy()}


def bb_nms(bbs_xywh: np.ndarray, thresh: float) -> np.ndarray:
    lib = load()
    bbs = np.ascontiguousarray(bbs_xywh, np.float64).reshape(-1, 4)
    keep = np.empty(len(bbs), np.uint8)
    lib.ct_bb_nms(bbs, len(bbs), thresh, keep)
    return keep.astype(bool)
