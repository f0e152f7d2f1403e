"""Batched fixed-shape NMS for TPU + numpy host oracle.

Replaces the reference's native NMS stack (Cython ``cpu_nms``, CUDA
``nms_kernel.cu`` — /root/reference/utils/nms/) and its per-image, per-class
Python loop (test.py:142-161) with one batched, static-shape device pass:

  scores [B, C, P] → per-class top-K candidate selection → pairwise-IoU
  greedy suppression (a K-step `fori_loop` over a [K, K] mask — the same
  bitmask formulation as the CUDA kernel, vectorized over classes and batch)
  → per-image top-`max_per_image` cap across classes.

Greedy NMS is inherently sequential in its keep decisions; K (candidates
per class) is small (≤ a few hundred), so the loop is cheap while all the
IoU work is one big vectorized computation that XLA maps onto the VPU.

The pixel `+1` area convention of the reference kernels
(``utils/nms/py_cpu_nms.py:17-21``) is preserved via ``pixel_offset``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _pairwise_iou_offset(boxes: jnp.ndarray, offset: float) -> jnp.ndarray:
    """[K, 4] → [K, K] IoU with the legacy +offset area convention."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + offset) * (y2 - y1 + offset)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + offset)
    h = jnp.maximum(0.0, yy2 - yy1 + offset)
    inter = w * h
    return inter / (area[:, None] + area[None, :] - inter)


def nms_mask(
    boxes: jnp.ndarray,     # [K, 4] sorted by descending score
    valid: jnp.ndarray,     # [K] bool — candidate mask
    iou_threshold: float,
    pixel_offset: float = 0.0,
) -> jnp.ndarray:
    """Greedy suppression over score-sorted candidates → keep mask [K]."""
    k = boxes.shape[0]
    iou = _pairwise_iou_offset(boxes, pixel_offset)
    idx = jnp.arange(k)
    suppress_later = (iou > iou_threshold) & (idx[None, :] > idx[:, None])

    def body(i, keep):
        sup = suppress_later[i] & keep[i]
        return keep & ~sup

    keep = jax.lax.fori_loop(0, k, body, valid)
    return keep


class Detections(NamedTuple):
    """Fixed-shape detection results.

    boxes  [B, D, 4] float32 (same coords as input boxes)
    scores [B, D]    float32
    classes[B, D]    int32   (1-based, background = 0 never emitted)
    valid  [B, D]    bool
    D = num_classes-1 (foreground classes) × top_k, score-sorted per image.
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=(
        "score_threshold", "iou_threshold", "top_k", "max_per_image",
        "pixel_offset", "approx_top_k", "use_pallas",
    ),
)
def batched_nms(
    boxes: jnp.ndarray,    # [B, P, 4]
    scores: jnp.ndarray,   # [B, P, C] incl. background at class 0
    score_threshold: float = 0.01,
    iou_threshold: float = 0.45,
    top_k: int = 200,
    max_per_image: int = 200,
    pixel_offset: float = 1.0,
    approx_top_k: bool = False,
    use_pallas: bool = False,
) -> Detections:
    """Per-class NMS + per-image score cap, fully batched, static shapes.

    Semantics follow the reference eval loop (test.py:142-161): per
    foreground class, candidates above ``score_threshold`` are suppressed at
    ``iou_threshold``; surviving detections across classes are capped at the
    ``max_per_image`` highest scores (ties kept, `>=` comparison).

    ``approx_top_k`` uses the TPU-optimized ``lax.approx_max_k`` (recall
    0.98, final candidates exactly sorted) for per-class candidate
    selection — ~2x faster selection with negligible mAP impact; keep exact
    for parity runs.
    """
    num_classes = scores.shape[-1]
    batch = boxes.shape[0]

    def select(cls_scores, img_boxes):
        # [P] scores, [P, 4] boxes → top-K candidates (sorted desc)
        s = jnp.where(cls_scores > score_threshold, cls_scores, -jnp.inf)
        if approx_top_k:
            top_s, top_i = jax.lax.approx_max_k(s, top_k,
                                                recall_target=0.98)
        else:
            top_s, top_i = jax.lax.top_k(s, top_k)
        return img_boxes[top_i], top_s

    fg = jnp.moveaxis(scores[:, :, 1:], -1, 1)               # [B, C-1, P]
    cb, cs = jax.vmap(jax.vmap(select, in_axes=(0, None)))(
        fg, boxes
    )                                        # [B, C-1, K, 4], [B, C-1, K]
    cand_valid = jnp.isfinite(cs)

    if use_pallas:
        from ct_tpu.ops.nms_pallas import nms_pallas

        keep = nms_pallas(
            cb.reshape(-1, top_k, 4), cand_valid.reshape(-1, top_k),
            iou_threshold, pixel_offset,
        ).reshape(cs.shape).astype(bool)
    else:
        keep = jax.vmap(jax.vmap(
            lambda b_, v_: nms_mask(b_, v_, iou_threshold, pixel_offset)
        ))(cb, cand_valid)
    cs = jnp.where(keep, cs, -jnp.inf)

    def per_image(flat_b, flat_s, flat_c):
        # per-image cap: keep scores >= max_per_image-th largest
        cap = min(max_per_image, flat_s.shape[0])
        kth = jax.lax.top_k(flat_s, cap)[0][-1]
        kth = jnp.where(jnp.isfinite(kth), kth, -jnp.inf)
        flat_s = jnp.where(flat_s >= kth, flat_s, -jnp.inf)
        # sort detections by score for a stable, truncatable output
        order = jnp.argsort(-flat_s)
        return (
            flat_b[order], flat_s[order], flat_c[order],
            jnp.isfinite(flat_s[order]),
        )

    c_ids = jnp.broadcast_to(
        jnp.arange(1, num_classes, dtype=jnp.int32)[None, :, None],
        cs.shape,
    )
    b, s, c, v = jax.vmap(per_image)(
        cb.reshape(batch, -1, 4), cs.reshape(batch, -1),
        c_ids.reshape(batch, -1),
    )
    return Detections(b, jnp.where(v, s, 0.0), jnp.where(v, c, 0), v)


# --------------------------------------------------------------------------
# Host oracle (numpy) — the correctness baseline for kernels and tests,
# fulfilling the role of the reference's pure-python NMS.
# --------------------------------------------------------------------------


def nms_numpy(
    dets: np.ndarray, thresh: float, pixel_offset: float = 1.0
) -> list:
    """Greedy NMS over [N, 5] (x1,y1,x2,y2,score) rows. Returns kept indices."""
    if len(dets) == 0:
        return []
    x1, y1, x2, y2, s = dets[:, 0], dets[:, 1], dets[:, 2], dets[:, 3], dets[:, 4]
    areas = (x2 - x1 + pixel_offset) * (y2 - y1 + pixel_offset)
    order = np.argsort(-s)
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        w = np.maximum(0.0, xx2 - xx1 + pixel_offset)
        h = np.maximum(0.0, yy2 - yy1 + pixel_offset)
        inter = w * h
        iou = inter / (areas[i] + areas[rest] - inter)
        order = rest[iou <= thresh]
    return keep
