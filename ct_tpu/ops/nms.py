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
    """Greedy suppression over score-sorted candidates → keep mask [K].

    Exact greedy NMS via fixpoint iteration instead of a K-step scalar
    loop: iterate ``keep_i ← valid_i ∧ ¬∃j<i (IoU_ji>t ∧ keep_j)``. The
    greedy solution is the unique fixpoint of that recurrence (induction
    on i), and each sweep finalizes one more level of the suppression
    chain, so the loop exits after (longest chain) iterations — a handful
    in practice vs K=200 sequential steps — with every sweep one big
    vectorized [K,K] mask reduction. Under vmap, all (batch × class)
    problems share the sweep, so the trip count is the max chain depth
    over the whole batch.
    """
    k = boxes.shape[0]
    iou = _pairwise_iou_offset(boxes, pixel_offset)
    idx = jnp.arange(k)
    # sup[j, i]: candidate j (higher score, j < i) can suppress i
    sup = (iou > iou_threshold) & (idx[:, None] < idx[None, :])
    # materialize: without the barrier XLA fuses the whole IoU computation
    # into the while body and recomputes it EVERY sweep (profiled at
    # 0.47 ms × ~10 sweeps per serving batch-128; the pred mask read is
    # ~10× cheaper than the f32 IoU recompute)
    sup = jax.lax.optimization_barrier(sup)

    def cond(state):
        _, changed, it = state
        return changed & (it < k)

    def body(state):
        keep, _, it = state
        suppressed = (sup & keep[:, None]).any(axis=0)
        new = valid & ~suppressed
        return new, (new != keep).any(), it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (valid, jnp.asarray(True), jnp.asarray(0))
    )
    return keep


def grouped_topk(x: jnp.ndarray, k: int, passes: int = 6,
                 group: int = 128) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate top-k over the last axis via per-group max passes.

    Splits the axis into lane-width groups and extracts the ``passes``
    largest elements of each group with argmax+mask sweeps (pure VPU work),
    then runs an exact top-k over the ``groups × passes`` survivors. An
    element of the true top-k is missed only if its group holds more than
    ``passes`` of the true top-k, so any set of ≤ ``passes`` strong scores
    per group — e.g. the tens of real detections a trained model produces
    per class — is recovered exactly; only the near-threshold tail of the
    k=200 candidate list can lose members (measured recall ≈ 0.97 on
    worst-case uniform scores).

    Exists because on the current TPU toolchain both ``lax.top_k`` and
    ``lax.approx_max_k`` lower to a full O(P log P) sort (19 ms for
    [128,20,11620] — profiled), while this runs in ~2 ms of bandwidth-bound
    sweeps.
    """
    p = x.shape[-1]
    groups = -(-p // group)
    if passes * groups < k:
        return jax.lax.top_k(x, k)
    pad = groups * group - p
    xg = jnp.pad(
        x, [(0, 0)] * (x.ndim - 1) + [(0, pad)],
        constant_values=-jnp.inf,
    ).reshape(*x.shape[:-1], groups, group)
    # gather-free sweeps: values via max, indices via arithmetic on argmax,
    # masking via iota-compare (TPU gathers are ~100x slower than reduces)
    goff = jnp.arange(groups, dtype=jnp.int32) * group
    lane = jax.lax.broadcasted_iota(jnp.int32, xg.shape, xg.ndim - 1)
    vals, idxs = [], []
    for _ in range(passes):
        i = jnp.argmax(xg, axis=-1)                     # [..., groups]
        vals.append(jnp.max(xg, axis=-1))
        idxs.append(goff + i.astype(jnp.int32))
        xg = jnp.where(lane == i[..., None], -jnp.inf, xg)
    cv = jnp.concatenate(vals, -1)                  # [..., groups*passes]
    ci = jnp.concatenate(idxs, -1)
    tv, ti = jax.lax.top_k(cv, k)
    return tv, jnp.minimum(jnp.take_along_axis(ci, ti, -1), p - 1)


class Detections(NamedTuple):
    """Fixed-shape detection results.

    boxes  [B, D, 4] float32 (same coords as input boxes)
    scores [B, D]    float32
    classes[B, D]    int32   (1-based, background = 0 never emitted)
    valid  [B, D]    bool
    D = min((num_classes-1) × top_k, max_per_image + 32), score-sorted per
    image (the +32 slack keeps kth-score ties like the reference's `>=`).
    """

    boxes: jnp.ndarray
    scores: jnp.ndarray
    classes: jnp.ndarray
    valid: jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=(
        "score_threshold", "iou_threshold", "top_k", "max_per_image",
        "pixel_offset", "approx_top_k", "use_pallas", "pool_size",
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
    pool_size: int = 0,
) -> Detections:
    """Per-class NMS + per-image score cap, fully batched, static shapes.

    Semantics follow the reference eval loop (test.py:142-161): per
    foreground class, candidates above ``score_threshold`` are suppressed at
    ``iou_threshold``; surviving detections across classes are capped at the
    ``max_per_image`` highest scores (ties kept, `>=` comparison).

    ``approx_top_k`` selects per-class candidates with ``grouped_topk``
    (recall ≈0.97 uniform / ≈1.0 on trained-model score distributions,
    final candidates exactly sorted) — ~10x faster than the full sort both
    ``lax.top_k`` and ``lax.approx_max_k`` lower to on the current TPU
    toolchain. Keep exact for parity runs.

    ``pool_size`` (serving): first restrict each image to its ``pool_size``
    highest-max-class-score priors with ONE small row gather, then run all
    per-class work inside the pool — per-class candidate boxes come from a
    one-hot contraction on the MXU instead of the [B, C·K]-row gather of
    the exact path ([B,C,K]-row gathers of 4-float rows are latency-bound
    on TPU; profiled at 6.5 ms/batch-128). Boxes are shared across classes
    (SSD decodes one box per prior), so pooling loses a candidate only when
    an image has > ``pool_size`` priors above threshold in *some* class
    that are all outranked on their own max class. 0 = exact path.
    """
    num_classes = scores.shape[-1]
    batch = boxes.shape[0]

    def select(cls_scores, img_boxes):
        # [P] scores, [P, 4] boxes → top-K candidates (sorted desc)
        s = jnp.where(cls_scores > score_threshold, cls_scores, -jnp.inf)
        if approx_top_k:
            top_s, top_i = grouped_topk(s, top_k)
        else:
            top_s, top_i = jax.lax.top_k(s, top_k)
        return img_boxes[top_i], top_s

    if pool_size:
        m = min(pool_size, boxes.shape[1])
        fg_scores = scores[:, :, 1:]                         # [B, P, C-1]
        best = jnp.max(fg_scores, axis=-1)                   # [B, P]
        best = jnp.where(best > score_threshold, best, -jnp.inf)
        _, pool_i = grouped_topk(best, m)                    # [B, M]
        # one combined row gather (boxes ‖ scores) per pooled prior
        payload = jnp.concatenate([boxes, fg_scores], axis=-1)
        pooled = jnp.take_along_axis(payload, pool_i[..., None], axis=1)
        pool_boxes = pooled[..., :4]                         # [B, M, 4]
        pool_fg = jnp.moveaxis(pooled[..., 4:], -1, 1)       # [B, C-1, M]
        s = jnp.where(pool_fg > score_threshold, pool_fg, -jnp.inf)
        k = min(top_k, m)
        cs, top_i = jax.lax.top_k(s, k)                      # [B, C-1, K]
        # candidate boxes via one-hot contraction over the pool (MXU work,
        # no per-class gathers)
        onehot = (
            top_i[..., None]
            == jnp.arange(m, dtype=jnp.int32)[None, None, None, :]
        ).astype(pool_boxes.dtype)                           # [B, C-1, K, M]
        cb = jnp.einsum("bckm,bmf->bckf", onehot, pool_boxes,
                        preferred_element_type=jnp.float32)
        if k < top_k:  # tiny-P tests: keep the output shape contract
            pad = top_k - k
            cb = jnp.pad(cb, ((0, 0), (0, 0), (0, pad), (0, 0)))
            cs = jnp.pad(cs, ((0, 0), (0, 0), (0, pad)),
                         constant_values=-jnp.inf)
    else:
        fg = jnp.moveaxis(scores[:, :, 1:], -1, 1)           # [B, C-1, P]
        cb, cs = jax.vmap(jax.vmap(select, in_axes=(0, None)))(
            fg, boxes
        )                                    # [B, C-1, K, 4], [B, C-1, K]
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
        # per-image cap: keep scores >= max_per_image-th largest (`>=`
        # keeps kth-score ties, like the reference). Output is truncated
        # to cap + a tie slack instead of carrying all (C-1)*K rows —
        # exact-equal score ties beyond the slack are the only loss.
        cap = min(max_per_image, flat_s.shape[0])
        d = min(flat_s.shape[0], cap + 32)
        top_s, order = jax.lax.top_k(flat_s, d)  # sorted descending
        kth = jnp.where(jnp.isfinite(top_s[cap - 1]), top_s[cap - 1],
                        -jnp.inf)
        sel = jnp.where(top_s >= kth, top_s, -jnp.inf)
        return flat_b[order], sel, flat_c[order], jnp.isfinite(sel)

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
