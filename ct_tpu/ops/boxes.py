"""Pure-jnp box geometry: form conversion, IoU, variance encode/decode.

Behavioral parity targets (formulas, not code) from the reference:
``/root/reference/utils/box_utils.py`` — ``point_form`` (:5), ``center_size``
(:17), ``intersect``/``jaccard`` (:29-68), ``matrix_iou`` (:70), ``encode``
(:135), ``decode`` (:184).

All functions are shape-polymorphic over leading batch dims where noted and
contain no Python control flow, so they trace cleanly under jit/vmap.
Boxes are float32 throughout; box decode happens in float32 regardless of
compute dtype to keep box outputs bit-stable under XLA fusion.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def point_form(boxes: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) → (xmin, ymin, xmax, ymax). Shape [..., 4]."""
    center, size = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([center - size / 2, center + size / 2], axis=-1)


def center_size(boxes: jnp.ndarray) -> jnp.ndarray:
    """(xmin, ymin, xmax, ymax) → (cx, cy, w, h). Shape [..., 4]."""
    mins, maxs = boxes[..., :2], boxes[..., 2:]
    return jnp.concatenate([(maxs + mins) / 2, maxs - mins], axis=-1)


def intersect(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise intersection area. [A, 4] × [B, 4] → [A, B]."""
    max_xy = jnp.minimum(box_a[:, None, 2:], box_b[None, :, 2:])
    min_xy = jnp.maximum(box_a[:, None, :2], box_b[None, :, :2])
    inter = jnp.clip(max_xy - min_xy, min=0)
    return inter[..., 0] * inter[..., 1]


def iou(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU (jaccard overlap) of point-form boxes. → [A, B]."""
    inter = intersect(box_a, box_b)
    area_a = (box_a[:, 2] - box_a[:, 0]) * (box_a[:, 3] - box_a[:, 1])
    area_b = (box_b[:, 2] - box_b[:, 0]) * (box_b[:, 3] - box_b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / union


# alias matching the reference vocabulary
jaccard = iou


def matrix_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU variant used by the augmentation pipeline: intersection is zeroed
    (not clamped per-axis) when boxes do not overlap on every axis."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    area_i = jnp.prod(rb - lt, axis=2) * jnp.all(lt < rb, axis=2)
    area_a = jnp.prod(a[:, 2:] - a[:, :2], axis=1)
    area_b = jnp.prod(b[:, 2:] - b[:, :2], axis=1)
    return area_i / (area_a[:, None] + area_b[None, :] - area_i)


def encode(
    matched: jnp.ndarray,
    priors: jnp.ndarray,
    variances: Sequence[float] = (0.1, 0.2),
) -> jnp.ndarray:
    """Encode matched gt boxes (point form) against priors (center-size form)
    into regression targets. [..., P, 4] × [P, 4] → [..., P, 4]."""
    g_cxcy = (matched[..., :2] + matched[..., 2:]) / 2 - priors[..., :2]
    g_cxcy = g_cxcy / (variances[0] * priors[..., 2:])
    g_wh = (matched[..., 2:] - matched[..., :2]) / priors[..., 2:]
    g_wh = jnp.log(g_wh) / variances[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


def encode_multi(
    matched: jnp.ndarray,
    priors: jnp.ndarray,
    offsets: jnp.ndarray,
    variances: Sequence[float] = (0.1, 0.2),
) -> jnp.ndarray:
    """Offset-anchored encode variant (API parity with the reference's
    unused ``encode_multi``, box_utils.py:159-181)."""
    g_cxcy = (
        (matched[..., :2] + matched[..., 2:]) / 2
        - priors[..., :2] - offsets[..., :2]
    ) / (variances[0] * offsets[..., 2:])
    g_wh = (matched[..., 2:] - matched[..., :2]) / priors[..., 2:]
    g_wh = jnp.log(g_wh) / variances[1]
    return jnp.concatenate([g_cxcy, g_wh], axis=-1)


def decode_multi(
    loc: jnp.ndarray,
    priors: jnp.ndarray,
    offsets: jnp.ndarray,
    variances: Sequence[float] = (0.1, 0.2),
) -> jnp.ndarray:
    """Offset-anchored decode variant (API parity with the reference's
    unused ``decode_multi``, box_utils.py:204-222)."""
    centers = (
        priors[..., :2] + offsets[..., :2]
        + loc[..., :2] * variances[0] * offsets[..., 2:]
    )
    sizes = priors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    mins = centers - sizes / 2
    return jnp.concatenate([mins, mins + sizes], axis=-1)


def decode(
    loc: jnp.ndarray,
    priors: jnp.ndarray,
    variances: Sequence[float] = (0.1, 0.2),
) -> jnp.ndarray:
    """Decode loc regressions against priors back to point-form boxes.

    [..., P, 4] × [P, 4] → [..., P, 4]; computed in float32.
    """
    loc = loc.astype(jnp.float32)
    priors = priors.astype(jnp.float32)
    centers = priors[..., :2] + loc[..., :2] * variances[0] * priors[..., 2:]
    sizes = priors[..., 2:] * jnp.exp(loc[..., 2:] * variances[1])
    mins = centers - sizes / 2
    maxs = mins + sizes
    return jnp.concatenate([mins, maxs], axis=-1)
