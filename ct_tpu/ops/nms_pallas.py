"""Pallas TPU greedy-NMS kernel.

Device-kernel counterpart of the reference's CUDA NMS
(/root/reference/utils/nms/nms_kernel.cu:34-78: a tiled pairwise-IoU
bitmask kernel + host-side greedy scan). On TPU the whole thing stays in
VMEM: one grid cell per (image, class) computes the [K, K] pairwise-IoU
suppression mask with VPU broadcasts and resolves the greedy scan with a
K-step `fori_loop` — no host round trip, no bitmask materialization in HBM.

This fuses what the XLA path (`ct_tpu.ops.nms.nms_mask` vmapped) expresses
as separate ops; candidates must be score-sorted descending, as there.

Status: produces detections identical to the XLA path on real v5e
hardware, but is currently *slower* end-to-end (202 ms vs 124 ms per
128-image batch): Mosaic does not lower ``dynamic_slice`` on values, so the
greedy scan reads keep[i]/suppress[i] via masked lane reductions — O(K³)
per cell instead of O(K²). The XLA formulation remains the production
default (``batched_nms(use_pallas=False)``); this kernel is the capability
demonstration and will win once per-row dynamic reads land in Mosaic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, out_ref, *, iou_threshold: float,
                pixel_offset: float):
    b = boxes_ref[0]                       # [K, 4] f32, score-sorted
    valid = valid_ref[0, 0]                # [K] int32 (1 = candidate)
    k = b.shape[0]

    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    area = (x2 - x1 + pixel_offset) * (y2 - y1 + pixel_offset)
    xx1 = jnp.maximum(x1[:, None], x1[None, :])
    yy1 = jnp.maximum(y1[:, None], y1[None, :])
    xx2 = jnp.minimum(x2[:, None], x2[None, :])
    yy2 = jnp.minimum(y2[:, None], y2[None, :])
    w = jnp.maximum(0.0, xx2 - xx1 + pixel_offset)
    h = jnp.maximum(0.0, yy2 - yy1 + pixel_offset)
    inter = w * h
    iou = inter / (area[:, None] + area[None, :] - inter)

    row = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # suppress[i, j] = 1 if keeping i would suppress later candidate j
    suppress = jnp.where(
        (iou > iou_threshold) & (col > row), 1, 0
    ).astype(jnp.int32)

    # greedy scan without dynamic indexing (Mosaic lowers neither
    # dynamic_slice on values nor 1-D iota): keep stays a [1, K] vector;
    # step i reads keep[i] via a masked lane reduction and applies row i of
    # the suppression matrix, selected the same way.
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, keep):
        keep_i = jnp.sum(jnp.where(lane == i, keep, 0))
        sup_row = jnp.sum(
            jnp.where(row == i, suppress, 0), axis=0, keepdims=True
        )                                   # [1, K]
        return keep * (1 - sup_row * keep_i)

    keep = jax.lax.fori_loop(0, k, body, valid[None, :] * 1)
    out_ref[0, 0] = keep[0]


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "pixel_offset", "interpret"),
)
def nms_pallas(
    boxes: jnp.ndarray,       # [N, K, 4] f32, score-sorted per row
    valid: jnp.ndarray,       # [N, K] bool/int — candidate mask
    iou_threshold: float = 0.45,
    pixel_offset: float = 1.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched greedy NMS → keep mask [N, K] (int32 0/1)."""
    n, k, _ = boxes.shape
    # masks carry a unit middle dim so every block dimension equals the
    # corresponding array dimension (Mosaic block-shape constraint)
    out = pl.pallas_call(
        functools.partial(
            _nms_kernel,
            iou_threshold=iou_threshold,
            pixel_offset=pixel_offset,
        ),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1, k), jnp.int32),
        interpret=interpret,
    )(boxes, valid.astype(jnp.int32)[:, None, :])
    return out[:, 0, :]
