"""Pallas TPU greedy-NMS kernel (fixpoint formulation).

Device-kernel counterpart of the reference's CUDA NMS
(/root/reference/utils/nms/nms_kernel.cu:34-78: a tiled pairwise-IoU
bitmask kernel + host-side greedy scan). One grid cell per block of
(image, class) problems: the [K, K] pairwise-IoU suppression mask is
computed once into VMEM, then the greedy scan is resolved as a fixpoint
iteration — ``keep_i ← valid_i ∧ ¬∃j<i (IoU_ji>t ∧ keep_j)`` — whose unique
fixpoint is the greedy solution (see ``ct_tpu.ops.nms.nms_mask``). Each
sweep is a whole-tensor mask-and-reduce, so the kernel needs no per-row
dynamic indexing at all (the limitation that sank the previous K-step
scalar-scan kernel), and the suppression mask never leaves VMEM — unlike
the XLA formulation, which re-streams the [B·C, K, K] mask from HBM on
every sweep.

Candidates must be score-sorted descending per row, as in the XLA path.

Status (v5e, 2560×200 candidates, 90% valid): identical keep masks to the
XLA path at 4.8 ms vs 6.9 ms standalone — the kernel now beats the
compiler. Inside the full eval program the two are within noise (XLA
overlaps the mask stream with other work), so the simpler XLA formulation
remains the default; flip with ``batched_nms(use_pallas=True)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, out_ref, *, iou_threshold: float,
                pixel_offset: float, cells: int):
    def cell(c, _):
        b = boxes_ref[c]                       # [K, 4] f32, score-sorted
        valid = valid_ref[c]                   # [1, K] int32
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
        # sup[j, i] = 1 if keeping j (higher score, j < i) suppresses i
        sup = jnp.where((iou > iou_threshold) & (row < col), 1, 0)

        def cond(state):
            _, changed, it = state
            return (changed > 0) & (it < k)

        def body(state):
            keep, _, it = state                      # keep: [1, K]
            # suppressed_i = ∃j: sup[j,i] ∧ keep_j — one mask+reduce sweep
            suppressed = jnp.max(sup * keep[0][:, None], axis=0,
                                 keepdims=True)      # [1, K]
            new = valid * (1 - suppressed)
            changed = jnp.sum(jnp.abs(new - keep))
            return new, changed, it + 1

        keep, _, _ = jax.lax.while_loop(
            cond, body, (valid, jnp.int32(1), jnp.int32(0))
        )
        out_ref[c] = keep
        return 0

    jax.lax.fori_loop(0, cells, cell, 0)


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
    # block several (image, class) cells per grid step to amortize grid
    # overhead; [cells, K, K] int32 scratch stays well inside VMEM
    cells = 8
    while n % cells:
        cells //= 2
    grid = n // cells
    # masks carry a unit middle dim so every block dimension equals the
    # corresponding array dimension (Mosaic block-shape constraint)
    out = pl.pallas_call(
        functools.partial(
            _nms_kernel,
            iou_threshold=iou_threshold,
            pixel_offset=pixel_offset,
            cells=cells,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((cells, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cells, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cells, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 1, k), jnp.int32),
        interpret=interpret,
    )(boxes, valid.astype(jnp.int32)[:, None, :])
    return out[:, 0, :]
