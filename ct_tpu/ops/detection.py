"""Test-time detection: batched decode + obj×conf score fusion + NMS.

Behavioral parity target: ``Detect.forward``
(/root/reference/layers/functions/detection.py:18-55) followed by the
per-class threshold/NMS/top-200 loop in the eval harness
(/root/reference/test.py:142-161) — here a single jitted batched pass.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ct_tpu.ops import boxes as box_ops
from ct_tpu.ops.nms import Detections, batched_nms


def fuse_scores(conf_probs: jnp.ndarray, obj_probs: jnp.ndarray) -> jnp.ndarray:
    """[B,P,C]×[B,P,2] → [B,P,C+1]: [obj_bg, obj_fg·conf_k]."""
    fg = obj_probs[..., 1:2] * conf_probs
    return jnp.concatenate([obj_probs[..., 0:1], fg], axis=-1)


@functools.partial(jax.jit, static_argnames=("variances",))
def decode_and_fuse(
    loc: jnp.ndarray,          # [B, P, 4] raw regressions
    conf_probs: jnp.ndarray,   # [B, P, C] softmaxed class scores
    obj_probs: jnp.ndarray,    # [B, P, 2] softmaxed objectness
    priors: jnp.ndarray,       # [P, 4] center-size form
    variances: Tuple[float, float] = (0.1, 0.2),
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """→ (boxes [B,P,4] point-form percent coords, scores [B,P,C+1])."""
    boxes = box_ops.decode(loc, priors, variances)
    return boxes, fuse_scores(conf_probs, obj_probs)


def postprocess(
    loc: jnp.ndarray,
    conf_probs: jnp.ndarray,
    obj_probs: jnp.ndarray,
    priors: jnp.ndarray,
    image_sizes: Optional[jnp.ndarray] = None,  # [B, 2] (height, width)
    variances: Tuple[float, float] = (0.1, 0.2),
    score_threshold: float = 0.01,
    iou_threshold: float = 0.45,
    top_k: int = 200,
    max_per_image: int = 200,
    approx_top_k: bool = False,
    use_pallas: bool = False,
    pool_size: int = 0,
) -> Detections:
    """Full eval-path post-processing for a batch, on device.

    If ``image_sizes`` is given, boxes are scaled to pixel coordinates
    before NMS (matching the reference, which runs NMS in pixel space with
    the +1 area convention, test.py:136-152); otherwise percent coords are
    kept and the +1 convention is dropped.
    """
    boxes, scores = decode_and_fuse(loc, conf_probs, obj_probs, priors,
                                    variances)
    if image_sizes is not None:
        h = image_sizes[:, 0:1].astype(jnp.float32)
        w = image_sizes[:, 1:2].astype(jnp.float32)
        scale = jnp.stack([w, h, w, h], axis=-1)        # [B, 1, 4]
        boxes = boxes * scale
        pixel_offset = 1.0
    else:
        pixel_offset = 0.0
    return batched_nms(
        boxes, scores,
        score_threshold=score_threshold,
        iou_threshold=iou_threshold,
        top_k=top_k,
        max_per_image=max_per_image,
        pixel_offset=pixel_offset,
        approx_top_k=approx_top_k,
        use_pallas=use_pallas,
        pool_size=pool_size,
    )
