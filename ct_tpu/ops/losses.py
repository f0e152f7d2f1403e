"""Batched SSD multibox loss with separate objectness head.

Behavioral parity target: the combined loss of the reference
(``/root/reference/layers/modules/multibox_loss_combined.py:42-124``):

  * smooth-L1 localization loss on positive anchors, weighted by per-anchor
    (mixup) weights;
  * 2-class objectness cross-entropy with 3:1 hard negative mining, negatives
    ranked by their unweighted CE with positives/ignored zeroed out;
  * source-class cross-entropy on the *combined* logit
    ``[obj_bg + logsumexp(conf), obj_fg + conf_k]`` over positives+negatives;
  * all three normalized by N = Σ_image floor(Σ weighted positives).

Everything is vectorized over [B, P] with static shapes — the masked-gather
formulations of the reference (``loc_data[pos]`` etc.) become multiply-by-mask
reductions, which XLA fuses into the surrounding elementwise work. Ignored
anchors (label -1) are excluded from all three losses exactly as in the
reference (they are neither positives nor ranked as negatives).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ct_tpu.ops.matching import MatchResult


def smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    """Huber loss with beta=1 (torch smooth_l1_loss default)."""
    ax = jnp.abs(x)
    return jnp.where(ax < 1.0, 0.5 * ax * ax, ax - 0.5)


def _ce_from_logits(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element cross entropy: logsumexp(logits) - logits[label].

    The label pick is an iota-compare reduction, not take_along_axis: TPU
    gathers (and the scatters in their backward) are ~100x slower than the
    fused compare+select+reduce (profiled 18 ms/step at batch 64).
    """
    lse = jax.nn.logsumexp(logits, axis=-1)
    classes = jax.lax.broadcasted_iota(jnp.int32, logits.shape,
                                       logits.ndim - 1)
    picked = jnp.sum(
        jnp.where(classes == labels[..., None].astype(jnp.int32),
                  logits, 0.0),
        axis=-1,
    )
    return lse - picked


def multibox_loss_sums(
    loc_p: jnp.ndarray,    # [B, P, 4]
    conf_p: jnp.ndarray,   # [B, P, C]   source-class logits (no background)
    obj_p: jnp.ndarray,    # [B, P, 2]   objectness logits
    targets: MatchResult,  # matched targets from ops.matching
    neg_pos_ratio: int = 3,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Unnormalized loss sums plus the positive-count normalizer N.

    Exposed separately so a data-parallel caller can ``psum`` both across
    shards before dividing (the reference normalizes by the *global* batch's
    N, multibox_loss_combined.py:119-122).
    """
    loc_t, cls_t, w_t, obj_t = targets
    num_priors = loc_p.shape[1]

    pos = cls_t > 0                                        # [B, P]
    posf = pos.astype(loc_p.dtype)
    # reference floors the weighted positive count per image (.long() cast)
    num_pos = jnp.floor(jnp.sum(w_t * posf, axis=1))       # [B]

    # --- localization: smooth-L1 on positives, weighted -------------------
    loss_l = jnp.sum(
        jnp.sum(smooth_l1(loc_p - loc_t), axis=-1) * w_t * posf
    )

    # --- objectness with hard negative mining -----------------------------
    obj_label = obj_t.astype(jnp.int32)
    ce_obj = _ce_from_logits(obj_p, obj_label)             # [B, P]
    rank_loss = jnp.where(obj_t, 0.0, ce_obj)
    # rank of each anchor in descending loss order (double argsort)
    order = jnp.argsort(-rank_loss, axis=1)
    rank = jnp.argsort(order, axis=1)
    num_neg = jnp.clip(
        neg_pos_ratio * num_pos, max=num_priors - 1
    )                                                      # [B]
    neg = rank < num_neg[:, None]
    mask = pos | neg
    maskf = mask.astype(loc_p.dtype)
    loss_obj = jnp.sum(ce_obj * w_t * maskf)

    # --- source-class CE on the combined logit ----------------------------
    logit_bg = obj_p[..., 0] + jax.nn.logsumexp(conf_p, axis=-1)
    logit_fg = obj_p[..., 1:2] + conf_p                    # [B, P, C]
    logits = jnp.concatenate([logit_bg[..., None], logit_fg], axis=-1)
    safe_cls = jnp.clip(cls_t, min=0)  # masked-out -1 labels never contribute
    ce_cls = _ce_from_logits(logits, safe_cls)
    loss_c = jnp.sum(ce_cls * w_t * maskf)

    sums = {
        "loss_box_reg": loss_l,
        "loss_cls": loss_c,
        "loss_obj": loss_obj,
    }
    return sums, jnp.sum(num_pos)


def multibox_loss(
    loc_p: jnp.ndarray,
    conf_p: jnp.ndarray,
    obj_p: jnp.ndarray,
    targets: MatchResult,
    neg_pos_ratio: int = 3,
    axis_name: str | None = None,
) -> Dict[str, jnp.ndarray]:
    """N-normalized multibox loss dict. With ``axis_name`` (inside
    shard_map/pmap) the sums and N are psummed over the data axis first, so
    every shard sees the global-batch loss."""
    sums, n = multibox_loss_sums(loc_p, conf_p, obj_p, targets,
                                 neg_pos_ratio)
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
        n = jax.lax.psum(n, axis_name)
    n = jnp.maximum(n, 1.0)
    return {k: v / n for k, v in sums.items()}
