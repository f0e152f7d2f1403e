"""OBJ_Target prototype initialization from source-class embeddings.

Behavioral parity target: ``init_reweight`` (/root/reference/
train.py:252-286): run ``init_iter`` forward-only batches, match priors to
GT, collect each positive anchor's pre-CT conf feature vector, L2-normalize
each vector, average per class, renormalize the class means, and install
them as the OBJ_Target rows (incremental setting keeps only the 5 novel
classes' rows, train.py:281-282).

TPU-native formulation: instead of boolean-indexed gathers per class (ragged),
each batch contributes a per-class (sum, count) pair via one masked einsum —
fixed shapes, fully on device; only the tiny [C, D] accumulators come home.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ct_tpu.config import TaskSpec
from ct_tpu.models.rfbnet import RFBNet
from ct_tpu.ops.matching import match_batch
from ct_tpu.train.step import TrainState


def make_accumulate_step(
    net: RFBNet,
    priors_cs: jnp.ndarray,
    num_fg_classes: int,
    match_threshold: float = 0.5,
):
    """Jitted: one batch → (per-class summed normalized embeddings [C, D],
    per-class positive counts [C], updated batch_stats).

    The forward runs in TRAIN mode: the reference calls
    ``model(data, init=True)`` while ``model.train()`` is active
    (/root/reference/train.py:263 inside ``train()``), so BatchNorm
    normalizes with batch statistics and updates its running averages
    (momentum 0.01) — both effects are reproduced here."""

    @jax.jit
    def step(params, batch_stats, batch):
        preds, mutated = net.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"], train=True, mutable=["batch_stats"],
        )
        matched = match_batch(
            batch["boxes"], batch["labels"], batch["weights"],
            batch["valid"], priors_cs, match_threshold,
        )
        feats = preds.conf_feat                      # [B, P, D]
        norm = jnp.linalg.norm(feats, axis=-1, keepdims=True)
        unit = feats / jnp.maximum(norm, 1e-12)
        # one-hot over classes 1..C → [B, P, C]
        onehot = jax.nn.one_hot(
            matched.cls_t - 1, num_fg_classes, dtype=feats.dtype
        ) * (matched.cls_t > 0)[..., None]
        sums = jnp.einsum("bpc,bpd->cd", onehot, unit)
        counts = jnp.sum(onehot, axis=(0, 1))
        return sums, counts, mutated["batch_stats"]

    return step


def init_reweight(
    args: Any,
    net: RFBNet,
    state: TrainState,
    loader,
    priors_cs: jnp.ndarray,
    task: TaskSpec,
    logger=None,
) -> TrainState:
    """Compute and install OBJ_Target from ``args.init_iter`` batches."""
    if logger:
        logger.info("Initializing the OBJ_Target parameters...")
    num_fg = task.num_classes - 1 if task.setting == "transfer" else 20
    # incre: the conf head has 15 source dims but labels span 20 classes;
    # the reference accumulates all 20 then keeps the last (novel) 5
    num_classes_total = 20 if task.setting == "incre" else num_fg

    step = make_accumulate_step(
        net, priors_cs, num_classes_total
    )
    d = task.src_cls_dim
    sums = jnp.zeros((num_classes_total, d))
    counts = jnp.zeros((num_classes_total,))
    batch_stats = state.batch_stats
    for _ in range(args.init_iter):
        batch = loader.next()
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        s, c, batch_stats = step(state.params, batch_stats, batch)
        sums = sums + s
        counts = counts + c

    means = np.asarray(sums) / np.maximum(np.asarray(counts)[:, None], 1)
    if task.setting == "incre":
        means = means[15:]
    norms = np.linalg.norm(means, axis=1, keepdims=True)
    prototypes = means / np.maximum(norms, 1e-12)

    params = dict(state.params)
    assert params["OBJ_Target"].shape == prototypes.shape, (
        params["OBJ_Target"].shape, prototypes.shape)
    params["OBJ_Target"] = jnp.asarray(prototypes, dtype=jnp.float32)
    return TrainState(params, batch_stats, state.opt_state, state.step)
