"""Jitted train/eval steps with data-parallel sharding over a device mesh.

Replaces the reference's Python train-loop body (/root/reference/
train.py:206-242: forward → loss → backward → SGD step → OBJ_Target
renormalization) with a single compiled SPMD program:

  * forward + vmapped matching + batched multibox loss + backward + SGD
    update + (phase-2 'ours') OBJ_Target row renormalization
    (reference ``model.normalize()``, RFB_Net_vgg.py:316-318) fuse into one
    XLA executable;
  * the batch is sharded over the mesh ``data`` axis via ``shard_map`` with
    explicit ``psum`` collectives over ICI for gradients and the loss
    normalizer N (shard_map compiles the per-device program once; GSPMD
    auto-partitioning of this model's full backward was measured at >25 min
    of compile time vs ~1 min for the shard_map formulation);
  * BatchNorm batch statistics are per-shard — matching the reference's
    per-GPU BN under ``DataParallel`` — with running stats ``pmean``-averaged
    across shards so the replicated state stays consistent.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ct_tpu.config import TaskSpec
from ct_tpu.models.rfbnet import RFBNet, eval_scores
from ct_tpu.ops.detection import postprocess
from ct_tpu.ops.losses import multibox_loss_sums
from ct_tpu.ops.matching import match_batch
from ct_tpu.parallel.mesh import DATA_AXIS


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray  # int32 scalar


def normalize_obj_target(params: Any) -> Any:
    """L2-normalize the OBJ_Target prototype rows (cosine classifier)."""
    w = params["OBJ_Target"]
    params = dict(params)
    params["OBJ_Target"] = w / jnp.linalg.norm(w, axis=1, keepdims=True)
    return params


def make_train_step(
    net: RFBNet,
    priors_cs: jnp.ndarray,
    task: TaskSpec,
    tx: optax.GradientTransformation,
    match_threshold: float = 0.5,
    mesh: Optional[Mesh] = None,
):
    """Build the compiled train step.

    batch: dict with 'image' [B,H,W,3] and padded targets 'boxes' [B,M,4],
    'labels' [B,M], 'weights' [B,M], 'valid' [B,M].
    """

    def loss_fn(params, batch_stats, batch, axis_name):
        preds, mutated = net.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["image"],
            train=True,
            mutable=["batch_stats"],
        )
        matched = match_batch(
            batch["boxes"], batch["labels"], batch["weights"],
            batch["valid"], priors_cs, match_threshold,
        )
        sums, n = multibox_loss_sums(preds.loc, preds.conf, preds.obj,
                                     matched)
        if axis_name is not None:
            # global normalizer; no grad path through n (counts only), so
            # the only collective in the backward is the grads psum below
            n = jax.lax.psum(n, axis_name)
        n = jnp.maximum(n, 1.0)
        local_losses = {k: v / n for k, v in sums.items()}
        total = (local_losses["loss_box_reg"] + local_losses["loss_cls"]
                 + local_losses["loss_obj"])
        return total, (local_losses, mutated["batch_stats"])

    def step_body(state: TrainState, batch, axis_name=None):
        (total, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, batch, axis_name)
        if axis_name is not None:
            # each shard holds d(global_loss)/dθ restricted to its local
            # batch terms; one psum over the data axis (ICI) completes it
            grads = jax.lax.psum(grads, axis_name)
            # metrics: shards hold local_sums/global_N → psum = global loss
            losses = jax.lax.psum(losses, axis_name)
            total = jax.lax.psum(total, axis_name)
            # running BN stats are per-shard (the reference's per-GPU BN);
            # average them so the replicated state stays consistent
            new_stats = jax.lax.pmean(new_stats, axis_name)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        if task.has_ct_head:
            params = normalize_obj_target(params)
        metrics = dict(losses, total_loss=total)
        return TrainState(params, new_stats, new_opt, state.step + 1), metrics

    if mesh is None:
        return jax.jit(step_body, donate_argnums=(0,))

    # shard_map: explicit per-device program + psum — compiles the
    # single-device graph once (GSPMD auto-partitioning of the full
    # backward is prohibitively slow to compile for this model)
    # NOTE: jax.shard_map (the new entry point) deadlocks the XLA-CPU
    # collective rendezvous on virtual-device meshes in jax 0.9.0; the
    # experimental entry point lowers the old way and works. Revisit on
    # upgrade.
    from jax.experimental.shard_map import shard_map

    batch_specs = {
        "image": P(DATA_AXIS), "boxes": P(DATA_AXIS),
        "labels": P(DATA_AXIS), "weights": P(DATA_AXIS),
        "valid": P(DATA_AXIS),
    }
    sharded = shard_map(
        functools.partial(step_body, axis_name=DATA_AXIS),
        mesh=mesh,
        in_specs=(TrainState(P(), P(), P(), P()), batch_specs),
        out_specs=(TrainState(P(), P(), P(), P()), P()),
        check_rep=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_eval_step(
    net: RFBNet,
    priors_cs: jnp.ndarray,
    score_threshold: float = 0.01,
    iou_threshold: float = 0.45,
    top_k: int = 200,
    max_per_image: int = 200,
    mesh: Optional[Mesh] = None,
    approx_top_k: bool = False,
    use_pallas_nms: bool = False,
    quant: Optional[Any] = None,
    pool_size: int = 0,
):
    """Compiled batched inference: forward → softmax → decode → NMS → cap.

    The reference evaluates one image per forward (test.py:121-130); this
    path is batched end-to-end and stays on device through NMS.

    ``quant``: an int8 'quant' collection (ct_tpu.models.quantize) for the
    serving path; requires a ``fold_bn=True`` net and folded params.
    """

    def step(params, batch_stats, images, image_sizes):
        variables = {"params": params, "batch_stats": batch_stats}
        if quant is not None:
            variables["quant"] = quant
        preds = net.apply(variables, images, train=False)
        conf, obj = eval_scores(preds)
        return postprocess(
            preds.loc, conf, obj, priors_cs,
            image_sizes=image_sizes,
            score_threshold=score_threshold,
            iou_threshold=iou_threshold,
            top_k=top_k,
            max_per_image=max_per_image,
            approx_top_k=approx_top_k,
            use_pallas=use_pallas_nms,
            pool_size=pool_size,
        )

    if mesh is None:
        return jax.jit(step)
    # NOTE: jax.shard_map (the new entry point) deadlocks the XLA-CPU
    # collective rendezvous on virtual-device meshes in jax 0.9.0; the
    # experimental entry point lowers the old way and works. Revisit on
    # upgrade.
    from jax.experimental.shard_map import shard_map

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS),
        check_rep=False,
    )
    return jax.jit(sharded)


def init_train_state(
    net: RFBNet,
    tx: Optional[optax.GradientTransformation],
    rng: jax.Array,
    image_size: int,
    batch_size: int = 1,
) -> TrainState:
    """Fresh model + optimizer state. ``tx=None`` defers optimizer init
    (useful when the optimizer itself needs the param tree to build its
    per-group LR multipliers)."""
    variables = net.init(
        rng, jnp.zeros((batch_size, image_size, image_size, 3)), train=False
    )
    params = variables["params"]
    return TrainState(
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(params) if tx is not None else None,
        step=jnp.asarray(0, jnp.int32),
    )
