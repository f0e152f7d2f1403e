"""Optimizer + LR schedule: SGD w/ momentum, per-group LRs, warmup multistep.

Behavioral parity targets: ``build_optimizer`` (/root/reference/utils/
solver.py:6-33) — phase-2 'ours' runs the VGG trunk at 0.1× LR and the
extras/Norm blocks at 0.5× — and ``WarmupMultiStepLR`` (:49-111) — linear
warmup from factor 1e-6 over ``warmup_iters`` then ×gamma at each milestone.

Torch-SGD semantics are preserved exactly: weight decay is added to the
gradient, momentum accumulates the decayed gradient, and the (per-group)
learning rate scales the velocity at application time — expressed here as an
optax chain ``add_decayed_weights → trace → per-leaf multiplier →
scale_by_schedule(-lr)``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax

from ct_tpu.config import TaskSpec


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    lr: float = 4e-3
    momentum: float = 0.9
    weight_decay: float = 5e-4
    gamma: float = 0.1
    steps: Sequence[int] = (120000, 150000)
    warmup_iters: int = 5000
    warmup_factor: float = 1e-6


def warmup_multistep_schedule(cfg: SolverConfig) -> optax.Schedule:
    milestones = jnp.asarray(sorted(cfg.steps))

    def schedule(count):
        count = jnp.asarray(count, jnp.float32)
        alpha = jnp.clip(count / cfg.warmup_iters, max=1.0)
        warm = jnp.where(
            count >= cfg.warmup_iters,
            1.0,
            cfg.warmup_factor * (1 - alpha) + alpha,
        )
        decays = jnp.sum(count >= milestones).astype(jnp.float32)
        return cfg.lr * warm * cfg.gamma ** decays

    return schedule


def lr_multipliers(params: Any, task: TaskSpec) -> Any:
    """Per-leaf LR multiplier pytree (reference solver.py:16-20)."""

    def mult_for(path) -> float:
        if not (task.phase == 2 and task.method == "ours"):
            return 1.0
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if top.startswith("vgg_"):
            return 0.1
        if top.startswith("extras_") or top == "Norm":
            return 0.5
        return 1.0

    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: mult_for(path), params
    )


def _scale_by_tree(multipliers: Any) -> optax.GradientTransformation:
    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return (
            jax.tree_util.tree_map(
                lambda u, m: u * m, updates, multipliers
            ),
            state,
        )

    return optax.GradientTransformation(init, update)


def build_optimizer(
    params: Any, task: TaskSpec, cfg: SolverConfig = SolverConfig()
) -> optax.GradientTransformation:
    schedule = warmup_multistep_schedule(cfg)
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay),
        optax.trace(decay=cfg.momentum, nesterov=False),
        _scale_by_tree(lr_multipliers(params, task)),
        optax.scale_by_schedule(lambda c: -schedule(c)),
    )


class FusedSGDState(NamedTuple):
    trace: jnp.ndarray  # [N] flat momentum buffer
    count: jnp.ndarray  # int32 schedule step


def build_fused_optimizer(
    params: Any, task: TaskSpec, cfg: SolverConfig = SolverConfig()
) -> optax.GradientTransformation:
    """``build_optimizer`` semantics over ONE flat parameter vector.

    NOTE (r5 A/B on v5e): inside one jitted train step the PER-LEAF chain
    is ~5.7 ms/step FASTER at batch 64 — XLA fuses the per-leaf update
    ops anyway, and this path's ravel_pytree of params+grads plus the
    unravel of the update adds ~2.4 GB of HBM traffic per step on the
    42M-param model. Production now defaults to ``build_optimizer``
    (train.py --fused-opt off); this variant remains for the multi-small-
    leaf regimes where per-leaf dispatch dominates. The update math:

        g ← g + wd·p ;  m ← μ·m + g ;  p ← p − lr(t)·mult ⊙ m

    with ``mult`` the per-element LR-group multiplier vector (reference
    solver.py:16-20 groups) materialized once at init. Bit-identical math
    to ``build_optimizer`` (same op order per element; concatenation does
    not change values) — pinned by a parity test.
    """
    from jax.flatten_util import ravel_pytree

    schedule = warmup_multistep_schedule(cfg)
    mult_tree = jax.tree_util.tree_map(
        lambda p, m: jnp.full(jnp.shape(p), m, jnp.float32),
        params, lr_multipliers(params, task),
    )
    mult_flat, _ = ravel_pytree(mult_tree)
    uniform = bool((mult_flat == mult_flat[0]).all())  # phase-1: all 1.0
    mult: Any = float(mult_flat[0]) if uniform else mult_flat

    def init(ps):
        flat, _ = ravel_pytree(ps)
        return FusedSGDState(
            trace=jnp.zeros_like(flat), count=jnp.zeros((), jnp.int32)
        )

    def update(updates, state, ps=None):
        g, _ = ravel_pytree(updates)
        p, unravel = ravel_pytree(ps)
        g = g + cfg.weight_decay * p
        m = cfg.momentum * state.trace + g
        u = (-schedule(state.count)) * (mult * m)
        return unravel(u), FusedSGDState(trace=m, count=state.count + 1)

    return optax.GradientTransformation(init, update)
