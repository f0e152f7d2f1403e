"""Fused flat-vector SGD parity + gradient-accumulation exactness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ct_tpu.config import TINY_64, resolve_task
from ct_tpu.data.targets import pad_targets
from ct_tpu.models import build_net
from ct_tpu.ops.priors import prior_boxes
from ct_tpu.train.solver import (
    SolverConfig, build_fused_optimizer, build_optimizer,
)
from ct_tpu.train.step import TrainState, init_train_state, make_train_step


def _tiny_batch(rng, b, size=64, max_objs=8):
    annos = []
    for _ in range(b):
        n = rng.randint(1, 4)
        mins = rng.uniform(0, 0.5, size=(n, 2))
        boxes = np.concatenate([mins, mins + 0.4], axis=1)
        lab = rng.randint(1, 15, size=(n, 1)).astype(np.float32)
        annos.append(
            np.hstack([boxes, lab, np.ones((n, 1))]).astype(np.float32))
    t = pad_targets(annos, max_objs)
    return {
        "image": rng.randn(b, size, size, 3).astype(np.float32),
        "boxes": t.boxes, "labels": t.labels,
        "weights": t.weights, "valid": t.valid,
    }


@pytest.mark.parametrize("phase", [1, 2])
def test_fused_sgd_matches_per_leaf_chain(phase):
    """The flat fused update must reproduce the optax chain exactly
    (same math per element; phase 2 exercises the 0.1/0.5/1.0 LR groups)."""
    task = resolve_task(phase, "transfer", "ours", "VOC")
    net = build_net(task, 64)
    state = init_train_state(net, None, jax.random.PRNGKey(0), 64)
    cfg = SolverConfig(lr=2e-3, steps=(2,), warmup_iters=1)

    tx_ref = build_optimizer(state.params, task, cfg)
    tx_fused = build_fused_optimizer(state.params, task, cfg)

    opt_ref = tx_ref.init(state.params)
    opt_fused = tx_fused.init(state.params)

    key = jax.random.PRNGKey(7)
    p_ref = state.params
    p_fused = jax.tree_util.tree_map(jnp.copy, state.params)
    for it in range(4):  # crosses warmup end + milestone decay
        key, k = jax.random.split(key)
        leaves, treedef = jax.tree_util.tree_flatten(p_ref)
        gleaves = [
            jax.random.normal(jax.random.fold_in(k, i), l.shape) * 0.01
            for i, l in enumerate(leaves)
        ]
        grads = jax.tree_util.tree_unflatten(treedef, gleaves)

        u_ref, opt_ref = tx_ref.update(grads, opt_ref, p_ref)
        p_ref = jax.tree_util.tree_map(jnp.add, p_ref, u_ref)
        u_fused, opt_fused = tx_fused.update(grads, opt_fused, p_fused)
        p_fused = jax.tree_util.tree_map(jnp.add, p_fused, u_fused)

    ref = dict(jax.tree_util.tree_leaves_with_path(p_ref))
    for path, v in jax.tree_util.tree_leaves_with_path(p_fused):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref[path]), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(path))


def test_grad_accumulation_matches_big_batch_on_duplicated_halves():
    """With a batch whose two halves are identical, BatchNorm's batch
    statistics are the same for the full batch and each micro-batch, so
    accum=2 must reproduce the accum=1 step exactly (params + metrics;
    running stats get two EMA applications instead of one, by design)."""
    task = resolve_task(2, "transfer", "ours", "VOC")
    net = build_net(task, 64)
    priors = prior_boxes(TINY_64)
    cfg = SolverConfig(lr=1e-3, steps=(10**6,), warmup_iters=0)

    s0 = init_train_state(net, None, jax.random.PRNGKey(0), 64)
    tx = build_fused_optimizer(s0.params, task, cfg)
    # numpy copies: the train step donates its input state, so each run
    # needs fresh device buffers
    p_np = jax.tree_util.tree_map(np.asarray, s0.params)
    b_np = jax.tree_util.tree_map(np.asarray, s0.batch_stats)

    half = _tiny_batch(np.random.RandomState(0), b=2)
    batch = {k: jnp.asarray(np.concatenate([v, v], axis=0))
             for k, v in half.items()}

    def fresh():
        p = jax.tree_util.tree_map(jnp.asarray, p_np)
        return TrainState(p, jax.tree_util.tree_map(jnp.asarray, b_np),
                          tx.init(p), jnp.asarray(0, np.int32))

    step1 = make_train_step(net, priors, task, tx)
    step2 = make_train_step(net, priors, task, tx, accum_steps=2)

    sa, ma = step1(fresh(), batch)
    sb, mb = step2(fresh(), batch)

    for k in ma:
        np.testing.assert_allclose(float(mb[k]), float(ma[k]), rtol=2e-5,
                                   err_msg=k)
    ref = dict(jax.tree_util.tree_leaves_with_path(sa.params))
    for path, v in jax.tree_util.tree_leaves_with_path(sb.params):
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref[path]), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
