"""Solver schedule parity, sharded train step, checkpointer semantics."""

import dataclasses
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import has_reference, import_reference
from ct_tpu.config import resolve_task
from ct_tpu.data.targets import pad_targets
from ct_tpu.models import build_net
from ct_tpu.ops.priors import prior_boxes
from ct_tpu.parallel import make_mesh, replicate, shard_batch
from ct_tpu.train.checkpointer import Checkpointer, PeriodicCheckpointer
from ct_tpu.train.sampler import TrainingSampler, batch_iterator
from ct_tpu.train.solver import (
    SolverConfig, build_optimizer, lr_multipliers, warmup_multistep_schedule,
)
from ct_tpu.train.step import TrainState, init_train_state, make_train_step


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_schedule_matches_reference_warmup_multistep():
    import torch

    import_reference()
    from utils.solver import WarmupMultiStepLR

    cfg = SolverConfig(lr=4e-3, steps=(60, 120), warmup_iters=30)
    sched = warmup_multistep_schedule(cfg)

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=cfg.lr, momentum=0.9)
    ref = WarmupMultiStepLR(opt, list(cfg.steps), warmup_iters=cfg.warmup_iters)

    ours, theirs = [], []
    for it in range(150):
        ours.append(float(sched(it)))
        theirs.append(opt.param_groups[0]["lr"])
        opt.step()
        ref.step()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_lr_multipliers_grouping():
    task = resolve_task(2, "transfer", "ours", "VOC")
    params = {
        "vgg_0": {"kernel": 0.0},
        "extras_1": {"branch0_0": {"conv": {"kernel": 0.0}}},
        "Norm": {"ConvLinear": {"conv": {"kernel": 0.0}}},
        "loc_0": {"kernel": 0.0},
        "theta": {"kernel": 0.0},
    }
    m = lr_multipliers(params, task)
    assert m["vgg_0"]["kernel"] == 0.1
    assert m["extras_1"]["branch0_0"]["conv"]["kernel"] == 0.5
    assert m["Norm"]["ConvLinear"]["conv"]["kernel"] == 0.5
    assert m["loc_0"]["kernel"] == 1.0
    assert m["theta"]["kernel"] == 1.0
    # phase 1: flat LRs
    m1 = lr_multipliers(params, resolve_task(1, "transfer", "ours", "VOC"))
    assert all(v == 1.0 for v in jax.tree_util.tree_leaves(m1))


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_sgd_update_matches_torch():
    """One SGD step (wd + momentum + lr) must equal torch.optim.SGD."""
    import torch

    task = resolve_task(1, "transfer", "ours", "VOC")
    cfg = SolverConfig(lr=0.01, steps=(1000,), warmup_iters=0)

    w0 = np.random.RandomState(0).randn(4, 3).astype(np.float32)
    g0 = np.random.RandomState(1).randn(4, 3).astype(np.float32)

    params = {"loc_0": {"kernel": jnp.asarray(w0)}}
    grads = {"loc_0": {"kernel": jnp.asarray(g0)}}
    tx = build_optimizer(params, task, cfg)
    opt_state = tx.init(params)
    import optax

    for _ in range(3):
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)

    tp = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    topt = torch.optim.SGD([tp], lr=cfg.lr, momentum=cfg.momentum,
                           weight_decay=cfg.weight_decay)
    for _ in range(3):
        topt.zero_grad()
        tp.grad = torch.from_numpy(g0.copy())
        topt.step()

    np.testing.assert_allclose(
        np.asarray(params["loc_0"]["kernel"]), tp.detach().numpy(),
        rtol=1e-5, atol=1e-6,
    )


def _tiny_batch(rng, b, size, max_objs=8):
    annos = []
    for _ in range(b):
        n = rng.randint(1, 4)
        mins = rng.uniform(0, 0.6, size=(n, 2))
        boxes = np.concatenate([mins, mins + 0.3], axis=1)
        lab = rng.randint(1, 15, size=(n, 1)).astype(np.float32)
        annos.append(np.hstack([boxes, lab, np.ones((n, 1))]).astype(np.float32))
    t = pad_targets(annos, max_objs)
    return {
        "image": rng.randn(b, size, size, 3).astype(np.float32),
        "boxes": t.boxes, "labels": t.labels,
        "weights": t.weights, "valid": t.valid,
    }


def test_train_step_descends_and_normalizes():
    """Single-device phase-2 train step: loss descends on a fixed batch and
    OBJ_Target rows are renormalized after each update."""
    from ct_tpu.config import VOC_300

    task = resolve_task(2, "transfer", "ours", "VOC")
    net = build_net(task, 300)
    priors = prior_boxes(VOC_300)
    cfg = SolverConfig(lr=1e-4, steps=(10**6,), warmup_iters=0)

    state = init_train_state(net, None, jax.random.PRNGKey(0), 300)
    tx = build_optimizer(state.params, task, cfg)
    state = TrainState(state.params, state.batch_stats, tx.init(state.params),
                       state.step)
    step_fn = make_train_step(net, priors, task, tx)

    batch = _tiny_batch(np.random.RandomState(1), b=2, size=300)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    losses = []
    for _ in range(3):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["total_loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 3
    norms = np.linalg.norm(np.asarray(state.params["OBJ_Target"]), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_train_step_dp8_tiny_exact_parity():
    """Ungated sharded-correctness check (fast: reduced-depth size-64 net).

    Runs the production shard_map DP train step over an 8-virtual-device
    mesh on a batch of 8 *identical* images/targets. Identical shards make
    per-shard BN statistics equal the global-batch statistics, so the
    sharded step must reproduce the single-device step exactly (up to f32
    reassociation): gradients psum to the global gradient, the loss
    normalizer N psums to the global N, and metrics psum to global sums.
    This keeps the shard_map+psum path exercised in default CI; semantics
    match the reference's DataParallel (/root/reference/train.py:296-297).
    """
    from ct_tpu.config import TINY_64

    task = resolve_task(2, "transfer", "ours", "VOC")
    net = build_net(task, 64)
    priors = prior_boxes(TINY_64)
    cfg = SolverConfig(lr=1e-3, steps=(10**6,), warmup_iters=0)

    s0 = init_train_state(net, None, jax.random.PRNGKey(0), 64)
    tx = build_optimizer(s0.params, task, cfg)
    p_np = jax.tree_util.tree_map(np.asarray, s0.params)
    b_np = jax.tree_util.tree_map(np.asarray, s0.batch_stats)

    def fresh():
        p = jax.tree_util.tree_map(jnp.asarray, p_np)
        return TrainState(p, jax.tree_util.tree_map(jnp.asarray, b_np),
                          tx.init(p), jnp.asarray(0, np.int32))

    one = _tiny_batch(np.random.RandomState(0), b=1, size=64)
    batch_np = {k: np.repeat(v, 8, axis=0) for k, v in one.items()}

    step1 = make_train_step(net, priors, task, tx)
    s = fresh()
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    s, m1 = step1(s, batch)

    mesh = make_mesh()
    assert mesh.devices.size == 8
    step8 = make_train_step(net, priors, task, tx, mesh=mesh)
    s8, m8 = step8(replicate(mesh, fresh()), shard_batch(mesh, batch_np))

    for k in m1:
        np.testing.assert_allclose(float(m8[k]), float(m1[k]), rtol=2e-4,
                                   err_msg=k)
    flat1 = jax.tree_util.tree_leaves_with_path(s.params)
    flat8 = dict(jax.tree_util.tree_leaves_with_path(s8.params))
    for path, v1 in flat1:
        np.testing.assert_allclose(
            np.asarray(flat8[path]), np.asarray(v1), rtol=5e-3, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )
    stats1 = jax.tree_util.tree_leaves_with_path(s.batch_stats)
    stats8 = dict(jax.tree_util.tree_leaves_with_path(s8.batch_stats))
    for path, v1 in stats1:
        np.testing.assert_allclose(
            np.asarray(stats8[path]), np.asarray(v1), rtol=1e-4, atol=1e-6,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.skipif(
    not os.environ.get("CT_TPU_SLOW_TESTS"),
    reason="~10 min CPU compile; mesh path is exercised ungated by "
           "test_train_step_dp8_tiny_exact_parity and by "
           "__graft_entry__.dryrun_multichip (set CT_TPU_SLOW_TESTS=1)",
)
def test_train_step_dp8_matches_single_device():
    """shard_map DP over 8 virtual devices reproduces the single-device
    loss trajectory (gradient psum + global-N normalization correctness)."""
    from ct_tpu.config import VOC_300

    task = resolve_task(1, "transfer", "ours", "VOC")
    net = build_net(task, 300)
    priors = prior_boxes(VOC_300)
    cfg = SolverConfig(lr=1e-3, steps=(10**6,), warmup_iters=0)

    s0 = init_train_state(net, None, jax.random.PRNGKey(0), 300)
    tx = build_optimizer(s0.params, task, cfg)
    p_np = jax.tree_util.tree_map(np.asarray, s0.params)
    b_np = jax.tree_util.tree_map(np.asarray, s0.batch_stats)

    def fresh():
        p = jax.tree_util.tree_map(jnp.asarray, p_np)
        return TrainState(p, jax.tree_util.tree_map(jnp.asarray, b_np),
                          tx.init(p), jnp.asarray(0, np.int32))

    batch_np = _tiny_batch(np.random.RandomState(0), b=8, size=300)

    step1 = make_train_step(net, priors, task, tx)
    s = fresh()
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    single = []
    for _ in range(3):
        s, m = step1(s, batch)
        single.append(float(m["total_loss"]))

    mesh = make_mesh()
    assert mesh.devices.size == 8
    step8 = make_train_step(net, priors, task, tx, mesh=mesh)
    s8 = replicate(mesh, fresh())
    b8 = shard_batch(mesh, batch_np)
    dp = []
    for _ in range(3):
        s8, m = step8(s8, b8)
        dp.append(float(m["total_loss"]))

    # per-shard BN statistics (batch/8 per device, like the reference's
    # per-GPU BN) cause bounded drift from the single-device trajectory;
    # descent itself is covered by test_train_step_descends_and_normalizes
    np.testing.assert_allclose(dp[0], single[0], rtol=2e-3)
    np.testing.assert_allclose(dp, single, rtol=0.25)


def test_checkpointer_roundtrip_and_semantics(tmp_path):
    ck = Checkpointer(str(tmp_path))
    params = {"loc_0": {"kernel": np.ones((2, 2), np.float32)}}
    stats = {"Norm": {"bn": {"mean": np.zeros(3, np.float32)}}}
    opt = {"trace": np.full(4, 2.0, np.float32)}
    ck.save("model_0000009", params, stats, opt, iteration=9)

    assert ck.has_checkpoint()
    assert ck.get_checkpoint_file().endswith("model_0000009.ckpt")

    # resume: restores optimizer + iteration
    out = ck.resume_or_load(None, params, stats, resume=True)
    assert out["iteration"] == 9
    np.testing.assert_array_equal(out["opt_state"]["trace"], opt["trace"])

    # weights-only load (phase-2 style): drops optimizer, iteration -1,
    # shape-mismatched keys fall back to init
    init_p = {"loc_0": {"kernel": np.zeros((5, 5), np.float32)}}
    out2 = ck.resume_or_load(
        str(tmp_path / "model_0000009.ckpt"), init_p, stats, resume=False
    )
    assert out2["iteration"] == -1 and out2["opt_state"] is None
    assert out2["params"]["loc_0"]["kernel"].shape == (5, 5)  # kept init

    # missing tag file tolerated
    os.remove(str(tmp_path / "last_checkpoint"))
    assert ck.get_checkpoint_file() is None


def test_periodic_checkpointer(tmp_path):
    ck = Checkpointer(str(tmp_path))
    pc = PeriodicCheckpointer(ck, period=5, max_iter=12)
    p = {"w": np.zeros(1, np.float32)}
    for it in range(12):
        pc.step(it, params=p, batch_stats={}, opt_state=None)
    names = sorted(os.listdir(tmp_path))
    assert "model_0000004.ckpt" in names
    assert "model_0000009.ckpt" in names
    assert "model_final.ckpt" in names


def test_sampler_infinite_shuffled():
    s = TrainingSampler(10, seed=0)
    it = batch_iterator(s, 4)
    seen = [next(it) for _ in range(6)]
    flat = [i for b in seen for i in b]
    assert len(flat) == 24
    assert set(flat) == set(range(10))  # cycles the whole dataset
    # deterministic under the same seed
    s2 = TrainingSampler(10, seed=0)
    it2 = batch_iterator(s2, 4)
    assert [next(it2) for _ in range(6)] == seen


def test_orbax_checkpointer_roundtrip(tmp_path):
    """Async orbax backend: save → wait → resume restores params,
    optimizer state (typed tree) and iteration."""
    import optax

    from ct_tpu.train.orbax_ckpt import OrbaxCheckpointer

    params = {"loc_0": {"kernel": np.arange(6, dtype=np.float32)
                        .reshape(2, 3)}}
    stats = {"Norm": {"bn": {"mean": np.ones(3, np.float32)}}}
    tx = optax.sgd(1e-2, momentum=0.9)
    opt = tx.init(params)

    ck = OrbaxCheckpointer(str(tmp_path / "orbax"))
    ck.save("model_0000009", params, stats, opt, iteration=9)
    ck.wait()
    assert ck.has_checkpoint()
    ck.close()

    ck2 = OrbaxCheckpointer(str(tmp_path / "orbax"))
    init_p = jax.tree_util.tree_map(np.zeros_like, params)
    init_s = jax.tree_util.tree_map(np.zeros_like, stats)
    out = ck2.resume(init_p, init_s, tx.init(init_p))
    np.testing.assert_array_equal(out["params"]["loc_0"]["kernel"],
                                  params["loc_0"]["kernel"])
    np.testing.assert_array_equal(out["batch_stats"]["Norm"]["bn"]["mean"],
                                  stats["Norm"]["bn"]["mean"])
    assert out["iteration"] == 9
    assert isinstance(out["opt_state"], type(opt))
    ck2.close()


def test_eval_step_dp8_tiny_exact_parity():
    """Sharded batched inference (shard_map DP over 8 virtual devices)
    must produce exactly the single-device detections: eval has no
    cross-image interaction, so sharding the batch is a pure partition.
    Covers `test.py --ndev N` (a TPU-native addition — the reference
    evaluates on one GPU, test.py:121-130)."""
    from ct_tpu.config import TINY_64
    from ct_tpu.train.step import make_eval_step

    task = resolve_task(2, "transfer", "ours", "VOC")
    net = build_net(task, 64)
    priors = prior_boxes(TINY_64)
    state = init_train_state(net, None, jax.random.PRNGKey(0), 64)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32) * 50)
    sizes = jnp.asarray(np.tile([480, 640], (8, 1)).astype(np.int32))

    one = make_eval_step(net, priors)
    d1 = one(state.params, state.batch_stats, images, sizes)

    mesh = make_mesh(8)
    d8 = make_eval_step(net, priors, mesh=mesh)(
        state.params, state.batch_stats, images, sizes)

    # selection structure must match exactly; box/score values reassociate
    # (the per-shard program tiles convs for batch 1, the single-device one
    # for batch 8), so f32 values match to rounding, not bit-for-bit
    np.testing.assert_array_equal(np.asarray(d1.valid), np.asarray(d8.valid))
    np.testing.assert_array_equal(np.asarray(d1.classes),
                                  np.asarray(d8.classes))
    np.testing.assert_allclose(np.asarray(d1.scores), np.asarray(d8.scores),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d1.boxes), np.asarray(d8.boxes),
                               rtol=1e-3, atol=0.5)
