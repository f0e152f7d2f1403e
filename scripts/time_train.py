#!/usr/bin/env python
"""Time the bench train step (batch 64) on the TPU — quick A/B harness.

Prints ms/step (best of 3 windows of 10 iters, honest fetch_sync timing).
Run SOLO (one TPU process at a time).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ct_tpu.utils.cache import enable_compilation_cache
from ct_tpu.utils.timing import fetch_sync


def main():
    enable_compilation_cache()
    print("devices", jax.devices(), flush=True)

    import dataclasses

    from ct_tpu.config import VOC_300, resolve_task
    from ct_tpu.data.targets import pad_targets
    from ct_tpu.models import build_net
    from ct_tpu.ops.priors import prior_boxes
    from ct_tpu.train.solver import (
        SolverConfig, build_fused_optimizer, build_optimizer,
    )
    from ct_tpu.train.step import (
        TrainState, init_train_state, make_train_step,
    )

    batch = int(os.environ.get("CT_TT_BATCH", "64"))
    task = resolve_task(2, "transfer", "ours", "VOC")
    # A/B: CT_PACK_CONV1=1 routes the lane-packed conv1 stage
    pack = bool(os.environ.get("CT_PACK_CONV1"))
    net = build_net(task, 300, dtype=jnp.bfloat16, pack_conv1=pack)
    net = dataclasses.replace(net, use_pallas_ct=True)
    print(f"pack_conv1={pack}", flush=True)
    priors = prior_boxes(VOC_300)

    cfg = SolverConfig(lr=1e-3, steps=(10 ** 6,), warmup_iters=0)
    state = init_train_state(net, None, jax.random.PRNGKey(0), 300)
    # A/B: CT_TT_OPT=fused uses the flat-vector SGD (default: per-leaf,
    # which the r5 A/B measured 5.7 ms/step faster)
    mk = (build_fused_optimizer if os.environ.get("CT_TT_OPT") == "fused"
          else build_optimizer)
    print(f"optimizer={mk.__name__}", flush=True)
    tx = mk(state.params, task, cfg)
    state = TrainState(state.params, state.batch_stats,
                       tx.init(state.params), state.step)
    step = make_train_step(net, priors, task, tx)
    print("init done", flush=True)

    rng = np.random.RandomState(0)
    annos = [
        np.asarray([[0.2, 0.2, 0.6, 0.7, 3, 1.0],
                    [0.1, 0.5, 0.4, 0.9, 7, 1.0]], np.float32)
        for _ in range(batch)
    ]
    t = pad_targets(annos, max_objs=16)
    img = rng.randn(batch, 300, 300, 3).astype(np.float32) * 50
    # A/B: CT_IMG_BF16=1 feeds the step bf16 images (what a bf16-emitting
    # device-augment pipeline produces). The [B,300,300,3] image is lane-
    # padded 3→128 on TPU, so the f32 feed pays ~3 GB of padded reads per
    # step (in-step cast + conv1_1 fwd + conv1_1 wgrad); bf16 halves it.
    # Numerically identical: the conv promotes to bf16 either way.
    dt = jnp.bfloat16 if os.environ.get("CT_IMG_BF16") else jnp.float32
    b = {
        "image": jnp.asarray(img, dt),
        "boxes": jnp.asarray(t.boxes), "labels": jnp.asarray(t.labels),
        "weights": jnp.asarray(t.weights), "valid": jnp.asarray(t.valid),
    }
    t0 = time.perf_counter()
    state, metrics = step(state, b)
    fetch_sync(metrics)
    print(f"compile+first step: {time.perf_counter() - t0:.1f}s", flush=True)

    iters = 10
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, b)
        fetch_sync(metrics)
        best = min(best, time.perf_counter() - t0)
    ms = best / iters * 1e3
    print(f"{ms:.2f} ms/step = {batch / (ms / 1e3):.1f} img/s "
          f"(batch {batch}, best of 3x{iters})", flush=True)


if __name__ == "__main__":
    main()
