#!/usr/bin/env python
"""Profile the phase-2 train step on the real TPU → op-level time table.

Same harness as profile_serving.py but for the bench train configuration
(fwd + bwd + fused SGD + OBJ_Target renorm, batch 64). Run SOLO.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from ct_tpu.utils.timing import fetch_sync
from ct_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    print("devices", jax.devices(), flush=True)

    import dataclasses

    from ct_tpu.config import VOC_300, resolve_task
    from ct_tpu.data.targets import pad_targets
    from ct_tpu.models import build_net
    from ct_tpu.ops.priors import prior_boxes
    from ct_tpu.train.solver import SolverConfig, build_optimizer
    from ct_tpu.train.step import (
        TrainState, init_train_state, make_train_step,
    )

    batch = 64
    task = resolve_task(2, "transfer", "ours", "VOC")
    pack = bool(os.environ.get("CT_PACK_CONV1"))
    net = build_net(task, 300, dtype=jnp.bfloat16, pack_conv1=pack)
    net = dataclasses.replace(net, use_pallas_ct=True)
    print(f"pack_conv1={pack}", flush=True)
    priors = prior_boxes(VOC_300)

    cfg = SolverConfig(lr=1e-3, steps=(10 ** 6,), warmup_iters=0)
    state = init_train_state(net, None, jax.random.PRNGKey(0), 300)
    tx = build_optimizer(state.params, task, cfg)
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
    b = {
        "image": jnp.asarray(
            rng.randn(batch, 300, 300, 3).astype(np.float32) * 50),
        "boxes": jnp.asarray(t.boxes), "labels": jnp.asarray(t.labels),
        "weights": jnp.asarray(t.weights), "valid": jnp.asarray(t.valid),
    }
    state, metrics = step(state, b)
    fetch_sync(metrics)
    print("compiled", flush=True)

    trace_dir = "/tmp/train_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, metrics = step(state, b)
        fetch_sync(metrics)
    print("trace written", flush=True)

    from profile_serving import summarize_trace

    summarize_trace(trace_dir, top=45)


if __name__ == "__main__":
    main()
