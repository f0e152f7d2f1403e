#!/usr/bin/env python
"""Dump the optimized HLO of the bench train step (TPU backend) to a file.

Used to inspect what XLA actually fused around the conv1 stage — the
profile shows tuple fusions writing two [64,300,300,64] tensors each.
Run SOLO (one TPU process at a time).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ct_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    print("devices", jax.devices(), flush=True)

    import dataclasses

    from ct_tpu.config import VOC_300, resolve_task
    from ct_tpu.data.targets import pad_targets
    from ct_tpu.models import build_net
    from ct_tpu.ops.priors import prior_boxes
    from ct_tpu.train.solver import SolverConfig, build_fused_optimizer
    from ct_tpu.train.step import (
        TrainState, init_train_state, make_train_step,
    )

    batch = 64
    task = resolve_task(2, "transfer", "ours", "VOC")
    net = build_net(task, 300, dtype=jnp.bfloat16)
    net = dataclasses.replace(net, use_pallas_ct=True)
    priors = prior_boxes(VOC_300)

    cfg = SolverConfig(lr=1e-3, steps=(10 ** 6,), warmup_iters=0)
    state = init_train_state(net, None, jax.random.PRNGKey(0), 300)
    tx = build_fused_optimizer(state.params, task, cfg)
    state = TrainState(state.params, state.batch_stats,
                       tx.init(state.params), state.step)
    step = make_train_step(net, priors, task, tx)

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
    compiled = step.lower(state, b).compile()
    txt = compiled.as_text()
    out = "/tmp/train_step_hlo.txt"
    with open(out, "w") as f:
        f.write(txt)
    print("wrote", out, len(txt), "bytes", flush=True)


if __name__ == "__main__":
    main()
