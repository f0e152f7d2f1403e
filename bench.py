#!/usr/bin/env python
"""Benchmark: RFBNet300 end-to-end batched inference throughput on TPU.

Prints ONE JSON line:
  {"metric": "images/sec/chip RFBNet300 infer", "value": N,
   "unit": "images/sec", "vs_baseline": N}

The benchmark path is the full serving pipeline on device: forward pass
(phase-2 transfer model with the Context-Transformer head) → softmax →
box decode → obj×conf fusion → per-class NMS → per-image top-200 cap.

``vs_baseline``: the reference publishes no throughput; the driver's
north-star is ≥5× images/sec/chip over a V100-class baseline
(BASELINE.md). RFBNet300's published speed on 2017-era hardware is
~83 img/s (RFBNet paper, Titan X) — we take 5×83 = 415 img/s as the
target and report value/415, so vs_baseline ≥ 1.0 means the target is met.
"""

from __future__ import annotations

import json
import sys
import time


BASELINE_TARGET_IPS = 5 * 83.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ct_tpu.config import VOC_300, resolve_task
    from ct_tpu.models import build_net
    from ct_tpu.ops.priors import prior_boxes
    from ct_tpu.train.step import init_train_state, make_eval_step

    devices = jax.devices()
    log("devices:", devices)
    platform = devices[0].platform

    batch = 128
    task = resolve_task(2, "transfer", "ours", "VOC")
    # bfloat16 conv/activation compute on TPU; box decode stays fp32;
    # fused Pallas CT attention (2.3x the XLA path on v5e)
    on_tpu = platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else None
    net = build_net(task, 300, dtype=dtype)
    if on_tpu:
        import dataclasses

        net = dataclasses.replace(net, use_pallas_ct=True)
    priors = prior_boxes(VOC_300)

    state = init_train_state(net, None, jax.random.PRNGKey(0), 300)
    eval_step = make_eval_step(net, priors, approx_top_k=on_tpu)

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.randn(batch, 300, 300, 3).astype(np.float32) * 50
    )
    sizes = jnp.asarray(np.full((batch, 2), 500, np.int32))

    log("compiling…")
    t0 = time.perf_counter()
    dets = eval_step(state.params, state.batch_stats, images, sizes)
    jax.block_until_ready(dets)
    log(f"compile+first batch: {time.perf_counter() - t0:.1f}s")

    # warmup
    for _ in range(2):
        jax.block_until_ready(
            eval_step(state.params, state.batch_stats, images, sizes)
        )

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        dets = eval_step(state.params, state.batch_stats, images, sizes)
    jax.block_until_ready(dets)
    dt = time.perf_counter() - t0

    ips = batch * iters / dt
    log(f"{ips:.1f} images/sec/chip (batch={batch}, {iters} iters, {dt:.3f}s)")

    # p50 NMS latency (BASELINE tracked metric): postprocess-only pass
    from ct_tpu.models.rfbnet import eval_scores
    from ct_tpu.ops.detection import postprocess

    preds = net.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        images, train=False,
    )
    conf, obj = eval_scores(preds)
    nms_fn = jax.jit(lambda l, c, o, z: postprocess(
        l, c, o, priors, image_sizes=z, approx_top_k=on_tpu))
    jax.block_until_ready(nms_fn(preds.loc, conf, obj, sizes))
    samples = []
    for _ in range(9):
        t0 = time.perf_counter()
        jax.block_until_ready(nms_fn(preds.loc, conf, obj, sizes))
        samples.append(time.perf_counter() - t0)
    p50_ms = sorted(samples)[len(samples) // 2] * 1e3
    log(f"p50 NMS (decode+fuse+suppress+cap, batch {batch}): {p50_ms:.2f} ms"
        f" = {p50_ms / batch:.3f} ms/img")

    print(json.dumps({
        "metric": "images/sec/chip RFBNet300 infer",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_TARGET_IPS, 3),
    }))


if __name__ == "__main__":
    main()
