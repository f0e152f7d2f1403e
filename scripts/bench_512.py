#!/usr/bin/env python
"""512-resolution TPU benchmarks: train step (effective batch 64, grad
accumulation 4) and serving, standalone so the 512 question gets answered
without recompiling the 300-res bench programs.

VERDICT r4 #1: the round-4 512 train bench OOM'd scoped VMEM in the CT
backward Pallas kernel at K=4964 (19.8M > 16M); the `_fit_block_q_bwd`
fix (commit 1b3acba) landed after that run and was never re-measured.
This script is that re-measurement.

Usage: python scripts/bench_512.py [--train-only|--serve-only] [--int8]
Reference scope: /root/reference/data/config.py:46-67 (VOC_512),
train.py:44 (--size 512 default for transfer).
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

from ct_tpu.utils.timing import fetch_sync  # noqa: E402


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-only", action="store_true")
    ap.add_argument("--serve-only", action="store_true")
    ap.add_argument("--int8", action="store_true",
                    help="also measure int8 512 serving")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--accum", type=int, default=4)
    ap.add_argument("--serve-batch", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ct_tpu.utils.cache import (
        enable_compilation_cache, require_tpu_tunnel,
    )

    require_tpu_tunnel()
    enable_compilation_cache()

    import dataclasses

    from ct_tpu.config import get_config, resolve_task
    from ct_tpu.models import build_net
    from ct_tpu.ops.priors import prior_boxes
    from ct_tpu.train.step import init_train_state, make_eval_step

    import bench

    devices = jax.devices()
    log("devices:", devices)
    on_tpu = devices[0].platform == "tpu"
    dtype = jnp.bfloat16 if on_tpu else None

    task = resolve_task(2, "transfer", "ours", "VOC")
    net = build_net(task, 512, dtype=dtype)
    if on_tpu:
        net = dataclasses.replace(net, use_pallas_ct=True)
    priors = prior_boxes(get_config("VOC", 512))
    log(f"priors: {priors.shape[0]}")

    if not args.serve_only:
        t0 = time.perf_counter()
        ips = bench.bench_train(jax, jnp, np, net, priors, task,
                                batch=args.batch, size=512,
                                accum_steps=args.accum)
        log(f"train 512: {ips:.1f} images/sec/chip (effective batch "
            f"{args.batch}, accum {args.accum}) [total {time.perf_counter() - t0:.0f}s]")

    if args.train_only:
        return

    b = args.serve_batch
    rng = np.random.RandomState(0)
    state = init_train_state(net, None, jax.random.PRNGKey(0), 512)
    images = jnp.asarray(rng.randn(b, 512, 512, 3).astype(np.float32) * 50)
    sizes = jnp.asarray(np.full((b, 2), 700, np.int32))

    def measure(eval_step, params, batch_stats, label):
        t0 = time.perf_counter()
        fetch_sync(eval_step(params, batch_stats, images, sizes))
        log(f"{label}: compile+first batch {time.perf_counter() - t0:.1f}s")
        for _ in range(2):
            fetch_sync(eval_step(params, batch_stats, images, sizes))
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(8):
                d = eval_step(params, batch_stats, images, sizes)
            fetch_sync(d)
            dt = min(dt, time.perf_counter() - t0)
        log(f"serve 512 {label}: {b * 8 / dt:.1f} images/sec/chip "
            f"(batch {b})")

    eval_bf16 = make_eval_step(net, priors, approx_top_k=on_tpu,
                               top_k=128 if on_tpu else 200,
                               pool_size=512 if on_tpu else 0)
    measure(eval_bf16, state.params, state.batch_stats, "bf16")

    if args.int8:
        from ct_tpu.models.fold_bn import fold_variables
        from ct_tpu.models.quantize import (
            SKIP_CT_ONLY, calibrate, quantize_variables,
        )
        from ct_tpu.models.rfbnet import vgg_pool_chains

        fnet = dataclasses.replace(net, fold_bn=True)
        folded = fold_variables(
            {"params": state.params, "batch_stats": state.batch_stats})
        log("calibrating int8 scales (512)…")
        calib = calibrate(fnet, folded, [images[:8]])
        quant = jax.device_put(quantize_variables(
            folded["params"], calib, skip=SKIP_CT_ONLY,
            chains=vgg_pool_chains(512)))
        eval_int8 = make_eval_step(fnet, priors, approx_top_k=on_tpu,
                                   top_k=128 if on_tpu else 200,
                                   pool_size=512 if on_tpu else 0,
                                   quant=quant)
        measure(eval_int8, folded["params"], folded["batch_stats"], "int8")


if __name__ == "__main__":
    main()
