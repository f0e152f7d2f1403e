#!/usr/bin/env python
"""End-to-end input-pipeline throughput: loader → augment → (device) step.

VERDICT r2 weak-item #5: the train bench replays one pre-staged synthetic
batch, so the host input pipeline's sustained rate was never measured.
This script measures, on a synthetic VOC fixture (realistic image sizes,
JPEG decode + XML parse + augmentation):

  1. host-augment loader (TrainAugment) sustained img/s — the reference's
     DataLoader-worker path (/root/reference/train.py:192-199);
  2. device-augment loader (RawCanvasTransform: decode+resize only)
     sustained img/s — the TPU-native split where crop/expand/flip/
     photometrics run batched on device (ct_tpu.data.augment_jax);
  3. with --device: loader → device_put → augment_batch [+ mixup] →
     train step, steady-state images/sec (the number that tells you
     whether the input pipeline can feed the chip).

Usage:  python scripts/bench_pipeline.py [--device] [--images 256]
        [--batch-size 64] [--iters 20] [--workers N]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_loader(loader, batch_size, iters, warmup=3):
    for _ in range(warmup):
        loader.next()
    t0 = time.perf_counter()
    for _ in range(iters):
        loader.next()
    dt = time.perf_counter() - t0
    return batch_size * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--batch-size", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--workers", type=int, default=max(1, os.cpu_count()))
    ap.add_argument("--device", action="store_true",
                    help="also run the loader→device-augment→train-step "
                         "end-to-end bench on the default JAX device")
    ap.add_argument("--mixup", action="store_true")
    args = ap.parse_args()

    from fixtures import make_mini_voc
    from ct_tpu.config import EXPAND_PROB, RGB_MEANS
    from ct_tpu.data.augment import RawCanvasTransform, TrainAugment
    from ct_tpu.data.loader import Loader
    from ct_tpu.data.voc import VOC_CLASSES, AnnotationTransform, VOCDetection

    root = tempfile.mkdtemp(prefix="bench_voc_")
    devkit = make_mini_voc(root, year="2007", num_images=args.images,
                           classes=VOC_CLASSES[0][1:], seed=0)
    log(f"fixture: {args.images} images under {devkit}")

    def make_ds(preproc):
        return VOCDetection(devkit, [("2007", "trainval")], preproc,
                            AnnotationTransform(0), phase=1,
                            setting="transfer", split=1)

    results = {}

    # 1. host-augment path (full reference pipeline on host)
    ds = make_ds(TrainAugment(300, RGB_MEANS, EXPAND_PROB))
    loader = Loader(ds, args.batch_size, num_workers=args.workers,
                    max_objs=16, seed=0)
    results["host_augment"] = bench_loader(loader, args.batch_size,
                                           args.iters)
    loader.stop()
    log(f"host-augment loader: {results['host_augment']:.1f} img/s "
        f"({args.workers} workers)")

    # 2. device-augment host side (decode + square-canvas resize only)
    ds = make_ds(RawCanvasTransform(384))
    loader = Loader(ds, args.batch_size, num_workers=args.workers,
                    max_objs=16, seed=0)
    results["raw_canvas"] = bench_loader(loader, args.batch_size, args.iters)
    log(f"raw-canvas loader: {results['raw_canvas']:.1f} img/s")

    if args.device:
        import jax

        from ct_tpu.utils.timing import fetch_sync

        if os.environ.get("JAX_PLATFORMS", "") == "cpu":
            # the environment's sitecustomize force-registers the TPU
            # backend over the env var; honor an explicit cpu request
            jax.config.update("jax_platforms", "cpu")
        import jax.numpy as jnp

        from ct_tpu.config import TINY_64, VOC_300, resolve_task
        from ct_tpu.data.augment_jax import augment_batch, mixup_batch
        from ct_tpu.models import build_net
        from ct_tpu.ops.priors import prior_boxes
        from ct_tpu.train.solver import SolverConfig, build_fused_optimizer
        from ct_tpu.train.step import (
            TrainState, init_train_state, make_train_step,
        )

        platform = jax.devices()[0].platform
        log(f"device: {jax.devices()[0]}")
        on_tpu = platform == "tpu"
        size = 300 if on_tpu else 64
        task = resolve_task(2, "transfer", "ours", "VOC")
        import dataclasses

        net = build_net(task, size,
                        dtype=jnp.bfloat16 if on_tpu else None)
        if on_tpu:
            net = dataclasses.replace(net, use_pallas_ct=True)
        priors = prior_boxes(VOC_300 if size == 300 else TINY_64)
        cfg = SolverConfig(lr=1e-3, steps=(10**6,), warmup_iters=0)
        state = init_train_state(net, None, jax.random.PRNGKey(0), size)
        tx = build_fused_optimizer(state.params, task, cfg)
        state = TrainState(state.params, state.batch_stats,
                           tx.init(state.params), state.step)
        step = make_train_step(net, priors, task, tx)

        def run_iter(st, i, batch):
            w = jnp.asarray(batch["weights"])
            aug = augment_batch(
                jax.random.fold_in(jax.random.PRNGKey(1), i),
                jnp.asarray(batch["image"]), jnp.asarray(batch["boxes"]),
                jnp.asarray(batch["labels"]), jnp.asarray(batch["valid"]),
                out_size=size,
            )
            b = dict(aug, weights=w)
            if args.mixup:
                b = mixup_batch(jax.random.fold_in(jax.random.PRNGKey(2), i),
                                b)
            return step(st, b)   # donates st; caller must thread the result

        log("compiling end-to-end step…")
        t0 = time.perf_counter()
        state, m = run_iter(state, 0, loader.next())
        fetch_sync(m)
        log(f"compile+first step: {time.perf_counter() - t0:.1f}s")
        for i in range(2):
            state, m = run_iter(state, i + 1, loader.next())
        fetch_sync(m)
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, m = run_iter(state, i + 3, loader.next())
        fetch_sync(m)
        dt = time.perf_counter() - t0
        results["end_to_end"] = args.batch_size * args.iters / dt
        log(f"end-to-end (loader→device-augment→train step"
            f"{'+mixup' if args.mixup else ''}): "
            f"{results['end_to_end']:.1f} img/s")

    loader.stop()
    print({k: round(v, 1) for k, v in results.items()})


if __name__ == "__main__":
    main()
