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
(BASELINE.md). RFBNet300's published speed is 83 img/s on a Titan X
(Pascal) — RFBNet paper table 5 — and a V100 is ~2× a Pascal Titan X on
small-batch fp32 CNN inference, giving a V100 baseline of ~166 img/s
(full derivation: BASELINE.md "Throughput-baseline derivation"). The
target is 5×166 = 830 img/s and we report value/830, so
vs_baseline ≥ 1.0 means the ≥5× target is met against the honest (V100)
denominator. Rounds ≤3 reported against the softer 415 figure.
"""

from __future__ import annotations

import json
import os
import sys
import time

from ct_tpu.utils.timing import fetch_sync


BASELINE_TARGET_IPS = 5 * 166.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _git_sha() -> str:
    import subprocess

    try:
        return subprocess.run(
            ["git", "-C", os.path.dirname(os.path.abspath(__file__)),
             "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def bench_train(jax, jnp, np, net, priors, task, batch: int = 64,
                iters: int = 10, size: int = 300,
                accum_steps: int = 1) -> float:
    """Compiled phase-2 train step (fwd+bwd+SGD+OBJ_Target renorm) img/s.

    Uses the per-leaf optax chain (build_optimizer): the r5 on-chip A/B
    showed it 5.7 ms/step FASTER than the flat-vector fused SGD at batch
    64 — inside one jit, XLA fuses the per-leaf update ops anyway, and
    the fused path's ravel/unravel of the 42M-element vector costs ~2.4
    GB of extra HBM traffic per step (docs/ROADMAP.md r5)."""
    from ct_tpu.data.targets import pad_targets
    from ct_tpu.train.solver import SolverConfig, build_optimizer
    from ct_tpu.train.step import (
        TrainState, init_train_state, make_train_step,
    )

    cfg = SolverConfig(lr=1e-3, steps=(10 ** 6,), warmup_iters=0)
    state = init_train_state(net, None, jax.random.PRNGKey(0), size)
    tx = build_optimizer(state.params, task, cfg)
    state = TrainState(state.params, state.batch_stats,
                       tx.init(state.params), state.step)
    step = make_train_step(net, priors, task, tx, accum_steps=accum_steps)

    rng = np.random.RandomState(0)
    annos = [
        np.asarray([[0.2, 0.2, 0.6, 0.7, 3, 1.0],
                    [0.1, 0.5, 0.4, 0.9, 7, 1.0]], np.float32)
        for _ in range(batch)
    ]
    t = pad_targets(annos, max_objs=16)
    b = {
        # images arrive in the model's compute dtype — what the production
        # --device-augment pipeline emits (augment_jax.augment_batch
        # out_dtype): the [B,S,S,3] feed is lane-padded 3→128 by the TPU
        # tiled layout, and a f32 feed pays ~3 GB/step of padded reads at
        # batch 64 (in-step cast + conv1_1 fwd + conv1_1 wgrad re-read).
        # Numerically identical: the first conv promotes to bf16 anyway.
        "image": jnp.asarray(
            rng.randn(batch, size, size, 3).astype(np.float32) * 50,
            net.dtype or jnp.float32),
        "boxes": jnp.asarray(t.boxes), "labels": jnp.asarray(t.labels),
        "weights": jnp.asarray(t.weights), "valid": jnp.asarray(t.valid),
    }
    log("compiling train step…")
    t0 = time.perf_counter()
    state, metrics = step(state, b)
    fetch_sync(metrics)
    log(f"train compile+first step: {time.perf_counter() - t0:.1f}s")
    for _ in range(2):
        state, metrics = step(state, b)
    fetch_sync(metrics)
    dt = float("inf")
    for _ in range(3):   # best-of-3: tunnel dispatch jitter ~15%
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step(state, b)
        fetch_sync(metrics)
        dt = min(dt, time.perf_counter() - t0)
    return batch * iters / dt


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ct_tpu.utils.cache import (
        enable_compilation_cache, require_tpu_tunnel,
    )

    require_tpu_tunnel()
    enable_compilation_cache()

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

    t0 = time.perf_counter()
    state = init_train_state(net, None, jax.random.PRNGKey(0), 300)
    fetch_sync(state.params)
    log(f"init: {time.perf_counter() - t0:.1f}s")

    rng = np.random.RandomState(0)
    images = jnp.asarray(
        rng.randn(batch, 300, 300, 3).astype(np.float32) * 50
    )
    sizes = jnp.asarray(np.full((batch, 2), 500, np.int32))

    # serving config: int8 (fold BN → calibrate → per-channel int8 convs;
    # 2.0x bf16 MXU rate on v5e, mAP-fidelity-validated on the trained
    # parity fixture: 0.0232 int8 vs 0.0230 f32 — docs/PARITY.md); falls
    # back to the bf16 path if anything in the quant pipeline fails
    params, batch_stats = state.params, state.batch_stats
    mode = "bf16"
    try:
        import dataclasses

        from ct_tpu.models.fold_bn import fold_variables
        from ct_tpu.models.quantize import (
            SKIP_CT_ONLY, calibrate, quantize_variables,
        )

        fnet = dataclasses.replace(net, fold_bn=True)
        t0 = time.perf_counter()
        folded = fold_variables(
            {"params": state.params, "batch_stats": state.batch_stats}
        )
        log(f"fold_bn: {time.perf_counter() - t0:.1f}s")
        log("calibrating int8 scales…")
        calib = calibrate(fnet, folded, [images[:8]])
        from ct_tpu.models.rfbnet import vgg_pool_chains

        # conf heads int8 too (SKIP_LOC_OBJ): fidelity measured on the
        # decisive-mAP parity model — see docs/PARITY.md. Pool-boundary
        # chaining is bit-exact (tests/test_quantize.py).
        quant = jax.device_put(quantize_variables(
            folded["params"], calib, skip=SKIP_CT_ONLY,
            chains=vgg_pool_chains(300)))
        net = fnet
        params, batch_stats = folded["params"], folded["batch_stats"]
        mode = "int8"
    except Exception as e:  # pragma: no cover - defensive
        quant = None
        log(f"int8 path unavailable ({e!r}); serving bf16")
    # serving NMS knobs: grouped approx selection + per-class candidate cap
    # 128 (the reference has no pre-NMS cap; these prune only the
    # near-threshold junk tail — fixture mAP is identical to the exact
    # K=200 config at 0.0234, docs/PARITY.md; `test.py` defaults stay
    # exact/200 for parity runs)
    # pool_size: per-image top-512 prior pool (boxes are shared across
    # classes) — replaces the per-class [B,C,K]-row box gather with one
    # small row gather + an MXU one-hot contraction (ct_tpu/ops/nms.py)
    eval_step = make_eval_step(net, priors, approx_top_k=on_tpu,
                               top_k=128 if on_tpu else 200,
                               pool_size=512 if on_tpu else 0,
                               quant=quant)

    log(f"compiling ({mode} serving path)…")
    t0 = time.perf_counter()
    dets = eval_step(params, batch_stats, images, sizes)
    fetch_sync(dets)
    log(f"compile+first batch: {time.perf_counter() - t0:.1f}s")

    # warmup
    for _ in range(2):
        fetch_sync(
            eval_step(params, batch_stats, images, sizes)
        )

    # best of 3 windows: host↔device dispatch through a remote tunnel has
    # ~15% run-to-run jitter (measured: an unchanged path swung 41→47 ms);
    # the fastest window is the closest estimate of the device rate
    iters = 10
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            dets = eval_step(params, batch_stats, images, sizes)
        fetch_sync(dets)
        dt = min(dt, time.perf_counter() - t0)

    ips = batch * iters / dt
    log(f"{ips:.1f} images/sec/chip ({mode}, batch={batch}, {iters} iters, "
        f"best-of-3, {dt:.3f}s)")

    # p50 NMS latency (BASELINE tracked metric): postprocess-only pass on
    # synthetic predictions (same shapes/distribution class as the model's
    # softmaxed outputs; avoids compiling a second forward program)
    from ct_tpu.ops.detection import postprocess

    p = priors.shape[0]
    loc = jnp.asarray(rng.randn(batch, p, 4).astype(np.float32) * 0.3)
    conf = jax.nn.softmax(
        jnp.asarray(rng.randn(batch, p, task.num_classes - 1)
                    .astype(np.float32)), axis=-1)
    obj = jax.nn.softmax(
        jnp.asarray(rng.randn(batch, p, 2).astype(np.float32)), axis=-1)
    nms_fn = jax.jit(lambda l, c, o, z: postprocess(
        l, c, o, priors, image_sizes=z, approx_top_k=on_tpu,
        top_k=128 if on_tpu else 200, pool_size=512 if on_tpu else 0))
    fetch_sync(nms_fn(loc, conf, obj, sizes))
    samples = []
    for _ in range(9):
        t0 = time.perf_counter()
        fetch_sync(nms_fn(loc, conf, obj, sizes))
        samples.append(time.perf_counter() - t0)
    p50_ms = sorted(samples)[len(samples) // 2] * 1e3
    log(f"p50 NMS (decode+fuse+suppress+cap, batch {batch}): {p50_ms:.2f} ms"
        f" = {p50_ms / batch:.3f} ms/img")

    # headline JSON first — the train bench below adds a multi-minute
    # compile and must never cost the driver the tracked metric
    print(json.dumps({
        "metric": "images/sec/chip RFBNet300 infer",
        "value": round(ips, 1),
        "unit": "images/sec",
        "vs_baseline": round(ips / BASELINE_TARGET_IPS, 3),
        # environment fingerprint: tie the measurement to the exact code
        # state + toolchain (ADVICE r3 — artifacts carried no provenance)
        "git": _git_sha(),
        "jax": jax.__version__,
        "device": str(devices[0]),
        "baseline_ips": BASELINE_TARGET_IPS,
    }), flush=True)

    # training throughput (stderr-tracked); trains the UNFOLDED bf16 model
    if os.environ.get("CT_BENCH_TRAIN", "1") != "0":
        try:
            import dataclasses as _dc

            # lane-packed conv1 stage + fused Pallas pool (r5): training
            # only — the serving path keeps its own int8 pipeline
            train_net = _dc.replace(net, fold_bn=False, pack_conv1=on_tpu)
            train_ips = bench_train(jax, jnp, np, train_net, priors, task)
            log(f"train: {train_ips:.1f} images/sec/chip (fwd+bwd+SGD, "
                f"batch 64)")
            # batch-128 line (VERDICT r4 #2): larger per-chip batch
            # amortizes the fixed per-op overheads
            train_ips128 = bench_train(jax, jnp, np, train_net, priors,
                                       task, batch=128)
            log(f"train: {train_ips128:.1f} images/sec/chip (fwd+bwd+"
                f"SGD, batch 128)")
        except Exception as e:  # pragma: no cover - defensive
            log(f"train bench failed: {e!r}")

    # 512-resolution training at the reference's effective batch 64 via
    # gradient accumulation (VERDICT r2 item 8); opt-in: adds a multi-
    # minute compile
    if os.environ.get("CT_BENCH_512", "0") != "0":
        try:
            import dataclasses as _dc

            from ct_tpu.config import get_config

            net512 = build_net(task, 512, dtype=dtype)
            if on_tpu:
                net512 = _dc.replace(net512, use_pallas_ct=True)
            priors512 = prior_boxes(get_config("VOC", 512))
            net512t = _dc.replace(net512, pack_conv1=on_tpu)
            ips512 = bench_train(jax, jnp, np, net512t, priors512, task,
                                 batch=64, size=512, accum_steps=4)
            log(f"train 512: {ips512:.1f} images/sec/chip (effective "
                f"batch 64, accum 4)")
        except Exception as e:  # pragma: no cover - defensive
            log(f"512 train bench failed: {e!r}")
        try:
            # 512 serving (bf16; P=32756, K=4964 exercises the kernel's
            # VMEM-shrunk block_q path on hardware — ct_attention.py
            # _fit_block_q)
            b512 = 32
            state512 = init_train_state(
                net512, None, jax.random.PRNGKey(0), 512)
            eval512 = make_eval_step(
                net512, priors512, approx_top_k=on_tpu,
                top_k=128 if on_tpu else 200,
                pool_size=512 if on_tpu else 0)
            img512 = jnp.asarray(
                rng.randn(b512, 512, 512, 3).astype(np.float32) * 50)
            sz512 = jnp.asarray(np.full((b512, 2), 700, np.int32))
            fetch_sync(eval512(state512.params, state512.batch_stats,
                               img512, sz512))
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(8):
                    d = eval512(state512.params, state512.batch_stats,
                                img512, sz512)
                fetch_sync(d)
                dt = min(dt, time.perf_counter() - t0)
            log(f"serve 512: {b512 * 8 / dt:.1f} images/sec/chip "
                f"(bf16, batch {b512})")
            # int8 512 serving (VERDICT r4 #7 — give 512 the 300-path
            # treatment); measured 516.7 img/s on v5e (scripts/bench_512.py)
            from ct_tpu.models.fold_bn import fold_variables
            from ct_tpu.models.quantize import (
                SKIP_CT_ONLY, calibrate, quantize_variables,
            )
            from ct_tpu.models.rfbnet import vgg_pool_chains

            fnet512 = _dc.replace(net512, fold_bn=True)
            folded512 = fold_variables(
                {"params": state512.params,
                 "batch_stats": state512.batch_stats})
            calib512 = calibrate(fnet512, folded512, [img512[:8]])
            quant512 = jax.device_put(quantize_variables(
                folded512["params"], calib512, skip=SKIP_CT_ONLY,
                chains=vgg_pool_chains(512)))
            eval512q = make_eval_step(
                fnet512, priors512, approx_top_k=on_tpu,
                top_k=128 if on_tpu else 200,
                pool_size=512 if on_tpu else 0, quant=quant512)
            fetch_sync(eval512q(folded512["params"],
                                folded512["batch_stats"], img512, sz512))
            dt = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(8):
                    d = eval512q(folded512["params"],
                                 folded512["batch_stats"], img512, sz512)
                fetch_sync(d)
                dt = min(dt, time.perf_counter() - t0)
            log(f"serve 512: {b512 * 8 / dt:.1f} images/sec/chip "
                f"(int8, batch {b512})")
        except Exception as e:  # pragma: no cover - defensive
            log(f"512 serve bench failed: {e!r}")


if __name__ == "__main__":
    main()
