#!/usr/bin/env python
"""Real-capacity parity: train OUR stack on TPU → export .pth → evaluate
the identical weights through BOTH eval stacks.

Round-2 verdict: every numerics claim (int8 / bf16 / approx-topk / device
NMS) was validated on a 240-iter reference checkpoint whose mAP (0.023) is
noise. This driver produces a checkpoint at *decisive* mAP — trained by the
TPU stack on a class-colored synthetic fixture large enough to learn — and
closes the loop through the reference torch evaluator via the flax→torch
exporter (ct_tpu.models.torch_export).

Usage (serial steps; train needs the TPU):
  python scripts/real_parity.py build   [--images 400]
  python scripts/real_parity.py train   [--iters 3000 --batch 64]
  python scripts/real_parity.py eval-ours [--int8 | --bf16 | --approx]
  python scripts/ref_parity_torch.py --eval-only --out .parity_real
  python scripts/real_parity.py diff

Artifacts under --out (.parity_real/):
  voc/VOCdevkit      class-colored fixture, 15 split-1 base classes
  ref_model.pth      OUR trained weights, reference key space
  ours_eval*.json    our-stack mAP (per serving config)
  ref_eval.json      reference-stack mAP (written by ref_parity_torch)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def log(*a):
    print(*a, flush=True)


def cmd_build(args):
    from fixtures import make_mini_voc
    from ct_tpu.data.voc import VOC_CLASSES

    base15 = tuple(VOC_CLASSES[1][1:16])  # split-1 base classes
    voc_root = os.path.join(args.out, "voc")
    for year, seed in (("2007", 0), ("2012", 1)):
        make_mini_voc(voc_root, year=year, num_images=args.images,
                      classes=base15, seed=seed, class_colors=True,
                      max_test_ids=args.test_images)
    log(f"fixture: 2x{args.images} images, 15 base classes, "
        f"test set {args.test_images}")


def cmd_train(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ct_tpu.config import VOC_300, resolve_task
    from ct_tpu.data.augment import RawCanvasTransform
    from ct_tpu.data.augment_jax import augment_batch
    from ct_tpu.data.loader import Loader
    from ct_tpu.data.voc import AnnotationTransform, VOCDetection
    from ct_tpu.models import build_net
    from ct_tpu.models.torch_export import save_pth
    from ct_tpu.ops.priors import prior_boxes
    from ct_tpu.train.solver import SolverConfig, build_fused_optimizer
    from ct_tpu.train.step import (
        TrainState, init_train_state, make_train_step,
    )

    devkit = os.path.join(args.out, "voc", "VOCdevkit")
    task = resolve_task(1, "incre", "ours", "VOC")
    on_tpu = jax.devices()[0].platform == "tpu"
    log(f"device: {jax.devices()[0]}  (phase-1 incre split-1)")

    dataset = VOCDetection(
        devkit, [("2007", "trainval"), ("2012", "trainval")],
        RawCanvasTransform(384), AnnotationTransform(1),
        phase=1, setting="incre", split=1,
    )
    log(f"train dataset: {len(dataset)} images")

    # Device-resident dataset: the remote-TPU tunnel moves small per-batch
    # uploads at ~8 MB/s (measured), which caps streaming training at
    # ~17 img/s. The whole fixture fits HBM as uint8 (≈350 MB), so decode
    # once, upload once, and sample batches on device. (On a colocated
    # TPU host the streaming Loader path is the production route — see
    # scripts/bench_pipeline.py for its measured rates.)
    from ct_tpu.data.targets import pad_targets

    import numpy as _np

    imgs, annos = [], []
    for i in range(len(dataset)):
        img, t = dataset[i]
        imgs.append(img.astype(_np.uint8))
        annos.append(t)
    pt = pad_targets(annos, max_objs=8)
    d_imgs = jax.device_put(_np.stack(imgs))
    d_boxes = jax.device_put(pt.boxes)
    d_labels = jax.device_put(pt.labels)
    d_weights = jax.device_put(pt.weights)
    d_valid = jax.device_put(pt.valid)
    jax.block_until_ready(d_imgs)
    log(f"dataset resident on device: {d_imgs.shape} uint8")

    @jax.jit
    def gather_batch(data, idx):
        # data as an ARGUMENT: closing over the 350 MB device arrays would
        # embed them as program constants (the remote compile request then
        # exceeds the tunnel's size limit)
        return {k: jnp.take(v, idx, axis=0) for k, v in data.items()}

    data = {"image": d_imgs, "boxes": d_boxes, "labels": d_labels,
            "weights": d_weights, "valid": d_valid}
    rng_np = _np.random.RandomState(0)

    class _DeviceLoader:
        def next(self):
            idx = rng_np.randint(0, len(dataset), size=(args.batch,))
            return gather_batch(data, jnp.asarray(idx, jnp.int32))

        def stop(self):
            pass

    loader = _DeviceLoader()

    net = build_net(task, 300, dtype=jnp.bfloat16 if on_tpu else None)
    priors = prior_boxes(VOC_300)
    cfg = SolverConfig(
        lr=args.lr, steps=(int(args.iters * 0.7), int(args.iters * 0.9)),
        warmup_iters=min(500, args.iters // 6),
    )
    state = init_train_state(net, None, jax.random.PRNGKey(0), 300)
    tx = build_fused_optimizer(state.params, task, cfg)
    state = TrainState(state.params, state.batch_stats,
                       tx.init(state.params), state.step)
    step = make_train_step(net, priors, task, tx)

    path = os.path.join(args.out, "ref_model.pth")

    def export(st, it):
        variables = {
            "params": jax.device_get(st.params),
            "batch_stats": jax.device_get(st.batch_stats),
        }
        save_pth(path, variables, iteration=it)
        log("exported", path, f"@iter {it}")

    t0 = time.time()
    t_load = t_aug = t_step = 0.0
    last_metrics = None
    for it in range(args.iters):
        ta = time.time()
        b = loader.next()
        tb = time.time()
        aug = augment_batch(
            jax.random.fold_in(jax.random.PRNGKey(1), it),
            jnp.asarray(b["image"]), jnp.asarray(b["boxes"]),
            jnp.asarray(b["labels"]), jnp.asarray(b["valid"]),
            out_size=300,
        )
        tc = time.time()
        state, last_metrics = step(state, dict(aug, weights=jnp.asarray(
            b["weights"])))
        td = time.time()
        t_load += tb - ta
        t_aug += tc - tb
        t_step += td - tc
        if it % 100 == 0 or it == args.iters - 1:
            m = {k: float(v) for k, v in last_metrics.items()}
            rate = args.batch * (it + 1) / (time.time() - t0)
            log(f"iter {it}: total={m['total_loss']:.4f} "
                f"box={m['loss_box_reg']:.4f} cls={m['loss_cls']:.4f} "
                f"obj={m['loss_obj']:.4f}  ({rate:.0f} img/s  "
                f"load {t_load:.0f}s aug {t_aug:.0f}s step {t_step:.0f}s)")
        if it and it % 500 == 0:
            export(state, it)   # crash/timeout insurance
    loader.stop()
    export(state, args.iters - 1)


def cmd_eval_ours(args):
    import test as test_cli

    os.environ["VOC_ROOT"] = os.path.join(args.out, "voc", "VOCdevkit")
    name = "ours_eval"
    extra = []
    if args.int8:
        extra += ["--int8"]
        name += "_int8"
    if args.int8_heads:
        extra += ["--int8-heads"]
        name += "h"
    if args.bf16:
        extra += ["--bf16"]
        name += "_bf16"
    if args.approx:
        extra += ["--approx-topk", "on", "--top-k", "128"]
        name += "_approx"
    if args.pool:
        extra += ["--pool-size", "512"]
        name += "_pool"
    save = os.path.join(args.out, name)
    res = test_cli.main([
        "-d", "VOC", "-p", "1", "--setting", "incre", "--split", "1",
        "--load-file", os.path.join(args.out, "ref_model.pth"),
        "--save-folder", save, "-b", "32", *extra,
    ])
    out = {"mAP": float(res["mAP"]),
           "APs": {k: float(v) for k, v in res.get("APs", {}).items()}}
    with open(os.path.join(args.out, name + ".json"), "w") as f:
        json.dump(out, f, indent=1)
    log(name, "mAP:", out["mAP"])


def cmd_diff(args):
    with open(os.path.join(args.out, "ref_eval.json")) as f:
        ref = json.load(f)
    with open(os.path.join(args.out, "ours_eval.json")) as f:
        ours = json.load(f)
    delta = abs(ref["mAP"] - ours["mAP"])
    log(f"reference mAP {ref['mAP']:.4f}  ours {ours['mAP']:.4f}  "
        f"|delta| {delta:.5f}")

    from ct_tpu.tools.diff_detections import diff

    det_ours = os.path.join(args.out, "ours_eval", "inference",
                            "detections.pkl")
    det_ref = os.path.join(args.out, "detections_ref.pkl")
    if os.path.exists(det_ours) and os.path.exists(det_ref):
        stats = diff(det_ours, det_ref)
        log(json.dumps(stats, indent=1, default=float))
    ok = delta < 0.003 and ref["mAP"] >= 0.3
    log("PASS" if ok else "FAIL",
        "(target: |delta| < 0.003 at mAP >= 0.3)")
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["build", "train", "eval-ours", "diff"])
    ap.add_argument("--out", default=os.path.join(REPO, ".parity_real"))
    ap.add_argument("--images", type=int, default=400)
    ap.add_argument("--test-images", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=4e-3)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--int8-heads", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--approx", action="store_true")
    ap.add_argument("--pool", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rc = {"build": cmd_build, "train": cmd_train,
          "eval-ours": cmd_eval_ours, "diff": cmd_diff}[args.cmd](args)
    sys.exit(rc or 0)


if __name__ == "__main__":
    main()
