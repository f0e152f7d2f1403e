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

Phase-2 incremental chain (VERDICT r3 #1 — trained-numerics evidence for
the Context-Transformer head itself: attention, θ/φ/g residuals, Wz,
ℓ2+cosine OBJ_Target classifier, fc_base concat, OBJ_Target init,
mixup + ignore-label semantics; reference protocol README.md:166-191):
  python scripts/real_parity.py build2  --out .parity_p2 [--images 600]
  python scripts/real_parity.py train   --out .parity_p2 \
      --export-name phase1.pth            # phase-1 base-15 pretrain
  python scripts/real_parity.py train2  --out .parity_p2 \
      [--iters 400 --shot 5]              # incre 5-shot fine-tune, CT head
  python scripts/real_parity.py eval-ours --out .parity_p2 --phase 2
  python scripts/ref_parity_torch.py --eval-only --phase 2 \
      --setting incre --out .parity_p2
  python scripts/real_parity.py diff --out .parity_p2 --phase 2

Artifacts under --out (.parity_real/ or .parity_p2/):
  voc/VOCdevkit      class-colored fixture (build: 15 base classes;
                     build2: all 20 split-1 classes + make_shots lists)
  phase1.pth         phase-1 checkpoint feeding the phase-2 chain
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


def cmd_build2(args):
    """All-20-class fixture + reference-semantics few-shot lists.

    ``make_mini_voc`` writes trivial lists (every id in every list); the
    phase-2 protocol needs real ones — base-split lists with no novel
    objects and per-class 1_box instance-shot lists — so regenerate them
    with the production ``ct_tpu.data.make_shots`` generators (which also
    exercises that tool on a full VOC tree)."""
    from fixtures import make_mini_voc
    from ct_tpu.data.voc import VOC_CLASSES
    from ct_tpu.data import make_shots

    all20 = tuple(VOC_CLASSES[1][1:21])  # split-1 order: novel last
    voc_root = os.path.join(args.out, "voc")
    for year, seed in (("2007", 0), ("2012", 1)):
        make_mini_voc(voc_root, year=year, num_images=args.images,
                      classes=all20, seed=seed, class_colors=True,
                      max_test_ids=args.test_images)
    devkit = os.path.join(voc_root, "VOCdevkit")
    records = make_shots._load_annotations(devkit, ("2007", "2012"))
    written = make_shots.write_lists(
        devkit, ("2007", "2012"),
        make_shots.make_base_split_lists(records, splits=(1,)),
        make_shots.make_image_shot_lists(records, shots=(1, 5)),
        make_shots.make_instance_shot_lists(records, depth=10),
    )
    n_split = sum(
        1 for _ in open(os.path.join(
            devkit, "VOC2007", "ImageSets", "Main", "trainval_split1.txt"))
    )
    log(f"fixture: 2x{args.images} images, 20 split-1 classes, "
        f"{len(written)} list files, split1(2007)={n_split} base images, "
        f"test set {args.test_images}")


def cmd_build3(args):
    """Transfer-setting fixture pair (VERDICT r4 #3/#4):

    * ``coco/`` — COCO-60 source-domain fixture (80-category registry,
      60 annotated non-VOC classes, separated class colors) for the
      phase-1 transfer pretrain AND the COCO-evaluator both-stacks diff;
    * ``voc/``  — the all-20-class VOC fixture with reference-semantics
      shot lists (same generator as build2) for the phase-2 transfer
      5-shot fine-tune and VOC eval.
    """
    import copy

    from fixtures import make_coco60

    make_coco60(os.path.join(args.out, "coco"),
                n_train=args.images, n_val=args.test_images)
    # the VOC (phase-2) side needs only the standard fixture size — the
    # 60-way source task is what needs the larger corpus
    voc_args = copy.copy(args)
    voc_args.images = min(args.images, 600)
    cmd_build2(voc_args)
    log(f"coco60 fixture: {args.images} train / {args.test_images} minival")


def _device_dataset(dataset, batch_size, max_objs=8, seed=0):
    """Decode the whole (small) fixture once, park it in HBM as uint8, and
    sample batches on device — the remote-TPU tunnel moves small per-batch
    uploads at ~8 MB/s, which would cap streaming training at ~17 img/s.
    (On a colocated TPU host the streaming Loader is the production route —
    scripts/bench_pipeline.py measures its rates.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ct_tpu.data.targets import pad_targets

    imgs, annos = [], []
    for i in range(len(dataset)):
        img, t = dataset[i]
        imgs.append(img.astype(np.uint8))
        annos.append(t)
    pt = pad_targets(annos, max_objs=max_objs)
    data = {
        "image": jax.device_put(np.stack(imgs)),
        "boxes": jax.device_put(pt.boxes),
        "labels": jax.device_put(pt.labels),
        "weights": jax.device_put(pt.weights),
        "valid": jax.device_put(pt.valid),
    }
    jax.block_until_ready(data["image"])
    log(f"dataset resident on device: {data['image'].shape} uint8")

    @jax.jit
    def gather_batch(data, idx):
        # data as an ARGUMENT: closing over the device arrays would embed
        # them as program constants (the remote compile request then
        # exceeds the tunnel's size limit)
        return {k: jnp.take(v, idx, axis=0) for k, v in data.items()}

    rng_np = np.random.RandomState(seed)

    class _DeviceLoader:
        def next(self):
            idx = rng_np.randint(0, len(dataset), size=(batch_size,))
            return gather_batch(data, jnp.asarray(idx, jnp.int32))

        def stop(self):
            pass

    return _DeviceLoader()


def cmd_train2(args):
    """Phase-2 incremental 'ours' fine-tune: phase-1 ckpt → init_reweight →
    CT-head training with device mixup → ref_model.pth.

    Mirrors the reference incre recipe (/root/reference/README.md:187-191:
    -p 2 -m ours --shot K --warmup-iter 0, mixup with a no-mixup tail) and
    our train.py's phase-2 path, on the device-resident fixture loader."""
    import dataclasses
    import types

    import jax
    import jax.numpy as jnp

    from ct_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from ct_tpu.config import VOC_300, resolve_task
    from ct_tpu.data.augment import RawCanvasTransform
    from ct_tpu.data.augment_jax import augment_batch, mixup_batch
    from ct_tpu.data.voc import AnnotationTransform, VOCDetection
    from ct_tpu.models import build_net
    from ct_tpu.models.torch_export import save_pth
    from ct_tpu.ops.priors import prior_boxes
    from ct_tpu.train.checkpointer import Checkpointer
    from ct_tpu.train.reweight import init_reweight
    from ct_tpu.train.solver import SolverConfig, build_fused_optimizer
    from ct_tpu.train.step import (
        TrainState, init_train_state, make_train_step,
    )

    devkit = os.path.join(args.out, "voc", "VOCdevkit")
    task = resolve_task(2, args.setting, "ours", "VOC")
    on_tpu = jax.devices()[0].platform == "tpu"
    size = args.size
    log(f"device: {jax.devices()[0]}  (phase-2 {args.setting} split-1, "
        f"{args.shot}-shot, size {size})")

    # phase-2 incre trains on 2007 1_box instance shots (train.py:157-158);
    # all but each image's first object become ignore labels (-1).
    # transfer uses the trainval_Kshot image-shot lists over 07+12 (no
    # ignore masking; reference train.py:93-98).
    canvas = 384 if size == 300 else (size * 5 + 3) // 4
    train_sets = ([("2007", "trainval")] if args.setting == "incre"
                  else [("2007", "trainval"), ("2012", "trainval")])
    dataset = VOCDetection(
        devkit, train_sets,
        RawCanvasTransform(canvas),
        AnnotationTransform(0 if args.setting == "transfer" else 1),
        phase=2, setting=args.setting, split=1, shot=args.shot,
    )
    log(f"train dataset: {len(dataset)} shot images")
    loader = _device_dataset(dataset, args.batch)

    from ct_tpu.config import get_config

    net = build_net(task, size, dtype=jnp.bfloat16 if on_tpu else None)
    if on_tpu:
        net = dataclasses.replace(net, use_pallas_ct=True)
    priors = prior_boxes(get_config("VOC", size) if size != 300
                         else VOC_300)
    state = init_train_state(net, None, jax.random.PRNGKey(0), size)

    ck = Checkpointer(os.path.join(args.out, "p2_weights"))
    loaded = ck.resume_or_load(
        os.path.join(args.out, args.phase1_name),
        state.params, state.batch_stats, resume=False, load_optimizer=False,
    )
    cfg = SolverConfig(
        lr=args.lr, steps=(int(args.iters * 0.875),), warmup_iters=0,
    )
    tx = build_fused_optimizer(loaded["params"], task, cfg)
    state = TrainState(loaded["params"], loaded["batch_stats"],
                       tx.init(loaded["params"]), state.step)

    # OBJ_Target init from augmented (never mixed) batches — the reference
    # calls init_reweight before dataset.set_mixup (train.py:186-190)
    def aug(batch, rng):
        a = augment_batch(rng, batch["image"], batch["boxes"],
                          batch["labels"], batch["valid"], out_size=size)
        return dict(a, weights=batch["weights"])

    class _AugLoader:
        def __init__(self):
            self.i = 0

        def next(self):
            self.i += 1
            return aug(loader.next(),
                       jax.random.fold_in(jax.random.PRNGKey(3), self.i))

    state = init_reweight(
        types.SimpleNamespace(init_iter=args.init_iter),
        net, state, _AugLoader(), priors, task,
    )
    log(f"OBJ_Target initialized from {args.init_iter} batches")

    step = make_train_step(net, priors, task, tx, accum_steps=args.accum)
    path = os.path.join(args.out, args.export_name)

    t0 = time.time()
    no_mixup_from = args.iters - args.no_mixup_iter
    for it in range(args.iters):
        batch = aug(loader.next(),
                    jax.random.fold_in(jax.random.PRNGKey(1), it))
        if it < no_mixup_from:
            batch = mixup_batch(
                jax.random.fold_in(jax.random.PRNGKey(2), it), batch,
                zero_ignored=True,   # incre: ignore rows drop out of loss
            )
        state, metrics = step(state, batch)
        if it % 50 == 0 or it == args.iters - 1:
            m = {k: float(v) for k, v in metrics.items()}
            rate = args.batch * (it + 1) / (time.time() - t0)
            log(f"iter {it}: total={m['total_loss']:.4f} "
                f"box={m['loss_box_reg']:.4f} cls={m['loss_cls']:.4f} "
                f"obj={m['loss_obj']:.4f}  ({rate:.0f} img/s)")
    variables = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
    }
    save_pth(path, variables, iteration=args.iters - 1)
    log("exported", path)


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

    on_tpu = jax.devices()[0].platform == "tpu"
    size = args.size
    canvas = 384 if size == 300 else (size * 5 + 3) // 4
    if args.dataset == "COCO":
        # transfer-setting source pretrain: COCO-60 (reference
        # train.py:99-110 — src_cls_dim 60, train split split_nonvoc)
        from ct_tpu.data.coco import COCODetection

        task = resolve_task(1, "transfer", "ours", "COCO")
        log(f"device: {jax.devices()[0]}  (phase-1 COCO-60 transfer, "
            f"size {size})")
        dataset = COCODetection(
            os.path.join(args.out, "coco"),
            [("2014", "split_nonvoc_train")], RawCanvasTransform(canvas),
        )
    else:
        devkit = os.path.join(args.out, "voc", "VOCdevkit")
        task = resolve_task(1, "incre", "ours", "VOC")
        log(f"device: {jax.devices()[0]}  (phase-1 incre split-1, "
            f"size {size})")
        dataset = VOCDetection(
            devkit, [("2007", "trainval"), ("2012", "trainval")],
            RawCanvasTransform(canvas), AnnotationTransform(1),
            phase=1, setting="incre", split=1,
        )
    log(f"train dataset: {len(dataset)} images")

    loader = _device_dataset(dataset, args.batch)

    from ct_tpu.config import get_config

    net = build_net(task, size, dtype=jnp.bfloat16 if on_tpu else None)
    if on_tpu and task.has_ct_head:
        import dataclasses

        net = dataclasses.replace(net, use_pallas_ct=True)
    priors = prior_boxes(get_config(task.dataset, size)
                         if (size, task.dataset) != (300, "VOC")
                         else VOC_300)
    cfg = SolverConfig(
        lr=args.lr, steps=(int(args.iters * 0.7), int(args.iters * 0.9)),
        warmup_iters=min(500, args.iters // 6),
    )
    state = init_train_state(net, None, jax.random.PRNGKey(0), size)
    tx = build_fused_optimizer(state.params, task, cfg)
    state = TrainState(state.params, state.batch_stats,
                       tx.init(state.params), state.step)
    step = make_train_step(net, priors, task, tx,
                           accum_steps=args.accum)

    path = os.path.join(args.out, args.export_name)

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
            out_size=size,
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


def _ours_name(args) -> str:
    """Result-file stem for an eval-ours config — shared with cmd_diff so
    a diff of a variant run (--int8/--bf16/… and/or --size 512) resolves
    the file that eval actually wrote (ADVICE r4 #1)."""
    name = getattr(args, "name", None)
    if name:
        return name
    name = "ours_eval"
    if args.dataset == "COCO":
        name += "_coco"
    if args.int8:
        name += "_int8"
        if args.calib_images != 8:
            name += f"_c{args.calib_images}"
    if args.int8_heads:
        name += "h"
    if args.bf16:
        name += "_bf16"
    if args.approx:
        name += "_approx"
    if args.pool:
        name += "_pool"
    if args.size != 300:
        name += f"_{args.size}"
    return name


def cmd_eval_ours(args):
    import test as test_cli

    os.environ["VOC_ROOT"] = os.path.join(args.out, "voc", "VOCdevkit")
    os.environ["COCO_ROOT"] = os.path.join(args.out, "coco")
    name = _ours_name(args)
    extra = []
    if args.int8:
        extra += ["--int8"]
        if args.calib_images != 8:
            extra += ["--calib-images", str(args.calib_images)]
    if args.int8_heads:
        extra += ["--int8-heads"]
    if args.bf16:
        extra += ["--bf16"]
    if args.approx:
        extra += ["--approx-topk", "on", "--top-k", "128"]
    if args.pool:
        extra += ["--pool-size", "512"]
    if args.size != 300:
        extra += ["-s", str(args.size)]
    save = os.path.join(args.out, name)
    res = test_cli.main([
        "-d", args.dataset, "-p", str(args.phase),
        "--setting", args.setting, "--split", "1",
        "--load-file", os.path.join(args.out, args.load_name),
        "--save-folder", save, "-b", "32", *extra,
    ])
    if args.dataset == "COCO":
        # COCO evaluator stats (fractions) + per-category AP-<name> keys
        out = {k: float(v) for k, v in res.items()}
    else:
        out = {"mAP": float(res["mAP"]),
               "APs": {k: float(v) for k, v in res.get("APs", {}).items()}}
        for k in ("base_mAP", "novel_mAP"):
            if k in res:
                out[k] = float(res[k])
    with open(os.path.join(args.out, name + ".json"), "w") as f:
        json.dump(out, f, indent=1)
    log(name, "mAP:", out.get("mAP", out.get("AP50")))


def cmd_diff(args):
    ours_name = _ours_name(args)
    if args.dataset == "COCO":
        return _diff_coco(args, ours_name)
    with open(os.path.join(args.out, "ref_eval.json")) as f:
        ref = json.load(f)
    with open(os.path.join(args.out, ours_name + ".json")) as f:
        ours = json.load(f)
    delta = abs(ref["mAP"] - ours["mAP"])
    log(f"reference mAP {ref['mAP']:.4f}  ours {ours['mAP']:.4f}  "
        f"|delta| {delta:.5f}")
    for k in ("base_mAP", "novel_mAP"):
        if k in ref and k in ours:
            log(f"  {k}: reference {ref[k]:.4f}  ours {ours[k]:.4f}  "
                f"|delta| {abs(ref[k] - ours[k]):.5f}")

    from ct_tpu.tools.diff_detections import diff

    det_ours = os.path.join(args.out, ours_name, "inference",
                            "detections.pkl")
    det_ref = os.path.join(args.out, "detections_ref.pkl")
    if os.path.exists(det_ours) and os.path.exists(det_ref):
        stats = diff(det_ours, det_ref)
        log(json.dumps(stats, indent=1, default=float))
    ok = delta < 0.003 and ref["mAP"] >= 0.3
    check_novel = args.phase == 2 and args.setting == "incre"
    if check_novel:
        # the decisive quantity for the CT head is the NOVEL-class mAP
        # (transfer: every class is novel — the top-line mAP IS the
        # novel metric, reference README.md:14-28)
        ok = (ok and "novel_mAP" in ref and "novel_mAP" in ours
              and ref["novel_mAP"] >= 0.3
              and abs(ref["novel_mAP"] - ours["novel_mAP"]) < 0.003)
    log("PASS" if ok else "FAIL",
        "(target: |delta| < 0.003 at mAP >= 0.3"
        + (", novel_mAP >= 0.3" if check_novel else "") + ")")
    return 0 if ok else 1


def _diff_coco(args, ours_name):
    """Both-stacks diff through the COCO evaluator chain (VERDICT r4 #4):
    results-json → COCOeval → stats + per-category AP on each side.
    Decisive quantity: AP50 (the VOC-protocol IoU)."""
    with open(os.path.join(args.out, "ref_eval_coco.json")) as f:
        ref = json.load(f)
    with open(os.path.join(args.out, ours_name + ".json")) as f:
        ours = json.load(f)
    d50 = abs(ref["AP50"] - ours["AP50"])
    dap = abs(ref["AP"] - ours["AP"])
    log(f"reference AP50 {ref['AP50']:.4f}  ours {ours['AP50']:.4f}  "
        f"|delta| {d50:.5f}")
    log(f"reference AP   {ref['AP']:.4f}  ours {ours['AP']:.4f}  "
        f"|delta| {dap:.5f}")
    cat_deltas = []
    for k in ref:
        if k.startswith("AP-") and k in ours:
            a, b = ref[k], ours[k]
            if a == a and b == b:  # skip NaN (class absent on both sides)
                cat_deltas.append((abs(a - b), k))
    if cat_deltas:
        cat_deltas.sort(reverse=True)
        log(f"per-category AP deltas: max {cat_deltas[0][0]:.4f} "
            f"({cat_deltas[0][1]}), mean "
            f"{sum(d for d, _ in cat_deltas) / len(cat_deltas):.5f} "
            f"over {len(cat_deltas)} categories")

    from ct_tpu.tools.diff_detections import diff

    det_ours = os.path.join(args.out, ours_name, "inference",
                            "detections.pkl")
    det_ref = os.path.join(args.out, "detections_ref_coco.pkl")
    if os.path.exists(det_ours) and os.path.exists(det_ref):
        stats = diff(det_ours, det_ref)
        log(json.dumps(stats, indent=1, default=float))
    ok = d50 < 0.003 and ref["AP50"] >= 0.3
    log("PASS" if ok else "FAIL",
        "(target: |delta AP50| < 0.003 at AP50 >= 0.3)")
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["build", "build2", "build3", "train",
                                    "train2", "eval-ours", "diff"])
    ap.add_argument("--out", default=os.path.join(REPO, ".parity_real"))
    ap.add_argument("--images", type=int, default=400)
    ap.add_argument("--test-images", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--size", type=int, default=300,
                    help="input resolution (300 or 512)")
    ap.add_argument("--accum", type=int, default=1,
                    help="gradient-accumulation micro-steps (512@64: 4)")
    ap.add_argument("--lr", type=float, default=4e-3)
    ap.add_argument("--export-name", default="ref_model.pth")
    ap.add_argument("--name", default=None,
                    help="override the eval/diff result-file stem "
                         "(default: derived from the variant flags)")
    ap.add_argument("--dataset", default="VOC", choices=["VOC", "COCO"],
                    help="train/eval-ours/diff dataset (COCO: transfer "
                         "source pretrain + COCO-evaluator parity)")
    ap.add_argument("--load-name", default="ref_model.pth",
                    help="checkpoint consumed by eval-ours")
    # phase-2 (train2 / eval-ours / diff)
    ap.add_argument("--phase", type=int, default=1)
    ap.add_argument("--setting", default="incre",
                    choices=["incre", "transfer"],
                    help="phase-2 protocol (train2/eval-ours/diff)")
    ap.add_argument("--phase1-name", default="phase1.pth",
                    help="phase-1 checkpoint consumed by train2")
    ap.add_argument("--shot", type=int, default=5)
    ap.add_argument("--init-iter", type=int, default=50)
    ap.add_argument("--no-mixup-iter", type=int, default=100)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--calib-images", type=int, default=8,
                    help="int8 calibration set size (sweep: 8/32/128)")
    ap.add_argument("--int8-heads", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--approx", action="store_true")
    ap.add_argument("--pool", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rc = {"build": cmd_build, "build2": cmd_build2, "build3": cmd_build3,
          "train": cmd_train, "train2": cmd_train2,
          "eval-ours": cmd_eval_ours, "diff": cmd_diff}[args.cmd](args)
    sys.exit(rc or 0)


if __name__ == "__main__":
    main()
