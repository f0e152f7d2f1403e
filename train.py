#!/usr/bin/env python
"""Training CLI — flag-compatible with the reference ``train.py``.

Capability parity target: /root/reference/train.py — the same argparse
surface (:21-86), train-set selection (:93-103), phase/setting/method state
machine (:105-131), OBJ_Target initialization (:252-286), mixup scheduling
(:209-218), and checkpoint-period/resume semantics — driving the TPU-native
stack: jitted SPMD train step over a device mesh instead of DataParallel.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Context-Transformer (TPU)")
    # Model and Dataset
    parser.add_argument("-s", "--size", default="300",
                        help="300 or 512 input size.")
    parser.add_argument("--basenet", default="./weights/vgg16_reducedfc.pth",
                        help="Pretrained base model")
    parser.add_argument("-d", "--dataset", default="VOC",
                        help="VOC or COCO dataset.")
    parser.add_argument("--split", type=int, default=1,
                        help="VOC base/novel split, for VOC only.")
    # Training Parameters
    parser.add_argument("--setting", default="transfer",
                        help="Training setting: transfer or incre.")
    parser.add_argument("-p", "--phase", type=int, default=1,
                        help="1: source pretraining, 2: target finetuning.")
    parser.add_argument("-m", "--method", default="ours",
                        help="ft(baseline) or ours, for phase 2 only.")
    parser.add_argument("--shot", type=int, default=5,
                        help="Number of shots, for phase 2 only.")
    parser.add_argument("--init-iter", type=int, default=50,
                        help="Batches used for OBJ_Target initialization")
    parser.add_argument("-max", "--max-iter", type=int, default=180000)
    parser.add_argument("-b", "--batch-size", type=int, default=64)
    parser.add_argument("--lr", "--learning-rate", type=float, default=4e-3)
    parser.add_argument("--steps", type=int, nargs="+",
                        default=[120000, 150000])
    parser.add_argument("--warmup-iter", type=int, default=5000)
    parser.add_argument("--ndev", type=int, default=0,
                        help="Devices in the data-parallel mesh (0 = all)")
    parser.add_argument("--num-workers", type=int, default=4,
                        help="Host data-pipeline workers")
    parser.add_argument("--worker-type", default="thread",
                        choices=["thread", "process"],
                        help="Loader worker pool: threads (production "
                             "--device-augment route) or spawn processes "
                             "(the reference's DataLoader scaling model; "
                             "use for the host-augment parity pipeline, "
                             "whose ~13 ms/img TrainAugment needs ~9 cores "
                             "to feed the train step)")
    parser.add_argument("--momentum", type=float, default=0.9)
    parser.add_argument("--weight-decay", type=float, default=5e-4)
    parser.add_argument("--gamma", type=float, default=0.1)
    parser.add_argument("--load-file", default=None,
                        help="Model checkpoint for loading.")
    parser.add_argument("--resume", action="store_true",
                        help="Resume from the last checkpoint.")
    parser.add_argument("-is", "--instance-shot", action="store_true",
                        help="Use instance shots for the transfer setting.")
    # Mixup
    parser.add_argument("--mixup", action="store_true")
    parser.add_argument("--no-mixup-iter", type=int, default=800,
                        help="Disable mixup for the last iterations.")
    # Output
    parser.add_argument("--save-folder", default="./weights/")
    parser.add_argument("--checkpoint-period", type=int, default=10000)
    parser.add_argument("--max-objs", type=int, default=100,
                        help="Static per-image annotation padding")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (TPU)")
    parser.add_argument("--pallas-ct", choices=["auto", "on", "off"],
                        default="auto",
                        help="Fused Pallas CT attention (auto = on TPU)")
    parser.add_argument("--profile-dir", default=None,
                        help="Capture a jax.profiler trace of steps 10-15")
    parser.add_argument("--orbax", action="store_true",
                        help="Checkpoint via orbax (multi-host, async "
                             "background saves) instead of the msgpack "
                             "writer; .pth interop still works for loads")
    parser.add_argument("--device-augment", action="store_true",
                        help="Run SSD augmentation batched on device "
                             "(host only decodes+resizes; no dataset-level "
                             "mixup on this path)")
    parser.add_argument("--canvas", type=int, default=384,
                        help="Working-canvas size for --device-augment")
    parser.add_argument("--fused-opt", choices=["on", "off"], default="off",
                        help="Flat-vector fused SGD update (bit-identical "
                             "math). Default off: on v5e the per-leaf "
                             "chain is ~5.7 ms/step FASTER at batch 64 — "
                             "the ravel/unravel passes cost more than the "
                             "per-leaf HLOs (r5 A/B, docs/ROADMAP.md)")
    parser.add_argument("--accum-steps", type=int, default=1,
                        help="Gradient accumulation micro-batches per step "
                             "(512-model training at effective batch 64 "
                             "on one chip)")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from ct_tpu.utils.cache import (
        enable_compilation_cache, require_tpu_tunnel,
    )

    require_tpu_tunnel()
    enable_compilation_cache()

    from ct_tpu.config import (
        RGB_MEANS, EXPAND_PROB, OVERLAP_THRESHOLD, get_config, resolve_task,
    )
    from ct_tpu.data.augment import TrainAugment
    from ct_tpu.data.coco import COCODetection
    from ct_tpu.data.loader import Loader
    from ct_tpu.data.voc import AnnotationTransform, VOCDetection
    from ct_tpu.models import build_net
    from ct_tpu.ops.priors import prior_boxes
    from ct_tpu.parallel import make_mesh, replicate, shard_batch
    from ct_tpu.train.checkpointer import Checkpointer, PeriodicCheckpointer
    from ct_tpu.train.events import (
        CommonMetricPrinter, EventStorage, JSONWriter, TensorboardWriter,
    )
    from ct_tpu.train.reweight import init_reweight
    from ct_tpu.train.solver import (
        SolverConfig, build_optimizer, warmup_multistep_schedule,
    )
    from ct_tpu.train.step import (
        TrainState, init_train_state, make_train_step,
    )
    from ct_tpu.utils.logger import setup_logger

    os.makedirs(args.save_folder, exist_ok=True)
    logger = setup_logger(args.save_folder)

    img_dim = 512 if args.size == "512" else 300
    task = resolve_task(args.phase, args.setting, args.method, args.dataset)
    cfg = get_config(args.dataset, img_dim)
    priors = prior_boxes(cfg)
    solver_cfg = SolverConfig(
        lr=args.lr, momentum=args.momentum, weight_decay=args.weight_decay,
        gamma=args.gamma, steps=tuple(args.steps),
        warmup_iters=args.warmup_iter,
    )

    # --- dataset selection (reference train.py:93-103) --------------------
    if args.device_augment:
        from ct_tpu.data.augment import RawCanvasTransform

        preproc = RawCanvasTransform(args.canvas)
        # mixup runs batch-level on device (augment_jax.mixup_batch)
    else:
        preproc = TrainAugment(img_dim, RGB_MEANS, EXPAND_PROB)

    if args.dataset == "VOC":
        if args.phase == 2 and (args.setting == "incre" or args.instance_shot):
            train_sets = [("2007", "trainval")]
        else:
            train_sets = [("2007", "trainval"), ("2012", "trainval")]
        dataset = VOCDetection(
            os.environ.get("VOC_ROOT", "data/VOCdevkit"),
            train_sets,
            preproc,
            AnnotationTransform(0 if args.setting == "transfer" else args.split),
            phase=args.phase, setting=args.setting, split=args.split,
            shot=args.shot, instance_shot=args.instance_shot,
        )
    elif args.dataset == "COCO":
        train_sets = [("2014", "split_nonvoc_train"),
                      ("2014", "split_nonvoc_valminusminival")]
        dataset = COCODetection(
            os.environ.get("COCO_ROOT", "data/COCO"), train_sets, preproc,
        )
    else:
        raise ValueError(f"Unknown dataset: {args.dataset}")

    # --- model / mesh / optimizer ----------------------------------------
    dtype = jnp.bfloat16 if args.bf16 else None
    on_tpu = jax.devices()[0].platform == "tpu"
    use_pallas = args.pallas_ct == "on" or (
        args.pallas_ct == "auto" and on_tpu
    )
    # lane-packed conv1 stage (training-only, r5): rides the same Pallas
    # gate — its fused pool kernel is TPU-only; the XLA fallback is exact
    # but slower than the standard stage on CPU
    net = build_net(task, img_dim, dtype=dtype, pack_conv1=use_pallas)
    if use_pallas:
        import dataclasses

        # use_pallas_ct gates BOTH the fused CT attention (phase 2) and
        # the packed-stage pool kernel (all phases)
        net = dataclasses.replace(net, use_pallas_ct=True)
        if task.has_ct_head:
            logger.info("Using fused Pallas CT attention")
    mesh = make_mesh(args.ndev or None)
    logger.info("Mesh: %s", mesh)

    state = init_train_state(net, None, jax.random.PRNGKey(0), img_dim)
    from ct_tpu.train.solver import build_fused_optimizer

    build_tx = (build_fused_optimizer if args.fused_opt == "on"
                else build_optimizer)
    tx = build_tx(state.params, task, solver_cfg)

    ck = Checkpointer(args.save_folder)
    load_path = args.basenet if args.phase == 1 else args.load_file
    orbax_ck = None
    if args.orbax:
        from ct_tpu.train.orbax_ckpt import OrbaxCheckpointer

        orbax_ck = OrbaxCheckpointer(
            os.path.join(args.save_folder, "orbax")
        )
    if (orbax_ck is not None and args.resume
            and orbax_ck.has_checkpoint() and args.phase == 1):
        loaded = orbax_ck.resume(
            state.params, state.batch_stats, tx.init(state.params)
        )
        opt_state = loaded["opt_state"]
        start_iter = loaded["iteration"] + 1
    else:
        loaded = ck.resume_or_load(
            load_path, state.params, state.batch_stats, resume=args.resume,
            load_optimizer=args.phase == 1,
        )
        start_iter = loaded["iteration"] + 1
        if loaded["opt_state"] is not None:
            from flax import serialization

            try:
                opt_state = serialization.from_state_dict(
                    tx.init(loaded["params"]), loaded["opt_state"]
                )
            except (ValueError, KeyError, TypeError):
                # checkpoint was written by the other optimizer flavor —
                # rebuild with it so momentum/schedule state carries over
                other = (build_optimizer if args.fused_opt == "on"
                         else build_fused_optimizer)
                logger.warning(
                    "optimizer state in checkpoint does not match "
                    "--fused-opt=%s; resuming with the other flavor",
                    args.fused_opt)
                tx = other(loaded["params"], task, solver_cfg)
                opt_state = serialization.from_state_dict(
                    tx.init(loaded["params"]), loaded["opt_state"]
                )
        else:
            opt_state = tx.init(loaded["params"])
    state = TrainState(loaded["params"], loaded["batch_stats"], opt_state,
                       jnp.asarray(start_iter, jnp.int32))

    if args.accum_steps > 1 and args.batch_size % args.accum_steps:
        raise SystemExit("--batch-size must divide by --accum-steps")
    step_fn = make_train_step(net, priors, task, tx,
                              OVERLAP_THRESHOLD, mesh=mesh,
                              accum_steps=args.accum_steps)
    periodic = PeriodicCheckpointer(orbax_ck if orbax_ck is not None else ck,
                                    args.checkpoint_period, args.max_iter)
    schedule = warmup_multistep_schedule(solver_cfg)

    loader = Loader(dataset, args.batch_size, num_workers=args.num_workers,
                    max_objs=args.max_objs, seed=0,
                    workers=args.worker_type)

    # --- phase-2 'ours' extras: OBJ_Target init + mixup -------------------
    device_mixup = False
    if task.has_ct_head:
        rw_loader = loader
        if args.device_augment:
            # the Loader ships raw canvases on this route; init_reweight
            # must see AUGMENTED images at the model resolution (the
            # reference augments inside its DataLoader workers, so its
            # init forward runs on preproc'd 300² batches, train.py:263).
            # Never mixed: the reference inits before dataset.set_mixup.
            from ct_tpu.data.augment_jax import augment_batch

            class _AugAdapter:
                def __init__(self):
                    self.i = 0

                def next(self):
                    self.i += 1
                    b = loader.next()
                    a = augment_batch(
                        jax.random.fold_in(jax.random.PRNGKey(3), self.i),
                        jax.numpy.asarray(b["image"]),
                        jax.numpy.asarray(b["boxes"]),
                        jax.numpy.asarray(b["labels"]),
                        jax.numpy.asarray(b["valid"]),
                        out_size=img_dim, out_dtype=dtype,
                    )
                    return dict(a, weights=jax.numpy.asarray(b["weights"]))

            rw_loader = _AugAdapter()
        state = init_reweight(
            args, net, state, rw_loader, priors, task, logger=logger
        )
        if args.mixup and args.device_augment:
            device_mixup = True   # batch-level mixup fused into the device
            # augmentation pass (reference semantics: voc0712.py:240-275)
        elif args.mixup:
            dataset.set_mixup(np.random.beta, 1.5, 1.5)
            loader.restart()
        logger.info("Fine tuning on %d-shot task", args.shot)

    writers = [CommonMetricPrinter(args.max_iter),
               JSONWriter(os.path.join(args.save_folder, "metrics.json")),
               TensorboardWriter(args.save_folder)]
    logger.info("Starting training from iteration %d", start_iter)

    from ct_tpu.utils.profiler import StepTimer, trace

    state = replicate(mesh, state)
    storage = EventStorage(start_iter)
    timer = StepTimer()
    profiler_ctx = None

    # Deferred metric fetch: step metrics stay on device and are pulled in
    # one batched device_get at write points (every 20 iters), so the loop
    # never blocks on a per-iteration host↔device round trip and the async
    # dispatch pipeline (donate_argnums double-buffering) stays full. The
    # reference also only *writes* every 20 iters (train.py:239-241).
    pending = []  # [(iteration, device-metrics dict)]

    def flush_metrics():
        if not pending:
            return
        host = jax.device_get([m for _, m in pending])
        for (it, _), vals in zip(pending, host):
            storage.put_scalars(
                iteration=it, **{k: float(v) for k, v in vals.items()}
            )
            storage.put_scalar("lr", float(schedule(it)),
                               smoothing_hint=False, iteration=it)
        pending.clear()
    for iteration in range(start_iter, args.max_iter):
        storage.step()
        if args.profile_dir is not None:
            if iteration == start_iter + 10:
                profiler_ctx = trace(args.profile_dir)
                profiler_ctx.__enter__()
            elif iteration == start_iter + 15 and profiler_ctx is not None:
                profiler_ctx.__exit__(None, None, None)
                profiler_ctx = None
                logger.info("Profiler trace written to %s", args.profile_dir)
        if (
            task.has_ct_head and args.mixup
            and iteration == args.max_iter - args.no_mixup_iter
        ):
            # reference train.py:209-218: mixup off for the last iterations
            if device_mixup:
                device_mixup = False   # next step recompiles for M targets
            else:
                dataset.set_mixup(None)
                loader.restart()

        batch = loader.next()
        if args.device_augment:
            from ct_tpu.data.augment_jax import augment_batch, mixup_batch

            weights = jax.numpy.asarray(batch["weights"])
            aug = augment_batch(
                jax.random.fold_in(jax.random.PRNGKey(1), iteration),
                jax.numpy.asarray(batch["image"]),
                jax.numpy.asarray(batch["boxes"]),
                jax.numpy.asarray(batch["labels"]),
                jax.numpy.asarray(batch["valid"]),
                out_size=img_dim,
                # emit compute-dtype images: the lane-padded [B,S,S,3]
                # feed halves its HBM traffic in bf16 (augment_jax docs)
                out_dtype=dtype,
            )
            batch = dict(aug, weights=weights)
            if device_mixup:
                batch = mixup_batch(
                    jax.random.fold_in(jax.random.PRNGKey(2), iteration),
                    batch,
                    zero_ignored=(args.setting == "incre"
                                  or args.instance_shot),
                )
        batch = shard_batch(mesh, batch)
        state, metrics = step_fn(state, batch)
        pending.append((iteration, metrics))
        dt = timer.tick()
        if dt is not None:
            storage.put_scalar("time", dt)

        if iteration - start_iter > 5 and (
            iteration % 20 == 0 or iteration == args.max_iter - 1
        ):
            flush_metrics()
            for w in writers:
                w.write(storage)
        # the param-tree device_get only happens when a save triggers
        periodic.step(
            iteration,
            state_fn=lambda: dict(
                params=jax.device_get(state.params),
                batch_stats=jax.device_get(state.batch_stats),
                opt_state=jax.device_get(state.opt_state),
            ),
        )
    flush_metrics()
    if orbax_ck is not None:
        orbax_ck.wait()   # drain async saves before exiting
    loader.stop()


if __name__ == "__main__":
    main()
