#!/usr/bin/env python
"""Reference-side half of the trained-checkpoint mAP parity check.

Trains the *reference* torch RFBNet300 (phase 1, incre split 1) on the
synthetic mini-VOC fixture and evaluates it through the *reference* eval
stack — model forward, Detect decode+fusion, per-class threshold + NMS,
top-200 cap, VOC result files + voc_eval — exactly replicating
/root/reference/test.py:96-175. The only substitution is the unbuilt
Cython NMS: ``utils.nms_wrapper`` is fed this repo's native ``cpu_nms``,
which is parity-tested against the reference ``py_cpu_nms`` oracle
(tests/test_native.py), and the vendored ``pycocotools.mask`` Cython module
is fed this repo's API-compatible ``ct_tpu.data.mask`` (only needed to
satisfy the ``data`` package import chain — VOC eval never calls it).

Artifacts (under --out):
  voc/                  the mini-VOC fixture (shared with the JAX side)
  ref_model.pth         {"model": state_dict, "iteration": N}
  detections_ref.pkl    reference all_boxes (for per-detection diffing)
  ref_eval.json         {"mAP": .., "APs": {cls: ap}, "iters": N}

The JAX side (tests/test_trained_parity.py) loads the same .pth through
ct_tpu.models.torch_import, evaluates with this repo's test.py stack on the
same fixture, and asserts |ΔmAP| < 0.3 (BASELINE.md fidelity target).
"""

import argparse
import json
import os
import pickle
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def install_stubs():
    """Make the reference importable without its Cython builds."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    sys.path.insert(0, REPO)
    from ct_tpu import native
    from ct_tpu.data import mask as mask_api

    sys.path.insert(0, REFERENCE)
    # numpy-2 aliases used by the vintage code
    for alias, real in (("float", np.float64), ("int", np.int64),
                        ("bool", np.bool_)):
        if alias not in np.__dict__:
            setattr(np, alias, real)

    import utils  # noqa: F401  (reference package; creates the namespace)
    import utils.pycocotools  # noqa: F401

    sys.modules["utils.pycocotools.mask"] = mask_api
    sys.modules["utils.pycocotools._mask"] = mask_api  # never called

    nms_pkg = types.ModuleType("utils.nms")
    nms_pkg.__path__ = [os.path.join(REFERENCE, "utils", "nms")]
    sys.modules["utils.nms"] = nms_pkg
    cpu_mod = types.ModuleType("utils.nms.cpu_nms")
    cpu_mod.cpu_nms = lambda dets, thresh: native.cpu_nms(dets, thresh)
    cpu_mod.cpu_soft_nms = native.cpu_soft_nms
    sys.modules["utils.nms.cpu_nms"] = cpu_mod
    gpu_mod = types.ModuleType("utils.nms.gpu_nms")

    def _no_gpu(*a, **k):
        raise RuntimeError("gpu_nms unavailable; use force_cpu=True")

    gpu_mod.gpu_nms = _no_gpu
    sys.modules["utils.nms.gpu_nms"] = gpu_mod


def make_args(ns_extra=None):
    ns = argparse.Namespace(
        phase=1, setting="incre", method="ours", split=1, shot=5,
        instance_shot=False, cuda=False, cpu=True, dataset="VOC",
        size="300",
    )
    for k, v in (ns_extra or {}).items():
        setattr(ns, k, v)
    return ns


def class_dims(phase: int, setting: str, dataset: str = "VOC"):
    """Reference test.py:54-84 state machine (method 'ours')."""
    if phase == 1:
        if dataset == "COCO":
            return 61, 60      # num_classes (incl bg), src_cls_dim
        return 16, 15
    if setting == "incre":
        return 21, 15
    return 21, 60              # transfer 'ours'


def eval_coco(args_cli):
    """Reference-stack COCO eval (VERDICT r4 #4): model forward → Detect →
    per-class NMS → top-200 cap → reference `_write_coco_results_file` →
    vendored COCOeval → `_derive_coco_results` per-category table
    (reference data/coco.py:232-345, test.py:96-175). Writes
    ref_eval_coco.json (fractions) + detections_ref_coco.pkl."""
    import torch

    torch.set_num_threads(max(1, os.cpu_count()))
    from data import COCODetection, BaseTransform
    from data.config import COCO_300, COCO_512
    from layers.functions import PriorBox, Detect
    from models.RFB_Net_vgg import build_net
    from utils.nms_wrapper import nms

    out = args_cli.out
    num_classes, src_cls_dim = class_dims(1, "transfer", "COCO")
    args = make_args({"phase": 1, "setting": "transfer",
                      "dataset": "COCO", "size": str(args_cli.size)})
    cfg = COCO_512 if args_cli.size == 512 else COCO_300
    priors = PriorBox(cfg).forward()
    model = build_net(args, args_cli.size, src_cls_dim)
    model.device = "cpu"
    state = torch.load(os.path.join(out, args_cli.load_name),
                       map_location="cpu", weights_only=False)
    model.load_state_dict(state["model"])
    model.eval()

    dataset = COCODetection(os.path.join(out, "coco"),
                            [("2014", "split_nonvoc_minival")], None)
    detector = Detect(num_classes, 0, cfg)
    transform = BaseTransform(model.size, (104, 117, 123), (2, 0, 1))
    n = len(dataset)
    all_boxes = [[[] for _ in range(n)] for _ in range(num_classes)]
    for i in range(n):
        img = dataset.pull_image(i)
        scale = torch.Tensor(
            [img.shape[1], img.shape[0], img.shape[1], img.shape[0]])
        with torch.no_grad():
            x = transform(img).unsqueeze(0)
            boxes, scores = detector.forward(model(x), priors)
        boxes = (boxes[0] * scale).cpu().numpy()
        scores = scores[0].cpu().numpy()
        for j in range(1, num_classes):
            inds = np.where(scores[:, j] > 0.01)[0]
            if len(inds) == 0:
                all_boxes[j][i] = np.empty([0, 5], dtype=np.float32)
                continue
            c_dets = np.hstack(
                (boxes[inds], scores[inds, j, np.newaxis])
            ).astype(np.float32, copy=False)
            keep = nms(c_dets, 0.45, force_cpu=True)
            all_boxes[j][i] = c_dets[keep, :]
        image_scores = np.hstack(
            [all_boxes[j][i][:, -1] for j in range(1, num_classes)])
        if len(image_scores) > 200:
            thresh = np.sort(image_scores)[-200]
            for j in range(1, num_classes):
                keep = np.where(all_boxes[j][i][:, -1] >= thresh)[0]
                all_boxes[j][i] = all_boxes[j][i][keep, :]
        if (i + 1) % 16 == 0 or i + 1 == n:
            print(f"eval {i + 1}/{n}", flush=True)

    with open(os.path.join(out, "detections_ref_coco.pkl"), "wb") as f:
        pickle.dump(all_boxes, f, pickle.HIGHEST_PROTOCOL)

    # numpy-2 `dets == []` shim. Unlike the VOC writer, the COCO writer
    # calls `.astype` BEFORE its `dets == []` check
    # (/root/reference/data/coco.py:245-246), so every entry must stay an
    # ndarray — the subclass survives astype and answers `== []` with the
    # legacy False scalar.
    class _DetArray(np.ndarray):
        def __eq__(self, other):
            if isinstance(other, list) and not other:
                return False
            return np.ndarray.__eq__(self, other)

    shim_boxes = [
        [np.asarray(d, dtype=np.float32).reshape(-1, 5).view(_DetArray)
         for d in per_cls]
        for per_cls in all_boxes
    ]
    res_file = os.path.join(out, "ref_results_coco.json")
    dataset._write_coco_results_file(shim_boxes, res_file)

    from utils.pycocotools.cocoeval import COCOeval

    coco_dt = dataset._COCO.loadRes(res_file)
    coco_eval = COCOeval(dataset._COCO, coco_dt, "bbox")
    coco_eval.evaluate()
    coco_eval.accumulate()
    coco_eval.summarize()
    derived = dataset._derive_coco_results(
        coco_eval, "bbox", class_names=dataset.class_name)
    # _derive_coco_results reports percentages; store fractions to match
    # the ct_tpu evaluator's scale
    result = {k: (v / 100.0 if v == v else v) for k, v in derived.items()}
    with open(os.path.join(out, "ref_eval_coco.json"), "w") as f:
        json.dump(result, f, indent=1)
    print("reference COCO AP50:", result["AP50"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, ".parity"))
    ap.add_argument("--iters", type=int, default=240)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--phase", type=int, default=1,
                    help="2: evaluate a phase-2 (CT-head) checkpoint")
    ap.add_argument("--setting", default="incre",
                    choices=["incre", "transfer"])
    ap.add_argument("--split", type=int, default=1)
    ap.add_argument("--size", type=int, default=300,
                    help="input resolution (300 or 512; ref test.py:16-43)")
    ap.add_argument("--dataset", default="VOC", choices=["VOC", "COCO"],
                    help="COCO: evaluate through the reference COCO "
                         "evaluator chain (eval-only)")
    ap.add_argument("--load-name", default="ref_model.pth",
                    help="checkpoint file (under --out) to evaluate")
    args_cli = ap.parse_args()
    if args_cli.phase == 2 and not args_cli.eval_only:
        ap.error("--phase 2 supports --eval-only (training is the TPU "
                 "stack's job; scripts/real_parity.py train2)")
    if args_cli.dataset == "COCO" and not args_cli.eval_only:
        ap.error("--dataset COCO supports --eval-only")

    install_stubs()
    if args_cli.dataset == "COCO":
        return eval_coco(args_cli)
    import torch

    torch.manual_seed(0)
    torch.set_num_threads(max(1, os.cpu_count()))

    from fixtures import make_mini_voc_all

    out = args_cli.out
    os.makedirs(out, exist_ok=True)
    voc_root = os.path.join(out, "voc")
    devkit = os.path.join(voc_root, "VOCdevkit")
    if not os.path.isdir(devkit):
        make_mini_voc_all(
            voc_root, num_images=args_cli.images,
            classes=("aeroplane", "bicycle", "boat", "car"),  # split-1 base
        )

    from data import VOCDetection, AnnotationTransform, detection_collate
    from data import preproc, BaseTransform
    from data.config import VOC_300, VOC_512
    from data.voc_eval import voc_eval
    from layers.functions import PriorBox, Detect
    from layers.modules.multibox_loss_combined import MultiBoxLoss_combined
    from models.RFB_Net_vgg import build_net
    from utils.nms_wrapper import nms

    num_classes, src_cls_dim = class_dims(args_cli.phase, args_cli.setting)
    rgb_means = (104, 117, 123)
    args = make_args({"phase": args_cli.phase, "setting": args_cli.setting,
                      "split": args_cli.split, "size": str(args_cli.size)})
    cfg = VOC_512 if args_cli.size == 512 else VOC_300
    priors = PriorBox(cfg).forward()

    model = build_net(args, args_cli.size, src_cls_dim)
    model.device = "cpu"
    ckpt_path = os.path.join(out, args_cli.load_name)

    if not args_cli.eval_only:
        dataset = VOCDetection(
            args, devkit,
            [("2007", "trainval"), ("2012", "trainval")],
            preproc(args_cli.size, rgb_means, 0.6),
            AnnotationTransform(args.split),
        )
        print(f"train dataset: {len(dataset)} images")
        from utils.sampler import TrainingSampler

        loader = iter(torch.utils.data.DataLoader(
            dataset, args_cli.batch,
            sampler=TrainingSampler(len(dataset), shuffle=True, seed=0),
            num_workers=0, collate_fn=detection_collate,
        ))
        criterion = MultiBoxLoss_combined(
            num_classes, 0.5, True, 0, True, 3, 0.5, False
        )
        opt = torch.optim.SGD(model.parameters(), lr=args_cli.lr,
                              momentum=0.9, weight_decay=5e-4)
        model.train()
        t0 = time.time()
        for it in range(args_cli.iters):
            data, targets = next(loader)
            loss_dict = criterion(model(data), priors, targets)
            losses = sum(loss_dict.values())
            opt.zero_grad()
            losses.backward()
            opt.step()
            if it % 10 == 0 or it == args_cli.iters - 1:
                dt = time.time() - t0
                print(f"iter {it} loss={float(losses):.4f} "
                      f"({dt / (it + 1):.1f}s/it)", flush=True)
        torch.save({"model": model.state_dict(),
                    "iteration": args_cli.iters - 1}, ckpt_path)
        print("saved", ckpt_path)
    else:
        state = torch.load(ckpt_path, map_location="cpu",
                           weights_only=False)
        model.load_state_dict(state["model"])

    # ---- reference eval path (test.py:96-175 replica) ---------------------
    model.eval()
    detector = Detect(num_classes, 0, cfg)
    test_ds = VOCDetection(
        args, devkit, [("2007", "test")], None,
        AnnotationTransform(0 if args.setting == "transfer"
                            else args.split), True)
    transform = BaseTransform(model.size, rgb_means, (2, 0, 1))
    n = len(test_ds)
    all_boxes = [[[] for _ in range(n)] for _ in range(num_classes)]
    for i in range(n):
        img = test_ds.pull_image(i)
        scale = torch.Tensor(
            [img.shape[1], img.shape[0], img.shape[1], img.shape[0]]
        )
        with torch.no_grad():
            x = transform(img).unsqueeze(0)
            pred = model(x)
            boxes, scores = detector.forward(pred, priors)
        boxes = (boxes[0] * scale).cpu().numpy()
        scores = scores[0].cpu().numpy()
        for j in range(1, num_classes):
            inds = np.where(scores[:, j] > 0.01)[0]
            if len(inds) == 0:
                all_boxes[j][i] = np.empty([0, 5], dtype=np.float32)
                continue
            c_dets = np.hstack(
                (boxes[inds], scores[inds, j, np.newaxis])
            ).astype(np.float32, copy=False)
            keep = nms(c_dets, 0.45, force_cpu=True)
            all_boxes[j][i] = c_dets[keep, :]
        image_scores = np.hstack(
            [all_boxes[j][i][:, -1] for j in range(1, num_classes)]
        )
        if len(image_scores) > 200:
            thresh = np.sort(image_scores)[-200]
            for j in range(1, num_classes):
                keep = np.where(all_boxes[j][i][:, -1] >= thresh)[0]
                all_boxes[j][i] = all_boxes[j][i][keep, :]
        print(f"eval {i + 1}/{n}", flush=True)

    with open(os.path.join(out, "detections_ref.pkl"), "wb") as f:
        pickle.dump(all_boxes, f, pickle.HIGHEST_PROTOCOL)

    # numpy-2 shim: the reference's `dets == []` idiom raises on broadcast
    # mismatch under numpy 2; restore the legacy False-scalar behavior for
    # the det arrays only (empty entries become plain lists).
    class _DetArray(np.ndarray):
        def __eq__(self, other):
            if isinstance(other, list) and not other:
                return False
            return np.ndarray.__eq__(self, other)

    shim_boxes = [
        [(d.view(_DetArray) if getattr(d, "size", 0) else [])
         for d in per_cls]
        for per_cls in all_boxes
    ]

    # result files + per-class AP (replicating _do_python_eval paths)
    test_ds._write_voc_results_file(shim_boxes)
    rootpath = os.path.join(devkit, "VOC2007")
    annopath = os.path.join(rootpath, "Annotations", "{:s}.xml")
    imagesetfile = os.path.join(rootpath, "ImageSets", "Main", "test.txt")
    cachedir = os.path.join(devkit, "annotations_cache")
    from data.voc0712 import VOC_CLASSES

    aps = {}
    split = 0 if args.setting == "transfer" else args.split
    eval_classes = VOC_CLASSES[split][1:num_classes]
    for cls in eval_classes:
        fn = test_ds._get_voc_results_file_template().format(cls)
        _, _, ap_val = voc_eval(fn, annopath, imagesetfile, cls, cachedir,
                                ovthresh=0.5, use_07_metric=True)
        aps[cls] = float(ap_val)
    m_ap = float(np.mean(list(aps.values())))
    result = {"mAP": m_ap, "APs": aps}
    if not args_cli.eval_only:
        # training metadata is meaningless on --eval-only runs (the
        # defaults would be recorded for a checkpoint trained elsewhere)
        result.update(iters=args_cli.iters, images=args_cli.images)
    if args_cli.phase == 2 and args.setting == "incre":
        vals = [aps[c] for c in eval_classes]
        result["base_mAP"] = float(np.mean(vals[:15]))
        result["novel_mAP"] = float(np.mean(vals[15:]))
        print("base mAP:", result["base_mAP"],
              " novel mAP:", result["novel_mAP"])
    with open(os.path.join(out, "ref_eval.json"), "w") as f:
        json.dump(result, f, indent=1)
    print("reference mAP:", m_ap)
    print(json.dumps(aps, indent=1))


if __name__ == "__main__":
    main()
