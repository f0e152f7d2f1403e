"""End-to-end CLI runs on the synthetic mini-VOC (gated: slow compiles).

These replicate the manual verification drives: train a few iterations,
checkpoint, evaluate, re-evaluate from cache — for phase 1 and both phase-2
protocols. Each costs minutes of XLA-CPU compile, so they are opt-in:

    CT_TPU_SLOW_TESTS=1 python -m pytest tests/test_cli_e2e.py
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(
    not os.environ.get("CT_TPU_SLOW_TESTS"),
    reason="slow CLI compiles; set CT_TPU_SLOW_TESTS=1",
)

COMMON = [
    "-b", "2", "--ndev", "1", "--num-workers", "2", "--lr", "1e-4",
    "--warmup-iter", "0", "--max-objs", "16",
]


@pytest.fixture()
def devkit(tmp_path, monkeypatch):
    from fixtures import make_mini_voc_all

    dk = make_mini_voc_all(str(tmp_path))
    monkeypatch.setenv("VOC_ROOT", dk)
    yield dk
    # each CLI run compiles a full train+eval program; drop the jit caches
    # so a sequence of these tests doesn't accumulate into an OOM abort
    import jax

    jax.clear_caches()


def test_phase1_train_eval_retest(devkit, tmp_path):
    import train as train_cli
    import test as test_cli

    save = str(tmp_path / "w1")
    train_cli.main(["-d", "VOC", "-p", "1", "--max-iter", "3",
                    "--checkpoint-period", "2", "--save-folder", save]
                   + COMMON)
    files = os.listdir(save)
    assert "model_final.ckpt" in files and "last_checkpoint" in files

    res = test_cli.main(["-d", "VOC", "-p", "1",
                         "--load-file", save + "/model_final.ckpt",
                         "--save-folder", save, "-b", "4"])
    assert "mAP" in res and len(res["APs"]) == 15
    res2 = test_cli.main(["-d", "VOC", "-p", "1", "--retest",
                          "--save-folder", save])
    assert res2["mAP"] == res["mAP"]

    # device NMS vs native host NMS: detections must agree (the only
    # divergence allowed is the device path's top-200 candidate tail)
    import shutil

    from ct_tpu.tools.diff_detections import diff

    dev = save + "/dets_device.pkl"
    shutil.copy(save + "/inference/detections.pkl", dev)
    test_cli.main(["-d", "VOC", "-p", "1", "--host-nms",
                   "--load-file", save + "/model_final.ckpt",
                   "--save-folder", save, "-b", "4"])
    fid = diff(dev, save + "/inference/detections.pkl", iou_thr=0.75)
    assert fid["match_rate"] > 0.95, fid
    assert fid["p99_box_err_px"] == 0.0, fid


def test_phase2_transfer_instance_shot(devkit, tmp_path):
    import train as train_cli
    import test as test_cli

    save = str(tmp_path / "w2")
    train_cli.main(["-d", "VOC", "-p", "2", "--setting", "transfer",
                    "-m", "ours", "--shot", "1", "-is", "--mixup",
                    "--no-mixup-iter", "2", "--init-iter", "2",
                    "--max-iter", "4", "--checkpoint-period", "10",
                    "--save-folder", save] + COMMON)
    res = test_cli.main(["-d", "VOC", "-p", "2", "--setting", "transfer",
                         "--method", "ours",
                         "--load-file", save + "/model_final.ckpt",
                         "--save-folder", save, "-b", "4"])
    assert len(res["APs"]) == 20


def test_phase2_incre(devkit, tmp_path):
    import train as train_cli
    import test as test_cli

    save = str(tmp_path / "w3")
    train_cli.main(["-d", "VOC", "-p", "2", "--setting", "incre",
                    "-m", "ours", "--split", "1", "--shot", "1",
                    "--init-iter", "2", "--max-iter", "3",
                    "--checkpoint-period", "10",
                    "--save-folder", save] + COMMON)
    res = test_cli.main(["-d", "VOC", "-p", "2", "--setting", "incre",
                         "--method", "ours", "--split", "1",
                         "--load-file", save + "/model_final.ckpt",
                         "--save-folder", save, "-b", "4"])
    assert "base_mAP" in res and "novel_mAP" in res


def test_phase2_ft_baseline(devkit, tmp_path):
    """Plain fine-tune baseline (method='ft'): no CT head, 20-class conf."""
    import train as train_cli
    import test as test_cli

    save = str(tmp_path / "w4")
    train_cli.main(["-d", "VOC", "-p", "2", "--setting", "transfer",
                    "-m", "ft", "--shot", "5", "--max-iter", "2",
                    "--checkpoint-period", "5", "--save-folder", save]
                   + COMMON)
    res = test_cli.main(["-d", "VOC", "-p", "2", "--setting", "transfer",
                         "--method", "ft",
                         "--load-file", save + "/model_final.ckpt",
                         "--save-folder", save, "-b", "4"])
    assert len(res["APs"]) == 20


def test_phase1_coco(tmp_path, monkeypatch):
    """Phase-1 COCO60 pretraining + COCO eval on the mini-COCO fixture
    (reference protocol: train.py -d COCO -p 1 → test.py -d COCO; eval
    through the vendored COCO evaluator)."""
    from fixtures import make_mini_coco

    import train as train_cli
    import test as test_cli

    root = make_mini_coco(str(tmp_path / "coco"))
    monkeypatch.setenv("COCO_ROOT", root)
    save = str(tmp_path / "wc")
    train_cli.main(["-d", "COCO", "-p", "1", "--max-iter", "2",
                    "--checkpoint-period", "2", "--save-folder", save]
                   + COMMON)
    assert "model_final.ckpt" in os.listdir(save)
    res = test_cli.main(["-d", "COCO", "-p", "1",
                         "--load-file", save + "/model_final.ckpt",
                         "--save-folder", save, "-b", "2"])
    # COCO stats dict (AP/AP50/... + per-category) present; undefined
    # area-range stats may be NaN/-1 on the tiny fixture
    assert res and "AP" in res and np.isfinite(res["AP"])
    assert any(k.startswith("AP-") for k in res)

    import jax

    jax.clear_caches()


import numpy as np  # noqa: E402  (used by test_phase1_coco)
