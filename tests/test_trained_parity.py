"""Trained-checkpoint mAP parity: reference-trained .pth through BOTH stacks.

The BASELINE.md fidelity target is "mAP within 0.3 of the PyTorch
reference". This test drives a checkpoint that was *trained by the
reference torch stack* (scripts/ref_parity_torch.py: 240 iters, phase-1
incre split-1, mini-VOC fixture) through this repo's full eval pipeline
(test.py: batched device forward → decode/fuse → device NMS → VOC eval)
and asserts the mAP delta against the reference stack's own eval.

Gated: needs the .parity artifacts (train the torch side first — ~1 h on
one CPU core) and a multi-minute XLA-CPU compile. Run with:

    python scripts/ref_parity_torch.py            # once, writes .parity/
    CT_TPU_SLOW_TESTS=1 python -m pytest tests/test_trained_parity.py

Last recorded run (2026-08-16, real TPU for the JAX side):
  reference mAP 0.02274, ct_tpu mAP 0.02300  → |Δ| = 0.0003  (target 0.3)
  per-detection diff: 82/87 matched @IoU≥0.75, mean IoU 0.9992,
  p99 box err 0.18 px, p99 score err 8.1e-4 (ct_tpu.tools.diff_detections)
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PARITY = os.path.join(REPO, ".parity")

pytestmark = pytest.mark.skipif(
    not os.environ.get("CT_TPU_SLOW_TESTS")
    or not os.path.exists(os.path.join(PARITY, "ref_model.pth")),
    reason="needs CT_TPU_SLOW_TESTS=1 and .parity artifacts "
           "(python scripts/ref_parity_torch.py)",
)


def test_trained_checkpoint_map_parity(tmp_path, monkeypatch):
    import test as test_cli

    with open(os.path.join(PARITY, "ref_eval.json")) as f:
        ref = json.load(f)

    monkeypatch.setenv(
        "VOC_ROOT", os.path.join(PARITY, "voc", "VOCdevkit")
    )
    res = test_cli.main([
        "-d", "VOC", "-p", "1", "--setting", "incre", "--split", "1",
        "--load-file", os.path.join(PARITY, "ref_model.pth"),
        "--save-folder", str(tmp_path), "-b", "4",
    ])
    # BASELINE "within 0.3 mAP" is percentage points → 0.003 as a fraction;
    # the recorded TPU run achieved |Δ| = 3e-4
    delta = abs(res["mAP"] - ref["mAP"])
    assert delta < 0.003, (res["mAP"], ref["mAP"])

    # per-detection fidelity vs the reference stack's detections
    from ct_tpu.tools.diff_detections import diff

    stats = diff(
        os.path.join(str(tmp_path), "inference", "detections.pkl"),
        os.path.join(PARITY, "detections_ref.pkl"),
    )
    assert stats["match_rate"] > 0.85
    assert stats["mean_matched_iou"] > 0.99
