"""Compare two detections.pkl files (box-output fidelity tooling).

The parity target (BASELINE.md) is box-output fidelity vs the PyTorch
reference within 0.3 mAP. This tool quantifies detection-level agreement
between two eval runs — e.g. ct-tpu device-NMS vs ct-tpu --host-nms, or
ct-tpu vs a reference-produced detections.pkl (both use the same
all_boxes[class][image] = [n, 5] layout).

Usage:
    python -m ct_tpu.tools.diff_detections A.pkl B.pkl [--iou 0.75]

Reports per-class detection counts, score-weighted matching rate (greedy
match at the IoU threshold), and box/score deltas among matched pairs.
"""

from __future__ import annotations

import argparse
import pickle

import numpy as np


def _match_dets(a: np.ndarray, b: np.ndarray, iou_thr: float):
    """Greedy score-order matching between two [n,5] det arrays.
    Returns (pairs, unmatched_a, unmatched_b)."""
    a = np.asarray(a, np.float64).reshape(-1, 5)
    b = np.asarray(b, np.float64).reshape(-1, 5)
    used_b = np.zeros(len(b), bool)
    pairs = []
    for i in np.argsort(-a[:, 4]):
        if len(b) == 0:
            break
        ax1, ay1, ax2, ay2 = a[i, :4]
        iw = np.maximum(0, np.minimum(ax2, b[:, 2]) - np.maximum(ax1, b[:, 0]))
        ih = np.maximum(0, np.minimum(ay2, b[:, 3]) - np.maximum(ay1, b[:, 1]))
        inter = iw * ih
        union = ((ax2 - ax1) * (ay2 - ay1)
                 + (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1]) - inter)
        iou = np.where(union > 0, inter / union, 0.0)
        iou[used_b] = -1
        j = int(np.argmax(iou))
        if iou[j] >= iou_thr:
            used_b[j] = True
            pairs.append((i, j, iou[j]))
    unmatched_a = len(a) - len(pairs)
    unmatched_b = int((~used_b).sum())
    return pairs, unmatched_a, unmatched_b


def diff(path_a: str, path_b: str, iou_thr: float = 0.75,
         score_floor: float = 0.05) -> dict:
    with open(path_a, "rb") as f:
        det_a = pickle.load(f)
    with open(path_b, "rb") as f:
        det_b = pickle.load(f)
    assert len(det_a) == len(det_b), "class count differs"
    num_classes = len(det_a)
    num_images = len(det_a[1]) if num_classes > 1 else 0

    total_a = total_b = matched = miss_a = miss_b = 0
    box_err, score_err, ious = [], [], []
    for c in range(1, num_classes):
        for i in range(num_images):
            a = np.asarray(det_a[c][i], np.float64).reshape(-1, 5)
            b = np.asarray(det_b[c][i], np.float64).reshape(-1, 5)
            a = a[a[:, 4] >= score_floor]
            b = b[b[:, 4] >= score_floor]
            total_a += len(a)
            total_b += len(b)
            pairs, ua, ub = _match_dets(a, b, iou_thr)
            matched += len(pairs)
            miss_a += ua
            miss_b += ub
            for i_a, j_b, iou in pairs:
                box_err.append(np.abs(a[i_a, :4] - b[j_b, :4]).max())
                score_err.append(abs(a[i_a, 4] - b[j_b, 4]))
                ious.append(iou)

    out = {
        "detections_a": total_a,
        "detections_b": total_b,
        "matched": matched,
        "only_in_a": miss_a,
        "only_in_b": miss_b,
        "match_rate": matched / max(total_a, 1),
        "mean_matched_iou": float(np.mean(ious)) if ious else float("nan"),
        "p99_box_err_px": float(np.percentile(box_err, 99)) if box_err
        else float("nan"),
        "p99_score_err": float(np.percentile(score_err, 99)) if score_err
        else float("nan"),
    }
    return out


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("a")
    parser.add_argument("b")
    parser.add_argument("--iou", type=float, default=0.75)
    parser.add_argument("--score-floor", type=float, default=0.05)
    args = parser.parse_args()
    for k, v in diff(args.a, args.b, args.iou, args.score_floor).items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()
