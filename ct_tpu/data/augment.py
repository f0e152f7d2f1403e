"""SSD data augmentation — host (numpy/cv2) reference pipeline.

Behavioral parity target: ``preproc``/``BaseTransform``
(/root/reference/data/data_augment.py): IoU-constrained random crop keeping
box centers (:18-78), photometric distortion (:81-108), mean-fill expand
(:111-143), horizontal flip (:146-152), random-interpolation resize +
BGR-mean subtraction (:155-161), with fallback to the un-augmented image
when augmentation leaves no usable boxes (:209-216).

This host pipeline is the exactness baseline (it feeds parity runs and
tests); the on-device JAX pipeline in ``ct_tpu.data.augment_jax`` is the
throughput path. Output layout is NHWC float32 (TPU-native) — the
reference's CHW transpose is dropped.
"""

from __future__ import annotations

import math
import random
from typing import Optional, Tuple

import cv2
import numpy as np


def _matrix_iou_np(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    area_i = np.prod(rb - lt, axis=2) * (lt < rb).all(axis=2)
    area_a = np.prod(a[:, 2:] - a[:, :2], axis=1)
    area_b = np.prod(b[:, 2:] - b[:, :2], axis=1)
    return area_i / (area_a[:, None] + area_b[None, :] - area_i)


CROP_MODES = (
    None, (0.1, None), (0.3, None), (0.5, None), (0.7, None), (0.9, None),
    (None, None),
)


def random_crop(image, boxes, labels, required_label: Optional[int] = None):
    """Sampled IoU-constrained crop; keeps boxes whose centers fall inside.

    ``required_label`` (1-based) forces the crop to retain at least one box
    of that class (the instance-shot constraint)."""
    height, width, _ = image.shape
    if len(boxes) == 0:
        return image, boxes, labels

    while True:
        mode = random.choice(CROP_MODES)
        if mode is None:
            return image, boxes, labels
        min_iou = mode[0] if mode[0] is not None else float("-inf")
        max_iou = mode[1] if mode[1] is not None else float("inf")

        for _ in range(50):
            scale = random.uniform(0.3, 1.0)
            min_ratio = max(0.5, scale * scale)
            max_ratio = min(2.0, 1.0 / scale / scale)
            ratio = math.sqrt(random.uniform(min_ratio, max_ratio))
            w = int(scale * ratio * width)
            h = int((scale / ratio) * height)
            left = random.randrange(width - w)
            top = random.randrange(height - h)
            roi = np.array((left, top, left + w, top + h))

            iou = _matrix_iou_np(boxes, roi[None])
            if not (min_iou <= iou.min() and iou.max() <= max_iou):
                continue

            centers = (boxes[:, :2] + boxes[:, 2:]) / 2
            inside = np.logical_and(
                roi[:2] < centers, centers < roi[2:]
            ).all(axis=1)
            kept_boxes = boxes[inside].copy()
            kept_labels = labels[inside].copy()
            if len(kept_boxes) == 0:
                continue
            if required_label is not None and (
                kept_labels != required_label
            ).all():
                continue

            out = image[roi[1]:roi[3], roi[0]:roi[2]]
            kept_boxes[:, :2] = np.maximum(kept_boxes[:, :2], roi[:2]) - roi[:2]
            kept_boxes[:, 2:] = np.minimum(kept_boxes[:, 2:], roi[2:]) - roi[:2]
            return out, kept_boxes, kept_labels


def photometric_distort(image: np.ndarray) -> np.ndarray:
    """Random brightness/contrast in BGR + hue/saturation in HSV."""

    def blend(img, alpha=1.0, beta=0.0):
        out = img.astype(float) * alpha + beta
        np.clip(out, 0, 255, out=out)
        img[:] = out

    image = image.copy()
    if random.randrange(2):
        blend(image, beta=random.uniform(-32, 32))
    if random.randrange(2):
        blend(image, alpha=random.uniform(0.5, 1.5))
    image = cv2.cvtColor(image, cv2.COLOR_BGR2HSV)
    if random.randrange(2):
        hue = image[:, :, 0].astype(int) + random.randint(-18, 18)
        image[:, :, 0] = hue % 180
    if random.randrange(2):
        blend(image[:, :, 1], alpha=random.uniform(0.5, 1.5))
    return cv2.cvtColor(image, cv2.COLOR_HSV2BGR)


def random_expand(image, boxes, fill, prob: float):
    """Place the image in a larger mean-filled canvas (zoom out)."""
    if random.random() > prob:
        return image, boxes
    height, width, depth = image.shape
    while True:
        scale = random.uniform(1, 4)
        min_ratio = max(0.5, 1.0 / scale / scale)
        max_ratio = min(2.0, scale * scale)
        ratio = math.sqrt(random.uniform(min_ratio, max_ratio))
        ws, hs = scale * ratio, scale / ratio
        if ws < 1 or hs < 1:
            continue
        w, h = int(ws * width), int(hs * height)
        left = random.randint(0, w - width)
        top = random.randint(0, h - height)

        out_boxes = boxes.copy()
        out_boxes[:, :2] += (left, top)
        out_boxes[:, 2:] += (left, top)
        canvas = np.empty((h, w, depth), dtype=image.dtype)
        canvas[:, :] = fill
        canvas[top:top + height, left:left + width] = image
        return canvas, out_boxes


def random_mirror(image, boxes):
    _, width, _ = image.shape
    if random.randrange(2):
        image = image[:, ::-1]
        boxes = boxes.copy()
        boxes[:, 0::2] = width - boxes[:, 2::-2]
    return image, boxes


_INTERPS = (
    cv2.INTER_LINEAR, cv2.INTER_CUBIC, cv2.INTER_AREA, cv2.INTER_NEAREST,
    cv2.INTER_LANCZOS4,
)


def resize_subtract(image: np.ndarray, size: int, mean,
                    random_interp: bool = True) -> np.ndarray:
    """Resize to size×size, subtract BGR mean; NHWC float32 output."""
    interp = _INTERPS[random.randrange(5)] if random_interp else _INTERPS[0]
    out = cv2.resize(image, (size, size), interpolation=interp)
    return out.astype(np.float32) - np.asarray(mean, np.float32)


class TrainAugment:
    """Full SSD train-time pipeline. __call__(image BGR uint8, targets
    [N,5] pixel coords+label) → (image [S,S,3] f32 NHWC, targets [N',5]
    percent coords+label)."""

    def __init__(self, size: int, rgb_means, expand_prob: float = 0.6):
        self.size = size
        self.means = rgb_means
        self.expand_prob = expand_prob

    def __call__(self, image, targets, required_label: Optional[int] = None):
        boxes = targets[:, :-1].copy()
        labels = targets[:, -1].copy()

        height_o, width_o, _ = image.shape
        boxes_pct = targets[:, :-1].copy()
        boxes_pct[:, 0::2] /= width_o
        boxes_pct[:, 1::2] /= height_o
        fallback_targets = np.hstack([boxes_pct, labels[:, None]])

        img_t, boxes, labels = random_crop(image, boxes, labels,
                                           required_label)
        img_t = photometric_distort(img_t)
        img_t, boxes = random_expand(img_t, boxes, self.means,
                                     self.expand_prob)
        img_t, boxes = random_mirror(img_t, boxes)

        height, width, _ = img_t.shape
        img_out = resize_subtract(img_t, self.size, self.means)
        boxes = boxes.copy().astype(np.float64)
        boxes[:, 0::2] /= width
        boxes[:, 1::2] /= height
        wh_min = np.minimum(boxes[:, 2] - boxes[:, 0],
                            boxes[:, 3] - boxes[:, 1])
        keep = wh_min > 0.01
        boxes, labels = boxes[keep], labels[keep]

        retain_failed = (
            len(boxes) == 0
            or (required_label is not None
                and (labels != required_label).all())
        )
        if retain_failed:
            img_out = resize_subtract(image, self.size, self.means)
            return img_out, fallback_targets
        return img_out, np.hstack([boxes, labels[:, None]])


class RawCanvasTransform:
    """Host half of the on-device augmentation path: decode + resize to a
    fixed square working canvas (pixels stay 0..255 BGR), boxes to percent.
    The device half (``ct_tpu.data.augment_jax.augment_batch``) does all
    randomized work batched on TPU.

    Canvases stay uint8: 4× less host memcpy in collate and 4× fewer
    host→device bytes; the device pass converts to float once, batched."""

    def __init__(self, canvas: int):
        self.canvas = canvas

    def __call__(self, image, targets):
        h, w, _ = image.shape
        out = cv2.resize(image, (self.canvas, self.canvas),
                         interpolation=cv2.INTER_LINEAR)
        boxes = targets[:, :4].copy().astype(np.float64)
        boxes[:, 0::2] /= w
        boxes[:, 1::2] /= h
        return out, np.hstack([boxes, targets[:, 4:5]])


class EvalTransform:
    """Test-time path: resize + mean-subtract only (reference
    ``BaseTransform``), NHWC float32."""

    def __init__(self, size: int, rgb_means):
        self.size = size
        self.means = rgb_means

    def __call__(self, image: np.ndarray) -> np.ndarray:
        return resize_subtract(image, self.size, self.means,
                               random_interp=False)
