"""Synthetic mini-VOC dataset generator for end-to-end tests.

Builds a tiny VOCdevkit tree (JPEG images with colored rectangles + XML
annotations + image-set lists incl. split/shot files) so the train/eval
CLIs and dataset classes can run end-to-end without the real corpus.
"""

from __future__ import annotations

import os
import random
from typing import List, Tuple

import cv2
import numpy as np

from ct_tpu.data.voc import VOC_CLASSES

XML_TEMPLATE = """<annotation>
  <folder>VOC2007</folder><filename>{name}.jpg</filename>
  <size><width>{w}</width><height>{h}</height><depth>3</depth></size>
  {objects}
</annotation>
"""

OBJ_TEMPLATE = """<object>
    <name>{cls}</name><pose>Left</pose><truncated>0</truncated>
    <difficult>{difficult}</difficult>
    <bndbox><xmin>{x1}</xmin><ymin>{y1}</ymin><xmax>{x2}</xmax><ymax>{y2}</ymax></bndbox>
  </object>"""


def make_mini_voc_all(root: str, **kw) -> str:
    """Both VOC2007 and VOC2012 mini trees (phase-1 uses 07+12 trainval)."""
    make_mini_voc(root, year="2007", **kw)
    return make_mini_voc(root, year="2012", seed=1, **kw)


def class_color(idx: int) -> Tuple[int, int, int]:
    """Deterministic, well-separated BGR color for class ``idx``."""
    rng = np.random.RandomState(977 + idx)
    return tuple(int(c) for c in rng.randint(30, 226, 3))


def make_mini_voc(
    root: str,
    year: str = "2007",
    num_images: int = 8,
    classes: Tuple[str, ...] = ("aeroplane", "bicycle", "bird", "car"),
    seed: int = 0,
    class_colors: bool = False,
    max_test_ids: int = 0,
) -> str:
    """Create VOCdevkit/VOC{year} under ``root``; returns the devkit path.

    ``class_colors``: paint each class with a fixed color (+ small jitter)
    so the class is *learnable from appearance* — required when a fixture
    must support training to non-noise mAP (random colors cap mAP at
    chance-level class assignment). ``max_test_ids``: cap test.txt to the
    first N ids (bounds the torch-side per-image eval cost on big
    fixtures; 0 = all)."""
    rng = np.random.RandomState(seed)
    devkit = os.path.join(root, "VOCdevkit")
    base = os.path.join(devkit, "VOC" + year)
    for sub in ("JPEGImages", "Annotations",
                os.path.join("ImageSets", "Main"),
                os.path.join("ImageSets", "Main", "1_box")):
        os.makedirs(os.path.join(base, sub), exist_ok=True)

    ids: List[str] = []
    by_class = {c: [] for c in VOC_CLASSES[0][1:]}
    for i in range(num_images):
        name = f"{i:06d}"
        ids.append(name)
        h, w = int(rng.randint(240, 480)), int(rng.randint(240, 480))
        img = np.full((h, w, 3), 128, np.uint8)
        objects = []
        for _ in range(int(rng.randint(1, 4))):
            ci = int(rng.randint(len(classes)))
            cls = classes[ci]
            x1 = int(rng.randint(1, w - 60))
            y1 = int(rng.randint(1, h - 60))
            x2 = x1 + int(rng.randint(40, min(120, w - x1)))
            y2 = y1 + int(rng.randint(40, min(120, h - y1)))
            if class_colors:
                base_c = class_color(ci)
                color = tuple(
                    int(np.clip(c + rng.randint(-18, 19), 0, 255))
                    for c in base_c
                )
            else:
                color = tuple(int(c) for c in rng.randint(0, 255, 3))
            cv2.rectangle(img, (x1, y1), (x2, y2), color, -1)
            objects.append(OBJ_TEMPLATE.format(
                cls=cls, difficult=0, x1=x1, y1=y1, x2=x2, y2=y2))
            if not by_class[cls] or by_class[cls][-1] != name:
                by_class[cls].append(name)
        cv2.imwrite(os.path.join(base, "JPEGImages", name + ".jpg"), img)
        with open(os.path.join(base, "Annotations", name + ".xml"),
                  "w") as f:
            f.write(XML_TEMPLATE.format(name=name, w=w, h=h,
                                        objects="\n  ".join(objects)))

    main = os.path.join(base, "ImageSets", "Main")
    listing = "\n".join(ids) + "\n"
    test_ids = ids[:max_test_ids] if max_test_ids else ids
    for fname in ("trainval.txt", "trainval_split1.txt",
                  "trainval_split2.txt", "trainval_split3.txt",
                  "trainval_1shot.txt", "trainval_5shot.txt"):
        with open(os.path.join(main, fname), "w") as f:
            f.write(listing)
    with open(os.path.join(main, "test.txt"), "w") as f:
        f.write("\n".join(test_ids) + "\n")
    # per-class instance-shot lists: every class file exists (reuse images
    # for classes we didn't draw — the loader only needs ids to resolve)
    for cls in VOC_CLASSES[0][1:]:
        shots = by_class[cls] or ids[:2]
        with open(os.path.join(main, "1_box", cls + ".txt"), "w") as f:
            f.write("\n".join(shots) + "\n")
    return devkit


COCO_FIXTURE_CATS = [
    {"id": 2, "name": "bicycle", "supercategory": "vehicle"},
    {"id": 13, "name": "stop sign", "supercategory": "outdoor"},
    {"id": 25, "name": "giraffe", "supercategory": "animal"},
    {"id": 34, "name": "frisbee", "supercategory": "sports"},
    {"id": 46, "name": "wine glass", "supercategory": "kitchen"},
    {"id": 59, "name": "pizza", "supercategory": "food"},
]

# The standard 80 COCO category (id, name) pairs (2014/2017 instances).
# The transfer-parity fixture must carry ALL 80 in its annotation JSONs:
# the reference's class mapping indexes nonvoc positions into an
# 80-category list (/root/reference/data/coco.py:135-145) and would
# IndexError on a categories array with only the annotated 60.
COCO_80_CATEGORIES = [
    (1, "person"), (2, "bicycle"), (3, "car"), (4, "motorcycle"),
    (5, "airplane"), (6, "bus"), (7, "train"), (8, "truck"), (9, "boat"),
    (10, "traffic light"), (11, "fire hydrant"), (13, "stop sign"),
    (14, "parking meter"), (15, "bench"), (16, "bird"), (17, "cat"),
    (18, "dog"), (19, "horse"), (20, "sheep"), (21, "cow"),
    (22, "elephant"), (23, "bear"), (24, "zebra"), (25, "giraffe"),
    (27, "backpack"), (28, "umbrella"), (31, "handbag"), (32, "tie"),
    (33, "suitcase"), (34, "frisbee"), (35, "skis"), (36, "snowboard"),
    (37, "sports ball"), (38, "kite"), (39, "baseball bat"),
    (40, "baseball glove"), (41, "skateboard"), (42, "surfboard"),
    (43, "tennis racket"), (44, "bottle"), (46, "wine glass"),
    (47, "cup"), (48, "fork"), (49, "knife"), (50, "spoon"), (51, "bowl"),
    (52, "banana"), (53, "apple"), (54, "sandwich"), (55, "orange"),
    (56, "broccoli"), (57, "carrot"), (58, "hot dog"), (59, "pizza"),
    (60, "donut"), (61, "cake"), (62, "chair"), (63, "couch"),
    (64, "potted plant"), (65, "bed"), (67, "dining table"),
    (70, "toilet"), (72, "tv"), (73, "laptop"), (74, "mouse"),
    (75, "remote"), (76, "keyboard"), (77, "cell phone"),
    (78, "microwave"), (79, "oven"), (80, "toaster"), (81, "sink"),
    (82, "refrigerator"), (84, "book"), (85, "clock"), (86, "vase"),
    (87, "scissors"), (88, "teddy bear"), (89, "hair drier"),
    (90, "toothbrush"),
]

# indices (into the 80 sorted categories) of the 20 VOC classes —
# protocol constant shared with the reference and ct_tpu.data.coco
_VOC_INDS = (0, 1, 2, 3, 4, 5, 6, 8, 14, 15, 16, 17, 18, 19, 39, 56, 57,
             58, 60, 62)
NONVOC_60 = [COCO_80_CATEGORIES[i] for i in range(80) if i not in _VOC_INDS]


def sep_color(idx: int) -> Tuple[int, int, int]:
    """Deterministic BGR color for ``idx`` with guaranteed separability:
    a 5³ grid with ≥55-level channel spacing, dropping colors too close to
    the 110-grey canvas (so the 2-way objectness stays learnable), keeps
    ≥60 usable entries for the 60-way source-class fixture (the ±18 paint
    jitter never crosses half the 55-level gap)."""
    levels = (25, 80, 150, 210, 250)
    colors = []
    for i in range(125):
        c = (levels[i % 5], levels[(i // 5) % 5], levels[(i // 25) % 5])
        if all(abs(ch - 110) < 50 for ch in c):
            continue  # low contrast vs the canvas fill
        colors.append(c)
    return colors[idx % len(colors)]


def make_coco60(root: str, n_train: int = 480, n_val: int = 128,
                seed: int = 0) -> str:
    """COCO-60 transfer-pretraining fixture at trainable capacity.

    Layout identical to the real split_nonvoc annotation files
    (reference split tool output, /root/reference/data/
    split_coco_dataset_voc_nonvoc.py): annotation JSONs carry the FULL
    80-category registry (the reference's class mapping indexes nonvoc
    positions into an 80-long list) but annotate only the 60 non-VOC
    categories. Boxes are painted with `sep_color`-separated class colors
    so a detector can train to decisive AP on appearance."""
    import json

    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)
    cats = [{"id": cid, "name": name, "supercategory": "thing"}
            for cid, name in COCO_80_CATEGORIES]

    def build(img_dir: str, count: int, first_id: int):
        d = os.path.join(root, "images", img_dir)
        os.makedirs(d, exist_ok=True)
        images, annos = [], []
        aid = first_id * 1000
        for i in range(count):
            img_id = first_id + i
            name = f"COCO_{img_dir}_{img_id:012d}.jpg"
            h, w = int(rng.randint(260, 420)), int(rng.randint(260, 420))
            img = np.full((h, w, 3), 110, np.uint8)
            for _ in range(int(rng.randint(1, 4))):
                ci = int(rng.randint(len(NONVOC_60)))
                cid = NONVOC_60[ci][0]
                bw = int(rng.randint(40, max(41, w // 2)))
                bh = int(rng.randint(40, max(41, h // 2)))
                x = int(rng.randint(0, w - bw))
                y = int(rng.randint(0, h - bh))
                base_c = sep_color(ci)
                # ±10 jitter: the 5-level grid guarantees only a
                # 40-level max-channel gap across 60 classes, so the
                # VOC fixtures' ±18 would let neighbors overlap
                color = tuple(
                    int(np.clip(c + rng.randint(-10, 11), 0, 255))
                    for c in base_c
                )
                cv2.rectangle(img, (x, y), (x + bw, y + bh), color, -1)
                annos.append({
                    "id": aid, "image_id": img_id, "category_id": cid,
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "area": float(bw * bh), "iscrowd": 0,
                })
                aid += 1
            cv2.imwrite(os.path.join(d, name), img)
            images.append({"id": img_id, "file_name": name,
                           "width": w, "height": h})
        return images, annos

    tr_im, tr_an = build("train2014", n_train, 1000)
    va_im, va_an = build("val2014", n_val, 100000)
    for fname, im, an in (
        ("split_nonvoc_instances_train2014.json", tr_im, tr_an),
        ("split_nonvoc_instances_valminusminival2014.json", [], []),
        ("split_nonvoc_instances_minival2014.json", va_im, va_an),
    ):
        with open(os.path.join(root, "annotations", fname), "w") as f:
            json.dump({"images": im, "annotations": an,
                       "categories": cats}, f)
    return root


def make_mini_coco(root: str, n_train: int = 8, n_val: int = 6,
                   seed: int = 0) -> str:
    """Tiny COCO tree (images/{train,val}2014 + split_nonvoc annotation
    JSONs) matching the layout `ct_tpu.data.coco.COCODetection` and the
    CLIs expect (reference layout: /root/reference/data/coco.py:70-130).
    Split annotation files carry only the subset's categories, like the
    reference's split_coco_dataset tool output."""
    import json

    rng = np.random.RandomState(seed)
    os.makedirs(os.path.join(root, "annotations"), exist_ok=True)

    def build(img_dir: str, count: int, first_id: int):
        d = os.path.join(root, "images", img_dir)
        os.makedirs(d, exist_ok=True)
        images, annos = [], []
        aid = first_id * 1000
        for i in range(count):
            img_id = first_id + i
            name = f"COCO_{img_dir}_{img_id:012d}.jpg"
            h, w = int(rng.randint(240, 321)), int(rng.randint(280, 401))
            img = np.full((h, w, 3), 110, np.uint8)
            for _ in range(int(rng.randint(1, 4))):
                cat = COCO_FIXTURE_CATS[int(rng.randint(
                    len(COCO_FIXTURE_CATS)))]
                bw = int(rng.randint(40, max(41, w // 2)))
                bh = int(rng.randint(40, max(41, h // 2)))
                x = int(rng.randint(0, w - bw))
                y = int(rng.randint(0, h - bh))
                cv2.rectangle(img, (x, y), (x + bw, y + bh),
                              class_color(cat["id"]), -1)
                annos.append({
                    "id": aid, "image_id": img_id,
                    "category_id": cat["id"],
                    "bbox": [float(x), float(y), float(bw), float(bh)],
                    "area": float(bw * bh), "iscrowd": 0,
                })
                aid += 1
            cv2.imwrite(os.path.join(d, name), img)
            images.append({"id": img_id, "file_name": name,
                           "width": w, "height": h})
        return images, annos

    tr_im, tr_an = build("train2014", n_train, 1000)
    va_im, va_an = build("val2014", n_val, 2000)
    for fname, im, an in (
        ("split_nonvoc_instances_train2014.json", tr_im, tr_an),
        ("split_nonvoc_instances_valminusminival2014.json", [], []),
        ("split_nonvoc_instances_minival2014.json", va_im, va_an),
    ):
        with open(os.path.join(root, "annotations", fname), "w") as f:
            json.dump({"images": im, "annotations": an,
                       "categories": COCO_FIXTURE_CATS}, f)
    return root
