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
