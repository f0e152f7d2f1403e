"""COCO detection dataset with voc/nonvoc split remapping.

Behavioral parity target: ``COCODetection`` (/root/reference/data/
coco.py:70-345): the predefined split registry (:25-67), the voc(20)/
nonvoc(60) category-index remap to contiguous 1-based ids (:129-146), bbox
sanitization (:160-170), the gt-roidb pickle cache (:112-127), and COCO-json
result writing + evaluation (:232-283).

Instead of the vendored Cython pycocotools, this uses a lightweight pure-
Python JSON index (``CocoIndex``) and the numpy evaluator in
``ct_tpu.data.cocoeval``.
"""

from __future__ import annotations

import json
import logging
import os
import pickle
from collections import defaultdict
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

logger = logging.getLogger(__name__)

PREDEFINED_SPLITS_COCO = {
    "train2014": ("train2014", "annotations/instances_train2014.json"),
    "val2014": ("val2014", "annotations/instances_val2014.json"),
    "minival2014": ("val2014", "annotations/instances_minival2014.json"),
    "valminusminival2014": (
        "val2014", "annotations/instances_valminusminival2014.json"),
    "split_nonvoc_train2014": (
        "train2014", "annotations/split_nonvoc_instances_train2014.json"),
    "split_voc_train2014": (
        "train2014", "annotations/split_voc_instances_train2014.json"),
    "split_nonvoc_val2014": (
        "val2014", "annotations/split_nonvoc_instances_val2014.json"),
    "split_voc_val2014": (
        "val2014", "annotations/split_voc_instances_val2014.json"),
    "split_nonvoc_minival2014": (
        "val2014", "annotations/split_nonvoc_instances_minival2014.json"),
    "split_voc_minival2014": (
        "val2014", "annotations/split_voc_instances_minival2014.json"),
    "split_nonvoc_valminusminival2014": (
        "val2014",
        "annotations/split_nonvoc_instances_valminusminival2014.json"),
    "split_voc_valminusminival_2014": (
        "val2014",
        "annotations/split_voc_instances_valminusminival2014.json"),
}

# indices (into the 80 sorted COCO categories) of the 20 VOC classes
VOC_CAT_INDICES = (0, 1, 2, 3, 4, 5, 6, 8, 14, 15, 16, 17, 18, 19, 39, 56,
                   57, 58, 60, 62)
NONVOC_CAT_INDICES = tuple(i for i in range(80) if i not in VOC_CAT_INDICES)


class CocoIndex:
    """Minimal pure-Python COCO annotation index (replaces pycocotools.COCO
    for the detection path)."""

    def __init__(self, annotation_file: str):
        with open(annotation_file) as f:
            dataset = json.load(f)
        self.dataset = dataset
        self.imgs: Dict[int, dict] = {
            img["id"]: img for img in dataset.get("images", [])
        }
        self.cats: Dict[int, dict] = {
            c["id"]: c for c in dataset.get("categories", [])
        }
        self.anns: Dict[int, dict] = {
            a["id"]: a for a in dataset.get("annotations", [])
        }
        self.img_to_anns: Dict[int, List[dict]] = defaultdict(list)
        for a in dataset.get("annotations", []):
            self.img_to_anns[a["image_id"]].append(a)

    def get_cat_ids(self) -> List[int]:
        return sorted(self.cats.keys())

    def get_img_ids(self) -> List[int]:
        return sorted(self.imgs.keys())

    def load_anns_for_img(self, img_id: int) -> List[dict]:
        return self.img_to_anns.get(img_id, [])


class COCODetection:
    """COCO dataset over predefined (year, image_set) splits.

    Annotations are [N, 5] pixel-coord rows ``[x1,y1,x2,y2,label]`` with
    contiguous 1-based labels under the split's remap; ``__getitem__``
    appends a unit mixup-weight column → [N, 6].
    """

    def __init__(
        self,
        root: str,
        image_sets: Sequence[Tuple[str, str]],
        preproc: Optional[Callable] = None,
        target_transform: Optional[Callable] = None,
        dataset_name: str = "COCO",
    ):
        self.root = root
        self.cache_path = os.path.join(root, "cache")
        self.image_set = list(image_sets)
        self.preproc = preproc
        self.target_transform = target_transform
        self.name = dataset_name
        self.ids: List[str] = []
        self.annotations: List[np.ndarray] = []

        for year, image_set in image_sets:
            coco_name = image_set + year
            image_dir, annofile = PREDEFINED_SPLITS_COCO[coco_name]
            image_root = os.path.join(root, "images", image_dir)
            self.coco = CocoIndex(os.path.join(root, annofile))
            self.coco_name = coco_name
            self.class_names = self._build_class_mapping(coco_name)
            self.num_classes = len(self.class_names)
            self.img_ids = self.coco.get_img_ids()
            self.ids.extend(
                os.path.join(image_root, self.coco.imgs[i]["file_name"])
                for i in self.img_ids
            )
            self.annotations.extend(
                self._load_annotations(coco_name, self.img_ids)
            )

    # -- class mapping -----------------------------------------------------

    def _build_class_mapping(self, coco_name: str) -> List[str]:
        cat_ids = self.coco.get_cat_ids()
        cat_names = [self.coco.cats[c]["name"] for c in cat_ids]
        self.class_to_coco_cat_id = dict(zip(cat_names, cat_ids))

        if "nonvoc" in coco_name:
            self.id_map = NONVOC_CAT_INDICES
        elif "voc" in coco_name:
            self.id_map = VOC_CAT_INDICES
        else:
            self.id_map = tuple(range(len(cat_ids)))
        # the split annotation files may already contain only the subset's
        # categories; index into whatever is present when it matches 80
        if len(cat_ids) == 80:
            use_ids = [cat_ids[i] for i in self.id_map]
            use_names = [cat_names[i] for i in self.id_map]
        else:
            use_ids, use_names = cat_ids, cat_names
        self.coco_cat_id_to_contiguous = {
            cid: i for i, cid in enumerate(use_ids, 1)
        }
        return use_names

    # -- annotations -------------------------------------------------------

    def _load_annotations(self, coco_name: str, img_ids) -> List[np.ndarray]:
        cache_file = os.path.join(self.cache_path,
                                  coco_name + "_gt_roidb.pkl")
        if os.path.exists(cache_file):
            with open(cache_file, "rb") as f:
                roidb = pickle.load(f)
            logger.info("%s gt roidb loaded from %s", coco_name, cache_file)
            return roidb
        roidb = [self._annotation_for(i) for i in img_ids]
        os.makedirs(self.cache_path, exist_ok=True)
        with open(cache_file, "wb") as f:
            pickle.dump(roidb, f, pickle.HIGHEST_PROTOCOL)
        logger.info("wrote gt roidb to %s", cache_file)
        return roidb

    def _annotation_for(self, img_id: int) -> np.ndarray:
        im = self.coco.imgs[img_id]
        width, height = im["width"], im["height"]
        rows = []
        for obj in self.coco.load_anns_for_img(img_id):
            x, y, w, h = obj["bbox"]
            x1 = max(0.0, x)
            y1 = max(0.0, y)
            x2 = min(width - 1.0, x1 + max(0.0, w - 1.0))
            y2 = min(height - 1.0, y1 + max(0.0, h - 1.0))
            if obj.get("area", 0) > 0 and x2 >= x1 and y2 >= y1:
                cls = self.coco_cat_id_to_contiguous.get(obj["category_id"])
                if cls is not None:
                    rows.append([x1, y1, x2, y2, cls])
        return np.asarray(rows, dtype=np.float64).reshape(-1, 5)

    # -- samples -----------------------------------------------------------

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, index: int):
        img = cv2.imread(self.ids[index], cv2.IMREAD_COLOR)
        target = self.annotations[index]
        if self.target_transform is not None:
            target = self.target_transform(target)
        if self.preproc is not None:
            img, target = self.preproc(img, target)
        target = np.asarray(target, dtype=np.float64).reshape(-1, 5)
        weight = np.ones((target.shape[0], 1))
        return img, np.hstack([target, weight])

    def pull_image(self, index: int) -> np.ndarray:
        return cv2.imread(self.ids[index], cv2.IMREAD_COLOR)

    # -- evaluation --------------------------------------------------------

    def write_results(self, all_boxes, res_file: str):
        results = []
        for cls_ind, cls in enumerate(self.class_names, 1):
            cat_id = self.class_to_coco_cat_id[cls]
            for im_ind, img_id in enumerate(self.img_ids):
                dets = np.asarray(all_boxes[cls_ind][im_ind],
                                  dtype=np.float64).reshape(-1, 5)
                for k in range(dets.shape[0]):
                    x1, y1, x2, y2, score = dets[k]
                    results.append({
                        "image_id": int(img_id),
                        "category_id": int(cat_id),
                        "bbox": [float(x1), float(y1),
                                 float(x2 - x1 + 1), float(y2 - y1 + 1)],
                        "score": float(score),
                    })
        os.makedirs(os.path.dirname(res_file) or ".", exist_ok=True)
        with open(res_file, "w") as f:
            json.dump(results, f)
        return results

    def evaluate_detections(self, all_boxes, output_dir: str):
        res_file = os.path.join(
            output_dir, f"detections_{self.coco_name}_results.json"
        )
        results = self.write_results(all_boxes, res_file)
        if "test" in self.coco_name:
            return None
        from ct_tpu.data.cocoeval import COCOEvaluator

        evaluator = COCOEvaluator(self.coco, self.coco_cat_id_to_contiguous)
        stats = evaluator.evaluate(results)
        per_cat = evaluator.per_category_ap(self.class_names)
        for name, ap in per_cat.items():
            logger.info("AP-%s: %.3f", name, ap)
        return dict(stats, **{f"AP-{k}": v for k, v in per_cat.items()})
