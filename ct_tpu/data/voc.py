"""PASCAL VOC detection dataset with few-shot split/shot selection.

Behavioral parity target: ``VOCDetection``/``AnnotationTransform``
(/root/reference/data/voc0712.py): per-split class orderings with novel
classes last (:25-55), image-set selection per phase/setting — base-split
lists for phase 1, ``trainval_{k}shot`` image-shot lists, per-class
``1_box/<cls>.txt`` instance-shot lists (:194-223) — instance-shot label
masking (all but the first object → -1, :237-239, :263-264), dataset-level
mixup of two images with Beta-sampled weights (:240-275), and VOC mAP
evaluation with base/novel breakdown for the incremental protocol
(:339-426).

Images are returned NHWC float32 (TPU layout); annotations are [N, 6]
``[x1,y1,x2,y2,label,weight]`` in percent coordinates.
"""

from __future__ import annotations

import logging
import os
import pickle
import xml.etree.ElementTree as ET
from typing import Callable, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from ct_tpu.data.voc_eval import voc_eval

logger = logging.getLogger(__name__)

# Class orderings per base/novel split; split 0 = canonical order (transfer
# setting), splits 1-3 put the 5 novel classes last (incremental setting).
VOC_CLASSES = {
    0: ("__background__",
        "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car",
        "cat", "chair", "cow", "diningtable", "dog", "horse", "motorbike",
        "person", "pottedplant", "sheep", "sofa", "train", "tvmonitor"),
    1: ("__background__",
        "aeroplane", "bicycle", "boat", "bottle", "car", "cat", "chair",
        "diningtable", "dog", "horse", "person", "pottedplant", "sheep",
        "train", "tvmonitor",
        "bird", "bus", "cow", "motorbike", "sofa"),
    2: ("__background__",
        "bicycle", "bird", "boat", "bus", "car", "cat", "chair",
        "diningtable", "dog", "motorbike", "person", "pottedplant", "sheep",
        "train", "tvmonitor",
        "aeroplane", "bottle", "cow", "horse", "sofa"),
    3: ("__background__",
        "aeroplane", "bicycle", "bird", "bottle", "bus", "car", "chair",
        "cow", "diningtable", "dog", "horse", "person", "pottedplant",
        "train", "tvmonitor",
        "boat", "cat", "motorbike", "sheep", "sofa"),
}


class VOCSegmentation:
    """VOC segmentation pairs (image, label PNG) — capability parity with
    the reference's (unused) ``VOCSegmentation``
    (/root/reference/data/voc0712.py:62-112)."""

    def __init__(self, root: str, image_set: str,
                 transform: Optional[Callable] = None,
                 target_transform: Optional[Callable] = None,
                 dataset_name: str = "VOC2007"):
        self.root = root
        self.transform = transform
        self.target_transform = target_transform
        base = os.path.join(root, dataset_name)
        self._annopath = os.path.join(base, "SegmentationClass", "%s.png")
        self._imgpath = os.path.join(base, "JPEGImages", "%s.jpg")
        setfile = os.path.join(base, "ImageSets", "Segmentation",
                               image_set + ".txt")
        with open(setfile) as f:
            self.ids = [line.strip() for line in f if line.strip()]

    def __len__(self) -> int:
        return len(self.ids)

    def __getitem__(self, index: int):
        img_id = self.ids[index]
        img = cv2.imread(self._imgpath % img_id, cv2.IMREAD_COLOR)
        target = cv2.imread(self._annopath % img_id, cv2.IMREAD_COLOR)
        if self.transform is not None:
            img = self.transform(img)
        if self.target_transform is not None:
            target = self.target_transform(target)
        return img, target


class AnnotationTransform:
    """VOC XML annotation → [N, 5] array (pixel coords - 1, class index)."""

    def __init__(self, split: int, class_to_ind: Optional[dict] = None,
                 keep_difficult: bool = True):
        self.class_to_ind = class_to_ind or {
            name: i for i, name in enumerate(VOC_CLASSES[split])
        }
        self.keep_difficult = keep_difficult

    def __call__(self, target: ET.Element) -> np.ndarray:
        rows = []
        for obj in target.iter("object"):
            difficult = int(obj.find("difficult").text) == 1
            if not self.keep_difficult and difficult:
                continue
            name = obj.find("name").text.lower().strip()
            bbox = obj.find("bndbox")
            coords = [
                int(bbox.find(pt).text) - 1
                for pt in ("xmin", "ymin", "xmax", "ymax")
            ]
            rows.append(coords + [self.class_to_ind[name]])
        if not rows:
            return np.empty((0, 5))
        return np.asarray(rows, dtype=np.float64)


class VOCDetection:
    """VOC dataset over one or more (year, image_set) roots.

    ``phase``/``setting``/``shot``/``split``/``instance_shot`` drive the
    image-id selection exactly like the reference CLI state machine.
    """

    def __init__(
        self,
        root: str,
        image_sets: Sequence[Tuple[str, str]],
        preproc: Optional[Callable] = None,
        target_transform: Optional[AnnotationTransform] = None,
        *,
        phase: int = 1,
        setting: str = "transfer",
        split: int = 1,
        shot: int = 5,
        instance_shot: bool = False,
        test: bool = False,
    ):
        self.root = root
        self.image_set = list(image_sets)
        self.preproc = preproc
        self.target_transform = target_transform
        self.phase = phase
        self.setting = setting
        self.split = 0 if setting == "transfer" else split
        self.instance_shot = instance_shot
        self.mixup: Optional[Callable] = None
        self.mixup_args: tuple = ()

        self._annopath = os.path.join("%s", "Annotations", "%s.xml")
        self._imgpath = os.path.join("%s", "JPEGImages", "%s.jpg")
        self.ids: List[Tuple[str, str]] = []

        for year, name in self.image_set:
            self._year = year
            rootpath = os.path.join(self.root, "VOC" + year)
            main = os.path.join(rootpath, "ImageSets", "Main")
            if test:
                listfile = os.path.join(main, name + ".txt")
                self._extend_ids(rootpath, listfile)
            elif phase == 1:
                listfile = os.path.join(main, f"{name}_split{split}.txt")
                self._extend_ids(rootpath, listfile)
            elif phase == 2:
                if setting == "transfer" and not instance_shot:
                    listfile = os.path.join(main, f"{name}_{shot}shot.txt")
                    self._extend_ids(rootpath, listfile)
                else:
                    # instance shots: first k ids of each class's 1_box list
                    classes = (
                        VOC_CLASSES[0][1:] if setting == "transfer"
                        else VOC_CLASSES[split][1:]
                    )
                    for cls in classes:
                        listfile = os.path.join(main, "1_box", cls + ".txt")
                        with open(listfile) as f:
                            for line in f.readlines()[:shot]:
                                self.ids.append((rootpath, line.strip()))
            else:
                raise ValueError("Unknown data setting.")

    def _extend_ids(self, rootpath: str, listfile: str):
        with open(listfile) as f:
            for line in f:
                self.ids.append((rootpath, line.strip()))

    def __len__(self) -> int:
        return len(self.ids)

    # -- sample loading ----------------------------------------------------

    def set_mixup(self, sampler: Optional[Callable], *args):
        self.mixup = sampler
        self.mixup_args = args

    def _load_one(self, index: int):
        img_id = self.ids[index]
        target = ET.parse(self._annopath % img_id).getroot()
        img = cv2.imread(self._imgpath % img_id, cv2.IMREAD_COLOR)
        if self.target_transform is not None:
            target = self.target_transform(target)
        if self.preproc is not None:
            img, target = self.preproc(img, target)
        target = np.asarray(target, dtype=np.float64).reshape(-1, 5)
        if self.phase == 2 and (self.setting == "incre" or self.instance_shot):
            # all but the first (shot) object become ignore labels
            target = target.copy()
            target[1:, -1] = -1
        return img, target

    def __getitem__(self, index: int):
        img1, target1 = self._load_one(index)

        lambd = 1.0
        if self.mixup is not None:
            lambd = max(0.0, min(1.0, self.mixup(*self.mixup_args)))
        if lambd >= 1.0:
            weights = np.ones((target1.shape[0], 1))
            return img1, np.hstack([target1, weights])

        index2 = np.random.choice(np.delete(np.arange(len(self)), index))
        img2, target2 = self._load_one(int(index2))
        mixed = img1 * lambd + img2 * (1.0 - lambd)
        y1 = np.hstack([target1, np.full((target1.shape[0], 1), lambd)])
        y2 = np.hstack([target2, np.full((target2.shape[0], 1), 1.0 - lambd)])
        mix_target = np.vstack([y1, y2])
        if self.setting == "incre" and self.phase == 2:
            # ignore-labeled rows drop out of the loss entirely under mixup
            mix_target[mix_target[:, -2] == -1, -1] = 0
        return mixed, mix_target

    def pull_image(self, index: int) -> np.ndarray:
        return cv2.imread(self._imgpath % self.ids[index], cv2.IMREAD_COLOR)

    def pull_anno(self, index: int):
        img_id = self.ids[index]
        anno = ET.parse(self._annopath % img_id).getroot()
        return img_id[1], self.target_transform(anno)

    # -- evaluation --------------------------------------------------------

    def _num_eval_classes(self) -> int:
        return 16 if self.phase == 1 else 21

    def _results_file(self, cls: str) -> str:
        filedir = os.path.join(self.root, "results", "VOC" + self._year,
                               "Main")
        os.makedirs(filedir, exist_ok=True)
        return os.path.join(filedir, f"comp4_det_test_{cls}.txt")

    def write_results(self, all_boxes):
        """all_boxes[class_idx][image_idx] = [] | np [n,5] (x1y1x2y2,score)"""
        classes = VOC_CLASSES[self.split][: self._num_eval_classes()]
        for cls_ind, cls in enumerate(classes):
            if cls == "__background__":
                continue
            with open(self._results_file(cls), "w") as f:
                for im_ind, (_, index) in enumerate(self.ids):
                    dets = all_boxes[cls_ind][im_ind]
                    if len(dets) == 0:
                        continue
                    for k in range(dets.shape[0]):
                        f.write(
                            "{:s} {:.3f} {:.1f} {:.1f} {:.1f} {:.1f}\n".format(
                                index, dets[k, -1],
                                dets[k, 0] + 1, dets[k, 1] + 1,
                                dets[k, 2] + 1, dets[k, 3] + 1,
                            )
                        )

    def evaluate_detections(self, all_boxes, output_dir: Optional[str] = None):
        self.write_results(all_boxes)
        return self._do_python_eval(output_dir)

    def _do_python_eval(self, output_dir: Optional[str] = None):
        rootpath = os.path.join(self.root, "VOC" + self._year)
        name = self.image_set[0][1]
        annopath = os.path.join(rootpath, "Annotations", "{:s}.xml")
        imagesetfile = os.path.join(rootpath, "ImageSets", "Main",
                                    name + ".txt")
        cachedir = os.path.join(self.root, "annotations_cache")
        use_07_metric = int(self._year) < 2010
        logger.info("VOC07 metric? %s", "Yes" if use_07_metric else "No")
        if output_dir is not None:
            os.makedirs(output_dir, exist_ok=True)

        aps = []
        classes = VOC_CLASSES[self.split][: self._num_eval_classes()]
        for cls in classes:
            if cls == "__background__":
                continue
            rec, prec, ap = voc_eval(
                self._results_file(cls), annopath, imagesetfile, cls,
                cachedir, ovthresh=0.5, use_07_metric=use_07_metric,
            )
            aps.append(ap)
            logger.info("AP for %s = %.4f", cls, ap)
            if output_dir is not None:
                with open(os.path.join(output_dir, cls + "_pr.pkl"),
                          "wb") as f:
                    pickle.dump({"rec": rec, "prec": prec, "ap": ap}, f)
        mean_ap = float(np.mean(aps))
        logger.info("Mean AP = %.4f", mean_ap)
        result = {"mAP": mean_ap, "APs": dict(zip(
            [c for c in classes if c != "__background__"], aps))}
        if self.setting == "incre" and self.phase == 2:
            result["base_mAP"] = float(np.mean(aps[:15]))
            result["novel_mAP"] = float(np.mean(aps[15:]))
            logger.info("Base AP = %.4f\tNovel AP = %.4f",
                        result["base_mAP"], result["novel_mAP"])
        return result
