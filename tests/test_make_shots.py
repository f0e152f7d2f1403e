"""Shot/split list generator tests (ct_tpu/data/make_shots.py).

Verifies the reference data-artifact semantics (Main2007/2012.zip,
consumed at /root/reference/data/voc0712.py:194-223) on a synthetic VOC
tree large enough to exercise every class.
"""

import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from ct_tpu.data.make_shots import (
    _load_annotations, make_base_split_lists, make_image_shot_lists,
    make_instance_shot_lists, write_lists,
)
from ct_tpu.data.voc import VOC_CLASSES, AnnotationTransform, VOCDetection
from tests.fixtures import make_mini_voc


@pytest.fixture(scope="module")
def voc_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("shots"))
    # all 20 classes, enough images that every class has several candidates
    devkit = make_mini_voc(root, year="2007", num_images=120,
                           classes=VOC_CLASSES[0][1:], seed=3)
    make_mini_voc(root, year="2012", num_images=120,
                  classes=VOC_CLASSES[0][1:], seed=4)
    return devkit


@pytest.fixture(scope="module")
def records(voc_tree):
    return _load_annotations(voc_tree, ["2007", "2012"])


def test_base_splits_exclude_novel(voc_tree, records):
    lists = make_base_split_lists(records)
    for split in (1, 2, 3):
        class_to_ind = {n: i for i, n in enumerate(VOC_CLASSES[split])}
        selected = {
            (y, i) for y in ("2007", "2012")
            for i in lists.get((y, split), [])
        }
        assert selected, "base split produced no images"
        for year, img_id, objs in records:
            labels = [class_to_ind[name] for name, _ in objs]
            if (year, img_id) in selected and any(l > 15 for l in labels):
                raise AssertionError(
                    f"{img_id} has a novel object but is in split {split}")
            # completeness: base-only images must be included
            if all(l <= 15 for l in labels):
                assert (year, img_id) in selected


def test_image_shots_k_per_class(records):
    k = 3
    lists = make_image_shot_lists(records, [k], seed=0)
    ids = {(y, i) for (y, kk), v in lists.items() for i in v if kk == k}
    # index which classes each chosen image contains (non-difficult)
    contains = {}
    for year, img_id, objs in records:
        contains[(year, img_id)] = {n for n, d in objs if not d}
    for cls in VOC_CLASSES[0][1:]:
        n = sum(1 for key in ids if cls in contains[key])
        # every class is covered at least k times (shared images may
        # cover several classes, so >= k, and each class drew k images)
        assert n >= k, f"{cls}: only {n} images contain it"
    # no duplicates within the k-shot selection
    flat = [i for v in lists.values() for i in v]
    assert len(flat) == len(set(flat)) or len(flat) <= 20 * k


def test_image_shots_deterministic(records):
    a = make_image_shot_lists(records, [1, 5], seed=7)
    b = make_image_shot_lists(records, [1, 5], seed=7)
    c = make_image_shot_lists(records, [1, 5], seed=8)
    assert a == b
    assert a != c


def test_instance_shots_first_object(voc_tree, records):
    lists = make_instance_shot_lists(records, depth=5, seed=0)
    anno_path = os.path.join(voc_tree, "VOC%s", "Annotations", "%s.xml")
    for (year, cls), ids in lists.items():
        assert len(ids) <= 5
        for img_id in ids:
            anno = ET.parse(anno_path % (year, img_id)).getroot()
            first = next(anno.iter("object"))
            assert first.find("name").text.lower().strip() == cls
            assert int(first.find("difficult").text) == 0


def test_written_lists_load_through_dataset(voc_tree, records):
    base = make_base_split_lists(records)
    img_shots = make_image_shot_lists(records, [1, 5], seed=0)
    inst = make_instance_shot_lists(records, depth=5, seed=0)
    write_lists(voc_tree, ["2007", "2012"], base, img_shots, inst)

    # phase-1 incremental pretrain list
    ds = VOCDetection(voc_tree, [("2007", "trainval"), ("2012", "trainval")],
                      None, AnnotationTransform(1),
                      phase=1, setting="incre", split=1)
    assert len(ds) == sum(
        len(base.get((y, 1), [])) for y in ("2007", "2012"))

    # phase-2 transfer 5-shot image list
    ds = VOCDetection(voc_tree, [("2007", "trainval"), ("2012", "trainval")],
                      None, AnnotationTransform(0),
                      phase=2, setting="transfer", split=1, shot=5)
    assert len(ds) == sum(
        len(img_shots.get((y, 5), [])) for y in ("2007", "2012"))

    # phase-2 incremental instance shots (2007 only, like the reference)
    ds = VOCDetection(voc_tree, [("2007", "trainval")], None,
                      AnnotationTransform(1),
                      phase=2, setting="incre", split=1, shot=2)
    img, target = ds[0]
    target = np.asarray(target)
    # all but the first object are masked to the ignore label (column 4;
    # __getitem__ appends the mixup weight column after masking)
    assert (target[1:, 4] == -1).all()


def test_cli_main(voc_tree):
    from ct_tpu.data.make_shots import main

    main(["--voc-root", voc_tree, "--years", "2007", "2012",
          "--shots", "1", "--instance-depth", "3", "--seed", "1"])
    p = os.path.join(voc_tree, "VOC2007", "ImageSets", "Main",
                     "1_box", "cat.txt")
    assert os.path.exists(os.path.join(
        voc_tree, "VOC2007", "ImageSets", "Main", "trainval_split2.txt"))
    # per-year 1_box files exist for classes that drew 2007 images; at
    # least the union across years covers every class
    covered = set()
    for year in ("2007", "2012"):
        d = os.path.join(voc_tree, "VOC" + year, "ImageSets", "Main",
                         "1_box")
        if os.path.isdir(d):
            covered |= {f[:-4] for f in os.listdir(d)}
    assert covered == set(VOC_CLASSES[0][1:])
