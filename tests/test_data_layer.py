"""Data layer: VOC dataset selection/mixup, augmentation invariants,
loader determinism, VOC mAP evaluator, COCO evaluator sanity."""

import os

import numpy as np
import pytest

from fixtures import make_mini_voc
from ct_tpu.config import RGB_MEANS
from ct_tpu.data.augment import EvalTransform, TrainAugment
from ct_tpu.data.loader import Loader
from ct_tpu.data.voc import AnnotationTransform, VOCDetection, VOC_CLASSES
from ct_tpu.data.voc_eval import average_precision, voc_eval


@pytest.fixture(scope="module")
def devkit(tmp_path_factory):
    return make_mini_voc(str(tmp_path_factory.mktemp("voc")))


def test_annotation_transform(devkit):
    ds = VOCDetection(devkit, [("2007", "trainval")], None,
                      AnnotationTransform(0), test=True)
    img_id, anno = ds.pull_anno(0)
    assert anno.shape[1] == 5
    assert (anno[:, 4] >= 1).all()  # class ids 1-based
    img = ds.pull_image(0)
    assert (anno[:, 2] <= img.shape[1]).all()


def test_phase2_shot_selection(devkit):
    ds = VOCDetection(devkit, [("2007", "trainval")], None,
                      AnnotationTransform(0),
                      phase=2, setting="transfer", shot=1,
                      instance_shot=True)
    # 20 classes × 1 shot each (ids may repeat across classes)
    assert len(ds.ids) == 20

    ds5 = VOCDetection(devkit, [("2007", "trainval")], None,
                       AnnotationTransform(0),
                       phase=2, setting="transfer", shot=5)
    assert len(ds5.ids) == 8  # trainval_5shot.txt lists all 8 mini images


def test_instance_shot_ignore_masking(devkit):
    ds = VOCDetection(devkit, [("2007", "trainval")], None,
                      AnnotationTransform(0),
                      phase=2, setting="transfer", shot=1,
                      instance_shot=True)
    for i in range(min(4, len(ds))):
        _, target = ds[i]
        assert target.shape[1] == 6  # + weight column
        if target.shape[0] > 1:
            assert (target[1:, 4] == -1).all()


def test_mixup(devkit):
    # mixup blends two preprocessed (same-size) images, as in the reference
    ds = VOCDetection(devkit, [("2007", "trainval")],
                      TrainAugment(300, RGB_MEANS),
                      AnnotationTransform(0),
                      phase=2, setting="transfer", shot=5)
    ds.set_mixup(lambda a, b: 0.4, 1.5, 1.5)
    img, target = ds[0]
    w = target[:, 5]
    assert set(np.round(w, 6)) <= {0.4, 0.6}
    assert (np.isclose(w, 0.4)).any() and (np.isclose(w, 0.6)).any()
    ds.set_mixup(None)
    _, target = ds[0]
    assert (target[:, 5] == 1.0).all()


def test_train_augment_output():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (240, 320, 3)).astype(np.uint8)
    targets = np.asarray([[20.0, 30.0, 120.0, 140.0, 3.0]])
    aug = TrainAugment(300, RGB_MEANS)
    for _ in range(10):
        out, t = aug(img.copy(), targets.copy())
        assert out.shape == (300, 300, 3) and out.dtype == np.float32
        assert t.shape[1] == 5
        assert (t[:, :4] >= 0).all() and (t[:, :4] <= 1).all()
        assert (t[:, 2] > t[:, 0]).all() and (t[:, 3] > t[:, 1]).all()


def test_eval_transform():
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (123, 456, 3)).astype(np.uint8)
    out = EvalTransform(300, RGB_MEANS)(img)
    assert out.shape == (300, 300, 3)
    assert out.min() >= -130 and out.max() <= 160


def test_loader_batches_deterministic(devkit):
    ds = VOCDetection(devkit, [("2007", "trainval")], None,
                      AnnotationTransform(0), test=True)

    class Wrapped:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            img = ds.pull_image(i)
            _, anno = ds.pull_anno(i)
            h, w = img.shape[:2]
            t = anno.copy()
            t[:, 0::2] /= w
            t[:, 1::2] /= h
            t = np.hstack([t, np.ones((len(t), 1))])
            return np.zeros((8, 8, 3), np.float32), t

    l1 = Loader(Wrapped(), 4, num_workers=3, max_objs=8, seed=7)
    l2 = Loader(Wrapped(), 4, num_workers=1, max_objs=8, seed=7)
    for _ in range(3):
        b1, b2 = l1.next(), l2.next()
        np.testing.assert_array_equal(b1["labels"], b2["labels"])
        np.testing.assert_array_equal(b1["valid"], b2["valid"])
    l1.stop()
    l2.stop()


def test_average_precision_known_values():
    rec = np.asarray([0.5, 1.0])
    prec = np.asarray([1.0, 1.0])
    assert np.isclose(average_precision(rec, prec, use_07_metric=False), 1.0)
    # 07 metric: 11-point — recall >= t has precision 1 for all t
    assert np.isclose(average_precision(rec, prec, use_07_metric=True), 1.0)
    # half the recall at precision 1, nothing after
    rec = np.asarray([0.5])
    prec = np.asarray([1.0])
    assert np.isclose(average_precision(rec, prec, False), 0.5)
    ap07 = average_precision(rec, prec, True)
    assert np.isclose(ap07, 6 / 11)  # t in {0,.1,...,.5} → 1, else 0


def test_voc_eval_perfect_detections(devkit, tmp_path):
    """Feeding the GT boxes back as detections must give AP = 1."""
    root = os.path.join(devkit, "VOC2007")
    anno = os.path.join(root, "Annotations", "{:s}.xml")
    imageset = os.path.join(root, "ImageSets", "Main", "test.txt")
    ds = VOCDetection(devkit, [("2007", "test")], None,
                      AnnotationTransform(0), test=True)
    # collect GT per class
    lines = {}
    for i in range(len(ds)):
        img_id, a = ds.pull_anno(i)
        for row in a:
            cls = VOC_CLASSES[0][int(row[4])]
            lines.setdefault(cls, []).append(
                f"{img_id} 0.9 {row[0]+1:.1f} {row[1]+1:.1f} "
                f"{row[2]+1:.1f} {row[3]+1:.1f}"
            )
    for cls, ls in lines.items():
        det = tmp_path / f"det_{cls}.txt"
        det.write_text("\n".join(ls) + "\n")
        rec, prec, ap = voc_eval(str(det), anno, imageset, cls,
                                 str(tmp_path / "cache"), use_07_metric=True)
        assert ap > 0.99, (cls, ap)


def test_cocoeval_perfect_and_empty():
    from ct_tpu.data.coco import CocoIndex
    from ct_tpu.data.cocoeval import COCOEvaluator
    import json, tempfile

    dataset = {
        "images": [{"id": 1, "width": 100, "height": 100},
                   {"id": 2, "width": 100, "height": 100}],
        "categories": [{"id": 7, "name": "cat"}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 7,
             "bbox": [10, 10, 30, 30], "area": 900, "iscrowd": 0},
            {"id": 2, "image_id": 2, "category_id": 7,
             "bbox": [40, 40, 20, 20], "area": 400, "iscrowd": 0},
        ],
    }
    with tempfile.NamedTemporaryFile("w", suffix=".json",
                                     delete=False) as f:
        json.dump(dataset, f)
        path = f.name
    idx = CocoIndex(path)
    ev = COCOEvaluator(idx, {7: 1})

    perfect = [
        {"image_id": 1, "category_id": 7, "bbox": [10, 10, 30, 30],
         "score": 0.9},
        {"image_id": 2, "category_id": 7, "bbox": [40, 40, 20, 20],
         "score": 0.8},
    ]
    stats = ev.evaluate(perfect)
    assert np.isclose(stats["AP"], 1.0)
    assert np.isclose(stats["AP50"], 1.0)
    assert np.isclose(stats["AR100"], 1.0)

    stats0 = ev.evaluate([])
    assert stats0["AP"] == 0.0

    # detection shifted by half: IoU ≈ 0.39 → counts at no threshold
    shifted = [dict(perfect[0], bbox=[25, 25, 30, 30]),
               dict(perfect[1])]
    stats_s = ev.evaluate(shifted)
    assert 0.0 < stats_s["AP"] < 1.0
    os.unlink(path)


def test_loader_restart_isolates_generations(devkit):
    """A worker still blocked in dataset[idx] across restart() must not
    leak its stale sample into the new generation (its thread holds the
    OLD generation's stop/queues only)."""
    import time

    ds = VOCDetection(devkit, [("2007", "trainval")], None,
                      AnnotationTransform(0), test=True)

    class Slow:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            time.sleep(0.05)  # keeps workers inside getitem at restart
            _, anno = ds.pull_anno(i)
            img = ds.pull_image(i)
            h, w = img.shape[:2]
            t = anno.copy()
            t[:, 0::2] /= w
            t[:, 1::2] /= h
            t = np.hstack([t, np.ones((len(t), 1))])
            return np.full((8, 8, 3), i, np.float32), t

    l1 = Loader(Slow(), 4, num_workers=3, max_objs=8, seed=0)
    l1.next()
    l1.restart()            # generation 1 → sampler seed 0+1

    # a fresh loader with seed 1 replays exactly generation 1's stream
    ref = Loader(Slow(), 4, num_workers=1, max_objs=8, seed=1)
    for _ in range(3):
        b1, b2 = l1.next(), ref.next()
        np.testing.assert_array_equal(b1["image"], b2["image"])
        np.testing.assert_array_equal(b1["labels"], b2["labels"])
    l1.stop()
    ref.stop()


class _PicklableDS:
    """Module-level (spawn-picklable) synthetic dataset for the
    process-pool loader test."""

    def __len__(self):
        return 32

    def __getitem__(self, i):
        img = np.full((8, 8, 3), i, np.float32)
        t = np.asarray([[0.1, 0.1, 0.5, 0.5, float(i % 3), 1.0]],
                       np.float32)
        return img, t


def test_process_loader_matches_thread_loader():
    """workers='process' (the reference's DataLoader scaling model,
    train.py:192-199) must emit the identical deterministic batch stream
    as the thread pool — it is a throughput knob, not a semantics change."""
    lt = Loader(_PicklableDS(), 4, num_workers=2, max_objs=4, seed=7,
                workers="thread")
    bt = [lt.next() for _ in range(5)]
    lt.stop()
    lp = Loader(_PicklableDS(), 4, num_workers=2, max_objs=4, seed=7,
                workers="process")
    bp = [lp.next() for _ in range(5)]
    lp.stop()
    for a, b in zip(bt, bp):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
