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