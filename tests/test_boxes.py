"""Box geometry: round trips, IoU properties, and torch-oracle parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import has_reference, import_reference
from ct_tpu.ops import boxes as B


def rand_boxes(n, rng):
    mins = rng.uniform(0, 0.8, size=(n, 2))
    sizes = rng.uniform(0.05, 0.2, size=(n, 2))
    return np.concatenate([mins, mins + sizes], axis=1).astype(np.float32)


def test_point_center_roundtrip():
    rng = np.random.RandomState(0)
    pts = rand_boxes(32, rng)
    back = np.asarray(B.point_form(B.center_size(jnp.asarray(pts))))
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_iou_properties():
    a = jnp.asarray([[0.0, 0.0, 1.0, 1.0]])
    b = jnp.asarray([[0.0, 0.0, 1.0, 1.0], [0.5, 0.5, 1.5, 1.5],
                     [2.0, 2.0, 3.0, 3.0]])
    out = np.asarray(B.iou(a, b))[0]
    np.testing.assert_allclose(out, [1.0, 0.25 / 1.75, 0.0], atol=1e-6)


def test_encode_decode_roundtrip():
    rng = np.random.RandomState(1)
    gt = rand_boxes(64, rng)
    priors_cs = np.asarray(
        B.center_size(jnp.asarray(rand_boxes(64, rng))))
    enc = B.encode(jnp.asarray(gt), jnp.asarray(priors_cs))
    dec = np.asarray(B.decode(enc, jnp.asarray(priors_cs)))
    np.testing.assert_allclose(dec, gt, atol=1e-5)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_parity_with_reference_box_utils():
    import torch

    import_reference()
    from utils import box_utils as ref

    rng = np.random.RandomState(2)
    a = rand_boxes(17, rng)
    b = rand_boxes(23, rng)

    np.testing.assert_allclose(
        np.asarray(B.iou(jnp.asarray(a), jnp.asarray(b))),
        ref.jaccard(torch.from_numpy(a), torch.from_numpy(b)).numpy(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(B.matrix_iou(jnp.asarray(a), jnp.asarray(b))),
        ref.matrix_iou(a, b),
        atol=1e-6,
    )

    priors_cs = np.asarray(B.center_size(jnp.asarray(rand_boxes(17, rng))))
    var = [0.1, 0.2]
    # log/exp differ between XLA-CPU libm and torch at ~2e-4 relative in fp32
    np.testing.assert_allclose(
        np.asarray(B.encode(jnp.asarray(a), jnp.asarray(priors_cs), var)),
        ref.encode(torch.from_numpy(a), torch.from_numpy(priors_cs), var).numpy(),
        rtol=1e-3, atol=1e-4,
    )
    loc = rng.uniform(-1, 1, size=(17, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(B.decode(jnp.asarray(loc), jnp.asarray(priors_cs), var)),
        ref.decode(torch.from_numpy(loc), torch.from_numpy(priors_cs), var).numpy(),
        rtol=1e-4, atol=1e-6,
    )


def test_encode_decode_multi_roundtrip():
    rng = np.random.RandomState(5)
    gt = rand_boxes(32, rng)
    priors_cs = np.asarray(B.center_size(jnp.asarray(rand_boxes(32, rng))))
    offsets = np.abs(rng.randn(32, 4)).astype(np.float32) * 0.1 + 0.1
    enc = B.encode_multi(jnp.asarray(gt), jnp.asarray(priors_cs),
                         jnp.asarray(offsets))
    dec = np.asarray(B.decode_multi(enc, jnp.asarray(priors_cs),
                                    jnp.asarray(offsets)))
    np.testing.assert_allclose(dec, gt, atol=1e-5)
