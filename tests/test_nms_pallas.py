"""Pallas NMS kernel vs the XLA nms_mask and numpy oracle (interpret)."""

import numpy as np
import jax.numpy as jnp

from ct_tpu.ops.nms import nms_mask, nms_numpy
from ct_tpu.ops.nms_pallas import nms_pallas


def sorted_random_dets(rng, n, k):
    mins = rng.uniform(0, 200, size=(n, k, 2))
    sizes = rng.uniform(10, 100, size=(n, k, 2))
    boxes = np.concatenate([mins, mins + sizes], axis=-1).astype(np.float32)
    scores = -np.sort(-rng.uniform(0, 1, size=(n, k)).astype(np.float32))
    return boxes, scores


def test_pallas_nms_matches_oracles():
    rng = np.random.RandomState(0)
    n, k = 6, 64
    boxes, scores = sorted_random_dets(rng, n, k)
    valid = np.ones((n, k), bool)
    valid[0, 40:] = False  # partial candidate set

    keep = np.asarray(
        nms_pallas(jnp.asarray(boxes), jnp.asarray(valid), 0.45, 1.0, True)
    ).astype(bool)

    for i in range(n):
        # XLA path
        ref = np.asarray(
            nms_mask(jnp.asarray(boxes[i]), jnp.asarray(valid[i]), 0.45, 1.0)
        )
        np.testing.assert_array_equal(keep[i], ref, err_msg=f"row {i}")
        # numpy oracle over the valid prefix
        nv = valid[i].sum()
        dets = np.hstack([boxes[i, :nv], scores[i, :nv, None]])
        expected = sorted(nms_numpy(dets, 0.45))
        got = sorted(np.where(keep[i, :nv])[0].tolist())
        assert got == expected, f"row {i}"
