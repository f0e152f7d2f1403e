"""Matching + multibox loss parity vs the reference torch implementation."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import has_reference, import_reference
from ct_tpu.config import VOC_300
from ct_tpu.data.targets import pad_targets
from ct_tpu.ops import boxes as B
from ct_tpu.ops.matching import match_batch
from ct_tpu.ops.losses import multibox_loss
from ct_tpu.ops.priors import prior_boxes_np


def make_annos(rng, batch, max_n=8, ignore_frac=0.0, mixup=False, ncls=15):
    """Random [N_i, 6] percent-coord annotations, reference layout."""
    annos = []
    for _ in range(batch):
        n = rng.randint(1, max_n + 1)
        mins = rng.uniform(0, 0.7, size=(n, 2))
        sizes = rng.uniform(0.05, 0.3, size=(n, 2))
        boxes = np.concatenate([mins, np.minimum(mins + sizes, 1.0)], axis=1)
        labels = rng.randint(1, ncls + 1, size=(n, 1)).astype(np.float64)
        if ignore_frac > 0 and n > 1:
            k = max(1, int(n * ignore_frac))
            labels[-k:] = -1
        w = (
            rng.uniform(0.2, 1.0, size=(n, 1)) if mixup
            else np.ones((n, 1))
        )
        annos.append(
            np.concatenate([boxes, labels, w], axis=1).astype(np.float32)
        )
    return annos


def reference_match(annos, priors_np, threshold=0.5):
    import torch

    import_reference()
    from utils.box_utils import match as ref_match

    num = len(annos)
    p = priors_np.shape[0]
    loc_t = torch.zeros(num, p, 4)
    conf_t = torch.zeros(num, p, 2)
    obj_t = torch.zeros(num, p, dtype=torch.bool)
    priors = torch.from_numpy(priors_np)
    for idx, a in enumerate(annos):
        t = torch.from_numpy(a)
        ref_match(
            threshold, t[:, :-2], priors, [0.1, 0.2], t[:, -2:],
            loc_t, conf_t, obj_t, idx,
        )
    return loc_t.numpy(), conf_t.numpy(), obj_t.numpy()


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
@pytest.mark.parametrize(
    "ignore_frac,mixup", [(0.0, False), (0.3, False), (0.0, True)]
)
def test_match_parity(ignore_frac, mixup):
    rng = np.random.RandomState(7)
    priors_np = prior_boxes_np(VOC_300)
    annos = make_annos(rng, batch=4, ignore_frac=ignore_frac, mixup=mixup)

    ref_loc, ref_conf, ref_obj = reference_match(annos, priors_np)

    pt = pad_targets(annos, max_objs=16)
    ours = match_batch(
        jnp.asarray(pt.boxes), jnp.asarray(pt.labels),
        jnp.asarray(pt.weights), jnp.asarray(pt.valid),
        jnp.asarray(priors_np),
    )

    np.testing.assert_array_equal(np.asarray(ours.cls_t), ref_conf[..., 0])
    np.testing.assert_allclose(np.asarray(ours.w_t), ref_conf[..., 1],
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(ours.obj_t), ref_obj)
    np.testing.assert_allclose(np.asarray(ours.loc_t), ref_loc,
                               rtol=1e-3, atol=2e-4)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
@pytest.mark.parametrize(
    "ignore_frac,mixup", [(0.0, False), (0.3, True)]
)
def test_loss_parity(ignore_frac, mixup):
    import torch

    import_reference()
    from layers.modules.multibox_loss_combined import MultiBoxLoss_combined

    rng = np.random.RandomState(11)
    ncls = 15
    priors_np = prior_boxes_np(VOC_300)
    p = priors_np.shape[0]
    batch = 3
    annos = make_annos(rng, batch, ignore_frac=ignore_frac, mixup=mixup,
                       ncls=ncls)

    loc_p = rng.randn(batch, p, 4).astype(np.float32) * 0.5
    conf_p = rng.randn(batch, p, ncls).astype(np.float32)
    obj_p = rng.randn(batch, p, 2).astype(np.float32)

    criterion = MultiBoxLoss_combined(
        ncls + 1, 0.5, True, 0, True, 3, 0.5, False
    )
    ref = criterion(
        (torch.from_numpy(loc_p), torch.from_numpy(conf_p),
         torch.from_numpy(obj_p)),
        torch.from_numpy(priors_np),
        [torch.from_numpy(a) for a in annos],
    )

    pt = pad_targets(annos, max_objs=16)
    matched = match_batch(
        jnp.asarray(pt.boxes), jnp.asarray(pt.labels),
        jnp.asarray(pt.weights), jnp.asarray(pt.valid),
        jnp.asarray(priors_np),
    )
    ours = multibox_loss(
        jnp.asarray(loc_p), jnp.asarray(conf_p), jnp.asarray(obj_p), matched
    )

    for key in ("loss_box_reg", "loss_cls", "loss_obj"):
        np.testing.assert_allclose(
            float(ours[key]), float(ref[key]), rtol=2e-4,
            err_msg=key,
        )


def test_loss_no_positives_is_finite():
    """Degenerate batch (no positive anchors) must not produce NaN/Inf —
    a TPU-robustness improvement over the reference (which divides by 0)."""
    rng = np.random.RandomState(3)
    priors_np = prior_boxes_np(VOC_300)
    p = priors_np.shape[0]
    pt = pad_targets([np.zeros((0, 6), np.float32)], max_objs=4)
    matched = match_batch(
        jnp.asarray(pt.boxes), jnp.asarray(pt.labels),
        jnp.asarray(pt.weights), jnp.asarray(pt.valid),
        jnp.asarray(priors_np),
    )
    losses = multibox_loss(
        jnp.asarray(rng.randn(1, p, 4), dtype=jnp.float32),
        jnp.asarray(rng.randn(1, p, 15), dtype=jnp.float32),
        jnp.asarray(rng.randn(1, p, 2), dtype=jnp.float32),
        matched,
    )
    for v in losses.values():
        assert np.isfinite(float(v))
