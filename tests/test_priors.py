"""Prior-box generation parity vs the reference implementation."""

import numpy as np
import pytest

from conftest import has_reference, import_reference
from ct_tpu.config import VOC_300, VOC_512, COCO_300, COCO_512
from ct_tpu.ops.priors import prior_boxes_np


def test_prior_counts():
    assert VOC_300.num_priors == 11620
    assert prior_boxes_np(VOC_300).shape == (11620, 4)
    assert VOC_512.num_priors == 32756
    assert prior_boxes_np(VOC_512).shape == (32756, 4)


def test_priors_in_range():
    p = prior_boxes_np(COCO_300)
    assert p.min() >= 0.0 and p.max() <= 1.0
    # centers of the first (38x38) level step by 1/37.5
    assert np.isclose(p[0, 0], 0.5 / 37.5)
    assert np.isclose(p[6 * 1, 0], 1.5 / 37.5)  # next column, anchor 0


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
@pytest.mark.parametrize("cfg", [VOC_300, VOC_512, COCO_300, COCO_512])
def test_priors_match_reference(cfg):
    import_reference()
    from layers.functions.prior_box import PriorBox

    ref_cfg = {
        "min_dim": cfg.min_dim,
        "feature_maps": list(cfg.feature_maps),
        "steps": list(cfg.steps),
        "min_sizes": list(cfg.min_sizes),
        "max_sizes": list(cfg.max_sizes),
        "aspect_ratios": [list(a) for a in cfg.aspect_ratios],
        "variance": list(cfg.variance),
        "clip": cfg.clip,
    }
    ref = PriorBox(ref_cfg).forward().numpy()
    ours = prior_boxes_np(cfg)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-6)
