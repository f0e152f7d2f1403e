"""Fused elementwise max-pool backward (disjoint windows) vs XLA's VJP.

`_max_pool_nonoverlap` replaces XLA's windowed select-and-scatter gradient
with an upsample-compare-split formulation that fuses into the surrounding
backward (ct_tpu/models/layers.py). Forward must be bit-identical to the
generic path; gradients must match wherever window maxima are unique, and
route ties to the first (row-major) max — torch/XLA semantics.
"""

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from ct_tpu.models.layers import max_pool2d


def _ref_pool(x, k, s, pads):
    return nn.max_pool(x, k, strides=s, padding=pads)


def test_forward_matches_generic_path():
    rng = np.random.RandomState(0)
    for h, k, ceil in ((16, 2, False), (75, 2, True), (9, 3, False)):
        x = jnp.asarray(rng.randn(2, h, h, 5).astype(np.float32))
        got = max_pool2d(x, k, k, 0, ceil_mode=ceil)
        extra = (k - h % k) % k if ceil else 0
        want = _ref_pool(x, (k, k), (k, k), ((0, extra), (0, extra)))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_grad_matches_xla_when_maxima_unique():
    rng = np.random.RandomState(1)
    for h, k, ceil in ((16, 2, False), (75, 2, True), (9, 3, False)):
        # iid continuous draws: ties have probability 0
        x = jnp.asarray(rng.randn(2, h, h, 5).astype(np.float32))
        extra = (k - h % k) % k if ceil else 0

        def loss_fast(x):
            return jnp.sum(max_pool2d(x, k, k, 0, ceil_mode=ceil) ** 2)

        def loss_ref(x):
            return jnp.sum(
                _ref_pool(x, (k, k), (k, k), ((0, extra), (0, extra))) ** 2)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_fast)(x)),
            np.asarray(jax.grad(loss_ref)(x)), rtol=1e-6, atol=1e-6)


def test_overlap_3x3_s1_forward_and_grad_match_xla():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 19, 19, 7).astype(np.float32))
    got = max_pool2d(x, 3, 1, 1)
    want = _ref_pool(x, (3, 3), (1, 1), ((1, 1), (1, 1)))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    def loss_fast(x):
        return jnp.sum(jnp.tanh(max_pool2d(x, 3, 1, 1)))

    def loss_ref(x):
        return jnp.sum(jnp.tanh(
            _ref_pool(x, (3, 3), (1, 1), ((1, 1), (1, 1)))))

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_fast)(x)),
        np.asarray(jax.grad(loss_ref)(x)), rtol=1e-6, atol=1e-6)


def test_overlap_tie_gradient_mass_conserved():
    # constant input: every window's entries tie; each window routes its
    # cotangent to exactly one input, so total mass is conserved
    x = jnp.ones((1, 5, 5, 2), jnp.float32)
    g = jax.grad(lambda x: 2.0 * jnp.sum(max_pool2d(x, 3, 1, 1)))(x)
    np.testing.assert_allclose(float(jnp.sum(g)), 2.0 * 5 * 5 * 2, rtol=1e-5)


def test_tie_gradient_routes_to_first_max():
    # a window of four equal values: the FIRST (row-major) gets all of g —
    # torch/XLA select-and-scatter semantics; total mass preserved
    x = jnp.zeros((1, 2, 2, 1), jnp.float32)
    g = jax.grad(lambda x: 3.0 * jnp.sum(max_pool2d(x, 2, 2, 0)))(x)
    want = np.zeros((1, 2, 2, 1), np.float32)
    want[0, 0, 0, 0] = 3.0
    np.testing.assert_allclose(np.asarray(g), want)


def test_tied_inputs_match_xla_and_torch():
    """Constant-color-fixture regression: exact positive ties in windows
    (caught by the gated CLI e2e when ties were equal-split)."""
    rng = np.random.RandomState(7)
    # blocky image: conv-like exact duplicates inside pool windows
    base = rng.randn(1, 4, 4, 3).astype(np.float32)
    x_np = np.kron(base, np.ones((1, 4, 4, 1), np.float32))  # 16x16 blocks
    x = jnp.asarray(x_np)
    for k, ceil in ((2, False), (3, False)):
        g_fast = jax.grad(
            lambda x: jnp.sum(max_pool2d(x, k, k, 0, ceil_mode=ceil) ** 2))(x)
        g_xla = jax.grad(
            lambda x: jnp.sum(_ref_pool(
                x, (k, k), (k, k), ((0, 0), (0, 0))) ** 2))(x)
        np.testing.assert_array_equal(np.asarray(g_fast), np.asarray(g_xla))
    # overlapping 3x3/s1/p1 vs torch (functional grad through max_pool2d)
    import torch
    import torch.nn.functional as F

    xt = torch.tensor(np.moveaxis(x_np, -1, 1), requires_grad=True)
    yt = F.max_pool2d(xt, 3, 1, 1)
    (yt ** 2).sum().backward()
    g_torch = np.moveaxis(xt.grad.numpy(), 1, -1)
    g_fast = jax.grad(lambda x: jnp.sum(max_pool2d(x, 3, 1, 1) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_fast), g_torch,
                               rtol=1e-6, atol=1e-6)


def test_ceil_padding_gets_no_gradient_leak():
    # 3→2 windows with ceil: the padded column/row must not absorb mass
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 3, 3, 2).astype(np.float32))
    g = jax.grad(lambda x: jnp.sum(max_pool2d(x, 2, 2, 0, ceil_mode=True)))(x)
    assert np.isfinite(np.asarray(g)).all()
    # 2×2 windows per channel × 2 channels: each contributes exactly 1.0
    np.testing.assert_allclose(float(jnp.sum(g)), 8.0, rtol=1e-6)
