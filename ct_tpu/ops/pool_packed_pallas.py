"""Fused Pallas kernel for the lane-packed conv1-stage pool (+ deferred
ReLU): one HBM pass each way.

The packed conv1 stage (ct_tpu/models/layers.py) closes with a 2×2/s2 max
pool over the x-pair-packed layout [B,H,W/2,2C] followed by a deferred
ReLU (relu ∘ pool == pool ∘ relu, see rfbnet.py). In XLA the first-max
tie-routing backward lowers to ~5 materialized [B,H/2,W/2,*]-scale
intermediates (mask fusions, rank-5 stack/pad assemblies — profiled
~7 ms/step at batch 64 against a ~1.4 ms HBM floor), and the forward
splits into an unfused reduce_max + slice_maximum pair. This kernel fuses
each direction into a single VMEM pass:

  forward:  xp → relu(max over the 2×2 window)         (read 1×, write ¼×)
  backward: (xp, y_relu, g) → dxp                      (read 2¼×, write 1×)

Tie routing is first-max in torch row-major window order — bit-identical
to XLA's select-and-scatter gradient (and to torch) — via the same
boolean priority chain as the XLA fallback in layers.py. The ReLU fold is
gradient-exact: where the window max is ≤ 0 the ReLU kills the cotangent
(g_eff = 0), so comparing against the *rectified* saved output y_relu
routes nothing there, which is exactly the composed pool→relu gradient.

Reference scope: this replaces torch's `nn.MaxPool2d(2, 2)` after conv1_2
(/root/reference/models/RFB_Net_vgg.py:330 via the 'M' cfg entry) on the
training path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_bh(h2: int, w2: int, cc: int, budget_bytes: int = 3 << 20) -> int:
    """Largest divisor of H/2 whose block working set fits the budget
    (xp + dxp blocks [2bh,W2,CC] + y/g blocks [bh,W2,C], bf16).

    The budget is deliberately ~⅕ of the 16 MB scoped-VMEM limit: Mosaic's
    stack for the bwd kernel (mask temporaries + f32 compare casts)
    measured ~4-5× the nominal block bytes — 5 MB here OOM'd scoped vmem
    at 23.2M on v5e."""
    best = 1
    for d in range(1, h2 + 1):
        if h2 % d:
            continue
        per = 2 * (2 * d * w2 * cc * 2) + 2 * (d * w2 * (cc // 2) * 2)
        if per <= budget_bytes:
            best = d
    return best


def _fwd_kernel(xp_ref, y_ref):
    x = xp_ref[0]                                   # [2bh, W2, CC]
    bh2, w2, cc = x.shape
    c = cc // 2
    xx = x.reshape(bh2 // 2, 2, w2, cc)
    ymax = jnp.maximum(xx[:, 0], xx[:, 1])
    y = jnp.maximum(ymax[..., :c], ymax[..., c:])
    y_ref[0] = jnp.maximum(y, 0)


def _bwd_kernel(xp_ref, y_ref, g_ref, dxp_ref):
    x = xp_ref[0]                                   # [2bh, W2, CC]
    bh2, w2, cc = x.shape
    c = cc // 2
    xx = x.reshape(bh2 // 2, 2, w2, cc)
    y = y_ref[0]                                    # [bh, W2, C] (rectified)
    g = g_ref[0]
    zero = jnp.zeros((), g.dtype)
    # Compares run in f32 — Mosaic's VPU on v5e supports neither bf16 nor
    # int16 vector compares ("Target does not support this comparison"),
    # and bf16 → f32 casts are exact, so the routing is unchanged.
    cmp = lambda t: t.astype(jnp.float32)
    yb = cmp(y)
    geff = jnp.where(yb > 0, g, zero)               # deferred-ReLU backward
    xb = cmp(xx)
    e0e = xb[:, 0, :, :c] == yb
    e0o = xb[:, 0, :, c:] == yb
    e1e = xb[:, 1, :, :c] == yb
    e1o = xb[:, 1, :, c:] == yb
    # first-max priority chain, torch row-major window order
    w00 = e0e
    w01 = e0o & ~w00
    p0 = w00 | e0o
    w10 = e1e & ~p0
    w11 = e1o & ~(p0 | w10)
    d0 = jnp.concatenate([jnp.where(w00, geff, zero),
                          jnp.where(w01, geff, zero)], axis=-1)
    d1 = jnp.concatenate([jnp.where(w10, geff, zero),
                          jnp.where(w11, geff, zero)], axis=-1)
    dxp_ref[0] = jnp.stack([d0, d1], axis=1).reshape(bh2, w2, cc)


def _fwd_call(xp, interpret):
    b, h, w2, cc = xp.shape
    h2, c = h // 2, cc // 2
    bh = _pick_bh(h2, w2, cc)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b, h2 // bh),
        in_specs=[pl.BlockSpec((1, 2 * bh, w2, cc), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, bh, w2, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2, c), xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=3 * b * h2 * w2 * cc,
            bytes_accessed=xp.size * xp.dtype.itemsize * 5 // 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp)


def _bwd_call(xp, y, g, interpret):
    b, h, w2, cc = xp.shape
    h2, c = h // 2, cc // 2
    bh = _pick_bh(h2, w2, cc)
    spec_big = pl.BlockSpec((1, 2 * bh, w2, cc), lambda i, j: (i, j, 0, 0),
                            memory_space=pltpu.VMEM)
    spec_small = pl.BlockSpec((1, bh, w2, c), lambda i, j: (i, j, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(b, h2 // bh),
        in_specs=[spec_big, spec_small, spec_small],
        out_specs=spec_big,
        out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * b * h * w2 * cc,
            bytes_accessed=xp.size * xp.dtype.itemsize * 9 // 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, y, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def pool2x2_packed_relu(xp, interpret: bool = False):
    """relu(2×2/s2 max pool): packed [B,H,W/2,2C] → STANDARD [B,H/2,W/2,C].

    Forward and backward are single fused Pallas passes; gradients are
    bit-identical to `max_pool2x2_packed` + `relu_save_out` (layers.py),
    which remain the XLA fallback for non-TPU backends.
    """
    return _fwd_call(xp, interpret)


def _pool2x2_packed_relu_fwd(xp, interpret):
    y = _fwd_call(xp, interpret)
    return y, (xp, y)


def _pool2x2_packed_relu_bwd(interpret, res, g):
    xp, y = res
    return (_bwd_call(xp, y, g.astype(xp.dtype), interpret),)


pool2x2_packed_relu.defvjp(_pool2x2_packed_relu_fwd,
                           _pool2x2_packed_relu_bwd)
