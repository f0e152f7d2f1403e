#!/usr/bin/env python
"""A/B: conv1_1 feed-layout variants on the TPU (VERDICT r4 #2).

The [B,300,300,3] image feed is lane-padded 3→128 by the TPU tiled
layout (~43×), and the r4 profile attributes ~4.6 ms of the train step to
conv1_1 fwd+wgrad reading it (plus the in-step cast). Before writing a
Pallas stem, measure what plain XLA does with cheaper feed layouts:

  a) NHWC [B,300,300,3]      — the current feed (padded reads)
  b) NCHW [B,3,300,300]      — dense tiling (300,300 minor), in-program
                               transpose to NHWC
  c) NCHW direct             — conv_general_dilated with NCHW dimension
                               numbers (let XLA pick the relayout)
  d) merged [B,300,900]      — channel-merged lanes (dense), in-program
                               reshape back to NHWC

Each variant times fwd+wgrad of conv1_1 alone (dX is NOT needed — it is
the first layer). Run SOLO.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ct_tpu.utils.timing import fetch_sync
from ct_tpu.utils.cache import enable_compilation_cache


B, S, CO = 64, 300, 64


def conv11(x_nhwc, w):
    # bf16 in/out like the production trunk (the cotangent then stays
    # bf16 too — a f32 preferred output makes the wgrad mix dtypes)
    dn = jax.lax.conv_dimension_numbers(
        x_nhwc.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x_nhwc, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)


def make_loss(feed_to_nhwc):
    def loss(x, w):
        y = conv11(feed_to_nhwc(x), w)
        return jnp.sum(jnp.square(y.astype(jnp.float32)))

    # grad wrt w ONLY — conv1_1 needs no input gradient
    return jax.jit(jax.value_and_grad(loss, argnums=1))


def bench(fn, args, iters=20):
    out = fn(*args)
    fetch_sync(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        fetch_sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    enable_compilation_cache()
    print("devices", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    x = rng.randn(B, S, S, 3).astype(np.float32) * 50
    w = jnp.asarray(rng.randn(3, 3, 3, CO).astype(np.float32) * 0.1,
                    jnp.bfloat16)

    variants = {}
    variants["a_nhwc"] = (
        jnp.asarray(x, jnp.bfloat16), make_loss(lambda t: t))
    variants["b_nchw_transpose"] = (
        jnp.asarray(np.moveaxis(x, -1, 1), jnp.bfloat16),
        make_loss(lambda t: jnp.moveaxis(t, 1, -1)))
    variants["d_merged_reshape"] = (
        jnp.asarray(x.reshape(B, S, S * 3), jnp.bfloat16),
        make_loss(lambda t: t.reshape(B, S, S, 3)))

    # c) NCHW dimension numbers straight into the conv
    def loss_c(xc, w):
        dn = jax.lax.conv_dimension_numbers(
            xc.shape, w.shape, ("NCHW", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            xc, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
        return jnp.sum(jnp.square(y.astype(jnp.float32)))

    ref_val = None
    for name, (xd, fn) in variants.items():
        t = bench(fn, (xd, w))
        val, gw = fn(xd, w)
        print(f"{name:22s} {t*1e3:7.2f} ms  loss={float(val):.6g}",
              flush=True)
        if ref_val is None:
            ref_val, ref_gw = float(val), gw
        else:
            rel = float(jnp.max(jnp.abs(gw - ref_gw)) /
                        (jnp.max(jnp.abs(ref_gw)) + 1e-9))
            assert abs(float(val) - ref_val) / abs(ref_val) < 1e-3, name
            print(f"{'':22s} grad rel err vs a: {rel:.2e}", flush=True)

    fc = jax.jit(jax.value_and_grad(loss_c, argnums=1))
    xc = jnp.asarray(np.moveaxis(x, -1, 1), jnp.bfloat16)
    t = bench(fc, (xc, w))
    val, gw = fc(xc, w)
    rel = float(jnp.max(jnp.abs(gw - ref_gw)) /
                (jnp.max(jnp.abs(ref_gw)) + 1e-9))
    print(f"{'c_nchw_direct':22s} {t*1e3:7.2f} ms  loss={float(val):.6g}",
          flush=True)
    print(f"{'':22s} grad rel err vs a: {rel:.2e}", flush=True)


if __name__ == "__main__":
    main()
