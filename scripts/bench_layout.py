#!/usr/bin/env python
"""Measure the C=64 lane-padding tax on the conv1-stage tensors.

The train profile shows the conv1-stage backward elementwise stack
(BN+ReLU fusions over [64,300,300,64]) at ~24 ms/step. Those tensors get
TPU layout {3,0,2,1:T(8,128)(2,1)} — C=64 on the 128-lane axis, so every
tile is half padding and every HBM pass may pay 2×. This microbench
times identical elementwise/reduce work at C=64 vs C=128 (same logical
element count) to confirm or refute before any kernel work. Run SOLO.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ct_tpu.utils.timing import fetch_sync
from ct_tpu.utils.cache import enable_compilation_cache, require_tpu_tunnel


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


def bn_relu_bwd(x, g, gamma):
    """The BN+ReLU backward shape of work: two reduce passes + a dx pass."""
    mu = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
    xc = x - mu
    s1 = jnp.sum(g, axis=(0, 1, 2))
    s2 = jnp.sum(g * xc, axis=(0, 1, 2))
    dx = gamma * (g - s1 / x.size * 1.0 - xc * (s2 / x.size))
    return jnp.where(x > 0, dx, 0).astype(x.dtype)


def main():
    require_tpu_tunnel()
    enable_compilation_cache()
    print("devices", jax.devices(), flush=True)
    rng = np.random.RandomState(0)

    shapes = [
        ("C=64  [64,300,300,64]", (64, 300, 300, 64)),
        ("C=128 [64,300,150,128]", (64, 300, 150, 128)),
        ("C=256 [64,150,150,256]", (64, 150, 150, 256)),
    ]
    for name, shp in shapes:
        x = jnp.asarray(rng.randn(*shp).astype(np.float32), jnp.bfloat16)
        g = jnp.asarray(rng.randn(*shp).astype(np.float32), jnp.bfloat16)
        gamma = jnp.ones((shp[-1],), jnp.bfloat16)
        nbytes = 2 * int(np.prod(shp))

        f = jax.jit(lambda x: x * 2 + 1)          # 1 read + 1 write
        t = bench(f, (x,))
        print(f"{name} elementwise: {t*1e3:6.2f} ms "
              f"({2*nbytes/t/1e9:6.0f} GB/s apparent)", flush=True)

        f2 = jax.jit(bn_relu_bwd)
        t = bench(f2, (x, g, gamma))
        print(f"{name} bn+relu bwd: {t*1e3:6.2f} ms", flush=True)

    # conv1_2 weight-grad orientation probe: XLA wgrad vs transposed matmul
    B, H, W, C = 64, 300, 300, 64
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32), jnp.bfloat16)
    dy = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32), jnp.bfloat16)
    w0 = jnp.zeros((3, 3, C, C), jnp.bfloat16)

    def conv_loss(w, x):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)

    wgrad = jax.jit(lambda x, dy: jax.vjp(
        lambda w: conv_loss(w, x), w0)[1](dy)[0])
    t = bench(wgrad, (x, dy), iters=10)
    fl = 2 * B * H * W * C * C * 9
    print(f"XLA conv1_2 wgrad: {t*1e3:.2f} ms ({fl/t/1e12:.1f} TF/s)",
          flush=True)


if __name__ == "__main__":
    main()
