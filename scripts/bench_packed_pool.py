#!/usr/bin/env python
"""A/B: lane-packed conv1-stage elementwise ops vs the standard layout.

The [B,300,300,64] stage tensors pad 64→128 lanes (2× HBM on every
elementwise/pool pass). A free row-major view packs x-pairs into
channels: [B,300,300,64] ≡ [B,300,150,128] (no padding). Measures:

  a) pool1 fwd+bwd, standard layout (XLA reduce_window/select_and_scatter)
  b) pool1 fwd+bwd, packed view (pure elementwise max + comparison VJP;
     x-pooling = max across the two packed channel halves)
  c) the packed→standard relayout a consumer conv would force

If (a − b) clears 2×(c), a packed-layout conv1 stage is worth building;
otherwise this refutes it with numbers. Run SOLO.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ct_tpu.utils.timing import fetch_sync
from ct_tpu.utils.cache import enable_compilation_cache

B, S, C = 64, 300, 64


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


def pool_std(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")


def loss_std(x):
    y = pool_std(x)
    return jnp.sum(jnp.square(y.astype(jnp.float32)))


def pool_packed(xp):
    # xp [B,300,150,128]: lanes = (x%2, c). y-pairs via a row split,
    # x-pairs via the channel halves — all elementwise, no windows.
    b, s, s2, cc = xp.shape
    ymax = jnp.max(xp.reshape(b, s // 2, 2, s2, cc), axis=2)
    return jnp.maximum(ymax[..., :C], ymax[..., C:])   # [B,150,150,64]


def loss_packed(xp):
    y = pool_packed(xp)
    return jnp.sum(jnp.square(y.astype(jnp.float32)))


def main():
    enable_compilation_cache()
    print("devices", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    xh = rng.randn(B, S, S, C).astype(np.float32)
    x = jnp.asarray(xh, jnp.bfloat16)
    xp = jnp.asarray(xh.reshape(B, S, S // 2, 2 * C), jnp.bfloat16)

    fa = jax.jit(jax.grad(loss_std))
    t = bench(fa, (x,))
    print(f"a) pool1 fwd+bwd standard: {t*1e3:7.2f} ms", flush=True)
    ga = fa(x)

    fb = jax.jit(jax.grad(loss_packed))
    t = bench(fb, (xp,))
    print(f"b) pool1 fwd+bwd packed:   {t*1e3:7.2f} ms", flush=True)
    gb = fb(xp)
    # gradient equivalence mod tie-routing (random floats: ties are
    # zero-measure) — compare through the packing view
    err = float(jnp.max(jnp.abs(
        ga.astype(jnp.float32)
        - gb.reshape(ga.shape).astype(jnp.float32))))
    print(f"   max grad err vs standard: {err:.3e}", flush=True)

    # c) the relayout a standard-layout consumer (conv1_2) would force
    fc = jax.jit(lambda t_: t_.reshape(B, S, S, C) + jnp.bfloat16(1))
    t = bench(fc, (xp,))
    print(f"c) packed->standard relayout(+eps): {t*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
