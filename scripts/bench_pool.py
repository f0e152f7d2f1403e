#!/usr/bin/env python
"""A/B the custom disjoint-window max-pool VJP against XLA's
select-and-scatter, per pool shape, on the real TPU.

The r3 custom VJP (ct_tpu/models/layers.py:_max_pool_nonoverlap) was
CPU-verified but never TPU-timed; the r4 train profile shows the pool1
backward pieces (pad_maximum/eq-mask fusions over [64,300,300,64])
summing well above the old select-and-scatter cost. Measure per shape
and keep whichever wins per call site. Run SOLO.
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
from ct_tpu.utils.cache import enable_compilation_cache, require_tpu_tunnel
from ct_tpu.models.layers import _max_pool_nonoverlap


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
    require_tpu_tunnel()
    enable_compilation_cache()
    print("devices", jax.devices(), flush=True)
    rng = np.random.RandomState(0)

    shapes = [
        (64, 300, 300, 64),
        (64, 150, 150, 128),
        (64, 75, 75, 256),
        (64, 38, 38, 512),
    ]
    for shp in shapes:
        # post-ReLU-like input (ties at 0 exist, like production)
        x = jnp.asarray(
            np.maximum(rng.randn(*shp), 0).astype(np.float32), jnp.bfloat16)

        def custom(x):
            y = _max_pool_nonoverlap(x, (2, 2), (0, 0))
            return jnp.sum(y.astype(jnp.float32) ** 2)

        def xla(x):
            y = nn.max_pool(x, (2, 2), strides=(2, 2))
            return jnp.sum(y.astype(jnp.float32) ** 2)

        for name, f in (("custom-vjp", custom), ("xla-sas", xla)):
            g = jax.jit(jax.grad(f))
            t = bench(g, (x,))
            print(f"{str(shp):22s} {name:10s} fwd+bwd {t*1e3:7.2f} ms",
                  flush=True)


if __name__ == "__main__":
    main()
