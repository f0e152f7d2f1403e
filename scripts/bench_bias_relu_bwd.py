#!/usr/bin/env python
"""A/B the conv bias+ReLU backward (masked grad + dbias) : XLA fusion vs
a one-pass Pallas kernel.

The r4 train profile shows XLA's multi-output fusions for this pattern
running 1.8-3.3x over their padded HBM floors:
  [64,300,300,64]: 9.93 ms (floor ~5.4)   [64,150,150,128]: 2.51 (~2.0)
  [64,75,75,256]:   2.20 ms (floor ~0.67) [64,38,38,512]:   2.25 (~0.35)
Hypothesis: the 2-output fusion re-reads/re-passes; a single Pallas pass
(read g,y -> write masked, accumulate dbias in VMEM scratch) hits the
floor. Run SOLO.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ct_tpu.utils.timing import fetch_sync
from ct_tpu.utils.cache import enable_compilation_cache, require_tpu_tunnel


def _kernel(g_ref, y_ref, mg_ref, db_ref, acc, *, n_rows: int):
    i = pl.program_id(0)
    g = g_ref[...]
    y = y_ref[...]
    # bf16 cmpf is unsupported by Mosaic on v5e — predicate in f32
    masked = jnp.where(y.astype(jnp.float32) > 0, g,
                       jnp.zeros((), g.dtype))
    mg_ref[...] = masked
    # rows past n_rows (padded final block) are undefined — keep them out
    # of the dbias sum
    rows = jax.lax.broadcasted_iota(jnp.int32, (g.shape[0], 1), 0)
    live = (i * g.shape[0] + rows) < n_rows
    part = jnp.sum(jnp.where(live, masked.astype(jnp.float32), 0.0),
                   axis=0, keepdims=True)

    @pl.when(i == 0)
    def _():
        acc[...] = part

    @pl.when(i > 0)
    def _():
        acc[...] = acc[...] + part

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        db_ref[...] = acc[...]


def bias_relu_bwd_pallas(g, y, block_rows=4096):
    n = int(np.prod(g.shape[:-1]))
    c = g.shape[-1]
    g2 = g.reshape(n, c)
    y2 = y.reshape(n, c)
    grid = (pl.cdiv(n, block_rows),)
    spec = pl.BlockSpec((block_rows, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    mg, db = pl.pallas_call(
        functools.partial(_kernel, n_rows=n),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=[spec, pl.BlockSpec((1, c), lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n, c), g.dtype),
                   jax.ShapeDtypeStruct((1, c), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32)],
    )(g2, y2)
    return mg.reshape(g.shape), db[0]


def xla_ref(g, y):
    masked = jnp.where(y > 0, g, jnp.zeros((), g.dtype))
    return masked, jnp.sum(masked.astype(jnp.float32),
                           axis=tuple(range(g.ndim - 1)))


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
    for shp in [(64, 300, 300, 64), (64, 150, 150, 128),
                (64, 75, 75, 256), (64, 38, 38, 512)]:
        g = jnp.asarray(rng.randn(*shp).astype(np.float32), jnp.bfloat16)
        y = jnp.asarray(
            np.maximum(rng.randn(*shp), 0).astype(np.float32), jnp.bfloat16)
        fx = jax.jit(xla_ref)
        fp = jax.jit(bias_relu_bwd_pallas)
        mx, dx = fx(g, y)
        mp, dp = fp(g, y)
        np.testing.assert_array_equal(np.asarray(mx), np.asarray(mp))
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dp),
                                   rtol=1e-5, atol=1e-2)
        tx = bench(fx, (g, y))
        tp = bench(fp, (g, y))
        print(f"{str(shp):22s} xla {tx*1e3:7.2f} ms   "
              f"pallas {tp*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
