#!/usr/bin/env python
"""A/B: row-major vs class-major Pallas CT-attention backward on the TPU.

The row-major backward left 4 of 6 matmuls writing 60-of-128-lane outputs
(C=60 on the lane axis); the class-major rewrite moves C to sublanes.
Run SOLO (nothing else on the TPU).
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
from ct_tpu.utils.cache import enable_compilation_cache
from ct_tpu.ops import ct_attention as cta


def bwd_rowmajor(q, k, v, wz, g, block_q: int = 512):
    """The pre-r3 row-major wrapper (kept here for the A/B)."""
    b, p, c = q.shape
    kk = k.shape[1]
    block_q = cta._fit_block_q_bwd(block_q, kk)
    qspec = pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, kk, c), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv, dwz = pl.pallas_call(
        functools.partial(cta._bwd_kernel, p_total=p),
        grid=(b, pl.cdiv(p, block_q)),
        in_specs=[qspec, kvspec, kvspec,
                  pl.BlockSpec((1, c), lambda i, j: (0, 0),
                               memory_space=pltpu.VMEM),
                  qspec],
        out_specs=[qspec, kvspec, kvspec,
                   pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((b, p, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, kk, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, kk, c), jnp.float32),
                   jax.ShapeDtypeStruct((b, 1, c), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * p * kk * c,
            bytes_accessed=4 * b * (4 * p * c + 4 * kk * c),
            transcendentals=b * p * kk),
    )(q, k, v, wz[None, :], g)
    return dq, dk, dv, jnp.sum(dwz[:, 0, :], axis=0)


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
    B, P, K, C = 64, 11620, 1858, 60
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3,
                                jnp.bfloat16)
    q, k, v, g = mk(B, P, C), mk(B, K, C), mk(B, K, C), mk(B, P, C)
    wz = jnp.asarray(rng.randn(C).astype(np.float32))
    flops = 10 * B * P * K * C

    fr = jax.jit(bwd_rowmajor)
    t = bench(fr, (q, k, v, wz, g))
    print(f"row-major bwd:   {t*1e3:.2f} ms ({flops/t/1e12:.1f} TF/s)",
          flush=True)

    fc = jax.jit(cta.ct_attention_bwd_pallas)
    t = bench(fc, (q, k, v, wz, g))
    print(f"class-major bwd: {t*1e3:.2f} ms ({flops/t/1e12:.1f} TF/s)",
          flush=True)

    a = fr(q, k, v, wz, g)
    b2 = fc(q, k, v, wz, g)
    for name, x, y in zip(("dq", "dk", "dv", "dwz"), a, b2):
        err = float(jnp.max(jnp.abs(
            x.astype(jnp.float32) - y.astype(jnp.float32))))
        ref = float(jnp.max(jnp.abs(x.astype(jnp.float32)))) or 1.0
        print(f"  max|d{name}| = {err:.3e}  (rel {err/ref:.2e})", flush=True)

    # ---- flash path (r5): saved m/z/delta + K-chunked bq-1024 backward ----
    q_cm, g_cm = jnp.moveaxis(q, -1, 1), jnp.moveaxis(g, -1, 1)
    base_cm = jnp.zeros_like(q_cm)
    k_cm, v_cm = jnp.moveaxis(k, -1, 1), jnp.moveaxis(v, -1, 1)

    f_old_fwd = jax.jit(cta.ct_attention_cm)
    t = bench(f_old_fwd, (q_cm, k, v, base_cm, wz))
    print(f"cm fwd (plain):  {t*1e3:.2f} ms", flush=True)
    f_new_fwd = jax.jit(cta.ct_attention_cm_stats)
    t = bench(f_new_fwd, (q_cm, k, v, base_cm, wz))
    print(f"cm fwd (stats):  {t*1e3:.2f} ms", flush=True)

    _, delta, m, z = f_new_fwd(q_cm, k, v, base_cm, wz)
    f_old_bwd = jax.jit(functools.partial(cta._bwd_call_cm, block_q=512))
    t = bench(f_old_bwd, (q_cm, k_cm, v_cm, wz, g_cm))
    print(f"cm bwd (r4, bq512):   {t*1e3:.2f} ms ({flops/t/1e12:.1f} TF/s)",
          flush=True)
    f_flash = jax.jit(functools.partial(cta._bwd_call_cm_flash,
                                        block_q=1024))
    t = bench(f_flash, (q_cm, k_cm, v_cm, wz, g_cm, delta, m, z))
    print(f"cm bwd (flash, bq1024): {t*1e3:.2f} ms "
          f"({flops/t/1e12:.1f} TF/s)", flush=True)

    a = f_old_bwd(q_cm, k_cm, v_cm, wz, g_cm)
    b3 = f_flash(q_cm, k_cm, v_cm, wz, g_cm, delta, m, z)
    for name, x, y in zip(("dq", "dk", "dv", "dwz"), a, b3):
        err = float(jnp.max(jnp.abs(
            x.astype(jnp.float32) - y.astype(jnp.float32))))
        ref = float(jnp.max(jnp.abs(x.astype(jnp.float32)))) or 1.0
        print(f"  flash max|d{name}| = {err:.3e}  (rel {err/ref:.2e})",
              flush=True)


if __name__ == "__main__":
    main()
