#!/usr/bin/env python
"""A/B the flash CT backward at the 512-resolution shapes (P=32756,
K=4964): does block_q 1024 fit VMEM with K-chunking, and is it faster
than the conservative 512 the `_fit_block_q_flash` cliff picks? Run SOLO.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ct_tpu.utils.timing import fetch_sync
from ct_tpu.utils.cache import enable_compilation_cache
from ct_tpu.ops import ct_attention as cta


def bench(fn, args, iters=10):
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
    B, P, K, C = 16, 32756, 4964, 60   # batch 16 = the accum-4 microbatch
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3,
                                jnp.bfloat16)
    q_cm, g_cm = mk(B, C, P), mk(B, C, P)
    k, v = mk(B, K, C), mk(B, K, C)
    k_cm, v_cm = jnp.moveaxis(k, -1, 1), jnp.moveaxis(v, -1, 1)
    base_cm = jnp.zeros_like(q_cm)
    wz = jnp.asarray(rng.randn(C).astype(np.float32))
    flops = 10 * B * P * K * C

    _, delta, m, z = jax.jit(cta.ct_attention_cm_stats)(
        q_cm, k, v, base_cm, wz)
    ref = None
    for bq in (512, 1024):
        try:
            fn = jax.jit(functools.partial(
                cta._bwd_call_cm_flash, block_q=bq))
            # block_q is clamped by _fit_block_q_flash; bypass for the A/B
            old = cta._fit_block_q_flash
            cta._fit_block_q_flash = lambda b, kk: bq
            try:
                t = bench(fn, (q_cm, k_cm, v_cm, wz, g_cm, delta, m, z))
                out = fn(q_cm, k_cm, v_cm, wz, g_cm, delta, m, z)
            finally:
                cta._fit_block_q_flash = old
            print(f"flash bwd bq={bq}: {t*1e3:.2f} ms "
                  f"({flops/t/1e12:.1f} TF/s)", flush=True)
            if ref is None:
                ref = out
            else:
                for name, a, b in zip("qkv", ref[:3], out[:3]):
                    err = float(jnp.max(jnp.abs(
                        a.astype(jnp.float32) - b.astype(jnp.float32))))
                    print(f"  max|d{name}(bq512-bq1024)| = {err:.3e}",
                          flush=True)
        except Exception as e:
            print(f"flash bwd bq={bq}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
