#!/usr/bin/env python
"""Sweep (block_q, block_k) for the flash CT backward at the 300-res
training shapes (B=64, C=60, P=11620, K=1858). Run SOLO."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from ct_tpu.utils.cache import enable_compilation_cache
from ct_tpu.utils.timing import fetch_sync
from ct_tpu.ops.ct_attention import (
    _bwd_call_cm_flash, ct_attention_cm_stats,
)

B, C, P, K = 64, 60, 11620, 1858


def main():
    enable_compilation_cache()
    print("devices", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(B, C, P), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, C, K), jnp.bfloat16)
    v = jnp.asarray(rng.randn(B, C, K), jnp.bfloat16)
    wz = jnp.asarray(rng.randn(C), jnp.float32)
    g = jnp.asarray(rng.randn(B, C, P), jnp.bfloat16)
    base = jnp.zeros((B, C, P), jnp.bfloat16)

    kt = jnp.moveaxis(k, 1, 2)
    vt = jnp.moveaxis(v, 1, 2)
    _, delta, m, z = jax.jit(
        lambda *a: ct_attention_cm_stats(*a))(q, kt, vt, base, wz)
    delta = jnp.asarray(delta)

    ref = None
    for bq, bk in ((1024, 640), (1024, 512), (1024, 960), (1024, 1920),
                   (2048, 640), (2048, 512), (512, 1920), (1024, 1024)):
        try:
            f = jax.jit(lambda qq, kk_, vv, gg, dd, mm, zz, bq=bq, bk=bk:
                        _bwd_call_cm_flash(qq, kk_, vv, wz, gg, dd, mm, zz,
                                           block_q=bq, block_k=bk))
            out = f(q, k, v, g, delta, m, z)
            fetch_sync(out)
        except Exception as e:
            print(f"bq={bq:5d} bk={bk:5d}: FAILED "
                  f"({str(e).splitlines()[0][:80]})", flush=True)
            continue
        if ref is None:
            ref = [np.asarray(o, np.float32) for o in out]
        else:
            for r, o in zip(ref, out):
                err = np.max(np.abs(r - np.asarray(o, np.float32)))
                rel = err / (np.max(np.abs(r)) + 1e-30)
                assert rel < 2e-2, (bq, bk, rel)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out = f(q, k, v, g, delta, m, z)
            fetch_sync(out)
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"bq={bq:5d} bk={bk:5d}: {best*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
