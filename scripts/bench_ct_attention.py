#!/usr/bin/env python
"""CT attention kernel microbench: variants × block sizes on the real TPU.

The serving profile shows CT attention at ~31% MFU (docs/ROADMAP.md item
3): the C=60 contraction underfills MXU lanes and the [P,K] softmax exp is
VPU-bound. This sweeps the tuning space; run it serially with nothing else
on the TPU.
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


def make_variant(exp_dtype, block_q, fuse_denom=False):
    """Build a pallas ct-attention fwd with the given exp dtype/block.

    ``fuse_denom``: augment v with a ones column so ``e @ [v|1]`` yields the
    unnormalized delta AND the softmax denominator from one MXU op,
    removing the [bq, K] VPU row-sum (C+1=61 stays under the 128-lane
    tile, so the matmul costs the same)."""

    def kernel(q_ref, k_ref, v_ref, base_ref, wz_ref, out_ref):
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s_max = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp((s - s_max).astype(exp_dtype))
        if fuse_denom:
            dd = jnp.dot(e.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
            delta = dd[:, :-1] / dd[:, -1:]
        else:
            delta = jnp.dot(e.astype(v.dtype), v,
                            preferred_element_type=jnp.float32)
            denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
            delta = delta / denom
        out_ref[0] = (
            base_ref[0].astype(jnp.float32) + delta * wz_ref[0, :]
        ).astype(out_ref.dtype)

    @jax.jit
    def fwd(q, k, v, base, wz):
        b, p, c = q.shape
        kk = k.shape[1]
        if fuse_denom:
            v = jnp.concatenate(
                [v, jnp.ones((b, kk, 1), v.dtype)], axis=-1)
        qspec = pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((1, kk, c), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        vspec = pl.BlockSpec((1, kk, v.shape[-1]), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(b, pl.cdiv(p, block_q)),
            in_specs=[qspec, kspec, vspec, qspec,
                      pl.BlockSpec((1, c), lambda i, j: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=qspec,
            out_shape=jax.ShapeDtypeStruct((b, p, c), base.dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * p * kk * c,
                bytes_accessed=4 * b * (3 * p * c + 2 * kk * c),
                transcendentals=b * p * kk,
            ),
        )(q, k, v, base, wz[None, :])

    return fwd


def bench(fn, args, iters=30):
    out = fn(*args)
    fetch_sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch_sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    enable_compilation_cache()
    print("devices", jax.devices(), flush=True)
    rng = np.random.RandomState(0)
    B, P, K, C = 128, 11620, 1858, 60
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32) * 0.3,
                                jnp.bfloat16)
    q, k, v, base = mk(B, P, C), mk(B, K, C), mk(B, K, C), mk(B, P, C)
    wz = jnp.asarray(rng.randn(C).astype(np.float32))
    flops = 4 * B * P * K * C

    from ct_tpu.ops.ct_attention import ct_attention, ct_attention_reference

    ref = jax.jit(ct_attention_reference)
    t = bench(ref, (q, k, v, base, wz), iters=10)
    print(f"XLA reference: {t*1e3:.2f} ms  ({flops/t/1e12:.1f} TFLOP/s)",
          flush=True)

    prod = jax.jit(functools.partial(ct_attention))
    t = bench(prod, (q, k, v, base, wz))
    print(f"production kernel: {t*1e3:.2f} ms  ({flops/t/1e12:.1f} TF/s)",
          flush=True)

    for exp_dtype in (jnp.float32, jnp.bfloat16):
        for fuse in (False, True):
            for bq in (512, 1024, 2048):
                fn = make_variant(exp_dtype, bq, fuse_denom=fuse)
                t = bench(fn, (q, k, v, base, wz))
                err = float(jnp.max(jnp.abs(
                    fn(q, k, v, base, wz).astype(jnp.float32)
                    - prod(q, k, v, base, wz).astype(jnp.float32))))
                print(f"exp={exp_dtype.__name__:9s} fuse={int(fuse)} "
                      f"bq={bq:5d}: {t*1e3:.2f} ms "
                      f"({flops/t/1e12:.1f} TF/s)  max|Δ|={err:.2e}",
                      flush=True)


if __name__ == "__main__":
    main()
