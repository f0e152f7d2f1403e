#!/usr/bin/env python
"""Whole-stage A/B: conv1 stage (conv1_1 -> relu -> conv1_2 -> pool1 ->
relu) fwd+bwd in the standard layout vs an x-pair lane-packed layout.

The [B,300,300,64] stage tensors pad 64 -> 128 lanes (2x HBM on every
elementwise/pool pass). The packed layout views them as [B,300,150,128]
(x%2 folded into channels, row-major-compatible: c' = (x%2)*64 + c) so
every elementwise/pool pass runs unpadded. The convs stay XLA convs over
*embedded* kernels with structural zeros:

  conv1_1: [3,3,3,64] -> [3,4,3,128], stride (1,2), pad (1,1)/(1,1)
           (even-phase outputs use window taps 0..2, odd-phase 1..3)
  conv1_2: [3,3,64,64] -> [3,3,128,128] over the packed tensor
           (each (phase_out, tap) pair maps to one (col, phase_in) slot;
           2x FLOPs, but full 128-lane MXU tiles vs N=64 underfill)

pool1 in packed layout is pure elementwise (row pairs via a reshape-max,
x pairs via the channel halves) with a first-max (torch row-major) tie
routing custom VJP, and emits the standard [B,150,150,64] layout for
stage 2 -- the unpack is free.

Gradients are taken w.r.t. the CANONICAL [3,3,3,64]/[3,3,64,64] params
(the embedding is differentiated through), so the packed stage is a
drop-in: same param tree, same optimizer state. Run SOLO on the chip.
"""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ct_tpu.utils.timing import fetch_sync
from ct_tpu.utils.cache import enable_compilation_cache

B, S, CIN, C = 64, 300, 3, 64
DN = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                    ("NHWC", "HWIO", "NHWC"))


def conv(x, w, strides=(1, 1), padding=((1, 1), (1, 1))):
    # bf16 in/out; the TPU MXU accumulates in f32 internally either way.
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=DN)


# ---------------------------------------------------------------- embeds
def embed_w1(w1):
    """[3,3,3,64] -> [3,4,3,128]: even phase taps 0..2, odd taps 1..3."""
    wp = jnp.zeros((3, 4, CIN, 2 * C), w1.dtype)
    wp = wp.at[:, 0:3, :, :C].set(w1)
    wp = wp.at[:, 1:4, :, C:].set(w1)
    return wp


def embed_w2(w2):
    """[3,3,64,64] -> [3,3,128,128] over the packed layout.

    Even out x=2j taps {2j-1,2j,2j+1} = (col0,odd),(col1,even),(col1,odd)
    Odd  out x=2j+1 taps {2j,2j+1,2j+2} = (col1,even),(col1,odd),(col2,even)
    """
    wp = jnp.zeros((3, 3, 2 * C, 2 * C), w2.dtype)
    wp = wp.at[:, 0, C:, :C].set(w2[:, 0])     # even out, tap 0
    wp = wp.at[:, 1, :C, :C].set(w2[:, 1])     # even out, tap 1
    wp = wp.at[:, 1, C:, :C].set(w2[:, 2])     # even out, tap 2
    wp = wp.at[:, 1, :C, C:].set(w2[:, 0])     # odd out, tap 0
    wp = wp.at[:, 1, C:, C:].set(w2[:, 1])     # odd out, tap 1
    wp = wp.at[:, 2, :C, C:].set(w2[:, 2])     # odd out, tap 2
    return wp


# ------------------------------------------------- packed pool, first-max
@jax.custom_vjp
def pool_packed(xp):
    """2x2/s2 max pool, packed input [B,H,W/2,2C] -> standard [B,H/2,W/2,C]."""
    b, h, w2, cc = xp.shape
    ymax = jnp.max(xp.reshape(b, h // 2, 2, w2, cc), axis=2)
    return jnp.maximum(ymax[..., :C], ymax[..., C:])


def _pool_packed_fwd(xp):
    y = pool_packed(xp)
    return y, (xp, y)


def _pool_packed_bwd(res, g):
    xp, y = res
    b, h, w2, cc = xp.shape
    ydup = jnp.concatenate([y, y], axis=-1)            # [b,h/2,w2,2C]
    gdup = jnp.concatenate([g, g], axis=-1)
    big = jnp.int32(9)
    xr = xp.reshape(b, h // 2, 2, w2, cc)
    # slot order (row-major torch): (dy=0,x even)=0,(0,odd)=1,(1,even)=2,
    # (1,odd)=3; lanes [:C] are even-x so slot-id per lane-half:
    ids0 = jnp.concatenate([jnp.full((C,), 0, jnp.int32),
                            jnp.full((C,), 1, jnp.int32)])
    ids1 = ids0 + 2
    s0 = jnp.where(xr[:, :, 0] == ydup, ids0, big)
    s1 = jnp.where(xr[:, :, 1] == ydup, ids1, big)
    # winner slot = min id among ties, independently per lane half -> fold
    # the two halves: winner must be global across all 4 slots
    m0 = jnp.minimum(s0[..., :C], s0[..., C:])
    m1 = jnp.minimum(s1[..., :C], s1[..., C:])
    smin = jnp.minimum(m0, m1)                         # [b,h/2,w2,C]
    smind = jnp.concatenate([smin, smin], axis=-1)
    zero = jnp.zeros((), g.dtype)
    d0 = jnp.where(s0 == smind, gdup, zero)
    d1 = jnp.where(s1 == smind, gdup, zero)
    dxp = jnp.stack([d0, d1], axis=2).reshape(b, h, w2, cc)
    return (dxp.astype(xp.dtype),)


pool_packed.defvjp(_pool_packed_fwd, _pool_packed_bwd)


# ---------------------------------------------- key-packed first-max pool
@jax.custom_vjp
def pool_packed_key(xp):
    return _pool_fwd_math(xp)


def _pool_fwd_math(xp):
    b, h, w2, cc = xp.shape
    ymax = jnp.max(xp.reshape(b, h // 2, 2, w2, cc), axis=2)
    return jnp.maximum(ymax[..., :C], ymax[..., C:])


def _pool_packed_key_fwd(xp):
    y = _pool_fwd_math(xp)
    return y, (xp, y)


def _sortable(u):
    """bf16 bit pattern (as int32-extended int16) -> order-preserving key."""
    return jnp.where(u < 0, ~u, u + jnp.int32(32768))


def _pool_packed_key_bwd(res, g):
    xp, _y = res
    b, h, w2, cc = xp.shape
    xr = xp.reshape(b, h // 2, 2, w2, cc)
    u = jax.lax.bitcast_convert_type(xr, jnp.int16).astype(jnp.int32)
    k = _sortable(u)
    # slot ids row-major (dy, dx): lanes [:C] are even-x -> dx=0
    idl = jnp.concatenate([jnp.zeros((C,), jnp.int32),
                           jnp.ones((C,), jnp.int32)])
    key0 = (k[:, :, 0] << 2) | (3 - idl)
    key1 = (k[:, :, 1] << 2) | (1 - idl)
    m = jnp.maximum(key0, key1)
    mm = jnp.maximum(m[..., :C], m[..., C:])
    kmaxd = jnp.concatenate([mm, mm], axis=-1)
    gdup = jnp.concatenate([g, g], axis=-1)
    zero = jnp.zeros((), g.dtype)
    d0 = jnp.where(key0 == kmaxd, gdup, zero)
    d1 = jnp.where(key1 == kmaxd, gdup, zero)
    dxp = jnp.stack([d0, d1], axis=2).reshape(b, h, w2, cc)
    return (dxp.astype(xp.dtype),)


pool_packed_key.defvjp(_pool_packed_key_fwd, _pool_packed_key_bwd)


# ---------------------------------------------- bool-chain first-max pool
@jax.custom_vjp
def pool_packed_bool(xp):
    return _pool_fwd_math(xp)


def _pool_packed_bool_fwd(xp):
    y = _pool_fwd_math(xp)
    return y, (xp, y)


def _pool_packed_bool_bwd(res, g):
    xp, y = res
    b, h, w2, cc = xp.shape
    xr = xp.reshape(b, h // 2, 2, w2, cc)
    ydup = jnp.concatenate([y, y], axis=-1)
    eq0 = xr[:, :, 0] == ydup          # [b,h/2,w2,2C]: slots (0,0),(0,1)
    eq1 = xr[:, :, 1] == ydup          # slots (1,0),(1,1)
    # first-max row-major chain, bool only
    w00 = eq0[..., :C]
    w01 = eq0[..., C:] & ~w00
    p0 = w00 | eq0[..., C:]
    w10 = eq1[..., :C] & ~p0
    w11 = eq1[..., C:] & ~(p0 | w10)
    zero = jnp.zeros((), g.dtype)
    d0 = jnp.where(jnp.concatenate([w00, w01], axis=-1),
                   jnp.concatenate([g, g], axis=-1), zero)
    d1 = jnp.where(jnp.concatenate([w10, w11], axis=-1),
                   jnp.concatenate([g, g], axis=-1), zero)
    dxp = jnp.stack([d0, d1], axis=2).reshape(b, h, w2, cc)
    return (dxp.astype(xp.dtype),)


pool_packed_bool.defvjp(_pool_packed_bool_fwd, _pool_packed_bool_bwd)


# ------------------- rank-4 first-max pool (strided rows, no rank-5 ops)
def _make_pool_v2(assemble):
    @jax.custom_vjp
    def pool(xp):
        r0 = xp[:, 0::2]
        r1 = xp[:, 1::2]
        a = jnp.maximum(r0, r1)
        return jnp.maximum(a[..., :C], a[..., C:])

    def fwd(xp):
        y = pool(xp)
        return y, (xp, y)

    def bwd(res, g):
        xp, y = res
        b, h, w2, cc = xp.shape
        ydup = jnp.concatenate([y, y], axis=-1)
        eq0 = xp[:, 0::2] == ydup
        eq1 = xp[:, 1::2] == ydup
        w00 = eq0[..., :C]
        w01 = eq0[..., C:] & ~w00
        p0 = w00 | eq0[..., C:]
        w10 = eq1[..., :C] & ~p0
        w11 = eq1[..., C:] & ~(p0 | w10)
        gdup = jnp.concatenate([g, g], axis=-1)
        zero = jnp.zeros((), g.dtype)
        d0 = jnp.where(jnp.concatenate([w00, w01], axis=-1), gdup, zero)
        d1 = jnp.where(jnp.concatenate([w10, w11], axis=-1), gdup, zero)
        return (assemble(xp.shape, d0, d1).astype(xp.dtype),)

    pool.defvjp(fwd, bwd)
    return pool


def _asm_set(shape, d0, d1):
    return (jnp.zeros(shape, d0.dtype)
            .at[:, 0::2].set(d0).at[:, 1::2].set(d1))


def _asm_stack(shape, d0, d1):
    b, h, w2, cc = shape
    return jnp.stack([d0, d1], axis=2).reshape(b, h, w2, cc)


pool_packed_v2set = _make_pool_v2(_asm_set)
pool_packed_v2stack = _make_pool_v2(_asm_stack)


# --------------------------- zero-waste 3-conv split of packed conv1_2
def conv_same_split(x, w2):
    """Packed same-channel conv as 3 convs with NO structural zeros.

    A: center column, all 4 (phase_in,phase_out) blocks dense
       [3,1,2C,2C]; B: (col j-1, odd-in)->even-out [3,1,C,C] via left
       shift (negative padding); C: (col j+1, even-in)->odd-out via
       right shift. Same real MACs as the standard conv (the embedded
       [3,3,2C,2C] conv pays 2x).
    """
    wa = jnp.zeros((3, 1, 2 * C, 2 * C), w2.dtype)
    wa = wa.at[:, 0, :C, :C].set(w2[:, 1])
    wa = wa.at[:, 0, C:, :C].set(w2[:, 2])
    wa = wa.at[:, 0, :C, C:].set(w2[:, 0])
    wa = wa.at[:, 0, C:, C:].set(w2[:, 1])
    a = conv(x, wa, padding=((1, 1), (0, 0)))
    bpart = conv(x[..., C:], w2[:, 0:1], padding=((1, 1), (1, -1)))
    cpart = conv(x[..., :C], w2[:, 2:3], padding=((1, 1), (-1, 1)))
    return a + jnp.concatenate([bpart, cpart], axis=-1)


# ---------------------------------------------------------------- stages
def stage_std(params, img):
    x = conv(img, params["w1"]) + params["b1"]
    x = jax.nn.relu(x)
    x = conv(x, params["w2"]) + params["b2"]
    x = nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")
    return jax.nn.relu(x)


def stage_packed(params, img):
    w1p = embed_w1(params["w1"])
    b1p = jnp.concatenate([params["b1"], params["b1"]])
    x = conv(img, w1p, strides=(1, 2)) + b1p          # [B,300,150,128]
    x = jax.nn.relu(x)
    w2p = embed_w2(params["w2"])
    b2p = jnp.concatenate([params["b2"], params["b2"]])
    x = conv(x, w2p) + b2p
    x = pool_packed(x)                                # [B,150,150,64] std
    return jax.nn.relu(x)


def make_loss(stage):
    def loss(params, img):
        y = stage(params, img)
        return jnp.sum(jnp.square(y.astype(jnp.float32)))
    return loss


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
    imgh = rng.randn(B, S, S, CIN).astype(np.float32)
    ph = {
        "w1": 0.1 * rng.randn(3, 3, CIN, C).astype(np.float32),
        "b1": 0.1 * rng.randn(C).astype(np.float32),
        "w2": (0.1 * rng.randn(3, 3, C, C) / 8).astype(np.float32),
        "b2": 0.1 * rng.randn(C).astype(np.float32),
    }

    # numeric check in f32
    img32 = jnp.asarray(imgh)
    p32 = {k: jnp.asarray(v) for k, v in ph.items()}
    ys = jax.jit(stage_std)(p32, img32)
    yp = jax.jit(stage_packed)(p32, img32)
    print(f"fwd |std-packed| max: "
          f"{float(jnp.max(jnp.abs(ys - yp))):.3e}", flush=True)
    gs = jax.jit(jax.grad(make_loss(stage_std)))(p32, img32)
    gp = jax.jit(jax.grad(make_loss(stage_packed)))(p32, img32)
    for k in ("w1", "b1", "w2", "b2"):
        rel = float(jnp.max(jnp.abs(gs[k] - gp[k]))
                    / (jnp.max(jnp.abs(gs[k])) + 1e-30))
        print(f"grad {k}: max rel err {rel:.3e}", flush=True)

    # tie-routing exactness: quantized bf16 input (ties everywhere) — the
    # packed first-max pools must route g exactly like XLA's s&s (torch
    # first-max semantics)
    xt = jnp.asarray(
        np.round(rng.randn(4, 16, 16, C) * 2) / 2, jnp.bfloat16)
    xtp = jnp.asarray(
        np.asarray(xt, np.float32).reshape(4, 16, 8, 2 * C), jnp.bfloat16)
    gref = jax.jit(jax.grad(lambda xx: jnp.sum(jnp.square(nn.max_pool(
        xx, (2, 2), strides=(2, 2), padding="VALID")
        .astype(jnp.float32)))))(xt)
    for pname, pfn in (("boolchain", pool_packed_bool),
                       ("keyfirstmax", pool_packed_key),
                       ("v2set", pool_packed_v2set),
                       ("v2stack", pool_packed_v2stack)):
        gp_ = jax.jit(jax.grad(lambda xx, pf=pfn: jnp.sum(jnp.square(
            pf(xx).astype(jnp.float32)))))(xtp)
        err = float(jnp.max(jnp.abs(
            gref.astype(jnp.float32)
            - gp_.reshape(gref.shape).astype(jnp.float32))))
        print(f"tie-routing {pname}: max |d-dref| = {err:.3e}", flush=True)

    # timing in bf16
    img = jnp.asarray(imgh, jnp.bfloat16)
    p = {k: jnp.asarray(v, jnp.bfloat16) for k, v in ph.items()}
    for name, stage in (("std", stage_std), ("packed", stage_packed)):
        f = jax.jit(jax.value_and_grad(make_loss(stage)))
        t = bench(f, (p, img))
        print(f"{name:7s} stage fwd+bwd: {t*1e3:7.2f} ms", flush=True)

    # conv-only decomposition (fwd only), to see where time moves
    for name, fn in (
        ("conv1_1 std", lambda: jax.jit(
            lambda pp, im: conv(im, pp["w1"]))),
        ("conv1_1 packed", lambda: jax.jit(
            lambda pp, im: conv(im, embed_w1(pp["w1"]), strides=(1, 2)))),
    ):
        f = fn()
        t = bench(f, (p, img))
        print(f"{name:16s} fwd: {t*1e3:7.2f} ms", flush=True)

    x_std = jnp.asarray(rng.randn(B, S, S, C), jnp.bfloat16)
    x_pk = jnp.asarray(np.asarray(x_std, np.float32)
                       .reshape(B, S, S // 2, 2 * C), jnp.bfloat16)
    f = jax.jit(lambda xx, pp: conv(xx, pp["w2"]))
    print(f"conv1_2 std      fwd: {bench(f, (x_std, p))*1e3:7.2f} ms",
          flush=True)
    f = jax.jit(lambda xx, pp: conv(xx, embed_w2(pp["w2"])))
    print(f"conv1_2 packed   fwd: {bench(f, (x_pk, p))*1e3:7.2f} ms",
          flush=True)

    # fwd-only composites
    for name, stage in (("std", stage_std), ("packed", stage_packed)):
        f = jax.jit(lambda pp, im, s=stage: jnp.sum(
            jnp.square(s(pp, im).astype(jnp.float32))))
        print(f"{name:7s} stage fwd only: {bench(f, (p, img))*1e3:7.2f} ms",
              flush=True)

    # conv1_2 fwd+dgrad+wgrad via vjp (x and w both differentiated)
    def c2_std(xx, ww):
        return jnp.sum(conv(xx, ww).astype(jnp.float32))

    def c2_pk(xx, ww):
        return jnp.sum(conv(xx, embed_w2(ww)).astype(jnp.float32))

    f = jax.jit(jax.grad(c2_std, argnums=(0, 1)))
    print(f"conv1_2 std    dgrad+wgrad: {bench(f, (x_std, p['w2']))*1e3:7.2f}"
          " ms", flush=True)
    f = jax.jit(jax.grad(c2_pk, argnums=(0, 1)))
    print(f"conv1_2 packed dgrad+wgrad: {bench(f, (x_pk, p['w2']))*1e3:7.2f}"
          " ms", flush=True)

    # conv1_1 wgrad only (first layer: no dgrad in production)
    f = jax.jit(jax.grad(lambda ww, im: jnp.sum(
        conv(im, ww).astype(jnp.float32))))
    print(f"conv1_1 std    wgrad(+fwd dce): {bench(f, (p['w1'], img))*1e3:7.2f}"
          " ms", flush=True)
    f = jax.jit(jax.grad(lambda ww, im: jnp.sum(
        conv(im, embed_w1(ww), strides=(1, 2)).astype(jnp.float32))))
    print(f"conv1_1 packed wgrad(+fwd dce): {bench(f, (p['w1'], img))*1e3:7.2f}"
          " ms", flush=True)

    # pool variants fwd+bwd standalone
    xp_big = jnp.asarray(rng.randn(B, S, S // 2, 2 * C), jnp.bfloat16)
    xs_big = jnp.asarray(
        np.asarray(xp_big, np.float32).reshape(B, S, S, C), jnp.bfloat16)
    f = jax.jit(jax.grad(lambda xx: jnp.sum(jnp.square(nn.max_pool(
        xx, (2, 2), strides=(2, 2), padding="VALID")
        .astype(jnp.float32)))))
    print(f"pool std s&s fwd+bwd:        {bench(f, (xs_big,))*1e3:7.2f} ms",
          flush=True)
    f = jax.jit(jax.grad(lambda xx: jnp.sum(jnp.square(
        pool_packed(xx).astype(jnp.float32)))))
    print(f"pool packed first-max f+b:   {bench(f, (xp_big,))*1e3:7.2f} ms",
          flush=True)

    def pool_naive(xp):
        b, h, w2, cc = xp.shape
        ymax = jnp.max(xp.reshape(b, h // 2, 2, w2, cc), axis=2)
        return jnp.maximum(ymax[..., :C], ymax[..., C:])

    f = jax.jit(jax.grad(lambda xx: jnp.sum(jnp.square(
        pool_naive(xx).astype(jnp.float32)))))
    print(f"pool packed even-split f+b:  {bench(f, (xp_big,))*1e3:7.2f} ms",
          flush=True)

    f = jax.jit(jax.grad(lambda xx: jnp.sum(jnp.square(
        pool_packed_key(xx).astype(jnp.float32)))))
    print(f"pool packed key-firstmax f+b:{bench(f, (xp_big,))*1e3:7.2f} ms",
          flush=True)

    # composite variants: which pool formulation wins inside the program
    variants = (
        ("packed+boolchain", pool_packed_bool, False),
        ("packed3+boolchain", pool_packed_bool, True),
        ("packed+subsample", lambda xp: xp[:, ::2, :, :C], False),
        ("packed3+subsample", lambda xp: xp[:, ::2, :, :C], True),
        ("std+subsample", None, False),
    )
    for name, pool, split3 in variants:
        if pool is None:
            def stage(pp, im):
                x = conv(im, pp["w1"]) + pp["b1"]
                x = jax.nn.relu(x)
                x = conv(x, pp["w2"]) + pp["b2"]
                return jax.nn.relu(x[:, ::2, ::2, :])
        else:
            def stage(pp, im, pool=pool, split3=split3):
                w1p = embed_w1(pp["w1"])
                x = conv(im, w1p, strides=(1, 2)) \
                    + jnp.concatenate([pp["b1"], pp["b1"]])
                x = jax.nn.relu(x)
                if split3:
                    x = conv_same_split(x, pp["w2"]) \
                        + jnp.concatenate([pp["b2"], pp["b2"]])
                else:
                    x = conv(x, embed_w2(pp["w2"])) \
                        + jnp.concatenate([pp["b2"], pp["b2"]])
                return jax.nn.relu(pool(x))
        f = jax.jit(jax.value_and_grad(make_loss(stage)))
        print(f"{name:20s} stage f+b: {bench(f, (p, img))*1e3:7.2f} ms",
              flush=True)

    # numeric check of the 3-conv split (f32)
    xs32 = jnp.asarray(rng.randn(2, 16, 8, 2 * C), jnp.float32)
    w232 = jnp.asarray(0.1 * rng.randn(3, 3, C, C), jnp.float32)
    ya = conv_same_split(xs32, w232)
    yb = conv(xs32, embed_w2(w232))
    print(f"3-conv split |err|: {float(jnp.max(jnp.abs(ya - yb))):.3e}",
          flush=True)


if __name__ == "__main__":
    main()
