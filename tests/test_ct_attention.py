"""Fused CT attention kernel vs the XLA reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from ct_tpu.ops.ct_attention import ct_attention, ct_attention_reference


def make_inputs(rng, b=2, p=640, k=96, c=60):
    q = rng.randn(b, p, c).astype(np.float32)
    kk = rng.randn(b, k, c).astype(np.float32)
    v = rng.randn(b, k, c).astype(np.float32)
    base = rng.randn(b, p, c).astype(np.float32)
    wz = rng.randn(c).astype(np.float32) * 0.1
    return tuple(map(jnp.asarray, (q, kk, v, base, wz)))


def test_kernel_matches_reference():
    rng = np.random.RandomState(0)
    q, k, v, base, wz = make_inputs(rng)
    ref = ct_attention_reference(q, k, v, base, wz)
    out = ct_attention(q, k, v, base, wz, 256, True)  # interpret on CPU
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_kernel_partial_final_block():
    """P not divisible by block_q: the last block's padding must not leak."""
    rng = np.random.RandomState(1)
    q, k, v, base, wz = make_inputs(rng, p=500)  # 500 = 256 + 244
    ref = ct_attention_reference(q, k, v, base, wz)
    out = ct_attention(q, k, v, base, wz, 256, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_matches_reference_grads():
    rng = np.random.RandomState(2)
    q, k, v, base, wz = make_inputs(rng, b=1, p=256, k=64)

    def loss_kernel(q, k, v, base, wz):
        return jnp.sum(ct_attention(q, k, v, base, wz, 128, True) ** 2)

    def loss_ref(q, k, v, base, wz):
        return jnp.sum(ct_attention_reference(q, k, v, base, wz) ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(q, k, v, base, wz)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, base, wz)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_backward_partial_block_masking():
    """P not divisible by block_q: padded rows must not pollute dk/dv/dwz."""
    rng = np.random.RandomState(3)
    q, k, v, base, wz = make_inputs(rng, b=2, p=300, k=64)  # 300 = 128+128+44

    def loss_kernel(q, k, v, base, wz):
        return jnp.sum(ct_attention(q, k, v, base, wz, 128, True) ** 2)

    def loss_ref(q, k, v, base, wz):
        return jnp.sum(ct_attention_reference(q, k, v, base, wz) ** 2)

    g1 = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(q, k, v, base, wz)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, base, wz)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_serving_kernel_matches_unfused_chain():
    """ct_attention_serving (θ-proj → attention → residual → normalize →
    cosine classifier in one kernel) vs the unfused op chain."""
    from ct_tpu.ops.ct_attention import ct_attention_serving

    rng = np.random.RandomState(4)
    b, p, kk, c, n = 2, 500, 96, 60, 20
    conf = jnp.asarray(rng.randn(b, p, c).astype(np.float32))
    k = jnp.asarray(rng.randn(b, kk, c).astype(np.float32))
    v = jnp.asarray(rng.randn(b, kk, c).astype(np.float32))
    wt = jnp.asarray(rng.randn(c, c).astype(np.float32) * 0.1)
    bt = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    wz = jnp.asarray(rng.randn(c).astype(np.float32) * 0.1)
    obj = jnp.asarray(rng.randn(n, c).astype(np.float32) * 0.2)

    q = conf @ wt + bt + conf
    novel = ct_attention_reference(q, k, v, conf, wz)
    novel = novel / jnp.linalg.norm(novel, axis=-1, keepdims=True)
    ref = jnp.einsum("bpc,nc->bpn", novel, obj) * 5.0

    conf_cm = jnp.moveaxis(conf, -1, 1)           # class-major input
    out_cm = ct_attention_serving(conf_cm, k, v, wt, bt, wz, obj,
                                  block_q=256, interpret=True)
    out = jnp.moveaxis(out_cm, 1, -1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_cm_kernel_and_vjp_match_reference():
    """Class-major fused attention (training path): forward and grads vs
    the row-major XLA reference, including a partial final block."""
    from ct_tpu.ops.ct_attention import (
        ct_attention_cm, ct_attention_reference,
    )

    rng = np.random.RandomState(5)
    q, k, v, base, wz = make_inputs(rng, b=2, p=300, k=64)  # 300 = 2*128+44
    q_cm = jnp.moveaxis(q, -1, 1)
    base_cm = jnp.moveaxis(base, -1, 1)

    out_cm = ct_attention_cm(q_cm, k, v, base_cm, wz, 128, True)
    ref = ct_attention_reference(q, k, v, base, wz)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(out_cm, 1, -1)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)

    def loss_cm(q, k, v, base, wz):
        return jnp.sum(ct_attention_cm(
            jnp.moveaxis(q, -1, 1), k, v, jnp.moveaxis(base, -1, 1),
            wz, 128, True) ** 2)

    def loss_ref(q, k, v, base, wz):
        return jnp.sum(ct_attention_reference(q, k, v, base, wz) ** 2)

    g1 = jax.grad(loss_cm, argnums=(0, 1, 2, 3, 4))(q, k, v, base, wz)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, base, wz)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_reference_cm_matches_reference():
    from ct_tpu.ops.ct_attention import (
        ct_attention_reference, ct_attention_reference_cm,
    )

    rng = np.random.RandomState(6)
    q, k, v, base, wz = make_inputs(rng)
    ref = ct_attention_reference(q, k, v, base, wz)
    cm = ct_attention_reference_cm(
        jnp.moveaxis(q, -1, 1), k, v, jnp.moveaxis(base, -1, 1), wz)
    np.testing.assert_allclose(np.asarray(jnp.moveaxis(cm, 1, -1)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_flash_cm_vjp_matches_reference():
    """Flash-path (saved m/z/delta, K-chunked single-pass backward,
    VERDICT r4 #2): forward and grads vs the XLA reference, with a
    partial final q block AND a K that is not a block_k multiple (the
    wrapper zero-pads K and the kernel masks the padded columns)."""
    from ct_tpu.ops import ct_attention as cta

    rng = np.random.RandomState(7)
    q, k, v, base, wz = make_inputs(rng, b=2, p=300, k=70)
    q_cm = jnp.moveaxis(q, -1, 1)
    base_cm = jnp.moveaxis(base, -1, 1)

    old = cta._USE_FLASH
    cta._USE_FLASH = True
    try:
        out_cm, delta, m, z = cta.ct_attention_cm_stats(
            q_cm, k, v, base_cm, wz, 128, True)
        ref = cta.ct_attention_reference(q, k, v, base, wz)
        np.testing.assert_allclose(
            np.asarray(jnp.moveaxis(out_cm, 1, -1)), np.asarray(ref),
            rtol=1e-5, atol=1e-5)
        # the saved stats really are the softmax row stats
        s = jnp.einsum("bpc,bkc->bpk", q, k)
        np.testing.assert_allclose(
            np.asarray(m[:, 0, :]), np.asarray(jnp.max(s, axis=-1)),
            rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(z[:, 0, :]),
            np.asarray(jnp.sum(jnp.exp(s - jnp.max(s, -1, keepdims=True)),
                               axis=-1)),
            rtol=1e-4, atol=1e-4)

        def loss_cm(q, k, v, base, wz):
            return jnp.sum(cta.ct_attention_cm(
                jnp.moveaxis(q, -1, 1), k, v, jnp.moveaxis(base, -1, 1),
                wz, 128, True) ** 2)

        def loss_ref(q, k, v, base, wz):
            return jnp.sum(cta.ct_attention_reference(q, k, v, base, wz) ** 2)

        g1 = jax.grad(loss_cm, argnums=(0, 1, 2, 3, 4))(q, k, v, base, wz)
        g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(q, k, v, base, wz)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-4)
    finally:
        cta._USE_FLASH = old


def test_flash_bwd_call_multi_chunk():
    """K spanning several chunks: force a small block_k through the raw
    flash backward call and compare against the unchunked CM backward."""
    from ct_tpu.ops import ct_attention as cta

    rng = np.random.RandomState(8)
    # k=1500 → block_k=640, kpad=1920: three chunks with a padded tail
    q, k, v, base, wz = make_inputs(rng, b=2, p=130, k=1500)
    q_cm = jnp.moveaxis(q, -1, 1)
    base_cm = jnp.moveaxis(base, -1, 1)
    g = jnp.asarray(rng.randn(*base.shape).astype(np.float32))
    g_cm = jnp.moveaxis(g, -1, 1)

    _, delta, m, z = cta.ct_attention_cm_stats(
        q_cm, k, v, base_cm, wz, 128, True)
    k_cm = jnp.moveaxis(k, -1, 1)
    v_cm = jnp.moveaxis(v, -1, 1)
    dq1, dk1, dv1, dwz1 = cta._bwd_call_cm_flash(
        q_cm, k_cm, v_cm, wz, g_cm, delta, m, z, 128, True)
    dq2, dk2, dv2, dwz2 = cta._bwd_call_cm(
        q_cm, k_cm, v_cm, wz, g_cm, 128, True)
    for a, b in ((dq1, dq2), (dk1, dk2), (dv1, dv2), (dwz1, dwz2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
