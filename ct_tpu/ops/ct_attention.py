"""Fused Context-Transformer attention: Pallas TPU kernel + XLA reference.

The Context-Transformer head computes, per image,

    out = base + softmax(q @ kᵀ) @ v · wz          (then cosine classifier)

with q = θ(conf)+conf over ALL P anchors (11,620 @300) and k/v over the K
max-pooled context anchors (1,858 @300), channel dim C = 60 source classes
(reference: /root/reference/models/RFB_Net_vgg.py:259-265, which
materializes the [B, P, K] affinity tensor — ~86 MB/image in fp32).

The Pallas kernel streams query blocks through VMEM while keys/values stay
resident (K·C ≈ 0.45 MB), fusing QKᵀ → softmax → ·V → ·wz + base into one
pass so the affinity matrix never touches HBM. K is small and fully
resident, so a plain row softmax suffices (no online/flash rescaling).

Training uses ``jax.custom_vjp`` with the XLA reference implementation as
the recompute backward — forward-path speed is what the serving benchmark
needs; the backward stays numerically identical to the reference math.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def ct_attention_reference(
    q: jnp.ndarray,     # [B, P, C]
    k: jnp.ndarray,     # [B, K, C]
    v: jnp.ndarray,     # [B, K, C]
    base: jnp.ndarray,  # [B, P, C]
    wz: jnp.ndarray,    # [C]
) -> jnp.ndarray:
    """Plain-XLA reference (also the recompute backward path)."""
    s = jnp.einsum("bpc,bkc->bpk", q, k, preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(s, axis=-1)
    delta = jnp.einsum(
        "bpk,bkc->bpc", attn, v, preferred_element_type=jnp.float32
    )
    return base + delta * wz


def ct_attention_reference_cm(
    q_cm: jnp.ndarray,    # [B, C, P]
    k: jnp.ndarray,       # [B, K, C]
    v: jnp.ndarray,       # [B, K, C]
    base_cm: jnp.ndarray, # [B, C, P]
    wz: jnp.ndarray,      # [C]
) -> jnp.ndarray:
    """Class-major XLA reference: same math as `ct_attention_reference`
    with anchors on the minor (128-lane) axis, so none of the [*, C=60]
    intermediates pad 60 → 128 lanes in HBM."""
    s = jnp.einsum("bkc,bcp->bkp", k, q_cm,
                   preferred_element_type=jnp.float32)
    attn = jax.nn.softmax(s, axis=1)
    delta = jnp.einsum("bkp,bkc->bcp", attn, v,
                       preferred_element_type=jnp.float32)
    return base_cm + delta * wz[None, :, None]


def _kernel(q_ref, k_ref, v_ref, base_ref, wz_ref, out_ref):
    # blocks: q/base/out [1, bq, C]; k [1, K, C]; v [1, K, C+1] (v with a
    # ones column appended by the wrapper); wz [1, C].
    # matmul operands stay in their input dtype (bf16 on TPU → native MXU
    # rate) with f32 accumulation; softmax statistics are f32.
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [bq, K] f32
    s_max = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - s_max)
    # one MXU op yields the unnormalized delta AND the softmax denominator:
    # v carries an appended ones column, so dd = e @ [v|1] is
    # [Σe·v | Σe] — no [bq, K] VPU row-sum, and C+1 stays inside the same
    # 128-lane tile the C-wide matmul already occupies. e drops to bf16
    # only at the MXU input; the row sum therefore accumulates in f32 via
    # preferred_element_type exactly like the explicit jnp.sum did.
    dd = jnp.dot(e.astype(v.dtype), v,
                 preferred_element_type=jnp.float32)        # [bq, C+1]
    delta = dd[:, :-1] / dd[:, -1:]
    out_ref[0] = (
        base_ref[0].astype(jnp.float32) + delta * wz_ref[0, :]
    ).astype(out_ref.dtype)


def _fit_block_q(block_q: int, kk: int) -> int:
    """Shrink the query block so the f32 [bq, K] affinity (+exp) buffers fit
    the ~16 MB VMEM scoped limit. K=1858 (@300) keeps bq=1024.

    Large K needs a bigger per-element budget: at K=4964 (@512 res) the
    8 B/elem model picked bq=256, but Mosaic's measured scoped peak for
    the class-major forward was 19.8 MB (extra retiling/exp temporaries
    that only materialize at large K), an on-hardware OOM at compile.
    16 B/elem reproduces both measured points — bq=1024 @K=1858 compiles
    and runs (unchanged here), bq=256 @K=4964 does not (→ bq=128)."""
    bytes_per = 8 if kk <= 2048 else 16
    while block_q > 128 and block_q * kk * bytes_per > 15_500_000:
        block_q //= 2
    return block_q


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ct_attention(q, k, v, base, wz, block_q: int = 1024,
                 interpret: bool = False):
    """Fused attention; differentiable (backward recomputes via XLA)."""
    b, p, c = q.shape
    kk = k.shape[1]
    block_q = _fit_block_q(block_q, kk)
    v_aug = jnp.concatenate(
        [v, jnp.ones((b, kk, 1), v.dtype)], axis=-1)
    qspec = pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, kk, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, kk, c + 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=(b, pl.cdiv(p, block_q)),
        in_specs=[
            qspec, kspec, vspec, qspec,
            pl.BlockSpec((1, c), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, p, c), base.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * p * kk * c,
            bytes_accessed=4 * b * (3 * p * c + 2 * kk * c),
            transcendentals=b * p * kk,
        ),
        interpret=interpret,
    )(q, k, v_aug, base, wz[None, :])


def _kernel_cm(q_ref, k_ref, v_ref, base_ref, wz_ref, out_ref):
    # class-major blocks: q/base/out [1, C, bq]; k [1, C, K];
    # v [1, C+1, K] (ones row appended by the wrapper); wz [C, 1].
    # Same math as `_kernel`, but the dd matmul's output puts the big bq
    # axis on lanes ([C+1, bq] vs row-major [bq, C+1] at 61/128 fill) and
    # the q/base/out HBM blocks carry no 60→128 lane padding.
    q = q_ref[0]                                            # [C, bq]
    k = k_ref[0]                                            # [C, K]
    v = v_ref[0]                                            # [C+1, K]
    s = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [K, bq]
    s_max = jnp.max(s, axis=0, keepdims=True)
    e = jnp.exp(s - s_max)
    dd = jax.lax.dot_general(
        v, e.astype(v.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [C+1, bq]
    delta = dd[:-1, :] / dd[-1:, :]
    out_ref[0] = (
        base_ref[0].astype(jnp.float32) + delta * wz_ref[...]
    ).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def ct_attention_cm(q_cm, k, v, base_cm, wz, block_q: int = 1024,
                    interpret: bool = False):
    """Class-major fused attention (training path): q/base/out [B, C, P],
    k/v [B, K, C]; differentiable via the class-major Pallas backward."""
    b, c, p = q_cm.shape
    kk = k.shape[1]
    block_q = _fit_block_q(block_q, kk)
    v_aug = jnp.concatenate(
        [v, jnp.ones((b, kk, 1), v.dtype)], axis=-1)
    k_cmi = jnp.moveaxis(k, -1, 1)          # [B, C, K]   (tiny)
    v_cmi = jnp.moveaxis(v_aug, -1, 1)      # [B, C+1, K]
    qspec = pl.BlockSpec((1, c, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel_cm,
        grid=(b, pl.cdiv(p, block_q)),
        in_specs=[
            qspec,
            pl.BlockSpec((1, c, kk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c + 1, kk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            qspec,
            pl.BlockSpec((c, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, c, p), base_cm.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * p * kk * c,
            bytes_accessed=4 * b * (3 * p * c + 2 * kk * c),
            transcendentals=b * p * kk,
        ),
        interpret=interpret,
    )(q_cm, k_cmi, v_cmi, base_cm, wz[:, None])


def _kernel_cm_stats(q_ref, k_ref, v_ref, base_ref, wz_ref,
                     out_ref, delta_ref, m_ref, z_ref):
    """Class-major forward emitting flash-style residuals: the attention
    delta (pre-``wz``), the per-anchor softmax row max ``m`` and
    denominator ``z``. Math (and therefore ``out``) is bit-identical to
    `_kernel_cm`; the extra outputs let the backward skip the delta
    recompute matmul and the max/denominator passes entirely
    (`_bwd_kernel_cm_flash`)."""
    q = q_ref[0]                                            # [C, bq]
    k = k_ref[0]                                            # [C, K]
    v = v_ref[0]                                            # [C+1, K]
    s = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [K, bq]
    s_max = jnp.max(s, axis=0, keepdims=True)
    e = jnp.exp(s - s_max)
    dd = jax.lax.dot_general(
        v, e.astype(v.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [C+1, bq]
    delta = dd[:-1, :] / dd[-1:, :]
    out_ref[0] = (
        base_ref[0].astype(jnp.float32) + delta * wz_ref[...]
    ).astype(out_ref.dtype)
    delta_ref[0] = delta.astype(delta_ref.dtype)
    m_ref[0] = s_max
    z_ref[0] = dd[-1:, :]


def ct_attention_cm_stats(q_cm, k, v, base_cm, wz, block_q: int = 1024,
                          interpret: bool = False):
    """Class-major fused attention returning ``(out, delta, m, z)`` —
    the training-forward used by the flash backward's custom_vjp rule."""
    b, c, p = q_cm.shape
    kk = k.shape[1]
    block_q = _fit_block_q(block_q, kk)
    v_aug = jnp.concatenate(
        [v, jnp.ones((b, kk, 1), v.dtype)], axis=-1)
    k_cmi = jnp.moveaxis(k, -1, 1)          # [B, C, K]   (tiny)
    v_cmi = jnp.moveaxis(v_aug, -1, 1)      # [B, C+1, K]
    qspec = pl.BlockSpec((1, c, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel_cm_stats,
        grid=(b, pl.cdiv(p, block_q)),
        in_specs=[
            qspec,
            pl.BlockSpec((1, c, kk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c + 1, kk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            qspec,
            pl.BlockSpec((c, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[qspec, qspec, sspec, sspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, p), base_cm.dtype),
            jax.ShapeDtypeStruct((b, c, p), base_cm.dtype),
            jax.ShapeDtypeStruct((b, 1, p), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, p), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * p * kk * c,
            bytes_accessed=4 * b * (4 * p * c + 2 * kk * c),
            transcendentals=b * p * kk,
        ),
        interpret=interpret,
    )(q_cm, k_cmi, v_cmi, base_cm, wz[:, None])


def _bwd_kernel(q_ref, k_ref, v_ref, wz_ref, g_ref,
                dq_ref, dk_ref, dv_ref, dwz_ref, *, p_total: int):
    """Blockwise backward: recompute S/attn per q block, accumulate dk/dv/dwz
    across q blocks (sequential TPU grid revisits the same output block).

    For out = base + (softmax(q kᵀ) v) · wz:
      dv  = attnᵀ (g·wz)
      dS  = attn ⊙ (dA − rowsum(attn ⊙ dA)),  dA = (g·wz) vᵀ
      dq  = dS k,  dk = dSᵀ q,  dwz = Σ_p g ⊙ (attn v)
    """
    j = pl.program_id(1)
    # matmul OPERANDS stay in the input dtype (bf16 on TPU — f32 operands
    # ran the five backward matmuls at 1/4 MXU rate, profiled 16.3 ms vs
    # ~9 in bf16 at batch 64); accumulation and softmax statistics are f32
    # via preferred_element_type
    mm_t = q_ref.dtype
    q = q_ref[0]                             # [bq, C]
    k = k_ref[0]                             # [K, C]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)         # [bq, C]
    wz = wz_ref[0, :].astype(jnp.float32)    # [C]
    bq = q.shape[0]

    # rows past the true P (padded final block) must not contribute; note
    # out-of-bounds block reads are undefined (NaN in interpret mode) and
    # 0·NaN = NaN, so every operand feeding an accumulated product must be
    # masked — not just the attention rows
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (bq, 1), 0)
    live = (j * bq + row_ids) < p_total      # [bq, 1]
    q = jnp.where(live, q, jnp.zeros((), q.dtype))
    g = jnp.where(live, g, 0.0)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                        # [bq, K]
    s_max = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - s_max)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)
    attn = jnp.where(live, attn, 0.0)        # kill padded rows (may be nan)
    # only the mm_t copy of attn stays live past this point — the f32
    # [bq, K] intermediates (s/e/attn) are transient, which is what lets
    # the backward run at block_q 512 instead of 256 (grid-step overhead
    # halves) inside the ~16 MB VMEM budget
    attn_m = attn.astype(mm_t)
    gv = jnp.where(live, g * wz, 0.0)        # [bq, C] f32
    gv_m = gv.astype(mm_t)

    dv_blk = jax.lax.dot_general(            # attnᵀ @ gv → [K, C]
        attn_m, gv_m, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dattn = jax.lax.dot_general(             # gv @ vᵀ → [bq, K]
        gv_m, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    af = attn_m.astype(jnp.float32)
    rowsum = jnp.sum(af * dattn, axis=-1, keepdims=True)
    ds_m = (af * (dattn - rowsum)).astype(mm_t)   # [bq, K]
    dq = jnp.dot(ds_m, k, preferred_element_type=jnp.float32)    # [bq, C]
    dk_blk = jax.lax.dot_general(            # dsᵀ @ q → [K, C]
        ds_m, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = jnp.dot(attn_m, v, preferred_element_type=jnp.float32)
    dwz_blk = jnp.sum(g * delta, axis=0, keepdims=True)          # [1, C]

    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dk_ref[0] = dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_blk.astype(dv_ref.dtype)
        dwz_ref[0] = dwz_blk.astype(dwz_ref.dtype)

    @pl.when(j > 0)
    def _accum():
        dk_ref[0] = dk_ref[0] + dk_blk.astype(dk_ref.dtype)
        dv_ref[0] = dv_ref[0] + dv_blk.astype(dv_ref.dtype)
        dwz_ref[0] = dwz_ref[0] + dwz_blk.astype(dwz_ref.dtype)


def _bwd_kernel_cm(q_ref, k_ref, v_ref, wz_ref, g_ref,
                   dq_ref, dk_ref, dv_ref, dwz_ref,
                   dk_acc, dv_acc, dwz_acc, *, p_total: int):
    """Class-major blockwise backward (anchors on the 128-lane axis).

    Same math as `_bwd_kernel`, but every tensor is transposed so the
    C=60 class dim sits on 8-granular sublanes instead of the 128-lane
    axis. Row-major left 4 of the 6 backward matmuls (dv/dq/dk/delta)
    writing 60-of-128-lane outputs — ~53% of the MXU idle, profiled
    16.7 ms at batch 64. Class-major, only the two C-contractions
    (s, dattn) keep the unavoidable 60-deep underfill; everything else
    runs at full tile occupancy.

    Blocks: q/g/dq [1, C, bq]; k/v/dk/dv [1, C, K]; wz [C, 1];
    dwz [1, C, 1]. dk/dv/dwz accumulate across q blocks in VMEM
    *scratch* (dk_acc/dv_acc/dwz_acc) and are written to the outputs
    only at the final q block: accumulating directly through the output
    refs re-flushed each revisited block to HBM every grid step —
    ~0.9 MB × 2 × (P/bq) per image, ≈2.6 GB/step at batch 64.
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    mm_t = q_ref.dtype
    q = q_ref[0]                             # [C, bq]
    k = k_ref[0]                             # [C, K]
    v = v_ref[0]
    g = g_ref[0].astype(jnp.float32)         # [C, bq]
    wz = wz_ref[...].astype(jnp.float32)     # [C, 1]
    bq = q.shape[1]

    # columns past the true P (padded final block) must not contribute —
    # mask every operand feeding an accumulated product (OOB reads are
    # undefined and 0·NaN = NaN)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, bq), 1)
    live = (j * bq + col_ids) < p_total      # [1, bq]
    q = jnp.where(live, q, jnp.zeros((), q.dtype))
    g = jnp.where(live, g, 0.0)

    s = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )                                        # [K, bq]
    s_max = jnp.max(s, axis=0, keepdims=True)
    e = jnp.exp(s - s_max)
    inv = 1.0 / jnp.sum(e, axis=0, keepdims=True)    # [1, bq]
    # no f32 [K, bq] attn buffer: normalize+mask straight into the bf16
    # matmul operand (the f32 copy only ever fed this cast)
    attn_m = jnp.where(live, e * inv, 0.0).astype(mm_t)
    gv = jnp.where(live, g * wz, 0.0)        # [C, bq] f32
    gv_m = gv.astype(mm_t)

    dv_blk = jax.lax.dot_general(            # gv @ attnᵀ → [C, K]
        gv_m, attn_m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dattn = jax.lax.dot_general(             # vᵀ @ gv → [K, bq]
        v, gv_m, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    af = attn_m.astype(jnp.float32)
    colsum = jnp.sum(af * dattn, axis=0, keepdims=True)          # [1, bq]
    ds_m = (af * (dattn - colsum)).astype(mm_t)                  # [K, bq]
    dq = jax.lax.dot_general(                # k @ ds → [C, bq]
        k, ds_m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_blk = jax.lax.dot_general(            # q @ dsᵀ → [C, K]
        q, ds_m, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = jax.lax.dot_general(             # v @ attn → [C, bq]
        v, attn_m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwz_blk = jnp.sum(g * delta, axis=1, keepdims=True)          # [C, 1]

    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(j == 0)
    def _init():
        dk_acc[...] = dk_blk
        dv_acc[...] = dv_blk
        dwz_acc[...] = dwz_blk

    @pl.when(j > 0)
    def _accum():
        dk_acc[...] = dk_acc[...] + dk_blk
        dv_acc[...] = dv_acc[...] + dv_blk
        dwz_acc[...] = dwz_acc[...] + dwz_blk

    @pl.when(j == nj - 1)
    def _flush():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)
        dwz_ref[0] = dwz_acc[...].astype(dwz_ref.dtype)


def _fit_block_q_bwd(block_q: int, kk: int) -> int:
    """Backward VMEM budget: ≈10 bytes/element of [bq, K] live at peak
    (one f32 intermediate + bf16 attn/ds + f32 dattn with the f32
    s/e freed early) → K=1858 admits bq=512. Large K pays the same
    Mosaic-temporary surcharge measured on the forward (see
    ``_fit_block_q``): double the budget beyond K=2048 → K=4964 (@512
    res) drops to bq=128 instead of the 256 the 10 B model would pick."""
    bytes_per = 10 if kk <= 2048 else 20
    while block_q > 128 and block_q * kk * bytes_per > 15_500_000:
        block_q //= 2
    return block_q


def _bwd_call_cm(q_cm, k_cm, v_cm, wz, g_cm, block_q: int = 512,
                 interpret: bool = False):
    """Class-major backward core: all operands [B, C, *] →
    (dq_cm, dk_cm, dv_cm, dwz). dq comes back in the input dtype (no
    accumulation); dk/dv/dwz accumulate across q blocks in f32."""
    b, c, p = q_cm.shape
    kk = k_cm.shape[2]
    block_q = _fit_block_q_bwd(block_q, kk)
    qspec = pl.BlockSpec((1, c, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, c, kk), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    dq, dk, dv, dwz = pl.pallas_call(
        functools.partial(_bwd_kernel_cm, p_total=p),
        grid=(b, pl.cdiv(p, block_q)),
        in_specs=[
            qspec, kvspec, kvspec,
            pl.BlockSpec((c, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            qspec,
        ],
        out_specs=[
            qspec, kvspec, kvspec,
            pl.BlockSpec((1, c, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, p), q_cm.dtype),
            jax.ShapeDtypeStruct((b, c, kk), jnp.float32),
            jax.ShapeDtypeStruct((b, c, kk), jnp.float32),
            jax.ShapeDtypeStruct((b, c, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, kk), jnp.float32),
            pltpu.VMEM((c, kk), jnp.float32),
            pltpu.VMEM((c, 1), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * p * kk * c,
            bytes_accessed=4 * b * (4 * p * c + 4 * kk * c),
            transcendentals=b * p * kk,
        ),
        interpret=interpret,
    )(q_cm, k_cm, v_cm, wz[:, None], g_cm)
    return dq, dk, dv, jnp.sum(dwz[:, :, 0], axis=0)


def _bwd_kernel_cm_flash(q_ref, k_ref, v_ref, wz_ref, g_ref, m_ref, z_ref,
                         cs_ref, dq_ref, dk_ref, dv_ref,
                         dk_acc, dv_acc, *, p_total: int, kk_total: int,
                         block_k: int):
    """Flash-style class-major backward (VERDICT r4 #2, CT-bwd item).

    Differences vs `_bwd_kernel_cm` that buy block_q 1024 inside the
    VMEM budget and drop one of the six matmuls:

      * the forward saved the softmax row max ``m`` and denominator
        ``z`` (`ct_attention_cm_stats`) — no max/denominator pass here;
      * ``colsum`` (= Σ_k attn·dattn, the softmax-Jacobian row term) is
        precomputed OUTSIDE the kernel from the saved delta via the
        flash-attention identity Σ_k attn_pk·(gv_p·v_k) = gv_p·delta_p —
        an elementwise reduction instead of needing dattn first;
      * dwz (= Σ g·delta) also comes from the saved delta, so the
        ``delta = attn·v`` recompute matmul disappears;
      * K is processed in ``block_k`` chunks (single pass — no exp is
        computed twice), so the live [block_k, bq] f32 intermediates fit
        VMEM at bq=1024 where the unchunked kernel capped at 512.

    Blocks: q/g/dq [1, C, bq]; k/v [1, C, Kpad] (zero-padded to a
    block_k multiple by the wrapper); m/z/colsum [1, 1, bq];
    dk/dv [1, C, Kpad] flushed from VMEM scratch at the last q block.
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    mm_t = q_ref.dtype
    q = q_ref[0]                             # [C, bq]
    g = g_ref[0].astype(jnp.float32)         # [C, bq]
    wz = wz_ref[...].astype(jnp.float32)     # [C, 1]
    bq = q.shape[1]

    # columns past the true P must not contribute; additionally the m/z/
    # colsum reads on the padded final block are undefined (possibly NaN)
    # and NaN·0 = NaN, so attn/ds are masked AFTER the exp
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, bq), 1)
    live = (j * bq + col_ids) < p_total      # [1, bq]
    q = jnp.where(live, q, jnp.zeros((), q.dtype))
    g = jnp.where(live, g, 0.0)
    m = m_ref[0]                             # [1, bq] f32
    inv = jnp.where(live, 1.0 / z_ref[0], 0.0)
    colsum = jnp.where(live, cs_ref[0], 0.0)
    gv_m = jnp.where(live, g * wz, 0.0).astype(mm_t)   # [C, bq]

    @pl.when(j == 0)
    def _zero():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    def chunk(c, dq_part):
        # slice through the REF (Mosaic lowers pl.ds ref-indexing; a
        # value-level dynamic_slice is unimplemented for TC kernels)
        k_c = k_ref[0, :, pl.ds(c * block_k, block_k)]     # [C, Kc]
        v_c = v_ref[0, :, pl.ds(c * block_k, block_k)]
        krow = jax.lax.broadcasted_iota(jnp.int32, (block_k, 1), 0)
        klive = (c * block_k + krow) < kk_total            # [Kc, 1]
        s_c = jax.lax.dot_general(                         # [Kc, bq]
            k_c, q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        attn = jnp.where(klive, jnp.exp(s_c - m) * inv, 0.0)
        attn = jnp.where(live, attn, 0.0)
        attn_m = attn.astype(mm_t)
        dattn = jax.lax.dot_general(                       # [Kc, bq]
            v_c, gv_m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = attn * (dattn - colsum)
        ds_m = jnp.where(live, ds, 0.0).astype(mm_t)
        dq_part = dq_part + jax.lax.dot_general(           # [C, bq]
            k_c, ds_m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dv_c = jax.lax.dot_general(                        # [C, Kc]
            gv_m, attn_m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk_c = jax.lax.dot_general(                        # [C, Kc]
            q, ds_m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        c0 = c * block_k
        dv_acc[:, pl.ds(c0, block_k)] = (
            dv_acc[:, pl.ds(c0, block_k)] + dv_c)
        dk_acc[:, pl.ds(c0, block_k)] = (
            dk_acc[:, pl.ds(c0, block_k)] + dk_c)
        return dq_part

    c_dim = q.shape[0]
    nc = (k_ref.shape[2] + block_k - 1) // block_k
    dq = jax.lax.fori_loop(
        0, nc, chunk, jnp.zeros((c_dim, bq), jnp.float32))
    dq_ref[0] = dq.astype(dq_ref.dtype)

    @pl.when(j == nj - 1)
    def _flush():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _fit_block_q_flash(block_q: int, kk: int) -> int:
    """K-chunked backward: only [block_k, bq] intermediates are live, so
    bq 1024 holds through the 512-res K=4964 (measured on-chip: compiles
    and runs 7.4% faster than bq 512 at that K — scripts/
    bench_ct_bwd_512.py); halve beyond 5120 as VMEM headroom insurance
    (the dk/dv scratch accumulators grow with Kpad)."""
    return block_q if kk <= 5120 else max(256, block_q // 2)


def _bwd_call_cm_flash(q_cm, k_cm, v_cm, wz, g_cm, delta_cm, m, z,
                       block_q: int = 1024, interpret: bool = False,
                       block_k: int = 0):
    """Flash class-major backward core → (dq_cm, dk_cm, dv_cm, dwz).

    dwz and the softmax-Jacobian colsum come from the saved delta in one
    fused XLA elementwise-reduction pass (reads g+delta once); the Pallas
    kernel then computes dq/dk/dv in a single K-chunked sweep."""
    b, c, p = q_cm.shape
    kk = k_cm.shape[2]
    block_q = _fit_block_q_flash(block_q, kk)
    # Small K (300-res K=1858): one chunk beats 640-chunking by ~5% on
    # v5e (11.34 vs 11.82 ms standalone, scripts/bench_ct_bwd_blocks.py)
    # — the fori_loop collapses and Mosaic schedules one straight-line
    # body. Large K (512-res K=4964) must chunk: the [Kc, bq] f32
    # intermediates at Kc=K would need ~20 MB of scoped VMEM.
    kp128 = ((kk + 127) // 128) * 128
    block_k = block_k or (kp128 if kp128 <= 1920 else 640)
    if block_k == kp128 and block_q > 768:
        # single-chunk at bq 1024 measured scoped-vmem 16.11M — 112K OVER
        # the 16M limit in some surrounding-program contexts (it compiled
        # in others); bq 768 buys ~2 MB of headroom and times the same
        block_q = 768
    kpad = ((kk + block_k - 1) // block_k) * block_k
    if kpad != kk:
        pad = [(0, 0), (0, 0), (0, kpad - kk)]
        k_cm = jnp.pad(k_cm, pad)
        v_cm = jnp.pad(v_cm, pad)

    gd = g_cm.astype(jnp.float32) * delta_cm.astype(jnp.float32)
    dwz = jnp.sum(gd, axis=(0, 2))                       # [C]
    colsum = jnp.sum(gd * wz.astype(jnp.float32)[None, :, None],
                     axis=1, keepdims=True)              # [B, 1, P]

    qspec = pl.BlockSpec((1, c, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, c, kpad), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    sspec = pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel_cm_flash, p_total=p,
                          kk_total=kk, block_k=block_k),
        grid=(b, pl.cdiv(p, block_q)),
        in_specs=[
            qspec, kvspec, kvspec,
            pl.BlockSpec((c, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            qspec, sspec, sspec, sspec,
        ],
        out_specs=[qspec, kvspec, kvspec],
        out_shape=[
            jax.ShapeDtypeStruct((b, c, p), q_cm.dtype),
            jax.ShapeDtypeStruct((b, c, kpad), jnp.float32),
            jax.ShapeDtypeStruct((b, c, kpad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, kpad), jnp.float32),
            pltpu.VMEM((c, kpad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=10 * b * p * kpad * c,
            bytes_accessed=4 * b * (4 * p * c + 4 * kpad * c),
            transcendentals=b * p * kpad,
        ),
        interpret=interpret,
    )(q_cm, k_cm, v_cm, wz[:, None], g_cm, m, z, colsum)
    return dq, dk[:, :, :kk], dv[:, :, :kk], dwz


def ct_attention_bwd_pallas(q, k, v, wz, g, block_q: int = 512,
                            interpret: bool = False):
    """→ (dq, dk, dv, dwz) via the class-major blockwise Pallas backward.

    Inputs/outputs here are logical row-major [B, P, C] / [B, K, C]; the
    relayout to class-major is a cheap XLA transpose (~0.2 ms per
    [64, 11620, 60] bf16 tensor at HBM bandwidth) against the ~6 ms the
    lane-filled matmuls save (see `_bwd_kernel_cm`). The class-major
    training path calls `_bwd_call_cm` directly and skips the big
    transposes entirely.
    """
    dq, dk, dv, dwz = _bwd_call_cm(
        jnp.moveaxis(q, -1, 1), jnp.moveaxis(k, -1, 1),
        jnp.moveaxis(v, -1, 1), wz, jnp.moveaxis(g, -1, 1),
        block_q, interpret,
    )
    return (jnp.moveaxis(dq, 1, -1), jnp.moveaxis(dk, 1, -1),
            jnp.moveaxis(dv, 1, -1), dwz)


def _serving_kernel(conf_ref, k_ref, v_ref, wt_ref, bt_ref, wz_ref,
                    obj_ref, out_ref, *, scale: float):
    """Whole CT head for one query block (serving only):

        q      = conf @ Wθ + bθ + conf          (θ residual projection)
        novel  = conf + softmax(q kᵀ) v ∘ wz    (attention delta)
        out    = (novel / ‖novel‖₂) @ OBJᵀ · scale   (cosine classifier)

    One HBM read of the conf block and one class-major write replace the
    unfused chain's five [B, P, C]-sized HBM round-trips (θ-projection
    materialization, separate q/base reads, novel write + normalize/einsum
    re-read — profiled ≈3 ms/batch-128 on top of the attention kernel).
    Training keeps the unfused path + custom_vjp.

    Everything is computed TRANSPOSED (anchors on the 128-lane axis): the
    tiny class dims (C=60, C+1, N) live on sublanes, so no tensor — in
    HBM or VMEM — pays 128-lane padding on a small axis. Blocks:
    conf [1, C, bq]; k [1, C, K]; v [1, C+1, K] (v with a ones row, so one
    MXU op yields the unnormalized delta AND the softmax denominator);
    wt = Wθᵀ [C, C]; bt/wz [C, 1]; obj [N, C]; out [1, N, bq]."""
    conf = conf_ref[0]                                      # [C, bq]
    k = k_ref[0]                                            # [C, K]
    v = v_ref[0]                                            # [C+1, K]

    q = (
        jax.lax.dot_general(wt_ref[...], conf,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
        + bt_ref[...] + conf.astype(jnp.float32)
    ).astype(conf.dtype)                                    # [C, bq]
    s = jax.lax.dot_general(
        k, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [K, bq] f32
    s_max = jnp.max(s, axis=0, keepdims=True)
    e = jnp.exp(s - s_max)
    dd = jax.lax.dot_general(
        v, e.astype(v.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                       # [C+1, bq]
    delta = dd[:-1, :] / dd[-1:, :]
    novel = conf.astype(jnp.float32) + delta * wz_ref[...]
    inv = jax.lax.rsqrt(jnp.sum(novel * novel, axis=0, keepdims=True))
    novel = (novel * inv).astype(conf.dtype)
    out = jax.lax.dot_general(
        obj_ref[...], novel, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                               # [N, bq]
    out_ref[0] = out.astype(out_ref.dtype)


def ct_attention_serving(
    conf_cm: jnp.ndarray,     # [B, C, P] pre-CT logits, class-major
    k: jnp.ndarray,           # [B, K, C] φ(keys)+keys
    v: jnp.ndarray,           # [B, K, C] g(keys)+keys
    w_theta: jnp.ndarray,     # [C, C]
    b_theta: jnp.ndarray,     # [C]
    wz: jnp.ndarray,          # [C]
    obj_target: jnp.ndarray,  # [N, C] class prototypes
    scale: float = 5.0,
    block_q: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """→ [B, N, P] cosine-classifier scores, class-major
    (see _serving_kernel). Callers ``jnp.moveaxis(out, 1, -1)`` for the
    logical [B, P, N]; XLA keeps the class-major physical layout for the
    downstream score passes, so that is a bitcast rather than a copy."""
    b, c, p = conf_cm.shape
    kk = k.shape[1]
    n = obj_target.shape[0]
    block_q = _fit_block_q(block_q, kk)
    v_aug = jnp.concatenate(
        [v, jnp.ones((b, kk, 1), v.dtype)], axis=-1)
    k_cm = jnp.moveaxis(k, -1, 1)          # [B, C, K]   (tiny relayouts —
    v_cm = jnp.moveaxis(v_aug, -1, 1)      # [B, C+1, K]  K·C ≈ 0.2 MB/img)
    qspec = pl.BlockSpec((1, c, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((1, c, kk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((1, c + 1, kk), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    rep = lambda *shape: pl.BlockSpec(
        shape, lambda i, j: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_serving_kernel, scale=scale),
        grid=(b, pl.cdiv(p, block_q)),
        in_specs=[
            qspec, kspec, vspec,
            rep(c, c), rep(c, 1), rep(c, 1), rep(n, c),
        ],
        out_specs=pl.BlockSpec((1, n, block_q), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, p), conf_cm.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * p * c * (2 * kk + c + n),
            bytes_accessed=2 * b * (p * c + 2 * kk * c + p * n),
            transcendentals=b * p * kk,
        ),
        interpret=interpret,
    )(conf_cm, k_cm, v_cm, w_theta.T, b_theta[:, None], wz[:, None],
      obj_target)


# Flash-path rollout gate: the flash forward/backward (saved m/z/delta,
# K-chunked single-pass bwd at block_q 1024) replaces the r4 kernels once
# its gradient-parity tests pass; flip via env for A/B on hardware.
_USE_FLASH = os.environ.get("CT_ATTENTION_FLASH", "1") != "0"


def _fwd_cm(q_cm, k, v, base_cm, wz, block_q, interpret):
    if _USE_FLASH:
        out, delta, m, z = ct_attention_cm_stats(
            q_cm, k, v, base_cm, wz, block_q, interpret)
        return out, (q_cm, k, v, wz, (delta, m, z))
    return (ct_attention_cm(q_cm, k, v, base_cm, wz, block_q, interpret),
            (q_cm, k, v, wz, None))


def _bwd_cm(block_q, interpret, residuals, g_cm):
    q_cm, k, v, wz, stats = residuals
    if stats is not None:
        delta, m, z = stats
        dq_cm, dk_cm, dv_cm, dwz = _bwd_call_cm_flash(
            q_cm, jnp.moveaxis(k, -1, 1), jnp.moveaxis(v, -1, 1), wz,
            g_cm, delta, m, z, block_q, interpret,
        )
    else:
        dq_cm, dk_cm, dv_cm, dwz = _bwd_call_cm(
            q_cm, jnp.moveaxis(k, -1, 1), jnp.moveaxis(v, -1, 1), wz,
            g_cm, min(block_q, 512), interpret,
        )
    # d/d(base) of (base + delta·wz) is the upstream cotangent itself
    return (dq_cm.astype(q_cm.dtype),
            jnp.moveaxis(dk_cm, 1, -1).astype(k.dtype),
            jnp.moveaxis(dv_cm, 1, -1).astype(v.dtype),
            g_cm, dwz.astype(wz.dtype))


ct_attention_cm.defvjp(_fwd_cm, _bwd_cm)


def _fwd(q, k, v, base, wz, block_q, interpret):
    return ct_attention(q, k, v, base, wz, block_q, interpret), (q, k, v, wz)


def _bwd(block_q, interpret, residuals, g):
    q, k, v, wz = residuals
    dq, dk, dv, dwz = ct_attention_bwd_pallas(
        q, k, v, wz, g, min(block_q, 512), interpret
    )
    # d/d(base) of (base + delta·wz) is the upstream cotangent itself
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            g, dwz.astype(wz.dtype))


ct_attention.defvjp(_fwd, _bwd)
