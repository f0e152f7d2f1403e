"""RFBNet-SSD detector with Context-Transformer few-shot head, NHWC/Flax.

Behavioral parity target: ``RFBNet`` (/root/reference/models/
RFB_Net_vgg.py:115-286) with its builders ``vgg`` (:323), ``add_extras``
(:354) and ``multibox`` (:387). The architecture *plan* (layer/channel/
dilation schedule) is shared between the model and the torch-checkpoint
importer so the two can never drift.

TPU-first design decisions:
  * NHWC everywhere; head outputs reshape directly to [B, priors, C] with
    anchors innermost — no permutes (reference permutes at :239-241);
  * raw logits are returned for both train and eval; softmax/decoding live
    in the post-processing stage (the reference branches inside forward,
    :273-285);
  * the Context-Transformer attention (queries = all anchors over the conf
    logits, keys/values = max-pooled context anchors, :253-271) is a single
    batched einsum chain here and a fused Pallas kernel on TPU
    (ct_tpu.ops.ct_attention);
  * ``conf_feat`` (pre-CT source-class logits) is always returned — it
    feeds OBJ_Target initialization (reference ``init=True`` forward,
    :250-251) without a second model variant.
"""

from __future__ import annotations

from typing import Any, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ct_tpu.config import TaskSpec
from ct_tpu.models.layers import (
    BasicConv, BasicRFB, BasicRFBa, Conv2d, ConvParams, embed_packed_first,
    embed_packed_same, max_pool2d, max_pool2x2_packed, relu_save_out,
)


# --------------------------------------------------------------------------
# Architecture plans (shared with the checkpoint importer).
# --------------------------------------------------------------------------

VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "C",
           512, 512, 512, "M", 512, 512, 512)

# Reduced-depth plan for the 64×64 "tiny" variant: same structural shape
# (conv stages → Norm RFB-a source → pool → dilated fc6/fc7 → RFB extras →
# multibox + CT heads) at a fraction of the ops, so the full shard_map train
# step compiles in seconds on a 1-core XLA-CPU host. Used only by the
# multichip dryrun and fast sharded-correctness tests — never for parity.
VGG_CFG_TINY = (16, "M", 32, "C", 64, "M")


def vgg_plan(size: int = 300) -> List[Tuple[str, int, Any]]:
    """VGG16-reducedfc layer plan as (kind, torch_index, spec) tuples.

    torch_index is the position in the reference's ``nn.ModuleList`` so the
    importer can map ``base.{i}.weight`` keys mechanically.
    """
    tiny = size == 64
    cfg = VGG_CFG_TINY if tiny else VGG_CFG
    fc_out, fc_dil = (128, 2) if tiny else (1024, 6)
    plan: List[Tuple[str, int, Any]] = []
    idx = 0
    for v in cfg:
        if v == "M":
            plan.append(("pool", idx, dict(kernel=2, stride=2, ceil=False)))
            idx += 1
        elif v == "C":
            plan.append(("pool", idx, dict(kernel=2, stride=2, ceil=True)))
            idx += 1
        else:
            plan.append(("conv", idx, dict(out=v, kernel=3, pad=1, dil=1)))
            idx += 2  # conv + relu
    plan.append(("pool", idx, dict(kernel=3, stride=1, pad=1, ceil=False)))
    idx += 1
    plan.append(("conv", idx,
                 dict(out=fc_out, kernel=3, pad=fc_dil, dil=fc_dil)))  # fc6
    idx += 2
    plan.append(("conv", idx, dict(out=fc_out, kernel=1, pad=0, dil=1)))  # fc7
    return plan


# conv4_3 relu boundary: reference applies base[0:23] before the Norm block
VGG_CONV43_TORCH_IDX = 23


def vgg_pool_chains(size: int = 300) -> List[Tuple[str, str]]:
    """(producer, consumer) conv-name pairs separated only by max-pooling
    in the VGG trunk.

    The int8 serving path chains quantization across these boundaries: the
    producer emits int8 at the consumer's activation scale and the pool
    runs on int8 (exact — round/clip are monotone, so they commute with
    max; see ct_tpu.models.{layers,quantize}). XLA already fuses the
    requantization everywhere else; max-pool is the one op that otherwise
    materializes the activation in bf16 on both sides (profiled at
    ~6 ms/batch-128 for the 300²·64 stage alone)."""
    pairs: List[Tuple[str, str]] = []
    prev_conv: Optional[str] = None
    pooled = False
    for kind, idx, _spec in vgg_plan(size):
        if kind == "conv":
            name = f"vgg_{idx}"
            if prev_conv is not None and pooled:
                pairs.append((prev_conv, name))
            prev_conv, pooled = name, False
        else:
            pooled = True
    return pairs


def norm_spec(size: int) -> Tuple[int, int]:
    """(torch-plan index where the Norm RFB-a source taps off, channels)."""
    return (8, 64) if size == 64 else (VGG_CONV43_TORCH_IDX, 512)


def extras_plan(size: int) -> List[Tuple[str, Dict[str, int]]]:
    """Extra feature layers: ('rfb'|'conv', spec). Matches add_extras."""
    if size == 64:
        return [("rfb", dict(out=128, stride=1, visual=2))]
    if size == 300:
        return [
            ("rfb", dict(out=1024, stride=1, visual=2)),
            ("rfb", dict(out=512, stride=2, visual=2)),
            ("rfb", dict(out=256, stride=2, visual=2)),
            ("conv", dict(out=128, kernel=1, stride=1, pad=0)),
            ("conv", dict(out=256, kernel=3, stride=1, pad=0)),
            ("conv", dict(out=128, kernel=1, stride=1, pad=0)),
            ("conv", dict(out=256, kernel=3, stride=1, pad=0)),
        ]
    if size == 512:
        return [
            ("rfb", dict(out=1024, stride=1, visual=2)),
            ("rfb", dict(out=512, stride=2, visual=2)),
            ("rfb", dict(out=256, stride=2, visual=2)),
            ("rfb", dict(out=256, stride=2, visual=1)),
            ("rfb", dict(out=256, stride=2, visual=1)),
            ("conv", dict(out=128, kernel=1, stride=1, pad=0)),
            ("conv", dict(out=256, kernel=4, stride=1, pad=1)),
        ]
    raise ValueError("Only RFBNet300 and RFBNet512 are supported.")


def source_indices(size: int) -> List[int]:
    """Which extras outputs feed detection heads (k < indicator or even)."""
    if size == 64:
        return [0]
    indicator = 3 if size == 300 else 5
    return [
        k for k in range(len(extras_plan(size)))
        if k < indicator or k % 2 == 0
    ]


def mbox(size: int) -> List[int]:
    if size == 64:
        return [4, 4]
    return [6, 6, 6, 6, 4, 4] if size == 300 else [6, 6, 6, 6, 6, 4, 4]


# Context-Transformer key pooling (kernel == stride, ceil mode), one entry
# per source map. 300 is the reference schedule (RFB_Net_vgg.py:235-236);
# 512 extends it by one mid-level 2x entry (phase 2 @512 is unreachable in
# the reference — the hardcoded 6-entry list would not cover 7 maps).
CT_POOL = {300: (3, 2, 2, 2, 1, 1), 512: (3, 2, 2, 2, 2, 1, 1),
           64: (2, 1)}


class Predictions(NamedTuple):
    loc: jnp.ndarray        # [B, P, 4]  raw box regressions
    conf: jnp.ndarray       # [B, P, C_out]  class logits (post-CT if any)
    obj: jnp.ndarray        # [B, P, 2]  objectness logits
    conf_feat: jnp.ndarray  # [B, P, C_src]  pre-CT source-class logits


class RFBNet(nn.Module):
    """The detector. Input NHWC float images (BGR, mean-subtracted)."""

    task: TaskSpec
    size: int = 300
    dtype: Optional[jnp.dtype] = None   # compute dtype (bf16 on TPU)
    use_pallas_ct: bool = False         # fused Pallas CT attention (TPU)
    fold_bn: bool = False               # serving: BN folded into convs
    pack_conv1: bool = False            # training: lane-packed conv1 stage

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Predictions:
        d = dict(dtype=self.dtype, fold_bn=self.fold_bn)   # BasicConv/RFB
        dc = dict(dtype=self.dtype)                         # plain nn.Conv
        task = self.task
        src_c = task.src_cls_dim

        sources = []
        plan = vgg_plan(self.size)
        norm_idx, norm_ch = norm_spec(self.size)
        # ReLU and max-pool commute (both monotone, pool pads with -inf):
        # relu(pool(z)) == pool(relu(z)) exactly, and the gradients match
        # too — the select-and-scatter routes to the same argmax position
        # whenever the window max is positive, and every other routing is
        # killed by the relu mask on one side or the other. Applying the
        # relu AFTER the pool means the post-relu activation at the big
        # pre-pool resolution is never materialized: only the conv output
        # z is saved (relu-bwd mask = z>0, pool bwd runs s&s on z), which
        # drops one [B,300,300,64]-scale HBM write per pool boundary
        # (profiled ~3.4 ms/step at batch 64). The deferral is skipped
        # across the pool whose idx carries the Norm source tap — that tap
        # must see the relu'd conv4_3 map (reference base[0:23],
        # RFB_Net_vgg.py:219-222).
        defer_ok = lambda i: (i + 1 < len(plan) and plan[i + 1][0] == "pool"
                              and plan[i + 1][1] != norm_idx)
        # Lane-packed conv1 stage (training, see layers.py): the leading
        # [conv 3×3/p1]+ → pool 2×2/s2 prefix runs in the x-pair-packed
        # layout — C=64 never pads to 128 lanes — with canonical params
        # embedded in-graph (param tree/checkpoints identical) and a
        # first-max packed pool that emits the standard layout. Gradient
        # parity vs the standard stage: tests/test_packed_stage.py.
        start_i = 0
        if self.pack_conv1 and x.dtype != jnp.int8:
            npref = 0
            pool_ok = False
            for kind, idx, spec in plan:
                if (kind == "conv" and spec["kernel"] == 3
                        and spec["pad"] == 1 and spec["dil"] == 1):
                    npref += 1
                    continue
                pool_ok = (kind == "pool" and spec["kernel"] == 2
                           and spec["stride"] == 2 and not spec["ceil"])
                break
            prefix_idxs = {plan[j][1] for j in range(npref + 1)}
            if (npref and pool_ok and norm_idx not in prefix_idxs
                    and x.shape[-3] % 2 == 0 and x.shape[-2] % 2 == 0):
                in_ch = x.shape[-1]
                for j in range(npref):
                    _, idx, spec = plan[j]
                    k, bias = ConvParams(
                        spec["out"], (3, 3), name=f"vgg_{idx}")(in_ch)
                    x, k, bias = nn.dtypes.promote_dtype(
                        x, k, bias, dtype=self.dtype)
                    if j == 0:
                        kp = embed_packed_first(k)
                        strides = (1, 2)
                    else:
                        kp = embed_packed_same(k)
                        strides = (1, 1)
                    dn = jax.lax.conv_dimension_numbers(
                        x.shape, kp.shape, ("NHWC", "HWIO", "NHWC"))
                    x = jax.lax.conv_general_dilated(
                        x, kp, strides, ((1, 1), (1, 1)),
                        dimension_numbers=dn)
                    x = x + jnp.concatenate([bias, bias]).reshape(
                        (1, 1, 1, -1))
                    if j < npref - 1:
                        x = relu_save_out(x)
                    in_ch = spec["out"]
                if self.use_pallas_ct:
                    # fused single-pass pool+relu kernel (TPU); gradient
                    # bit-identical to the XLA composition below
                    from ct_tpu.ops.pool_packed_pallas import (
                        pool2x2_packed_relu,
                    )
                    x = pool2x2_packed_relu(x)
                else:
                    x = max_pool2x2_packed(x)   # emits the standard layout
                    x = relu_save_out(x)        # deferred past the pool
                start_i = npref + 1
        pending_relu = False
        for i, (kind, idx, spec) in enumerate(plan):
            if i < start_i:
                continue
            if idx == norm_idx:
                sources.append(
                    BasicRFBa(norm_ch, norm_ch, stride=1, scale=1.0,
                              name="Norm", **d)(x, train)
                )
            if kind == "conv":
                x = Conv2d(
                    spec["out"], (spec["kernel"],) * 2,
                    padding=((spec["pad"],) * 2,) * 2,
                    kernel_dilation=(spec["dil"],) * 2,
                    use_bias=True, name=f"vgg_{idx}", **dc,
                )(x)
                if defer_ok(i):
                    pending_relu = True
                else:
                    x = relu_save_out(x)
            else:
                x = max_pool2d(
                    x, spec["kernel"], spec["stride"],
                    padding=spec.get("pad", 0), ceil_mode=spec["ceil"],
                )
                if pending_relu and not defer_ok(i):
                    x = relu_save_out(x)
                    pending_relu = False

        src_idx = set(source_indices(self.size))
        for k, (kind, spec) in enumerate(extras_plan(self.size)):
            if kind == "rfb":
                x = BasicRFB(
                    x.shape[-1], spec["out"], stride=spec["stride"],
                    scale=1.0, visual=spec["visual"], name=f"extras_{k}", **d,
                )(x, train)
            else:
                x = BasicConv(
                    spec["out"], spec["kernel"], stride=spec["stride"],
                    padding=spec["pad"], name=f"extras_{k}", **d,
                )(x, train)
            if k in src_idx:
                sources.append(x)

        # multibox heads — NHWC conv outputs flatten straight to [B, P, C]
        loc, conf, obj, conf_pool = [], [], [], []
        ct_pool = CT_POOL[self.size]
        b = x.shape[0]
        # CT head: keep the per-anchor logits CLASS-MAJOR ([B, C, P],
        # anchors on the 128-lane axis) in BOTH serving and training.
        # Row-major [B, P, 60] pads 60 → 128 lanes (2.1× HBM) on the
        # concat and on every downstream read; training additionally pays
        # it on every backward pass of the θ-projection / attention /
        # normalize / classifier chain.
        serving_ct = (
            task.has_ct_head and self.use_pallas_ct and self.fold_bn
        )
        for i, s in enumerate(sources):
            a = mbox(self.size)[i]
            head = lambda c, name: Conv2d(
                a * c, (3, 3), padding=((1, 1), (1, 1)), use_bias=True,
                name=name, **dc,
            )(s)
            loc.append(head(4, f"loc_{i}").reshape(b, -1, 4))
            cmap = head(src_c, f"conf_{i}")
            flat = cmap.reshape(b, -1, src_c)
            conf.append(
                jnp.moveaxis(flat, -1, 1) if task.has_ct_head else flat)
            obj.append(head(2, f"obj_{i}").reshape(b, -1, 2))
            if task.has_ct_head:
                pooled = max_pool2d(cmap, ct_pool[i], ct_pool[i],
                                    ceil_mode=True)
                conf_pool.append(pooled.reshape(b, -1, src_c))

        loc = jnp.concatenate(loc, axis=1)
        obj = jnp.concatenate(obj, axis=1)

        if task.has_ct_head:
            conf_cm = jnp.concatenate(conf, axis=2)        # [B, C, P]
            conf_feat = jnp.moveaxis(conf_cm, 1, -1)       # dead unless
            keys = jnp.concatenate(conf_pool, axis=1)      # init_reweight
            conf_out = (
                self._context_transformer_serving(conf_cm, keys)
                if serving_ct
                else self._context_transformer(conf_cm, keys)
            )
        else:
            conf_feat = jnp.concatenate(conf, axis=1)
            conf_out = conf_feat

        # serving (fold_bn): conf/obj stay in the compute dtype — the f32
        # upcast of [B, 11620, 60] materialized an extra 357 MB/batch-128
        # through HBM before softmax (profiled); fidelity of bf16 scores is
        # measured on the decisive-mAP parity model (docs/PARITY.md). loc
        # always returns f32: box decode precision feeds mAP directly.
        score_t = (self.dtype or jnp.float32) if self.fold_bn \
            else jnp.float32
        return Predictions(
            loc.astype(jnp.float32),
            conf_out.astype(score_t),
            obj.astype(score_t),
            conf_feat.astype(jnp.float32),
        )

    def _context_transformer(
        self, conf_cm: jnp.ndarray, keys: jnp.ndarray
    ) -> jnp.ndarray:
        """Non-local attention over per-anchor source-class logits
        (training / unfused-eval path; reference RFB_Net_vgg.py:253-271).

        queries: all P anchors; keys/values: K pooled context anchors.
        Residual linear projections, softmax affinity, Wz-gated delta,
        cosine classifier against OBJ_Target at fixed scale 5.

        Computed CLASS-MAJOR end to end (``conf_cm`` is [B, C, P]): with
        anchors on the 128-lane axis none of the q/novel/score
        intermediates — nor their backward cotangents — pay the 60→128
        (or 20→128) lane padding that the row-major layout costs on every
        HBM pass. Parameter names/shapes are identical to a row-major
        ``nn.Dense`` chain, so checkpoints interop unchanged. Returns the
        logical row-major [B, P, num_out].
        """
        task = self.task
        c = task.src_cls_dim
        dense = lambda name: nn.Dense(
            c, use_bias=True, dtype=self.dtype, name=name,
            kernel_init=nn.initializers.he_normal(),
        )

        k = dense("phi")(keys) + keys              # [B, K, C]
        v = dense("g")(keys) + keys                # [B, K, C]

        wz = self.param("Wz", nn.initializers.zeros, (c,))
        obj_target = self._obj_target()

        from ct_tpu.ops.ct_attention import (
            ct_attention_cm, ct_attention_reference_cm,
        )

        dense("theta")(keys[:, :1])   # create/locate θ params only
        th = self.get_variable("params", "theta")
        dtype = conf_cm.dtype
        q_cm = (
            jnp.einsum("ck,bcp->bkp", th["kernel"].astype(dtype), conf_cm)
            + th["bias"].astype(dtype)[None, :, None] + conf_cm
        )                                          # [B, C, P]
        if self.use_pallas_ct:
            novel = ct_attention_cm(q_cm, k, v, conf_cm, wz)
        else:
            novel = ct_attention_reference_cm(q_cm, k, v, conf_cm, wz)
        novel = novel.astype(jnp.float32)
        novel = novel / jnp.sqrt(
            jnp.sum(jnp.square(novel), axis=1, keepdims=True))
        novel = jnp.einsum(
            "nc,bcp->bnp", obj_target, novel,
            preferred_element_type=jnp.float32,
        ) * 5.0                                    # [B, N, P] f32

        if task.setting == "incre":
            fb = nn.Dense(
                c, use_bias=True, dtype=self.dtype,
                kernel_init=nn.initializers.zeros, name="fc_base",
            )
            fb(keys[:, :1])            # create/locate params only
            fbp = self.get_variable("params", "fc_base")
            base = (
                jnp.einsum("ck,bcp->bkp",
                           fbp["kernel"].astype(dtype), conf_cm)
                + fbp["bias"].astype(dtype)[None, :, None] + conf_cm
            )
            return jnp.moveaxis(
                jnp.concatenate([base.astype(novel.dtype), novel], axis=1),
                1, -1)
        return jnp.moveaxis(novel, 1, -1)

    def _obj_target(self) -> jnp.ndarray:
        task = self.task
        n_novel = (
            task.num_classes - 1 if task.setting == "transfer"
            else task.num_classes - 1 - task.src_cls_dim
        )
        return self.param(
            "OBJ_Target",
            nn.initializers.normal(0.02),
            (n_novel, task.src_cls_dim),
        )  # rows are class prototypes, like the torch Linear weight

    def _context_transformer_serving(
        self, conf_cm: jnp.ndarray, keys: jnp.ndarray
    ) -> jnp.ndarray:
        """Serving-only CT head: one fused kernel runs θ-projection →
        attention → residual → ℓ2-normalize → cosine classifier, reading
        the class-major conf once (the unfused chain materializes q/novel
        at [B, P, C] through HBM five times — profiled ≈3 ms/batch-128).
        ``conf_cm`` is [B, C, P]; returns logical [B, P, num_out]."""
        task = self.task
        c = task.src_cls_dim
        dense = lambda name: nn.Dense(
            c, use_bias=True, dtype=self.dtype, name=name,
            kernel_init=nn.initializers.he_normal(),
        )
        k = dense("phi")(keys) + keys              # [B, K, C]
        v = dense("g")(keys) + keys                # [B, K, C]
        wz = self.param("Wz", nn.initializers.zeros, (c,))
        obj_target = self._obj_target()

        from ct_tpu.ops.ct_attention import ct_attention_serving

        dense("theta")(keys[:, :1])   # create/locate θ params only
        th = self.get_variable("params", "theta")
        dtype = conf_cm.dtype
        novel_cm = ct_attention_serving(
            conf_cm, k, v,
            th["kernel"].astype(dtype),
            th["bias"].astype(jnp.float32),
            wz, obj_target.astype(dtype),
        )                                          # [B, N, P]
        if task.setting == "incre":
            fb = nn.Dense(         # zeros-init kernel, like the torch head
                c, use_bias=True, dtype=self.dtype,
                kernel_init=nn.initializers.zeros, name="fc_base",
            )
            fb(keys[:, :1])        # create/locate params only
            fbp = self.get_variable("params", "fc_base")
            base_cm = jnp.einsum(
                "dc,bcp->bdp", fbp["kernel"].astype(dtype).T, conf_cm,
            ) + fbp["bias"].astype(dtype)[None, :, None] + conf_cm
            out_cm = jnp.concatenate([base_cm, novel_cm], axis=1)
        else:
            out_cm = novel_cm
        return jnp.moveaxis(out_cm, 1, -1)


def build_net(task: TaskSpec, size: int = 300,
              dtype: Optional[jnp.dtype] = None,
              pack_conv1: bool = False) -> RFBNet:
    # 64 is the reduced-depth dryrun/test variant (see VGG_CFG_TINY);
    # 300/512 are the production detectors matching the reference.
    if size not in (64, 300, 512):
        raise ValueError("Only RFBNet300 and RFBNet512 are supported "
                         "(plus the size-64 test variant).")
    return RFBNet(task=task, size=size, dtype=dtype, pack_conv1=pack_conv1)


def eval_scores(preds: Predictions) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Softmaxed (conf, obj) as produced by the reference eval branch.

    Math runs in f32 regardless of the logit dtype (softmax of bf16 logits
    in bf16 loses ~2 decimal digits on the probabilities); the result is
    emitted in the logit dtype, so a bf16 serving path keeps its halved
    HBM footprint while the exp/normalize stay f32 inside the fusion."""

    def _sm(x):
        return nn.softmax(x.astype(jnp.float32), axis=-1).astype(x.dtype)

    return _sm(preds.conf), _sm(preds.obj)
