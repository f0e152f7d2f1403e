"""NHWC building blocks: conv+BN+ReLU, RFB blocks, torch-compatible pooling.

Behavioral parity targets: ``BasicConv`` (/root/reference/models/
RFB_Net_vgg.py:7-22), ``BasicRFB`` (:26-64), ``BasicRFB_a`` (:68-112).

TPU-first differences from the reference:
  * NHWC layout end-to-end — the reference's NCHW→NHWC permutes before the
    head reshapes (RFB_Net_vgg.py:239-241) disappear;
  * BN is kept as BN (eps 1e-5, torch momentum 0.01 ⇒ flax momentum 0.99)
    so checkpoints interop; XLA folds BN into the conv at inference;
  * pooling is expressed as `lax.reduce_window` with explicit asymmetric
    padding replicating torch's ceil_mode (all configs used here have their
    last window start in-bounds, so plain -inf padding is exact).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Callable, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Ints = Union[int, Tuple[int, int]]


def _pair(v: Ints) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


@jax.custom_vjp
def relu_save_out(x):
    """ReLU whose VJP keys off the OUTPUT instead of the input.

    `jax.nn.relu` saves its input, forcing the pre-activation to persist
    to HBM next to the activation (which downstream ops need anyway) —
    at 300²×64 and batch 64 that is an extra ~1.5 GB residual write per
    layer. The mask is recoverable from the output (x > 0 ⟺ relu(x) > 0,
    and both give zero gradient at exactly 0), so saving the output is
    gradient-EXACT and lets XLA fuse conv→bias→relu into one epilogue
    that materializes only the activation.
    """
    return jnp.maximum(x, 0)


def _relu_save_out_fwd(x):
    y = jnp.maximum(x, 0)
    return y, y


def _relu_save_out_bwd(y, g):
    return (jnp.where(y > 0, g, jnp.zeros((), g.dtype)),)


relu_save_out.defvjp(_relu_save_out_fwd, _relu_save_out_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _max_pool_nonoverlap(x, kernel, extra):
    """Max pool with window == stride and no leading padding (the VGG 2×2/s2
    pools and the CT context pools; ``extra`` = trailing ceil-mode pad).

    Exists for its VJP: XLA's max-pool gradient lowers to a windowed
    select-and-scatter pass that cannot fuse with its neighbors. With
    disjoint windows the gradient is purely elementwise — upsample y,
    compare, route g to the FIRST window position matching the max in
    row-major order — which XLA fuses into the surrounding backward.
    First-max tie routing matches both torch and XLA's select-and-scatter
    (select = ge keeps the earlier element), which matters in practice:
    synthetic constant-color fixtures produce exactly-tied positive
    values in pool windows, where an equal-split rule measurably changed
    3-iteration training outcomes (caught by the gated CLI e2e).
    """
    kh, kw = kernel
    eh, ew = extra
    return nn.max_pool(x, (kh, kw), strides=(kh, kw),
                       padding=((0, eh), (0, ew)))


def _max_pool_nonoverlap_fwd(x, kernel, extra):
    y = _max_pool_nonoverlap(x, kernel, extra)
    return y, (x, y)


def _max_pool_nonoverlap_bwd(kernel, extra, res, g):
    x, y = res
    kh, kw = kernel
    eh, ew = extra
    b, h, w, c = x.shape
    ho, wo = y.shape[1], y.shape[2]
    hu, wu = ho * kh, wo * kw   # extent the windows cover
    if eh or ew:
        x = jnp.pad(x, ((0, 0), (0, eh), (0, ew), (0, 0)),
                    constant_values=jnp.asarray(-jnp.inf, x.dtype))
    # floor mode with non-divisible size: trailing rows/cols are outside
    # every window — drop them here, restore as zero-grad at the end
    xr = x[:, :hu, :wu, :].reshape(b, ho, kh, wo, kw, c)
    eq = xr == y[:, :, None, :, None, :]
    zero = jnp.zeros((), x.dtype)
    prev = jnp.zeros((b, ho, wo, c), bool)   # any earlier window slot tied?
    rows = []
    for dh in range(kh):
        row = []
        for dw in range(kw):
            e = eq[:, :, dh, :, dw, :] & ~prev
            prev = prev | eq[:, :, dh, :, dw, :]
            row.append(jnp.where(e, g.astype(x.dtype), zero))
        rows.append(jnp.stack(row, axis=3))         # [b,ho,wo,kw,c]
    dx = jnp.stack(rows, axis=2)                    # [b,ho,kh,wo,kw,c]
    dx = dx.reshape(b, hu, wu, c)[:, :h, :w, :]
    if hu < h or wu < w:
        dx = jnp.pad(dx, ((0, 0), (0, max(0, h - hu)),
                          (0, max(0, w - wu)), (0, 0)))
    return (dx,)


_max_pool_nonoverlap.defvjp(_max_pool_nonoverlap_fwd,
                            _max_pool_nonoverlap_bwd)


@jax.custom_vjp
def _max_pool_3x3_s1_p1(x):
    """3×3 / stride-1 / pad-1 max pool (VGG pool5) with a stencil VJP.

    Overlapping windows: input i contributes to the 9 windows w = i + d,
    d ∈ {−1,0,1}². The gradient is a 9-tap stencil of elementwise
    compares — XLA fuses the shifted slices — instead of the windowed
    select-and-gather lowering. Same first-max (row-major) tie routing
    as `_max_pool_nonoverlap` (torch/XLA semantics).
    """
    return nn.max_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


def _max_pool_3x3_s1_p1_fwd(x):
    y = _max_pool_3x3_s1_p1(x)
    return y, (x, y)


def _max_pool_3x3_s1_p1_bwd(res, g):
    x, y = res
    h, wd = x.shape[1], x.shape[2]
    ninf = jnp.asarray(-jnp.inf, x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=ninf)
    # per-window one-hot over the 9 in-window offsets, row-major first-max
    prev = jnp.zeros(y.shape, bool)
    gm = {}
    for oh in range(3):
        for ow in range(3):
            eq = xp[:, oh:oh + h, ow:ow + wd, :] == y
            gm[(oh, ow)] = jnp.where(eq & ~prev, g,
                                     jnp.zeros((), g.dtype))
            prev = prev | eq
    # scatter back: window w = i + d − 1 chose in-window offset 2 − d
    dx = jnp.zeros(x.shape, g.dtype)
    for dh in range(3):
        for dw in range(3):
            pg = jnp.pad(gm[(2 - dh, 2 - dw)],
                         ((0, 0), (1, 1), (1, 1), (0, 0)))
            dx = dx + pg[:, dh:dh + h, dw:dw + wd, :]
    return (dx.astype(x.dtype),)


_max_pool_3x3_s1_p1.defvjp(_max_pool_3x3_s1_p1_fwd, _max_pool_3x3_s1_p1_bwd)


def max_pool2d(
    x: jnp.ndarray,
    kernel: Ints,
    stride: Optional[Ints] = None,
    padding: Ints = 0,
    ceil_mode: bool = False,
) -> jnp.ndarray:
    """Torch-semantics 2-D max pool on NHWC tensors."""
    kh, kw = _pair(kernel)
    sh, sw = _pair(stride if stride is not None else kernel)
    ph, pw = _pair(padding)
    h, w = x.shape[-3], x.shape[-2]

    def extra(size, k, s, p):
        if not ceil_mode:
            return 0
        out = math.ceil((size + 2 * p - k) / s) + 1
        needed = (out - 1) * s + k - (size + 2 * p)
        # torch drops the last window if it would start inside the padding
        if (out - 1) * s >= size + p:
            out -= 1
            needed = max(0, (out - 1) * s + k - (size + 2 * p))
        return max(0, needed)

    pads = ((ph, ph + extra(h, kh, sh, ph)), (pw, pw + extra(w, kw, sw, pw)))
    # NOTE (r4): the custom fused-elementwise pool VJPs
    # (_max_pool_nonoverlap / _max_pool_3x3_s1_p1) are NOT routed here —
    # measured on v5e (scripts/bench_pool.py) they LOSE to XLA's
    # select-and-scatter backward at every production shape
    # (300²×64: 34.7 vs 22.7 ms fwd+bwd; 150²×128: 6.9 vs 2.9;
    # 75²×256: 4.8 vs 2.5; 38²×512: 2.2 vs 1.8 — the eq-mask/where
    # chains cost more HBM passes than the windowed scatter). Tie routing
    # is first-max in both, so this is purely a speed choice; the custom
    # VJPs stay gradient-exact and tested for any future layout where
    # they win.
    if x.dtype == jnp.int8:
        # int8 serving path (chained quantization across pools): flax's
        # nn.max_pool initializes with -inf, which has no int8 value. Pad
        # with -128 — quantized activations are clipped to [-127, 127], so
        # the pad never wins a max, exactly like -inf for floats.
        return jax.lax.reduce_window(
            x, jnp.int8(-128), jax.lax.max, (1, kh, kw, 1), (1, sh, sw, 1),
            ((0, 0), pads[0], pads[1], (0, 0)),
        )
    return nn.max_pool(x, (kh, kw), strides=(sh, sw), padding=pads)


# --------------------------------------------------------------------------
# Lane-packed conv1 stage (training).
#
# The [B,S,S,64] stage-1 tensors pad 64 → 128 lanes on TPU (2× HBM on every
# elementwise/pool pass, and the N=64 conv output tile underfills the MXU).
# The packed layout folds x-parity into channels — [B,S,S,C] viewed
# row-major as [B,S,S/2,2C] with c' = (x%2)*C + c — so stage-1 activations
# occupy exactly 128 lanes. The convs stay XLA convs over *embedded*
# kernels with structural zeros (2× FLOPs, but full-lane tiles; measured
# net win on v5e, scripts/bench_packed_stage.py: whole-stage fwd+bwd
# 35.4 ms packed vs 37.9 std at batch 64, with conv1_2 fwd 7.1 vs 17.4
# standalone). The canonical [kh,kw,cin,cout] params are embedded
# in-graph, so the param tree, checkpoints and the optimizer are
# untouched. The closing 2×2/s2 pool runs as pure elementwise max in the
# packed layout with a first-max (torch row-major) tie-routing VJP —
# bit-identical gradients to XLA's select-and-scatter — and emits the
# standard layout, so the unpack is free.
# --------------------------------------------------------------------------

def pack_x_pairs(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> [B,H,W/2,2C] (row-major view; c' = (x%2)*C + c)."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def embed_packed_first(w: jnp.ndarray) -> jnp.ndarray:
    """[3,3,cin,F] image-conv kernel -> [3,4,cin,2F] packed-output kernel.

    Applied with stride (1,2) and padding ((1,1),(1,1)) to the unpacked
    input, it writes both x-phases of each output pair into the channel
    halves: even-phase outputs use window taps 0..2, odd-phase 1..3.
    """
    kh, kw, cin, f = w.shape
    assert (kh, kw) == (3, 3)
    wp = jnp.zeros((3, 4, cin, 2 * f), w.dtype)
    wp = wp.at[:, 0:3, :, :f].set(w)
    wp = wp.at[:, 1:4, :, f:].set(w)
    return wp


def embed_packed_same(w: jnp.ndarray) -> jnp.ndarray:
    """[3,3,cin,cout] kernel -> [3,3,2cin,2cout] over the packed layout.

    Even out x=2j taps {2j-1,2j,2j+1} = (col0,odd),(col1,even),(col1,odd);
    odd out x=2j+1 taps {2j,2j+1,2j+2} = (col1,even),(col1,odd),(col2,even).
    """
    kh, kw, cin, cout = w.shape
    assert (kh, kw) == (3, 3)
    wp = jnp.zeros((3, 3, 2 * cin, 2 * cout), w.dtype)
    wp = wp.at[:, 0, cin:, :cout].set(w[:, 0])
    wp = wp.at[:, 1, :cin, :cout].set(w[:, 1])
    wp = wp.at[:, 1, cin:, :cout].set(w[:, 2])
    wp = wp.at[:, 1, :cin, cout:].set(w[:, 0])
    wp = wp.at[:, 1, cin:, cout:].set(w[:, 1])
    wp = wp.at[:, 2, :cin, cout:].set(w[:, 2])
    return wp


@jax.custom_vjp
def max_pool2x2_packed(xp):
    """2×2/s2 max pool: packed [B,H,W/2,2C] -> STANDARD [B,H/2,W/2,C].

    Forward is pure elementwise (row pairs via a major-axis reshape, x
    pairs via the channel halves — no reduce_window). The VJP routes the
    cotangent to the first max in torch row-major window order via a
    boolean priority chain: bit-identical to XLA's select-and-scatter
    gradient (select = ge keeps the earlier element), including on exact
    ties (bf16 makes those common; see `_max_pool_nonoverlap`).
    """
    b, h, w2, cc = xp.shape
    c = cc // 2
    ymax = jnp.max(xp.reshape(b, h // 2, 2, w2, cc), axis=2)
    return jnp.maximum(ymax[..., :c], ymax[..., c:])


def _max_pool2x2_packed_fwd(xp):
    y = max_pool2x2_packed(xp)
    return y, (xp, y)


def _max_pool2x2_packed_bwd(res, g):
    xp, y = res
    b, h, w2, cc = xp.shape
    c = cc // 2
    xr = xp.reshape(b, h // 2, 2, w2, cc)
    ydup = jnp.concatenate([y, y], axis=-1)
    eq0 = xr[:, :, 0] == ydup            # slots (dy=0, x even|odd)
    eq1 = xr[:, :, 1] == ydup            # slots (dy=1, x even|odd)
    w00 = eq0[..., :c]
    w01 = eq0[..., c:] & ~w00
    p0 = w00 | eq0[..., c:]
    w10 = eq1[..., :c] & ~p0
    w11 = eq1[..., c:] & ~(p0 | w10)
    gdup = jnp.concatenate([g, g], axis=-1)
    zero = jnp.zeros((), g.dtype)
    d0 = jnp.where(jnp.concatenate([w00, w01], axis=-1), gdup, zero)
    d1 = jnp.where(jnp.concatenate([w10, w11], axis=-1), gdup, zero)
    dxp = jnp.stack([d0, d1], axis=2).reshape(b, h, w2, cc)
    return (dxp.astype(xp.dtype),)


max_pool2x2_packed.defvjp(_max_pool2x2_packed_fwd, _max_pool2x2_packed_bwd)


class ConvParams(nn.Module):
    """Declares `kernel`/`bias` with `Conv2d`'s names, shapes and inits —
    the packed conv1 stage consumes the raw params (it embeds them into
    packed-layout kernels in-graph) while staying checkpoint-identical to
    the `Conv2d` module it replaces."""

    features: int
    kernel_size: Tuple[int, int]
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, in_ch: int):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, in_ch, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class Conv2d(nn.Module):
    """``nn.Conv`` drop-in (same param names/shapes/init) with an int8
    serving path and activation-range calibration hooks.

    Float path: numerically identical to ``nn.Conv`` (same promotion,
    same ``conv_general_dilated`` call) — checkpoint interop and golden
    parity tests are unaffected.

    int8 path: active when a ``quant`` variable collection provides this
    module's scales (built by ``ct_tpu.models.quantize``): activations are
    quantized per-tensor, weights per-output-channel, the conv accumulates
    in int32 on the MXU at 2× the bf16 rate (measured on v5e), and the
    result is rescaled + biased in f32.

    Calibration: when a mutable ``calib`` collection is passed to
    ``apply``, the input absolute max is recorded via ``sow`` (reduce=max
    across calls) for the quantizer to consume.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))
    kernel_dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init,
            (kh, kw, x.shape[-1], self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias else None
        )
        dn = jax.lax.conv_dimension_numbers(
            x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
        )
        if self.is_mutable_collection("calib"):
            self.sow(
                "calib", "act_absmax",
                jnp.max(jnp.abs(x)).astype(jnp.float32),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum,
            )
        if self.has_variable("quant", "act_scale"):
            sx = self.get_variable("quant", "act_scale")
            w8 = self.get_variable("quant", "kernel_int8")
            sw = self.get_variable("quant", "kernel_scale")
            if x.dtype == jnp.int8:
                # chained input: the producer conv already emitted int8 at
                # THIS conv's act_scale (quantize.py wires out_scale :=
                # consumer act_scale), and relu/max-pool in between commute
                # with the monotone round/clip — bit-identical to
                # quantizing here
                x8 = x
            else:
                x8 = jnp.clip(
                    jnp.round(x.astype(jnp.float32) / sx), -127, 127
                ).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                x8, w8, self.strides, self.padding,
                rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32) * (sx * sw)
            if bias is not None:
                y = y + bias.astype(jnp.float32)
            if self.has_variable("quant", "out_scale"):
                # emit int8 for a chained consumer: across a max-pool
                # boundary XLA cannot fuse this conv's rescale with the
                # next conv's quantize (profiled: the pool materialized a
                # bf16 300²·64 tensor both ways), so quantize BEFORE the
                # pool — exact, because round/clip are monotone and the
                # consumer would clip to the same scale anyway
                so = self.get_variable("quant", "out_scale")
                return jnp.clip(
                    jnp.round(y / so), -127, 127
                ).astype(jnp.int8)
            return y.astype(self.dtype or jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        y = jax.lax.conv_general_dilated(
            x, kernel, self.strides, self.padding,
            rhs_dilation=self.kernel_dilation, dimension_numbers=dn,
        )
        if bias is not None:
            y = y + bias.reshape((1,) * (y.ndim - 1) + (-1,))
        return y


class BasicConv(nn.Module):
    """Conv → (BN) → (ReLU), NHWC. Matches the reference block's semantics."""

    out_channels: int
    kernel_size: Ints
    stride: Ints = 1
    padding: Ints = 0
    dilation: Ints = 1
    relu: bool = True
    bn: bool = True
    bias: bool = False
    dtype: Optional[jnp.dtype] = None
    fold_bn: bool = False  # inference: BN pre-folded into conv weights

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        kh, kw = _pair(self.kernel_size)
        ph, pw = _pair(self.padding)
        use_bn = self.bn and not self.fold_bn
        x = Conv2d(
            self.out_channels,
            (kh, kw),
            strides=_pair(self.stride),
            padding=((ph, ph), (pw, pw)),
            kernel_dilation=_pair(self.dilation),
            use_bias=self.bias or (self.bn and self.fold_bn),
            kernel_init=nn.initializers.he_normal(),
            dtype=self.dtype,
            name="conv",
        )(x)
        if use_bn:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.99,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn",
            )(x)
        if self.relu:
            x = relu_save_out(x)
        return x


class BasicRFB(nn.Module):
    """Receptive-field block: 3 dilated branches + linear fuse + shortcut."""

    in_planes: int
    out_planes: int
    stride: int = 1
    scale: float = 0.1
    visual: int = 1
    dtype: Optional[jnp.dtype] = None
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inter = self.in_planes // 8
        d = dict(dtype=self.dtype, fold_bn=self.fold_bn)
        v = self.visual

        b0 = BasicConv(2 * inter, 1, stride=self.stride, name="branch0_0", **d)(x, train)
        b0 = BasicConv(2 * inter, 3, padding=v, dilation=v, relu=False,
                       name="branch0_1", **d)(b0, train)

        b1 = BasicConv(inter, 1, name="branch1_0", **d)(x, train)
        b1 = BasicConv(2 * inter, 3, stride=self.stride, padding=1,
                       name="branch1_1", **d)(b1, train)
        b1 = BasicConv(2 * inter, 3, padding=v + 1, dilation=v + 1,
                       relu=False, name="branch1_2", **d)(b1, train)

        b2 = BasicConv(inter, 1, name="branch2_0", **d)(x, train)
        b2 = BasicConv((inter // 2) * 3, 3, padding=1, name="branch2_1", **d)(b2, train)
        b2 = BasicConv(2 * inter, 3, stride=self.stride, padding=1,
                       name="branch2_2", **d)(b2, train)
        b2 = BasicConv(2 * inter, 3, padding=2 * v + 1, dilation=2 * v + 1,
                       relu=False, name="branch2_3", **d)(b2, train)

        out = jnp.concatenate([b0, b1, b2], axis=-1)
        out = BasicConv(self.out_planes, 1, relu=False, name="ConvLinear", **d)(out, train)
        short = BasicConv(self.out_planes, 1, stride=self.stride, relu=False,
                          name="shortcut", **d)(x, train)
        return relu_save_out(out * self.scale + short)


class BasicRFBa(nn.Module):
    """RFB-s variant (the 'Norm' block on the conv4_3 map): 4 thin branches."""

    in_planes: int
    out_planes: int
    stride: int = 1
    scale: float = 0.1
    dtype: Optional[jnp.dtype] = None
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inter = self.in_planes // 4
        d = dict(dtype=self.dtype, fold_bn=self.fold_bn)

        b0 = BasicConv(inter, 1, name="branch0_0", **d)(x, train)
        b0 = BasicConv(inter, 3, padding=1, relu=False, name="branch0_1", **d)(b0, train)

        b1 = BasicConv(inter, 1, name="branch1_0", **d)(x, train)
        b1 = BasicConv(inter, (3, 1), padding=(1, 0), name="branch1_1", **d)(b1, train)
        b1 = BasicConv(inter, 3, padding=3, dilation=3, relu=False,
                       name="branch1_2", **d)(b1, train)

        b2 = BasicConv(inter, 1, name="branch2_0", **d)(x, train)
        b2 = BasicConv(inter, (1, 3), stride=self.stride, padding=(0, 1),
                       name="branch2_1", **d)(b2, train)
        b2 = BasicConv(inter, 3, padding=3, dilation=3, relu=False,
                       name="branch2_2", **d)(b2, train)

        b3 = BasicConv(inter // 2, 1, name="branch3_0", **d)(x, train)
        b3 = BasicConv((inter // 4) * 3, (1, 3), padding=(0, 1),
                       name="branch3_1", **d)(b3, train)
        b3 = BasicConv(inter, (3, 1), stride=self.stride, padding=(1, 0),
                       name="branch3_2", **d)(b3, train)
        b3 = BasicConv(inter, 3, padding=5, dilation=5, relu=False,
                       name="branch3_3", **d)(b3, train)

        out = jnp.concatenate([b0, b1, b2, b3], axis=-1)
        out = BasicConv(self.out_planes, 1, relu=False, name="ConvLinear", **d)(out, train)
        short = BasicConv(self.out_planes, 1, stride=self.stride, relu=False,
                          name="shortcut", **d)(x, train)
        return relu_save_out(out * self.scale + short)
