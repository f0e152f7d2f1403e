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

import math
from typing import Optional, Tuple, Union

import jax.numpy as jnp
from flax import linen as nn

Ints = Union[int, Tuple[int, int]]


def _pair(v: Ints) -> Tuple[int, int]:
    return (v, v) if isinstance(v, int) else tuple(v)


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
    return nn.max_pool(x, (kh, kw), strides=(sh, sw), padding=pads)


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
        x = nn.Conv(
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
            x = nn.relu(x)
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
        return nn.relu(out * self.scale + short)


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
        return nn.relu(out * self.scale + short)
