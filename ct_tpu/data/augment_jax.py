"""On-device (jit/vmap) SSD augmentation pipeline.

TPU-native counterpart of the host pipeline in ``ct_tpu.data.augment``
(itself matching /root/reference/data/data_augment.py). The host decodes
JPEGs and resizes to a fixed square working canvas; everything else runs
batched on device with static shapes:

  * photometric distortion — brightness/contrast in RGB plus hue/saturation
    via an exact RGB↔HSV round trip, all elementwise VPU work;
  * geometric crop/expand/flip — the reference's sequential crop → expand →
    mirror collapses into ONE affine resample per image
    (``jax.image.scale_and_translate``) with mean-fill outside the source,
    so each image is touched exactly once regardless of how aggressive the
    augmentation is;
  * the reference's rejection loops (data_augment.py:24-78) become a fixed
    number of vectorized candidate draws with masked first-accept selection;
  * box transforms and min-size filtering produce a fixed-shape padded
    target set (weight-0 masking, never ragged).

The host pipeline remains the parity baseline; this one trades exact
sampling equivalence for a single fused device pass (distribution-level
equivalent: same mode probabilities, scale/ratio ranges and IoU
constraints).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ct_tpu.config import RGB_MEANS


# --------------------------------------------------------------------------
# color space helpers (exact, elementwise)
# --------------------------------------------------------------------------


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] in [0, 255] → h ∈ [0, 360), s ∈ [0, 1], v ∈ [0, 255]."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    delta = maxc - minc
    safe = jnp.where(delta == 0, 1.0, delta)
    h = jnp.where(
        maxc == r, (g - b) / safe,
        jnp.where(maxc == g, 2.0 + (b - r) / safe, 4.0 + (r - g) / safe),
    )
    h = jnp.where(delta == 0, 0.0, h * 60.0) % 360.0
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    return jnp.stack([h, s, maxc], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h6 = (h % 360.0) / 60.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def photometric_distort(rng: jax.Array, image: jnp.ndarray) -> jnp.ndarray:
    """Reference-equivalent random photometric ops on one [S,S,3] image
    (channel order-agnostic brightness/contrast; hue/sat in HSV)."""
    k = jax.random.split(rng, 8)
    do = jax.random.bernoulli(k[0], 0.5, (4,))

    img = image
    beta = jax.random.uniform(k[1], (), minval=-32.0, maxval=32.0)
    img = jnp.where(do[0], jnp.clip(img + beta, 0, 255), img)
    alpha = jax.random.uniform(k[2], (), minval=0.5, maxval=1.5)
    img = jnp.where(do[1], jnp.clip(img * alpha, 0, 255), img)

    hsv = rgb_to_hsv(img[..., ::-1])  # stored BGR → RGB for HSV math
    dh = jax.random.uniform(k[3], (), minval=-36.0, maxval=36.0)
    hsv = hsv.at[..., 0].set(
        jnp.where(do[2], (hsv[..., 0] + dh) % 360.0, hsv[..., 0])
    )
    ds = jax.random.uniform(k[4], (), minval=0.5, maxval=1.5)
    hsv = hsv.at[..., 1].set(
        jnp.where(do[3], jnp.clip(hsv[..., 1] * ds, 0, 1), hsv[..., 1])
    )
    return hsv_to_rgb(hsv)[..., ::-1]


# --------------------------------------------------------------------------
# geometric: one fused affine per image
# --------------------------------------------------------------------------

CROP_MIN_IOUS = jnp.asarray([-1.0, 0.1, 0.3, 0.5, 0.7, 0.9, -1.0])
# mode 0 = no crop; mode 6 = crop with no IoU constraint
NUM_CANDIDATES = 16


def _sample_crop(rng, boxes, box_valid):
    """Sample a crop ROI (percent coords) honoring the reference's
    mode/IoU-constraint scheme with masked first-accept over candidates.

    Returns roi [4] (x1,y1,x2,y2 in [0,1]) — identity if no crop chosen.
    """
    k = jax.random.split(rng, 5)
    mode = jax.random.randint(k[0], (), 0, 7)
    min_iou = CROP_MIN_IOUS[mode]

    scale = jax.random.uniform(k[1], (NUM_CANDIDATES,), minval=0.3,
                               maxval=1.0)
    min_ratio = jnp.maximum(0.5, scale * scale)
    max_ratio = jnp.minimum(2.0, 1.0 / (scale * scale))
    u = jax.random.uniform(k[2], (NUM_CANDIDATES,))
    ratio = jnp.sqrt(min_ratio + u * (max_ratio - min_ratio))
    w = scale * ratio
    h = scale / ratio
    x1 = jax.random.uniform(k[3], (NUM_CANDIDATES,)) * (1 - w)
    y1 = jax.random.uniform(k[4], (NUM_CANDIDATES,)) * (1 - h)
    rois = jnp.stack([x1, y1, x1 + w, y1 + h], axis=-1)   # [N, 4]

    # IoU of every gt box against every candidate roi
    bx = boxes[None, :, :]                                 # [1, M, 4]
    rx = rois[:, None, :]                                  # [N, 1, 4]
    ix1 = jnp.maximum(bx[..., 0], rx[..., 0])
    iy1 = jnp.maximum(bx[..., 1], rx[..., 1])
    ix2 = jnp.minimum(bx[..., 2], rx[..., 2])
    iy2 = jnp.minimum(bx[..., 3], rx[..., 3])
    inter = jnp.clip(ix2 - ix1, min=0) * jnp.clip(iy2 - iy1, min=0)
    area_b = (bx[..., 2] - bx[..., 0]) * (bx[..., 3] - bx[..., 1])
    area_r = (rx[..., 2] - rx[..., 0]) * (rx[..., 3] - rx[..., 1])
    iou = inter / jnp.maximum(area_b + area_r - inter, 1e-12)  # [N, M]

    # constraint: min over valid boxes ≥ min_iou; at least one center kept
    iou_ok = jnp.all(
        jnp.where(box_valid[None, :], iou >= min_iou, True), axis=1
    )
    centers = (boxes[:, :2] + boxes[:, 2:]) / 2
    inside = jnp.all(
        (rois[:, None, :2] < centers[None]) &
        (centers[None] < rois[:, None, 2:]), axis=-1,
    )                                                      # [N, M]
    keeps_any = jnp.any(inside & box_valid[None, :], axis=1)
    ok = iou_ok & keeps_any
    pick = jnp.argmax(ok)                                  # first accept
    any_ok = jnp.any(ok)
    use_crop = (mode != 0) & any_ok
    identity = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    return jnp.where(use_crop, rois[pick], identity)


def _sample_expand(rng, prob):
    """Expand factor + placement (percent coords of the virtual canvas)."""
    k = jax.random.split(rng, 4)
    do = jax.random.uniform(k[0], ()) <= prob
    scale = jax.random.uniform(k[1], (), minval=1.0, maxval=4.0)
    min_ratio = jnp.maximum(0.5, 1.0 / (scale * scale))
    max_ratio = jnp.minimum(2.0, scale * scale)
    u = jax.random.uniform(k[2], ())
    ratio = jnp.sqrt(min_ratio + u * (max_ratio - min_ratio))
    ws = jnp.maximum(scale * ratio, 1.0)
    hs = jnp.maximum(scale / ratio, 1.0)
    off = jax.random.uniform(k[3], (2,))
    left = off[0] * (ws - 1.0)
    top = off[1] * (hs - 1.0)
    ws = jnp.where(do, ws, 1.0)
    hs = jnp.where(do, hs, 1.0)
    left = jnp.where(do, left, 0.0)
    top = jnp.where(do, top, 0.0)
    return ws, hs, left, top


def _augment_one(rng, image, boxes, labels, valid, out_size, expand_prob,
                 means):
    """One image: photometric + fused crop/expand/flip affine + filtering."""
    s = image.shape[0]
    k = jax.random.split(rng, 4)

    img = photometric_distort(k[0], image)

    roi = _sample_crop(k[1], boxes, valid)                 # percent coords
    ws, hs, left, top = _sample_expand(k[2], expand_prob)
    flip = jax.random.bernoulli(k[3], 0.5, ())

    # final view in source percent coords: the crop roi placed inside a
    # (ws × hs) expanded canvas at offset (left, top) in roi units — the
    # output image samples exactly that window
    rw, rh = roi[2] - roi[0], roi[3] - roi[1]
    win_w = rw * ws
    win_h = rh * hs
    win_x1 = roi[0] - left * rw
    win_y1 = roi[1] - top * rh

    # resample: output pixel (u, v) ∈ [0, out)² ← source percent coords
    #   x = win_x1 + (u+0.5)/out * win_w   (flipped if flip)
    sx = out_size / (win_w * s)            # out px per source px
    sy = out_size / (win_h * s)
    tx = -win_x1 * s * sx
    ty = -win_y1 * s * sy
    sx_f = jnp.where(flip, -sx, sx)
    tx_f = jnp.where(flip, out_size - tx, tx)
    scale_vec = jnp.stack([sy, sx_f])
    trans_vec = jnp.stack([ty, tx_f])
    out = jax.image.scale_and_translate(
        img, (out_size, out_size, 3), (0, 1), scale_vec, trans_vec,
        method="linear",
    )
    # mean-fill outside the source image extent
    uu = (jnp.arange(out_size, dtype=jnp.float32) + 0.5)
    src_x = (uu - tx_f) / sx_f / s
    src_y = (uu - ty) / sy / s
    in_x = (src_x >= 0) & (src_x <= 1)
    in_y = (src_y >= 0) & (src_y <= 1)
    inside = in_y[:, None] & in_x[None, :]
    fill = jnp.asarray(means, out.dtype)
    out = jnp.where(inside[..., None], out, fill)

    # transform boxes (percent coords of the output)
    bx1 = (boxes[:, 0] - win_x1) / win_w
    by1 = (boxes[:, 1] - win_y1) / win_h
    bx2 = (boxes[:, 2] - win_x1) / win_w
    by2 = (boxes[:, 3] - win_y1) / win_h
    fx1 = jnp.where(flip, 1.0 - bx2, bx1)
    fx2 = jnp.where(flip, 1.0 - bx1, bx2)
    nb = jnp.stack([fx1, by1, fx2, by2], axis=-1)
    nb_clip = jnp.clip(nb, 0.0, 1.0)

    centers = (nb[:, :2] + nb[:, 2:]) / 2
    center_in = jnp.all((centers > 0) & (centers < 1), axis=1)
    wh = jnp.minimum(nb_clip[:, 2] - nb_clip[:, 0],
                     nb_clip[:, 3] - nb_clip[:, 1])
    new_valid = valid & center_in & (wh > 0.01)

    out = out - fill
    return out, nb_clip, labels, new_valid


@functools.partial(jax.jit, static_argnames=("zero_ignored",))
def mixup_batch(
    rng: jax.Array,
    batch: Dict[str, jnp.ndarray],
    beta_a: float = 1.5,
    beta_b: float = 1.5,
    zero_ignored: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Batch-level image-pair mixup for the on-device pipeline.

    Reference semantics (/root/reference/data/voc0712.py:240-275): blend a
    second image in with weight 1−λ, λ ~ Beta(1.5, 1.5) clipped to [0, 1],
    and carry both images' targets with weight columns λ and 1−λ. The
    reference partners each sample with a random *dataset* index inside the
    DataLoader worker; on device the partner is another image of the same
    batch — a roll by a random non-zero offset, so partners are always
    distinct (the batch is an i.i.d. shuffle of the dataset, so the pairing
    distribution matches).

    ``zero_ignored``: reference voc0712.py:271-273 — under the incremental/
    instance-shot protocols, rows whose label is the ignore marker (−1) get
    weight 0 in the mixed target.

    batch: image [B,S,S,3], boxes [B,M,4], labels [B,M], weights [B,M],
    valid [B,M] → same keys with targets doubled to 2M rows.
    """
    images = batch["image"]
    b = images.shape[0]
    k_lam, k_off = jax.random.split(rng)
    lam = jnp.clip(jax.random.beta(k_lam, beta_a, beta_b, (b,)), 0.0, 1.0)
    offset = jax.random.randint(k_off, (), 1, max(b, 2))

    partner = lambda x: jnp.roll(x, shift=offset, axis=0)
    # blend in f32, emit in the incoming image dtype (bf16 feed stays bf16)
    mixed = (lam[:, None, None, None] * images
             + (1.0 - lam)[:, None, None, None] * partner(images)
             ).astype(images.dtype)

    w1 = batch["weights"] * lam[:, None]
    w2 = partner(batch["weights"]) * (1.0 - lam)[:, None]
    labels = jnp.concatenate([batch["labels"], partner(batch["labels"])], 1)
    weights = jnp.concatenate([w1, w2], axis=1)
    if zero_ignored:
        weights = jnp.where(labels < 0, 0.0, weights)
    return {
        "image": mixed,
        "boxes": jnp.concatenate([batch["boxes"], partner(batch["boxes"])],
                                 axis=1),
        "labels": labels,
        "weights": weights,
        "valid": jnp.concatenate([batch["valid"], partner(batch["valid"])],
                                 axis=1),
    }


@functools.partial(
    jax.jit, static_argnames=("out_size", "expand_prob", "means",
                              "out_dtype")
)
def augment_batch(
    rng: jax.Array,
    images: jnp.ndarray,    # [B, S, S, 3] float32, BGR 0..255 (square canvas)
    boxes: jnp.ndarray,     # [B, M, 4] percent point-form
    labels: jnp.ndarray,    # [B, M]
    valid: jnp.ndarray,     # [B, M]
    out_size: int = 300,
    expand_prob: float = 0.6,
    means: Tuple[float, float, float] = RGB_MEANS,
    out_dtype: Optional[Any] = None,
) -> Dict[str, jnp.ndarray]:
    """Batched on-device augmentation → mean-subtracted [B, out, out, 3]
    images and transformed fixed-shape targets. Accepts uint8 canvases
    (the loader ships them un-converted; one batched cast here).

    ``out_dtype``: emit images in the model's compute dtype (bf16 on TPU).
    The [B,S,S,3] image is lane-padded 3→128 by the TPU tiled layout, so
    an f32 feed costs the train step ~3 GB/step of padded HBM reads at
    batch 64 (in-step cast + conv1_1 fwd + conv1_1 weight-grad re-read);
    casting here halves that. Numerics are identical to feeding f32 — the
    first conv promotes its input to the compute dtype either way."""
    images = images.astype(jnp.float32)
    rngs = jax.random.split(rng, images.shape[0])
    img, bx, lb, vd = jax.vmap(
        lambda r, i, b, l, v: _augment_one(
            r, i, b, l, v, out_size, expand_prob, means
        )
    )(rngs, images, boxes, labels, valid)
    if out_dtype is not None:
        img = img.astype(out_dtype)
    return {"image": img, "boxes": bx, "labels": lb, "valid": vd}
