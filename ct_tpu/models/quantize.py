"""Post-training int8 quantization for the serving path.

Pipeline (serving only; training is untouched):

    variables  ── fold_bn.fold_variables ──►  folded params (biased convs)
    folded     ── calibrate(...)         ──►  per-conv activation |max|
    both       ── quantize_variables(...)──►  'quant' collection

The model (built with ``fold_bn=True``) then runs its convolutions on the
int8 MXU path (see ``ct_tpu.models.layers.Conv2d``): activations
per-tensor, weights per-output-channel, int32 accumulation — measured 2.0×
the bf16 conv rate on TPU v5e.

The detection heads (loc/conf/obj) and the CT attention stay in float by
default (``SKIP_DEFAULT``): their outputs feed box decode and score
fusion, where quantization error moves detections directly.

No reference counterpart (the reference serves fp32 CUDA,
/root/reference/test.py); this is TPU-native serving machinery.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

# head convs + CT projections stay float
SKIP_DEFAULT = (r"^(loc|conf|obj)_\d+$", r"^(theta|phi|g|fc_base)$")

# serving-fast option: the conf heads are the widest head convs (6 anchors
# × 60 classes ≈ 360 output channels; ≈5 ms bf16 per batch-128 across the
# source maps, profiled at MXU peak — int8 halves them). loc (feeds box
# decode) and obj (gates every score) stay float; fidelity of int8 conf
# is measured on the decisive-mAP parity model (docs/PARITY.md).
SKIP_LOC_OBJ = (r"^(loc|obj)_\d+$", r"^(theta|phi|g|fc_base)$")

# all head convs int8 (CT projections stay float): loc adds ~±1 px of
# per-channel rounding to the regressed offsets, obj ~1% to the
# objectness gate — both measured on the decisive-mAP parity model
# before this config is used anywhere (docs/PARITY.md)
SKIP_CT_ONLY = (r"^(theta|phi|g|fc_base)$",)


def calibrate(net, variables: Dict[str, Any],
              batches: Iterable[jnp.ndarray]) -> Dict[str, Any]:
    """Run calibration batches; returns the per-conv activation-absmax
    tree (the mutable 'calib' collection, maxima merged across batches)."""
    # jitted: an eager apply would execute thousands of ops one RPC at a
    # time on remote-tunnel TPU backends
    run = jax.jit(
        lambda v, x: net.apply(v, x, train=False, mutable=["calib"])
    )
    merged: Optional[Dict[str, Any]] = None
    for images in batches:
        _, aux = run(variables, images)
        calib = aux["calib"]
        if merged is None:
            merged = calib
        else:
            merged = jax.tree_util.tree_map(
                lambda a, b: jnp.maximum(a, b), merged, calib
            )
    assert merged is not None, "need at least one calibration batch"
    return jax.tree_util.tree_map(np.asarray, merged)


def _sow_value(node: Any) -> Optional[np.ndarray]:
    # sow stores a tuple of reduced values under the name
    if isinstance(node, dict) and "act_absmax" in node:
        v = node["act_absmax"]
        return np.asarray(v[0] if isinstance(v, (tuple, list)) else v)
    return None


def quantize_variables(
    params: Dict[str, Any],
    calib: Dict[str, Any],
    skip: Sequence[str] = SKIP_DEFAULT,
    chains: Sequence[Any] = (),
) -> Dict[str, Any]:
    """Build the 'quant' collection mirroring the param tree.

    For every conv whose module recorded an activation absmax (and whose
    path isn't skipped): kernel_int8 = round(W/s_c) with per-output-channel
    s_c = absmax(W[..., c])/127, act_scale = absmax(x)/127.

    ``chains``: (producer, consumer) top-level conv-name pairs separated
    only by relu/max-pool (e.g. ``rfbnet.vgg_pool_chains``). The producer
    gets ``out_scale := consumer act_scale`` and emits int8 directly, the
    pool runs on int8, and the consumer skips requantization — bit-exact
    (round/clip commute with max) while halving the HBM traffic of the
    pool-boundary activations.
    """
    skip_re = [re.compile(s) for s in skip]

    def walk(p_node: Dict[str, Any], c_node: Dict[str, Any]):
        out = {}
        for key, child in p_node.items():
            if any(r.match(key) for r in skip_re):
                continue
            c_child = c_node.get(key)
            if not isinstance(child, dict) or c_child is None:
                continue
            absmax = _sow_value(c_child)
            if "kernel" in child and absmax is not None:
                w = np.asarray(child["kernel"], np.float32)
                w_s = np.abs(w).reshape(-1, w.shape[-1]).max(0) / 127.0
                w_s = np.maximum(w_s, 1e-12).astype(np.float32)
                w8 = np.clip(np.rint(w / w_s), -127, 127).astype(np.int8)
                out[key] = {
                    "act_scale": np.float32(max(float(absmax) / 127.0,
                                                1e-12)),
                    "kernel_int8": w8,
                    "kernel_scale": w_s,
                }
            else:
                sub = walk(child, c_child)
                if sub:
                    out[key] = sub
        return out

    out = walk(params, calib)
    for prod, cons in chains:
        if prod in out and cons in out:
            out[prod]["out_scale"] = out[cons]["act_scale"]
    return out
