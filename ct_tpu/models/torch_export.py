"""Flax variables → PyTorch ``.pth`` export for RFBNet (inverse of
``ct_tpu.models.torch_import``).

Produces a state_dict in the reference's key space so a model trained on
TPU can be evaluated (or fine-tuned) through the reference stack unchanged
— the load path is ``DetectionCheckpointer._load_file``
(/root/reference/utils/checkpointer.py:156-245), which expects
``{"model": state_dict}``.

Key-space mapping (flax → torch) is the exact inverse of torch_import.py:
  vgg_{i}/{kernel,bias}                 → base.{i}.{weight,bias}
  Norm|extras_{k}/branchA_B/conv/kernel → Norm|extras.{k}.branchA.B.conv.weight
  …/bn/{scale,bias}                     → …bn.{weight,bias}
  batch_stats …/bn/{mean,var}           → …bn.running_{mean,var}
                                          (+ num_batches_tracked = 0)
  loc_{i}|conf_{i}|obj_{i}/…            → loc|conf|obj.{i}.…
  theta|phi|g|fc_base (Dense)           → Linear weight (transposed) / bias
  Wz → Wz;  OBJ_Target → OBJ_Target.weight;  scale → tensor([5.])
    (the reference registers ``scale`` as a fixed buffer-like Parameter,
     RFB_Net_vgg.py:164/179)

Tensor layout transforms: conv [kh,kw,I,O] → [O,I,kh,kw]; linear [I,O] → [O,I].
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


def _np(v) -> np.ndarray:
    return np.asarray(v, dtype=np.float32)


def _conv_w(w) -> np.ndarray:
    return np.transpose(_np(w), (3, 2, 0, 1))


def _linear_w(w) -> np.ndarray:
    return np.transpose(_np(w), (1, 0))


def _emit_basicconv(out: Dict[str, np.ndarray], prefix: str,
                    p: Dict[str, Any], s: Optional[Dict[str, Any]]):
    """One BasicConv: {conv: {kernel[, bias]}, bn: {scale, bias}} (+ stats)."""
    conv = p["conv"]
    out[prefix + ".conv.weight"] = _conv_w(conv["kernel"])
    if "bias" in conv:
        out[prefix + ".conv.bias"] = _np(conv["bias"])
    if "bn" in p:
        out[prefix + ".bn.weight"] = _np(p["bn"]["scale"])
        out[prefix + ".bn.bias"] = _np(p["bn"]["bias"])
        if s is not None and "bn" in s:
            out[prefix + ".bn.running_mean"] = _np(s["bn"]["mean"])
            out[prefix + ".bn.running_var"] = _np(s["bn"]["var"])
            out[prefix + ".bn.num_batches_tracked"] = np.asarray(0, np.int64)


def _emit_rfb(out: Dict[str, np.ndarray], prefix: str,
              p: Dict[str, Any], s: Optional[Dict[str, Any]]):
    """A BasicRFB / BasicRFB_a / plain BasicConv extras module."""
    if "conv" in p:  # plain BasicConv ('conv' extras entries)
        _emit_basicconv(out, prefix, p, s)
        return
    for name, sub in p.items():
        if name.startswith("branch"):
            stem, idx = name.rsplit("_", 1)
            torch_name = f"{prefix}.{stem}.{idx}"
        else:  # ConvLinear / shortcut
            torch_name = f"{prefix}.{name}"
        _emit_basicconv(out, torch_name, sub,
                        None if s is None else s.get(name))


def variables_to_torch_state(
    variables: Dict[str, Any],
    ct_scale: float = 5.0,
) -> Dict[str, np.ndarray]:
    """Flax ``{'params', 'batch_stats'}`` → reference-key state dict (numpy).

    The result round-trips through ``torch_state_to_variables`` and loads
    into the reference ``RFBNet`` with zero missing/unexpected keys.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    out: Dict[str, np.ndarray] = {}

    has_ct = False
    for key, val in params.items():
        if key.startswith("vgg_"):
            i = key[len("vgg_"):]
            out[f"base.{i}.weight"] = _conv_w(val["kernel"])
            out[f"base.{i}.bias"] = _np(val["bias"])
        elif key == "Norm":
            _emit_rfb(out, "Norm", val, stats.get("Norm"))
        elif key.startswith("extras_"):
            k = key[len("extras_"):]
            _emit_rfb(out, f"extras.{k}", val, stats.get(key))
        elif key.startswith(("loc_", "conf_", "obj_")):
            head, i = key.rsplit("_", 1)
            out[f"{head}.{i}.weight"] = _conv_w(val["kernel"])
            out[f"{head}.{i}.bias"] = _np(val["bias"])
        elif key in ("theta", "phi", "g", "fc_base"):
            has_ct = True
            out[f"{key}.weight"] = _linear_w(val["kernel"])
            out[f"{key}.bias"] = _np(val["bias"])
        elif key == "Wz":
            has_ct = True
            out["Wz"] = _np(val)
        elif key == "OBJ_Target":
            has_ct = True
            out["OBJ_Target.weight"] = _np(val)
        else:
            raise KeyError(f"unmapped flax param {key!r}")

    if has_ct:
        out["scale"] = np.asarray([ct_scale], np.float32)
    return out


def save_pth(path: str, variables: Dict[str, Any],
             iteration: Optional[int] = None) -> None:
    """Write a reference-loadable ``.pth`` ({"model": state_dict} format,
    the shape ``Checkpointer.save`` produces and ``_load_file`` expects)."""
    import torch

    state = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in variables_to_torch_state(variables).items()
    }
    data: Dict[str, Any] = {"model": state}
    if iteration is not None:
        data["iteration"] = iteration
    torch.save(data, path)
