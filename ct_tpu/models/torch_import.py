"""PyTorch checkpoint → Flax variables interop for RFBNet.

Reads the reference's ``.pth`` files (full model ``state_dict`` or the
``vgg16_reducedfc`` basenet, which the reference prefixes with ``base.`` at
load time — /root/reference/utils/checkpointer.py:282-283) and produces the
``{'params': ..., 'batch_stats': ...}`` variables of ``ct_tpu.models.RFBNet``.

Key-space mapping (torch → flax):
  base.{i}.{weight,bias}                → vgg_{i}/{kernel,bias}
  Norm|extras.{k}.branchA.B.conv.weight → .../branchA_B/conv/kernel
  …bn.{weight,bias}                     → …/bn/{scale,bias}        (params)
  …bn.running_{mean,var}               → …/bn/{mean,var}     (batch_stats)
  loc|conf|obj.{i}.{weight,bias}        → loc_{i}/…
  theta|phi|g|fc_base.{weight,bias}     → Dense kernel (transposed) / bias
  Wz                                    → Wz;  OBJ_Target.weight → OBJ_Target
  scale                                 → dropped (fixed constant 5.0)

Tensor layout transforms: conv [O,I,kh,kw] → [kh,kw,I,O]; linear [O,I] → [I,O].
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def _to_numpy(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _set(tree: Dict[str, Any], path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _map_basicconv(rest, value, root_path, params, stats, key):
    """rest like ['conv','weight'] or ['bn','running_mean']."""
    mod, leaf = rest
    if mod == "conv":
        if leaf == "weight":
            _set(params, root_path + ("conv", "kernel"), _conv_w(value))
        else:
            _set(params, root_path + ("conv", "bias"), value)
    elif mod == "bn":
        if leaf == "weight":
            _set(params, root_path + ("bn", "scale"), value)
        elif leaf == "bias":
            _set(params, root_path + ("bn", "bias"), value)
        elif leaf == "running_mean":
            _set(stats, root_path + ("bn", "mean"), value)
        elif leaf == "running_var":
            _set(stats, root_path + ("bn", "var"), value)
        elif leaf == "num_batches_tracked":
            pass
        else:
            raise KeyError(f"unhandled bn leaf in {key}")
    else:
        raise KeyError(f"unhandled module in {key}")


def torch_state_to_variables(
    state_dict: Dict[str, Any],
    strict: bool = True,
) -> Dict[str, Any]:
    """Convert a reference RFBNet state_dict to flax variable collections."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    for key, raw in state_dict.items():
        value = _to_numpy(raw)
        parts = key.split(".")
        if parts[0] == "module":  # DataParallel wrapper
            parts = parts[1:]
        head = parts[0]

        try:
            if head == "base":
                leaf = "kernel" if parts[2] == "weight" else "bias"
                v = _conv_w(value) if parts[2] == "weight" else value
                _set(params, (f"vgg_{parts[1]}", leaf), v)
            elif head in ("Norm", "extras"):
                if head == "Norm":
                    root, rest = ("Norm",), parts[1:]
                else:
                    root, rest = (f"extras_{parts[1]}",), parts[2:]
                if rest[0].startswith("branch"):
                    root = root + (f"{rest[0]}_{rest[1]}",)
                    rest = rest[2:]
                elif rest[0] in ("ConvLinear", "shortcut"):
                    root = root + (rest[0],)
                    rest = rest[1:]
                _map_basicconv(rest, value, root, params, stats, key)
            elif head in ("loc", "conf", "obj"):
                leaf = "kernel" if parts[2] == "weight" else "bias"
                v = _conv_w(value) if parts[2] == "weight" else value
                _set(params, (f"{head}_{parts[1]}", leaf), v)
            elif head in ("theta", "phi", "g", "fc_base"):
                if parts[1] == "weight":
                    _set(params, (head, "kernel"), _linear_w(value))
                else:
                    _set(params, (head, "bias"), value)
            elif head == "Wz":
                params["Wz"] = value
            elif head == "OBJ_Target":
                params["OBJ_Target"] = value  # [n_novel, C] prototype rows
            elif head == "scale":
                pass  # fixed constant in our model
            elif head.isdigit():
                # bare vgg16_reducedfc basenet: '{i}.weight' (pre-'base.')
                leaf = "kernel" if parts[1] == "weight" else "bias"
                v = _conv_w(value) if parts[1] == "weight" else value
                _set(params, (f"vgg_{head}", leaf), v)
            else:
                raise KeyError(f"unmapped key {key}")
        except (KeyError, IndexError):
            if strict:
                raise
    out: Dict[str, Any] = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def load_pth(path: str, strict: bool = True) -> Dict[str, Any]:
    """Load a reference .pth/.pkl (state_dict, full checkpoint, or a
    Detectron-style latin1 pickle — checkpointer.py:225-244 semantics)."""
    if path.endswith(".pkl"):
        import pickle

        with open(path, "rb") as f:
            obj = pickle.load(f, encoding="latin1")
        if isinstance(obj, dict) and "blobs" in obj:
            obj = obj["blobs"]  # Caffe2 detectron format
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "model" in obj and not any(
        k.endswith("weight") for k in obj
    ):
        obj = obj["model"]
    return torch_state_to_variables(obj, strict=strict)


def merge_variables(
    init_vars: Dict[str, Any],
    loaded: Dict[str, Any],
    skip_mismatched: bool = True,
) -> Tuple[Dict[str, Any], Dict[str, str]]:
    """Overlay loaded tensors onto freshly-initialized variables.

    Mirrors the reference checkpointer's shape-mismatch skip
    (/root/reference/utils/checkpointer.py:184-195): a loaded tensor whose
    shape differs from the model's (e.g. a 60-class phase-1 conf head into a
    phase-2 model) is dropped, letting the fresh init stand. Returns the
    merged tree and a report {flat_key: 'loaded'|'shape_mismatch'|'missing'}.
    """
    report: Dict[str, str] = {}

    flat_init = _flatten(init_vars)
    flat_loaded = _flatten(loaded)
    merged = dict(flat_init)
    for k, v in flat_loaded.items():
        if k not in flat_init:
            report[k] = "unexpected"
            continue
        if tuple(np.shape(v)) != tuple(np.shape(flat_init[k])):
            report[k] = "shape_mismatch"
            continue
        merged[k] = np.asarray(v, dtype=np.asarray(flat_init[k]).dtype)
        report[k] = "loaded"
    for k in flat_init:
        if k not in flat_loaded:
            report[k] = "missing"
    return _unflatten(merged), report


def _flatten(tree: Dict[str, Any], prefix: Tuple[str, ...] = ()) -> Dict:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = v
    return out


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for k, v in flat.items():
        _set(tree, tuple(k.split("/")), v)
    return tree
