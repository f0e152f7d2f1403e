"""Inference-time BatchNorm folding.

Every ``BasicConv`` is conv(no bias) → BN → ReLU. At inference BN is a
per-channel affine with frozen statistics, so it folds algebraically into
the conv:

    W' = W · γ/√(σ² + ε)        b' = β − μ·γ/√(σ² + ε)

This removes all BN work (and its HBM traffic) from the serving path and
lets XLA fuse the bias into the convolution epilogue. Use with a model
built with ``fold_bn=True`` (BasicConv then emits a biased conv and no BN).

The reference keeps BN at inference (torch eval mode); folding is exactly
equivalent for frozen statistics, which the parity test asserts.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

BN_EPS = 1e-5


def fold_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Fold every conv+bn pair in a variables pytree → {'params': ...}.

    Returns a new variables dict whose params have biased convs and no bn
    entries, and with an empty batch_stats collection.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def walk(p_node: Dict[str, Any], s_node: Dict[str, Any]):
        out = {}
        for key, child in p_node.items():
            if (
                isinstance(child, dict)
                and "conv" in child and "bn" in child
            ):
                conv = child["conv"]
                bn = child["bn"]
                bn_stats = s_node[key]["bn"]
                gamma = np.asarray(bn["scale"], np.float32)
                beta = np.asarray(bn["bias"], np.float32)
                mean = np.asarray(bn_stats["mean"], np.float32)
                var = np.asarray(bn_stats["var"], np.float32)
                factor = gamma / np.sqrt(var + BN_EPS)
                kernel = np.asarray(conv["kernel"], np.float32) * factor
                bias = beta - mean * factor
                if "bias" in conv:
                    bias = bias + np.asarray(conv["bias"], np.float32) * factor
                new_child = dict(child)
                new_child["conv"] = {
                    "kernel": kernel.astype(np.asarray(conv["kernel"]).dtype),
                    "bias": bias.astype(np.asarray(conv["kernel"]).dtype),
                }
                del new_child["bn"]
                out[key] = new_child
            elif isinstance(child, dict):
                out[key] = walk(child, s_node.get(key, {}))
            else:
                out[key] = child
        return out

    return {"params": walk(params, stats), "batch_stats": {}}
