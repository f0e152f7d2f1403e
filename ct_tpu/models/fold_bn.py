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


def _fetch_host_f32(tree):
    """Device→host fetch of a pytree as ONE transfer.

    Per-leaf fetches (plain ``jax.device_get`` / ``np.asarray``) pay a
    round-trip and a tiled→row-major relayout PER ARRAY — measured 8-12
    minutes for the RFBNet variables through a remote-TPU tunnel.
    Concatenating on device and fetching a single flat buffer is seconds.
    Leaves are cast to f32 (lossless here: params/batch_stats are stored
    f32; the folding math below is f32 regardless). Host trees pass
    through untouched.
    """
    import jax
    import jax.numpy as jnp

    leaves, treedef = jax.tree_util.tree_flatten(tree)
    if not leaves or all(isinstance(l, np.ndarray) for l in leaves):
        return tree
    fetch = jax.jit(
        lambda ls: jnp.concatenate(
            [jnp.ravel(l).astype(jnp.float32) for l in ls]
        )
    )
    flat = np.asarray(fetch(leaves))
    out, offset = [], 0
    for leaf in leaves:
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        out.append(flat[offset:offset + n].reshape(leaf.shape))
        offset += n
    return jax.tree_util.tree_unflatten(treedef, out)


def fold_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Fold every conv+bn pair in a variables pytree → {'params': ...}.

    Returns a new variables dict whose params have biased convs and no bn
    entries, and with an empty batch_stats collection.
    """
    variables = _fetch_host_f32(variables)
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
