"""BN folding: folded serving model ≡ BN model with frozen statistics."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ct_tpu.config import resolve_task
from ct_tpu.models import build_net
from ct_tpu.models.fold_bn import fold_variables


def test_fold_bn_equivalence():
    task = resolve_task(1, "transfer", "ours", "VOC")
    net = build_net(task, 300)
    v = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)),
                 train=False)

    # randomize BN stats so the fold is non-trivial
    rng = np.random.RandomState(0)
    stats = jax.tree_util.tree_map(
        lambda l: jnp.asarray(
            np.abs(rng.randn(*np.shape(l)).astype(np.float32)) * 0.5 + 0.3
        ),
        v["batch_stats"],
    )
    v = {"params": v["params"], "batch_stats": stats}

    x = jnp.asarray(
        np.random.RandomState(1).randn(2, 300, 300, 3).astype(np.float32)
    )
    ref = net.apply(v, x, train=False)

    folded = fold_variables(v)
    netf = dataclasses.replace(net, fold_bn=True)
    out = netf.apply({"params": folded["params"]}, x, train=False)

    np.testing.assert_allclose(np.asarray(out.loc), np.asarray(ref.loc),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.conf), np.asarray(ref.conf),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(out.obj), np.asarray(ref.obj),
                               atol=2e-4)
