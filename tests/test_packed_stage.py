"""Lane-packed conv1 stage: parity vs the standard stage.

The packed stage (ct_tpu/models/layers.py: embed_packed_first /
embed_packed_same / max_pool2x2_packed; routed by RFBNet(pack_conv1=True))
re-lays stage-1 activations as [B,H,W/2,2C] so C=64 never pads to 128
lanes on TPU. It must be a pure re-association of the standard stage:
same param tree, same outputs (fp tolerance), first-max pool-gradient
routing bit-identical to XLA's select-and-scatter (torch semantics).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from ct_tpu.config import resolve_task
from ct_tpu.models import build_net
from ct_tpu.models.layers import (
    embed_packed_first, embed_packed_same, max_pool2x2_packed,
)


def _conv(x, w, strides=(1, 1), padding=((1, 1), (1, 1))):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w, strides, padding, dimension_numbers=dn)


def test_embedded_kernels_match_standard_convs():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 12, 16, 3), jnp.float32)
    w1 = jnp.asarray(0.3 * rng.randn(3, 3, 3, 8), jnp.float32)
    w2 = jnp.asarray(0.3 * rng.randn(3, 3, 8, 8), jnp.float32)

    y1 = _conv(x, w1)
    y1p = _conv(x, embed_packed_first(w1), strides=(1, 2))
    np.testing.assert_allclose(
        np.asarray(y1p), np.asarray(y1).reshape(y1p.shape),
        rtol=1e-5, atol=1e-5)

    y2 = _conv(y1, w2)
    y2p = _conv(jnp.asarray(np.asarray(y1).reshape(y1p.shape)),
                embed_packed_same(w2))
    np.testing.assert_allclose(
        np.asarray(y2p), np.asarray(y2).reshape(y2p.shape),
        rtol=1e-5, atol=1e-5)


def test_packed_pool_firstmax_gradient_bitexact_vs_xla():
    """Tie-heavy quantized input: the packed pool's first-max routing must
    reproduce XLA's select-and-scatter gradient bit-for-bit."""
    rng = np.random.RandomState(1)
    x = np.round(rng.randn(3, 16, 16, 8) * 2) / 2   # many exact ties
    for dt in (jnp.float32, jnp.bfloat16):
        xs = jnp.asarray(x, dt)
        xp = jnp.asarray(x.reshape(3, 16, 8, 16), dt)

        def loss_std(v):
            y = nn.max_pool(v, (2, 2), strides=(2, 2), padding="VALID")
            return jnp.sum(jnp.square(y.astype(jnp.float32)))

        def loss_pk(v):
            return jnp.sum(jnp.square(
                max_pool2x2_packed(v).astype(jnp.float32)))

        gs = jax.grad(loss_std)(xs)
        gp = jax.grad(loss_pk)(xp)
        np.testing.assert_array_equal(
            np.asarray(gs, np.float32),
            np.asarray(gp, np.float32).reshape(gs.shape))


@pytest.fixture(scope="module")
def tiny_nets():
    task = resolve_task(1, "transfer", "ours", "VOC")
    net_std = build_net(task, 64)
    net_pk = build_net(task, 64, pack_conv1=True)
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(2, 64, 64, 3), jnp.float32)
    v = net_std.init(jax.random.PRNGKey(0), img, train=False)
    return net_std, net_pk, v, img


def test_packed_net_param_tree_identical(tiny_nets):
    net_std, net_pk, v, img = tiny_nets
    v_pk = net_pk.init(jax.random.PRNGKey(0), img, train=False)
    paths = {jax.tree_util.keystr(p): x.shape
             for p, x in jax.tree_util.tree_leaves_with_path(v["params"])}
    paths_pk = {jax.tree_util.keystr(p): x.shape
                for p, x in
                jax.tree_util.tree_leaves_with_path(v_pk["params"])}
    assert paths == paths_pk


def test_packed_net_forward_matches_std(tiny_nets):
    net_std, net_pk, v, img = tiny_nets
    out_s = net_std.apply(v, img, train=False)
    out_p = net_pk.apply(v, img, train=False)
    for name in ("loc", "conf", "obj", "conf_feat"):
        np.testing.assert_allclose(
            np.asarray(getattr(out_p, name)),
            np.asarray(getattr(out_s, name)),
            rtol=5e-4, atol=5e-5, err_msg=name)


def test_packed_net_param_grads_match_std(tiny_nets):
    net_std, net_pk, v, img = tiny_nets

    def make_loss(net):
        def loss(params):
            out, _ = net.apply(
                {**v, "params": params}, img, train=True,
                mutable=["batch_stats"])
            return (jnp.sum(jnp.square(out.loc))
                    + jnp.sum(jnp.square(out.conf))
                    + jnp.sum(jnp.square(out.obj))) * 1e-3
        return loss

    gs = jax.grad(make_loss(net_std))(v["params"])
    gp = jax.grad(make_loss(net_pk))(v["params"])
    flat_s = jax.tree_util.tree_leaves_with_path(gs)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(gp))
    for path, g1 in flat_s:
        g2 = flat_p[path]
        denom = np.maximum(np.max(np.abs(np.asarray(g1))), 1e-8)
        np.testing.assert_allclose(
            np.asarray(g2) / denom, np.asarray(g1) / denom,
            rtol=0, atol=2e-4,
            err_msg=jax.tree_util.keystr(path))
