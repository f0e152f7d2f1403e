"""int8 serving path: Conv2d quant math + end-to-end model closeness."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ct_tpu.config import TINY_64, resolve_task
from ct_tpu.models import build_net
from ct_tpu.models.fold_bn import fold_variables
from ct_tpu.models.layers import Conv2d
from ct_tpu.models.quantize import calibrate, quantize_variables


def test_conv2d_float_path_matches_nn_conv():
    """The drop-in must be numerically identical to flax nn.Conv."""
    from flax import linen as nn

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 8).astype(np.float32))
    ours = Conv2d(12, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                  kernel_dilation=(1, 1), use_bias=True)
    theirs = nn.Conv(12, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                     use_bias=True)
    v = ours.init(jax.random.PRNGKey(0), x)
    a = ours.apply(v, x)
    b = theirs.apply(v, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_conv2d_int8_close_to_float():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 32).astype(np.float32))
    conv = Conv2d(24, (3, 3), padding=((1, 1), (1, 1)))
    v = conv.init(jax.random.PRNGKey(0), x)
    ref = conv.apply(v, x)

    quant = quantize_variables(
        v["params"],
        {"act_absmax": (np.float32(np.abs(np.asarray(x)).max()),)},
    )
    # single conv: quantize_variables walks a tree whose root IS the conv
    assert "kernel_int8" not in quant  # root-level conv has no name key

    # build by hand for a single module
    w = np.asarray(v["params"]["kernel"], np.float32)
    w_s = np.abs(w).reshape(-1, w.shape[-1]).max(0) / 127.0
    q = {
        "act_scale": np.float32(np.abs(np.asarray(x)).max() / 127.0),
        "kernel_int8": np.clip(np.rint(w / w_s), -127, 127).astype(np.int8),
        "kernel_scale": w_s.astype(np.float32),
    }
    got = conv.apply({"params": v["params"], "quant": q}, x)
    err = np.abs(np.asarray(got) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.02, err.max() / scale


def test_quantized_tiny_model_close_and_calibrated():
    task = resolve_task(2, "transfer", "ours", "VOC")
    net = build_net(task, 64)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 50)

    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         train=False)
    folded = fold_variables(variables)
    fnet = dataclasses.replace(net, fold_bn=True)
    ref = fnet.apply(folded, images, train=False)

    calib = calibrate(fnet, folded, [images])
    quant = quantize_variables(folded["params"], calib)
    # vgg + Norm + extras quantized; heads skipped
    assert "vgg_0" in quant and "Norm" in quant and "extras_0" in quant
    assert not any(k.startswith(("loc_", "conf_", "obj_")) for k in quant)

    got = fnet.apply(dict(folded, quant=quant), images, train=False)
    # compare pre-CT conf features + loc + obj (same score space)
    for name in ("loc", "obj", "conf_feat"):
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(got, name))
        denom = np.abs(a).max()
        rel = np.abs(a - b).max() / denom
        assert rel < 0.15, (name, rel)
        # correlation stays essentially 1
        cc = np.corrcoef(a.ravel(), b.ravel())[0, 1]
        assert cc > 0.99, (name, cc)


def test_int8_conf_heads_and_bf16_scores_serving_path():
    """SKIP_LOC_OBJ also quantizes the conf heads (loc/obj stay float) and
    the fold_bn serving model emits conf/obj in the compute dtype."""
    from ct_tpu.models.quantize import SKIP_LOC_OBJ

    task = resolve_task(2, "transfer", "ours", "VOC")
    net = build_net(task, 64)
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 50)

    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         train=False)
    folded = fold_variables(variables)
    fnet = dataclasses.replace(net, fold_bn=True)
    ref = fnet.apply(folded, images, train=False)

    calib = calibrate(fnet, folded, [images])
    quant = quantize_variables(folded["params"], calib, skip=SKIP_LOC_OBJ)
    assert any(k.startswith("conf_") for k in quant)
    assert not any(k.startswith(("loc_", "obj_")) for k in quant)

    got = fnet.apply(dict(folded, quant=quant), images, train=False)
    a = np.asarray(ref.conf_feat)
    b = np.asarray(got.conf_feat)
    rel = np.abs(a - b).max() / np.abs(a).max()
    assert rel < 0.15, rel
    assert np.corrcoef(a.ravel(), b.ravel())[0, 1] > 0.99
    # loc path identical to the default-skip quantization (same backbone
    # quant; only the conf head convs changed, which loc never sees)
    quant_def = quantize_variables(folded["params"], calib)
    got_def = fnet.apply(dict(folded, quant=quant_def), images, train=False)
    np.testing.assert_array_equal(np.asarray(got_def.loc),
                                  np.asarray(got.loc))

    # serving score dtype: fold_bn + bf16 keeps conf/obj in bf16, loc f32
    bnet = dataclasses.replace(net, fold_bn=True, dtype=jnp.bfloat16)
    preds = bnet.apply(dict(folded, quant=quant), images, train=False)
    assert preds.conf.dtype == jnp.bfloat16
    assert preds.obj.dtype == jnp.bfloat16
    assert preds.loc.dtype == jnp.float32
    # the train-path model still emits f32 scores
    tpreds = net.apply(variables, images, train=False)
    assert tpreds.conf.dtype == jnp.float32


def test_pool_chain_quantization_is_bit_exact():
    """Chained (producer emits int8 at consumer scale, pool on int8) vs
    unchained int8 serving must be BIT-identical: round/clip are monotone,
    so they commute with relu and max-pool."""
    from ct_tpu.models.rfbnet import vgg_pool_chains

    task = resolve_task(2, "transfer", "ours", "VOC")
    net = build_net(task, 64)
    rng = np.random.RandomState(2)
    images = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 50)

    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         train=False)
    folded = fold_variables(variables)
    fnet = dataclasses.replace(net, fold_bn=True)
    calib = calibrate(fnet, folded, [images])

    chains = vgg_pool_chains(64)
    assert chains, "tiny plan must still have pool boundaries"
    q_plain = quantize_variables(folded["params"], calib)
    q_chain = quantize_variables(folded["params"], calib, chains=chains)
    assert any("out_scale" in q_chain.get(p, {}) for p, _ in chains)

    a = fnet.apply(dict(folded, quant=q_plain), images, train=False)
    b = fnet.apply(dict(folded, quant=q_chain), images, train=False)
    for name in ("loc", "conf", "obj", "conf_feat"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=name)


def test_serving_fused_ct_path_matches_unfused(monkeypatch):
    """fold_bn + use_pallas_ct routes through the fused serving CT kernel
    (class-major conf); outputs must match the unfused fold_bn path for
    both transfer and incre heads (interpret-mode Pallas on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    for setting in ("transfer", "incre"):
        task = resolve_task(2, setting, "ours", "VOC")
        net = build_net(task, 64)
        rng = np.random.RandomState(3)
        images = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 9)
        variables = net.init(jax.random.PRNGKey(0),
                             jnp.zeros((1, 64, 64, 3)), train=False)
        # non-degenerate CT params (fresh init has Wz=0, OBJ tiny)
        variables["params"]["Wz"] = jnp.asarray(
            rng.randn(task.src_cls_dim).astype(np.float32) * 0.3)
        variables["params"]["OBJ_Target"] = jnp.asarray(
            rng.randn(*variables["params"]["OBJ_Target"].shape)
            .astype(np.float32))
        folded = fold_variables(variables)

        ref_net = dataclasses.replace(net, fold_bn=True)
        ref = ref_net.apply(folded, images, train=False)
        fused_net = dataclasses.replace(net, fold_bn=True,
                                        use_pallas_ct=True)
        with pltpu.force_tpu_interpret_mode():
            got = fused_net.apply(folded, images, train=False)
        np.testing.assert_allclose(
            np.asarray(got.conf), np.asarray(ref.conf),
            rtol=5e-4, atol=5e-4, err_msg=setting)
        np.testing.assert_array_equal(np.asarray(got.loc),
                                      np.asarray(ref.loc))
