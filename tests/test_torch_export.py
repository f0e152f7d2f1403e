"""Flax→torch exporter (ct_tpu/models/torch_export.py).

The exporter is the bridge for real-capacity parity evidence: train on TPU,
export ``.pth``, evaluate through the reference stack
(/root/reference/test.py:96-175). These tests pin (a) exact roundtrip
through the importer and (b) a strict ``load_state_dict`` into the actual
reference model followed by forward parity.
"""

import types

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import has_reference, import_reference
from ct_tpu.config import resolve_task
from ct_tpu.models import build_net
from ct_tpu.models.rfbnet import eval_scores
from ct_tpu.models.torch_export import save_pth, variables_to_torch_state
from ct_tpu.models.torch_import import load_pth, torch_state_to_variables


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v)
    return out


def _init_variables(task, size=300):
    net = build_net(task, size)
    v = net.init(jax.random.PRNGKey(0),
                 jnp.zeros((1, size, size, 3)), train=False)
    return net, {"params": v["params"], "batch_stats": v["batch_stats"]}


@pytest.mark.parametrize("phase,setting", [(1, "transfer"), (2, "transfer"),
                                           (2, "incre")])
def test_roundtrip_through_importer(phase, setting):
    task = resolve_task(phase, setting, "ours", "VOC")
    _, variables = _init_variables(task)
    state = variables_to_torch_state(variables)
    back = torch_state_to_variables(state)

    a = _flat(variables["params"])
    b = _flat(back["params"])
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    sa = _flat(variables["batch_stats"])
    sb = _flat(back["batch_stats"])
    assert set(sa) == set(sb)
    for k in sa:
        np.testing.assert_array_equal(sa[k], sb[k], err_msg=k)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_strict_load_and_forward_parity():
    """Exported state dict loads into the reference model with
    ``strict=True`` (zero missing/unexpected keys) and reproduces the flax
    forward bit-for-bit at fp32 tolerance."""
    import torch

    import_reference()
    from models.RFB_Net_vgg import build_net as ref_build

    task = resolve_task(2, "transfer", "ours", "VOC")
    net, variables = _init_variables(task)
    state = {k: torch.from_numpy(np.ascontiguousarray(v))
             for k, v in variables_to_torch_state(variables).items()}

    args = types.SimpleNamespace(method="ours", phase=2, setting="transfer")
    torch.manual_seed(0)
    model = ref_build(args, 300, task.src_cls_dim)
    model.device = "cpu"
    model.load_state_dict(state, strict=True)
    model.eval()

    rng = np.random.RandomState(0)
    img = rng.randn(2, 300, 300, 3).astype(np.float32) * 40

    preds = net.apply(variables, jnp.asarray(img), train=False)
    conf_s, obj_s = eval_scores(preds)  # torch eval branch softmaxes
    with torch.no_grad():
        t_loc, t_conf, t_obj = model(
            torch.from_numpy(np.transpose(img, (0, 3, 1, 2)))
        )
    np.testing.assert_allclose(np.asarray(preds.loc), t_loc.numpy(),
                               rtol=1e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(conf_s), t_conf.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(obj_s), t_obj.numpy(),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_save_pth_loads_via_importer(tmp_path):
    task = resolve_task(2, "incre", "ours", "VOC")
    _, variables = _init_variables(task)
    path = str(tmp_path / "model_export.pth")
    save_pth(path, variables, iteration=123)

    back = load_pth(path)
    a = _flat(variables["params"])
    b = _flat(back["params"])
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
