"""Full-model forward parity: reference torch RFBNet vs ct_tpu Flax RFBNet.

Builds the reference model (random init, seeded), exports its state_dict,
imports it through ct_tpu.models.torch_import, and compares forward outputs
on the same input. This is the strongest structural check we have without
released checkpoints: every conv/BN/pool/head and the CT attention must line
up in layout, padding, dilation and ordering for outputs to match.
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
from ct_tpu.models.torch_import import torch_state_to_variables

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference not mounted"
)


def build_reference(task, size):
    import torch

    import_reference()
    from models.RFB_Net_vgg import build_net as ref_build

    args = types.SimpleNamespace(
        method=task.method, phase=task.phase, setting=task.setting
    )
    torch.manual_seed(0)
    model = ref_build(args, size, task.src_cls_dim)
    model.device = "cpu"
    model.eval()
    # randomize BN running stats + CT params so parity is non-trivial
    sd = model.state_dict()
    gen = torch.Generator().manual_seed(1)
    for k, v in sd.items():
        if k.endswith("running_mean"):
            sd[k] = torch.randn(v.shape, generator=gen) * 0.1
        elif k.endswith("running_var"):
            sd[k] = torch.rand(v.shape, generator=gen) + 0.5
        elif k == "Wz" or k == "OBJ_Target.weight" or k.startswith("fc_base"):
            sd[k] = torch.randn(v.shape, generator=gen) * 0.1
    model.load_state_dict(sd)
    return model


@pytest.mark.parametrize(
    "phase,setting,dataset,size",
    [
        (1, "transfer", "VOC", 300),
        (2, "transfer", "VOC", 300),
        (2, "incre", "VOC", 300),
        (1, "transfer", "VOC", 512),
    ],
)
def test_forward_parity(phase, setting, dataset, size):
    import torch

    task = resolve_task(phase, setting, "ours", dataset)
    ref_model = build_reference(task, size)

    rng = np.random.RandomState(42)
    x = rng.randn(2, 3, size, size).astype(np.float32) * 10

    with torch.no_grad():
        ref_loc, ref_conf, ref_obj = ref_model(torch.from_numpy(x))

    net = build_net(task, size)
    variables = torch_state_to_variables(ref_model.state_dict())
    preds = net.apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        train=False,
    )
    conf_s, obj_s = eval_scores(preds)

    np.testing.assert_allclose(
        np.asarray(preds.loc), ref_loc.numpy(), rtol=1e-3, atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(obj_s), ref_obj.numpy(), rtol=1e-3, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(conf_s), ref_conf.numpy(), rtol=1e-3, atol=1e-4
    )


def test_import_covers_all_params():
    """Every reference tensor maps somewhere; every flax param gets covered
    (no silent fresh-init leaks) for the phase-2 transfer model."""
    import torch

    task = resolve_task(2, "transfer", "ours", "VOC")
    ref_model = build_reference(task, 300)
    variables = torch_state_to_variables(ref_model.state_dict())

    net = build_net(task, 300)
    init_vars = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 300, 300, 3)), train=False
    )

    def flat(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out.update(flat(v, prefix + (k,)))
            else:
                out["/".join(prefix + (k,))] = np.asarray(v)
        return out

    got_p = flat(variables["params"])
    want_p = flat(init_vars["params"])
    assert set(got_p) == set(want_p)
    for k in want_p:
        assert got_p[k].shape == want_p[k].shape, k

    got_s = flat(variables["batch_stats"])
    want_s = flat(init_vars["batch_stats"])
    assert set(got_s) == set(want_s)
