"""OBJ_Target initialization (ct_tpu/train/reweight.py).

Parity target: ``init_reweight`` (/root/reference/train.py:252-286). The
reference runs the embedding-collection forwards while ``model.train()`` is
active (train.py:263 is called from inside ``train()``), so BatchNorm uses
batch statistics and updates its running averages — the tests below pin
both effects.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ct_tpu.config import TINY_64, resolve_task
from ct_tpu.data.targets import pad_targets
from ct_tpu.models import build_net
from ct_tpu.ops.matching import match_batch
from ct_tpu.ops.priors import prior_boxes
from ct_tpu.train.reweight import init_reweight, make_accumulate_step
from ct_tpu.train.step import TrainState, init_train_state


@dataclasses.dataclass
class _Args:
    init_iter: int = 3


class _Loader:
    def __init__(self, batches):
        self.batches = batches
        self.i = 0

    def next(self):
        b = self.batches[self.i % len(self.batches)]
        self.i += 1
        return b


def _batch(rng, b=2, size=64, max_objs=8):
    annos = []
    for _ in range(b):
        n = rng.randint(1, 4)
        mins = rng.uniform(0, 0.5, size=(n, 2))
        boxes = np.concatenate([mins, mins + 0.4], axis=1)
        lab = rng.randint(1, 20, size=(n, 1)).astype(np.float32)
        annos.append(
            np.hstack([boxes, lab, np.ones((n, 1))]).astype(np.float32))
    t = pad_targets(annos, max_objs)
    return {
        "image": rng.randn(b, size, size, 3).astype(np.float32) * 30,
        "boxes": t.boxes, "labels": t.labels,
        "weights": t.weights, "valid": t.valid,
    }


def test_init_reweight_installs_unit_prototypes_and_updates_bn():
    task = resolve_task(2, "transfer", "ours", "VOC")
    net = build_net(task, 64)
    priors = prior_boxes(TINY_64)
    state = init_train_state(net, None, jax.random.PRNGKey(0), 64)

    rng = np.random.RandomState(0)
    loader = _Loader([_batch(rng) for _ in range(3)])
    new = init_reweight(_Args(), net, state, loader, priors, task)

    w = np.asarray(new.params["OBJ_Target"])
    assert w.shape == (task.num_classes - 1, task.src_cls_dim)
    norms = np.linalg.norm(w, axis=1)
    live = norms > 1e-6  # classes with positives get unit prototypes
    assert live.any()
    np.testing.assert_allclose(norms[live], 1.0, rtol=1e-5)

    # train-mode forward must have advanced the BN running statistics
    # (reference momentum 0.01 per batch — train.py:263 under model.train())
    before = jax.tree_util.tree_leaves(state.batch_stats)
    after = jax.tree_util.tree_leaves(new.batch_stats)
    changed = [
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(before, after)
    ]
    assert any(changed), "batch_stats unchanged: forward ran in eval mode"

    # everything except OBJ_Target / batch_stats is untouched
    for k, v in state.params.items():
        if k == "OBJ_Target":
            continue
        np.testing.assert_array_equal(
            np.asarray(jax.tree_util.tree_leaves(v)[0]),
            np.asarray(jax.tree_util.tree_leaves(new.params[k])[0]),
        )


def test_accumulate_step_uses_batch_statistics():
    """The accumulated embeddings must come from a train-mode forward
    (batch statistics), not the running averages."""
    task = resolve_task(2, "transfer", "ours", "VOC")
    net = build_net(task, 64)
    priors = prior_boxes(TINY_64)
    state = init_train_state(net, None, jax.random.PRNGKey(1), 64)
    batch = {k: jnp.asarray(v)
             for k, v in _batch(np.random.RandomState(1)).items()}

    step = make_accumulate_step(net, priors, num_fg_classes=20)
    sums, counts, stats = step(state.params, state.batch_stats, batch)

    # oracle: the same reduction computed from an explicit train-mode apply
    preds, mutated = net.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        batch["image"], train=True, mutable=["batch_stats"],
    )
    matched = match_batch(batch["boxes"], batch["labels"], batch["weights"],
                          batch["valid"], priors, 0.5)
    feats = preds.conf_feat
    unit = feats / jnp.maximum(
        jnp.linalg.norm(feats, axis=-1, keepdims=True), 1e-12)
    onehot = jax.nn.one_hot(matched.cls_t - 1, 20, dtype=feats.dtype) * (
        matched.cls_t > 0)[..., None]
    np.testing.assert_allclose(
        np.asarray(sums), np.asarray(jnp.einsum("bpc,bpd->cd", onehot, unit)),
        rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(counts),
                               np.asarray(onehot.sum((0, 1))), rtol=1e-6)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(stats),
        jax.tree_util.tree_leaves_with_path(mutated["batch_stats"]),
    ):
        # atol: fresh running means are 0.01×(near-zero batch mean) ≈ 1e-9;
        # jit vs eager reduction order makes them differ at ~3e-9 absolute
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                                   atol=1e-7,
                                   err_msg=jax.tree_util.keystr(pa))
