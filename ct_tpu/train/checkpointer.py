"""Checkpoint save/load with the reference's resume semantics + .pth interop.

Capability parity with ``DetectionCheckpointer``/``PeriodicCheckpointer``
(/root/reference/utils/checkpointer.py): ``model_{iter:07d}`` +
``model_final`` naming (:332-337), the ``last_checkpoint`` tag file
(:105-126, tolerating concurrent deletion), resume-or-load dispatch
(:128-143), shape-mismatch key skipping (:184-195, what lets a 60-class
phase-1 conf head load into a phase-2 model), the phase-2 rule of dropping
optimizer state + iteration so fine-tuning restarts at iter 0 (:285-290),
and reading reference ``.pth`` files (both full checkpoints and the
``vgg16_reducedfc`` basenet, with its ``base.`` prefixing, :282-283).

Storage format: msgpack via ``flax.serialization`` — a dict
``{model: {params, batch_stats}, opt_state, iteration}``. Files end in
``.ckpt``; ``.pth``/``.pkl`` paths route through the torch importer.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ct_tpu.models.torch_import import load_pth, merge_variables

logger = logging.getLogger(__name__)

LAST_CHECKPOINT_TAG = "last_checkpoint"


def _to_numpy_tree(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


class Checkpointer:
    def __init__(self, save_dir: str):
        self.save_dir = save_dir
        os.makedirs(save_dir, exist_ok=True)

    # -- save --------------------------------------------------------------

    def save(
        self,
        name: str,
        params: Any,
        batch_stats: Any,
        opt_state: Any = None,
        iteration: int = 0,
    ) -> str:
        payload = {
            "model": {
                "params": _to_numpy_tree(params),
                "batch_stats": _to_numpy_tree(batch_stats),
            },
            "opt_state": _to_numpy_tree(opt_state)
            if opt_state is not None else None,
            "iteration": int(iteration),
        }
        path = os.path.join(self.save_dir, f"{name}.ckpt")
        with open(path, "wb") as f:
            # to_state_dict turns optax NamedTuple states into plain dicts;
            # loading restores structure via from_state_dict with a target
            f.write(serialization.msgpack_serialize(
                serialization.to_state_dict(payload)))
        with open(self._tag_path(), "w") as f:
            f.write(os.path.basename(path))
        logger.info("Saved checkpoint to %s", path)
        return path

    # -- load --------------------------------------------------------------

    def _tag_path(self) -> str:
        return os.path.join(self.save_dir, LAST_CHECKPOINT_TAG)

    def has_checkpoint(self) -> bool:
        return os.path.exists(self._tag_path())

    def get_checkpoint_file(self) -> Optional[str]:
        try:
            with open(self._tag_path()) as f:
                name = f.read().strip()
        except OSError:
            # tag file may be deleted concurrently — treat as no checkpoint
            return None
        return os.path.join(self.save_dir, name)

    def load(self, path: str) -> Dict[str, Any]:
        """Load any supported checkpoint into a plain dict payload."""
        if path.endswith((".pth", ".pkl")):
            variables = load_pth(path)
            return {
                "model": {
                    "params": variables.get("params", {}),
                    "batch_stats": variables.get("batch_stats", {}),
                },
                "opt_state": None,
                "iteration": -1,
            }
        with open(path, "rb") as f:
            return serialization.msgpack_restore(f.read())

    def resume_or_load(
        self,
        path: Optional[str],
        init_params: Any,
        init_batch_stats: Any,
        resume: bool = False,
        load_optimizer: bool = True,
    ) -> Dict[str, Any]:
        """Reference dispatch: if resume and a tag exists, use it (and keep
        optimizer/iteration); else load ``path`` as weights only.

        Returns ``{params, batch_stats, opt_state|None, iteration}`` with
        shape-mismatched/missing keys falling back to the provided inits.
        """
        use_path, use_opt = path, False
        if resume and self.has_checkpoint():
            use_path = self.get_checkpoint_file()
            use_opt = load_optimizer
        if not use_path or not os.path.exists(use_path):
            logger.info("No checkpoint found; training from scratch")
            return {
                "params": init_params,
                "batch_stats": init_batch_stats,
                "opt_state": None,
                "iteration": -1,
            }

        payload = self.load(use_path)
        merged, report = merge_variables(
            {"params": init_params, "batch_stats": init_batch_stats},
            payload["model"],
        )
        skipped = [k for k, v in report.items() if v == "shape_mismatch"]
        missing = [k for k, v in report.items() if v == "missing"]
        if skipped:
            logger.warning(
                "Skipped %d shape-mismatched keys (e.g. %s)",
                len(skipped), skipped[:4],
            )
        if missing:
            logger.info(
                "%d keys not in checkpoint, kept init (e.g. %s)",
                len(missing), missing[:4],
            )
        return {
            "params": merged["params"],
            "batch_stats": merged["batch_stats"],
            "opt_state": payload.get("opt_state") if use_opt else None,
            "iteration": payload.get("iteration", -1) if use_opt else -1,
        }


class PeriodicCheckpointer:
    """Save every ``period`` iterations plus ``model_final`` at max_iter."""

    def __init__(self, checkpointer: Checkpointer, period: int,
                 max_iter: int):
        self.checkpointer = checkpointer
        self.period = period
        self.max_iter = max_iter

    def should_save(self, iteration: int) -> bool:
        return ((iteration + 1) % self.period == 0
                or iteration >= self.max_iter - 1)

    def step(self, iteration: int, state_fn=None, **state):
        """``state_fn`` (zero-arg → state dict) is only invoked when a save
        actually triggers, so callers can defer the device→host transfer of
        the parameter tree instead of paying it every iteration."""
        if not self.should_save(iteration):
            return
        if state_fn is not None:
            state = dict(state_fn(), **state)
        if (iteration + 1) % self.period == 0:
            self.checkpointer.save(
                f"model_{iteration:07d}", iteration=iteration, **state
            )
        if iteration >= self.max_iter - 1:
            self.checkpointer.save(
                "model_final", iteration=iteration, **state
            )
