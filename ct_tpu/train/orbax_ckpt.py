"""Orbax-backed checkpointing option (multi-host, async-capable).

The default ``ct_tpu.train.checkpointer.Checkpointer`` is a single-host
synchronous msgpack writer preserving the reference's exact semantics
(tag file, naming, phase rules — /root/reference/utils/checkpointer.py).
This module offers the production-scale alternative on top of
``orbax.checkpoint``: sharded-array-aware, multi-host coordinated, and
non-blocking (the device→host gather happens once, serialization continues
in a background thread while training proceeds).

The interface mirrors ``Checkpointer``'s save/resume surface so ``train.py``
can switch via ``--orbax``; the ``last_checkpoint`` tag-file convention is
kept so ``--resume`` and the eval CLI work identically against either
backend.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional

logger = logging.getLogger(__name__)

LAST_CHECKPOINT_TAG = "last_checkpoint"


class OrbaxCheckpointer:
    """Save/resume train state through an orbax CheckpointManager."""

    def __init__(self, save_dir: str, max_to_keep: Optional[int] = None,
                 async_save: bool = True):
        import orbax.checkpoint as ocp

        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.save_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                enable_async_checkpointing=async_save,
                create=True,
            ),
        )

    # -- save ---------------------------------------------------------------

    def save(self, name: str, params: Any, batch_stats: Any,
             opt_state: Any = None, iteration: int = 0) -> str:
        """Non-blocking save; ``name`` is recorded in the tag file for the
        reference-style resume flow (step directories are orbax-managed)."""
        import orbax.checkpoint as ocp
        from flax import serialization

        payload = {
            "model": {"params": params, "batch_stats": batch_stats},
            "opt_state": (serialization.to_state_dict(opt_state)
                          if opt_state is not None else {}),
            "iteration": iteration,
        }
        self._mgr.save(int(iteration) + 1,
                       args=ocp.args.StandardSave(payload))
        with open(self._tag_path(), "w") as f:
            f.write(str(int(iteration) + 1))
        logger.info("Queued orbax checkpoint for step %d", iteration)
        return os.path.join(self.save_dir, str(int(iteration) + 1))

    def wait(self):
        """Block until queued async saves are durable."""
        self._mgr.wait_until_finished()

    # -- load ---------------------------------------------------------------

    def _tag_path(self) -> str:
        return os.path.join(self.save_dir, LAST_CHECKPOINT_TAG)

    def has_checkpoint(self) -> bool:
        return self._mgr.latest_step() is not None

    def resume(self, init_params: Any, init_batch_stats: Any,
               init_opt_state: Any = None) -> Dict[str, Any]:
        """Restore the latest step (matching the provided tree structures);
        returns ``{params, batch_stats, opt_state, iteration}`` like
        ``Checkpointer.resume_or_load``."""
        import orbax.checkpoint as ocp
        from flax import serialization

        step = self._mgr.latest_step()
        if step is None:
            return {
                "params": init_params,
                "batch_stats": init_batch_stats,
                "opt_state": None,
                "iteration": -1,
            }
        template = {
            "model": {"params": init_params,
                      "batch_stats": init_batch_stats},
            "opt_state": (serialization.to_state_dict(init_opt_state)
                          if init_opt_state is not None else {}),
            "iteration": 0,
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        opt = None
        if init_opt_state is not None:
            opt = serialization.from_state_dict(
                init_opt_state, restored["opt_state"]
            )
        return {
            "params": restored["model"]["params"],
            "batch_stats": restored["model"]["batch_stats"],
            "opt_state": opt,
            "iteration": int(restored["iteration"]),
        }

    def close(self):
        self._mgr.close()
