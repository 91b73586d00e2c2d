"""Orbax-backed checkpointing of (params, opt_state, step, epoch, extra_vars).

Replaces the reference's tf.train.Checkpoint/CheckpointManager
(transformer.py:890-900, 941-955) with Orbax. Layout parity: checkpoints live
inside the logdir next to the ``config.yml`` snapshot and the ``train/``
events directory, with ``max_to_keep`` retention; resuming restores both
weights and optimizer state.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from composer_tpu.exceptions import CheckpointError

CHECKPOINT_SUBDIR = "checkpoints"


class CheckpointManager:
    def __init__(self, logdir, max_to_keep: int = 3):
        self.directory = (Path(logdir) / CHECKPOINT_SUBDIR).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._manager = ocp.CheckpointManager(
            str(self.directory),
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
        )

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        self._manager.save(int(step), args=ocp.args.StandardSave(state))
        if wait:
            self._manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._manager.latest_step()

    def restore(self, abstract_state: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self.latest_step()
        if step is None:
            raise CheckpointError(f"No checkpoint found in '{self.directory}'.")
        restored = self._manager.restore(
            int(step), args=ocp.args.StandardRestore(abstract_state)
        )
        logging.info("Model restored from '%s' (step=%d).", self.directory, step)
        return restored

    def wait(self) -> None:
        self._manager.wait_until_finished()

    def close(self) -> None:
        self._manager.wait_until_finished()
        self._manager.close()


def abstract_like(pytree):
    """Shape/dtype skeleton of a pytree, for StandardRestore targets.

    Shardings are preserved when present so restoring a tensor-parallel
    template places each weight directly on its mesh shards (no
    host-gather-then-reshard round trip).
    """

    def skeleton(x):
        if not hasattr(x, "shape"):
            return x
        sharding = getattr(x, "sharding", None)
        if sharding is not None and hasattr(sharding, "mesh"):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return jax.ShapeDtypeStruct(x.shape, x.dtype)

    return jax.tree_util.tree_map(skeleton, pytree)
