"""Checkpointing (reference's three mechanisms, SURVEY §5):

1. Model weights: orbax save/restore of flax variable trees — replaces
   torch.save/state_dict (models/__init__.py:8-27, inference_utils.py:230).
2. Training resume: step-indexed checkpoints with optimizer state — the
   DeepSpeed save_checkpoint/load_checkpoint analogue
   (emb/utils/engines.py:95-111). Sharded arrays (e.g. the PartialFC class
   shard) round-trip with their shardings via orbax.
3. The per-video artifact cache lives in s2v_tpu.utils.cache.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_variables(path: str, variables: Any):
    """Save a flax variable tree (model weights)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, variables, force=True)
    ckptr.wait_until_finished()


def load_variables(path: str, like: Optional[Any] = None) -> Any:
    ocp = _ocp()
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, target=like)
    return ckptr.restore(path)


class TrainCheckpointer:
    """Step-indexed train-state checkpoints with retention, async save.

    save(step, state) / restore(step=None -> latest) — the
    CallBackModelCheckpoint + DeepSpeed-engine analogue.
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        ocp = _ocp()
        self._mgr = ocp.CheckpointManager(
            os.path.abspath(directory),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any):
        ocp = _ocp()
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        ocp = _ocp()
        step = self.latest_step() if step is None else step
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_like)
        )

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
