"""Checkpointing (orbax) — full train-state save/resume.

The reference only saves best-mAP `model.state_dict()` and has NO resume
(engine/processor.py:157-168; CHECKPOINT_PERIOD exists but is unused —
SURVEY §5).  Here the FULL train state (params + BN stats + optimizer state
+ step + center state) is checkpointed, giving real resume capability.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory: str) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=3, create=True),
    )


def save_checkpoint(directory: str, state, step: int):
    """Save the full train state.

    Multi-host: EVERY process must call this (orbax's save performs global
    barriers; a primary-only call deadlocks rank 0 against ranks that moved
    on — review round 4).  Orbax itself elects the writer per shard.
    """
    mgr = _manager(directory)
    mgr.save(step, args=ocp.args.StandardSave(state))
    mgr.wait_until_finished()
    mgr.close()


def restore_checkpoint(directory: str, target, step: Optional[int] = None):
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
    if step is None:
        mgr.close()
        raise FileNotFoundError(f"No checkpoint found in {directory}")
    restored = mgr.restore(step, args=ocp.args.StandardRestore(target))
    mgr.close()
    return restored
