"""Training checkpoint/restore (orbax).

The reference's checkpointing is pickle caches between pipeline stages
(SURVEY.md §5); a training loop needs real state checkpoints: params,
optimizer state, and step, with atomic versioned saves and latest-step
restore.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp


def make_checkpoint_manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
    return ocp.CheckpointManager(directory, options=options)


def save_train_state(mgr: ocp.CheckpointManager, step: int, params: Any,
                     opt_state: Any) -> None:
    mgr.save(step, args=ocp.args.Composite(
        params=ocp.args.StandardSave(params),
        opt_state=ocp.args.StandardSave(opt_state),
    ))
    mgr.wait_until_finished()


def restore_train_state(mgr: ocp.CheckpointManager, params_like: Any,
                        opt_state_like: Any,
                        step: Optional[int] = None) -> Tuple[int, Any, Any]:
    """Restore (step, params, opt_state); shapes/dtypes from the *_like trees."""
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError("no checkpoint found")
    restored = mgr.restore(step, args=ocp.args.Composite(
        params=ocp.args.StandardRestore(jax.tree.map(lambda x: x, params_like)),
        opt_state=ocp.args.StandardRestore(opt_state_like),
    ))
    return step, restored["params"], restored["opt_state"]
