"""Checkpoint save/restore via orbax.

The reference only ever saves weights (`torch.save(state_dict)` per epoch,
src/train.py:248-252) and never optimizer state; resume is a commented-out
stub (src/train_mixed.py:483-487).  Here we checkpoint params + batch_stats +
optimizer state + step so training is actually resumable.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from etch_tpu.train.state import TrainState


def _manager(directory: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_train_state(directory: str, step: int, state: TrainState) -> None:
    mgr = _manager(directory)
    mgr.save(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(state.params),
            batch_stats=ocp.args.StandardSave(dict(state.batch_stats)),
            opt_state=ocp.args.StandardSave(state.opt_state),
        ),
    )
    mgr.wait_until_finished()
    mgr.close()


def restore_train_state(
    directory: str, template: TrainState, step: Optional[int] = None
) -> Tuple[TrainState, int]:
    mgr = _manager(directory)
    step = step if step is not None else mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no checkpoint under {directory}")
    restored = mgr.restore(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardRestore(template.params),
            batch_stats=ocp.args.StandardRestore(dict(template.batch_stats)),
            opt_state=ocp.args.StandardRestore(template.opt_state),
        ),
    )
    mgr.close()
    state = TrainState(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(step, jax.numpy.int32),
    )
    return state, int(step)


def save_params(directory: str, params: Any, batch_stats: Any) -> None:
    """Weights-only export (parity with the reference's .pth files)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.join(os.path.abspath(directory), "weights"),
        {"params": params, "batch_stats": dict(batch_stats)},
    )
    ckptr.wait_until_finished()


def restore_params(directory: str) -> Tuple[Any, Any]:
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(os.path.abspath(directory), "weights")
    if not os.path.exists(path):
        path = os.path.abspath(directory)  # allow direct path
    restored = ckptr.restore(path)
    return restored["params"], restored.get("batch_stats", {})
