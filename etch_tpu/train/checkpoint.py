"""Checkpoint save/restore via orbax.

The reference only ever saves weights (`torch.save(state_dict)` per epoch,
src/train.py:248-252) and never optimizer state; resume is a commented-out
stub (src/train_mixed.py:483-487).  Here we checkpoint params + batch_stats +
optimizer state + step so training is actually resumable.
"""

from __future__ import annotations

import hashlib
import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from etch_tpu.train.state import TrainState


def tree_signature(params: Any) -> str:
    """Stable hash of the param-tree structure (keypaths + shapes + dtypes).

    Guards checkpoint restore against silent tree migrations: the round-1
    nn.scan refactor changed the tree and would have made any older
    checkpoint fail to load *silently* (PARITY.md §5).  The signature is
    saved alongside the arrays and checked on restore.
    """
    rows = []
    for kp, leaf in jax.tree_util.tree_leaves_with_path(params):
        rows.append(
            f"{jax.tree_util.keystr(kp)}:{tuple(leaf.shape)}:{leaf.dtype}"
        )
    digest = hashlib.sha256("\n".join(sorted(rows)).encode()).hexdigest()
    return digest[:16]


def _manager(directory: str, max_to_keep: int = 5) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep),
    )


def save_train_state(
    directory: str, step: int, state: TrainState, config_json: str = ""
) -> None:
    mgr = _manager(directory)
    meta = {
        "tree_signature": tree_signature(state.params),
        "config": config_json,
    }
    mgr.save(
        step,
        args=ocp.args.Composite(
            params=ocp.args.StandardSave(state.params),
            batch_stats=ocp.args.StandardSave(dict(state.batch_stats)),
            opt_state=ocp.args.StandardSave(state.opt_state),
            meta=ocp.args.JsonSave(meta),
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
    # tree-version guard: refuse a silent partial/mismatched restore
    try:
        meta = mgr.restore(
            step, args=ocp.args.Composite(meta=ocp.args.JsonRestore())
        )["meta"]
    except Exception:
        meta = None  # pre-guard checkpoint (no meta item): restore as before
    if meta is not None:
        want = tree_signature(template.params)
        got = meta.get("tree_signature")
        if got != want:
            mgr.close()
            raise ValueError(
                f"checkpoint param-tree signature mismatch: checkpoint has "
                f"{got}, current model builds {want}. The model architecture "
                f"(or flax module tree) changed since this checkpoint was "
                f"written; load it with the config it was trained under "
                f"(saved alongside: meta['config'])."
            )
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


def restore_params(
    directory: str, expected_signature: Optional[str] = None
) -> Tuple[Any, Any]:
    d = os.path.abspath(directory)
    # training-CheckpointManager layout (<dir>/<step>/{params,batch_stats,…},
    # written by save_train_state): restore the latest step's inference
    # subset, so eval/infer --model_path accepts a training checkpoint
    # directory directly (reference loads the same .pth for train and eval,
    # src/eval.py:308-309).
    steps = [
        int(x) for x in (os.listdir(d) if os.path.isdir(d) else [])
        if x.isdigit() and os.path.isdir(os.path.join(d, x, "params"))
    ]
    if steps:
        mgr = _manager(d)
        # same tree-version guard as restore_train_state: a checkpoint from
        # an older architecture must fail HERE with an explicit message, not
        # later inside flax apply (or silently, if shapes coincide)
        if expected_signature is not None:
            try:
                meta = mgr.restore(
                    max(steps),
                    args=ocp.args.Composite(meta=ocp.args.JsonRestore()),
                )["meta"]
            except Exception:
                meta = None  # pre-guard checkpoint: restore as before
            got = (meta or {}).get("tree_signature")
            if got is not None and got != expected_signature:
                mgr.close()
                raise ValueError(
                    f"checkpoint param-tree signature mismatch: checkpoint "
                    f"has {got}, current model builds {expected_signature}. "
                    f"The model architecture changed since this checkpoint "
                    f"was written; load it with the config it was trained "
                    f"under (saved alongside: meta['config'] = "
                    f"{(meta or {}).get('config', '')[:200]})."
                )
        restored = mgr.restore(
            max(steps),
            args=ocp.args.Composite(
                params=ocp.args.StandardRestore(),
                batch_stats=ocp.args.StandardRestore(),
            ),
        )
        mgr.close()
        return restored["params"], restored.get("batch_stats", {})
    ckptr = ocp.StandardCheckpointer()
    path = os.path.join(d, "weights")
    if not os.path.exists(path):
        path = d  # allow direct path
    restored = ckptr.restore(path)
    return restored["params"], restored.get("batch_stats", {})
