"""Full train-state checkpointing (exceeds the reference's save-only flow).

The reference writes only the latest model ``state_dict`` per epoch and
deletes the previous file; optimizer/epoch state is lost and there is no
resume (ex_audioset.py:216-220, SURVEY.md §5). Here a full TrainState
(params, batch_stats, optimizer state, step) plus the epoch counter is
checkpointed with orbax, keep-latest-k, with true resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def _manager(ckpt_dir: str, keep: int = 1):
    import orbax.checkpoint as ocp

    return ocp.CheckpointManager(
        os.path.abspath(ckpt_dir),
        options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
    )


def save_checkpoint(ckpt_dir: str, state, epoch: int, keep: int = 1) -> None:
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir, keep)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()


def latest_epoch(ckpt_dir: str) -> Optional[int]:
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    mgr = _manager(ckpt_dir)
    return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, state) -> Tuple[Any, int]:
    """Restore into the structure of ``state``; returns (state, next_epoch)."""
    import orbax.checkpoint as ocp

    mgr = _manager(ckpt_dir)
    step = mgr.latest_step()
    if step is None:
        return state, 0
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }
    restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=int(restored["step"]),
    )
    return state, step + 1


def export_weights(path: str, params, batch_stats) -> None:
    """Export inference weights (params + batch stats) as msgpack."""
    from flax import serialization

    payload = {"params": jax.tree.map(np.asarray, params),
               "batch_stats": jax.tree.map(np.asarray, batch_stats)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))


def load_weights(path: str) -> dict:
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
