"""Training checkpoint/resume via Orbax.

SURVEY.md §5.4: the reference "checkpoints" only its index artifacts (pickle
+ Qdrant dir); the TPU equivalent for *training* state is an Orbax pytree
checkpoint of {params, optimizer state, step}. Works with sharded params
(Orbax records shardings) and never pickles Python objects.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import jax
import orbax.checkpoint as ocp

from domain_rag_system_tpu.utils import get_logger

log = get_logger(__name__)


def save_train_state(trainer, ckpt_dir, keep: int = 3) -> Path:
    """Save a trainer's full state (params, opt_state, step) at its step."""
    path = Path(ckpt_dir).resolve()
    path.mkdir(parents=True, exist_ok=True)
    with ocp.CheckpointManager(
        path, options=ocp.CheckpointManagerOptions(max_to_keep=keep)
    ) as manager:
        manager.save(
            trainer.state.step,
            args=ocp.args.PyTreeSave({
                "params": trainer.state.params,
                "opt_state": trainer.state.opt_state,
            }),
        )
    log.info("saved train state @ step %d → %s", trainer.state.step, path)
    return path


def restore_train_state(trainer, ckpt_dir, step: Optional[int] = None):
    """Restore a trainer's state in place; returns the restored step."""
    path = Path(ckpt_dir).resolve()
    if trainer.state is None:
        trainer.init_state()
    with ocp.CheckpointManager(path) as manager:
        step = step if step is not None else manager.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
        template = {
            "params": trainer.state.params,
            "opt_state": trainer.state.opt_state,
        }
        restored = manager.restore(
            step,
            args=ocp.args.PyTreeRestore(
                template,
                restore_args=jax.tree_util.tree_map(
                    lambda v: ocp.ArrayRestoreArgs(sharding=getattr(v, "sharding", None)),
                    template,
                ),
            ),
        )
    state_cls = type(trainer.state)
    trainer.state = state_cls(restored["params"], restored["opt_state"], step)
    log.info("restored train state @ step %d from %s", step, path)
    return step
