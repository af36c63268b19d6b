"""Native checkpointing (orbax): save/restore params & train state.

Replaces the reference's MindSpore ModelCheckpoint/CheckpointConfig stack
(stablediffusionv2/run_train.py:192-205): periodic saves with
keep_checkpoint_max GC, rank-0-only writes in multi-host settings, and
LoRA-style partial saves (trainable params only — the MindPet
TrainableParamsCheckPoint equivalent, wukong run_train.py:212-221).
Unlike the reference (which cannot resume optimizer state, SURVEY.md §5.4),
the full TrainState round-trips: params + opt_state + step.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _is_primary() -> bool:
    return jax.process_index() == 0


def save_checkpoint(path: str, tree: Any, force: bool = True) -> None:
    """Save a pytree (params or full TrainState) at `path` (a directory)."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=force)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree. `target` (matching structure of abstract arrays)
    enables sharded/typed restoration; None restores as saved."""
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if target is None:
            return ckptr.restore(path)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, abstract)


class CheckpointManager:
    """Periodic saves with retention (CheckpointConfig parity: save every
    `save_every_steps`, keep `keep_max`)."""

    def __init__(self, directory: str, save_every_steps: int = 10_000,
                 keep_max: int = 10):
        self.directory = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep_max,
                save_interval_steps=save_every_steps,
            ),
        )

    def should_save(self, step: int) -> bool:
        """Whether `maybe_save(step, …)` would actually write — lets callers
        skip building the save tree (e.g. Trainer's ckpt_transform) on the
        ~interval-1 steps per interval where orbax will decline."""
        return bool(self._mgr.should_save(step))

    def maybe_save(self, step: int, tree: Any) -> bool:
        saved = self._mgr.save(step, args=ocp.args.StandardSave(tree))
        return bool(saved)

    def restore_latest(self, target: Optional[Any] = None) -> Any:
        step = self._mgr.latest_step()
        if step is None:
            return None
        if target is None:
            return self._mgr.restore(step)
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def wait_until_finished(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def trainable_only(params: Any, mask: Any) -> Any:
    """Strip frozen leaves for LoRA-style small checkpoints (set frozen leaves
    to None; combine with `merge_params` on load)."""
    return jax.tree.map(lambda p, m: p if m else None, params, mask)


def merge_params(base: Any, partial: Any) -> Any:
    """Overlay a partial (trainable-only) checkpoint onto full base params."""
    return jax.tree.map(lambda b, p: b if p is None else p, base, partial,
                        is_leaf=lambda x: x is None)
