"""Orbax checkpointing: train-state save/restore + staged-init sub-tree loads.

TPU-native equivalent of /root/reference/train.py:21-29 (iter_N.pth +
rolling last.pth) and the flow->depth->geom stage hand-off via partial
``load_state_dict(strict=False)`` (train.py:36-55): here a stage checkpoint's
params are grafted sub-tree-by-sub-tree onto a fresh state, keys that don't
exist in the donor are left at their fresh init.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Step-indexed checkpoints with a retained rolling window."""

    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any) -> None:
        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore_params(self, step: Optional[int] = None) -> Any:
        """Restore only the ``params`` sub-tree, layout-agnostic.

        Restores the raw saved pytree without a template, so it works across
        optimizer-state layouts (see the note on :meth:`restore`) -- the
        right entry point for stage grafting, which never needs opt_state.
        """
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        raw = self.manager.restore(step)
        return raw["params"]

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_like`` (abstract or concrete).

        CHECKPOINT-FORMAT NOTE: the optimizer-state tree depends on the
        freezing configuration -- unfrozen runs use ``optax.flatten`` (one
        raveled Adam vector) while any ``fix_*`` flag keeps per-leaf moments
        under ``optax.multi_transform`` (parallel/train_step.py:make_optimizer).
        A checkpoint saved under one layout cannot restore into the other; the
        stage hand-off path avoids this by restoring against a donor-matching
        template and grafting only params (scripts/train_synth_long.py).
        """
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        try:
            return self.manager.restore(step, args=ocp.args.StandardRestore(state_like))
        except Exception as e:  # augment tree-mismatch errors with the likely cause
            raise RuntimeError(
                f"{e}\n[checkpoint] restore into {self.directory} step {step} failed. "
                "If the error is an opt_state tree/shape mismatch: checkpoints "
                "saved with a different fix_flow/fix_depth/fix_pose configuration "
                "use a different optimizer-state layout (optax.flatten vs "
                "multi_transform). Restore with a template built from the SAME "
                "freezing flags the checkpoint was trained with, then graft the "
                "params onto your state (utils.graft_params)."
            ) from e

    def close(self):
        self.manager.close()


def graft_params(target_params: Any, donor_params: Any) -> Any:
    """Copy donor leaves onto the target wherever paths+shapes match.

    Equivalent of torch ``load_state_dict(strict=False)`` for the stage
    hand-off: unknown donor keys are ignored, missing keys keep their fresh
    initialization.
    """
    flat_target = dict(jax.tree_util.tree_flatten_with_path(target_params)[0])
    flat_donor = dict(jax.tree_util.tree_flatten_with_path(donor_params)[0])
    out = {}
    for path, leaf in flat_target.items():
        donor_leaf = flat_donor.get(path)
        if donor_leaf is not None and donor_leaf.shape == leaf.shape:
            out[path] = donor_leaf
        else:
            out[path] = leaf
    treedef = jax.tree_util.tree_structure(target_params)
    leaves = [out[p] for p, _ in jax.tree_util.tree_flatten_with_path(target_params)[0]]
    return jax.tree_util.tree_unflatten(treedef, leaves)
