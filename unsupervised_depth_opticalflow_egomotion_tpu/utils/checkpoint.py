"""Orbax checkpointing: train-state save/restore + staged-init sub-tree loads.

TPU-native equivalent of /root/reference/train.py:21-29 (iter_N.pth +
rolling last.pth) and the flow->depth->geom stage hand-off via partial
``load_state_dict(strict=False)`` (train.py:36-55): here a stage checkpoint's
params are grafted sub-tree-by-sub-tree onto a fresh state, keys that don't
exist in the donor are left at their fresh init.

Schema versioning: each save writes a ``schema.json`` sidecar next to the
step directories recording the checkpoint schema version, the optimizer-
state layout tag, and any caller metadata (freezing flags, config digest).
Restores check the layout tag against the caller's template up front, so a
layout mismatch fails with the actual cause instead of an orbax tree error.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

SCHEMA_VERSION = 1


def _is_remote(path: str) -> bool:
    return "://" in path  # gs://, s3:// ... handled by tensorstore inside orbax


def opt_layout_tag(fix_flow: bool = False, fix_depth: bool = False,
                   fix_pose: bool = False) -> str:
    """Optimizer-state layout tag for the schema sidecar.

    Unfrozen runs use ``optax.flatten`` (one raveled Adam vector); any
    ``fix_*`` flag switches to per-leaf moments under
    ``optax.multi_transform`` (parallel/train_step.py:make_optimizer). The
    two trees are not mutually restorable, so the tag names the exact
    freezing configuration.
    """
    frozen = [
        n
        for n, f in [("flow", fix_flow), ("depth", fix_depth), ("pose", fix_pose)]
        if f
    ]
    return "multi_transform:" + "+".join(frozen) if frozen else "flatten"


class CheckpointManager:
    """Step-indexed checkpoints with a retained rolling window.

    ``directory`` may be a local path or a remote URL (``gs://...``) --
    remote paths go straight to orbax/tensorstore; the schema sidecar is
    then kept in-memory only (remote sidecar writes would need a storage
    client this package doesn't depend on).
    """

    def __init__(self, directory: str, max_to_keep: int = 5):
        self._remote = _is_remote(directory)
        self.directory = directory if self._remote else os.path.abspath(directory)
        if not self._remote:
            os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=max_to_keep, create=True)
        self.manager = ocp.CheckpointManager(self.directory, options=options)
        self._meta_cache: Optional[dict] = None

    # -- schema sidecar -------------------------------------------------
    @property
    def _schema_path(self) -> str:
        return os.path.join(self.directory, "schema.json")

    def save_meta(self, meta: dict) -> None:
        meta = {"schema_version": SCHEMA_VERSION, **meta}
        self._meta_cache = meta
        if not self._remote:
            with open(self._schema_path, "w") as f:
                json.dump(meta, f, indent=1, sort_keys=True)

    def load_meta(self) -> Optional[dict]:
        """The schema sidecar, or None for pre-versioning checkpoints."""
        if self._meta_cache is not None:
            return self._meta_cache
        if not self._remote and os.path.exists(self._schema_path):
            with open(self._schema_path) as f:
                self._meta_cache = json.load(f)
        return self._meta_cache

    # -- save / restore --------------------------------------------------
    def save(self, step: int, state: Any, meta: Optional[dict] = None) -> None:
        """Save ``state`` at ``step``; ``meta`` (opt_layout, config digest,
        ...) is recorded once in the schema sidecar."""
        self.manager.save(step, args=ocp.args.StandardSave(state))
        self.manager.wait_until_finished()
        if meta is not None:
            self.save_meta(meta)

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

    def restore(
        self,
        state_like: Any,
        step: Optional[int] = None,
        expect_opt_layout: Optional[str] = None,
    ) -> Any:
        """Restore into the structure of ``state_like`` (abstract or concrete).

        CHECKPOINT-FORMAT NOTE: the optimizer-state tree depends on the
        freezing configuration -- unfrozen runs use ``optax.flatten`` (one
        raveled Adam vector) while any ``fix_*`` flag keeps per-leaf moments
        under ``optax.multi_transform`` (parallel/train_step.py:make_optimizer).
        A checkpoint saved under one layout cannot restore into the other; the
        stage hand-off path avoids this by restoring against a donor-matching
        template and grafting only params (scripts/train_synth_long.py).

        Passing ``expect_opt_layout`` (see :func:`opt_layout_tag`) checks the
        schema sidecar BEFORE touching orbax, turning a layout mismatch into
        an actionable error. Pre-versioning checkpoints (no sidecar) skip the
        check.
        """
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint found in {self.directory}")
        meta = self.load_meta()
        if (
            expect_opt_layout is not None
            and meta is not None
            and meta.get("opt_layout") not in (None, expect_opt_layout)
        ):
            raise RuntimeError(
                f"[checkpoint] {self.directory} step {step} was saved with "
                f"optimizer layout {meta['opt_layout']!r} but this run uses "
                f"{expect_opt_layout!r} (different fix_flow/fix_depth/fix_pose "
                "flags). Restore with a template built from the checkpoint's "
                "freezing flags, then graft the params (utils.graft_params), "
                "or use restore_params()."
            )
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
