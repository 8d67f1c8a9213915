"""Orbax checkpointing with TRUE resume.

The reference saves {model, optimizer, scheduler, epoch, step, args} but
never restores optimizer/scheduler state (train_joint_v2.py:1247-1264,
SURVEY §5) — resume silently restarts the schedule. Here the full train
state round-trips: params, opt_state, step, epoch, and the data-order rng.
Rank-0 gating is handled by orbax (multihost-aware); single-process use is
the common case here.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True))

    def save(self, step: int, params: Any, opt_state: Any,
             extra: Optional[dict] = None, wait: bool = False) -> None:
        state = {"params": params, "opt_state": opt_state}
        self.manager.save(step, args=ocp.args.Composite(
            state=ocp.args.StandardSave(state),
            extra=ocp.args.JsonSave(extra or {})))
        if wait:
            self.manager.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, params_template: Any, opt_state_template: Any,
                step: Optional[int] = None):
        """Returns (params, opt_state, extra) restored onto the templates'
        structure/shardings."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        target = {"params": params_template,
                  "opt_state": opt_state_template}
        restored = self.manager.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore(target),
            extra=ocp.args.JsonRestore()))
        return (restored["state"]["params"], restored["state"]["opt_state"],
                restored["extra"])

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()


def save_params_npz(path: str, params: Any) -> None:
    """Flat .npz export (small models / interchange)."""
    from ullsam_tpu.core.tree import flatten_with_paths

    flat = {k: np.asarray(v) for k, v in flatten_with_paths(params).items()}
    np.savez(path, **flat)


def load_params_npz(path: str, template: Any) -> Any:
    """Restore a flat .npz onto a params template."""
    from ullsam_tpu.core.tree import map_with_paths

    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    return map_with_paths(lambda p, x: jax.numpy.asarray(flat[p]), template)
