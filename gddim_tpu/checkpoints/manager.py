"""Native checkpointing via Orbax (preemption-safe, multi-host aware).

Replaces `flax.training.checkpoints` (reference run_lib.py:108-114,194-200,
235-242) with an orbax CheckpointManager: a `meta` stream with keep=1 for
preemption recovery and numbered snapshots with keep=all, matching the
reference's two-tier scheme.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, workdir: str | Path, keep_meta: int = 1):
        workdir = Path(workdir)
        self.meta_dir = workdir / "checkpoints-meta"
        self.snap_dir = workdir / "checkpoints"
        self._meta = ocp.CheckpointManager(
            self.meta_dir.absolute(),
            options=ocp.CheckpointManagerOptions(max_to_keep=keep_meta),
        )
        self._snap = ocp.CheckpointManager(
            self.snap_dir.absolute(),
            options=ocp.CheckpointManagerOptions(max_to_keep=None),
        )

    # --- save ---------------------------------------------------------------
    def save_meta(self, step: int, state: Any):
        self._meta.save(step, args=ocp.args.StandardSave(state))

    def save_snapshot(self, snapshot_id: int, state: Any):
        self._snap.save(snapshot_id, args=ocp.args.StandardSave(state))

    def wait(self):
        self._meta.wait_until_finished()
        self._snap.wait_until_finished()

    # --- restore -------------------------------------------------------------
    def restore_latest_meta(self, template: Any):
        step = self._meta.latest_step()
        if step is None:
            return template, 0
        restored = self._meta.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        return restored, step

    def restore_snapshot(self, snapshot_id: int, template: Any):
        return self._snap.restore(
            snapshot_id, args=ocp.args.StandardRestore(template)
        )

    def snapshot_steps(self):
        return sorted(self._snap.all_steps())
