"""Metrics logging: JSONL stream + optional wandb, behind one gate.

Replaces the reference's static `Wandb` class (cld_jax/utils.py:126-148):
metrics always stream to `<workdir>/metrics.jsonl` (greppable, survives
preemption); wandb attaches on top when installed and enabled, with the run-id
persisted to `<workdir>/meta.json` for resume (reference run_lib.py:55-71).
"""

from __future__ import annotations

import json
import logging
import time
from pathlib import Path

logger = logging.getLogger("gddim_tpu")


class MetricsLogger:
    def __init__(self, workdir: str | Path, enable_wandb: bool = False,
                 project: str = "gddim_tpu", config=None):
        import os

        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)
        self.path = self.workdir / "metrics.jsonl"
        self._fh = open(self.path, "a")
        self._wandb = None
        # cluster job-id capture (reference blur_jax/utils.py:142-145)
        job_id = os.environ.get("SLURM_JOB_ID") or os.environ.get("NGC_JOB_ID")
        if job_id:
            self.log({"job_id": job_id})
        if enable_wandb:
            self._wandb = self._init_wandb(project, config)

    def _init_wandb(self, project, config):
        try:
            import wandb
        except ImportError:
            logger.warning("wandb requested but not installed; JSONL only")
            return None
        meta_path = self.workdir / "meta.json"
        run_id = None
        if meta_path.exists():
            run_id = json.loads(meta_path.read_text()).get("wandb_id")
        run = wandb.init(project=project, id=run_id, resume="allow",
                         config=_flatten(config) if config else None)
        meta_path.write_text(json.dumps({"wandb_id": run.id}))
        return run

    def log(self, metrics: dict, step: int | None = None):
        rec = {"_time": time.time()}
        if step is not None:
            rec["step"] = int(step)
        for k, v in metrics.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, name: str, path, step: int | None = None):
        """Attach a saved sample grid to wandb (reference logs sample grids
        as wandb images, run_lib.py:263,275); JSONL records the path."""
        self.log({name: str(path)}, step)
        if self._wandb is not None:
            import wandb

            self._wandb.log({name: wandb.Image(str(path))}, step=step)

    def close(self):
        self._fh.close()
        if self._wandb is not None:
            self._wandb.finish()


def _flatten(cfg, prefix=""):
    from gddim_tpu.utils.tree import flatten_config

    return flatten_config(cfg)
