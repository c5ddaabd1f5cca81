"""Observability: metric logging + profiling hooks.

The reference's observability is wandb + stdout prints (SURVEY §5).  Here:
  * MetricLogger: JSONL file + stdout, optional wandb passthrough
  * profile_trace: jax.profiler trace contextmanager (the reference has no
    profiling at all — tqdm bars only)
  * save_run_config: opt.yaml-style run-settings dump
"""

from __future__ import annotations

import contextlib
import json
import os
import time


class MetricLogger:
    def __init__(self, save_dir: str, use_wandb: bool = False,
                 wandb_project: str = "egoego_tpu", exp_name: str = "exp",
                 config: dict | None = None):
        os.makedirs(save_dir, exist_ok=True)
        self.path = os.path.join(save_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._t0 = time.time()
        self.wandb = None
        if use_wandb:
            try:
                import wandb

                self.wandb = wandb.init(
                    project=wandb_project, name=exp_name, config=config or {}
                )
            except Exception as e:  # wandb not installed / offline
                print(f"wandb unavailable ({e}); logging to JSONL only")

    def log(self, step: int, **metrics) -> None:
        rec = {"step": step, "wall_time": time.time() - self._t0}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self.wandb is not None:
            self.wandb.log(metrics, step=step)

    def close(self) -> None:
        self._f.close()
        if self.wandb is not None:
            self.wandb.finish()


@contextlib.contextmanager
def profile_trace(profile_dir: str | None):
    """jax.profiler trace (view with tensorboard / xprof) — no-op if dir
    unset."""
    if not profile_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def save_run_config(cfg, save_dir: str) -> str:
    """Dump the run config next to the results (reference: opt.yaml)."""
    from egoego_release_tpu.utils.config import save_yaml

    os.makedirs(save_dir, exist_ok=True)
    path = os.path.join(save_dir, "opt.yaml")
    save_yaml(cfg, path)
    return path
