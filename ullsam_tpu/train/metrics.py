"""Metrics & observability: pluggable writers, step timing, MFU.

Behavioral reference: the reference's rank-0 wandb logging of loss/IoU/lr/
memory/samples-per-sec (train_joint_v2.py:1103-1122, 1206-1215). Writers:
JSONL (always), TensorBoard (tensorboardX if present), wandb (if present).
The metric names match the reference's so dashboards carry over.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np


class MetricWriter:
    """Fan-out metric writer; rank-0 only (process_index gating replaces
    the reference's dist.get_rank()==0 logger, train_joint_v2.py:44-46)."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 use_wandb: bool = False, wandb_kwargs: Optional[dict] = None):
        self.is_main = jax.process_index() == 0
        self.log_dir = log_dir
        self._tb = None
        self._wandb = None
        self._jsonl = None
        if not self.is_main:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except ImportError:
                pass
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                pass

    def write(self, step: int, metrics: Dict[str, float]) -> None:
        if not self.is_main:
            return
        scalars = {k: float(np.asarray(v)) for k, v in metrics.items()}
        self._jsonl.write(json.dumps({"step": step, **scalars}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(scalars, step=step)

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """Wall-clock step timing + samples/sec + MFU.

    NB on the axon relay block_until_ready is unreliable; callers must
    sync via a host transfer before stop() for honest numbers.
    """

    # bf16 peak per chip (v5e). Override for other generations.
    PEAK_FLOPS = 197e12

    def __init__(self, flops_per_step: Optional[float] = None):
        self.flops_per_step = flops_per_step
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, batch_size: int) -> Dict[str, float]:
        dt = time.perf_counter() - self._t0
        out = {"batch_time": dt, "samples_per_second": batch_size / dt}
        if self.flops_per_step:
            out["mfu"] = self.flops_per_step / dt / self.PEAK_FLOPS
        return out


def train_step_flops(n_params: int, tokens_per_batch: int) -> float:
    """6ND estimate for the transformer portion of a train step."""
    return 6.0 * n_params * tokens_per_batch


def profile_trace(log_dir: str):
    """Context manager: capture a jax.profiler trace viewable in
    TensorBoard/Perfetto (replaces the reference's ad-hoc latency prints,
    app.py:583-642)."""
    return jax.profiler.trace(log_dir, create_perfetto_link=False)
