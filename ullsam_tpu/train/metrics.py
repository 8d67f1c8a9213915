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

    def log_image(self, step: int, tag: str, image: np.ndarray,
                  caption: str = "") -> None:
        """Log one [H, W, 3] float image in [0, 1] (the reference logs
        segmentation boundary overlays to wandb every N steps,
        train_joint_v2.py:1125-1167). Written as PNG to <log_dir>/images/
        plus TensorBoard/wandb when enabled; rank-0 only."""
        if not self.is_main:
            return
        img8 = np.clip(np.asarray(image, np.float32) * 255.0,
                       0, 255).astype(np.uint8)
        img_dir = os.path.join(self.log_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        safe_tag = tag.replace("/", "_")
        try:
            from PIL import Image
            Image.fromarray(img8).save(
                os.path.join(img_dir, f"{safe_tag}_{step:08d}.png"))
        except ImportError:
            np.save(os.path.join(img_dir, f"{safe_tag}_{step:08d}.npy"), img8)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"step": step, "image": tag, "caption": caption}) + "\n")
            self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_image(tag, img8, step, dataformats="HWC")
        if self._wandb is not None:
            import wandb
            self._wandb.log({tag: wandb.Image(img8, caption=caption)},
                            step=step)

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


def _boundary(mask: np.ndarray) -> np.ndarray:
    """Mask boundary = mask XOR eroded(mask) (train_joint_v2.py:1141-1156)."""
    try:
        from scipy import ndimage
        eroded = ndimage.binary_erosion(mask)
    except ImportError:
        eroded = mask.copy()
        for shift, axis in ((1, 0), (-1, 0), (1, 1), (-1, 1)):
            eroded &= np.roll(mask, shift, axis=axis)
        eroded[0, :] = eroded[-1, :] = eroded[:, 0] = eroded[:, -1] = False
    return np.logical_xor(mask, eroded)


def segmentation_overlay(image: np.ndarray, pred_mask: np.ndarray,
                         gt_mask: np.ndarray) -> np.ndarray:
    """Boundary-overlay debug image: prediction boundary red, ground-truth
    boundary green, over the min-max-normalized input
    (train_joint_v2.py:1125-1160).

    image [H, W, 3] float; pred_mask/gt_mask [H, W] bool. Returns [H, W, 3]
    float in [0, 1].
    """
    img = np.asarray(image, np.float32)
    img = (img - img.min()) / (img.max() - img.min() + 1e-5)
    vis = img.copy()
    pred_b = _boundary(np.asarray(pred_mask, bool))
    gt_b = _boundary(np.asarray(gt_mask, bool))
    vis[pred_b] = (1.0, 0.0, 0.0)
    vis[gt_b] = (0.0, 1.0, 0.0)
    return vis


def train_step_flops(n_params: int, tokens_per_batch: int) -> float:
    """6ND estimate for the transformer portion of a train step."""
    return 6.0 * n_params * tokens_per_batch


def profile_trace(log_dir: str):
    """Context manager: capture a jax.profiler trace viewable in
    TensorBoard/Perfetto (replaces the reference's ad-hoc latency prints,
    app.py:583-642)."""
    return jax.profiler.trace(log_dir, create_perfetto_link=False)
