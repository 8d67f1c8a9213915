"""Rank-0 logging helpers (the reference's logger(), train_joint_v2.py:44-46)."""

from __future__ import annotations

import sys
import time

import jax


def log0(*args, **kwargs) -> None:
    """Print only on process 0 (flushes; timestamped)."""
    if jax.process_index() == 0:
        print(time.strftime("[%H:%M:%S]"), *args, **kwargs, flush=True)


def warn0(*args) -> None:
    if jax.process_index() == 0:
        print(time.strftime("[%H:%M:%S] WARNING:"), *args, file=sys.stderr,
              flush=True)
