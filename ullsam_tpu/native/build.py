"""Build the native host-ops shared library (g++, no dependencies).

Compiled lazily on first use and cached by source hash; `python -m
ullsam_tpu.native.build` builds eagerly.
"""

from __future__ import annotations

import hashlib
import os
import subprocess

_HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_HERE, "csrc", "host_ops.cpp")
BUILD_DIR = os.path.join(_HERE, "_build")


def _src_hash() -> str:
    with open(SRC, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()[:16]


def lib_path() -> str:
    return os.path.join(BUILD_DIR, f"libhost_ops_{_src_hash()}.so")


def build(verbose: bool = False) -> str:
    """Compile if needed; returns the .so path."""
    out = lib_path()
    if os.path.exists(out):
        return out
    os.makedirs(BUILD_DIR, exist_ok=True)
    for flags in (["-O3", "-march=native"], ["-O3"]):
        cmd = (["g++"] + flags
               + ["-shared", "-fPIC", "-std=c++17", SRC, "-o", out + ".tmp"])
        if verbose:
            print(" ".join(cmd))
        try:
            subprocess.run(cmd, check=True, capture_output=not verbose)
            os.replace(out + ".tmp", out)
            return out
        except subprocess.CalledProcessError:
            continue
    raise RuntimeError("g++ build failed for native host ops")


if __name__ == "__main__":
    print(build(verbose=True))
