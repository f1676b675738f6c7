"""Shared builder for the C++ host components (csrc/*.cpp).

Artifacts are built into a per-user cache directory keyed by a content hash
of the source, so the repo never carries compiled binaries and a stale .so
can never shadow an edited source. Flags are portable by default (``-O3``);
set ``NADAVCA_TPU_NATIVE_ARCH=native`` to opt into ``-march=native`` for the
host-tuned build (the CPU-baseline benchmarks do this explicitly).
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import tempfile


def cache_dir() -> str:
    root = os.environ.get("NADAVCA_TPU_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "nadavca_tpu"
    )
    os.makedirs(root, exist_ok=True)
    return root


def build_shared(src_path: str, name: str) -> str:
    """Compile one .cpp into a cached shared library; return its path."""
    src = os.path.abspath(src_path)
    with open(src, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    arch = os.environ.get("NADAVCA_TPU_NATIVE_ARCH", "")
    tag = f"{name}-{digest}" + (f"-{arch}" if arch else "")
    so = os.path.join(cache_dir(), f"lib{tag}.so")
    if os.path.exists(so):
        return so
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC"]
    if arch:
        cmd.append(f"-march={arch}")
    # build to a temp file then rename: concurrent builders race benignly
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=cache_dir())
    os.close(fd)
    try:
        subprocess.run(cmd + ["-o", tmp, src], check=True, capture_output=True)
        os.replace(tmp, so)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return so
