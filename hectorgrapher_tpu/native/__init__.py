"""Native (C++) runtime components with build-on-first-import.

The compute path is JAX/XLA; the streaming runtime around it (sensor
collation, queues) mirrors the reference's C++ host code
(ref: cartographer/common/thread_pool.cc, sensor/internal/
ordered_multi_queue.cc). The extension is a plain CPython module (no
pybind11 in this image) compiled with g++ on first use and cached next to
the source; import falls back to the pure-Python implementation if the
toolchain is unavailable.
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys
import sysconfig
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO_PATH = os.path.join(_DIR, f"hg_native{sysconfig.get_config_var('EXT_SUFFIX') or '.so'}")
_SRC = os.path.join(_DIR, "collator.cc")


def _build() -> bool:
    include = sysconfig.get_path("include")
    cmd = [
        "g++",
        "-O2",
        "-shared",
        "-fPIC",
        "-std=c++17",
        f"-I{include}",
        _SRC,
        "-o",
        _SO_PATH,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def load() -> Optional[object]:
    """Import the native module, building it if needed; None on failure."""
    # A prebuilt .so without the .cc source (binary-only deployment) is
    # valid — only rebuild when the source exists and is newer.
    if not os.path.exists(_SO_PATH) or (
        os.path.exists(_SRC) and os.path.getmtime(_SO_PATH) < os.path.getmtime(_SRC)
    ):
        if not _build():
            return None
    try:
        spec = importlib.util.spec_from_file_location("hg_native", _SO_PATH)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        return module
    except Exception:
        return None
