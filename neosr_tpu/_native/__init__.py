"""Native (C++) runtime components, built on demand with the local g++.

`get_packio()` returns the compiled packio extension (mmap'd packed-image
reader), building it on first use into this directory.  Gated: if no
compiler is available the caller falls back to the pure-Python path.
"""

from __future__ import annotations

import subprocess
import sysconfig
from pathlib import Path

_DIR = Path(__file__).parent
_SO = _DIR / "packio.so"
_packio = None


def build_packio() -> Path:
    src = _DIR / "packio.cpp"
    include = sysconfig.get_paths()["include"]
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include}", str(src), "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def get_packio():
    """Import (building if needed) the packio extension module."""
    global _packio
    if _packio is not None:
        return _packio
    if not _SO.exists():
        build_packio()
    import importlib.util

    spec = importlib.util.spec_from_file_location("neosr_tpu._native.packio", _SO)
    _packio = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(_packio)
    return _packio
