"""Native (C++) host-side components, bound via ctypes.

The TPU compute path is JAX/XLA/Pallas; host-side algorithmic pieces that the
reference delegates to external native libraries live here.  Currently:

  * ``hungarian.cpp`` — linear sum assignment for the semantic style matching
    (replaces the reference's scipy dependency, loss.py:7,183).

The library builds on first use via ``make`` (g++); see ``ensure_built``.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

_DIR = Path(__file__).parent
_LIB_PATH = _DIR / "libnerfstyle_native.so"

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def ensure_built() -> Optional[ctypes.CDLL]:
    """Build (if needed) and load the native library; None if unavailable."""
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not _LIB_PATH.exists():
        try:
            subprocess.run(
                ["make", "-s"], cwd=_DIR, check=True,
                capture_output=True, timeout=120,
            )
        except (subprocess.SubprocessError, FileNotFoundError):
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.nerfstyle_lsa.restype = ctypes.c_int
        lib.nerfstyle_lsa.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
    except OSError:
        _build_failed = True
        return None
    return _lib
