"""Native (C++) host runtime components.

The TPU compute path is jax/XLA; the host runtime around it is native where
it pays: audio ingest (`_wavio` — threaded RIFF/WAV decode + crop batching
with the GIL released) keeps a single host process able to feed a TPU chip.

The extension is built on demand with the system toolchain and cached next
to this file; every consumer falls back to the pure-Python path when a
compiler is unavailable, so the framework never hard-requires it.
"""

from __future__ import annotations

import logging
import subprocess
import sysconfig
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parent
_SO_PATH = _NATIVE_DIR / "_wavio.so"
_SRC_PATH = _NATIVE_DIR / "wavio.cpp"

_wavio = None
_build_attempted = False


def _build_extension() -> Optional[Path]:
    """Compile wavio.cpp -> _wavio.so (one g++ call, ~2 s)."""
    import numpy as np

    include_py = sysconfig.get_paths()["include"]
    include_np = np.get_include()
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        f"-I{include_py}", f"-I{include_np}",
        str(_SRC_PATH), "-o", str(_SO_PATH),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True,
                       timeout=120)
        return _SO_PATH
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError) as e:
        detail = getattr(e, "stderr", "") or str(e)
        logger.warning("native _wavio build failed (%s); using the "
                       "pure-Python ingest path", detail.strip()[:500])
        return None


def get_wavio():
    """Return the `_wavio` module, building it on first use; None if
    unavailable (callers must fall back to Python I/O)."""
    global _wavio, _build_attempted
    if _wavio is not None:
        return _wavio
    if _build_attempted:
        return None
    _build_attempted = True

    needs_build = (not _SO_PATH.exists()
                   or _SO_PATH.stat().st_mtime < _SRC_PATH.stat().st_mtime)
    if needs_build and _build_extension() is None:
        return None

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "waveverify_tpu.native._wavio", _SO_PATH
    )
    try:
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        _wavio = mod
    except ImportError as e:  # stale/incompatible .so: rebuild once
        logger.warning("reloading native _wavio failed (%s); rebuilding", e)
        if _build_extension() is not None:
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            _wavio = mod
    return _wavio
