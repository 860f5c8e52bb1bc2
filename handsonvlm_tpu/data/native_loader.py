"""ctypes wrapper for the native (C++) frame loader.

Builds `_native/frame_loader.cpp` with g++ on first use (cached next to the
source) and exposes `load_frames_native`. Falls back to the PIL pipeline in
data/video_io.py when the toolchain or libjpeg is unavailable, so every
caller can use `load_frames(paths)` unconditionally.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native", "frame_loader.cpp")
_SO = os.path.join(os.path.dirname(_SRC), "frame_loader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-march=native",
        _SRC, "-o", _SO, "-ljpeg", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=180)
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
        msg = getattr(e, "stderr", b"")
        print(f"native frame loader build failed ({e}); {msg[:300]}")
        return None


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _SO if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC) else _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.decode_preprocess_batch.restype = ctypes.c_int
        lib.decode_preprocess_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte),
        ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return get_lib() is not None


def load_frames_native(
    paths: Sequence[str], size: int = 224, num_threads: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """JPEG paths -> ((N,3,size,size) float32, ok (N,) bool)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(paths)
    out = np.zeros((n, 3, size, size), np.float32)
    ok = np.zeros((n,), np.uint8)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.decode_preprocess_batch(
        c_paths, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size, num_threads,
        ok.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out, ok.astype(bool)


def load_frames(paths: Sequence[str], size: int = 224) -> np.ndarray:
    """Native fast path with PIL fallback (API used by datasets)."""
    if native_available():
        out, ok = load_frames_native(paths, size)
        if ok.all():
            return out
        # decode any failed frames with PIL
        from handsonvlm_tpu.data.video_io import load_image

        for i in np.nonzero(~ok)[0]:
            out[i] = load_image(paths[i], cache_dir=None)
        return out
    from handsonvlm_tpu.data.video_io import load_video_frames

    return load_video_frames(paths, cache_dir=None)
