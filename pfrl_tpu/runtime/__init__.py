"""Native host runtime: C++ kernels for the host-side data path.

The TPU owns the compute path (jax/XLA); the host side still has hot loops
feeding it — Atari frame preprocessing above all (the reference spends this
in cv2 per env per step, pfrl/wrappers/atari_wrappers.py:159-183). Those
live here as a small C++ library (csrc/frame_ops.cpp) built on first use
with g++ and loaded via ctypes, with bit-identical numpy fallbacks used
when no compiler is available (and as the test oracle).

Public API (all take/return numpy uint8 arrays):
  warp_frames(frames, out_h=84, out_w=84)  fused RGB->gray + area resize,
                                           batched: [n,H,W,3]|[n,H,W] ->
                                           [n,out_h,out_w]
  frame_max(a, b)                          elementwise uint8 max
  native_available()                       True if the C++ library loaded
"""

import ctypes
import logging
import os
import subprocess
import tempfile
import threading

import numpy as np

_logger = logging.getLogger(__name__)
_CSRC = os.path.join(os.path.dirname(__file__), "csrc", "frame_ops.cpp")
_lock = threading.Lock()
_lib = None
_build_attempted = False


def _so_path() -> str:
    cache = os.environ.get(
        "PFRL_TPU_CACHE", os.path.join(tempfile.gettempdir(), "pfrl_tpu_native")
    )
    os.makedirs(cache, exist_ok=True)
    return os.path.join(cache, "frame_ops.so")


def _build(so: str) -> bool:
    base = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
        "-fno-math-errno", "-funroll-loops",
    ]
    # -march=native is safe here: the library is (re)built on the machine
    # that runs it (cache keyed by source mtime), and it lets the
    # compiler vectorize the luma/resize loops with whatever SIMD the
    # host actually has. Fall back to the portable build if it fails.
    for extra in (["-march=native"], []):
        try:
            subprocess.run(
                base + extra + [_CSRC, "-o", so],
                check=True, capture_output=True, text=True, timeout=120,
            )
            return True
        except (OSError, subprocess.SubprocessError) as e:
            err = e
    _logger.info("native frame_ops build failed (%s); using numpy", err)
    return False


def _load():
    global _lib, _build_attempted
    with _lock:
        if _lib is not None or _build_attempted:
            return _lib
        _build_attempted = True
        so = _so_path()
        src_mtime = os.path.getmtime(_CSRC)
        if not os.path.exists(so) or os.path.getmtime(so) < src_mtime:
            # Build into a temp name then rename: atomic under concurrent
            # interpreters sharing the cache dir.
            tmp = so + f".tmp{os.getpid()}"
            if not _build(tmp):
                return None
            os.replace(tmp, so)
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:
            _logger.info("native frame_ops load failed (%s); using numpy", e)
            return None
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.warp_frames_rgb.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int,
        ]
        lib.warp_frames_gray.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int,
        ]
        lib.frame_max_u8.argtypes = [u8p, u8p, u8p, ctypes.c_int64]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


# --------------------------------------------------------------- numpy oracle
def _axis_weights(in_size: int, out_size: int):
    """Fractional box-overlap weights as a dense [out, in] matrix."""
    scale = in_size / out_size
    w = np.zeros((out_size, in_size), np.float32)
    for o in range(out_size):
        lo, hi = o * scale, (o + 1) * scale
        ilo, ihi = int(np.floor(lo)), min(int(np.ceil(hi)), in_size)
        for i in range(ilo, ihi):
            w[o, i] = (min(i + 1, hi) - max(i, lo)) / scale
    return w


_weight_cache = {}


def _weights(in_size: int, out_size: int):
    key = (in_size, out_size)
    if key not in _weight_cache:
        _weight_cache[key] = _axis_weights(in_size, out_size)
    return _weight_cache[key]


def _warp_numpy(frames: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    if frames.ndim == 4:  # RGB
        f = frames.astype(np.float32)
        gray = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        gray = np.floor(gray + 0.5).astype(np.uint8)
    else:
        gray = frames
    wy = _weights(gray.shape[1], out_h)  # [out_h, H]
    wx = _weights(gray.shape[2], out_w)  # [out_w, W]
    resized = np.einsum(
        "yh,nhw,xw->nyx", wy, gray.astype(np.float32), wx, optimize=True
    )
    return np.minimum(np.floor(resized + 0.5), 255).astype(np.uint8)


# ----------------------------------------------------------------- public API
def warp_frames(
    frames: np.ndarray, out_h: int = 84, out_w: int = 84, *, _force_numpy=False
) -> np.ndarray:
    """Fused grayscale + INTER_AREA-style resize, batched over frames.

    Accepts ``[n, H, W, 3]`` (RGB) or ``[n, H, W]`` (already gray) uint8.
    Returns ``[n, out_h, out_w]`` uint8.
    """
    frames = np.ascontiguousarray(frames, np.uint8)
    if frames.ndim == 3 and frames.shape[-1] == 3:
        raise ValueError("pass a batch: [n, H, W, 3] or [n, H, W]")
    lib = None if _force_numpy else _load()
    if lib is None:
        return _warp_numpy(frames, out_h, out_w)
    n, in_h, in_w = frames.shape[:3]
    out = np.empty((n, out_h, out_w), np.uint8)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    fn = lib.warp_frames_rgb if frames.ndim == 4 else lib.warp_frames_gray
    fn(
        frames.ctypes.data_as(u8p), n, in_h, in_w,
        out.ctypes.data_as(u8p), out_h, out_w,
    )
    return out


def frame_max(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Elementwise uint8 max (MaxAndSkip two-frame pooling)."""
    a = np.ascontiguousarray(a, np.uint8)
    b = np.ascontiguousarray(b, np.uint8)
    assert a.shape == b.shape
    lib = _load()
    if lib is None:
        return np.maximum(a, b)
    out = np.empty_like(a)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.frame_max_u8(
        a.ctypes.data_as(u8p), b.ctypes.data_as(u8p),
        out.ctypes.data_as(u8p), a.size,
    )
    return out


__all__ = ["warp_frames", "frame_max", "native_available"]
