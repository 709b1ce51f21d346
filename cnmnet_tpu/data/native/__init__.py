"""ctypes bindings for the native (C++) data-loading runtime.

Builds `loader.cc` into `libcnmloader.so` on first use (cached beside the
source; rebuilt when the source is newer) and exposes numpy-friendly
wrappers. Decode/resize/normalize run in native threads with the GIL
released — the Python layer only orchestrates.

Falls back gracefully: `available()` is False when the toolchain or image
libraries are missing, and callers (e.g. `data/scannet.py`) keep using the
cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "loader.cc")
_SO = os.path.join(_HERE, "libcnmloader.so")

_lib = None
_lock = threading.Lock()
_build_error: str | None = None

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _build() -> bool:
    global _build_error
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", _SRC,
        "-o", _SO, "-ljpeg", "-lpng", "-lz", "-lpthread",
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired) as e:
        _build_error = str(e)
        return False
    if proc.returncode != 0:
        _build_error = proc.stderr[-2000:]
        return False
    return True


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
            os.path.getmtime(_SO) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError as e:
            global _build_error
            _build_error = str(e)
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.load_rgb_normalized.argtypes = [
            ctypes.c_char_p, f32p, ctypes.c_int, ctypes.c_int, f32p, f32p,
        ]
        lib.load_rgb_normalized.restype = ctypes.c_int
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.load_rgb_u8.argtypes = [
            ctypes.c_char_p, u8p, ctypes.c_int, ctypes.c_int,
        ]
        lib.load_rgb_u8.restype = ctypes.c_int
        lib.load_depth_meters.argtypes = [
            ctypes.c_char_p, f32p, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float,
        ]
        lib.load_depth_meters.restype = ctypes.c_int
        lib.load_frames.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, f32p, f32p, ctypes.c_int, ctypes.c_int,
            f32p, f32p, ctypes.c_float, ctypes.c_float, ctypes.c_int,
        ]
        lib.load_frames.restype = ctypes.c_int
        _lib = lib
        return lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def load_rgb_normalized(path: str, width: int, height: int) -> np.ndarray:
    """JPEG -> resized [h, w, 3] float32, ImageNet-normalized."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    out = np.empty((height, width, 3), np.float32)
    rc = lib.load_rgb_normalized(
        path.encode(), _fptr(out), width, height,
        _fptr(IMAGENET_MEAN), _fptr(IMAGENET_STD),
    )
    if rc != 0:
        raise IOError(f"native rgb load failed ({rc}): {path}")
    return out


def load_rgb_u8(path: str, width: int, height: int) -> np.ndarray:
    """JPEG -> resized [h, w, 3] uint8 (the uint8 wire format; the ImageNet
    affine runs in-graph — `ops/images.prepare_images`)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    out = np.empty((height, width, 3), np.uint8)
    rc = lib.load_rgb_u8(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        width, height,
    )
    if rc != 0:
        raise IOError(f"native rgb load failed ({rc}): {path}")
    return out


def load_depth_meters(
    path: str, width: int, height: int, dmin: float = 0.1, dmax: float = 5.0
) -> np.ndarray:
    """16-bit depth PNG (mm) -> resized [h, w] float32 meters, clamp-to-0."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    out = np.empty((height, width), np.float32)
    rc = lib.load_depth_meters(path.encode(), _fptr(out), width, height, dmin, dmax)
    if rc != 0:
        raise IOError(f"native depth load failed ({rc}): {path}")
    return out


def load_frames(
    rgb_paths: list[str],
    depth_paths: list[str],
    width: int,
    height: int,
    dmin: float = 0.1,
    dmax: float = 5.0,
    num_threads: int = 4,
):
    """Batched native load: returns (rgb [N, h, w, 3], depth [M, h, w])."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native loader unavailable: {_build_error}")
    paths = list(rgb_paths) + list(depth_paths)
    kinds = [0] * len(rgb_paths) + [1] * len(depth_paths)
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_kinds = (ctypes.c_int * n)(*kinds)
    rgb = np.empty((len(rgb_paths), height, width, 3), np.float32)
    depth = np.empty((len(depth_paths), height, width), np.float32)
    bad = lib.load_frames(
        c_paths, c_kinds, n, _fptr(rgb), _fptr(depth), width, height,
        _fptr(IMAGENET_MEAN), _fptr(IMAGENET_STD), dmin, dmax, num_threads,
    )
    if bad:
        raise IOError(f"native batch load: {bad}/{n} frames failed")
    return rgb, depth
