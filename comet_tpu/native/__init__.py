"""ctypes bindings for the native (C++) IO core, with on-demand build.

The shared library (cometio.cpp: libjpeg/libpng decode, PIL-bit-exact
Lanczos crop-resample, threaded sequence loader) is compiled once into
``_cometio.so`` next to this file the first time it is needed; the g++
toolchain is part of the environment. Everything degrades gracefully:
``available()`` is False when the build or the codec libraries are
missing, and callers (data/native_loader.py, the CLI ``--loader`` flag)
fall back to the PIL path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "cometio.cpp")
_SO = os.path.join(_HERE, "_cometio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_error: Optional[str] = None

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _build() -> Optional[str]:
    """Compile cometio.cpp -> _cometio.so. Returns an error string or None.

    Compiles to a per-process temp name and publishes with os.replace so
    concurrent first-users (multi-process data loading) never dlopen a
    partially written .so — whichever build finishes last wins atomically."""
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-fPIC", "-shared", "-pthread", "-std=c++17",
        _SRC, "-o", tmp, "-ljpeg", "-lpng", "-lz",
    ]
    try:
        proc = subprocess.run(
            cmd, capture_output=True, text=True, timeout=300
        )
    except (OSError, subprocess.TimeoutExpired) as exc:
        return f"g++ invocation failed: {exc!r}"
    if proc.returncode != 0:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return f"g++ failed ({proc.returncode}): {proc.stderr[-2000:]}"
    try:
        os.replace(tmp, _SO)
    except OSError as exc:
        return f"failed to publish {_SO}: {exc!r}"
    return None


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.cometio_version.restype = ctypes.c_char_p
    lib.cometio_image_size.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.cometio_decode_rgb.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.cometio_crop_resize_lanczos.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.cometio_decode_gray.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.cometio_load_masks.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.cometio_load_sequence.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    if hasattr(lib, "cometio_decode_frames"):
        lib.cometio_decode_frames.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if os.environ.get("COMET_NATIVE", "1") == "0":
            _build_error = "disabled via COMET_NATIVE=0"
            return None
        if not os.path.exists(_SO) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_SO)
        ):
            err = _build()
            if err is not None:
                _build_error = err
                return None
        try:
            _lib = _bind(ctypes.CDLL(_SO))
        except OSError as exc:
            _build_error = f"dlopen failed: {exc!r}"
            return None
        return _lib


def available() -> bool:
    """True when the native library is (or can be) loaded."""
    return _get_lib() is not None


def build_error() -> Optional[str]:
    """The build/load failure reason, if any (after an available() call)."""
    return _build_error


def version() -> str:
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(f"cometio unavailable: {_build_error}")
    return lib.cometio_version().decode()


def decode_rgb(path: str) -> np.ndarray:
    """Decode a JPEG/PNG file to an RGB uint8 array [H, W, 3]."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(f"cometio unavailable: {_build_error}")
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.cometio_image_size(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"cometio_image_size({path}) -> {rc}")
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.cometio_decode_rgb(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_longlong(out.nbytes),
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        raise IOError(f"cometio_decode_rgb({path}) -> {rc}")
    return out


def crop_resize_lanczos(
    img: np.ndarray, box: Sequence[int], out_size: int
) -> np.ndarray:
    """PIL-bit-exact img.crop(box).resize((out, out), LANCZOS) on uint8."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(f"cometio unavailable: {_build_error}")
    img = np.ascontiguousarray(img, np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, ch = img.shape
    box_arr = np.asarray(box, np.int32)
    out = np.empty((out_size, out_size, ch), np.uint8)
    rc = lib.cometio_crop_resize_lanczos(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, ch,
        box_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        out_size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise ValueError(f"cometio_crop_resize_lanczos -> {rc}")
    return out[..., 0] if ch == 1 else out


def _pool_size(n_threads: int) -> int:
    if n_threads > 0:
        return n_threads
    # std::thread::hardware_concurrency() ignores the cgroup/affinity
    # limit; size pools from the actual CPU mask (oversubscription on a
    # small container is measurably worse than serial).
    try:
        return len(os.sched_getaffinity(0))
    except AttributeError:  # non-Linux
        return os.cpu_count() or 1


def decode_gray(path: str) -> np.ndarray:
    """Decode to 8-bit luma (PIL convert("L") parity) -> [H, W] uint8."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(f"cometio unavailable: {_build_error}")
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.cometio_image_size(path.encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"cometio_image_size({path}) -> {rc}")
    out = np.empty((h.value, w.value), np.uint8)
    rc = lib.cometio_decode_gray(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_longlong(out.nbytes),
        ctypes.byref(w),
        ctypes.byref(h),
    )
    if rc != 0:
        raise IOError(f"cometio_decode_gray({path}) -> {rc}")
    return out


def load_masks(paths: List[str], n_threads: int = 0):
    """Threaded mask decode: per-mask nonzero bboxes + mask 0's pixels.

    Returns ``(bboxes [n, 4] float, mask0 [H0, W0] uint8)`` with the bbox
    convention of datasets.mask_bbox (xmax/ymax exclusive, full image for
    an empty mask).
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(f"cometio unavailable: {_build_error}")
    n = len(paths)
    w0 = ctypes.c_int()
    h0 = ctypes.c_int()
    rc = lib.cometio_image_size(
        paths[0].encode(), ctypes.byref(w0), ctypes.byref(h0)
    )
    if rc != 0:
        raise IOError(f"cometio_image_size({paths[0]}) -> {rc}")
    mask0 = np.empty((h0.value, w0.value), np.uint8)
    bboxes = np.empty((n, 4), np.int32)
    encoded = [p.encode() for p in paths]
    arr = (ctypes.c_char_p * n)(*encoded)
    rc = lib.cometio_load_masks(
        arr, n, _pool_size(n_threads),
        bboxes.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        mask0.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_longlong(mask0.nbytes),
        ctypes.byref(w0),
        ctypes.byref(h0),
    )
    if rc != 0:
        raise IOError(f"cometio_load_masks -> {rc}")
    return bboxes.astype(np.float64), mask0


def decode_frames(paths: List[str], n_threads: int = 0) -> np.ndarray:
    """Threaded RAW decode of same-sized frames -> uint8 [S, H, W, 3].

    No resampling: this is the host half of the composed fast path
    (native decode + XLA device crop/resize/normalize,
    data/device_pipeline.py). All frames must share frame 0's size."""
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(f"cometio unavailable: {_build_error}")
    if not hasattr(lib, "cometio_decode_frames"):
        raise RuntimeError("stale _cometio.so: rebuild (touch cometio.cpp)")
    n = len(paths)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.cometio_image_size(paths[0].encode(), ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        raise IOError(f"cometio_image_size({paths[0]}) -> {rc}")
    out = np.empty((n, h.value, w.value, 3), np.uint8)
    encoded = [p.encode() for p in paths]
    arr = (ctypes.c_char_p * n)(*encoded)
    rc = lib.cometio_decode_frames(
        arr, n, w.value, h.value, _pool_size(n_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise IOError(f"cometio_decode_frames -> {rc}")
    return out


def load_sequence(
    paths: List[str],
    box: Sequence[int],
    crop_size: int,
    mean: np.ndarray = _IMAGENET_MEAN,
    std: np.ndarray = _IMAGENET_STD,
    n_threads: int = 0,
) -> np.ndarray:
    """Threaded decode + crop + LANCZOS + normalize of a frame sequence.

    Returns float32 [S, crop, crop, 3] matching the host PIL path
    (datasets.py:load_sequence) bit-for-bit on the uint8 stage and exactly
    on the float normalization.
    """
    lib = _get_lib()
    if lib is None:
        raise RuntimeError(f"cometio unavailable: {_build_error}")
    n_threads = _pool_size(n_threads)
    n = len(paths)
    encoded = [p.encode() for p in paths]
    arr = (ctypes.c_char_p * n)(*encoded)
    box_arr = np.asarray(box, np.int32)
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    out = np.empty((n, crop_size, crop_size, 3), np.float32)
    rc = lib.cometio_load_sequence(
        arr, n,
        box_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        crop_size,
        mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    if rc != 0:
        raise IOError(f"cometio_load_sequence -> {rc}")
    return out
