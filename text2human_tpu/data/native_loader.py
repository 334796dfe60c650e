"""ctypes bindings for the native image decode/resample library.

``native/dataloader.cc`` does JPEG/PNG decode (libjpeg/libpng) and
Lanczos-3/nearest resampling in C++ with an optional internal thread pool —
the input-pipeline hot path that the reference leaves to PIL
(data/segm_attr_dataset.py:78-115).  The C calls release the GIL, so the
threaded prefetch in ``data/loader.py`` decodes in parallel even without the
batch entry point.

The shared library is built on demand with g++ (no pybind11 in this image;
plain C ABI + ctypes).  Build products live under ``native/build``.  Set
``T2H_NATIVE_LOADER=1`` to route the flat-file datasets through this decoder
(``datasets._use_native_loader`` gates ``_load_resized``/``_densepose`` onto
:func:`decode_image`/:func:`decode_channel`); PIL remains the default and
the fallback.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
import threading
from typing import Optional

import numpy as np

_SRC = osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))),
                "native", "dataloader.cc")
_BUILD_DIR = osp.join(osp.dirname(_SRC), "build")
_LIB_PATH = osp.join(_BUILD_DIR, "libt2hdata.so")

NEAREST = 0
LANCZOS = 1

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_load_error: Optional[str] = None


def _build() -> None:
    # compile to a process-unique temp name, then atomically rename: a
    # concurrent process (multi-worker tokenize/train starts) must never
    # dlopen a half-written .so
    os.makedirs(_BUILD_DIR, exist_ok=True)
    tmp = f"{_LIB_PATH}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC,
        "-o", tmp, "-ljpeg", "-lpng", "-pthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
        os.replace(tmp, _LIB_PATH)
    finally:
        if osp.exists(tmp):
            os.unlink(tmp)


def load_library(rebuild: bool = False) -> ctypes.CDLL:
    """Build (once) and load the native library; raises RuntimeError with the
    compiler output if the toolchain is unavailable."""
    global _lib, _load_error
    with _lock:
        if _lib is not None and not rebuild:
            return _lib
        if _load_error is not None and not rebuild:
            raise RuntimeError(_load_error)
        try:
            src_mtime = os.path.getmtime(_SRC)
            if (
                rebuild
                or not osp.exists(_LIB_PATH)
                or os.path.getmtime(_LIB_PATH) < src_mtime
            ):
                _build()
            try:
                lib = ctypes.CDLL(_LIB_PATH)
            except OSError:
                # transient: another process may be mid-replace — one
                # rebuild-and-retry before declaring the loader unavailable
                _build()
                lib = ctypes.CDLL(_LIB_PATH)
        except (OSError, subprocess.CalledProcessError) as e:
            detail = getattr(e, "stderr", "") or str(e)
            _load_error = f"native loader unavailable: {detail}"
            raise RuntimeError(_load_error) from e

        lib.t2h_image_size.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.t2h_image_size.restype = ctypes.c_int
        lib.t2h_decode_image.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.t2h_decode_image.restype = ctypes.c_int
        lib.t2h_decode_channel.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.t2h_decode_channel.restype = ctypes.c_int
        lib.t2h_decode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.t2h_decode_batch.restype = ctypes.c_int
        _lib = lib
        return lib


def image_size(path: str) -> tuple:
    lib = load_library()
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    rc = lib.t2h_image_size(path.encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c))
    if rc != 0:
        raise IOError(f"cannot decode {path}")
    return h.value, w.value, c.value


def decode_image(
    path: str,
    downsample: int = 1,
    filter: int = LANCZOS,
    channels: int = 0,
) -> np.ndarray:
    """Decode + resample one image -> uint8 [H, W, C] (C squeezed if 1)."""
    lib = load_library()
    h, w, c = image_size(path)
    if channels:
        c = channels
    oh, ow = h // downsample, w // downsample
    out = np.empty((oh, ow, c), np.uint8)
    rc = lib.t2h_decode_image(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        oh, ow, c, filter,
    )
    if rc != 0:
        raise IOError(f"native decode failed for {path} (rc={rc})")
    return out[..., 0] if c == 1 else out


def decode_channel(
    path: str,
    channel: int,
    downsample: int = 1,
    filter: int = NEAREST,
) -> np.ndarray:
    """Decode a single channel -> uint8 [H, W] (densepose-IUV fast path: the
    datasets keep only channel 2, the I plane; selecting natively before the
    resample does a third of the filter work)."""
    lib = load_library()
    h, w, _ = image_size(path)
    oh, ow = h // downsample, w // downsample
    out = np.empty((oh, ow), np.uint8)
    rc = lib.t2h_decode_channel(
        path.encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        oh, ow, channel, filter,
    )
    if rc != 0:
        raise IOError(f"native channel decode failed for {path} (rc={rc})")
    return out


def decode_batch(
    paths,
    out_h: int,
    out_w: int,
    channels: int = 3,
    filter: int = LANCZOS,
    num_threads: int = 0,
) -> np.ndarray:
    """Thread-pooled decode of ``paths`` -> uint8 [N, out_h, out_w, C]."""
    lib = load_library()
    n = len(paths)
    out = np.empty((n, out_h, out_w, channels), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    failures = lib.t2h_decode_batch(
        arr, n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_h, out_w, channels, filter, num_threads,
    )
    if failures:
        raise IOError(f"native batch decode: {failures}/{n} images failed")
    return out


def available() -> bool:
    try:
        load_library()
        return True
    except RuntimeError:
        return False
