"""ctypes bindings for the native loader (s2v_tpu/io/native/s2v_loader.cpp).

Built on demand with g++ (no pybind11 in this image), cached next to the
source. Everything has a numpy fallback so the framework runs without a
toolchain; the native path removes the per-frame python overhead from the
video IO side of the pipeline.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "s2v_loader.cpp")
_SO = os.path.join(_HERE, "native", "libs2v_loader.so")
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None


def _build() -> Optional[str]:
    if os.path.isfile(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return _SO
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True,
        )
        return _SO
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LOCK:
        if _LIB is not None:
            return _LIB
        so = _build()
        if so is None:
            return None
        lib = ctypes.CDLL(so)
        lib.s2v_crop_resize_u8f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ]
        lib.s2v_loader_open.restype = ctypes.c_void_p
        lib.s2v_loader_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.s2v_loader_next.restype = ctypes.c_int
        lib.s2v_loader_next.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.s2v_loader_close.argtypes = [ctypes.c_void_p]
        _LIB = lib
        return _LIB


def crop_resize_u8f32(frame: np.ndarray, box: Tuple[int, int, int, int],
                      out_hw: Tuple[int, int], scale: float = 1.0) -> np.ndarray:
    """[H,W,C] uint8 -> [oh,ow,C] float32, bilinear with torch
    align_corners=False semantics (matches ops.image.resize_bilinear)."""
    y0, y1, x0, x1 = box
    oh, ow = out_hw
    lib = get_lib()
    frame = np.ascontiguousarray(frame, np.uint8)
    if lib is not None:
        out = np.empty((oh, ow, frame.shape[2]), np.float32)
        lib.s2v_crop_resize_u8f32(
            frame.ctypes.data_as(ctypes.c_void_p), frame.shape[0],
            frame.shape[1], frame.shape[2], y0, y1, x0, x1,
            out.ctypes.data_as(ctypes.c_void_p), oh, ow, scale,
        )
        return out
    # numpy fallback (same math)
    crop = frame[y0:y1, x0:x1].astype(np.float32)
    ch, cw = crop.shape[:2]

    def weights(n_in, n_out):
        s = (np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5
        s = np.clip(s, 0, None)
        i0 = np.minimum(s.astype(np.int64), n_in - 1)
        i1 = np.minimum(i0 + 1, n_in - 1)
        return i0, i1, (s - i0).astype(np.float32)

    r0, r1, wy = weights(ch, oh)
    c0, c1, wx = weights(cw, ow)
    top = crop[r0][:, c0] * (1 - wx[None, :, None]) + crop[r0][:, c1] * wx[None, :, None]
    bot = crop[r1][:, c0] * (1 - wx[None, :, None]) + crop[r1][:, c1] * wx[None, :, None]
    return (top * (1 - wy[:, None, None]) + bot * wy[:, None, None]) * scale


class NativeClipReader:
    """Threaded double-buffered raw-RGB24 clip reader (producer thread in
    C++). Reads .raw files (or fifos fed by ffmpeg -f rawvideo)."""

    def __init__(self, path: str, h: int, w: int, c: int = 3, slots: int = 8):
        self.shape = (h, w, c)
        self.frame_bytes = h * w * c
        lib = get_lib()
        self._lib = lib
        self._handle = None
        self._file = None
        if lib is not None:
            self._handle = lib.s2v_loader_open(
                path.encode(), self.frame_bytes, slots
            )
            if not self._handle:
                raise FileNotFoundError(path)
        else:
            self._file = open(path, "rb")

    def __iter__(self):
        return self

    def __next__(self) -> np.ndarray:
        out = np.empty(self.shape, np.uint8)
        if self._handle is not None:
            ok = self._lib.s2v_loader_next(
                self._handle, out.ctypes.data_as(ctypes.c_void_p)
            )
            if not ok:
                raise StopIteration
            return out
        raw = self._file.read(self.frame_bytes)
        if len(raw) < self.frame_bytes:
            raise StopIteration
        return np.frombuffer(raw, np.uint8).reshape(self.shape).copy()

    def close(self):
        if self._handle is not None:
            self._lib.s2v_loader_close(self._handle)
            self._handle = None
        if self._file is not None:
            self._file.close()
