"""ctypes bindings for the native runtime library (with Python fallbacks).

Exposes: RVL depth codec, zlib blob compression, JPEG/PNG grayscale/16-bit
decode, and the threaded prefetching FrameLoader. If the shared library is
missing it is built on first import (a few seconds); on failure the pure-
Python fallbacks (PIL/zlib) keep everything working.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import zlib as _pyzlib
from typing import List, Optional, Sequence, Tuple

import numpy as np

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "librtabmap_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.rvl_compress.restype = ctypes.c_int64
    lib.rvl_compress.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib.rvl_decompress.restype = ctypes.c_int64
    lib.rvl_decompress.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_void_p, ctypes.c_int64]
    lib.zlib_compress_bound.restype = ctypes.c_int64
    lib.zlib_compress_bound.argtypes = [ctypes.c_int64]
    lib.zlib_compress2.restype = ctypes.c_int64
    lib.zlib_compress2.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
    lib.zlib_decompress.restype = ctypes.c_int64
    lib.zlib_decompress.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_void_p, ctypes.c_int64]
    lib.jpeg_decode_gray.restype = ctypes.c_int
    lib.jpeg_decode_gray.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.POINTER(ctypes.c_int),
                                     ctypes.POINTER(ctypes.c_int)]
    lib.png_decode_gray8.restype = ctypes.c_int
    lib.png_decode_gray8.argtypes = lib.jpeg_decode_gray.argtypes
    lib.png_decode_gray16.restype = ctypes.c_int
    lib.png_decode_gray16.argtypes = lib.jpeg_decode_gray.argtypes
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [ctypes.POINTER(ctypes.c_char_p),
                                  ctypes.POINTER(ctypes.c_char_p),
                                  ctypes.c_int64, ctypes.c_int,
                                  ctypes.c_int64, ctypes.c_int]
    lib.loader_get.restype = ctypes.c_int
    lib.loader_get.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                               ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                               ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
                               ctypes.POINTER(ctypes.c_int)]
    lib.loader_destroy.restype = None
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


# ----------------------------------------------------------------------- RVL


def rvl_compress(depth_mm: np.ndarray) -> bytes:
    """Lossless-compress a uint16 depth image (RVL)."""
    arr = np.ascontiguousarray(depth_mm, np.uint16)
    lib = _load()
    if lib is None:
        return _pyzlib.compress(arr.tobytes(), 1)  # fallback: zlib
    # worst case ~3.5 bytes/value (6-nibble deltas + run headers); the C
    # contract requires >= 4*n+8 bytes
    out = np.empty(arr.size * 4 + 16, np.uint8)
    n = lib.rvl_compress(arr.ctypes.data, arr.size, out.ctypes.data)
    return out[:n].tobytes()


def rvl_decompress(blob: bytes, shape: Tuple[int, int]) -> np.ndarray:
    lib = _load()
    n = shape[0] * shape[1]
    if lib is None:
        return np.frombuffer(_pyzlib.decompress(blob), np.uint16).reshape(shape).copy()
    src = np.frombuffer(blob, np.uint8)
    out = np.empty(n, np.uint16)
    got = lib.rvl_decompress(src.ctypes.data, src.size, out.ctypes.data, n)
    if got != n:
        raise ValueError(f"rvl_decompress: got {got}, expected {n}")
    return out.reshape(shape)


# ---------------------------------------------------------------------- zlib


def compress_blob(data: bytes, level: int = 1) -> bytes:
    lib = _load()
    if lib is None:
        return _pyzlib.compress(data, level)
    src = np.frombuffer(data, np.uint8)
    cap = lib.zlib_compress_bound(src.size)
    out = np.empty(cap, np.uint8)
    n = lib.zlib_compress2(src.ctypes.data, src.size, out.ctypes.data, cap, level)
    if n < 0:
        raise ValueError("zlib_compress2 failed")
    return out[:n].tobytes()


def decompress_blob(blob: bytes, expected_size: int) -> bytes:
    lib = _load()
    if lib is None:
        return _pyzlib.decompress(blob)
    src = np.frombuffer(blob, np.uint8)
    out = np.empty(expected_size, np.uint8)
    n = lib.zlib_decompress(src.ctypes.data, src.size, out.ctypes.data, expected_size)
    if n < 0:
        raise ValueError("zlib_decompress failed")
    return out[:n].tobytes()


# --------------------------------------------------------------------- decode


def decode_gray(blob: bytes, max_pixels: int = 4096 * 4096) -> Optional[np.ndarray]:
    """Decode a JPEG/PNG byte buffer to 8-bit grayscale (H,W)."""
    lib = _load()
    if lib is None:
        import io

        from PIL import Image

        img = Image.open(io.BytesIO(blob)).convert("L")
        return np.asarray(img)
    src = np.frombuffer(blob, np.uint8)
    out = np.empty(max_pixels, np.uint8)
    w = ctypes.c_int()
    h = ctypes.c_int()
    if blob[:2] == b"\xff\xd8":
        rc = lib.jpeg_decode_gray(src.ctypes.data, src.size, out.ctypes.data,
                                  max_pixels, ctypes.byref(w), ctypes.byref(h))
    else:
        rc = lib.png_decode_gray8(src.ctypes.data, src.size, out.ctypes.data,
                                  max_pixels, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return out[: w.value * h.value].reshape(h.value, w.value).copy()


def decode_depth16(blob: bytes, max_pixels: int = 4096 * 4096) -> Optional[np.ndarray]:
    """Decode a 16-bit PNG depth buffer to uint16 (H,W)."""
    lib = _load()
    if lib is None:
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(blob)))
    src = np.frombuffer(blob, np.uint8)
    out = np.empty(max_pixels, np.uint16)
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.png_decode_gray16(src.ctypes.data, src.size, out.ctypes.data,
                               max_pixels, ctypes.byref(w), ctypes.byref(h))
    if rc != 0:
        return None
    return out[: w.value * h.value].reshape(h.value, w.value).copy()


# --------------------------------------------------------------------- loader


class FrameLoader:
    """Threaded prefetching decoder over (rgb, depth) file lists.

    Workers read + decode ahead of the consumer; ``get(i)`` blocks until
    frame i is ready (in-order consumption assumed). Falls back to
    synchronous PIL decoding without the native library.
    """

    def __init__(self, rgb_files: Sequence[str],
                 depth_files: Optional[Sequence[str]] = None,
                 threads: int = 2, max_pixels: int = 2048 * 2048,
                 prefetch: int = 8):
        self.rgb_files = list(rgb_files)
        self.depth_files = list(depth_files) if depth_files else None
        self.max_pixels = max_pixels
        self._lib = _load()
        self._handle = None
        if self._lib is not None:
            n = len(self.rgb_files)
            rgb_arr = (ctypes.c_char_p * n)(*[s.encode() for s in self.rgb_files])
            if self.depth_files:
                d_arr = (ctypes.c_char_p * n)(*[s.encode() for s in self.depth_files])
            else:
                d_arr = None
            self._handle = self._lib.loader_create(rgb_arr, d_arr, n, threads,
                                                   max_pixels, prefetch)
            self._keepalive = (rgb_arr, d_arr)

    def __len__(self):
        return len(self.rgb_files)

    def get(self, index: int):
        """Returns (gray uint8 (H,W), depth uint16 (H,W) or None)."""
        if self._handle:
            gray = np.empty(self.max_pixels, np.uint8)
            depth = np.empty(self.max_pixels, np.uint16)
            w = ctypes.c_int(); h = ctypes.c_int()
            dw = ctypes.c_int(); dh = ctypes.c_int(); dok = ctypes.c_int()
            rc = self._lib.loader_get(
                self._handle, index, gray.ctypes.data,
                ctypes.byref(w), ctypes.byref(h), depth.ctypes.data,
                ctypes.byref(dw), ctypes.byref(dh), ctypes.byref(dok))
            if rc != 0:
                raise IOError(f"decode failed for {self.rgb_files[index]} ({rc})")
            g = gray[: w.value * h.value].reshape(h.value, w.value).copy()
            d = (depth[: dw.value * dh.value].reshape(dh.value, dw.value).copy()
                 if dok.value else None)
            return g, d
        # fallback
        from PIL import Image

        g = np.asarray(Image.open(self.rgb_files[index]).convert("L"))
        d = None
        if self.depth_files:
            d = np.asarray(Image.open(self.depth_files[index]))
        return g, d

    def close(self):
        if self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
