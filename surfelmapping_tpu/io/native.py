"""ctypes bindings for the native IO runtime (csrc/surfelio.cpp).

Provides a multithreaded PNG frame prefetcher and reference-format map IO.
Falls back gracefully (``native_available() == False``) when the shared
library has not been built; `ensure_built()` compiles it on demand with the
system toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LIB_PATH = os.path.abspath(os.path.join(_CSRC, "libsurfelio.so"))
_lib = None


def ensure_built(quiet: bool = True) -> bool:
    """Build libsurfelio.so if missing; returns availability."""
    global _lib
    if _lib is not None:
        return True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_CSRC)],
                check=True,
                capture_output=quiet,
            )
        except Exception:
            return False
    return _load()


def _load() -> bool:
    global _lib
    if _lib is not None:
        return True
    if not os.path.exists(_LIB_PATH):
        return False
    lib = ctypes.CDLL(_LIB_PATH)
    c = ctypes
    lib.sm_read_png.argtypes = [
        c.c_char_p, c.POINTER(c.POINTER(c.c_ubyte)),
        c.POINTER(c.c_int), c.POINTER(c.c_int), c.POINTER(c.c_int),
        c.POINTER(c.c_int),
    ]
    lib.sm_free.argtypes = [c.c_void_p]
    lib.sm_loader_create.restype = c.c_void_p
    lib.sm_loader_create.argtypes = [
        c.c_char_p, c.c_char_p, c.c_char_p, c.c_int, c.c_int, c.c_int, c.c_int
    ]
    lib.sm_loader_get.argtypes = [
        c.c_void_p, c.c_int, c.POINTER(c.c_void_p),
        c.POINTER(c.POINTER(c.c_ubyte)), c.POINTER(c.c_int), c.POINTER(c.c_int), c.POINTER(c.c_int),
        c.POINTER(c.POINTER(c.c_ubyte)), c.POINTER(c.c_int), c.POINTER(c.c_int), c.POINTER(c.c_int),
        c.POINTER(c.POINTER(c.c_ubyte)), c.POINTER(c.c_int), c.POINTER(c.c_int),
    ]
    lib.sm_frame_free.argtypes = [c.c_void_p]
    lib.sm_loader_destroy.argtypes = [c.c_void_p]
    lib.sm_save_map.argtypes = [
        c.c_char_p, c.POINTER(c.c_float), c.c_uint, c.c_int, c.c_int
    ]
    lib.sm_load_map.argtypes = [
        c.c_char_p, c.POINTER(c.POINTER(c.c_float)), c.POINTER(c.c_uint),
        c.POINTER(c.c_int), c.POINTER(c.c_int),
    ]
    _lib = lib
    return True


def native_available() -> bool:
    return _load()


def read_png(path: str) -> np.ndarray:
    """Decode a PNG natively: u8[H,W] / u8[H,W,3] / u16[H,W]."""
    if not _load():
        raise RuntimeError("libsurfelio.so not built (run ensure_built())")
    c = ctypes
    data = c.POINTER(c.c_ubyte)()
    w, h, ch, bd = c.c_int(), c.c_int(), c.c_int(), c.c_int()
    rc = _lib.sm_read_png(path.encode(), c.byref(data), c.byref(w), c.byref(h),
                          c.byref(ch), c.byref(bd))
    if rc != 0:
        raise FileNotFoundError(path)
    try:
        nbytes = w.value * h.value * ch.value * (bd.value // 8)
        buf = np.frombuffer(
            c.cast(data, c.POINTER(c.c_ubyte * nbytes)).contents, np.uint8
        ).copy()
    finally:
        _lib.sm_free(data)
    if bd.value == 16:
        arr = buf.view("<u2").reshape(h.value, w.value, ch.value)
    else:
        arr = buf.reshape(h.value, w.value, ch.value)
    return arr[:, :, 0] if ch.value == 1 else arr


class FramePrefetcher:
    """Background-threaded (rgb, depth, semantic) PNG triple loader keeping
    ``queue_depth`` frames decoded ahead of the consumer."""

    def __init__(self, rgb_dir: str, depth_dir: str, sem_dir: str,
                 first_id: int, last_id: int, n_threads: int = 2,
                 queue_depth: int = 8):
        if not ensure_built():
            raise RuntimeError("native loader unavailable")
        self._h = _lib.sm_loader_create(
            rgb_dir.encode(), depth_dir.encode(), sem_dir.encode(),
            first_id, last_id, n_threads, queue_depth,
        )
        if not self._h:
            raise RuntimeError("loader creation failed")

    def get(self, frame_id: int):
        """Returns (rgb u8[H,W,3], depth u16[H,W], semantic u8[H,W])."""
        c = ctypes
        fh = c.c_void_p()
        prgb = c.POINTER(c.c_ubyte)()
        pdep = c.POINTER(c.c_ubyte)()
        psem = c.POINTER(c.c_ubyte)()
        rw, rh, rc_ = c.c_int(), c.c_int(), c.c_int()
        dw, dh, dbits = c.c_int(), c.c_int(), c.c_int()
        sw, sh = c.c_int(), c.c_int()
        rc = _lib.sm_loader_get(
            self._h, frame_id, c.byref(fh),
            c.byref(prgb), c.byref(rw), c.byref(rh), c.byref(rc_),
            c.byref(pdep), c.byref(dw), c.byref(dh), c.byref(dbits),
            c.byref(psem), c.byref(sw), c.byref(sh),
        )
        if rc != 0:
            raise RuntimeError(f"frame {frame_id} failed to load (rc={rc})")
        try:
            def copy(ptr, nbytes):
                return np.frombuffer(
                    ctypes.cast(ptr, ctypes.POINTER(ctypes.c_ubyte * nbytes)).contents,
                    np.uint8,
                ).copy()

            rgb = copy(prgb, rw.value * rh.value * rc_.value).reshape(
                rh.value, rw.value, rc_.value
            )
            dsize = dw.value * dh.value * (dbits.value // 8)
            depth = copy(pdep, dsize)
            depth = (
                depth.view("<u2") if dbits.value == 16 else depth.astype(np.uint16)
            ).reshape(dh.value, dw.value)
            sem = copy(psem, sw.value * sh.value).reshape(sh.value, sw.value)
        finally:
            _lib.sm_frame_free(fh)
        return rgb, depth, sem

    def close(self):
        if self._h:
            _lib.sm_loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def save_map_native(path: str, records: np.ndarray, start_id: int, end_id: int):
    if not ensure_built():
        raise RuntimeError("native IO unavailable")
    rec = np.ascontiguousarray(records, dtype=np.float32)
    rc = _lib.sm_save_map(
        path.encode(), rec.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rec.shape[0], start_id, end_id,
    )
    if rc != 0:
        raise IOError(f"sm_save_map rc={rc}")


def load_map_native(path: str):
    if not ensure_built():
        raise RuntimeError("native IO unavailable")
    c = ctypes
    rec = c.POINTER(c.c_float)()
    count, s0, s1 = c.c_uint(), c.c_int(), c.c_int()
    rc = _lib.sm_load_map(path.encode(), c.byref(rec), c.byref(count),
                          c.byref(s0), c.byref(s1))
    if rc != 0:
        raise IOError(f"sm_load_map rc={rc}")
    try:
        n = count.value
        arr = np.frombuffer(
            c.cast(rec, c.POINTER(c.c_float * (n * 12))).contents, np.float32
        ).copy().reshape(n, 12)
    finally:
        _lib.sm_free(rec)
    return arr, s0.value, s1.value
