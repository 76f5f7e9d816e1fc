"""ctypes binding for the native threaded frame loader (dataloader.cc).

`available()` gates every consumer: when the shared library is missing it is
built on first use (g++ + OpenCV are part of the image); if that fails the
data layer silently falls back to the pure-Python OpenCV path in
gsavatar/data/zju_format.py — identical output, just single-threaded.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, 'libgsdata.so')
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(['make', '-C', _DIR], check=True,
                       capture_output=True, timeout=300)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    c_str_arr = ctypes.POINTER(ctypes.c_char_p)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.gs_decode_frame.restype = ctypes.c_int
    lib.gs_decode_frame.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, f64p, f64p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p,
        ctypes.c_char_p, ctypes.c_int]
    lib.gs_decode_batch.restype = ctypes.c_int
    lib.gs_decode_batch.argtypes = [
        ctypes.c_int, c_str_arr, c_str_arr, f64p, f64p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p,
        ctypes.c_char_p, ctypes.c_int]
    lib.gs_prefetcher_create.restype = ctypes.c_void_p
    lib.gs_prefetcher_create.argtypes = [
        ctypes.c_int, c_str_arr, c_str_arr, f64p, f64p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.gs_prefetcher_set_schedule.restype = None
    lib.gs_prefetcher_set_schedule.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.gs_prefetcher_next.restype = ctypes.c_int
    lib.gs_prefetcher_next.argtypes = [ctypes.c_void_p, f32p, f32p]
    lib.gs_prefetcher_error.restype = ctypes.c_int
    lib.gs_prefetcher_error.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_int]
    lib.gs_prefetcher_destroy.restype = None
    lib.gs_prefetcher_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _paths_arr(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    arr[:] = [p.encode() for p in paths]
    return arr


def _f64p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _per_frame_Kd(K, dist, n):
    K = np.ascontiguousarray(np.broadcast_to(
        np.asarray(K, np.float64).reshape(-1, 9)[0], (n, 9))) \
        if np.asarray(K).size == 9 else \
        np.ascontiguousarray(np.asarray(K, np.float64).reshape(n, 9))
    dist = np.ascontiguousarray(np.broadcast_to(
        np.asarray(dist, np.float64).reshape(-1, 5)[0], (n, 5))) \
        if np.asarray(dist).size == 5 else \
        np.ascontiguousarray(np.asarray(dist, np.float64).reshape(n, 5))
    return K, dist


def decode_frame(img_path: str, mask_path: str, K, dist, hw_out,
                 white_bg: bool, lanczos: bool = False):
    """Native equivalent of zju_format.load_image_mask (same OpenCV calls)."""
    lib = _load()
    assert lib is not None
    h, w = hw_out
    img = np.empty((h, w, 3), np.float32)
    mask = np.empty((h, w), np.float32)
    Kc = np.ascontiguousarray(np.asarray(K, np.float64).reshape(9))
    dc = np.ascontiguousarray(np.asarray(dist, np.float64).reshape(5))
    err = ctypes.create_string_buffer(512)
    rc = lib.gs_decode_frame(img_path.encode(), mask_path.encode(),
                             _f64p(Kc), _f64p(dc), h, w, int(white_bg),
                             int(lanczos), _f32p(img), _f32p(mask), err, 512)
    if rc:
        raise IOError(err.value.decode())
    return img, mask


def decode_batch(img_paths: Sequence[str], mask_paths: Sequence[str], K,
                 dist, hw_out, white_bg: bool, lanczos: bool = False,
                 n_threads: int = 0):
    """Parallel preload: returns (n, h, w, 3) images and (n, h, w) masks."""
    lib = _load()
    assert lib is not None
    n = len(img_paths)
    h, w = hw_out
    imgs = np.empty((n, h, w, 3), np.float32)
    masks = np.empty((n, h, w), np.float32)
    Kc, dc = _per_frame_Kd(K, dist, n)
    err = ctypes.create_string_buffer(512)
    rc = lib.gs_decode_batch(
        n, _paths_arr(img_paths), _paths_arr(mask_paths), _f64p(Kc),
        _f64p(dc), h, w, int(white_bg), int(lanczos), int(n_threads),
        _f32p(imgs), _f32p(masks), err, 512)
    if rc:
        raise IOError(err.value.decode())
    return imgs, masks


class Prefetcher:
    """Background lookahead decoder driven by an epoch schedule.

    Usage:
        pf = Prefetcher(img_paths, mask_paths, K, dist, (h, w), white_bg)
        pf.set_schedule(permutation)      # per epoch
        idx, img, mask = pf.next()        # blocks until decoded
    """

    def __init__(self, img_paths, mask_paths, K, dist, hw_out, white_bg,
                 lanczos=False, lookahead=4, n_threads=2):
        lib = _load()
        assert lib is not None
        self._lib = lib
        self._hw = hw_out
        n = len(img_paths)
        Kc, dc = _per_frame_Kd(K, dist, n)
        # keep the ctypes arrays alive for the native ctor call
        ip, mp = _paths_arr(img_paths), _paths_arr(mask_paths)
        self._h = lib.gs_prefetcher_create(
            n, ip, mp, _f64p(Kc), _f64p(dc), hw_out[0], hw_out[1],
            int(white_bg), int(lanczos), int(lookahead), int(n_threads))

    def set_schedule(self, order):
        order = np.ascontiguousarray(np.asarray(order, np.int32))
        self._lib.gs_prefetcher_set_schedule(
            self._h, order.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            len(order))

    def next(self):
        h, w = self._hw
        img = np.empty((h, w, 3), np.float32)
        mask = np.empty((h, w), np.float32)
        idx = self._lib.gs_prefetcher_next(self._h, _f32p(img), _f32p(mask))
        if idx == -1:
            return None
        if idx == -2:
            err = ctypes.create_string_buffer(512)
            self._lib.gs_prefetcher_error(self._h, err, 512)
            raise IOError(err.value.decode())
        return idx, img, mask

    def close(self):
        if self._h:
            self._lib.gs_prefetcher_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
