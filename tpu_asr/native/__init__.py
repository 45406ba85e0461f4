"""ctypes bindings for the native (C++) runtime pieces.

Builds tpu_asr_native.cc with g++ -O3 on first import (cached as a .so next
to the source; rebuilt when the source is newer). Every entry point has a
pure-Python fallback, so the package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tpu_asr_native.cc")
_SO = os.path.join(_HERE, "tpu_asr_native.so")
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           "-o", _SO, _SRC, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.ark_mat_shape.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32)]
        lib.ark_mat_shape.restype = ctypes.c_int
        lib.ark_mat_read.argtypes = [
            ctypes.c_char_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float)]
        lib.ark_mat_read.restype = ctypes.c_int
        lib.pad_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.POINTER(ctypes.c_float)]
        lib.pad_batch_f32.restype = None
        lib.batch_edit_distance.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int64)]
        lib.batch_edit_distance.restype = None
        _LIB = lib
        return _LIB


def available() -> bool:
    return get_lib() is not None


def read_ark_mat(path: str, offset: int = 0) -> np.ndarray:
    """Native kaldi ark matrix read; falls back to the python parser."""
    lib = get_lib()
    if lib is None:
        from tpu_asr.data.kaldi_io import read_mat
        return read_mat(f"{path}:{offset}" if offset else path)
    rows = ctypes.c_int32()
    cols = ctypes.c_int32()
    item = ctypes.c_int32()
    rc = lib.ark_mat_shape(path.encode(), offset, ctypes.byref(rows),
                           ctypes.byref(cols), ctypes.byref(item))
    if rc != 0:
        raise ValueError(f"ark parse error {rc} at {path}:{offset}")
    out = np.empty((rows.value, cols.value), np.float32)
    rc = lib.ark_mat_read(path.encode(), offset,
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc != 0:
        raise ValueError(f"ark read error {rc} at {path}:{offset}")
    return out


def pad_batch(arrays: list[np.ndarray], max_rows: int) -> np.ndarray:
    """Ragged [Ti, D] float32 arrays -> [N, max_rows, D] zero-padded."""
    n = len(arrays)
    width = arrays[0].shape[1] if arrays[0].ndim == 2 else 1
    lib = get_lib()
    if lib is None:
        out = np.zeros((n, max_rows, width), np.float32)
        for i, a in enumerate(arrays):
            out[i, : a.shape[0]] = a.reshape(a.shape[0], width)
        return out
    arrays = [np.ascontiguousarray(a.reshape(a.shape[0], width), np.float32)
              for a in arrays]
    ptrs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for a in arrays])
    lens = np.asarray([a.shape[0] for a in arrays], np.int32)
    out = np.empty((n, max_rows, width), np.float32)
    lib.pad_batch_f32(
        ptrs, lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n,
        max_rows, width, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def batch_edit_distance(refs: list[list[int]],
                        hyps: list[list[int]]) -> np.ndarray:
    """[N, 4] int64: (distance, sub, ins, del) per pair."""
    n = len(refs)
    assert n == len(hyps)
    lib = get_lib()
    if lib is None:
        from tpu_asr.utils.cer import edit_distance
        out = np.zeros((n, 4), np.int64)
        for i, (r, h) in enumerate(zip(refs, hyps)):
            d = edit_distance(r, h)
            out[i] = (d["distance"], d["sub"], d["ins"], d["del"])
        return out

    def flat(seqs):
        lens = np.asarray([len(s) for s in seqs], np.int32)
        offsets = np.zeros(n, np.int64)
        np.cumsum(lens[:-1], out=offsets[1:])
        data = np.asarray([x for s in seqs for x in s] or [0], np.int32)
        return data, offsets, lens

    rdata, roff, rlens = flat(refs)
    hdata, hoff, hlens = flat(hyps)
    out = np.empty((n, 4), np.int64)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.batch_edit_distance(
        rdata.ctypes.data_as(i32p), roff.ctypes.data_as(i64p),
        rlens.ctypes.data_as(i32p), hdata.ctypes.data_as(i32p),
        hoff.ctypes.data_as(i64p), hlens.ctypes.data_as(i32p), n,
        out.ctypes.data_as(i64p))
    return out
