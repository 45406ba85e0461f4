"""Minimal pure-Python Kaldi ark matrix reader.

The reference reads fbank features with the `kaldi_io` package (C-backed ark
parsing) inside its DataLoader (reference: src/data/data.py
`kaldi_io.read_mat(feat_path)`). Our pipeline computes features on device,
so this reader exists for (a) consuming reference-prepared espnet
data.json/ark datasets directly and (b) feature-parity tests.

Supports binary float/double matrices ("BFM "/"BDM ") and compressed ark is
NOT supported (prepare with --compress false).
"""

from __future__ import annotations

import struct

import numpy as np


def read_mat(rxspecifier: str) -> np.ndarray:
    """Read one matrix from 'path/to/file.ark:offset' (or a plain file
    positioned at a matrix record)."""
    if ":" in rxspecifier:
        path, offset = rxspecifier.rsplit(":", 1)
        offset = int(offset)
    else:
        path, offset = rxspecifier, 0
    with open(path, "rb") as f:
        f.seek(offset)
        return _read_mat_binary(f)


def _expect(f, token: bytes):
    got = f.read(len(token))
    if got != token:
        raise ValueError(f"expected {token!r}, got {got!r}")


def _read_int32(f) -> int:
    size_byte = f.read(1)
    if size_byte != b"\x04":
        raise ValueError(f"bad int size byte {size_byte!r}")
    return struct.unpack("<i", f.read(4))[0]


def _read_mat_binary(f) -> np.ndarray:
    binary = f.read(2)
    if binary != b"\x00B":
        raise ValueError(f"not a binary kaldi record: {binary!r}")
    kind = f.read(3)
    if kind == b"FM ":
        dtype, itemsize = np.float32, 4
    elif kind == b"DM ":
        dtype, itemsize = np.float64, 8
    else:
        raise ValueError(f"unsupported matrix type {kind!r} "
                         "(compressed ark not supported)")
    rows = _read_int32(f)
    cols = _read_int32(f)
    buf = f.read(rows * cols * itemsize)
    return np.frombuffer(buf, dtype=dtype).reshape(rows, cols).copy()


def read_ark_scp(scp_path: str):
    """Iterate (utt_id, matrix) over a Kaldi .scp index file."""
    with open(scp_path, encoding="utf-8") as f:
        for line in f:
            parts = line.split()
            if len(parts) != 2:
                continue
            yield parts[0], read_mat(parts[1])


def write_mat(f, mat: np.ndarray, key: str | None = None) -> int:
    """Write a binary float matrix record; returns the value offset (for
    building rxspecifiers). Used by tests and the data-prep CLI."""
    if key is not None:
        f.write(key.encode() + b" ")
    offset = f.tell()
    f.write(b"\x00BFM ")
    for dim in mat.shape:
        f.write(b"\x04" + struct.pack("<i", dim))
    f.write(np.ascontiguousarray(mat, np.float32).tobytes())
    return offset
