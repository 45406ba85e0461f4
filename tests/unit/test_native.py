"""Native C++ runtime pieces vs their python references."""

import numpy as np
import pytest

from tpu_asr import native
from tpu_asr.data.kaldi_io import read_mat, write_mat
from tpu_asr.utils.cer import edit_distance


def test_native_builds():
    assert native.available(), "g++ build of tpu_asr_native.cc failed"


def test_native_ark_read(tmp_path, rng):
    mats = [rng.standard_normal((9, 7)).astype(np.float32),
            rng.standard_normal((4, 7)).astype(np.float32)]
    ark = tmp_path / "x.ark"
    offs = []
    with open(ark, "wb") as f:
        for i, m in enumerate(mats):
            offs.append(write_mat(f, m, key=f"u{i}"))
    for m, off in zip(mats, offs):
        got = native.read_ark_mat(str(ark), off)
        np.testing.assert_allclose(got, m)
        py = read_mat(f"{ark}:{off}")
        np.testing.assert_allclose(got, py)


def test_native_pad_batch(rng):
    arrays = [rng.standard_normal((n, 5)).astype(np.float32)
              for n in (3, 7, 1)]
    out = native.pad_batch(arrays, max_rows=8)
    assert out.shape == (3, 8, 5)
    for i, a in enumerate(arrays):
        np.testing.assert_allclose(out[i, : a.shape[0]], a)
        assert (out[i, a.shape[0]:] == 0).all()


def test_native_edit_distance(rng):
    refs = [[1, 2, 3, 4], [5, 6], [], [7, 7, 7]]
    hyps = [[1, 3, 4], [5, 6], [1], [7, 8, 7, 7]]
    out = native.batch_edit_distance(refs, hyps)
    for i, (r, h) in enumerate(zip(refs, hyps)):
        d = edit_distance(r, h)
        assert out[i].tolist() == [d["distance"], d["sub"], d["ins"],
                                   d["del"]], (i, out[i], d)


def test_native_edit_distance_random(rng):
    refs = [rng.integers(0, 5, rng.integers(0, 12)).tolist()
            for _ in range(20)]
    hyps = [rng.integers(0, 5, rng.integers(0, 12)).tolist()
            for _ in range(20)]
    out = native.batch_edit_distance(refs, hyps)
    for i, (r, h) in enumerate(zip(refs, hyps)):
        d = edit_distance(r, h)
        assert out[i, 0] == d["distance"]
