"""Data layer: bucketing plans, loader padding, kaldi ark roundtrip,
manifest roundtrip, espnet data.json compat."""

import io
import json

import numpy as np

from tpu_asr import IGNORE_ID
from tpu_asr.data import (Bucket, DataLoader, load_espnet_json,
                          load_manifest, make_buckets, plan_batches,
                          save_manifest, Utterance)
from tpu_asr.data.kaldi_io import read_mat, write_mat
from tpu_asr.data.synthetic import make_synthetic_dataset


def _utts(rng, n=50):
    utts, waves = make_synthetic_dataset(n, vocab_size=16, seed=1)
    return utts, waves


def test_bucketing_static_shapes(rng):
    utts, _ = _utts(rng)
    buckets = make_buckets(utts, num_buckets=3, batch_frames=160000,
                           max_frames_cap=200000, length_key="num_samples")
    assert 1 <= len(buckets) <= 3
    plan = plan_batches(utts, buckets, shuffle=False,
                        length_key="num_samples")
    covered = [i for _, idxs in plan for i in idxs]
    assert sorted(covered) == list(range(len(utts)))  # all within caps here
    for bi, idxs in plan:
        b = buckets[bi]
        assert len(idxs) <= b.batch_size
        for i in idxs:
            assert utts[i].num_samples <= b.max_frames
            assert utts[i].num_tokens <= b.max_tokens


def test_loader_pads_to_bucket_shape(rng):
    utts, waves = _utts(rng)
    buckets = make_buckets(utts, num_buckets=2, batch_frames=160000,
                           max_frames_cap=200000, length_key="num_samples")
    loader = DataLoader(utts, buckets, mode="wav", waves=waves,
                        shuffle=True, seed=3)
    seen = 0
    for batch in loader:
        b = batch["wav"].shape
        assert b[1] in {bk.max_frames for bk in buckets}
        n = b[0]
        seen += n
        assert batch["targets"].shape[0] == n
        for j in range(n):
            L = batch["wav_lengths"][j]
            assert np.all(batch["wav"][j, L:] == 0)
            tl = batch["target_lengths"][j]
            assert np.all(batch["targets"][j, tl:] == IGNORE_ID)
    assert seen == len(utts)


def test_kaldi_ark_roundtrip(tmp_path, rng):
    mats = [rng.standard_normal((7, 5)).astype(np.float32),
            rng.standard_normal((3, 5)).astype(np.float32)]
    ark = tmp_path / "feats.ark"
    offsets = []
    with open(ark, "wb") as f:
        for i, m in enumerate(mats):
            offsets.append(write_mat(f, m, key=f"utt{i}"))
    for m, off in zip(mats, offsets):
        got = read_mat(f"{ark}:{off}")
        np.testing.assert_allclose(got, m)


def test_manifest_roundtrip(tmp_path, rng):
    utts, _ = _utts(rng, n=5)
    p = tmp_path / "manifest.jsonl"
    save_manifest(utts, str(p))
    back = load_manifest(str(p))
    assert [u.id for u in back] == [u.id for u in utts]
    assert [u.tokens for u in back] == [u.tokens for u in utts]


def test_espnet_json_compat(tmp_path):
    data = {"utts": {"u1": {
        "input": [{"feat": "/x/feats.ark:12", "shape": [120, 80]}],
        "output": [{"text": "ab", "tokenid": "5 7", "shape": [2, 100]}],
    }}}
    p = tmp_path / "data.json"
    p.write_text(json.dumps(data))
    utts = load_espnet_json(str(p))
    assert utts[0].id == "u1" and utts[0].tokens == [5, 7]
    assert utts[0].num_frames == 120 and utts[0].feat == "/x/feats.ark:12"
