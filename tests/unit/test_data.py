"""Data layer: bucketing plans, loader padding, kaldi ark roundtrip,
manifest roundtrip, espnet data.json compat."""

import io
import json

import numpy as np
import pytest

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


def test_batch_size_mode(rng):
    """Reference --batch_size mode: fixed utterance count per batch across
    all buckets, instead of the batch_frames budget."""
    utts, _ = _utts(rng)
    buckets = make_buckets(utts, num_buckets=3, batch_frames=160000,
                           max_frames_cap=200000, length_key="num_samples",
                           batch_size=4)
    assert all(b.batch_size <= 4 for b in buckets)
    assert max(b.batch_size for b in buckets) == 4
    plan = plan_batches(utts, buckets, shuffle=False,
                        length_key="num_samples")
    assert all(len(idxs) <= 4 for _, idxs in plan)
    covered = [i for _, idxs in plan for i in idxs]
    assert sorted(covered) == list(range(len(utts)))
    # still rounds to the mesh multiple
    b2 = make_buckets(utts, num_buckets=2, batch_frames=160000,
                      max_frames_cap=200000, length_key="num_samples",
                      batch_size=6, batch_multiple=4)
    assert all(b.batch_size % 4 == 0 for b in b2)


def _ark_loader_batches(tmp_path, rng, d_in=8, n=6):
    ark = tmp_path / "feats.ark"
    utts = []
    with open(ark, "wb") as f:
        for i in range(n):
            t = int(rng.integers(20, 40))
            off = write_mat(f, rng.standard_normal((t, d_in))
                            .astype(np.float32), key=f"u{i}")
            toks = [int(x) for x in rng.integers(2, 14, 3)]
            utts.append(Utterance(id=f"u{i}", tokens=toks,
                                  feat=f"{ark}:{off}", num_frames=t))
    buckets = make_buckets(utts, num_buckets=1, max_frames_cap=64,
                           max_tokens_cap=8, batch_size=3)
    loader = DataLoader(utts, buckets, mode="feat", shuffle=False)
    return utts, list(loader)


def test_ark_feat_loader_batches(tmp_path, rng):
    """Feat-mode ingestion: binary kaldi ark -> native C++ parser -> feat
    DataLoader (batch_size mode) -> padded batches covering every utt with
    exact per-row contents. (Reference: src/data/data.py reads fbank mats
    from ark via kaldi_io.)"""
    from tpu_asr.data.kaldi_io import read_mat
    utts, batches = _ark_loader_batches(tmp_path, rng)
    n = len(utts)
    assert sum(int((b["feat_lengths"] > 0).sum()) for b in batches) == n
    by_id = {u.id: u for u in utts}
    seen = 0
    for b in batches:
        for row, uid in enumerate(b["ids"]):
            if not uid:
                continue
            u = by_id[uid]
            t = int(b["feat_lengths"][row])
            assert t == u.num_frames
            np.testing.assert_allclose(
                b["feats"][row, :t], read_mat(u.feat), rtol=1e-6)
            seen += 1
    assert seen == n


@pytest.mark.slow
def test_ark_feat_loader_trains_step(tmp_path, rng):
    """The ark-fed batch drives one finite train step (slow tier: compiles
    the hybrid train step; batch-content exactness above is fast)."""
    import jax
    import jax.numpy as jnp
    from tpu_asr.models import ModelConfig, Transformer
    from tpu_asr.train import TrainState, make_optimizer, make_train_step
    from tpu_asr.train.loop import strip_host_fields

    d_in = 8
    _, batches = _ark_loader_batches(tmp_path, rng, d_in=d_in)
    cfg = ModelConfig(vocab_size=16, d_input=d_in, d_model=16, d_inner=32,
                      num_heads=2, num_enc_layers=1, num_dec_layers=1,
                      model_type="hybrid", dropout=0.0)
    model = Transformer(cfg)
    b0 = {k: jnp.asarray(v) for k, v in strip_host_fields(batches[0]).items()}
    params = model.init(jax.random.PRNGKey(0), b0["feats"],
                        b0["feat_lengths"], b0["targets"],
                        b0["target_lengths"])
    tx = make_optimizer(cfg.d_model)
    state = TrainState.create(params["params"], tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, donate=False)
    state, metrics = step(state, b0)
    assert np.isfinite(float(metrics["loss"]))


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
