"""Batched data loader: bucket-padded numpy batches with thread prefetch.

Reference: src/data/data.py `AudioDataLoader`/`_collate_fn` (worker
processes read kaldi mats, LFR-stack, pad to batch max). TPU redesign: the
collate pads to the *bucket's* static shape, feature extraction moved on
device (wav mode), and a single background thread keeps the device fed
(the model step dominates; Python IO overlaps it).
"""

from __future__ import annotations

import queue
import threading

import numpy as np

from tpu_asr import IGNORE_ID
from tpu_asr.data.bucketing import Bucket, plan_batches
from tpu_asr.data.manifest import Utterance


class DataLoader:
    def __init__(
        self,
        utts: list[Utterance],
        buckets: list[Bucket],
        mode: str = "wav",                 # wav | feat
        waves: dict | None = None,         # in-memory wavs (tests/bench)
        feats: dict | None = None,         # in-memory features
        shuffle: bool = True,
        sort_by_length: bool = True,
        drop_last: bool = False,
        seed: int = 0,
        prefetch: int = 2,
        epoch: int = 0,
        pad_to_batch_size: bool = True,
    ):
        assert mode in ("wav", "feat")
        self.utts = utts
        self.buckets = buckets
        self.mode = mode
        self.waves = waves or {}
        self.feats = feats or {}
        self.shuffle = shuffle
        self.sort_by_length = sort_by_length
        self.drop_last = drop_last
        self.pad_to_batch_size = pad_to_batch_size
        self.seed = seed
        self.prefetch = prefetch
        self.epoch = epoch
        self.length_key = "num_samples" if mode == "wav" else "num_frames"

    def _load_input(self, u: Utterance) -> np.ndarray:
        if self.mode == "wav":
            if u.id in self.waves:
                return self.waves[u.id]
            assert u.wav, f"no wav for {u.id}"
            if u.wav.endswith(".npy"):
                return np.load(u.wav)
            from tpu_asr.data.audio import read_wav
            return read_wav(u.wav)
        if u.id in self.feats:
            return self.feats[u.id]
        assert u.feat, f"no feat for {u.id}"
        if u.feat.endswith(".npy"):
            return np.load(u.feat)
        # kaldi ark: native C++ parser (python fallback inside)
        from tpu_asr import native
        if ":" in u.feat:
            path, off = u.feat.rsplit(":", 1)
            return native.read_ark_mat(path, int(off))
        return native.read_ark_mat(u.feat)

    def _make_batch(self, bucket: Bucket, idxs: list[int]) -> dict:
        """Collate one batch, padded to the bucket's STATIC shape.

        A partial final chunk is padded with dummy rows (all-zero input,
        length 0, IGNORE targets) up to bucket.batch_size, so every batch
        of a bucket has one shape (one executable per bucket, and batch
        dims stay divisible by the data-parallel mesh axis). The models
        mask rows with feat_lengths == 0 out of every loss; `ids` lists
        only the real utterances, so decode consumers drop dummy rows by
        zipping against it.
        """
        n_real = len(idxs)
        n = (bucket.batch_size if self.pad_to_batch_size
             else n_real)
        us = [self.utts[i] for i in idxs]
        tmax, umax = bucket.max_frames, bucket.max_tokens
        targets = np.full((n, umax), IGNORE_ID, np.int32)
        tlens = np.zeros((n,), np.int32)
        for j, u in enumerate(us):
            targets[j, : len(u.tokens)] = u.tokens
            tlens[j] = len(u.tokens)
        from tpu_asr import native
        xs = [self._load_input(u) for u in us]
        lens = np.zeros((n,), np.int32)
        lens[:n_real] = [x.shape[0] for x in xs]
        padded = native.pad_batch(xs, tmax)
        if n > n_real:
            pad_rows = np.zeros((n - n_real,) + padded.shape[1:],
                                padded.dtype)
            padded = np.concatenate([padded, pad_rows], axis=0)
        ids = [u.id for u in us]
        if self.mode == "wav":
            return {"wav": padded[:, :, 0], "wav_lengths": lens,
                    "targets": targets, "target_lengths": tlens, "ids": ids}
        return {"feats": padded, "feat_lengths": lens, "targets": targets,
                "target_lengths": tlens, "ids": ids}

    def __len__(self):
        return len(plan_batches(self.utts, self.buckets, shuffle=False,
                                sort_by_length=self.sort_by_length,
                                drop_last=self.drop_last,
                                length_key=self.length_key))

    def __iter__(self):
        plan = plan_batches(
            self.utts, self.buckets, shuffle=self.shuffle,
            sort_by_length=self.sort_by_length, drop_last=self.drop_last,
            seed=self.seed + self.epoch, length_key=self.length_key)
        self.epoch += 1
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def producer():
            try:
                for bi, idxs in plan:
                    q.put(self._make_batch(self.buckets[bi], idxs))
            finally:
                q.put(stop)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
