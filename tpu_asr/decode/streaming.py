"""Streaming (incremental) CTC recognition over a chunk-masked encoder.

A beyond-the-reference capability (the reference — src/bin/recognize.py —
is strictly offline): feed features as they arrive, get tokens back with
bounded latency. The contract is *exact offline-equality*: the streamed
hypothesis is identical to `Recognizer(mode="greedy_ctc")` run on the full
utterance with the same (chunk-masked) model, because

  * the conv2d front-end is VALID-padded — output frame j uses only input
    frames [4j, 4j+6], so every frame the length formula admits is final;
  * the chunk mask (ModelConfig.enc_chunk_size) stops frame q from
    attending past the end of its own chunk, and masked attention terms
    underflow to exactly 0 in f32 — so once a chunk's frames all exist,
    its encoder outputs never change;
  * CTC emission is frame-synchronous: argmax + collapse needs only a
    single running "previous id" across chunk boundaries.

TPU shape discipline: ONE jitted program at a fixed [1, max_frames, D]
shape; each push re-runs it with a larger valid length. Compute per push
is O(T_so_far) matmuls — fine at ASR lengths (a production system would
add per-layer KV caches; at T' <= 750 the recompute is cheaper than the
bookkeeping). Feed pre-normalized features (global CMVN): per-utterance
CMVN (frontend.cmvn) reads the whole utterance and is not causal.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu_asr.models import ModelConfig, Transformer


@dataclasses.dataclass(eq=False)  # identity hash: self is a static jit arg
class StreamingCTCRecognizer:
    """Incremental greedy-CTC decoder for ctc/hybrid models.

    Usage:
        rec = StreamingCTCRecognizer(cfg, params, max_frames=2000)
        for chunk in feature_chunks:          # [t_i, D] each, any sizes
            new = rec.push(chunk)             # newly final token ids
        hyp = rec.finish()                    # full hypothesis
    """

    cfg: ModelConfig
    params: dict
    max_frames: int = 2000
    blank: int = 0

    def __post_init__(self):
        assert self.cfg.model_type in ("ctc", "hybrid"), \
            f"streaming CTC needs a CTC head (model_type={self.cfg.model_type})"
        assert self.cfg.input_layer == "conv2d", \
            "streaming supports the conv2d front-end (linear/LFR is offline)"
        self.model = Transformer(self.cfg)
        self._buf = np.zeros((1, self.max_frames, self.cfg.d_input),
                             np.float32)
        self._n = 0                  # received feature frames
        self._emitted_enc = 0        # encoder frames already emitted
        self._prev_id = self.blank   # CTC collapse state across pushes
        self._tokens: list[int] = []
        self._finished = False

    # one compiled program for the whole stream (fixed shape)
    @partial(jax.jit, static_argnums=0)
    def _argmax_ids(self, params, feats, n_frames):
        flens = jnp.full((1,), n_frames, jnp.int32)
        enc_out, el = self.model.apply(params, feats, flens,
                                       method=Transformer.encode)
        logits = self.model.apply(params, enc_out,
                                  method=Transformer.ctc_logits)
        return jnp.argmax(logits, axis=-1)[0], el[0]   # [T'], scalar

    def _enc_len(self, n: int) -> int:
        return max(int(self.cfg.subsampled_length(n)), 0)

    def _final_enc_frames(self, n: int) -> int:
        """Encoder frames that can never change given n received frames."""
        el = self._enc_len(n)
        chunk = self.cfg.enc_chunk_size
        if chunk <= 0:      # full-context model: nothing is final early
            return 0
        return (el // chunk) * chunk

    def _emit(self, upto: int) -> list[int]:
        if upto <= self._emitted_enc:
            return []
        ids, _ = self._argmax_ids(self.params, jnp.asarray(self._buf),
                                  self._n)
        ids = np.asarray(ids[self._emitted_enc:upto])
        out = []
        for i in ids:
            i = int(i)
            if i != self.blank and i != self._prev_id:
                out.append(i)
            self._prev_id = i
        self._emitted_enc = upto
        self._tokens.extend(out)
        return out

    def push(self, frames: np.ndarray) -> list[int]:
        """Append [t, D] feature frames; return newly final token ids."""
        assert not self._finished, "push() after finish()"
        t = frames.shape[0]
        assert self._n + t <= self.max_frames, "stream exceeds max_frames"
        self._buf[0, self._n:self._n + t] = frames
        self._n += t
        return self._emit(self._final_enc_frames(self._n))

    def finish(self) -> list[int]:
        """Flush the tail (last partial chunk) and return the full
        hypothesis; the stream cannot be pushed to afterwards."""
        if not self._finished:
            self._emit(self._enc_len(self._n))
            self._finished = True
        return list(self._tokens)

    @property
    def hypothesis(self) -> list[int]:
        return list(self._tokens)
