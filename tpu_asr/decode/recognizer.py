"""High-level batched recognizer: manifest batches -> hypothesis tokens.

Replaces the reference's src/bin/recognize.py inner loop (per-utterance,
host-driven). Batches stream through jit-compiled decode functions (one
executable per bucket shape); all reference-family decode modes are
covered: greedy CTC, attention beam, joint CTC/attention rescoring, and
CIF greedy/beam.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpu_asr.decode.beam import BeamConfig, attention_beam_search
from tpu_asr.decode.cif_decode import cif_beam_decode, cif_greedy_decode
from tpu_asr.decode.greedy_ctc import ctc_greedy_decode
from tpu_asr.frontend import FrontendConfig, wav_to_features
from tpu_asr.models import CifModel, ModelConfig, Transformer
from tpu_asr.models.decoder import Decoder


@dataclasses.dataclass(eq=False)  # identity hash: self is a static jit arg
class Recognizer:
    cfg: ModelConfig
    params: dict
    beam: BeamConfig = BeamConfig()
    mode: str = "beam"  # greedy_ctc | ctc_beam | beam | joint | attn_rescore | cif_greedy | cif_beam | transducer_greedy | transducer_beam | transducer_rescore
    frontend: FrontendConfig = FrontendConfig()
    # CIF fire-time alpha handling: True = self-scale to the rounded fire
    # count (train/inference boundary-geometry consistency); False = the
    # reference's raw-alpha firing (identical to StreamingCIFRecognizer).
    cif_scale_fire: bool = True
    # Optional external TransformerLM (models/lm.py) for shallow fusion
    # (beam/joint/ctc_beam/transducer_beam, weight = beam.lm_weight) and
    # attn_rescore n-best rescoring. Greedy paths do not consume it.
    lm_cfg: object | None = None
    lm_params: dict | None = None
    # Optional jax.sharding.Mesh for data-parallel decode: batches are
    # placed sharded along the 'data' axis, params replicated, and XLA
    # GSPMD partitions the whole compiled decode program (every decode
    # mode is batch-parallel — beam scan, prefix scorer, top-k and the
    # one-hot reorder all act per-utterance). Bucket batch sizes must be
    # multiples of the data-axis size (make_buckets batch_multiple).
    mesh: object | None = None

    def __post_init__(self):
        assert self.mode in ("greedy_ctc", "ctc_beam", "beam", "joint",
                             "attn_rescore", "cif_greedy", "cif_beam",
                             "transducer_greedy", "transducer_beam",
                             "transducer_rescore")
        mt = self.cfg.model_type
        if self.mode in ("greedy_ctc", "ctc_beam", "joint"):
            assert mt in ("ctc", "hybrid") or (
                mt == "transducer" and self.cfg.ctc_weight > 0.0
                and self.mode != "joint"), \
                f"mode {self.mode} needs a CTC head (model_type={mt})"
        if self.mode == "attn_rescore":
            assert mt == "hybrid", \
                f"mode attn_rescore needs CTC head + decoder (model_type={mt})"
        if self.mode in ("beam", "joint"):
            assert mt in ("transformer", "hybrid"), \
                f"mode {self.mode} needs an attention decoder (model_type={mt})"
        if self.mode in ("transducer_greedy", "transducer_beam",
                         "transducer_rescore"):
            assert mt == "transducer", \
                f"mode {self.mode} needs model_type=transducer"
        if self.mode == "transducer_rescore":
            assert self.cfg.ctc_weight > 0.0, \
                "transducer_rescore needs the aux CTC head (ctc_weight>0)"
        if self.mode in ("cif_greedy", "cif_beam"):
            assert mt == "cif", f"mode {self.mode} needs model_type=cif"
        from tpu_asr.models import build_model
        self.model = build_model(self.cfg)
        self.lm = None
        if self.lm_cfg is not None and self.beam.lm_weight > 0.0:
            from tpu_asr.models.lm import TransformerLM
            assert self.mode in ("beam", "joint", "attn_rescore",
                                 "transducer_beam", "ctc_beam"), \
                f"LM fusion not supported in mode {self.mode}"
            assert self.lm_cfg.vocab_size == self.cfg.vocab_size, \
                (self.lm_cfg.vocab_size, self.cfg.vocab_size)
            assert self.lm_params is not None, "lm_cfg needs lm_params"
            self.lm = TransformerLM(self.lm_cfg)
        if self.mesh is not None:
            from tpu_asr.parallel import replicated
            self.params = jax.device_put(self.params,
                                         replicated(self.mesh))
            if self.lm_params is not None:
                self.lm_params = jax.device_put(self.lm_params,
                                                replicated(self.mesh))

    # --- jitted per-shape programs ---

    def _features(self, batch):
        if "wav" in batch:
            feats, lens = wav_to_features(batch["wav"],
                                          batch["wav_lengths"],
                                          self.frontend)
        else:
            feats, lens = batch["feats"], batch["feat_lengths"]
        if self.cfg.input_layer == "linear" and self.cfg.lfr_m > 1:
            from tpu_asr.frontend import build_lfr_features, lfr_length
            feats = build_lfr_features(feats, self.cfg.lfr_m, self.cfg.lfr_n)
            lens = lfr_length(lens, self.cfg.lfr_n)
        return feats, lens

    @partial(jax.jit, static_argnums=0)
    def _greedy_ctc(self, params, batch):
        # string method names dispatch on the actual model class
        # (Transformer or TransducerModel with an aux CTC head)
        feats, flens = self._features(batch)
        enc_out, el = self.model.apply(params, feats, flens,
                                       method="encode")
        logits = self.model.apply(params, enc_out, method="ctc_logits")
        toks, lens, times = ctc_greedy_decode(logits, el, return_times=True)
        # per-token confidence: max frame posterior at the emission frame.
        # max(softmax(x)) == exp(max(x) - logsumexp(x)) — two [B, T']
        # reductions XLA fuses into the logits epilogue, instead of
        # materializing the full [B, T', V=4233] f32 softmax (which cost
        # greedy-CTC ~45% of its inverse-RTF when added in r3: 1917x ->
        # 1047x on the bench workload; r4 verdict item 2).
        frame_conf = jnp.exp(
            jnp.max(logits, axis=-1).astype(jnp.float32)
            - jax.nn.logsumexp(logits.astype(jnp.float32), axis=-1))
        confs = jnp.take_along_axis(
            frame_conf, jnp.maximum(times, 0), axis=1)
        confs = jnp.where(times >= 0, confs, 0.0)
        return toks, lens, times, confs

    @partial(jax.jit, static_argnums=0)
    def _transducer(self, params, batch):
        """Frame-synchronous RNN-T greedy: one compiled while_loop over
        the whole batch (beyond-reference model family)."""
        from tpu_asr.decode.transducer_decode import transducer_greedy_decode
        feats, flens = self._features(batch)
        return transducer_greedy_decode(self.model, params, feats, flens,
                                        max_tokens=self.beam.max_len,
                                        return_times=True)

    # NOTE on LM fusion params: every jitted method takes lm_params as a
    # TRACED argument instead of reading self.lm_params through the static
    # self — a closed-over array pytree is lowered as embedded HLO
    # constants (the whole LM baked into the executable: slow compiles,
    # bloated programs, and the weights re-serialized per bucket shape).

    @partial(jax.jit, static_argnums=0)
    def _transducer_beam(self, params, lm_params, batch):
        """Alignment-length-synchronous transducer beam search (compiled)."""
        from tpu_asr.decode.transducer_decode import transducer_beam_search
        feats, flens = self._features(batch)
        return transducer_beam_search(
            self.model, params, feats, flens, beam=self.beam.beam,
            max_tokens=self.beam.max_len,
            length_penalty=self.beam.length_penalty,
            lm=self.lm, lm_params=lm_params,
            lm_weight=self.beam.lm_weight)

    @partial(jax.jit, static_argnums=0)
    def _transducer_rescore(self, params, lm_params, batch):  # noqa: ARG002
        """Two-pass: aux-CTC prefix-beam n-best rescored by the exact
        transducer marginal (no autoregressive loop; lm_params unused —
        uniform signature with the other n-best modes)."""
        from tpu_asr.decode.transducer_decode import transducer_rescore
        feats, flens = self._features(batch)
        return transducer_rescore(
            self.model, params, feats, flens, beam=self.beam.beam,
            max_len=self.beam.max_len, ctc_weight=self.beam.ctc_weight)

    @partial(jax.jit, static_argnums=0)
    def _ctc_beam(self, params, lm_params, batch):
        """Frame-synchronous CTC prefix beam search (no attention decoder
        needed — upgrades CTC-only models beyond the reference's greedy)."""
        from tpu_asr.decode.ctc_beam import ctc_prefix_beam_search
        feats, flens = self._features(batch)
        enc_out, el = self.model.apply(params, feats, flens,
                                       method="encode")
        logits = self.model.apply(params, enc_out, method="ctc_logits")
        toks, lens, scores = ctc_prefix_beam_search(
            logits, el, beam=self.beam.beam,
            max_len=min(self.beam.max_len, logits.shape[1]),
            lm=self.lm, lm_params=lm_params,
            lm_weight=self.beam.lm_weight, sos=self.cfg.vocab_size - 2)
        return {"tokens": toks, "lengths": lens, "scores": scores}

    @partial(jax.jit, static_argnums=0)
    def _attn_rescore(self, params, lm_params, batch):
        """Two-pass decode: CTC prefix beam n-best, rescored by ONE
        batched teacher-forced decoder pass (no autoregressive loop)."""
        from tpu_asr.decode.rescore import attention_rescore
        feats, flens = self._features(batch)
        enc_out, el = self.model.apply(params, feats, flens,
                                       method=Transformer.encode)
        logits = self.model.apply(params, enc_out,
                                  method=Transformer.ctc_logits)
        dec = Decoder(self.cfg)
        dp = {"params": params["params"]["decoder"]}
        return attention_rescore(
            dec, dp, enc_out, el, logits, self.cfg.vocab_size - 2,
            self.cfg.vocab_size - 1, beam=self.beam.beam,
            max_len=self.beam.max_len, ctc_weight=self.beam.ctc_weight,
            lm=self.lm, lm_params=lm_params,
            lm_weight=self.beam.lm_weight)

    @partial(jax.jit, static_argnums=0)
    def _beam(self, params, lm_params, batch):
        feats, flens = self._features(batch)
        enc_out, el = self.model.apply(params, feats, flens,
                                       method=Transformer.encode)
        dec = Decoder(self.cfg)
        dp = {"params": params["params"]["decoder"]}
        ctc_logp = None
        if self.mode == "joint":
            lg = self.model.apply(params, enc_out,
                                  method=Transformer.ctc_logits)
            ctc_logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        out = attention_beam_search(
            dec, dp, enc_out, el, self.cfg.vocab_size - 2,
            self.cfg.vocab_size - 1, self.beam, ctc_logp=ctc_logp,
            lm=self.lm, lm_params=lm_params)
        return out

    @partial(jax.jit, static_argnums=0)
    def _cif(self, params, batch):
        feats, flens = self._features(batch)
        if self.mode == "cif_beam":
            return cif_beam_decode(self.model, params, feats, flens,
                                   beam=self.beam.beam,
                                   max_len=self.beam.max_len,
                                   scale_fire=self.cif_scale_fire)
        return cif_greedy_decode(self.model, params, feats, flens,
                                 max_len=self.beam.max_len,
                                 scale_fire=self.cif_scale_fire)

    # --- public API ---

    def decode_batch(self, batch) -> list[list[int]]:
        """batch: loader dict -> list of token-id hypotheses (1-best)."""
        return [h[0]["yseq"] for h in self.decode_batch_nbest(batch)]

    def decode_batch_nbest(self, batch) -> list[list[dict]]:
        """-> per-utterance n-best [{'yseq': [ids], 'score': float}, ...].

        Fetches ALL device outputs with one jax.device_get: per-array
        np.asarray costs a full host<->device round trip EACH (~23 ms
        over the axon TPU tunnel — measured r5, where 20 per-array
        fetches made greedy decode 13x slower than the device program
        itself). Throughput-oriented manifest decoding should prefer
        decode_batches_nbest, which also pipelines across batches.
        """
        kind, dev = self._dispatch(batch)
        return self._finalize(kind, jax.device_get(dev))

    def decode_batches_nbest(self, batches, window: int = 8
                             ) -> list[list[list[dict]]]:
        """Pipelined manifest decode: dispatch up to `window` batches of
        device work ahead, then fetch the whole group's outputs with ONE
        jax.device_get — the fetch round trip amortizes across the window
        instead of serializing per batch (the device computes batch N+1
        while the host post-processes batch N). -> one
        decode_batch_nbest-shaped result list per input batch, in order.
        """
        out: list[list[list[dict]]] = []
        pending: list[tuple[str, tuple]] = []

        def flush():
            fetched = jax.device_get([d for _k, d in pending])
            out.extend(self._finalize(k, f)
                       for (k, _d), f in zip(pending, fetched))
            pending.clear()

        for batch in batches:
            pending.append(self._dispatch(batch))
            if len(pending) >= window:
                flush()
        if pending:
            flush()
        return out

    # --- dispatch (device work, async) / finalize (host work) split ---

    def _dispatch(self, batch) -> tuple[str, tuple]:
        """Run the jitted decode program for one batch WITHOUT fetching:
        returns (kind, tuple-of-device-arrays) for _finalize."""
        if self.mesh is not None:
            from tpu_asr.parallel import shard_batch
            arrays = shard_batch({k: v for k, v in batch.items()
                                  if k != "ids"}, self.mesh)
        else:
            arrays = {k: jnp.asarray(v) for k, v in batch.items()
                      if k != "ids"}
        if self.mode in ("beam", "joint", "ctc_beam", "attn_rescore",
                         "transducer_beam", "transducer_rescore"):
            fn = {"ctc_beam": self._ctc_beam,
                  "attn_rescore": self._attn_rescore,
                  "transducer_beam": self._transducer_beam,
                  "transducer_rescore": self._transducer_rescore}.get(
                      self.mode, self._beam)
            out = fn(self.params, self.lm_params, arrays)
            return "beam", (out["tokens"], out["lengths"], out["scores"])
        if self.mode == "greedy_ctc":
            return "greedy", self._greedy_ctc(self.params, arrays)
        if self.mode == "transducer_greedy":
            return "greedy", self._transducer(self.params, arrays)
        toks, lens = self._cif(self.params, arrays)
        return "greedy", (toks, lens, None, None)

    def _finalize(self, kind: str, fetched: tuple) -> list[list[dict]]:
        """Host post-processing of fetched outputs -> per-utterance
        n-best [{'yseq': [ids], 'score': float[, 'times', 'confidence']}]."""
        eos = self.cfg.vocab_size - 1

        def clean(row, length):
            return [int(t) for t in row[:length]
                    if int(t) >= 0 and int(t) != eos]

        if kind == "beam":
            toks, lens, scores = fetched                       # [B, W, L]
            nbest = min(self.beam.nbest, toks.shape[1]) or 1
            return [[{"yseq": clean(toks[i, w], lens[i, w]),
                      "score": float(scores[i, w])}
                     for w in range(nbest)]
                    for i in range(toks.shape[0])]
        toks, lens, times, confs = fetched
        out = []
        for i in range(toks.shape[0]):
            hyp = {"yseq": clean(toks[i], lens[i]), "score": 0.0}
            if times is not None:
                # emission encoder-frame per kept token (same filtering
                # as clean: drop pads and the reserved eos id)
                row, tr = toks[i], times[i]
                keep = [j for j in range(int(lens[i]))
                        if int(row[j]) >= 0 and int(row[j]) != eos]
                hyp["times"] = [int(tr[j]) for j in keep]
                if confs is not None:
                    cr = confs[i]
                    hyp["confidence"] = [round(float(cr[j]), 4)
                                         for j in keep]
            out.append([hyp])
        return out
