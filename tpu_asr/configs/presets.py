"""Named experiment presets — one per BASELINE.json config.

The reference's de-facto config system is ~30 argparse flags in
src/bin/train.py snapshot into run.sh (SURVEY.md section 5). Here each
BASELINE.json config is a typed preset; CLI flags override fields.

  1 ctc_dev    Transformer-CTC encoder, greedy decode (CPU-runnable slice)
  2 attention  enc-dec + label smoothing + beam search
  3 hybrid     joint CTC/attention training + joint-scoring decode
  4 cif        CIF: weighted accumulation/firing, quantity loss, AR decoder
  5 aishell    SpecAugment + length-bucketed large-batch full-scale training
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tpu_asr.augment import SpecAugmentConfig
from tpu_asr.decode.beam import BeamConfig
from tpu_asr.frontend import FrontendConfig
from tpu_asr.models.config import ModelConfig


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    model: ModelConfig
    epochs: int = 30
    warmup_steps: int = 4000
    lr_k: float = 1.0
    grad_clip: float = 5.0
    accum_steps: int = 1           # >1: gradient accumulation (the Noam/
    #                                Adam update applies every k-th step
    #                                on the averaged micro-batch grads)
    batch_frames: int = 16000      # per-batch input budget (bucket planning)
    batch_size: int | None = None  # fixed utts/batch (reference --batch_size
    #                                mode; overrides the batch_frames budget)
    num_buckets: int = 4
    max_frames_cap: int = 3000
    max_tokens_cap: int = 200
    specaug: SpecAugmentConfig | None = None
    frontend: FrontendConfig = FrontendConfig()
    beam: BeamConfig = BeamConfig()
    decode_mode: str = "beam"      # greedy_ctc | beam | joint | cif_greedy
    print_freq: int = 50
    seed: int = 0


_BASE = ModelConfig()  # d512/h8/6+6, conv2d input — reference defaults

PRESETS: dict[str, TrainConfig] = {
    # 1: CPU-runnable CTC slice (BASELINE.json config #1)
    "ctc_dev": TrainConfig(
        model=dataclasses.replace(
            _BASE, model_type="ctc", d_model=256, d_inner=1024,
            num_enc_layers=4, num_dec_layers=0),
        epochs=20, warmup_steps=1000, batch_frames=8000,
        decode_mode="greedy_ctc",
        beam=BeamConfig(beam=1)),
    # 2: attention-only Speech-Transformer (config #2)
    "attention": TrainConfig(
        model=dataclasses.replace(_BASE, model_type="transformer"),
        decode_mode="beam",
        beam=BeamConfig(beam=5, max_len=100)),
    # 2b: same, with the reference's default LFR(4,3)+linear front-end
    # (kaituoxu lineage) instead of conv2d subsampling
    "attention_lfr": TrainConfig(
        model=dataclasses.replace(_BASE, model_type="transformer",
                                  input_layer="linear", lfr_m=4, lfr_n=3),
        decode_mode="beam",
        beam=BeamConfig(beam=5, max_len=100)),
    # 3a: CPU-runnable hybrid slice (CLI e2e tests, demos)
    "hybrid_dev": TrainConfig(
        model=dataclasses.replace(
            _BASE, model_type="hybrid", ctc_weight=0.3, d_model=64,
            d_inner=128, num_heads=2, num_enc_layers=2, num_dec_layers=2,
            dropout=0.0),
        epochs=30, warmup_steps=100, lr_k=1.0, batch_frames=8000,
        num_buckets=2, decode_mode="joint",
        beam=BeamConfig(beam=5, max_len=24, ctc_weight=0.3)),
    # 3: hybrid CTC/attention (config #3). Decode default picked from the
    # n=200 held-out synth_eval table (exp/synth_eval/cer_vs_mode.jsonl,
    # round 5): attn_rescore CER 0.0083 @ 271x vs joint 0.0158 @ 231x
    # (b5) / 0.0151 @ 157x (b10) — better on both axes. With an external
    # LM, ctc_beam --lm-weight 0.1 is best overall (0.0060); pass
    # --mode ctc_beam --lm ... to use it. joint remains available.
    "hybrid": TrainConfig(
        model=dataclasses.replace(_BASE, model_type="hybrid",
                                  ctc_weight=0.3),
        decode_mode="attn_rescore",
        beam=BeamConfig(beam=10, max_len=100, ctc_weight=0.3)),
    # 4a: CPU-runnable CIF slice (CLI e2e / streaming demos)
    "cif_dev": TrainConfig(
        model=dataclasses.replace(
            _BASE, model_type="cif", ctc_weight=0.5,
            cif_quantity_weight=1.0, d_model=64, d_inner=128, num_heads=2,
            num_enc_layers=2, num_dec_layers=2, dropout=0.0),
        epochs=30, warmup_steps=100, lr_k=1.0, batch_frames=8000,
        num_buckets=2, decode_mode="cif_greedy",
        beam=BeamConfig(beam=1, max_len=24)),
    # 4: CIF (config #4)
    "cif": TrainConfig(
        model=dataclasses.replace(_BASE, model_type="cif", ctc_weight=0.5,
                                  cif_quantity_weight=1.0),
        decode_mode="cif_greedy",
        beam=BeamConfig(beam=1, max_len=100)),
    # conformer encoder (beyond the reference): macaron blocks with
    # relative-position MHSA + depthwise-conv module under the hybrid
    # objective — swap encoder_type, everything else unchanged
    "conformer_dev": TrainConfig(
        model=dataclasses.replace(
            _BASE, model_type="hybrid", ctc_weight=0.3, d_model=64,
            d_inner=128, num_heads=2, num_enc_layers=2, num_dec_layers=2,
            dropout=0.0, encoder_type="conformer", conv_kernel=7),
        epochs=30, warmup_steps=100, lr_k=1.0, batch_frames=8000,
        num_buckets=2, decode_mode="joint",
        beam=BeamConfig(beam=5, max_len=24, ctc_weight=0.3)),
    "conformer": TrainConfig(
        model=dataclasses.replace(_BASE, model_type="hybrid",
                                  ctc_weight=0.3, dtype=jnp.bfloat16,
                                  conv_channels=(32, 128), pallas_ctc=True,
                                  encoder_type="conformer"),
        epochs=80, batch_frames=32000, num_buckets=6,
        specaug=SpecAugmentConfig(),
        decode_mode="attn_rescore",  # see the "hybrid" preset note
        beam=BeamConfig(beam=10, max_len=100, ctc_weight=0.3)),
    # transducer (beyond the reference): RNN-T with a causal-transformer
    # predictor — the standard streaming production objective
    # (Transformer-Transducer, PAPERS.md). Aux CTC head (ctc_weight)
    # stabilizes early training and enables greedy_ctc/ctc_beam decode.
    "transducer_dev": TrainConfig(
        model=dataclasses.replace(
            _BASE, model_type="transducer", ctc_weight=0.3, d_model=64,
            d_inner=128, num_heads=2, num_enc_layers=2, num_pred_layers=1,
            d_joint=64, dropout=0.0),
        epochs=30, warmup_steps=100, lr_k=1.0, batch_frames=8000,
        num_buckets=2, decode_mode="transducer_greedy",
        beam=BeamConfig(beam=1, max_len=24)),
    # CPU-runnable conformer-transducer slice: the conv module + rel-pos
    # attention make the tiny transducer converge far faster than the
    # vanilla encoder at the same budget (e2e fixtures use this)
    "conformer_transducer_dev": TrainConfig(
        model=dataclasses.replace(
            _BASE, model_type="transducer", ctc_weight=0.3, d_model=64,
            d_inner=128, num_heads=2, num_enc_layers=2, num_pred_layers=1,
            d_joint=64, dropout=0.0, encoder_type="conformer",
            conv_kernel=7),
        epochs=30, warmup_steps=100, lr_k=1.0, batch_frames=8000,
        num_buckets=2, decode_mode="transducer_greedy",
        beam=BeamConfig(beam=1, max_len=24)),
    "transducer": TrainConfig(
        model=dataclasses.replace(_BASE, model_type="transducer",
                                  ctc_weight=0.3, num_pred_layers=2,
                                  d_joint=512),
        # two-pass rescoring: measured best transducer decode (exact
        # marginal ranking; overfit CER 0.0 vs greedy 0.17 / beam 0.25)
        decode_mode="transducer_rescore",
        beam=BeamConfig(beam=10, max_len=100, ctc_weight=0.5)),
    # conformer-transducer: the standard streaming production stack
    # (chunked conformer encoder + RNN-T), cf. Transformer-Transducer /
    # conformer-transducer lineage
    "conformer_transducer": TrainConfig(
        model=dataclasses.replace(_BASE, model_type="transducer",
                                  ctc_weight=0.3, num_pred_layers=2,
                                  d_joint=512, encoder_type="conformer",
                                  enc_chunk_size=16),
        decode_mode="transducer_greedy",
        beam=BeamConfig(beam=1, max_len=100)),
    # streaming transducer: chunk-masked encoder + frame-synchronous
    # decode = end-to-end streaming with label-history modeling
    "transducer_streaming": TrainConfig(
        model=dataclasses.replace(_BASE, model_type="transducer",
                                  ctc_weight=0.3, num_pred_layers=2,
                                  d_joint=512, enc_chunk_size=16),
        decode_mode="transducer_greedy",
        beam=BeamConfig(beam=1, max_len=100)),
    # streaming (beyond the reference): chunk-masked CTC encoder —
    # 16 post-subsample frames/chunk = 0.64 s emission latency; decode
    # offline (greedy_ctc) or incrementally via
    # tpu_asr.decode.streaming.StreamingCTCRecognizer / bin/stream_demo.py
    "streaming": TrainConfig(
        model=dataclasses.replace(_BASE, model_type="ctc",
                                  enc_chunk_size=16),
        decode_mode="greedy_ctc",
        beam=BeamConfig(beam=1, max_len=100)),
    # 5: full-scale AISHELL training recipe (config #5). conv_channels
    # (32, 128): ~18% faster train step than symmetric 256 on v5e (the
    # front-end's per-op-trace share drops ~3.5ms -> ~1ms at b=32xT=1000).
    "aishell": TrainConfig(
        model=dataclasses.replace(_BASE, model_type="hybrid",
                                  ctc_weight=0.3, dtype=jnp.bfloat16,
                                  conv_channels=(32, 128),
                                  pallas_ctc=True),
        epochs=80, batch_frames=32000, num_buckets=6,
        specaug=SpecAugmentConfig(),
        decode_mode="attn_rescore",  # see the "hybrid" preset note
        beam=BeamConfig(beam=10, max_len=100, ctc_weight=0.3)),
}


def get_preset(name: str) -> TrainConfig:
    if name not in PRESETS:
        raise KeyError(f"unknown preset {name!r}; have {sorted(PRESETS)}")
    return PRESETS[name]
