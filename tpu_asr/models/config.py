"""Model hyperparameters.

Defaults mirror the reference CLI (reference: src/bin/train.py argparse —
n_layers_enc/dec=6, n_head=8, d_k=d_v=64, d_model=512, d_inner=2048,
dropout=0.1, pe_maxlen=5000, LFR_m=4/LFR_n=3), expressed as one typed config
instead of ~30 argparse flags.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    vocab_size: int = 4233            # AISHELL-1 char vocab incl. specials
    d_input: int = 80                 # mel bins (before LFR stacking)
    d_model: int = 512
    d_inner: int = 2048
    num_heads: int = 8
    num_enc_layers: int = 6
    num_dec_layers: int = 6
    dropout: float = 0.1
    pe_maxlen: int = 5000
    input_layer: str = "conv2d"       # conv2d (4x subsample) | linear (use LFR)
    # Encoder block family (beyond-reference): "transformer" = the
    # reference's post-norm MHSA+FFN; "conformer" = pre-norm macaron
    # blocks with relative-position MHSA and a depthwise-conv module
    # (models/conformer.py) — same subsample/masks/objectives.
    encoder_type: str = "transformer"
    conv_kernel: int = 15             # conformer depthwise-conv width
    #                                   (causal when enc_chunk_size > 0)
    conv_channels: int | tuple = 256  # conv2d front-end channels (int, or
    #                                   (conv1, conv2) to grow channels as
    #                                   time/freq resolution shrinks)
    lfr_m: int = 4                    # only used with input_layer == linear
    lfr_n: int = 3
    tie_embedding: bool = True        # share decoder embedding + output proj
    # objective selection (reference model-type flag + mtlalpha)
    model_type: str = "hybrid"        # transformer | ctc | hybrid | cif
    #                                   | transducer (RNN-T, beyond-reference)
    ctc_weight: float = 0.3           # lambda in L = l*ctc + (1-l)*att
    cif_quantity_weight: float = 1.0  # CIF quantity-loss scale
    cif_tail_threshold: float = 0.5
    label_smoothing: float = 0.1
    # Streaming (beyond the reference, which is offline-only): chunked
    # encoder self-attention a la chunk-masked streaming transformers.
    # enc_chunk_size > 0 restricts each post-subsample frame to attend
    # within its chunk plus enc_left_chunks previous chunks (-1 =
    # unlimited left context). Train with these set, then decode either
    # offline (same mask; recognize.py unchanged) or incrementally via
    # tpu_asr.decode.streaming.StreamingCTCRecognizer with exact
    # offline-equality per complete chunk.
    enc_chunk_size: int = 0
    enc_left_chunks: int = -1
    # Transducer (model_type == transducer): causal-transformer label
    # predictor (num_pred_layers of the LM layer at d_model width) and the
    # additive tanh joint network projected to d_joint. ctc_weight > 0 adds
    # an auxiliary CTC head on the encoder (the standard convergence aid;
    # also enables greedy_ctc decode on transducer checkpoints).
    num_pred_layers: int = 2
    d_joint: int = 512
    # numerics
    dtype: jnp.dtype = jnp.float32    # compute dtype (bfloat16 on TPU)
    param_dtype: jnp.dtype = jnp.float32
    # Pallas kernel selection. use_pallas is the master switch; the per-op
    # flags override it (None = follow master). Measured on v5e: the pallas
    # CTC pair matches XLA-scan speed with lower memory (good default on
    # TPU); flash attention only wins for long sequences (post-subsample
    # T >~ 512) — XLA's fused attention is faster at ASR lengths.
    use_pallas: bool = False
    pallas_attention: bool | None = None
    pallas_ctc: bool | None = None
    pallas_cif: bool | None = None
    pallas_layernorm: bool | None = None

    def _resolve(self, flag):
        return self.use_pallas if flag is None else flag

    @property
    def attention_pallas(self) -> bool:
        return self._resolve(self.pallas_attention)

    @property
    def ctc_pallas(self) -> bool:
        return self._resolve(self.pallas_ctc)

    @property
    def cif_pallas(self) -> bool:
        return self._resolve(self.pallas_cif)

    @property
    def layernorm_pallas(self) -> bool:
        return self._resolve(self.pallas_layernorm)

    @property
    def d_head(self) -> int:
        assert self.d_model % self.num_heads == 0
        return self.d_model // self.num_heads

    @property
    def encoder_input_dim(self) -> int:
        return (self.d_input * self.lfr_m if self.input_layer == "linear"
                else self.d_input)

    def subsampled_length(self, t: int | jnp.ndarray):
        """Encoder output length for input length t (frames)."""
        if self.input_layer == "conv2d":
            # two stride-2 convs, kernel 3, no padding (kaldi-style snip)
            t1 = (t - 1) // 2
            return (t1 - 1) // 2
        return (t + self.lfr_n - 1) // self.lfr_n

    # Conv2d front-end geometry, derived from its two k=3 s=2 VALID convs
    # (models/conv.py). Streaming (decode/streaming.py) uses these to size
    # its per-chunk feature windows instead of hardcoding 4*C+3 — change
    # the conv stack and the window arithmetic follows.

    @property
    def conv_total_stride(self) -> int:
        """Input frames consumed per encoder output frame step."""
        assert self.input_layer == "conv2d"
        return 2 * 2

    @property
    def conv_receptive_field(self) -> int:
        """Input frames one encoder output frame depends on."""
        assert self.input_layer == "conv2d"
        # k + (k-1)*s for two stacked convs (k=3, s=2)
        return 3 + (3 - 1) * 2

    def conv_input_window(self, n_out: int) -> int:
        """Input frames needed to produce n_out encoder output frames
        starting at an output-frame boundary (= stride*(n-1) + receptive
        field; 4n+3 for the current stack)."""
        return self.conv_total_stride * (n_out - 1) + self.conv_receptive_field
