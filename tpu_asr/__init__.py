"""tpu-asr: a TPU-native end-to-end speech recognition framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of the reference
PyTorch codebase `eastonYi/end-to-end_asr_pytorch` (see SURVEY.md):

- on-device acoustic frontend: 80-dim log-mel fbank + CMVN + LFR + SpecAugment
- conv2d-subsampled Transformer encoder / decoder (d_model=512, h=8, 6+6)
- CTC, attention (label-smoothed CE), hybrid CTC/attention, and CIF
  (continuous integrate-and-fire, with quantity loss) objectives
- compiled on-device decoding: greedy CTC, batched attention beam search,
  joint CTC/attention rescoring
- static length-bucketed padding everywhere; Pallas kernels for the hot ops
- pjit/shard_map data parallelism over a `jax.sharding.Mesh`

Package layout (SURVEY.md section 7):
  tpu_asr.frontend   waveform -> log-mel features (jit-compiled)
  tpu_asr.augment    on-device SpecAugment
  tpu_asr.data       manifests, length bucketing, batching
  tpu_asr.models     flax modules (encoder/decoder/ctc/cif/transformer)
  tpu_asr.ops        numerics: CTC loss, CIF scan, losses (+ Pallas kernels)
  tpu_asr.decode     compiled decode loops
  tpu_asr.train      train step, optimizer, checkpoints, metrics
  tpu_asr.parallel   mesh + sharding rules
  tpu_asr.utils      vocab, text, CER scoring, padding
"""

__version__ = "0.1.0"

IGNORE_ID = -1  # padding id for targets (reference: src/utils/utils.py IGNORE_ID)
