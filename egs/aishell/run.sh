#!/usr/bin/env bash
# AISHELL-1 recipe — the tpu-asr equivalent of the reference's staged
# egs/aishell/run.sh (data prep -> dict -> manifests -> train -> decode ->
# score), with the offline Kaldi feature stages replaced by the on-device
# frontend (features are computed inside the jitted train/decode steps).
#
# Usage: bash egs/aishell/run.sh --data /path/to/aishell [--stage N]
# Expects the standard AISHELL-1 layout:
#   $data/wav/{train,dev,test}/...S0002/BAC009S0002W0122.wav
#   $data/transcript/aishell_transcript_v0.8.txt
#
# No AISHELL on disk? The full staged pipeline can be exercised on
# synthetic tone-burst data written in the same layout:
#   bash egs/aishell/run.sh --data /tmp/synth_aishell --synthetic 40 \
#       --preset hybrid_dev --epochs 40 --platform cpu
set -euo pipefail

stage=0
data=""
exp=""   # default exp/aishell_<preset> (set after arg parsing)
preset=aishell
nj_decode_beam=10
synthetic=0
platform=""
epochs=0
repo_root="$(cd "$(dirname "$0")/../.." && pwd)"

while [[ $# -gt 0 ]]; do
  case "$1" in
    --stage) stage="$2"; shift 2 ;;
    --data) data="$2"; shift 2 ;;
    --exp) exp="$2"; shift 2 ;;
    --preset) preset="$2"; shift 2 ;;
    --synthetic) synthetic="$2"; shift 2 ;;
    --platform) platform="$2"; shift 2 ;;
    --epochs) epochs="$2"; shift 2 ;;
    *) echo "unknown arg $1"; exit 1 ;;
  esac
done

[[ -n "$exp" ]] || exp="exp/aishell_${preset}"
[[ -n "$data" ]] || { echo "--data /path/to/aishell required"; exit 1; }
cd "$repo_root"
mkdir -p "$exp" data/aishell

if [[ $synthetic -gt 0 && $stage -le 0 ]]; then
  echo "=== stage -1: write synthetic corpus in AISHELL layout -> $data ==="
  python - "$data" "$synthetic" <<'PY'
import os, sys, wave as wavmod
import numpy as np
from tpu_asr.data.synthetic import make_synthetic_dataset
data, n = sys.argv[1], int(sys.argv[2])
vocab = 16
utts, waves = make_synthetic_dataset(n, vocab, seed=0)
n_dev = max(n // 8, 1)
n_test = max(n // 8, 1)
splits = {"train": utts[n_dev + n_test:], "dev": utts[:n_dev],
          "test": utts[n_dev: n_dev + n_test]}
os.makedirs(os.path.join(data, "transcript"), exist_ok=True)
lines = []
for split, us in splits.items():
    d = os.path.join(data, "wav", split, "S0001")
    os.makedirs(d, exist_ok=True)
    for u in us:
        pcm = (np.clip(waves[u.id], -1, 1) * 32767).astype("<i2")
        with wavmod.open(os.path.join(d, u.id + ".wav"), "wb") as w:
            w.setnchannels(1); w.setsampwidth(2); w.setframerate(16000)
            w.writeframes(pcm.tobytes())
        # token id -> letter, one char per token (char-dict pipeline)
        lines.append(u.id + " " + "".join(chr(ord("a") + t) for t in u.tokens))
with open(os.path.join(data, "transcript",
                       "aishell_transcript_v0.8.txt"), "w") as f:
    f.write("\n".join(lines) + "\n")
print("synthetic corpus:", {k: len(v) for k, v in splits.items()})
PY
fi

train_extra=()
recog_extra=()
cmvn_extra=()
[[ -n "$platform" ]] && train_extra+=(--platform "$platform") \
  && recog_extra+=(--platform "$platform") \
  && cmvn_extra+=(--platform "$platform")
[[ $epochs -gt 0 ]] && train_extra+=(--epochs "$epochs")

if [[ $stage -le 0 ]]; then
  echo "=== stage 0: build wav.scp/text per split ==="
  python - "$data" <<'PY'
import os, sys
data = sys.argv[1]
trans = {}
with open(os.path.join(data, "transcript", "aishell_transcript_v0.8.txt"),
          encoding="utf-8") as f:
    for line in f:
        parts = line.strip().split(maxsplit=1)
        if len(parts) == 2:
            trans[parts[0]] = parts[1]
os.makedirs("data/aishell", exist_ok=True)
for split in ("train", "dev", "test"):
    wavs, texts = [], []
    root = os.path.join(data, "wav", split)
    for dirpath, _, files in os.walk(root):
        for fn in sorted(files):
            if not fn.endswith(".wav"):
                continue
            uid = fn[:-4]
            if uid not in trans:
                continue
            wavs.append(f"{uid} {os.path.join(dirpath, fn)}")
            texts.append(f"{uid} {trans[uid]}")
    with open(f"data/aishell/{split}.wav.scp", "w") as f:
        f.write("\n".join(wavs) + "\n")
    with open(f"data/aishell/{split}.text", "w") as f:
        f.write("\n".join(texts) + "\n")
    print(split, len(wavs), "utts")
PY
fi

if [[ $stage -le 1 ]]; then
  echo "=== stage 1: char dict + manifests ==="
  python bin/prepare_data.py --wav-scp data/aishell/train.wav.scp \
    --text data/aishell/train.text --dict-out data/aishell/dict.txt \
    --out data/aishell/train.jsonl
  for split in dev test; do
    python bin/prepare_data.py --wav-scp data/aishell/$split.wav.scp \
      --text data/aishell/$split.text --dict data/aishell/dict.txt \
      --out data/aishell/$split.jsonl
  done
fi

if [[ $stage -le 2 ]]; then
  echo "=== stage 2: global CMVN stats + train ($preset preset) ==="
  # reference recipe's compute-cmvn-stats/apply-cmvn: normalize every
  # split with TRAIN-set statistics (also the causal choice for the
  # streaming presets; decode picks the policy up from the checkpoint's
  # frontend sidecar)
  python bin/compute_cmvn.py --manifest data/aishell/train.jsonl \
    --out "$exp/cmvn.npz" ${cmvn_extra[@]+"${cmvn_extra[@]}"}
  python bin/train.py --preset "$preset" \
    --train-manifest data/aishell/train.jsonl \
    --cv-manifest data/aishell/dev.jsonl \
    --dict data/aishell/dict.txt \
    --cmvn global --cmvn-stats "$exp/cmvn.npz" \
    --save-folder "$exp" ${train_extra[@]+"${train_extra[@]}"}
fi

# primary decode mode per model family. Hybrid presets default to
# attention rescoring: on the n=200 held-out synth_eval table
# (exp/synth_eval/cer_vs_mode.jsonl, round 5) attn_rescore beats joint on
# CER (0.0083 vs 0.0158) AND inverse-RTF (271x vs 231x); with an external
# LM, ctc_beam --lm-weight 0.1 was best overall (0.0060). Transducer
# presets use two-pass rescoring; cif its own decode.
case "$preset" in
  transducer*) decode_mode=transducer_rescore ;;
  cif*)        decode_mode=cif_greedy ;;
  ctc*|streaming) decode_mode=ctc_beam ;;
  attention*)  decode_mode=beam ;;
  *)           decode_mode=attn_rescore ;;
esac

if [[ $stage -le 3 ]]; then
  echo "=== stage 3: decode + score ($decode_mode) ==="
  python bin/recognize.py --ckpt "$exp" --manifest data/aishell/test.jsonl \
    --mode "$decode_mode" --beam "$nj_decode_beam" \
    --output "$exp/test_hyp.jsonl" \
    ${recog_extra[@]+"${recog_extra[@]}"} | tee "$exp/decode_summary.json"
  if [[ "$decode_mode" == attn_rescore ]]; then
    # reference-style joint CTC/attention one-pass beam, kept as a parity
    # cross-check next to the (faster + better-scoring) rescoring default
    python bin/recognize.py --ckpt "$exp" --manifest data/aishell/test.jsonl \
      --mode joint --beam "$nj_decode_beam" \
      --output "$exp/test_hyp_joint.jsonl" \
      ${recog_extra[@]+"${recog_extra[@]}"} \
      | tee "$exp/decode_summary_joint.json"
  fi
fi

if [[ $stage -le 4 ]]; then
  echo "=== stage 4: CER-vs-beam sanity sweep (decode-quality regression"
  echo "    gate: CER must not blow up as beam widens) ==="
  : > "$exp/cer_vs_beam.jsonl"
  for b in 1 5 10; do
    python bin/recognize.py --ckpt "$exp" --manifest data/aishell/test.jsonl \
      --mode "$decode_mode" --beam "$b" --output "$exp/test_hyp_beam$b.jsonl" \
      ${recog_extra[@]+"${recog_extra[@]}"} \
      | python -c "import sys,json; s=json.loads(sys.stdin.readlines()[-1]); \
s['beam']=$b; print(json.dumps(s))" >> "$exp/cer_vs_beam.jsonl"
  done
  cat "$exp/cer_vs_beam.jsonl"
  python - "$exp/cer_vs_beam.jsonl" <<'PY'
import json, sys
rows = [json.loads(l) for l in open(sys.argv[1])]
by_beam = {r["beam"]: r["cer"] for r in rows}
assert set(by_beam) == {1, 5, 10}, by_beam
# wider beams must not be dramatically worse than greedy-ish beam=1
assert by_beam[10] <= by_beam[1] + 0.05, by_beam
assert by_beam[5] <= by_beam[1] + 0.05, by_beam
print("cer_vs_beam OK:", by_beam)
PY
fi
