#!/usr/bin/env bash
# Held-out decode-quality evaluation at statistical scale.
#
# Answers "which decode mode should the flagship preset use?" with data:
# trains the aishell-preset hybrid model + an external char LM on a
# synthetic Markov-language corpus (disjoint train/cv/dev seeds, shared
# bigram language), then decodes a >=NDEV-utterance held-out dev set in
# every supported mode +/- LM fusion and writes one JSON row per mode to
# $EXP/cer_vs_mode.jsonl (CER + inverse-RTF from the same run).
#
# No AISHELL audio exists on this machine (SURVEY.md section 0), so this
# is the closest available stand-in for the reference's dev-set decode
# stage (egs/aishell/run.sh stage 5): real frontend from waveforms, real
# training, genuinely held-out eval, n large enough for mode differences
# to be meaningful (NDEV*~6.5 tokens of test mass).
set -euo pipefail
cd "$(dirname "$0")/../.."

NTRAIN=${NTRAIN:-3000}
NCV=${NCV:-100}
NDEV=${NDEV:-200}
NOISE=${NOISE:-0.4}
VOCAB=${VOCAB:-64}
EPOCHS=${EPOCHS:-150}
# lr_k: the aishell preset's 1.0 is tuned for real-AISHELL step counts;
# on this 3000-utt corpus (18 steps/epoch, batch ~160s audio) the d512
# model collapses to the marginal distribution as lr approaches peak
# (cv pinned at ~4.0 = chance for vocab 64; measured, d64 unaffected,
# bf16/pallas-CTC exonerated by bisect). 0.3 converges cleanly.
LRK=${LRK:-0.3}
EXP=${EXP:-exp/synth_eval}
PLATFORM=${PLATFORM:-}
PFLAG=()
[ -n "$PLATFORM" ] && PFLAG=(--platform "$PLATFORM")

stage=${STAGE:-0}

if [ "$stage" -le 0 ]; then
  echo "=== stage 0: data (train=$NTRAIN cv=$NCV dev=$NDEV noise=$NOISE markov text)"
  for split_seed in "train:0:$NTRAIN" "cv:13:$NCV" "dev:7:$NDEV"; do
    IFS=: read -r split seed n <<< "$split_seed"
    mkdir -p "$EXP/data/$split"
    python bin/prepare_data.py --synthetic "$n" --vocab-size "$VOCAB" \
      --seed "$seed" --noise "$NOISE" --text-dist markov \
      --out "$EXP/data/$split/$split.jsonl"
  done
fi

if [ "$stage" -le 1 ]; then
  echo "=== stage 1: train acoustic model (aishell preset, vocab=$VOCAB)"
  # --no-specaug: the synthetic tokens ARE narrowband tones, so frequency
  # masks delete the class evidence outright (measured: loss pinned at
  # chance with the preset's SpecAugment on this corpus)
  python bin/train.py --preset aishell \
    --train-manifest "$EXP/data/train/train.jsonl" \
    --cv-manifest "$EXP/data/cv/cv.jsonl" \
    --vocab-size "$VOCAB" --epochs "$EPOCHS" --warmup-steps 500 \
    --lr-k "$LRK" --batch-frames 16000 --no-specaug \
    --save-folder "$EXP/am" "${PFLAG[@]}"
fi

if [ "$stage" -le 2 ]; then
  echo "=== stage 2: train external char LM on the train transcripts"
  python bin/train_lm.py --train-manifest "$EXP/data/train/train.jsonl" \
    --cv-manifest "$EXP/data/cv/cv.jsonl" --vocab-size "$VOCAB" \
    --d-model 128 --d-inner 512 --num-heads 4 --num-layers 2 \
    --epochs 30 --warmup-steps 200 \
    --save-folder "$EXP/lm" "${PFLAG[@]}"
fi

if [ "$stage" -le 3 ]; then
  echo "=== stage 3: decode dev in every mode +/- LM"
  : > "$EXP/cer_vs_mode.jsonl"
  decode() {  # mode beam lm_weight length_penalty extra...
    local mode=$1 beam=$2 lmw=$3 lp=$4; shift 4
    local tag="${mode}_b${beam}"
    local lmargs=()
    if [ "$lmw" != "0" ]; then
      tag="${tag}_lm${lmw}"
      lmargs=(--lm-ckpt "$EXP/lm" --lm-weight "$lmw")
    fi
    if [ "$lp" != "0" ]; then
      tag="${tag}_lp${lp}"
      lmargs+=(--length-penalty "$lp")
    fi
    echo "--- $tag"
    out=$(python bin/recognize.py --ckpt "$EXP/am" --restore best \
      --manifest "$EXP/data/dev/dev.jsonl" --mode "$mode" \
      --beam "$beam" --max-len 24 --ctc-weight 0.3 \
      --output "$EXP/hyp_$tag.jsonl" "${lmargs[@]}" "${PFLAG[@]}" "$@" \
      | tail -n 1)
    # $out travels as an argv element, not interpolated into python
    # source (quotes/backslashes in the summary line would break the
    # parse, and an empty line gets a clear error here; ADVICE r4)
    python - "$EXP/cer_vs_mode.jsonl" "$mode" "$beam" "$lmw" "$lp" "$out" <<PY
import json, sys
assert sys.argv[6].strip(), "recognize.py printed no summary line"
s = json.loads(sys.argv[6])
s.update(mode=sys.argv[2], beam=int(sys.argv[3]),
         lm_weight=float(sys.argv[4]), length_penalty=float(sys.argv[5]))
with open(sys.argv[1], "a") as f:
    f.write(json.dumps(s) + "\n")
print(json.dumps(s))
PY
  }
  decode greedy_ctc 1 0 0
  # pure attention beam: r4 measured CER 0.1054 here, 70% deletions with
  # hyps down to 0.40x the reference length (early-eos short-hypothesis
  # bias) — the lp/minlen rows measure how much of that is length
  # calibration vs model weakness (stage 4 separates search bugs out)
  decode beam 5 0 0
  decode beam 5 0 0.5
  decode beam 5 0 1.0
  decode beam 5 0 0 --minlenratio 0.05
  decode joint 5 0 0
  decode joint 10 0 0
  decode attn_rescore 10 0 0
  decode ctc_beam 10 0 0
  # lm_weight sweep (r4 only tried 0.3, which HURT joint: 0.0158->0.0233)
  for lmw in 0.05 0.1 0.2 0.3; do
    decode joint 5 "$lmw" 0
    decode ctc_beam 10 "$lmw" 0
  done
  decode joint 10 0.1 0
  decode attn_rescore 10 0.1 0
  decode attn_rescore 10 0.3 0
  echo "=== table: $EXP/cer_vs_mode.jsonl"
  cat "$EXP/cer_vs_mode.jsonl"
fi

if [ "$stage" -le 4 ]; then
  echo "=== stage 4: search-sanity — pure attention beam on 100 TRAIN utts"
  # If the attention beam machinery is sound, decoding data the model has
  # memorized must be near-exact; held-out deletions then indict decoder
  # calibration (early eos under noise), not the search.
  head -100 "$EXP/data/train/train.jsonl" > "$EXP/data/train/train100.jsonl"
  for m in beam joint greedy_ctc; do
    out=$(python bin/recognize.py --ckpt "$EXP/am" --restore best \
      --manifest "$EXP/data/train/train100.jsonl" --mode "$m" \
      --beam 5 --max-len 24 --ctc-weight 0.3 \
      --output "$EXP/hyp_train_$m.jsonl" "${PFLAG[@]}" | tail -n 1)
    python - "$EXP/cer_vs_mode.jsonl" "$m" "$out" <<PY
import json, sys
s = json.loads(sys.argv[3])
s.update(mode=sys.argv[2], split="train_overfit")
with open(sys.argv[1], "a") as f:
    f.write(json.dumps(s) + "\n")
print(json.dumps(s))
PY
  done
fi
