"""End-to-end CLI pipeline test: drives the actual bin/ scripts as
subprocesses, recipe-shaped (reference egs/aishell/run.sh stages):
prepare_data -> train -> recognize -> score. Guards arg wiring, the
checkpoint-dir layout, the decode summary JSON, and the hyp/score file
formats — none of which the in-process tests touch."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def run_cli(script, *args, env_extra=None):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # CLIs force cpu via --platform
    # don't leak conftest's 8-virtual-device topology into the CLI: a
    # real user runs single-device, and the mesh batch_multiple rounding
    # changes batching enough to weaken the 100-epoch overfit (measured
    # CER 0.0063 single-device vs 0.12 with the leaked flag)
    env.pop("XLA_FLAGS", None)
    env.update(env_extra or {})
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", script), *args],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert out.returncode == 0, (script, out.stdout[-2000:],
                                 out.stderr[-2000:])
    return out


def test_prepare_train_recognize_score(tmp_path):
    all_jsonl = tmp_path / "all.jsonl"
    run_cli("prepare_data.py", "--synthetic", "28", "--vocab-size", "16",
            "--out", str(all_jsonl))
    lines = all_jsonl.read_text().strip().split("\n")
    assert len(lines) == 28
    cv, train = lines[:4], lines[4:]
    (tmp_path / "cv.jsonl").write_text("\n".join(cv) + "\n")
    (tmp_path / "train.jsonl").write_text("\n".join(train) + "\n")

    exp = tmp_path / "exp"
    out = run_cli("train.py", "--preset", "hybrid_dev",
                  "--train-manifest", str(tmp_path / "train.jsonl"),
                  "--cv-manifest", str(tmp_path / "cv.jsonl"),
                  "--vocab-size", "16", "--epochs", "100",
                  "--save-folder", str(exp), "--platform", "cpu")
    assert "done" in out.stderr
    # checkpoint layout: config sidecar + best tracker + metrics
    assert (exp / "model_config.json").exists()
    assert (exp / "best.json").exists()
    assert (exp / "metrics.jsonl").exists()

    # decode the TRAINING manifest with the LATEST checkpoint: the recipe
    # smoke is "overfit, then decode it back" (cv-best on 4 synthetic utts
    # restores an early checkpoint by design — not what this test probes)
    hyp = tmp_path / "hyp.jsonl"
    out = run_cli("recognize.py", "--ckpt", str(exp), "--restore", "latest",
                  "--manifest", str(tmp_path / "train.jsonl"),
                  "--mode", "joint", "--beam", "5", "--max-len", "24",
                  "--output", str(hyp), "--platform", "cpu")
    summary = json.loads(out.stdout.strip().split("\n")[-1])
    assert summary["n_utts"] == 24
    assert summary["mode"] == "joint"
    assert summary["inverse_rtf"] > 0
    # decoding the TRAINING set of a 100-epoch overfit model must be
    # near-exact — this guards decode QUALITY, not just plumbing
    assert summary["cer"] < 0.05, summary
    hyps = [json.loads(l) for l in hyp.read_text().strip().split("\n")]
    assert len(hyps) == 24 and all("hyp_tokens" in h for h in hyps)

    out = run_cli("score.py", "--manifest", str(tmp_path / "train.jsonl"),
                  "--hyp", str(hyp))
    score = json.loads(out.stdout.strip().split("\n")[-1])
    assert abs(score["cer"] - summary["cer"]) < 1e-6, (score, summary)

    # data-parallel decode (--dp 2 over a 2-virtual-device CPU mesh) must
    # reproduce the single-device hypotheses utterance-for-utterance
    hyp_dp = tmp_path / "hyp_dp.jsonl"
    out = run_cli("recognize.py", "--ckpt", str(exp), "--restore", "latest",
                  "--manifest", str(tmp_path / "train.jsonl"),
                  "--mode", "joint", "--beam", "5", "--max-len", "24",
                  "--dp", "2", "--output", str(hyp_dp), "--platform", "cpu",
                  env_extra={"XLA_FLAGS":
                             "--xla_force_host_platform_device_count=2"})
    summary_dp = json.loads(out.stdout.strip().split("\n")[-1])
    assert summary_dp["cer"] < 0.05, summary_dp
    one = {h["id"]: h["hyp_tokens"] for h in
           (json.loads(l) for l in hyp.read_text().strip().split("\n"))}
    two = {h["id"]: h["hyp_tokens"] for h in
           (json.loads(l) for l in hyp_dp.read_text().strip().split("\n"))}
    assert one == two

    # two-pass attention rescoring (CTC n-best + one teacher-forced
    # decoder pass) must decode the overfit set near-exactly too
    hyp2 = tmp_path / "hyp_rescore.jsonl"
    out = run_cli("recognize.py", "--ckpt", str(exp), "--restore", "latest",
                  "--manifest", str(tmp_path / "train.jsonl"),
                  "--mode", "attn_rescore", "--beam", "5",
                  "--max-len", "24", "--ctc-weight", "0.5",
                  "--output", str(hyp2), "--platform", "cpu")
    summary2 = json.loads(out.stdout.strip().split("\n")[-1])
    assert summary2["mode"] == "attn_rescore"
    assert summary2["cer"] < 0.05, summary2


def test_streaming_pipeline(tmp_path):
    """Chunk-masked training -> checkpoint averaging -> streaming demo:
    the beyond-reference CLI surfaces, recipe-shaped."""
    all_jsonl = tmp_path / "all.jsonl"
    run_cli("prepare_data.py", "--synthetic", "20", "--vocab-size", "16",
            "--out", str(all_jsonl))
    lines = all_jsonl.read_text().strip().split("\n")
    (tmp_path / "cv.jsonl").write_text("\n".join(lines[:4]) + "\n")
    (tmp_path / "train.jsonl").write_text("\n".join(lines[4:]) + "\n")

    exp = tmp_path / "exp"
    run_cli("train.py", "--preset", "hybrid_dev", "--enc-chunk-size", "4",
            "--train-manifest", str(tmp_path / "train.jsonl"),
            "--cv-manifest", str(tmp_path / "cv.jsonl"),
            "--vocab-size", "16", "--epochs", "40",
            "--save-folder", str(exp), "--platform", "cpu")
    cfg = json.loads((exp / "model_config.json").read_text())
    assert cfg["enc_chunk_size"] == 4     # flag reached the sidecar

    avg = tmp_path / "exp_avg"
    out = run_cli("average_checkpoints.py", "--ckpt", str(exp),
                  "--out", str(avg), "--last", "3", "--platform", "cpu")
    assert "averaged" in out.stdout

    out = run_cli("stream_demo.py", "--ckpt", str(avg),
                  "--manifest", str(tmp_path / "train.jsonl"),
                  "--chunk-frames", "32", "--quiet", "--platform", "cpu")
    summary = json.loads(out.stdout.strip().split("\n")[-1])
    assert summary["n_utts"] == 16
    assert summary["enc_chunk_size"] == 4
    assert summary["mean_emission_lag_ms"] is not None  # streamed mid-utt
    # 40-epoch overfit + checkpoint averaging on the training set: the
    # streamed hypothesis must be mostly right, not merely flowing
    assert summary["cer"] < 0.5, summary


def test_lm_train_and_fused_decode(tmp_path):
    """bin/train_lm.py -> bin/recognize.py --lm-ckpt: the external-LM
    pipeline (beyond-reference shallow fusion / n-best rescoring).
    Guards the LM checkpoint layout (lm_config.json sidecar), the
    --lm-ckpt/--lm-weight wiring, and that a transcript-overfit LM does
    not break an overfit acoustic decode (near-exact CER persists)."""
    all_jsonl = tmp_path / "all.jsonl"
    run_cli("prepare_data.py", "--synthetic", "28", "--vocab-size", "16",
            "--out", str(all_jsonl))
    lines = all_jsonl.read_text().strip().split("\n")
    (tmp_path / "cv.jsonl").write_text("\n".join(lines[:4]) + "\n")
    (tmp_path / "train.jsonl").write_text("\n".join(lines[4:]) + "\n")

    lm_dir = tmp_path / "lm"
    out = run_cli("train_lm.py",
                  "--train-manifest", str(tmp_path / "train.jsonl"),
                  "--cv-manifest", str(tmp_path / "cv.jsonl"),
                  "--vocab-size", "16", "--epochs", "30",
                  "--batch-size", "8", "--d-model", "32", "--d-inner", "64",
                  "--num-heads", "2", "--num-layers", "2",
                  "--save-folder", str(lm_dir), "--platform", "cpu")
    assert "done" in out.stderr
    assert (lm_dir / "lm_config.json").exists()
    assert (lm_dir / "best.json").exists()
    metrics = [json.loads(l) for l in
               (lm_dir / "metrics.jsonl").read_text().strip().split("\n")]
    assert metrics[-1]["train_loss"] < metrics[0]["train_loss"]

    exp = tmp_path / "exp"
    run_cli("train.py", "--preset", "hybrid_dev",
            "--train-manifest", str(tmp_path / "train.jsonl"),
            "--cv-manifest", str(tmp_path / "cv.jsonl"),
            "--vocab-size", "16", "--epochs", "100",
            "--save-folder", str(exp), "--platform", "cpu")

    for mode, gate in (("joint", 0.1), ("attn_rescore", 0.1),
                       ("ctc_beam", 0.1)):
        hyp = tmp_path / f"hyp_{mode}.jsonl"
        out = run_cli("recognize.py", "--ckpt", str(exp),
                      "--restore", "latest",
                      "--manifest", str(tmp_path / "train.jsonl"),
                      "--mode", mode, "--beam", "5", "--max-len", "24",
                      "--lm-ckpt", str(lm_dir), "--lm-weight", "0.2",
                      "--output", str(hyp), "--platform", "cpu")
        summary = json.loads(out.stdout.strip().split("\n")[-1])
        assert summary["n_utts"] == 24
        assert summary["cer"] < gate, (mode, summary)


def test_transducer_pipeline(tmp_path):
    """Transducer family end-to-end on the conformer-transducer dev
    preset (converges far faster than the vanilla encoder at the same
    budget). Two-stage training through the real CLIs:

      stage A (undertrained): transducer greedy is deletion-biased, and
        --length-penalty must recover ALSD beam to >= greedy quality
        (VERDICT r3 item 3's probe);
      stage B (--continue-from to overfit): greedy / beam / streaming all
        decode the train set at the attention-family gate (< 0.05)."""
    all_jsonl = tmp_path / "all.jsonl"
    run_cli("prepare_data.py", "--synthetic", "24", "--vocab-size", "16",
            "--out", str(all_jsonl))
    lines = all_jsonl.read_text().strip().split("\n")
    (tmp_path / "cv.jsonl").write_text("\n".join(lines[:4]) + "\n")
    (tmp_path / "train.jsonl").write_text("\n".join(lines[4:]) + "\n")

    def decode(exp, mode=None, extra=()):
        out = run_cli("recognize.py", "--ckpt", str(exp),
                      "--restore", "latest",
                      "--manifest", str(tmp_path / "train.jsonl"),
                      "--max-len", "24", "--platform", "cpu",
                      *(("--mode", mode) if mode else ()), *extra)
        return json.loads(out.stdout.strip().split("\n")[-1])

    # --- stage A: short budget -> undertrained, deletion-biased model
    exp = tmp_path / "exp_transducer"
    out = run_cli("train.py", "--preset", "conformer_transducer_dev",
                  "--train-manifest", str(tmp_path / "train.jsonl"),
                  "--cv-manifest", str(tmp_path / "cv.jsonl"),
                  "--vocab-size", "16", "--epochs", "12",
                  "--enc-chunk-size", "4",
                  "--save-folder", str(exp), "--platform", "cpu")
    assert "done" in out.stderr

    s_greedy = decode(exp)
    assert s_greedy["mode"] == "transducer_greedy"
    s_beam = decode(exp, "transducer_beam", ("--beam", "4"))
    s_beam_lp = decode(exp, "transducer_beam",
                       ("--beam", "4", "--length-penalty", "0.6"))
    # undertrained RNN-T under-emits; the per-token length reward must
    # bring the beam at least back to greedy quality
    assert s_beam_lp["cer"] <= s_greedy["cer"] + 1e-6, \
        (s_greedy, s_beam, s_beam_lp)
    assert s_beam_lp["cer"] <= s_beam["cer"] + 1e-6, (s_beam, s_beam_lp)

    # --- stage B: resume to overfit; attention-family quality gates
    out = run_cli("train.py", "--preset", "conformer_transducer_dev",
                  "--train-manifest", str(tmp_path / "train.jsonl"),
                  "--cv-manifest", str(tmp_path / "cv.jsonl"),
                  "--vocab-size", "16", "--epochs", "180",
                  "--enc-chunk-size", "4",
                  "--continue-from", str(exp),
                  "--save-folder", str(exp), "--platform", "cpu")
    assert "done" in out.stderr

    hyp = tmp_path / "hyp.jsonl"
    summary = decode(exp, None, ("--output", str(hyp)))
    assert summary["mode"] == "transducer_greedy"
    assert summary["cer"] < 0.05, summary

    summary_b = decode(exp, "transducer_beam", ("--beam", "4"))
    assert summary_b["cer"] < 0.05, summary_b

    # streaming demo: chunked incremental decode, same quality gate
    out = run_cli("stream_demo.py", "--ckpt", str(exp),
                  "--manifest", str(tmp_path / "train.jsonl"),
                  "--chunk-frames", "32", "--limit", "6",
                  "--restore", "latest", "--platform", "cpu")
    summary_s = json.loads(out.stdout.strip().split("\n")[-1])
    assert summary_s["n_utts"] == 6
    assert summary_s["cer"] < 0.05, summary_s
    assert summary_s["mean_emission_lag_ms"] is not None
