"""Model-server integration: bin/serve.py as a subprocess.

Trains a tiny hybrid model, starts the server (CPU), then checks:
- /healthz reports the configured buckets/batch size;
- /recognize (wav input, concurrent requests through the micro-batcher)
  returns EXACTLY the hypotheses bin/recognize.py-style direct decode
  produces for the same audio — batching composition must not change
  per-utterance results;
- nbest plumbing and 'text' rendering with a dict file;
- /stream sessions emit the same final hypothesis as a direct
  StreamingCTCRecognizer over the same features;
- over-long utterances get a 413, not a crash.
"""

import json
import os
import socket
import subprocess
import sys
import threading
import time
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _post(url, obj, timeout=120):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, json.loads(r.read())


def run_cli(script, *args):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)   # CLIs force cpu via --platform
    env.pop("XLA_FLAGS", None)       # no virtual-device leak (see cli_e2e)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bin", script), *args],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO)
    assert out.returncode == 0, (script, out.stdout[-2000:],
                                 out.stderr[-2000:])
    return out


def test_serve_recognize_and_stream(tmp_path):
    # --- tiny corpus + overfit model (train set decodes near-exactly) ---
    all_jsonl = tmp_path / "all.jsonl"
    run_cli("prepare_data.py", "--synthetic", "20", "--vocab-size", "16",
            "--out", str(all_jsonl))
    # char dict matching the synthetic vocab layout (run.sh stage-1 style:
    # one letter per non-special token id)
    toks = (["<blank>", "<unk>"] +
            [chr(ord("a") + i) for i in range(12)] + ["<sos>", "<eos>"])
    (tmp_path / "dict.txt").write_text(
        "".join(f"{t} {i}\n" for i, t in enumerate(toks)))
    lines = all_jsonl.read_text().strip().split("\n")
    (tmp_path / "cv.jsonl").write_text("\n".join(lines[:4]) + "\n")
    (tmp_path / "train.jsonl").write_text("\n".join(lines[4:]) + "\n")
    exp = tmp_path / "exp"
    run_cli("train.py", "--preset", "hybrid_dev",
            "--train-manifest", str(tmp_path / "train.jsonl"),
            "--cv-manifest", str(tmp_path / "cv.jsonl"),
            "--vocab-size", "16", "--epochs", "60",
            "--save-folder", str(exp), "--platform", "cpu")

    # --- expected hypotheses: direct single-process decode of the wavs ---
    utts = [json.loads(l) for l in
            (tmp_path / "train.jsonl").read_text().strip().split("\n")][:6]
    wavs = [np.load(u["wav"]).astype(np.float32) for u in utts]

    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    errlog = open(tmp_path / "serve.err", "w")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "bin", "serve.py"),
         "--ckpt", str(exp), "--restore", "latest", "--mode", "joint",
         "--beam", "4", "--max-len", "24", "--port", str(port),
         "--bucket-frames", "128,256", "--batch-size", "4",
         "--window-ms", "30", "--inputs", "wav",
         "--dict", str(tmp_path / "dict.txt"), "--platform", "cpu"],
        stdout=subprocess.PIPE, stderr=errlog, text=True,
        env=env, cwd=REPO)
    try:
        ready = proc.stdout.readline()          # blocks until warmed up
        assert proc.poll() is None and ready, \
            (tmp_path / "serve.err").read_text()[-2000:]
        info = json.loads(ready)
        assert info["buckets"] == [128, 256] and info["streaming"]
        base = f"http://127.0.0.1:{port}"

        code, health = _get(f"{base}/healthz")
        assert code == 200 and health["status"] == "ok"
        assert health["batch_size"] == 4

        # concurrent requests: exercises the micro-batcher's group/pad path
        results = [None] * len(wavs)

        def ask(i):
            code, out = _post(f"{base}/recognize",
                              {"wav": wavs[i].tolist(), "nbest": 2})
            results[i] = (code, out)

        threads = [threading.Thread(target=ask, args=(i,))
                   for i in range(len(wavs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert all(r is not None for r in results)
        assert all(code == 200 for code, _ in results), results

        # expected: direct in-process decode (same ckpt, same beam config)
        out = run_cli("recognize.py", "--ckpt", str(exp), "--restore",
                      "latest", "--manifest", str(tmp_path / "train.jsonl"),
                      "--mode", "joint", "--beam", "4", "--max-len", "24",
                      "--output", str(tmp_path / "hyp.jsonl"),
                      "--platform", "cpu")
        direct = {json.loads(l)["id"]: json.loads(l)["hyp_tokens"]
                  for l in (tmp_path / "hyp.jsonl").read_text()
                  .strip().split("\n")}
        served_cer_tokens = 0
        for u, (code, out) in zip(utts, results):
            assert out["tokens"] == direct[u["id"]], \
                (u["id"], out["tokens"], direct[u["id"]])
            assert len(out["nbest"]) == 2
            assert isinstance(out["text"], str)   # dict file was wired
            served_cer_tokens += len(out["tokens"])
        assert served_cer_tokens > 0

        # micro-batcher actually batched: fewer decode batches than requests
        code, health = _get(f"{base}/healthz")
        assert health["stats"]["requests"] >= len(wavs)

        # --- streaming session vs direct StreamingCTCRecognizer ---
        import jax
        jax.config.update("jax_platforms", "cpu")
        # checkpointed TrainState rng key shape depends on the PRNG impl;
        # training default is rbg (key shape (4,)). Scoped: restored below
        # so the suite's default impl is unchanged for later tests.
        prev_impl = jax.config.jax_default_prng_impl
        jax.config.update("jax_default_prng_impl", "rbg")
        import jax.numpy as jnp
        from tpu_asr.decode.streaming import StreamingCTCRecognizer
        from tpu_asr.frontend import FrontendConfig, wav_to_features
        from tpu_asr.models import Transformer
        from tpu_asr.train import TrainState, make_optimizer
        from tpu_asr.train.checkpoints import Checkpointer

        ck = Checkpointer(str(exp))
        cfg = ck.load_config()
        model = Transformer(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 80, cfg.d_input), jnp.float32),
                               jnp.full((1,), 80, jnp.int32),
                               jnp.zeros((1, 4), jnp.int32),
                               jnp.full((1,), 4, jnp.int32))
        st = TrainState.create(variables["params"],
                               make_optimizer(cfg.d_model),
                               jax.random.PRNGKey(0))
        st, _ = ck.restore(st, step=ck.latest_step())
        params = {"params": st.params}
        wav = wavs[0]
        feats, flen = wav_to_features(jnp.asarray(wav[None]),
                                      jnp.asarray([len(wav)]),
                                      FrontendConfig())
        feats = np.asarray(feats[0, : int(flen[0])])
        srec = StreamingCTCRecognizer(cfg, params, max_frames=512)
        for pos in range(0, len(feats), 32):
            srec.push(feats[pos: pos + 32])
        want = srec.finish()

        sid = "sess-1"
        for pos in range(0, len(feats), 32):
            code, out = _post(f"{base}/stream",
                              {"session": sid,
                               "feats": feats[pos: pos + 32].tolist()})
            assert code == 200, out
        code, out = _post(f"{base}/stream",
                          {"session": sid, "final": True})
        assert code == 200 and out["final"]
        assert out["tokens"] == want, (out["tokens"], want)

        # --- over-long utterance -> 413, server stays up ---
        code, out = _post(f"{base}/recognize",
                          {"wav": np.zeros(256 * 160 + 16000,
                                           np.float32).tolist()})
        assert code == 413, (code, out)
        code, health = _get(f"{base}/healthz")
        assert code == 200
    finally:
        proc.terminate()
        try:
            proc.wait(timeout=10)
        except subprocess.TimeoutExpired:
            proc.kill()
        if "prev_impl" in locals():
            import jax
            jax.config.update("jax_default_prng_impl", prev_impl)
