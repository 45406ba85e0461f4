#!/usr/bin/env python
"""Benchmark harness (driver-run, real TPU).

Headline: AISHELL-shaped decode inverse-RTF (seconds of audio decoded per
wall second) of the flagship hybrid CTC/attention model using the compiled
joint-scoring beam search, versus the SAME weights running the
reference-style host-driven PyTorch-CPU beam decode (tpu_asr.parity
.torch_twin) — BASELINE.json's ">=10x the PyTorch CPU reference
inverse-RTF per v5e chip" target.

Workload realism: utterance lengths are drawn from an AISHELL-1-like
duration distribution (lognormal, mean ~4.3 s, clipped to [2.5 s, 10 s])
instead of a fixed length; decode batches are length-bucketed into two
static shapes (T=512/T=1000) exactly as bin/recognize.py buckets real
datasets; the torch baseline decodes 8 utterances from the same
distribution at the SAME max_len as the TPU path. inverse-RTF on both
sides counts only real (unpadded) audio seconds.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# AISHELL-ish workload: 80-dim fbank @ 100 fps, padded bucket T=1000
T_FRAMES = 1000
U_TOK = 24
BATCH = 32
N_BATCHES = 4
BEAM = 5
MAX_LEN = 40
TORCH_UTTS = 8


def utt_lengths(n, seed):
    """AISHELL-1-like frame lengths: lognormal around ~430 frames (4.3 s),
    clipped to [250, 1000] (the recipe's maxlen_in filtering caps the
    tail)."""
    rng = np.random.default_rng(seed)
    lens = np.exp(rng.normal(np.log(430.0), 0.35, n))
    return np.clip(lens, 250, T_FRAMES).astype(np.int32)


def build():
    import jax
    import jax.numpy as jnp
    from tpu_asr.models import ModelConfig, Transformer
    from tpu_asr.utils.compile_cache import enable_persistent_cache

    # rbg PRNG: threefry dropout costs ~37% of the train step on v5e
    jax.config.update("jax_default_prng_impl", "rbg")
    # warm-start recompiles across driver runs (r2 paid 519s of joint-beam
    # compile per process; the persistent cache deserializes instead)
    cache_dir = enable_persistent_cache()
    log(f"compilation cache: {cache_dir}")

    # flagship aishell-preset model: asymmetric conv front-end channels
    # (32 -> 128, VGG-style: channels grow as time/freq resolution shrinks)
    # measured 45.3 -> 54.4 train steps/s vs the symmetric 256-ch front-end
    # at b=32xT=1000 bf16 on v5e, with the front-end's ~3.5ms share cut to
    # ~1ms (per-op trace r2).
    # pallas_ctc (as in the aishell preset): the fwd-bwd lattice kernel
    # replaces the 250-iteration XLA scan; per-op trace r2 shows device
    # time 18.2 -> 16.5 ms/step (54.9 -> 57.2 steps/s measured).
    cfg = ModelConfig(vocab_size=4233, model_type="hybrid", ctc_weight=0.3,
                      dtype=jnp.bfloat16, conv_channels=(32, 128),
                      pallas_ctc=True)
    model = Transformer(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((BATCH, T_FRAMES, 80)).astype(np.float32))
    flens = jnp.asarray(np.full(BATCH, T_FRAMES, np.int32))  # train shape
    #                    (steps/s comparable across rounds: b=32 x 1000)
    targets = jnp.asarray(rng.integers(2, 4231, (BATCH, U_TOK)).astype(np.int32))
    tlens = jnp.asarray(np.full(BATCH, U_TOK, np.int32))
    params = model.init(jax.random.PRNGKey(0), feats, flens, targets, tlens)
    return cfg, model, params, (feats, flens, targets, tlens)


def make_decode_batches():
    """Length-bucketed decode workload: N_BATCHES*BATCH utterances bucketed
    into T=512 / T=1000 static shapes (what bin/recognize.py does to real
    datasets), padded to full batches."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    lens = utt_lengths(N_BATCHES * BATCH, seed=7)
    batches = []
    for bound, lo in ((512, 0), (T_FRAMES, 512)):
        sel = np.sort(lens[(lens > lo) & (lens <= bound)])
        for s in range(0, len(sel), BATCH):
            chunk = sel[s: s + BATCH]
            fl = np.zeros(BATCH, np.int32)
            fl[: len(chunk)] = chunk          # dummy rows: length 0
            feats = rng.standard_normal((BATCH, bound, 80)).astype(np.float32)
            batches.append({"feats": jnp.asarray(feats),
                            "feat_lengths": jnp.asarray(fl)})
    return batches, float(lens.sum()) * 0.01


def bench_decode_tpu(cfg, params, batches, audio_s, mode="joint", beam=BEAM):
    from tpu_asr.decode.beam import BeamConfig
    from tpu_asr.decode.recognizer import Recognizer

    rec = Recognizer(cfg=cfg, params=params,
                     beam=BeamConfig(beam=beam, max_len=MAX_LEN,
                                     ctc_weight=0.3 if mode == "joint"
                                     else 0.0),
                     mode=mode)
    t0 = time.time()
    warmed = set()
    for b in batches:                  # warm up every bucket shape
        if b["feats"].shape not in warmed:
            rec.decode_batch(b)
            warmed.add(b["feats"].shape)
    log(f"{mode} beam={beam} compile+warmup ({len(warmed)} shapes): "
        f"{time.time()-t0:.1f}s")
    t0 = time.time()
    for b in batches:
        rec.decode_batch(b)
    wall = time.time() - t0
    return audio_s / wall


def bench_train_tpu(cfg, model, params, batch_arrays):
    import jax
    from tpu_asr.train import TrainState, make_optimizer, make_train_step
    feats, flens, targets, tlens = batch_arrays
    tx = make_optimizer(cfg.d_model)
    state = TrainState.create(params["params"], tx, jax.random.PRNGKey(1))
    step = make_train_step(model, tx, donate=True)
    batch = {"feats": feats, "feat_lengths": flens, "targets": targets,
             "target_lengths": tlens}
    t0 = time.time()
    state, m = step(state, batch)
    float(m["loss"])
    log(f"train compile+first step: {time.time()-t0:.1f}s")
    for _ in range(5):                 # settle dispatch pipelining
        state, m = step(state, batch)
    float(m["loss"])
    n = 40
    t0 = time.time()
    for _ in range(n):
        state, m = step(state, batch)
    float(m["loss"])
    wall = time.time() - t0
    return n / wall


def bench_train_cif(batch_arrays):
    """CIF train steps/s (north-star phrasing is "CTC+CIF training
    steps/sec"): aishell-scale CIF model (ctc aux 0.5 + quantity loss),
    same b=32 x 1000-frame batch as the hybrid bench."""
    import jax
    import jax.numpy as jnp
    from tpu_asr.models import CifModel, ModelConfig
    feats, flens, targets, tlens = batch_arrays
    cfg = ModelConfig(vocab_size=4233, model_type="cif", ctc_weight=0.5,
                      cif_quantity_weight=1.0, dtype=jnp.bfloat16,
                      conv_channels=(32, 128), pallas_ctc=True)
    model = CifModel(cfg)
    params = model.init(jax.random.PRNGKey(0), feats, flens, targets, tlens)
    return bench_train_tpu(cfg, model, params, batch_arrays)


def bench_transducer(batch_arrays, batches, audio_s):
    """Transducer (RNN-T) extras: train steps/s at the standard b=32 x
    1000-frame batch and greedy decode inverse-RTF on the same bucketed
    AISHELL-like workload. Flagship-scale config (d512 encoder, 2-layer
    predictor, d_joint 512, aux CTC 0.3, frame-fused remat loss)."""
    import jax
    import jax.numpy as jnp
    from tpu_asr.decode.beam import BeamConfig
    from tpu_asr.decode.recognizer import Recognizer
    from tpu_asr.models import ModelConfig, build_model
    feats, flens, targets, tlens = batch_arrays
    cfg = ModelConfig(vocab_size=4233, model_type="transducer",
                      ctc_weight=0.3, dtype=jnp.bfloat16,
                      conv_channels=(32, 128), pallas_ctc=True,
                      num_pred_layers=2, d_joint=512)
    model = build_model(cfg)
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), feats, flens,
                                 targets, tlens)
    log(f"transducer init+compile: {time.time()-t0:.1f}s")
    rec = Recognizer(cfg=cfg, params=params, mode="transducer_greedy",
                     beam=BeamConfig(beam=1, max_len=MAX_LEN))
    t0 = time.time()
    for b_ in batches:
        rec.decode_batch(b_)
    log(f"transducer greedy compile+warmup: {time.time()-t0:.1f}s")
    t0 = time.time()
    for _ in range(3):
        for b_ in batches:
            rec.decode_batch(b_)
    decode_rtf = audio_s / ((time.time() - t0) / 3)
    # train bench donates params -> run last
    steps = bench_train_tpu(cfg, model, params, batch_arrays)
    return {"train_steps_per_sec": round(steps, 3),
            "greedy_inverse_rtf": round(decode_rtf, 2)}


def bench_serve(cfg, params, n_requests=48, mean_gap_ms=15.0):
    """End-to-end serving latency through the micro-batcher: Poisson-ish
    request arrivals (feats kind, AISHELL-length utterances) against the
    same flagship joint-beam recognizer; reports p50/p95 request latency
    and the effective batching factor. This is the production-serving
    claim measured, not asserted."""
    from tpu_asr.decode.beam import BeamConfig
    from tpu_asr.decode.recognizer import Recognizer
    from tpu_asr.serve import AsrServer

    rec = Recognizer(cfg=cfg, params=params, mode="joint",
                     beam=BeamConfig(beam=BEAM, max_len=MAX_LEN,
                                     ctc_weight=0.3))
    server = AsrServer(rec, bucket_frames=(512, T_FRAMES), batch_size=8,
                       window_ms=10.0)
    t0 = time.time()
    server.warmup(kinds=("feats",))
    log(f"serve warmup (2 programs, batch=8): {time.time()-t0:.1f}s")
    server.start()
    rng = np.random.default_rng(23)
    lens = utt_lengths(n_requests, seed=29)
    lat = [None] * n_requests
    threads = []

    def ask(i):
        feats = rng.standard_normal((int(lens[i]), 80)).astype(np.float32)
        t0 = time.time()
        server.submit("feats", feats, timeout=120.0)
        lat[i] = (time.time() - t0) * 1000.0

    t_all = time.time()
    for i in range(n_requests):
        th = threading.Thread(target=ask, args=(i,))
        th.start()
        threads.append(th)
        time.sleep(float(rng.exponential(mean_gap_ms / 1000.0)))
    for th in threads:
        th.join(timeout=180)
    wall = time.time() - t_all
    server.stop()
    assert all(x is not None for x in lat)
    return {
        "p50_ms": round(float(np.percentile(lat, 50)), 1),
        "p95_ms": round(float(np.percentile(lat, 95)), 1),
        "requests": n_requests,
        "offered_gap_ms": mean_gap_ms,
        "throughput_rps": round(n_requests / wall, 1),
        "batching_factor": round(server.stats["requests"]
                                 / max(server.stats["batches"], 1), 2),
    }


def bench_torch_baseline(cfg, params, passes=3):
    """Reference-style host-driven beam decode (PyTorch CPU), 8 utterances
    from the same length distribution at the same max_len as the TPU path.
    Median of `passes` full passes: single-pass inverse-RTF wobbled ±10%
    run-to-run (r2), and it is the denominator of the headline ratio."""
    import dataclasses
    import jax.numpy as jnp
    import torch
    from tpu_asr.parity.torch_twin import (TorchTransformer,
                                           import_flax_params)
    torch.set_num_threads(torch.get_num_threads())
    cfg32 = dataclasses.replace(cfg, dtype=jnp.float32)
    twin = TorchTransformer(cfg32)
    import_flax_params(twin, params)
    twin.eval()
    rng = np.random.default_rng(1)
    lens = utt_lengths(TORCH_UTTS, seed=11)
    utt_feats = [torch.tensor(
        rng.standard_normal((1, int(t), 80)).astype(np.float32))
        for t in lens]
    audio = float(lens.sum()) * 0.01
    rtfs = []
    for _ in range(passes):
        wall = 0.0
        for i in range(TORCH_UTTS):
            fl = torch.tensor([int(lens[i])])
            t0 = time.time()
            twin.beam_decode_utt(utt_feats[i], fl, beam=BEAM,
                                 max_len=MAX_LEN)
            wall += time.time() - t0
        rtfs.append(audio / wall)
    log(f"torch baseline passes: {[round(r, 3) for r in rtfs]}")
    return float(np.median(rtfs))


# Wall-clock budget for the OPTIONAL extras (serve, transducer, cif,
# torch baseline): the driver records the single JSON line printed at the
# END of main(), so a driver-side timeout mid-extra would lose the whole
# run. Extras are skipped (loudly) once the budget from process start is
# spent; the primary decode metrics always complete first.
BENCH_DEADLINE_S = float(os.environ.get("TPU_ASR_BENCH_DEADLINE", 2700))
_T0 = time.time()


def over_budget(label):
    spent = time.time() - _T0
    if spent > BENCH_DEADLINE_S:
        log(f"skipping {label}: bench budget spent "
            f"({spent:.0f}s > {BENCH_DEADLINE_S:.0f}s)")
        return True
    return False


def backend_ready(timeout_s: float = 300.0) -> bool:
    """Probe jax backend init in a daemon thread: the axon TPU tunnel has
    been observed to HANG init for hours when the pool is unhealthy
    (r3, 2026-08-17) — a hung bench records nothing, a failed probe still
    prints the JSON line the driver expects."""
    import threading
    ok = []

    def probe():
        try:
            import jax
            ok.append(len(jax.devices()) > 0)
        except Exception as e:  # noqa: BLE001
            log(f"backend init failed: {e!r}")
            ok.append(False)

    th = threading.Thread(target=probe, daemon=True)
    th.start()
    th.join(timeout_s)
    if not ok:
        log(f"backend init did not complete within {timeout_s:.0f}s")
        return False
    return ok[0]


def main():
    if not backend_ready():
        print(json.dumps({
            "metric": "joint_beam_decode_inverse_rtf",
            "value": 0,
            "unit": "x_realtime_per_chip",
            "vs_baseline": 0,
            "extras": {"error": "TPU backend unavailable (device init hung "
                                "or failed; axon tunnel down) — no "
                                "measurement possible this run"},
        }))
        return
    cfg, model, params, batch_arrays = build()
    feats, flens, targets, tlens = batch_arrays
    batches, audio_s = make_decode_batches()
    log(f"decode workload: {len(batches)} bucketed batches, "
        f"{audio_s:.0f}s audio")

    inv_rtf = bench_decode_tpu(cfg, params, batches, audio_s)
    log(f"tpu joint-beam-{BEAM} decode inverse-RTF: {inv_rtf:.1f}")
    inv_rtf_b10 = bench_decode_tpu(cfg, params, batches, audio_s, beam=10)
    log(f"tpu joint-beam-10 decode inverse-RTF: {inv_rtf_b10:.1f}")
    greedy_rtf = bench_decode_tpu(cfg, params, batches, audio_s,
                                  mode="greedy_ctc")
    log(f"tpu greedy-CTC decode inverse-RTF: {greedy_rtf:.1f}")
    rescore_rtf = bench_decode_tpu(cfg, params, batches, audio_s,
                                   mode="attn_rescore", beam=10)
    log(f"tpu attn-rescore-10 decode inverse-RTF: {rescore_rtf:.1f}")

    try:
        # torch baseline is CPU-only (no compile) and is the headline
        # ratio's denominator — never budget-gated
        torch_inv_rtf = bench_torch_baseline(cfg, params)
        log(f"torch-cpu reference-style beam inverse-RTF ({TORCH_UTTS} utts,"
            f" max_len={MAX_LEN}): {torch_inv_rtf:.2f}")
    except Exception as e:  # keep the bench robust
        log(f"torch baseline failed: {e!r}")
        torch_inv_rtf = float("nan")

    try:
        if over_budget("serve"):
            raise RuntimeError("budget")
        serve_stats = bench_serve(cfg, params)
        log(f"serve latency: {serve_stats}")
    except Exception as e:
        log(f"serve bench failed: {e!r}")
        serve_stats = None

    try:
        if over_budget("cif_train"):
            raise RuntimeError("budget")
        cif_steps_per_sec = bench_train_cif(batch_arrays)
        log(f"tpu CIF train steps/sec (b={BATCH}, T={T_FRAMES}): "
            f"{cif_steps_per_sec:.2f}")
    except Exception as e:
        log(f"cif train bench failed: {e!r}")
        cif_steps_per_sec = None

    try:
        if over_budget("transducer"):
            raise RuntimeError("budget")
        transducer_stats = bench_transducer(batch_arrays, batches, audio_s)
        log(f"transducer extras: {transducer_stats}")
    except Exception as e:
        log(f"transducer bench failed: {e!r}")
        transducer_stats = None

    # train bench donates params — must run last
    steps_per_sec = bench_train_tpu(cfg, model, params, batch_arrays)
    log(f"tpu hybrid train steps/sec (b={BATCH}, T={T_FRAMES}): "
        f"{steps_per_sec:.2f}")

    lens = utt_lengths(N_BATCHES * BATCH, seed=7)
    vs = inv_rtf / torch_inv_rtf if torch_inv_rtf == torch_inv_rtf else 0.0
    print(json.dumps({
        "metric": "joint_beam_decode_inverse_rtf",
        "value": round(inv_rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(vs, 2),
        "extras": {
            "train_steps_per_sec": round(steps_per_sec, 3),
            "cif_train_steps_per_sec": (round(cif_steps_per_sec, 3)
                                        if cif_steps_per_sec else None),
            "train_batch": {"b": BATCH, "frames": T_FRAMES},
            "joint_beam10_inverse_rtf": round(inv_rtf_b10, 2),
            "greedy_ctc_inverse_rtf": round(greedy_rtf, 2),
            "attn_rescore_beam10_inverse_rtf": round(rescore_rtf, 2),
            "serve": serve_stats,
            "transducer": transducer_stats,
            "torch_cpu_inverse_rtf": (round(torch_inv_rtf, 2)
                                      if vs else None),
            "torch_utts": TORCH_UTTS, "torch_passes": 3,
            "beam": BEAM, "max_len": MAX_LEN,
            "utt_frames_hist": {
                "deciles": [int(x) for x in np.percentile(
                    lens, np.arange(0, 101, 10))],
                "mean": round(float(lens.mean()), 1),
            },
        },
    }))


if __name__ == "__main__":
    main()
