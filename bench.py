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
datasets; the torch baseline decodes 16 utterances from the same
distribution at the SAME max_len as the TPU path. inverse-RTF on both
sides counts only real (unpadded) audio seconds.

Kill-proof output (round 5): the round-3 driver bench recorded zero (TPU
tunnel outage) and the round-4 one recorded NOTHING (rc=124: the driver's
timeout landed mid-extras, before the single end-of-run emit).  Now the
FULL payload line is re-printed after EVERY measurement — the driver
parses the last valid JSON line, so a kill at any moment after the first
metric still delivers everything measured up to it — and a SIGTERM/SIGINT
handler prints the current payload one final time before dying.  Ordering
matches value density: primary joint-beam first, hybrid-train steps/s
second (on a COPY of the params so donation cannot invalidate the decode
weights), remaining decode modes, fresh torch denominator, then extras
gated by their PREDICTED cost against the internal deadline (default
1380 s — under any plausible driver timer; r4's kill landed ~1550 s in).
Until the fresh torch-CPU denominator exists, vs_baseline is computed
from the last-good denominator and tagged provisional.

Outage resilience (round 4): the backend is probed from throwaway
SUBPROCESSES (tpu_asr.utils.backend_probe — a dead tunnel hangs
in-process init unrecoverably) in a retry loop; if the TPU never answers,
the torch-CPU baseline is still measured and the last successful run's
numbers are attached under extras.stale_last_good with "stale": true.

Prints the payload as a JSON line after every measurement; the LAST line
is the complete run: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

from __future__ import annotations

import gc
import json
import os
import signal
import sys
import threading
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _env_int(name, default):
    return int(os.environ.get(name, default))


# TPU_ASR_BENCH_SMALL=1: tiny model + tiny workload, used by the
# simulated-outage unit test (tests/unit/test_bench_outage.py) so the
# torch baseline finishes in seconds on CPU.
SMALL = os.environ.get("TPU_ASR_BENCH_SMALL", "") not in ("", "0")

# AISHELL-ish workload: 80-dim fbank @ 100 fps, padded bucket T=1000
T_FRAMES = 128 if SMALL else 1000
U_TOK = 8 if SMALL else 24
BATCH = 2 if SMALL else 32
N_BATCHES = 1 if SMALL else 4
BEAM = 2 if SMALL else 5
MAX_LEN = 8 if SMALL else 40
# Headline-ratio denominator: 16 utts, interleaved min-of-3 per utterance
# (r2/r3 used 8 utts x 1 pass and wobbled +-10%; r4's median-of-3 full
# passes still spread 10.5% — per-utterance min of interleaved repeats
# removes the uncorrelated system noise a 1-core box injects).
TORCH_UTTS = _env_int("TPU_ASR_BENCH_TORCH_UTTS", 2 if SMALL else 16)
TORCH_PASSES = _env_int("TPU_ASR_BENCH_TORCH_PASSES", 2 if SMALL else 3)
LASTGOOD_PATH = os.environ.get(
    "TPU_ASR_BENCH_LASTGOOD",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "bench_lastgood.json"))


def utt_lengths(n, seed):
    """AISHELL-1-like frame lengths: lognormal around ~430 frames (4.3 s),
    clipped to [250, 1000] (the recipe's maxlen_in filtering caps the
    tail)."""
    rng = np.random.default_rng(seed)
    if SMALL:
        lens = np.exp(rng.normal(np.log(64.0), 0.35, n))
        return np.clip(lens, 32, T_FRAMES).astype(np.int32)
    lens = np.exp(rng.normal(np.log(430.0), 0.35, n))
    return np.clip(lens, 250, T_FRAMES).astype(np.int32)


def make_cfg(pallas_ctc=True):
    import jax.numpy as jnp
    from tpu_asr.models import ModelConfig

    if SMALL:
        return ModelConfig(vocab_size=64, d_input=80, d_model=64,
                           d_inner=128, num_heads=4, num_enc_layers=2,
                           num_dec_layers=2, model_type="hybrid",
                           ctc_weight=0.3, dtype=jnp.bfloat16)
    # flagship aishell-preset model: asymmetric conv front-end channels
    # (32 -> 128, VGG-style: channels grow as time/freq resolution shrinks)
    # measured 45.3 -> 54.4 train steps/s vs the symmetric 256-ch front-end
    # at b=32xT=1000 bf16 on v5e, with the front-end's ~3.5ms share cut to
    # ~1ms (per-op trace r2).
    # pallas_ctc (as in the aishell preset): the fwd-bwd lattice kernel
    # replaces the 250-iteration XLA scan; per-op trace r2 shows device
    # time 18.2 -> 16.5 ms/step (54.9 -> 57.2 steps/s measured).
    return ModelConfig(vocab_size=4233, model_type="hybrid", ctc_weight=0.3,
                       dtype=jnp.bfloat16, conv_channels=(32, 128),
                       pallas_ctc=pallas_ctc)


# --- persistent-compile-cache instrumentation (r4 verdict weak item 6:
# the driver run paid a 654.5 s cold compile despite the cache banner and
# nothing recorded why) ---
CACHE_COUNTS = {"hits": 0, "misses": 0}


def install_cache_counters():
    from jax._src import monitoring

    def listener(event, **kw):
        if event == "/jax/compilation_cache/cache_hits":
            CACHE_COUNTS["hits"] += 1
        elif event == "/jax/compilation_cache/cache_misses":
            CACHE_COUNTS["misses"] += 1

    monitoring.register_event_listener(listener)


def cache_delta(before):
    d = {k: CACHE_COUNTS[k] - before[k] for k in before}
    return f"cache hits={d['hits']} misses={d['misses']}"


def build(pallas_ctc=True):
    import jax
    import jax.numpy as jnp
    from tpu_asr.models import Transformer
    from tpu_asr.utils.compile_cache import enable_persistent_cache

    # local-testing hook: the axon plugin sets jax_platforms
    # programmatically, so plain JAX_PLATFORMS=cpu does NOT win — this does
    plat = os.environ.get("TPU_ASR_BENCH_PLATFORM", "")
    if plat:
        jax.config.update("jax_platforms", plat)
    # rbg PRNG: threefry dropout costs ~37% of the train step on v5e
    jax.config.update("jax_default_prng_impl", "rbg")
    # warm-start recompiles across driver runs (r2 paid 519s of joint-beam
    # compile per process; the persistent cache deserializes instead)
    cache_dir = enable_persistent_cache()
    install_cache_counters()
    n_entries = len(os.listdir(cache_dir)) if cache_dir else 0
    log(f"compilation cache: {cache_dir} ({n_entries} entries)")

    cfg = make_cfg(pallas_ctc=pallas_ctc)
    model = Transformer(cfg)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(
        rng.standard_normal((BATCH, T_FRAMES, 80)).astype(np.float32))
    flens = jnp.asarray(np.full(BATCH, T_FRAMES, np.int32))  # train shape
    #                    (steps/s comparable across rounds: b=32 x 1000)
    targets = jnp.asarray(
        rng.integers(2, cfg.vocab_size - 2, (BATCH, U_TOK)).astype(np.int32))
    tlens = jnp.asarray(np.full(BATCH, U_TOK, np.int32))
    # init on a 1-utterance slice: flax params are batch-independent and
    # the small trace keeps the CPU-fallback (outage) path cheap
    params = model.init(jax.random.PRNGKey(0), feats[:1, :T_FRAMES // 2],
                        jnp.asarray([T_FRAMES // 2], jnp.int32),
                        targets[:1], tlens[:1])
    return cfg, model, params, (feats, flens, targets, tlens)


def make_decode_batches():
    """Length-bucketed decode workload: N_BATCHES*BATCH utterances bucketed
    into T=512 / T=1000 static shapes (what bin/recognize.py does to real
    datasets), padded to full batches."""
    import jax.numpy as jnp
    rng = np.random.default_rng(3)
    lens = utt_lengths(N_BATCHES * BATCH, seed=7)
    batches = []
    bounds = ((T_FRAMES, 0),) if SMALL else ((512, 0), (T_FRAMES, 512))
    for bound, lo in bounds:
        sel = np.sort(lens[(lens > lo) & (lens <= bound)])
        for s in range(0, len(sel), BATCH):
            chunk = sel[s: s + BATCH]
            fl = np.zeros(BATCH, np.int32)
            fl[: len(chunk)] = chunk          # dummy rows: length 0
            feats = rng.standard_normal((BATCH, bound, 80)).astype(np.float32)
            batches.append({"feats": jnp.asarray(feats),
                            "feat_lengths": jnp.asarray(fl)})
    return batches, float(lens.sum()) * 0.01


def warm_shapes(rec, batches, label=""):
    """Compile+warm every distinct bucket shape CONCURRENTLY: XLA compiles
    are host-CPU work dominated by sequential HLO passes, so two bucket
    shapes (T=512/T=1000) compiled from two threads overlap nearly fully —
    r4's driver run paid a 654.5 s cold joint-beam warmup for the two
    shapes back to back."""
    from concurrent.futures import ThreadPoolExecutor
    t0 = time.time()
    cc = dict(CACHE_COUNTS)
    firsts = {}
    for b in batches:
        firsts.setdefault(b["feats"].shape, b)
    with ThreadPoolExecutor(max_workers=len(firsts)) as ex:
        list(ex.map(rec.decode_batch, firsts.values()))
    log(f"{label} compile+warmup ({len(firsts)} shapes, parallel): "
        f"{time.time()-t0:.1f}s [{cache_delta(cc)}]")


def bench_decode_tpu(cfg, params, batches, audio_s, mode="joint", beam=BEAM,
                     passes=3):
    from tpu_asr.decode.beam import BeamConfig
    from tpu_asr.decode.recognizer import Recognizer

    rec = Recognizer(cfg=cfg, params=params,
                     beam=BeamConfig(beam=beam, max_len=MAX_LEN,
                                     ctc_weight=0.3 if mode == "joint"
                                     else 0.0),
                     mode=mode)
    warm_shapes(rec, batches, label=f"{mode} beam={beam}")
    # the production manifest path (bin/recognize.py): dispatch-ahead
    # window + grouped output fetches (r5: per-array fetches cost ~23 ms
    # of tunnel round trip EACH and dominated every decode number)
    t0 = time.time()
    for _ in range(passes):
        rec.decode_batches_nbest(batches)
    wall = (time.time() - t0) / passes
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
    cc = dict(CACHE_COUNTS)
    state, m = step(state, batch)
    float(m["loss"])
    log(f"train compile+first step: {time.time()-t0:.1f}s "
        f"[{cache_delta(cc)}]")
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


def bench_train_hybrid_on_copy(cfg, model, params, batch_arrays):
    """Hybrid train steps/s EARLY in the run (a north-star number the r4
    driver kill lost because it was ordered last): the donated train step
    would invalidate the decode params, so it trains on a deep copy."""
    import jax
    params_copy = {"params": jax.tree_util.tree_map(
        lambda x: x.copy(), params["params"])}
    steps = bench_train_tpu(cfg, model, params_copy, batch_arrays)
    del params_copy
    return steps


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
    warm_shapes(rec, batches, label="transducer greedy")
    t0 = time.time()
    for _ in range(3):
        rec.decode_batches_nbest(batches)
    decode_rtf = audio_s / ((time.time() - t0) / 3)
    # train bench donates params -> run last
    steps = bench_train_tpu(cfg, model, params, batch_arrays)
    return {"train_steps_per_sec": round(steps, 3),
            "greedy_inverse_rtf": round(decode_rtf, 2)}


def bench_conformer(batch_arrays, batches, audio_s):
    """Conformer extras (r3 verdict weak item 7: the de-facto-standard
    encoder was added but never measured): train steps/s at the standard
    b=32 x 1000-frame batch (conformer-CTC hybrid, rel-pos MHSA + depthwise
    conv) and greedy-CTC decode inverse-RTF on the bucketed workload."""
    import jax
    import jax.numpy as jnp
    from tpu_asr.decode.beam import BeamConfig
    from tpu_asr.decode.recognizer import Recognizer
    from tpu_asr.models import ModelConfig, build_model
    feats, flens, targets, tlens = batch_arrays
    cfg = ModelConfig(vocab_size=4233, model_type="hybrid",
                      encoder_type="conformer", ctc_weight=0.3,
                      dtype=jnp.bfloat16, conv_channels=(32, 128),
                      pallas_ctc=True)
    model = build_model(cfg)
    t0 = time.time()
    params = jax.jit(model.init)(jax.random.PRNGKey(0), feats, flens,
                                 targets, tlens)
    log(f"conformer init+compile: {time.time()-t0:.1f}s")
    rec = Recognizer(cfg=cfg, params=params, mode="greedy_ctc",
                     beam=BeamConfig(beam=1, max_len=MAX_LEN))
    warm_shapes(rec, batches, label="conformer greedy-ctc")
    t0 = time.time()
    for _ in range(3):
        rec.decode_batches_nbest(batches)
    decode_rtf = audio_s / ((time.time() - t0) / 3)
    steps = bench_train_tpu(cfg, model, params, batch_arrays)
    return {"train_steps_per_sec": round(steps, 3),
            "greedy_ctc_inverse_rtf": round(decode_rtf, 2)}


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


def bench_torch_baseline(cfg, params, passes=TORCH_PASSES):
    """Reference-style host-driven beam decode (PyTorch CPU), TORCH_UTTS
    utterances from the same length distribution at the same max_len as
    the TPU path.

    Denominator methodology (r4 verdict weak item 4: 10.5% pass-to-pass
    spread): each utterance is decoded `passes` times BACK TO BACK and its
    wall is the min of those repeats — interleaved repeats keep the
    caches warm per utterance and the min strips the uncorrelated system
    noise a 1-core box injects into any single pass.  GC is disabled
    inside the timed region; one warmup decode precedes timing.  Per-pass
    totals are still reported (spread diagnostic).  Returns
    (min_based_inverse_rtf, per_pass_inverse_rtfs)."""
    import dataclasses
    import jax.numpy as jnp
    import torch
    from tpu_asr.parity.torch_twin import (TorchTransformer,
                                           import_flax_params)
    torch.set_num_threads(max(1, os.cpu_count() or 1))
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
    # warmup: one decode of the shortest utterance (allocator, BLAS init)
    i_min = int(np.argmin(lens))
    twin.beam_decode_utt(utt_feats[i_min], torch.tensor([int(lens[i_min])]),
                         beam=BEAM, max_len=MAX_LEN)
    walls = np.zeros((TORCH_UTTS, passes))
    gc.collect()
    gc.disable()
    try:
        for i in range(TORCH_UTTS):
            fl = torch.tensor([int(lens[i])])
            for p in range(passes):
                t0 = time.time()
                twin.beam_decode_utt(utt_feats[i], fl, beam=BEAM,
                                     max_len=MAX_LEN)
                walls[i, p] = time.time() - t0
    finally:
        gc.enable()
    rtfs = [float(audio / walls[:, p].sum()) for p in range(passes)]
    log(f"torch baseline per-pass: {[round(r, 3) for r in rtfs]}")
    return float(audio / walls.min(axis=1).sum()), [round(r, 4)
                                                    for r in rtfs]


# Wall-clock budget: extras are skipped (loudly) when the time already
# spent PLUS the extra's predicted cold-cache cost (r4 tail observations)
# would cross the deadline; the primary decode metrics always run first.
# The deadline default (1380 s) sits under the driver's kill timer (r4's
# kill landed ~1550 s into the run) — and because the payload is
# re-emitted after every measurement, even a mis-estimate only loses the
# extras still pending, never the run.
BENCH_DEADLINE_S = float(os.environ.get("TPU_ASR_BENCH_DEADLINE", 1380))
BENCH_RESERVE_S = float(os.environ.get("TPU_ASR_BENCH_RESERVE",
                                       30 if SMALL else 600))
_T0 = time.time()

# Predicted cold-cache extra costs, seconds (BENCH_r04 tail: compile +
# warmup + measurement, rounded up).
PREDICTED_COST_S = {"serve": 80, "cif_train": 95, "transducer": 140,
                    "conformer": 120}


def over_budget(label):
    spent = time.time() - _T0
    predicted = 0 if SMALL else PREDICTED_COST_S.get(label, 0)
    if spent + predicted > BENCH_DEADLINE_S:
        log(f"skipping {label}: bench budget spent ({spent:.0f}s + "
            f"predicted {predicted}s > {BENCH_DEADLINE_S:.0f}s)")
        return True
    return False


def load_lastgood():
    try:
        with open(LASTGOOD_PATH) as f:
            return json.load(f)
    except Exception:  # noqa: BLE001  (missing, corrupt)
        return None


def save_lastgood(payload):
    try:
        with open(LASTGOOD_PATH, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
    except Exception as e:  # noqa: BLE001
        log(f"could not save last-good bench numbers: {e!r}")


def run_torch_baseline_safely(cfg, params):
    """The torch baseline is CPU-only (no TPU, no compile) and is the
    headline ratio's denominator — it must ALWAYS be measured and
    reported, healthy or outage."""
    try:
        torch_inv_rtf, rtf_passes = bench_torch_baseline(cfg, params)
        log(f"torch-cpu reference-style beam inverse-RTF ({TORCH_UTTS} utts,"
            f" max_len={MAX_LEN}, per-utt min-of-{TORCH_PASSES}):"
            f" {torch_inv_rtf:.2f}")
        spread = (100.0 * (max(rtf_passes) - min(rtf_passes))
                  / torch_inv_rtf) if len(rtf_passes) > 1 else 0.0
        return torch_inv_rtf, {"torch_cpu_inverse_rtf": round(torch_inv_rtf,
                                                              3),
                               "torch_passes": rtf_passes,
                               "torch_spread_pct": round(spread, 1),
                               "torch_denominator":
                                   f"per_utt_min_of_{TORCH_PASSES}",
                               "torch_utts": TORCH_UTTS}
    except Exception as e:  # keep the bench robust
        log(f"torch baseline failed: {e!r}")
        return float("nan"), {"torch_cpu_inverse_rtf": None,
                              "torch_error": repr(e)}


# --- kill-proof payload emission ---

PAYLOAD = {"metric": "joint_beam_decode_inverse_rtf", "value": 0,
           "unit": "x_realtime_per_chip", "vs_baseline": 0, "extras": {}}


def emit(payload=None):
    """Print the (current) full payload as one JSON line.  Called after
    EVERY measurement: the driver parses the last valid JSON line, so a
    kill at any point still delivers everything measured before it."""
    print(json.dumps(PAYLOAD if payload is None else payload), flush=True)


def _emit_and_die(signum, frame):  # noqa: ARG001
    PAYLOAD["extras"]["killed_by_signal"] = int(signum)
    PAYLOAD["extras"]["killed_at_s"] = round(time.time() - _T0, 1)
    try:
        emit()
        sys.stdout.flush()
    finally:
        os._exit(0)


def install_signal_emitters():
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            signal.signal(sig, _emit_and_die)
        except (ValueError, OSError):  # non-main thread / exotic platform
            pass


def _refresh_vs_baseline():
    """vs_baseline from the fresh torch denominator when it exists, else
    provisionally from the last-good one (tagged) so every progressive
    emission carries a usable ratio."""
    ex = PAYLOAD["extras"]
    denom = ex.get("torch_cpu_inverse_rtf")
    if denom:
        ex.pop("vs_baseline_provisional", None)
    else:
        lg = load_lastgood() or {}
        denom = (lg.get("extras") or {}).get("torch_cpu_inverse_rtf")
        if denom:
            ex["vs_baseline_provisional"] = (
                "denominator is last-good torch_cpu_inverse_rtf "
                f"({denom}); fresh measurement pending")
    PAYLOAD["vs_baseline"] = (round(PAYLOAD["value"] / denom, 2)
                              if denom else 0)


def record(key, value):
    """Land a measurement in extras and re-emit the full payload."""
    PAYLOAD["extras"][key] = value
    PAYLOAD["extras"]["compile_cache"] = dict(CACHE_COUNTS)
    PAYLOAD["extras"]["elapsed_s"] = round(time.time() - _T0, 1)
    _refresh_vs_baseline()
    emit()


def main_outage():
    """TPU never answered within (deadline - reserve): still measure the
    torch-CPU baseline on the CPU backend and attach the last successful
    run's TPU numbers tagged stale."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    extras = {"error": "TPU backend unavailable (device init hung or "
                       "failed; axon tunnel down) — no TPU measurement "
                       "possible this run"}
    try:
        cfg, _model, params, _arrays = build(pallas_ctc=False)
        _, torch_extras = run_torch_baseline_safely(cfg, params)
        extras.update(torch_extras)
    except Exception as e:  # noqa: BLE001
        log(f"outage-path torch baseline setup failed: {e!r}")
        extras["torch_error"] = repr(e)
    lastgood = load_lastgood()
    if lastgood is not None:
        extras["stale_last_good"] = {"stale": True, **lastgood}
    emit({"metric": "joint_beam_decode_inverse_rtf", "value": 0,
          "unit": "x_realtime_per_chip", "vs_baseline": 0,
          "extras": extras})


def main():
    install_signal_emitters()
    from tpu_asr.utils.backend_probe import wait_for_backend
    n_dev = wait_for_backend(_T0 + BENCH_DEADLINE_S - BENCH_RESERVE_S,
                             log=log)
    if n_dev < 1:
        main_outage()
        return

    cfg, model, params, batch_arrays = build()
    batches, audio_s = make_decode_batches()
    log(f"decode workload: {len(batches)} bucketed batches, "
        f"{audio_s:.0f}s audio")
    lens = utt_lengths(N_BATCHES * BATCH, seed=7)
    PAYLOAD["extras"].update({
        "train_batch": {"b": BATCH, "frames": T_FRAMES},
        "beam": BEAM, "max_len": MAX_LEN,
        "utt_frames_hist": {
            "deciles": [int(x) for x in np.percentile(
                lens, np.arange(0, 101, 10))],
            "mean": round(float(lens.mean()), 1)},
    })

    # Primary metric FIRST, then the hybrid-train north-star (on a params
    # copy — donation must not invalidate the decode weights), then the
    # remaining decode modes; payload re-emitted after each.
    try:
        PAYLOAD["value"] = round(
            bench_decode_tpu(cfg, params, batches, audio_s), 2)
        log(f"tpu joint-beam-{BEAM} decode inverse-RTF: {PAYLOAD['value']}")
        record("joint_beam5_inverse_rtf", PAYLOAD["value"])

        steps = bench_train_hybrid_on_copy(cfg, model, params, batch_arrays)
        log(f"tpu hybrid train steps/sec (b={BATCH}, T={T_FRAMES}): "
            f"{steps:.2f}")
        record("train_steps_per_sec", round(steps, 3))

        for key, kw in (
                ("greedy_ctc_inverse_rtf", {"mode": "greedy_ctc"}),
                ("joint_beam10_inverse_rtf", {"beam": 10}),
                ("attn_rescore_beam10_inverse_rtf",
                 {"mode": "attn_rescore", "beam": 10})):
            record(key, round(bench_decode_tpu(cfg, params, batches,
                                               audio_s, **kw), 2))
            log(f"tpu {key}: {PAYLOAD['extras'][key]}")
    except Exception as e:  # noqa: BLE001  (mid-run tunnel death)
        log(f"TPU decode bench died mid-run: {e!r}")
        record("error", f"TPU bench died mid-run: {e!r}")

    # torch baseline: CPU-only, never budget-gated, always reported
    _, torch_extras = run_torch_baseline_safely(cfg, params)
    PAYLOAD["extras"].update(torch_extras)
    record("torch_cpu_inverse_rtf", torch_extras["torch_cpu_inverse_rtf"])

    for label, key, fn in (
            ("serve", "serve", lambda: bench_serve(cfg, params)),
            ("cif_train", "cif_train_steps_per_sec",
             lambda: bench_train_cif(batch_arrays)),
            ("transducer", "transducer",
             lambda: bench_transducer(batch_arrays, batches, audio_s)),
            ("conformer", "conformer",
             lambda: bench_conformer(batch_arrays, batches, audio_s))):
        try:
            if over_budget(label):
                raise RuntimeError("budget")
            val = fn()
            record(key, round(val, 3) if isinstance(val, float) else val)
            log(f"{label}: {PAYLOAD['extras'][key]}")
        except Exception as e:  # noqa: BLE001
            log(f"{label} bench failed: {e!r}")
            record(key, None)

    if PAYLOAD["value"] > 0:  # real TPU measurement: remember for outages
        save_lastgood(PAYLOAD)
    emit()


if __name__ == "__main__":
    main()
