"""bench.py outage resilience (r3 verdict item 1): with the backend
forced down, the bench must still print the driver-expected JSON line
carrying a real torch-CPU baseline and the last-known-good TPU numbers
tagged stale — never a bare zero, never a hang."""

import pytest
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def test_wait_for_backend_forced_down_returns_immediately():
    from tpu_asr.utils.backend_probe import wait_for_backend
    os.environ["TPU_ASR_FORCE_BACKEND_DOWN"] = "1"
    try:
        t0 = time.time()
        assert wait_for_backend(time.time() + 3600) == 0
        assert time.time() - t0 < 2.0  # no subprocess spawned, no sleep
    finally:
        del os.environ["TPU_ASR_FORCE_BACKEND_DOWN"]


def test_probe_backend_bad_interpreter_is_zero(monkeypatch):
    """A probe whose child fails (here: a dead tunnel stand-in) reports 0
    instead of raising or hanging."""
    from tpu_asr.utils import backend_probe
    monkeypatch.setattr(backend_probe.sys, "executable",
                        "/nonexistent/python")
    assert backend_probe.probe_backend(timeout_s=5.0) == 0


def test_bench_sigterm_midrun_still_emits_parseable_payload(tmp_path):
    """r4 verdict item 1: the driver's timeout killed the round-4 bench
    before its single end-of-run emit and the whole run was lost.  Now a
    SIGTERM at ANY point — here: seconds in, before the first
    measurement — must still leave a valid payload as the last stdout
    line (the signal handler emits before dying), with rc=0."""
    import signal
    env = dict(os.environ,
               TPU_ASR_BENCH_SMALL="1",
               TPU_ASR_BENCH_PLATFORM="cpu",
               TPU_ASR_BENCH_LASTGOOD=str(tmp_path / "lg.json"))
    p = subprocess.Popen([sys.executable, os.path.join(REPO, "bench.py")],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env, cwd=REPO)
    time.sleep(8.0)  # past install_signal_emitters(), mid backend-probe
    p.send_signal(signal.SIGTERM)
    stdout, stderr = p.communicate(timeout=60)
    assert p.returncode == 0, stderr[-2000:]
    line = stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "joint_beam_decode_inverse_rtf"
    assert out["extras"]["killed_by_signal"] == int(signal.SIGTERM)


@pytest.mark.slow
def test_bench_outage_json_carries_baseline_and_stale(tmp_path):
    lastgood = tmp_path / "lastgood.json"
    lastgood.write_text(json.dumps({
        "metric": "joint_beam_decode_inverse_rtf", "value": 433.0,
        "unit": "x_realtime_per_chip", "vs_baseline": 600.0,
        "extras": {"train_steps_per_sec": 57.45}}))
    env = dict(os.environ,
               TPU_ASR_FORCE_BACKEND_DOWN="1",
               TPU_ASR_BENCH_SMALL="1",
               TPU_ASR_BENCH_DEADLINE="120",
               TPU_ASR_BENCH_LASTGOOD=str(lastgood),
               JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                       capture_output=True, text=True, timeout=240,
                       env=env, cwd=REPO)
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "joint_beam_decode_inverse_rtf"
    assert out["value"] == 0 and out["vs_baseline"] == 0
    ex = out["extras"]
    # the torch-CPU denominator was measured for real (no TPU needed)
    assert ex["torch_cpu_inverse_rtf"] and ex["torch_cpu_inverse_rtf"] > 0
    assert ex["torch_utts"] == 2  # SMALL-mode workload
    # last-known-good TPU numbers ride along, tagged stale
    sl = ex["stale_last_good"]
    assert sl["stale"] is True
    assert sl["value"] == 433.0
    assert sl["extras"]["train_steps_per_sec"] == 57.45
    assert "error" in ex
