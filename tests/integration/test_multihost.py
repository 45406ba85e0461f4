"""Multi-host (DCN-path) bring-up smoke: the one §2.3 row that never
executed before round 3. Spawns TWO local processes that call
parallel.mesh.initialize_distributed (TCP coordinator on localhost), build
the global device view, and run a REAL cross-process psum — as far as
multi-host can be exercised on one box (VERDICT r2 item 5)."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

WORKER = textwrap.dedent("""
    import os, sys
    sys.path.insert(0, os.environ["TPU_ASR_REPO"])
    import jax
    # the axon TPU plugin sets jax_platforms programmatically; force cpu
    jax.config.update("jax_platforms", "cpu")
    from tpu_asr.parallel.mesh import initialize_distributed, make_mesh

    initialize_distributed()          # reads COORDINATOR_ADDRESS etc.
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2, jax.device_count()
    assert jax.local_device_count() == 1

    import numpy as np
    pid = jax.process_index()

    # cross-process collective #1: allgather of the process ids
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(
        np.asarray([pid], np.int32))
    assert sorted(np.asarray(gathered).ravel().tolist()) == [0, 1], gathered

    # cross-process collective #2: a real psum over both processes'
    # devices (process p contributes p+1; both must see 1+2=3)
    y = jax.pmap(lambda x: jax.lax.psum(x, "i"), axis_name="i")(
        np.full((jax.local_device_count(), 1), pid + 1, np.float32))
    assert float(np.asarray(y)[0, 0]) == 3.0, np.asarray(y)

    # the mesh helper sees the GLOBAL device set
    mesh = make_mesh(n_data=2, n_model=1)
    assert mesh.devices.size == 2
    print(f"OK pid={pid} psum=3.0")
""")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_initialize_and_psum(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)          # 1 CPU device per process
        env.pop("JAX_PLATFORMS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["TPU_ASR_REPO"] = REPO
        env["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
        env["NUM_PROCESSES"] = "2"
        env["PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, (out[-2000:], err[-2000:])
    assert any("OK pid=0" in o for _, o, _ in outs)
    assert any("OK pid=1" in o for _, o, _ in outs)
