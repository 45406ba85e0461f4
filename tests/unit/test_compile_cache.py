"""Persistent compilation cache wiring (VERDICT r2 item 1).

Asserts the cache directory actually populates when a jit program
compiles with the cache enabled — the behavior every CLI and bench.py
now relies on for warm-starting across processes."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from tpu_asr.utils.compile_cache import (default_cache_dir,
                                         enable_persistent_cache)


def test_cache_dir_populates(tmp_path):
    # jax pins its cache singleton to the first directory used (the
    # conftest suite cache) — reset it around the redirect
    from jax.experimental.compilation_cache import compilation_cache as cc
    prev = jax.config.jax_compilation_cache_dir   # conftest's suite cache
    d = str(tmp_path / "xla_cache")
    got = enable_persistent_cache(d)
    assert got == d and os.path.isdir(d)
    # drop the floor so this tiny test program qualifies for caching
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    cc.reset_cache()
    try:
        @jax.jit
        def prog(x):
            return jnp.tanh(x) @ x.T

        prog(np.ones((32, 32), np.float32)).block_until_ready()
        assert os.listdir(d), "compilation cache directory stayed empty"
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_compilation_cache_dir", prev)
        cc.reset_cache()


def test_disable_and_env_resolution(tmp_path, monkeypatch):
    prev = jax.config.jax_compilation_cache_dir   # conftest's suite cache
    assert enable_persistent_cache("off") is None
    assert enable_persistent_cache("none") is None
    env_dir = str(tmp_path / "from_env")
    monkeypatch.setenv("TPU_ASR_COMPILE_CACHE", env_dir)
    try:
        assert enable_persistent_cache() == env_dir
        # explicit argument beats the environment
        arg_dir = str(tmp_path / "explicit")
        assert enable_persistent_cache(arg_dir) == arg_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
    monkeypatch.delenv("TPU_ASR_COMPILE_CACHE")
    assert default_cache_dir().endswith(os.path.join("tpu_asr", "xla"))


def test_cli_flag_plumbed():
    """Every user-facing entry point exposes --compile-cache."""
    import subprocess
    import sys
    root = os.path.join(os.path.dirname(__file__), "..", "..")
    for cli in ("train", "recognize", "stream_demo", "average_checkpoints"):
        out = subprocess.run(
            [sys.executable, os.path.join(root, "bin", f"{cli}.py"),
             "--help"], capture_output=True, text=True, timeout=120)
        assert "--compile-cache" in out.stdout, cli
