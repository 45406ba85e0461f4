"""Persistent XLA compilation cache wiring.

The reference (a single-process PyTorch research repo) has no compile
step to cache; on TPU the first joint-beam decode pays minutes of
XLA+Pallas compilation per process.  JAX's persistent compilation cache
is known to work cross-process on this platform, so every entry point
(bin/train.py, bin/recognize.py, bin/stream_demo.py,
bin/average_checkpoints.py, bench.py) calls
:func:`enable_persistent_cache` before the first trace, making the
second process warm-start: compiled executables are deserialized from
disk instead of re-lowered.

Resolution order for the cache directory:
  1. explicit ``cache_dir`` argument (a CLI ``--compile-cache`` value),
  2. ``TPU_ASR_COMPILE_CACHE`` environment variable,
  3. ``~/.cache/tpu_asr/xla`` (shared across runs and experiments).
Passing/setting ``off`` (or ``0``/``none``) disables the cache.
"""

from __future__ import annotations

import os

DISABLE_VALUES = ("off", "0", "none", "false")
ENV_VAR = "TPU_ASR_COMPILE_CACHE"


def default_cache_dir() -> str:
    return os.path.join(os.path.expanduser("~"), ".cache", "tpu_asr", "xla")


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 1.0) -> str | None:
    """Point JAX's persistent compilation cache at a durable directory.

    Must run before the first jit compilation in the process (config
    changes do not retroactively cache already-built executables).
    Returns the directory in use, or None when disabled.

    min_compile_secs: compile-time floor below which entries are not
    persisted. CLIs keep the 1 s default (the expensive entries — Pallas
    prefix scorer, fused train step — are minutes each; the floor avoids
    churning the dir with trivial ops). The TEST conftest passes 0.0: the
    fast tier compiles hundreds of sub-second tiny programs on a 1-core
    box, and re-compiling them every run costs minutes that a cache hit
    (~10 ms deserialize) does not.
    """
    path = cache_dir or os.environ.get(ENV_VAR) or default_cache_dir()
    if path.lower() in DISABLE_VALUES:
        return None
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path


def add_cache_flag(parser) -> None:
    """Attach the shared --compile-cache flag to an argparse parser."""
    parser.add_argument(
        "--compile-cache", default="", metavar="DIR|off",
        help="persistent XLA compilation cache directory (default "
             f"$({ENV_VAR}) or ~/.cache/tpu_asr/xla; 'off' disables). "
             "Warm-starts recompiles across processes.")
