"""Test harness: force CPU with 8 virtual devices so sharding paths are
exercised without TPU hardware (SURVEY.md section 4's fake-backend trick).
Must run before anything imports jax."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the env may preset a TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

# The axon TPU plugin (sitecustomize) sets jax_platforms programmatically,
# which beats the env var — override it back at config level.
jax.config.update("jax_platforms", "cpu")

# This jaxlib defaults f32 matmuls to bf16-class precision (TPU semantics,
# emulated on CPU too). Numerics tests compare exact paths, so pin f32.
jax.config.update("jax_default_matmul_precision", "float32")

# The suite is compile-bound (1 CPU core, hundreds of tiny programs):
# warm-start recompiles across runs via the persistent compilation cache,
# same mechanism the CLIs use (tpu_asr.utils.compile_cache). A separate
# dir from the CLI cache: the 8-virtual-device topology differs.
from tpu_asr.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.path.join(os.path.expanduser("~"), ".cache",
                                     "tpu_asr", "xla-tests"),
                        min_compile_secs=0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
