"""Test environment: run everything on a virtual 8-device CPU mesh.

The real machine has a single TPU chip behind a tunnel; tests must be hermetic and
exercise the multi-chip sharding paths, so we force the CPU platform with 8 virtual
devices (SURVEY.md §4 item 4).
"""

import os

# FORCE the CPU platform: the ambient environment sets JAX_PLATFORMS=axon (the
# tunneled TPU plugin), and running tests over the tunnel adds ~33ms latency to
# every materialization besides hogging the chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Full-f32 matmuls/convs for parity with the torch oracle (the default matmul
# precision is bf16-ish on TPU and drifts ~1e-2). The env var is frozen
# pre-import (see onda_tpu/utils/compile_cache.py) — applied via jax.config
# below.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
import jax  # noqa: E402

# The axon plugin overrides jax_platforms at import ("axon,cpu"); force it back.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision",
                  os.environ["JAX_DEFAULT_MATMUL_PRECISION"])

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# XLA:CPU compiles are slow on this 1-core box; persist them across test runs.
# Must go through jax.config (env vars alone are frozen pre-import — see module).
from onda_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable("/root/.cache/jax_test_cache")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
