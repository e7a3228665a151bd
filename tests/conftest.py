"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding is validated without TPU hardware via the standard JAX
trick of forcing N host platform devices (SURVEY.md §4). This must happen
before jax initializes, hence at conftest import time.

ON-CHIP LANE: `LPI_ONCHIP=1 pytest -m tpu` keeps the environment's real TPU
platform (axon/tpu) instead of pinning CPU, so `tpu`-marked tests lower
Pallas kernels through Mosaic and run train steps on the chip. The CPU
pinning below made Mosaic lowering errors structurally invisible to the
suite (the r4 gate crash shipped through it) — any change under `ops/` must
run this lane before landing.
"""

import os

ONCHIP = os.environ.get("LPI_ONCHIP", "0") == "1"

if not ONCHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_enable_x64", False)
# The container's sitecustomize pre-imports jax with the TPU platform
# selected; backends are not initialized yet, so re-point to CPU here.
if not ONCHIP:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
# Persistent compilation cache: the suite is compile-bound on CPU; repeat
# runs (local iteration, CI re-runs) skip recompiles entirely.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("LPI_TEST_CACHE", "/tmp/lpi_jax_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


@pytest.fixture(scope="session")
def mesh8():
    from lpi_tpu.core import mesh as mesh_lib
    from lpi_tpu.core.config import MeshConfig

    return mesh_lib.make_mesh(MeshConfig(data_parallel=8))


@pytest.fixture()
def rng():
    return np.random.RandomState(0)
