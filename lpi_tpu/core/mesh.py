"""Device mesh + sharding helpers.

The reference scales via NCCL DDP (`grounding/tools/finetune.py:507-527`) and
single-process DataParallel (`retrieval/methods/sprompt.py:175-182`). The TPU
rebuild replaces both with a single `jax.sharding.Mesh` over ICI: the batch is
sharded along the `data` axis, parameters are replicated, and XLA inserts the
collectives (psum for grads, all_gather for contrastive features).
"""

from __future__ import annotations

import os
from contextlib import contextmanager

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lpi_tpu.core.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Create a 2D (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    mp = max(1, cfg.model_parallel)
    dp = cfg.data_parallel if cfg.data_parallel > 0 else n // mp
    if dp * mp > n:
        raise ValueError(f"mesh {dp}x{mp} needs {dp * mp} devices, have {n}")
    grid = np.asarray(devices[: dp * mp]).reshape(dp, mp)
    return Mesh(grid, (cfg.data_axis, cfg.model_axis))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis along `data`; replicate the rest."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch axis sharded."""
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, np.ndim(x))), batch
    )


def replicate(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


@contextmanager
def force_host_devices(n: int = 8):
    """Context for tests: pretend we have `n` CPU devices.

    Must run before the first jax call in the process; tests set this via
    conftest environment instead. Kept for programmatic use in scripts.
    """
    old_flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        old_flags + f" --xla_force_host_platform_device_count={n}"
    )
    try:
        yield
    finally:
        os.environ["XLA_FLAGS"] = old_flags


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    dp = mesh.shape[mesh.axis_names[0]]
    if global_batch % dp != 0:
        raise ValueError(f"global batch {global_batch} not divisible by data-parallel {dp}")
    return global_batch // dp
