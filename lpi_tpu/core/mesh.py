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


# ---------------------------------------------------------------------------
# tensor parallelism (Megatron-style) over the mesh's `model` axis
# ---------------------------------------------------------------------------

# Leaf-path rules for column-parallel (shard the OUTPUT feature dim — the
# kernel's last axis — plus the bias) and row-parallel (shard the INPUT dim —
# the kernel's second-to-last axis; bias replicated, XLA psums the partial
# outputs over `model`). The column→row pairing keeps each MLP / attention
# block to ONE all-reduce, the Megatron recipe (PAPERS.md; GSPMD inserts the
# collective at the row-parallel matmul).
#
#   * CLIP towers (`models/clip/model.py`): QuickGELU MLP `mlp_c_fc` →
#     `mlp_c_proj`. The packed-QKV `in_proj` (torch nn.MultiheadAttention
#     layout, kept for 1:1 checkpoint conversion) is NOT sharded: its 3W
#     output dim splits into q/k/v at W boundaries, which misalign with
#     3W/mp shard boundaries for mp ∉ {3, 9, ...} — GSPMD would insert a
#     reshard inside every attention. MLP is 2/3 of tower FLOPs.
#   * Fused BERT (`models/glip/fused.py`): unpacked `query`/`key`/`value`
#     Dense → head-sharded attention (D % mp == 0 keeps whole heads per
#     shard), `attention_output` row-parallel; `intermediate` → `output`
#     MLP pair. Rules are scoped under `tlayer` so the generic names
#     (`output`, `query`) can't match other modules.
#   * Swin (`models/glip/swin.py`): `mlp/fc1` → `mlp/fc2`. The packed
#     `qkv` stays replicated (same misalignment as CLIP's in_proj).
#
# Leaves are scan-stacked (leading layer axis), so the rule shards by
# POSITION FROM THE END of the shape, not absolute axis index.
_TP_COLUMN = ("mlp_c_fc", "fc1", "intermediate", "query", "key", "value")
_TP_ROW = ("mlp_c_proj", "fc2", "output", "attention_output")
_TP_SCOPED = {"output": "tlayer", "intermediate": "tlayer",
              "query": "tlayer", "key": "tlayer", "value": "tlayer",
              "fc1": "mlp", "fc2": "mlp"}


def _tp_spec(path: tuple, shape: tuple, mp: int) -> P:
    """PartitionSpec for one param leaf under Megatron TP; P() if no rule
    applies or the sharded dim is not divisible by `mp`."""
    if len(path) < 2 or len(shape) < 2:
        return P()
    module, leaf = path[-2], path[-1]
    scope = _TP_SCOPED.get(module)
    if scope is not None and not any(scope in p for p in path[:-2]):
        return P()
    if module in _TP_COLUMN and leaf in ("kernel", "bias"):
        dim = -1
    elif module in _TP_ROW and leaf == "kernel":
        dim = -2
    else:
        return P()
    if shape[dim] % mp != 0:
        return P()
    spec = [None] * len(shape)
    spec[dim % len(shape)] = "model"
    return P(*spec)


def tp_param_shardings(mesh: Mesh, params):
    """NamedSharding pytree for `params`: Megatron tensor-parallel layouts
    over the mesh's `model` axis for the transformer-tower weights,
    replicated for everything else (embeddings, LNs, prompt pools, heads).

    Replaces nothing in the reference — LPI's DDP replicates every weight
    (`grounding/tools/finetune.py:507-527`); this is the TPU-native scaling
    dimension the reference doesn't have."""
    from jax import tree_util

    mp = mesh.shape[mesh.axis_names[1]] if len(mesh.axis_names) > 1 else 1

    def spec_for(path, leaf):
        if mp <= 1:
            return NamedSharding(mesh, P())
        names = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in path)
        return NamedSharding(mesh, _tp_spec(names, np.shape(leaf), mp))

    return tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params):
    """Device-put `params` with TP layouts when the mesh has a model axis
    of size > 1; plain replication otherwise (bit-identical to
    `replicate` on a dp-only mesh)."""
    shardings = tp_param_shardings(mesh, params)
    return jax.tree.map(jax.device_put, params, shardings)
