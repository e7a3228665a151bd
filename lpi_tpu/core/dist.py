"""Multi-process helpers — the `utils/comm.py` surface, TPU-native.

The reference's distributed layer (`maskrcnn_benchmark/utils/comm.py`) rides
torch.distributed/NCCL: rank queries, barrier, pickled-object all_gather for
eval merging, dict reduction for loss logging. On TPU, in-graph collectives
are XLA's job (psum/all_gather inside pjit — see `lpi_tpu.losses`); this
module covers only the HOST-side coordination the engine needs:

* `get_world_size` / `get_rank` / `is_main_process` — jax process info;
* `all_gather_objects` — gather arbitrary pytrees of host data across
  processes (replaces the pickle gather, `comm.py:50-91`) via
  `multihost_utils.process_allgather` on arrays, with a pure-python
  fallback in single-process runs;
* `reduce_dict` — average a dict of scalars across processes
  (`comm.py:101-120` / `engine/trainer.py:22-44`).

Single-process (the common dev case) short-circuits everything.
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import numpy as np


def get_world_size() -> int:
    return jax.process_count()


def get_rank() -> int:
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize() -> None:
    """Barrier across processes (no-op single-process)."""
    if get_world_size() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("lpi_tpu_sync")


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather one python object per process -> list ordered by rank."""
    if get_world_size() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    # encode via numpy bytes array (object -> pickle -> uint8), fixed-size
    import pickle

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.asarray([payload.size]))
    max_size = int(np.max(sizes))
    padded = np.zeros(max_size, np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    out = []
    for rank in range(get_world_size()):
        size = int(sizes[rank][0]) if sizes.ndim > 1 else int(sizes[rank])
        out.append(pickle.loads(gathered[rank][:size].tobytes()))
    return out


def reduce_dict(metrics: Dict[str, float], average: bool = True) -> Dict[str, float]:
    """Average (or sum) scalar metrics across processes."""
    world = get_world_size()
    if world == 1:
        return dict(metrics)
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    values = np.asarray([float(metrics[k]) for k in keys])
    gathered = multihost_utils.process_allgather(values)  # [P, K]
    total = gathered.sum(axis=0)
    if average:
        total = total / world
    return {k: float(v) for k, v in zip(keys, total)}
