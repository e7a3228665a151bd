"""Shared continual-learner plumbing (param split, schedules)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import traverse_util
from flax.core import unfreeze


def split_params(params: dict, pool_keys: Sequence[str]) -> Tuple[dict, dict]:
    """Partition a param tree into (task-pool leaves, frozen leaves) by path
    substring — the trainable/frozen boundary of every continual session."""
    flat = traverse_util.flatten_dict(unfreeze(params))
    pools = {k: v for k, v in flat.items()
             if any(p in "/".join(k) for p in pool_keys)}
    frozen = {k: v for k, v in flat.items() if k not in pools}
    return pools, frozen


def merge_params(pools: dict, frozen: dict) -> dict:
    return traverse_util.unflatten_dict({**pools, **frozen})


def epoch_cosine(base_lr: float, epochs: int, steps_per_epoch: int):
    """torch CosineAnnealingLR stepped once per epoch
    (`retrieval/methods/sprompt.py:254,324`; `tools/finetune.py:240-241`)."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / epochs))

    return schedule
