"""Freeze masks: "only the current task's prompts train" as gradient masking.

The reference mutates `requires_grad` per parameter name each session
(`retrieval/methods/sprompt.py:197-245`, `grounding/tools/finetune.py:193-234`).
Here trainability is a pure function of the parameter path:

* parameters under a *task pool* (leading [num_tasks] axis, e.g.
  `prompts/*`, `ctx_pool`, `interact/*`) receive gradients only on the
  current task's slice (a one-hot multiply over axis 0);
* everything else (the frozen pretrained towers) is zeroed.

Because the forward path only gathers the current task's slice, most of the
mask is a no-op for the base losses; it matters for the inter-task loss,
whose gradient reaches every seen task's prompts but must only update the
current one (SURVEY §2 R3).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp

# Path substrings identifying task-pool parameters (leading task axis).
DEFAULT_POOL_KEYS: tuple = ("prompts", "ctx_pool", "interact")


def _path_str(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path
    )


def trainable_mask(params, pool_keys: Sequence[str] = DEFAULT_POOL_KEYS):
    """Pytree of bools: True where the leaf belongs to a task pool."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(k in _path_str(path) for k in pool_keys), params
    )


def mask_grads(grads, task_id, pool_keys: Sequence[str] = DEFAULT_POOL_KEYS):
    """Zero every gradient except the current task's pool slices."""

    def mask_leaf(path, g):
        if any(k in _path_str(path) for k in pool_keys):
            onehot = jax.nn.one_hot(task_id, g.shape[0], dtype=g.dtype)
            return g * onehot.reshape((g.shape[0],) + (1,) * (g.ndim - 1))
        return jnp.zeros_like(g)

    return jax.tree_util.tree_map_with_path(mask_leaf, grads)


def count_trainable(params, task_id: int,
                    pool_keys: Sequence[str] = DEFAULT_POOL_KEYS) -> int:
    """Number of scalars that can receive gradient this session (logging)."""
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        if any(k in _path_str(path) for k in pool_keys):
            total += int(leaf[task_id].size if leaf.ndim > 0 else leaf.size)
    return total
