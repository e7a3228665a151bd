"""Task-identity keys: per-task KMeans centers + nearest-center inference.

Reference behavior (`retrieval/methods/sprompt.py:336-403`): after each
session, KMeans(k=5) over the session's frozen-backbone features yields that
task's "keys". At eval, each sample picks the task whose closest center is
nearest — with the reference's (idiosyncratic but faithful) **L1** metric:
`(((feature - center)**2)**0.5).sum(1)` is elementwise-abs, summed.

Keys are kept as one `[num_tasks, k, dim]` array, HBM-resident; inference is
a single fully-vectorized distance computation (no per-task Python loop).
Tasks not yet trained are masked with +inf distances.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class TaskKeys:
    centers: jnp.ndarray  # [num_tasks, k, dim]
    valid: jnp.ndarray  # [num_tasks] bool — sessions trained so far

    @staticmethod
    def create(num_tasks: int, k: int, dim: int) -> "TaskKeys":
        return TaskKeys(
            centers=jnp.zeros((num_tasks, k, dim), jnp.float32),
            valid=jnp.zeros((num_tasks,), bool),
        )

    def update(self, task_id: int, centers: jnp.ndarray) -> "TaskKeys":
        return replace(
            self,
            centers=self.centers.at[task_id].set(centers.astype(jnp.float32)),
            valid=self.valid.at[task_id].set(True),
        )


jax.tree_util.register_dataclass(
    TaskKeys, data_fields=["centers", "valid"], meta_fields=[]
)


def infer_task_ids(features: jnp.ndarray, keys: TaskKeys) -> jnp.ndarray:
    """features [B, D] -> task ids [B] by nearest center, L1 metric.

    Vectorized equivalent of get_visual_task_id / get_textual_task_id
    (`sprompt.py:336-368`): per task take the min over its k centers of the
    L1 distance, then argmin over tasks (earliest task wins ties, matching
    torch.min's first-occurrence argmin).
    """
    # [B, T, K]
    d = jnp.sum(
        jnp.abs(features[:, None, None, :] - keys.centers[None, :, :, :]), axis=-1
    )
    per_task = jnp.min(d, axis=2)  # [B, T]
    per_task = jnp.where(keys.valid[None, :], per_task, jnp.inf)
    return jnp.argmin(per_task, axis=1)
