"""Checkpointing: frozen base stored once, per-session deltas thereafter.

Replaces the reference's per-task full-model `.pth` dumps
(`grounding/maskrcnn_benchmark/utils/checkpoint.py:34-57`, saving
`model_final_{task_id}` each task) with the layout SURVEY §5 prescribes:

    <dir>/base/            frozen tower params (saved once)
    <dir>/session_<k>/     {pool_params, visual_keys, textual_keys, results}
    <dir>/latest           tag file (the reference's `last_checkpoint`)

Uses orbax PyTree checkpointing; arrays restore as numpy and are device-put
lazily by the consumer.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree.map(np.asarray, tree)


def _as_nested(tree):
    """Accept flat dicts with tuple keys (the learners' pool split) and
    convert to nested string-keyed dicts — orbax stringifies keys."""
    if isinstance(tree, dict) and any(isinstance(k, tuple) for k in tree):
        from flax import traverse_util

        return traverse_util.unflatten_dict(tree)
    return tree


class SessionCheckpointer:
    def __init__(self, directory: str):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # -- frozen base -----------------------------------------------------
    def save_base(self, frozen_params) -> None:
        path = os.path.join(self.directory, "base")
        self._ckptr.save(path, _to_host(_as_nested(frozen_params)), force=True)
        self._ckptr.wait_until_finished()

    def load_base(self) -> Any:
        return self._ckptr.restore(os.path.join(self.directory, "base"))

    def has_base(self) -> bool:
        return os.path.exists(os.path.join(self.directory, "base"))

    # -- per-session state ----------------------------------------------
    def save_session(self, session: int, pool_params, visual_keys=None,
                     textual_keys=None, results: Optional[dict] = None) -> None:
        pool_params = _as_nested(pool_params)
        state = {"pool_params": _to_host(pool_params)}
        if visual_keys is not None:
            state["visual_keys"] = {
                "centers": np.asarray(visual_keys.centers),
                "valid": np.asarray(visual_keys.valid),
            }
        if textual_keys is not None:
            state["textual_keys"] = {
                "centers": np.asarray(textual_keys.centers),
                "valid": np.asarray(textual_keys.valid),
            }
        path = os.path.join(self.directory, f"session_{session}")
        self._ckptr.save(path, state, force=True)
        self._ckptr.wait_until_finished()
        if results is not None:
            with open(os.path.join(self.directory, f"session_{session}_results.json"), "w") as f:
                json.dump(results, f, default=float)
        with open(os.path.join(self.directory, "latest"), "w") as f:
            f.write(str(session))

    def load_session(self, session: int) -> Any:
        return self._ckptr.restore(os.path.join(self.directory, f"session_{session}"))

    def latest_session(self) -> Optional[int]:
        tag = os.path.join(self.directory, "latest")
        if not os.path.exists(tag):
            return None
        with open(tag) as f:
            return int(f.read().strip())
