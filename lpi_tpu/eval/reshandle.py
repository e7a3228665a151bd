"""Offline result post-processing (reference `retrieval/res_handle/reshandle.py`).

Reads a continual-run result JSON ({session: {dataset: {'i2t'/'t2i':
{task: [P@1, P@5, P@10]}}}}), and reports per-k weighted average precision of
the final session plus forgetting (best-previous minus final,
`reshandle.py:52-146`). Default weights are the RefCOCO val per-task sample
counts the reference hardcodes (`reshandle.py:59`).
"""

from __future__ import annotations

import json
from typing import Dict, Sequence

import numpy as np

from lpi_tpu.eval.retrieval import aggregate_results

DEFAULT_TASK_WEIGHTS = (73, 27, 44, 255, 210, 306, 474, 500, 500, 500, 500, 500)


def _normalize_sessions(raw: dict, dataset: str) -> Dict[int, dict]:
    sessions = {}
    for s_key, entry in raw.items():
        s = int(s_key)
        body = entry.get(dataset, entry) if isinstance(entry, dict) else entry
        sessions[s] = {
            d: {int(t): v for t, v in body[d].items()}
            for d in ("i2t", "t2i") if d in body
        }
    return sessions


def get_res(json_file: str, dataset: str = "mscoco", metric: str = "i2t",
            num_sessions: int = 12,
            weights: Sequence[float] = DEFAULT_TASK_WEIGHTS) -> dict:
    """Per-k (R@1/5/10) weighted average + forgetting, reference-compatible."""
    with open(json_file) as f:
        raw = json.load(f)
    sessions = _normalize_sessions(raw, dataset)
    sessions = {s: sessions[s] for s in range(min(num_sessions, len(sessions)))}
    out = {}
    for k_index, k in enumerate((1, 5, 10)):
        agg = aggregate_results(sessions, direction=metric, k_index=k_index,
                                weights=weights)
        out[f"P@{k}"] = agg["average"]
        out[f"forgetting@{k}"] = agg["forgetting"]
    out["mean"] = float(np.mean([out["P@1"], out["P@5"], out["P@10"]]))
    return out
