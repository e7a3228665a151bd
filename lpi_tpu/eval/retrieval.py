"""Retrieval metrics: per-task R@k and continual-learning aggregates.

Equivalent of the reference's `itm_eval` (`retrieval/methods/sprompt.py:551-
646`) and of the offline post-processing in
`retrieval/res_handle/reshandle.py` (average precision across sessions and
forgetting = last - best-previous). Host-side numpy; score matrices come off
device once per evaluation.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Sequence

import numpy as np


def _ranks_i2t(scores_i2t: np.ndarray, img2txt: Mapping[int, Sequence[int]]) -> np.ndarray:
    """Rank of the best-ranked ground-truth text per image."""
    order = np.argsort(-scores_i2t, axis=1)
    n_img = scores_i2t.shape[0]
    ranks = np.zeros(n_img)
    pos = np.empty(scores_i2t.shape[1], np.int64)
    for i in range(n_img):
        pos[order[i]] = np.arange(scores_i2t.shape[1])
        ranks[i] = min(pos[t] for t in img2txt[i])
    return ranks


def _ranks_t2i(scores_t2i: np.ndarray, txt2img: Mapping[int, int]) -> np.ndarray:
    order = np.argsort(-scores_t2i, axis=1)
    n_txt = scores_t2i.shape[0]
    ranks = np.zeros(n_txt)
    for i in range(n_txt):
        ranks[i] = np.where(order[i] == txt2img[i])[0][0]
    return ranks


def _per_task_rk(ranks: np.ndarray, categories: np.ndarray, num_tasks: int) -> Dict[int, List[float]]:
    res = {}
    for task in range(num_tasks):
        r = ranks[categories == task]
        if len(r) == 0:
            res[task] = [0.0, 0.0, 0.0]
            continue
        res[task] = [100.0 * np.mean(r < k) for k in (1, 5, 10)]
    return res


def itm_eval(
    scores_i2t: np.ndarray,
    scores_t2i: np.ndarray,
    txt2img: Mapping[int, int],
    img2txt: Mapping[int, Sequence[int]],
    img_categories: Sequence[int],
    txt_categories: Sequence[int],
    num_tasks: int,
) -> dict:
    """Per-task R@1/5/10 both directions over the cumulative eval set.

    Output schema matches the reference's per-session result entry
    (`sprompt.py:633-640`): {'i2t': {task: [r1,r5,r10]}, 't2i': {...}} plus
    the averaged summary.
    """
    img_cat = np.asarray(img_categories)
    txt_cat = np.asarray(txt_categories)
    i2t = _per_task_rk(_ranks_i2t(scores_i2t, img2txt), img_cat, num_tasks)
    t2i = _per_task_rk(_ranks_t2i(scores_t2i, txt2img), txt_cat, num_tasks)

    def avg(res):
        arr = np.array([res[t] for t in range(num_tasks)])
        return arr.mean(axis=0)

    tr1, tr5, tr10 = avg(i2t)
    ir1, ir5, ir10 = avg(t2i)
    summary = {
        "txt_r1": tr1, "txt_r5": tr5, "txt_r10": tr10,
        "txt_r_mean": (tr1 + tr5 + tr10) / 3,
        "img_r1": ir1, "img_r5": ir5, "img_r10": ir10,
        "img_r_mean": (ir1 + ir5 + ir10) / 3,
    }
    summary["r_mean"] = (summary["txt_r_mean"] + summary["img_r_mean"]) / 2
    return {"i2t": i2t, "t2i": t2i, "summary": summary}


def aggregate_results(
    sessions: Mapping[int, dict],
    direction: str = "i2t",
    k_index: int = 0,
    weights: Sequence[float] | None = None,
) -> dict:
    """Continual aggregates over the session results dict
    (reshandle.py:52-146 behavior):

    * `average`   — weighted mean over tasks of the final session's per-task
                     precision (weights default to uniform; the reference
                     uses per-task sample counts),
    * `forgetting`— mean over tasks (except the last) of
                     best-previous-session minus final-session precision.
    """
    num_sessions = len(sessions)
    last = sessions[num_sessions - 1][direction]
    final = np.array([last[t][k_index] for t in range(num_sessions)])
    if weights is None:
        w = np.ones(num_sessions)
    else:
        w = np.asarray(weights, dtype=float)[:num_sessions]
    average = float((final * w).sum() / w.sum())

    forgetting = 0.0
    count = 0
    for t in range(num_sessions - 1):
        best_prev = max(
            sessions[s][direction][t][k_index] for s in range(t, num_sessions - 1)
        )
        forgetting += best_prev - final[t]
        count += 1
    forgetting = float(forgetting / max(count, 1))
    return {"average": average, "forgetting": forgetting}
