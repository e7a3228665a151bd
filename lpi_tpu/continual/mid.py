"""Task-similarity (MID) machinery.

The reference precomputes a 12x12 cosine-similarity matrix of OpenAI
`text-embedding-3-large` embeddings of the 12 COCO supercategory names
(`grounding/test/task_sim_matrix.py:1-24`), ships it as
`MID/task_sim_matrix.txt`, and re-reads + thresholds it at 0.4 EVERY training
step (`retrieval/models/slinet.py:171` — a known perf sink). Here the matrix
is loaded once, and the generation path (embeddings -> cosine -> threshold)
is a pure function so any embedding source works offline.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

# 12 COCO supercategories in task order — the grounding half's mapping
# (`modulated_coco.py:277`): name -> task index.
SUPERCATEGORY_TO_TASK = {
    "appliance": 0, "sports": 1, "outdoor": 2, "electronic": 3,
    "accessory": 4, "indoor": 5, "kitchen": 6, "furniture": 7,
    "vehicle": 8, "food": 9, "animal": 10, "person": 11,
}
TASK_NAMES = tuple(
    name for name, _ in sorted(SUPERCATEGORY_TO_TASK.items(), key=lambda kv: kv[1])
)


def cosine_similarity_matrix(embeddings: np.ndarray) -> np.ndarray:
    """[T, D] embeddings -> [T, T] cosine matrix (task_sim_matrix.py math)."""
    e = np.asarray(embeddings, np.float64)
    e = e / np.linalg.norm(e, axis=-1, keepdims=True)
    return e @ e.T


def load_task_sim_matrix(path: str, num_tasks: Optional[int] = None) -> np.ndarray:
    """Read a whitespace-separated similarity matrix (MID/task_sim_matrix.txt
    format)."""
    m = np.loadtxt(path)
    if num_tasks is not None:
        m = m[:num_tasks, :num_tasks]
    return m


def task_relation(sim_matrix: np.ndarray, threshold: float = 0.4) -> np.ndarray:
    """Binary task-relation matrix (`slinet.py:173-174`)."""
    return (np.asarray(sim_matrix) > threshold).astype(np.float32)


def fallback_sim_matrix(num_tasks: int, names: Sequence[str] = TASK_NAMES,
                        seed: int = 0) -> np.ndarray:
    """Deterministic stand-in when no embedding service is reachable: bag-of-
    character-bigram embeddings of the task names. Only the thresholded
    binary structure matters downstream; with english supercategory names
    this yields identity-dominant relations like the real matrix."""
    names = list(names)[:num_tasks]
    vocab = {}
    rows = []
    for name in names:
        grams = [name[i : i + 2] for i in range(len(name) - 1)]
        for g in grams:
            vocab.setdefault(g, len(vocab))
        rows.append(grams)
    embs = np.zeros((len(names), max(len(vocab), 1)))
    for i, grams in enumerate(rows):
        for g in grams:
            embs[i, vocab[g]] += 1.0
    return cosine_similarity_matrix(embs)
