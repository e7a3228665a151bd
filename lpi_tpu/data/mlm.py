"""MLM caption masking (`random_word`, `generalized_vl_rcnn.py:34-69`).

GLIP's optional masked-language-modeling loss masks caption tokens with the
BERT 15% policy (80% [MASK] / 10% random / 10% keep) and -100 elsewhere.
The MLM loss is off in every LPI config (`MLM_LOSS: False`), but the
masking capability ships for parity. Host-side numpy, deterministic under a
seeded RandomState.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

IGNORE_INDEX = -100


def random_word(
    input_ids: np.ndarray,
    rng: np.random.RandomState,
    mask_token_id: int,
    vocab_size: int,
    special_ids: Tuple[int, ...] = (0, 101, 102),
    mlm_probability: float = 0.15,
) -> Tuple[np.ndarray, np.ndarray]:
    """-> (masked input_ids, labels) with labels = original id at masked
    positions and IGNORE_INDEX elsewhere."""
    input_ids = np.asarray(input_ids)
    masked = input_ids.copy()
    labels = np.full_like(input_ids, IGNORE_INDEX)
    candidates = ~np.isin(input_ids, special_ids)
    probs = rng.rand(*input_ids.shape)
    selected = candidates & (probs < mlm_probability)
    labels[selected] = input_ids[selected]

    action = rng.rand(*input_ids.shape)
    to_mask = selected & (action < 0.8)
    to_random = selected & (action >= 0.8) & (action < 0.9)
    masked[to_mask] = mask_token_id
    masked[to_random] = rng.randint(0, vocab_size, size=int(to_random.sum()))
    return masked, labels
