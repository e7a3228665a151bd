"""Batch samplers: grouped batching for shape-heterogeneous data.

Equivalent of the reference's `GroupedBatchSampler`
(`maskrcnn_benchmark/data/samplers/grouped_batch_sampler.py:1-70`, wired via
aspect-ratio group ids in `data/build.py:110-129`): every emitted batch
contains only elements sharing one group id, so a batch never mixes shapes
that would force worst-case padding.

TPU framing: the LPI recipe's fixed 448x448 restrict-resize
(`data/transforms/build.py:36-41`) makes grouping moot — every image shares
one shape. The 800/1333 multi-scale surface (`AUGMENT.MULT_MIN_SIZE_TRAIN`,
`lpi_tpu/data/transforms.py`) offers two static-shape strategies:

* pad-to-max (the `GroundingTaskSet.batches` default): ONE compiled program,
  padding waste `1 - mean(s^2)/max(s)^2` (~40% for (480..800));
* scale-grouped (`GroundingTaskSet.batches_grouped`): each batch ships at
  its own scale's exact shape — at most |scales| compiled programs, ZERO
  padding waste. This module provides the grouping.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Sequence

import numpy as np


class GroupedBatchSampler:
    """Yield batches of indices; each batch lies entirely within one group.

    Mirrors the reference sampler's contract (`grouped_batch_sampler.py`):
    elements are drawn in (shuffled) order, buffered per group, and a batch
    is emitted whenever some group reaches `batch_size`. With
    `drop_uneven=False` the leftover partial batches are emitted at the end
    (smallest-index-first), so every element appears exactly once per epoch.
    """

    def __init__(self, group_ids: Sequence[int], batch_size: int,
                 seed: int = 0, drop_uneven: bool = False):
        self.group_ids = np.asarray(group_ids)
        self.batch_size = int(batch_size)
        self.seed = seed
        self.drop_uneven = drop_uneven

    def __iter__(self) -> Iterator[List[int]]:
        order = np.random.RandomState(self.seed).permutation(len(self.group_ids))
        buffers: Dict[int, List[int]] = {}
        for idx in order:
            g = int(self.group_ids[idx])
            buf = buffers.setdefault(g, [])
            buf.append(int(idx))
            if len(buf) == self.batch_size:
                yield list(buf)
                buf.clear()
        if not self.drop_uneven:
            for g in sorted(buffers):
                if buffers[g]:
                    yield list(buffers[g])

    def __len__(self) -> int:
        if self.drop_uneven:
            _, counts = np.unique(self.group_ids, return_counts=True)
            return int(sum(c // self.batch_size for c in counts))
        return sum(1 for _ in self)


def draw_scales(num_examples: int, scales: Sequence[int],
                seed: int) -> np.ndarray:
    """Per-example multi-scale draw, matching `train_transform`'s
    `rng.choice(cfg.multi_scale)` distribution but drawn UP FRONT so batches
    can be grouped by the chosen scale before packing."""
    rng = np.random.RandomState(seed)
    return np.asarray(scales)[rng.randint(0, len(scales), size=num_examples)]


def padding_waste(scales: Sequence[int], padded: int) -> float:
    """Fraction of batch pixels that are padding under pad-to-`padded`."""
    s = np.asarray(scales, np.float64)
    return float(1.0 - np.mean(s * s) / (padded * padded))
