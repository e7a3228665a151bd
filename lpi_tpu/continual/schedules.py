"""LR schedules matching the reference solver's semantics.

TPU-native equivalents of `maskrcnn_benchmark/solver/lr_scheduler.py`:

* `warmup_multistep`  — WarmupMultiStepLR (`lr_scheduler.py:11-54`):
  constant/linear warmup to `warmup_iters`, then `gamma ** #milestones<=t`.
* `warmup_cosine`     — WarmupCosineAnnealingLR (`lr_scheduler.py:56-103`):
  warmup then `eta_min + (lr-eta_min) * (1+cos(pi*(t-warmup)/max_iters))/2`
  (note the reference divides by max_iters, not max_iters-warmup — kept).
* `WarmupReduceLROnPlateau` — (`lr_scheduler.py:104-165`): warmup then
  torch ReduceLROnPlateau(mode='max', factor=gamma, patience). Plateau
  decisions depend on observed metrics, so this one is a host-side object;
  drive a jitted step via `optax.inject_hyperparams` with its `.lr`.

All step-indexed schedules are pure `step -> lr` functions usable directly
as optax learning rates.

The per-epoch cosine used by the LPI recipe itself lives in
`continual/common.py:epoch_cosine` (torch CosineAnnealingLR semantics).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _warmup_factor(step, warmup_factor: float, warmup_iters: int,
                   warmup_method: str):
    if warmup_method == "constant":
        wf = warmup_factor
    elif warmup_method == "linear":
        alpha = step / max(warmup_iters, 1)
        wf = warmup_factor * (1 - alpha) + alpha
    else:
        raise ValueError(f"warmup_method must be constant|linear, got {warmup_method!r}")
    return jnp.where(step < warmup_iters, wf, 1.0)


def warmup_multistep(base_lr: float, milestones: Sequence[int],
                     gamma: float = 0.1, warmup_factor: float = 1.0 / 3,
                     warmup_iters: int = 500, warmup_method: str = "linear"):
    """`lr_scheduler.py:40-54`: lr = base * warmup * gamma^bisect_right(milestones, t)."""
    if list(milestones) != sorted(milestones):
        raise ValueError(f"milestones must be increasing, got {milestones}")
    ms = jnp.asarray(np.asarray(milestones, np.int32))

    def schedule(step):
        wf = _warmup_factor(step, warmup_factor, warmup_iters, warmup_method)
        decays = jnp.sum(step >= ms)  # == bisect_right(milestones, step)
        return base_lr * wf * gamma ** decays

    return schedule


def warmup_cosine(base_lr: float, max_iters: int,
                  warmup_factor: float = 1.0 / 3, warmup_iters: int = 500,
                  warmup_method: str = "linear", eta_min: float = 0.0):
    """`lr_scheduler.py:83-103`."""

    def schedule(step):
        wf = _warmup_factor(step, warmup_factor, warmup_iters, warmup_method)
        cos = eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * (step - warmup_iters) / max_iters))
        return jnp.where(step < warmup_iters, base_lr * wf, cos)

    return schedule


class WarmupReduceLROnPlateau:
    """`lr_scheduler.py:104-165`: linear/constant warmup, then torch
    ReduceLROnPlateau(mode='max', threshold_mode='rel') on a metric the
    caller reports. Call `step(metric)` once per scheduling point and read
    `.lr` (feed it to the optimizer via `optax.inject_hyperparams`)."""

    def __init__(self, base_lr: float, gamma: float = 0.1,
                 warmup_factor: float = 1.0 / 3, warmup_iters: int = 500,
                 warmup_method: str = "linear", eta_min: float = 0.0,
                 patience: int = 5, threshold: float = 1e-4):
        if warmup_method not in ("constant", "linear"):
            raise ValueError(f"warmup_method must be constant|linear, got {warmup_method!r}")
        self.base_lr = base_lr
        self.gamma = gamma
        self.warmup_factor = warmup_factor
        self.warmup_iters = warmup_iters
        self.warmup_method = warmup_method
        self.eta_min = eta_min
        self.patience = patience
        self.threshold = threshold
        self.last_epoch = 0
        self.best = -float("inf")
        self.num_bad = 0
        self.lr = base_lr * (warmup_factor if warmup_iters > 0 else 1.0)

    def step(self, metric=None) -> float:
        if self.last_epoch < self.warmup_iters:
            if self.warmup_method == "constant":
                wf = self.warmup_factor
            else:
                alpha = self.last_epoch / self.warmup_iters
                wf = self.warmup_factor * (1 - alpha) + alpha
            if self.last_epoch >= self.warmup_iters - 1:
                wf = 1.0  # reference quirk: final warmup step jumps to 1
            self.lr = self.base_lr * wf
            self.last_epoch += 1
        elif metric:
            # torch ReduceLROnPlateau mode='max', threshold_mode='rel'.
            # Truthiness (not `is not None`) matches the reference's
            # `elif metrics:` (`solver/lr_scheduler.py`): a metric of
            # exactly 0.0 is ignored and does not advance plateau state.
            if metric > self.best * (1.0 + self.threshold):
                self.best = metric
                self.num_bad = 0
            else:
                self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.gamma, self.eta_min)
                self.num_bad = 0
        return self.lr
