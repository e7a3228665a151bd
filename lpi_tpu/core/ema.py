"""Exponential moving average of a parameter pytree.

Equivalent of the reference's `utils/ema.py` ModelEma (deepcopy + per-step
decay 0.9999; disabled in LPI configs via MODEL_EMA 0.0) as a pure functional
update, jit-safe.
"""

from __future__ import annotations

import jax


def init_ema(params):
    return jax.tree.map(lambda x: x, params)


def update_ema(ema, params, decay: float = 0.9999):
    return jax.tree.map(lambda e, p: e * decay + (1.0 - decay) * p, ema, params)
