"""Focal losses: sigmoid focal and the token-sigmoid (binary) variant.

Equivalents of `csrc/cuda/SigmoidFocalLoss_cuda.cu` via
`layers/sigmoid_focal_loss.py:20-55` and of `TokenSigmoidFocalLoss`
(binary version, `sigmoid_focal_loss.py:110-174`) which is the classification
loss of the LPI grounding path (`USE_DOT_PRODUCT_TOKEN_LOSS`). Plain jnp —
XLA fuses these; no kernel needed (SURVEY §2.4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_focal_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       gamma: float = 2.0, alpha: float = 0.25) -> jnp.ndarray:
    """Per-anchor multi-class focal loss with integer class targets.

    `logits [N, C]`, `targets [N]` in 0..C (0 = background, class c maps to
    logit column c-1 — the reference's num_classes offset,
    `SigmoidFocalLoss_cuda.cu` semantics). Returns elementwise loss [N, C].
    """
    n, c = logits.shape
    class_ids = jnp.arange(1, c + 1, dtype=targets.dtype)[None, :]
    t = (targets[:, None] == class_ids).astype(logits.dtype)
    p = jax.nn.sigmoid(logits)
    term_pos = -t * alpha * ((1 - p) ** gamma) * jnp.log(jnp.clip(p, 1e-9))
    not_ignored = (targets[:, None] >= 0).astype(logits.dtype)
    term_neg = -(1 - t) * (1 - alpha) * (p ** gamma) * jnp.log(jnp.clip(1 - p, 1e-9))
    return (term_pos + term_neg) * not_ignored


def token_sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    text_mask: jnp.ndarray | None = None,
    gamma: float = 2.0,
    alpha: float = 0.25,
) -> jnp.ndarray:
    """Binary token focal loss (`TokenSigmoidFocalLoss` version="binary").

    `logits [B, A, T]` dot-product anchor-token logits, `targets [B, A, T]`
    binary positive map, `text_mask [B, T]` valid-token mask. Elementwise
    loss; masked-out tokens contribute zero.
    """
    p = jax.nn.sigmoid(logits)
    ce = -(targets * jnp.log(jnp.clip(p, 1e-9))
           + (1 - targets) * jnp.log(jnp.clip(1 - p, 1e-9)))
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * ((1 - p_t) ** gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    if text_mask is not None:
        loss = loss * text_mask[:, None, :].astype(loss.dtype)
    return loss
