"""Contrastive losses for the LPI mechanism.

Functional equivalents of the reference's `retrieval/loss/loss.py` (identical
copy at `retrieval/matrix/matrix.py` / `grounding/matrix/matrix.py`):

* `clip_loss`          — symmetric InfoNCE over a logits matrix
                         (`loss.py:36-87` ClipLoss.forward).
* `global_clip_loss`   — the TPU-first version: per-shard features, logits
                         computed against the all-gathered other tower, labels
                         offset by shard — the reference's dormant
                         `local_loss` DDP path (`loss.py:62-73`) made real.
* `nt_bxent_loss`      — multi-positive sigmoid contrastive loss
                         (`loss.py:6-33`), including the reference's
                         double-sigmoid behavior (BCE-with-logits applied to
                         an already-sigmoided input) reproduced exactly.
* `alignment_loss`     — cross-modal prompt alignment (`slinet.py:144-159`).
* `task_prompt_loss`   — inter-task contrastive loss over flattened prompt
                         pools (`slinet.py:167-183`).

All functions are pure jnp and fuse under jit; none require Pallas.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _softmax_xent(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean cross-entropy with integer labels (float32 accumulate)."""
    logits = logits.astype(jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(logz - picked)


def clip_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """Symmetric CE over a square similarity matrix, diagonal positives.

    Matches ClipLoss.forward (`retrieval/loss/loss.py:75-87`).
    """
    n = logits.shape[0]
    labels = jnp.arange(n, dtype=jnp.int32)
    return 0.5 * (_softmax_xent(logits, labels) + _softmax_xent(logits.T, labels))


def global_clip_loss(
    image_features: jnp.ndarray,
    text_features: jnp.ndarray,
    logit_scale: jnp.ndarray,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Batch-global InfoNCE with features sharded over `axis_name`.

    Inside `shard_map`/pjit over a data axis, each shard holds
    `[local_b, d]` features. The other tower's features are all-gathered over
    ICI, local logits `[local_b, global_b]` are built, and labels are offset
    by `shard * local_b` — the reference's `local_loss` formulation
    (`retrieval/loss/loss.py:62-73`) which it never actually exercises.

    Outside any mapped axis (axis_name=None) this reduces to the plain
    full-matrix loss.
    """
    if axis_name is None:
        logits = logit_scale * image_features @ text_features.T
        return clip_loss(logits)

    local_b = image_features.shape[0]
    idx = jax.lax.axis_index(axis_name)
    all_text = jax.lax.all_gather(text_features, axis_name, tiled=False)
    all_text = all_text.reshape(-1, text_features.shape[-1])
    all_image = jax.lax.all_gather(image_features, axis_name, tiled=False)
    all_image = all_image.reshape(-1, image_features.shape[-1])

    labels = jnp.arange(local_b, dtype=jnp.int32) + idx * local_b
    logits_i = logit_scale * image_features @ all_text.T  # [lb, B]
    logits_t = logit_scale * text_features @ all_image.T  # [lb, B]
    loss = 0.5 * (_softmax_xent(logits_i, labels) + _softmax_xent(logits_t, labels))
    # mean over shards == global batch mean (equal shard sizes)
    return jax.lax.pmean(loss, axis_name)


def _bce_with_logits(z: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Elementwise BCEWithLogits: max(z,0) - z*t + log1p(exp(-|z|))."""
    return jnp.maximum(z, 0.0) - z * t + jnp.log1p(jnp.exp(-jnp.abs(z)))


def nt_bxent_loss(
    x: jnp.ndarray, target: jnp.ndarray, temperature: float = 1.0
) -> jnp.ndarray:
    """Multi-positive sigmoid contrastive loss over row vectors.

    Faithful to `retrieval/loss/loss.py:6-33` including its quirk: the row
    cosine-similarity matrix is divided by temperature, *sigmoided*, and the
    result is then fed to BCE-with-logits (a second implicit sigmoid). The
    diagonal is forced to +inf before the first sigmoid so it contributes
    sigmoid(inf)=1. Row sums are normalized by per-row positive/negative
    counts and averaged.
    """
    x = x.astype(jnp.float32)
    target = target.astype(jnp.float32)
    n = x.shape[0]
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    # torch cosine_similarity clamps the denominator at eps=1e-8
    xn = x / jnp.maximum(norm, 1e-8)
    xcs = xn @ xn.T
    eye = jnp.eye(n, dtype=bool)
    xcs = jnp.where(eye, jnp.inf, xcs)

    z = jax.nn.sigmoid(xcs / temperature)  # reference's double-sigmoid input
    loss = _bce_with_logits(z, target)

    pos = target > 0
    loss_pos = jnp.sum(jnp.where(pos, loss, 0.0), axis=1)
    loss_neg = jnp.sum(jnp.where(pos, 0.0, loss), axis=1)
    num_pos = jnp.sum(target, axis=1)
    num_neg = n - num_pos
    return jnp.mean(loss_pos / num_pos + loss_neg / num_neg)


def alignment_loss(
    visual_prompt: jnp.ndarray,
    textual_prompt: jnp.ndarray,
    temperature: float = 0.01,
) -> jnp.ndarray:
    """Cross-modal prompt alignment (`retrieval/models/slinet.py:144-159`).

    Prompts `[layers, tokens, dim]` are mean-pooled over the channel dim to
    `[layers, tokens]`, scaled by 1/T, and the layer-by-layer similarity
    matrix `[layers, layers]` gets a symmetric InfoNCE with diagonal
    positives. Returns the *unweighted* loss; callers apply the 0.1 weight.
    """
    v = jnp.mean(visual_prompt.astype(jnp.float32), axis=-1) / temperature
    t = jnp.mean(textual_prompt.astype(jnp.float32), axis=-1) / temperature
    return clip_loss(v @ t.T)


def task_prompt_loss(
    visual_stack: jnp.ndarray,
    textual_stack: jnp.ndarray,
    task_relation: jnp.ndarray,
    temperature: float = 0.001,
) -> jnp.ndarray:
    """Inter-task contrastive loss (`retrieval/models/slinet.py:167-183`).

    `visual_stack`/`textual_stack` are `[tasks_seen, layers*tokens*dim]`
    flattened prompts of every session trained so far; `task_relation` is the
    binary matrix from thresholded task-name-embedding cosine similarity
    (`MID/task_sim_matrix.txt` > 0.4). Averages the visual and textual
    nt_bxent terms.
    """
    return 0.5 * (
        nt_bxent_loss(visual_stack, task_relation, temperature)
        + nt_bxent_loss(textual_stack, task_relation, temperature)
    )


def nt_bxent_loss_masked(
    x: jnp.ndarray, target: jnp.ndarray, valid: jnp.ndarray,
    temperature: float = 1.0
) -> jnp.ndarray:
    """`nt_bxent_loss` over the `valid` row/column subset, static shapes.

    Equals `nt_bxent_loss(x[:s], target[:s, :s], T)` when `valid` marks the
    first s rows — the form the train step needs when the number of seen
    tasks is a TRACED value (so one compiled step serves all 12 sessions)
    instead of a shape.
    """
    x = x.astype(jnp.float32)
    target = target.astype(jnp.float32)
    n = x.shape[0]
    valid = valid.astype(bool)
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    xn = x / jnp.maximum(norm, 1e-8)
    xcs = xn @ xn.T
    eye = jnp.eye(n, dtype=bool)
    xcs = jnp.where(eye, jnp.inf, xcs)

    z = jax.nn.sigmoid(xcs / temperature)
    loss = _bce_with_logits(z, target)

    vcol = valid[None, :]
    pos = (target > 0) & vcol
    neg = (target <= 0) & vcol
    loss_pos = jnp.sum(jnp.where(pos, loss, 0.0), axis=1)
    loss_neg = jnp.sum(jnp.where(neg, loss, 0.0), axis=1)
    num_pos = jnp.sum(jnp.where(vcol, target, 0.0), axis=1)
    num_neg = jnp.sum(neg, axis=1)
    row = (loss_pos / jnp.maximum(num_pos, 1.0)
           + loss_neg / jnp.maximum(num_neg, 1.0))
    return jnp.sum(jnp.where(valid, row, 0.0)) / jnp.maximum(valid.sum(), 1)


def task_prompt_loss_masked(
    visual_stack: jnp.ndarray,
    textual_stack: jnp.ndarray,
    task_relation: jnp.ndarray,
    task_id,
    temperature: float = 0.001,
) -> jnp.ndarray:
    """`task_prompt_loss` with the seen-task count traced: tasks 0..task_id
    participate; returns 0 at task_id == 0 (the reference only adds the loss
    from session 2 on, `slinet.py:160-162`)."""
    n = visual_stack.shape[0]
    valid = jnp.arange(n) <= task_id
    loss = 0.5 * (
        nt_bxent_loss_masked(visual_stack, task_relation, valid, temperature)
        + nt_bxent_loss_masked(textual_stack, task_relation, valid, temperature)
    )
    return jnp.where(task_id >= 1, loss, 0.0)


def info_nce(
    query: jnp.ndarray,
    positive_key: jnp.ndarray,
    temperature: float = 0.1,
) -> jnp.ndarray:
    """Unit-normalized InfoNCE with in-batch negatives (`slinet.py:238-293`)."""
    q = query / jnp.linalg.norm(query, axis=-1, keepdims=True)
    k = positive_key / jnp.linalg.norm(positive_key, axis=-1, keepdims=True)
    logits = q @ k.T / temperature
    labels = jnp.arange(q.shape[0], dtype=jnp.int32)
    return _softmax_xent(logits, labels)
