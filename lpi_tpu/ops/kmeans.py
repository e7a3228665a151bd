"""Deterministic KMeans on device (jit-compatible, static shapes).

Replaces the reference's host-side `sklearn.cluster.KMeans(n_clusters=5,
random_state=0)` for task-key clustering (`retrieval/methods/sprompt.py:394`,
`grounding/.../generalized_vl_rcnn.py:456-472`). k-means++ seeding, fixed
Lloyd iterations, multiple restarts picked by inertia. Runs entirely in XLA
so features never leave HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _plusplus_init(key, x: jnp.ndarray, k: int) -> jnp.ndarray:
    """k-means++ seeding. x [N, D] -> centers [k, D]."""
    n = x.shape[0]
    key, sub = jax.random.split(key)
    first = x[jax.random.randint(sub, (), 0, n)]
    centers = jnp.zeros((k, x.shape[1]), x.dtype).at[0].set(first)

    def body(i, carry):
        centers, key = carry
        d2 = jnp.min(
            jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
            + jnp.where(jnp.arange(k)[None, :] < i, 0.0, jnp.inf),
            axis=1,
        )
        key, sub = jax.random.split(key)
        # sample proportional to squared distance (gumbel-max over log d2)
        logits = jnp.log(jnp.maximum(d2, 1e-12))
        idx = jnp.argmax(logits + jax.random.gumbel(sub, (n,)))
        return centers.at[i].set(x[idx]), key

    centers, _ = jax.lax.fori_loop(1, k, body, (centers, key))
    return centers


def _lloyd(x: jnp.ndarray, centers: jnp.ndarray, iters: int):
    k = centers.shape[0]

    def step(_, centers):
        d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
        assign = jnp.argmin(d2, axis=1)  # [N]
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)  # [N, k]
        counts = jnp.sum(onehot, axis=0)  # [k]
        # full-precision mean: centers of near-collapsed features must not
        # absorb bf16-pass rounding (task-ID decision path)
        sums = jnp.matmul(onehot.T, x, precision=jax.lax.Precision.HIGHEST)
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        # keep old center for empty clusters
        return jnp.where(counts[:, None] > 0, new, centers)

    centers = jax.lax.fori_loop(0, iters, step, centers)
    d2 = jnp.sum((x[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    inertia = jnp.sum(jnp.min(d2, axis=1))
    return centers, inertia


@partial(jax.jit, static_argnames=("k", "iters", "restarts"))
def kmeans(key, x: jnp.ndarray, k: int = 5, iters: int = 50, restarts: int = 4):
    """Cluster x [N, D] into k centers. Returns (centers [k, D], inertia)."""
    x = x.astype(jnp.float32)
    keys = jax.random.split(key, restarts)
    inits = jax.vmap(lambda kk: _plusplus_init(kk, x, k))(keys)
    centers, inertias = jax.vmap(lambda c: _lloyd(x, c, iters))(inits)
    best = jnp.argmin(inertias)
    return centers[best], inertias[best]
