"""Diagnose the retrieval backward anomaly (r4): fwd 35 ms but step 103 ms.

For prompts-only training the activation-grad backward should cost ~1 fwd.
Hypotheses: (a) frozen-weight grads are not pruned; (b) XLA is silently
rematerializing under HBM pressure (b96 OOMs -> b64 is near the limit);
(c) attention backward inefficiency.

Times: grad wrt pools only / grad wrt ALL params / pools-grad with explicit
block remat. If all-params ~= pools, dW is not pruned. If remat ~= default,
XLA was already recomputing.

Usage: python scripts/diag_backward.py [batch]
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lpi_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import dataclasses

    from lpi_tpu.core.config import RetrievalConfig
    from lpi_tpu.continual.learner import (RetrievalLearner, _merge_params,
                                           _split_params)

    cfg = dataclasses.replace(RetrievalConfig(), batch_size=batch)
    rng = np.random.RandomState(0)
    images = rng.randn(batch, 224, 224, 3).astype(np.float32)
    ids = rng.randint(1, 49000, size=(batch, 77)).astype(np.int32)
    ids[:, 0] = 49406
    ids[:, -1] = 49407

    learner = RetrievalLearner(cfg)
    pools, frozen = _split_params(learner.params)
    b = {"images": jnp.asarray(images), "token_ids": jnp.asarray(ids)}

    def timeit(fn, *args, iters=20):
        out = fn(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[-1]))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[-1]))
        return (time.perf_counter() - t0) / iters

    def loss_pools(p, f):
        return learner._losses(p, f, b, 0)[0]

    g_pools = jax.jit(jax.grad(loss_pools))
    dt = timeit(g_pools, pools, frozen)
    print(f"grad wrt pools:        {dt*1e3:8.2f} ms", flush=True)

    def loss_all(params):
        p, f = _split_params(params)
        return learner._losses(p, f, b, 0)[0]

    g_all = jax.jit(jax.grad(loss_all))
    dt = timeit(g_all, _merge_params(pools, frozen))
    print(f"grad wrt ALL params:   {dt*1e3:8.2f} ms", flush=True)

    # value only (fwd with no residual saving)
    v_only = jax.jit(loss_pools)
    dt = timeit(v_only, pools, frozen)
    print(f"loss fwd only:         {dt*1e3:8.2f} ms", flush=True)

    # pools grad with explicit remat of the whole model apply
    def loss_remat(p, f):
        def inner(p_):
            return learner._losses(p_, f, b, 0)[0]
        return jax.checkpoint(inner)(p)

    g_remat = jax.jit(jax.grad(loss_remat))
    dt = timeit(g_remat, pools, frozen)
    print(f"pools grad, full remat:{dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
