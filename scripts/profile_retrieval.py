"""Profile the retrieval train step on the real chip (VERDICT r3 #4).

Segments the 107 ms step to find the MFU gap:
  1. bench-identical loop (host lr scalar each step)
  2. device-resident lr (no per-step host->device transfer)
  3. forward-only loss, visual-only, text-only
  4. XLA cost analysis of the compiled step

Usage: python scripts/profile_retrieval.py [batch]
"""
import sys
sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    from lpi_tpu.core.config import RetrievalConfig
    from lpi_tpu.continual.learner import RetrievalLearner, _split_params

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lpi_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import dataclasses
    cfg = dataclasses.replace(RetrievalConfig(), batch_size=batch)
    rng = np.random.RandomState(0)
    images = rng.randn(batch, 224, 224, 3).astype(np.float32)
    ids = rng.randint(1, 49000, size=(batch, 77)).astype(np.int32)
    ids[:, 0] = 49406
    ids[:, -1] = 49407

    learner = RetrievalLearner(cfg)
    tx, step = learner._make_train_step(task_id=0, steps_per_epoch=100,
                                        epochs=cfg.epochs)
    pools, frozen = _split_params(learner.params)
    # the jitted step DONATES the pool buffers; keep an undonated copy for
    # the forward-only segments below (learner.params aliases the originals)
    params = jax.tree.map(lambda x: jnp.array(x), learner.params)
    opt_state = tx.init(pools)
    b = {"images": jnp.asarray(images), "token_ids": jnp.asarray(ids)}

    def timeit(fn, iters=20, warmup=1):
        for _ in range(warmup):
            out = fn()
        jax.block_until_ready(out)
        _fetch(out)
        t0 = time.perf_counter()
        outs = None
        for _ in range(iters):
            outs = fn()
        _fetch(outs)
        return (time.perf_counter() - t0) / iters

    def _fetch(out):
        leaves = jax.tree_util.tree_leaves(out)
        if leaves:
            np.asarray(jax.device_get(leaves[-1]))

    # 1. bench-identical
    state = {"p": pools, "o": opt_state}

    def bench_step():
        p, o, m = step(state["p"], state["o"], frozen, b)
        state["p"], state["o"] = p, o
        return m["total"]

    dt1 = timeit(bench_step)
    print(f"bench-identical step: {dt1*1e3:8.2f} ms  {batch/dt1:8.1f} samples/s")

    # 2. device-resident lr (jitted step called directly, constant lr array)
    jitted = learner._jitted_step()
    tid = jnp.int32(0)
    lr_dev = jnp.float32(0.002)
    state2 = {"p": state["p"], "o": state["o"]}

    def dev_lr_step():
        p, o, m = jitted(state2["p"], state2["o"], frozen, b, tid, lr_dev)
        state2["p"], state2["o"] = p, o
        return m["total"]

    dt2 = timeit(dev_lr_step)
    print(f"device-lr step:       {dt2*1e3:8.2f} ms  {batch/dt2:8.1f} samples/s")

    # 3. forward-only segments
    model = learner.model

    fwd = jax.jit(lambda p, img, tok: model.apply({"params": p}, img, tok, 0))
    dt3 = timeit(lambda: fwd(params, b["images"], b["token_ids"])[0])
    print(f"full forward:         {dt3*1e3:8.2f} ms")

    vis = jax.jit(lambda p, img: model.apply(
        {"params": p}, img, jnp.zeros((batch,), jnp.int32),
        method=lambda m, i, t: m.clip.encode_image(
            i, m.prompts(0)[0], m.cfg.lpi.injection_depth)))
    dt4 = timeit(lambda: vis(params, b["images"]))
    print(f"visual fwd (prompted):{dt4*1e3:8.2f} ms")

    txt = jax.jit(lambda p, tok: model.apply(
        {"params": p}, tok,
        method=lambda m, t: m.clip.encode_text(
            t, ctx=m.prompts(0)[1][0], prompt=m.prompts(0)[1],
            injection_depth=m.cfg.lpi.injection_depth)))
    dt5 = timeit(lambda: txt(params, b["token_ids"]))
    print(f"text fwd (prompted):  {dt5*1e3:8.2f} ms")

    # 4. cost analysis
    lowered = jitted.lower(state2["p"], state2["o"], frozen, b, tid, lr_dev)
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0] if cost else {}
    flops = float(cost.get("flops", 0))
    bytes_acc = float(cost.get("bytes accessed", 0))
    print(f"XLA flops/step: {flops/1e9:.1f} G   bytes: {bytes_acc/1e9:.2f} GB")
    print(f"at measured dt2: {flops/dt2/1e12:.1f} TFLOP/s, "
          f"{bytes_acc/dt2/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
