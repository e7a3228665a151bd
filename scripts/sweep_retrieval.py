"""Sweep retrieval train-step variants on the real chip (VERDICT r3 #4).

Variants over (attn_impl, remat policy, batch, tower_unroll). Prints a
table of samples/s + ms/step so the winning default is a measured choice.
r4 measurements (v5e, 100 iters): xla/none/b64 620.8; bf16/dots/b64 709.8;
bf16/dots_nb/b64 762.6; flash attention 330.2 (deleted); bf16-LN 761.8 (no
win, reverted); b96/b128 all lose per-sample.
r5 measurements (v5e, 50 iters): bf16/dots_nb/u1 760.1; bf16/none/u1 618.0
(scan forces whole-block remat); bf16/dots_nb/u12 985.4; bf16/none/u12
1037.7 (the default: unrolled towers + no remat).

Usage: python scripts/sweep_retrieval.py [iters]
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def measure(cfg, batch, iters):
    from lpi_tpu.continual.learner import RetrievalLearner, _split_params

    cfg = dataclasses.replace(cfg, batch_size=batch)
    rng = np.random.RandomState(0)
    images = rng.randn(batch, 224, 224, 3).astype(np.float32)
    ids = rng.randint(1, 49000, size=(batch, 77)).astype(np.int32)
    ids[:, 0] = 49406
    ids[:, -1] = 49407

    learner = RetrievalLearner(cfg)
    tx, step = learner._make_train_step(task_id=0, steps_per_epoch=100,
                                        epochs=cfg.epochs)
    pools, frozen = _split_params(learner.params)
    opt_state = tx.init(pools)
    b = {"images": jnp.asarray(images), "token_ids": jnp.asarray(ids)}

    pools, opt_state, metrics = step(pools, opt_state, frozen, b)
    total0 = float(metrics["total"])  # compile + real barrier (host fetch)
    t0 = time.perf_counter()
    for _ in range(iters):
        pools, opt_state, metrics = step(pools, opt_state, frozen, b)
    float(metrics["total"])
    dt = time.perf_counter() - t0
    return batch * iters / dt, dt / iters * 1e3, total0


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from lpi_tpu.core.config import RetrievalConfig

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lpi_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    base = RetrievalConfig()
    rows = []
    # r5 variants: 'none' was only ever measured with xla/f32 attention
    # (620.8); with bf16 score residuals the no-remat memory may now fit —
    # and tower_unroll tests cross-layer fusion vs program size.
    for attn, remat, batch, unroll in (
            ("bf16", "dots_nb", 64, 1), ("bf16", "none", 64, 1),
            ("bf16", "dots_nb", 64, 12), ("bf16", "none", 64, 12)):
        cfg = dataclasses.replace(
            base, clip=dataclasses.replace(base.clip, attn_impl=attn,
                                           remat=remat, tower_unroll=unroll))
        tag = f"attn={attn:5s} remat={remat:7s} b={batch:3d} u={unroll:2d}"
        try:
            sps, ms, loss0 = measure(cfg, batch, iters)
            rows.append((tag, sps))
            print(f"{tag}: {sps:8.1f} samples/s  {ms:7.2f} ms/step  "
                  f"loss0={loss0:.4f}", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {str(e)[-200:]}", flush=True)
    if rows:
        best = max(rows, key=lambda r: r[1])
        print(f"\nbest: {best[0]} -> {best[1]:.1f} samples/s")


if __name__ == "__main__":
    main()
