"""Sweep grounding train-step variants on the real chip (r5).

The retrieval towers gained +36% from unrolling their layer scans (the
scanned carry forces conservative remat + blocks cross-layer fusion); the
grounding step's fused Swin+BERT lockstep runs under the same kind of scan
(`fused.py`, `fused_scan_unroll=1` default). Variants here measure the
448px/b4 flagship train step over (fused_scan_unroll, deform_impl).

Usage: python scripts/sweep_grounding.py [iters]
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def measure(cfg, iters):
    from lpi_tpu.continual.grounding_learner import GroundingLearner, _split_params
    from lpi_tpu.data.bert_tokenizer import BertTokenizer
    from lpi_tpu.data.grounding import synthetic_grounding_task

    tok = BertTokenizer(max_len=cfg.bert.max_query_len)
    ds = synthetic_grounding_task(0, cfg.batch_size, cfg.image_size, tok,
                                  max_boxes=cfg.max_boxes)
    sample = next(ds.batches(cfg.batch_size))
    learner = GroundingLearner(cfg, sample_batch=sample)
    tx, step = learner._make_step(task_id=0, steps_per_epoch=10,
                                  epochs=cfg.epochs_per_task)
    pools, frozen = _split_params(learner.params)
    opt_state = tx.init(pools)
    b = {k: jnp.asarray(v) for k, v in sample.items()}

    t0 = time.perf_counter()
    pools, opt_state, metrics = step(pools, opt_state, frozen, b)
    total0 = float(metrics["total"])  # compile + real barrier
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        pools, opt_state, metrics = step(pools, opt_state, frozen, b)
    float(metrics["total"])
    dt = time.perf_counter() - t0
    return cfg.batch_size * iters / dt, dt / iters * 1e3, compile_s, total0


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    from lpi_tpu.core.config import GroundingConfig

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lpi_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    rows = []
    for unroll, impl in ((1, "pallas"), (99, "pallas"), (99, "fast")):
        base = GroundingConfig(image_size=448, batch_size=4,
                               fused_scan_unroll=unroll)
        cfg = dataclasses.replace(
            base, dyhead=dataclasses.replace(base.dyhead, deform_impl=impl))
        tag = f"unroll={unroll:2d} deform={impl:9s}"
        try:
            sps, ms, comp, loss0 = measure(cfg, iters)
            rows.append((tag, sps))
            print(f"{tag}: {sps:7.2f} samples/s  {ms:7.2f} ms/step  "
                  f"compile {comp:6.1f}s  loss0={loss0:.4f}", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {str(e)[-300:]}", flush=True)
    if rows:
        best = max(rows, key=lambda r: r[1])
        print(f"\nbest: {best[0]} -> {best[1]:.2f} samples/s")


if __name__ == "__main__":
    main()
