"""Apportion the grounding train step (448px, b4) across its subsystems.

Times the FULL jitted train step under config ablations and diffs:
  * default (pallas deform, fp32 product maps)
  * deform_dtype=bfloat16 (halved product-map stream)
  * use_dfconv=False (plain 3x3 convs) -> the deform machinery's in-context
    cost is the delta vs default
  * num_convs=0 (no DyHead tower)    -> the whole tower's cost
Each ablation is a separate compile; per-call tunnel overhead (~0.5-4 ms)
is amortized over `ITERS` dependent steps and is <3% of a ~100 ms step.

Usage: python scripts/profile_grounding.py
"""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 20


def step_time(cfg, label):
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
    float(metrics["total"])
    compile_s = time.perf_counter() - t0
    for _ in range(3):
        pools, opt_state, metrics = step(pools, opt_state, frozen, b)
    float(metrics["total"])
    t0 = time.perf_counter()
    for _ in range(ITERS):
        pools, opt_state, metrics = step(pools, opt_state, frozen, b)
    float(metrics["total"])
    dt = (time.perf_counter() - t0) / ITERS
    sps = cfg.batch_size / dt
    print(f"{label:34s}: {dt*1e3:7.1f} ms/step  {sps:6.1f} samples/s"
          f"  (compile {compile_s:.0f}s)", flush=True)
    return dt


if __name__ == "__main__":
    from lpi_tpu.core.config import GroundingConfig

    base = GroundingConfig(image_size=448, batch_size=4)
    t_def = step_time(base, "default (pallas fp32)")
    t_bf16 = step_time(
        dataclasses.replace(base, dyhead=dataclasses.replace(
            base.dyhead, deform_dtype="bfloat16")),
        "deform_dtype=bf16")
    t_plain = step_time(
        dataclasses.replace(base, dyhead=dataclasses.replace(
            base.dyhead, use_dfconv=False)),
        "use_dfconv=False (plain conv)")
    t_notower = step_time(
        dataclasses.replace(base, dyhead=dataclasses.replace(
            base.dyhead, num_convs=0)),
        "num_convs=0 (no tower)")
    print(f"deform machinery delta : {(t_def - t_plain)*1e3:7.1f} ms")
    print(f"tower total            : {(t_def - t_notower)*1e3:7.1f} ms")
    print(f"everything else        : {t_notower*1e3:7.1f} ms")
