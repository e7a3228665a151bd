"""Headline benchmark: LPI retrieval training throughput on one TPU chip.

Measures the full flagship train step — CLIP ViT-B/16 dual-tower forward with
rank-4 DecomposedPrompt injection (the paper config: 16 prompt tokens, depth
9), batch-global InfoNCE + alignment loss, backward w.r.t. the prompt pools,
masked SGD update — at the reference recipe's batch size 64
(`retrieval/configs/lpi/coco_lpi.json`), bf16 compute.

Prints ONE JSON line:
  {"metric": "retrieval_train_samples_per_sec_per_chip", "value": N,
   "unit": "samples/s", "vs_baseline": R}

`vs_baseline` compares against REFERENCE_SAMPLES_PER_SEC — an estimate of the
PyTorch reference's single-GPU fp16 training throughput for the same model
shape (the repo publishes no throughput; see BASELINE.md). The driver's
north-star is >=5x at the chip level.
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_SAMPLES_PER_SEC = 300.0  # estimated torch fp16 A100 train throughput


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from flax import traverse_util

    from lpi_tpu.core.config import RetrievalConfig
    from lpi_tpu.continual.learner import RetrievalLearner
    from lpi_tpu.data.retrieval import RetrievalTrainSet

    cfg = RetrievalConfig()  # full ViT-B/16 + LPI prompts, batch 64
    batch = cfg.batch_size
    rng = np.random.RandomState(0)
    images = rng.randn(batch, 224, 224, 3).astype(np.float32)
    ids = rng.randint(1, 49000, size=(batch, 77)).astype(np.int32)
    ids[:, 0] = 49406
    ids[:, -1] = 49407

    learner = RetrievalLearner(cfg)
    tx, step = learner._make_train_step(task_id=0, steps_per_epoch=100, epochs=cfg.epochs)
    from lpi_tpu.continual.learner import _split_params

    pools, frozen = _split_params(learner.params)
    opt_state = tx.init(pools)
    b = {"images": jnp.asarray(images), "token_ids": jnp.asarray(ids)}

    # warmup/compile (fetch the value: on the remote-tunnel platform
    # block_until_ready returns early, a host fetch is the real barrier)
    pools, opt_state, metrics = step(pools, opt_state, frozen, b)
    float(metrics["total"])

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        pools, opt_state, metrics = step(pools, opt_state, frozen, b)
    float(metrics["total"])  # forces the whole dependent chain
    dt = time.perf_counter() - t0

    samples_per_sec = batch * iters / dt
    print(json.dumps({
        "metric": "retrieval_train_samples_per_sec_per_chip",
        "value": round(samples_per_sec, 2),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / REFERENCE_SAMPLES_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
