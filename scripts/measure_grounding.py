"""Time the default grounding train step (448px/b4) on the real chip.

Single-config version of profile_grounding.py for quick re-measurement
after a deform-path change. Usage: python scripts/measure_grounding.py
[iters] [--honest] (--honest randomizes the offset convs to ~+-1-2 px
like bench.py's honest leg).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    honest = "--honest" in sys.argv
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lpi_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from lpi_tpu.core.config import GroundingConfig
    from lpi_tpu.continual.grounding_learner import GroundingLearner, _split_params
    from lpi_tpu.data.bert_tokenizer import BertTokenizer
    from lpi_tpu.data.grounding import synthetic_grounding_task

    cfg = GroundingConfig(image_size=448, batch_size=4)
    tok = BertTokenizer(max_len=cfg.bert.max_query_len)
    ds = synthetic_grounding_task(0, cfg.batch_size, cfg.image_size, tok,
                                  max_boxes=cfg.max_boxes)
    sample = next(ds.batches(cfg.batch_size))
    learner = GroundingLearner(cfg, sample_batch=sample)
    tx, step = learner._make_step(task_id=0, steps_per_epoch=10,
                                  epochs=cfg.epochs_per_task)
    pools, frozen = _split_params(learner.params)
    if honest:
        from flax import traverse_util

        rng = np.random.RandomState(7)
        flat = traverse_util.flatten_dict(frozen)
        for k, v in flat.items():
            if "offset" in k:
                if k[-1] == "kernel":
                    flat[k] = v * 30.0
                elif k[-1] == "bias":
                    bias = np.zeros(v.shape, np.float32)
                    bias[:18] = rng.randn(18) * 1.0
                    flat[k] = jnp.asarray(bias)
        frozen = traverse_util.unflatten_dict(flat)
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
    for _ in range(iters):
        pools, opt_state, metrics = step(pools, opt_state, frozen, b)
    float(metrics["total"])
    dt = (time.perf_counter() - t0) / iters
    tag = "honest" if honest else "zero-init"
    print(f"{tag} offsets: {dt*1e3:.1f} ms/step  "
          f"{cfg.batch_size/dt:.1f} samples/s  (compile {compile_s:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()
