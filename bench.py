"""Headline benchmark: LPI retrieval training throughput on one TPU chip.

Measures the full flagship train step — CLIP ViT-B/16 dual-tower forward with
rank-4 DecomposedPrompt injection (the paper config: 16 prompt tokens, depth
9), batch-global InfoNCE + alignment loss, backward w.r.t. the prompt pools,
masked SGD update — at the reference recipe's batch size 64
(`retrieval/configs/lpi/coco_lpi.json`), bf16 compute.

Prints ONE JSON line:
  {"metric": "retrieval_train_samples_per_sec_per_chip", "value": N,
   "unit": "samples/s", "vs_baseline": R, ...}

The same line also carries `grounding_train_samples_per_sec_per_chip`
(the GLIP-T + LPI fused train step at the reference recipe's 800px), so the
grounding half has a hardware perf record too. Set LPI_BENCH_GROUNDING=0 to
skip that leg.

`vs_baseline` divides by REFERENCE_SAMPLES_PER_SEC, which is *derived*, not
measured (the reference publishes no throughput — BASELINE.md): analytic
train-step FLOPs of the reference model shape × an assumed end-to-end A100
fp16 utilization. The derivation is `derive_reference_baseline()` below;
every input is written down so a reader can recompute or re-parameterize it.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def derive_reference_baseline() -> dict:
    """Transparent estimate of the PyTorch reference's single-GPU training
    throughput (samples/s) for the retrieval recipe.

    FLOPs: analytic MAC count (1 MAC = 2 FLOPs) of one image-text pair
    through the reference model shapes (`retrieval/models/clip/model.py`):
    ViT-B/16 at 224px with 16 extra prompt tokens (seq 1+16+196=213) and the
    CLIP text tower (width 512, seq 77). Backward: the backbone is frozen
    (only layer-0 prompts train, `sprompt.py:197-245`), so autograd runs the
    activation-gradient pass (≈1x forward matmul cost) but skips all weight
    gradients — train-step cost ≈ 2x forward.

    Utilization: the reference is eager PyTorch that BPE-tokenizes captions
    on the host inside forward (`prompt_learner.py:128-218`), re-reads the
    task-similarity matrix from disk every step (`slinet.py:171`), and runs
    fp16 via .half() weights (`clip/model.py:394-415`). Published MLPerf-ish
    numbers for *tuned* ViT-B training on A100 are 40-50% of the 312 TFLOPS
    fp16 peak; research-grade eager code with host work in the loop lands at
    10-25%. We take 15% as the point estimate and report the range.
    """
    def tower_macs(n_tok: int, width: int, mlp: int, layers: int) -> float:
        qkv = n_tok * width * 3 * width
        attn = 2 * n_tok * n_tok * width
        proj = n_tok * width * width
        ffn = 2 * n_tok * width * mlp
        return layers * (qkv + attn + proj + ffn)

    vis = tower_macs(213, 768, 3072, 12) + 196 * (16 * 16 * 3) * 768  # +patch embed
    txt = tower_macs(77, 512, 2048, 12)
    fwd_flops = 2.0 * (vis + txt)  # per pair
    train_flops = 2.0 * fwd_flops  # fwd + activation-grad pass (frozen weights)

    a100_fp16_peak = 312e12
    utilization = 0.15  # point estimate; plausible range 0.10-0.25
    samples_per_sec = a100_fp16_peak * utilization / train_flops
    return {
        "samples_per_sec": samples_per_sec,
        "train_flops_per_pair": train_flops,
        "assumed_peak_flops": a100_fp16_peak,
        "assumed_utilization": utilization,
        "range_samples_per_sec": [
            a100_fp16_peak * 0.10 / train_flops,
            a100_fp16_peak * 0.25 / train_flops,
        ],
    }


def _setup_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lpi_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass  # older jax without the persistent cache knobs


def bench_retrieval() -> float:
    import jax.numpy as jnp

    from lpi_tpu.core.config import RetrievalConfig
    from lpi_tpu.continual.learner import RetrievalLearner, _split_params

    cfg = RetrievalConfig()  # full ViT-B/16 + LPI prompts, batch 64
    batch = cfg.batch_size
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
    return batch * iters / dt


def bench_grounding(image_size: int = 448, batch: int = 4) -> float:
    """GLIP-T + LPI fused train step at the reference's ACTUAL train size.

    448px: the reference hardcodes `Resize(448, 448, restrict=True)` in
    `build_transforms` (`data/transforms/build.py:36-41`), overriding the
    yaml's 800/1333 — every LPI grounding run trains and evals at 448x448
    (STATUS round 2, item 4). Set LPI_BENCH_GROUNDING_SIZE=800 to measure
    the config-surface size instead.

    Per-chip batch: the reference's IMS_PER_BATCH 16 is a *global* batch
    across its DDP ranks (`tools/finetune.py:507-527`); per chip we use 4 and
    report samples/s/chip, which scales linearly over the data mesh.
    """
    import jax.numpy as jnp

    from lpi_tpu.core.config import GroundingConfig
    from lpi_tpu.continual.grounding_learner import GroundingLearner, _split_params
    from lpi_tpu.data.bert_tokenizer import BertTokenizer
    from lpi_tpu.data.grounding import synthetic_grounding_task

    cfg = GroundingConfig(image_size=image_size, batch_size=batch)
    tok = BertTokenizer(max_len=cfg.bert.max_query_len)
    ds = synthetic_grounding_task(0, batch, image_size, tok,
                                  max_boxes=cfg.max_boxes)
    sample = next(ds.batches(cfg.batch_size))
    learner = GroundingLearner(cfg, sample_batch=sample)

    tx, step = learner._make_step(task_id=0, steps_per_epoch=10,
                                  epochs=cfg.epochs_per_task)
    pools, frozen = _split_params(learner.params)
    opt_state = tx.init(pools)
    b = {k: jnp.asarray(v) for k, v in sample.items()}

    pools, opt_state, metrics = step(pools, opt_state, frozen, b)
    float(metrics["total"])

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        pools, opt_state, metrics = step(pools, opt_state, frozen, b)
    float(metrics["total"])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    _setup_compile_cache()
    baseline = derive_reference_baseline()

    retrieval_sps = bench_retrieval()
    out = {
        "metric": "retrieval_train_samples_per_sec_per_chip",
        "value": round(retrieval_sps, 2),
        "unit": "samples/s",
        "vs_baseline": round(retrieval_sps / baseline["samples_per_sec"], 3),
        "baseline_samples_per_sec": round(baseline["samples_per_sec"], 1),
        "baseline_is_derived": True,
        "baseline_assumed_utilization": baseline["assumed_utilization"],
    }
    # print the headline immediately: if the grounding leg (a long remote
    # TPU compile on first run) is cut off by the caller's budget, this line
    # is still the tail. A completed grounding run re-prints the same line
    # enriched (last line wins for a tail-parser).
    print(json.dumps(out), flush=True)

    if os.environ.get("LPI_BENCH_GROUNDING", "1") != "0":
        import subprocess
        import sys

        budget = int(os.environ.get("LPI_BENCH_GROUNDING_TIMEOUT", "2400"))
        size = int(os.environ.get("LPI_BENCH_GROUNDING_SIZE", "448"))
        code = ("import sys; sys.path.insert(0, %r); import bench; "
                "print('GROUNDING_SPS', bench.bench_grounding(%d))"
                % (os.path.dirname(os.path.abspath(__file__)), size))
        try:
            proc = subprocess.run([sys.executable, "-c", code], timeout=budget,
                                  capture_output=True, text=True)
            for line in proc.stdout.splitlines():
                if line.startswith("GROUNDING_SPS"):
                    out["grounding_train_samples_per_sec_per_chip"] = round(
                        float(line.split()[1]), 2)
                    break
            else:
                out["grounding_error"] = (proc.stderr.strip()[-200:]
                                          or f"rc={proc.returncode}")
        except subprocess.TimeoutExpired:
            out["grounding_error"] = f"timeout after {budget}s (first compile)"
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
