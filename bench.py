"""Headline benchmark: LPI retrieval training throughput on one TPU chip.

Measures the full flagship train step — CLIP ViT-B/16 dual-tower forward with
rank-4 DecomposedPrompt injection (the paper config: 16 prompt tokens, depth
9), batch-global InfoNCE + alignment loss, backward w.r.t. the prompt pools,
masked SGD update — at the reference recipe's batch size 64
(`retrieval/configs/lpi/coco_lpi.json`), bf16 compute.

Prints up to three progressively-enriched JSON lines (headline first, then
grounding, then quality) — each a superset of the previous, so a tail-parser
takes the LAST line:
  {"metric": "retrieval_train_samples_per_sec_per_chip", "value": N,
   "unit": "samples/s", "vs_baseline": R, ...}

The same line also carries `grounding_train_samples_per_sec_per_chip`
(the GLIP-T + LPI fused train step at the reference recipe's ACTUAL 448px —
the reference hardcodes `Resize(448, 448, restrict=True)` in
`data/transforms/build.py:36-41`, overriding the yaml's 800/1333;
LPI_BENCH_GROUNDING_SIZE overrides). Set LPI_BENCH_GROUNDING=0 to skip
that leg.

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


def grounding_reference_baseline() -> dict:
    """MEASURED reference grounding baseline (no utilization assumption
    needed): the reference repo ships an actual training log of this exact
    workload — `grounding/shell/out.txt`, the LPI prompt finetune
    (`configs/refcoco/finetune_A_decompose_task_interact.yaml`, trainable
    12,400 prompt params of 152M total, frozen GLIP-T backbone) on
    **1 GPU** ('Using 1 GPUs', num_gpus: 1), global IMS_PER_BATCH **32**,
    at **448x448** (hardcoded `Resize(min_size=448, max_size=448,
    restrict=True)`, `data/transforms/build.py:36-41`). Steady-state
    per-iteration time across all 996 logged iter lines: median 1.357 s
    (mean 1.320, p10 1.150, p90 1.434), of which data loading is ~0.01 s.

    32 images / 1.357 s = 23.6 samples/s on the authors' single GPU (model
    unlogged; 12.7 GB peak CUDA memory => a 16 GB-class or larger card).
    This is the denominator for `grounding_vs_baseline` — same model
    family, same 448px size, same frozen-backbone prompt-training regime
    as `bench_grounding()` measures per chip."""
    median_iter_time = 1.357
    return {
        "samples_per_sec": 32 / median_iter_time,
        "global_batch": 32,
        "gpus": 1,
        "median_iter_time_s": median_iter_time,
        "source": "reference grounding/shell/out.txt (996 iter lines)",
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
    batch = int(os.environ.get("LPI_BENCH_RETRIEVAL_BATCH", cfg.batch_size))
    if batch != cfg.batch_size:
        import dataclasses

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

    # warmup/compile (fetch the value: on the remote-tunnel platform
    # block_until_ready returns early, a host fetch is the real barrier)
    pools, opt_state, metrics = step(pools, opt_state, frozen, b)
    float(metrics["total"])

    # 50 dependent iters: the tunneled chip pays ~0.5-4.6 ms of RPC
    # dispatch per call depending on amortization depth (r4 measurement,
    # scripts/profile_deform.py) — 20 iters under-reports by ~2%
    iters = 50
    t0 = time.perf_counter()
    for _ in range(iters):
        pools, opt_state, metrics = step(pools, opt_state, frozen, b)
    float(metrics["total"])  # forces the whole dependent chain
    dt = time.perf_counter() - t0
    return batch * iters / dt


def bench_quality() -> dict:
    """The accuracy gate's quality line (VERDICT r2 #4): a tiny 3-session
    continual retrieval run on correlated synthetic data
    (`data/retrieval.py:_render_correlated`), reporting task-ID accuracy,
    R@1, and forgetting. Mirrors `tests/test_quality_gate.py` at bench time
    so every BENCH record carries accuracy-level evidence, not just
    throughput."""
    from lpi_tpu.core.config import CLIPConfig, LPIPromptConfig, RetrievalConfig
    from lpi_tpu.continual.learner import RetrievalLearner
    from lpi_tpu.data.retrieval import (
        synthetic_correlated_eval, synthetic_correlated_pretrain,
        synthetic_correlated_session)
    from lpi_tpu.data.tokenizer import ClipTokenizer
    from lpi_tpu.eval.retrieval import aggregate_results

    n_tasks = 3
    cfg = RetrievalConfig(
        clip=CLIPConfig(
            image_resolution=32, patch_size=8, vision_width=64,
            vision_layers=3, vision_heads=4, text_width=64, text_layers=3,
            text_heads=4, vocab_size=49408, context_length=77, embed_dim=32,
            n_ctx=4),
        lpi=LPIPromptConfig(prompt_length=4, prompt_depth=3, prompt_rank=2),
        total_sessions=n_tasks, epochs=4, batch_size=8, lr=0.05,
        visual_dim=64, textual_dim=64, num_key_clusters=2, dtype="float32")
    tok = ClipTokenizer()
    learner = RetrievalLearner(cfg, task_sim_matrix=np.eye(n_tasks))
    # full-param pretrain first: the frozen backbone the prompts steer must
    # be PRETRAINED, like the reference's downloaded CLIP (VERDICT r3 #1a)
    mixed = synthetic_correlated_pretrain(n_tasks, 24, 32, tok, cfg.clip.n_ctx)
    learner.pretrain(mixed, steps=600, lr=1e-3)
    session_results = {}
    for t in range(n_tasks):
        ds = synthetic_correlated_session(t, 24, 32, tok, cfg.clip.n_ctx)
        learner.train_session(ds)
        ev = synthetic_correlated_eval(t + 1, 8, 32, tok, cfg.clip.n_ctx)
        session_results[t] = learner.evaluate(ev, num_tasks=t + 1)
    final = session_results[n_tasks - 1]
    agg = aggregate_results(session_results, direction="i2t", k_index=0)
    out = {
        "task_id_acc_visual": round(final["task_id_accuracy"]["visual"], 3),
        "task_id_acc_textual": round(final["task_id_accuracy"]["textual"], 3),
        "txt_r1": round(final["summary"]["txt_r1"], 1),
        "img_r1": round(final["summary"]["img_r1"], 1),
        "i2t_p1_average": round(agg["average"], 1),
        "i2t_forgetting": round(agg["forgetting"], 1),
    }
    # self-asserting (VERDICT r3 #2): compare against the accuracy gate's
    # bars so a chance-level result can never be recorded silently.
    # Forgetting IS gated (VERDICT r4 #7): continual learning is the
    # paper's subject — a prompt-isolation bug that doubled forgetting
    # would otherwise pass on final-average alone.
    out["quality_bars"] = {"r1": 50.0, "task_id": 0.8, "forgetting": 10.0,
                          "grounding_p1": 30.0, "grounding_task_id": 0.8,
                          "grounding_forgetting": 15.0}
    out["quality_ok"] = bool(
        out["txt_r1"] >= 50.0 and out["img_r1"] >= 50.0
        and out["i2t_p1_average"] >= 50.0
        and out["task_id_acc_visual"] >= 0.8
        and out["task_id_acc_textual"] >= 0.8
        and out["i2t_forgetting"] <= 10.0)
    if os.environ.get("LPI_BENCH_QUALITY_GROUNDING", "1") != "0":
        try:
            g = bench_quality_grounding()
            out.update(g)
            out["quality_ok"] = bool(
                out["quality_ok"] and g["grounding_p1"] >= 30.0
                and g["grounding_task_id_acc"] >= 0.8
                and g["grounding_forgetting"] <= 15.0)
        except Exception as e:
            out["grounding_quality_error"] = str(e)[-200:]
            out["quality_ok"] = False
    return out


def gate_grounding_config(n_tasks: int = 3):
    """The driver quality gate's tiny grounding config — ALSO the on-chip
    test lane's train-step config (`tests/test_tpu_onchip.py`), so the exact
    shapes the gate dispatches (channels=16 -> the deform XLA fallback,
    VERDICT r4 #1) are exercised on real hardware before every round."""
    from lpi_tpu.core.config import (
        ATSSConfig, BertConfig, DyHeadConfig, GroundingConfig,
        LPIPromptConfig, SwinConfig)

    return GroundingConfig(
        swin=SwinConfig(patch_size=4, embed_dim=8, depths=(2, 2, 6, 2),
                        num_heads=(1, 2, 2, 2), window_size=4),
        bert=BertConfig(vocab_size=512, hidden_size=16, num_layers=12,
                        num_heads=2, intermediate_size=32,
                        max_position_embeddings=32, max_query_len=16),
        dyhead=DyHeadConfig(num_convs=2, channels=16, max_tokens=16),
        atss=ATSSConfig(anchor_sizes=(32, 64, 128, 256, 512),
                        anchor_strides=(4, 8, 16, 32, 64),
                        pre_nms_top_n=50, fpn_post_nms_top_n=10),
        lpi=LPIPromptConfig(prompt_length=4, prompt_depth=9, prompt_rank=2,
                            interact_rank=2, interact_depth=9),
        # GN FPN: tiny from-scratch pretraining needs the normalization
        # (see the gate config's note in tests/test_quality_gate.py)
        fpn_use_gn=True,
        total_tasks=n_tasks, epochs_per_task=2, batch_size=4,
        max_boxes=4, image_size=64, num_key_clusters=5, dtype="float32",
        lr=0.003, fused_scan_unroll=99)


def bench_quality_grounding() -> dict:
    """The grounding half of the accuracy gate at bench time: mixed-task
    full-param pretrain (the GLIP-T(A) role), 3-task continual prompt loop,
    task-ID + P@1(GIoU>=0.5) eval — `tests/test_quality_gate.py`'s recipe.
    Evaluates over seen tasks after EVERY task so forgetting (best-previous
    minus last, `res_handle/reshandle.py:52-113`) is reported and gated, not
    just the final average (VERDICT r4 #7)."""
    from lpi_tpu.continual.grounding_learner import GroundingLearner
    from lpi_tpu.data.bert_tokenizer import BertTokenizer
    from lpi_tpu.data.grounding import GroundingTaskSet, synthetic_grounding_task

    n_tasks = 3
    cfg = gate_grounding_config(n_tasks)
    tok = BertTokenizer(max_len=16, vocab_size=512)
    tasks = {t: synthetic_grounding_task(t, 24, cfg.image_size, tok)
             for t in range(n_tasks)}
    sample = next(tasks[0].batches(cfg.batch_size))
    learner = GroundingLearner(cfg, sample_batch=sample)
    mixed = GroundingTaskSet.concat([
        synthetic_grounding_task(t, 16, cfg.image_size, tok, seed=5)
        for t in range(n_tasks)])
    learner.pretrain(mixed, steps=242, lr=cfg.lr)
    p1_history = {}  # checkpoint t -> {task s: P@1 on task s}
    res = None
    for t in range(n_tasks):
        learner.train_task(tasks[t], epochs=8)
        res = learner.evaluate({s: tasks[s] for s in range(t + 1)})
        p1_history[t] = {s: float(res["per_task"][s][0])
                         for s in range(t + 1)}
    final = p1_history[n_tasks - 1]
    # forgetting: best accuracy a task ever had at an earlier checkpoint
    # minus its final accuracy, averaged over non-final tasks
    drops = [max(p1_history[t][s] for t in range(s, n_tasks - 1)) - final[s]
             for s in range(n_tasks - 1)]
    return {
        "grounding_p1": round(float(res["overall"][0]), 1),
        "grounding_p5": round(float(res["overall"][1]), 1),
        "grounding_task_id_acc": round(float(res["task_id_accuracy"]), 3),
        "grounding_forgetting": round(float(np.mean(drops)), 1),
    }


def bench_grounding(image_size: int = 448, batch: int = 4) -> dict:
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

    # fused_scan_unroll=99: unrolling the Swin+BERT lockstep scan measured
    # 43.48 vs 41.85 samples/s at this exact config on the v5e chip
    # (scripts/sweep_grounding.py, r5) — same direction as the retrieval
    # towers' +36% unroll win. The config default stays 1 (scanned body)
    # because XLA:CPU compile of the unrolled program is what blew the r4
    # multi-chip dryrun budget.
    cfg = GroundingConfig(image_size=image_size, batch_size=batch,
                          fused_scan_unroll=99)
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

    def timed(frozen_params):
        nonlocal pools, opt_state
        p, o, metrics = step(pools, opt_state, frozen_params, b)
        pools, opt_state = p, o
        float(metrics["total"])  # compile + barrier
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            pools, opt_state, metrics = step(pools, opt_state, frozen_params, b)
        float(metrics["total"])  # forces the whole dependent chain
        dt = time.perf_counter() - t0
        return batch * iters / dt

    sps_zero = timed(frozen)

    # HONEST headline: the zero-init offset convs emit ~0 px offsets, which
    # lets the kernel's data-dependent tile culling skip ~60/64
    # displacements — flattering vs trained GLIP offsets (~+-1-2 px,
    # keeping 9-16 active). Randomize the offset convs to produce
    # position-varying offsets of realistic magnitude and re-time the SAME
    # compiled step (culling is a runtime effect, not a trace effect).
    from flax import traverse_util

    rng = np.random.RandomState(7)
    flat = traverse_util.flatten_dict(frozen)
    for k, v in flat.items():
        if "offset" in k:
            if k[-1] == "kernel":
                flat[k] = v * 30.0  # N(0, .01) -> N(0, .3) per-position term
            elif k[-1] == "bias":
                bias = np.zeros(v.shape, np.float32)
                bias[:18] = rng.randn(18) * 1.0  # ~+-1-2 px systematic part
                flat[k] = jnp.asarray(bias)
    frozen_honest = traverse_util.unflatten_dict(flat)
    sps_honest = timed(frozen_honest)
    return {"honest_offsets": sps_honest, "zero_offsets": sps_zero}


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
        code = ("import sys, json; sys.path.insert(0, %r); import bench; "
                "print('GROUNDING_SPS', json.dumps(bench.bench_grounding(%d)))"
                % (os.path.dirname(os.path.abspath(__file__)), size))
        try:
            proc = subprocess.run([sys.executable, "-c", code], timeout=budget,
                                  capture_output=True, text=True)
            for line in proc.stdout.splitlines():
                if line.startswith("GROUNDING_SPS"):
                    g = json.loads(line.split(" ", 1)[1])
                    # headline = honest (randomized +-1-2 px) offsets; the
                    # zero-init figure is the flattering upper bound
                    out["grounding_train_samples_per_sec_per_chip"] = round(
                        g["honest_offsets"], 2)
                    out["grounding_train_samples_per_sec_zero_offsets"] = \
                        round(g["zero_offsets"], 2)
                    # MEASURED denominator: the reference's own shipped
                    # training log of this exact workload (448px, frozen
                    # backbone, prompt finetune) — see
                    # grounding_reference_baseline()
                    gb = grounding_reference_baseline()
                    out["grounding_vs_baseline"] = round(
                        g["honest_offsets"] / gb["samples_per_sec"], 3)
                    out["grounding_baseline_samples_per_sec"] = round(
                        gb["samples_per_sec"], 1)
                    out["grounding_baseline_is_measured"] = True
                    break
            else:
                out["grounding_error"] = (proc.stderr.strip()[-200:]
                                          or f"rc={proc.returncode}")
        except subprocess.TimeoutExpired:
            out["grounding_error"] = f"timeout after {budget}s (first compile)"
        print(json.dumps(out), flush=True)

    if os.environ.get("LPI_BENCH_QUALITY", "1") != "0":
        try:
            out["quality"] = bench_quality()
            # top-level mirror so a tail-parser can't miss a red gate
            out["quality_ok"] = out["quality"]["quality_ok"]
        except Exception as e:  # quality leg must not kill the perf record
            out["quality_error"] = str(e)[-200:]
            out["quality_ok"] = False
        print(json.dumps(out), flush=True)
        if not out["quality_ok"]:
            import sys

            print("QUALITY GATE FAILED: accuracy below the gate bars "
                  "(see the 'quality' field)", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
