"""Measure the compiled retrieval EVAL pipeline on the real chip.

The reference's eval is its slowest path (SURVEY §3.5): per text chunk it
runs a per-sample Python loop building per-category prompt forwards
(`retrieval/models/slinet.py:193-207`), and ranks on host. The rebuild's
eval is three jitted programs per modality — frozen-feature extract (f32
matmul precision), KMeans task-ID inference, task-prompted encode — plus a
device ranking matmul. This script times the full image and text eval
pipelines at the flagship config (ViT-B/16, batch 64 / text chunk 256) and
prints samples/s, so STATUS can carry a measured eval number next to the
train-step headline.

Usage: python scripts/bench_eval.py [iters]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/lpi_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    import jax.numpy as jnp

    from lpi_tpu.core.config import RetrievalConfig
    from lpi_tpu.continual.keys import infer_task_ids
    from lpi_tpu.continual.learner import RetrievalLearner

    cfg = RetrievalConfig()
    learner = RetrievalLearner(cfg)
    rng = np.random.RandomState(0)

    b_img = cfg.batch_size
    b_txt = cfg.eval_text_chunk
    images = jnp.asarray(rng.randn(b_img, 224, 224, 3), jnp.float32)
    ids = rng.randint(1, 49000, size=(b_txt, 77)).astype(np.int32)
    ids[:, 0] = 49406
    ids[:, -1] = 49407
    ids = jnp.asarray(ids)

    # populate keys for all 12 tasks (random centers: timing, not accuracy);
    # the frozen extractors return CLIP joint-space features (embed_dim)
    d = cfg.clip.embed_dim
    for t in range(cfg.total_sessions):
        vc = jnp.asarray(rng.randn(cfg.num_key_clusters, d), jnp.float32)
        tc = jnp.asarray(rng.randn(cfg.num_key_clusters, d), jnp.float32)
        learner.visual_keys = learner.visual_keys.update(t, vc)
        learner.textual_keys = learner.textual_keys.update(t, tc)

    enc_img = learner._jit_cached(
        "encode_image_tasks",
        lambda p, x, t: learner.model.apply(
            {"params": p}, x, t, method=learner.model.encode_image_tasks))
    enc_txt = learner._jit_cached(
        "encode_text_tasks",
        lambda p, x, t: learner.model.apply(
            {"params": p}, x, t, method=learner.model.encode_text_tasks))

    def img_pipeline():
        frozen = learner.extract_visual(images)
        sel = infer_task_ids(frozen, learner.visual_keys)
        return enc_img(learner.params, images, sel)

    def txt_pipeline():
        frozen = learner.extract_textual(ids)
        sel = infer_task_ids(frozen, learner.textual_keys)
        return enc_txt(learner.params, ids, sel)

    for name, fn, bsz in (("image", img_pipeline, b_img),
                          ("text", txt_pipeline, b_txt)):
        out = fn()
        np.asarray(out)  # compile barrier (host fetch)
        t0 = time.perf_counter()
        last = None
        for _ in range(iters):
            last = fn()
        np.asarray(last)
        dt = time.perf_counter() - t0
        print(f"eval {name} pipeline: {bsz * iters / dt:9.1f} samples/s "
              f"({dt / iters * 1e3:.2f} ms / batch of {bsz})", flush=True)


if __name__ == "__main__":
    main()
