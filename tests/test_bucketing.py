"""Multi-scale (800/1333-style) static bucketing end-to-end (VERDICT r2 #8).

The reference's config surface allows multi-scale min-size training
(`AUGMENT.MULT_MIN_SIZE_TRAIN`, `data/transforms/build.py`); the TPU design
replaces dynamic shapes with pad-to-max static bucketing
(`data/transforms.py`). These tests prove the two load-bearing claims:

* a training loop fed batches spanning ALL buckets triggers exactly ONE
  compile of the train step (static shapes: every batch is padded to the
  largest scale);
* boxes stay correct under every bucket's resize (per-axis scaling to the
  chosen scale; padding leaves them untouched).
"""

import numpy as np
import pytest

from lpi_tpu.data.transforms import AugmentConfig, train_transform

SCALES = (32, 48, 64)


class TestBucketBoxes:
    pytestmark = pytest.mark.fast

    @pytest.mark.parametrize("scale", SCALES)
    def test_boxes_scale_per_bucket(self, scale):
        """Force one bucket; the box must scale by (s/W, s/H) and the image
        must be padded to max(scales)."""
        rng = np.random.RandomState(0)
        img = np.zeros((32, 40, 3), np.float32)
        img[8:16, 10:20] = 1.0
        boxes = np.asarray([[10.0, 8.0, 20.0, 16.0]], np.float32)
        aug = AugmentConfig(image_size=448, multi_scale=(scale,),
                            flip_prob=0.0, normalize=False)
        # pad manually to the shared max so all buckets land on one shape
        out_img, out_boxes = train_transform(rng, img, boxes, aug)
        sx, sy = scale / 40.0, scale / 32.0
        np.testing.assert_allclose(
            out_boxes[0], [10 * sx, 8 * sy, 20 * sx, 16 * sy], rtol=1e-5)
        assert out_img.shape == (scale, scale, 3)

    def test_mixed_buckets_share_padded_shape(self):
        rng = np.random.RandomState(0)
        aug = AugmentConfig(image_size=448, multi_scale=SCALES,
                            flip_prob=0.0, normalize=False)
        shapes = set()
        for _ in range(12):
            img = np.random.rand(30, 50, 3).astype(np.float32)
            out, bx = train_transform(rng, img, np.zeros((0, 4)), aug)
            shapes.add(out.shape)
        assert shapes == {(64, 64, 3)}  # one static shape for every bucket


class TestBucketCompileCount:
    def test_single_compile_across_buckets(self):
        """Train steps over batches drawn from every bucket: the jitted step
        compiles ONCE (cache size 1) because shapes are static."""
        import jax.numpy as jnp
        import optax

        from lpi_tpu.core.config import (
            ATSSConfig, BertConfig, DyHeadConfig, GroundingConfig,
            LPIPromptConfig, SwinConfig)
        from lpi_tpu.continual.grounding_learner import (
            GroundingLearner, _split_params)
        from lpi_tpu.data.bert_tokenizer import BertTokenizer
        from lpi_tpu.data.grounding import GroundingTaskSet, synthetic_grounding_task

        cfg = GroundingConfig(
            swin=SwinConfig(patch_size=4, embed_dim=8, depths=(2, 2, 6, 2),
                            num_heads=(1, 2, 2, 2), window_size=4),
            bert=BertConfig(vocab_size=512, hidden_size=16, num_layers=12,
                            num_heads=2, intermediate_size=32,
                            max_position_embeddings=32, max_query_len=16),
            dyhead=DyHeadConfig(num_convs=1, channels=16, max_tokens=16),
            atss=ATSSConfig(anchor_sizes=(8, 16, 32, 64, 128),
                            anchor_strides=(4, 8, 16, 32, 64),
                            pre_nms_top_n=50, fpn_post_nms_top_n=10),
            lpi=LPIPromptConfig(prompt_length=4, prompt_depth=2, prompt_rank=2,
                                interact_rank=2, interact_depth=2),
            total_tasks=2, epochs_per_task=1, batch_size=2,
            max_boxes=4, image_size=64, num_key_clusters=2, dtype="float32",
            fused_scan_unroll=99)

        tok = BertTokenizer(max_len=16, vocab_size=512)
        base = synthetic_grounding_task(0, 8, 48, tok)  # raw 48px images
        aug = AugmentConfig(image_size=64, multi_scale=SCALES, flip_prob=0.5)
        ds = GroundingTaskSet(base.examples, tok, max_boxes=4, task_index=0,
                              augment=aug)

        sample = next(ds.batches(cfg.batch_size))
        assert sample["images"].shape[1:3] == (64, 64)
        learner = GroundingLearner(cfg, sample_batch=sample)
        step = learner._jitted_step()
        tx = learner._tx()
        pools, frozen = _split_params(learner.params)
        opt_state = tx.init(pools)
        seen = 0
        for epoch in range(3):  # fresh rng per epoch -> all buckets appear
            for batch in ds.batches(cfg.batch_size, seed=epoch):
                batch = {k: jnp.asarray(v) for k, v in batch.items()}
                pools, opt_state, metrics = step(
                    pools, opt_state, frozen, batch, jnp.int32(0),
                    jnp.float32(1e-3))
                seen += 1
        assert seen >= 9
        assert np.isfinite(float(metrics["total"]))
        # the whole multi-bucket loop compiled exactly one program
        assert step._cache_size() == 1
