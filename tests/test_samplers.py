"""Grouped batch sampler: homogeneity, coverage, and the padding-waste win
(reference `samplers/grouped_batch_sampler.py`, VERDICT r3 #7)."""

import numpy as np
import pytest

pytestmark = pytest.mark.fast

from lpi_tpu.data.samplers import GroupedBatchSampler, draw_scales, padding_waste


class TestGroupedBatchSampler:
    def test_batches_homogeneous_and_cover_all(self):
        rng = np.random.RandomState(0)
        groups = rng.randint(0, 3, size=50)
        sampler = GroupedBatchSampler(groups, batch_size=4, seed=1)
        seen = []
        for batch in sampler:
            assert len(set(int(groups[i]) for i in batch)) == 1
            seen.extend(batch)
        assert sorted(seen) == list(range(50))  # every element exactly once

    def test_drop_uneven_only_full_batches(self):
        groups = np.asarray([0] * 10 + [1] * 7)
        sampler = GroupedBatchSampler(groups, batch_size=4, seed=0,
                                      drop_uneven=True)
        batches = list(sampler)
        assert all(len(b) == 4 for b in batches)
        assert len(batches) == len(sampler) == 2 + 1  # 10//4 + 7//4

    def test_deterministic_per_seed(self):
        groups = np.random.RandomState(3).randint(0, 4, size=40)
        a = list(GroupedBatchSampler(groups, 4, seed=7))
        b = list(GroupedBatchSampler(groups, 4, seed=7))
        c = list(GroupedBatchSampler(groups, 4, seed=8))
        assert a == b
        assert a != c


class TestScaleGroupedGroundingBatches:
    def _task(self, multi_scale):
        from lpi_tpu.data.bert_tokenizer import BertTokenizer
        from lpi_tpu.data.grounding import synthetic_grounding_task
        from lpi_tpu.data.transforms import AugmentConfig

        tok = BertTokenizer(max_len=16, vocab_size=512)
        ds = synthetic_grounding_task(0, 24, 64, tok)
        ds.augment = AugmentConfig(image_size=64, multi_scale=multi_scale,
                                   flip_prob=0.0)
        return ds

    def test_zero_padding_waste_per_batch(self):
        ds = self._task((32, 64))
        shapes = set()
        for batch in ds.batches_grouped(4, seed=0):
            H, W = batch["images"].shape[1:3]
            assert H == W and H in (32, 64)  # exact per-scale shape
            shapes.add(H)
        assert shapes == {32, 64}  # both buckets actually emitted

    def test_padtomax_wastes_what_grouping_saves(self):
        ds = self._task((32, 64))
        # default pad-to-max path: every batch ships at 64
        for batch in ds.batches(4, seed=0):
            assert batch["images"].shape[1:3] == (64, 64)
        scales = draw_scales(len(ds), (32, 64), seed=0)
        waste = padding_waste(scales, 64)
        assert waste > 0.2  # the win grouping recovers

    def test_falls_back_without_multi_scale(self):
        ds = self._task(())
        got = [b["images"].shape for b in ds.batches_grouped(4, seed=0)]
        want = [b["images"].shape for b in ds.batches(4, seed=0)]
        assert got == want
