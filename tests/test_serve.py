"""Tests for the grounding predictor (NER chunking, end-to-end predict, viz)."""

import numpy as np
import pytest

from lpi_tpu.serve.predictor import (
    GroundingPredictor,
    draw_predictions,
    find_noun_phrases,
    run_ner,
)


class TestNer:
    def test_find_noun_phrases(self):
        phrases = find_noun_phrases("the red car next to a tall tree")
        assert "red car" in phrases
        assert "tall tree" in phrases

    def test_run_ner_spans(self):
        caption = "a cat sitting on the mat"
        spans, entities = run_ner(caption)
        assert "cat" in entities
        i = entities.index("cat")
        beg, end = spans[i][0]
        assert caption[beg:end] == "cat"

    def test_repeated_entity_all_occurrences(self):
        caption = "a dog chasing another dog"
        spans, entities = run_ner(caption)
        i = entities.index("dog")
        assert len(spans[i]) == 2


@pytest.mark.slow  # tiny-GLIP init + several predictor forward compiles
class TestPredictor:
    @pytest.fixture(scope="class")
    def predictor(self):
        import jax

        from tests.test_grounding import TINY
        from lpi_tpu.continual.grounding_learner import GroundingLearner
        from lpi_tpu.data.bert_tokenizer import BertTokenizer
        from lpi_tpu.data.grounding import synthetic_grounding_task

        tok = BertTokenizer(max_len=16, vocab_size=512)
        ds = synthetic_grounding_task(0, 4, 64, tok)
        sample = next(ds.batches(2))
        learner = GroundingLearner(TINY, task_sim_matrix=np.eye(3),
                                   sample_batch=sample)
        learner.cluster_task(ds)
        return GroundingPredictor(learner.model, learner.params, learner.keys,
                                  tok, image_size=64, score_thresh=0.0,
                                  atss_cfg=TINY.atss)

    def test_predict_shapes(self, predictor, rng):
        image = (rng.rand(48, 80, 3) * 255).astype(np.uint8)
        out = predictor.predict(image, "the red ball near a box")
        assert out["boxes"].shape[1] == 4 if len(out["boxes"]) else True
        assert len(out["boxes"]) == len(out["scores"]) == len(out["entities"])
        assert 0 <= out["task_id"] < 3

    def test_empty_caption(self, predictor, rng):
        image = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        out = predictor.predict(image, "on of the")
        assert len(out["boxes"]) == 0

    def test_custom_entity(self, predictor, rng):
        image = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
        out = predictor.predict(image, "a blue bird flying", custom_entity="bird")
        assert all(e == "bird" for e in out["entities"])

    def test_draw_predictions(self, predictor, rng):
        image = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
        out = predictor.predict(image, "the ball")
        im = draw_predictions(image, out)
        assert im.size == (48, 48)


def test_draw_predictions_metric(rng):
    # pure-PIL path (no model): lives outside the slow predictor class
    from lpi_tpu.serve.predictor import draw_predictions_metric

    image = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    result = {"boxes": np.array([[2, 2, 20, 20], [5, 5, 30, 30],
                                 [1, 1, 10, 10]], np.float32),
              "scores": np.array([0.9, 0.7, 0.2], np.float32),
              "entities": ["cat", "dog", "bird"]}
    im, kept = draw_predictions_metric(image, result, metric="R@1",
                                       thresh=0.5)
    assert im.size == (48, 48)
    assert len(kept["scores"]) == 1 and kept["entities"] == ["cat"]
    _, kept5 = draw_predictions_metric(image, result, metric="R@5",
                                       thresh=0.5)
    # threshold drops the 0.2 box even under R@5
    assert len(kept5["scores"]) == 2
