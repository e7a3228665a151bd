"""GLIP-KNOW knowledge-prompt path (SURVEY G30): caption construction,
training class sampling + positive map, and the parallel-language detection
forward (`generalized_vl_rcnn.py:516-660`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.core.config import (
    ATSSConfig,
    BertConfig,
    DyHeadConfig,
    GroundingConfig,
    KnowledgeConfig,
    LPIPromptConfig,
    SwinConfig,
)
from lpi_tpu.data.bert_tokenizer import BertTokenizer
from lpi_tpu.data.knowledge import (
    construct_knowledge_captions,
    sample_training_classes,
)
from lpi_tpu.models.glip.grounding import GroundedVLModel

KNOW = {
    "cat": {"clean_name": "cat", "def_wiki": "a small feline.",
            "gpt3": ["cats purr.", "cats have whiskers.", "cats nap."]},
    "dog": {"clean_name": "dog", "def_wiki": "a domestic canine.",
            "gpt3": ["dogs bark."]},
    "bus": {"clean_name": "bus"},  # no knowledge fields
}


class TestCaptionConstruction:
    pytestmark = pytest.mark.fast

    def test_plain_names_without_knowledge(self):
        caps = construct_knowledge_captions(["cat", "dog"], None)
        assert caps == ["cat", "dog"]

    def test_single_source_wiki(self):
        caps = construct_knowledge_captions(
            ["cat", "bus"], KNOW, knowledge_type="def_wiki")
        assert caps[0] == "cat: a small feline."
        assert caps[1] == "bus"  # empty knowledge -> bare clean name

    def test_gpt3_list_truncated(self):
        caps = construct_knowledge_captions(
            ["cat"], KNOW, knowledge_type="gpt3", gpt3_num=2)
        assert caps[0] == "cat: cats purr. cats have whiskers."

    def test_wiki_and_gpt3_concatenation(self):
        # faithful quirk: def_wiki and the gpt3 join are concatenated with
        # no separator (`generalized_vl_rcnn.py:530-534`)
        caps = construct_knowledge_captions(
            ["dog"], KNOW, wiki_and_gpt3=True, gpt3_num=5)
        assert caps[0] == "dog: a domestic canine.dogs bark."

    def test_missing_class_falls_back(self):
        caps = construct_knowledge_captions(
            ["zebra"], KNOW, knowledge_type="def_wiki")
        assert caps == ["zebra"]


class TestClassSampling:
    pytestmark = pytest.mark.fast

    CLASSES = ["cat", "dog", "bus", "car", "bird", "boat"]

    def test_batch_labels_kept_and_padded_with_negatives(self):
        rng = np.random.RandomState(0)
        names, pmap = sample_training_classes(
            [["cat", "dog"], ["cat"]], self.CLASSES, 4, rng)
        assert len(names) == 4 and len(set(names)) == 4
        assert {"cat", "dog"} <= set(names)
        # positive map: 3 boxes, each hitting its label's slot
        assert pmap.shape == (3, 5)
        assert pmap[0, names.index("cat")] == 1 and pmap[0].sum() == 1
        assert pmap[1, names.index("dog")] == 1
        assert pmap[2, names.index("cat")] == 1
        assert pmap[:, -1].sum() == 0  # [NoObj] column untouched

    def test_truncation_drops_overflow_labels(self):
        rng = np.random.RandomState(1)
        names, pmap = sample_training_classes(
            [["cat", "dog", "bus", "car", "bird"]], self.CLASSES, 2, rng)
        assert len(names) == 2
        # encounter-order truncation keeps cat + dog
        assert set(names) == {"cat", "dog"}
        assert pmap.shape == (5, 3)
        assert pmap[2:].sum() == 0  # dropped labels have no slot

    def test_more_slots_than_classes_repeats(self):
        rng = np.random.RandomState(2)
        names, pmap = sample_training_classes(
            [["cat"]], ["cat", "dog"], 4, rng)
        assert len(names) == 4 and set(names) == {"cat", "dog"}
        # the box maps to SOME cat slot
        assert pmap[0].sum() == 1
        assert names[int(np.argmax(pmap[0]))] == "cat"


TINY = GroundingConfig(
    swin=SwinConfig(patch_size=4, embed_dim=8, depths=(2, 2, 2, 2),
                    num_heads=(1, 2, 2, 2), window_size=4),
    bert=BertConfig(vocab_size=512, hidden_size=16, num_layers=8, num_heads=2,
                    intermediate_size=32, max_position_embeddings=32,
                    max_query_len=16),
    fused_scan_unroll=99,
    dyhead=DyHeadConfig(num_convs=1, channels=16, max_tokens=16,
                        deform_impl="fast"),
    atss=ATSSConfig(anchor_sizes=(8, 16, 32, 64, 128),
                    anchor_strides=(4, 8, 16, 32, 64),
                    pre_nms_top_n=50, fpn_post_nms_top_n=10),
    lpi=LPIPromptConfig(prompt_length=4, prompt_depth=6, prompt_rank=2,
                        interact_rank=2, interact_depth=6),
    total_tasks=3, epochs_per_task=1, batch_size=2, max_boxes=4,
    image_size=64, num_key_clusters=2, dtype="float32",
    knowledge=KnowledgeConfig(parallel_language_input=True,
                              knowledge_type="def_wiki"))


class TestParallelLanguageForward:
    @pytest.fixture(scope="class")
    def setup(self):
        model = GroundedVLModel(TINY)
        tok = BertTokenizer(max_len=16, vocab_size=512)
        caps = construct_knowledge_captions(
            ["cat", "dog", "bus"], KNOW, knowledge_type="def_wiki")
        caps.append("")  # [NoObj] slot (`generalized_vl_rcnn.py:599-600`)
        ids, mask, _ = tok(caps)
        images = jnp.asarray(
            np.random.RandomState(0).rand(2, 64, 64, 3), jnp.float32)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), images,
            jnp.asarray(ids[:2]), jnp.asarray(mask[:2]), 0)["params"]
        return model, params, images, jnp.asarray(ids), jnp.asarray(mask)

    def test_shapes_and_noobj_mask(self, setup):
        model, params, images, ids, mask = setup
        flat, language = model.apply(
            {"params": params}, images, ids, mask, "first",
            method=model.forward_knowledge)
        N = ids.shape[0]
        assert language["embedded"].shape == (2, N, 16)
        assert language["hidden"].shape == (2, N, 16)
        # [NoObj] slot masked out of the language mask
        np.testing.assert_array_equal(np.asarray(language["masks"][:, -1]), 0)
        # dot-product logits carry one column per class slot
        assert flat["dot_logits"].shape[0] == 2
        assert flat["dot_logits"].shape[2] == N
        assert flat["bbox_pred"].shape[1] == flat["dot_logits"].shape[1]

    def test_first_agg_is_cls_token_of_plain_bert(self, setup):
        """'first' aggregation == CLS embedding of a promptless encode of
        the same captions (no visual leakage into the caption encodings)."""
        model, params, images, ids, mask = setup
        _, language = model.apply(
            {"params": params}, images, ids, mask, "first",
            method=model.forward_knowledge)

        def plain(m, ids_, mask_):
            dummy = jnp.zeros((ids_.shape[0], 64, 64, 3), jnp.float32)
            lang, _ = m.encoder(dummy, ids_, mask_, None, None, 0,
                                num_pooled_layers=m.cfg.bert.num_pooled_layers)
            return lang["embedded"][:, 0]

        cls = model.apply({"params": params}, ids, mask, method=plain)
        np.testing.assert_allclose(
            np.asarray(language["embedded"][0]), np.asarray(cls),
            rtol=2e-5, atol=2e-6)

    def test_mean_agg_respects_mask(self, setup):
        model, params, images, ids, mask = setup
        _, language = model.apply(
            {"params": params}, images, ids, mask, "mean",
            method=model.forward_knowledge)
        assert language["embedded"].shape[1] == ids.shape[0]
        assert np.isfinite(np.asarray(language["embedded"])).all()

    def test_bad_agg_type_raises(self, setup):
        model, params, images, ids, mask = setup
        with pytest.raises(ValueError, match="lan_feature_agg_type"):
            model.apply({"params": params}, images, ids, mask, "max",
                        method=model.forward_knowledge)


class TestCliDetectionMode:
    def test_predict_classes_cli(self, tmp_path):
        """`cli predict --classes --knowledge-file`: detection mode end to
        end through config loading (incl. the nested `knowledge` block)."""
        import json

        from PIL import Image

        from lpi_tpu.cli.main import main
        from lpi_tpu.core.config import to_dict

        cfg_path = tmp_path / "cfg.json"
        with open(cfg_path, "w") as f:
            json.dump({"grounding": to_dict(TINY)}, f)
        know_path = tmp_path / "know.json"
        with open(know_path, "w") as f:
            json.dump(KNOW, f)
        img_path = tmp_path / "img.png"
        rng = np.random.RandomState(0)
        Image.fromarray((rng.rand(48, 80, 3) * 255).astype(np.uint8)).save(
            img_path)

        out = main(["predict", str(img_path), "--classes", "cat,dog,bus",
                    "--knowledge-file", str(know_path),
                    "--config", str(cfg_path), "--thresh", "0.0",
                    "--output", str(tmp_path / "out.png")])
        assert len(out["boxes"]) == len(out["scores"]) == len(out["entities"])
        assert set(out["entities"]) <= {"cat", "dog", "bus", "?"}
        assert (tmp_path / "out.png").exists()


class TestPredictorClasses:
    def test_predict_classes_end_to_end(self):
        """GLIPDemo detection-mode equivalent: knowledge captions -> one
        parallel-language encode -> identity positive map -> boxes labelled
        with class names."""
        from lpi_tpu.serve.predictor import GroundingPredictor

        model = GroundedVLModel(TINY)
        tok = BertTokenizer(max_len=16, vocab_size=512)
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(1, 64, 64, 3), jnp.float32)
        ids, mask, _ = tok(["a cat"])
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), images, jnp.asarray(ids),
            jnp.asarray(mask), 0)["params"]
        pred = GroundingPredictor(model, params, None, tok, image_size=64,
                                  score_thresh=0.0, atss_cfg=TINY.atss)
        image = (rng.rand(48, 80, 3) * 255).astype(np.uint8)
        out = pred.predict_classes(image, ["cat", "dog", "bus"], KNOW,
                                   knowledge_type="def_wiki")
        assert len(out["boxes"]) == len(out["scores"]) == len(out["entities"])
        assert set(out["entities"]) <= {"cat", "dog", "bus", "?"}
        if len(out["boxes"]):
            assert out["boxes"].shape[1] == 4
