"""Converter coverage against REAL checkpoint key manifests (VERDICT r2 #5).

`tests/data/*.manifest.txt` are the exact state-dict key+shape namespaces of
the reference's torch model classes, dumped by instantiating them offline
(GLIP-T(A)+LPI: `build_detection_model(cfg)` with the LPI yaml — the
namespace `glip_a_tiny_o365.pth` populates modulo `model_serialization.py`
remaps; CLIP: the vendored `retrieval/models/clip/model.py` CLIP class at
ViT-B/16 dims — the OpenAI checkpoint namespace). Generator:
`tests/data/gen_manifests.py` (requires /root/reference; manifests are
vendored so tests don't).

The tests prove, without weights in the container:
* the converters CONSUME every checkpoint key (nothing silently dropped
  beyond the known non-parameter/untrained remainder), and
* the converted output FILLS every leaf of the Flax param tree it claims to
  cover (shape-exact), so a real checkpoint load risk reduces to numerics —
  which the parity tests pin.
"""

import os

import numpy as np
import pytest

# NOT in the `-m fast` lane: both manifest-coverage classes init the
# full-size model trees (400s-class compiles on this 1-core box). They run
# in the default (`not slow`) suite.
DATA = os.path.join(os.path.dirname(__file__), "data")


def load_manifest(name):
    path = os.path.join(DATA, name)
    if not os.path.exists(path):
        pytest.skip(f"manifest {name} not vendored")
    out = {}
    with open(path) as f:
        for line in f:
            key, shape = line.rsplit(" ", 1)
            out[key] = tuple(int(s) for s in shape.split(",") if s.strip())
    return out


def synthesize(manifest, seed=0):
    r = np.random.RandomState(seed)
    return {k: (0.02 * r.randn(*shape)).astype(np.float32) if shape
            else np.float32(r.randn())
            for k, shape in manifest.items()}


class TestClipManifestCoverage:
    def test_converter_consumes_and_fills(self):
        import jax

        from lpi_tpu.core.config import CLIPConfig
        from lpi_tpu.models.clip.convert import convert_openai_clip
        from lpi_tpu.models.clip.model import CLIP

        manifest = load_manifest("clip_vit_b16.manifest.txt")
        sd = synthesize(manifest)
        params = convert_openai_clip(sd)

        # element-count conservation: every checkpoint scalar lands in the
        # converted tree exactly once (stacking/transposition preserves
        # counts), so nothing in the OpenAI namespace is silently dropped
        import jax

        n_ckpt = sum(int(np.prod(s)) if s else 1 for s in manifest.values())
        n_conv = sum(int(np.size(leaf)) for leaf in jax.tree.leaves(params))
        assert n_ckpt == n_conv, (n_ckpt, n_conv)

        # converted tree must fill 100% of the Flax CLIP param tree
        cfg = CLIPConfig()  # ViT-B/16 defaults
        import jax.numpy as jnp
        import numpy as _np

        model = CLIP(cfg)
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3)),
            jnp.zeros((1, cfg.context_length), jnp.int32))
        from flax import traverse_util

        want = traverse_util.flatten_dict(shapes["params"])
        got = traverse_util.flatten_dict(params)
        missing = set(want) - set(got)
        assert not missing, f"flax leaves not filled: {sorted(missing)[:10]}"
        extra = set(got) - set(want)
        assert not extra, f"converted leaves with no home: {sorted(extra)[:10]}"
        for k in want:
            assert tuple(_np.shape(got[k])) == tuple(want[k].shape), (
                k, _np.shape(got[k]), want[k].shape)


# The reference model ALIASES large subtrees, so state_dict carries those
# weights multiple times: PromptEncoder holds refs into both backbones
# (whole dual tower again under `encoder.*`, `prompt/prompt.py`), and the
# language wrapper re-exposes `self.embeddings = self.model.embeddings` /
# `self.encoder = self.model.encoder` (`bert_model.py:40-42`). The converter
# consumes the home paths; aliases are duplicates.
ALIAS_PREFIXES = (
    "encoder.",
    "language_backbone.body.embeddings.",
    "language_backbone.body.encoder.",
)
NON_PARAM_SUFFIXES = (
    ".position_ids",                # registered buffer, not a weight
    ".attn_mask",
)
NON_PARAM_PREFIXES = (
    "rpn.anchor_generator.",        # cell_anchors buffers — lpi_tpu computes
                                    # anchors at trace time (models/glip/anchors.py)
)


class TestGlipManifestCoverage:
    @pytest.fixture(scope="class")
    def manifest(self):
        return load_manifest("glip_t_lpi.manifest.txt")

    def test_converter_consumes_checkpoint_namespace(self, manifest):
        from lpi_tpu.models.glip.convert import convert_glip

        sd = synthesize(manifest)
        flat, unmapped = convert_glip(sd, num_tasks=12)
        hard_misses = [
            k for k in unmapped
            if not k.startswith(ALIAS_PREFIXES)
            and not k.startswith(NON_PARAM_PREFIXES)
            and not k.endswith(NON_PARAM_SUFFIXES)]
        assert not hard_misses, (
            f"{len(hard_misses)} checkpoint keys unconsumed, e.g. "
            f"{sorted(hard_misses)[:15]}")

    def test_converted_fills_model_tree(self, manifest):
        import jax
        import jax.numpy as jnp
        from flax import traverse_util

        from lpi_tpu.core.config import GroundingConfig
        from lpi_tpu.models.glip.convert import convert_glip
        from lpi_tpu.models.glip.grounding import GroundedVLModel

        sd = synthesize(manifest)
        flat, _ = convert_glip(sd, num_tasks=12)

        import dataclasses

        # param shapes don't depend on image size; trace small for speed
        cfg = dataclasses.replace(GroundingConfig(), image_size=64)
        model = GroundedVLModel(cfg)
        shapes = jax.eval_shape(
            model.init, jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.image_size, cfg.image_size, 3)),
            jnp.zeros((1, cfg.bert.max_query_len), jnp.int32),
            jnp.zeros((1, cfg.bert.max_query_len), jnp.float32), 0)
        want = traverse_util.flatten_dict(shapes["params"])

        got = dict(flat)
        missing = sorted(set(want) - set(got))
        assert not missing, (
            f"{len(missing)} flax leaves not filled by the converter, e.g. "
            f"{['/'.join(k) for k in missing[:15]]}")
        extra = sorted(set(got) - set(want))
        assert not extra, (
            f"{len(extra)} converted leaves with no home, e.g. "
            f"{['/'.join(k) for k in extra[:15]]}")
        for k in want:
            assert tuple(np.shape(got[k])) == tuple(want[k].shape), (
                "/".join(k), np.shape(got[k]), want[k].shape)
