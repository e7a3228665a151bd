"""Tests for the L2P baseline path through SliNet."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_clip_model import TINY_RET, make_batch
from lpi_tpu.models.clip import SliNet

L2P_CFG = dataclasses.replace(
    TINY_RET,
    lpi=dataclasses.replace(TINY_RET.lpi, prompt_type="l2p",
                            l2p_length=1, l2p_top_k=2))


class TestL2pSliNet:
    def test_forward_and_pool_params(self, rng):
        m = SliNet(L2P_CFG)
        images, ids = make_batch(rng)
        variables = m.init(jax.random.PRNGKey(0), images, ids, 0)
        p = variables["params"]["prompts"]
        assert p["prompt"].shape == (3, 1, 64)  # pool_size x length x width
        assert p["prompt_key"].shape == (3, 64)
        img, txt, vis_p, txt_p, scale = m.apply(variables, images, ids, 1)
        assert img.shape == (2, 24) and txt.shape == (2, 24)
        assert np.isfinite(np.asarray(img)).all()

    def test_reduce_sim_exposed(self, rng):
        m = SliNet(L2P_CFG)
        images, ids = make_batch(rng)
        variables = m.init(jax.random.PRNGKey(0), images, ids, 0)
        feats, reduce_sim = m.apply(variables, images, method=m.encode_image_l2p)
        assert feats.shape == (2, 24)
        assert np.isfinite(float(reduce_sim))

    def test_l2p_differs_from_promptless(self, rng):
        m = SliNet(L2P_CFG)
        images, ids = make_batch(rng)
        variables = m.init(jax.random.PRNGKey(0), images, ids, 0)
        l2p_feats, _ = m.apply(variables, images, method=m.encode_image_l2p)
        frozen = m.apply(variables, images, method=m.extract_visual)
        assert not np.allclose(np.asarray(l2p_feats), np.asarray(frozen), atol=1e-4)
