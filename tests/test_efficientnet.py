"""EfficientNet + BiFPN alternative backbone."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.models.glip.efficientnet import (
    BiFPNLayer,
    EfficientNet,
    EfficientNetBiFPN,
    _round_channels,
)


class TestEfficientNet:
    def test_round_channels(self):
        assert _round_channels(32) == 32
        assert _round_channels(33) == 32
        assert _round_channels(20) == 24  # 16 < 0.9*20 -> bumped

    def test_stride_pyramid(self, rng):
        m = EfficientNet(width_mult=0.25, depth_mult=0.34)
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        c3, c4, c5 = m.apply(v, x)
        assert c3.shape[1:3] == (8, 8)    # stride 8
        assert c4.shape[1:3] == (4, 4)    # stride 16
        assert c5.shape[1:3] == (2, 2)    # stride 32


class TestBiFPN:
    def test_fusion_preserves_shapes(self, rng):
        feats = [jnp.asarray(rng.randn(1, s, s, 8).astype(np.float32))
                 for s in (16, 8, 4, 2, 1)]
        m = BiFPNLayer(channels=8, num_levels=5)
        v = m.init(jax.random.PRNGKey(0), feats)
        outs = m.apply(v, feats)
        for o, f in zip(outs, feats):
            assert o.shape == f.shape
            assert np.isfinite(np.asarray(o)).all()

    def test_full_backbone(self, rng):
        m = EfficientNetBiFPN(channels=8, num_bifpn=1, width_mult=0.25,
                              depth_mult=0.34)
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(v, x)
        assert len(outs) == 5
        assert outs[0].shape == (1, 8, 8, 8)
        assert outs[4].shape == (1, 1, 1, 8)


class TestFBNet:
    def test_stride_pyramid(self, rng):
        from lpi_tpu.models.glip.fbnet import FBNet

        m = FBNet(stages=((3, 1, 1, 8, 1), (3, 2, 6, 8, 1), (5, 2, 6, 8, 1),
                          (3, 2, 6, 16, 1), (5, 1, 6, 16, 1),
                          (5, 2, 6, 24, 1), (3, 1, 6, 24, 1)))
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        c3, c4, c5 = m.apply(v, x)
        assert c3.shape[1:3] == (8, 8)
        assert c4.shape[1:3] == (4, 4)
        assert c5.shape[1:3] == (2, 2)

    def test_mixed_operation(self, rng):
        from lpi_tpu.models.glip.fbnet import mixed_operation_random

        ops = [lambda x: x * 1.0, lambda x: x * 3.0]
        x = jnp.ones((2, 4))
        np.testing.assert_allclose(mixed_operation_random(ops, x), 2 * x)
        np.testing.assert_allclose(mixed_operation_random(ops, x, 1), 3 * x)
        per = mixed_operation_random(ops, x, np.asarray([0, 1]))
        np.testing.assert_allclose(np.asarray(per),
                                   np.stack([np.ones(4), 3 * np.ones(4)]))
