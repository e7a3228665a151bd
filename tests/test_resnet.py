"""Tests for the ResNet alternative backbone + registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.models.glip.resnet import ResNet, build_backbone, BACKBONES


class TestResNet:
    def test_stage_shapes(self, rng):
        m = ResNet(blocks=(1, 1, 1, 1), base_width=8)
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(v, x)
        assert len(outs) == 3
        assert outs[0].shape == (1, 8, 8, 64)    # C3, stride 8
        assert outs[1].shape == (1, 4, 4, 128)   # C4, stride 16
        assert outs[2].shape == (1, 2, 2, 256)   # C5, stride 32

    def test_fpn_compatible(self, rng):
        from lpi_tpu.models.glip.fpn import FPN

        m = ResNet(blocks=(1, 1, 1, 1), base_width=8)
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        v = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(v, x)
        fpn = FPN(out_channels=16)
        fv = fpn.init(jax.random.PRNGKey(1), outs)
        levels = fpn.apply(fv, outs)
        assert len(levels) == 5

    def test_registry(self):
        assert "swint-fpn-retinanet" in BACKBONES
        assert "resnet50-fpn" in BACKBONES
        with pytest.raises(ValueError, match="unknown backbone"):
            build_backbone("vgg", None)
