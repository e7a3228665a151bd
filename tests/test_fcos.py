"""Tests for the FCOS alternative head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.models.glip.fcos import (
    DEFAULT_RANGES,
    FCOSHead,
    fcos_assign,
    fcos_locations,
    fcos_losses,
)


class TestLocations:
    def test_centers_on_stride_grid(self):
        locs = fcos_locations([(2, 3)], [8])
        assert locs[0].shape == (6, 2)
        np.testing.assert_allclose(locs[0][0], [4.0, 4.0])
        np.testing.assert_allclose(locs[0][1], [12.0, 4.0])


class TestAssign:
    def test_point_in_box_positive(self):
        pts = jnp.asarray([[10.0, 10.0], [50.0, 50.0]])
        rngs = jnp.asarray([[-1.0, 1e8], [-1.0, 1e8]])
        gt = jnp.asarray([[0.0, 0, 20, 20]])
        labels, tgt, ctr = fcos_assign(pts, rngs, gt, jnp.asarray([3]),
                                       jnp.asarray([True]))
        assert int(labels[0]) == 3 and int(labels[1]) == 0
        np.testing.assert_allclose(np.asarray(tgt[0]), [10, 10, 10, 10])
        assert float(ctr[0]) == pytest.approx(1.0, abs=1e-5)

    def test_smallest_box_wins(self):
        pts = jnp.asarray([[10.0, 10.0]])
        rngs = jnp.asarray([[-1.0, 1e8]])
        gt = jnp.asarray([[0.0, 0, 100, 100], [5.0, 5, 15, 15]])
        labels, _, _ = fcos_assign(pts, rngs, gt, jnp.asarray([1, 2]),
                                   jnp.asarray([True, True]))
        assert int(labels[0]) == 2

    def test_range_gating(self):
        pts = jnp.asarray([[10.0, 10.0]])
        rngs = jnp.asarray([[64.0, 128.0]])  # too high for a 20px box
        gt = jnp.asarray([[0.0, 0, 20, 20]])
        labels, _, _ = fcos_assign(pts, rngs, gt, jnp.asarray([1]),
                                   jnp.asarray([True]))
        assert int(labels[0]) == 0


class TestHeadAndLoss:
    def test_head_shapes(self, rng):
        head = FCOSHead(num_classes=3, channels=8, num_convs=1, num_levels=2)
        feats = [jnp.asarray(rng.randn(2, 8, 8, 8).astype(np.float32)),
                 jnp.asarray(rng.randn(2, 4, 4, 8).astype(np.float32))]
        v = head.init(jax.random.PRNGKey(0), feats)
        out = head.apply(v, feats)
        assert out["cls_logits"][0].shape == (2, 8, 8, 3)
        assert out["ltrb"][1].shape == (2, 4, 4, 4)
        assert (np.asarray(out["ltrb"][0]) > 0).all()  # exp'd distances

    def test_losses_finite_and_ordered(self, rng):
        shapes = [(8, 8), (4, 4)]
        strides = [8, 16]
        locs = fcos_locations(shapes, strides)
        points = jnp.asarray(np.concatenate(locs))
        ranges = jnp.asarray(np.concatenate([
            np.tile(DEFAULT_RANGES[i], (len(locs[i]), 1)) for i in range(2)
        ]).astype(np.float32))
        P = points.shape[0]
        gt = jnp.asarray([[[8.0, 8, 40, 40]]])
        gl = jnp.asarray([[1]])
        gv = jnp.asarray([[True]])
        bad = fcos_losses(points, ranges,
                          jnp.asarray(rng.randn(1, P, 2).astype(np.float32)),
                          jnp.ones((1, P, 4)), jnp.zeros((1, P)), gt, gl, gv)
        for k in ("loss_cls", "loss_reg", "loss_centerness"):
            assert np.isfinite(float(bad[k]))
        assert int(bad["num_pos"]) > 0
