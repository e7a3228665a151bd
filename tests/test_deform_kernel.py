"""Pallas windowed-deform kernel: fwd/bwd vs pure-jnp reference (interpret)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.ops.deform_window_kernel import (window_accumulate,
                                              window_accumulate_reference)

# `-m fast` lane: only the small interpret-mode forward/window classes.
# The grad-parity classes jit both the Pallas and the XLA-oracle paths
# (10-50s compiles each on this 1-core box) and run in the default
# (`not slow`) suite; the on-chip matrix lives in test_tpu_onchip.py.

M = 2


def _inputs(rng, B=2, Ho=6, Wo=6, C=8, m=M):
    hp = rng.randn(B, Ho + 2 * m + 1, Wo + 2 * m + 1, C).astype(np.float32)
    oy = ((rng.rand(B, Ho, Wo) * 2 - 1) * m).astype(np.float32)
    ox = ((rng.rand(B, Ho, Wo) * 2 - 1) * m).astype(np.float32)
    return jnp.asarray(hp), jnp.asarray(oy), jnp.asarray(ox)


class TestForward:
    pytestmark = pytest.mark.fast

    def test_matches_reference(self, rng):
        hp, oy, ox = _inputs(rng)
        got = window_accumulate(hp, oy, ox, M, True)
        want = window_accumulate_reference(hp, oy, ox, M)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)

    def test_zero_offsets_center_tap(self, rng):
        """o=0 -> pure center displacement: acc == hp interior window."""
        hp, _, _ = _inputs(rng)
        z = jnp.zeros((2, 6, 6))
        got = np.asarray(window_accumulate(hp, z, z, M, True))
        want = np.asarray(hp[:, M:M + 6, M:M + 6, :])
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_odd_channel_tile(self, rng):
        hp, oy, ox = _inputs(rng, C=24)  # tile 8, 3 grid steps
        got = window_accumulate(hp, oy, ox, M, True)
        want = window_accumulate_reference(hp, oy, ox, M)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


class TestBackward:
    def test_grads_match_reference_grads(self, rng):
        hp, oy, ox = _inputs(rng, B=1, Ho=5, Wo=5, C=8)
        ct_seed = jnp.asarray(rng.randn(1, 5, 5, 8).astype(np.float32))

        def loss_k(h, y, x):
            return jnp.sum(window_accumulate(h, y, x, M, True) * ct_seed)

        def loss_r(h, y, x):
            return jnp.sum(window_accumulate_reference(h, y, x, M) * ct_seed)

        gk = jax.grad(loss_k, argnums=(0, 1, 2))(hp, oy, ox)
        gr = jax.grad(loss_r, argnums=(0, 1, 2))(hp, oy, ox)
        for a, b, name in zip(gk, gr, ("dhp", "doy", "dox")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4, err_msg=name)

    def test_offset_grad_nonzero(self, rng):
        hp, oy, ox = _inputs(rng, B=1, Ho=4, Wo=4, C=8)
        g = jax.grad(lambda y: jnp.sum(
            window_accumulate(hp, y, ox, M, True) ** 2))(oy)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


class TestDeformConvPallas:
    """Full op built on the kernel vs the unrolled fast path."""

    def test_matches_fast(self, rng):
        from lpi_tpu.ops.deform_conv import (deform_conv2d_fast,
                                             deform_conv2d_pallas)

        feat = rng.randn(2, 10, 10, 8).astype(np.float32)
        w = rng.randn(3, 3, 8, 8).astype(np.float32)
        offsets = ((rng.rand(2, 10, 10, 18) * 2 - 1) * 2.5).astype(np.float32)
        mask = rng.randn(2, 10, 10, 9).astype(np.float32)
        bias = rng.randn(8).astype(np.float32)
        a = np.asarray(deform_conv2d_fast(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            bias=jnp.asarray(bias), mask=jnp.asarray(mask), max_offset=2))
        b = np.asarray(deform_conv2d_pallas(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            bias=jnp.asarray(bias), mask=jnp.asarray(mask), max_offset=2,
            interpret=True))
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)

    def test_grad_matches_fast(self, rng):
        from lpi_tpu.ops.deform_conv import (deform_conv2d_fast,
                                             deform_conv2d_pallas)

        feat = jnp.asarray(rng.randn(1, 6, 6, 8).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32))
        off = jnp.asarray(((rng.rand(1, 6, 6, 18) * 2 - 1) * 1.5)
                          .astype(np.float32))

        ga = jax.grad(lambda f, o: jnp.sum(
            deform_conv2d_fast(f, o, w, max_offset=2) ** 2),
            argnums=(0, 1))(feat, off)
        gb = jax.grad(lambda f, o: jnp.sum(
            deform_conv2d_pallas(f, o, w, max_offset=2, interpret=True) ** 2),
            argnums=(0, 1))(feat, off)
        for a, b, name in zip(ga, gb, ("dfeat", "doff")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3, err_msg=name)

    def test_stride2_matches_fast(self, rng):
        from lpi_tpu.ops.deform_conv import (deform_conv2d_fast,
                                             deform_conv2d_pallas)

        feat = rng.randn(1, 8, 8, 8).astype(np.float32)
        w = rng.randn(3, 3, 8, 8).astype(np.float32)
        offsets = ((rng.rand(1, 4, 4, 18) * 2 - 1) * 1.5).astype(np.float32)
        mask = rng.randn(1, 4, 4, 9).astype(np.float32)
        a = np.asarray(deform_conv2d_fast(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            mask=jnp.asarray(mask), stride=2, max_offset=2))
        b = np.asarray(deform_conv2d_pallas(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            mask=jnp.asarray(mask), stride=2, max_offset=2, interpret=True))
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


class TestWindowAccumulateTaps:
    pytestmark = pytest.mark.fast

    """Stacked-tap kernel vs per-tap reference semantics."""

    def test_fwd_matches_reference(self, rng):
        from lpi_tpu.ops.deform_window_kernel import (
            window_accumulate_taps, window_accumulate_taps_reference)

        B, Ho, Wo, Cout, K, m = 2, 5, 5, 8, 9, 2
        hp = rng.randn(B, Ho + 2 * m + 1, Wo + 2 * m + 1,
                       K * Cout).astype(np.float32)
        oy = ((rng.rand(B, K, Ho, Wo) * 2 - 1) * m).astype(np.float32)
        ox = ((rng.rand(B, K, Ho, Wo) * 2 - 1) * m).astype(np.float32)
        g = rng.rand(B, K, Ho, Wo).astype(np.float32)
        got = window_accumulate_taps(jnp.asarray(hp), jnp.asarray(oy),
                                     jnp.asarray(ox), jnp.asarray(g),
                                     m, K, True)
        want = window_accumulate_taps_reference(
            jnp.asarray(hp), jnp.asarray(oy), jnp.asarray(ox),
            jnp.asarray(g), m, K)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

    def test_grads_match_reference(self, rng):
        from lpi_tpu.ops.deform_window_kernel import (
            window_accumulate_taps, window_accumulate_taps_reference)

        B, Ho, Wo, Cout, K, m = 1, 4, 4, 8, 4, 1
        hp = jnp.asarray(rng.randn(B, Ho + 2 * m + 1, Wo + 2 * m + 1,
                                   K * Cout).astype(np.float32))
        oy = jnp.asarray(((rng.rand(B, K, Ho, Wo) * 2 - 1) * m)
                         .astype(np.float32))
        ox = jnp.asarray(((rng.rand(B, K, Ho, Wo) * 2 - 1) * m)
                         .astype(np.float32))
        g = jnp.asarray(rng.rand(B, K, Ho, Wo).astype(np.float32))
        seed = jnp.asarray(rng.randn(B, Ho, Wo, Cout).astype(np.float32))

        def lk(h, y, x, gg):
            return jnp.sum(window_accumulate_taps(h, y, x, gg, m, K,
                                                  True) * seed)

        def lr(h, y, x, gg):
            return jnp.sum(window_accumulate_taps_reference(
                h, y, x, gg, m, K) * seed)

        gk = jax.grad(lk, argnums=(0, 1, 2, 3))(hp, oy, ox, g)
        gr = jax.grad(lr, argnums=(0, 1, 2, 3))(hp, oy, ox, g)
        for a, b, name in zip(gk, gr, ("dhp", "doy", "dox", "dg")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4, err_msg=name)


class TestFusedDeform:
    """Sample-first fused kernel vs the fast path (fwd + all grads)."""

    def test_matches_fast(self, rng):
        from lpi_tpu.ops.deform_conv import (deform_conv2d_fast,
                                             deform_conv2d_fused)

        feat = rng.randn(2, 10, 10, 8).astype(np.float32)
        w = rng.randn(3, 3, 8, 8).astype(np.float32)
        offsets = ((rng.rand(2, 10, 10, 18) * 2 - 1) * 2.5).astype(np.float32)
        mask = rng.randn(2, 10, 10, 9).astype(np.float32)
        bias = rng.randn(8).astype(np.float32)
        a = np.asarray(deform_conv2d_fast(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            bias=jnp.asarray(bias), mask=jnp.asarray(mask), max_offset=2))
        b = np.asarray(deform_conv2d_fused(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            bias=jnp.asarray(bias), mask=jnp.asarray(mask), max_offset=2,
            interpret=True))
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)

    def test_all_grads_match_fast(self, rng):
        from lpi_tpu.ops.deform_conv import (deform_conv2d_fast,
                                             deform_conv2d_fused)

        feat = jnp.asarray(rng.randn(1, 6, 6, 8).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32))
        off = jnp.asarray(((rng.rand(1, 6, 6, 18) * 2 - 1) * 1.5)
                          .astype(np.float32))
        mask = jnp.asarray(rng.randn(1, 6, 6, 9).astype(np.float32))

        def loss(fn, interp):
            def f(fe, o, ww, mk):
                kw = dict(max_offset=2)
                if interp is not None:
                    kw["interpret"] = interp
                return jnp.sum(fn(fe, o, ww, mask=mk, **kw) ** 2)
            return jax.grad(f, argnums=(0, 1, 2, 3))(feat, off, w, mask)

        ga = loss(deform_conv2d_fast, None)
        gb = loss(deform_conv2d_fused, True)
        for a, b, name in zip(ga, gb, ("dfeat", "doff", "dw", "dmask")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3, err_msg=name)

    def test_stride2(self, rng):
        from lpi_tpu.ops.deform_conv import (deform_conv2d_fast,
                                             deform_conv2d_fused)

        feat = rng.randn(1, 8, 8, 8).astype(np.float32)
        w = rng.randn(3, 3, 8, 8).astype(np.float32)
        offsets = np.full((1, 4, 4, 18), 0.4, np.float32)
        a = np.asarray(deform_conv2d_fast(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            stride=2, max_offset=2))
        b = np.asarray(deform_conv2d_fused(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            stride=2, max_offset=2, interpret=True))
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)

    def test_multi_channel_tile(self, rng):
        """C=256 -> two 128-channel grid tiles (the real DyConv shape)."""
        from lpi_tpu.ops.deform_conv import (deform_conv2d_fast,
                                             deform_conv2d_fused)

        feat = rng.randn(1, 6, 6, 256).astype(np.float32)
        w = (rng.randn(3, 3, 256, 8) * 0.05).astype(np.float32)
        offsets = ((rng.rand(1, 6, 6, 18) * 2 - 1) * 1.5).astype(np.float32)
        a = np.asarray(deform_conv2d_fast(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            max_offset=2))
        b = np.asarray(deform_conv2d_fused(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            max_offset=2, interpret=True))
        np.testing.assert_allclose(a, b, atol=1e-3, rtol=1e-3)
        g1 = jax.grad(lambda f: jnp.sum(deform_conv2d_fast(
            f, jnp.asarray(offsets), jnp.asarray(w), max_offset=2) ** 2))(
            jnp.asarray(feat))
        g2 = jax.grad(lambda f: jnp.sum(deform_conv2d_fused(
            f, jnp.asarray(offsets), jnp.asarray(w), max_offset=2,
            interpret=True) ** 2))(jnp.asarray(feat))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   atol=1e-2, rtol=1e-2)


class TestDeformConvPallasBf16:
    """bf16 product-map mode: same math, half the kernel's HBM stream.

    `compute_dtype=bfloat16` stores the per-tap product maps (and their
    cotangent) in bf16 while offsets and in-kernel accumulation stay fp32 —
    must track the fp32 kernel to ~bf16 mantissa error."""

    def test_fwd_and_grads_track_fp32(self, rng):
        from lpi_tpu.ops.deform_conv import deform_conv2d_pallas

        feat = jnp.asarray(rng.randn(2, 12, 12, 16).astype(np.float32))
        w = jnp.asarray((rng.randn(3, 3, 16, 16) * 0.1).astype(np.float32))
        off = jnp.asarray(((rng.rand(2, 12, 12, 18) * 2 - 1) * 1.5)
                          .astype(np.float32))
        mask = jnp.asarray(rng.randn(2, 12, 12, 9).astype(np.float32))

        outs, grads = {}, {}
        for dt in (jnp.float32, jnp.bfloat16):
            outs[dt] = np.asarray(deform_conv2d_pallas(
                feat, off, w, mask=mask, max_offset=2, interpret=True,
                compute_dtype=dt))
            grads[dt] = jax.grad(
                lambda f, o: jnp.sum(deform_conv2d_pallas(
                    f, o, w, mask=mask, max_offset=2, interpret=True,
                    compute_dtype=dt) ** 2), argnums=(0, 1))(feat, off)
        ref = outs[jnp.float32]
        rel = np.linalg.norm(outs[jnp.bfloat16] - ref) / np.linalg.norm(ref)
        assert rel < 1e-2, rel
        for a, b, name in zip(grads[jnp.bfloat16], grads[jnp.float32],
                              ("dfeat", "doff")):
            gr = (np.linalg.norm(np.asarray(a) - np.asarray(b))
                  / np.linalg.norm(np.asarray(b)))
            assert gr < 2e-2, (name, gr)


class TestWindowAccumulateTapsS2:
    """Stride-2 phase-split kernel vs its strided-slice oracle."""

    def test_fwd_and_grads_match_reference(self, rng):
        from lpi_tpu.ops.deform_window_kernel import (
            window_accumulate_taps_s2, window_accumulate_taps_s2_reference)

        B, Ho, Wo, Cout, K, m = 1, 4, 4, 8, 4, 1
        Hp2 = Ho + m + 1
        hps = [jnp.asarray(rng.randn(B, Hp2, Hp2, K * Cout)
                           .astype(np.float32)) for _ in range(4)]
        oy = jnp.asarray(((rng.rand(B, K, Ho, Wo) * 2 - 1) * m)
                         .astype(np.float32))
        ox = jnp.asarray(((rng.rand(B, K, Ho, Wo) * 2 - 1) * m)
                         .astype(np.float32))
        g = jnp.asarray(rng.rand(B, K, Ho, Wo).astype(np.float32))
        seed = jnp.asarray(rng.randn(B, Ho, Wo, Cout).astype(np.float32))

        got = window_accumulate_taps_s2(*hps, oy, ox, g, m, K, True)
        want = window_accumulate_taps_s2_reference(*hps, oy, ox, g, m, K)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-4, rtol=1e-4)

        def lk(h0, h1, h2, h3, y, x, gg):
            return jnp.sum(window_accumulate_taps_s2(
                h0, h1, h2, h3, y, x, gg, m, K, True) * seed)

        def lr(h0, h1, h2, h3, y, x, gg):
            return jnp.sum(window_accumulate_taps_s2_reference(
                h0, h1, h2, h3, y, x, gg, m, K) * seed)

        args = (*hps, oy, ox, g)
        gk = jax.grad(lk, argnums=tuple(range(7)))(*args)
        gr = jax.grad(lr, argnums=tuple(range(7)))(*args)
        names = ("dhp00", "dhp01", "dhp10", "dhp11", "doy", "dox", "dg")
        for a, b, name in zip(gk, gr, names):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4, err_msg=name)

    def test_conv_stride2_odd_input_matches_fast(self, rng):
        # odd input side (the P6->P7 conv_down case, 7 -> 4)
        from lpi_tpu.ops.deform_conv import (deform_conv2d_fast,
                                             deform_conv2d_pallas)

        feat = rng.randn(2, 7, 7, 8).astype(np.float32)
        w = rng.randn(3, 3, 8, 8).astype(np.float32)
        offsets = ((rng.rand(2, 4, 4, 18) * 2 - 1) * 1.5).astype(np.float32)
        mask = rng.randn(2, 4, 4, 9).astype(np.float32)
        a = np.asarray(deform_conv2d_fast(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            mask=jnp.asarray(mask), stride=2, max_offset=2))
        b = np.asarray(deform_conv2d_pallas(
            jnp.asarray(feat), jnp.asarray(offsets), jnp.asarray(w),
            mask=jnp.asarray(mask), stride=2, max_offset=2, interpret=True))
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)

    def test_conv_stride2_grads_match_fast(self, rng):
        from lpi_tpu.ops.deform_conv import (deform_conv2d_fast,
                                             deform_conv2d_pallas)

        feat = jnp.asarray(rng.randn(1, 8, 8, 8).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 8, 8).astype(np.float32))
        off = jnp.asarray(((rng.rand(1, 4, 4, 18) * 2 - 1) * 1.5)
                          .astype(np.float32))

        ga = jax.grad(lambda f, o: jnp.sum(
            deform_conv2d_fast(f, o, w, stride=2, max_offset=2) ** 2),
            argnums=(0, 1))(feat, off)
        gb = jax.grad(lambda f, o: jnp.sum(
            deform_conv2d_pallas(f, o, w, stride=2, max_offset=2,
                                 interpret=True) ** 2),
            argnums=(0, 1))(feat, off)
        for a, b, name in zip(ga, gb, ("dfeat", "doff")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-3, rtol=1e-3, err_msg=name)
