"""On-chip lane: lower every Pallas kernel through Mosaic and run real steps.

Run with `LPI_ONCHIP=1 pytest -m tpu tests/test_tpu_onchip.py` on a box with
a TPU attached (conftest skips the CPU pinning under LPI_ONCHIP=1). This is
the lane that catches what the CPU-pinned suite structurally cannot: Mosaic
lowering rejections (lane/sublane tiling, VMEM limits) and real-chip numerics
— the r4 quality-gate crash (`_ctile` checking Cout instead of the blocked
K*Cout lane dim, VERDICT r4 Weak #1) shipped exactly through that hole.

Matrix per VERDICT r4 item 2: Cout in {8, 16, 96, 128, 256} x stride {1, 2}
x dtype {f32, bf16} at the public `deform_conv2d_pallas` level (unsupported
channel counts must route to the XLA fallback and still match), direct
kernel dispatches for the Mosaic-legal combos, and one grounding train step
at the driver's GATE config (channels=16).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.tpu


def _on_chip() -> bool:
    return jax.devices()[0].platform in ("tpu", "axon")


requires_chip = pytest.mark.skipif(
    not _on_chip(), reason="needs a real TPU (LPI_ONCHIP=1 on a TPU box)")


@requires_chip
@pytest.mark.parametrize("cout", [8, 16, 96, 128, 256])
@pytest.mark.parametrize("stride", [1, 2])
def test_deform_pallas_matches_fast_onchip(cout, stride):
    """Public op parity on the chip: kernel path for legal channel counts,
    XLA fallback for the rest — both must lower, run, and match."""
    from lpi_tpu.ops.deform_conv import deform_conv2d_fast, deform_conv2d_pallas

    rng = np.random.RandomState(0)
    B, K, H = 2, 9, 16
    C = cout
    Ho = (H + stride - 1) // stride
    feats = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32))
    off = jnp.asarray(0.5 * rng.randn(B, Ho, Ho, 2 * K).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(3, 3, C, cout).astype(np.float32))
    mask = jnp.asarray(rng.randn(B, Ho, Ho, K).astype(np.float32))

    # f32 matmul precision: the two impls contract in different orders, and
    # TPU default precision runs matmuls in bf16 passes (~1e-3 relative
    # noise between formulations — measured; not a kernel bug)
    with jax.default_matmul_precision("highest"):
        got = jax.jit(lambda a, b, c, d: deform_conv2d_pallas(
            a, b, c, mask=d, stride=stride))(feats, off, w, mask)
        want = deform_conv2d_fast(feats, off, w, mask=mask, stride=stride)
        scale = float(jnp.max(jnp.abs(want))) + 1e-9
        np.testing.assert_allclose(np.asarray(got) / scale,
                                   np.asarray(want) / scale, atol=2e-5)

        # gradients through the custom VJPs (or the fallback's scan+remat)
        g = jax.jit(jax.grad(lambda a, b, d: jnp.sum(jnp.tanh(
            deform_conv2d_pallas(a, b, w, mask=d, stride=stride))),
            argnums=(0, 1, 2)))(feats, off, mask)
        gw = jax.grad(lambda a, b, d: jnp.sum(jnp.tanh(
            deform_conv2d_fast(a, b, w, mask=d, stride=stride))),
            argnums=(0, 1, 2))(feats, off, mask)
    for got_g, want_g in zip(g, gw):
        s = float(jnp.max(jnp.abs(want_g))) + 1e-9
        np.testing.assert_allclose(np.asarray(got_g) / s,
                                   np.asarray(want_g) / s, atol=2e-4)


@requires_chip
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_deform_pallas_bf16_product_maps_onchip(dtype):
    """The flagship 256-channel config with bf16 product maps (the
    deform_dtype='auto' bf16 resolution) must lower and track f32."""
    from lpi_tpu.ops.deform_conv import deform_conv2d_fast, deform_conv2d_pallas

    rng = np.random.RandomState(1)
    B, K, H, C = 2, 9, 16, 256
    feats = jnp.asarray(rng.randn(B, H, H, C).astype(np.float32))
    off = jnp.asarray(0.5 * rng.randn(B, H, H, 2 * K).astype(np.float32))
    w = jnp.asarray(0.1 * rng.randn(3, 3, C, C).astype(np.float32))
    got = jax.jit(lambda a, b, c: deform_conv2d_pallas(
        a, b, c, compute_dtype=dtype))(feats, off, w)
    want = deform_conv2d_fast(feats, off, w)
    scale = float(jnp.max(jnp.abs(want))) + 1e-9
    tol = 2e-5 if dtype == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got) / scale,
                               np.asarray(want) / scale, atol=tol)


@requires_chip
def test_window_accumulate_kernels_direct_onchip():
    """Direct Mosaic dispatch of every kernel family at a legal channel
    count (Cout=128): single-tap, stacked taps, inpad, stride-2 phases."""
    from lpi_tpu.ops.deform_window_kernel import (
        window_accumulate, window_accumulate_reference,
        window_accumulate_taps, window_accumulate_taps_inpad,
        window_accumulate_taps_inpad_reference,
        window_accumulate_taps_reference, window_accumulate_taps_s2,
        window_accumulate_taps_s2_reference)

    rng = np.random.RandomState(2)
    B, Ho, Wo, C, K, m = 1, 8, 8, 128, 9, 3
    Hp, Wp = Ho + 2 * m + 1, Wo + 2 * m + 1

    hp = jnp.asarray(rng.randn(B, Hp, Wp, C).astype(np.float32))
    oy = jnp.asarray(np.clip(rng.randn(B, Ho, Wo), -m, m).astype(np.float32))
    ox = jnp.asarray(np.clip(rng.randn(B, Ho, Wo), -m, m).astype(np.float32))
    got = jax.jit(lambda a, b, c: window_accumulate(a, b, c, m))(hp, oy, ox)
    want = window_accumulate_reference(hp, oy, ox, m)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)

    hp_all = jnp.asarray(rng.randn(B, Hp, Wp, K * C).astype(np.float32))
    oyk = jnp.asarray(np.clip(rng.randn(B, K, Ho, Wo), -m, m).astype(np.float32))
    oxk = jnp.asarray(np.clip(rng.randn(B, K, Ho, Wo), -m, m).astype(np.float32))
    g = jnp.asarray(rng.rand(B, K, Ho, Wo).astype(np.float32))
    got = jax.jit(lambda a, b, c, d: window_accumulate_taps(
        a, b, c, d, m, K))(hp_all, oyk, oxk, g)
    want = window_accumulate_taps_reference(hp_all, oyk, oxk, g, m, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-3)

    h_all = jnp.asarray(rng.randn(B, Ho, Wo, K * C).astype(np.float32))
    got = jax.jit(lambda a, b, c, d: window_accumulate_taps_inpad(
        a, b, c, d, m, K, 3))(h_all, oyk, oxk, g)
    want = window_accumulate_taps_inpad_reference(h_all, oyk, oxk, g, m, K, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-3)

    Hp2 = Ho + m  # contract: Hp2 >= Ho2 + m
    hps = [jnp.asarray(rng.randn(B, Hp2, Hp2, K * C).astype(np.float32))
           for _ in range(4)]
    got = jax.jit(lambda *a: window_accumulate_taps_s2(*a, m, K))(
        *hps, oyk, oxk, g)
    want = window_accumulate_taps_s2_reference(*hps, oyk, oxk, g, m, K)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-3)


@requires_chip
def test_grounding_gate_train_step_onchip():
    """One grounding train step at the driver GATE config (channels=16 ->
    the XLA fallback path) on the chip: must compile, run, and stay finite.
    This is the exact config whose Mosaic rejection turned BENCH_r04's
    quality_ok false."""
    import bench

    cfg = bench.gate_grounding_config()
    from lpi_tpu.continual.grounding_learner import GroundingLearner
    from lpi_tpu.data.bert_tokenizer import BertTokenizer
    from lpi_tpu.data.grounding import synthetic_grounding_task

    tok = BertTokenizer(max_len=cfg.bert.max_query_len,
                        vocab_size=cfg.bert.vocab_size)
    ds = synthetic_grounding_task(0, 2 * cfg.batch_size, cfg.image_size, tok)
    sample = next(ds.batches(cfg.batch_size))
    learner = GroundingLearner(cfg, sample_batch=sample)
    metrics = learner.train_task(ds, epochs=1)
    assert np.isfinite(metrics["total"]), metrics
