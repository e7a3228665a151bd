"""Golden tests for the solver schedules vs hand-computed torch semantics
(`maskrcnn_benchmark/solver/lr_scheduler.py`)."""

import math

import numpy as np
import pytest

from lpi_tpu.continual.schedules import (
    WarmupReduceLROnPlateau,
    warmup_cosine,
    warmup_multistep,
)

pytestmark = pytest.mark.fast


class TestWarmupMultiStep:
    def test_linear_warmup_then_decays(self):
        s = warmup_multistep(1.0, [10, 20], gamma=0.1, warmup_factor=1 / 3,
                             warmup_iters=4, warmup_method="linear")
        # step 0: wf = 1/3; step 2: 1/3*(1-0.5)+0.5 = 2/3
        np.testing.assert_allclose(float(s(0)), 1 / 3, rtol=1e-6)
        np.testing.assert_allclose(float(s(2)), 2 / 3, rtol=1e-6)
        # past warmup, before milestones
        np.testing.assert_allclose(float(s(5)), 1.0, rtol=1e-6)
        # bisect_right: milestone hit AT the step counts
        np.testing.assert_allclose(float(s(10)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(s(19)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(s(25)), 0.01, rtol=1e-6)

    def test_constant_warmup(self):
        s = warmup_multistep(2.0, [100], warmup_factor=0.5, warmup_iters=3,
                             warmup_method="constant")
        np.testing.assert_allclose(float(s(1)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(s(3)), 2.0, rtol=1e-6)

    def test_rejects_unsorted(self):
        with pytest.raises(ValueError):
            warmup_multistep(1.0, [20, 10])


class TestWarmupCosine:
    def test_reference_formula(self):
        base, max_iters, wu = 0.01, 100, 10
        s = warmup_cosine(base, max_iters, warmup_factor=1 / 3,
                          warmup_iters=wu, eta_min=0.0)
        # in warmup
        alpha = 5 / wu
        np.testing.assert_allclose(float(s(5)), base * (1 / 3 * (1 - alpha) + alpha),
                                   rtol=1e-6)
        # past warmup: reference divides by max_iters (not max_iters - wu)
        t = 60
        expect = base * 0.5 * (1 + math.cos(math.pi * (t - wu) / max_iters))
        np.testing.assert_allclose(float(s(t)), expect, rtol=1e-6)


class TestPlateau:
    def test_warmup_then_plateau_decay(self):
        sch = WarmupReduceLROnPlateau(1.0, gamma=0.5, warmup_factor=1 / 3,
                                      warmup_iters=3, patience=1)
        lrs = [sch.step() for _ in range(3)]
        # the reference jumps to 1.0 at the last warmup step
        np.testing.assert_allclose(lrs[-1], 1.0, rtol=1e-6)
        # improving metric keeps lr
        assert sch.step(0.5) == 1.0
        assert sch.step(0.6) == 1.0
        # stagnation beyond patience halves it
        sch.step(0.6)
        lr = sch.step(0.6)
        np.testing.assert_allclose(lr, 0.5, rtol=1e-6)

    def test_eta_min_floor(self):
        sch = WarmupReduceLROnPlateau(1.0, gamma=0.01, warmup_iters=0,
                                      patience=0, eta_min=0.1)
        sch.step(1.0)
        sch.step(0.1)
        assert sch.step(0.1) == pytest.approx(0.1)
