"""Tests for auxiliary subsystems: profiling, EMA, early stop, dist helpers,
and the Pallas prompt kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpi_tpu.continual.early_stop import EarlyStopper
from lpi_tpu.core.dist import all_gather_objects, get_world_size, reduce_dict
from lpi_tpu.core.ema import init_ema, update_ema
from lpi_tpu.core.profiling import StepTimer, compiled_flops, device_memory_stats

class TestProfiling:
    def test_step_timer(self):
        t = StepTimer()
        t.start()
        x = jnp.ones((8, 8)) * 2
        dt = t.stop(x)
        assert dt > 0 and t.mean > 0 and t.p50 > 0

    def test_compiled_flops_matmul(self):
        a = jnp.ones((64, 64))
        cost = compiled_flops(lambda x: x @ x, a)
        assert cost["flops"] >= 2 * 64 ** 3 * 0.5  # XLA counts ~2MNK

    def test_memory_stats_shape(self):
        stats = device_memory_stats()
        assert isinstance(stats, dict)


class TestEma:
    def test_decay(self):
        p = {"w": jnp.ones(3)}
        ema = init_ema(p)
        p2 = {"w": jnp.zeros(3)}
        ema = update_ema(ema, p2, decay=0.9)
        np.testing.assert_allclose(np.asarray(ema["w"]), 0.9)


class TestEarlyStop:
    def test_stops_after_patience(self):
        s = EarlyStopper(patience=2, mode="max")
        assert not s.update(1.0)
        assert not s.update(0.5)
        assert s.update(0.4)  # second consecutive non-improvement

    def test_improvement_resets(self):
        s = EarlyStopper(patience=2, mode="min")
        s.update(1.0)
        s.update(2.0)
        assert not s.update(0.5)  # improvement
        assert not s.update(0.6)
        assert s.update(0.7)

    def test_disabled(self):
        s = EarlyStopper(patience=0)
        assert not any(s.update(0.0) for _ in range(10))


class TestDist:
    def test_single_process_shortcuts(self):
        assert get_world_size() == 1
        assert all_gather_objects({"a": 1}) == [{"a": 1}]
        assert reduce_dict({"x": 2.0}) == {"x": 2.0}


class TestTensorboardLogger:
    def test_tb_scalars_written(self, tmp_path):
        from lpi_tpu.core.logging import MetricLogger

        ml = MetricLogger(tensorboard_dir=str(tmp_path / "tb"))
        ml.update(loss=1.5, lr=0.1)
        ml.update(loss=1.2, lr=0.1)
        ml.close()
        files = list((tmp_path / "tb").glob("events.out.tfevents.*"))
        assert files and files[0].stat().st_size > 0

    def test_missing_tb_degrades_gracefully(self, tmp_path, monkeypatch):
        import builtins

        real_import = builtins.__import__

        def broken(name, *a, **k):
            if name.startswith("torch.utils.tensorboard"):
                raise ImportError(name)
            return real_import(name, *a, **k)

        monkeypatch.setattr(builtins, "__import__", broken)
        from lpi_tpu.core.logging import MetricLogger

        ml = MetricLogger(tensorboard_dir=str(tmp_path / "tb2"))
        ml.update(loss=1.0)
        ml.close()
