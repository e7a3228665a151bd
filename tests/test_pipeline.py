"""Pipeline parallelism (`core/pipeline.py`) on the virtual 8-device mesh.

The reference's only scaling axis is DDP replication (SURVEY.md §2.5); the
rebuild adds pp as a third mesh dimension next to dp (`core/mesh.py`) and tp
(`tp_param_shardings`). These tests pin the GPipe schedule's correctness:
pipelined output == sequential layer scan (forward AND gradients), for plain
layer stacks, for dp x pp composition, and for the actual CLIP tower body
with per-layer prompt injection.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from lpi_tpu.core.pipeline import pipeline_scan, pipeline_tower


def make_mesh(shape, names):
    devs = np.asarray(jax.devices()[: int(np.prod(shape))]).reshape(shape)
    return Mesh(devs, names)


def mlp_stack(L=8, D=16, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "w": jnp.asarray(rng.randn(L, D, D) * (1.0 / np.sqrt(D)),
                         jnp.float32),
        "b": jnp.asarray(rng.randn(L, D) * 0.01, jnp.float32),
    }


def mlp_body(layer, _mb, h):
    return jnp.tanh(h @ layer["w"] + layer["b"])


def sequential(params, x):
    def layer(h, p):
        return mlp_body(p, None, h), None

    return jax.lax.scan(layer, x, params)[0]


@pytest.mark.fast
@pytest.mark.parametrize("stages,micro", [(4, 4), (4, 2), (8, 4), (4, 1)])
def test_forward_matches_sequential(stages, micro):
    mesh = make_mesh((stages,), ("pipe",))
    params = mlp_stack()
    x = jnp.asarray(np.random.RandomState(1).randn(8, 16), jnp.float32)
    ref = sequential(params, x)
    out = pipeline_scan(mesh, "pipe", mlp_body, params, x,
                        microbatches=micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.fast
def test_gradients_match_sequential():
    mesh = make_mesh((4,), ("pipe",))
    params = mlp_stack()
    x = jnp.asarray(np.random.RandomState(2).randn(4, 16), jnp.float32)
    tgt = jnp.asarray(np.random.RandomState(3).randn(4, 16), jnp.float32)

    def loss_seq(p, x):
        return jnp.sum((sequential(p, x) - tgt) ** 2)

    def loss_pp(p, x):
        out = pipeline_scan(mesh, "pipe", mlp_body, p, x, microbatches=4)
        return jnp.sum((out - tgt) ** 2)

    g_ref = jax.grad(loss_seq, argnums=(0, 1))(params, x)
    g_pp = jax.grad(loss_pp, argnums=(0, 1))(params, x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5),
        g_ref, g_pp)


@pytest.mark.fast
def test_dp_pp_composition():
    mesh = make_mesh((2, 4), ("data", "pipe"))
    params = mlp_stack()
    x = jnp.asarray(np.random.RandomState(4).randn(8, 16), jnp.float32)
    ref = sequential(params, x)
    out = pipeline_scan(mesh, "pipe", mlp_body, params, x,
                        microbatches=2, data_axis="data")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.fast
def test_layered_mb_per_layer_per_sample():
    # per-layer per-sample aux (the prompt shape) reaches the right
    # (layer, microbatch) slice: body adds aux, so any routing error
    # changes the value
    mesh = make_mesh((4,), ("pipe",))
    L, B, D = 8, 8, 16
    params = mlp_stack(L, D)
    aux = jnp.asarray(np.random.RandomState(5).randn(L, B, D), jnp.float32)
    x = jnp.asarray(np.random.RandomState(6).randn(B, D), jnp.float32)

    def body(layer, mb, h):
        (a,) = mb
        return jnp.tanh(h @ layer["w"] + layer["b"] + a)

    def seq(p, x):
        def layer(h, sl):
            p_l, a_l = sl
            return jnp.tanh(h @ p_l["w"] + p_l["b"] + a_l), None

        return jax.lax.scan(layer, x, (p, aux))[0]

    ref = seq(params, x)
    out = pipeline_scan(mesh, "pipe", body, params, x, microbatches=4,
                        layered_mb=(aux,))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


class TestClipTowerPipeline:
    """The flagship tower body (PromptedBlock w/ per-layer prompt
    injection) through the pipeline vs the production `_scan_tower`."""

    W, H, L, S_TOK, P_TOK, B = 32, 2, 8, 10, 2, 8

    def _tower(self):
        import flax.linen as nn

        from lpi_tpu.models.clip.model import PromptedBlock

        return nn.scan(
            PromptedBlock,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.L,
            in_axes=0,
        )(width=self.W, heads=self.H, causal=False, dtype=jnp.float32,
          attn_impl="xla")

    @pytest.mark.fast
    def test_matches_scan_tower(self):
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(self.B, self.S_TOK, self.W), jnp.float32)
        prompts = jnp.asarray(
            rng.randn(self.L, self.B, self.P_TOK, self.W) * 0.1, jnp.float32)
        gates = jnp.asarray(
            (np.arange(self.L) % 2 == 1).astype(np.float32)
            .reshape(self.L, 1, 1, 1))
        tower = self._tower()
        variables = tower.init(jax.random.PRNGKey(0), x, (prompts, gates))
        ref, _ = tower.apply(variables, x, (prompts, gates))

        mesh = make_mesh((4,), ("pipe",))
        out = pipeline_tower(
            mesh, "pipe", variables["params"], x, prompts, gates,
            width=self.W, heads=self.H, dtype=jnp.float32,
            microbatches=4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
