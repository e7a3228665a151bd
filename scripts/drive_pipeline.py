"""Consumer-style drive of lpi_tpu pipeline parallelism (verify skill)."""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from lpi_tpu.core.pipeline import pipeline_scan

# A consumer stacks 8 layers, pipelines them over 4 stages x 2-way dp.
mesh = Mesh(np.asarray(jax.devices()).reshape(2, 4), ("data", "pipe"))
rng = np.random.RandomState(0)
L, D, B = 8, 32, 16
params = {"w": jnp.asarray(rng.randn(L, D, D) / np.sqrt(D), jnp.float32),
          "b": jnp.zeros((L, D), jnp.float32)}
x = jnp.asarray(rng.randn(B, D), jnp.float32)
tgt = jnp.asarray(rng.randn(B, D), jnp.float32)


def body(layer, _mb, h):
    return jnp.tanh(h @ layer["w"] + layer["b"])


def seq(p, x):
    return jax.lax.scan(lambda h, pl: (body(pl, None, h), None), x, p)[0]


@jax.jit
def loss_pp(p, x):
    out = pipeline_scan(mesh, "pipe", body, p, x, microbatches=4,
                        data_axis="data")
    return jnp.mean((out - tgt) ** 2)


@jax.jit
def loss_seq(p, x):
    return jnp.mean((seq(p, x) - tgt) ** 2)


lp, ls = float(loss_pp(params, x)), float(loss_seq(params, x))
print("pipelined loss", lp, "sequential loss", ls)
assert abs(lp - ls) < 1e-6 * max(1.0, abs(ls)), (lp, ls)

# train 20 steps through the pipeline: loss must decrease
g = jax.jit(jax.grad(loss_pp))
p = params
for i in range(20):
    grads = g(p, x)
    p = jax.tree.map(lambda a, b: a - 0.1 * b, p, grads)
l_final = float(loss_pp(p, x))
print("after 20 steps:", l_final)
assert l_final < lp * 0.95, (l_final, lp)

# error path: layer count not divisible by stages
try:
    pipeline_scan(mesh, "pipe", body,
                  {"w": params["w"][:6], "b": params["b"][:6]}, x,
                  microbatches=4)
    raise SystemExit("expected ValueError for L=6, S=4")
except ValueError as e:
    print("error path ok:", e)

# error path: batch not divisible by microbatches
try:
    pipeline_scan(mesh, "pipe", body, params, x[:15], microbatches=4)
    raise SystemExit("expected ValueError for B=15, M=4")
except ValueError as e:
    print("error path ok:", e)

print("DRIVE OK")
