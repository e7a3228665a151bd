"""Microbench the deform window kernel under zero vs honest offsets
(VERDICT r3 #3: explain honest==zero before optimizing).

Times `window_accumulate_taps` fwd and fwd+bwd alone at the P3@448 shape,
with (a) exact-zero offsets (culls to 1 active displacement), (b) spread
+-2 px offsets (≈49 active). If the two times match, the kernel is bound by
the unconditional hp-tile DMA, not the culled VPU math — the product-map
representation's K*Cout streaming is the wall.

Also times the full deform conv (matmul + pad + kernel) fwd+bwd per level
shape to apportion the 137 ms step.

Usage: python scripts/profile_deform.py
"""
import sys, time
sys.path.insert(0, "/root/repo")
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from lpi_tpu.ops.deform_window_kernel import window_accumulate_taps
from lpi_tpu.ops.deform_conv import deform_conv2d_pallas


def timeit(fn, iters=50, warmup=5):
    # iters must be large: through the axon tunnel, per-call enqueue costs
    # ~4.6 ms/call at depth 10 but ~0.5 ms at depth 100 (measured on a
    # trivial jit fn) — small-iter timings measure the RPC harness, not the
    # kernel. Host fetch is the only reliable barrier on the tunnel.
    for _ in range(warmup):
        out = fn()
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0]))
    return (time.perf_counter() - t0) / iters


def bench_kernel(B=4, H=56, W=56, C=256, m=3, K=9, kw=3, dtype=jnp.float32):
    Cout = C
    Hp, Wp = H + 2 * m + 1, W + 2 * m + 1
    rng = np.random.RandomState(0)
    hp = jnp.asarray(rng.randn(B, Hp, Wp, K * Cout)).astype(dtype)
    gate = jnp.ones((B, K, H, W), jnp.float32)
    zero = jnp.zeros((B, K, H, W), jnp.float32)
    spread = jnp.asarray(
        np.clip(rng.randn(B, K, H, W) * 1.0 + rng.randn(1, K, 1, 1), -m, m)
        .astype(np.float32))

    hp_bytes = hp.size * hp.dtype.itemsize
    f = jax.jit(partial(window_accumulate_taps, m=m, K=K, interpret=False))
    for name, oy, ox in [("zero  ", zero, zero), ("spread", spread, spread)]:
        dt = timeit(lambda: f(hp, oy, ox, gate))
        print(f"fwd {name}: {dt*1e3:7.2f} ms  hp-read {hp_bytes/dt/1e9:6.0f} GB/s")

    def fwd_bwd(oy, ox):
        def loss(hp_, oy_, ox_):
            return jnp.sum(window_accumulate_taps(hp_, oy_, ox_, gate, m, K,
                                                  False))
        g = jax.grad(loss, argnums=(0, 1, 2))(hp, oy, ox)
        return g[0]

    fb = jax.jit(fwd_bwd)
    for name, oy, ox in [("zero  ", zero, zero), ("spread", spread, spread)]:
        dt = timeit(lambda: fb(oy, ox))
        print(f"f+b {name}: {dt*1e3:7.2f} ms  3x hp {3*hp_bytes/dt/1e9:6.0f} GB/s")


def bench_conv(B=4, H=56, W=56, C=256, dtype=jnp.float32):
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    offs = jnp.asarray((rng.randn(B, H, W, 18) * 1.0).astype(np.float32))
    w = jnp.asarray((rng.randn(3, 3, C, C) * 0.05).astype(np.float32))

    def loss(f_, o_, w_):
        return jnp.sum(deform_conv2d_pallas(f_, o_, w_, compute_dtype=dtype))

    g = jax.jit(jax.grad(loss, argnums=(0, 1)))
    dt = timeit(lambda: g(feats, offs, w))
    print(f"deform conv f+b {H}x{W} {jnp.dtype(dtype).name}: {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    for dt in (jnp.float32, jnp.bfloat16):
        print(f"=== window_accumulate_taps P3@448 b4 hp={jnp.dtype(dt).name} ===",
              flush=True)
        try:
            bench_kernel(dtype=dt)
        except Exception as e:
            print(f"FAILED: {str(e)[:200]}", flush=True)
    print("=== full deform conv f+b per level ===", flush=True)
    for H in (56, 28, 14):
        for dt in (jnp.float32, jnp.bfloat16):
            try:
                bench_conv(H=H, W=H, dtype=dt)
            except Exception as e:
                print(f"{H} {jnp.dtype(dt).name} FAILED: {str(e)[:160]}",
                      flush=True)
