"""Fully fused Pallas deformable conv: sample-first + in-kernel MXU matmul.

Third-generation kernel for the DyConv hot path (`ops/deform_conv.py`
history: exact gather -> matmul-first windowed -> stacked-tap pallas). The
matmul-first formulation streams a K*Cout-channel product map through VMEM
(9x the feature bytes — ~145 MB DMA per conv at 448px/b4, the measured
bound after displacement culling). This kernel flips the order:

    per tap k:  sampled_k[p] = sum_d gate*hat*hat * feats[p + kappa_k + d]
                out += sampled_k @ W_k          (MXU, in-kernel)

so only the C-channel feature block crosses HBM<->VMEM once per image
(+ the output), with the same exact tile-level displacement culling.
Backward is one more kernel producing all five cotangents
(d feats, d oy, d ox, d gate, d W) from one read of the feature block:
u_k = ct @ W_k^T resurrects the per-tap cotangent in feature space, the
hat/dhat algebra is identical to `deform_window_kernel`.

Semantics (hat-windowed bilinear, offsets clamped to +-m, zero padding)
match `deform_conv2d_fast` exactly; `fused_deform_reference` is the oracle.
Replaces `csrc/cuda/deform_conv_kernel_cuda.cu` (SURVEY §2.4).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lpi_tpu.ops.deform_window_kernel import _dhat, _hat


def fused_deform_reference(fp: jnp.ndarray, oy: jnp.ndarray, ox: jnp.ndarray,
                           gate: jnp.ndarray, w: jnp.ndarray, m: int,
                           kw: int) -> jnp.ndarray:
    """fp [B, Ho+2m+kw, Wo+2m+kw, C] (padded feats); oy/ox/gate [B,K,Ho,Wo];
    w [K, C, Cout] -> [B, Ho, Wo, Cout]."""
    B, Hp, Wp, C = fp.shape
    K, _, Cout = w.shape
    Ho = Hp - 2 * m - kw
    Wo = Wp - 2 * m - kw
    out = jnp.zeros((B, Ho, Wo, Cout), jnp.float32)
    for k in range(K):
        ky, kx = k // kw, k % kw
        samp = jnp.zeros((B, Ho, Wo, C), jnp.float32)
        for dy in range(-m, m + 2):
            wy = _hat(oy[:, k], dy)
            for dx in range(-m, m + 2):
                coeff = gate[:, k] * wy * _hat(ox[:, k], dx)
                win = jax.lax.slice(
                    fp, (0, ky + dy + m, kx + dx + m, 0),
                    (B, ky + dy + m + Ho, kx + dx + m + Wo, C))
                samp = samp + coeff[..., None] * win
        out = out + jnp.einsum("bhwc,co->bhwo", samp, w[k])
    return out


def _sample_tap(fp_ref, oy, ox, g, samp_ref, *, m, Ho, Wo, ky, kx):
    """Culled hat-windowed sampling of one tap into a VMEM scratch."""
    n = 2 * m + 2
    samp_ref[0] = jnp.zeros(samp_ref.shape[1:], jnp.float32)
    oy_lo, oy_hi = jnp.min(oy), jnp.max(oy)
    ox_lo, ox_hi = jnp.min(ox), jnp.max(ox)

    def body(i, carry):
        iy = i // n
        ix = i % n
        d_y = (iy - m).astype(jnp.float32)
        d_x = (ix - m).astype(jnp.float32)
        active = ((d_y > oy_lo - 1) & (d_y < oy_hi + 1) &
                  (d_x > ox_lo - 1) & (d_x < ox_hi + 1))

        @pl.when(active)
        def _do():
            coeff = g * _hat(oy, d_y) * _hat(ox, d_x)
            win = fp_ref[0, pl.ds(ky + iy, Ho), pl.ds(kx + ix, Wo), :]
            samp_ref[0] += coeff[..., None] * win

        return carry

    jax.lax.fori_loop(0, n * n, body, 0)


def _fused_fwd_kernel(fp_ref, oy_ref, ox_ref, g_ref, w_ref, out_ref,
                      samp_ref, *, m: int, Ho: int, Wo: int, K: int,
                      kw: int):
    # grid (B, C//tile): each step samples a 128-channel feature tile
    # (Mosaic only lowers dynamic sublane slices at lane width 128) and
    # contributes its partial contraction to the full-Cout output
    c_idx = pl.program_id(1)
    ct_w = fp_ref.shape[-1]

    @pl.when(c_idx == 0)
    def _init():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], jnp.float32)

    for k in range(K):  # static unroll: each body is one fori + one dot
        _sample_tap(fp_ref, oy_ref[0, k], ox_ref[0, k], g_ref[0, k],
                    samp_ref, m=m, Ho=Ho, Wo=Wo, ky=k // kw, kx=k % kw)
        prod = jnp.dot(samp_ref[0].reshape(Ho * Wo, ct_w), w_ref[k],
                       preferred_element_type=jnp.float32)
        out_ref[0] += prod.reshape(Ho, Wo, -1)


def _fused_bwd_kernel(fp_ref, oy_ref, ox_ref, g_ref, w_ref, ct_ref,
                      dfp_ref, doy_ref, dox_ref, dg_ref, dw_ref,
                      samp_ref, u_ref, *, m: int, Ho: int, Wo: int,
                      K: int, kw: int):
    b = pl.program_id(0)
    c_idx = pl.program_id(1)
    n = 2 * m + 2
    ct_w = fp_ref.shape[-1]
    Cout = w_ref.shape[-1]
    ct = ct_ref[0]
    dfp_ref[0] = jnp.zeros(dfp_ref.shape[1:], jnp.float32)

    @pl.when(b == 0)
    def _init_dw():
        dw_ref[...] = jnp.zeros(dw_ref.shape, jnp.float32)

    for k in range(K):
        ky, kx = k // kw, k % kw
        oy = oy_ref[0, k]
        ox = ox_ref[0, k]
        g = g_ref[0, k]
        # u_k = ct @ W_k[tile]^T : tap cotangent in this feature tile (MXU)
        u_ref[0] = jnp.dot(
            ct.reshape(Ho * Wo, Cout), w_ref[k].T,
            preferred_element_type=jnp.float32).reshape(Ho, Wo, ct_w)
        # recompute sampled_k for dW (culled, cheap)
        _sample_tap(fp_ref, oy, ox, g, samp_ref, m=m, Ho=Ho, Wo=Wo,
                    ky=ky, kx=kx)
        dw_ref[k] += jnp.dot(samp_ref[0].reshape(Ho * Wo, ct_w).T,
                             ct.reshape(Ho * Wo, Cout),
                             preferred_element_type=jnp.float32)

        oy_lo, oy_hi = jnp.min(oy), jnp.max(oy)
        ox_lo, ox_hi = jnp.min(ox), jnp.max(ox)

        @pl.when(c_idx == 0)
        def _init_off():
            doy_ref[0, k] = jnp.zeros((Ho, Wo), jnp.float32)
            dox_ref[0, k] = jnp.zeros((Ho, Wo), jnp.float32)
            dg_ref[0, k] = jnp.zeros((Ho, Wo), jnp.float32)

        def body(i, carry):
            iy = i // n
            ix = i % n
            d_y = (iy - m).astype(jnp.float32)
            d_x = (ix - m).astype(jnp.float32)
            active = ((d_y > oy_lo - 1) & (d_y < oy_hi + 1) &
                      (d_x > ox_lo - 1) & (d_x < ox_hi + 1))

            @pl.when(active)
            def _do():
                wy = _hat(oy, d_y)
                wx = _hat(ox, d_x)
                u = u_ref[0]
                cur = dfp_ref[0, pl.ds(ky + iy, Ho), pl.ds(kx + ix, Wo), :]
                dfp_ref[0, pl.ds(ky + iy, Ho), pl.ds(kx + ix, Wo), :] = \
                    cur + (g * wy * wx)[..., None] * u
                win = fp_ref[0, pl.ds(ky + iy, Ho), pl.ds(kx + ix, Wo), :]
                s = jnp.sum(u * win, axis=-1)
                doy_ref[0, k] += g * _dhat(oy, d_y) * wx * s
                dox_ref[0, k] += g * wy * _dhat(ox, d_x) * s
                dg_ref[0, k] += wy * wx * s

            return carry

        jax.lax.fori_loop(0, n * n, body, 0)


def _limit(*mb):
    return max(16, min(int(sum(mb)), 100)) * 1024 * 1024


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_deform(fp: jnp.ndarray, oy: jnp.ndarray, ox: jnp.ndarray,
                 gate: jnp.ndarray, w: jnp.ndarray, m: int, kw: int,
                 interpret: bool = False) -> jnp.ndarray:
    """Sample-first fused deformable conv core (see module docstring)."""
    return _fused_fwd(fp, oy, ox, gate, w, m, kw, interpret)


def _ftile(C: int) -> int:
    return 128 if C % 128 == 0 else C


def _fused_fwd(fp, oy, ox, gate, w, m, kw, interpret):
    B, Hp, Wp, C = fp.shape
    K, _, Cout = w.shape
    Ho = Hp - 2 * m - kw
    Wo = Wp - 2 * m - kw
    t = _ftile(C)
    off_spec = pl.BlockSpec((1, K, Ho, Wo), lambda b, c: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    mb = 4e-6 * (Hp * Wp * t + Ho * Wo * (Cout + t) + K * t * Cout) * 2.5
    return pl.pallas_call(
        partial(_fused_fwd_kernel, m=m, Ho=Ho, Wo=Wo, K=K, kw=kw),
        grid=(B, C // t),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, t), lambda b, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
            off_spec, off_spec, off_spec,
            pl.BlockSpec((K, t, Cout), lambda b, c: (0, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ho, Wo, Cout), lambda b, c: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, Ho, Wo, t), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_limit(mb)),
        interpret=interpret,
    )(fp, oy, ox, gate, w)


def _fused_vjp_fwd(fp, oy, ox, gate, w, m, kw, interpret):
    return (_fused_fwd(fp, oy, ox, gate, w, m, kw, interpret),
            (fp, oy, ox, gate, w))


def _fused_vjp_bwd(m, kw, interpret, res, ct):
    fp, oy, ox, gate, w = res
    B, Hp, Wp, C = fp.shape
    K, _, Cout = w.shape
    Ho = Hp - 2 * m - kw
    Wo = Wp - 2 * m - kw
    t = _ftile(C)
    off_spec = pl.BlockSpec((1, K, Ho, Wo), lambda b, c: (b, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((K, t, Cout), lambda b, c: (0, c, 0),
                          memory_space=pltpu.VMEM)
    mb = 4e-6 * (2 * Hp * Wp * t + Ho * Wo * (2 * t + Cout)
                 + 2 * K * t * Cout) * 2.5
    dfp, doy, dox, dg, dw = pl.pallas_call(
        partial(_fused_bwd_kernel, m=m, Ho=Ho, Wo=Wo, K=K, kw=kw),
        grid=(B, C // t),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, t), lambda b, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
            off_spec, off_spec, off_spec, w_spec,
            pl.BlockSpec((1, Ho, Wo, Cout), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Hp, Wp, t), lambda b, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
            off_spec, off_spec, off_spec, w_spec,
        ],
        out_shape=[jax.ShapeDtypeStruct((B, Hp, Wp, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, K, Ho, Wo), jnp.float32),
                   jax.ShapeDtypeStruct((B, K, Ho, Wo), jnp.float32),
                   jax.ShapeDtypeStruct((B, K, Ho, Wo), jnp.float32),
                   jax.ShapeDtypeStruct((K, C, Cout), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, Ho, Wo, t), jnp.float32),
                        pltpu.VMEM((1, Ho, Wo, t), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_limit(mb)),
        interpret=interpret,
    )(fp, oy, ox, gate, w, ct)
    return dfp, doy, dox, dg, dw


fused_deform.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)
