"""Pallas TPU kernel: windowed deformable-sampling accumulation.

The TPU-native deformable conv (`ops/deform_conv.py`) is matmul-first: each
tap's dense product map `h_k = feats @ W_k` runs on the MXU, and what remains
is the bilinear part — a hat-weighted sum over (2m+2)^2 static displacements
of the padded product map:

    acc[p] = sum_{dy,dx} max(0,1-|oy[p]-dy|) * max(0,1-|ox[p]-dx|)
             * hp[p + (dy,dx) + m]

Expressed in XLA that is 64 slice+FMA passes whose fwd+bwd unrolls into a
huge program (the grounding train step's compile-time long pole) and, at
best, streams the product map from HBM dozens of times. This kernel runs the
whole displacement loop VMEM-resident: grid over (batch, channel tiles),
one load of `hp`, 64 register-level FMAs, one store — and a custom VJP with
two more kernels for the backward (d/d hp is the transposed placement sum;
d/d offsets contracts the cotangent with the product map under the hat
derivative). Replaces the displacement passes of
`csrc/cuda/deform_conv_kernel_cuda.cu`'s bilinear im2col (SURVEY §2.4) with
identical math.

`window_accumulate` is the public entry; pure-jnp references
(`window_accumulate_reference`, used for goldens and as the non-TPU
fallback) define the exact semantics.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hat(o: jnp.ndarray, d: int) -> jnp.ndarray:
    return jnp.maximum(0.0, 1.0 - jnp.abs(o - d))


def _dhat(o: jnp.ndarray, d: int) -> jnp.ndarray:
    """d/do hat(o-d): -sign(o-d) where |o-d| < 1, else 0."""
    t = o - d
    return jnp.where(jnp.abs(t) < 1.0, -jnp.sign(t), 0.0)


# --------------------------------------------------------------------------
# pure-jnp reference semantics
# --------------------------------------------------------------------------

def window_accumulate_reference(hp: jnp.ndarray, oy: jnp.ndarray,
                                ox: jnp.ndarray, m: int) -> jnp.ndarray:
    """hp [B, Ho+2m+1, Wo+2m+1, C]; oy/ox [B, Ho, Wo] in [-m, m]."""
    B, Hp, Wp, C = hp.shape
    Ho, Wo = Hp - 2 * m - 1, Wp - 2 * m - 1
    acc = jnp.zeros((B, Ho, Wo, C), hp.dtype)
    for dy in range(-m, m + 2):
        wy = _hat(oy, dy)
        for dx in range(-m, m + 2):
            coeff = wy * _hat(ox, dx)
            win = jax.lax.slice(hp, (0, dy + m, dx + m, 0),
                                (B, dy + m + Ho, dx + m + Wo, C))
            acc = acc + coeff[..., None] * win
    return acc


def _bwd_reference(m, res, ct):
    hp, oy, ox = res
    B, Hp, Wp, C = hp.shape
    Ho, Wo = Hp - 2 * m - 1, Wp - 2 * m - 1
    dhp = jnp.zeros_like(hp)
    doy = jnp.zeros_like(oy)
    dox = jnp.zeros_like(ox)
    for dy in range(-m, m + 2):
        wy = _hat(oy, dy)
        gy = _dhat(oy, dy)
        for dx in range(-m, m + 2):
            wx = _hat(ox, dx)
            gx = _dhat(ox, dx)
            win = jax.lax.slice(hp, (0, dy + m, dx + m, 0),
                                (B, dy + m + Ho, dx + m + Wo, C))
            s = jnp.sum(ct * win, axis=-1)  # [B, Ho, Wo]
            doy = doy + gy * wx * s
            dox = dox + wy * gx * s
            place = (wy * wx)[..., None] * ct
            dhp = jax.lax.dynamic_update_slice(
                dhp, jax.lax.dynamic_slice(
                    dhp, (0, dy + m, dx + m, 0), (B, Ho, Wo, C)) + place,
                (0, dy + m, dx + m, 0))
    return dhp, doy, dox


# --------------------------------------------------------------------------
# pallas kernels
# --------------------------------------------------------------------------

def _fwd_kernel(hp_ref, oy_ref, ox_ref, out_ref, *, m: int, Ho: int, Wo: int):
    # fori_loop + in-place accumulation: an unrolled functional `acc = acc +
    # ...` chain makes Mosaic stack-allocate every step's temporary at once
    # ((2m+2)^2 x the block -> scoped-vmem OOM); the loop keeps ONE window
    # temp live and RMWs the output ref
    n = 2 * m + 2
    oy = oy_ref[0]
    ox = ox_ref[0]
    out_ref[0] = jnp.zeros(out_ref.shape[1:], jnp.float32)

    def body(i, carry):
        iy = i // n
        ix = i % n
        wy = _hat(oy, (iy - m).astype(jnp.float32))
        wx = _hat(ox, (ix - m).astype(jnp.float32))
        win = hp_ref[0, pl.ds(iy, Ho), pl.ds(ix, Wo), :]
        out_ref[0] += (wy * wx)[..., None] * win
        return carry

    jax.lax.fori_loop(0, n * n, body, 0)


def _bwd_kernel(hp_ref, oy_ref, ox_ref, ct_ref, dhp_ref, doy_ref, dox_ref, *,
                m: int, Ho: int, Wo: int):
    """One pass for all three cotangents: dhp placement + offset grads share
    the displacement loop and one read of hp/ct per block."""
    c_idx = pl.program_id(1)
    n = 2 * m + 2
    oy = oy_ref[0]
    ox = ox_ref[0]
    ct = ct_ref[0]
    dhp_ref[0] = jnp.zeros(dhp_ref.shape[1:], jnp.float32)

    @pl.when(c_idx == 0)
    def _init():
        doy_ref[0] = jnp.zeros((Ho, Wo), jnp.float32)
        dox_ref[0] = jnp.zeros((Ho, Wo), jnp.float32)

    def body(i, carry):
        iy = i // n
        ix = i % n
        d_y = (iy - m).astype(jnp.float32)
        d_x = (ix - m).astype(jnp.float32)
        wy = _hat(oy, d_y)
        wx = _hat(ox, d_x)
        cur = dhp_ref[0, pl.ds(iy, Ho), pl.ds(ix, Wo), :]
        dhp_ref[0, pl.ds(iy, Ho), pl.ds(ix, Wo), :] = cur + (wy * wx)[..., None] * ct
        win = hp_ref[0, pl.ds(iy, Ho), pl.ds(ix, Wo), :]
        s = jnp.sum(ct * win, axis=-1)
        doy_ref[0] += _dhat(oy, d_y) * wx * s
        dox_ref[0] += wy * _dhat(ox, d_x) * s
        return carry

    jax.lax.fori_loop(0, n * n, body, 0)


# --------------------------------------------------------------------------
# stacked-tap kernels: all K taps of one deform conv in ONE dispatch
# --------------------------------------------------------------------------

def _fwd_taps_kernel(hp_ref, oy_ref, ox_ref, g_ref, out_ref, *, m: int,
                     Ho: int, Wo: int, kw: int):
    """Grid (B, K, Cq). hp block = tap k's channel tile of the padded product
    map (spatial origin NOT tap-aligned — the tap base (ky, kx) is added to
    the displacement start in-kernel). Output accumulates over the K grid dim."""
    k = pl.program_id(1)
    n = 2 * m + 2
    ky = k // kw  # == kappa_y + 1 (pad offset), see caller's padding
    kx = k % kw
    oy = oy_ref[0, 0]
    ox = ox_ref[0, 0]
    g = g_ref[0, 0]

    @pl.when(k == 0)
    def _init():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], jnp.float32)

    # tile-level displacement culling (EXACT): hat(o, d) == 0 for the whole
    # block unless d is within 1 of some offset value, so displacements
    # outside [min(o)-1, max(o)+1] contribute exactly zero. Trained DCN
    # offsets sit near 0 -> typically ~4 of (2m+2)^2 displacements survive.
    # NOTE (round-4 profile): culling saves VPU work only — the hp block DMA
    # happens per grid step regardless, and at DyHead shapes the kernel is
    # DMA-bound, which is why zero-offset and trained-offset timings match.
    # The bandwidth lever is the hp dtype (bf16 halves the stream).
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
            wy = _hat(oy, d_y)
            wx = _hat(ox, d_x)
            win = hp_ref[0, pl.ds(ky + iy, Ho), pl.ds(kx + ix, Wo), :]
            out_ref[0] += (g * wy * wx)[..., None] * win.astype(jnp.float32)

        return carry

    jax.lax.fori_loop(0, n * n, body, 0)


def _bwd_taps_kernel(hp_ref, oy_ref, ox_ref, g_ref, ct_ref, dhp_ref, doy_ref,
                     dox_ref, dg_ref, *, m: int, Ho: int, Wo: int, kw: int):
    """Grid (B, K, Cq). One pass for dhp (per tap/tile), d(oy, ox, gate)
    (accumulated over channel tiles)."""
    k = pl.program_id(1)
    c_idx = pl.program_id(2)
    n = 2 * m + 2
    ky = k // kw
    kx = k % kw
    oy = oy_ref[0, 0]
    ox = ox_ref[0, 0]
    g = g_ref[0, 0]
    ct = ct_ref[0]
    dhp_ref[0] = jnp.zeros(dhp_ref.shape[1:], dhp_ref.dtype)

    @pl.when(c_idx == 0)
    def _init():
        doy_ref[0, 0] = jnp.zeros((Ho, Wo), jnp.float32)
        dox_ref[0, 0] = jnp.zeros((Ho, Wo), jnp.float32)
        dg_ref[0, 0] = jnp.zeros((Ho, Wo), jnp.float32)

    oy_lo, oy_hi = jnp.min(oy), jnp.max(oy)
    ox_lo, ox_hi = jnp.min(ox), jnp.max(ox)

    def body(i, carry):
        iy = i // n
        ix = i % n
        d_y = (iy - m).astype(jnp.float32)
        d_x = (ix - m).astype(jnp.float32)
        # same exact culling as forward: hat and dhat share support
        active = ((d_y > oy_lo - 1) & (d_y < oy_hi + 1) &
                  (d_x > ox_lo - 1) & (d_x < ox_hi + 1))

        @pl.when(active)
        def _do():
            wy = _hat(oy, d_y)
            wx = _hat(ox, d_x)
            cur = dhp_ref[0, pl.ds(ky + iy, Ho), pl.ds(kx + ix, Wo), :]
            dhp_ref[0, pl.ds(ky + iy, Ho), pl.ds(kx + ix, Wo), :] = \
                (cur.astype(jnp.float32)
                 + (g * wy * wx)[..., None] * ct).astype(dhp_ref.dtype)
            win = hp_ref[0, pl.ds(ky + iy, Ho), pl.ds(kx + ix, Wo), :]
            s = jnp.sum(ct * win.astype(jnp.float32), axis=-1)
            doy_ref[0, 0] += g * _dhat(oy, d_y) * wx * s
            dox_ref[0, 0] += g * wy * _dhat(ox, d_x) * s
            dg_ref[0, 0] += wy * wx * s

        return carry

    jax.lax.fori_loop(0, n * n, body, 0)


def window_accumulate_taps_reference(hp_all: jnp.ndarray, oy: jnp.ndarray,
                                     ox: jnp.ndarray, gate: jnp.ndarray,
                                     m: int, K: int, kw: int) -> jnp.ndarray:
    """Semantics oracle. hp_all [B, Ho+2m+kw, Wo+2m+kw, K*Cout] (tap-major
    channels); oy/ox/gate [B, K, Ho, Wo]; -> [B, Ho, Wo, Cout]."""
    B, Hp, Wp, KC = hp_all.shape
    Cout = KC // K
    Ho = Hp - 2 * m - kw
    Wo = Wp - 2 * m - kw
    out = jnp.zeros((B, Ho, Wo, Cout), jnp.float32)
    for k in range(K):
        hp = hp_all[..., k * Cout:(k + 1) * Cout]
        ky, kx = k // kw, k % kw
        for dy in range(-m, m + 2):
            wy = _hat(oy[:, k], dy)
            for dx in range(-m, m + 2):
                coeff = gate[:, k] * wy * _hat(ox[:, k], dx)
                win = jax.lax.slice(
                    hp, (0, ky + dy + m, kx + dx + m, 0),
                    (B, ky + dy + m + Ho, kx + dx + m + Wo, Cout))
                out = out + coeff[..., None] * win
    return out


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def window_accumulate_taps(hp_all: jnp.ndarray, oy: jnp.ndarray,
                           ox: jnp.ndarray, gate: jnp.ndarray, m: int,
                           K: int, kw: int, interpret: bool = False
                           ) -> jnp.ndarray:
    """All-taps windowed accumulation in one dispatch (module docstring).

    hp_all [B, Ho+2m+kw, Wo+2m+kw, K*Cout] fp32 OR bf16: per-tap product
    maps `feats @ W_k`, padded once (the tap base rides the in-kernel slice
    start); oy/ox [B, K, Ho, Wo] fp32 clamped to [-m, m]; gate
    [B, K, Ho, Wo] fp32 (DCNv2 sigmoid mask; pass ones for v1). Output and
    offset grads are fp32 regardless; dhp matches hp's dtype. bf16 hp
    halves the kernel's HBM stream — the measured bound at DyHead shapes —
    at ~1e-2 relative accuracy (accumulation stays fp32 in-kernel).
    """
    return _fwd_taps_impl(hp_all, oy, ox, gate, m, K, kw, interpret)


def _fwd_taps_impl(hp_all, oy, ox, gate, m, K, kw, interpret):
    B, Hp, Wp, KC = hp_all.shape
    Cout = KC // K
    Ho = Hp - 2 * m - kw
    Wo = Wp - 2 * m - kw
    tile = _ctile(Cout, Hp * Wp, Ho * Wo)
    Cq = Cout // tile

    def hp_map(b, k, c):
        return (b, 0, 0, k * Cq + c)

    off_spec = pl.BlockSpec((1, 1, Ho, Wo), lambda b, k, c: (b, k, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_fwd_taps_kernel, m=m, Ho=Ho, Wo=Wo, kw=kw),
        grid=(B, K, Cq),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tile, Hp * Wp, Ho * Wo)),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, tile), hp_map, memory_space=pltpu.VMEM),
            off_spec, off_spec, off_spec,
        ],
        out_specs=pl.BlockSpec((1, Ho, Wo, tile), lambda b, k, c: (b, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), jnp.float32),
        interpret=interpret,
    )(hp_all, oy, ox, gate)


def _vjp_taps_fwd(hp_all, oy, ox, gate, m, K, kw, interpret):
    return (_fwd_taps_impl(hp_all, oy, ox, gate, m, K, kw, interpret),
            (hp_all, oy, ox, gate))


def _vjp_taps_bwd(m, K, kw, interpret, res, ct):
    hp_all, oy, ox, gate = res
    B, Hp, Wp, KC = hp_all.shape
    Cout = KC // K
    Ho = Hp - 2 * m - kw
    Wo = Wp - 2 * m - kw
    tile = _ctile(Cout, 2 * Hp * Wp, Ho * Wo)  # bwd reads hp AND writes dhp
    Cq = Cout // tile

    def hp_map(b, k, c):
        return (b, 0, 0, k * Cq + c)

    off_spec = pl.BlockSpec((1, 1, Ho, Wo), lambda b, k, c: (b, k, 0, 0),
                            memory_space=pltpu.VMEM)
    dhp, doy, dox, dg = pl.pallas_call(
        partial(_bwd_taps_kernel, m=m, Ho=Ho, Wo=Wo, kw=kw),
        grid=(B, K, Cq),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tile, 2 * Hp * Wp, 2 * Ho * Wo)),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, tile), hp_map, memory_space=pltpu.VMEM),
            off_spec, off_spec, off_spec,
            pl.BlockSpec((1, Ho, Wo, tile), lambda b, k, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Hp, Wp, tile), hp_map, memory_space=pltpu.VMEM),
            off_spec, off_spec, off_spec,
        ],
        out_shape=[jax.ShapeDtypeStruct((B, Hp, Wp, KC), hp_all.dtype),
                   jax.ShapeDtypeStruct((B, K, Ho, Wo), jnp.float32),
                   jax.ShapeDtypeStruct((B, K, Ho, Wo), jnp.float32),
                   jax.ShapeDtypeStruct((B, K, Ho, Wo), jnp.float32)],
        interpret=interpret,
    )(hp_all, oy, ox, gate, ct)
    return dhp, doy, dox, dg


window_accumulate_taps.defvjp(_vjp_taps_fwd, _vjp_taps_bwd)


def _ctile(C: int, hp_elems: int = 0, out_elems: int = 0) -> int:
    """Channel tile: Mosaic requires the lane-dim block to be a multiple of
    128 or the full dimension; VMEM pressure is handled by `_vmem_limit`,
    not by shrinking the tile."""
    return 128 if C % 128 == 0 else C


def _vmem_limit(tile: int, *elem_counts: int) -> int:
    """Scoped-vmem budget for a kernel whose live fp32 blocks have the given
    per-channel element counts: x2 for cross-step double buffering, +25%
    scratch slack, floored at the 16 MB default and capped under v5e's
    physical 128 MiB. (At 800px P3 the default 16 MB limit rejects the
    22 MB working set — measured; raising the limit is the supported path,
    shrinking the lane tile below 128 is not.)"""
    need = int(4 * tile * 2 * sum(elem_counts) * 1.25)
    return max(16 * 1024 * 1024, min(need, 100 * 1024 * 1024))


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def window_accumulate(hp: jnp.ndarray, oy: jnp.ndarray, ox: jnp.ndarray,
                      m: int, interpret: bool = False) -> jnp.ndarray:
    """Hat-windowed displacement accumulation (see module docstring).

    hp [B, Ho+2m+1, Wo+2m+1, C] fp32; oy/ox [B, Ho, Wo] fp32 clamped to
    [-m, m] by the caller (clamp gradients belong to the caller's clip).
    """
    return _fwd_impl(hp, oy, ox, m, interpret)


def _fwd_impl(hp, oy, ox, m, interpret):
    B, Hp, Wp, C = hp.shape
    Ho, Wo = Hp - 2 * m - 1, Wp - 2 * m - 1
    ct = _ctile(C, Hp * Wp, Ho * Wo)
    return pl.pallas_call(
        partial(_fwd_kernel, m=m, Ho=Ho, Wo=Wo),
        grid=(B, C // ct),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(ct, Hp * Wp, Ho * Wo)),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, ct), lambda b, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ho, Wo), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ho, Wo), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ho, Wo, ct), lambda b, c: (b, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, C), jnp.float32),
        interpret=interpret,
    )(hp, oy, ox)


def _vjp_fwd(hp, oy, ox, m, interpret):
    return _fwd_impl(hp, oy, ox, m, interpret), (hp, oy, ox)


def _vjp_bwd(m, interpret, res, ct):
    hp, oy, ox = res
    B, Hp, Wp, C = hp.shape
    Ho, Wo = Hp - 2 * m - 1, Wp - 2 * m - 1
    tile = _ctile(C, 2 * Hp * Wp, Ho * Wo)
    dhp, doy, dox = pl.pallas_call(
        partial(_bwd_kernel, m=m, Ho=Ho, Wo=Wo),
        grid=(B, C // tile),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tile, 2 * Hp * Wp, 2 * Ho * Wo)),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, tile), lambda b, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ho, Wo), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ho, Wo), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ho, Wo, tile), lambda b, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Hp, Wp, tile), lambda b, c: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ho, Wo), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ho, Wo), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((B, Hp, Wp, C), jnp.float32),
                   jax.ShapeDtypeStruct((B, Ho, Wo), jnp.float32),
                   jax.ShapeDtypeStruct((B, Ho, Wo), jnp.float32)],
        interpret=interpret,
    )(hp, oy, ox, ct)
    return dhp, doy, dox


window_accumulate.defvjp(_vjp_fwd, _vjp_bwd)
