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
                     Ho: int, Wo: int):
    """Grid (B, Cq, K). hp block = tap k's channel tile of its padded product
    map with the tap's (y, x) base PRE-SHIFTED into the caller's pad: x
    displacement slices are STATIC (the inner x loop is unrolled), so Mosaic
    compiles them to cheap sublane shifts instead of per-step dynamic-slice
    relayouts — the measured cost floor of the old flat (iy, ix) fori_loop —
    and bf16 blocks become legal (dynamic sublane slices are fp32-only). The
    y displacement is the bare loop var: a dynamic offset on the untiled
    second-major dim is plain address arithmetic. Output accumulates over
    the K grid dim (innermost — see `_fwd_taps_impl`)."""
    k = pl.program_id(2)
    n = 2 * m + 2
    oy = oy_ref[0, 0]
    ox = ox_ref[0, 0]
    g = g_ref[0, 0]

    @pl.when(k == 0)
    def _init():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], jnp.float32)

    # tile-level displacement culling (EXACT): hat(o, d) == 0 for the whole
    # block unless d is within 1 of some offset value, so displacements
    # outside [min(o)-1, max(o)+1] contribute exactly zero. Trained DCN
    # offsets sit near 0 -> typically only the d=0,1 row/column band
    # survives; the y-cull skips whole unrolled x-bands at once.
    oy_lo, oy_hi = jnp.min(oy), jnp.max(oy)
    ox_lo, ox_hi = jnp.min(ox), jnp.max(ox)

    def body(iy, carry):
        d_y = (iy - m).astype(jnp.float32)
        y_active = (d_y > oy_lo - 1) & (d_y < oy_hi + 1)

        @pl.when(y_active)
        def _row():
            gwy = g * _hat(oy, d_y)
            for ix in range(n):  # static unroll: x starts are constants
                d_x = float(ix - m)
                x_active = (d_x > ox_lo - 1) & (d_x < ox_hi + 1)

                @pl.when(x_active)
                def _do(ix=ix, d_x=d_x):
                    wx = _hat(ox, d_x)
                    win = hp_ref[0, pl.ds(iy, Ho), ix:ix + Wo, :]
                    out_ref[0] += (gwy * wx)[..., None] * win.astype(
                        jnp.float32)

        return carry

    jax.lax.fori_loop(0, n, body, 0)


def _bwd_taps_kernel(hp_ref, oy_ref, ox_ref, g_ref, ct_ref, dhp_ref, doy_ref,
                     dox_ref, dg_ref, *, m: int, Ho: int, Wo: int):
    """Grid (B, Cq, K). One pass for dhp (per tap/tile), d(oy, ox, gate)
    (accumulated over channel tiles)."""
    c_idx = pl.program_id(1)
    n = 2 * m + 2
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

    def body(iy, carry):
        d_y = (iy - m).astype(jnp.float32)
        # same exact culling as forward: hat and dhat share support
        y_active = (d_y > oy_lo - 1) & (d_y < oy_hi + 1)

        @pl.when(y_active)
        def _row():
            wy = _hat(oy, d_y)
            dwy = _dhat(oy, d_y)
            for ix in range(n):  # static unroll, pre-shifted x (see fwd)
                d_x = float(ix - m)
                x_active = (d_x > ox_lo - 1) & (d_x < ox_hi + 1)

                @pl.when(x_active)
                def _do(ix=ix, d_x=d_x):
                    wx = _hat(ox, d_x)
                    cur = dhp_ref[0, pl.ds(iy, Ho), ix:ix + Wo, :]
                    dhp_ref[0, pl.ds(iy, Ho), ix:ix + Wo, :] = \
                        (cur.astype(jnp.float32)
                         + (g * wy * wx)[..., None] * ct).astype(dhp_ref.dtype)
                    win = hp_ref[0, pl.ds(iy, Ho), ix:ix + Wo, :]
                    s = jnp.sum(ct * win.astype(jnp.float32), axis=-1)
                    doy_ref[0, 0] += g * dwy * wx * s
                    dox_ref[0, 0] += g * wy * _dhat(ox, d_x) * s
                    dg_ref[0, 0] += wy * wx * s

        return carry

    jax.lax.fori_loop(0, n, body, 0)


def window_accumulate_taps_reference(hp_all: jnp.ndarray, oy: jnp.ndarray,
                                     ox: jnp.ndarray, gate: jnp.ndarray,
                                     m: int, K: int) -> jnp.ndarray:
    """Semantics oracle. hp_all [B, Ho+2m+1, Wo+2m+1, K*Cout] (tap-major
    channels, each tap's (y, x) base PRE-SHIFTED into its pad — tap k's map
    is padded (m+1-ky, m+ky) x (m+1-kx, m+kx) so every tap shares slice
    starts); oy/ox/gate [B, K, Ho, Wo]; -> [B, Ho, Wo, Cout]."""
    B, Hp, Wp, KC = hp_all.shape
    Cout = KC // K
    Ho = Hp - 2 * m - 1
    Wo = Wp - 2 * m - 1
    out = jnp.zeros((B, Ho, Wo, Cout), jnp.float32)
    for k in range(K):
        hp = hp_all[..., k * Cout:(k + 1) * Cout]
        for dy in range(-m, m + 2):
            wy = _hat(oy[:, k], dy)
            for dx in range(-m, m + 2):
                coeff = gate[:, k] * wy * _hat(ox[:, k], dx)
                win = jax.lax.slice(
                    hp, (0, dy + m, dx + m, 0),
                    (B, dy + m + Ho, dx + m + Wo, Cout))
                out = out + coeff[..., None] * win
    return out


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def window_accumulate_taps(hp_all: jnp.ndarray, oy: jnp.ndarray,
                           ox: jnp.ndarray, gate: jnp.ndarray, m: int,
                           K: int, interpret: bool = False) -> jnp.ndarray:
    """All-taps windowed accumulation in one dispatch (module docstring).

    hp_all [B, Ho+2m+1, Wo+2m+1, K*Cout] fp32 OR bf16: per-tap product
    maps `feats @ W_k` with each tap's (y, x) base PRE-SHIFTED into its pad
    (pads (m+1-ky, m+ky) x (m+1-kx, m+kx) per tap — see `_fwd_taps_kernel`
    for why x must be static); oy/ox [B, K, Ho, Wo] fp32 clamped to
    [-m, m]; gate [B, K, Ho, Wo] fp32 (DCNv2 sigmoid mask; pass ones for
    v1). Output and offset grads are fp32 regardless; dhp matches hp's
    dtype. bf16 hp halves the kernel's HBM stream at ~1e-2 relative
    accuracy (accumulation stays fp32 in-kernel).
    """
    return _fwd_taps_impl(hp_all, oy, ox, gate, m, K, interpret)


def _fwd_taps_impl(hp_all, oy, ox, gate, m, K, interpret):
    B, Hp, Wp, KC = hp_all.shape
    Cout = KC // K
    Ho = Hp - 2 * m - 1
    Wo = Wp - 2 * m - 1
    tile = _ctile(Cout, KC, interpret)
    Cq = Cout // tile

    def hp_map(b, c, k):
        return (b, 0, 0, k * Cq + c)

    off_spec = pl.BlockSpec((1, 1, Ho, Wo), lambda b, c, k: (b, k, 0, 0),
                            memory_space=pltpu.VMEM)
    # K innermost: the out block (b, c) is revisited on CONSECUTIVE grid
    # steps, so the accumulator stays VMEM-resident across all K taps
    # instead of a 2x-block HBM flush+reload per step.
    return pl.pallas_call(
        partial(_fwd_taps_kernel, m=m, Ho=Ho, Wo=Wo),
        grid=(B, Cq, K),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tile, Hp * Wp, Ho * Wo)),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, tile), hp_map, memory_space=pltpu.VMEM),
            off_spec, off_spec, off_spec,
        ],
        out_specs=pl.BlockSpec((1, Ho, Wo, tile), lambda b, c, k: (b, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), jnp.float32),
        interpret=interpret,
    )(hp_all, oy, ox, gate)


def _vjp_taps_fwd(hp_all, oy, ox, gate, m, K, interpret):
    return (_fwd_taps_impl(hp_all, oy, ox, gate, m, K, interpret),
            (hp_all, oy, ox, gate))


def _vjp_taps_bwd(m, K, interpret, res, ct):
    hp_all, oy, ox, gate = res
    B, Hp, Wp, KC = hp_all.shape
    Cout = KC // K
    Ho = Hp - 2 * m - 1
    Wo = Wp - 2 * m - 1
    tile = _ctile(Cout, KC, interpret)  # bwd reads hp AND writes dhp
    Cq = Cout // tile

    def hp_map(b, c, k):
        return (b, 0, 0, k * Cq + c)

    off_spec = pl.BlockSpec((1, 1, Ho, Wo), lambda b, c, k: (b, k, 0, 0),
                            memory_space=pltpu.VMEM)
    # K innermost keeps the ct block (b, c) VMEM-resident across taps (the
    # offset-grad blocks that do hop with k are Ho*Wo scalars — cheap)
    dhp, doy, dox, dg = pl.pallas_call(
        partial(_bwd_taps_kernel, m=m, Ho=Ho, Wo=Wo),
        grid=(B, Cq, K),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tile, 2 * Hp * Wp, 2 * Ho * Wo)),
        in_specs=[
            pl.BlockSpec((1, Hp, Wp, tile), hp_map, memory_space=pltpu.VMEM),
            off_spec, off_spec, off_spec,
            pl.BlockSpec((1, Ho, Wo, tile), lambda b, c, k: (b, 0, 0, c),
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


# --------------------------------------------------------------------------
# in-VMEM-pad stride-1 kernels: the product map arrives UNPADDED
# --------------------------------------------------------------------------
#
# The pre-shifted-pad contract above costs one full XLA pass over the product
# map each way (pad/concat in forward, its slice-VJP in backward) — at
# 448px/b4 that is ~160 MB of HBM per conv per direction, measured as the
# dominant deform stream after the r4 step profile. These kernels take the
# tap-major matmul output DIRECTLY ([B, H, W, K*Cout], no padding) and build
# tap k's pre-shifted padded slab in a VMEM scratch: one dynamic-y placement
# copy per grid step (x start is made static by unrolling the kw cases under
# pl.when), then the displacement loop runs on the scratch exactly as in
# `_fwd_taps_kernel`. Semantics == window_accumulate_taps(pre-shifted pad).


def _place_block(src_ref, dst_ref, k, m: int, kw: int, H: int, W: int):
    """dst[py:py+H, px:px+W] = src, py = m+1-ky (dynamic), px = m+1-kx
    (static per unrolled pl.when arm — Mosaic needs static sublane starts)."""
    ky = k // kw
    py = m + 1 - ky
    for kxv in range(kw):
        @pl.when(k % kw == kxv)
        def _copy(kxv=kxv):
            px = m + 1 - kxv
            dst_ref[0, pl.ds(py, H), px:px + W, :] = src_ref[0]


def _extract_block(src_ref, dst_ref, k, m: int, kw: int, H: int, W: int):
    """dst = src[py:py+H, px:px+W] — inverse of `_place_block`."""
    ky = k // kw
    py = m + 1 - ky
    for kxv in range(kw):
        @pl.when(k % kw == kxv)
        def _copy(kxv=kxv):
            px = m + 1 - kxv
            dst_ref[0] = src_ref[0, pl.ds(py, H), px:px + W, :]


def _fwd_taps_inpad_kernel(h_ref, oy_ref, ox_ref, g_ref, out_ref, hp_ref, *,
                           m: int, kw: int, Ho: int, Wo: int):
    """Grid (B, Cq, K); h block [1, Ho, Wo, tile] (tap k's channel tile of
    the unpadded product map); hp_ref = VMEM scratch [1, Hp, Wp, tile]."""
    k = pl.program_id(2)
    n = 2 * m + 2
    oy = oy_ref[0, 0]
    ox = ox_ref[0, 0]
    g = g_ref[0, 0]

    @pl.when(k == 0)
    def _init():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], jnp.float32)

    hp_ref[0] = jnp.zeros(hp_ref.shape[1:], hp_ref.dtype)
    _place_block(h_ref, hp_ref, k, m, kw, Ho, Wo)

    oy_lo, oy_hi = jnp.min(oy), jnp.max(oy)
    ox_lo, ox_hi = jnp.min(ox), jnp.max(ox)

    def body(iy, carry):
        d_y = (iy - m).astype(jnp.float32)
        y_active = (d_y > oy_lo - 1) & (d_y < oy_hi + 1)

        @pl.when(y_active)
        def _row():
            gwy = g * _hat(oy, d_y)
            for ix in range(n):
                d_x = float(ix - m)
                x_active = (d_x > ox_lo - 1) & (d_x < ox_hi + 1)

                @pl.when(x_active)
                def _do(ix=ix, d_x=d_x):
                    wx = _hat(ox, d_x)
                    win = hp_ref[0, pl.ds(iy, Ho), ix:ix + Wo, :]
                    out_ref[0] += (gwy * wx)[..., None] * win.astype(
                        jnp.float32)

        return carry

    jax.lax.fori_loop(0, n, body, 0)


def _bwd_taps_inpad_kernel(h_ref, oy_ref, ox_ref, g_ref, ct_ref, dh_ref,
                           doy_ref, dox_ref, dg_ref, hp_ref, dhp_ref, *,
                           m: int, kw: int, Ho: int, Wo: int):
    k = pl.program_id(2)
    c_idx = pl.program_id(1)
    n = 2 * m + 2
    oy = oy_ref[0, 0]
    ox = ox_ref[0, 0]
    g = g_ref[0, 0]
    ct = ct_ref[0]

    hp_ref[0] = jnp.zeros(hp_ref.shape[1:], hp_ref.dtype)
    _place_block(h_ref, hp_ref, k, m, kw, Ho, Wo)
    dhp_ref[0] = jnp.zeros(dhp_ref.shape[1:], dhp_ref.dtype)

    @pl.when(c_idx == 0)
    def _init():
        doy_ref[0, 0] = jnp.zeros((Ho, Wo), jnp.float32)
        dox_ref[0, 0] = jnp.zeros((Ho, Wo), jnp.float32)
        dg_ref[0, 0] = jnp.zeros((Ho, Wo), jnp.float32)

    oy_lo, oy_hi = jnp.min(oy), jnp.max(oy)
    ox_lo, ox_hi = jnp.min(ox), jnp.max(ox)

    def body(iy, carry):
        d_y = (iy - m).astype(jnp.float32)
        y_active = (d_y > oy_lo - 1) & (d_y < oy_hi + 1)

        @pl.when(y_active)
        def _row():
            wy = _hat(oy, d_y)
            dwy = _dhat(oy, d_y)
            for ix in range(n):
                d_x = float(ix - m)
                x_active = (d_x > ox_lo - 1) & (d_x < ox_hi + 1)

                @pl.when(x_active)
                def _do(ix=ix, d_x=d_x):
                    wx = _hat(ox, d_x)
                    cur = dhp_ref[0, pl.ds(iy, Ho), ix:ix + Wo, :]
                    dhp_ref[0, pl.ds(iy, Ho), ix:ix + Wo, :] = \
                        (cur.astype(jnp.float32)
                         + (g * wy * wx)[..., None] * ct).astype(dhp_ref.dtype)
                    win = hp_ref[0, pl.ds(iy, Ho), ix:ix + Wo, :]
                    s = jnp.sum(ct * win.astype(jnp.float32), axis=-1)
                    doy_ref[0, 0] += g * dwy * wx * s
                    dox_ref[0, 0] += g * wy * _dhat(ox, d_x) * s
                    dg_ref[0, 0] += wy * wx * s

        return carry

    jax.lax.fori_loop(0, n, body, 0)
    _extract_block(dhp_ref, dh_ref, k, m, kw, Ho, Wo)


def window_accumulate_taps_inpad_reference(h_all, oy, ox, gate, m: int,
                                           K: int, kw: int = 3):
    """Oracle: pre-shift-pad each tap's slab, then the padded-taps oracle."""
    B, H, W, KC = h_all.shape
    Cout = KC // K
    hp_all = jnp.concatenate(
        [jnp.pad(h_all[..., k * Cout:(k + 1) * Cout],
                 ((0, 0), (m + 1 - k // kw, m + k // kw),
                  (m + 1 - k % kw, m + k % kw), (0, 0)))
         for k in range(K)], axis=-1)
    return window_accumulate_taps_reference(hp_all, oy, ox, gate, m, K)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def window_accumulate_taps_inpad(h_all: jnp.ndarray, oy: jnp.ndarray,
                                 ox: jnp.ndarray, gate: jnp.ndarray, m: int,
                                 K: int, kw: int = 3,
                                 interpret: bool = False) -> jnp.ndarray:
    """All-taps windowed accumulation from the UNPADDED product map.

    h_all [B, H, W, K*Cout] fp32 or bf16 — the tap-major matmul output
    `feats @ [C, K*Cout]` with NO host-side padding (tap k's pre-shifted
    slab is built in a VMEM scratch, saving one full XLA pad pass over the
    map in forward and its slice-VJP pass in backward); oy/ox/gate
    [B, K, H, W] fp32, offsets clamped to [-m, m]. Output [B, H, W, Cout]
    fp32; dh matches h_all's dtype. Stride 1 only.
    """
    return _fwd_taps_inpad_impl(h_all, oy, ox, gate, m, K, kw, interpret)


def _fwd_taps_inpad_impl(h_all, oy, ox, gate, m, K, kw, interpret):
    B, H, W, KC = h_all.shape
    Cout = KC // K
    Hp, Wp = H + 2 * m + 1, W + 2 * m + 1
    tile = _ctile(Cout, KC, interpret)
    Cq = Cout // tile

    def h_map(b, c, k):
        return (b, 0, 0, k * Cq + c)

    off_spec = pl.BlockSpec((1, 1, H, W), lambda b, c, k: (b, k, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_fwd_taps_inpad_kernel, m=m, kw=kw, Ho=H, Wo=W),
        grid=(B, Cq, K),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tile, Hp * Wp, 2 * H * W)),
        in_specs=[
            pl.BlockSpec((1, H, W, tile), h_map, memory_space=pltpu.VMEM),
            off_spec, off_spec, off_spec,
        ],
        out_specs=pl.BlockSpec((1, H, W, tile), lambda b, c, k: (b, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, Cout), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, Hp, Wp, tile), h_all.dtype)],
        interpret=interpret,
    )(h_all, oy, ox, gate)


def _vjp_taps_inpad_fwd(h_all, oy, ox, gate, m, K, kw, interpret):
    return (_fwd_taps_inpad_impl(h_all, oy, ox, gate, m, K, kw, interpret),
            (h_all, oy, ox, gate))


def _vjp_taps_inpad_bwd(m, K, kw, interpret, res, ct):
    h_all, oy, ox, gate = res
    B, H, W, KC = h_all.shape
    Cout = KC // K
    Hp, Wp = H + 2 * m + 1, W + 2 * m + 1
    tile = _ctile(Cout, KC, interpret)
    Cq = Cout // tile

    def h_map(b, c, k):
        return (b, 0, 0, k * Cq + c)

    off_spec = pl.BlockSpec((1, 1, H, W), lambda b, c, k: (b, k, 0, 0),
                            memory_space=pltpu.VMEM)
    dh, doy, dox, dg = pl.pallas_call(
        partial(_bwd_taps_inpad_kernel, m=m, kw=kw, Ho=H, Wo=W),
        grid=(B, Cq, K),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(tile, 2 * Hp * Wp, 3 * H * W)),
        in_specs=[
            pl.BlockSpec((1, H, W, tile), h_map, memory_space=pltpu.VMEM),
            off_spec, off_spec, off_spec,
            pl.BlockSpec((1, H, W, tile), lambda b, c, k: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, H, W, tile), h_map, memory_space=pltpu.VMEM),
            off_spec, off_spec, off_spec,
        ],
        out_shape=[jax.ShapeDtypeStruct((B, H, W, KC), h_all.dtype),
                   jax.ShapeDtypeStruct((B, K, H, W), jnp.float32),
                   jax.ShapeDtypeStruct((B, K, H, W), jnp.float32),
                   jax.ShapeDtypeStruct((B, K, H, W), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((1, Hp, Wp, tile), h_all.dtype),
                        pltpu.VMEM((1, Hp, Wp, tile), h_all.dtype)],
        interpret=interpret,
    )(h_all, oy, ox, gate, ct)
    return dh, doy, dox, dg


window_accumulate_taps_inpad.defvjp(_vjp_taps_inpad_fwd, _vjp_taps_inpad_bwd)


# --------------------------------------------------------------------------
# stride-2 phase-split kernels: displacement loop at OUTPUT resolution
# --------------------------------------------------------------------------
#
# A stride-2 deform conv only needs every other output position, but the
# upsample-offsets-then-subsample trick pays the full input-res displacement
# loop (4x arithmetic waste). Phase split removes it: space-to-depth the
# pre-shifted product map into 4 parity phases hp[p][q][i, j] =
# hp[2i+p, 2j+q]; then the input row 2*y2 + iy decomposes as phase iy%2,
# row y2 + iy//2 — a STATIC phase choice (x parity is static from the
# unrolled ix; y parity is handled by unrolling both parities inside the
# q-loop), so every displacement is again a cheap static-x / dynamic-y
# slice, now over (Ho/2, Wo/2) blocks.

def window_accumulate_taps_s2_reference(hp00, hp01, hp10, hp11, oy, ox,
                                        gate, m: int, K: int) -> jnp.ndarray:
    """Semantics oracle for the stride-2 phase kernel. hp{p}{q}
    [B, Hp2, Wp2, K*Cout]: parity phases of the (y, x) pre-shifted padded
    product map (even-padded); oy/ox/gate [B, K, Ho2, Wo2] at OUTPUT res
    (offsets in input-pixel units); -> [B, Ho2, Wo2, Cout]."""
    B, Hp2, Wp2, KC = hp00.shape
    Cout = KC // K
    Ho, Wo = oy.shape[2], oy.shape[3]
    full = jnp.zeros((B, 2 * Hp2, 2 * Wp2, KC), hp00.dtype)
    full = full.at[:, 0::2, 0::2].set(hp00).at[:, 0::2, 1::2].set(hp01)
    full = full.at[:, 1::2, 0::2].set(hp10).at[:, 1::2, 1::2].set(hp11)
    out = jnp.zeros((B, Ho, Wo, Cout), jnp.float32)
    for k in range(K):
        hp = full[..., k * Cout:(k + 1) * Cout]
        for dy in range(-m, m + 2):
            wy = _hat(oy[:, k], dy)
            for dx in range(-m, m + 2):
                coeff = gate[:, k] * wy * _hat(ox[:, k], dx)
                win = jax.lax.slice(
                    hp, (0, dy + m, dx + m, 0),
                    (B, dy + m + 2 * Ho - 1, dx + m + 2 * Wo - 1, Cout),
                    (1, 2, 2, 1))
                out = out + coeff[..., None] * win.astype(jnp.float32)
    return out


def _fwd_taps_s2_kernel(hp00_ref, hp01_ref, hp10_ref, hp11_ref, oy_ref,
                        ox_ref, g_ref, out_ref, *, m: int, Ho: int, Wo: int):
    k = pl.program_id(2)
    n = 2 * m + 2
    oy = oy_ref[0, 0]
    ox = ox_ref[0, 0]
    g = g_ref[0, 0]
    refs = ((hp00_ref, hp01_ref), (hp10_ref, hp11_ref))

    @pl.when(k == 0)
    def _init():
        out_ref[0] = jnp.zeros(out_ref.shape[1:], jnp.float32)

    oy_lo, oy_hi = jnp.min(oy), jnp.max(oy)
    ox_lo, ox_hi = jnp.min(ox), jnp.max(ox)

    def body(q, carry):
        for p in (0, 1):  # iy = 2q + p: y parity is static per unrolled arm
            d_y = (2 * q + p - m).astype(jnp.float32)
            y_active = (d_y > oy_lo - 1) & (d_y < oy_hi + 1)

            @pl.when(y_active)
            def _row(p=p, d_y=d_y):
                gwy = g * _hat(oy, d_y)
                for ix in range(n):
                    d_x = float(ix - m)
                    x_active = (d_x > ox_lo - 1) & (d_x < ox_hi + 1)

                    @pl.when(x_active)
                    def _do(p=p, ix=ix, d_x=d_x, gwy=gwy):
                        wx = _hat(ox, d_x)
                        win = refs[p][ix % 2][
                            0, pl.ds(q, Ho), ix // 2:ix // 2 + Wo, :]
                        out_ref[0] += (gwy * wx)[..., None] * win.astype(
                            jnp.float32)

        return carry

    jax.lax.fori_loop(0, m + 1, body, 0)


def _bwd_taps_s2_kernel(hp00_ref, hp01_ref, hp10_ref, hp11_ref, oy_ref,
                        ox_ref, g_ref, ct_ref, dhp00_ref, dhp01_ref,
                        dhp10_ref, dhp11_ref, doy_ref, dox_ref, dg_ref, *,
                        m: int, Ho: int, Wo: int):
    c_idx = pl.program_id(1)
    n = 2 * m + 2
    oy = oy_ref[0, 0]
    ox = ox_ref[0, 0]
    g = g_ref[0, 0]
    ct = ct_ref[0]
    refs = ((hp00_ref, hp01_ref), (hp10_ref, hp11_ref))
    drefs = ((dhp00_ref, dhp01_ref), (dhp10_ref, dhp11_ref))
    for dr in (dhp00_ref, dhp01_ref, dhp10_ref, dhp11_ref):
        dr[0] = jnp.zeros(dr.shape[1:], dr.dtype)

    @pl.when(c_idx == 0)
    def _init():
        doy_ref[0, 0] = jnp.zeros((Ho, Wo), jnp.float32)
        dox_ref[0, 0] = jnp.zeros((Ho, Wo), jnp.float32)
        dg_ref[0, 0] = jnp.zeros((Ho, Wo), jnp.float32)

    oy_lo, oy_hi = jnp.min(oy), jnp.max(oy)
    ox_lo, ox_hi = jnp.min(ox), jnp.max(ox)

    def body(q, carry):
        for p in (0, 1):
            d_y = (2 * q + p - m).astype(jnp.float32)
            y_active = (d_y > oy_lo - 1) & (d_y < oy_hi + 1)

            @pl.when(y_active)
            def _row(p=p, d_y=d_y):
                wy = _hat(oy, d_y)
                dwy = _dhat(oy, d_y)
                for ix in range(n):
                    d_x = float(ix - m)
                    x_active = (d_x > ox_lo - 1) & (d_x < ox_hi + 1)

                    @pl.when(x_active)
                    def _do(p=p, ix=ix, d_x=d_x, wy=wy, dwy=dwy):
                        wx = _hat(ox, d_x)
                        jx = ix // 2
                        dref = drefs[p][ix % 2]
                        cur = dref[0, pl.ds(q, Ho), jx:jx + Wo, :]
                        dref[0, pl.ds(q, Ho), jx:jx + Wo, :] = \
                            (cur.astype(jnp.float32)
                             + (g * wy * wx)[..., None] * ct).astype(dref.dtype)
                        win = refs[p][ix % 2][0, pl.ds(q, Ho), jx:jx + Wo, :]
                        s = jnp.sum(ct * win.astype(jnp.float32), axis=-1)
                        doy_ref[0, 0] += g * dwy * wx * s
                        dox_ref[0, 0] += g * wy * _dhat(ox, d_x) * s
                        dg_ref[0, 0] += wy * wx * s

        return carry

    jax.lax.fori_loop(0, m + 1, body, 0)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def window_accumulate_taps_s2(hp00, hp01, hp10, hp11, oy, ox, gate, m: int,
                              K: int, interpret: bool = False) -> jnp.ndarray:
    """Stride-2 all-taps windowed accumulation over parity phases (see the
    section comment). Same contracts as `window_accumulate_taps`, with
    hp{p}{q} [B, Hp2, Wp2, K*Cout] requiring Hp2 >= Ho2 + m and
    Wp2 >= Wo2 + m; oy/ox/gate at output res [B, K, Ho2, Wo2]."""
    return _fwd_taps_s2_impl(hp00, hp01, hp10, hp11, oy, ox, gate, m, K,
                             interpret)


def _taps_s2_specs(hp00, oy, K, vmem_factor, interpret=False):
    B, Hp2, Wp2, KC = hp00.shape
    Cout = KC // K
    Ho, Wo = oy.shape[2], oy.shape[3]
    tile = _ctile(Cout, KC, interpret)
    Cq = Cout // tile

    def hp_map(b, c, k):
        return (b, 0, 0, k * Cq + c)

    hp_spec = pl.BlockSpec((1, Hp2, Wp2, tile), hp_map,
                           memory_space=pltpu.VMEM)
    off_spec = pl.BlockSpec((1, 1, Ho, Wo), lambda b, c, k: (b, k, 0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, Ho, Wo, tile), lambda b, c, k: (b, 0, 0, c),
                            memory_space=pltpu.VMEM)
    limit = _vmem_limit(tile, vmem_factor * 4 * Hp2 * Wp2, Ho * Wo)
    return B, Cout, Ho, Wo, tile, Cq, hp_spec, off_spec, out_spec, limit


def _fwd_taps_s2_impl(hp00, hp01, hp10, hp11, oy, ox, gate, m, K, interpret):
    (B, Cout, Ho, Wo, tile, Cq, hp_spec, off_spec, out_spec,
     limit) = _taps_s2_specs(hp00, oy, K, 1, interpret)
    return pl.pallas_call(
        partial(_fwd_taps_s2_kernel, m=m, Ho=Ho, Wo=Wo),
        grid=(B, Cq, K),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
        in_specs=[hp_spec] * 4 + [off_spec] * 3,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((B, Ho, Wo, Cout), jnp.float32),
        interpret=interpret,
    )(hp00, hp01, hp10, hp11, oy, ox, gate)


def _vjp_taps_s2_fwd(hp00, hp01, hp10, hp11, oy, ox, gate, m, K, interpret):
    return (_fwd_taps_s2_impl(hp00, hp01, hp10, hp11, oy, ox, gate, m, K,
                              interpret),
            (hp00, hp01, hp10, hp11, oy, ox, gate))


def _vjp_taps_s2_bwd(m, K, interpret, res, ct):
    hp00, hp01, hp10, hp11, oy, ox, gate = res
    (B, Cout, Ho, Wo, tile, Cq, hp_spec, off_spec, out_spec,
     limit) = _taps_s2_specs(hp00, oy, K, 2, interpret)
    KC = hp00.shape[-1]
    hp_sds = jax.ShapeDtypeStruct(hp00.shape, hp00.dtype)
    off_sds = jax.ShapeDtypeStruct(oy.shape, jnp.float32)
    outs = pl.pallas_call(
        partial(_bwd_taps_s2_kernel, m=m, Ho=Ho, Wo=Wo),
        grid=(B, Cq, K),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=limit),
        in_specs=[hp_spec] * 4 + [off_spec] * 3 + [out_spec],
        out_specs=[hp_spec] * 4 + [off_spec] * 3,
        out_shape=[hp_sds] * 4 + [off_sds] * 3,
        interpret=interpret,
    )(hp00, hp01, hp10, hp11, oy, ox, gate, ct)
    return tuple(outs)


window_accumulate_taps_s2.defvjp(_vjp_taps_s2_fwd, _vjp_taps_s2_bwd)


def taps_kernel_supported(Cout: int, K: int) -> bool:
    """Mosaic lane-tiling legality for the stacked-tap kernels.

    The hp/h arrays carry tap-major channels (lane dim = K*Cout) blocked per
    tap, so the channel tile must divide Cout AND satisfy Mosaic's lane rule
    (multiple of 128, or the full array dimension). Such a tile exists iff
    Cout % 128 == 0 (tile 128) or K == 1 (tile == full dim). Callers
    (`ops/deform_conv.py:deform_conv2d_pallas`) must route unsupported
    channel counts to the XLA path instead of dispatching — checking tile ==
    Cout against Cout alone was the r4 gate crash (block (1, 8, 8, 16) vs
    array (..., 144) rejected by Mosaic on real TPU)."""
    return Cout % 128 == 0 or K == 1


def _ctile(C: int, lane_dim: int, interpret: bool = False) -> int:
    """Channel tile for a block over an array whose LAST (lane) dimension is
    `lane_dim`: Mosaic requires the lane-dim block to be a multiple of 128 or
    equal to the full dimension. `C` is the per-tap channel count the tile
    must divide (C == lane_dim for the single-tap kernels; lane_dim = K*C for
    the stacked-tap kernels). The interpreter enforces no lane constraints,
    so interpret mode keeps the per-tap tile for any C (CPU tests/oracles run
    tiny channel counts). VMEM pressure is handled by `_vmem_limit`, not by
    shrinking the tile."""
    if C % 128 == 0:
        return 128
    if C == lane_dim or interpret:
        return C
    raise ValueError(
        f"no legal Mosaic lane tile: per-tap channels {C} not a multiple of "
        f"128 and != blocked lane dim {lane_dim}; gate on "
        f"taps_kernel_supported() and fall back to the XLA path")


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
    ct = _ctile(C, C)
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
    tile = _ctile(C, C)
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
