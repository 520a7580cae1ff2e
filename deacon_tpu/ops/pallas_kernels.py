"""Pallas TPU kernels for the engine's dominant stages.

Fuses S1 (canonical k-mer value limbs + selection keys) and S2 (window
argmin) of the device engine (ops/engine.py) into ONE kernel: the (R, L)
tile streams HBM->VMEM once per row-block, all intermediates (span values,
keys, doubling minima) live in VMEM, and only the two value limbs and the
per-window argmin positions return to HBM. The separate XLA stages
materialize keys and several span tables between dispatches; the fused
kernel removes that traffic and two dispatch boundaries.

Math matches ops/engine.py `_stage_values` + `_stage_argmin` bit-for-bit
(enforced by tests/test_pallas_kernels.py against the XLA stages and the
NumPy oracle):

* values: fwd/rc built by pure span-doubling to S = next_pow2(k), then
  trimmed — fwd_k = fwd_S & ((1 << 2k) - 1) and rc_k = rc_S >> 2(S - k)
  (bases beyond k fall off the top/bottom respectively), avoiding the
  span-table combine entirely (nothing extra stays live in VMEM).
* keys: fmix32(limb0 ^ limb1) & 0xFFFF0000, invalid/tail positions masked
  to maximum priority (ref selection scheme: src/minimizers.rs:143-148 —
  priorities replace simd-minimizers' ntHash; see SURVEY §2.2).
* argmin: doubling MIN over key|pos packed u32s, leftmost tie-break via the
  position in the low 16 bits (requires L <= 65536).

Column shifts use pltpu.roll plus an iota mask (Pallas has no pad-shift);
rows are independent so blocks need no halo.

Only k <= 32 (2 value limbs) is implemented; the engine falls back to the
XLA stages for k > 32 and on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
_TOPMASK = 0xFFFF0000
_ROW_BLOCK = 8


def _next_pow2(k: int) -> int:
    s = 1
    while s < k:
        s *= 2
    return s


def _fmix32(x):
    x = x ^ (x >> U32(16))
    x = x * U32(0x85EBCA6B)
    x = x ^ (x >> U32(13))
    x = x * U32(0xC2B2AE35)
    return x ^ (x >> U32(16))


def _shift_cols(x, n: int, fill: int):
    """x[:, p] <- x[:, p+n], tail filled with `fill` (static n)."""
    if n == 0:
        return x
    L = x.shape[-1]
    r = pltpu.roll(x, shift=L - n, axis=1)  # left-shift by n (circular)
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(col < L - n, r, U32(fill))


def _limbs_shl(a, b, n: int):
    """(lo, hi) u32 pair << n (static, 0 <= n <= 32)."""
    if n == 0:
        return a, b
    if n == 32:
        return jnp.zeros_like(a), a
    return a << U32(n), (b << U32(n)) | (a >> U32(32 - n))


def _limbs_shr(a, b, n: int):
    """(lo, hi) u32 pair >> n (static, 0 <= n < 64)."""
    if n == 0:
        return a, b
    if n >= 32:
        m = n - 32
        lo = b >> U32(m) if m else b
        return lo, jnp.zeros_like(b)
    return (a >> U32(n)) | (b << U32(32 - n)), b >> U32(n)


def _values_kernel_body(codes_u32, mlen_col, *, k: int, w: int):
    """Shared math: (TR, L) u32 codes + (TR, 1) i32 mlen ->
    (limb_lo, limb_hi, wp_i32)."""
    L = codes_u32.shape[-1]
    S = _next_pow2(k)
    # span-doubling to S for both strands
    flo, fhi = codes_u32, jnp.zeros_like(codes_u32)
    rlo, rhi = codes_u32 ^ U32(2), jnp.zeros_like(codes_u32)
    s = 1
    while s < S:
        slo, shi = _limbs_shl(
            _shift_cols(flo, s, 0), _shift_cols(fhi, s, 0), 2 * s
        )
        flo, fhi = flo | slo, fhi | shi
        tlo, thi = _limbs_shl(rlo, rhi, 2 * s)
        rlo, rhi = tlo | _shift_cols(rlo, s, 0), thi | _shift_cols(rhi, s, 0)
        s *= 2
    if S != k:
        # fwd_k: drop bases >= k off the top; rc_k: they fall off the bottom
        if 2 * k <= 32:
            flo = flo & U32((1 << (2 * k)) - 1)
            fhi = jnp.zeros_like(fhi)
        elif 2 * k < 64:
            fhi = fhi & U32((1 << (2 * k - 32)) - 1)
        rlo, rhi = _limbs_shr(rlo, rhi, 2 * (S - k))
    take_f = (fhi < rhi) | ((fhi == rhi) & (flo <= rlo))
    lo = jnp.where(take_f, flo, rlo)
    hi = jnp.where(take_f, fhi, rhi)

    keys = _fmix32(lo ^ hi) & U32(_TOPMASK)
    col = jax.lax.broadcasted_iota(jnp.int32, codes_u32.shape, 1)
    in_row = col < mlen_col  # (TR, 1) broadcasts over L
    t = jnp.where(in_row, keys, U32(_TOPMASK)) | col.astype(U32)

    # Mosaic has no vector minui: flip the sign bit and run the doubling
    # min in signed i32 (order-preserving; bit 31 never reaches the low-16
    # position extraction)
    ts = jax.lax.bitcast_convert_type(t ^ U32(0x80000000), jnp.int32)
    imax = 0x7FFFFFFF  # flipped image of u32 0xFFFFFFFF

    def shift_i32(x, n):
        r = pltpu.roll(x, shift=L - n, axis=1)
        return jnp.where(col < L - n, r, jnp.int32(imax))

    span = 1
    while span * 2 <= w:
        ts = jnp.minimum(ts, shift_i32(ts, span))
        span *= 2
    if w - span > 0:
        ts = jnp.minimum(ts, shift_i32(ts, w - span))
    wp = jnp.minimum(ts & jnp.int32(0xFFFF), L - 1)
    return lo, hi, wp


@functools.partial(
    jax.jit, static_argnames=("k", "w", "interpret")
)
def values_argmin_fused(codes, mlen, *, k: int, w: int, interpret: bool = False):
    """(R, L) u8/u32 codes + (R,) i32 mlen -> (limb_lo, limb_hi, wp_i).

    Drop-in fused replacement for engine._stage_values + _stage_argmin
    (k <= 32 only). R must be a multiple of 8; L a multiple of 128 and
    <= 65536.
    """
    if k > 32:
        raise ValueError("pallas fused path supports k <= 32 only")
    R, L = codes.shape
    TR = _ROW_BLOCK
    assert R % TR == 0 and L % 128 == 0 and L <= 65536

    def kernel(codes_ref, mlen_ref, lo_ref, hi_ref, wp_ref):
        c = codes_ref[:].astype(U32)  # cast once at entry (u8 tiling)
        lo, hi, wp = _values_kernel_body(c, mlen_ref[:], k=k, w=w)
        lo_ref[:] = lo
        hi_ref[:] = hi
        wp_ref[:] = wp

    grid = (R // TR,)
    row_block = lambda i: (i, 0)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, L), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), row_block, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TR, L), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, L), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, L), row_block, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, L), jnp.uint32),
            jax.ShapeDtypeStruct((R, L), jnp.uint32),
            jax.ShapeDtypeStruct((R, L), jnp.int32),
        ),
        interpret=interpret,
    )(codes, mlen.reshape(R, 1))
