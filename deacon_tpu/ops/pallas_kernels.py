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
  trimmed — fwd_k = fwd_S masked to 2k bits and rc_k = rc_S >> 2(S - k)
  (bases beyond k fall off the top/bottom respectively), avoiding the
  span-table combine entirely (nothing extra stays live in VMEM). Values
  are little-endian u32 limb lists: 2 limbs for k <= 32, 4 for the wide
  33 <= k <= 56 path (the reference's u128 k-mers, ref:
  src/minimizers.rs:172-190).
* keys: fmix32(xor of all limbs) & 0xFFFF0000, invalid/tail positions
  masked to maximum priority (ref selection scheme: src/minimizers.rs:143-
  148 — priorities replace simd-minimizers' ntHash; see SURVEY §2.2).
* argmin: doubling MIN over key|pos packed u32s, leftmost tie-break via the
  position in the low 16 bits (requires L <= 65536).

Column shifts use pltpu.roll plus an iota mask (Pallas has no pad-shift);
rows are independent so blocks need no halo.

The engine falls back to the XLA stages for k > 56 (impossible: the filter
side asserts k <= 56) and on non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = jnp.uint32
_TOPMASK = 0xFFFF0000
import os as _os

_ROW_BLOCK = int(_os.environ.get("DEACON_ROW_BLOCK", "8"))


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


def _limbs_shl(limbs, n: int):
    """Little-endian u32 limb list << n bits (static n >= 0)."""
    if n == 0:
        return list(limbs)
    nl = len(limbs)
    word, bit = n // 32, n % 32
    zero = jnp.zeros_like(limbs[0])
    out = []
    for i in range(nl):
        v = zero
        if i - word >= 0:
            v = limbs[i - word] << U32(bit) if bit else limbs[i - word]
        if bit and i - word - 1 >= 0:
            v = v | (limbs[i - word - 1] >> U32(32 - bit))
        out.append(v)
    return out


def _limbs_shr(limbs, n: int):
    """Little-endian u32 limb list >> n bits (static n >= 0)."""
    if n == 0:
        return list(limbs)
    nl = len(limbs)
    word, bit = n // 32, n % 32
    zero = jnp.zeros_like(limbs[0])
    out = []
    for i in range(nl):
        v = zero
        if i + word < nl:
            v = limbs[i + word] >> U32(bit) if bit else limbs[i + word]
        if bit and i + word + 1 < nl:
            v = v | (limbs[i + word + 1] << U32(32 - bit))
        out.append(v)
    return out


def _limbs_le(a, b):
    """a <= b elementwise over little-endian limb lists (lexicographic)."""
    # pure compare/and/or chain (Mosaic: no bool truncations or selects)
    le = a[0] <= b[0]
    for la, lb in zip(a[1:], b[1:]):  # lo -> hi: highest differing limb wins
        le = (la < lb) | ((la == lb) & le)
    return le


def _values_kernel_body(codes_u32, mlen_col, *, k: int, w: int):
    """Shared math: (TR, L) u32 codes + (TR, 1) i32 mlen ->
    (limbs list, wp_i32)."""
    L = codes_u32.shape[-1]
    S = _next_pow2(k)
    nl = 2 if k <= 32 else 4
    zero = jnp.zeros_like(codes_u32)
    # span-doubling to S for both strands:
    # f = f | (shift_cols(f, s) << 2s); r = (r << 2s) | shift_cols(r, s)
    f = [codes_u32] + [zero] * (nl - 1)
    r = [codes_u32 ^ U32(2)] + [zero] * (nl - 1)
    s = 1
    while s < S:
        fs = _limbs_shl([_shift_cols(x, s, 0) for x in f], 2 * s)
        f = [a | b for a, b in zip(f, fs)]
        t = _limbs_shl(r, 2 * s)
        r = [a | _shift_cols(b, s, 0) for a, b in zip(t, r)]
        s *= 2
    if S != k:
        # fwd_k: drop bases >= k off the top; rc_k: they fall off the bottom
        full, bit = (2 * k) // 32, (2 * k) % 32
        f = [
            f[i] if i < full else (f[i] & U32((1 << bit) - 1) if (i == full and bit) else zero)
            for i in range(nl)
        ]
        r = _limbs_shr(r, 2 * (S - k))
    take_f = _limbs_le(f, r)
    limbs = [jnp.where(take_f, a, b) for a, b in zip(f, r)]

    fold = limbs[0]
    for x in limbs[1:]:
        fold = fold ^ x
    keys = _fmix32(fold) & U32(_TOPMASK)
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
    return limbs, wp


def _values_select_kernel_body(codes_u32, valid_u32, mlen_col, allow_col,
                               *, k: int, w: int):
    """Kernel-v2 math: (TR, L) u32 codes + 0/1 validity + (TR, 1) mlen/
    allow_short -> (vsel limbs, wp_i32, flag_u32).

    Beyond v1 it keeps the whole flag pipeline in VMEM:
    * kmer validity = doubling-OR of invalid bases over the k-span
      (2-span RMQ cover; overlap is harmless for OR),
    * the selected minimizer's VALUE limbs and validity bit ride through
      the doubling window-min as select-carried payloads (leftmost
      tie-break is exact: the packed position makes every key unique),
    * flag = window-valid & new-minimizer & selected-kmer-valid —
      bit-identical to engine._stage_flag_mask's gather formulation.

    The payload-carrying min removes both the separate flag stage and the
    downstream value-plane gathers: the fused step's HBM traffic per base
    drops from ~39 B (v1: limbs+wp out, flags stage in/out, slot limb
    gathers) to ~13 B (vsel+wp+flag out only).
    """
    L = codes_u32.shape[-1]
    S = _next_pow2(k)
    nl = 2 if k <= 32 else 4
    zero = jnp.zeros_like(codes_u32)
    f = [codes_u32] + [zero] * (nl - 1)
    r = [codes_u32 ^ U32(2)] + [zero] * (nl - 1)
    s = 1
    while s < S:
        fs = _limbs_shl([_shift_cols(x, s, 0) for x in f], 2 * s)
        f = [a | b for a, b in zip(f, fs)]
        t = _limbs_shl(r, 2 * s)
        r = [a | _shift_cols(b, s, 0) for a, b in zip(t, r)]
        s *= 2
    if S != k:
        full, bit = (2 * k) // 32, (2 * k) % 32
        f = [
            f[i] if i < full else (f[i] & U32((1 << bit) - 1) if (i == full and bit) else zero)
            for i in range(nl)
        ]
        r = _limbs_shr(r, 2 * (S - k))
    take_f = _limbs_le(f, r)
    limbs = [jnp.where(take_f, a, b) for a, b in zip(f, r)]

    fold = limbs[0]
    for x in limbs[1:]:
        fold = fold ^ x
    keys = _fmix32(fold) & U32(_TOPMASK)
    col = jax.lax.broadcasted_iota(jnp.int32, codes_u32.shape, 1)
    in_row = col < mlen_col
    t = jnp.where(in_row, keys, U32(_TOPMASK)) | col.astype(U32)

    # kmer validity: ANY invalid base in [p, p+k), 2-span pow2 cover; the
    # shifted-in tail fill is "invalid", which only affects positions the
    # window-valid mask already excludes
    inv = valid_u32 ^ U32(1)
    span = 1
    a = inv
    while span * 2 <= k:
        a = a | _shift_cols(a, span, 1)
        span *= 2
    if k - span > 0:
        a = a | _shift_cols(a, k - span, 1)
    kv = jnp.where((a == 0) & in_row, U32(1), U32(0))

    ts = jax.lax.bitcast_convert_type(t ^ U32(0x80000000), jnp.int32)
    imax = 0x7FFFFFFF

    def shift_i32(x, n):
        rr = pltpu.roll(x, shift=L - n, axis=1)
        return jnp.where(col < L - n, rr, jnp.int32(imax))

    carry = list(limbs) + [kv]

    def step(ts, carry, n):
        ts_sh = shift_i32(ts, n)
        take_self = ts <= ts_sh  # unique keys: exact leftmost tie-break
        carry = [
            jnp.where(take_self, c, _shift_cols(c, n, 0)) for c in carry
        ]
        return jnp.minimum(ts, ts_sh), carry

    span = 1
    while span * 2 <= w:
        ts, carry = step(ts, carry, span)
        span *= 2
    if w - span > 0:
        ts, carry = step(ts, carry, w - span)
    wp = jnp.minimum(ts & jnp.int32(0xFFFF), L - 1)
    vsel, kv_sel = carry[:nl], carry[nl]

    # flag = win_valid & new_min & kv(selected position), packed into the
    # wp word's bit 16 (wp < 65536 occupies the low 16 bits) so the kernel
    # emits no extra plane for it
    prev_wp = pltpu.roll(wp, shift=1, axis=1)
    prev_wp = jnp.where(col >= 1, prev_wp, jnp.int32(-1))
    new_min = (col == 0) | (wp != prev_wp)
    win_valid = (col <= mlen_col - w) | (
        (col == 0) & (allow_col > 0) & (mlen_col >= 1)
    )
    flag = jnp.where(
        win_valid & new_min & (kv_sel == U32(1)),
        jnp.int32(1 << 16), jnp.int32(0),
    )
    return vsel, wp | flag


@functools.partial(jax.jit, static_argnames=("k", "w", "interpret"))
def values_select_fused(codes, validb, mlen, allow_short, *, k: int, w: int,
                        interpret: bool = False):
    """(R, L) u8/u32 codes + validity + per-row mlen/allow_short ->
    (*selected_value_limbs, wpf_i): the selected minimizer's value limbs AT
    EVERY WINDOW POSITION plus the packed argmin word (low 16 bits = wp,
    bit 16 = final candidate flag). Replaces engine's _stage_values +
    _stage_argmin + _stage_flag_mask + the slot limb gathers (see kernel
    body docstring). R must be a multiple of 8; L a multiple of 128 and
    <= 65536."""
    if k > 56:
        raise ValueError("pallas fused path supports k <= 56 only")
    R, L = codes.shape
    TR = _ROW_BLOCK
    assert R % TR == 0 and L % 128 == 0 and L <= 65536
    nl = 2 if k <= 32 else 4

    def kernel(codes_ref, valid_ref, mlen_ref, allow_ref, *out_refs):
        c = codes_ref[:].astype(U32)
        v = valid_ref[:].astype(U32)
        vsel, wpf = _values_select_kernel_body(
            c, v, mlen_ref[:], allow_ref[:], k=k, w=w
        )
        for ref, limb in zip(out_refs[:nl], vsel):
            ref[:] = limb
        out_refs[nl][:] = wpf

    grid = (R // TR,)
    row_block = lambda i: (i, 0)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, L), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, L), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), row_block, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((TR, L), row_block, memory_space=pltpu.VMEM)
            for _ in range(nl + 1)
        ),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((R, L), jnp.uint32) for _ in range(nl)]
            + [jax.ShapeDtypeStruct((R, L), jnp.int32)]
        ),
        interpret=interpret,
    )(
        codes,
        validb.astype(jnp.uint8),
        mlen.reshape(R, 1),
        allow_short.astype(jnp.int32).reshape(R, 1),
    )
    return tuple(out[:nl]), out[nl]


def _select_csum_kernel_body(pci_u32, pvi_u32, mlen_col, allow_col,
                             *, k: int, w: int, L: int):
    """Kernel-v3 math: quarter-interleaved packed codes (TR, L/4) +
    eighth-interleaved validity bytes (TR, L/8) -> ONE (TR, L) i32 plane
    ((in-row flag-cumsum << 16) | wp) + (TR, 1) row totals.

    Beyond v2 it (a) unpacks the 2-bit codes and validity bits in VMEM, so
    the kernel reads 0.375 bytes/base instead of 2 and the separate XLA
    unpack stage disappears, and (b) carries NO value payloads through the
    doubling window-min — downstream recomputes the selected value from the
    LINEAR packed codes at the compacted slots (engine._stage_hash_packed),
    which the packed stream makes trivial: bits [2p, 2p+2k) ARE the forward
    k-mer value at p. The only dense outputs are the packed word (wp in
    the low 14 bits, in-row inclusive flag-cumsum at bits 16..30) and a
    (TR, 1) total column, so compaction needs no dense cumsum pass either.

    The interleaved layout exists because Mosaic's repeat is TILE-repeat
    (x tiled end-to-end, lane p reads x[p mod Lp]), not element-repeat:
    byte i of the interleaved plane holds codes {i, i+Lp, i+2Lp, i+3Lp}
    (engine.host_interleave_packed), so after tile-repeat lane p's code
    sits at bit 2*(p div Lp) — a shift that is CONSTANT per quarter and
    needs only three lane-range compares, no division. Requires L <= 16384
    (wp <= 16383 and csum << 16 < 2^31) — every DevicePipeline tile class
    satisfies this.
    """
    S = _next_pow2(k)
    nl = 2 if k <= 32 else 4
    TR = pci_u32.shape[0]
    Lp, Lv = L // 4, L // 8
    col = jax.lax.broadcasted_iota(jnp.int32, (TR, L), 1)

    # codes: lane p reads interleaved byte (p mod Lp) at bit 2*(p div Lp)
    repc = pltpu.repeat(pci_u32, 4, axis=1)
    shq = (
        (col >= Lp).astype(jnp.int32)
        + (col >= 2 * Lp).astype(jnp.int32)
        + (col >= 3 * Lp).astype(jnp.int32)
    )
    codes_u32 = (repc >> (U32(2) * shq.astype(U32))) & U32(3)
    # validity: lane p reads interleaved byte (p mod Lv) at bit (p div Lv)
    repv = pltpu.repeat(pvi_u32, 8, axis=1)
    shv = shq - shq  # zeros
    for m in range(1, 8):
        shv = shv + (col >= m * Lv).astype(jnp.int32)
    valid_u32 = (repv >> shv.astype(U32)) & U32(1)

    zero = jnp.zeros_like(codes_u32)
    f = [codes_u32] + [zero] * (nl - 1)
    r = [codes_u32 ^ U32(2)] + [zero] * (nl - 1)
    s = 1
    while s < S:
        fs = _limbs_shl([_shift_cols(x, s, 0) for x in f], 2 * s)
        f = [a | b for a, b in zip(f, fs)]
        t = _limbs_shl(r, 2 * s)
        r = [a | _shift_cols(b, s, 0) for a, b in zip(t, r)]
        s *= 2
    if S != k:
        full, bit = (2 * k) // 32, (2 * k) % 32
        f = [
            f[i] if i < full else (f[i] & U32((1 << bit) - 1) if (i == full and bit) else zero)
            for i in range(nl)
        ]
        r = _limbs_shr(r, 2 * (S - k))
    take_f = _limbs_le(f, r)
    limbs = [jnp.where(take_f, a, b) for a, b in zip(f, r)]

    fold = limbs[0]
    for x in limbs[1:]:
        fold = fold ^ x
    keys = _fmix32(fold) & U32(_TOPMASK)
    in_row = col < mlen_col
    t = jnp.where(in_row, keys, U32(_TOPMASK)) | col.astype(U32)

    inv = valid_u32 ^ U32(1)
    span = 1
    a = inv
    while span * 2 <= k:
        a = a | _shift_cols(a, span, 1)
        span *= 2
    if k - span > 0:
        a = a | _shift_cols(a, k - span, 1)
    kv = jnp.where((a == 0) & in_row, U32(1), U32(0))

    ts = jax.lax.bitcast_convert_type(t ^ U32(0x80000000), jnp.int32)
    imax = 0x7FFFFFFF

    def shift_i32(x, n):
        rr = pltpu.roll(x, shift=L - n, axis=1)
        return jnp.where(col < L - n, rr, jnp.int32(imax))

    def step(ts, kvc, n):
        ts_sh = shift_i32(ts, n)
        take_self = ts <= ts_sh  # unique keys: exact leftmost tie-break
        kvc = jnp.where(take_self, kvc, _shift_cols(kvc, n, 0))
        return jnp.minimum(ts, ts_sh), kvc

    kvc = kv
    span = 1
    while span * 2 <= w:
        ts, kvc = step(ts, kvc, span)
        span *= 2
    if w - span > 0:
        ts, kvc = step(ts, kvc, w - span)
    wp = jnp.minimum(ts & jnp.int32(0xFFFF), L - 1)

    prev_wp = pltpu.roll(wp, shift=1, axis=1)
    prev_wp = jnp.where(col >= 1, prev_wp, jnp.int32(-1))
    new_min = (col == 0) | (wp != prev_wp)
    win_valid = (col <= mlen_col - w) | (
        (col == 0) & (allow_col > 0) & (mlen_col >= 1)
    )
    flag = jnp.where(
        win_valid & new_min & (kvc == U32(1)), jnp.int32(1), jnp.int32(0)
    )

    # in-row inclusive cumsum of flags (Hillis-Steele doubling; right-shift
    # brings earlier lanes forward)
    cs = flag
    n = 1
    while n < L:
        sh = pltpu.roll(cs, shift=n, axis=1)
        cs = cs + jnp.where(col >= n, sh, jnp.int32(0))
        n *= 2
    plane = (cs << jnp.int32(16)) | wp
    row_tot = jnp.max(cs, axis=1, keepdims=True)  # cumsum is monotone
    return plane, row_tot


@functools.partial(jax.jit, static_argnames=("k", "w", "interpret"))
def select_csum_packed(packed_codes, packed_valid, mlen, allow_short,
                       *, k: int, w: int, interpret: bool = False):
    """(R, L/4) u8 quarter-INTERLEAVED packed codes + (R, L/8) u8
    eighth-interleaved validity bytes (engine.host_interleave_packed) +
    per-row mlen/allow_short -> ((R, L) i32 plane, (R, 1) i32 row totals)
    where plane = (in-row inclusive flag-cumsum << 16) | wp. See
    _select_csum_kernel_body. R % 8 == 0, 128 | L <= 16384, k <= 32 (wide
    k falls back to the v2 kernel in the engine)."""
    if k > 32:
        raise ValueError("pallas v3 kernel supports k <= 32 only")
    R, Lp = packed_codes.shape
    L = Lp * 4
    TR = _ROW_BLOCK
    assert R % TR == 0 and L % 128 == 0 and L <= 16384

    def kernel(pc_ref, pv_ref, mlen_ref, allow_ref, plane_ref, tot_ref):
        pc = pc_ref[:].astype(U32)
        pv = pv_ref[:].astype(U32)
        plane, row_tot = _select_csum_kernel_body(
            pc, pv, mlen_ref[:], allow_ref[:], k=k, w=w, L=L
        )
        plane_ref[:] = plane
        tot_ref[:] = row_tot

    grid = (R // TR,)
    row_block = lambda i: (i, 0)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, L // 4), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, L // 8), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), row_block, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TR, L), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), row_block, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, L), jnp.int32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ),
        interpret=interpret,
    )(
        packed_codes,
        packed_valid,
        mlen.reshape(R, 1),
        allow_short.astype(jnp.int32).reshape(R, 1),
    )
    return out[0], out[1]


def _select_compact_kernel_body(pci_u32, pvi_u32, mlen_col, allow_col,
                                *, k: int, w: int, L: int, Br: int):
    """Kernel-v4 math: quarter/eighth-interleaved packed inputs ->
    COMPACTED per-row slots ((TR, Br) wp positions + selected-value limb
    planes) + (TR, 1) row totals.

    v4 = v3's packed-input selection front end + two additions that remove
    every downstream per-slot random gather (TPU gathers are
    element-serial, ~7-22 ns per query — the profiled engine bottleneck):

    * the selected minimizer's value limbs ride the doubling window-min as
      select payloads again (as in kernel v2), so no packed-word gathers
      are needed to rebuild values;
    * flagged windows are compacted IN-KERNEL to the front of each row by
      LSB-first butterfly routing — a monotone (order-preserving)
      compaction routes conflict-free through a butterfly network (the
      reverse-banyan concentrator theorem; verified exhaustively in
      tests), each stage being two pltpu.rolls + selects per carried
      plane. The first Br lanes per row are the slot grid; downstream
      hashing/probing/counting is elementwise over it.

    Per-row budget Br (static, 128 | Br): rows whose selected count
    exceeds Br lose the tail — the kernel reports per-row totals and the
    engine raises BudgetOverflow when max(row_tot) > Br (the selection
    density 2/(w+1) concentrates tightly at row scale, so the default
    1.5x margin overflows only adversarially).
    """
    col = jax.lax.broadcasted_iota(jnp.int32, (pci_u32.shape[0], L), 1)
    S = _next_pow2(k)
    nl = 2 if k <= 32 else 4
    Lp, Lv = L // 4, L // 8

    repc = pltpu.repeat(pci_u32, 4, axis=1)
    shq = (
        (col >= Lp).astype(jnp.int32)
        + (col >= 2 * Lp).astype(jnp.int32)
        + (col >= 3 * Lp).astype(jnp.int32)
    )
    codes_u32 = (repc >> (U32(2) * shq.astype(U32))) & U32(3)
    repv = pltpu.repeat(pvi_u32, 8, axis=1)
    shv = jnp.zeros_like(shq)
    for mth in range(1, 8):
        shv = shv + (col >= mth * Lv).astype(jnp.int32)
    valid_u32 = (repv >> shv.astype(U32)) & U32(1)

    zero = jnp.zeros_like(codes_u32)
    f = [codes_u32] + [zero] * (nl - 1)
    r = [codes_u32 ^ U32(2)] + [zero] * (nl - 1)
    s = 1
    while s < S:
        fs = _limbs_shl([_shift_cols(x, s, 0) for x in f], 2 * s)
        f = [a | b for a, b in zip(f, fs)]
        t = _limbs_shl(r, 2 * s)
        r = [a | _shift_cols(b, s, 0) for a, b in zip(t, r)]
        s *= 2
    if S != k:
        full, bit = (2 * k) // 32, (2 * k) % 32
        f = [
            f[i] if i < full else (f[i] & U32((1 << bit) - 1) if (i == full and bit) else zero)
            for i in range(nl)
        ]
        r = _limbs_shr(r, 2 * (S - k))
    take_f = _limbs_le(f, r)
    limbs = [jnp.where(take_f, a, b) for a, b in zip(f, r)]

    fold = limbs[0]
    for x in limbs[1:]:
        fold = fold ^ x
    keys = _fmix32(fold) & U32(_TOPMASK)
    in_row = col < mlen_col
    t = jnp.where(in_row, keys, U32(_TOPMASK)) | col.astype(U32)

    inv = valid_u32 ^ U32(1)
    span = 1
    a = inv
    while span * 2 <= k:
        a = a | _shift_cols(a, span, 1)
        span *= 2
    if k - span > 0:
        a = a | _shift_cols(a, k - span, 1)
    kv = jnp.where((a == 0) & in_row, U32(1), U32(0))

    ts = jax.lax.bitcast_convert_type(t ^ U32(0x80000000), jnp.int32)
    imax = 0x7FFFFFFF

    def shift_i32(x, n):
        rr = pltpu.roll(x, shift=L - n, axis=1)
        return jnp.where(col < L - n, rr, jnp.int32(imax))

    # the canonical value occupies 2k bits of the nl*32-bit limb space:
    # when the top limb has a spare bit (k <= 31 of the k <= 32 this
    # kernel supports), the k-mer-valid bit rides there through the
    # window-min instead of as its own carried plane — one fewer
    # roll+select per doubling step
    kv_packed = 2 * k < 32 * nl
    if kv_packed:
        carry = list(limbs)
        carry[nl - 1] = carry[nl - 1] | (kv << U32(31))
    else:
        carry = list(limbs) + [kv]

    def step(ts, carry, n):
        ts_sh = shift_i32(ts, n)
        take_self = ts <= ts_sh
        carry = [jnp.where(take_self, c, _shift_cols(c, n, 0)) for c in carry]
        return jnp.minimum(ts, ts_sh), carry

    span = 1
    while span * 2 <= w:
        ts, carry = step(ts, carry, span)
        span *= 2
    if w - span > 0:
        ts, carry = step(ts, carry, w - span)
    wp = jnp.minimum(ts & jnp.int32(0xFFFF), L - 1)
    if kv_packed:
        vsel = carry[:nl]
        kv_sel = vsel[nl - 1] >> U32(31)
        vsel[nl - 1] = vsel[nl - 1] & U32(0x7FFFFFFF)
    else:
        vsel, kv_sel = carry[:nl], carry[nl]

    prev_wp = pltpu.roll(wp, shift=1, axis=1)
    prev_wp = jnp.where(col >= 1, prev_wp, jnp.int32(-1))
    new_min = (col == 0) | (wp != prev_wp)
    win_valid = (col <= mlen_col - w) | (
        (col == 0) & (allow_col > 0) & (mlen_col >= 1)
    )
    flag = jnp.where(
        win_valid & new_min & (kv_sel == U32(1)), jnp.int32(1), jnp.int32(0)
    )

    cs = flag
    n = 1
    while n < L:
        sh = pltpu.roll(cs, shift=n, axis=1)
        cs = cs + jnp.where(col >= n, sh, jnp.int32(0))
        n *= 2
    row_tot = jnp.max(cs, axis=1, keepdims=True)

    # LSB-first butterfly compaction of (wp, vsel...) to the row front.
    # Lane i holds (alive, target) — at stage b an element crosses to
    # partner i^b iff its target's bit b differs from its lane's; monotone
    # targets guarantee no two elements contend for a lane.
    #
    # The routing state (target lane, alive bit, wp payload) is PACKED into
    # one i32 plane — meta = (tgt << 14) | wp for alive lanes, -1 for dead
    # ones (tgt, wp < L <= 16384 fit 14 bits each; meta stays positive) —
    # so each stage moves 3 planes (meta + 2 value limbs) instead of 5.
    # The butterfly is the dominant per-stage cost of this kernel; the
    # packing is worth ~25% of its runtime on v5e.
    meta = jnp.where(
        flag == 1, ((cs - 1) << jnp.int32(14)) | wp, jnp.int32(-1)
    )
    planes = [jax.lax.bitcast_convert_type(v, jnp.int32) for v in vsel]
    b = 1
    while b < L:
        colb = col & b
        colb0 = colb == 0

        def partner(x):
            return jnp.where(
                colb0,
                pltpu.roll(x, shift=L - b, axis=1),  # from lane i+b
                pltpu.roll(x, shift=b, axis=1),      # from lane i-b
            )

        p_meta = partner(meta)
        here_ok = (meta >= 0) & (((meta >> jnp.int32(14)) & b) == colb)
        part_ok = (p_meta >= 0) & (((p_meta >> jnp.int32(14)) & b) == colb)
        take_part = jnp.logical_and(jnp.logical_not(here_ok), part_ok)
        planes = [jnp.where(take_part, partner(x), x) for x in planes]
        meta = jnp.where(
            take_part, p_meta, jnp.where(here_ok, meta, jnp.int32(-1))
        )
        b *= 2

    pos_c = (meta & jnp.int32(0x3FFF))[:, :Br]
    v_c = [
        jax.lax.bitcast_convert_type(x[:, :Br], jnp.uint32)
        for x in planes
    ]
    return pos_c, v_c, row_tot


@functools.partial(jax.jit, static_argnames=("k", "w", "Br", "interpret"))
def select_compact_packed(packed_codes, packed_valid, mlen, allow_short,
                          *, k: int, w: int, Br: int,
                          interpret: bool = False):
    """(R, L/4)+(R, L/8) u8 interleaved packed inputs -> per-row compacted
    slots: ((R, Br) i32 minimizer positions, [limb (R, Br) u32 planes],
    (R, 1) i32 row totals). See _select_compact_kernel_body. R % 8 == 0,
    128 | L <= 16384, 128 | Br <= L, k <= 32."""
    if k > 32:
        raise ValueError("pallas v4 kernel supports k <= 32 only")
    R, Lp = packed_codes.shape
    L = Lp * 4
    TR = _ROW_BLOCK
    assert R % TR == 0 and L % 128 == 0 and L <= 16384
    assert Br % 128 == 0 and Br <= L
    nl = 2

    def kernel(pc_ref, pv_ref, mlen_ref, allow_ref, pos_ref, v0_ref, v1_ref,
               tot_ref):
        pc = pc_ref[:].astype(U32)
        pv = pv_ref[:].astype(U32)
        pos_c, v_c, row_tot = _select_compact_kernel_body(
            pc, pv, mlen_ref[:], allow_ref[:], k=k, w=w, L=L, Br=Br
        )
        pos_ref[:] = pos_c
        v0_ref[:] = v_c[0]
        v1_ref[:] = v_c[1]
        tot_ref[:] = row_tot

    grid = (R // TR,)
    row_block = lambda i: (i, 0)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, L // 4), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, L // 8), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), row_block, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TR, Br), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, Br), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, Br), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), row_block, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, Br), jnp.int32),
            jax.ShapeDtypeStruct((R, Br), jnp.uint32),
            jax.ShapeDtypeStruct((R, Br), jnp.uint32),
            jax.ShapeDtypeStruct((R, 1), jnp.int32),
        ),
        interpret=interpret,
    )(
        packed_codes,
        packed_valid,
        mlen.reshape(R, 1),
        allow_short.astype(jnp.int32).reshape(R, 1),
    )
    return out[0], (out[1], out[2]), out[3]


@functools.partial(
    jax.jit, static_argnames=("k", "w", "interpret")
)
def values_argmin_fused(codes, mlen, *, k: int, w: int, interpret: bool = False):
    """(R, L) u8/u32 codes + (R,) i32 mlen -> (*value_limbs, wp_i).

    Drop-in fused replacement for engine._stage_values + _stage_argmin:
    2 value limbs for k <= 32, 4 for 33 <= k <= 56. R must be a multiple
    of 8; L a multiple of 128 and <= 65536.
    """
    if k > 56:
        raise ValueError("pallas fused path supports k <= 56 only")
    R, L = codes.shape
    TR = _ROW_BLOCK
    assert R % TR == 0 and L % 128 == 0 and L <= 65536
    nl = 2 if k <= 32 else 4

    def kernel(codes_ref, mlen_ref, *out_refs):
        c = codes_ref[:].astype(U32)  # cast once at entry (u8 tiling)
        limbs, wp = _values_kernel_body(c, mlen_ref[:], k=k, w=w)
        for ref, limb in zip(out_refs[:nl], limbs):
            ref[:] = limb
        out_refs[nl][:] = wp

    grid = (R // TR,)
    row_block = lambda i: (i, 0)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, L), row_block, memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, 1), row_block, memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((TR, L), row_block, memory_space=pltpu.VMEM)
            for _ in range(nl + 1)
        ),
        out_shape=tuple(
            [jax.ShapeDtypeStruct((R, L), jnp.uint32) for _ in range(nl)]
            + [jax.ShapeDtypeStruct((R, L), jnp.int32)]
        ),
        interpret=interpret,
    )(codes, mlen.reshape(R, 1))
    return tuple(out[:nl]), out[nl]
