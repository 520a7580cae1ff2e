"""64-bit integer emulation as (lo, hi) uint32 pairs for TPU device code.

Rationale: enabling jax_enable_x64 makes XLA:TPU emulate 64-bit EVERYWHERE
(iotas, searchsorted indices, gathers), measured at 100-1000x slowdowns and
pathological compile times on the axon v5e backend. The engine instead keeps
all device arrays 32-bit and emulates the few genuinely-64-bit computations
(k-mer value packing, XXH3-64) on u32 pairs with these helpers.

All functions take/return (lo, hi) tuples of uint32 arrays. Static shift
amounts only. Verified bit-exact against the NumPy uint64 oracle in
tests/test_u64pair.py.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import xxh3 as hxxh3

U32 = jnp.uint32


def const(v: int):
    return U32(v & 0xFFFFFFFF), U32((v >> 32) & 0xFFFFFFFF)


def xor(a, b):
    return a[0] ^ b[0], a[1] ^ b[1]


def _addc(x, y):
    s = x + y
    return s, (s < x).astype(U32)


def add(a, b):
    lo, c = _addc(a[0], b[0])
    return lo, a[1] + b[1] + c


def shl(a, n: int):
    lo, hi = a
    n &= 63
    if n == 0:
        return a
    if n < 32:
        return lo << U32(n), (hi << U32(n)) | (lo >> U32(32 - n))
    return jnp.zeros_like(lo), lo << U32(n - 32) if n > 32 else lo


def shr(a, n: int):
    lo, hi = a
    n &= 63
    if n == 0:
        return a
    if n < 32:
        return (lo >> U32(n)) | (hi << U32(32 - n)), hi >> U32(n)
    return hi >> U32(n - 32) if n > 32 else hi, jnp.zeros_like(hi)


def rotl(a, n: int):
    n &= 63
    if n == 0:
        return a
    return _or(shl(a, n), shr(a, 64 - n))


def _or(a, b):
    return a[0] | b[0], a[1] | b[1]


def mul32_full(x, y):
    """u32 * u32 -> (lo32, hi32) via 16-bit limbs."""
    m16 = U32(0xFFFF)
    xl, xh = x & m16, x >> U32(16)
    yl, yh = y & m16, y >> U32(16)
    ll = xl * yl
    lh = xl * yh
    hl = xh * yl
    hh = xh * yh
    mid = (ll >> U32(16)) + (lh & m16) + (hl & m16)
    lo = (ll & m16) | (mid << U32(16))
    hi = hh + (lh >> U32(16)) + (hl >> U32(16)) + (mid >> U32(16))
    return lo, hi


def mul(a, b):
    """Low 64 bits of 64x64 product."""
    lo, carry = mul32_full(a[0], b[0])
    hi = carry + a[0] * b[1] + a[1] * b[0]
    return lo, hi


def mul_full128(a, b):
    """Full 128-bit product of two u64 pairs -> (low64 pair, high64 pair)."""
    t0l, t0h = mul32_full(a[0], b[0])
    t1l, t1h = mul32_full(a[0], b[1])
    t2l, t2h = mul32_full(a[1], b[0])
    t3l, t3h = mul32_full(a[1], b[1])
    # r = t0 + (t1 + t2) << 32 + t3 << 64
    r0 = t0l
    r1, c1 = _addc(t0h, t1l)
    r1, c2 = _addc(r1, t2l)
    r2, c3 = _addc(t1h, t2h)
    r2, c4 = _addc(r2, t3l)
    r2, c5 = _addc(r2, c1 + c2)
    r3 = t3h + c3 + c4 + c5
    return (r0, r1), (r2, r3)


def bswap(a):
    """Byte-swap a 64-bit pair."""

    def b32(x):
        return (
            ((x & U32(0x000000FF)) << U32(24))
            | ((x & U32(0x0000FF00)) << U32(8))
            | ((x & U32(0x00FF0000)) >> U32(8))
            | ((x & U32(0xFF000000)) >> U32(24))
        )

    return b32(a[1]), b32(a[0])


def lt(a, b):
    return (a[1] < b[1]) | ((a[1] == b[1]) & (a[0] < b[0]))


def le(a, b):
    return (a[1] < b[1]) | ((a[1] == b[1]) & (a[0] <= b[0]))


def select(cond, a, b):
    return jnp.where(cond, a[0], b[0]), jnp.where(cond, a[1], b[1])


def minimum(a, b):
    return select(le(a, b), a, b)


# ---------------------------------------------------------------------------
# XXH3-64 (seed 0, default secret) on pairs — mirrors utils/xxh3.py
# ---------------------------------------------------------------------------

_PRIME_MX2 = 0x9FB21C651E98DF25
_PRIME64_3 = 0x165667919E3779F9


def _rrmxmx(h, length: int):
    h = xor(h, xor(rotl(h, 49), rotl(h, 24)))
    h = mul(h, const(_PRIME_MX2))
    h = xor(h, add(shr(h, 35), const(length)))
    h = mul(h, const(_PRIME_MX2))
    return xor(h, shr(h, 28))


def xxh3_64_pair_u64(vlo, vhi):
    """XXH3-64 of the 8 LE bytes of value (vlo, vhi); returns a hash pair."""
    # input64 = last4 | first4 << 32 = (vhi, vlo) as a pair
    keyed = xor((vhi, vlo), const(int(hxxh3.BITFLIP_4TO8)))
    return _rrmxmx(keyed, 8)


def _avalanche(h):
    h = xor(h, shr(h, 37))
    h = mul(h, const(_PRIME64_3))
    return xor(h, shr(h, 32))


def xxh3_64_pair_u128(lo_pair, hi_pair):
    """XXH3-64 of the 16 LE bytes of a u128 (low u64 pair, high u64 pair)."""
    il = xor(lo_pair, const(int(hxxh3.BITFLIP_LO_9TO16)))
    ih = xor(hi_pair, const(int(hxxh3.BITFLIP_HI_9TO16)))
    plo, phi = mul_full128(il, ih)
    fold = xor(plo, phi)
    acc = add(add(add(const(16), bswap(il)), ih), fold)
    return _avalanche(acc)
