"""Vectorized XXH3-64 for fixed-width little-endian integer keys.

The reference hashes every selected minimizer value with
``xxh3_64(value.to_le_bytes())`` — an 8-byte input for k<=32 and a 16-byte
input for k>32 (ref: src/minimizers.rs:172-190, src/filter_common.rs:289-307).
Index files therefore contain XXH3-64 digests of minimizer values, so our
implementation must be bit-exact with upstream XXH3 (seed 0, default secret)
for those two input lengths.

This module implements the XXH3 small-input paths (4..8 and 9..16 bytes) as
vectorized NumPy uint64 math, validated against the ``xxhash`` wheel in
tests/test_xxh3.py.  A mirrored (lo, hi)-u32-pair implementation lives in
deacon_tpu/ops/u64pair.py for the on-device pipeline.
"""

from __future__ import annotations

import numpy as np

# Default XXH3 secret ("kSecret" in upstream xxhash). Only bytes 8..56 are
# needed for the 4..16-byte input paths.
_KSECRET = bytes.fromhex(
    "b8fe6c3923a44bbe7c01812cf721ad1c"
    "ded46de9839097db7240a4a4b7b3671f"
    "cb79e64eccc0e578825ad07dccff7221"
    "b8084674f743248ee03590e6813a264c"
    "3c2852bb91c300cb88d0658b1b532ea3"
    "716448979a20df94e38aef46a9deacd8"
    "a8fa763fe39c343ff9dcbbc7c70b4f1d"
    "8a51e04bcdb45931c89f7ec9d9787364"
    "eac5ac8334d3ebc3c581a0fffa1363eb"
    "170ddd51b7f0da49d316552629d4689e"
    "2b16be587d47a1fc8ff8b8d17ad031ce"
    "45cb3a8f95160428afd7fbcabb4b407e"
)


def _sec64(offset: int) -> np.uint64:
    return np.frombuffer(_KSECRET, dtype="<u8", count=1, offset=offset)[0]

# Derived constants (seed is always 0 in the reference).
BITFLIP_4TO8 = np.uint64(_sec64(8) ^ _sec64(16))
BITFLIP_LO_9TO16 = np.uint64(_sec64(24) ^ _sec64(32))
BITFLIP_HI_9TO16 = np.uint64(_sec64(40) ^ _sec64(48))

_PRIME_MX2 = np.uint64(0x9FB21C651E98DF25)
_PRIME64_3 = np.uint64(0x165667919E3779F9)

_U64 = np.uint64


def _rotl64(x: np.ndarray, n: int) -> np.ndarray:
    n &= 63
    if n == 0:
        return x
    return (x << _U64(n)) | (x >> _U64(64 - n))


def _bswap64(x: np.ndarray) -> np.ndarray:
    return x.byteswap() if x.dtype == np.uint64 else np.asarray(x, np.uint64).byteswap()


def _rrmxmx(h: np.ndarray, length: int) -> np.ndarray:
    h = h ^ (_rotl64(h, 49) ^ _rotl64(h, 24))
    h = h * _PRIME_MX2
    h = h ^ ((h >> _U64(35)) + _U64(length))
    h = h * _PRIME_MX2
    return h ^ (h >> _U64(28))


def _avalanche(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> _U64(37))
    h = h * _PRIME64_3
    return h ^ (h >> _U64(32))


def _xxh64_style_mul128_fold(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """lo64(a*b) ^ hi64(a*b) via 32-bit limb decomposition (u64 lanes)."""
    mask32 = _U64(0xFFFFFFFF)
    a_lo = a & mask32
    a_hi = a >> _U64(32)
    b_lo = b & mask32
    b_hi = b >> _U64(32)

    ll = a_lo * b_lo
    lh = a_lo * b_hi
    hl = a_hi * b_lo
    hh = a_hi * b_hi

    mid = (ll >> _U64(32)) + (lh & mask32) + (hl & mask32)
    lo = (ll & mask32) | (mid << _U64(32))
    hi = hh + (lh >> _U64(32)) + (hl >> _U64(32)) + (mid >> _U64(32))
    return lo ^ hi


def xxh3_64_u64(values: np.ndarray) -> np.ndarray:
    """XXH3-64 of each uint64 value's 8 little-endian bytes (seed 0).

    Equivalent to ``xxh3_64(&v.to_le_bytes())`` in the reference
    (ref: src/minimizers.rs:188, src/filter_common.rs:305).
    """
    v = np.asarray(values, dtype=np.uint64)
    with np.errstate(over="ignore"):
        lo32 = v & _U64(0xFFFFFFFF)
        hi32 = v >> _U64(32)
        # XXH3_len_4to8: input64 = last4 | (first4 << 32); first4 is the LE low half.
        input64 = hi32 | (lo32 << _U64(32))
        return _rrmxmx(input64 ^ BITFLIP_4TO8, 8)


def xxh3_64_u128(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """XXH3-64 of each u128 value's 16 little-endian bytes (seed 0).

    ``lo``/``hi`` are the low/high uint64 halves. Equivalent to
    ``xxh3_64(&v.to_le_bytes())`` for u128 minimizer values when k>32
    (ref: src/minimizers.rs:179, src/filter_common.rs:296).
    """
    lo = np.asarray(lo, dtype=np.uint64)
    hi = np.asarray(hi, dtype=np.uint64)
    with np.errstate(over="ignore"):
        input_lo = lo ^ BITFLIP_LO_9TO16
        input_hi = hi ^ BITFLIP_HI_9TO16
        acc = (
            _U64(16)
            + _bswap64(input_lo)
            + input_hi
            + _xxh64_style_mul128_fold(input_lo, input_hi)
        )
        return _avalanche(acc)
