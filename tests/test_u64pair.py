"""u32-pair 64-bit emulation vs NumPy uint64 oracle."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from deacon_tpu.ops import u64pair as p  # noqa: E402
from deacon_tpu.utils.xxh3 import xxh3_64_u64, xxh3_64_u128  # noqa: E402

RNG = np.random.default_rng(3)


def pairs(v):
    return (
        jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((v >> np.uint64(32)).astype(np.uint32)),
    )


def unpair(pr):
    lo, hi = np.asarray(pr[0], np.uint64), np.asarray(pr[1], np.uint64)
    return lo | (hi << np.uint64(32))


A = RNG.integers(0, 2**64, size=512, dtype=np.uint64)
B = RNG.integers(0, 2**64, size=512, dtype=np.uint64)


def test_arith_ops():
    with np.errstate(over="ignore"):
        np.testing.assert_array_equal(unpair(p.add(pairs(A), pairs(B))), A + B)
        np.testing.assert_array_equal(unpair(p.xor(pairs(A), pairs(B))), A ^ B)
        np.testing.assert_array_equal(unpair(p.mul(pairs(A), pairs(B))), A * B)
    for n in (0, 1, 7, 31, 32, 33, 49, 63):
        np.testing.assert_array_equal(
            unpair(p.shl(pairs(A), n)), A << np.uint64(n), err_msg=f"shl {n}"
        )
        np.testing.assert_array_equal(
            unpair(p.shr(pairs(A), n)), A >> np.uint64(n), err_msg=f"shr {n}"
        )
        rot = (A << np.uint64(n)) | (A >> np.uint64((64 - n) % 64)) if n else A
        np.testing.assert_array_equal(
            unpair(p.rotl(pairs(A), n)), rot, err_msg=f"rotl {n}"
        )
    np.testing.assert_array_equal(np.asarray(p.lt(pairs(A), pairs(B))), A < B)
    np.testing.assert_array_equal(unpair(p.minimum(pairs(A), pairs(B))), np.minimum(A, B))


def test_mul_full128():
    lo, hi = p.mul_full128(pairs(A), pairs(B))
    for i in range(64):
        full = int(A[i]) * int(B[i])
        assert int(unpair((lo[0][i : i + 1], lo[1][i : i + 1]))[0]) == full & (2**64 - 1)
        assert int(unpair((hi[0][i : i + 1], hi[1][i : i + 1]))[0]) == full >> 64


def test_xxh3_pair_u64():
    got = unpair(p.xxh3_64_pair_u64(*pairs(A)))
    np.testing.assert_array_equal(got, xxh3_64_u64(A))


def test_xxh3_pair_u128():
    got = unpair(p.xxh3_64_pair_u128(pairs(A), pairs(B)))
    np.testing.assert_array_equal(got, xxh3_64_u128(A, B))
