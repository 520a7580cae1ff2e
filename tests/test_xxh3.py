"""Bit-exactness of vectorized XXH3-64 against the reference xxhash wheel."""

import numpy as np
import pytest

from deacon_tpu.utils.xxh3 import xxh3_64_u64, xxh3_64_u128

xxhash = pytest.importorskip("xxhash")


def test_u64_exact_vs_xxhash(rng):
    vals = np.concatenate(
        [
            np.array([0, 1, 250, 251, 2**32 - 1, 2**32, 2**64 - 1], dtype=np.uint64),
            rng.integers(0, 2**64, size=1000, dtype=np.uint64),
        ]
    )
    ours = xxh3_64_u64(vals)
    for v, h in zip(vals.tolist(), ours.tolist()):
        assert h == xxhash.xxh3_64_intdigest(int(v).to_bytes(8, "little"))


def test_u128_exact_vs_xxhash(rng):
    lo = rng.integers(0, 2**64, size=500, dtype=np.uint64)
    hi = rng.integers(0, 2**64, size=500, dtype=np.uint64)
    lo[:2] = [0, 1]
    hi[:2] = [0, 0]
    ours = xxh3_64_u128(lo, hi)
    for a, b, h in zip(lo.tolist(), hi.tolist(), ours.tolist()):
        data = int(a).to_bytes(8, "little") + int(b).to_bytes(8, "little")
        assert h == xxhash.xxh3_64_intdigest(data)
