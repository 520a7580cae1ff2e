"""Differential tests for the fast one-shot raw-deflate decoder
(fastinf::inflate_block, exported as dx_inflate_raw) against zlib."""

import ctypes
import struct
import zlib

import numpy as np
import pytest

from deacon_tpu.io.native_loader import get_lib

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)


def _fn():
    lib = get_lib()
    lib.dx_inflate_raw.restype = ctypes.c_int
    lib.dx_inflate_raw.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
    ]
    return lib.dx_inflate_raw


def _inflate(comp: bytes, out_len: int):
    out = np.zeros(out_len + 32, np.uint8)  # kInflateMargin slack
    inp = np.frombuffer(comp if comp else b"\x00", np.uint8)
    rc = _fn()(
        inp.ctypes.data_as(ctypes.c_void_p), len(comp),
        out.ctypes.data_as(ctypes.c_void_p), out_len,
    )
    return rc, out[:out_len].tobytes()


def _check(data: bytes, level: int, strategy=zlib.Z_DEFAULT_STRATEGY,
           memlevel: int = 8):
    co = zlib.compressobj(level, zlib.DEFLATED, -15, memlevel, strategy)
    rc, got = _inflate(co.compress(data) + co.flush(), len(data))
    assert rc == 0 and got == data, (level, strategy, memlevel, len(data))


RNG = np.random.default_rng(0)
BASES = np.frombuffer(b"ACGT", np.uint8)
CASES = {
    "empty": b"",
    "one": b"A",
    "rle": b"A" * 100_000,
    "random": bytes(RNG.integers(0, 256, 65536, dtype=np.uint8)),
    "dna": RNG.choice(BASES, 65536).tobytes(),
    "period8": b"ATCGATCG" * 8192,
    "period5": b"ABCDE" * 20000,
}
_q = bytes(RNG.integers(33, 74, 300, dtype=np.uint8))
CASES["fastq"] = b"".join(
    b"@r%d\n%s\n+\n%s\n" % (i, RNG.choice(BASES, 300).tobytes(), _q)
    for i in range(200)
)


@pytest.mark.parametrize("name", sorted(CASES))
def test_matches_zlib_levels_and_strategies(name):
    data = CASES[name]
    for level in (0, 1, 2, 6, 9):  # 0 = stored blocks
        _check(data, level)
    for strat in (zlib.Z_FIXED, zlib.Z_RLE, zlib.Z_HUFFMAN_ONLY,
                  zlib.Z_FILTERED):
        _check(data, 6, strat)


def test_multi_stored_blocks():
    # regression: a stored block's byte-jump must not leave stale bits in
    # the bit buffer (broke on the 3rd consecutive stored block)
    def stored_stream(lens):
        out = b""
        data = b""
        for i, ln in enumerate(lens):
            chunk = bytes((65 + i % 26,)) * ln
            out += bytes([1 if i == len(lens) - 1 else 0])
            out += struct.pack("<HH", ln, ln ^ 0xFFFF) + chunk
            data += chunk
        return out, data

    for lens in ([10], [10, 10], [10, 10, 1], [65531, 32773, 1], [0, 10],
                 [10, 0], [1] * 50):
        comp, data = stored_stream(lens)
        rc, got = _inflate(comp, len(data))
        assert rc == 0 and got == data, lens


def test_corrupt_and_truncated_reject():
    data = CASES["dna"]
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    comp = co.compress(data) + co.flush()
    for bad in (comp[: len(comp) // 2], comp[1:],
                bytes([comp[0] ^ 0xFF]) + comp[1:], b"\x00", b""):
        rc, _ = _inflate(bad, len(data))
        assert rc == -1


def test_random_fuzz_vs_zlib():
    rng = np.random.default_rng(12345)
    strategies = [zlib.Z_DEFAULT_STRATEGY, zlib.Z_FIXED, zlib.Z_RLE,
                  zlib.Z_HUFFMAN_ONLY, zlib.Z_FILTERED]
    for it in range(400):
        n = int(rng.integers(0, 66000))
        kind = rng.integers(0, 5)
        if kind == 0:
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        elif kind == 1:
            data = rng.choice(BASES, n).tobytes()
        elif kind == 2:
            pat = bytes(rng.integers(0, 256, int(rng.integers(1, 30)),
                                     dtype=np.uint8))
            data = (pat * (n // max(1, len(pat)) + 1))[:n]
        elif kind == 3:
            data = bytes([int(rng.integers(0, 256))]) * n
        else:
            half = n // 2
            data = rng.choice(BASES, half).tobytes() + bytes(
                rng.integers(33, 74, n - half, dtype=np.uint8)
            )
        level = int(rng.integers(0, 10))
        strat = strategies[int(rng.integers(0, len(strategies)))]
        memlevel = int(rng.integers(1, 10))
        _check(data, level, strat, memlevel)
        # corruption/truncation must never crash (rc is allowed to be 0
        # only if the stream still decodes to exactly out_len bytes)
        co = zlib.compressobj(level, zlib.DEFLATED, -15, memlevel, strat)
        comp = co.compress(data) + co.flush()
        if len(comp) > 4 and it % 3 == 0:
            bad = bytearray(comp)
            for _ in range(int(rng.integers(1, 4))):
                bad[int(rng.integers(0, len(bad)))] ^= int(
                    rng.integers(1, 256))
            _inflate(bytes(bad), len(data))
            cut = int(rng.integers(0, len(comp)))
            _inflate(comp[:cut], len(data))
