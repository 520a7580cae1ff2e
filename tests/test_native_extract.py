"""Differential tests: C++ host extraction engine == NumPy oracle.

The native engine (io/native/fastx_native.cpp dx_extract_batch) must be
bit-identical to ops/minimizers_np.py on both the filter side
(ref: src/filter_common.rs:211-310) and the index side
(ref: src/minimizers.rs:125-191), including IUPAC handling, validity
windows, entropy filtering, the k>32 u128 value path, and edge cases.
"""

import zlib

import numpy as np
import pytest

from deacon_tpu.io.native_loader import get_lib, native_extract_batch
from deacon_tpu.ops import host_extract
from deacon_tpu.ops import minimizers_np as mnp

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)

ALPHABETS = [
    b"ACGT",
    b"ACGTacgt",
    b"ACGTNRYSWKMBDHVn",  # IUPAC + lowercase n
    b"ACGT\nX-",  # junk bytes
    b"AAAC",  # low-entropy-ish
]


def _rand_seqs(rng, alphabet, n_seqs, max_len):
    out = []
    a = np.frombuffer(alphabet, dtype=np.uint8)
    for _ in range(n_seqs):
        n = int(rng.integers(0, max_len + 1))
        out.append(rng.choice(a, n).astype(np.uint8).tobytes())
    return out


@pytest.mark.parametrize("k,w", [(31, 15), (5, 3), (41, 15), (21, 1), (56, 9)])
@pytest.mark.parametrize("alphabet", ALPHABETS)
def test_filter_side_matches_oracle(k, w, alphabet):
    rng = np.random.default_rng(zlib.crc32(repr((k, w, alphabet)).encode()))
    seqs = _rand_seqs(rng, alphabet, 40, 400)
    seqs += [b"", b"A" * (k - 1) if k > 1 else b"", b"A" * k, b"A" * (k + w)]
    for prefix in (0, 100):
        got = host_extract.extract_filter_batch(seqs, prefix, k, w)
        for s, (h, p, e) in zip(seqs, got):
            oh, op, oe = mnp.get_minimizer_hashes_and_positions(s, prefix, k, w)
            assert e == oe
            np.testing.assert_array_equal(p, op)
            np.testing.assert_array_equal(h, oh)


@pytest.mark.parametrize("k,w", [(31, 15), (41, 15), (11, 5)])
@pytest.mark.parametrize("entropy", [0.0, 0.01, 0.5, 0.9])
@pytest.mark.parametrize("alphabet", [b"ACGT", b"ACGTNryn", b"AAAAAAAC"])
def test_index_side_matches_oracle(k, w, entropy, alphabet):
    rng = np.random.default_rng(zlib.crc32(repr((k, w, entropy, alphabet)).encode()))
    seqs = _rand_seqs(rng, alphabet, 25, 300)
    seqs += [b"A" * 100, b"ACGT" * 50, b"AC" * 60]
    got = host_extract.extract_index_batch(seqs, k, w, entropy)
    for s, h in zip(seqs, got):
        oh = mnp.compute_minimizer_hashes(s, k, w, entropy)
        np.testing.assert_array_equal(h, oh)


def test_long_read_and_overflow_regrow():
    rng = np.random.default_rng(7)
    a = np.frombuffer(b"ACGT", dtype=np.uint8)
    seqs = [rng.choice(a, 100_000).astype(np.uint8).tobytes()]
    got = host_extract.extract_filter_batch(seqs, 0, 31, 15)
    oh, op, oe = mnp.get_minimizer_hashes_and_positions(seqs[0], 0, 31, 15)
    np.testing.assert_array_equal(got[0][0], oh)
    np.testing.assert_array_equal(got[0][1], op)
    # direct native call with a forced-tiny capacity exercises the regrow loop
    lens = np.array([len(seqs[0])], dtype=np.int64)
    starts = np.array([0], dtype=np.int64)
    arena = np.frombuffer(seqs[0], dtype=np.uint8)
    res = native_extract_batch(arena, starts, lens, 31, 15, index_mode=False)
    np.testing.assert_array_equal(res[0], oh)


@pytest.mark.parametrize("k", [21, 31, 32])
@pytest.mark.parametrize(
    "alphabet", [b"ACGT", b"ACGTacgt", b"ACGTNRYSWKMBDHVn", b"ACGT\nX-"]
)
def test_long_reads_simd_path_matches_oracle(k, alphabet):
    # reads with >= 512 k-mer positions take the AVX-512 pass1 (8-lane
    # chunked recurrence + bad-bit-mask validity); must stay bit-identical
    # to the oracle on dirty bytes, both filter and index side
    rng = np.random.default_rng(zlib.crc32(repr((k, alphabet)).encode()))
    seqs = _rand_seqs(rng, alphabet, 8, 5000)
    seqs += [bytes(s[: 512 + k - 1]) for s in seqs[:2]]  # boundary m≈512
    got = host_extract.extract_filter_batch(seqs, 0, k, 15)
    for s, (h, p, e) in zip(seqs, got):
        oh, op, oe = mnp.get_minimizer_hashes_and_positions(s, 0, k, 15)
        np.testing.assert_array_equal(p, op)
        np.testing.assert_array_equal(h, oh)
    goti = host_extract.extract_index_batch(seqs, k, 15, 0.5)
    for s, h in zip(seqs, goti):
        oh = mnp.compute_minimizer_hashes(s, k, 15, 0.5)
        np.testing.assert_array_equal(h, oh)


def test_homopolymer_single_minimizer_per_window_run():
    # all-identical k-mers: every window picks the leftmost position 0 key...
    # the deque dedup must still emit strictly increasing positions
    s = b"A" * 200
    got = host_extract.extract_filter_batch([s], 0, 31, 15)
    oh, op, _ = mnp.get_minimizer_hashes_and_positions(s, 0, 31, 15)
    np.testing.assert_array_equal(got[0][1], op)
    np.testing.assert_array_equal(got[0][0], oh)


@pytest.mark.parametrize(
    "k,w", [(31, 15), (31, 21), (41, 15)]  # AVX argmin / scalar argmin / wide
)
def test_chunked_megabase_record_matches_oracle(k, w):
    # records longer than kChunkWindows (~131K window starts) are processed
    # in overlapping cache-resident chunks; selection must stay bit-identical
    # to the oracle across chunk boundaries, including the boundary-duplicate
    # dedup and validity windows on dirty bytes
    rng = np.random.default_rng(zlib.crc32(repr((k, w)).encode()))
    a = np.frombuffer(b"ACGTACGTNn\n", dtype=np.uint8)
    s = rng.choice(a, 400_000).astype(np.uint8).tobytes()
    (h, p, e), = host_extract.extract_filter_batch([s], 0, k, w)
    oh, op, oe = mnp.get_minimizer_hashes_and_positions(s, 0, k, w)
    np.testing.assert_array_equal(p, op)
    np.testing.assert_array_equal(h, oh)
    (hi,) = host_extract.extract_index_batch([s], k, w, 0.5)
    ohi = mnp.compute_minimizer_hashes(s, k, w, 0.5)
    np.testing.assert_array_equal(hi, ohi)


@pytest.mark.parametrize("mode", ["filter", "index"])
def test_thread_count_invariance_fuzz(mode):
    # outputs must be identical for any worker count: window-range units
    # partition records arbitrarily and the merger drops seam duplicates,
    # including on homopolymer runs (every window picks the same argmin)
    rng = np.random.default_rng(99 if mode == "filter" else 100)
    a = np.frombuffer(b"ACGTACGTNn\n", dtype=np.uint8)
    seqs = []
    for _ in range(6):
        n = int(rng.integers(0, 700_000))
        seqs.append(rng.choice(a, n).astype(np.uint8))
    seqs.append(np.full(600_000, ord("A"), np.uint8))  # homopolymer megarun
    seqs.append(np.zeros(0, np.uint8))
    arena = np.concatenate(seqs)
    lens = np.array([len(s) for s in seqs], dtype=np.int64)
    starts = np.zeros(len(seqs), dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    kw = dict(index_mode=(mode == "index"))
    if mode == "index":
        kw["entropy_threshold"] = 0.3
    base = native_extract_batch(arena, starts, lens, 31, 15, n_threads=1, **kw)
    for nt in (2, 3, 7):
        got = native_extract_batch(arena, starts, lens, 31, 15, n_threads=nt, **kw)
        np.testing.assert_array_equal(got[0], base[0])
        np.testing.assert_array_equal(got[1], base[1])
        np.testing.assert_array_equal(got[2], base[2])
    # spot-check one sequence against the oracle
    if mode == "filter":
        oh, op, _ = mnp.get_minimizer_hashes_and_positions(seqs[0].tobytes(), 0, 31, 15)
        c0 = base[2][0]
        np.testing.assert_array_equal(base[0][:c0], oh)
