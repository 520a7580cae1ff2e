"""Semantic tests for the NumPy minimizer oracle.

Covers the behavioral matrix from the reference test strategy (SURVEY §4):
forward/revcomp invariance, IUPAC handling, invalid-base windows, entropy
ranges, newline stripping, prefix truncation, u128 (k>32) path.
"""

import numpy as np
import pytest

from deacon_tpu.ops import minimizers_np as m
from deacon_tpu.filter.thresholds import calculate_required_hits, meets_filtering_criteria

RNG = np.random.default_rng(42)


def random_seq(n, rng=RNG):
    return rng.choice(np.frombuffer(b"ACGT", np.uint8), size=n).tobytes()


def revcomp(seq: bytes) -> bytes:
    comp = bytes.maketrans(b"ACGTacgt", b"TGCAtgca")
    return seq.translate(comp)[::-1]


# ---------------------------------------------------------------------------
# core scheme
# ---------------------------------------------------------------------------


def test_codes_and_complement():
    codes = m.ascii_to_codes(np.frombuffer(b"ACGTacgt", np.uint8))
    assert list(codes) == [0, 1, 3, 2, 0, 1, 3, 2]
    # complement == code ^ 2 under this packing
    assert list(codes ^ 2) == [2, 3, 1, 0, 2, 3, 1, 0]


def test_selection_keys_match_direct_definition():
    """Doubling formulation == direct per-position canonical-value mixing."""
    seq = random_seq(300)
    codes = m.ascii_to_codes(np.frombuffer(seq, np.uint8))
    for k in (5, 31, 41):
        keys = m.kmer_selection_keys(codes, k)
        lo, hi = m.canonical_values(codes, np.arange(keys.size), k)
        fold = (
            lo.astype(np.uint32)
            ^ (lo >> np.uint64(32)).astype(np.uint32)
            ^ hi.astype(np.uint32)
            ^ (hi >> np.uint64(32)).astype(np.uint32)
        )
        expect = m.fmix32(fold) & np.uint32(0xFFFF0000)
        np.testing.assert_array_equal(keys, expect, err_msg=f"k={k}")


def test_revcomp_value_set_identical():
    """A sequence and its reverse complement share minimizer value sets
    (canonical minimizers; mirrors tests/filter_tests.rs:586-723 semantics)."""
    for n in (60, 139, 1000):
        seq = random_seq(n)
        h1 = m.compute_minimizer_hashes(seq, 31, 15)
        h2 = m.compute_minimizer_hashes(revcomp(seq), 31, 15)
        assert len(h1) > 0
        assert set(h1.tolist()) == set(h2.tolist())


def test_revcomp_invariance_many_kw():
    for k, w in [(5, 3), (15, 9), (31, 15), (41, 15), (21, 11)]:
        seq = random_seq(500)
        h1 = set(m.compute_minimizer_hashes(seq, k, w).tolist())
        h2 = set(m.compute_minimizer_hashes(revcomp(seq), k, w).tolist())
        assert h1 == h2, (k, w)


def test_case_insensitive():
    seq = random_seq(200)
    h1 = m.compute_minimizer_hashes(seq, 31, 15)
    h2 = m.compute_minimizer_hashes(seq.lower(), 31, 15)
    np.testing.assert_array_equal(h1, h2)


def test_short_sequence_empty():
    assert m.compute_minimizer_hashes(b"ACGT", 5, 3).size == 0
    h, p, e = m.get_minimizer_hashes_and_positions(b"ACGT", 0, 5, 3)
    assert h.size == 0 and p.size == 0 and e == b""


def test_index_vs_filter_side_consistency():
    """Clean ACGT data: both extraction paths yield identical hash sets."""
    for n in (100, 139, 512, 4096):
        seq = random_seq(n)
        hi = m.compute_minimizer_hashes(seq, 31, 15)
        hf, pf, _ = m.get_minimizer_hashes_and_positions(seq, 0, 31, 15)
        np.testing.assert_array_equal(np.sort(hi), np.sort(hf))
        assert pf.size == hf.size


def test_invalid_bases_dropped():
    seq = bytearray(random_seq(200))
    seq[50] = ord("N")
    h, p, _ = m.get_minimizer_hashes_and_positions(bytes(seq), 0, 31, 15)
    # No reported position may overlap the N at index 50
    for pos in p.tolist():
        assert not (pos <= 50 < pos + 31)
    hi = m.compute_minimizer_hashes(bytes(seq), 31, 15)
    assert len(hi) > 0  # index side also drops N-overlapping kmers but keeps others


def test_all_invalid_empty():
    h = m.compute_minimizer_hashes(b"N" * 100, 31, 15)
    assert h.size == 0
    hf, pf, _ = m.get_minimizer_hashes_and_positions(b"N" * 100, 0, 31, 15)
    assert hf.size == 0


def test_newline_stripped_once():
    """Filter side strips exactly one trailing newline
    (ref: src/filter_common.rs:229)."""
    seq = random_seq(100)
    h1, _, e1 = m.get_minimizer_hashes_and_positions(seq, 0, 31, 15)
    h2, _, e2 = m.get_minimizer_hashes_and_positions(seq + b"\n", 0, 31, 15)
    np.testing.assert_array_equal(h1, h2)
    assert e1 == e2 == seq


def test_prefix_length():
    seq = random_seq(500)
    h_full, _, _ = m.get_minimizer_hashes_and_positions(seq, 0, 31, 15)
    h_pref, _, e = m.get_minimizer_hashes_and_positions(seq, 100, 31, 15)
    h_manual, _, _ = m.get_minimizer_hashes_and_positions(seq[:100], 0, 31, 15)
    np.testing.assert_array_equal(h_pref, h_manual)
    assert e == seq[:100]
    assert h_pref.size < h_full.size


def test_u128_path_k_gt_32():
    """k=41 exercises the 16-byte hash path (tests/filter_tests.rs:1253-1296)."""
    seq = random_seq(300)
    h = m.compute_minimizer_hashes(seq, 41, 15)
    assert h.size > 0
    h2 = set(m.compute_minimizer_hashes(revcomp(seq), 41, 15).tolist())
    assert set(h.tolist()) == h2
    hf, _, _ = m.get_minimizer_hashes_and_positions(seq, 0, 41, 15)
    assert set(hf.tolist()) == set(h.tolist())


def test_k_too_large_filter_side():
    with pytest.raises(ValueError):
        m.get_minimizer_hashes_and_positions(random_seq(100), 0, 57, 2)


def test_homopolymer_single_value():
    h = m.compute_minimizer_hashes(b"A" * 100, 31, 15)
    assert len(set(h.tolist())) == 1


def test_iupac_canonicalisation_index_side():
    """Index side maps N->C before selection (ref: src/minimizers.rs:24-43):
    a sequence with N produces the same selection as with C substituted,
    but N-overlapping kmers are dropped from output."""
    base = bytearray(random_seq(150))
    with_n = bytes(base[:70]) + b"N" + bytes(base[71:])
    with_c = bytes(base[:70]) + b"C" + bytes(base[71:])
    h_n = set(m.compute_minimizer_hashes(with_n, 31, 15).tolist())
    h_c = set(m.compute_minimizer_hashes(with_c, 31, 15).tolist())
    assert h_n.issubset(h_c)


# ---------------------------------------------------------------------------
# entropy (ref: src/minimizers.rs:252-386 test values)
# ---------------------------------------------------------------------------


def ent(kmer: bytes, k: int) -> float:
    seq = np.frombuffer(kmer, np.uint8)
    return float(m.scaled_entropy(seq, np.array([0]), k)[0])


def test_entropy_reference_ranges():
    assert ent(b"ACGTACGT", 8) == 1.0  # k<10 passes
    assert ent(b"A" * 10, 10) < 0.1
    assert 0.5 <= ent(b"ATATATATAT", 10) < 1.0
    assert ent(b"ACGTACGTAC", 10) > 0.9
    assert ent(b"A" * 31, 31) < 0.01
    assert 0.25 <= ent(b"AAAAAAAAAAACAAAAAGAAAAATAAAAAAA", 31) <= 0.35
    assert 0.45 <= ent(b"GCGCGCGCGCGCGCGCGCGCGCGCGCGCGCG", 31) <= 0.55
    assert 0.55 <= ent(b"ATATATATATATATATATATATATATATATG", 31) <= 0.65
    assert 0.75 <= ent(b"ACGACGACGACGACGACGACGACGACGACGA", 31) <= 0.85
    assert 0.8 <= ent(b"ACGTACGTACGTAAAACCCGGGTTTACGTAC", 31) <= 1.0
    assert ent(b"AACCGGTTAACCGGTTAACCGGTTAACCGGT", 31) >= 0.95
    assert ent(b"ACGTACGTACGTACGTACGTACGTACGTACG", 31) >= 0.95
    assert ent(b"AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAT", 31) < 0.15

    one = ent(b"A" * 31, 31)
    two = ent(b"GC" * 15 + b"G", 31)
    three = ent(b"ACG" * 10 + b"A", 31)
    four = ent(b"ACGT" * 7 + b"ACG", 31)
    assert one < two < three < four


def test_entropy_filter_reduces_homopolymer():
    seq = b"A" * 100 + random_seq(100)
    h_all = m.compute_minimizer_hashes(seq, 31, 15, 0.0)
    h_ent = m.compute_minimizer_hashes(seq, 31, 15, 0.5)
    assert h_ent.size < h_all.size


# ---------------------------------------------------------------------------
# thresholds (ref: src/filter_common.rs:84-112)
# ---------------------------------------------------------------------------


def test_required_hits():
    assert calculate_required_hits(2, 0.01, 0) == 2
    assert calculate_required_hits(2, 0.01, 100) == 2
    assert calculate_required_hits(1, 0.01, 100) == 1
    assert calculate_required_hits(1, 0.5, 100) == 50
    assert calculate_required_hits(1, 0.0, 100) == 1  # max(1, round(0)) = 1
    assert calculate_required_hits(1, 1.0, 7) == 7
    assert calculate_required_hits(3, 0.001, 100) == 3  # round(0.1)->0 -> max(1,0)=1
    # round half away from zero: 0.5*5 = 2.5 -> 3
    assert calculate_required_hits(1, 0.5, 5) == 3


def test_meets_criteria():
    assert meets_filtering_criteria(2, 100, 2, 0.01, False)
    assert not meets_filtering_criteria(1, 100, 2, 0.01, False)
    assert not meets_filtering_criteria(2, 100, 2, 0.01, True)
    assert meets_filtering_criteria(1, 100, 2, 0.01, True)
    # zero minimizers: search drops, deplete keeps
    assert not meets_filtering_criteria(0, 0, 2, 0.01, False)
    assert meets_filtering_criteria(0, 0, 2, 0.01, True)
