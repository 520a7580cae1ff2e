"""Record-aligned input splitting for pod-data mode (io/split.py).

Invariant under test: for any n, parsing each range independently and
concatenating yields exactly the records of parsing the whole file — so
per-rank outputs concatenate to the single-process result.
"""

import gzip

import numpy as np
import pytest

from deacon_tpu.io.fastx import FastxReader
from deacon_tpu.io.split import (
    RangeStream,
    SplitError,
    split_fastx_ranges,
    split_paired_ranges,
)


def _parse(path, start=None, end=None):
    if start is None:
        reader = FastxReader(open(path, "rb"))
    else:
        reader = FastxReader(RangeStream(path, start, end))
    return [(r.id, r.seq, r.qual) for r in reader]


def _check_split(path, n):
    whole = _parse(path)
    ranges = split_fastx_ranges(path, n)
    assert ranges[0][0] == 0
    joined = []
    for (s, e), (ps, pe) in zip(ranges, ranges[1:]):
        assert e == ps  # contiguous
    for s, e in ranges:
        joined.extend(_parse(path, s, e))
    assert joined == whole
    return ranges


def test_fastq_split_exact(tmp_path):
    rng = np.random.default_rng(7)
    path = tmp_path / "r.fq"
    with open(path, "wb") as f:
        for i in range(101):
            n = int(rng.integers(20, 200))
            seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), n))
            f.write(b"@read%d some desc\n%s\n+\n%s\n" % (i, seq, b"I" * n))
    for n in (1, 2, 3, 5, 16):
        _check_split(str(path), n)


def test_fastq_quality_lines_starting_with_at(tmp_path):
    # '@' (0x40) is a legal PHRED quality char; a boundary probe landing on
    # such a quality line must not mistake it for a record header
    path = tmp_path / "at.fq"
    with open(path, "wb") as f:
        for i in range(60):
            seq = b"ACGTACGTACGTACGTACGT"
            qual = b"@" * len(seq)  # every quality line starts with '@'
            f.write(b"@q%d\n%s\n+extra\n%s\n" % (i, seq, qual))
    for n in (2, 3, 7):
        _check_split(str(path), n)


def test_fasta_multiline_split(tmp_path):
    rng = np.random.default_rng(11)
    path = tmp_path / "m.fa"
    with open(path, "wb") as f:
        for i in range(40):
            n = int(rng.integers(50, 500))
            seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), n))
            f.write(b">contig%d\n" % i)
            for j in range(0, n, 60):
                f.write(seq[j : j + 60] + b"\n")
    for n in (1, 2, 4, 9):
        _check_split(str(path), n)


def test_more_ranks_than_records(tmp_path):
    path = tmp_path / "tiny.fq"
    with open(path, "wb") as f:
        f.write(b"@a\nACGT\n+\nIIII\n@b\nTTTT\n+\nIIII\n")
    ranges = _check_split(str(path), 8)
    nonempty = [r for r in ranges if r[0] < r[1]]
    assert 1 <= len(nonempty) <= 2


def test_empty_file(tmp_path):
    path = tmp_path / "e.fq"
    path.write_bytes(b"")
    assert split_fastx_ranges(str(path), 3) == [(0, 0)] * 3


def test_stdin_rejected():
    with pytest.raises(SplitError):
        split_fastx_ranges("-", 2)


def test_compressed_rejected(tmp_path):
    path = tmp_path / "r.fq.gz"
    path.write_bytes(gzip.compress(b"@a\nACGT\n+\nIIII\n"))
    with pytest.raises(SplitError):
        split_fastx_ranges(str(path), 2)


def test_garbage_rejected(tmp_path):
    path = tmp_path / "x.bin"
    path.write_bytes(b"\x00\x01\x02")
    with pytest.raises(SplitError):
        split_fastx_ranges(str(path), 2)


def test_native_range_reader_matches_split(tmp_path):
    """dx_open_range + the native batch parser over split ranges yields
    exactly the whole file's records (the pod-data native fast path)."""
    import ctypes

    from deacon_tpu.io.native_loader import get_lib

    lib = get_lib()
    if lib is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(31)
    path = tmp_path / "r.fq"
    with open(path, "wb") as f:
        for i in range(83):
            n = int(rng.integers(30, 300))
            seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), n))
            f.write(b"@n%d\n%s\n+\n%s\n" % (i, seq, b"@" * n))

    def parse_range(start, end):
        h = lib.dx_open_range(str(path).encode(), start, end)
        assert h, "dx_open_range failed"
        recs = []
        try:
            arena = ctypes.POINTER(ctypes.c_uint8)()
            alen = ctypes.c_int64()
            meta = ctypes.POINTER(ctypes.c_int64)()
            lib.dx_next_batch_view.restype = ctypes.c_int64
            lib.dx_next_batch_view.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ]
            while True:
                n = lib.dx_next_batch_view(
                    h, 7, 1 << 20, ctypes.byref(arena),
                    ctypes.byref(alen), ctypes.byref(meta))
                assert n >= 0
                if n == 0:
                    break
                buf = bytes(ctypes.cast(
                    arena, ctypes.POINTER(ctypes.c_uint8 * alen.value)
                ).contents)
                for j in range(n):
                    m = [meta[j * 6 + t] for t in range(6)]
                    recs.append((buf[m[0]:m[0]+m[1]], buf[m[2]:m[2]+m[3]]))
        finally:
            lib.dx_close(h)
        return recs

    size = path.stat().st_size
    whole = parse_range(0, size)
    assert len(whole) == 83
    for nr in (2, 3, 8):
        ranges = split_fastx_ranges(str(path), nr)
        joined = []
        for s, e in ranges:
            joined.extend(parse_range(s, e))
        assert joined == whole


# ---------------------------------------------------------------------------
# Paired splitting (split_paired_ranges)
# ---------------------------------------------------------------------------

def _write_fastq(path, seqs, tag=b"r"):
    with open(path, "wb") as f:
        for i, seq in enumerate(seqs):
            f.write(b"@%s%d\n%s\n+\n%s\n" % (tag, i, seq, b"I" * len(seq)))


def _check_paired_split(p1, p2, n):
    """Each rank's (range1, range2) must pair mate i with mate i exactly as
    a global zip of the two files does."""
    whole1, whole2 = _parse(p1), _parse(p2)
    want = list(zip(whole1, whole2))
    ranges = split_paired_ranges(p1, p2, n)
    assert ranges[0][0][0] == 0 and ranges[0][1][0] == 0
    got = []
    for (r1, r2) in ranges:
        got.extend(zip(_parse(p1, *r1), _parse(p2, *r2)))
    assert got == want
    for (a, b), (c, d) in zip(ranges, ranges[1:]):
        assert a[1] == c[0] and b[1] == d[0]  # contiguous in both files
    return ranges


def test_paired_split_fastq(tmp_path):
    rng = np.random.default_rng(41)
    p1, p2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    seqs = [
        bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                         int(rng.integers(20, 300))))
        for _ in range(97)
    ]
    _write_fastq(p1, seqs, b"a")
    # mate lengths differ wildly so byte offsets diverge between files
    _write_fastq(p2, [s[::-1] * 2 for s in seqs], b"b")
    for n in (1, 2, 3, 5, 16):
        _check_paired_split(p1, p2, n)


def test_paired_split_fasta_mate2(tmp_path):
    """File1 FASTQ, file2 multiline FASTA: record-index alignment must not
    assume the same format on both sides."""
    rng = np.random.default_rng(43)
    p1, p2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fa")
    seqs = [
        bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                         int(rng.integers(50, 400))))
        for _ in range(41)
    ]
    _write_fastq(p1, seqs)
    with open(p2, "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b">m%d\n" % i)
            for j in range(0, len(s), 60):
                f.write(s[j : j + 60] + b"\n")
    for n in (2, 3, 7):
        _check_paired_split(p1, p2, n)


def test_paired_split_shorter_mate2(tmp_path):
    """File2 runs out first: trailing ranks get empty file2 ranges, and the
    per-range zip equals the global zip (pairing stops at the shorter file,
    ref src/remote_filter.rs:931-955)."""
    rng = np.random.default_rng(47)
    p1, p2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fq")
    seqs = [
        bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 100))
        for _ in range(50)
    ]
    _write_fastq(p1, seqs, b"a")
    _write_fastq(p2, seqs[:13], b"b")
    for n in (2, 4, 8):
        ranges = _check_paired_split(p1, p2, n)
        assert ranges[-1][1][0] == ranges[-1][1][1]  # empty tail range


def test_paired_split_more_ranks_than_records(tmp_path):
    p1, p2 = str(tmp_path / "a.fq"), str(tmp_path / "b.fq")
    _write_fastq(p1, [b"ACGT", b"TTTT"])
    _write_fastq(p2, [b"GGGG", b"CCCC"])
    _check_paired_split(p1, p2, 8)


def test_paired_split_stdin_rejected(tmp_path):
    p1 = str(tmp_path / "a.fq")
    _write_fastq(p1, [b"ACGT"])
    with pytest.raises(SplitError):
        split_paired_ranges(p1, "-", 2)
    with pytest.raises(SplitError):
        split_paired_ranges("-", p1, 2)


def test_paired_split_no_trailing_newline(tmp_path):
    """An unterminated final line (EOF as line end) must not break record
    counting when an interior boundary lands at EOF."""
    p1, p2 = str(tmp_path / "a.fq"), str(tmp_path / "b.fq")
    body = b"@a0\nACGT\n+\nIIII\n@a1\nACGT\n+\nIIII"  # no final newline
    with open(p1, "wb") as f:
        f.write(body)
    _write_fastq(p2, [b"GGGG", b"CCCC"])
    for n in (2, 4, 8):
        _check_paired_split(p1, p2, n)
    # and the other way around (file2 unterminated)
    _check_paired_split(p2, p1, 4)


def test_paired_split_rank_capped(tmp_path):
    """rank= mode computes exactly the full split's entry for that rank
    (the others are None) while scanning only the rank's prefix."""
    rng = np.random.default_rng(53)
    p1, p2 = str(tmp_path / "r1.fq"), str(tmp_path / "r2.fa")
    seqs = [
        bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                         int(rng.integers(30, 200))))
        for _ in range(67)
    ]
    _write_fastq(p1, seqs)
    with open(p2, "wb") as f:
        for i, s in enumerate(seqs):
            f.write(b">m%d\n%s\n" % (i, s))
    for n in (1, 3, 5):
        full = split_paired_ranges(p1, p2, n)
        for r in range(n):
            capped = split_paired_ranges(p1, p2, n, rank=r)
            assert capped[r] == full[r]
            assert all(c is None for i, c in enumerate(capped) if i != r)


# ---------------------------------------------------------------------------
# BGZF (blocked gzip) splitting: ranks enter at block boundaries and read
# decompressed-space ranges (split_bgzf_ranges / BgzfRangeStream)
# ---------------------------------------------------------------------------


def _parse_bgzf_range(path, br):
    from deacon_tpu.io.split import BgzfRangeStream

    reader = FastxReader(BgzfRangeStream(path, *br))
    return [(r.id, r.seq, r.qual) for r in reader]


def _check_bgzf_split(path, whole, n):
    from deacon_tpu.io.split import split_bgzf_ranges

    ranges = split_bgzf_ranges(path, n)
    joined = []
    for br in ranges:
        joined.extend(_parse_bgzf_range(path, br))
    assert joined == whole
    # rank-capped mode computes exactly the full split's entry for the rank
    for r in range(n):
        capped = split_bgzf_ranges(path, n, rank=r)
        assert capped[r] == ranges[r]
        assert all(c is None for i, c in enumerate(capped) if i != r)
    return ranges


def test_bgzf_split_fastq(tmp_path):
    from helpers import bgzf_compress

    rng = np.random.default_rng(61)
    raw = bytearray()
    for i in range(101):
        n = int(rng.integers(20, 200))
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), n))
        raw += b"@read%d desc\n%s\n+\n%s\n" % (i, seq, b"I" * n)
    path = tmp_path / "r.fq.gz"
    path.write_bytes(bgzf_compress(bytes(raw), block=256))  # many blocks
    plain = tmp_path / "r.fq"
    plain.write_bytes(bytes(raw))
    whole = _parse(str(plain))
    for n in (1, 2, 3, 5, 16):
        _check_bgzf_split(str(path), whole, n)


def test_bgzf_split_fasta_multiline(tmp_path):
    from helpers import bgzf_compress

    rng = np.random.default_rng(67)
    raw = bytearray()
    for i in range(40):
        n = int(rng.integers(50, 500))
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), n))
        raw += b">contig%d\n" % i
        for j in range(0, n, 60):
            raw += seq[j : j + 60] + b"\n"
    path = tmp_path / "m.fa.gz"
    path.write_bytes(bgzf_compress(bytes(raw), block=512))
    plain = tmp_path / "m.fa"
    plain.write_bytes(bytes(raw))
    whole = _parse(str(plain))
    for n in (1, 2, 4, 9):
        _check_bgzf_split(str(path), whole, n)


def test_bgzf_split_empty(tmp_path):
    from helpers import BGZF_EOF

    from deacon_tpu.io.split import BgzfRange, split_bgzf_ranges

    path = tmp_path / "e.fq.gz"
    path.write_bytes(BGZF_EOF)
    ranges = split_bgzf_ranges(str(path), 3)
    assert ranges[-1].dlen == -1
    assert all(_parse_bgzf_range(str(path), br) == [] for br in ranges)


def test_bgzf_serial_gzip_rejected(tmp_path):
    from deacon_tpu.io.split import is_bgzf

    path = tmp_path / "r.fq.gz"
    path.write_bytes(gzip.compress(b"@a\nACGT\n+\nIIII\n"))
    assert not is_bgzf(str(path))
    with pytest.raises(SplitError):
        split_fastx_ranges(str(path), 2)


def test_native_split_scans_match_python(tmp_path):
    """dx_records_at_offsets / dx_offsets_at_records (the C++ mmap scans
    behind split_paired_ranges) must agree with the chunked-Python
    reference scans on FASTQ and multiline FASTA, including the
    unterminated-final-line rule."""
    from deacon_tpu.io.native_loader import get_lib
    from deacon_tpu.io.split import (
        _native_offsets_at_records,
        _native_records_at_offsets,
        _offsets_at_records,
        _records_at_offsets,
        _sniff_plain,
    )

    if get_lib() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(71)

    def fastq(path, n_rec, terminal_nl=True):
        with open(path, "wb") as f:
            for i in range(n_rec):
                m = int(rng.integers(20, 120))
                seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), m))
                f.write(b"@r%d\n%s\n+\n%s" % (i, seq, b"@" * m))
                if i < n_rec - 1 or terminal_nl:
                    f.write(b"\n")

    def fasta(path, n_rec):
        with open(path, "wb") as f:
            for i in range(n_rec):
                m = int(rng.integers(30, 300))
                seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), m))
                f.write(b">c%d\n" % i)
                for j in range(0, m, 60):
                    f.write(seq[j : j + 60] + b"\n")

    cases = []
    p = tmp_path / "a.fq"; fastq(p, 57); cases.append(p)
    p = tmp_path / "b.fq"; fastq(p, 33, terminal_nl=False); cases.append(p)
    p = tmp_path / "c.fa"; fasta(p, 41); cases.append(p)
    for path in cases:
        with open(path, "rb") as f:
            is_fq, size = _sniff_plain(f)
        # record-aligned offsets from the splitter itself
        bounds = [r[0] for r in split_fastx_ranges(str(path), 7)[1:]] + [size]
        with open(path, "rb") as f:
            want = _records_at_offsets(f, size, bounds, is_fq)
        got = _native_records_at_offsets(str(path), bounds, is_fq)
        assert got == want, (path, got, want)
        idxs = sorted(set(want + [0, want[-1] + 5]))
        with open(path, "rb") as f:
            want_off = _offsets_at_records(f, size, idxs, is_fq)
        got_off = _native_offsets_at_records(str(path), idxs, is_fq)
        assert got_off == want_off, (path, got_off, want_off)
