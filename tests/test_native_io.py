"""Native C++ loader/writer vs pure-Python implementations."""

import gzip
import lzma

import numpy as np
import pytest

from deacon_tpu.io import fastx, writers
from deacon_tpu.io.native_loader import get_lib, open_native_reader

pytestmark = pytest.mark.skipif(
    get_lib() is None, reason="native library unavailable"
)

RNG = np.random.default_rng(5)
_B = np.frombuffer(b"ACGT", np.uint8)


def rs(n):
    return RNG.choice(_B, size=n).tobytes().decode()


def make_fastq(n):
    return "".join(
        f"@read_{i} desc {i}\n{rs(100 + i % 40)}\n+\n{'I' * (100 + i % 40)}\n"
        for i in range(n)
    )


def make_fasta_multiline(n):
    out = []
    for i in range(n):
        seq = rs(200 + i % 90)
        out.append(f">ctg_{i}\n")
        for j in range(0, len(seq), 60):
            out.append(seq[j : j + 60] + "\n")
    return "".join(out)


def parse_all(reader):
    return [(r.id, r.seq, r.qual, r.is_fastq) for r in reader]


@pytest.mark.parametrize("codec", ["plain", "gz", "zst", "xz"])
def test_reader_matches_python(tmp_path, codec):
    text = make_fastq(500).encode()
    path = tmp_path / f"in.fq.{codec}"
    if codec == "plain":
        path.write_bytes(text)
    elif codec == "gz":
        path.write_bytes(gzip.compress(text))
    elif codec == "zst":
        import zstandard

        path.write_bytes(zstandard.ZstdCompressor().compress(text))
    else:
        path.write_bytes(lzma.compress(text))

    native = open_native_reader(str(path))
    assert native is not None
    got = parse_all(native)
    expect = parse_all(fastx.FastxReader(fastx.open_maybe_compressed(path)))
    assert got == expect


def test_reader_multiline_fasta(tmp_path):
    text = make_fasta_multiline(100).encode()
    path = tmp_path / "in.fa"
    path.write_bytes(text)
    got = parse_all(open_native_reader(str(path)))
    expect = parse_all(fastx.FastxReader(fastx.open_maybe_compressed(path)))
    assert got == expect
    assert got[0][3] is False and got[0][2] is None


def test_reader_arena_growth(tmp_path):
    # One record larger than the batch byte budget must still parse whole
    # (the batch simply ends after it), and the next record must follow.
    big = rs(600)
    text = f">big\n{big}\n>small\n{rs(50)}\n".encode()
    path = tmp_path / "big.fa"
    path.write_bytes(text)
    r = open_native_reader(str(path))
    r._max_batch_bytes = 128  # force a tiny per-batch byte budget
    got = parse_all(r)
    assert len(got) == 2
    assert got[0][1].decode() == big


def test_batch_view_respects_budget_and_offsets(tmp_path):
    text = make_fastq(64).encode()
    path = tmp_path / "r.fq"
    path.write_bytes(text)
    r = open_native_reader(str(path))
    r._max_batch_bytes = 1024  # several small batches
    oracle = parse_all(fastx.FastxReader(open(path, "rb")))
    got = []
    n_batches = 0
    while True:
        meta, arena, is_fastq = r.read_batch_raw(1_000_000)
        if meta.shape[0] == 0:
            break
        assert is_fastq
        n_batches += 1
        ab = arena.tobytes()
        for i in range(meta.shape[0]):
            io_, il, so_, sl, qo_, ql = (int(x) for x in meta[i])
            got.append((ab[io_:io_ + il], ab[so_:so_ + sl], ab[qo_:qo_ + ql]))
    assert n_batches > 4  # the budget actually split the stream
    assert len(got) == len(oracle)
    for (gid, gseq, gq), (oid, oseq, oq, _) in zip(got, oracle):
        assert (gid, gseq, gq) == (oid, oseq, oq)


def test_merge_sorted_unique_matches_numpy():
    from deacon_tpu.io.native_loader import native_u64_merge_sorted_unique

    rng = np.random.default_rng(9)
    for na, nb in [(0, 0), (0, 5), (5, 0), (1000, 1), (1, 1000), (5000, 3000)]:
        a = np.unique(rng.integers(0, 10_000, size=na).astype(np.uint64))
        b = np.unique(rng.integers(0, 10_000, size=nb).astype(np.uint64))
        out = native_u64_merge_sorted_unique(a, b)
        np.testing.assert_array_equal(out, np.union1d(a, b))


def test_native_writer_roundtrip(tmp_path):
    for ext, opener in [("gz", lambda p: gzip.open(p, "rb")),
                        ("xz", lambda p: lzma.open(p, "rb"))]:
        path = tmp_path / f"out.fq.{ext}"
        w = writers.get_writer(str(path), 2)
        w.write(b"@r1\nACGT\n+\nIIII\n")
        w.finish()
        assert opener(path).read() == b"@r1\nACGT\n+\nIIII\n"
    import zstandard

    path = tmp_path / "out.fq.zst"
    w = writers.get_writer(str(path), 2)
    w.write(b"@r1\nACGT\n+\nIIII\n")
    w.finish()
    # streaming frames omit the content size; use the streaming decompressor
    data = zstandard.ZstdDecompressor().stream_reader(path.open("rb")).read()
    assert data == b"@r1\nACGT\n+\nIIII\n"


def test_parse_error_surfaces(tmp_path):
    path = tmp_path / "bad.fq"
    path.write_text("@r1\nACGT\nOOPS\nIIII\n")
    r = open_native_reader(str(path))
    with pytest.raises(fastx.FastxParseError):
        parse_all(r)


def test_counting_set_matches_python_set():
    from deacon_tpu.io.native_loader import NativeCountingSet

    rng = np.random.default_rng(13)
    for hint in (0, 1_000_000):
        cs = NativeCountingSet(capacity_hint=hint)
        ref: set = set()
        for _ in range(8):
            keys = rng.integers(0, 5_000, size=int(rng.integers(1, 20_000)),
                                dtype=np.uint64)
            keys[0] = 0  # exercise the zero-key (sentinel) path
            new = cs.insert(keys, n_threads=2)
            before = len(ref)
            ref.update(keys.tolist())
            assert new == len(ref) - before
            assert len(cs) == len(ref)
        out = cs.export_sorted()
        np.testing.assert_array_equal(
            out, np.array(sorted(ref), dtype=np.uint64)
        )
        cs.close()


def test_diff_sorted_unique_matches_numpy():
    from deacon_tpu.io.native_loader import native_u64_diff_sorted_unique

    rng = np.random.default_rng(17)
    for na, nb in [(0, 0), (0, 5), (5, 0), (1000, 30), (400, 400)]:
        a = np.unique(rng.integers(0, 2_000, size=na).astype(np.uint64))
        b = np.unique(rng.integers(0, 2_000, size=nb).astype(np.uint64))
        out = native_u64_diff_sorted_unique(a, b)
        np.testing.assert_array_equal(
            out, np.setdiff1d(a, b, assume_unique=True)
        )


# ---------------------------------------------------------------------------
# Parallel BGZF decoding (Source::read_bgzf in fastx_native.cpp)
# ---------------------------------------------------------------------------


def _bgzf(data: bytes, **kw) -> bytes:
    from helpers import bgzf_compress

    return bgzf_compress(data, **kw)


@pytest.mark.parametrize("threads", ["1", "3"])
def test_bgzf_reader_matches_python(tmp_path, monkeypatch, threads):
    monkeypatch.setenv("DEACON_BGZF_THREADS", threads)
    text = make_fastq(4000).encode()
    path = tmp_path / "in.fq.gz"
    path.write_bytes(_bgzf(text, block=4096))  # many blocks, several batches
    native = open_native_reader(str(path))
    got = parse_all(native)
    expect = parse_all(fastx.FastxReader(fastx.open_maybe_compressed(path)))
    assert got == expect


def test_bgzf_without_eof_block(tmp_path):
    text = make_fastq(50).encode()
    path = tmp_path / "in.fq.gz"
    path.write_bytes(_bgzf(text, eof_block=False))
    assert parse_all(open_native_reader(str(path))) == parse_all(
        fastx.FastxReader(fastx.open_maybe_compressed(path))
    )


def test_bgzf_eof_block_only(tmp_path):
    from helpers import BGZF_EOF

    path = tmp_path / "in.fq.gz"
    path.write_bytes(BGZF_EOF)
    assert parse_all(open_native_reader(str(path))) == []


def test_bgzf_then_plain_member_fallback(tmp_path):
    # BGZF members followed by an ordinary gzip member: the decoder must
    # hand the stream to the serial path mid-file with no bytes lost.
    a = make_fastq(1200).encode()
    b = make_fastq(700).encode()
    path = tmp_path / "in.fq.gz"
    path.write_bytes(_bgzf(a, block=8192, eof_block=False) + gzip.compress(b))
    got = parse_all(open_native_reader(str(path)))
    expect = parse_all(
        fastx.FastxReader(fastx.open_maybe_compressed(path))
    )
    assert got == expect
    assert len(got) == 1900


def test_bgzf_truncated_block_errors(tmp_path):
    text = make_fastq(600).encode()
    full = _bgzf(text, block=4096)
    path = tmp_path / "in.fq.gz"
    path.write_bytes(full[: len(full) // 2 - 7])
    reader = open_native_reader(str(path))
    with pytest.raises(Exception):
        for _ in reader:
            pass


def test_bgzf_corrupt_crc_errors(tmp_path):
    text = make_fastq(600).encode()
    raw = bytearray(_bgzf(text, block=4096))
    raw[len(raw) // 3] ^= 0xFF  # flip a payload byte in some middle block
    path = tmp_path / "in.fq.gz"
    path.write_bytes(bytes(raw))
    reader = open_native_reader(str(path))
    with pytest.raises(Exception):
        for _ in reader:
            pass


def test_bgzf_chunk_parallel_parse(tmp_path, monkeypatch):
    # chunk-parallel record parsing composes with the BGZF decoder (both
    # pull from Source::read)
    monkeypatch.setenv("DEACON_CHUNK_PARSE", "1")
    monkeypatch.setenv("DEACON_CHUNK_BYTES", "4096")
    text = make_fastq(3000).encode()
    path = tmp_path / "in.fq.gz"
    path.write_bytes(_bgzf(text, block=4096))
    native = open_native_reader(str(path))
    got = parse_all(native)
    expect = parse_all(fastx.FastxReader(fastx.open_maybe_compressed(path)))
    assert got == expect


def test_decode_ahead_disabled_matches(tmp_path, monkeypatch):
    monkeypatch.setenv("DEACON_DECODE_AHEAD", "0")
    text = make_fastq(800).encode()
    path = tmp_path / "in.fq.gz"
    path.write_bytes(gzip.compress(text))
    got = parse_all(open_native_reader(str(path)))
    expect = parse_all(fastx.FastxReader(fastx.open_maybe_compressed(path)))
    assert got == expect


@pytest.mark.parametrize("ahead", ["0", "1"])
def test_plain_gz_truncated_errors(tmp_path, monkeypatch, ahead):
    # mid-member truncation of an ordinary gzip stream must error (not
    # silently parse as EOF), through both the decode-ahead thread and the
    # direct path
    monkeypatch.setenv("DEACON_DECODE_AHEAD", ahead)
    text = make_fastq(2000).encode()
    full = gzip.compress(text)
    path = tmp_path / "in.fq.gz"
    path.write_bytes(full[: len(full) // 2])
    reader = open_native_reader(str(path))
    with pytest.raises(Exception):
        for _ in reader:
            pass


def test_zstd_truncated_errors(tmp_path):
    import zstandard

    text = make_fastq(2000).encode()
    full = zstandard.ZstdCompressor().compress(text)
    path = tmp_path / "in.fq.zst"
    path.write_bytes(full[: len(full) // 2])
    reader = open_native_reader(str(path))
    with pytest.raises(Exception):
        for _ in reader:
            pass


# ---------------------------------------------------------------------------
# Review-fix regressions: bz2 inputs, blank-line seams, CRLF at EOF
# ---------------------------------------------------------------------------


def _fq_with_blank_lines(n=200):
    text = b""
    for i in range(n):
        seq = RNG.choice(_B, size=50).tobytes()
        text += b"@r%d\n%s\n+\n%s\n" % (i, seq, b"I" * 50)
        if i % 7 == 3:
            text += b"\n"  # blank line between records (serial parser skips)
    return text


def test_blank_line_at_chunk_batch_cut(tmp_path, monkeypatch):
    # a blank line whose leading newline leaves with the previous batch must
    # bail to the serial parser, not corrupt the 4-line phase
    monkeypatch.setenv("DEACON_CHUNK_PARSE", "1")
    monkeypatch.setenv("DEACON_CHUNK_BYTES", "256")
    path = tmp_path / "blank.fq"
    path.write_bytes(_fq_with_blank_lines())
    got = parse_all(open_native_reader(str(path)))
    expect = parse_all(fastx.FastxReader(fastx.open_maybe_compressed(path)))
    assert got == expect and len(got) == 200


def test_bz2_input_native(tmp_path):
    import bz2

    text = _fq_with_blank_lines(80)
    path = tmp_path / "in.fq.bz2"
    path.write_bytes(bz2.compress(text))
    got = parse_all(open_native_reader(str(path)))
    expect = parse_all(fastx.FastxReader(fastx.open_maybe_compressed(path)))
    assert got == expect


def test_bz2_concatenated_members(tmp_path):
    import bz2

    text = _fq_with_blank_lines(80)
    path = tmp_path / "in.fq.bz2"
    path.write_bytes(bz2.compress(text[:1000]) + bz2.compress(text[1000:]))
    got = parse_all(open_native_reader(str(path)))
    expect = parse_all(fastx.FastxReader(fastx.open_maybe_compressed(path)))
    assert got == expect


def test_bz2_truncated_errors(tmp_path):
    import bz2

    full = bz2.compress(_fq_with_blank_lines(80))
    path = tmp_path / "in.fq.bz2"
    path.write_bytes(full[: len(full) // 2])
    with pytest.raises(Exception):
        for _ in open_native_reader(str(path)):
            pass


def test_crlf_final_line_without_newline(tmp_path):
    body = b"ACGT" * 9
    crlf = b"@r0\r\n" + body + b"\r\n+\r\n" + b"I" * len(body) + b"\r"
    path = tmp_path / "crlf.fq"
    path.write_bytes(crlf)
    got = parse_all(open_native_reader(str(path)))
    expect = parse_all(fastx.FastxReader(fastx.open_maybe_compressed(path)))
    assert got == expect


def test_gzip_optional_header_fields(tmp_path):
    """Real-world .gz files (e.g. from the gzip CLI) carry FNAME and other
    optional header fields that Python's gzip.compress never emits — the
    streaming fast inflater must skip them all (FEXTRA/FNAME/FCOMMENT/FHCRC).
    """
    import struct
    import zlib as _zlib

    text = make_fastq(300).encode()

    def gz_with_fields(data, fname=None, comment=None, extra=None,
                       fhcrc=False):
        flg = ((4 if extra else 0) | (8 if fname else 0)
               | (16 if comment else 0) | (2 if fhcrc else 0))
        hdr = struct.pack("<BBBBIBB", 0x1F, 0x8B, 8, flg, 12345, 0, 3)
        if extra:
            hdr += struct.pack("<H", len(extra)) + extra
        if fname:
            hdr += fname + b"\x00"
        if comment:
            hdr += comment + b"\x00"
        if fhcrc:
            hdr += struct.pack("<H", _zlib.crc32(hdr) & 0xFFFF)
        co = _zlib.compressobj(6, _zlib.DEFLATED, -15)
        body = co.compress(data) + co.flush()
        return hdr + body + struct.pack(
            "<II", _zlib.crc32(data) & 0xFFFFFFFF, len(data) & 0xFFFFFFFF)

    cases = {
        "fname": gz_with_fields(text, fname=b"reads.fastq"),
        "comment": gz_with_fields(text, comment=b"hello world"),
        "extra": gz_with_fields(text, extra=b"AB\x04\x00abcd"),
        "fhcrc": gz_with_fields(text, fname=b"x.fq", fhcrc=True),
        "all": gz_with_fields(text, fname=b"n" * 300, comment=b"c" * 5000,
                              extra=b"ZZ\x10\x00" + b"\x00" * 16, fhcrc=True),
    }
    for name, raw in cases.items():
        path = tmp_path / "h.fq.gz"
        path.write_bytes(raw)
        got = parse_all(open_native_reader(str(path)))
        expect = parse_all(
            fastx.FastxReader(fastx.open_maybe_compressed(path)))
        assert got == expect, name


def test_gzip_bad_trailer_crc_errors(tmp_path):
    import gzip as _gzip

    raw = bytearray(_gzip.compress(make_fastq(300).encode()))
    raw[-6] ^= 0xFF  # flip a CRC byte in the trailer
    path = tmp_path / "bad.fq.gz"
    path.write_bytes(bytes(raw))
    with pytest.raises(Exception):
        for _ in open_native_reader(str(path)):
            pass
