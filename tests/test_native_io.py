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
    # One record larger than the initial arena must force growth, not loss.
    big = rs(600)
    text = f">big\n{big}\n>small\n{rs(50)}\n".encode()
    path = tmp_path / "big.fa"
    path.write_bytes(text)
    r = open_native_reader(str(path))
    r._arena = np.empty(128, dtype=np.uint8)  # force tiny arena
    got = parse_all(r)
    assert len(got) == 2
    assert got[0][1].decode() == big


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
