"""CLI-level tests for `deacon-tpu index {build,info,union,diff}`
(mirrors tests/index_tests.rs + tests/cli_tests.rs)."""

import re

import numpy as np
import pytest

from deacon_tpu.index import store
from pathlib import Path

from helpers import (
    build_index,
    random_dna,
    run_cli,
    write_fasta,
    write_fastq,
)


def test_version_and_usage():
    proc = run_cli(["--version"])
    assert proc.stdout.decode().startswith("deacon-tpu ")
    proc = run_cli([], expect_ok=False)
    assert proc.returncode != 0


def test_build_default_and_custom_kw(tmp_path):
    ref = tmp_path / "ref.fa"
    write_fasta(ref, [("s", random_dna(400))])
    idx = tmp_path / "d.idx"
    build_index(ref, idx)
    h, count = store.load_header_and_count(idx)
    assert (h.kmer_length, h.window_size) == (31, 15) and count > 0

    idx2 = tmp_path / "c.idx"
    build_index(ref, idx2, "-k", "21", "-w", "11")
    h2, count2 = store.load_header_and_count(idx2)
    assert (h2.kmer_length, h2.window_size) == (21, 11) and count2 > 0


def test_build_rejects_even_l(tmp_path):
    ref = tmp_path / "ref.fa"
    write_fasta(ref, [("s", random_dna(100))])
    proc = run_cli(
        ["index", "build", ref, "-o", tmp_path / "x.idx", "-k", "30", "-w", "15", "-q"],
        expect_ok=False,
    )
    assert proc.returncode != 0
    assert b"k + w - 1 must be odd" in proc.stderr


def test_build_entropy_threshold(tmp_path):
    ref = tmp_path / "ref.fa"
    write_fasta(ref, [("s", "A" * 200 + random_dna(200))])
    plain = tmp_path / "p.idx"
    filt = tmp_path / "f.idx"
    build_index(ref, plain)
    build_index(ref, filt, "-e", "0.5")
    _, c1 = store.load_header_and_count(plain)
    _, c2 = store.load_header_and_count(filt)
    assert c2 < c1


def test_info_reports_counts(tmp_path):
    ref = tmp_path / "ref.fa"
    write_fasta(ref, [("s", random_dna(400))])
    idx = tmp_path / "d.idx"
    build_index(ref, idx)
    proc = run_cli(["index", "info", idx])
    err = proc.stderr.decode()
    assert "Format version: 2" in err
    assert "K-mer length (k): 31" in err
    assert re.search(r"Distinct minimizer count: \d+", err)


def test_union(tmp_path):
    a, b = random_dna(300), random_dna(300)
    fa_a, fa_b, fa_ab = tmp_path / "a.fa", tmp_path / "b.fa", tmp_path / "ab.fa"
    write_fasta(fa_a, [("a", a)])
    write_fasta(fa_b, [("b", b)])
    write_fasta(fa_ab, [("a", a), ("b", b)])
    ia, ib, iab = tmp_path / "a.idx", tmp_path / "b.idx", tmp_path / "ab.idx"
    build_index(fa_a, ia)
    build_index(fa_b, ib)
    build_index(fa_ab, iab)
    un = tmp_path / "u.idx"
    run_cli(["index", "union", ia, ib, "-o", un])
    # union of the two == index of the concatenated input
    assert store.load_index(un).hashes.tolist() == store.load_index(iab).hashes.tolist()


def test_union_incompatible_headers(tmp_path):
    fa = tmp_path / "a.fa"
    write_fasta(fa, [("a", random_dna(200))])
    i1, i2 = tmp_path / "1.idx", tmp_path / "2.idx"
    build_index(fa, i1)
    build_index(fa, i2, "-k", "21", "-w", "11")
    proc = run_cli(["index", "union", i1, i2, "-o", tmp_path / "u.idx"],
                   expect_ok=False)
    assert b"Incompatible headers" in proc.stderr


def test_three_way_diff_equivalence(tmp_path):
    """index-index diff == index-FASTX-file diff == index-FASTX-stdin diff
    (ref: tests/index_tests.rs:168-285)."""
    a, b = random_dna(400), random_dna(400)
    fa_ab, fa_b = tmp_path / "ab.fa", tmp_path / "b.fa"
    write_fasta(fa_ab, [("a", a), ("b", b)])
    write_fasta(fa_b, [("b", b)])
    iab, ib = tmp_path / "ab.idx", tmp_path / "b.idx"
    build_index(fa_ab, iab)
    build_index(fa_b, ib)

    out1 = tmp_path / "d1.idx"
    proc1 = run_cli(["index", "diff", iab, ib, "-o", out1])

    out2 = tmp_path / "d2.idx"
    proc2 = run_cli(["index", "diff", iab, fa_b, "-k", "31", "-w", "15", "-o", out2])

    out3 = tmp_path / "d3.idx"
    proc3 = run_cli(["index", "diff", iab, "-", "-k", "31", "-w", "15", "-o", out3],
                    stdin_data=fa_b.read_bytes())

    data1, data2, data3 = out1.read_bytes(), out2.read_bytes(), out3.read_bytes()
    assert data1 == data2 == data3

    # remaining counts parse identically from stderr (ref checks this too)
    counts = []
    for proc in (proc1, proc2, proc3):
        mt = re.search(rb"(\d+) remaining", proc.stderr)
        assert mt, proc.stderr
        counts.append(int(mt.group(1)))
    assert counts[0] == counts[1] == counts[2]
    assert 0 < counts[0] < len(store.load_index(iab))


def test_diff_auto_detects_fastx_kw_from_header(tmp_path):
    """Explicit vs auto-detected k/w produce byte-identical outputs
    (ref: tests/index_tests.rs:287-341)."""
    a, b = random_dna(400), random_dna(400)
    fa_ab, fa_b = tmp_path / "ab.fa", tmp_path / "b.fa"
    write_fasta(fa_ab, [("a", a), ("b", b)])
    write_fasta(fa_b, [("b", b)])
    iab = tmp_path / "ab.idx"
    build_index(fa_ab, iab)

    out_explicit = tmp_path / "de.idx"
    run_cli(["index", "diff", iab, fa_b, "-k", "31", "-w", "15", "-o", out_explicit])
    out_auto = tmp_path / "da.idx"
    run_cli(["index", "diff", iab, fa_b, "-o", out_auto])
    assert out_explicit.read_bytes() == out_auto.read_bytes()


def test_diff_incompatible_headers(tmp_path):
    fa = tmp_path / "a.fa"
    write_fasta(fa, [("a", random_dna(300))])
    i1, i2 = tmp_path / "1.idx", tmp_path / "2.idx"
    build_index(fa, i1)
    build_index(fa, i2, "-k", "21", "-w", "11")
    proc = run_cli(["index", "diff", i1, i2, "-o", tmp_path / "d.idx"],
                   expect_ok=False)
    assert b"Incompatible headers" in proc.stderr


def test_build_from_stdin(tmp_path):
    fa_data = b">s\n" + random_dna(300).encode() + b"\n"
    idx = tmp_path / "s.idx"
    run_cli(["index", "build", "-", "-o", idx, "-q"], stdin_data=fa_data)
    _, count = store.load_header_and_count(idx)
    assert count > 0


def test_build_to_stdout(tmp_path):
    ref = tmp_path / "ref.fa"
    write_fasta(ref, [("s", random_dna(300))])
    proc = run_cli(["index", "build", ref, "-q"])
    idx_path = tmp_path / "via_stdout.idx"
    idx_path.write_bytes(proc.stdout)
    idx = store.load_index(idx_path)
    assert len(idx) > 0


def test_build_malformed_mid_stream_fails_cleanly(tmp_path):
    # A parse error after the first good record must abort the build with
    # the parser's message and a nonzero exit — not hang the prefetch
    # producer thread (raw native path) or succeed partially.
    bad = tmp_path / "bad.fq"
    seq = random_dna(60).encode()
    bad.write_bytes(
        b"@r1\n" + seq + b"\n+\n" + b"I" * len(seq) + b"\n"
        b"@r2\nACGT\nXXXX\nIIII\n"
    )
    proc = run_cli(["index", "build", bad, "-o", tmp_path / "bad.idx"],
                   expect_ok=False)
    assert b"separator" in proc.stderr or b"Expected" in proc.stderr


# ---------------------------------------------------------------------------
# provenance trailer (foreign-index guard; VERDICT r1 #1)
# ---------------------------------------------------------------------------


def _strip_trailer(path_in, path_out):
    """Simulate a reference-built index: same payload, no trailer."""
    data = Path(path_in).read_bytes()
    assert data[-9:-1] == store.PROVENANCE_MAGIC
    Path(path_out).write_bytes(data[:-9])


def test_provenance_written_and_reported(tmp_path):
    ref = tmp_path / "ref.fa"
    write_fasta(ref, [("g", random_dna(600))])
    idx = tmp_path / "g.idx"
    build_index(ref, idx)
    assert store.read_provenance(idx) == store.SCHEME_DXTP_FMIX32_V1
    proc = run_cli(["index", "info", idx])
    assert b"Origin: deacon-tpu (selection scheme: dxtp-fmix32-v1)" in proc.stderr


def test_foreign_index_load_is_compatible_and_warns(tmp_path):
    ref = tmp_path / "ref.fa"
    genome = random_dna(600)
    write_fasta(ref, [("g", genome)])
    idx = tmp_path / "g.idx"
    build_index(ref, idx)
    foreign = tmp_path / "foreign.idx"
    _strip_trailer(idx, foreign)
    # same payload decodes identically
    assert np.array_equal(
        store.load_index(idx).hashes, store.load_index(foreign).hashes
    )
    assert store.read_provenance(foreign) is None
    # info reports unknown origin
    proc = run_cli(["index", "info", foreign])
    assert b"Origin: unknown" in proc.stderr
    # filter fires the one-shot warning
    reads = tmp_path / "r.fq"
    write_fastq(reads, [("r1", genome[:100])])
    proc = run_cli(["filter", foreign, reads, "-o", tmp_path / "o.fq"])
    assert b"was not built by deacon-tpu" in proc.stderr
    proc2 = run_cli(["filter", idx, reads, "-o", tmp_path / "o2.fq"])
    assert b"was not built by deacon-tpu" not in proc2.stderr


def test_union_diff_provenance_propagation(tmp_path):
    ref1, ref2 = tmp_path / "a.fa", tmp_path / "b.fa"
    write_fasta(ref1, [("a", random_dna(600))])
    write_fasta(ref2, [("b", random_dna(600))])
    ia, ib = tmp_path / "a.idx", tmp_path / "b.idx"
    build_index(ref1, ia)
    build_index(ref2, ib)
    # ours + ours -> trailer kept
    u = tmp_path / "u.idx"
    run_cli(["index", "union", ia, ib, "-o", u])
    assert store.read_provenance(u) == store.SCHEME_DXTP_FMIX32_V1
    d = tmp_path / "d.idx"
    run_cli(["index", "diff", ia, ib, "-o", d])
    assert store.read_provenance(d) == store.SCHEME_DXTP_FMIX32_V1
    # foreign input poisons union provenance + warns
    fb = tmp_path / "fb.idx"
    _strip_trailer(ib, fb)
    u2 = tmp_path / "u2.idx"
    proc = run_cli(["index", "union", ia, fb, "-o", u2])
    assert store.read_provenance(u2) is None
    assert b"was not built by deacon-tpu" in proc.stderr
    # foreign FIRST index -> diff output foreign + warns
    fa_ = tmp_path / "fa.idx"
    _strip_trailer(ia, fa_)
    d2 = tmp_path / "d2.idx"
    proc = run_cli(["index", "diff", fa_, ib, "-o", d2])
    assert store.read_provenance(d2) is None
    assert b"was not built by deacon-tpu" in proc.stderr
