"""Parity tests: the fully native C++ filter pipeline (io/native
dx_filter_run, used by --device auto on the host) must produce byte-identical
outputs and identical summary stats to the pure-Python oracle path
(--device numpy). Mirrors the reference's engine-equivalence guarantee
(local vs remote engines are scientifically identical; README.md:241-242).
"""

from __future__ import annotations

import json

import pytest

from helpers import (
    FRAGMENT_60,
    build_index,
    fastq_text,
    random_dna,
    read_output,
    revcomp,
    run_cli,
    write_fasta,
    write_fasta_multiline,
    write_fastq,
)


@pytest.fixture(scope="module")
def ctx(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("native_pipeline")
    genome = tmp / "genome.fasta"
    write_fasta(genome, [("chr1", FRAGMENT_60 + random_dna(400))])
    idx = tmp / "genome.idx"
    build_index(genome, idx)
    return tmp, str(idx)


def _reads():
    rng_reads = [
        ("match_fwd", FRAGMENT_60 + random_dna(80)),
        ("match_rev", revcomp(FRAGMENT_60) + random_dna(80)),
        ("nomatch_a", random_dna(140)),
        ("nomatch_b", random_dna(139)),
        ("short", "ACGTACGT"),  # < k: zero minimizers
        ("with_n", "ACGTN" * 30),
    ]
    return rng_reads


def _run_both(tmp, idx, name, extra, in1, in2=None, ext=""):
    """Run the same filter via native (auto) and oracle (numpy) paths;
    return (native_out_text, numpy_out_text, native_summary, numpy_summary)."""
    outs, summaries = [], []
    for dev, tag in (("auto", "nat"), ("numpy", "ora")):
        out = tmp / f"{name}_{tag}.out{ext or '.fastq'}"
        summ = tmp / f"{name}_{tag}.json"
        args = ["filter", idx, in1]
        if in2 is not None:
            args.append(in2)
        args += ["-o", out, "-s", summ, "-q", "--device", dev, *extra]
        run_cli(args)
        outs.append(read_output(out))
        summaries.append(json.loads(summ.read_text()))
    return outs[0], outs[1], summaries[0], summaries[1]


def _assert_summaries_match(s_nat, s_ora):
    for key in ("seqs_in", "seqs_out", "seqs_removed", "bp_in", "bp_out",
                "bp_removed", "k", "w", "abs_threshold", "rel_threshold",
                "deplete", "rename"):
        assert s_nat[key] == s_ora[key], key


@pytest.mark.parametrize(
    "name,extra",
    [
        ("search_default", []),
        ("deplete", ["-d"]),
        ("rename", ["-R", "-d"]),
        ("abs3", ["-a", "3"]),
        ("rel_half", ["-r", "0.5", "-a", "1"]),
        ("prefix", ["-p", "60"]),
        ("two_threads", ["-t", "2", "-d"]),
    ],
)
def test_single_fastq_parity(ctx, name, extra):
    tmp, idx = ctx
    reads = tmp / f"{name}.fastq"
    write_fastq(reads, _reads())
    o_nat, o_ora, s_nat, s_ora = _run_both(tmp, idx, name, extra, reads)
    assert o_nat == o_ora
    _assert_summaries_match(s_nat, s_ora)


@pytest.mark.parametrize("ext", [".fasta", ".fastq.gz", ".fastq.zst", ".fastq.xz"])
def test_output_format_parity(ctx, ext):
    tmp, idx = ctx
    reads = tmp / f"ofmt{ext.replace('.', '_')}.fastq"
    write_fastq(reads, _reads())
    o_nat, o_ora, s_nat, s_ora = _run_both(
        tmp, idx, f"ofmt{ext.replace('.', '_')}", ["-d"], reads, ext=ext
    )
    assert o_nat == o_ora
    _assert_summaries_match(s_nat, s_ora)


def test_multiline_fasta_parity(ctx):
    tmp, idx = ctx
    reads = tmp / "ml.fasta"
    write_fasta_multiline(
        reads, [("m1", FRAGMENT_60 + random_dna(100)), ("m2", random_dna(160))]
    )
    o_nat, o_ora, s_nat, s_ora = _run_both(tmp, idx, "ml", [], str(reads))
    assert o_nat == o_ora
    _assert_summaries_match(s_nat, s_ora)


def test_gz_input_parity(ctx):
    import gzip

    tmp, idx = ctx
    reads = tmp / "gzin.fastq.gz"
    with gzip.open(reads, "wt") as f:
        f.write(fastq_text(_reads()))
    o_nat, o_ora, s_nat, s_ora = _run_both(tmp, idx, "gzin", ["-d"], reads)
    assert o_nat == o_ora
    _assert_summaries_match(s_nat, s_ora)


def test_paired_separate_outputs_parity(ctx):
    tmp, idx = ctx
    r1 = tmp / "p_r1.fastq"
    r2 = tmp / "p_r2.fastq"
    # pair-OR: mate2 matching removes/keeps both; shared minimizers counted once
    write_fastq(r1, [("p1/1", random_dna(100)), ("p2/1", FRAGMENT_60 + random_dna(40)),
                     ("p3/1", FRAGMENT_60)])
    write_fastq(r2, [("p1/2", FRAGMENT_60 + random_dna(40)), ("p2/2", random_dna(100)),
                     ("p3/2", FRAGMENT_60)])
    for dev, tag in (("auto", "nat"), ("numpy", "ora")):
        o1 = tmp / f"po_{tag}_1.fastq"
        o2 = tmp / f"po_{tag}_2.fastq"
        summ = tmp / f"po_{tag}.json"
        run_cli(["filter", idx, r1, r2, "-o", o1, "-O", o2, "-s", summ,
                 "-q", "-d", "-R", "--device", dev])
    assert read_output(tmp / "po_nat_1.fastq") == read_output(tmp / "po_ora_1.fastq")
    assert read_output(tmp / "po_nat_2.fastq") == read_output(tmp / "po_ora_2.fastq")
    s_nat = json.loads((tmp / "po_nat.json").read_text())
    s_ora = json.loads((tmp / "po_ora.json").read_text())
    _assert_summaries_match(s_nat, s_ora)


def test_paired_uneven_files_stop_at_shorter(ctx):
    tmp, idx = ctx
    r1 = tmp / "ue_r1.fastq"
    r2 = tmp / "ue_r2.fastq"
    write_fastq(r1, [("u1/1", random_dna(100)), ("u2/1", random_dna(100)),
                     ("u3/1", random_dna(100))])
    write_fastq(r2, [("u1/2", random_dna(100))])
    o_nat, o_ora, s_nat, s_ora = _run_both(
        tmp, idx, "uneven", ["-d"], str(r1), str(r2)
    )
    assert o_nat == o_ora
    assert s_nat["seqs_in"] == 2  # one complete pair
    _assert_summaries_match(s_nat, s_ora)


def test_interleaved_stdin_parity(ctx):
    tmp, idx = ctx
    data = fastq_text([
        ("i1/1", random_dna(100)), ("i1/2", FRAGMENT_60 + random_dna(40)),
        ("i2/1", random_dna(100)), ("i2/2", random_dna(100)),
    ]).encode()
    outs = []
    for dev, tag in (("auto", "nat"), ("numpy", "ora")):
        out = tmp / f"il_{tag}.fastq"
        run_cli(["filter", idx, "-", "-", "-o", out, "-q", "-d",
                 "--device", dev], stdin_data=data)
        outs.append(read_output(out))
    assert outs[0] == outs[1]


def test_interleaved_odd_count_errors_native(ctx):
    tmp, idx = ctx
    data = fastq_text([("a", random_dna(60)), ("b", random_dna(60)),
                       ("c", random_dna(60))]).encode()
    proc = run_cli(["filter", idx, "-", "-", "-q"], stdin_data=data,
                   expect_ok=False)
    assert proc.returncode != 0
    assert b"Uneven number of interleaved" in proc.stderr


def test_single_stdin_stdout_parity(ctx):
    tmp, idx = ctx
    data = fastq_text(_reads()).encode()
    outs = []
    for dev in ("auto", "numpy"):
        proc = run_cli(["filter", idx, "-", "-o", "-", "-q", "-d",
                        "--device", dev], stdin_data=data)
        outs.append(proc.stdout)
    assert outs[0] == outs[1]


def test_empty_input_parity(ctx):
    tmp, idx = ctx
    reads = tmp / "empty.fastq"
    reads.write_text("")
    o_nat, o_ora, s_nat, s_ora = _run_both(tmp, idx, "empty", [], reads)
    assert o_nat == o_ora == ""
    assert s_nat["seqs_in"] == 0
    _assert_summaries_match(s_nat, s_ora)


def test_invalid_compression_level_native(ctx):
    tmp, idx = ctx
    reads = tmp / "lvl.fastq"
    write_fastq(reads, [("a", random_dna(100))])
    proc = run_cli(["filter", idx, reads, "-o", tmp / "x.fastq.gz",
                    "--compression-level", "11", "-q"], expect_ok=False)
    assert proc.returncode != 0
    assert b"Invalid gzip compression level" in proc.stderr


def test_probe_sidecar_roundtrip_and_invalidation(tmp_path, monkeypatch):
    """`<index>.probe` lets warm runs skip hash decode + table build; it
    must produce identical output and go stale when the index changes."""
    import subprocess
    import sys
    import time as _time

    import numpy as np

    from deacon_tpu.io.native_loader import native_probe_load_sidecar

    rng = np.random.default_rng(21)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome = rng.choice(bases, size=40_000).astype(np.uint8)
    fa = tmp_path / "g.fa"
    fa.write_bytes(b">g\n" + genome.tobytes() + b"\n")
    reads = tmp_path / "r.fq"
    chunks = []
    for i in range(20):
        s = int(rng.integers(0, genome.size - 400))
        seq = genome[s:s + 400] if i % 2 == 0 else rng.choice(bases, size=400)
        chunks.append(b"@r%d\n" % i + seq.tobytes() + b"\n+\nI" * 1 +
                      b"I" * 399 + b"\n")
    reads.write_bytes(b"".join(chunks))
    idx = tmp_path / "g.idx"
    env = {"DEACON_PROBE_CACHE": "1"}

    def run(out):
        r = subprocess.run(
            [sys.executable, "-m", "deacon_tpu", "filter", str(idx),
             str(reads), "-o", str(out), "-d", "-q"],
            capture_output=True, env={**__import__("os").environ, **env},
        )
        assert r.returncode == 0, r.stderr
        return out.read_bytes()

    subprocess.run(
        [sys.executable, "-m", "deacon_tpu", "index", "build", str(fa),
         "-o", str(idx), "-q"], check=True, capture_output=True)
    cold = run(tmp_path / "cold.fq")
    sidecar = tmp_path / "g.idx.probe"
    assert sidecar.exists()
    from deacon_tpu.index.store import load_header_and_count
    _, count = load_header_and_count(idx)
    assert native_probe_load_sidecar(str(idx), count) is not None
    warm = run(tmp_path / "warm.fq")
    assert warm == cold

    # rebuilding the index with different content must invalidate the cache
    _time.sleep(0.02)  # ensure mtime_ns moves even on coarse filesystems
    fa.write_bytes(b">g\n" + genome[::-1].tobytes() + b"\n")
    subprocess.run(
        [sys.executable, "-m", "deacon_tpu", "index", "build", str(fa),
         "-o", str(idx), "-q"], check=True, capture_output=True)
    _, count2 = load_header_and_count(idx)
    assert native_probe_load_sidecar(str(idx), count2) is None
    # and a fresh run against the new index must still be correct (it
    # rebuilds and re-saves the sidecar)
    run(tmp_path / "fresh.fq")
    assert native_probe_load_sidecar(str(idx), count2) is not None


def test_gz_output_is_bgzf(tmp_path):
    """gz outputs are BGZF-framed by default: bgzip/htslib-compatible,
    gzip-readable, end with the canonical EOF marker, and decode through
    our own parallel block decoder. DEACON_BGZF_OUT=0 emits plain members
    with identical content."""
    import gzip
    import os
    import subprocess
    import sys

    import numpy as np

    rng = np.random.default_rng(5)
    B = np.frombuffer(b"ACGT", np.uint8)
    g = rng.choice(B, size=5000).tobytes()
    (tmp_path / "g.fa").write_bytes(b">c\n" + g + b"\n")
    subprocess.run(
        [sys.executable, "-m", "deacon_tpu", "index", "build",
         str(tmp_path / "g.fa"), "-o", str(tmp_path / "g.idx"), "-q"],
        check=True, cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    with open(tmp_path / "r.fq", "wb") as f:
        for i in range(200):
            s = rng.choice(B, 150).tobytes()
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, s, b"I" * 150))
    repo = os.path.dirname(os.path.dirname(__file__))
    subprocess.run(
        [sys.executable, "-m", "deacon_tpu", "filter", str(tmp_path / "g.idx"),
         str(tmp_path / "r.fq"), "-o", str(tmp_path / "o.fq.gz"),
         "--deplete", "-q"], check=True, cwd=repo,
    )
    raw = (tmp_path / "o.fq.gz").read_bytes()
    from helpers import BGZF_EOF

    assert raw.endswith(BGZF_EOF)
    assert raw[:4] == b"\x1f\x8b\x08\x04"  # FEXTRA on the first member
    data = gzip.decompress(raw)
    assert data.count(b"@r") == 200
    from deacon_tpu.io.native_loader import open_native_reader

    n = sum(1 for _ in open_native_reader(str(tmp_path / "o.fq.gz")))
    assert n == 200
    env = dict(os.environ)
    env["DEACON_BGZF_OUT"] = "0"
    subprocess.run(
        [sys.executable, "-m", "deacon_tpu", "filter", str(tmp_path / "g.idx"),
         str(tmp_path / "r.fq"), "-o", str(tmp_path / "p.fq.gz"),
         "--deplete", "-q"], check=True, env=env, cwd=repo,
    )
    praw = (tmp_path / "p.fq.gz").read_bytes()
    assert not praw.endswith(BGZF_EOF)
    assert gzip.decompress(praw) == data
