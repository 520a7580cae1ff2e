"""CLI-level behavioral tests for `deacon-tpu filter`.

Replicates the reference's integration matrix (tests/filter_tests.rs):
compression formats, deplete, rename, thresholds (incl. 0.0/1.0 edges),
prefix-length, paired/interleaved/single-stdin modes, -O separate outputs,
fwd+revcomp matching, pair-OR, shared-minimizer-counted-once, multiline
FASTA, and the k=41 u128 path.
"""

import numpy as np
import pytest

from helpers import (
    FRAGMENT_60,
    build_index,
    fasta_ids,
    fastq_ids,
    fastq_text,
    load_summary,
    random_dna,
    read_output,
    revcomp,
    run_cli,
    write_fasta,
    write_fasta_multiline,
    write_fastq,
)


@pytest.fixture
def ctx(tmp_path):
    """Standard index over the 60bp fragment + a 500bp random genome."""
    genome = random_dna(500)
    ref = tmp_path / "ref.fa"
    write_fasta(ref, [("frag", FRAGMENT_60), ("genome", genome)])
    idx = tmp_path / "ref.idx"
    build_index(ref, idx)
    return tmp_path, idx, genome


def make_reads(tmp_path, genome, name="reads.fq"):
    """2 matching reads (fwd + revcomp of fragment), 2 random reads."""
    reads = [
        ("match_fwd", FRAGMENT_60),
        ("match_rev", revcomp(FRAGMENT_60)),
        ("random1", random_dna(60)),
        ("random2", random_dna(60)),
    ]
    path = tmp_path / name
    write_fastq(path, reads)
    return path


# ---------------------------------------------------------------------------
# basic search/deplete + fwd/revcomp canonical matching
# ---------------------------------------------------------------------------


def test_search_keeps_matches_and_revcomp(ctx):
    tmp, idx, genome = ctx
    reads = make_reads(tmp, genome)
    out = tmp / "out.fq"
    run_cli(["filter", idx, reads, "-o", out, "-a", "1", "-q", "--device", "numpy"])
    ids = fastq_ids(read_output(out))
    assert ids == ["match_fwd", "match_rev"]


def test_deplete_removes_matches(ctx):
    tmp, idx, genome = ctx
    reads = make_reads(tmp, genome)
    out = tmp / "out.fq"
    run_cli(["filter", idx, reads, "-o", out, "-a", "1", "-d", "-q", "--device", "numpy"])
    ids = fastq_ids(read_output(out))
    assert ids == ["random1", "random2"]


def test_fastq_roundtrip_format(ctx):
    tmp, idx, genome = ctx
    reads = make_reads(tmp, genome)
    out = tmp / "out.fq"
    run_cli(["filter", idx, reads, "-o", out, "-a", "1", "-q", "--device", "numpy"])
    text = read_output(out)
    lines = text.splitlines()
    assert lines[0] == "@match_fwd"
    assert lines[1] == FRAGMENT_60
    assert lines[2] == "+"
    assert lines[3] == "I" * 60


def test_fasta_output_format(ctx):
    tmp, idx, genome = ctx
    fa = tmp / "reads.fa"
    write_fasta(fa, [("m", FRAGMENT_60), ("r", random_dna(60))])
    out = tmp / "out.fa"
    run_cli(["filter", idx, fa, "-o", out, "-a", "1", "-q", "--device", "numpy"])
    assert read_output(out) == f">m\n{FRAGMENT_60}\n"


# ---------------------------------------------------------------------------
# compression formats (ref: tests/filter_tests.rs:92-215)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ext", ["fq", "fq.gz", "fq.zst", "fq.xz"])
def test_compressed_outputs(ctx, ext):
    tmp, idx, genome = ctx
    reads = make_reads(tmp, genome)
    out = tmp / f"out.{ext}"
    run_cli(["filter", idx, reads, "-o", out, "-a", "1", "-q", "--device", "numpy"])
    assert fastq_ids(read_output(out)) == ["match_fwd", "match_rev"]


def test_bgzf_input(ctx):
    """BGZF (bgzip-style blocked gzip) inputs decode through the parallel
    block decoder and filter identically to plain input."""
    from helpers import bgzf_compress

    tmp, idx, genome = ctx
    text = fastq_text(
        [("m", FRAGMENT_60), ("r", random_dna(60)), ("m2", FRAGMENT_60)]
    ).encode()
    path = tmp / "in.fq.gz"
    path.write_bytes(bgzf_compress(text, block=64))
    out = tmp / "out.fq"
    run_cli(["filter", idx, path, "-o", out, "-a", "1", "-q", "--device", "numpy"])
    assert fastq_ids(read_output(out)) == ["m", "m2"]


@pytest.mark.parametrize("ext", ["fq.gz", "fq.zst", "fq.xz"])
def test_compressed_inputs(ctx, ext):
    import gzip as _gzip
    import lzma as _lzma

    tmp, idx, genome = ctx
    text = fastq_text(
        [("m", FRAGMENT_60), ("r", random_dna(60))]
    ).encode()
    path = tmp / f"in.{ext}"
    if ext.endswith(".gz"):
        path.write_bytes(_gzip.compress(text))
    elif ext.endswith(".zst"):
        import zstandard

        path.write_bytes(zstandard.ZstdCompressor().compress(text))
    else:
        path.write_bytes(_lzma.compress(text))
    out = tmp / "out.fq"
    run_cli(["filter", idx, path, "-o", out, "-a", "1", "-q", "--device", "numpy"])
    assert fastq_ids(read_output(out)) == ["m"]


def test_invalid_compression_level(ctx):
    tmp, idx, genome = ctx
    reads = make_reads(tmp, genome)
    proc = run_cli(
        ["filter", idx, reads, "-o", tmp / "x.fq.gz", "--compression-level", "15",
         "-q", "--device", "numpy"],
        expect_ok=False,
    )
    assert proc.returncode != 0
    assert b"Invalid gzip compression level" in proc.stderr


# ---------------------------------------------------------------------------
# rename (ref: tests/filter_tests.rs rename tests)
# ---------------------------------------------------------------------------


def test_rename_sequential(ctx):
    tmp, idx, genome = ctx
    reads = make_reads(tmp, genome)
    out = tmp / "out.fq"
    run_cli(["filter", idx, reads, "-o", out, "-a", "1", "-R", "-q", "--device", "numpy"])
    assert fastq_ids(read_output(out)) == ["1", "2"]


# ---------------------------------------------------------------------------
# thresholds (ref: tests/filter_tests.rs:1082-1130)
# ---------------------------------------------------------------------------


def test_abs_threshold_high_drops(ctx):
    tmp, idx, genome = ctx
    reads = make_reads(tmp, genome)
    out = tmp / "out.fq"
    # 60bp read has only a handful of minimizers; a=50 can't be met
    run_cli(["filter", idx, reads, "-o", out, "-a", "50", "-q", "--device", "numpy"])
    assert fastq_ids(read_output(out)) == []


def test_rel_threshold_one_requires_all(ctx):
    tmp, idx, genome = ctx
    # read = half fragment half random: some but not all minimizers match
    reads = tmp / "reads.fq"
    write_fastq(
        reads,
        [("half", FRAGMENT_60 + random_dna(60)), ("full", FRAGMENT_60)],
    )
    out = tmp / "out.fq"
    run_cli(["filter", idx, reads, "-o", out, "-a", "1", "-r", "1.0", "-q",
             "--device", "numpy"])
    ids = fastq_ids(read_output(out))
    assert "full" in ids and "half" not in ids


def test_rel_threshold_zero_keeps_any_hit(ctx):
    tmp, idx, genome = ctx
    reads = tmp / "reads.fq"
    write_fastq(reads, [("half", FRAGMENT_60 + random_dna(60)), ("rand", random_dna(120))])
    out = tmp / "out.fq"
    run_cli(["filter", idx, reads, "-o", out, "-a", "1", "-r", "0.0", "-q",
             "--device", "numpy"])
    assert fastq_ids(read_output(out)) == ["half"]


# ---------------------------------------------------------------------------
# prefix length
# ---------------------------------------------------------------------------


def test_prefix_length_limits_scan(ctx):
    tmp, idx, genome = ctx
    # match only in the tail; prefix scan of first 60bp misses it
    reads = tmp / "reads.fq"
    write_fastq(reads, [("tailmatch", random_dna(60) + FRAGMENT_60)])
    out = tmp / "out.fq"
    run_cli(["filter", idx, reads, "-o", out, "-a", "1", "-p", "60", "-q",
             "--device", "numpy"])
    assert fastq_ids(read_output(out)) == []
    run_cli(["filter", idx, reads, "-o", out, "-a", "1", "-q", "--device", "numpy"])
    assert fastq_ids(read_output(out)) == ["tailmatch"]


# ---------------------------------------------------------------------------
# stdin/stdout modes
# ---------------------------------------------------------------------------


def test_single_stdin_stdout(ctx):
    tmp, idx, genome = ctx
    data = fastq_text([("m", FRAGMENT_60), ("r", random_dna(60))]).encode()
    proc = run_cli(["filter", idx, "-", "-a", "1", "-q", "--device", "numpy"],
                   stdin_data=data)
    assert fastq_ids(proc.stdout.decode()) == ["m"]


def test_interleaved_stdin_pair_or(ctx):
    """ref: tests/filter_tests.rs:485-527 + pair-OR 660-723."""
    tmp, idx, genome = ctx
    pairs = [
        ("p1/1", FRAGMENT_60), ("p1/2", random_dna(60)),   # mate1 matches -> both out
        ("p2/1", random_dna(60)), ("p2/2", random_dna(60)),  # no match
    ]
    data = fastq_text(pairs).encode()
    proc = run_cli(["filter", idx, "-", "-", "-a", "1", "-q", "--device", "numpy"],
                   stdin_data=data)
    assert fastq_ids(proc.stdout.decode()) == ["p1/1", "p1/2"]
    # deplete: matching pair removed entirely
    proc = run_cli(["filter", idx, "-", "-", "-a", "1", "-d", "-q", "--device", "numpy"],
                   stdin_data=data)
    assert fastq_ids(proc.stdout.decode()) == ["p2/1", "p2/2"]


def test_interleaved_odd_count_errors(ctx):
    tmp, idx, genome = ctx
    data = fastq_text([("a", random_dna(60)), ("b", random_dna(60)),
                       ("c", random_dna(60))]).encode()
    proc = run_cli(["filter", idx, "-", "-", "-q", "--device", "numpy"],
                   stdin_data=data, expect_ok=False)
    assert proc.returncode != 0
    assert b"Uneven number of interleaved" in proc.stderr


# ---------------------------------------------------------------------------
# paired files (ref: tests/filter_tests.rs:726-940)
# ---------------------------------------------------------------------------


def test_paired_files_interleaved_output(ctx):
    tmp, idx, genome = ctx
    r1 = tmp / "r1.fq"
    r2 = tmp / "r2.fq"
    write_fastq(r1, [("p1/1", FRAGMENT_60), ("p2/1", random_dna(60))])
    write_fastq(r2, [("p1/2", random_dna(60)), ("p2/2", random_dna(60))])
    out = tmp / "out.fq"
    run_cli(["filter", idx, r1, r2, "-o", out, "-a", "1", "-q", "--device", "numpy"])
    assert fastq_ids(read_output(out)) == ["p1/1", "p1/2"]


def test_paired_separate_outputs(ctx):
    tmp, idx, genome = ctx
    r1, r2 = tmp / "r1.fq", tmp / "r2.fq"
    write_fastq(r1, [("p1/1", FRAGMENT_60), ("p2/1", random_dna(60))])
    write_fastq(r2, [("p1/2", random_dna(60)), ("p2/2", random_dna(60))])
    o1, o2 = tmp / "o1.fq", tmp / "o2.fq"
    run_cli(["filter", idx, r1, r2, "-o", o1, "-O", o2, "-a", "1", "-q",
             "--device", "numpy"])
    assert fastq_ids(read_output(o1)) == ["p1/1"]
    assert fastq_ids(read_output(o2)) == ["p1/2"]


def test_output2_without_input2_warns(ctx):
    tmp, idx, genome = ctx
    reads = make_reads(tmp, genome)
    proc = run_cli(["filter", idx, reads, "-o", tmp / "o.fq", "-O", tmp / "o2.fq",
                    "-a", "1", "-q", "--device", "numpy"])
    assert b"--output2 will be ignored" in proc.stderr
    assert not (tmp / "o2.fq").exists()


def test_paired_rename(ctx):
    tmp, idx, genome = ctx
    r1, r2 = tmp / "r1.fq", tmp / "r2.fq"
    write_fastq(r1, [("p1/1", FRAGMENT_60), ("p2/1", FRAGMENT_60)])
    write_fastq(r2, [("p1/2", random_dna(60)), ("p2/2", random_dna(60))])
    out = tmp / "out.fq"
    run_cli(["filter", idx, r1, r2, "-o", out, "-a", "1", "-R", "-q",
             "--device", "numpy"])
    assert fastq_ids(read_output(out)) == ["1", "2", "3", "4"]


def test_shared_minimizers_counted_once(tmp_path):
    """A pair with identical sequence in both mates yields pair hit_count 1,
    below a=2, so the pair is retained in deplete mode
    (ref: tests/filter_tests.rs:942-1015)."""
    # Index a sequence whose 60bp yields >=1 minimizer but few distinct ones:
    # use a homopolymer-embedded fragment so all its minimizers share 1 value.
    homopoly = "A" * 60
    ref = tmp_path / "ref.fa"
    write_fasta(ref, [("h", homopoly)])
    idx = tmp_path / "ref.idx"
    build_index(ref, idx)

    r1, r2 = tmp_path / "r1.fq", tmp_path / "r2.fq"
    write_fastq(r1, [("p/1", homopoly)])
    write_fastq(r2, [("p/2", homopoly)])
    out = tmp_path / "out.fq"
    summ = tmp_path / "s.json"
    run_cli(["filter", idx, r1, r2, "-o", out, "-d", "-a", "2", "-s", summ, "-q",
             "--device", "numpy"])
    s = load_summary(summ)
    # hit_count 1 (shared value counted once) < 2 -> kept in deplete mode
    assert s["seqs_out"] == 2 and s["seqs_in"] == 2


# ---------------------------------------------------------------------------
# multiline FASTA (ref: tests/filter_tests.rs:1132-1187)
# ---------------------------------------------------------------------------


def test_multiline_fasta_record_matches(tmp_path):
    genome = random_dna(300)
    ref = tmp_path / "ref.fa"
    write_fasta(ref, [("g", genome)])
    idx = tmp_path / "ref.idx"
    build_index(ref, idx)

    reads = tmp_path / "reads.fa"
    write_fasta_multiline(reads, [("multi", genome[50:250])], width=35)
    out = tmp_path / "out.fa"
    run_cli(["filter", idx, reads, "-o", out, "-a", "1", "-q", "--device", "numpy"])
    text = read_output(out)
    assert fasta_ids(text) == ["multi"]
    # output is written as a single sequence line
    assert text == f">multi\n{genome[50:250]}\n"


# ---------------------------------------------------------------------------
# u128 path (k=41; ref: tests/filter_tests.rs:1253-1296)
# ---------------------------------------------------------------------------


def test_k41_u128_path(tmp_path):
    genome = random_dna(400)
    ref = tmp_path / "ref.fa"
    write_fasta(ref, [("g", genome)])
    idx = tmp_path / "ref.idx"
    build_index(ref, idx, "-k", "41", "-w", "15")

    reads = tmp_path / "reads.fq"
    write_fastq(reads, [("m", genome[100:250]), ("m_rc", revcomp(genome[100:250])),
                        ("r", random_dna(150))])
    out = tmp_path / "out.fq"
    run_cli(["filter", idx, reads, "-o", out, "-a", "1", "-q", "--device", "numpy"])
    assert fastq_ids(read_output(out)) == ["m", "m_rc"]


# ---------------------------------------------------------------------------
# summary JSON (ref: src/filter_common.rs:10-38)
# ---------------------------------------------------------------------------


def test_summary_fields(ctx):
    tmp, idx, genome = ctx
    reads = make_reads(tmp, genome)
    out = tmp / "out.fq"
    summ = tmp / "s.json"
    run_cli(["filter", idx, reads, "-o", out, "-a", "1", "-s", summ, "-q",
             "--device", "numpy"])
    s = load_summary(summ)
    assert s["version"].startswith("deacon-tpu ")
    assert s["index"].endswith("ref.idx")
    assert s["k"] == 31 and s["w"] == 15
    assert s["abs_threshold"] == 1 and s["rel_threshold"] == 0.01
    assert s["seqs_in"] == 4 and s["seqs_out"] == 2 and s["seqs_removed"] == 2
    assert s["bp_in"] == 240 and s["bp_out"] == 120 and s["bp_removed"] == 120
    assert s["seqs_out_proportion"] == 0.5
    assert s["bp_removed_proportion"] == 0.5
    assert s["deplete"] is False and s["rename"] is False
    assert s["input2"] is None and s["output2"] is None
    for key in ("time", "seqs_per_second", "bp_per_second", "prefix_length"):
        assert key in s


def test_debug_output(ctx):
    tmp, idx, genome = ctx
    reads = make_reads(tmp, genome)
    proc = run_cli(["filter", idx, reads, "-o", tmp / "o.fq", "-a", "1", "--debug",
                    "--device", "numpy"])
    err = proc.stderr.decode()
    assert "DEBUG: match_fwd hits=" in err
    assert "keep=true" in err and "keep=false" in err
    # debug implies quiet: no banner
    assert "mode: search" not in err


def test_debug_output_mesh(ctx):
    """--debug on a sharded mesh run (VERDICT r2 item 9): host extraction
    dumps the k-mers while membership probes the device-resident sharded
    planes — debug lines must match the numpy-oracle debug run exactly."""
    tmp, idx, genome = ctx
    reads = make_reads(tmp, genome)

    def debug_lines(extra):
        proc = run_cli(["filter", idx, reads, "-o", tmp / "o.fq", "-a", "1",
                        "--debug", *extra])
        return [l for l in proc.stderr.decode().splitlines()
                if l.startswith("DEBUG:")]

    want = debug_lines(["--device", "numpy"])
    got = debug_lines(["--mesh", "1x2"])
    assert want and got == want


def test_debug_output_pod_data(ctx, monkeypatch):
    """--debug under --mesh pod-data (single rank): previously a hard
    error; per-rank debug lines must match the plain debug run."""
    tmp, idx, genome = ctx
    reads = make_reads(tmp, genome)
    proc = run_cli(["filter", idx, reads, "-o", tmp / "o.fq", "-a", "1",
                    "--debug", "--device", "numpy"])
    want = [l for l in proc.stderr.decode().splitlines()
            if l.startswith("DEBUG:")]
    env = {"DEACON_POD_ENGINE": "sharded"}
    proc = run_cli(["filter", idx, reads, "-o", tmp / "pod.fq", "-a", "1",
                    "--debug", "--mesh", "pod-data"], env_extra=env)
    got = [l for l in proc.stderr.decode().splitlines()
           if l.startswith("DEBUG:")]
    assert want and got == want


def test_empty_input(ctx):
    tmp, idx, genome = ctx
    empty = tmp / "empty.fq"
    empty.write_text("")
    out = tmp / "out.fq"
    summ = tmp / "s.json"
    run_cli(["filter", idx, empty, "-o", out, "-s", summ, "-q", "--device", "numpy"])
    assert read_output(out) == ""
    s = load_summary(summ)
    assert s["seqs_in"] == 0 and s["seqs_out_proportion"] == 0.0


# ---------------------------------------------------------------------------
# engine visibility (native-unavailable warning + active-engine banner line)
# ---------------------------------------------------------------------------


def test_native_unavailable_warning_fires(ctx):
    tmp, idx, genome = ctx
    reads = make_reads(tmp, genome)
    proc = run_cli(
        ["filter", idx, reads, "-o", tmp / "o.fq"],
        env_extra={"DEACON_TPU_NO_NATIVE": "1"},
    )
    err = proc.stderr.decode()
    assert "native acceleration library is unavailable" in err
    assert "Engine: host batch engine (pure-Python oracle extraction)" in err


def test_engine_line_printed_and_suppressed_by_quiet(ctx):
    tmp, idx, genome = ctx
    reads = make_reads(tmp, genome)
    proc = run_cli(["filter", idx, reads, "-o", tmp / "o.fq"])
    assert "Engine: " in proc.stderr.decode()
    proc_q = run_cli(["filter", idx, reads, "-o", tmp / "o2.fq", "-q"])
    assert "Engine: " not in proc_q.stderr.decode()


def test_index_build_warns_without_native(tmp_path):
    ref = tmp_path / "ref.fa"
    write_fasta(ref, [("g", random_dna(400))])
    proc = run_cli(
        ["index", "build", ref, "-o", tmp_path / "x.idx"],
        env_extra={"DEACON_TPU_NO_NATIVE": "1"},
    )
    err = proc.stderr.decode()
    assert "native acceleration library is unavailable" in err
    assert "Engine: host extraction (pure-Python oracle)" in err
