"""Randomized differential test: native C++ pipeline == pure-Python path.

Runs the real CLI twice per scenario — once with the native library, once
with DEACON_TPU_NO_NATIVE=1 (pure-Python parser/extractor/writers, i.e. the
NumPy oracle end to end) — over randomized dirty inputs and flag
combinations, and requires byte-identical outputs and summaries (modulo
timing fields). Breadth complement to the fixed-case parity tests in
test_native_pipeline.py.
"""

import gzip
import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALPHABET = np.frombuffer(b"ACGTACGTacgtNnRYX-", dtype=np.uint8)


def _run(args, env_extra=None, stdin: bytes | None = None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    if env_extra:
        env.update(env_extra)
    return subprocess.run(
        [sys.executable, "-m", "deacon_tpu", *args],
        capture_output=True, env=env, cwd=REPO, input=stdin,
    )


def _write_reads(rng, path, n, genome, fmt, maxlen=400):
    recs = []
    for i in range(n):
        if rng.random() < 0.5 and len(genome) > 50:
            s = int(rng.integers(0, max(1, len(genome) - maxlen)))
            seq = bytes(genome[s : s + int(rng.integers(30, maxlen))])
        else:
            seq = rng.choice(ALPHABET, int(rng.integers(0, maxlen))).astype(np.uint8).tobytes()
        recs.append((f"r{i} extra".encode(), seq))
    with open(path, "wb") as f:
        for rid, seq in recs:
            if fmt == "fastq":
                f.write(b"@" + rid + b"\n" + seq + b"\n+\n" + b"I" * len(seq) + b"\n")
            else:
                f.write(b">" + rid + b"\n")
                for j in range(0, max(len(seq), 1), 61):
                    f.write(seq[j : j + 61] + b"\n")
    return recs


def _maybe_compress_input(rng, path):
    """Randomly re-encode an input file as plain / gz / BGZF / zst, exercising
    the native serial, decode-ahead, and parallel-BGZF input paths against the
    pure-Python decoder."""
    choice = str(rng.choice(["plain", "gz", "bgzf", "zst"],
                            p=[0.4, 0.2, 0.25, 0.15]))
    if choice == "plain":
        return path
    data = open(path, "rb").read()
    if choice == "gz":
        out = str(path) + ".gz"
        with open(out, "wb") as f:
            f.write(gzip.compress(data, 2))
    elif choice == "bgzf":
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from helpers import bgzf_compress

        out = str(path) + ".gz"
        block = int(rng.choice([512, 4096, 65280]))
        with open(out, "wb") as f:
            f.write(bgzf_compress(data, block=block,
                                  eof_block=bool(rng.random() < 0.8)))
    else:
        import zstandard

        out = str(path) + ".zst"
        with open(out, "wb") as f:
            f.write(zstandard.ZstdCompressor().compress(data))
    return out


def _summary_key(path):
    s = json.loads(open(path).read())
    for k in ("time", "seqs_per_second", "bp_per_second", "version"):
        s.pop(k, None)
    return s


@pytest.mark.parametrize("seed", [1, 2, 3, 4])
def test_native_vs_python_differential(tmp_path, seed):
    rng = np.random.default_rng(seed)
    k = int(rng.choice([31, 21, 41, 15]))
    w = int(rng.choice([15, 11, 7]))
    if (k + w - 1) % 2 == 0:
        w += 1
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), 20_000).astype(np.uint8)
    gpath = tmp_path / "g.fa"
    with open(gpath, "wb") as f:
        f.write(b">g\n" + genome.tobytes() + b"\n")
    idx = tmp_path / "g.idx"
    r = _run(["index", "build", str(gpath), "-o", str(idx), "-k", str(k), "-w", str(w), "--quiet"])
    assert r.returncode == 0, r.stderr.decode()
    # index build parity too
    idx2 = tmp_path / "g2.idx"
    r = _run(
        ["index", "build", str(gpath), "-o", str(idx2), "-k", str(k), "-w", str(w), "--quiet"],
        env_extra={"DEACON_TPU_NO_NATIVE": "1"},
    )
    assert r.returncode == 0, r.stderr.decode()
    assert idx.read_bytes() == idx2.read_bytes()

    fmt = "fastq" if rng.random() < 0.7 else "fasta"
    mode = str(rng.choice(["single", "paired", "interleaved"], p=[0.4, 0.4, 0.2]))
    stdin = None
    reads1 = tmp_path / "r1.fq"
    _write_reads(rng, reads1, 40, genome, fmt)
    if mode == "interleaved":
        reads2 = tmp_path / "r2.fq"
        _write_reads(rng, reads2, 40, genome, fmt)
        # interleave the two mate files record-by-record onto stdin
        def _records(p):
            raw = open(p, "rb").read().split(b"\n")
            per = 4 if fmt == "fastq" else None
            if per:
                return [b"\n".join(raw[i : i + 4]) + b"\n" for i in range(0, len(raw) - 1, 4)]
            recs, cur = [], []
            for line in raw:
                if line.startswith(b">") and cur:
                    recs.append(b"\n".join(cur) + b"\n")
                    cur = []
                if line:
                    cur.append(line)
            if cur:
                recs.append(b"\n".join(cur) + b"\n")
            return recs
        stdin = b"".join(
            r1 + r2 for r1, r2 in zip(_records(reads1), _records(reads2))
        )
        args = ["filter", str(idx), "-", "-"]
    else:
        args = ["filter", str(idx), str(_maybe_compress_input(rng, reads1))]
        if mode == "paired":
            reads2 = tmp_path / "r2.fq"
            _write_reads(rng, reads2, 40, genome, fmt)
            args.append(str(_maybe_compress_input(rng, reads2)))
    paired = mode != "single"
    ext = str(rng.choice(["", ".gz", ".zst", ".xz"], p=[0.4, 0.3, 0.15, 0.15]))
    out_a = tmp_path / f"a.out{ext}"
    out_b = tmp_path / f"b.out{ext}"
    flags = []
    if rng.random() < 0.5:
        flags.append("--deplete")
    if rng.random() < 0.3:
        flags.append("--rename")
    flags += ["-a", str(int(rng.integers(1, 4)))]
    flags += ["-r", str(float(rng.choice([0.0, 0.01, 0.3, 1.0])))]
    if rng.random() < 0.3:
        flags += ["-p", str(int(rng.integers(10, 200)))]
    if paired and rng.random() < 0.5:
        flags += ["-O", str(tmp_path / f"a2.out{ext}")]
    sum_a, sum_b = tmp_path / "sa.json", tmp_path / "sb.json"

    ra = _run(args + ["-o", str(out_a), "-s", str(sum_a), "--quiet"] + flags,
              stdin=stdin)
    assert ra.returncode == 0, ra.stderr.decode()
    argb = [a.replace("a2.out", "b2.out") if isinstance(a, str) else a for a in flags]
    rb = _run(
        args + ["-o", str(out_b), "-s", str(sum_b), "--quiet"] + argb,
        env_extra={"DEACON_TPU_NO_NATIVE": "1"},
        stdin=stdin,
    )
    assert rb.returncode == 0, rb.stderr.decode()

    def content(p):
        data = open(p, "rb").read()
        p = str(p)
        if p.endswith(".gz"):
            return gzip.decompress(data)
        if p.endswith(".zst"):
            import io as _io

            import zstandard

            # read_across_frames: workers emit one frame per batch
            return zstandard.ZstdDecompressor().stream_reader(
                _io.BytesIO(data), read_across_frames=True
            ).read()
        if p.endswith(".xz"):
            import lzma

            return lzma.decompress(data)
        return data

    assert content(out_a) == content(out_b)
    if ("-O" in flags):
        assert content(tmp_path / f"a2.out{ext}") == content(tmp_path / f"b2.out{ext}")
    sa, sb = _summary_key(sum_a), _summary_key(sum_b)
    for key in ("output", "output2"):
        sa.pop(key, None)
        sb.pop(key, None)
    assert sa == sb

    # chunk-parallel parsing (forced: the adaptive default disables it on
    # narrow CI boxes) must match byte-for-byte on single-end inputs —
    # both with the default chunk size (single-chunk happy path on these
    # fixtures) and with a tiny chunk size that forces dozens of chunk
    # boundaries, carry accumulation, and the EOF-tail handoff
    if mode == "single":
        for chunk_env in ({}, {"DEACON_CHUNK_BYTES": "512"}):
            out_c = tmp_path / f"c.out{ext}"
            rc = _run(
                args + ["-o", str(out_c), "--quiet"] + flags,
                env_extra={"DEACON_CHUNK_PARSE": "1", **chunk_env},
                stdin=stdin,
            )
            assert rc.returncode == 0, rc.stderr.decode()
            assert content(out_c) == content(out_a), chunk_env


@pytest.mark.parametrize("anomaly", ["crlf", "blank", "no_trailing_nl",
                                     "giant_record"])
def test_chunk_parse_bail_paths(tmp_path, anomaly):
    """Anomalies past the first chunk must bail to the serial reader with
    identical output; records larger than the chunk must accumulate."""
    rng = np.random.default_rng(hash(anomaly) % 2**32)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome = rng.choice(bases, 30_000).astype(np.uint8)
    gpath = tmp_path / "g.fa"
    gpath.write_bytes(b">g\n" + genome.tobytes() + b"\n")
    idx = tmp_path / "g.idx"
    r = _run(["index", "build", str(gpath), "-o", str(idx), "--quiet"])
    assert r.returncode == 0, r.stderr.decode()

    recs = []
    for i in range(60):
        L = int(rng.integers(50, 300))
        seq = (genome[int(rng.integers(0, genome.size - L)):][:L]
               if i % 2 == 0 else rng.choice(bases, size=L)).tobytes()
        recs.append(b"@q%d\n" % i + seq + b"\n+\n" + b"F" * len(seq) + b"\n")
    data = b"".join(recs)
    if anomaly == "crlf":  # CRLF starts midway through the stream
        half = len(data) // 2
        cutp = data.rfind(b"\n@", 0, half) + 1
        data = data[:cutp] + data[cutp:].replace(b"\n", b"\r\n")
    elif anomaly == "blank":
        cutp = data.rfind(b"\n@", 0, len(data) // 2) + 1
        data = data[:cutp] + b"\n\n" + data[cutp:]
    elif anomaly == "no_trailing_nl":
        data = data[:-1]
    else:  # giant_record: one sequence much larger than the chunk size
        big = rng.choice(bases, 20_000).tobytes()
        data = (b"@big\n" + big + b"\n+\n" + b"E" * len(big) + b"\n") + data
    reads = tmp_path / "r.fq"
    reads.write_bytes(data)

    outs = []
    for env in ({"DEACON_CHUNK_PARSE": "1", "DEACON_CHUNK_BYTES": "1024"},
                {"DEACON_CHUNK_PARSE": "0"}):
        out = tmp_path / "o.fq"
        r = _run(["filter", str(idx), str(reads), "-o", str(out), "-d",
                  "--quiet"], env_extra=env)
        assert r.returncode == 0, (anomaly, env, r.stderr.decode())
        outs.append(out.read_bytes())
    assert outs[0] == outs[1], anomaly


def test_chunk_parse_interleaved_parity(tmp_path):
    """Interleaved FASTQ chunks split at 8-newline phase; outputs and the
    odd-count error (with its record count spanning the chunked->serial
    handoff) must match the serial reader exactly."""
    rng = np.random.default_rng(54)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome = rng.choice(bases, 20_000).astype(np.uint8)
    (tmp_path / "g.fa").write_bytes(b">g\n" + genome.tobytes() + b"\n")
    idx = tmp_path / "g.idx"
    r = _run(["index", "build", str(tmp_path / "g.fa"), "-o", str(idx),
              "--quiet"])
    assert r.returncode == 0
    recs = []
    for i in range(200):
        L = int(rng.integers(60, 500))
        seq = (genome[int(rng.integers(0, genome.size - L)):][:L]
               if i % 3 == 0 else rng.choice(bases, size=L)).tobytes()
        recs.append(b"@p%d/%d\n" % (i // 2, i % 2 + 1) + seq + b"\n+\n" +
                    b"I" * len(seq) + b"\n")
    inter = b"".join(recs)

    def run(env, data):
        r = _run(["filter", str(idx), "-", "-", "-o",
                  str(tmp_path / "o.fq"), "-d", "--quiet"],
                 env_extra=env, stdin=data)
        if r.returncode == 0:
            return 0, (tmp_path / "o.fq").read_bytes()
        # stderr may carry timestamped environment warnings; compare the
        # actual error line only
        return r.returncode, r.stderr.strip().splitlines()[-1]

    chunked = {"DEACON_CHUNK_PARSE": "1", "DEACON_CHUNK_BYTES": "1024"}
    assert run(chunked, inter) == run({"DEACON_CHUNK_PARSE": "0"}, inter)
    odd = inter + recs[0]
    a, b = run(chunked, odd), run({"DEACON_CHUNK_PARSE": "0"}, odd)
    assert a[0] != 0 and a == b
    assert b"Found 201 records" in a[1]
