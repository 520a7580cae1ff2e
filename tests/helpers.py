"""Shared fixtures/helpers for CLI-level tests (mirrors the inline fixture
style of the reference's tests/filter_tests.rs:8-89)."""

from __future__ import annotations

import gzip
import json
import lzma
import os
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent

RNG = np.random.default_rng(20260817)
_BASES = np.frombuffer(b"ACGT", np.uint8)


def random_dna(n: int, rng=None) -> str:
    r = rng or RNG
    return r.choice(_BASES, size=n).tobytes().decode()


def revcomp(s: str) -> str:
    return s.translate(str.maketrans("ACGTacgt", "TGCAtgca"))[::-1]


# A fixed 60 bp fragment (plays the role of the reference's SC2 fragment,
# tests/filter_tests.rs:43-89) — fwd and revcomp reads of it must both match.
FRAGMENT_60 = (
    "ATGCGTACGTTAGCCTAGGCATCGATCGGATCCTAGGCGTATCGATGGCATGCAAGCTTG"
)


def write_fasta(path, records):
    with open(path, "w") as f:
        for rid, seq in records:
            f.write(f">{rid}\n{seq}\n")


def write_fasta_multiline(path, records, width=20):
    with open(path, "w") as f:
        for rid, seq in records:
            f.write(f">{rid}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + "\n")


def write_fastq(path, records):
    with open(path, "w") as f:
        for rid, seq in records:
            f.write(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n")


def fastq_text(records) -> str:
    return "".join(f"@{rid}\n{seq}\n+\n{'I' * len(seq)}\n" for rid, seq in records)


def run_cli(args, stdin_data=None, cwd=None, expect_ok=True, env_extra=None):
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO)
    env.setdefault("JAX_PLATFORMS", "cpu")
    if env_extra:
        env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, "-m", "deacon_tpu", *[str(a) for a in args]],
        input=stdin_data,
        capture_output=True,
        cwd=cwd or REPO,
        env=env,
    )
    if expect_ok and proc.returncode != 0:
        raise AssertionError(
            f"CLI failed ({proc.returncode}): {args}\n"
            f"stderr:\n{proc.stderr.decode(errors='replace')}"
        )
    return proc


def build_index(fasta_path, idx_path, *extra):
    return run_cli(["index", "build", fasta_path, "-o", idx_path, "-q", *extra])


def read_output(path) -> str:
    p = str(path)
    if p.endswith(".gz"):
        return gzip.open(p, "rt").read()
    if p.endswith(".zst"):
        import zstandard

        return zstandard.ZstdDecompressor().stream_reader(open(p, "rb")).read().decode()
    if p.endswith(".xz"):
        return lzma.open(p, "rt").read()
    return open(p).read()


def fastq_ids(text: str) -> list[str]:
    lines = text.splitlines()
    return [lines[i][1:] for i in range(0, len(lines), 4)]


def fasta_ids(text: str) -> list[str]:
    return [l[1:] for l in text.splitlines() if l.startswith(">")]


def load_summary(path) -> dict:
    with open(path) as f:
        return json.load(f)


# BGZF (blocked gzip, the bgzip/htslib framing) writer for exercising the
# native loader's parallel block decoder. Emits standard-compliant members:
# FEXTRA with a "BC" subfield carrying the member size, plus the canonical
# 28-byte EOF member.
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def bgzf_compress(data: bytes, level: int = 2, block: int = 65280,
                  eof_block: bool = True) -> bytes:
    import io
    import struct
    import zlib

    out = io.BytesIO()
    for i in range(0, len(data), block):
        chunk = data[i : i + block]
        co = zlib.compressobj(level, zlib.DEFLATED, -15)
        comp = co.compress(chunk) + co.flush()
        xtra = b"BC" + struct.pack("<HH", 2, len(comp) + 25)
        out.write(
            struct.pack("<BBBBIBBH", 0x1F, 0x8B, 8, 4, 0, 0, 0xFF, len(xtra))
            + xtra
            + comp
            + struct.pack(
                "<II", zlib.crc32(chunk) & 0xFFFFFFFF, len(chunk) & 0xFFFFFFFF
            )
        )
    if eof_block:
        out.write(BGZF_EOF)
    return out.getvalue()
