"""Accuracy benchmark: depletion sensitivity / specificity on simulated reads.

Mirrors the reference's published evaluation (ref: paper/f1a.csv, f1b.csv):
host-depletion **sensitivity** (TPR = fraction of host-derived reads removed
by `filter --deplete`) and **specificity** (fraction of non-host reads
retained), for Illumina-like short reads and ONT-like long reads with
realistic error profiles. Reference bars (panhuman-1, k=31 w=15, -m 2):

    Illumina sensitivity  0.9999889      (paper/f1a.csv:2)
    ONT sensitivity       0.9999581      (paper/f1a.csv:4)
    Illumina specificity  0.9999883 bp   (paper/f1b.csv:4, HG00438)
    ONT specificity       0.9999559 bp   (paper/f1b.csv:9)

This harness simulates from a random genome (no repeats/low-complexity, so
it is a self-consistency check of the pipeline + minimizer scheme, not a
biological replication): host reads are drawn from the indexed genome with
platform-appropriate errors, non-host reads from an independent random
genome. Prints one JSON line per metric.

Usage: python tools/accuracy_bench.py [--genome-mbp 20] [--reads 20000]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

BASES = np.frombuffer(b"ACGT", np.uint8)


def write_fasta(path: str, seqs: dict[str, bytes]) -> None:
    with open(path, "wb") as f:
        for name, s in seqs.items():
            f.write(b">" + name.encode() + b"\n")
            for i in range(0, len(s), 80):
                f.write(s[i : i + 80] + b"\n")


def revcomp(seq: np.ndarray) -> np.ndarray:
    lut = np.zeros(256, np.uint8)
    for a, b in zip(b"ACGT", b"TGCA"):
        lut[a] = b
    return lut[seq[::-1]]


def mutate_subs(rng, read: np.ndarray, rate: float) -> np.ndarray:
    """Substitution errors at `rate` (Illumina-like profile)."""
    n_err = rng.binomial(len(read), rate)
    if n_err == 0:
        return read
    read = read.copy()
    pos = rng.choice(len(read), size=n_err, replace=False)
    # substitute with a uniformly different base
    read[pos] = BASES[(np.searchsorted(BASES, read[pos]) + rng.integers(1, 4, n_err)) % 4]
    return read


def mutate_ont(rng, read: np.ndarray, rate: float) -> np.ndarray:
    """Mixed substitution/insertion/deletion errors (ONT-like profile:
    errors split roughly 40/30/30 sub/ins/del)."""
    out = []
    i = 0
    n = len(read)
    # positions of errors
    n_err = rng.binomial(n, rate)
    if n_err == 0:
        return read
    err_pos = np.sort(rng.choice(n, size=n_err, replace=False))
    kinds = rng.integers(0, 10, n_err)  # 0-3 sub, 4-6 ins, 7-9 del
    prev = 0
    for p, kind in zip(err_pos.tolist(), kinds.tolist()):
        out.append(read[prev:p])
        if kind <= 3:  # substitution
            b = BASES[(int(np.searchsorted(BASES, read[p])) + int(rng.integers(1, 4))) % 4]
            out.append(np.array([b], np.uint8))
            prev = p + 1
        elif kind <= 6:  # insertion before p
            out.append(rng.choice(BASES, size=1))
            prev = p
        else:  # deletion of p
            prev = p + 1
    out.append(read[prev:])
    return np.concatenate(out)


def sim_reads(rng, genome: np.ndarray, n: int, platform: str):
    """Yield (name, bytes) reads drawn from `genome` with platform errors;
    half are reverse-complemented (canonical matching must be strand
    symmetric)."""
    g = len(genome)
    out = []
    for i in range(n):
        if platform == "ill":
            ln = 150
            err = 0.005
        else:
            ln = int(np.clip(rng.lognormal(8.5, 0.7), 500, 50_000))
            err = 0.05
        start = int(rng.integers(0, max(1, g - ln)))
        read = genome[start : start + ln]
        read = mutate_subs(rng, read, err) if platform == "ill" else mutate_ont(rng, read, err)
        if rng.random() < 0.5:
            read = revcomp(read)
        out.append((f"{platform}{i}", read.tobytes()))
    return out


def write_fastq(path: str, reads) -> None:
    with open(path, "wb") as f:
        for name, seq in reads:
            f.write(b"@" + name.encode() + b"\n" + seq + b"\n+\n" + b"I" * len(seq) + b"\n")


def read_ids(path: str) -> set[str]:
    ids = set()
    with open(path, "rb") as f:
        ln = f.readline()
        while ln:
            ids.add(ln[1:].split()[0].decode())
            f.readline()
            f.readline()
            f.readline()
            ln = f.readline()
    return ids


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mbp", type=float, default=20.0)
    ap.add_argument("--reads", type=int, default=20_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--keep", action="store_true", help="keep temp dir")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    td = tempfile.mkdtemp(prefix="deacon_acc_")
    host = rng.choice(BASES, size=int(args.genome_mbp * 1e6)).astype(np.uint8)
    other = rng.choice(BASES, size=int(args.genome_mbp * 1e6)).astype(np.uint8)
    write_fasta(f"{td}/host.fa", {"host1": host.tobytes()})

    cli = [sys.executable, "-m", "deacon_tpu"]
    subprocess.run(
        cli + ["index", "build", f"{td}/host.fa", "-o", f"{td}/host.idx", "--quiet"],
        check=True,
    )

    for platform, ref_sens, ref_spec in (
        ("ill", 0.9999889, 0.9999883),
        ("ont", 0.9999581, 0.9999559),
    ):
        n = args.reads if platform == "ill" else max(200, args.reads // 10)
        host_reads = sim_reads(rng, host, n, platform)
        other_reads = sim_reads(rng, other, n, platform)
        mixed = host_reads + [(f"x{name}", s) for name, s in other_reads]
        write_fastq(f"{td}/{platform}.fq", mixed)
        subprocess.run(
            cli
            + [
                "filter",
                f"{td}/host.idx",
                f"{td}/{platform}.fq",
                "-o",
                f"{td}/{platform}.out.fq",
                "--deplete",
                "--quiet",
            ],
            check=True,
        )
        kept = read_ids(f"{td}/{platform}.out.fq")
        host_bp = {name: len(s) for name, s in host_reads}
        other_bp = {f"x{name}": len(s) for name, s in other_reads}
        removed_host_bp = sum(bp for i, bp in host_bp.items() if i not in kept)
        kept_other_bp = sum(bp for i, bp in other_bp.items() if i in kept)
        sens = removed_host_bp / max(1, sum(host_bp.values()))
        spec = kept_other_bp / max(1, sum(other_bp.values()))
        print(
            json.dumps(
                {
                    "metric": f"depletion_sensitivity_bp_{platform}",
                    "value": round(sens, 7),
                    "unit": "TPR_bp",
                    "vs_baseline": round(sens / ref_sens, 7),
                }
            )
        )
        print(
            json.dumps(
                {
                    "metric": f"retention_specificity_bp_{platform}",
                    "value": round(spec, 7),
                    "unit": "TPR_bp",
                    "vs_baseline": round(spec / ref_spec, 7),
                }
            )
        )
    if not args.keep:
        import shutil

        shutil.rmtree(td, ignore_errors=True)


if __name__ == "__main__":
    main()
