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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def sim_reads(rng, genome: np.ndarray, n: int, platform: str,
              err: float | None = None, keep_clean: bool = False):
    """Yield (name, bytes[, clean_bytes]) reads drawn from `genome` with
    platform errors; half are reverse-complemented (canonical matching must
    be strand symmetric). `err=None` uses the platform default;
    `keep_clean` additionally returns the error-free source read (same
    strand) for forensics."""
    g = len(genome)
    out = []
    for i in range(n):
        if platform == "ill":
            ln = 150
            e = 0.005 if err is None else err
        else:
            ln = int(np.clip(rng.lognormal(8.5, 0.7), 500, 50_000))
            e = 0.05 if err is None else err
        start = int(rng.integers(0, max(1, g - ln)))
        clean = genome[start : start + ln]
        read = mutate_subs(rng, clean, e) if platform == "ill" else mutate_ont(rng, clean, e)
        if rng.random() < 0.5:
            read = revcomp(read)
            clean = revcomp(clean)
        if keep_clean:
            out.append((f"{platform}{i}", read.tobytes(), clean.tobytes()))
        else:
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


def load_fasta_seqs(path: str) -> list[np.ndarray]:
    """All sequences of a (plain) FASTA as uint8 arrays."""
    seqs, cur = [], []
    with open(path, "rb") as f:
        for line in f:
            if line.startswith(b">"):
                if cur:
                    seqs.append(np.frombuffer(b"".join(cur), np.uint8))
                    cur = []
            else:
                cur.append(line.rstrip(b"\n"))
    if cur:
        seqs.append(np.frombuffer(b"".join(cur), np.uint8))
    return seqs


def distinct_hits(idx, seq: bytes, k: int, w: int) -> tuple[int, int]:
    """(distinct index hits, total minimizers) via the filter-side
    extraction — the exact quantities the engine thresholds on."""
    import deacon_tpu as dt

    h, _pos, _eff = dt.get_minimizer_hashes_and_positions(seq, 0, k, w)
    if h.size == 0:
        return 0, 0
    uniq = np.unique(h)
    return int(idx.contains(uniq).sum()), int(h.size)


def forensics(idx, k, w, escaped, abs_threshold=2):
    """Classify escaped host reads: for each, distinct hits of the errored
    read (must be < required — the filter is exact) and of its error-free
    source (>= required proves the simulated errors destroyed the evidence,
    i.e. the miss is information-theoretic, not a scheme weakness)."""
    n_info, n_scheme = 0, 0
    hist = {}
    for name, read, clean in escaped:
        he, te = distinct_hits(idx, read, k, w)
        from deacon_tpu.filter.thresholds import calculate_required_hits

        req = calculate_required_hits(abs_threshold, 0.01, te)
        assert he < req, f"{name}: kept with hits {he} >= required {req}?!"
        hc, tc = distinct_hits(idx, clean, k, w)
        req_c = calculate_required_hits(abs_threshold, 0.01, tc)
        if hc >= req_c:
            n_info += 1  # clean source matches: errors caused the miss
        else:
            n_scheme += 1  # clean source itself below threshold
        hist[he] = hist.get(he, 0) + 1
    return n_info, n_scheme, hist


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome-mbp", type=float, default=20.0)
    ap.add_argument("--reads", type=int, default=20_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--keep", action="store_true", help="keep temp dir")
    ap.add_argument("--host-fasta", default=None,
                    help="reuse an existing host FASTA instead of simulating "
                         "one (enables genome-scale studies)")
    ap.add_argument("--host-index", default=None,
                    help="reuse a prebuilt index of --host-fasta")
    ap.add_argument("--forensics", action="store_true",
                    help="classify escaped host reads: errors-destroyed-"
                         "evidence vs scheme-miss (loads the index in-process)")
    ap.add_argument("--pangenome", type=int, default=1,
                    help="simulate a pangenome-style index: N divergent "
                         "haplotypes (--divergence SNP rate) of one random "
                         "genome indexed together — the apples-to-apples "
                         "fixture for the reference's panhuman bar, where "
                         "errored reads can still hit neighboring "
                         "haplotypes (r3 VERDICT item 6)")
    ap.add_argument("--divergence", type=float, default=0.02,
                    help="per-base SNP divergence between haplotypes")
    ap.add_argument("--shared-pool", action="store_true",
                    help="with --pangenome: haplotypes draw their SNPs "
                         "from a SHARED population variant pool (each "
                         "site gets an allele frequency ~U(0.05,0.95)) "
                         "instead of independent mutations — real "
                         "pangenomes share common alleles, which is what "
                         "makes indexed redundancy cover a held-out "
                         "individual's variants")
    ap.add_argument("--holdout", action="store_true",
                    help="with --pangenome N: index N haplotypes but draw "
                         "host reads from an ADDITIONAL held-out haplotype "
                         "of the same base genome — the reads-from-a-new-"
                         "individual situation the panhuman bar describes "
                         "(r4 VERDICT item 4); sensitivity then measures "
                         "how pangenome redundancy covers novel variants")
    ap.add_argument("--err-sweep", default=None,
                    help="comma-separated Illumina substitution rates, e.g. "
                         "'0,0.001,0.005,0.01' — prints a sensitivity curve")
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    td = tempfile.mkdtemp(prefix="deacon_acc_")
    if args.host_fasta:
        host_seqs = load_fasta_seqs(args.host_fasta)
        host_fa = args.host_fasta
    else:
        base = rng.choice(BASES, size=int(args.genome_mbp * 1e6)).astype(np.uint8)
        if args.shared_pool:
            # population variant pool: sites at 2x the target divergence,
            # allele frequency ~U(0.05, 0.95) per site; each haplotype
            # (and the held-out individual) carries site v iff coin < f_v
            n_sites = int(len(base) * args.divergence * 2)
            sites = rng.choice(len(base), size=n_sites, replace=False)
            freqs = rng.uniform(0.05, 0.95, n_sites)
            alts = BASES[
                (np.searchsorted(BASES, base[sites])
                 + rng.integers(1, 4, n_sites)) % 4
            ]

            def make_hap():
                take = rng.random(n_sites) < freqs
                h = base.copy()
                h[sites[take]] = alts[take]
                return h

            host_seqs = [make_hap() for _ in range(args.pangenome)]
        else:
            host_seqs = [base]
            for _h in range(args.pangenome - 1):
                host_seqs.append(mutate_subs(rng, base, args.divergence))
        read_source_seqs = host_seqs
        if args.holdout:
            # index the N haplotypes; reads come from a novel individual
            # (one more divergent haplotype, NOT indexed)
            read_source_seqs = [
                make_hap() if args.shared_pool
                else mutate_subs(rng, base, args.divergence)
            ]
        host_fa = f"{td}/host.fa"
        write_fasta(host_fa, {
            f"hap{i}": s.tobytes() for i, s in enumerate(host_seqs)
        })
    other = rng.choice(BASES, size=int(args.genome_mbp * 1e6)).astype(np.uint8)

    cli = [sys.executable, "-m", "deacon_tpu"]
    if args.host_index:
        host_idx = args.host_index
    else:
        host_idx = f"{td}/host.idx"
        subprocess.run(
            cli + ["index", "build", host_fa, "-o", host_idx, "--quiet"],
            check=True,
        )

    idx = None
    if args.forensics:
        import deacon_tpu as dt

        idx = dt.load_index(host_idx)
        k, w = idx.header.kmer_length, idx.header.window_size

    if not args.host_fasta:
        src_seqs = read_source_seqs
    else:
        src_seqs = host_seqs

    def sim_host(n, platform, err=None):
        """Reads spread across the read-source sequences proportionally to
        length (the indexed haplotypes, or the held-out one under
        --holdout). Renamed globally: per-chromosome sim_reads restarts
        its counter, and duplicate read ids would corrupt the kept-set
        accounting."""
        lens = np.array([len(s) for s in src_seqs], dtype=np.float64)
        picks = rng.choice(len(src_seqs), size=n, p=lens / lens.sum())
        out = []
        for ci in range(len(src_seqs)):
            m = int((picks == ci).sum())
            if m:
                out.extend(sim_reads(rng, src_seqs[ci], m, platform,
                                     err=err, keep_clean=True))
        return [(f"{platform}{j}", s, c) for j, (_nm, s, c) in enumerate(out)]

    def run_filter(tag, mixed):
        write_fastq(f"{td}/{tag}.fq", [(n, s) for n, s, *_ in mixed])
        subprocess.run(
            cli + ["filter", host_idx, f"{td}/{tag}.fq", "-o",
                   f"{td}/{tag}.out.fq", "--deplete", "--quiet"],
            check=True,
        )
        return read_ids(f"{td}/{tag}.out.fq")

    for platform, ref_sens, ref_spec in (
        ("ill", 0.9999889, 0.9999883),
        ("ont", 0.9999581, 0.9999559),
    ):
        n = args.reads if platform == "ill" else max(200, args.reads // 10)
        host_reads = sim_host(n, platform)
        other_reads = sim_reads(rng, other, n, platform)
        mixed = host_reads + [(f"x{nm}", s) for nm, s in other_reads]
        kept = run_filter(platform, mixed)
        host_bp = {nm: len(s) for nm, s, _c in host_reads}
        other_bp = {f"x{nm}": len(s) for nm, s in other_reads}
        removed_host_bp = sum(bp for i, bp in host_bp.items() if i not in kept)
        kept_other_bp = sum(bp for i, bp in other_bp.items() if i in kept)
        sens = removed_host_bp / max(1, sum(host_bp.values()))
        spec = kept_other_bp / max(1, sum(other_bp.values()))
        print(json.dumps({
            "metric": f"depletion_sensitivity_bp_{platform}",
            "value": round(sens, 7), "unit": "TPR_bp",
            "vs_baseline": round(sens / ref_sens, 7),
        }))
        print(json.dumps({
            "metric": f"retention_specificity_bp_{platform}",
            "value": round(spec, 7), "unit": "TPR_bp",
            "vs_baseline": round(spec / ref_spec, 7),
        }))
        if args.forensics:
            escaped = [(nm, s, c) for nm, s, c in host_reads if nm in kept]
            n_info, n_scheme, hist = forensics(idx, k, w, escaped)
            print(json.dumps({
                "metric": f"escape_forensics_{platform}",
                "escaped_reads": len(escaped), "host_reads": len(host_reads),
                "errors_destroyed_evidence": n_info,
                "clean_source_below_threshold": n_scheme,
                "escaped_hit_histogram": hist,
            }))

    if args.err_sweep is not None:
        rates = [float(x) for x in args.err_sweep.split(",")]
        n = args.reads
        for rate in rates:
            host_reads = sim_host(n, "ill", err=rate)
            kept = run_filter(f"sweep{rate}", host_reads)
            removed = sum(1 for nm, _s, _c in host_reads if nm not in kept)
            print(json.dumps({
                "metric": "illumina_sensitivity_vs_error_rate",
                "substitution_rate": rate, "reads": n,
                "sensitivity_reads": round(removed / n, 7),
            }))

    if not args.keep:
        import shutil

        shutil.rmtree(td, ignore_errors=True)


if __name__ == "__main__":
    main()
