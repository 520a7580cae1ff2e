"""Host feed-ceiling model: measured per-core stage costs -> Gbp/s vs cores.

VERDICT r4 item 3: the ">2 Gbp/s on an 8-core host" claim needs a
reproducible artifact instead of an extrapolation sentence.  This tool

  1. synthesizes a FASTQ (default 200 Mbp, half host-derived half random
     reads) and an index in /dev/shm,
  2. runs the REAL native pipeline (`deacon_tpu filter`) under
     DEACON_NATIVE_PROFILE=1 at -t 1 and -t 2 (all this 2-vCPU box can
     host), capturing per-stage thread-CPU times — thread-CPU is immune
     to hypervisor steal, which on this box swings wall times 2-5x,
  3. converts them to per-core ms/Mbp rates per stage, and
  4. prints the feed-ceiling model for hypothetical C-core hosts:

        wall/Mbp(C) = max( reader_cpu/Mbp,            [serial: chunk hand-off]
                           writer_cpu/Mbp,            [serial: ordered write]
                           worker_cpu/Mbp / (C - 2) ) [parallel pool]

     which is exact for the pipeline's thread architecture (1 reader +
     1 writer + C-2 workers, all stages overlapped) as long as memory
     bandwidth doesn't intervene first.  The measured -t1/-t2 e2e rates
     validate the model's low end on this box.

Usage: python tools/host_feed_model.py [--mbp 200] [--index-m 20] [--gz]
"""

import argparse
import os
import re
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

STAGE_RE = re.compile(
    r"reader: parse=([\d.]+) stall=([\d.]+)\n"
    r"\s*workers: parse=([\d.]+) extract=([\d.]+) probe=([\d.]+) "
    r"format=([\d.]+) compress=([\d.]+) stall=([\d.]+)\n"
    r"\s*writer: emit=([\d.]+) write=([\d.]+) stall=([\d.]+)"
)


def synth(dirp, mbp, index_m, gz):
    rng = np.random.default_rng(0)
    bases = np.frombuffer(b"ACGT", np.uint8)
    glen = 40_000_000
    genome = rng.choice(bases, size=glen).tobytes()
    fa = os.path.join(dirp, "host.fa")
    with open(fa, "wb") as f:
        f.write(b">g1\n")
        f.write(genome)
        f.write(b"\n")
    idx = os.path.join(dirp, "host.idx")
    t0 = time.time()
    subprocess.run(
        [sys.executable, "-m", "deacon_tpu", "index", "build", fa,
         "-o", idx, "-q"],
        check=True,
    )
    print(f"index build: {time.time()-t0:.1f}s", file=sys.stderr)
    # reads: 1 kb, half from the genome (hit-heavy), half random
    n_reads = int(mbp * 1e6) // 1000
    fq = os.path.join(dirp, "reads.fq" + (".gz" if gz else ""))
    qual = b"I" * 1000
    t0 = time.time()
    starts = rng.integers(0, glen - 1000, n_reads)
    rnd = rng.choice(bases, size=(max(1, n_reads // 2), 1000))
    raw = bytearray()
    for i in range(n_reads):
        raw += b"@r%d\n" % i
        if i % 2 == 0:
            s = int(starts[i])
            raw += genome[s:s + 1000]
        else:
            raw += rnd[i // 2].tobytes()
        raw += b"\n+\n" + qual + b"\n"
    if gz:
        from deacon_tpu.io import writers
        w = writers.get_writer(fq, 2)
        w.write(bytes(raw))
        w.finish()
    else:
        with open(fq, "wb") as f:
            f.write(raw)
    print(f"reads synth: {time.time()-t0:.1f}s ({len(raw)/1e6:.0f} MB)",
          file=sys.stderr)
    return idx, fq


def run_one(idx, fq, threads, out):
    env = dict(os.environ)
    env["DEACON_NATIVE_PROFILE"] = "1"
    env["DEACON_CHUNK_PARSE"] = "1"   # production multi-core parse mode
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "deacon_tpu", "filter", idx, fq,
         "-o", out, "--deplete", "-t", str(threads), "-q"],
        env=env, capture_output=True, text=True, check=True,
    )
    wall = time.time() - t0
    m = STAGE_RE.search(r.stderr)
    if not m:
        print(r.stderr[-2000:], file=sys.stderr)
        raise SystemExit("no DEACON_NATIVE_PROFILE block in stderr")
    keys = ("r_parse", "r_stall", "w_parse", "extract", "probe", "format",
            "compress", "w_stall", "emit", "write", "wr_stall")
    return dict(zip(keys, map(float, m.groups()))), wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=200)
    ap.add_argument("--index-m", type=float, default=20)
    ap.add_argument("--gz", action="store_true",
                    help="compressed input (bgzf) instead of plain")
    ap.add_argument("--out-null", action="store_true", default=True)
    args = ap.parse_args()

    dirp = tempfile.mkdtemp(prefix="feed_", dir="/dev/shm")
    idx, fq = synth(dirp, args.mbp, args.index_m, args.gz)
    out = os.path.join(dirp, "out.fq")

    print(f"\n== measured stage thread-CPU (ms) on {os.cpu_count()} vCPUs, "
          f"{args.mbp:.0f} Mbp {'gz' if args.gz else 'plain'} input ==")
    rows = {}
    for t in (1, 2):
        best, best_wall = None, None
        for rep in range(3):
            prof, wall = run_one(idx, fq, t, out)
            if best is None:
                best, best_wall = prof, wall
            else:
                # hypervisor steal on this box inflates individual runs
                # 2-5x (PERFNOTES round-1 caveat): per-stage MINIMUM
                # across reps is the least-contended estimate
                best = {k: min(best[k], prof[k]) for k in best}
                best_wall = min(best_wall, wall)
        prof, wall = best, best_wall
        rows[t] = (prof, wall)
        par = (prof["w_parse"] + prof["extract"] + prof["probe"]
               + prof["format"] + prof["compress"])
        print(f"-t {t}: wall {wall:.2f}s = {args.mbp/1e3/wall:.3f} Gbp/s | "
              f"reader {prof['r_parse']:.0f} | workers(par) {par:.0f} "
              f"[parse {prof['w_parse']:.0f} extract {prof['extract']:.0f} "
              f"probe {prof['probe']:.0f} format {prof['format']:.0f} "
              f"compress {prof['compress']:.0f}] | "
              f"writer {prof['emit'] + prof['write']:.0f}")

    # per-Mbp rates from the -t1 run (least core contention on this
    # 2-vCPU box; -t2 inflates reader thread-CPU ~2x via cache thrash)
    prof, _ = rows[1]
    mbp = args.mbp
    reader = prof["r_parse"] / mbp
    writer = (prof["emit"] + prof["write"]) / mbp
    par = (prof["w_parse"] + prof["extract"] + prof["probe"]
           + prof["format"] + prof["compress"]) / mbp
    print(f"\nper-Mbp thread-CPU (-t1 basis): reader {reader:.3f} ms | "
          f"parallel pool {par:.3f} ms | writer {writer:.3f} ms")

    print("\n== feed-ceiling model: Gbp/s on a C-core host ==")
    print("   wall/Mbp = max(reader, writer, pool/(C-2)); null-output "
          "write cost retained")
    print(f"{'cores':>6} {'bound':>14} {'Gbp/s':>8} {'x4 ranks':>9}")
    for c in (2, 4, 8, 16, 32, 64):
        w_eff = max(1, c - 2)
        per = {"reader(serial)": reader, "writer(serial)": writer,
               "workers": par / w_eff}
        bound = max(per, key=per.get)
        wall_ms = per[bound]
        # pod-data runs R ranks per host = R independent readers/writers;
        # the per-host ceiling multiplies until the pool binds
        r4 = min(4 / max(reader, writer), (c - 8) / par if c > 8 else 0)
        print(f"{c:>6} {bound:>14} {1.0 / wall_ms:>8.2f} "
              f"{max(r4, 0):>9.2f}")
    print("\nNOTES: (1) the reader's chunk scan + arena hand-off is the "
          "serial ceiling — the '>2 Gbp/s/host' figure is reachable only "
          "via pod-data multi-rank (R readers per host, right column at "
          "R=4) or faster cores, NOT by worker count alone; (2) serial-"
          "stage rates assume the measured single-thread rate holds; "
          "memory bandwidth and queue contention beyond 2 cores are "
          "unmeasured on this box — treat big-C rows as the model's "
          "statement, not a measurement.")


if __name__ == "__main__":
    main()
