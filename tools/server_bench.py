"""Client/server loopback throughput benchmark (BASELINE config 5).

Starts a `deacon_tpu server` subprocess on 127.0.0.1, generates synthetic
reads, runs the real `client` CLI against it, and prints one JSON line with
end-to-end client throughput plus single-request decision latencies per
batch size. Records go to PERFNOTES.md ("Client/server loopback" entry).

The reference documents server mode as strictly slower than local filtering
(amortizing index load across many small inputs, ref: README.md:239-242);
this bench quantifies OUR gap on the same machine.

Usage: python tools/server_bench.py [--mbp 100] [--read-len 150]
       [--index-mbp 20] [--device host|jax] [--mesh DxS]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=100.0)
    ap.add_argument("--read-len", type=int, default=150)
    ap.add_argument("--index-mbp", type=float, default=20.0)
    ap.add_argument("--device", default="host")
    ap.add_argument("--mesh", default=None)
    ap.add_argument("--port", type=int, default=None)
    args = ap.parse_args()

    import tempfile

    td = tempfile.mkdtemp(prefix="deacon_srvbench_")
    rng = np.random.default_rng(11)
    bases = np.frombuffer(b"ACGT", np.uint8)
    genome = rng.choice(bases, int(args.index_mbp * 1e6)).astype(np.uint8)
    fa = f"{td}/g.fa"
    with open(fa, "wb") as f:
        f.write(b">g\n" + genome.tobytes() + b"\n")
    idx = f"{td}/g.idx"
    env = dict(os.environ)
    env.setdefault("PYTHONPATH",
                   os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    subprocess.run(
        [sys.executable, "-m", "deacon_tpu", "index", "build", fa, "-o", idx,
         "-q"], env=env, check=True,
    )

    L = args.read_len
    n_reads = int(args.mbp * 1e6 / L)
    reads = f"{td}/r.fq"
    qual = b"I" * L
    g = genome.tobytes()
    with open(reads, "wb") as f:
        starts = rng.integers(0, genome.size - L, size=n_reads)
        for i in range(n_reads):
            if i % 2 == 0:
                seq = g[starts[i] : starts[i] + L]
            else:
                seq = rng.choice(bases, size=L).tobytes()
            f.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, qual))
    total_bp = n_reads * L

    port = args.port or (18000 + os.getpid() % 9000)
    srv_cmd = [sys.executable, "-m", "deacon_tpu", "server", idx,
               "-p", str(port), "--host", "127.0.0.1",
               "--device", args.device]
    if args.mesh:
        srv_cmd += ["--mesh", args.mesh]
    srv = subprocess.Popen(srv_cmd, stdout=subprocess.DEVNULL,
                           stderr=subprocess.DEVNULL, env=env)
    out: dict = {"metric": "client_server_loopback", "unit": "mixed",
                 "read_len": L, "mbp": args.mbp,
                 "index_keys": None, "server_device": args.device,
                 "server_mesh": args.mesh}
    try:
        addr = f"http://127.0.0.1:{port}"
        deadline = time.monotonic() + 300
        while True:
            try:
                urllib.request.urlopen(addr + "/", timeout=2)
                break
            except Exception:
                if srv.poll() is not None or time.monotonic() > deadline:
                    print("server failed to start", file=sys.stderr)
                    return 1
                time.sleep(0.3)

        # per-request decision latency vs batch size (hash-only requests,
        # what the wire actually carries; ref: src/server_common.rs:8-27)
        from deacon_tpu.ops import minimizers_np as mnp

        h, p, _ = mnp.get_minimizer_hashes_and_positions(
            g[: max(L, 1000)], 0, 31, 15
        )
        lat = {}
        for bs in (1, 100, 1000, 10000):
            batch = [[h.tolist(), p.tolist(), []]] * bs
            body = json.dumps({
                "input": batch, "abs_threshold": 2, "rel_threshold": 0.01,
                "deplete": True, "kmer_length": 31, "debug": False,
            }).encode()
            req = urllib.request.Request(
                addr + "/should_output_unpaired", data=body,
                headers={"Content-Type": "application/json"},
            )
            # warm once, then best-of-3
            urllib.request.urlopen(req, timeout=120).read()
            best = None
            for _ in range(3):
                t0 = time.monotonic()
                urllib.request.urlopen(req, timeout=120).read()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            lat[str(bs)] = round(best * 1e3, 2)
        out["request_latency_ms_by_batch"] = lat

        # end-to-end client CLI throughput (compute hashes client-side,
        # POST batches, ordered write; ref: src/remote_filter.rs:697-881)
        t0 = time.monotonic()
        subprocess.run(
            [sys.executable, "-m", "deacon_tpu", "client", addr, reads,
             "-o", "/dev/null", "--deplete", "-q"],
            env=env, check=True,
        )
        wall = time.monotonic() - t0
        out["client_wall_s"] = round(wall, 2)
        out["client_mbp_s"] = round(total_bp / wall / 1e6, 1)
        out["client_reads_s"] = round(n_reads / wall)

        # local-filter comparison on the same input/host
        t0 = time.monotonic()
        subprocess.run(
            [sys.executable, "-m", "deacon_tpu", "filter", idx, reads,
             "-o", "/dev/null", "--deplete", "-q"],
            env=env, check=True,
        )
        wall = time.monotonic() - t0
        out["local_filter_mbp_s"] = round(total_bp / wall / 1e6, 1)
    finally:
        srv.kill()
        srv.wait()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
