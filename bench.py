"""Benchmark: filter-engine throughput, honestly labeled.

Prints ONE JSON line. Fields:
  metric        "filter_throughput_per_chip": REAL measured TPU execution
                time of the fused engine step, taken from the device
                profiler timeline (jax.profiler records actual on-chip op
                durations, and does so even through the tunneled `axon`
                backend — the round-3 discovery that exposed the old
                free-running dispatch rate as a ~1000x over-report and
                redirected the engine design; PERFNOTES "real device
                timeline"). Falls back to
                "filter_throughput_per_chip_dispatch_proxy" only if the
                profiler is unavailable; the proxy also remains as the
                secondary field dispatch_proxy_gbps.
  value/unit    the measured Gbp/s for `metric`.
  device_step_ms  profiler-measured ms per (R, L) engine step.
  vs_baseline   value / 2.0 (reference: >2 Gbp/s uncompressed per host,
                BASELINE.md; reference README.md:14).
  roofline_bound_gbps   (tunnel only) an HBM-bytes bound — NOTE:
                historical. Real-device profiling showed the engine is
                NOT HBM-bound: the arch-5 radix engine is bound by the
                query sort and the probe kernel's VPU elementwise
                volume (PERFNOTES round 4), so the real ceiling sits
                well below this number; kept for the record. Round-3
                v3-architecture model, ~19.4 bytes of
                HBM traffic per base (packed-input select kernel with
                in-VMEM unpack + in-row flag-cumsum emission, cumsum-free
                two-level compaction, slot-level canonical-value
                recomputation from the packed stream) at the w-aware
                budget_frac 1.5*2/(w+1) (= 0.1875 at w=15):
                  kernel read (interleaved packed codes+valid) 0.375
                  kernel write (csum<<16 | wp i32 plane)       4.0
                  compact3 search gathers (~2 cache lines/slot,
                    64 B/slot x 0.1875 slot/base)              4.0 [1]
                  slot value fetch (3 clustered u32 word
                    gathers, ~1.5 lines = 12 B/slot eff.)      2.25
                  budget domain (hash/probe/count sorts,
                    ~52 B/slot x 0.1875 slot/base)             9.75
                [1] earlier rounds' models did not charge search gathers;
                this one does — under the old convention the total would
                be ~15.4 B/base. v2 (round-3 early) modeled 39 B/base
                (dense value planes + unpack stage + dense cumsum,
                budget 0.25); round 2 measured ~70 B/base.
                The dispatch proxy can exceed the bound; a real chip
                cannot.
  e2e           end-to-end numbers measured through the CLI on this host
                (synthetic FASTQ on disk -> parse -> extract/pack ->
                decide -> write): "host_gbps" via the default engine and
                "device_gbps" via --device tpu (full parse->pack->transfer->
                decide->write device path). Wall-clock is net of the
                environment's fixed interpreter startup (measured via
                `python -m deacon_tpu --version`). Disable with
                DEACON_BENCH_E2E=0.

`python bench.py --e2e` prints the e2e measurement as its own JSON line
after the headline line (two lines total).

Env knobs: DEACON_BENCH_INDEX_M (index size in millions, default 410 —
the panhuman-1 scale, r4 VERDICT item 2),
DEACON_BENCH_ROWS / DEACON_BENCH_ROWLEN (tile), DEACON_BENCH_ITERS,
DEACON_BENCH_E2E=0, DEACON_BENCH_E2E_MBP (host e2e input size, default 200).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

# Rough HBM traffic of the fused engine step, bytes per input base (see
# module docstring for the per-stage breakdown) and v5e HBM bandwidth.
HBM_BYTES_PER_BASE = 19.4
V5E_HBM_BYTES_PER_S = 8.19e11


def _wall_runs(cmd, env, tries=2, timeout=900):
    """Wall times of `tries` successful runs (None on failure/timeout).
    The 2-vCPU box's hypervisor noise makes single measurements wobble
    0.22-0.41 Gbp/s (r3 VERDICT weak #7) — callers report the median."""
    runs = []
    for _ in range(tries):
        t0 = time.monotonic()
        try:
            proc = subprocess.run(
                cmd, env=env, stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL, timeout=timeout,
            )
        except subprocess.TimeoutExpired:
            return None
        dt = time.monotonic() - t0
        if proc.returncode != 0:
            return None
        runs.append(dt)
    return runs


def _best_wall(cmd, env, tries=2, timeout=900):
    runs = _wall_runs(cmd, env, tries=tries, timeout=timeout)
    return min(runs) if runs else None


def run_e2e() -> dict:
    """End-to-end CLI measurement on synthetic data (host + device paths)."""
    import tempfile

    rng = np.random.default_rng(7)
    bases = np.frombuffer(b"ACGT", np.uint8)
    out: dict = {}
    with tempfile.TemporaryDirectory(prefix="deacon_bench_") as td:
        genome = rng.choice(bases, size=20_000_000).astype(np.uint8)
        fa = os.path.join(td, "genome.fa")
        with open(fa, "wb") as f:
            f.write(b">chr1\n")
            f.write(genome.tobytes())
            f.write(b"\n")
        env = dict(os.environ)
        env.setdefault("PYTHONPATH", os.path.dirname(os.path.abspath(__file__)))
        idx = os.path.join(td, "genome.idx")
        t0 = time.monotonic()
        subprocess.run(
            [sys.executable, "-m", "deacon_tpu", "index", "build", fa,
             "-o", idx, "-q"],
            env=env, check=True, stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        out["index_build_20mbp_s"] = round(time.monotonic() - t0, 3)

        # ONT-like reads: half sampled from the genome (matching), half random
        total_mbp = float(os.environ.get("DEACON_BENCH_E2E_MBP", "200"))
        read_len = 25_000
        n_reads = int(total_mbp * 1e6 / read_len)
        fq = os.path.join(td, "reads.fq")
        qual = b"I" * read_len
        with open(fq, "wb") as f:
            starts = rng.integers(0, genome.size - read_len, size=n_reads)
            for i in range(n_reads):
                if i % 2 == 0:
                    seq = genome[starts[i] : starts[i] + read_len].tobytes()
                else:
                    seq = rng.choice(bases, size=read_len).tobytes()
                f.write(b"@r%d\n%s\n+\n%s\n" % (i, seq, qual))
        total_bp = n_reads * read_len

        # fixed interpreter/env startup cost (this deployment's sitecustomize
        # imports jax into every python process); e2e rates are net of it
        t0 = time.monotonic()
        subprocess.run(
            [sys.executable, "-m", "deacon_tpu", "--version"], env=env,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        startup = time.monotonic() - t0
        out["startup_overhead_s"] = round(startup, 3)

        base_cmd = [sys.executable, "-m", "deacon_tpu", "filter", idx, fq,
                    "-o", "/dev/null", "--deplete", "-q"]
        # best-of-5, median headline (r3 VERDICT item 9): single runs on
        # this 2-vCPU box wobble ~2x with hypervisor noise
        n_host = int(os.environ.get("DEACON_BENCH_HOST_RUNS", "5"))
        runs = _wall_runs(base_cmd, env, tries=n_host)
        if runs:
            gbps = sorted(
                total_bp / max(w - startup, 1e-6) / 1e9 for w in runs
            )
            med = gbps[len(gbps) // 2]
            out["host_gbps"] = round(med, 4)
            out["host_gbps_runs"] = [round(g, 4) for g in gbps]
            out["host_wall_s"] = round(sorted(runs)[len(runs) // 2], 3)

        # device path on the FULL input: the engine dispatches everything
        # before ONE fused d2h at EOF, so on the tunnel the wall is a fixed
        # erratic "deactivation + journal flush" (17-230 s) regardless of
        # input size (PERFNOTES round-3 measurements: 2 Mbp 195 s, 32 Mbp
        # 117 s, 200 Mbp 58 s) — bigger inputs amortize it
        dev_bp = total_bp
        if os.environ.get("DEACON_BENCH_E2E_DEVICE", "1") != "0":
            dev_cmd = list(base_cmd)
            # warm pre-run on a tiny slice: compiles this index-size
            # bucket's engine program into the persistent cache, so the
            # timed run measures execution, not the (erratic, minutes-long
            # on the tunnel) compile service
            fq_warm = os.path.join(td, "reads_warm.fq")
            with open(fq, "rb") as src, open(fq_warm, "wb") as dst:
                for _ in range(8 * 4):
                    dst.write(src.readline())
            warm_cmd = list(base_cmd)
            warm_cmd[warm_cmd.index(fq)] = fq_warm
            t0 = time.monotonic()
            subprocess.run(
                warm_cmd + ["--device", "tpu"], env=env,
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                timeout=1800,
            )
            out["device_warm_s"] = round(time.monotonic() - t0, 3)
            wall = _best_wall(dev_cmd + ["--device", "tpu"], env, tries=1,
                              timeout=900)
            if wall is not None:
                net = max(wall - startup, 1e-6)
                out["device_gbps"] = round(dev_bp / net / 1e9, 6)
                out["device_wall_s"] = round(wall, 3)
                out["device_bp"] = dev_bp
                try:
                    from deacon_tpu.jaxenv import default_backend_is_tunneled

                    if default_backend_is_tunneled():
                        out["device_note"] = (
                            "tunneled backend: wall is dominated by ONE "
                            "fixed erratic 17-230 s deactivation/journal "
                            "flush (input-size independent; PERFNOTES.md "
                            "round-3 device-path measurements) — real "
                            "hardware pays a small PCIe fetch instead"
                        )
                except Exception:
                    pass
    return out


def main() -> None:
    # Multi-phase protocol: a warm-up subprocess compiles everything into the
    # persistent cache (and runs the materialized oracle gate), an e2e
    # subprocess drives the real CLI, then a FRESH subprocess measures the
    # device step. On the axon backend, any multi-minute compile degrades
    # that process's runtime dispatch for the rest of its life (PERFNOTES.md),
    # so the measurement process must execute only cache-hit compiles.
    phase = os.environ.get("DEACON_BENCH_PHASE")
    if phase is None:
        env = dict(os.environ)
        env["DEACON_BENCH_PHASE"] = "warm"
        env["DEACON_BENCH_ITERS"] = "1"
        print("bench: warm-up phase (compiling into cache)...", file=sys.stderr)
        warm = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            stdout=subprocess.DEVNULL,
        )
        if warm.returncode != 0:
            print("bench: warm-up/validation phase FAILED", file=sys.stderr)
            raise SystemExit(warm.returncode)

        # On-chip regression gate (VERDICT r2 item 7): run the full kernel/
        # pipeline/sharded/CLI validation on the real backend every round so
        # Mosaic regressions can't hide behind the CPU-forced CI suite.
        # The result is recorded as `validated` in the headline JSON.
        validated = None
        if os.environ.get("DEACON_BENCH_VALIDATE", "1") != "0":
            print("bench: on-chip validation (tools/validate_tpu.py)",
                  file=sys.stderr)
            vproc = subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "tools", "validate_tpu.py")],
                env=dict(os.environ), stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL, timeout=3600,
            )
            validated = vproc.returncode == 0
            print(f"bench: on-chip validation "
                  f"{'OK' if validated else 'FAILED'}", file=sys.stderr)

        e2e: dict = {}
        if os.environ.get("DEACON_BENCH_E2E", "1") != "0":
            print("bench: e2e phase (CLI on synthetic data)", file=sys.stderr)
            env = dict(os.environ)
            env["DEACON_BENCH_PHASE"] = "e2e"
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                stdout=subprocess.PIPE,
            )
            if proc.returncode == 0:
                try:
                    e2e = json.loads(proc.stdout.decode().strip().splitlines()[-1])
                except Exception:
                    e2e = {}

        env = dict(os.environ)
        env["DEACON_BENCH_PHASE"] = "measure"
        env["DEACON_BENCH_E2E_JSON"] = json.dumps(e2e)
        if validated is not None:
            env["DEACON_BENCH_VALIDATED"] = "1" if validated else "0"
        print("bench: measurement phase (fresh process, cached programs)",
              file=sys.stderr)
        raise SystemExit(
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
                env=env,
            ).returncode
        )

    if phase == "e2e":
        print(json.dumps(run_e2e()))
        return

    import jax
    import jax.numpy as jnp

    from deacon_tpu.ops import engine as eng
    from deacon_tpu.ops import minimizers_np as mnp

    k, w = 31, 15
    n_index = int(float(os.environ.get("DEACON_BENCH_INDEX_M", "410")) * 1e6)
    R = int(os.environ.get("DEACON_BENCH_ROWS", "1024"))
    L = int(os.environ.get("DEACON_BENCH_ROWLEN", "16384"))
    iters = int(os.environ.get("DEACON_BENCH_ITERS", "200"))

    dev = jax.devices()[0]
    print(f"bench: device={dev}, index={n_index/1e6:.0f}M, tile=({R},{L})",
          file=sys.stderr)

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    rng = np.random.default_rng(1)
    # panhuman-scale random index in the SAME probe representation the CLI
    # uses (arch-5 radix-window by default, then bucketized cuckoo, then
    # sorted planes when forced or too large)
    idx = np.sort(rng.integers(0, 2**64, size=n_index, dtype=np.uint64))
    probe_extra = None
    built = None
    probe_pref = os.environ.get("DEACON_PROBE", "radix")
    if probe_pref == "radix" and eng.engine_arch(k, L, R) == 4:
        from deacon_tpu.ops.radix_probe import build_radix_table

        rt = build_radix_table(idx)
        if rt is not None:
            probe_extra = ("radix", rt.p, rt.k, rt.nplanes, rt.sp)
            max_run = 8
            index_hi = jax.device_put(jnp.asarray(rt.planes), dev)
            index_lo = jax.device_put(
                jnp.asarray(rt.spill) if rt.sp
                else jnp.zeros(1, dtype=jnp.uint32), dev)
            index_nv = jax.device_put(jnp.zeros(1, dtype=jnp.int32), dev)
    if probe_extra is None and probe_pref != "sorted":
        built = eng.build_cuckoo_planes(idx)
    if probe_extra is not None:
        pass
    elif built is not None:
        table, c1, c2, has_sent = built
        probe_extra = (c1, c2, has_sent)
        max_run = 8
        index_hi = jax.device_put(jnp.asarray(table), dev)
        index_lo = jax.device_put(jnp.zeros(1, dtype=jnp.uint32), dev)
        index_nv = jax.device_put(jnp.zeros(1, dtype=jnp.int32), dev)
    else:
        n_pad = 1024
        while n_pad < idx.size:
            n_pad *= 2
        hi, lo, nv, max_run = eng.build_padded_shard_planes(idx, n_pad)
        index_hi = jax.device_put(jnp.asarray(hi), dev)
        index_lo = jax.device_put(jnp.asarray(lo), dev)
        index_nv = jax.device_put(jnp.asarray([nv], dtype=jnp.int32), dev)

    # synthetic long reads: one read per row (ONT-like long read tile)
    bases = np.frombuffer(b"ACGT", np.uint8)

    arch = eng.engine_arch(k, L, R)
    if arch == 4:
        budget = eng.v4_row_budget(L, w, eng.default_budget_frac(w))
    else:
        budget = (int(eng.default_budget_frac(w) * R * L) + 191) // 128 * 128
    mlen = np.full(R, L - k + 1, dtype=np.int32)
    allow_short = np.zeros(R, dtype=bool)
    rid = np.arange(R, dtype=np.int32)
    mate = np.zeros(R, dtype=np.int32)
    cstart = np.zeros(R, dtype=np.int32)
    j_mlen = jnp.asarray(mlen)
    j_short = jnp.asarray(allow_short)
    j_rid = jnp.asarray(rid)
    j_mate = jnp.asarray(mate)
    j_cstart = jnp.asarray(cstart)

    # Pre-pack a rotation of batches (2-bit codes + validity bitmask). In
    # production this packing is the C++ loader's job at memcpy-class speed;
    # this 2-vCPU benchmark host needs ~13 ms/batch in NumPy, which would
    # otherwise hide the device number being measured.
    n_rot = 4
    resident = os.environ.get("DEACON_BENCH_RESIDENT", "1") == "1"
    packed_batches = []
    raw_row0 = None
    for i in range(n_rot):
        rb = rng.choice(bases, size=(R, L)).astype(np.uint8)
        if i == 0:
            raw_row0 = rb[0].copy()
        pc, pv = eng.host_pack_bits(mnp.PACK_CODE[rb], mnp.VALID_BASE[rb])
        pci, pvi = eng.host_interleave_packed(pc, pv)
        if resident:
            # measure chip compute throughput; a production loader overlaps
            # PCIe transfers (the tunneled link here is ~300 MB/s and would
            # otherwise dominate: set DEACON_BENCH_RESIDENT=0 to include it)
            pc = jax.device_put(jnp.asarray(pc), dev)
            pv = jax.device_put(jnp.asarray(pv), dev)
            pci = jax.device_put(jnp.asarray(pci), dev)
            pvi = jax.device_put(jnp.asarray(pvi), dev)
        packed_batches.append((pc, pv, pci, pvi))

    statics = (k, w, budget, R, max_run, True)
    if probe_extra is not None:
        statics = statics + (probe_extra,)
    step = eng.engine_step_fused(statics)

    def launch(i):
        pc, pv, pci, pvi = packed_batches[i % n_rot]
        return step(
            jnp.asarray(pc), jnp.asarray(pv), j_mlen, j_short,
            j_rid, j_mate, j_cstart, index_hi, index_lo, index_nv,
            jnp.asarray(pci), jnp.asarray(pvi),
        )

    from deacon_tpu.jaxenv import default_backend_is_tunneled

    tunneled = default_backend_is_tunneled()

    if phase == "warm":
        # Warm-up process: compile into the persistent cache AND run the
        # correctness gate. The gate materializes a result, which on the
        # axon tunnel permanently degrades THIS process (first d2h costs
        # 17-230 s and switches it into ~100x-slow mode, PERFNOTES.md
        # "cassette" notes) — that's fine here, this process is throwaway;
        # the measurement process stays materialization-free.
        t0 = time.monotonic()
        first = np.asarray(launch(0))
        print(f"bench: warm compile+materialize {time.monotonic()-t0:.1f}s",
              file=sys.stderr)
        oracle_hashes, _pos, _eff = mnp.get_minimizer_hashes_and_positions(
            raw_row0.tobytes(), 0, k, w
        )
        dev_total = int(first[R])  # totals are out[R:2R]
        want_total = int(oracle_hashes.size)
        if dev_total != want_total:
            print(f"bench: VALIDATION FAILED row0 totals {dev_total} != "
                  f"oracle {want_total}", file=sys.stderr)
            raise SystemExit(1)
        print(f"bench: row0 oracle check OK ({want_total} minimizers)",
              file=sys.stderr)
        return

    t0 = time.monotonic()
    launch(0).block_until_ready()
    compile_s = time.monotonic() - t0
    print(f"bench: compile {compile_s:.1f}s", file=sys.stderr)

    def stop_clock(out):
        # Real hardware: the honest stop-clock is the materialized result
        # (executions on one core are ordered, so fetching the final
        # step's output bounds them all; the 8 KB d2h is negligible over
        # PCIe). The axon tunnel is a speculator: its first materialization
        # permanently degrades the process ~100x (a tunnel artifact, not a
        # chip property), so there the free-running dispatch rate is the
        # best available chip-side proxy — with correctness already proven
        # by the warm phase's materialized oracle check. The JSON metric
        # name carries the distinction.
        if tunneled:
            out.block_until_ready()
        else:
            np.asarray(out)

    # Pilot: 3 steps size the main loop to a ~30 s budget, so a degraded
    # session still yields a measurement instead of a timeout.
    t0 = time.monotonic()
    out = None
    for i in range(3):
        out = launch(i)
    stop_clock(out)
    pilot = (time.monotonic() - t0) / 3
    if os.environ.get("DEACON_BENCH_ITERS") is None:
        iters = max(5, min(200, int(30.0 / max(pilot, 1e-6))))
    print(f"bench: pilot {pilot*1e3:.2f} ms/step -> iters={iters}"
          f"{' (tunneled: dispatch-rate proxy)' if tunneled else ''}",
          file=sys.stderr)

    # free-running async dispatch (the engine pipelines across steps)
    t0 = time.monotonic()
    out = None
    for i in range(iters):
        out = launch(i)
    stop_clock(out)
    dt = (time.monotonic() - t0) / iters
    bases_per_step = R * L
    gbps = bases_per_step / dt / 1e9
    print(f"bench: {dt*1e3:.2f} ms/step -> {gbps:.3f} Gbp/s", file=sys.stderr)

    # REAL on-chip step time from the device profiler timeline: the
    # profiler records actual TPU execution even through the tunnel (the
    # round-3 discovery that exposed the dispatch proxy as off by orders
    # of magnitude and redirected the engine design — PERFNOTES "real
    # device timeline"). This is the headline when available.
    real_ms = None
    try:
        import glob as _glob
        import gzip as _gzip
        import tempfile as _tf

        tdir = _tf.mkdtemp(prefix="deacon_bench_prof_")
        jax.profiler.start_trace(tdir)
        nprof = 5
        for i in range(nprof):
            out = launch(i)
        out.block_until_ready()
        jax.profiler.stop_trace()
        tr_files = sorted(
            _glob.glob(os.path.join(tdir, "plugins/profile/*/*.trace.json.gz"))
        )
        with _gzip.open(tr_files[-1]) as f:
            tr = json.load(f)
        ev = tr["traceEvents"] if isinstance(tr, dict) else tr
        pids = {
            e["pid"]: e["args"].get("name")
            for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"
        }
        dev_us = 0.0
        for e in ev:
            if (
                e.get("ph") == "X"
                and str(pids.get(e["pid"], "")).startswith("/device:TPU")
                and str(e.get("name", "")).startswith("jit__engine_step")
            ):
                dev_us += e.get("dur", 0)
        if dev_us > 0:
            real_ms = dev_us / 1e3 / nprof
            print(
                f"bench: profiler device time {real_ms:.2f} ms/step -> "
                f"{bases_per_step / (real_ms / 1e3) / 1e9:.3f} Gbp/s REAL",
                file=sys.stderr,
            )
    except Exception as e:  # profiler unavailable: keep the proxy
        print(f"bench: device profiler unavailable ({e})", file=sys.stderr)

    try:
        e2e = json.loads(os.environ.get("DEACON_BENCH_E2E_JSON", "{}"))
    except Exception:
        e2e = {}

    if real_ms is not None:
        real_gbps = bases_per_step / (real_ms / 1e3) / 1e9
        result = {
            "metric": "filter_throughput_per_chip",
            "value": round(real_gbps, 4),
            "unit": "Gbp/s",
            "vs_baseline": round(real_gbps / 2.0, 4),
            "method": (
                "device-profiler timeline: measured TPU execution time of "
                "the fused engine step (real chip time, works through the "
                "tunnel)"
            ),
            "device_step_ms": round(real_ms, 3),
            "dispatch_proxy_gbps": round(gbps, 2),
            "index_keys": n_index,
        }
    else:
        result = {
            "metric": (
                "filter_throughput_per_chip_dispatch_proxy" if tunneled
                else "filter_throughput_per_chip"
            ),
            "value": round(gbps, 4),
            "unit": "Gbp/s",
            "vs_baseline": round(gbps / 2.0, 4),
        }
    if tunneled:
        # HBM-bytes bound of the measured program on a v5e. NOTE:
        # historical — the arch-5 radix engine is sort/VPU-bound, not
        # HBM-bound (PERFNOTES round 4); kept for the record.
        result["roofline_bound_gbps"] = round(
            V5E_HBM_BYTES_PER_S / HBM_BYTES_PER_BASE / 1e9, 1
        )
    if os.environ.get("DEACON_BENCH_VALIDATED") is not None:
        # sourced from the warm-phase tools/validate_tpu.py run on the real
        # backend (kernels == XLA == oracle; CLI device == oracle)
        result["validated"] = os.environ["DEACON_BENCH_VALIDATED"] == "1"
    if e2e:
        result["e2e"] = e2e
    print(json.dumps(result))
    if "--e2e" in sys.argv and e2e:
        print(json.dumps({"metric": "filter_e2e", "unit": "Gbp/s", **e2e}))


if __name__ == "__main__":
    main()
