"""Local filter engine: streaming batch pipeline over FASTX input.

Orchestration mirrors the reference engines' semantics (banner, index load,
three input modes, per-batch decide + ordered write, stats, summary; ref:
src/local_filter.rs:575-824, src/remote_filter.rs:431-693) with a batched
architecture designed for device offload: records are read in batches,
minimizers extracted for the whole batch (NumPy host path or the JAX/Pallas
device path), membership decided for the whole batch, then written in order.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from ..config import FilterConfig
from ..constants import TOOL_NAME, VERSION
from ..index.store import load_index
from ..io.fastx import FastxReader, Record, read_batch
from ..io.writers import FastxWriter, format_record, get_writer
from ..ops import host_extract
from .backend import LocalBackend
from .progress import FilterStats, Spinner
from .summary import build_summary, write_summary


def _eprint(*args) -> None:
    print(*args, file=sys.stderr)


def _fmt_duration(seconds: float) -> str:
    if seconds < 1.0:
        return f"{seconds * 1000:.2f}ms"
    if seconds < 60.0:
        return f"{seconds:.2f}s"
    m, s = divmod(seconds, 60.0)
    return f"{int(m)}m {s:.2f}s"


def _rust_bool(b: bool) -> str:
    return "true" if b else "false"


class HostDecider:
    """Host extraction (C++ engine, NumPy-oracle fallback) + sorted-array
    probe; supports debug k-mers."""

    def __init__(self, backend, k: int, w: int):
        self.backend = backend
        self.k, self.w = k, w

    def decide_unpaired(self, seqs, prefix_length, cfg: FilterConfig):
        ext = host_extract.extract_filter_batch(seqs, prefix_length, self.k, self.w)
        return self.backend.decide_unpaired(
            ext, self.k, cfg.abs_threshold, cfg.rel_threshold, cfg.deplete, cfg.debug
        )

    def decide_paired(self, pairs, prefix_length, cfg: FilterConfig):
        flat: list[bytes] = []
        for s1, s2 in pairs:
            flat.append(s1)
            flat.append(s2)
        per = host_extract.extract_filter_batch(flat, prefix_length, self.k, self.w)
        ext = []
        for i in range(0, len(per), 2):
            (h1, p1, e1), (h2, p2, e2) = per[i], per[i + 1]
            ext.append((
                np.concatenate([h1, h2]),
                np.concatenate([p1, p2]),
                (e1, e2),
            ))
        return self.backend.decide_paired(
            ext, self.k, cfg.abs_threshold, cfg.rel_threshold, cfg.deplete, cfg.debug
        )

    # synchronous backends: launch == compute now
    def launch_unpaired(self, seqs, prefix_length, cfg):
        result = self.decide_unpaired(seqs, prefix_length, cfg)
        return lambda: result

    def launch_paired(self, pairs, prefix_length, cfg):
        result = self.decide_paired(pairs, prefix_length, cfg)
        return lambda: result


class RemoteDecider(HostDecider):
    """HostDecider whose launches run extract+POST on a small thread pool,
    overlapping client-side extraction and write-back with in-flight HTTP
    requests (and with the server's decision work — a separate process).
    The engine loop's resolve deque preserves output order. The reference
    client is strictly sequential here (src/remote_filter.rs:731-792);
    this is the TPU-era extension measured in tools/server_bench.py."""

    def __init__(self, backend, k: int, w: int):
        import concurrent.futures
        import os

        super().__init__(backend, k, w)
        workers = max(1, int(os.environ.get("DEACON_CLIENT_INFLIGHT", "3")))
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=workers
        )
        self.resolve_depth = workers

    def launch_unpaired(self, seqs, prefix_length, cfg):
        fut = self._pool.submit(
            self.decide_unpaired, seqs, prefix_length, cfg
        )
        return fut.result

    def launch_paired(self, pairs, prefix_length, cfg):
        fut = self._pool.submit(self.decide_paired, pairs, prefix_length, cfg)
        return fut.result


def _decisions_from_counts(hits, totals, cfg: FilterConfig):
    """Vectorized (keep, hits, total, kmers=[]) decisions from device counts
    (shared by the device and sharded deciders)."""
    from .thresholds import keep_mask_batch

    keep = keep_mask_batch(
        hits, totals, cfg.abs_threshold, cfg.rel_threshold, cfg.deplete
    )
    return [
        (bool(kp), int(h), int(t), [])
        for kp, h, t in zip(keep, hits, totals)
    ]


class DeviceDecider:
    """Fused on-device extract+probe+count (deacon_tpu/ops/engine.py).

    Falls back to the host decider per batch on budget overflow (adversarial
    minimizer density or monster contigs).

    ``resolve_depth`` tells the engine loop how many launched batches to
    keep in flight before resolving the oldest: all their outputs then
    materialize in ONE fused d2h (ops/engine.py FetchGroup). Deep pipelines
    matter doubly on the tunneled axon backend, where the FIRST
    materialization permanently degrades per-dispatch speed (PERFNOTES.md
    cassette notes) — everything dispatched before it executes at full rate
    during the journal flush.
    """

    def __init__(self, index, k: int, w: int, device: str,
                 fallback: HostDecider, index_path=None):
        import os

        import jax

        from ..ops.engine import BudgetOverflow, DevicePipeline

        self._overflow = BudgetOverflow
        dev = None
        if device in ("tpu", "cpu"):
            dev = jax.devices(device)[0]
        self.pipe = DevicePipeline(
            index.hashes, k, w, device=dev, cache_path=index_path
        )
        self.fallback = fallback
        self.resolve_depth = int(os.environ.get("DEACON_RESOLVE_DEPTH", "64"))

    def _decide(self, hits, totals, cfg: FilterConfig):
        return _decisions_from_counts(hits, totals, cfg)

    def decide_unpaired(self, seqs, prefix_length, cfg: FilterConfig):
        return self.launch_unpaired(seqs, prefix_length, cfg)()

    def decide_paired(self, pairs, prefix_length, cfg: FilterConfig):
        return self.launch_paired(pairs, prefix_length, cfg)()

    # async launch: device work stays in flight until the closure is called,
    # so the engine overlaps parse/format/write with device compute
    def launch_unpaired(self, seqs, prefix_length, cfg: FilterConfig):
        try:
            resolve = self.pipe.launch_single(seqs, prefix_length)
        except self._overflow:
            return self.fallback.launch_unpaired(seqs, prefix_length, cfg)

        def done():
            try:
                hits, totals = resolve()
            except self._overflow:
                return self.fallback.decide_unpaired(seqs, prefix_length, cfg)
            return self._decide(hits, totals, cfg)

        return done

    def launch_paired(self, pairs, prefix_length, cfg: FilterConfig):
        try:
            resolve = self.pipe.launch_paired(pairs, prefix_length)
        except self._overflow:
            return self.fallback.launch_paired(pairs, prefix_length, cfg)

        def done():
            try:
                hits, totals = resolve()
            except self._overflow:
                return self.fallback.decide_paired(pairs, prefix_length, cfg)
            return self._decide(hits, totals, cfg)

        return done


class ShardedDecider:
    """Multi-chip decider: rows data-parallel, index range-sharded across the
    mesh's shard axis, per-shard membership psum-merged (SURVEY §2.3;
    parallel/sharded.py). Falls back to the host decider on overflow.

    mesh_spec "pod": jax.distributed pod mode — the index is stream-decoded
    per value-range shard straight from the file (each host holds only its
    slice; parallel/multihost.py), shards run across hosts, and every rank
    must be fed the same input (outputs replicate across ranks).

    mesh_spec "pod-data": jax.distributed data-parallel mode — each rank
    runs this decider over a RANK-LOCAL mesh (index sharded across local
    devices only; no cross-host collectives in the hot loop) and is fed a
    disjoint byte range of the input by filter/pod_data.py, so aggregate
    reads/s scales with hosts.

    mesh_spec "pod-2d": the combined mode — ranks form groups of
    DEACON_POD_SHARDS processes; the index shards across the hosts WITHIN
    this rank's group (memory scales with shards) while each group is fed
    its own byte range by filter/pod_data.py (reads/s scales with groups).
    """

    def __init__(self, index, k: int, w: int, mesh_spec: str, fallback,
                 index_path=None):
        from ..parallel.multihost import (
            make_local_pipeline_from_file,
            make_pod2d_pipeline_from_file,
            make_pod_pipeline_from_file,
            maybe_init_distributed,
        )

        # must run before the sharded/engine import chain touches jax
        maybe_init_distributed()
        from ..parallel.sharded import ShardedPipeline, make_mesh, parse_mesh_spec
        if mesh_spec == "pod":
            self.pipe = make_pod_pipeline_from_file(str(index_path))
        elif mesh_spec == "pod-2d":
            self.pipe = make_pod2d_pipeline_from_file(str(index_path))
        elif mesh_spec == "pod-data":
            self.pipe = make_local_pipeline_from_file(str(index_path))
        else:
            n_data, n_shard = parse_mesh_spec(mesh_spec)
            self.pipe = ShardedPipeline(
                index.hashes, k, w, make_mesh(n_data, n_shard)
            )
        self.fallback = fallback
        import os

        from ..ops.engine import BudgetOverflow

        self._overflow = BudgetOverflow
        self.resolve_depth = int(os.environ.get("DEACON_RESOLVE_DEPTH", "64"))

    def _decide(self, hits, totals, cfg: FilterConfig):
        return _decisions_from_counts(hits, totals, cfg)

    _MAX_ROWS_PER_SHARD = 8192  # ~67 Mbp/unit at the default row length

    def _counts_with_regrow(self, fn_name, units, prefix_length):
        """Run a counts call, growing the batch geometry on overflow.

        Chromosome-scale records can need more rows than the current Rs;
        without a host fallback (pod mode) the exact recovery is to
        recompile the step at doubled rows-per-shard — the device-resident
        index planes are shared, so a regrow costs one compile, and all
        jax.distributed ranks hit the same deterministic overflow together.
        """
        while True:
            try:
                return getattr(self.pipe, fn_name)(units, prefix_length)
            except self._overflow:
                if self.pipe.Rs >= self._MAX_ROWS_PER_SHARD:
                    raise
                self.pipe = self.pipe.regeometry(
                    rows_per_shard=self.pipe.Rs * 2
                )

    def decide_unpaired(self, seqs, prefix_length, cfg: FilterConfig):
        return self.launch_unpaired(seqs, prefix_length, cfg)()

    def decide_paired(self, pairs, prefix_length, cfg: FilterConfig):
        return self.launch_paired(pairs, prefix_length, cfg)()

    # async launch: every global batch is packed + dispatched up front and
    # stays in flight until the closure is called, giving the sharded path
    # the same read/compute/write overlap as DeviceDecider
    def launch_unpaired(self, seqs, prefix_length, cfg):
        return self._launch(
            "launch_single", "counts_single", list(seqs), prefix_length, cfg,
            "launch_unpaired", "decide_unpaired",
        )

    def launch_paired(self, pairs, prefix_length, cfg):
        return self._launch(
            "launch_paired", "counts_paired", list(pairs), prefix_length, cfg,
            "launch_paired", "decide_paired",
        )

    def _launch(self, launch_name, counts_name, units, prefix_length, cfg,
                fb_launch, fb_decide):
        while True:
            try:
                resolve = getattr(self.pipe, launch_name)(units, prefix_length)
                break
            except self._overflow:
                # a unit wider than Rs rows: detected before dispatch
                if self.pipe.Rs >= self._MAX_ROWS_PER_SHARD:
                    if self.fallback is None:
                        raise
                    return getattr(self.fallback, fb_launch)(
                        units, prefix_length, cfg
                    )
                self.pipe = self.pipe.regeometry(rows_per_shard=self.pipe.Rs * 2)

        def done():
            try:
                hits, totals = resolve()
            except self._overflow:
                # device-side minimizer budget exceeded: regrow (which also
                # raises the budget) and rerun this batch synchronously
                if self.pipe.Rs < self._MAX_ROWS_PER_SHARD:
                    self.pipe = self.pipe.regeometry(
                        rows_per_shard=self.pipe.Rs * 2
                    )
                try:
                    hits, totals = self._counts_with_regrow(
                        counts_name, units, prefix_length
                    )
                except self._overflow:
                    if self.fallback is None:
                        raise
                    return getattr(self.fallback, fb_decide)(
                        units, prefix_length, cfg
                    )
            return self._decide(hits, totals, cfg)

        return done


def make_decider(index, backend, k: int, w: int, cfg: FilterConfig):
    """Pick the decision pipeline: device engine unless debug/numpy/remote.

    With device="auto", small jobs (small index AND small input file) stay on
    the host path — JAX import + first-compile overhead would dominate. A
    tunneled accelerator (the experimental `axon` remote-TPU platform) is
    also skipped: its per-batch result materializations run ~100x below chip
    speed (PERFNOTES.md "cassette" notes), so the C++ host engine is
    strictly faster end-to-end there. Force with --device tpu.

    Note the earlier sidecar fast path in run(): with device="auto" a valid
    `<index>.probe` routes straight to the native host pipeline WITHOUT
    consulting this policy — a warm one-shot CLI run on the host engine
    beats the device engine's import+compile+transfer lead time even on
    real TPU hosts. `--device tpu` (or any non-auto device) bypasses the
    sidecar path and lands here.
    """
    mesh_spec = getattr(cfg, "mesh", None)
    if mesh_spec in ("pod", "pod-data", "pod-2d") and cfg.minimizers_path is not None:
        sd = ShardedDecider(None, k, w, mesh_spec, None,
                            index_path=cfg.minimizers_path)
        if cfg.debug:
            return _debug_decider_for(sd, k, w)
        return sd
    if getattr(cfg, "mesh", None) and cfg.minimizers_path is None:
        print(
            "Warning: --mesh is ignored in client mode (decisions run on "
            "the server).",
            file=sys.stderr,
        )
    if type(backend).__name__ == "RemoteBackend":
        host = RemoteDecider(backend, k, w)
    else:
        host = HostDecider(backend, k, w)
    if getattr(cfg, "mesh", None) and index is not None:
        sd = ShardedDecider(index, k, w, cfg.mesh, host)
        if cfg.debug:
            return _debug_decider_for(sd, k, w)
        return sd
    if index is None or cfg.debug or cfg.device == "numpy":
        return host
    if cfg.device == "auto":
        import os

        try:
            input_size = os.path.getsize(cfg.input_path)
        except (OSError, ValueError, TypeError):
            input_size = None
        if (
            len(index) < 1_000_000
            and input_size is not None
            and input_size < 16_000_000
        ):
            return host
        from ..jaxenv import default_backend_is_tunneled

        if default_backend_is_tunneled():
            return host
    try:
        return DeviceDecider(index, k, w, cfg.device, host,
                             index_path=cfg.minimizers_path)
    except Exception:
        if cfg.device in ("tpu", "cpu"):
            raise
        return host


def _debug_decider_for(sd: "ShardedDecider", k: int, w: int) -> HostDecider:
    """``--debug`` on mesh/pod runs (VERDICT r2 item 9): host extraction
    supplies per-record (hash, position, seq) for the k-mer dump while
    membership probes the decider's device-resident sharded planes
    (ShardedPipeline.probe_hashes) — so debug works even when no host holds
    the index (pod modes). Decisions are identical to the non-debug device
    path (distinct member hashes == distinct member positions). On
    process-spanning meshes every rank runs this same decider, keeping the
    probe collectives aligned (each rank prints its own debug stderr)."""
    from ..index.store import IndexHeader, MinimizerIndex

    stub = MinimizerIndex(IndexHeader.new(k, w), np.empty(0, dtype=np.uint64))
    return HostDecider(LocalBackend(stub, probe=sd.pipe.probe_hashes), k, w)


def _engine_desc(decider) -> str:
    """Human-readable name of the decision engine actually in use
    (engine-visibility parity: the reference warns on missing SIMD,
    ref: src/main.rs:238-243; we also say which engine runs)."""
    if isinstance(decider, DeviceDecider):
        plat = getattr(decider.pipe.device, "platform", "?")
        return f"device pipeline ({plat})"
    if isinstance(decider, ShardedDecider):
        shape = dict(decider.pipe.mesh.shape)
        return (
            f"sharded device pipeline (mesh data={shape.get('data')} x "
            f"shard={shape.get('shard')})"
        )
    from ..io.native_loader import get_lib

    ext = "native C++" if get_lib() is not None else "pure-Python oracle"
    backend_name = (
        type(decider.backend).__name__ if decider.backend is not None else ""
    )
    if backend_name == "RemoteBackend":
        return f"remote server decisions ({ext} extraction)"
    return f"host batch engine ({ext} extraction)"


def _split_byte_range(br):
    """Normalize a pod-data byte range: ``(s, e)`` or a ``BgzfRange`` for
    single-end input, ``((s1, e1), (s2, e2))`` for paired files. Returns
    (range1, range2)."""
    if br is None:
        return None, None
    from ..io.split import BgzfRange

    if isinstance(br, BgzfRange):
        return br, None
    if isinstance(br[0], tuple):
        return br[0], br[1]
    return br, None


def _range_reader(path, br) -> "FastxReader":
    """Per-rank reader over a pod-data range (plain byte range or BGZF
    decompressed-space range)."""
    from ..io.split import BgzfRange, BgzfRangeStream, RangeStream

    if isinstance(br, BgzfRange):
        return FastxReader(BgzfRangeStream(path, *br))
    return FastxReader(RangeStream(path, *br))


def _run_native_pipeline(
    config: FilterConfig, index, decider, k: int, w: int,
    stats: "FilterStats", quiet: bool, start_time: float,
    probe=None, byte_range=None,
) -> bool:
    """Fully native C++ pipeline (io/native dx_filter_run): reader thread ->
    extraction/probe/decide worker pool -> ordered writer, with zero
    per-record Python work. Used when the decision would run on the host
    anyway (HostDecider), debug is off and a local index is loaded (or a
    prebuilt sidecar `probe` is passed, in which case the hash array was
    never decoded). Returns True when it ran (stats filled, output files
    written and finished); False to fall back to the Python path."""
    probe_source = "sidecar cache" if probe is not None else "built at startup"
    if probe is None and (
        index is None or config.debug or not isinstance(decider, HostDecider)
    ):
        return False
    if config.device != "auto":
        return False  # numpy = pure-Python oracle path; tpu/cpu = device path
    byte_range, byte_range2 = _split_byte_range(byte_range)
    if byte_range is not None and config.input2_path is not None \
            and byte_range2 is None:
        return False  # paired ranges must come as a pair (pod-data)
    from ..io.split import BgzfRange

    if isinstance(byte_range, BgzfRange):
        # BGZF decompressed-space ranges read through the Python
        # BgzfRangeStream; the native reader's byte cap is raw-space only
        return False
    from ..io.writers import resolve_codec

    # level validation must propagate (ref: src/local_filter.rs:95-107)
    out_codec = resolve_codec(config.output_path, config.compression_level)
    output2 = None
    out2_codec = 0
    if config.output2_path is not None and config.input2_path is not None:
        output2 = config.output2_path
        out2_codec = resolve_codec(output2, config.compression_level)
    try:
        from ..io.native_loader import get_lib, native_filter_run, native_probe

        if get_lib() is None:
            return False
        saver = None
        if probe is None:
            try:
                probe = native_probe(index.hashes)
            except MemoryError:
                probe = None  # table build failed: slower paths still work
            if probe is None:
                return False
            # Persist the finished table next to the index so later runs
            # mmap it and skip both the hash decode and the build (15-50 s
            # each at panhuman scale). The write overlaps the filtering on
            # a background thread (queries only read the table); the
            # DEACON_PROBE_CACHE policy lives in maybe_save_probe_sidecar.
            import threading as _threading

            from ..io.native_loader import maybe_save_probe_sidecar

            n_keys = int(index.hashes.size)

            def _save():
                maybe_save_probe_sidecar(
                    probe, str(config.minimizers_path), n_keys
                )

            saver = _threading.Thread(target=_save, daemon=True)
            saver.start()
    except Exception:
        return False
    if index is not None:
        # The probe table owns its copy of the keys; dropping the decoded
        # hash array here halves steady-state memory at panhuman scale (the
        # run finishes through _finish_run without touching the index again).
        object.__setattr__(index, "hashes", None)

    if not quiet:
        _eprint(f"Engine: native C++ pipeline (probe table: {probe_source})")

    import signal
    import threading

    progress = np.zeros(7, dtype=np.int64)  # [6] = cancel request
    spinner = Spinner(not quiet)
    stop = threading.Event()

    # The native run blocks this thread in C (GIL released), so Python's
    # deferred SIGINT delivery would make Ctrl-C appear dead for the whole
    # run; instead the handler raises the pipeline's cancel flag, which the
    # reader/workers poll per batch.
    interrupted = False
    prev_sigint = None

    def _on_sigint(signum, frame):
        nonlocal interrupted
        interrupted = True
        progress[6] = 1

    try:
        prev_sigint = signal.signal(signal.SIGINT, _on_sigint)
    except ValueError:  # not on the main thread
        prev_sigint = None

    def _poll():
        view = FilterStats()
        while not stop.wait(0.1):
            view.total_seqs = int(progress[0])
            view.filtered_seqs = int(progress[1])
            view.total_bp = int(progress[2])
            view.output_bp = int(progress[3])
            spinner.update(view, start_time)

    poller = threading.Thread(target=_poll, daemon=True)
    poller.start()
    try:
        native_filter_run(
            config.input_path,
            config.input2_path,
            config.output_path,
            output2,
            out_codec,
            config.compression_level,
            out2_codec,
            config.compression_level,
            probe,
            k,
            w,
            config.prefix_length,
            config.abs_threshold,
            config.rel_threshold,
            config.deplete,
            config.rename,
            config.threads,
            progress,
            byte_range=byte_range,
            byte_range2=byte_range2,
        )
    except ValueError:
        if interrupted:
            raise KeyboardInterrupt
        raise
    finally:
        stop.set()
        poller.join()
        spinner.finish()
        if saver is not None:
            saver.join()
        if prev_sigint is not None:
            signal.signal(signal.SIGINT, prev_sigint)
    if interrupted:
        raise KeyboardInterrupt
    stats.total_seqs = int(progress[0])
    stats.filtered_seqs = int(progress[1])
    stats.total_bp = int(progress[2])
    stats.output_bp = int(progress[3])
    stats.filtered_bp = int(progress[4])
    stats.output_seq_counter = int(progress[5])
    return True


def run(config: FilterConfig, _byte_range=None, _return_stats=False):
    if getattr(config, "mesh", None) == "pod-data" and _byte_range is None:
        # multi-host data-parallel mode: split the input across ranks and
        # re-enter run() per rank with a byte range (filter/pod_data.py)
        from .pod_data import run_pod_data

        return run_pod_data(config)
    if getattr(config, "mesh", None) == "pod-2d" and _byte_range is None:
        # combined 2D mode: split the input across rank GROUPS, index
        # sharded across each group's hosts (filter/pod_data.py)
        from .pod_data import run_pod_2d

        return run_pod_2d(config)
    start_time = time.monotonic()
    tool_version = f"{TOOL_NAME} {VERSION}"
    quiet = config.quiet or config.debug  # ref: src/local_filter.rs:581

    mode = "deplete" if config.deplete else "search"
    paired_stdin = config.input_path == "-" and config.input2_path == "-"
    if paired_stdin:
        input_type = "interleaved"
    elif config.input2_path is not None:
        input_type = "paired"
    else:
        input_type = "single"

    options = [f"abs_threshold={config.abs_threshold}, rel_threshold={config.rel_threshold}"]
    if config.prefix_length > 0:
        options.append(f"prefix_length={config.prefix_length}")
    if config.rename:
        options.append("rename")
    if config.threads > 0:
        options.append(f"threads={config.threads}")

    if not quiet:
        _eprint(
            f"{TOOL_NAME} v{VERSION}; mode: {mode}; input: {input_type}; "
            f"options: {', '.join(options)}"
        )

    # ------------------------------------------------------------------
    # Index / backend
    # ------------------------------------------------------------------
    sidecar_probe = None
    if config.minimizers_path is not None:
        from ..index.store import warn_if_foreign_index

        warn_if_foreign_index(config.minimizers_path)
        if getattr(config, "mesh", None) in ("pod", "pod-data", "pod-2d"):
            # pod modes never materialize the full index on any host —
            # the decider stream-decodes per-shard slices from the file
            from ..index.store import load_header_and_count

            header, _ = load_header_and_count(config.minimizers_path)
            index = None
            backend = None
        else:
            if (
                config.device == "auto"
                and not config.debug
                and getattr(config, "mesh", None) is None
            ):
                # Sidecar fast path: a valid `<index>.probe` (bound to the
                # index file's count+size+mtime) carries the finished probe
                # table, so the native pipeline can start without decoding
                # the hash array at all (~40-70 s saved at panhuman scale).
                try:
                    from ..index.store import load_header_and_count
                    from ..io.native_loader import native_probe_load_sidecar

                    header, count = load_header_and_count(
                        config.minimizers_path
                    )
                    sidecar_probe = native_probe_load_sidecar(
                        str(config.minimizers_path), count
                    )
                except Exception:
                    sidecar_probe = None
            if sidecar_probe is None:
                index = load_index(config.minimizers_path)
                header = index.header
                backend = LocalBackend(index)
            else:
                index = None
                backend = None
        summary_index = str(config.minimizers_path)
    elif config.server_address is not None:
        from ..server.client import RemoteBackend

        index = None
        backend = RemoteBackend(config.server_address)
        header = backend.header
        summary_index = backend.summary_index()
    else:
        raise ValueError("No index path or server address provided")

    k, w = header.kmer_length, header.window_size
    load_time = time.monotonic() - start_time
    if not quiet:
        _eprint(f"Loaded index (k={k}, w={w}) in {_fmt_duration(load_time)}")

    stats = FilterStats()
    filtering_start = time.monotonic()
    if sidecar_probe is not None:
        if _run_native_pipeline(
            config, None, None, k, w, stats, quiet, filtering_start,
            probe=sidecar_probe, byte_range=_byte_range,
        ):
            if _return_stats:
                return stats, k, w
            _finish_run(config, stats, start_time, quiet, tool_version,
                        summary_index, k, w)
            return
        # native path declined despite a valid sidecar (e.g. forced device
        # override slipped through): fall back to the full load
        index = load_index(config.minimizers_path)
        backend = LocalBackend(index)

    decider = make_decider(index, backend, k, w, config)

    filtering_start = time.monotonic()
    if _run_native_pipeline(
        config, index, decider, k, w, stats, quiet, filtering_start,
        byte_range=_byte_range,
    ):
        if _return_stats:
            return stats, k, w
        _finish_run(config, stats, start_time, quiet, tool_version,
                    summary_index, k, w)
        return

    from ..io.native_loader import warn_if_native_unavailable

    if isinstance(decider, HostDecider):
        warn_if_native_unavailable("filtering")
    if not quiet:
        _eprint(f"Engine: {_engine_desc(decider)}")

    writer = get_writer(config.output_path, config.compression_level)
    writer2: FastxWriter | None = None
    if config.output2_path is not None and config.input2_path is not None:
        writer2 = get_writer(config.output2_path, config.compression_level)

    spinner = Spinner(not quiet)
    buffer = bytearray()
    buffer2 = bytearray()

    def flush_buffers():
        if buffer:
            writer.write(bytes(buffer))
            buffer.clear()
        if writer2 is not None and buffer2:
            writer2.write(bytes(buffer2))
            buffer2.clear()

    def emit_single(rec: Record):
        stats.output_seq_counter += 1
        format_record(
            rec.id, rec.seq, rec.qual, rec.is_fastq, config.rename,
            stats.output_seq_counter, buffer,
        )

    def emit_pair(rec1: Record, rec2: Record):
        stats.output_seq_counter += 2
        format_record(
            rec1.id, rec1.seq, rec1.qual, rec1.is_fastq, config.rename,
            stats.output_seq_counter - 1, buffer,
        )
        format_record(
            rec2.id, rec2.seq, rec2.qual, rec2.is_fastq, config.rename,
            stats.output_seq_counter,
            buffer2 if writer2 is not None else buffer,
        )

    # ------------------------------------------------------------------
    # Batch loops
    # ------------------------------------------------------------------
    def process_single(records, decisions):
        for rec, (keep, hits, total, kmers) in zip(records, decisions):
            stats.total_seqs += 1
            stats.total_bp += len(rec.seq)
            if config.debug:
                _eprint(
                    f"DEBUG: {rec.id.decode('utf-8', 'replace')} "
                    f"hits={hits}/{total} keep={_rust_bool(keep)} "
                    f"kmers=[{','.join(kmers)}]"
                )
            if keep:
                stats.output_bp += len(rec.seq)
                emit_single(rec)
            else:
                stats.filtered_seqs += 1
                stats.filtered_bp += len(rec.seq)
        flush_buffers()
        spinner.update(stats, filtering_start)

    def process_pairs(pairs, decisions):
        for (rec1, rec2), (keep, hits, total, kmers) in zip(pairs, decisions):
            pair_bp = len(rec1.seq) + len(rec2.seq)
            stats.total_seqs += 2
            stats.total_bp += pair_bp
            # hits>0 guard matches the reference's paired debug path
            # (ref: src/local_filter.rs:424, :497) — single-end prints all
            if config.debug and hits > 0:
                _eprint(
                    f"DEBUG: {rec1.id.decode('utf-8', 'replace')}/"
                    f"{rec2.id.decode('utf-8', 'replace')} "
                    f"hits={hits}/{total} keep={_rust_bool(keep)} "
                    f"kmers=[{','.join(kmers)}]"
                )
            if keep:
                stats.output_bp += pair_bp
                emit_pair(rec1, rec2)
            else:
                stats.filtered_seqs += 2
                stats.filtered_bp += pair_bp
        flush_buffers()
        spinner.update(stats, filtering_start)

    # Software pipeline, resolve_depth deep: up to `depth` launched device
    # batches stay in flight while the host reads ahead and writes behind
    # (the TPU analogue of the reference's reader/worker/writer thread
    # pipeline, SURVEY §2.3). Deep pipelines let the decider's FetchGroup
    # materialize many batches' outputs in one fused d2h; host memory is
    # bounded by DEACON_RESOLVE_MAX_MB of buffered record bytes (default
    # 512). Host deciders resolve immediately (depth 1: plain double
    # buffering).
    try:
        import os as _os
        from collections import deque

        depth = max(1, int(getattr(decider, "resolve_depth", 1)))
        max_bytes = int(
            float(_os.environ.get("DEACON_RESOLVE_MAX_MB", "512")) * 1e6
        )
        pending: deque = deque()
        pending_bytes = 0

        def drain(process_fn, everything=False):
            nonlocal pending_bytes
            while pending and (
                everything or len(pending) > depth or pending_bytes > max_bytes
            ):
                recs, fut, nb = pending.popleft()
                pending_bytes -= nb
                process_fn(recs, fut())

        _br1, _br2 = _split_byte_range(_byte_range)
        if input_type == "single":
            if _br1 is not None:
                reader = _range_reader(config.input_path, _br1)
            else:
                reader = FastxReader.from_path(config.input_path)
            while True:
                records = read_batch(reader, config.batch_size)
                if not records:
                    drain(process_single, everything=True)
                    break
                fut = decider.launch_unpaired(
                    [r.seq for r in records], config.prefix_length, config
                )
                nb = sum(len(r.seq) for r in records)
                pending.append((records, fut, nb))
                pending_bytes += nb
                drain(process_single)
        else:
            if input_type == "interleaved":
                reader = FastxReader.from_path("-")
                pair_iter = _interleaved_pairs(reader)
            elif _br2 is not None:
                from ..io.split import RangeStream

                r1 = FastxReader(RangeStream(config.input_path, *_br1))
                r2 = FastxReader(RangeStream(config.input2_path, *_br2))
                pair_iter = zip(r1, r2)
            else:
                r1 = FastxReader.from_path(config.input_path)
                r2 = FastxReader.from_path(config.input2_path)
                pair_iter = zip(r1, r2)
            while True:
                pairs: list[tuple[Record, Record]] = []
                for _ in range(config.batch_size):
                    try:
                        pairs.append(next(pair_iter))
                    except StopIteration:
                        break
                if not pairs:
                    drain(process_pairs, everything=True)
                    break
                fut = decider.launch_paired(
                    [(a.seq, b.seq) for a, b in pairs],
                    config.prefix_length,
                    config,
                )
                nb = sum(len(a.seq) + len(b.seq) for a, b in pairs)
                pending.append((pairs, fut, nb))
                pending_bytes += nb
                drain(process_pairs)
    finally:
        spinner.finish()

    writer.finish()
    if writer2 is not None:
        writer2.finish()

    if _return_stats:
        # pod-data sub-run: the caller aggregates stats across ranks and
        # prints the final line/summary once on rank 0
        return stats, k, w
    _finish_run(config, stats, start_time, quiet, tool_version, summary_index,
                k, w)


def _finish_run(
    config: FilterConfig, stats: "FilterStats", start_time: float,
    quiet: bool, tool_version: str, summary_index: str, k: int, w: int,
) -> None:
    """Final stderr stats line + optional summary JSON (C11/C12)."""
    total_time = time.monotonic() - start_time
    output_seqs = stats.total_seqs - stats.filtered_seqs
    seqs_per_sec = stats.total_seqs / total_time if total_time > 0 else 0.0
    mbp_per_sec = stats.total_bp / total_time / 1e6 if total_time > 0 else 0.0
    sp = output_seqs / stats.total_seqs * 100 if stats.total_seqs else 0.0
    bpp = stats.output_bp / stats.total_bp * 100 if stats.total_bp else 0.0

    if not quiet:
        _eprint(
            f"Retained {output_seqs}/{stats.total_seqs} sequences ({sp:.3f}%), "
            f"{stats.output_bp}/{stats.total_bp} bp ({bpp:.3f}%) in "
            f"{_fmt_duration(total_time)}. Speed: {seqs_per_sec:.0f} seqs/s "
            f"({mbp_per_sec:.1f} Mbp/s)"
        )

    if config.summary_path is not None:
        summary = build_summary(
            version=tool_version,
            index=summary_index,
            input=config.input_path,
            input2=config.input2_path,
            output=config.output_path,
            output2=config.output2_path,
            k=k,
            w=w,
            abs_threshold=config.abs_threshold,
            rel_threshold=config.rel_threshold,
            prefix_length=config.prefix_length,
            deplete=config.deplete,
            rename=config.rename,
            seqs_in=stats.total_seqs,
            seqs_out=output_seqs,
            seqs_removed=stats.filtered_seqs,
            bp_in=stats.total_bp,
            bp_out=stats.output_bp,
            bp_removed=stats.filtered_bp,
            time=total_time,
        )
        write_summary(summary, config.summary_path)
        if not quiet:
            _eprint(f'Summary saved to "{config.summary_path}"')


def _interleaved_pairs(reader: FastxReader):
    """Yield record pairs from an interleaved stream; odd count is an error
    (ref: src/remote_filter.rs:1188-1194)."""
    count = 0
    while True:
        try:
            rec1 = next(reader)
        except StopIteration:
            return
        count += 1
        try:
            rec2 = next(reader)
        except StopIteration:
            raise ValueError(
                f"Uneven number of interleaved sequence pairs. Found {count} records."
            ) from None
        count += 1
        yield rec1, rec2
