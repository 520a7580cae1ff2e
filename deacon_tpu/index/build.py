"""Index operations: build, info, union, diff (ref: src/index.rs:167-664)."""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

from ..config import IndexConfig
from ..constants import DIFF_STREAM_BATCH, INDEX_BUILD_BATCH, TOOL_NAME, VERSION
from ..io.fastx import FastxReader, read_batch
from ..ops import host_extract
from ..ops import minimizers_np as mnp
from . import store


def _eprint(*args) -> None:
    print(*args, file=sys.stderr)


class _Extractor:
    """Index-side extraction: device engine with NumPy-oracle fallback
    (ref parallel batch map: src/index.rs:252-264)."""

    def __init__(self, k: int, w: int, entropy: float, device: str = "auto"):
        self.k, self.w, self.entropy = k, w, entropy
        self._pipe = None
        self._overflow = Exception
        if device == "auto":
            # tunneled accelerators: per-batch materializations run ~100x
            # below chip speed; the C++ host engine is strictly faster
            from ..jaxenv import default_backend_is_tunneled

            if default_backend_is_tunneled():
                device = "numpy"
        if device != "numpy":
            try:
                import jax

                from ..ops.engine import BudgetOverflow, IndexBuildPipeline

                dev = None
                if device in ("tpu", "cpu"):
                    dev = jax.devices(device)[0]
                self._pipe = IndexBuildPipeline(
                    k, w, entropy_threshold=entropy, device=dev
                )
                self._overflow = BudgetOverflow
            except Exception:
                if device in ("tpu", "cpu"):
                    raise
                self._pipe = None

    def __call__(self, seqs: list[bytes]) -> list:
        if self._pipe is not None:
            try:
                return self._pipe.extract_batch(seqs)
            except self._overflow:
                pass
        return host_extract.extract_index_batch(seqs, self.k, self.w, self.entropy)


def _extract_batch_hashes(seqs: list[bytes], k: int, w: int, entropy: float):
    """One-shot host extraction (used by diff streaming)."""
    return host_extract.extract_index_batch(seqs, k, w, entropy)


def _sort_unique_arr(arr: np.ndarray, threads: int = 0) -> np.ndarray:
    """Sort + dedup a raw u64 array (native parallel radix sort when
    available, np.unique fallback). `arr` must be caller-owned; it is
    sorted in place on the native path."""
    try:
        from ..io.native_loader import native_u64_sort_unique

        out = native_u64_sort_unique(arr, n_threads=max(0, threads))
        if out is not None:
            # out is a view of `arr`; copy only when dedup shrank it enough
            # that freeing the backing buffer pays for the memcpy
            return out.copy() if out.size < arr.size // 2 else out
    except Exception:
        pass
    return np.unique(arr)


def _merge_sorted_unique(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Union of two sorted-unique u64 arrays: one linear pass (native),
    instead of re-sorting the concatenation."""
    if not a.size:
        return b
    if not b.size:
        return a
    try:
        from ..io.native_loader import native_u64_merge_sorted_unique

        out = native_u64_merge_sorted_unique(a, b)
        if out is not None:
            return out
    except Exception:
        pass
    return np.union1d(a, b)


def build(config: IndexConfig, _byte_range=None, _return_stats=False):
    """ref: src/index.rs:167-308.

    ``_byte_range``/``_return_stats`` serve ``index build --mesh pod-data``
    (index/pod_build.py): build from a record-aligned byte range of the
    input and return (unique_count, seq_count, total_bp) instead of
    printing the banner/summary (the pod orchestrator reports globally).
    """
    mesh = getattr(config, "mesh", None)
    if mesh is not None and mesh != "pod-data":
        raise ValueError(
            f"index build supports --mesh pod-data only, got {mesh!r}"
        )
    if mesh == "pod-data" and _byte_range is None:
        from .pod_build import run_pod_build

        return run_pod_build(config)
    start = time.monotonic()

    if not _return_stats:
        options = [f"capacity={config.capacity_millions}M"]
        if config.threads > 0:
            options.append(f"threads={config.threads}")
        _eprint(
            f"{TOOL_NAME} v{VERSION}; mode: build; input: single; "
            f"options: {', '.join(options)}"
        )

    # l = k + w - 1 must be odd (canonical tie-break; ref: src/index.rs:186-194)
    l = config.kmer_length + config.window_size - 1
    if l % 2 == 0:
        raise ValueError(
            f"Constraint violated: k + w - 1 must be odd "
            f"(k={config.kmer_length}, w={config.window_size})"
        )

    if _byte_range is not None:
        reader = None
        try:
            from ..io.native_loader import open_native_reader

            reader = open_native_reader(
                str(config.input_path), byte_range=_byte_range
            )
        except Exception:
            reader = None
        if reader is None:
            from ..io.split import RangeStream

            reader = FastxReader(
                RangeStream(config.input_path, *_byte_range)
            )
    else:
        reader = FastxReader.from_path(config.input_path)
    if not _return_stats:
        _eprint(
            f"Building index (k={config.kmer_length}, w={config.window_size})"
        )

    total_unique = 0
    seq_count = 0
    total_bp = 0
    accumulated: np.ndarray = np.empty(0, dtype=np.uint64)
    # Reporting path (default): a native counting hash set — the
    # reference's FxHashSet role (src/index.rs:96-107, 266-284) — makes the
    # per-seq running total O(new keys). Fallback when the native lib is
    # missing: sorted staging disjoint from accumulated (exact count =
    # accumulated.size + staging.size, no per-seq re-sort).
    cset = None
    if not config.quiet:
        try:
            from ..io.native_loader import NativeCountingSet

            cset = NativeCountingSet(
                capacity_hint=config.capacity_millions * 1_000_000
            )
        except Exception:
            cset = None
    # Quiet path (no per-seq totals): scatter raw hashes into the native
    # accumulator as they arrive — the final stage sorts 256 cache-sized
    # buckets and streams the encoded index to disk, replacing the
    # concat + giant-sort + Python-encode tail (~66 s at 381M keys).
    runacc = None
    if config.quiet and str(config.output_path) != "-":
        try:
            from ..io.native_loader import NativeRunAcc

            runacc = NativeRunAcc(
                capacity_hint=config.capacity_millions * 1_000_000
            )
        except Exception:
            runacc = None
    staging: np.ndarray = np.empty(0, dtype=np.uint64)
    pending: list[np.ndarray] = []
    pending_size = 0
    # merge when raw (duplicate-bearing) hashes exceed this many entries
    merge_watermark = 500_000_000
    staging_watermark = 32_000_000

    def _sort_unique(arr: np.ndarray) -> np.ndarray:
        return _sort_unique_arr(arr, threads=config.threads)

    _merge_sorted = _merge_sorted_unique

    def stage_seq(hashes: np.ndarray) -> None:
        """Fold one sequence's hashes into staging (reporting path)."""
        nonlocal staging, accumulated
        new_u = _sort_unique(hashes.copy())
        if accumulated.size and new_u.size:
            idx = np.minimum(
                np.searchsorted(accumulated, new_u), accumulated.size - 1
            )
            new_u = new_u[accumulated[idx] != new_u]
        staging = _merge_sorted(staging, new_u)
        if staging.size > staging_watermark:
            accumulated = _merge_sorted(accumulated, staging)
            staging = np.empty(0, dtype=np.uint64)

    def merge_pending():
        nonlocal accumulated, staging, pending, pending_size, cset
        if cset is not None:
            if len(cset):
                accumulated = _merge_sorted(accumulated, cset.export_sorted())
            cset.close()  # single final export; keys now live in accumulated
            cset = None
        if staging.size:
            accumulated = _merge_sorted(accumulated, staging)
            staging = np.empty(0, dtype=np.uint64)
        if pending:
            merged = np.concatenate(pending) if len(pending) > 1 else pending[0]
            accumulated = _merge_sorted(
                accumulated, _sort_unique(np.ascontiguousarray(merged))
            )
            pending = []
            pending_size = 0

    device = getattr(config, "device", "auto")
    if device == "auto":
        # small inputs: JAX startup would dominate; stay on the host oracle
        import os

        try:
            if os.path.getsize(config.input_path) < 16_000_000:
                device = "numpy"
        except OSError:
            pass
        # (tunneled-accelerator routing happens inside _Extractor)
    extractor = _Extractor(
        config.kmer_length,
        config.window_size,
        config.entropy_threshold,
        device,
    )
    if extractor._pipe is not None:
        plat = getattr(extractor._pipe.device, "platform", None)
        _eprint(f"Engine: device extraction pipeline ({plat or 'default'})")
    else:
        from ..io.native_loader import get_lib, warn_if_native_unavailable

        warn_if_native_unavailable("index build")
        ext = "native C++" if get_lib() is not None else "pure-Python oracle"
        _eprint(f"Engine: host extraction ({ext})")
    use_raw = False
    if extractor._pipe is None:
        # host route + native reader: feed the parser's raw record arena
        # straight to the C++ extractor — no Python Record objects, no
        # per-sequence byte copies (the reference's needletail -> rayon
        # pipeline shape, ref: src/index.rs:225-290)
        try:
            from ..io.native_loader import (
                NativeFastxReader,
                native_extract_batch,
            )

            use_raw = isinstance(reader, NativeFastxReader)
        except Exception:
            use_raw = False

    def handle_seq(seq_id_bytes, blen: int, hashes: np.ndarray):
        nonlocal seq_count, total_bp, pending_size
        seq_count += 1
        total_bp += blen
        if config.quiet:
            if runacc is not None:
                runacc.add(hashes)
            elif hashes.size:
                pending.append(hashes)
                pending_size += hashes.size
            return
        # reporting path (ref: src/index.rs:266-284 prints a per-seq
        # running total): counting-set insert is O(new keys); the staged
        # sorted-merge fallback avoids re-sorting accumulated per sequence
        if cset is not None:
            cset.insert(hashes, n_threads=max(0, config.threads))
            total = len(cset)
        else:
            stage_seq(hashes)
            total = accumulated.size + staging.size
        _eprint(
            f"  {seq_id_bytes.decode('utf-8', 'replace')} ({blen}bp), "
            f"total minimizers: {total}"
        )

    if use_raw:
        # Prefetch thread: file read + decompression + parsing of batch N+1
        # overlap with extraction/merging of batch N (the reference gets
        # this from needletail's reader running ahead of the rayon pool).
        # The zero-copy views are invalidated by the next read, so the
        # producer detaches each batch with one memcpy — still far cheaper
        # than the old per-record copy path, and off the consumer's
        # critical path.
        import queue
        import threading

        batch_q: "queue.Queue" = queue.Queue(maxsize=2)
        stop = threading.Event()  # set when the consumer bails out early

        from ..io.native_loader import empty_huge

        # Detach buffers recycle through free_q (the consumer returns them
        # after extraction): allocating ~130 MB fresh per batch causes a
        # page-fault + munmap TLB-shootdown storm that shows up as tens of
        # seconds of kernel time per genome on fault-expensive VMs.
        free_q: "queue.Queue" = queue.Queue()

        def _detach(meta, arena):
            try:
                bufs = free_q.get_nowait()
            except queue.Empty:
                bufs = [None, None]
            m, a = bufs
            if m is None or m.size < meta.size:
                m = empty_huge(max(meta.size, 1), np.int64)
            if a is None or a.size < arena.size:
                a = empty_huge(max(arena.size, 1), np.uint8)
            m[: meta.size] = meta.ravel()
            a[: arena.size] = arena
            return (
                m[: meta.size].reshape(meta.shape),
                a[: arena.size],
                [m, a],  # returned to free_q by the consumer
            )

        def _producer():
            try:
                while not stop.is_set():
                    meta, arena, _fq = reader.read_batch_raw(INDEX_BUILD_BATCH)
                    item = (
                        None if meta.shape[0] == 0
                        else _detach(meta, arena)
                    )
                    # bounded put that aborts if the consumer died (a raise
                    # in extraction/merge would otherwise leave this thread
                    # blocked forever, leaking the reader fd and two
                    # detached batch copies)
                    while not stop.is_set():
                        try:
                            batch_q.put(item, timeout=0.2)
                            break
                        except queue.Full:
                            pass
                    if item is None:
                        return
            except BaseException as exc:  # re-raised on the consumer side
                # bounded put, like the data path: dropping the exception
                # when the queue is full would leave the consumer blocked
                # on get() forever instead of surfacing the parse error
                while not stop.is_set():
                    try:
                        batch_q.put(exc, timeout=0.2)
                        break
                    except queue.Full:
                        pass

        producer = threading.Thread(target=_producer, daemon=True)
        producer.start()
        # output-buffer reuse is safe whenever every consumer of the batch's
        # hash views copies before the next batch (runacc.add and
        # cset.insert do; the quiet non-runacc fallback STORES the views in
        # `pending`, so it keeps fresh buffers)
        ext_scratch = {} if (runacc is not None or not config.quiet) else None
        try:
            while True:
                item = batch_q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                meta, arena, bufs = item
                n = meta.shape[0]
                starts = np.ascontiguousarray(meta[:, 2])
                lens = np.ascontiguousarray(meta[:, 3])
                hashes_all, _pos, counts = native_extract_batch(
                    arena, starts, lens, config.kmer_length, config.window_size,
                    index_mode=True,
                    entropy_threshold=config.entropy_threshold,
                    n_threads=config.threads,
                    scratch=ext_scratch,
                )
                if config.quiet and runacc is not None:
                    # whole-batch fold: no per-record Python slicing
                    runacc.add(hashes_all)
                    seq_count += n
                    total_bp += int(lens.sum())
                else:
                    off = 0
                    for i in range(n):
                        c = int(counts[i])
                        rid = (
                            bytes(arena[int(meta[i, 0]):int(meta[i, 0]) + int(meta[i, 1])])
                            if not config.quiet
                            else b""
                        )
                        handle_seq(rid, int(lens[i]), hashes_all[off:off + c])
                        off += c
                free_q.put(bufs)  # recycle the detach buffers
                if pending_size > merge_watermark:
                    merge_pending()
        finally:
            stop.set()
            producer.join(timeout=5.0)
            if not producer.is_alive():  # never close under a live reader
                close = getattr(reader, "close", None)
                if close is not None:
                    close()
    else:
        while True:
            batch = read_batch(reader, INDEX_BUILD_BATCH)
            if not batch:
                break
            results = extractor([r.seq for r in batch])
            for rec, hashes in zip(batch, results):
                handle_seq(rec.id, len(rec.seq), hashes)
            if pending_size > merge_watermark:
                merge_pending()

    header = store.IndexHeader.new(config.kmer_length, config.window_size)
    if runacc is not None:
        import os

        trailer = store.PROVENANCE_MAGIC + bytes([store.SCHEME_DXTP_FMIX32_V1])
        tmp = str(config.output_path) + f".tmp{os.getpid()}"
        try:
            count = runacc.finish_write(
                tmp, header.format_version, config.kmer_length,
                config.window_size, trailer, config.threads,
            )
        except OSError:
            try:
                os.unlink(tmp)
            except OSError:
                pass
            raise
        if count is not None:
            os.replace(tmp, config.output_path)
            runacc.close()
            if _return_stats:
                return count, seq_count, total_bp
            _eprint(
                f"Indexed {count} minimizers from {seq_count} sequence(s) "
                f"({total_bp}bp)"
            )
            _eprint(f"Completed in {time.monotonic() - start:.2f}s")
            return
        # count has no canonical patched form (tiny index): generic path
        accumulated = runacc.export_sorted()
        runacc.close()

    merge_pending()
    total_unique = int(accumulated.size)
    if _return_stats:
        store.write_index(accumulated, header, config.output_path)
        return total_unique, seq_count, total_bp
    _eprint(
        f"Indexed {total_unique} minimizers from {seq_count} sequence(s) ({total_bp}bp)"
    )

    store.write_index(accumulated, header, config.output_path)
    _eprint(f"Completed in {time.monotonic() - start:.2f}s")


def info(index_path: str) -> None:
    """ref: src/index.rs:539-560.

    Header fast path: the count is serialized right after the header, so
    info never decodes the hash array (the reference loads the full set —
    ~20 s at panhuman scale for the same four lines of output)."""
    start = time.monotonic()
    header, count = store.load_header_and_count(index_path)
    scheme = store.read_provenance(index_path)
    _eprint("Index information:")
    _eprint(f"  Format version: {header.format_version}")
    _eprint(f"  K-mer length (k): {header.kmer_length}")
    _eprint(f"  Window size (w): {header.window_size}")
    _eprint(f"  Distinct minimizer count: {count}")
    if scheme is not None:
        name = store.SCHEME_NAMES.get(scheme, f"id {scheme}")
        _eprint(f"  Origin: deacon-tpu (selection scheme: {name})")
    else:
        _eprint(
            "  Origin: unknown (no deacon-tpu provenance trailer — likely "
            "built by upstream deacon; selection schemes differ, see INTEROP.md)"
        )
    _eprint(f"Retrieved index info in {time.monotonic() - start:.2f}s")


def union(inputs: list[str], output: str | None, capacity_millions: int | None) -> None:
    """ref: src/index.rs:563-664."""
    start = time.monotonic()
    if not inputs:
        raise ValueError("No input files provided for union operation")

    headers_and_counts = [store.load_header_and_count(p) for p in inputs]
    header = headers_and_counts[0][0]
    total_capacity = (
        capacity_millions * 1_000_000
        if capacity_millions is not None
        else sum(c for _, c in headers_and_counts)
    )
    _eprint(
        f"Performing union of indexes (k={header.kmer_length}, w={header.window_size})"
    )
    if capacity_millions is not None:
        _eprint(f"Pre-allocating user-specified capacity for {total_capacity} minimizers")
    else:
        _eprint(
            f"No capacity specified, pre-allocating worst-case capacity for "
            f"{total_capacity} minimizers from {len(inputs)} indexes"
        )

    for i, (file_header, _) in enumerate(headers_and_counts):
        if (
            file_header.kmer_length != header.kmer_length
            or file_header.window_size != header.window_size
        ):
            raise ValueError(
                f"Incompatible headers: index {i} has k={file_header.kmer_length}, "
                f"w={file_header.window_size}, but first index has "
                f"k={header.kmer_length}, w={header.window_size}"
            )

    # output provenance: ours only if EVERY input carries our trailer
    # (content from a foreign index stays foreign-schemed)
    out_scheme = store.SCHEME_DXTP_FMIX32_V1
    for path in inputs:
        if store.read_provenance(path) != store.SCHEME_DXTP_FMIX32_V1:
            store.warn_if_foreign_index(path)
            out_scheme = None

    merged = np.empty(0, dtype=np.uint64)
    for i, path in enumerate(inputs):
        idx = store.load_index(path)
        before = merged.size
        # both sides are sorted-unique: one linear native pass instead of
        # np.union1d's re-sort of the concatenation
        merged = _merge_sorted_unique(merged, idx.hashes)
        _eprint(
            f"Index {i + 1}: expected {headers_and_counts[i][1]} minimizers, "
            f"added {merged.size - before} new, total: {merged.size}"
        )

    store.write_index(merged, header, output, scheme=out_scheme)
    _eprint(
        f"United {len(inputs)} indexes with {merged.size} total minimizers "
        f"in {time.monotonic() - start:.2f}s"
    )


def _stream_diff_fastx(
    fastx_path: str,
    k: int,
    w: int,
    first_header: store.IndexHeader,
    first_hashes: np.ndarray,
) -> np.ndarray:
    """Streaming subtraction of FASTX minimizers (ref: src/index.rs:311-418)."""
    if k != first_header.kmer_length or w != first_header.window_size:
        raise ValueError(
            f"FASTX parameters (k={k}, w={w}) must match first index "
            f"(k={first_header.kmer_length}, w={first_header.window_size})"
        )
    src = "stdin" if str(fastx_path) == "-" else "file"
    _eprint(f"Second index: processing FASTX from {src} (k={k}, w={w})…")

    reader = FastxReader.from_path(fastx_path)
    keep_mask = np.ones(first_hashes.size, dtype=bool)
    seq_count = 0
    total_bp = 0
    last_reported_gb = 0
    extractor = _Extractor(k, w, 0.0)
    while True:
        batch = read_batch(reader, DIFF_STREAM_BATCH)
        if not batch:
            break
        results = extractor([r.seq for r in batch])
        for rec, hashes in zip(batch, results):
            seq_count += 1
            total_bp += len(rec.seq)
            if hashes.size and first_hashes.size:
                pos = np.searchsorted(first_hashes, hashes)
                pos_c = np.minimum(pos, first_hashes.size - 1)
                hitmask = first_hashes[pos_c] == hashes
                keep_mask[pos_c[hitmask]] = False
            gb = total_bp // 1_000_000_000
            if gb > last_reported_gb:
                removed = int((~keep_mask).sum())
                _eprint(
                    f"  Processed {seq_count} sequences ({total_bp}bp), "
                    f"removed {removed} minimizers"
                )
                last_reported_gb = gb
    _eprint(f"Processed {seq_count} sequences ({total_bp}bp) from FASTX file")
    return first_hashes[keep_mask]


def diff(
    first: str,
    second: str,
    kmer_length: int | None,
    window_size: int | None,
    output: str | None,
) -> None:
    """Set difference A - B; B is an index or a FASTX stream
    (ref: src/index.rs:421-536)."""
    start = time.monotonic()
    first_idx = store.load_index(first)
    _eprint(f"First index: loaded {len(first_idx)} minimizers")
    before = len(first_idx)
    # the output's content is a subset of the first index: it keeps the
    # first index's provenance (foreign first index -> no trailer + warning)
    out_scheme = store.read_provenance(first)
    if out_scheme is None:
        store.warn_if_foreign_index(first)

    def finish(remaining: np.ndarray):
        _eprint(f"Removed {before - remaining.size} minimizers, {remaining.size} remaining")
        store.write_index(remaining, first_idx.header, output, scheme=out_scheme)
        _eprint(f"Completed difference operation in {time.monotonic() - start:.2f}s")

    if kmer_length is not None and window_size is not None:
        remaining = _stream_diff_fastx(
            second, kmer_length, window_size, first_idx.header, first_idx.hashes
        )
        finish(remaining)
        return

    #

    try:
        second_idx = store.load_index(second)
    except Exception:
        # Not a valid index: treat as FASTX with k/w from the first header
        remaining = _stream_diff_fastx(
            second,
            first_idx.header.kmer_length,
            first_idx.header.window_size,
            first_idx.header,
            first_idx.hashes,
        )
        finish(remaining)
        return

    _eprint(f"Second index: loaded {len(second_idx)} minimizers")
    store.warn_if_foreign_index(second)
    if (
        second_idx.header.kmer_length != first_idx.header.kmer_length
        or second_idx.header.window_size != first_idx.header.window_size
    ):
        raise ValueError(
            f"Incompatible headers: second index has k={second_idx.header.kmer_length}, "
            f"w={second_idx.header.window_size}, but first index has "
            f"k={first_idx.header.kmer_length}, w={first_idx.header.window_size}"
        )
    remaining = None
    try:
        from ..io.native_loader import native_u64_diff_sorted_unique

        # both sides are sorted-unique: one linear pass instead of
        # np.setdiff1d's sort-based membership
        remaining = native_u64_diff_sorted_unique(
            first_idx.hashes, second_idx.hashes
        )
    except Exception:
        remaining = None
    if remaining is None:
        remaining = np.setdiff1d(
            first_idx.hashes, second_idx.hashes, assume_unique=True
        )
    finish(remaining)
