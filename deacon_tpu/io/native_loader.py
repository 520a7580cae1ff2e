"""ctypes binding for the native FASTX loader/writer (io/native/).

Builds lazily with `make` on first use; falls back to the pure-Python
implementations (io/fastx.py, io/writers.py) if the toolchain or shared
libraries are unavailable. Set DEACON_TPU_NO_NATIVE=1 to force the fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from pathlib import Path

import numpy as np

from .fastx import FastxParseError, Record

_NATIVE_DIR = Path(__file__).resolve().parent / "native"
_SO_PATH = _NATIVE_DIR / "libdeacon_io.so"
_lock = threading.Lock()
_lib = None
_lib_failed = False


def _build() -> bool:
    try:
        src = _NATIVE_DIR / "fastx_native.cpp"
        if _SO_PATH.exists() and _SO_PATH.stat().st_mtime >= src.stat().st_mtime:
            return True
        proc = subprocess.run(
            ["make", "-s"], cwd=_NATIVE_DIR, capture_output=True, timeout=120
        )
        return proc.returncode == 0 and _SO_PATH.exists()
    except Exception:
        return False


_warned_unavailable = False


def warn_if_native_unavailable(context: str = "") -> bool:
    """One-shot stderr warning when the native C++ library is unavailable
    (analogue of the reference's SIMD-absent warning, ref:
    src/main.rs:238-243). Returns True when the warning fired."""
    global _warned_unavailable
    if get_lib() is not None or _warned_unavailable:
        return False
    _warned_unavailable = True
    where = f" for {context}" if context else ""
    print(
        "Warning: native acceleration library is unavailable"
        f"{where}; falling back to the pure-Python engine (orders of "
        "magnitude slower). Check the C++ toolchain (g++, make) or unset "
        "DEACON_TPU_NO_NATIVE.",
        file=sys.stderr,
    )
    return True


def get_lib():
    """Returns the loaded native library or None."""
    global _lib, _lib_failed
    if _lib is not None:
        return _lib
    if _lib_failed or os.environ.get("DEACON_TPU_NO_NATIVE"):
        return None
    with _lock:
        if _lib is not None:
            return _lib
        if not _build():
            _lib_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_SO_PATH))
        except OSError:
            _lib_failed = True
            return None
        lib.dx_open.restype = ctypes.c_void_p
        lib.dx_open.argtypes = [ctypes.c_char_p]
        lib.dx_close.argtypes = [ctypes.c_void_p]
        lib.dx_is_fastq.restype = ctypes.c_int
        lib.dx_is_fastq.argtypes = [ctypes.c_void_p]
        lib.dx_error.restype = ctypes.c_char_p
        lib.dx_error.argtypes = [ctypes.c_void_p]
        lib.dx_writer_open.restype = ctypes.c_void_p
        lib.dx_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int]
        lib.dx_writer_write.restype = ctypes.c_int
        lib.dx_writer_write.argtypes = [
            ctypes.c_void_p,
            ctypes.c_void_p,
            ctypes.c_int64,
        ]
        lib.dx_writer_close.restype = ctypes.c_int
        lib.dx_writer_close.argtypes = [ctypes.c_void_p]
        lib.dx_pack_tile.restype = None
        lib.dx_pack_tile.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.dx_interleave_tile.restype = None
        lib.dx_interleave_tile.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.dx_cuckoo_seeds.restype = None
        lib.dx_cuckoo_seeds.argtypes = [
            ctypes.c_uint64, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.dx_cuckoo_build.restype = ctypes.c_int
        lib.dx_cuckoo_build.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_uint64, ctypes.c_uint64, ctypes.c_void_p,
        ]
        lib.dx_decode_u64_varint.restype = ctypes.c_int64
        lib.dx_decode_u64_varint.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.dx_decode_u64_fixed9.restype = ctypes.c_int64
        lib.dx_decode_u64_fixed9.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int32,
        ]
        lib.dx_encode_u64_fixed9.restype = ctypes.c_int64
        lib.dx_encode_u64_fixed9.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.dx_encode_u64_varint.restype = ctypes.c_int64
        lib.dx_encode_u64_varint.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.dx_next_batch_view.restype = ctypes.c_int64
        lib.dx_next_batch_view.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.dx_u64_merge_sorted_unique.restype = ctypes.c_int64
        lib.dx_u64_merge_sorted_unique.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.dx_records_at_offsets.restype = ctypes.c_int
        lib.dx_records_at_offsets.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,
        ]
        lib.dx_offsets_at_records.restype = ctypes.c_int
        lib.dx_offsets_at_records.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p,
        ]
        lib.dx_u64_diff_sorted_unique.restype = ctypes.c_int64
        lib.dx_u64_diff_sorted_unique.argtypes = [
            ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.dx_cset_new.restype = ctypes.c_void_p
        lib.dx_cset_new.argtypes = [ctypes.c_int64]
        lib.dx_cset_free.argtypes = [ctypes.c_void_p]
        lib.dx_cset_size.restype = ctypes.c_int64
        lib.dx_cset_size.argtypes = [ctypes.c_void_p]
        lib.dx_cset_insert.restype = ctypes.c_int64
        lib.dx_cset_insert.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.dx_cset_export_sorted.restype = ctypes.c_int64
        lib.dx_cset_export_sorted.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32,
        ]
        lib.dx_u64_sorted_unique.restype = ctypes.c_int
        lib.dx_u64_sorted_unique.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.dx_u64_sort_unique.restype = ctypes.c_int64
        lib.dx_u64_sort_unique.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
        lib.dx_probe_build.restype = ctypes.c_void_p
        lib.dx_probe_build.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.dx_probe_save.restype = ctypes.c_int
        lib.dx_probe_save.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.dx_probe_load.restype = ctypes.c_void_p
        lib.dx_probe_load.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.dx_probe_free.argtypes = [ctypes.c_void_p]
        lib.dx_probe_query.restype = None
        lib.dx_probe_query.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.dx_filter_run.restype = ctypes.c_int
        lib.dx_filter_run.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_double, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.dx_open_range.restype = ctypes.c_void_p
        lib.dx_open_range.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.dx_index_write_sorted.restype = ctypes.c_int
        lib.dx_index_write_sorted.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.dx_runacc_new.restype = ctypes.c_void_p
        lib.dx_runacc_new.argtypes = [ctypes.c_int64]
        lib.dx_runacc_free.argtypes = [ctypes.c_void_p]
        lib.dx_runacc_add.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.dx_runacc_finish_write.restype = ctypes.c_int64
        lib.dx_runacc_finish_write.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.dx_runacc_unique_count.restype = ctypes.c_int64
        lib.dx_runacc_unique_count.argtypes = [ctypes.c_void_p]
        lib.dx_runacc_export_sorted.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.dx_extract_batch.restype = ctypes.c_int64
        lib.dx_extract_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_float, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ]
        _lib = lib
        return _lib


_MADV_HUGEPAGE = 14  # linux


def empty_huge(n: int, dtype) -> np.ndarray:
    """np.empty with MADV_HUGEPAGE advice on big buffers: first-touch page
    faults cost ~10-20 us on VM nested paging, and genome-scale pipelines
    allocate GBs of scratch — 2 MB pages cut the fault count ~500x."""
    arr = np.empty(n, dtype=dtype)
    if arr.nbytes >= (4 << 20) and os.environ.get("DEACON_THP") == "1":
        try:
            libc = ctypes.CDLL(None, use_errno=True)
            addr = arr.ctypes.data
            base = addr & ~0xFFF  # page-align down (advice is page-granular)
            libc.madvise(
                ctypes.c_void_p(base),
                ctypes.c_size_t(arr.nbytes + (addr - base)),
                _MADV_HUGEPAGE,
            )
        except Exception:
            pass
    return arr


def native_extract_batch(arena: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                         k: int, w: int, index_mode: bool,
                         entropy_threshold: float = 0.0, n_threads: int = 0,
                         scratch: dict | None = None):
    """Batched host minimizer extraction (C++ engine; bit-identical to the
    NumPy oracle). Returns (hashes u64, positions u32, counts i64) or None
    if the native lib is unavailable.

    ``scratch``: an empty dict owned by the caller to reuse the output
    buffers across calls (the returned arrays are then views into them —
    consume or copy before the next call). Saves a GB-scale page-fault
    storm per genome on fault-expensive VMs."""
    lib = get_lib()
    if lib is None:
        return None
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    n = len(lens)
    counts = np.empty(n, dtype=np.int64)
    # ~2m/(w+1) expected; start at a safe margin and double on overflow
    cap = max(1024, int(int(lens.sum()) * 2 // (w + 1) + 64 * n))
    if scratch is not None and scratch.get("hashes") is not None:
        cap = max(cap, scratch["hashes"].size)
    while True:
        if scratch is not None:
            hashes, pos = scratch.get("hashes"), scratch.get("pos")
            if hashes is None or hashes.size < cap:
                hashes = empty_huge(cap, np.uint64)
                pos = empty_huge(cap, np.uint32)
                scratch["hashes"], scratch["pos"] = hashes, pos
        else:
            hashes = empty_huge(cap, np.uint64)
            pos = empty_huge(cap, np.uint32)
        total = lib.dx_extract_batch(
            arena.ctypes.data_as(ctypes.c_void_p),
            starts.ctypes.data_as(ctypes.c_void_p),
            lens.ctypes.data_as(ctypes.c_void_p),
            n, k, w, 1 if index_mode else 0,
            ctypes.c_float(entropy_threshold),
            hashes.ctypes.data_as(ctypes.c_void_p),
            pos.ctypes.data_as(ctypes.c_void_p),
            counts.ctypes.data_as(ctypes.c_void_p),
            cap, n_threads if n_threads > 0 else (os.cpu_count() or 1),
        )
        if total >= 0:
            return hashes[:total], pos[:total], counts
        cap *= 2


def native_pack_tile(arena: np.ndarray, starts: np.ndarray, lens: np.ndarray,
                     R: int, L: int):
    """Pack row slices of a byte arena into the device tile layout
    (bit-packed codes (R, L/4) + validity (R, L/8)); None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    assert L % 8 == 0
    codes4 = np.empty((R, L // 4), dtype=np.uint8)
    valid8 = np.empty((R, L // 8), dtype=np.uint8)
    starts = np.ascontiguousarray(starts, dtype=np.int64)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    lib.dx_pack_tile(
        arena.ctypes.data_as(ctypes.c_void_p),
        starts.ctypes.data_as(ctypes.c_void_p),
        lens.ctypes.data_as(ctypes.c_void_p),
        len(lens), R, L,
        codes4.ctypes.data_as(ctypes.c_void_p),
        valid8.ctypes.data_as(ctypes.c_void_p),
    )
    return codes4, valid8


def native_interleave_tile(codes4: np.ndarray, valid8: np.ndarray):
    """Derive the kernel-v3 interleaved planes from the linear packed tile
    planes (C++ twin of engine.host_interleave_packed); None if the native
    library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    R, Lp = codes4.shape
    L = Lp * 4
    if L % 64 != 0 or valid8.shape != (R, L // 8):
        return None
    codes4 = np.ascontiguousarray(codes4)
    valid8 = np.ascontiguousarray(valid8)
    il_codes = np.empty_like(codes4)
    il_valid = np.empty_like(valid8)
    lib.dx_interleave_tile(
        codes4.ctypes.data_as(ctypes.c_void_p),
        valid8.ctypes.data_as(ctypes.c_void_p),
        R, L,
        il_codes.ctypes.data_as(ctypes.c_void_p),
        il_valid.ctypes.data_as(ctypes.c_void_p),
    )
    return il_codes, il_valid


def native_cuckoo_build(keys: np.ndarray, B: int, c1: int, c2: int):
    """Bucketized-cuckoo probe table build (C++); returns the (B, 4) u32
    plane or None (native unavailable / walk failure — caller doubles B)."""
    lib = get_lib()
    if lib is None:
        return None
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    out = np.empty((B, 4), dtype=np.uint32)
    rc = lib.dx_cuckoo_build(
        keys.ctypes.data_as(ctypes.c_void_p), keys.size, B,
        ctypes.c_uint64(c1), ctypes.c_uint64(c2),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out if rc == 0 else False  # False = walk failure (caller doubles B)


def native_decode_u64_varint(buf: np.ndarray, offset: int, count: int):
    """bincode-standard varint u64 array decode; returns (values, new_offset)
    or None if unavailable. Raises ValueError on malformed input."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(count, dtype=np.uint64)
    buf = np.ascontiguousarray(buf, dtype=np.uint8)
    if count >= 1_000_000:
        # real hash indexes are ~100% 9-byte records: parallel fixed-stride
        # decode (threads fault their output pages concurrently — the
        # dominant cost at GB scale). -1 = mixed record sizes; fall through.
        consumed = lib.dx_decode_u64_fixed9(
            ctypes.c_void_p(buf.ctypes.data + offset),
            buf.size - offset, count, out.ctypes.data_as(ctypes.c_void_p),
            os.cpu_count() or 1,
        )
        if consumed >= 0:
            return out, offset + int(consumed)
    consumed = lib.dx_decode_u64_varint(
        ctypes.c_void_p(buf.ctypes.data + offset),
        buf.size - offset, count, out.ctypes.data_as(ctypes.c_void_p),
    )
    if consumed < 0:
        raise ValueError("Truncated or malformed bincode u64 stream")
    return out, offset + int(consumed)


def native_encode_u64_varint(vals: np.ndarray):
    """bincode-standard varint encode of a u64 array; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    out = np.empty(vals.size * 9, dtype=np.uint8)
    if vals.size >= 1_000_000 and int(vals.min()) > 0xFFFFFFFF:
        # all records are 9 bytes (real hash data): parallel encode — page
        # faults on the 9n-byte output dominate and are taken concurrently
        n = lib.dx_encode_u64_fixed9(
            vals.ctypes.data_as(ctypes.c_void_p), vals.size,
            out.ctypes.data_as(ctypes.c_void_p), os.cpu_count() or 1,
        )
    else:
        n = lib.dx_encode_u64_varint(
            vals.ctypes.data_as(ctypes.c_void_p), vals.size,
            out.ctypes.data_as(ctypes.c_void_p),
        )
    # buffer-protocol view, not tobytes(): callers stream it to a file and
    # a GB-scale copy would cost more than the encode itself
    return out[:n]


class NativeProbe:
    """Single-miss linear-probing membership table over a sorted unique
    uint64 array (~100x faster than np.searchsorted for large indexes).

    dx_probe_build copies the keys into its own slot table, so no reference
    to the keys array is retained — callers may free it after construction
    (panhuman-scale arrays are multi-GB)."""

    def __init__(self, keys: np.ndarray, lib):
        self._lib = lib
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        self._h = lib.dx_probe_build(
            keys.ctypes.data_as(ctypes.c_void_p), keys.size
        )
        if not self._h:
            # mmap/rebuild failure inside the native builder: surface a
            # Python error instead of a NULL-handle segfault on first query
            raise MemoryError(
                f"native probe table build failed for {keys.size} keys"
            )

    def query(self, q: np.ndarray) -> np.ndarray:
        q = np.ascontiguousarray(q, dtype=np.uint64)
        out = np.empty(q.size, dtype=np.uint8)
        self._lib.dx_probe_query(
            self._h,
            None,  # keys unused (ABI slot retained)
            q.ctypes.data_as(ctypes.c_void_p),
            q.size,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        return out.view(bool)

    def __del__(self):
        try:
            if self._h:
                self._lib.dx_probe_free(self._h)
                self._h = None
        except Exception:
            pass


def native_filter_run(
    input_path: str,
    input2_path: str | None,
    output_path: str,
    output2_path: str | None,
    out_codec: int,
    out_level: int,
    out2_codec: int,
    out2_level: int,
    probe: "NativeProbe",
    k: int,
    w: int,
    prefix_length: int,
    abs_threshold: int,
    rel_threshold: float,
    deplete: bool,
    rename: bool,
    n_threads: int,
    progress: np.ndarray,
    byte_range: tuple[int, int] | None = None,
    byte_range2: tuple[int, int] | None = None,
) -> None:
    """Run the full native filter pipeline (reader -> extraction workers ->
    ordered writer; the C++ twin of filter/engine.py's host path). `progress`
    is an int64[6] array updated live: total_seqs, filtered_seqs, total_bp,
    output_bp, filtered_bp, output_seq_counter. Raises ValueError with the
    native error message on failure. Blocks until EOF (the GIL is released,
    so a Python thread can poll `progress` for the spinner)."""
    lib = get_lib()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    errbuf = ctypes.create_string_buffer(512)
    rc = lib.dx_filter_run(
        input_path.encode(),
        None if input2_path is None else input2_path.encode(),
        output_path.encode(),
        None if output2_path is None else output2_path.encode(),
        out_codec, out_level, out2_codec, out2_level,
        None,  # index_keys unused by the pipeline (ABI slot retained)
        probe._h,
        k, w, prefix_length, abs_threshold, rel_threshold,
        1 if deplete else 0, 1 if rename else 0, n_threads,
        progress.ctypes.data_as(ctypes.c_void_p),
        errbuf, len(errbuf),
        -1 if byte_range is None else byte_range[0],
        -1 if byte_range is None else byte_range[1],
        -1 if byte_range2 is None else byte_range2[0],
        -1 if byte_range2 is None else byte_range2[1],
    )
    if rc != 0:
        raise ValueError(errbuf.value.decode("utf-8", "replace") or "native filter failed")


def native_probe(keys: np.ndarray):
    """Build a NativeProbe, or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    return NativeProbe(keys, lib)


def _probe_sidecar_identity(index_path: str) -> tuple[str, int, int]:
    st = os.stat(index_path)
    return (
        str(index_path) + ".probe",
        int(st.st_size),
        int(getattr(st, "st_mtime_ns", int(st.st_mtime * 1e9))),
    )


def native_probe_load_sidecar(index_path: str, expect_count: int):
    """mmap a prebuilt probe table from `<index>.probe`, or None when the
    sidecar is missing/stale (bound to the index file's size+mtime+count).
    A hit removes both the multi-GB hash decode and the table build from
    filter startup."""
    lib = get_lib()
    if lib is None:
        return None
    try:
        sidecar, size, mtime_ns = _probe_sidecar_identity(index_path)
    except OSError:
        return None
    h = lib.dx_probe_load(sidecar.encode(), expect_count, size, mtime_ns)
    if not h:
        return None
    probe = NativeProbe.__new__(NativeProbe)
    probe._lib = lib
    probe._h = h
    return probe


def native_probe_save_sidecar(probe: "NativeProbe", index_path: str,
                              key_count: int) -> bool:
    lib = get_lib()
    if lib is None or probe is None or not getattr(probe, "_h", None):
        return False
    try:
        sidecar, size, mtime_ns = _probe_sidecar_identity(index_path)
    except OSError:
        return False
    return lib.dx_probe_save(
        probe._h, sidecar.encode(), key_count, size, mtime_ns
    ) == 0


def native_u64_sort_unique(vals: np.ndarray, n_threads: int = 0):
    """Parallel in-place sort + dedup of a uint64 array; returns the sorted
    unique view (a slice of `vals`), or None if the native lib is
    unavailable. `vals` must be contiguous and owned by the caller."""
    lib = get_lib()
    if lib is None:
        return None
    assert vals.dtype == np.uint64 and vals.flags.c_contiguous
    assert vals.flags.writeable, "in-place sort needs a writeable array"
    cnt = lib.dx_u64_sort_unique(
        vals.ctypes.data_as(ctypes.c_void_p), vals.size,
        n_threads if n_threads > 0 else (os.cpu_count() or 1),
    )
    return vals[:cnt]


def native_u64_merge_sorted_unique(a: np.ndarray, b: np.ndarray):
    """Merge two sorted-unique uint64 arrays, dropping cross-duplicates.
    Returns a fresh array, or None if the native lib is unavailable.
    Linear pass — far cheaper than re-sorting the concatenation when both
    sides are already sorted (the index-build staging merge)."""
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    out = np.empty(a.size + b.size, dtype=np.uint64)
    cnt = lib.dx_u64_merge_sorted_unique(
        a.ctypes.data_as(ctypes.c_void_p), a.size,
        b.ctypes.data_as(ctypes.c_void_p), b.size,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    # the slice would pin the full a+b allocation; copy when the overlap
    # shrank it enough that freeing the backing buffer pays for the memcpy
    # (matters at panhuman scale: union of two near-identical 3.2 GB
    # indexes would otherwise hold 6.4 GB alive)
    return out[:cnt].copy() if cnt < out.size // 2 else out[:cnt]


def native_index_write_sorted(
    keys: np.ndarray, path: str, format_version: int, k: int, w: int,
    trailer: bytes, n_threads: int = 0,
) -> bool:
    """Write a full bincode index stream (header, count, varint hashes,
    raw trailer) from a sorted-unique u64 array — parallel chunk encode,
    sequential write. Returns False when the native lib is unavailable;
    raises OSError on write failure."""
    lib = get_lib()
    if lib is None:
        return False
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    errbuf = ctypes.create_string_buffer(256)
    rc = lib.dx_index_write_sorted(
        keys.ctypes.data_as(ctypes.c_void_p), keys.size, path.encode(),
        format_version, k, w, trailer, len(trailer),
        n_threads if n_threads > 0 else (os.cpu_count() or 1),
        errbuf, len(errbuf),
    )
    if rc != 0:
        raise OSError(errbuf.value.decode("utf-8", "replace") or "index write failed")
    return True


class NativeRunAcc:
    """Scatter-accumulator for index build (dx_runacc_*): raw hash batches
    are bucketed by top byte as they arrive; finish_write() sorts + dedups
    the buckets in parallel and streams the encoded index to disk — no
    concatenation and no giant global sort. finish_write() returns the
    distinct count, or None when the count has no canonical 252-form varint
    (tiny or >2^32 — call export_sorted() and take the generic path)."""

    def __init__(self, capacity_hint: int = 0):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._h = lib.dx_runacc_new(capacity_hint)
        if not self._h:
            raise MemoryError("dx_runacc_new failed")

    def add(self, hashes: np.ndarray) -> None:
        hashes = np.ascontiguousarray(hashes, dtype=np.uint64)
        if hashes.size:
            self._lib.dx_runacc_add(
                self._h, hashes.ctypes.data_as(ctypes.c_void_p), hashes.size
            )

    def finish_write(self, path: str, format_version: int, k: int, w: int,
                     trailer: bytes, n_threads: int = 0):
        rc = self._finish_rc = self._lib.dx_runacc_finish_write(
            self._h, path.encode(), format_version, k, w,
            trailer, len(trailer),
            n_threads if n_threads > 0 else (os.cpu_count() or 1),
            None, 0,
        )
        if rc == -1:
            raise OSError("index write failed")
        return None if rc == -2 else int(rc)

    def export_sorted(self) -> np.ndarray:
        """Valid after finish_write() returned None: the sorted-unique keys."""
        n = int(self._lib.dx_runacc_unique_count(self._h))
        out = np.empty(n, dtype=np.uint64)
        if n:
            self._lib.dx_runacc_export_sorted(
                self._h, out.ctypes.data_as(ctypes.c_void_p)
            )
        return out

    def close(self) -> None:
        if self._h:
            self._lib.dx_runacc_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeCountingSet:
    """u64 set with batch insert returning the number of NEW keys — the
    reference's FxHashSet role at index-build time (ref: src/index.rs:96-107,
    266-284). 256-way partitioned open addressing in C++; export_sorted()
    returns the keys ascending, ready for the index codec."""

    def __init__(self, capacity_hint: int = 0):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._h = lib.dx_cset_new(int(capacity_hint))

    def insert(self, keys: np.ndarray, n_threads: int = 0) -> int:
        """Returns how many of `keys` were not previously present."""
        keys = np.ascontiguousarray(keys, dtype=np.uint64)
        if keys.size == 0:
            return 0
        return int(self._lib.dx_cset_insert(
            self._h, keys.ctypes.data_as(ctypes.c_void_p), keys.size,
            n_threads if n_threads > 0 else (os.cpu_count() or 1),
        ))

    def __len__(self) -> int:
        return int(self._lib.dx_cset_size(self._h))

    def export_sorted(self, n_threads: int = 0) -> np.ndarray:
        out = np.empty(len(self), dtype=np.uint64)
        cnt = self._lib.dx_cset_export_sorted(
            self._h, out.ctypes.data_as(ctypes.c_void_p),
            n_threads if n_threads > 0 else (os.cpu_count() or 1),
        )
        return out[:cnt]

    def close(self):
        if self._h:
            self._lib.dx_cset_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def native_u64_diff_sorted_unique(a: np.ndarray, b: np.ndarray):
    """A \\ B for sorted-unique uint64 arrays: one linear pass (native),
    instead of np.setdiff1d's sort of the concatenation. Returns a fresh
    array, or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    a = np.ascontiguousarray(a, dtype=np.uint64)
    b = np.ascontiguousarray(b, dtype=np.uint64)
    out = np.empty(a.size, dtype=np.uint64)
    cnt = lib.dx_u64_diff_sorted_unique(
        a.ctypes.data_as(ctypes.c_void_p), a.size,
        b.ctypes.data_as(ctypes.c_void_p), b.size,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out[:cnt].copy() if cnt < out.size // 2 else out[:cnt]


def maybe_save_probe_sidecar(probe: "NativeProbe", index_path: str,
                             key_count: int) -> bool:
    """Policy-gated sidecar save shared by the filter engine and the
    server: DEACON_PROBE_CACHE=0 never writes, =1 writes for any size,
    default writes for indexes >= 4M keys (~40 MB sidecar)."""
    cache = os.environ.get("DEACON_PROBE_CACHE", "")
    if cache == "0" or (cache != "1" and key_count < 4_000_000):
        return False
    try:
        return native_probe_save_sidecar(probe, index_path, key_count)
    except Exception:
        return False


def native_u64_sorted_unique(vals: np.ndarray):
    """True/False, or None if the native lib is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    return bool(lib.dx_u64_sorted_unique(
        vals.ctypes.data_as(ctypes.c_void_p), vals.size
    ))


class NativeFastxReader:
    """Batch-oriented reader over the native parser.

    Exposes both the Record-iterator protocol (drop-in for FastxReader) and
    a zero-copy-ish batch API used by the device pipeline.
    """

    def __init__(self, path: str | None, batch_mb: int = 64,
                 byte_range: "tuple[int, int] | None" = None):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        p = b"-" if path is None or str(path) == "-" else str(path).encode()
        if byte_range is not None:
            self._h = lib.dx_open_range(p, byte_range[0], byte_range[1])
        else:
            self._h = lib.dx_open(p)
        if not self._h:
            raise OSError(f"Failed to open {path!r}")
        self._max_batch_bytes = max(1, batch_mb) * 1024 * 1024
        self._queue: list[Record] = []
        self._qi = 0
        self._done = False

    def close(self):
        if self._h:
            self._lib.dx_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def read_batch_raw(self, max_records: int):
        """Returns (meta int64[(n,6)], arena view uint8, is_fastq) for up to
        max_records records; n == 0 at EOF. Raises on parse errors.

        Zero-copy: both views alias reader-owned C++ buffers and are
        INVALIDATED by the next read_batch_raw call (the previous contract
        already reused the arena between calls)."""
        if self._done:
            return (
                np.empty((0, 6), dtype=np.int64),
                np.empty(0, dtype=np.uint8),
                self._lib.dx_is_fastq(self._h) == 1 if self._h else False,
            )
        arena_p = ctypes.POINTER(ctypes.c_uint8)()
        arena_len = ctypes.c_int64()
        meta_p = ctypes.POINTER(ctypes.c_int64)()
        n = self._lib.dx_next_batch_view(
            self._h,
            max_records,
            self._max_batch_bytes,
            ctypes.byref(arena_p),
            ctypes.byref(arena_len),
            ctypes.byref(meta_p),
        )
        if n < 0:
            err = self._lib.dx_error(self._h).decode("utf-8", "replace")
            raise FastxParseError(err or "native parse error")
        if n == 0:
            self._done = True
            return (
                np.empty((0, 6), dtype=np.int64),
                np.empty(0, dtype=np.uint8),
                self._lib.dx_is_fastq(self._h) == 1,
            )
        is_fastq = self._lib.dx_is_fastq(self._h) == 1
        meta = np.ctypeslib.as_array(meta_p, shape=(int(n), 6))
        arena = np.ctypeslib.as_array(arena_p, shape=(int(arena_len.value),))
        return meta, arena, is_fastq

    # ------------------------------------------------------------------
    # Record-iterator protocol
    # ------------------------------------------------------------------
    def __iter__(self):
        return self

    def __next__(self) -> Record:
        if self._qi >= len(self._queue):
            meta, arena, is_fastq = self.read_batch_raw(8192)
            if meta.shape[0] == 0:
                raise StopIteration
            self._queue = []
            self._qi = 0
            ab = arena.tobytes()  # single copy for the whole batch
            for i in range(meta.shape[0]):
                io_, il, so_, sl, qo_, ql = (int(x) for x in meta[i])
                rid = ab[io_ : io_ + il]
                seq = ab[so_ : so_ + sl]
                qual = ab[qo_ : qo_ + ql] if qo_ >= 0 else None
                self._queue.append(Record(rid, seq, qual, qo_ >= 0))
        rec = self._queue[self._qi]
        self._qi += 1
        return rec


_CODEC_BY_EXT = {".gz": 1, ".zst": 2, ".xz": 3}


class NativeWriter:
    """Drop-in for io.writers.FastxWriter backed by the native encoder."""

    def __init__(self, path: str, codec: int, level: int):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._h = lib.dx_writer_open(path.encode(), codec, level)
        if not self._h:
            raise OSError(f"Failed to create output file: {path}")

    def write(self, data: bytes) -> None:
        if self._lib.dx_writer_write(self._h, data, len(data)) != 0:
            raise OSError("native write failed")

    def flush(self) -> None:
        pass

    def finish(self) -> None:
        if self._h:
            rc = self._lib.dx_writer_close(self._h)
            self._h = None
            if rc != 0:
                raise OSError("native writer close failed")


def open_native_reader(path: str | None, byte_range=None):
    """Returns NativeFastxReader or None if unavailable."""
    if get_lib() is None:
        return None
    try:
        return NativeFastxReader(path, byte_range=byte_range)
    except OSError:
        raise
    except Exception:
        return None
