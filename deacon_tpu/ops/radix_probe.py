"""Arch-5 "radix-window" membership probe: gather-free, bandwidth-side.

Round-3 profiling showed TPU random gathers are element-serial (~7-22 ns
per query regardless of table size), putting a ~0.25 Gbp/s ceiling on any
gather-based probe (r3 VERDICT missing #1).  This module replaces random
access entirely:

  * The index is bucketized by the TOP P BITS of the u64 key (xxh3 hashes
    are uniform, so buckets are Poisson-balanced) and padded to a static
    K slots per bucket, stored as 8 little-endian BYTE PLANES (int8) so
    an MXU int8 one-hot matmul can "gather" a query's bucket row.
  * At step time queries are sorted by key; each group of consecutive
    buckets then owns a CONTIGUOUS window of the sorted queries, fetched
    with sequential DMA (no gather), compared densely in VMEM.
  * An empty slot in bucket b holds key ((b^1) << (64-P)) whose top bits
    differ from b, so it can never equal a query routed to b — no
    sentinel flag needed (unlike the cuckoo planes' 0xFF.. sentinel).

Reference parity: this implements the FxHashSet membership of
/root/reference/src/index.rs:96-107 and the distinct-hit semantics of
/root/reference/src/filter_common.rs:129-155, re-architected for TPU.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

__all__ = [
    "RadixTable", "build_radix_table", "oracle_member", "choose_p",
]

#: slot-count granule: TPU lane-dim slices must be 128-aligned, and HBM
#: pads the minor dim to 128 regardless — so K is 128 or 256
K_GRANULE = 128
#: largest table this probe will build (beyond this the caller falls
#: back to other probes / sharding); bytes ~= 2^P * K * 8
MAX_LOG2_BUCKETS = 25

#: (q, p) shapes already warned about in _radix_sizing's VMEM-cliff check
_SIZING_CLIFF_WARNED: set = set()


@dataclass
class RadixTable:
    """Bucketized byte-plane membership table.

    planes: (2**p, k * nplanes) int8 — column b*k + j is byte b
    (little-endian) of the key in slot j.  Top key bytes that are fully
    implied by the bucket id are NOT stored (nplanes < 8): a query is
    routed by its own top bits, so those bytes always match.  The
    empty-slot filler ((bucket ^ 1) << (64-P)) flips bucket bit 0 = key
    bit (64-P), which lies inside the stored bytes whenever
    64-P <= 8*nplanes - 1 — guaranteed by n_planes_for().
    n_keys counts DISTINCT keys stored.

    Round 5: P targets a mean bucket load of ~97 (vs the old ~49) and
    K is pinned at 128; the Poisson tail of buckets holding >128 keys
    (~0.1% of buckets) spills its excess into ``spill`` — a tiny
    (2**sp, 8*128) int8 side table, bucketed by the top SP bits and
    storing ALL 8 key bytes (its bucket id implies too few bits).  It is
    VMEM-resident in the device kernel and probed in the same pass, so
    halving the main table's row count (and with it the slab windows and
    the HBM stream) costs one extra small one-hot matmul per
    sub-window.  sp == 0 means no spill (the common case for loads
    landing below ~85).
    """

    planes: np.ndarray
    p: int
    k: int
    n_keys: int
    fp: str
    spill: np.ndarray | None = None
    sp: int = 0

    @property
    def nplanes(self) -> int:
        return self.planes.shape[1] // self.k

    @property
    def n_spill_rows(self) -> int:
        return (1 << self.sp) if self.sp else 0

    @property
    def nbytes(self) -> int:
        return self.planes.nbytes + (
            self.spill.nbytes if self.spill is not None else 0
        )


def n_planes_for(p: int) -> int:
    """Stored byte planes: drop top bytes implied by the bucket id,
    keeping the empty-filler's flipped bit (64-p) inside stored bytes."""
    implied_bits = min(p - 1, 16)  # keep >= 6 planes; bit 64-p must remain
    return 8 - implied_bits // 8


def choose_p(n: int) -> int:
    """Bucket bits.  Base rule: smallest P with expected load <= 80
    (K=128 is then a +5.4 sigma ceiling).  Spill tier (r5): when that P
    would exceed 2**22 rows — the single-chip kernel's window-sizing
    ceiling at the canonical ~2.4M-query sort length — drop one level if
    load <= 100 fits there; the ~0.1% Poisson tail of buckets beyond
    K=128 spills its excess to the side table, halving table bytes and
    alpha.  This is exactly what makes panhuman-1 (410M keys -> p=22,
    load 97.7) run the compiled kernel at all; smaller tables keep the
    spill-free layout (the spill compare costs ~+1.3 ms/step).  Floor
    of 5 keeps 2**p >= the 32-row DMA alignment granule."""
    p = 5
    while (n >> p) > 80:
        p += 1
    if p > 22 and (n >> (p - 1)) <= 100:
        p -= 1
    return p


def _pack_planes(keys: np.ndarray, p: int, k: int):
    """(2**p, k*nplanes) int8 byte planes from sorted unique u64 keys,
    plus the sorted spill keys (rank >= k within their bucket)."""
    nb = 1 << p
    npl = n_planes_for(p)
    b = (keys >> np.uint64(64 - p)).astype(np.int64)
    counts = np.bincount(b, minlength=nb)
    # slot index of each key within its bucket (keys sorted => buckets
    # are contiguous runs; rank within run)
    starts = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    j = np.arange(keys.size, dtype=np.int64) - starts[b]
    spill_keys = keys[j >= k]
    if spill_keys.size:
        keep = j < k
        keys = keys[keep]
        b = b[keep]
        j = j[keep]
    # empty-slot filler: ((b ^ 1) << (64-P)) — differs from any key of
    # bucket b at stored bit (64-p)
    empty = (np.arange(nb, dtype=np.uint64) ^ np.uint64(1)) << np.uint64(64 - p)
    slots = np.repeat(empty, k).reshape(nb, k)
    slots[b, j] = keys
    # bytes: little-endian; planes column b*k + j, top implied bytes dropped
    by = slots.view(np.uint8).reshape(nb, k, 8)
    if sys_byteorder_big():
        by = by[:, :, ::-1]
    planes = np.ascontiguousarray(
        by[:, :, :npl].transpose(0, 2, 1).reshape(nb, npl * k)
    ).view(np.int8)
    return planes, spill_keys


#: spill side-table geometry: K=128 slots, all 8 byte planes stored,
#: bucket rows capped so the table stays VMEM-resident in the kernel
SPILL_K = 128
SPILL_NPL = 8
MAX_SPILL_BITS = 9


def _pack_spill(spill_keys: np.ndarray):
    """Pack the spilled keys into a (2**sp, 8*128) int8 byte-plane table
    bucketed by the TOP SP bits (all 8 bytes stored — sp implies too few
    bits to drop any).  Returns (planes, sp) or None when even sp=9
    (512 rows) cannot hold the realized max bucket (caller bumps p)."""
    n = int(spill_keys.size)
    # floor 7 (128 rows): keeps the kernel's one-hot contraction dim at
    # the 128 MXU granule; the table is tiny either way (<= 512 KB)
    sp = 7
    while (n >> sp) > 64 and sp < MAX_SPILL_BITS:
        sp += 1
    while sp <= MAX_SPILL_BITS:
        nb = 1 << sp
        b = (spill_keys >> np.uint64(64 - sp)).astype(np.int64)
        if np.bincount(b, minlength=nb).max(initial=0) <= SPILL_K:
            break
        sp += 1
    else:
        return None
    if sp > MAX_SPILL_BITS:
        return None
    nb = 1 << sp
    b = (spill_keys >> np.uint64(64 - sp)).astype(np.int64)
    counts = np.bincount(b, minlength=nb)
    starts = np.zeros(nb + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    j = np.arange(n, dtype=np.int64) - starts[b]
    empty = (
        (np.arange(nb, dtype=np.uint64) ^ np.uint64(1)) << np.uint64(64 - sp)
    )
    slots = np.repeat(empty, SPILL_K).reshape(nb, SPILL_K)
    slots[b, j] = spill_keys
    by = slots.view(np.uint8).reshape(nb, SPILL_K, 8)
    if sys_byteorder_big():
        by = by[:, :, ::-1]
    planes = np.ascontiguousarray(
        by.transpose(0, 2, 1).reshape(nb, SPILL_NPL * SPILL_K)
    ).view(np.int8)
    return planes, sp


def sys_byteorder_big() -> bool:
    import sys

    return sys.byteorder == "big"


def _fingerprint(arr: np.ndarray) -> str:
    from .engine import _keys_fingerprint

    return _keys_fingerprint(arr)


def build_radix_table(
    index_hashes: np.ndarray, cache_path: str | None = None
) -> RadixTable | None:
    """Build (or load from the `<index>.radix` sidecar) the byte-plane
    table.  Returns None when the index would exceed MAX_LOG2_BUCKETS
    (caller falls back — same contract as build_cuckoo_planes)."""
    arr = np.unique(np.asarray(index_hashes, dtype=np.uint64))
    fp = _fingerprint(arr)
    if cache_path is not None:
        t = _sidecar_load(str(cache_path), int(arr.size), fp)
        if t is not None:
            return t
    p = choose_p(arr.size)
    k = K_GRANULE
    while True:
        if p > MAX_LOG2_BUCKETS:
            return None
        max_gb = float(os.environ.get("DEACON_RADIX_MAX_GB", "8"))
        if (1 << p) * n_planes_for(p) * k > max_gb * 1e9:
            return None  # caller falls back (cuckoo, then sorted planes)
        planes, spill_keys = _pack_planes(arr, p, k)
        if spill_keys.size == 0:
            t = RadixTable(planes, p, k, int(arr.size), fp)
            break
        packed = _pack_spill(spill_keys)
        if packed is not None:
            spill, sp = packed
            t = RadixTable(planes, p, k, int(arr.size), fp, spill, sp)
            break
        p += 1  # extreme skew (can't happen for real hashes): split finer
    if cache_path is not None:
        _sidecar_save(str(cache_path), t)
    return t


def oracle_member(t: RadixTable, keys: np.ndarray) -> np.ndarray:
    """NumPy reference of the device probe: bucket by top-P bits, compare
    byte planes across the K slots; spilled keys via the side table
    (test oracle)."""
    q = np.asarray(keys, dtype=np.uint64)
    npl = t.nplanes
    b = (q >> np.uint64(64 - t.p)).astype(np.int64)
    rows = t.planes[b].reshape(q.size, npl, t.k)  # (n, byte, slot)
    qb = q[:, None].view(np.uint8).reshape(q.size, 8).view(np.int8)
    if sys_byteorder_big():
        qb = qb[:, ::-1]
    m = (rows == qb[:, :npl, None]).all(axis=1).any(axis=1)
    if t.sp:
        bs = (q >> np.uint64(64 - t.sp)).astype(np.int64)
        srows = t.spill[bs].reshape(q.size, SPILL_NPL, SPILL_K)
        m |= (srows == qb[:, :, None]).all(axis=1).any(axis=1)
    return m


# ---------------------------------------------------------------------------
# sidecar cache (mirrors the .cuckoo sidecar identity rules: size +
# mtime_ns + key count + content fingerprint)
# ---------------------------------------------------------------------------

def _token(index_path: str):
    st = os.stat(index_path)
    return {"size": st.st_size, "mtime_ns": st.st_mtime_ns}


def _sidecar_load(index_path: str, n_keys: int, fp: str) -> RadixTable | None:
    meta_p = index_path + ".radix.json"
    tab_p = index_path + ".radix"
    try:
        if not (os.path.exists(meta_p) and os.path.exists(tab_p)):
            return None
        with open(meta_p) as f:
            meta = json.load(f)
        tok = _token(index_path)
        if (
            meta.get("version") != 2
            or meta.get("size") != tok["size"]
            or meta.get("mtime_ns") != tok["mtime_ns"]
            or meta.get("n_keys") != n_keys
            or meta.get("keys_fp") != fp
        ):
            return None
        p, k = int(meta["p"]), int(meta["k"])
        sp = int(meta.get("sp", 0))
        npl = n_planes_for(p)
        main = (1 << p) * npl * k
        sp_sz = ((1 << sp) * SPILL_NPL * SPILL_K) if sp else 0
        planes = np.fromfile(tab_p, dtype=np.int8)
        if planes.size != main + sp_sz:
            return None
        spill = (
            planes[main:].reshape(1 << sp, SPILL_NPL * SPILL_K)
            if sp else None
        )
        return RadixTable(
            planes[:main].reshape(1 << p, npl * k), p, k, n_keys, fp,
            spill, sp,
        )
    except Exception:
        return None


def _sidecar_save(index_path: str, t: RadixTable) -> None:
    try:
        tok = _token(index_path)
        tab_p = index_path + ".radix"
        tmp = tab_p + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            t.planes.tofile(f)
            if t.sp:
                t.spill.tofile(f)
        os.replace(tmp, tab_p)
        meta = {
            "version": 2, "p": t.p, "k": t.k, "sp": t.sp,
            "n_keys": t.n_keys, "keys_fp": t.fp, **tok,
        }
        tmpm = index_path + f".radix.json.tmp.{os.getpid()}"
        with open(tmpm, "w") as f:
            json.dump(meta, f)
        os.replace(tmpm, index_path + ".radix.json")
    except Exception:
        pass


# ===========================================================================
# Device probe (arch 5): sort + static-tile Pallas kernel
# ===========================================================================
#
# Step shape: the engine's (R, Br) slot grids are flattened to Q queries,
# sorted by (key_hi, key_lo, rid), and processed in STATIC tiles of TQ
# consecutive sorted queries (the i32 HBM DMA granule is 1024 elements, so
# dynamic per-group windows are impossible; static tiles also delete the
# whole group-histogram/window machinery).  Per tile the kernel DMAs a
# slab of table rows at a prefetched 32-aligned base (double-buffered),
# probes sub-windows of SUB queries via int8 one-hot matmuls against
# 32-aligned VMEM sub-slices, and accumulates a factorized (128,128) rid
# histogram of member&first flags on the MXU — hits per read, no random
# HBM access anywhere.  Invalid slots become MAX-key filler entries that
# sort to the global tail (the valid bit rides the rid sort operand, so
# reals precede any equal-key filler and a collision cannot suppress a
# first-flag): all-filler tiles are skipped outright and every window
# span is a real-query span, so probe cost tracks the batch's real
# minimizer count.

def _radix_sizing(q: int, p: int, max_fw: int | None = None,
                  compacted: bool = False, warn: bool = True):
    """Static tile sizing for (queries, table bits) — returns dict or
    None when the shape can't run the kernel (caller falls back).

    ``fsub`` (the static per-sub gather window) carries sparse headroom:
    it covers the span of 128 consecutive REAL queries down to 1/SPARSE
    of the grid slots being real (sparser batches overflow and rerun via
    the emulation).  Measured on v5e, widening 224 -> 448 costs only
    ~0.5 ms/step — a per-sub lax.cond narrow/wide switch was measured at
    +6 ms and rejected (PERFNOTES round 4), so the kernel always gathers
    at the full ``fsub``; ``fs`` (the dense-density width) is kept for
    sizing diagnostics.  The slab is fetched in CH-row DMA ladder
    chunks, so a tile only streams the table rows its real queries
    span.

    ``compacted`` (r5): the caller stable-splits the reals to the front
    before the sort, so the sorted real prefix is DENSE no matter how
    empty the slot grid was — the sparse headroom drops to 1.35 (pure
    Poisson span margin) and the windows shrink ~2.5x, which is what
    lets panhuman-scale tables (p=22) fit the VMEM slab cap."""
    def a32(x):
        return max(32, (int(x) + 31) // 32 * 32)

    tq = int(os.environ.get("DEACON_RADIX_TQ", "1024"))
    tq = max(1024, tq)  # 1024 = the i32 tile granule (tq=512 fails Mosaic)
    while tq > 1024 and (q % tq or q < 2 * tq):
        tq //= 2
    if q % tq:
        return None
    # sub is pinned at 128: wider sub-windows (256) hit a Mosaic
    # "unsupported shape cast" in the hist one-hots, and the per-query
    # compare volume is sub-independent anyway
    sub = 128
    nrows = 1 << p
    alpha = nrows / q  # expected table rows per sorted query (dense)
    factor = float(os.environ.get("DEACON_RADIX_FACTOR", "1.6"))
    slack = int(os.environ.get("DEACON_RADIX_SLACK", "72"))
    # compacted: the caller stable-split the reals to the front, so qc is
    # the sized length but the REAL count can still be far below it on
    # sparse batches (compaction does not narrow the row span of 128
    # consecutive reals — that is nrows/n_real regardless of padding).
    # 2.75 preserves the uncompacted design's ABSOLUTE coverage
    # (3.5 x qc/q = 3.5 x 0.78): batches down to the same real count run
    # in-kernel, sparser ones rerun via emulation.
    sparse = float(os.environ.get(
        "DEACON_RADIX_SPARSE", "2.75" if compacted else "3.5"
    ))
    cap = nrows if max_fw is None else min(nrows, int(max_fw))
    cap = cap & ~31
    if cap < 32:
        return None
    fwcap = int(os.environ.get("DEACON_RADIX_FWCAP", "4096"))
    fs = min(a32(sub * alpha * factor + slack), cap)
    fsub = min(a32(sub * alpha * sparse * 1.25 + slack), cap)
    fsub = max(fsub, fs)
    fw = min(a32(tq * alpha * sparse * 1.25 + fsub + 64), cap)
    if compacted and fw > fwcap and "DEACON_RADIX_SPARSE" not in os.environ:
        # adaptive coverage at big-alpha tables (panhuman p=22): prefer
        # the wide 2.75x span margin, but narrow to 1.55x when that is
        # what fits the VMEM slab — batches sparser than the narrow
        # coverage rerun exactly via the emulation (one tail batch per
        # stream in practice)
        sparse = 1.55
        fsub = max(min(a32(sub * alpha * sparse * 1.25 + slack), cap), fs)
        fw = min(a32(tq * alpha * sparse * 1.25 + fsub + 64), cap)
    if fw > fwcap:  # slab VMEM cap (~2x fw x 768B buffers)
        # visibility for the perf cliff: sparse headroom (3.5x) can push
        # shapes over the VMEM cap that DENSE sizing (1.25x) would have
        # admitted — those now fall back to the much slower XLA emulation
        fw_dense = min(a32(tq * alpha * 1.25 + fs + 64), cap)
        if warn and fw_dense <= fwcap and (q, p) not in _SIZING_CLIFF_WARNED:
            _SIZING_CLIFF_WARNED.add((q, p))
            import sys
            print(
                f"deacon-tpu: radix probe sizing rejected (q={q}, p={p}: "
                f"sparse fw={fw} > {fwcap} VMEM cap, dense fw={fw_dense} "
                "would fit) — falling back to the slower XLA emulation; "
                "lower DEACON_RADIX_SPARSE if this batch shape is dense",
                file=sys.stderr,
            )
        return None
    if fsub > fw:
        fsub = fw
    if fs > fsub:
        fs = fsub
    # DMA ladder: chunk granule (fw padded up to a whole number of chunks;
    # when the padding would exceed the caps, stay single-chunk)
    ch = int(os.environ.get("DEACON_RADIX_CH", "1024"))
    if fw > ch and -(-fw // ch) * ch <= min(cap, fwcap):
        nch = -(-fw // ch)
        fw = nch * ch
    else:
        ch, nch = fw, 1
    return {"tq": tq, "sub": sub, "fs": fs, "fsub": fsub, "fw": fw,
            "ch": ch, "nch": nch, "n_tiles": q // tq}


def _prep_sorted(hlo, hhi, slot_valid, rid_s, pos_s, qc=None):
    """Flatten slot grids, swap invalid slots to the MAX filler key,
    optionally stable-split the reals to the front and slice to ``qc``
    (see _stable_split), then sort by (khi, klo, srid).  srid is built
    directly in the kernel's u32 layout — filler flag at bit31 (so reals
    sort before any equal-key filler) and rid at bits 17..30.

    Filler entries sort to the global tail (their key is the maximum
    u64), so the tiles beyond the real/filler boundary are skippable and
    every span is a REAL-query span — the probe's cost scales with the
    batch's real minimizer count, not the padded grid size."""
    import jax.numpy as jnp
    from jax import lax

    q = hhi.size
    sv = slot_valid.reshape(q)
    del pos_s  # position no longer rides the sort (nothing reads it)
    fmax = jnp.uint32(0xFFFFFFFF)
    khi = jnp.where(sv, hhi.reshape(q), fmax)
    klo = jnp.where(sv, hlo.reshape(q), fmax)
    srid = jnp.where(
        sv,
        rid_s.reshape(q).astype(jnp.uint32) << jnp.uint32(17),
        jnp.uint32(0x80000000),
    )
    ov = None
    if qc is not None and qc < q:
        khi, klo, srid, ov = _stable_split(khi, klo, srid, qc)
    skhi, sklo, ssrid = lax.sort((khi, klo, srid), num_keys=3)
    # first occurrence of (key, valid|rid): group boundaries can only be
    # equal-key, so the j=0-of-tile case needs the global shifted compare
    first = jnp.concatenate([
        jnp.ones((1,), dtype=jnp.int32),
        (
            (skhi[1:] != skhi[:-1])
            | (sklo[1:] != sklo[:-1])
            | (ssrid[1:] != ssrid[:-1])
        ).astype(jnp.int32),
    ])
    return skhi, sklo, ssrid, first, ov


def spill_window(sp: int, q: int, sub: int = 128) -> int:
    """Static per-sub spill one-hot width: sorted queries make a sub
    span ~sp_rows*sub/q spill rows (usually < 1); 32 covers production
    shapes with alignment slack, tiny-q tests get proportionally more."""
    rows = 1 << sp
    # +48: the 32-row base alignment can eat 31 rows, plus the -8 base
    # margin and span jitter
    need = int(rows * sub / max(q, 1) * 1.5 + 48)
    w = max(64, (need + 31) // 32 * 32)
    return min(rows, w)


def _bases_and_overflow(skhi, ssrid, p, sz, sp: int = 0):
    """32-aligned slab/sub-slice bases from strided boundary fids, plus
    per-tile/per-sub LAST REAL fids and the span-overflow flag (overflow
    => host reruns via the emulation).

    Spans are measured over REAL queries only (fillers sort to the tail
    with the maximum key): an all-filler tile gets last_fid=-1, which the
    kernel's activity test turns into a full compute+DMA skip.

    ``sp`` > 0 appends per-sub SPILL window bases (the sub's first real
    spill-row, aligned) and folds their span check into the overflow
    flag — the kernel then one-hots the spill compare over a
    spill_window()-row slice instead of all 2**sp rows."""
    import jax.numpy as jnp

    tq, sub, fsub, fw = sz["tq"], sz["sub"], sz["fsub"], sz["fw"]
    n_tiles = sz["n_tiles"]
    nsub = tq // sub
    nrows = 1 << p
    fid = (skhi >> jnp.uint32(32 - p)).astype(jnp.int32) if p < 32 else (
        skhi.astype(jnp.int32)
    )
    fidm = jnp.where(ssrid < jnp.uint32(0x80000000), fid, jnp.int32(-1))
    # reals sort before fillers under the same key and fillers hold the
    # maximum key, so within any tile/sub the reals are a prefix: the
    # FIRST entry is real whenever any entry is
    f_first_t = fid[::tq]                            # (n_tiles,)
    tbase = jnp.clip((f_first_t - 8) & ~31, 0, nrows - fw)
    f_first_s = fid[::sub].reshape(n_tiles, nsub)
    sbase = jnp.clip(
        ((f_first_s - 8) & ~31) - tbase[:, None], 0, fw - fsub
    )
    # last REAL fid per tile / sub-window (-1 when all filler)
    last_t = jnp.max(fidm.reshape(n_tiles, tq), axis=1)
    last_s = jnp.max(fidm.reshape(n_tiles * nsub, sub), axis=1).reshape(
        n_tiles, nsub
    )
    # span checks over real queries only
    ov_s = jnp.any(last_s - (tbase[:, None] + sbase) > fsub - 1)
    ov_t = jnp.any(last_t - tbase > fw - 1)
    ov = ov_s | ov_t
    # per-tile layout: [tile_base, tile_last_real_fid, sub_base_1..nsub,
    # (spill_sub_base_1..nsub when sp)]; the tile-level last fid drives
    # the sharded/all-filler tile skip and the DMA ladder depth (the
    # per-sub last fids feed the span check above, not the kernel)
    parts = [tbase[:, None], last_t[:, None], sbase]
    if sp:
        fsp_w = sz["fsp_w"]
        sp_rows = 1 << sp
        fidp = (skhi >> jnp.uint32(32 - sp)).astype(jnp.int32)
        fidp_m = jnp.where(
            ssrid < jnp.uint32(0x80000000), fidp, jnp.int32(-1)
        )
        f_first_sp = fidp[::sub].reshape(n_tiles, nsub)
        sbase_sp = jnp.clip(
            (f_first_sp - 8) & ~31, 0, sp_rows - fsp_w
        )
        last_sp = jnp.max(
            fidp_m.reshape(n_tiles * nsub, sub), axis=1
        ).reshape(n_tiles, nsub)
        ov = ov | jnp.any(last_sp - sbase_sp > fsp_w - 1)
        parts.append(sbase_sp)
    bases = jnp.concatenate(parts, axis=1).reshape(-1).astype(jnp.int32)
    return bases, ov


def _cumsum_mxu(x):
    """Inclusive prefix sum of small non-negative i32 via two-level f32
    matmuls (XLA's reduce-window cumsum costs 0.56 ms at 3.1M on v5e;
    this is ~5x cheaper).  Exact while the total stays < 2^24."""
    import jax.numpy as jnp
    from jax import lax

    n = x.size
    if n % 1024 or n < 2048:
        return jnp.cumsum(x)
    rows = n // 1024
    X = x.reshape(rows, 1024).astype(jnp.float32)
    U = jnp.triu(jnp.ones((1024, 1024), jnp.float32))
    inner = lax.dot_general(
        X, U, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    offs = jnp.concatenate([
        jnp.zeros((1,), jnp.float32), jnp.cumsum(inner[:, -1])[:-1]
    ])
    return (inner + offs[:, None]).reshape(n).astype(jnp.int32)


def _stable_split(khi, klo, srid, qc: int):
    """Stable-compact the REAL entries (srid bit31 clear) to the front
    and slice to the static bound ``qc`` (a tq multiple), re-marking the
    tail as filler.  Shifted-select compaction, LSB-first: each real
    moves left by the bits of its ORIGINAL displacement d[i] = number
    of invalid entries before i, one power of two per stage.  Proof of
    collision-freedom: for reals i<j, (d_j & m) - (d_i & m)
    <= d_j - d_i <= j-i-1 < j-i for any low-bit mask m (the hi parts of
    d are ordered), so current positions i-(d_i&m) < j-(d_j&m) stay
    STRICTLY ordered after every stage — no two reals ever meet.
    (The greedy remaining-displacement >= s rule, high bit first, is
    NOT collision-free — rejected by test.)

    Returns (khi, klo, srid, overflow) with overflow = more reals than
    ``qc`` (caller reruns via the exact emulation, same contract as the
    span overflow).  This is what lets the sort and the kernel run at
    ~0.75x of the slot-grid size and makes the sorted real prefix DENSE
    (real density ~1.0 regardless of the batch's slot occupancy), which
    in turn shrinks the sparse headroom in _radix_sizing to ~1.35 and
    makes mostly-empty tail batches a non-event instead of a rerun."""
    import jax.numpy as jnp

    q = khi.size
    invalid = srid >= jnp.uint32(0x80000000)
    inv = invalid.astype(jnp.int32)
    d = _cumsum_mxu(inv) - inv
    n_real = jnp.int32(q) - d[-1] - inv[-1]
    d = jnp.where(invalid, 0, d)
    for b in range((q - 1).bit_length()):
        s = 1 << b
        dm = jnp.pad(d[s:], (0, s))
        mv = ((dm >> b) & 1) == 1
        khi = jnp.where(mv, jnp.pad(khi[s:], (0, s)), khi)
        klo = jnp.where(mv, jnp.pad(klo[s:], (0, s)), klo)
        srid = jnp.where(mv, jnp.pad(srid[s:], (0, s)), srid)
        d = jnp.where(mv, dm, d)
    khi, klo, srid = khi[:qc], klo[:qc], srid[:qc]
    # the region past n_real holds leftover stale copies — re-mark it as
    # filler so duplicates cannot corrupt the counts
    tail = jnp.arange(qc, dtype=jnp.int32) >= n_real
    fmax = jnp.uint32(0xFFFFFFFF)
    khi = jnp.where(tail, fmax, khi)
    klo = jnp.where(tail, fmax, klo)
    srid = jnp.where(tail, jnp.uint32(0x80000000), srid)
    return khi, klo, srid, n_real > jnp.int32(qc)


def split_bound(q: int, tq: int = 1024) -> int:
    """Static compacted-query bound: 0.78 of the slot grid rounded up to
    the tile granule (the mean real/slot ratio is ~0.67 with tiny batch-
    level variance; repeat-heavy batches beyond 0.78 rerun exactly)."""
    return min(q, -(-int(0.78 * q) // tq) * tq)


def _probe_kernel_body(sz, npl, k, p, nseg, shard_rows, sp=0):
    """Kernel closure for pl.pallas_call (static sizing baked in).

    ``shard_rows``: bucket rows held locally (= 2**p single-chip).  The
    runtime row offset of the local planes block arrives via the second
    scalar-prefetch arg; bases are GLOBAL and get clamped into the local
    range, matches outside the clamped slice are masked off (cover).

    Work scales with the REAL query count three ways (all driven by the
    last-real-fid entries in ``bases``; fillers sort to the global tail):

      * a tile with no real query in the shard's row range skips its DMA
        AND its whole compute body (``pl.when`` around everything);
      * the slab streams in CH-row ladder chunks — only chunks the
        tile's real span reaches are fetched;
      * sub-windows gather at the statically sparse-headroomed ``fsub``
        width (a dynamic narrow/wide switch measured slower — see
        _radix_sizing); real spans beyond it raise the overflow flag
        for the exact emulation rerun."""
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tq, sub, fsub, fw = sz["tq"], sz["sub"], sz["fsub"], sz["fw"]
    ch, nch = sz["ch"], sz["nch"]
    nsub = tq // sub
    stride = nsub + 2 + (nsub if sp else 0)
    fsp_w = sz.get("fsp_w", 32)
    nk = npl * k

    def kern(bases_ref, lo_ref, khi_ref, klo_ref, srid_ref, first_ref,
             *rest):
        if sp:
            spill_ref, pl_ref, hist_ref, slab, acc, sem = rest
        else:
            pl_ref, hist_ref, slab, acc, sem = rest
            spill_ref = None
        t = pl.program_id(0)
        nt = pl.num_programs(0)
        lo = lo_ref[0]
        hi = lo + shard_rows

        def tile_base(tt):
            bg = bases_ref[tt * stride]
            return pl.multiple_of(
                jnp.clip(bg, lo, hi - fw) - lo, 32
            )

        def tile_active(tt):
            bg = bases_ref[tt * stride]
            last = bases_ref[tt * stride + 1]
            return (last >= lo) & (bg < hi)

        def chunk_needed(tt, c):
            # chunk c holds slab rows [c*ch, (c+1)*ch): needed while the
            # tile's real span — measured to the tile's last REAL fid
            # ONLY — extends into it.  Sub-window gathers can still read
            # slab rows past that point (unfetched garbage); that is safe
            # solely because those lanes are neutralized downstream by
            # the one-hot/cover/valid masking.  Do NOT add logic that
            # relies on unfetched slab rows holding table data.
            last = bases_ref[tt * stride + 1]
            return tile_active(tt) & (
                (last - (tile_base(tt) + lo) >= c * ch) if c else True
            )

        def start_tile(tt, slot):
            for c in range(nch):
                @pl.when(chunk_needed(tt, c))
                def _():
                    pltpu.make_async_copy(
                        pl_ref.at[pl.ds(tile_base(tt) + c * ch, ch), :],
                        slab.at[slot, c * ch:(c + 1) * ch],
                        sem.at[slot, c],
                    ).start()

        def wait_tile(tt, slot):
            for c in range(nch):
                @pl.when(chunk_needed(tt, c))
                def _():
                    pltpu.make_async_copy(
                        pl_ref.at[pl.ds(tile_base(tt) + c * ch, ch), :],
                        slab.at[slot, c * ch:(c + 1) * ch],
                        sem.at[slot, c],
                    ).wait()

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)

        @pl.when(t == 0)
        def _():
            start_tile(0, 0)

        @pl.when(t + 1 < nt)
        def _():
            start_tile(t + 1, (t + 1) % 2)

        wait_tile(t, t % 2)

        @pl.when(tile_active(t))
        def _():
            b_g = bases_ref[t * stride]
            b_c = jnp.clip(b_g, lo, hi - fw)           # global, clamped
            whi = khi_ref[:].reshape(nsub, sub)
            wlo = klo_ref[:].reshape(nsub, sub)
            srid = srid_ref[:].reshape(nsub, sub)
            first = first_ref[:].reshape(nsub, sub)
            shift = jnp.uint32(32 - p)
            flags = []
            for s in range(nsub):
                qh = whi[s, :][:, None]
                ql = wlo[s, :][:, None]
                fid = (qh >> shift).astype(jnp.int32) if p < 32 else (
                    qh.astype(jnp.int32))
                sb_g = b_g + bases_ref[t * stride + 2 + s]
                sb_c = jnp.clip(sb_g, lo, hi - fsub)   # global, clamped
                lb = pl.multiple_of(sb_c - b_c, 32)    # within slab
                loc = fid - sb_c
                cover = (loc >= 0) & (loc < fsub)
                oh = jnp.where(
                    loc == jax.lax.broadcasted_iota(
                        jnp.int32, (sub, fsub), 1),
                    1, 0,
                ).astype(jnp.int8)
                got = jax.lax.dot_general(
                    oh, slab[t % 2, pl.ds(lb, fsub), :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                ne = jnp.zeros((sub, k), jnp.int32)
                for pli in range(npl):
                    qb = ((qh if pli >= 4 else ql)
                          >> jnp.uint32(8 * (pli % 4))).astype(
                              jnp.int32) & 255
                    qb = ((qb + 128) & 255) - 128
                    ne = ne | (got[:, pli * k:(pli + 1) * k] ^ qb)
                m = jnp.where(jnp.min(ne & 255, axis=1) == 0, 1, 0)
                m = jnp.where(cover[:, 0], m, 0)
                if sp:
                    # Spill side table compare, per sub against a
                    # spill_window()-row slice of the VMEM-resident
                    # (2^sp, 8*128) planes — sorted queries make a sub
                    # span <~1 spill row, so the slice (base from the
                    # bases stream; span check rides the overflow flag)
                    # cuts the one-hot matmul ~8-16x vs all rows.
                    # Unconditional: a pl.when gate on "any query's
                    # primary row is full" measured +2.4 ms/step (Mosaic
                    # serializes per-sub conds — same finding as r4's
                    # narrow/wide cond).  Replicated across shards: a
                    # match counts only on the shard whose row range
                    # owns the query's PRIMARY bucket — each query has
                    # exactly one owner even when a tile straddles a
                    # boundary — keeping the psum exact.
                    fsp = (qh >> jnp.uint32(32 - sp)).astype(jnp.int32)
                    sb_sp = bases_ref[t * stride + 2 + nsub + s]
                    loc_sp = fsp - sb_sp
                    cov_sp = (loc_sp >= 0) & (loc_sp < fsp_w)
                    ohs = jnp.where(
                        loc_sp == jax.lax.broadcasted_iota(
                            jnp.int32, (sub, fsp_w), 1),
                        1, 0,
                    ).astype(jnp.int8)
                    gots = jax.lax.dot_general(
                        ohs,
                        spill_ref[pl.ds(
                            pl.multiple_of(sb_sp, 32), fsp_w), :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32,
                    )
                    nes = jnp.zeros((sub, SPILL_K), jnp.int32)
                    for pli in range(SPILL_NPL):
                        qb = ((qh if pli >= 4 else ql)
                              >> jnp.uint32(8 * (pli % 4))).astype(
                                  jnp.int32) & 255
                        qb = ((qb + 128) & 255) - 128
                        nes = nes | (
                            gots[:, pli * SPILL_K:(pli + 1) * SPILL_K]
                            ^ qb
                        )
                    msp = jnp.where(
                        jnp.min(nes & 255, axis=1) == 0, 1, 0
                    )
                    own = (fid[:, 0] >= lo) & (fid[:, 0] < hi)
                    m = m | jnp.where(own & cov_sp[:, 0], msp, 0)
                flags.append(m[None, :])
            member = jnp.concatenate(flags, axis=0)    # (nsub, sub)
            valid = (srid < jnp.uint32(0x80000000)).astype(jnp.int32)
            flag = member * valid * first
            rid = ((srid >> jnp.uint32(17))
                   & jnp.uint32(0x3FFF)).astype(jnp.int32)
            h = jnp.zeros((128, 128), jnp.float32)
            for s in range(nsub):
                hi2 = (rid[s, :] >> 7)[None, :]
                lo2 = (rid[s, :] & 127)[:, None]
                A = jnp.where(
                    hi2 == jax.lax.broadcasted_iota(
                        jnp.int32, (128, sub), 0),
                    flag[s, :][None, :], 0,
                ).astype(jnp.bfloat16)
                B = jnp.where(
                    lo2 == jax.lax.broadcasted_iota(
                        jnp.int32, (sub, 128), 1),
                    1, 0,
                ).astype(jnp.bfloat16)
                h += jax.lax.dot_general(
                    A, B, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            acc[:] += h

        @pl.when(t == nt - 1)
        def _():
            hist_ref[:] = acc[:].astype(jnp.int32)

    return kern


def radix_probe_hits(planes, p, k, npl, hlo, hhi, slot_valid, rid_s, pos_s,
                     *, num_segments: int, mode: str = "compiled",
                     shard_lo=None, shard_rows: int | None = None,
                     spill=None, sp: int = 0):
    """hits per read-unit via the sorted static-tile probe.

    planes: (2**p, npl*k) int8 device array — or, under shard_map, the
    LOCAL (shard_rows, npl*k) block of it with ``shard_lo`` its first
    global bucket row (a traced scalar) — matches outside the local range
    are masked off, so a psum of per-shard hits over the shard axis is
    the exact global answer.  hlo/hhi/slot_valid: slot grids (any shape,
    flattened).  rid_s/pos_s: per-slot unit id and chunk-local position
    (same shape).  spill/sp: the (2**sp, 8*128) spill side table (None
    when the build produced none); replicated under shard_map — matches
    count only on the shard owning the query's primary bucket.  Returns
    (hits (num_segments,) i32, overflow bool scalar).  mode: 'compiled'
    | 'interpret' | 'emulate' (emulate = pure-XLA row-gather twin: CPU
    tests + overflow/split-bound reruns — it never splits, so it is
    exact on any batch).
    """
    import jax
    import jax.numpy as jnp
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q = hhi.size
    if shard_rows is None:
        shard_rows = 1 << p
    sharded = shard_lo is not None
    if not sharded:
        shard_lo = 0
    # real-only compaction (r5): stable-split the valid entries to the
    # front and run the sort + kernel at the 0.78 static bound — both
    # dominant step costs scale with the sorted length
    kernel_wanted = mode in ("compiled", "interpret")
    # Auto-split: the real-only compaction costs ~+1.3 ms/step and buys
    # back ~1.2 in the sort, so it is a wash where the UNCOMPACTED
    # sizing already fits (measured r5; the r4 filler-tile skip already
    # stops the probe paying for invalid slots).  Where it doesn't fit —
    # panhuman-scale p=22, alpha ~1.7 — the 0.78x sorted length is what
    # brings the windows under the VMEM slab cap, so split then.
    qc, compacted, sz = q, False, None
    if kernel_wanted:
        mfw = shard_rows if sharded else None
        can_split = (
            os.environ.get("DEACON_RADIX_SPLIT", "1") != "0"
            and q >= 4096 and split_bound(q) < q
        )
        # don't emit the sizing-cliff warning for the uncompacted
        # attempt when the split fallback may still fit
        sz = _radix_sizing(q, p, max_fw=mfw, compacted=False,
                           warn=not can_split)
        if sz is None and can_split:
            qc = split_bound(q)
            sz = _radix_sizing(qc, p, max_fw=mfw, compacted=True)
            compacted = sz is not None
            if sz is None:
                qc = q
    use_kernel = kernel_wanted and sz is not None
    has_spill = sp > 0 and spill is not None
    skhi, sklo, ssrid, first, ov_split = _prep_sorted(
        hlo, hhi, slot_valid, rid_s, pos_s,
        qc=qc if (use_kernel and compacted) else None,
    )
    if use_kernel:
        if has_spill:
            sz = dict(sz, fsp_w=spill_window(sp, qc))
        bases, overflow = _bases_and_overflow(
            skhi, ssrid, p, sz, sp=sp if has_spill else 0
        )
        if ov_split is not None:
            overflow = overflow | ov_split
        lo_arr = jnp.asarray(shard_lo, dtype=jnp.int32).reshape(1)
        kern = _probe_kernel_body(sz, npl, k, p, num_segments, shard_rows,
                                  sp=sp if has_spill else 0)
        win_spec = pl.BlockSpec((sz["tq"],), lambda i, b, lo: (i,),
                                memory_space=pltpu.VMEM)
        in_specs = [win_spec, win_spec, win_spec, win_spec]
        args = [bases, lo_arr, skhi, sklo, ssrid, first]
        if has_spill:
            in_specs.append(pl.BlockSpec(
                (1 << sp, SPILL_NPL * SPILL_K), lambda i, b, lo: (0, 0),
                memory_space=pltpu.VMEM,
            ))
            args.append(spill)
        in_specs.append(pl.BlockSpec(memory_space=pltpu.ANY))
        args.append(planes)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(sz["n_tiles"],),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (128, 128), lambda i, b, lo: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, sz["fw"], npl * k), jnp.int8),
                pltpu.VMEM((128, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2, sz["nch"])),
            ],
        )
        hist = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
            grid_spec=grid_spec,
            interpret=(mode == "interpret"),
        )(*args)
        hits = hist.reshape(16384)[:num_segments]
        return hits, overflow
    # ---- XLA emulation: bucket-row gather + plane compare (exact) ----
    # Chunked over the sorted stream: one chunk's row gather + i32
    # compare intermediates for the full 3.1M-query production batch
    # would need ~30 GB of HBM (measured OOM on v5e, r5) — the
    # first-flags are GLOBAL (computed on the whole sorted stream
    # above), so per-chunk (128,128) histograms sum exactly.
    import jax.lax as lax

    n_ch = 1
    while q // n_ch > 524288 and q % (n_ch * 2) == 0:
        n_ch *= 2
    qch = q // n_ch
    shard_lo_a = jnp.asarray(shard_lo, dtype=jnp.int32)
    steps = jnp.arange(128, dtype=jnp.int32)
    hist = jnp.zeros((128, 128), jnp.float32)
    for ci in range(n_ch):
        sl = slice(ci * qch, (ci + 1) * qch)
        ckhi, cklo = skhi[sl], sklo[sl]
        csrid, cfirst = ssrid[sl], first[sl]
        fid = (
            (ckhi >> jnp.uint32(32 - p)).astype(jnp.int32) if p < 32
            else ckhi.astype(jnp.int32)
        )
        fid_l = fid - shard_lo_a
        in_range = (fid_l >= 0) & (fid_l < shard_rows)
        rows = planes[jnp.clip(fid_l, 0, shard_rows - 1)]
        rows = rows.reshape(qch, npl, k).astype(jnp.int32)
        qb = []
        for pli in range(8):
            src = ckhi if pli >= 4 else cklo
            v = ((src >> jnp.uint32(8 * (pli % 4))).astype(jnp.int32)) & 255
            qb.append(((v + 128) & 255) - 128)
        ne = jnp.zeros((qch, k), jnp.int32)
        for pli in range(npl):
            ne = ne | (rows[:, pli, :] ^ qb[pli][:, None])
        member = (jnp.min(ne & 255, axis=1) == 0) & in_range
        if sp > 0 and spill is not None:
            fsp = (ckhi >> jnp.uint32(32 - sp)).astype(jnp.int32)
            srows = spill[fsp].reshape(
                qch, SPILL_NPL, SPILL_K).astype(jnp.int32)
            nes = jnp.zeros((qch, SPILL_K), jnp.int32)
            for pli in range(SPILL_NPL):
                nes = nes | (srows[:, pli, :] ^ qb[pli][:, None])
            # replicated side table: count only on the shard owning
            # the query's primary bucket (the kernel's `own` mask)
            member = member | (
                (jnp.min(nes & 255, axis=1) == 0) & in_range
            )
        valid = csrid < jnp.uint32(0x80000000)
        flag = (member & valid & (cfirst > 0)).astype(jnp.bfloat16)
        rid = ((csrid >> jnp.uint32(17))
               & jnp.uint32(0x3FFF)).astype(jnp.int32)
        hi = (rid >> 7)[None, :]
        lo = (rid & 127)[:, None]
        A = jnp.where(
            hi == steps[:, None], flag[None, :], 0
        ).astype(jnp.bfloat16)
        B = jnp.where(lo == steps[None, :], 1, 0).astype(jnp.bfloat16)
        hist = hist + lax.dot_general(
            A, B, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    hist = hist.astype(jnp.int32)
    hits = hist.reshape(16384)[:num_segments]
    return hits, jnp.zeros((), dtype=bool)


def totals_grid(slot_pos, slot_valid, rid, mate, cstart, *,
                num_segments: int, k: int, l: int, stride: int,
                dedup_positions: bool):
    """Per-unit totals straight from the (R, Br) slot grids — no sorts.

    totals = distinct (mate, global position) per unit.  Duplicate
    positions arise ONLY from long-read chunk overlap: the same global
    base position re-selected in up to OVR = ceil((l-1)/stride) following
    rows of the same (unit, mate).  Any overlap interval holds at most
    l-k = w-1 selectable positions, and compacted slot positions ascend
    within a row, so row r's overlap copies sit in its first
    S = roundup8(l-k+1) slots — compare that prefix against the previous
    OVR rows' full slot lists (R x S x Br, tiny) instead of the v4
    (rid, matepos) global sort that cost ~6 ms/step
    (r3 VERDICT item 4).  Distinct semantics preserved:
    /root/reference/src/filter_common.rs:129-155.
    """
    import jax.numpy as jnp

    R, Br = slot_pos.shape
    valid = slot_valid.reshape(R, Br)
    if not dedup_positions:
        row_tot = jnp.sum(valid.astype(jnp.int32), axis=1)
        return _segment_sum_rows(row_tot, rid, num_segments)
    ovr = max(1, -(-(l - 1) // max(stride, 1)))
    ovr = min(ovr, R - 1) if R > 1 else 0
    s_pref = min(Br, ((l - k + 1 + 7) // 8) * 8) if l > k else 8
    # prefix slots' global positions per row
    gpos = cstart[:, None] + slot_pos
    pref = gpos[:, :s_pref]
    pref_valid = valid[:, :s_pref]
    dup = jnp.zeros((R, s_pref), dtype=bool)
    for o in range(1, ovr + 1):
        same = (
            (rid[o:] == rid[:-o]) & (mate[o:] == mate[:-o])
        )[:, None, None]
        eq = (
            pref[o:, :, None] == gpos[:-o, None, :]
        ) & pref_valid[o:, :, None] & valid[:-o, None, :]
        hit = jnp.any(eq & same, axis=2)
        dup = dup.at[o:].set(dup[o:] | hit)
    row_tot = (
        jnp.sum(valid.astype(jnp.int32), axis=1)
        - jnp.sum(dup.astype(jnp.int32), axis=1)
    )
    return _segment_sum_rows(row_tot, rid, num_segments)


def _segment_sum_rows(row_vals, rid, num_segments: int):
    """(R,) per-row values -> (num_segments,) per-unit sums via the
    factorized one-hot matmul (R and num_segments both <= 16384)."""
    import jax.numpy as jnp
    from jax import lax

    r = row_vals.shape[0]
    rid = rid.astype(jnp.int32)
    hi = (rid >> 7)[None, :]
    lo = (rid & 127)[:, None]
    steps = jnp.arange(128, dtype=jnp.int32)
    A = jnp.where(
        hi == steps[:, None], row_vals.astype(jnp.float32)[None, :], 0.0
    )
    B = jnp.where(lo == steps[None, :], 1.0, 0.0)
    # row_vals reach thousands: TPU's DEFAULT matmul precision truncates
    # f32 operands to bf16 (2046 -> 2048, caught by the bench oracle
    # gate); HIGHEST keeps f32-exact integer sums (< 2^24)
    hist = lax.dot_general(
        A, B, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    ).astype(jnp.int32)
    return hist.reshape(16384)[:num_segments]
