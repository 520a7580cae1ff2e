"""JAX device engine: batched minimizer extraction + membership + counting.

This is the TPU-native heart of the framework: the entire hot path
(selection-key computation, window minima, compaction, canonical value
packing, XXH3-64, sorted-index probe, distinct-hit counting) runs as a
chain of six small jitted XLA programs over fixed-shape row batches
(separate dispatches keep the axon compiler's fusion regions small — see
PERFNOTES.md; intermediates never leave the device).

Produces bit-identical results to the NumPy oracle (deacon_tpu/ops/
minimizers_np.py); tests/test_device_engine.py enforces it.

Design (see SURVEY §5.7, §2.3 for the mapping from the reference):

* Reads are packed host-side into rows of a fixed length L. Long reads are
  split into chunks with stride L-l+1 (l = k+w-1) so every w-window of the
  read belongs to exactly one chunk — the TPU analogue of the reference's
  whole-record heap processing of megabase contigs.
* Per-row selection keys are computed with span-doubling (associative
  combine) instead of a sequential rolling hash — no loop-carried
  dependency, so the full (R, L) tile vectorizes on the VPU.
* Window minima use a doubling sparse table (log2(w) combine steps) over
  position-packed keys; on TPU the whole selection front end (keys,
  argmin, flag mask, selected-value propagation) is ONE Pallas kernel
  (ops/pallas_kernels.values_select_fused) whose only HBM outputs are the
  selected value limbs and a packed wp|flag word per window.
* Selected positions are compacted into a fixed minimizer budget, their
  canonical values packed and hashed (XXH3-64 in 64-bit lanes), probed
  against the sorted HBM-resident index with a branchless binary search,
  then one lexicographic sort + segment-sums yield per-read distinct hit
  counts and totals (pair-union semantics fall out of sharing a read id
  across mates; ref: src/filter_common.rs:129-198).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from .. import jaxenv

jaxenv.ensure()

import jax
import jax.numpy as jnp
from jax import lax

from . import minimizers_np as mnp
from . import u64pair as u64

# NOTE: device code is strictly 32-bit. Enabling jax_enable_x64 makes
# XLA:TPU emulate 64-bit integers in every iota/searchsorted/gather, which
# measured 100-1000x slower (and minutes-long compiles) on v5e. The only
# true 64-bit math (k-mer values, XXH3) runs on u32 pairs via ops/u64pair.

# NOTE: no jnp constants at module scope — they initialize the XLA backend
# at import time, which breaks jax.distributed.initialize ordering.
U32 = jnp.uint32

#: Max entries of a (global, padded) device-probe index: positions double as
#: non-negative-i32 distinct-count keys (engine._count_core), and the margin
#: below 2^31 keeps searchsorted + unroll index arithmetic overflow-free.
#: ~2.1e9 entries = ~5.2x panhuman-1, ~2.2x panhuman ∪ panmouse. The host
#: (C++) probe has no such limit.
PROBE_POSITION_LIMIT = (1 << 31) - 65536


def _window_argmin(keys_masked, w: int):
    """(R, L) masked selection keys (top-16-bit priorities, low 16 bits
    zero, invalid positions pre-masked to 0xFFFF0000) -> (R, L) i32
    leftmost argmin position of each w-window.

    The window-local position is packed into the key's low 16 bits so the
    sliding minimum is a plain doubling MIN over ONE u32 array — the
    (key, pos) tuple-combine formulation is an axon compile bomb (~300 s),
    this compiles in ~1 s. Masked positions carry the maximum priority, so
    any real k-mer (even one whose own priority is 0xFFFF0000) beats them
    on the position tie-break. Requires L <= 65536.
    """
    R, L = keys_masked.shape
    pos = jnp.arange(L, dtype=jnp.uint32)[None, :]
    t = keys_masked | pos

    def shift_min(t, s):
        pk = jnp.pad(t, ((0, 0), (0, s)), constant_values=np.uint32(0xFFFFFFFF))
        return jnp.minimum(t, pk[:, s : s + L])

    span = 1
    while span * 2 <= w:
        t = shift_min(t, span)
        span *= 2
    if w - span > 0:
        t = shift_min(t, w - span)
    return jnp.minimum((t & U32(0xFFFF)).astype(jnp.int32), L - 1)


def _shift_cols(x, n: int):
    """x[:, n:] zero-padded back to the original width."""
    if n == 0:
        return x
    return jnp.pad(x[:, n:], ((0, 0), (0, n)))


def _limbs_shift_cols(limbs, n: int):
    return [_shift_cols(x, n) for x in limbs]


def _limbs_or(a, b):
    return [x | y for x, y in zip(a, b)]


def _limbs_shl(limbs, n: int):
    """Static left shift of a multi-limb (little-endian u32) value by n bits."""
    if n == 0:
        return limbs
    nl = len(limbs)
    word, bit = n // 32, n % 32
    zero = jnp.zeros_like(limbs[0])
    out = []
    for i in range(nl):
        v = zero
        if 0 <= i - word:
            v = limbs[i - word] << U32(bit) if bit else limbs[i - word]
        if bit and 0 <= i - word - 1:
            v = v | (limbs[i - word - 1] >> U32(32 - bit))
        out.append(v)
    return out


def _limbs_min(a, b):
    """Lexicographic min of two multi-limb values (elementwise)."""
    take_a = jnp.zeros_like(a[0], dtype=bool)
    decided = jnp.zeros_like(a[0], dtype=bool)
    for i in range(len(a) - 1, -1, -1):
        take_a = jnp.where(~decided & (a[i] < b[i]), True, take_a)
        decided = decided | (a[i] != b[i])
    take_a = take_a | ~decided
    return [jnp.where(take_a, x, y) for x, y in zip(a, b)]


def _windowed_value_limbs(codes_u32, k: int):
    """(R, L) u32 codes -> canonical min(fwd, rc) k-mer value at every
    position as a list of (R, L) u32 limbs (2 limbs for k<=32, 4 for k<=57),
    built with log2(k) span-doubling steps — pure elementwise VPU work,
    no window gathers, no scans."""
    nl = 2 if k <= 32 else 4
    zero = jnp.zeros_like(codes_u32)
    cf = [codes_u32] + [zero] * (nl - 1)
    cr = [codes_u32 ^ U32(2)] + [zero] * (nl - 1)
    span_tables = {1: (cf, cr)}
    vf, vr = cf, cr
    s = 1
    while s * 2 <= k:
        vf = _limbs_or(vf, _limbs_shl(_limbs_shift_cols(vf, s), 2 * s))
        vr = _limbs_or(_limbs_shl(vr, 2 * s), _limbs_shift_cols(vr, s))
        s *= 2
        span_tables[s] = (vf, vr)

    acc_f = None
    acc_r = None
    off = 0
    for s in sorted(span_tables, reverse=True):
        if k & s:
            bf, br = span_tables[s]
            bf = _limbs_shift_cols(bf, off)
            br = _limbs_shift_cols(br, off)
            if acc_f is None:
                acc_f = bf
                acc_r = _limbs_shl(br, 2 * (k - s - off))
            else:
                acc_f = _limbs_or(acc_f, _limbs_shl(bf, 2 * off))
                acc_r = _limbs_or(acc_r, _limbs_shl(br, 2 * (k - s - off)))
            off += s
    return _limbs_min(acc_f, acc_r)


def _fmix32(x):
    x = x ^ (x >> U32(16))
    x = x * U32(0x85EBCA6B)
    x = x ^ (x >> U32(13))
    x = x * U32(0xC2B2AE35)
    return x ^ (x >> U32(16))


def build_probe_planes(index_hashes: np.ndarray):
    """Split a sorted u64 index into (hi, lo) u32 planes + the max run length
    of equal hi words (static unroll bound for the probe).

    TPU rationale: u32 searchsorted + u32 gathers run at full gather
    throughput (~0.07 ms per 1M queries vs 100M keys measured on v5e),
    while u64 key comparisons are emulated and ~6000x slower. A query's
    candidate run starts at searchsorted(hi) and has at most max_run slots.
    """
    arr = np.asarray(index_hashes, dtype=np.uint64)
    if arr.size >= PROBE_POSITION_LIMIT:
        # index positions double as distinct-count keys (non-negative i32;
        # the margin keeps searchsorted+unroll arithmetic overflow-free)
        raise ValueError(
            f"index too large for the position-keyed probe: {arr.size} >= "
            f"{PROBE_POSITION_LIMIT} (~2^31; ~5.2x panhuman-1). Shard the "
            "index across a mesh/pod, or use the host engine (no limit)."
        )
    hi = (arr >> np.uint64(32)).astype(np.uint32)
    lo = (arr & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    if arr.size == 0:
        return hi, lo, 8
    # max run of equal hi words
    change = np.nonzero(np.diff(hi))[0]
    if change.size == 0:
        max_run = arr.size
    else:
        run_bounds = np.concatenate([[-1], change, [hi.size - 1]])
        max_run = int(np.max(np.diff(run_bounds)))
    # Quantize the static unroll bound (floor 8, then powers of two) so the
    # compiled probe program is INDEX-INDEPENDENT for all realistic indexes:
    # random-hash indexes up to ~5.5e8 entries have hi-plane runs <= ~7, so
    # every index compiles to the same max_run=8 program and the persistent
    # compile cache hits across indexes (an index-content-derived bound
    # forced a full recompile per index — minutes on axon — and left the
    # process in the degraded-dispatch regime; PERFNOTES.md #7).
    q = 8
    while q < max_run:
        q *= 2
    return hi, lo, q


def probe_split_u32_pos(index_hi, index_lo, h, *, max_run: int, n_valid=None):
    """Membership + first matching index position (-1 for non-members).

    ``h`` is a hash pair (lo, hi u32). The position doubles as a compact
    per-hash unique id for distinct-hit counting (two equal hashes share a
    position; distinct member hashes never do).

    ``n_valid`` (optional i32 scalar) masks positions >= n_valid as
    non-members: presharded planes (ShardedPipeline.from_shards) pad each
    shard to a common length with sort-preserving filler that must never
    report membership. max_run need only cover runs in the valid region.
    """
    qlo, qhi = h
    n = index_hi.shape[0]
    if n == 0:
        return (
            jnp.zeros(qlo.shape, dtype=bool),
            jnp.full(qlo.shape, -1, dtype=jnp.int32),
        )
    left = jnp.searchsorted(index_hi, qhi)
    member = jnp.zeros(qlo.shape, dtype=bool)
    pos = jnp.full(qlo.shape, -1, dtype=jnp.int32)
    for j in range(max_run):
        praw = left + j
        p = jnp.minimum(praw, n - 1)
        m = (index_hi[p] == qhi) & (index_lo[p] == qlo)
        if n_valid is not None:
            m = m & (praw.astype(jnp.int32) < n_valid)
        pos = jnp.where(m & ~member, p.astype(jnp.int32), pos)
        member = member | m
    return member, pos


# ---------------------------------------------------------------------------
# Bucketized-cuckoo probe: the gather-minimal membership structure.
#
# Profiling the real device timeline (PERFNOTES round-3) showed a TPU
# random gather costs ~7-22 ns per QUERY regardless of table size
# (element-serial hardware, no cache), so the sorted-plane probe's ~25
# searchsorted passes + 16-slot run scan — not HBM bytes — dominated the
# engine step (~2.7 s of its 3.55 s at 3.1M probes). A 2-choice x 2-slot
# bucketized cuckoo table answers exact membership with TWO (B, 4)-row
# slice-gathers. Bucket = top log2(B) bits of key * C{1,2} (odd 64-bit
# constants); empty slot = the all-ones sentinel, with a has_sentinel flag
# handling the one key value that collides with it. The matched slot id
# (2b + s, or 2B for the sentinel key) replaces the sorted rank as the
# distinct-count position key — any per-key-unique id works
# (_count_core). Load factor <= ~0.8 (2 slots/bucket threshold ~0.9).
# ---------------------------------------------------------------------------

_CUCKOO_SENTINEL = 0xFFFFFFFFFFFFFFFF
#: slot ids (2B + 1 of them) must stay valid non-negative i32 distinct keys
_CUCKOO_MAX_LOGB = 29


def _splitmix64(s: int):
    s = (s + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = s
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31), s


def _cuckoo_consts(attempt: int):
    """Deterministic (c1, c2) odd mix constants for a build attempt.
    Attempt 0 is fixed, so virtually every index compiles to the same
    (c1, c2)-baked program and hits the persistent cache."""
    s = (0xDEAC0107C0FFEE00 + attempt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    c1, s = _splitmix64(s)
    c2, s = _splitmix64(s)
    return c1 | 1, c2 | 1


def _py_cuckoo_build(keys: np.ndarray, B: int, c1: int, c2: int):
    """Pure-Python twin of dx_cuckoo_build (test/fallback scale)."""
    shift = 64 - B.bit_length() + 1
    mask = 0xFFFFFFFFFFFFFFFF
    slots = np.full(2 * B, _CUCKOO_SENTINEL, dtype=np.uint64)
    kmax = 2000
    for k in keys.tolist():
        b1 = ((k * c1) & mask) >> shift
        b2 = ((k * c2) & mask) >> shift
        placed = False
        for b in (b1, b2):
            for s in (0, 1):
                if slots[2 * b + s] == _CUCKOO_SENTINEL:
                    slots[2 * b + s] = k
                    placed = True
                    break
            if placed:
                break
        if placed:
            continue
        cur, b = k, b1
        rw = (k * 0x2545F4914F6CDD1D + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
        for it in range(kmax):
            rw = (rw ^ (rw << 13)) & 0xFFFFFFFFFFFFFFFF
            rw = rw ^ (rw >> 7)
            rw = (rw ^ (rw << 17)) & 0xFFFFFFFFFFFFFFFF
            victim = rw & 1
            cur, slots[2 * b + victim] = int(slots[2 * b + victim]), cur
            e1 = ((cur * c1) & mask) >> shift
            e2 = ((cur * c2) & mask) >> shift
            nb = e2 if b == e1 else e1
            done = False
            for s in (0, 1):
                if slots[2 * nb + s] == _CUCKOO_SENTINEL:
                    slots[2 * nb + s] = cur
                    done = True
                    break
            if done:
                placed = True
                break
            b = nb
        if not placed:
            return None
    out = np.empty((B, 4), dtype=np.uint32)
    out[:, 0] = (slots[0::2] >> np.uint64(32)).astype(np.uint32)
    out[:, 1] = (slots[0::2] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out[:, 2] = (slots[1::2] >> np.uint64(32)).astype(np.uint32)
    out[:, 3] = (slots[1::2] & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return out


def _cuckoo_sidecar_token(index_path: str):
    import os

    st = os.stat(index_path)
    return {"size": st.st_size, "mtime_ns": st.st_mtime_ns}


def _keys_fingerprint(arr: np.ndarray) -> str:
    """Cheap content fingerprint of the (sorted unique) key array:
    (count, first, last, xor-fold). Binds probe sidecars to the index
    CONTENT, not just size+mtime — a timestamp-preserving replacement
    (cp -p / rsync -t) whose size and key count coincide would otherwise
    silently serve a stale table (r3 advisor finding #1)."""
    if arr.size == 0:
        return "0:0:0:0"
    x = int(np.bitwise_xor.reduce(arr))
    return f"{arr.size}:{int(arr[0]):x}:{int(arr[-1]):x}:{x:x}"


def _cuckoo_sidecar_load(index_path: str, n_keys: int, fp: str):
    """Load `<index>.cuckoo` if present and bound to this index file
    (size+mtime+key count+content fingerprint — the probe sidecar's
    identity rule)."""
    import json as _json
    import os

    meta_p = index_path + ".cuckoo.json"
    tab_p = index_path + ".cuckoo"
    try:
        if not (os.path.exists(meta_p) and os.path.exists(tab_p)):
            return None
        with open(meta_p) as f:
            meta = _json.load(f)
        tok = _cuckoo_sidecar_token(index_path)
        if (
            meta.get("version") != 1
            or meta.get("size") != tok["size"]
            or meta.get("mtime_ns") != tok["mtime_ns"]
            or meta.get("n_keys") != n_keys
            or meta.get("keys_fp") != fp
        ):
            return None
        B = int(meta["B"])
        table = np.fromfile(tab_p, dtype=np.uint32)
        if table.size != B * 4:
            return None
        return (
            table.reshape(B, 4), int(meta["c1"]), int(meta["c2"]),
            bool(meta["has_sentinel"]),
        )
    except Exception:
        return None


def _cuckoo_sidecar_save(index_path: str, n_keys: int, table, c1, c2,
                         has_sentinel, fp: str = "") -> None:
    """Best-effort atomic write of the cuckoo sidecar (tmp + rename)."""
    import json as _json
    import os

    try:
        tok = _cuckoo_sidecar_token(index_path)
        tab_p = index_path + ".cuckoo"
        tmp = tab_p + f".tmp.{os.getpid()}"
        table.tofile(tmp)
        os.replace(tmp, tab_p)
        meta = {
            "version": 1, "B": int(table.shape[0]), "c1": int(c1),
            "c2": int(c2), "has_sentinel": bool(has_sentinel),
            "n_keys": int(n_keys), "keys_fp": fp, **tok,
        }
        tmpm = index_path + f".cuckoo.json.tmp.{os.getpid()}"
        with open(tmpm, "w") as f:
            _json.dump(meta, f)
        os.replace(tmpm, index_path + ".cuckoo.json")
    except Exception:
        pass


def build_cuckoo_planes(index_hashes: np.ndarray, cache_path=None):
    """(table (B, 4) u32, c1, c2, has_sentinel) or None when the index is
    too large for i32 slot ids (caller falls back to the sorted planes).
    B is pow2 (compiled programs depend only on the size bucket).

    ``cache_path``: the index file the hashes came from — a valid
    ``<index>.cuckoo`` sidecar (bound to the file's size+mtime+count)
    skips the build (the walk costs ~0.1 s per 1M keys: real at
    panhuman scale), and a fresh build writes one best-effort."""
    arr = np.unique(np.asarray(index_hashes, dtype=np.uint64))
    fp = _keys_fingerprint(arr)
    if cache_path is not None:
        cached = _cuckoo_sidecar_load(str(cache_path), int(arr.size), fp)
        if cached is not None:
            tb, c1, c2, hs = cached
            has_sentinel = bool(
                arr.size and arr[-1] == np.uint64(_CUCKOO_SENTINEL)
            )
            if hs == has_sentinel:
                return tb, c1, c2, hs
    has_sentinel = bool(arr.size and arr[-1] == np.uint64(_CUCKOO_SENTINEL))
    if has_sentinel:
        arr = arr[:-1]
    B = 512
    while 2 * B * 0.8 < arr.size:
        B *= 2
    attempt = 0
    while True:
        if B > (1 << _CUCKOO_MAX_LOGB):
            return None
        c1, c2 = _cuckoo_consts(attempt)
        try:
            from ..io.native_loader import native_cuckoo_build

            table = native_cuckoo_build(arr, B, c1, c2)
        except Exception:
            table = None
        if table is None:  # native unavailable
            table = _py_cuckoo_build(arr, B, c1, c2)
            if table is None:
                table = False
        if table is not False:
            if cache_path is not None:
                _cuckoo_sidecar_save(
                    str(cache_path), int(arr.size) + int(has_sentinel),
                    table, c1, c2, has_sentinel, fp,
                )
            return table, c1, c2, has_sentinel
        attempt += 1
        if attempt % 2 == 0:
            B *= 2  # two reseeds per size, then grow


@functools.partial(
    jax.jit, static_argnames=("c1", "c2", "has_sentinel")
)
def _stage_probe_cuckoo(table, hlo, hhi, slot_valid, *, c1: int, c2: int,
                        has_sentinel: bool):
    """Membership + unique slot id from the cuckoo planes: exactly two
    (B, 4)-row slice-gathers (the gather-minimal probe; see the section
    comment)."""
    B = table.shape[0]
    logb = B.bit_length() - 1
    sh = U32(32 - logb)

    def bucket(c: int):
        clo, chi = U32(c & 0xFFFFFFFF), U32((c >> 32) & 0xFFFFFFFF)
        # high u32 word of (key * c) mod 2^64: mulhi(lo,clo) + lo*chi + hi*clo
        _, carry = u64.mul32_full(hlo, clo)
        hw = carry + hlo * chi + hhi * clo
        return (hw >> sh).astype(jnp.int32)

    b1 = bucket(c1)
    b2 = bucket(c2)
    r1 = table[b1, :]
    r2 = table[b2, :]
    m = [
        (r1[:, 0] == hhi) & (r1[:, 1] == hlo),
        (r1[:, 2] == hhi) & (r1[:, 3] == hlo),
        (r2[:, 0] == hhi) & (r2[:, 1] == hlo),
        (r2[:, 2] == hhi) & (r2[:, 3] == hlo),
    ]
    cand = [2 * b1, 2 * b1 + 1, 2 * b2, 2 * b2 + 1]
    member = m[0] | m[1] | m[2] | m[3]
    pos = jnp.full(hlo.shape, -1, dtype=jnp.int32)
    for mm, cc in zip(reversed(m), reversed(cand)):
        pos = jnp.where(mm, cc, pos)
    # a sentinel-valued query would "match" any empty slot in its buckets:
    # its membership is decided solely by the has_sentinel build flag
    qs = (hhi == U32(0xFFFFFFFF)) & (hlo == U32(0xFFFFFFFF))
    if has_sentinel:
        member = member | qs
        pos = jnp.where(qs, jnp.int32(2 * B), pos)
    else:
        member = member & ~qs
    member = member & slot_valid
    return member, jnp.where(member, pos, jnp.int32(-1))


def build_padded_shard_planes(shard_hashes: np.ndarray, pad_to: int):
    """(hi, lo, n_valid, max_run) probe planes for ONE value-range shard,
    padded to a common length with sort-preserving filler that can never
    match: filler hi-words are DISTINCT ascending (a duplicated-member pad
    of length P would force the probe's static unroll max_run >= P), and
    ``n_valid`` masks the pad region exactly. Shared by the sharded filter
    pipeline and the device hash probe."""
    s = np.asarray(shard_hashes, dtype=np.uint64)
    hi, lo, max_run = build_probe_planes(s)
    pad_len = pad_to - s.size
    if pad_len < 0:
        raise ValueError(
            f"shard size {s.size} exceeds pad_to={pad_to}; value-range "
            "skew — raise pad_to"
        )
    if pad_len:
        last_hi = np.uint64(hi[-1]) if s.size else np.uint64(0)
        pad_hi = np.minimum(
            last_hi + np.uint64(1) + np.arange(pad_len, dtype=np.uint64),
            np.uint64(0xFFFFFFFF),
        ).astype(np.uint32)
        hi = np.concatenate([hi, pad_hi])
        lo = np.concatenate([lo, np.zeros(pad_len, dtype=np.uint32)])
    return hi, lo, int(s.size), max_run


class DeviceHashProbe:
    """u64 hash-batch membership against the device-resident index.

    Serves the hash-only decision path (server mode): clients send
    pre-hashed minimizers (ref: src/server_common.rs:8-27), so there is
    nothing to extract — each request is one searchsorted probe of the
    HBM-resident u32 planes. With a mesh, the index is range-partitioned
    across the ``shard`` axis, queries split across ``data``, and
    per-shard membership merges with one psum over ICI (SURVEY §5.8).
    On a process-spanning (pod) mesh, results all_gather over ``data`` so
    every rank reads the full decision vector, and every rank must execute
    each __call__ with identical inputs (server/app.py's worker loop
    handles the broadcast).

    Thread-safe (the HTTP server dispatches from a thread pool).
    ``index_hashes`` must be sorted ascending (MinimizerIndex.hashes is).
    """

    def __init__(self, index_hashes: np.ndarray, mesh=None):
        self._init_common(mesh)
        arr = np.asarray(index_hashes, dtype=np.uint64)
        n_shard = self.n_shard
        if n_shard > 1 and arr.size:
            # pad by repeating the max element: keeps the array sorted and
            # membership exact (duplicates cannot create new members)
            pad = (-arr.size) % n_shard
            if pad:
                arr = np.concatenate([arr, np.repeat(arr[-1:], pad)])
        if mesh is None:
            self._single_device_planes(arr)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            hi, lo, self.max_run = build_probe_planes(arr)
            shard = NamedSharding(mesh, P("shard"))
            self.index_hi = jax.device_put(jnp.asarray(hi), shard)
            self.index_lo = jax.device_put(jnp.asarray(lo), shard)
            # value-padding above makes every slot a real (duplicate) member
            self._n_valid = jax.device_put(
                jnp.full((n_shard,), arr.size // n_shard, jnp.int32), shard
            )

    def _single_device_planes(self, arr: np.ndarray) -> None:
        """Pow2-bucket padded planes + n_valid on one device (same
        recompile-avoidance rationale as DevicePipeline.__init__)."""
        n_pad = 1024
        while n_pad < arr.size:
            n_pad *= 2
        if n_pad >= PROBE_POSITION_LIMIT:
            n_pad = arr.size
        hi, lo, nv, self.max_run = build_padded_shard_planes(arr, n_pad)
        dev = jax.devices()[0]
        self.index_hi = jax.device_put(jnp.asarray(hi), dev)
        self.index_lo = jax.device_put(jnp.asarray(lo), dev)
        self._n_valid = jax.device_put(jnp.asarray([nv], dtype=jnp.int32), dev)

    @classmethod
    def from_index_file(cls, index_path: str, mesh=None) -> "DeviceHashProbe":
        """Memory-lean construction: stream-decode each value-range shard
        (index/store.load_index_shard) instead of materializing the whole
        hash array on the host first (the reference server loads the full
        set per process, ref: src/server.rs:68-86; VERDICT r2 item 4).
        With a mesh, each process decodes only the shards of its own
        addressable devices and the global planes assemble with
        make_array_from_single_device_arrays — peak host memory is one
        shard slice (~1/S of the index) plus one decode chunk.
        """
        from ..index.store import load_header_and_count, load_index_shard

        self = cls.__new__(cls)
        self._init_common(mesh)
        if mesh is None:
            _, arr, _ = load_index_shard(index_path, 0, 1)
            self._single_device_planes(arr)
            return self

        from jax.sharding import NamedSharding, PartitionSpec as P

        n_shard = self.n_shard
        _, count = load_header_and_count(index_path)
        # same margin rule as parallel/multihost._pipeline_from_file:
        # uniform-hash shard sizes concentrate tightly around count/N
        pad_to = count // n_shard + max(1024, (2 * count) // (100 * n_shard))
        # static unroll bound identical on every process (16 covers any
        # hash-uniform index; see ShardedPipeline.from_shards)
        self.max_run = 16
        pid = jax.process_index()
        planes: dict[int, tuple] = {}
        for j in sorted(
            {j for (_, j), d in np.ndenumerate(mesh.devices)
             if d.process_index == pid}
        ):
            _, s, _ = load_index_shard(index_path, j, n_shard)
            hi, lo, nv, mr = build_padded_shard_planes(s, pad_to)
            if mr > self.max_run:
                raise ValueError(
                    f"shard {j} needs probe unroll {mr} > {self.max_run}"
                )
            planes[j] = (hi, lo, nv)
        shard = NamedSharding(mesh, P("shard"))
        pieces_hi, pieces_lo, pieces_nv = [], [], []
        for (_, j), dev in np.ndenumerate(mesh.devices):
            if dev.process_index != pid:
                continue
            hi, lo, nv = planes[j]
            pieces_hi.append(jax.device_put(jnp.asarray(hi), dev))
            pieces_lo.append(jax.device_put(jnp.asarray(lo), dev))
            pieces_nv.append(
                jax.device_put(jnp.asarray([nv], dtype=jnp.int32), dev)
            )
        gshape = (n_shard * pad_to,)
        self.index_hi = jax.make_array_from_single_device_arrays(
            gshape, shard, pieces_hi
        )
        self.index_lo = jax.make_array_from_single_device_arrays(
            gshape, shard, pieces_lo
        )
        self._n_valid = jax.make_array_from_single_device_arrays(
            (n_shard,), shard, pieces_nv
        )
        return self

    @classmethod
    def from_planes(cls, index_hi, index_lo, n_valid, max_run: int,
                    mesh=None) -> "DeviceHashProbe":
        """Wrap EXISTING device-resident probe planes (e.g. a
        ShardedPipeline's) as a hash-batch prober — the ``--debug`` path
        runs host extraction but probes membership on the device, so mesh
        and pod runs support debug without a host-resident index."""
        self = cls.__new__(cls)
        self._init_common(mesh)
        self.max_run = int(max_run)
        self.index_hi = index_hi
        self.index_lo = index_lo
        self._n_valid = n_valid
        return self

    def _init_common(self, mesh) -> None:
        import threading

        self.mesh = mesh
        self.n_data = int(mesh.shape["data"]) if mesh is not None else 1
        self.n_shard = int(mesh.shape["shard"]) if mesh is not None else 1
        self.spans_processes = mesh is not None and (
            len({d.process_index for d in mesh.devices.flat}) > 1
        )
        self._jitted = None
        self._lock = threading.Lock()

    def _fn(self):
        # ONE jitted callable: jax.jit is shape-polymorphic (it retraces
        # per input shape internally), so keying a cache by n_pad would
        # only store duplicates of the same wrapper.
        f = self._jitted
        if f is not None:
            return f
        max_run = self.max_run
        if self.mesh is None:

            @jax.jit
            def run(ihi, ilo, nv, qlo, qhi):
                member, _ = probe_split_u32_pos(
                    ihi, ilo, (qlo, qhi), max_run=max_run, n_valid=nv[0]
                )
                return member

        else:
            from jax.sharding import PartitionSpec as P

            try:  # jax >= 0.8
                from jax import shard_map
            except ImportError:  # pragma: no cover - older jax
                from jax.experimental.shard_map import shard_map

            gather_out = self.spans_processes
            use_nv = self._n_valid is not None

            def body(ihi, ilo, nv, qlo, qhi):
                member_l, _ = probe_split_u32_pos(
                    ihi, ilo, (qlo, qhi), max_run=max_run,
                    n_valid=nv[0] if use_nv else None,
                )
                member = lax.psum(member_l.astype(jnp.int32), "shard") >= 1
                if gather_out:
                    # pod server: every rank reads the whole decision vector
                    member = lax.all_gather(member, "data", tiled=True)
                return member

            smap_kwargs = dict(
                mesh=self.mesh,
                in_specs=(
                    P("shard"), P("shard"), P("shard"),
                    P("data"), P("data"),
                ),
                out_specs=P() if gather_out else P("data"),
            )
            try:  # jax >= 0.8 renamed check_rep -> check_vma (the tiled
                # all_gather's replication is not statically inferred)
                mapped = shard_map(body, check_vma=False, **smap_kwargs)
            except TypeError:  # pragma: no cover - older jax
                mapped = shard_map(body, check_rep=False, **smap_kwargs)
            run = jax.jit(mapped)

        self._jitted = run
        return run

    def padded_size(self, n: int) -> int:
        """pow2-of-base buckets bound the number of compiled variants."""
        n_pad = 1024 * self.n_data
        while n_pad < n:
            n_pad *= 2
        return n_pad

    def __call__(self, hashes: np.ndarray) -> np.ndarray:
        n = int(np.asarray(hashes).size)
        if n == 0:
            return np.zeros(0, dtype=bool)
        q = np.zeros(self.padded_size(n), dtype=np.uint64)
        q[:n] = np.asarray(hashes, dtype=np.uint64)
        return self.probe_padded(q)[:n]

    def probe_padded(self, q: np.ndarray) -> np.ndarray:
        """Probe an already-padded query batch (every rank of a pod mesh
        must call this with the identical array — see server/app.py)."""
        qlo = (q & np.uint64(0xFFFFFFFF)).astype(np.uint32)
        qhi = (q >> np.uint64(32)).astype(np.uint32)
        # lock only the wrapper construction; jitted execution is
        # thread-safe and serializing it would bottleneck the HTTP server
        with self._lock:
            fn = self._fn()
        if self.mesh is None:
            member = fn(self.index_hi, self.index_lo, self._n_valid,
                        jnp.asarray(qlo), jnp.asarray(qhi))
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P

            data = NamedSharding(self.mesh, P("data"))
            member = fn(
                self.index_hi, self.index_lo, self._n_valid,
                jax.device_put(qlo, data), jax.device_put(qhi, data),
            )
        return np.asarray(member)


def _select_compact(codes, validb, mlen, allow_short, *, k, w, budget):
    """Selection + window argmin + compaction shared by the filter and
    index-build paths. Returns (slot_row, slot_pos, slot_valid, total, h)
    with h the XXH3-64 membership hash per compacted slot.

    Deliberately SCATTER-FREE: XLA scatters serialize on TPU (measured
    ~190 ms/step for a 512K-element tile vs <1 ms for equivalent sorts and
    gathers). Window-argmin dedup uses the monotonicity of the leftmost
    argmin (a window's pick differs from its left neighbour's exactly when
    a new minimizer appears), and compaction is a stable sort on the
    selected flag.
    """
    R, L = codes.shape

    # IMPORTANT: every (R, *) array stays at width L (a multiple of 128) —
    # width-M arrays are lane-misaligned and force relayouts on this TPU
    # (measured 100x slowdowns + minute-long compiles). Tail columns
    # [L-k+1, L) are masked instead of sliced away.

    # Fully-fused Pallas v2 kernel on TPU backends (selection + argmin +
    # flags + value propagation in VMEM), XLA emulation elsewhere — shared
    # with the staged single-chip pipeline so the sharded multi-chip path
    # gets the same kernel.
    vplanes, wpf = _values_select(
        codes, validb, mlen, allow_short, k=k, w=w
    )
    wpf = lax.optimization_barrier(wpf)

    # sort-free compaction: the i-th selected window's flat id is the first
    # position where the inclusive flag-cumsum reaches i+1 (cumsum is
    # monotone, so this is one vectorized binary search — XLA sorts and
    # scatters are both far slower on TPU than scan+searchsorted)
    flat = wpf.reshape(-1)
    csel = lax.optimization_barrier(jnp.cumsum(flat >> jnp.int32(16)))
    total = csel[-1]
    slot_id = jnp.searchsorted(
        csel, jnp.arange(1, budget + 1, dtype=jnp.int32), side="left"
    )
    slot_id = lax.optimization_barrier(jnp.minimum(slot_id, R * L - 1))
    slot_row = (slot_id // L).astype(jnp.int32)
    slot_pos = flat[slot_id] & jnp.int32(0xFFFF)
    slot_valid = jnp.arange(budget, dtype=jnp.int32) < jnp.minimum(total, budget)

    # the selected values live AT the window ids — gather them directly
    slot_limbs = [x.reshape(-1)[slot_id] for x in vplanes]
    if k <= 32:
        h = u64.xxh3_64_pair_u64(slot_limbs[0], slot_limbs[1])
    else:
        h = u64.xxh3_64_pair_u128(
            (slot_limbs[0], slot_limbs[1]), (slot_limbs[2], slot_limbs[3])
        )
    h = lax.optimization_barrier(h)
    return slot_row, slot_pos, slot_valid, total, h


def engine_core(
    codes,  # (R, L) uint8 2-bit codes
    validb,  # (R, L) bool: byte was ACGT/acgt
    mlen,  # (R,) int32: number of k-mer positions in row (<=0: empty row)
    allow_short,  # (R,) bool: whole read shorter than l -> single window
    rid,  # (R,) int32 logical read/pair id, < num_segments, non-decreasing
    mate,  # (R,) int32 mate flag (0/1) for pos-dedup domains
    chunk_start,  # (R,) int32 global base offset of this chunk in its mate
    probe_fn,  # uint64[P] -> (bool[P] member, int32[P] index position)
    *,
    k: int,
    w: int,
    budget: int,
    num_segments: int,
    dedup_positions: bool = True,
):
    """Shared extraction+count core; probe_fn is pluggable so the sharded
    multi-chip pipeline can psum per-shard membership (SURVEY §2.3).

    Distinct-hit counting: each member hash is identified by its unique
    position in the sorted index, so dedup within a read reduces to one
    2-operand (rid, poskey) sort over the compacted slots — far cheaper on
    TPU than a full (rid, hash_hi, hash_lo, ...) multi-operand sort.
    ``dedup_positions`` (static) enables the extra (rid, matepos) sort that
    deduplicates chunk-overlap positions in the minimizer totals; tile
    classes that never chunk reads skip it (totals are then plain per-rid
    slot counts).
    """
    slot_row, slot_pos, slot_valid, total, h = _select_compact(
        codes, validb, mlen, allow_short, k=k, w=w, budget=budget
    )

    member, idxpos = probe_fn(h)
    member, idxpos = lax.optimization_barrier((member & slot_valid, idxpos))

    hits, totals = _count_core(
        member, idxpos, slot_row, slot_pos, slot_valid, rid, mate,
        chunk_start, num_segments=num_segments,
        dedup_positions=dedup_positions,
    )
    return hits, totals, total


def engine_core_packed(
    pc, pv, il_codes, il_valid, mlen, allow_short, rid, mate, chunk_start,
    probe_fn,
    *,
    k: int,
    w: int,
    budget: int,
    num_segments: int,
    dedup_positions: bool = True,
):
    """engine_core over bit-packed inputs: the gather-minimal v4 stage
    chain (in-kernel butterfly compaction, per-row slot grid, broadcast
    slot ids) with a pluggable probe — the sharded multi-chip path calls
    this under shard_map so it runs the same kernels as the single-chip
    engine. ``budget`` is the PER-ROW slot count on the v4 path. Falls
    back to the v3 chain (non-pow2 L) or unpack + engine_core (v2-only
    shapes)."""
    R, Lp = pc.shape
    arch = engine_arch(k, Lp * 4, R)
    if arch == 2:
        codes, validb = _stage_unpack(pc, pv)
        return engine_core(
            codes, validb, mlen, allow_short, rid, mate, chunk_start,
            probe_fn, k=k, w=w, budget=budget, num_segments=num_segments,
            dedup_positions=dedup_positions,
        )
    if arch == 4:
        pos_c, v_c, rt = _values_compact(
            pc, pv, il_codes, il_valid, mlen, allow_short, k=k, w=w,
            Br=budget,
        )
        slot_valid = (
            jax.lax.broadcasted_iota(jnp.int32, (R, budget), 1)
            < jnp.minimum(rt, budget)[:, None]
        ).reshape(-1)
        h = u64.xxh3_64_pair_u64(v_c[0].reshape(-1), v_c[1].reshape(-1))
        member, idxpos = probe_fn(h)
        member, idxpos = lax.optimization_barrier(
            (member & slot_valid, idxpos)
        )

        def expand(x):
            return jnp.broadcast_to(x[:, None], (R, budget)).reshape(-1)

        slot_pos = pos_c.reshape(-1)
        hits, totals = _count_core_expanded(
            member, idxpos, expand(rid), expand(mate),
            expand(chunk_start) + slot_pos, slot_valid,
            num_segments=num_segments, dedup_positions=dedup_positions,
        )
        if not dedup_positions:
            totals = jax.ops.segment_sum(
                jnp.minimum(rt, budget), rid, num_segments=num_segments
            )
        return hits, totals, jnp.max(rt)
    plane, row_tot = _values_csum(
        pc, pv, il_codes, il_valid, mlen, allow_short, k=k, w=w
    )
    plane = lax.optimization_barrier(plane)
    slot_id, slot_row, slot_pos, slot_valid, total = _stage_compact3(
        plane, row_tot, budget=budget
    )
    h = _stage_hash_packed(_words_view(pc), slot_row, slot_pos, k=k)
    member, idxpos = probe_fn(h)
    member, idxpos = lax.optimization_barrier((member & slot_valid, idxpos))
    hits, totals = _count_core(
        member, idxpos, slot_row, slot_pos, slot_valid, rid, mate,
        chunk_start, num_segments=num_segments,
        dedup_positions=dedup_positions,
    )
    return hits, totals, total


# ---------------------------------------------------------------------------
# Staged pipeline: six small jitted dispatches instead of one mega-program.
#
# The axon/XLA:TPU compiler explodes on large fused programs (observed
# 200-700 s compiles from specific fusion interactions), and any compile
# that long degrades the process session's runtime afterwards. Splitting at
# the natural stage boundaries keeps every compile in seconds and every
# stage at its measured-fast speed; intermediates stay on device, so the
# only extra cost is ~0.1 ms dispatch per stage.
# ---------------------------------------------------------------------------


@jax.jit
def _stage_unpack(packed_codes, packed_valid):
    """(R, L/4) u8 2-bit-packed codes + (R, L/8) u8 validity bitmask ->
    (codes u8 (R, L), validb bool (R, L)). Minimizes host->device transfer
    (5x fewer bytes — significant over the tunneled PCIe path); codes stay
    u8 in HBM (the Pallas kernel casts to u32 at VMEM entry, so the wide
    planes never materialize)."""
    R = packed_codes.shape[0]
    pc = packed_codes.astype(jnp.uint32)
    codes = jnp.stack(
        [(pc >> U32(2 * j)) & U32(3) for j in range(4)], axis=2
    ).reshape(R, -1).astype(jnp.uint8)
    pv = packed_valid.astype(jnp.uint32)
    validb = (
        jnp.stack([(pv >> U32(j)) & U32(1) for j in range(8)], axis=2)
        .reshape(R, -1)
        == 1
    )
    return codes, validb


def host_pack_bits(codes: np.ndarray, validb: np.ndarray):
    """Host-side inverse of _stage_unpack (vectorized NumPy)."""
    R, L = codes.shape
    c = codes.reshape(R, L // 4, 4).astype(np.uint8)
    packed_codes = c[:, :, 0] | (c[:, :, 1] << 2) | (c[:, :, 2] << 4) | (
        c[:, :, 3] << 6
    )
    packed_valid = np.packbits(validb, axis=1, bitorder="little")
    return packed_codes, packed_valid


@functools.partial(jax.jit, static_argnames=("k",))
def _stage_values(codes, mlen, *, k: int):
    """codes (R, L) u8 -> (limbs..., keys): canonical value limbs at every
    position + masked top-16-bit fmix32 selection keys (invalid/tail
    positions pre-masked to the maximum priority 0xFFFF0000)."""
    codes_u32 = codes.astype(jnp.uint32)
    limbs = _windowed_value_limbs(codes_u32, k)
    fold = limbs[0]
    for x in limbs[1:]:
        fold = fold ^ x
    keys = _fmix32(fold) & U32(0xFFFF0000)
    L = codes.shape[1]
    in_row = jnp.arange(L, dtype=jnp.int32)[None, :] < mlen[:, None]
    return (*limbs, jnp.where(in_row, keys, U32(0xFFFF0000)))


@functools.partial(jax.jit, static_argnames=("w",))
def _stage_argmin(keys, *, w: int):
    """pre-masked keys -> wp_i: leftmost window-argmin position per window."""
    return _window_argmin(keys, w)


@functools.partial(jax.jit, static_argnames=("k", "w"))
def _stage_flag_mask(wp_i, validb, mlen, allow_short, *, k: int, w: int):
    """wp_i -> flag: new-minimizer windows whose k-mer is ACGT-valid."""
    R, L = wp_i.shape
    p_idx = jnp.arange(L, dtype=jnp.int32)
    in_row = p_idx[None, :] < mlen[:, None]
    q = p_idx[None, :]
    win_valid = (q <= (mlen[:, None] - w)) | (
        (q == 0) & allow_short[:, None] & (mlen[:, None] >= 1)
    )
    inv = (~validb).astype(jnp.int32)
    cs = jnp.cumsum(inv, axis=1)
    cs_end = _shift_cols(cs, k - 1)
    cs_start = jnp.concatenate(
        [jnp.zeros((R, 1), dtype=jnp.int32), cs[:, :-1]], axis=1
    )
    kmer_valid = lax.optimization_barrier(((cs_end - cs_start) == 0) & in_row)
    prev_wp = jnp.concatenate(
        [jnp.full((R, 1), -1, dtype=jnp.int32), wp_i[:, :-1]], axis=1
    )
    new_min = win_valid & ((q == 0) | (wp_i != prev_wp))
    row_ids = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None], (R, L))
    kv_flat = kmer_valid.astype(jnp.int32).reshape(-1)
    pos_ok = kv_flat[(row_ids * L + wp_i).reshape(-1)].reshape(R, L) == 1
    return new_min & pos_ok


def _stage_flags(keys, validb, mlen, allow_short, *, k: int, w: int):
    wp_i = _stage_argmin(keys, w=w)
    return wp_i, _stage_flag_mask(wp_i, validb, mlen, allow_short, k=k, w=w)


@functools.partial(jax.jit, static_argnames=("budget",))
def _stage_compact(flag, wp_i, *, budget: int):
    """flags -> compacted slot ids via flag-cumsum + binary search."""
    R, L = flag.shape
    flat_flag = flag.reshape(-1)
    csel = jnp.cumsum(flat_flag.astype(jnp.int32))
    total = csel[-1]
    slot_id = jnp.searchsorted(
        csel, jnp.arange(1, budget + 1, dtype=jnp.int32), side="left"
    )
    slot_id = jnp.minimum(slot_id, R * L - 1)
    slot_row = (slot_id // L).astype(jnp.int32)
    slot_pos = wp_i.reshape(-1)[slot_id]
    slot_valid = jnp.arange(budget, dtype=jnp.int32) < jnp.minimum(total, budget)
    return slot_row, slot_pos, slot_valid, total


@functools.partial(jax.jit, static_argnames=("budget",))
def _stage_compact2(wpf, *, budget: int):
    """v2 compaction from the packed argmin word (low 16 = wp, bit 16 =
    flag): like _stage_compact but also returns the flat window slot_id,
    which directly indexes the kernel's value-at-window planes."""
    R, L = wpf.shape
    flat = wpf.reshape(-1)
    csel = jnp.cumsum(flat >> jnp.int32(16))
    total = csel[-1]
    slot_id = jnp.searchsorted(
        csel, jnp.arange(1, budget + 1, dtype=jnp.int32), side="left"
    )
    slot_id = jnp.minimum(slot_id, R * L - 1)
    slot_row = (slot_id // L).astype(jnp.int32)
    slot_pos = flat[slot_id] & jnp.int32(0xFFFF)
    slot_valid = jnp.arange(budget, dtype=jnp.int32) < jnp.minimum(total, budget)
    return slot_id, slot_row, slot_pos, slot_valid, total


@functools.partial(jax.jit, static_argnames=("k",))
def _stage_hash2(vplanes, slot_id, *, k: int):
    """XXH3-64 of the selected values gathered at the window slot ids."""
    slot_limbs = [x.reshape(-1)[slot_id] for x in vplanes]
    if k <= 32:
        return u64.xxh3_64_pair_u64(slot_limbs[0], slot_limbs[1])
    return u64.xxh3_64_pair_u128(
        (slot_limbs[0], slot_limbs[1]), (slot_limbs[2], slot_limbs[3])
    )


@functools.partial(jax.jit, static_argnames=("k",))
def _stage_hash(limbs, slot_row, slot_pos, *, k: int):
    """gather value limbs at slots, XXH3-64 -> hash pair (lo, hi)."""
    L = limbs[0].shape[1]
    slot_flat = slot_row * L + slot_pos
    slot_limbs = [x.reshape(-1)[slot_flat] for x in limbs]
    if k <= 32:
        return u64.xxh3_64_pair_u64(slot_limbs[0], slot_limbs[1])
    return u64.xxh3_64_pair_u128(
        (slot_limbs[0], slot_limbs[1]), (slot_limbs[2], slot_limbs[3])
    )


# ---------------------------------------------------------------------------
# v3 engine stages: packed-input kernel + cumsum-free compaction + slot-level
# value recomputation. HBM traffic per base drops from ~39 B (v2) to ~20 B:
# the dense value planes (8 B/base), the unpack stage (4 B/base), the dense
# wpf read + global cumsum write (8 B/base) all disappear; the adds are the
# kernel's packed reads (0.375 B/base) and ~12 B per SLOT of packed-word
# gathers for value recomputation (~3 B/base at budget 0.25).
# ---------------------------------------------------------------------------


def _words_view(packed_codes):
    """(R, L/4) u8 packed codes -> (R, L/16) u32 little-endian words.

    Word q of a row holds codes [16q, 16q+16), code j at bits 2j — i.e. the
    packed byte stream read as little-endian u32. Bits [2p, 2p+2k) of the
    stream are therefore exactly the forward k-mer value at position p
    (tests/test_engine_v3.py checks this against the NumPy view)."""
    R, Lp = packed_codes.shape
    return jax.lax.bitcast_convert_type(
        packed_codes.reshape(R, Lp // 4, 4), jnp.uint32
    )


def _v3_eligible(k: int, L: int, R: int) -> bool:
    """Static-shape eligibility for the v3 architecture (same predicate on
    every backend so CPU CI exercises the exact TPU decision path)."""
    import os

    if os.environ.get("DEACON_ENGINE", "") == "2":
        return False
    return k <= 32 and R % 8 == 0 and L % 128 == 0 and L <= 16384


def engine_arch(k: int, L: int, R: int) -> int:
    """Which engine architecture these static shapes run: 4 (in-kernel
    butterfly compaction, per-row slot grid — requires pow2 L), 3 (packed
    kernel + cumsum-free compaction), or 2 (dense value planes). Forced
    down with DEACON_ENGINE=2|3. Shared by _launch_batch (budget sizing)
    and _engine_step (stage routing) so the two always agree."""
    import os

    env = os.environ.get("DEACON_ENGINE", "")
    if env == "2":
        return 2
    if not _v3_eligible(k, L, R):
        return 2
    if env == "3":
        return 3
    if L >= 128 and (L & (L - 1)) == 0:
        return 4
    return 3


def v4_row_budget(L: int, w: int, budget_frac: float) -> int:
    """Per-row slot budget for arch 4: the budget fraction applied to the
    row, rounded up to the 128-lane granule (floor 128)."""
    return max(128, (int(budget_frac * L) + 127) // 128 * 128)


def _values_compact(packed_codes, packed_valid, il_codes, il_valid, mlen,
                    allow_short, *, k: int, w: int, Br: int):
    """v4 selection front end: -> ((R, Br) i32 slot positions, ((R, Br)
    u32 limb planes), (R,) i32 row totals). Pallas kernel on TPU
    (ops/pallas_kernels.select_compact_packed); bit-identical XLA
    emulation elsewhere (v2 select + per-row searchsorted + gathers —
    lanes beyond a row's total are unspecified in both)."""
    mode = _pallas_mode()
    R, Lp = packed_codes.shape
    L = Lp * 4
    if mode != "off" and not _pallas_v1_forced():
        from . import pallas_kernels as pk

        pos_c, v_c, row_tot = pk.select_compact_packed(
            il_codes, il_valid, mlen, allow_short, k=k, w=w, Br=Br,
            interpret=(mode == "interpret"),
        )
        return pos_c, v_c, row_tot.reshape(R)
    codes, validb = _stage_unpack(packed_codes, packed_valid)
    limbs, wp_i, flag = _values_flags(
        codes, validb, mlen, allow_short, k=k, w=w
    )
    cs = jnp.cumsum(flag.astype(jnp.int32), axis=1)
    rt = cs[:, -1]
    tq = jnp.arange(Br, dtype=jnp.int32)
    p = jax.vmap(
        lambda c: jnp.searchsorted(c, tq + 1, side="left").astype(jnp.int32)
    )(cs)
    p = jnp.minimum(p, L - 1)
    rowix = jnp.arange(R, dtype=jnp.int32)[:, None]
    pos_c = wp_i[rowix, p]
    v0 = limbs[0][rowix, pos_c]
    v1 = limbs[1][rowix, pos_c]
    return pos_c, (v0, v1), rt


def host_interleave_packed(pc: np.ndarray, pv: np.ndarray):
    """Derive the kernel-v3 interleaved planes from the linear packed
    planes (native C++ bit-transpose when available, vectorized NumPy
    fallback — bit-identical, tests/test_engine_v3.py). Interleaved code
    byte i holds codes {i, i+Lp, i+2Lp, i+3Lp} at bits {0, 2, 4, 6};
    interleaved validity byte i holds bits {i, i+Lv, ..., i+7Lv} — the
    layout Mosaic's tile-repeat turns back into per-lane codes with three
    range compares (see pallas_kernels._select_csum_kernel_body)."""
    try:
        from ..io.native_loader import native_interleave_tile

        out = native_interleave_tile(pc, pv)
        if out is not None:
            return out
    except Exception:
        pass
    R, Lp = pc.shape
    Lv = pv.shape[1]
    pcv = pc.reshape(R, 4, Lp // 4)
    pci = np.zeros((R, Lp), dtype=np.uint8)
    jshift = (np.uint8(1) << (2 * np.arange(4, dtype=np.uint8)))[None, :, None]
    for t in range(4):
        q = ((pcv >> np.uint8(2 * t)) & np.uint8(3)) * jshift
        pci[:, t::4] = q.sum(axis=1, dtype=np.uint8)
    pvv = pv.reshape(R, 8, Lv // 8)
    pvi = np.zeros((R, Lv), dtype=np.uint8)
    bshift = (np.uint8(1) << np.arange(8, dtype=np.uint8))[None, :, None]
    for t in range(8):
        q = ((pvv >> np.uint8(t)) & np.uint8(1)) * bshift
        pvi[:, t::8] = q.sum(axis=1, dtype=np.uint8)
    return pci, pvi


def _values_csum(packed_codes, packed_valid, il_codes, il_valid, mlen,
                 allow_short, *, k: int, w: int):
    """v3 selection front end: -> ((R, L) i32 plane, (R,) i32 row totals)
    with plane = (in-row inclusive flag-cumsum << 16) | wp. Pallas kernel
    on TPU (ops/pallas_kernels.select_csum_packed, fed the interleaved
    planes); bit-identical XLA emulation elsewhere (unpack the linear
    planes + v2 select + per-row cumsum)."""
    mode = _pallas_mode()
    R, Lp = packed_codes.shape
    if mode != "off" and not _pallas_v1_forced():
        from . import pallas_kernels as pk

        plane, row_tot = pk.select_csum_packed(
            il_codes, il_valid, mlen, allow_short, k=k, w=w,
            interpret=(mode == "interpret"),
        )
        return plane, row_tot.reshape(R)
    codes, validb = _stage_unpack(packed_codes, packed_valid)
    limbs, wp_i, flag = _values_flags(
        codes, validb, mlen, allow_short, k=k, w=w
    )
    del limbs  # DCE'd under jit: v3 recomputes values at slots
    fi = flag.astype(jnp.int32)
    cs = jnp.cumsum(fi, axis=1)
    plane = (cs << jnp.int32(16)) | wp_i
    return plane, cs[:, -1]


@functools.partial(jax.jit, static_argnames=("budget",))
def _stage_compact3(plane, row_tot, *, budget: int):
    """Cumsum-free compaction from the kernel's in-row cumsum plane: a tiny
    per-row offset scan (R elements) picks each slot's row, then an unrolled
    binary search over that row's inclusive cumsum (bits 16..30 of the
    plane) finds the slot's window position — no dense R*L pass, and the
    search's bottom-level gathers touch ~1 cache line per slot."""
    R, L = plane.shape
    rt = row_tot.reshape(R)
    c = jnp.cumsum(rt)
    total = c[-1]
    s = jnp.arange(budget, dtype=jnp.int32)
    row = jnp.searchsorted(c, s + 1, side="left").astype(jnp.int32)
    row = jnp.minimum(row, R - 1)
    t = s - (c[row] - rt[row])  # in-row rank (0-based)
    flat = plane.reshape(-1)
    lo = jnp.zeros_like(s)
    hi = jnp.full_like(s, L - 1)
    steps = max(1, (L - 1).bit_length())
    for _ in range(steps):  # lower_bound: first p with csum[p] >= t+1
        mid = (lo + hi) >> 1
        ge = (flat[row * L + mid] >> jnp.int32(16)) >= t + 1
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    p = hi
    slot_id = row * L + p
    slot_pos = flat[slot_id] & jnp.int32(0xFFFF)
    slot_valid = s < jnp.minimum(total, budget)
    return slot_id, row, slot_pos, slot_valid, total


def _rev2_u32(x):
    """Reverse the 16 2-bit groups of each u32 lane."""
    x = (x >> U32(16)) | (x << U32(16))
    x = ((x & U32(0xFF00FF00)) >> U32(8)) | ((x & U32(0x00FF00FF)) << U32(8))
    x = ((x & U32(0xF0F0F0F0)) >> U32(4)) | ((x & U32(0x0F0F0F0F)) << U32(4))
    x = ((x & U32(0xCCCCCCCC)) >> U32(2)) | ((x & U32(0x33333333)) << U32(2))
    return x


@functools.partial(jax.jit, static_argnames=("k",))
def _stage_hash_packed(words, slot_row, slot_pos, *, k: int):
    """XXH3-64 of the canonical k-mer value at each slot's minimizer
    position, recomputed from the packed code words (k <= 32).

    The packed stream's bits [2p, 2p+2k) are the forward value; the reverse
    complement is the 2-bit-group reversal of its complement. Both are
    rebuilt from <= 3 u32 word gathers per slot instead of reading dense
    value planes the kernel would otherwise have to write (8 B/base)."""
    assert k <= 32
    R, LW = words.shape
    flatw = words.reshape(-1)
    nmax = R * LW - 1
    q = slot_pos >> 4  # word index (wp // 16)
    sh = ((slot_pos & jnp.int32(15)) << 1).astype(U32)
    base = slot_row * LW + q
    g0 = flatw[jnp.clip(base, 0, nmax)]
    g1 = flatw[jnp.clip(base + 1, 0, nmax)]
    g2 = flatw[jnp.clip(base + 2, 0, nmax)]
    # funnel shift: (g_hi:g_lo) >> sh with sh in [0, 30]
    inv = (U32(32) - sh) & U32(31)
    hi_ok = sh > U32(0)
    zero = jnp.zeros_like(g0)
    f0 = (g0 >> sh) | jnp.where(hi_ok, g1 << inv, zero)
    f1 = (g1 >> sh) | jnp.where(hi_ok, g2 << inv, zero)
    if 2 * k < 32:
        f0 = f0 & U32((1 << (2 * k)) - 1)
        f1 = zero
    elif 2 * k == 32:
        f1 = zero
    elif 2 * k < 64:
        f1 = f1 & U32((1 << (2 * k - 32)) - 1)
    # reverse complement: complement each base then reverse 2-bit groups
    # within the 2k-bit field (reverse the 64-bit container, shift down)
    comp_mask = U32(0xAAAAAAAA)
    c0 = f0 ^ comp_mask
    c1 = f1 ^ comp_mask
    r0_64 = _rev2_u32(c1)
    r1_64 = _rev2_u32(c0)
    sdown = 64 - 2 * k
    if sdown == 0:
        r0, r1 = r0_64, r1_64
    elif sdown < 32:
        r0 = (r0_64 >> U32(sdown)) | (r1_64 << U32(32 - sdown))
        r1 = r1_64 >> U32(sdown)
    else:  # k <= 16: the field lives in one limb
        r0 = r1_64 >> U32(sdown - 32)
        r1 = zero
    if 2 * k < 32:
        r0 = r0 & U32((1 << (2 * k)) - 1)
        r1 = zero
    elif 2 * k == 32:
        r1 = zero
    elif 2 * k < 64:
        r1 = r1 & U32((1 << (2 * k - 32)) - 1)
    take_f = (f1 < r1) | ((f1 == r1) & (f0 <= r0))
    v0 = jnp.where(take_f, f0, r0)
    v1 = jnp.where(take_f, f1, r1)
    return u64.xxh3_64_pair_u64(v0, v1)


@functools.partial(jax.jit, static_argnames=("max_run",))
def _stage_probe(index_hi, index_lo, n_valid, hlo, hhi, slot_valid,
                 *, max_run: int):
    """``n_valid`` ((1,) i32) masks pow2-bucket pad slots (DevicePipeline
    pads index planes so compiled programs are index-SIZE-independent —
    without it every new index size forced a full recompile, which costs
    minutes through the tunneled compile service; PERFNOTES.md #7)."""
    member, pos = probe_split_u32_pos(
        index_hi, index_lo, (hlo, hhi), max_run=max_run, n_valid=n_valid[0]
    )
    return member & slot_valid, pos


def _count_core(
    member, pos, slot_row, slot_pos, slot_valid, rid, mate, chunk_start,
    *, num_segments: int, dedup_positions: bool,
):
    """Distinct-hit + totals counting from probed slots — the ONE copy of
    this math, traced both by the staged path (_stage_count) and inline by
    engine_core (single-chip and sharded pipelines must stay bit-identical).
    """
    return _count_core_expanded(
        member, pos, rid[slot_row], mate[slot_row],
        chunk_start[slot_row] + slot_pos, slot_valid,
        num_segments=num_segments, dedup_positions=dedup_positions,
    )


def _count_core_expanded(
    member, pos, rid_s, mate_s, matepos_s, slot_valid,
    *, num_segments: int, dedup_positions: bool,
):
    """_count_core over pre-expanded per-slot ids: the arch-4 per-row slot
    grid builds rid_s/mate_s/matepos_s by broadcasting (R,) arrays over the
    (R, Br) grid — elementwise, where the slot_row formulation costs three
    ~20 ms random-gather passes per 3.1M-slot step on TPU."""
    budget = member.shape[0]
    srid = jnp.where(slot_valid, rid_s, num_segments)
    seg_ids = jnp.arange(num_segments, dtype=jnp.int32)

    def neq_prev(x):
        return jnp.concatenate([jnp.ones((1,), dtype=bool), x[1:] != x[:-1]])

    def boundary_sum(flags_sorted, s_rid):
        c = jnp.cumsum(flags_sorted.astype(jnp.int32))
        c_ex = jnp.concatenate([jnp.zeros((1,), jnp.int32), c])
        st = jnp.searchsorted(s_rid, seg_ids, side="left")
        en = jnp.searchsorted(s_rid, seg_ids, side="right")
        return c_ex[en] - c_ex[st]

    # non-member filler keys are DISTINCT NEGATIVES: they sort ahead of all
    # real index positions and are excluded by sign, so the full non-negative
    # i32 range (2^31-1 positions, ~5.2x panhuman) is available for global
    # probe positions (the old bit-30 filler flag capped the padded index at
    # 2^30; VERDICT r2 item 5)
    filler = -jnp.arange(1, budget + 1, dtype=jnp.int32)
    poskey = jnp.where(member, pos, filler)
    srid_h, poskey_h = lax.sort((srid, poskey), num_keys=2)
    hit_flag = (neq_prev(srid_h) | neq_prev(poskey_h)) & (poskey_h >= 0)
    hits = boundary_sum(hit_flag, srid_h)

    if dedup_positions:
        matepos = (mate_s << 30) | matepos_s
        srid_p, matepos_p = lax.sort((srid, matepos), num_keys=2)
        tot_flag = neq_prev(srid_p) | neq_prev(matepos_p)
        totals = boundary_sum(tot_flag, srid_p)
    else:
        starts = jnp.searchsorted(srid, seg_ids, side="left")
        ends = jnp.searchsorted(srid, seg_ids, side="right")
        totals = ends - starts
    return hits, totals


_stage_count = functools.partial(
    jax.jit, static_argnames=("num_segments", "dedup_positions")
)(_count_core)

_stage_count_expanded = functools.partial(
    jax.jit, static_argnames=("num_segments", "dedup_positions")
)(_count_core_expanded)


def _pallas_mode() -> str:
    """'compiled' | 'interpret' | 'off' for the fused Pallas kernels.

    Defaults to compiled on TPU backends and off elsewhere (the Mosaic
    kernels have no CPU lowering; interpret mode is for tests). Override
    with DEACON_PALLAS=0|interpret|1|2 (1 forces the v1 S1+S2 kernel +
    XLA flag stage; 2/default uses the fully-fused v2 select kernel).
    """
    import os

    v = os.environ.get("DEACON_PALLAS", "").lower()
    if v in ("0", "off"):
        return "off"
    if v == "interpret":
        return "interpret"
    try:
        import jax as _jax

        return "compiled" if _jax.devices()[0].platform == "tpu" else "off"
    except Exception:
        return "off"


def _pallas_v1_forced() -> bool:
    import os

    return os.environ.get("DEACON_PALLAS", "") == "1"


def _values_flags(codes, validb, mlen, allow_short, *, k: int, w: int):
    """S1+S2(+flag mask): returns (limbs, wp_i, flag), using the fused
    Pallas v1 kernel (ops/pallas_kernels.py) where supported."""
    mode = _pallas_mode()
    R, L = codes.shape
    if mode != "off" and k <= 56 and R % 8 == 0 and L <= 65536:
        from . import pallas_kernels as pk

        limbs, wp_i = pk.values_argmin_fused(
            codes, mlen, k=k, w=w, interpret=(mode == "interpret")
        )
        flag = _stage_flag_mask(wp_i, validb, mlen, allow_short, k=k, w=w)
        return limbs, wp_i, flag
    out = _stage_values(codes, mlen, k=k)
    limbs, keys = out[:-1], out[-1]
    # barriers around the masked keys and the argmin: in the staged pipeline
    # these are separate dispatches, but when inlined into one jit (e.g.
    # engine_core under shard_map) the where-mask fused into the doubling
    # argmin is an axon compile bomb (206 s -> 1 s, measured)
    keys = lax.optimization_barrier(keys)
    wp_i = lax.optimization_barrier(_stage_argmin(keys, w=w))
    flag = _stage_flag_mask(wp_i, validb, mlen, allow_short, k=k, w=w)
    return limbs, wp_i, flag


def _values_select(codes, validb, mlen, allow_short, *, k: int, w: int):
    """Kernel-v2 contract: returns (vplanes, wpf) where ``vplanes[i][r, p]``
    is limb i of the SELECTED minimizer's canonical value for the window
    starting at p (the value at wp[r, p]) and ``wpf`` packs the argmin
    position in its low 16 bits with the final candidate flag at bit 16.
    Downstream slot gathers index the window domain directly, so the
    separate limb planes, the flag-stage gather, and a dedicated flag plane
    all disappear (pallas_kernels.values_select_fused). Falls back to the
    v1 path plus one flat gather per limb on CPU/forced-v1 — bit-identical
    by construction (tests/test_pallas_kernels.py)."""
    mode = _pallas_mode()
    R, L = codes.shape
    if (
        mode != "off" and not _pallas_v1_forced()
        and k <= 56 and R % 8 == 0 and L <= 65536
    ):
        from . import pallas_kernels as pk

        return pk.values_select_fused(
            codes, validb, mlen, allow_short, k=k, w=w,
            interpret=(mode == "interpret"),
        )
    limbs, wp_i, flag = _values_flags(
        codes, validb, mlen, allow_short, k=k, w=w
    )
    row_ids = jnp.broadcast_to(
        jnp.arange(R, dtype=jnp.int32)[:, None], (R, L)
    )
    sel_flat = (row_ids * L + wp_i).reshape(-1)
    vplanes = tuple(x.reshape(-1)[sel_flat].reshape(R, L) for x in limbs)
    wpf = wp_i | jnp.where(flag, jnp.int32(1 << 16), jnp.int32(0))
    return vplanes, wpf


def _probe_dispatch(index_hi, index_lo, n_valid, hlo, hhi, slot_valid,
                    *, max_run: int, probe_extra):
    """Route to the cuckoo probe (2-D table plane + baked mix constants)
    or the sorted-plane searchsorted probe."""
    if index_hi.ndim == 2:
        if not (isinstance(probe_extra, tuple) and len(probe_extra) == 3):
            raise RuntimeError(
                "radix probe planes reached the member/pos probe path — "
                "DEACON_ENGINE was changed after the pipeline was built"
            )
        c1, c2, has_sent = probe_extra
        return _stage_probe_cuckoo(
            index_hi, hlo, hhi, slot_valid,
            c1=c1, c2=c2, has_sentinel=has_sent,
        )
    return _stage_probe(
        index_hi, index_lo, n_valid, hlo, hhi, slot_valid, max_run=max_run
    )


def _engine_step(
    codes, validb, mlen, allow_short, rid, mate, chunk_start,
    index_hi, index_lo, n_valid, il_codes=None, il_valid=None,
    *, k: int, w: int, budget: int, num_segments: int, max_run: int,
    dedup_positions: bool, packed: bool = False, probe_extra=None,
):
    """Chained staged pipeline (all dispatches async; arrays stay on device).

    With packed=True, ``codes``/``validb`` are the bit-packed forms from
    host_pack_bits and are unpacked on device. ``n_valid`` ((1,) i32) masks
    the pow2-bucket pad region of the index planes.

    Architecture: packed inputs route through the v3 stages (packed-input
    kernel, cumsum-free compaction, slot-level value recomputation — see
    the v3 section above) when the static shapes are eligible; otherwise
    (wide k, exotic tiles, DEACON_ENGINE=2) the v2 stages run. Both are
    bit-identical (tests/test_engine_v3.py).
    """
    if packed:
        R, Lp = codes.shape
        arch = engine_arch(k, Lp * 4, R)
        is_radix = (
            isinstance(probe_extra, tuple) and len(probe_extra) >= 1
            and probe_extra[0] in ("radix", "radix_emul")
        )
        if arch == 4 and il_codes is not None and is_radix:
            # arch 5: gather-free radix-window probe + grid-side totals
            # (ops/radix_probe.py). Overflow (adversarial span/density)
            # rides bit 30 of the fused `used` word; the host reruns the
            # batch through the exact emulation twin.
            from . import radix_probe as _rp

            if len(probe_extra) == 5:
                tag, rp_p, rp_k, rp_npl, rp_sp = probe_extra
            else:
                tag, rp_p, rp_k, rp_npl = probe_extra
                rp_sp = 0
            pos_c, v_c, rt = _values_compact(
                codes, validb, il_codes, il_valid, mlen, allow_short,
                k=k, w=w, Br=budget,
            )
            valid2d = (
                jax.lax.broadcasted_iota(jnp.int32, (R, budget), 1)
                < jnp.minimum(rt, budget)[:, None]
            )
            hlo, hhi = u64.xxh3_64_pair_u64(
                v_c[0].reshape(-1), v_c[1].reshape(-1)
            )
            mode = "emulate"
            if tag == "radix":
                pm = _pallas_mode()
                if pm == "compiled":
                    mode = "compiled"
                elif pm == "interpret":
                    mode = "interpret"
            rid_s = jnp.broadcast_to(rid[:, None], (R, budget))
            hits, overflow = _rp.radix_probe_hits(
                index_hi, rp_p, rp_k, rp_npl, hlo, hhi, valid2d,
                rid_s, pos_c, num_segments=num_segments, mode=mode,
                spill=index_lo if rp_sp else None, sp=rp_sp,
            )
            L = Lp * 4
            l = k + w - 1
            totals = _rp.totals_grid(
                pos_c, valid2d, rid, mate, chunk_start,
                num_segments=num_segments, k=k, l=l,
                stride=max(1, L - l + 1),
                dedup_positions=dedup_positions,
            )
            used = jnp.max(rt) | (
                overflow.astype(jnp.int32) << jnp.int32(30)
            )
            return hits, totals, used
        if arch == 4 and il_codes is not None:
            # budget is the PER-ROW slot count Br for arch 4
            pos_c, v_c, rt = _values_compact(
                codes, validb, il_codes, il_valid, mlen, allow_short,
                k=k, w=w, Br=budget,
            )
            slot_valid = (
                jax.lax.broadcasted_iota(jnp.int32, (R, budget), 1)
                < jnp.minimum(rt, budget)[:, None]
            ).reshape(-1)
            hlo, hhi = u64.xxh3_64_pair_u64(
                v_c[0].reshape(-1), v_c[1].reshape(-1)
            )
            member, pos = _probe_dispatch(
                index_hi, index_lo, n_valid, hlo, hhi, slot_valid,
                max_run=max_run, probe_extra=probe_extra,
            )
            def expand(x):
                return jnp.broadcast_to(x[:, None], (R, budget)).reshape(-1)

            slot_pos = pos_c.reshape(-1)
            hits, totals = _stage_count_expanded(
                member, pos, expand(rid), expand(mate),
                expand(chunk_start) + slot_pos, slot_valid,
                num_segments=num_segments,
                dedup_positions=dedup_positions,
            )
            if not dedup_positions:
                # the per-row slot grid leaves srid UNSORTED (invalid lanes
                # interleave between rows), which breaks _count_core's
                # searchsorted-based totals; per-read totals are just the
                # segment-sum of per-row selected counts (the hits path
                # sorts and is order-safe). The discarded totals above are
                # DCE'd under jit.
                totals = jax.ops.segment_sum(
                    jnp.minimum(rt, budget), rid,
                    num_segments=num_segments,
                )
            return hits, totals, jnp.max(rt)
        if arch == 3 and il_codes is not None:
            plane, row_tot = _values_csum(
                codes, validb, il_codes, il_valid, mlen, allow_short,
                k=k, w=w,
            )
            plane = lax.optimization_barrier(plane)
            slot_id, slot_row, slot_pos, slot_valid, total = _stage_compact3(
                plane, row_tot, budget=budget
            )
            hlo, hhi = _stage_hash_packed(
                _words_view(codes), slot_row, slot_pos, k=k
            )
            member, pos = _probe_dispatch(
                index_hi, index_lo, n_valid, hlo, hhi, slot_valid,
                max_run=max_run, probe_extra=probe_extra,
            )
            hits, totals = _stage_count(
                member, pos, slot_row, slot_pos, slot_valid, rid, mate,
                chunk_start, num_segments=num_segments,
                dedup_positions=dedup_positions,
            )
            return hits, totals, total
        codes, validb = _stage_unpack(codes, validb)
    vplanes, wpf = _values_select(
        codes, validb, mlen, allow_short, k=k, w=w
    )
    slot_id, slot_row, slot_pos, slot_valid, total = _stage_compact2(
        wpf, budget=budget
    )
    hlo, hhi = _stage_hash2(vplanes, slot_id, k=k)
    member, pos = _probe_dispatch(
        index_hi, index_lo, n_valid, hlo, hhi, slot_valid,
        max_run=max_run, probe_extra=probe_extra,
    )
    hits, totals = _stage_count(
        member, pos, slot_row, slot_pos, slot_valid, rid, mate, chunk_start,
        num_segments=num_segments, dedup_positions=dedup_positions,
    )
    return hits, totals, total


@jax.jit
def _stage_fuse_out(hits, totals, used):
    """Fuse the three step outputs into ONE device array so resolve() does a
    single device->host fetch. On the tunneled axon backend a synchronous
    np.asarray of a device array costs seconds (each fetch pays a slow RPC
    path), while copy_to_host_async + one fetch is ~25 ms."""
    return jnp.concatenate([
        hits.astype(jnp.int32),
        totals.astype(jnp.int32),
        used.astype(jnp.int32)[None],
    ])


_FUSED_STEPS: dict[tuple, object] = {}


def engine_step_fused(statics: tuple):
    """One jitted XLA program for the ENTIRE engine step + output fusing.

    vs the chain of separately-jitted stages: 1 dispatch instead of 9
    (measured 0.04 ms vs 0.15 ms per (512,16384) step free-running) and XLA
    may fuse across stage boundaries. The staged path remains available with
    DEACON_TPU_STAGED=1 as a hedge against pathological whole-program
    compiles on new tile shapes (see PERFNOTES.md compile-bomb notes).

    ``statics`` = (k, w, budget, num_segments, max_run, dedup_positions).
    Returns fn(codes, validb, mlen, allow_short, rid, mate, chunk_start,
    index_hi, index_lo, n_valid, il_codes, il_valid) -> fused (2R+1,) i32
    output (il_codes/il_valid are the v3 kernel's interleaved planes —
    (1, 1) dummies when the statics are v3-ineligible). With the
    pow2-padded index planes (DevicePipeline), the compiled program depends
    only on the tile statics and the index's size BUCKET — a new index of
    similar magnitude reuses the persistent-cache entry instead of paying a
    multi-minute tunnel compile.
    """
    import os

    # DEACON_PALLAS is read at trace time (_values_csum/_values_compact),
    # so it must be part of the cache key alongside DEACON_ENGINE —
    # flipping it mid-process must not serve a stale compiled program
    key = (
        statics,
        os.environ.get("DEACON_ENGINE", ""),
        os.environ.get("DEACON_PALLAS", ""),
        os.environ.get("DEACON_RADIX_TQ", ""),
        os.environ.get("DEACON_RADIX_FACTOR", ""),
        os.environ.get("DEACON_RADIX_SLACK", ""),
        os.environ.get("DEACON_RADIX_SPARSE", ""),
        os.environ.get("DEACON_RADIX_CH", ""),
        os.environ.get("DEACON_RADIX_FWCAP", ""),
        os.environ.get("DEACON_RADIX_SPLIT", ""),
    )
    fn = _FUSED_STEPS.get(key)
    if fn is None:
        if len(statics) == 7:
            (k, w, budget, num_segments, max_run, dedup_positions,
             probe_extra) = statics
        else:
            k, w, budget, num_segments, max_run, dedup_positions = statics
            probe_extra = None

        def whole(codes, validb, mlen, allow_short, rid, mate, chunk_start,
                  index_hi, index_lo, n_valid, il_codes, il_valid):
            hits, totals, used = _engine_step(
                codes, validb, mlen, allow_short, rid, mate, chunk_start,
                index_hi, index_lo, n_valid, il_codes, il_valid,
                k=k, w=w, budget=budget,
                num_segments=num_segments, max_run=max_run,
                dedup_positions=dedup_positions, packed=True,
                probe_extra=probe_extra,
            )
            return jnp.concatenate([
                hits.astype(jnp.int32),
                totals.astype(jnp.int32),
                used.astype(jnp.int32)[None],
            ])

        whole.__name__ = "_engine_step"  # stable persistent-cache key name
        fn = jax.jit(whole)
        _FUSED_STEPS[key] = fn
    return fn


def _entropy_from_counts(cmat, tot):
    """Scaled Shannon entropy from per-slot ACGT counts — the ONE copy of
    the float math (ref: src/minimizers.rs:73-121), shared by the v2
    cumsum-gather stage and the v4 value-limb stage so both are
    bit-identical."""
    p = cmat / jnp.maximum(tot, 1.0)[:, None]
    terms = jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-30)), 0.0)
    ent = -terms.sum(axis=1) / jnp.float32(2.0)
    return jnp.where(tot > 0, ent, jnp.float32(1.0))


@functools.partial(jax.jit, static_argnames=("k",))
def _stage_entropy(
    orig_codes, validb, slot_row, slot_pos, slot_valid, entropy_threshold,
    *, k: int,
):
    """Scaled Shannon entropy filter of the ORIGINAL k-mer's ACGT
    composition at the compacted slots (ref: src/minimizers.rs:73-121)."""
    R, L = orig_codes.shape
    zero = jnp.zeros((R, 1), dtype=jnp.int32)
    oc = orig_codes.astype(jnp.int32)
    slot_flat_end = slot_row * (L + 1) + slot_pos + k
    slot_flat_start = slot_row * (L + 1) + slot_pos
    counts = []
    for c in range(4):
        onec = ((oc == c) & validb).astype(jnp.int32)
        cs = jnp.concatenate([zero, jnp.cumsum(onec, axis=1)], axis=1)
        cs = lax.optimization_barrier(cs).reshape(-1)
        counts.append((cs[slot_flat_end] - cs[slot_flat_start]).astype(jnp.float32))
    cmat = jnp.stack(counts, axis=1)  # (budget, 4)
    tot = cmat.sum(axis=1)
    ent = _entropy_from_counts(cmat, tot)
    return slot_valid & (ent >= entropy_threshold)


def _entropy_from_limbs(v0, v1, entropy_threshold, *, k: int):
    """Entropy filter computed from the canonical k-mer VALUE limbs —
    gather-free (elementwise SWAR + popcount), exact because (a) Shannon
    entropy is invariant under the revcomp base permutation A<->T/C<->G,
    so canonical-value composition == forward-k-mer composition, and
    (b) index-side extraction only keeps slots whose original k-mer is
    all-ACGT (ref: src/minimizers.rs:151-170), so the original-bytes
    composition equals the value composition on every surviving slot."""
    mask0 = U32((1 << min(2 * k, 32)) - 1 if 2 * k < 32 else 0xFFFFFFFF)
    mask1 = U32(0) if 2 * k <= 32 else U32((1 << (2 * k - 32)) - 1)
    counts = []
    for c in range(4):
        c0, c1 = U32(0x55555555 * (c & 1)), U32(0x55555555 * (c >> 1))
        n = jnp.zeros(v0.shape, dtype=jnp.int32)
        for limb, m in ((v0, mask0), (v1, mask1)):
            lo = ~(limb ^ c0)
            hi = ~((limb >> U32(1)) ^ c1)
            eq = lo & hi & U32(0x55555555) & m
            n = n + lax.population_count(eq).astype(jnp.int32)
        counts.append(n.astype(jnp.float32))
    cmat = jnp.stack(counts, axis=1)
    tot = cmat.sum(axis=1)
    ent = _entropy_from_counts(cmat, tot)
    return ent >= entropy_threshold


@jax.jit
def _stage_srid(slot_row, slot_valid, rid):
    return jnp.where(slot_valid, rid[slot_row], jnp.int32(2**31 - 1))


def _extract_step(
    codes,  # (R, L) uint8 IUPAC-canonicalised 2-bit codes
    orig_codes,  # (R, L) uint8 codes of the ORIGINAL bytes (for entropy)
    validb,  # (R, L) bool: original byte was ACGT/acgt
    mlen,
    allow_short,
    rid,  # (R,) int32 record id per row
    entropy_threshold,  # f32 scalar
    *,
    k: int,
    w: int,
    budget: int,
    use_entropy: bool,
):
    """Index-build extraction (ref: src/minimizers.rs:125-191): returns the
    compacted (hashes, rids, valid, total) for host-side set accumulation.
    Staged dispatches (see the staged-pipeline note above)."""
    vplanes, wpf = _values_select(
        codes, validb, mlen, allow_short, k=k, w=w
    )
    slot_id, slot_row, slot_pos, slot_valid, total = _stage_compact2(
        wpf, budget=budget
    )
    hlo, hhi = _stage_hash2(vplanes, slot_id, k=k)
    if use_entropy and k >= 10:
        slot_valid = _stage_entropy(
            orig_codes, validb, slot_row, slot_pos, slot_valid,
            entropy_threshold, k=k,
        )
    srid = _stage_srid(slot_row, slot_valid, rid)
    return hlo, hhi, srid, slot_valid, total


@functools.partial(
    jax.jit, static_argnames=("k", "w", "Br", "use_entropy")
)
def _extract_step_v4(pc, pv, pci, pvi, mlen, allow_short, rid,
                     entropy_threshold,
                     *, k: int, w: int, Br: int, use_entropy: bool = False):
    """Index-build extraction on the gather-free v4 chain: in-kernel
    butterfly compaction + elementwise hashing over the per-row slot grid,
    fused into ONE program (the unjitted chain paid ~0.5 ms of per-op
    dispatches for the xxh3 math alone). Entropy-filtered builds (e > 0)
    now ride this chain too via the value-limb SWAR entropy
    (_entropy_from_limbs; r3 VERDICT item 7) instead of dropping to the
    v2 cumsum-gather engine. Returns (hlo, hhi, srid, valid,
    max_row_total) with arrays of length R*Br."""
    R = mlen.shape[0]
    pos_c, v_c, rt = _values_compact(
        pc, pv, pci, pvi, mlen, allow_short, k=k, w=w, Br=Br
    )
    slot_valid = (
        jax.lax.broadcasted_iota(jnp.int32, (R, Br), 1)
        < jnp.minimum(rt, Br)[:, None]
    ).reshape(-1)
    if use_entropy and k >= 10:
        ent_ok = _entropy_from_limbs(
            v_c[0].reshape(-1), v_c[1].reshape(-1), entropy_threshold, k=k
        )
        slot_valid = slot_valid & ent_ok
    hlo, hhi = u64.xxh3_64_pair_u64(v_c[0].reshape(-1), v_c[1].reshape(-1))
    rid_x = jnp.broadcast_to(rid[:, None], (R, Br)).reshape(-1)
    srid = jnp.where(slot_valid, rid_x, jnp.int32(2**31 - 1))
    return hlo, hhi, srid, slot_valid, jnp.max(rt)


@jax.jit
def _fuse_extract_out(hlo, hhi, srid, valid, total):
    """Fuse one extract-chunk's outputs into a single (4B+1,) u32 array
    (layout: hlo | hhi | srid | valid | total) so the index-build path can
    materialize a whole batch in one fetch."""
    return jnp.concatenate([
        hlo,
        hhi,
        lax.bitcast_convert_type(srid, jnp.uint32),
        valid.astype(jnp.uint32),
        lax.bitcast_convert_type(total, jnp.uint32).reshape(1),
    ])


_EXTRACT_CONCAT = None


def _extract_concat(outs):
    global _EXTRACT_CONCAT
    if _EXTRACT_CONCAT is None:
        _EXTRACT_CONCAT = jax.jit(lambda *xs: jnp.concatenate(xs))
    return _EXTRACT_CONCAT(*outs)


@dataclass
class _Row:
    rid: int
    mate: int
    chunk_start: int
    seq: bytes  # effective chunk bytes


def pack_rows(rows: list["_Row"], R: int, L: int, k: int, l: int):
    """Vectorized host-side packing of row byte strings into device arrays.

    One arena concat + two table lookups + one flat scatter — avoids a
    Python per-row loop (the reference's per-record packing runs in SIMD;
    ref: src/filter_common.rs:238).
    """
    n = len(rows)
    codes = np.zeros((R, L), dtype=np.uint8)
    validb = np.zeros((R, L), dtype=bool)
    mlen = np.full(R, -1, dtype=np.int32)
    allow_short = np.zeros(R, dtype=bool)
    rid = np.zeros(R, dtype=np.int32)
    mate = np.zeros(R, dtype=np.int32)
    cstart = np.zeros(R, dtype=np.int32)
    if n == 0:
        return codes, validb, mlen, allow_short, rid, mate, cstart

    lens = np.fromiter((len(r.seq) for r in rows), dtype=np.int64, count=n)
    arena = np.frombuffer(b"".join(r.seq for r in rows), dtype=np.uint8)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
    offs = np.arange(arena.size, dtype=np.int64) - np.repeat(starts, lens)
    dest = row_of * L + offs
    codes.reshape(-1)[dest] = PACK_CODE_NP[arena]
    validb.reshape(-1)[dest] = VALID_BASE_NP[arena]
    mlen[:n] = lens - (k - 1)
    allow_short[:n] = lens < l
    rid[:n] = np.fromiter((r.rid for r in rows), dtype=np.int32, count=n)
    mate[:n] = np.fromiter((r.mate for r in rows), dtype=np.int32, count=n)
    cstart[:n] = np.fromiter(
        (r.chunk_start for r in rows), dtype=np.int32, count=n
    )
    return codes, validb, mlen, allow_short, rid, mate, cstart


PACK_CODE_NP = mnp.PACK_CODE
VALID_BASE_NP = mnp.VALID_BASE


def pack_rows_packed(rows: list["_Row"], R: int, L: int, k: int, l: int):
    """pack_rows + host_pack_bits fused, via the native C++ tile packer when
    available (the NumPy path costs ~13 ms per 2 Mbases on a small host and
    was the CLI end-to-end bottleneck; the C++ packer runs at memcpy-ish
    speed). Returns (packed_codes, packed_valid, mlen, allow_short, rid,
    mate, cstart)."""
    n = len(rows)
    mlen = np.full(R, -1, dtype=np.int32)
    allow_short = np.zeros(R, dtype=bool)
    rid = np.zeros(R, dtype=np.int32)
    mate = np.zeros(R, dtype=np.int32)
    cstart = np.zeros(R, dtype=np.int32)
    if n == 0:
        return (
            np.zeros((R, L // 4), dtype=np.uint8),
            np.zeros((R, L // 8), dtype=np.uint8),
            mlen, allow_short, rid, mate, cstart,
        )
    native = None
    try:
        from ..io.native_loader import native_pack_tile

        lens = np.fromiter((len(r.seq) for r in rows), dtype=np.int64, count=n)
        arena = np.frombuffer(b"".join(r.seq for r in rows), dtype=np.uint8)
        starts = np.concatenate([[0], np.cumsum(lens[:-1])])
        native = native_pack_tile(arena, starts, lens, R, L)
    except Exception:
        native = None
    if native is None:
        codes, validb, mlen, allow_short, rid, mate, cstart = pack_rows(
            rows, R, L, k, l
        )
        pc, pv = host_pack_bits(codes, validb)
        return pc, pv, mlen, allow_short, rid, mate, cstart
    pc, pv = native
    mlen[:n] = lens - (k - 1)
    allow_short[:n] = lens < l
    rid[:n] = np.fromiter((r.rid for r in rows), dtype=np.int32, count=n)
    mate[:n] = np.fromiter((r.mate for r in rows), dtype=np.int32, count=n)
    cstart[:n] = np.fromiter(
        (r.chunk_start for r in rows), dtype=np.int32, count=n
    )
    return pc, pv, mlen, allow_short, rid, mate, cstart


def default_budget_frac(w: int | None = None) -> float:
    """Minimizer-slot budget as a fraction of R*L positions. The random
    selection scheme's density is 2/(w+1) (~0.125 at w=15); the default is
    a 1.5x margin on that, clamped to [0.15, 0.5] (at the default w=15:
    0.1875). Overflow falls back/regrows gracefully, and over a 512K-
    position tile the density's variance is tiny, so 1.5x is ample. The
    budget domain (compact/hash/probe/count work per slot) is a top HBM
    consumer — round 2 shipped a flat 0.35, round 3 a flat 0.25; the
    w-aware default trims the last structural slack. Override with
    DEACON_BUDGET_FRAC."""
    import os

    env = os.environ.get("DEACON_BUDGET_FRAC")
    if env:
        try:
            return float(env)
        except ValueError:
            import sys

            print(
                f"deacon: WARNING: DEACON_BUDGET_FRAC={env!r} is not a "
                "number; using the w-aware default",
                file=sys.stderr,
            )
    if w is None:
        return 0.25
    return min(0.5, max(0.15, 1.5 * 2.0 / (w + 1)))


class BudgetOverflow(RuntimeError):
    """Minimizer budget exceeded for a device batch; caller should fall back."""


class FetchGroup:
    """Cross-batch device->host fetch amortizer.

    Device outputs (1-D i32 arrays) from many launched batches accumulate
    here; the first resolve concatenates EVERYTHING pending in one jitted
    device-side concat and materializes a single fused array, then hands
    per-ticket slices back from a cache. On the tunneled ``axon`` backend
    every materialization costs a flat ~23 ms sync regardless of size
    (PERFNOTES.md cassette notes), so fetching once per K batches divides
    the dominant per-batch cost by K; on real hardware it merely batches
    tiny PCIe transfers. The filter engine keeps up to
    ``decider.resolve_depth`` batches in flight to feed this.
    """

    def __init__(self, fuse: bool = True):
        # fuse=False skips the device-side concat and fetches per array
        # (still batched per resolve): required for process-spanning meshes,
        # where a jit-chosen output sharding may not be fully addressable
        # from any single host.
        self._fuse = fuse
        self._pending: list[tuple[int, list]] = []
        self._done: dict[int, list[np.ndarray]] = {}
        self._next = 0
        self._concat = None  # built lazily (jax.jit retraces per shape set)

    def register(self, arrays: list) -> int:
        """Add one batch's device outputs; returns a ticket for resolve."""
        t = self._next
        self._next += 1
        self._pending.append((t, list(arrays)))
        return t

    def materialize(self, ticket: int) -> list[np.ndarray]:
        got = self._done.pop(ticket, None)
        if got is not None:
            return got
        pending, self._pending = self._pending, []
        if not self._fuse:
            for t, arrs in pending:
                self._done[t] = [np.asarray(a) for a in arrs]
            return self._done.pop(ticket)
        flat: list = []
        meta: list[tuple[int, list[int]]] = []
        for t, arrs in pending:
            meta.append((t, [int(a.shape[0]) for a in arrs]))
            flat.extend(arrs)
        if not flat:
            fused = np.zeros(0, dtype=np.int32)
        elif len(flat) == 1:
            fused = np.asarray(flat[0])
        else:
            if self._concat is None:
                self._concat = jax.jit(lambda *xs: jnp.concatenate(xs))
            fused = np.asarray(self._concat(*flat))
        off = 0
        for t, lens in meta:
            outs = []
            for n in lens:
                outs.append(fused[off : off + n])
                off += n
            self._done[t] = outs
        return self._done.pop(ticket)


def rows_for_read(rid: int, mate: int, seq: bytes, prefix_length: int,
                  *, k: int, l: int, stride: int, max_len: int):
    """Split one read into device rows: prefix truncation, one trailing
    newline stripped (ref: src/filter_common.rs:222-229), and chunking at
    the overlap-preserving stride so every w-window lands in exactly one
    chunk. Shared by the single-device and sharded pipelines."""
    if len(seq) < k:
        return []
    eff = seq
    if prefix_length > 0 and len(eff) > prefix_length:
        eff = eff[:prefix_length]
    if eff.endswith(b"\n"):
        eff = eff[:-1]
    n = len(eff)
    if n < k:
        return []
    if n <= max_len:
        return [_Row(rid, mate, 0, eff)]
    rows = []
    s = 0
    while s <= n - l:
        rows.append(_Row(rid, mate, s, eff[s : s + max_len]))
        s += stride
    return rows


class DevicePipeline:
    """Fused extract+probe+count pipeline over a device-resident index.

    Reads are bucketed per logical unit (read or pair) into static tile
    classes (L, R) so short reads don't pay long-read padding; all rows of a
    unit stay in one device batch so distinct-hit counting is exact. Units
    whose chunk rows exceed a tile's R (reads beyond ~stride*R bases) raise
    BudgetOverflow and are handled by the host oracle.
    """

    #: (row_len, rows_per_batch) tile classes, ascending; last handles chunks
    DEFAULT_TILES = ((256, 8192), (2048, 2048), (16384, 512))

    def __init__(
        self,
        index_hashes: np.ndarray,
        k: int,
        w: int,
        tiles=None,
        budget_frac: float | None = None,
        device=None,
        cache_path=None,
    ):
        if budget_frac is None:
            budget_frac = default_budget_frac(w)
        self.k, self.w = int(k), int(w)
        self.l = self.k + self.w - 1
        if tiles is None:
            import os

            env = os.environ.get("DEACON_TPU_TILES")
            if env:
                tiles = [
                    tuple(int(x) for x in part.split(":"))
                    for part in env.split(",")
                ]
        tiles = tiles or self.DEFAULT_TILES
        self.tiles = [(int(L), int(R)) for L, R in tiles if L >= self.l]
        if not self.tiles:
            self.tiles = [(max(self.l, 64), 4096)]
        self.budget_frac = budget_frac
        # Always commit arrays to an explicit device: uncommitted inputs
        # compile with UnspecifiedValue arg shardings, which changes the
        # persistent-cache key — a CLI run (device defaulted) would never
        # share cache entries with bench/tests (explicit device), forcing a
        # full recompile per process on the axon backend.
        self.device = device if device is not None else jax.devices()[0]
        device = self.device
        arr = np.sort(np.asarray(index_hashes, dtype=np.uint64))
        # Probe representation: bucketized cuckoo by default (two slice
        # gathers per probe — the TPU's random gathers are element-serial,
        # so the sorted planes' searchsorted+run-scan cost ~41 gather
        # passes per step; PERFNOTES round-3 "real device timeline").
        # DEACON_PROBE=sorted forces the sorted planes; indexes too large
        # for i32 cuckoo slot ids (> ~8.6e8 keys) fall back automatically.
        import os

        self._probe_extra = None
        built = None
        probe_pref = os.environ.get("DEACON_PROBE", "radix")
        # arch-5 radix-window probe (gather-free; ops/radix_probe.py) is
        # the default whenever every tile class routes through the arch-4
        # slot-grid front end (its probe contract is hits-per-read, not
        # member/pos, so v2/v3 tile classes can't consume it)
        if (
            probe_pref == "radix"
            and k <= 32
            and all(
                engine_arch(k, L, R) == 4 and R <= 16384
                for (L, R) in self.tiles
            )
        ):
            from .radix_probe import build_radix_table

            rt = build_radix_table(arr, cache_path=cache_path)
            if rt is not None:
                self._probe_extra = (
                    "radix", rt.p, rt.k, rt.nplanes, rt.sp
                )
                self.max_run = 8  # unused by the radix probe; kept static
                self.index_hi = jax.device_put(jnp.asarray(rt.planes), device)
                # the spill side table rides the (otherwise unused)
                # index_lo argument slot of the fused step
                self.index_lo = jax.device_put(
                    jnp.asarray(rt.spill) if rt.sp
                    else jnp.zeros(1, dtype=jnp.uint32),
                    device,
                )
                self._n_valid = jax.device_put(
                    jnp.zeros(1, dtype=jnp.int32), device
                )
                self.L_max = self.tiles[-1][0]
                self._stride = self.L_max - self.l + 1
                self.fetch_group = FetchGroup()
                return
        if probe_pref not in ("sorted",):
            built = build_cuckoo_planes(arr, cache_path=cache_path)
        if built is None and probe_pref != "sorted":
            # r3 VERDICT item 5: the flagship-scale union (panhuman +
            # panmouse ~ 9.6e8 keys) crosses the cuckoo i32-slot-id
            # ceiling and used to lose ~40x silently
            import sys

            print(
                f"deacon: WARNING: index has {arr.size} keys, above the "
                "cuckoo probe ceiling (~8.6e8); falling back to the "
                "sorted-plane probe (~10-40x slower device steps). Shard "
                "the index across devices (--mesh) or split it "
                "(index diff/union) to stay under the ceiling. "
                "[DEACON_PROBE=sorted silences this]",
                file=sys.stderr,
            )
        if built is not None:
            table, c1, c2, has_sent = built
            self.max_run = 8  # unused by the cuckoo probe; kept static
            self._probe_extra = (c1, c2, has_sent)
            self.index_hi = jax.device_put(jnp.asarray(table), device)
            self.index_lo = jax.device_put(
                jnp.zeros(1, dtype=jnp.uint32), device
            )
            self._n_valid = jax.device_put(
                jnp.zeros(1, dtype=jnp.int32), device
            )
        else:
            # Pad the planes to a pow2 size bucket (sort-preserving
            # distinct-hi filler, masked by n_valid): the compiled engine
            # step then depends only on the bucket, not the exact index
            # size, so any index of similar magnitude hits the same
            # persistent-cache entry. Without this, every new index forced
            # a full whole-engine recompile — minutes through the tunneled
            # compile service (PERFNOTES.md #7).
            n_pad = 1024
            while n_pad < arr.size:
                n_pad *= 2
            if n_pad >= PROBE_POSITION_LIMIT:
                n_pad = arr.size  # no headroom left; exact-size (valid)
            hi, lo, nv, self.max_run = build_padded_shard_planes(arr, n_pad)
            self.index_hi = jax.device_put(jnp.asarray(hi), device)
            self.index_lo = jax.device_put(jnp.asarray(lo), device)
            self._n_valid = jax.device_put(
                jnp.asarray([nv], dtype=jnp.int32), device
            )
        self.L_max = self.tiles[-1][0]
        self._stride = self.L_max - self.l + 1
        self.fetch_group = FetchGroup()

    # ------------------------------------------------------------------
    # host-side row construction
    # ------------------------------------------------------------------
    def _rows_for(self, rid: int, mate: int, seq: bytes, prefix_length: int):
        return rows_for_read(
            rid, mate, seq, prefix_length,
            k=self.k, l=self.l, stride=self._stride, max_len=self.L_max,
        )

    def _tile_for(self, max_row_len: int) -> tuple[int, int]:
        for L, R in self.tiles:
            if max_row_len <= L:
                return (L, R)
        return self.tiles[-1]

    def launch_counts(self, units, n_logical: int, prefix_length: int):
        """Asynchronously launch device batches for all units.

        Returns a resolve() -> (hits, totals) closure; device work stays in
        flight until resolve, so callers can overlap host I/O (read/parse/
        write) with device compute — the TPU analogue of the reference's
        reader/worker/writer pipeline (SURVEY §2.3 task parallelism).
        """
        # group rows per unit, assign each unit to one tile class
        per_tile: dict[tuple[int, int], list[list[_Row]]] = {}
        for gid, mates in units:
            rows: list[_Row] = []
            for mate, seq in mates:
                rows.extend(self._rows_for(gid, mate, seq, prefix_length))
            if not rows:
                continue
            tile = self._tile_for(max(len(r.seq) for r in rows))
            if len(rows) > tile[1]:
                raise BudgetOverflow(
                    f"unit {gid} needs {len(rows)} rows > tile R={tile[1]}"
                )
            per_tile.setdefault(tile, []).append(rows)

        in_flight: list[tuple[dict, object, object, object, int]] = []

        for (L, R), groups in per_tile.items():
            batch: list[_Row] = []
            gid_map: list[int] = []

            def flush():
                nonlocal batch, gid_map
                if not batch:
                    return
                local = {g: i for i, g in enumerate(gid_map)}
                rows_local = [
                    _Row(local[r.rid], r.mate, r.chunk_start, r.seq) for r in batch
                ]
                out, budget, args = self._launch_batch(rows_local, L, R)
                in_flight.append((local, out, R, budget, args))
                batch, gid_map = [], []

            for rows in groups:
                if len(batch) + len(rows) > R:
                    flush()
                batch.extend(rows)
                gid_map.append(rows[0].rid)
            flush()

        # one ticket per launch_counts call: all of this call's batches (and
        # any other calls still in flight, when the engine runs resolve_depth
        # deep) materialize together in one fused d2h
        ticket = self.fetch_group.register(
            [out for _, out, _, _, _ in in_flight]
        )

        def resolve():
            hits = np.zeros(n_logical, dtype=np.int64)
            totals = np.zeros(n_logical, dtype=np.int64)
            fetched = self.fetch_group.materialize(ticket)
            for (local, _out, R, budget, args), arr in zip(in_flight, fetched):
                arr = arr.astype(np.int64)
                used = int(arr[2 * R])
                if used & (1 << 30):
                    # radix-probe span overflow (adversarial density):
                    # rerun this batch through the exact emulation twin
                    arr = self._radix_overflow_rerun(args, R, budget)
                    used = int(arr[2 * R]) & ~(1 << 30)
                if used > budget:
                    raise BudgetOverflow(
                        f"minimizer budget exceeded: {used} > {budget}"
                    )
                hn = arr[:R]
                tn = arr[R : 2 * R]
                for g, i in local.items():
                    hits[g] += hn[i]
                    totals[g] += tn[i]
            return hits, totals

        return resolve

    def _counts(self, units, n_logical: int, prefix_length: int):
        """units: iterable of (gid, [(mate, seq), ...])."""
        return self.launch_counts(units, n_logical, prefix_length)()

    def _launch_batch(self, rows: list[_Row], L: int, R: int):
        """Launch one device batch asynchronously; returns device arrays."""
        arch = engine_arch(self.k, L, R)
        if arch == 4:
            # per-row slot budget (the arch-4 slot grid is (R, budget))
            budget = v4_row_budget(L, self.w, self.budget_frac)
        else:
            budget = (int(self.budget_frac * L * R) + 191) // 128 * 128
        pc, pv, mlen, allow_short, rid, mate, cstart = pack_rows_packed(
            rows, R, L, self.k, self.l
        )
        if arch >= 3:
            pci, pvi = host_interleave_packed(pc, pv)
        else:
            pci = np.zeros((1, 1), dtype=np.uint8)
            pvi = np.zeros((1, 1), dtype=np.uint8)
        args = [
            jnp.asarray(pc), jnp.asarray(pv), jnp.asarray(mlen),
            jnp.asarray(allow_short), jnp.asarray(rid), jnp.asarray(mate),
            jnp.asarray(cstart), self.index_hi, self.index_lo, self._n_valid,
            jnp.asarray(pci), jnp.asarray(pvi),
        ]
        # only the largest tile class ever holds chunked long reads
        dedup = L >= self.L_max
        statics = (self.k, self.w, budget, R, self.max_run, dedup)
        if self._probe_extra is not None:
            statics = statics + (self._probe_extra,)
        import os

        if os.environ.get("DEACON_TPU_STAGED"):
            hits, totals, used = _engine_step(
                *args, k=self.k, w=self.w, budget=budget, num_segments=R,
                max_run=self.max_run, dedup_positions=dedup, packed=True,
                probe_extra=self._probe_extra,
            )
            out = _stage_fuse_out(hits, totals, used)
        else:
            out = engine_step_fused(statics)(*args)
        # NOTE: no per-batch copy_to_host_async here — the FetchGroup
        # materializes many batches' outputs in one fused d2h instead
        # (per-batch async copies are redundant traffic on that path, and
        # on the tunneled backend each d2h sync costs a flat ~23 ms).
        # args ride along so a radix-probe span overflow can rerun the
        # batch through the exact emulation twin (kept only while the
        # batch is in flight).
        keep_args = args if self._probe_extra is not None and (
            self._probe_extra[0] == "radix"
        ) else None
        return out, budget, keep_args

    def _radix_overflow_rerun(self, args, R: int, budget: int):
        """Exact rerun of one batch whose radix-probe spans overflowed the
        static kernel sizing (adversarial read content): the XLA emulation
        twin has no span limits. Rare; pays one extra compile the first
        time it ever happens in a process."""
        import sys

        print(
            "deacon: note: radix probe span overflow — batch rerun via the "
            "emulation path (adversarially repetitive input?)",
            file=sys.stderr,
        )
        tag, p, kk, npl, sp = self._probe_extra
        statics = (
            self.k, self.w, budget, R, self.max_run,
            bool(args[0].shape[1] * 4 >= self.L_max),
            ("radix_emul", p, kk, npl, sp),
        )
        out = engine_step_fused(statics)(*args)
        return np.asarray(out).astype(np.int64)

    # ------------------------------------------------------------------
    # decision API
    # ------------------------------------------------------------------
    def counts_single(self, seqs: list[bytes], prefix_length: int):
        units = ((i, [(0, s)]) for i, s in enumerate(seqs))
        return self._counts(units, len(seqs), prefix_length)

    def counts_paired(self, pairs: list[tuple[bytes, bytes]], prefix_length: int):
        units = ((i, [(0, s1), (1, s2)]) for i, (s1, s2) in enumerate(pairs))
        return self._counts(units, len(pairs), prefix_length)

    def launch_single(self, seqs: list[bytes], prefix_length: int):
        units = ((i, [(0, s)]) for i, s in enumerate(seqs))
        return self.launch_counts(units, len(seqs), prefix_length)

    def launch_paired(self, pairs: list[tuple[bytes, bytes]], prefix_length: int):
        units = ((i, [(0, s1), (1, s2)]) for i, (s1, s2) in enumerate(pairs))
        return self.launch_counts(units, len(pairs), prefix_length)


class IndexBuildPipeline:
    """Device-side index-build extraction (ref: src/minimizers.rs:125-191).

    Sequences are IUPAC-canonicalised before selection; validity and the
    optional entropy filter are evaluated on the original bytes. Returns
    per-record hash arrays (duplicates possible — consumers apply set
    semantics, matching the reference's FxHashSet accumulation).
    """

    def __init__(
        self,
        k: int,
        w: int,
        entropy_threshold: float = 0.0,
        row_len: int = 16384,
        rows_per_batch: int = 128,
        budget_frac: float | None = None,
        device=None,
    ):
        if budget_frac is None:
            budget_frac = default_budget_frac(w)
        self.k, self.w = int(k), int(w)
        self.l = self.k + self.w - 1
        self.L = max(int(row_len), self.l)
        self.R = int(rows_per_batch)
        self.budget = (int(budget_frac * self.L * self.R) + 191) // 128 * 128
        self.entropy = float(entropy_threshold)
        # entropy filtering needs per-slot base-composition gathers from
        # the original codes, so only entropy-off builds take the
        # gather-free v4 chain
        # entropy-filtered builds ride the v4 chain too via the value-limb
        # SWAR entropy (_entropy_from_limbs; r3 VERDICT item 7)
        self._v4 = engine_arch(k, self.L, self.R) == 4 and self.k <= 32
        self.budget_row = v4_row_budget(self.L, self.w, budget_frac)
        self._slots = self.R * self.budget_row if self._v4 else self.budget
        self.device = device
        self._stride = self.L - self.l + 1

    def _rows_for(self, rid: int, seq_arr: np.ndarray):
        # Same chunk-stride rule as rows_for_read, but deliberately NOT
        # shared: index-side extraction has no prefix truncation and no
        # trailing-newline strip (the reference asymmetry, SURVEY §7 /
        # src/minimizers.rs vs src/filter_common.rs:222-229), and rows are
        # (rid, start, np-array) tuples. Keep the stride condition
        # (s <= n - l, s += L - l + 1) in sync with rows_for_read.
        n = seq_arr.size
        if n < self.k:
            return []
        if n <= self.L:
            return [(rid, 0, seq_arr)]
        rows = []
        s = 0
        while s <= n - self.l:
            rows.append((rid, s, seq_arr[s : s + self.L]))
            s += self._stride
        return rows

    def extract_batch(self, seqs: list[bytes]) -> list[np.ndarray]:
        # All chunks launch asynchronously with their outputs fused into
        # one u32 device array each; ONE concat+fetch materializes the
        # whole batch at the end (the per-chunk np.asarray/int(total) syncs
        # this replaced cost seconds each through the tunneled backend —
        # same FetchGroup rationale as the filter pipeline).
        rows = []
        for i, s in enumerate(seqs):
            rows.extend(self._rows_for(i, np.frombuffer(s, dtype=np.uint8)))
        canon_pack = mnp.PACK_CODE[mnp.IUPAC_CANON]
        per_seq: list[list[np.ndarray]] = [[] for _ in seqs]
        outs = []
        for start in range(0, len(rows), self.R):
            chunk = rows[start : start + self.R]
            R, L = self.R, self.L
            n = len(chunk)
            codes = np.zeros((R, L), dtype=np.uint8)
            orig = np.zeros((R, L), dtype=np.uint8)
            validb = np.zeros((R, L), dtype=bool)
            mlen = np.full(R, -1, dtype=np.int32)
            allow_short = np.zeros(R, dtype=bool)
            rid = np.zeros(R, dtype=np.int32)
            lens = np.fromiter((b.size for _, _, b in chunk), dtype=np.int64,
                               count=n)
            arena = np.concatenate([b for _, _, b in chunk]) if n else (
                np.empty(0, dtype=np.uint8))
            starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
            row_of = np.repeat(np.arange(n, dtype=np.int64), lens)
            offs = np.arange(arena.size, dtype=np.int64) - np.repeat(starts, lens)
            dest = row_of * L + offs
            codes.reshape(-1)[dest] = canon_pack[arena]
            orig.reshape(-1)[dest] = mnp.PACK_CODE[arena]
            validb.reshape(-1)[dest] = mnp.VALID_BASE[arena]
            mlen[:n] = lens - (self.k - 1)
            allow_short[:n] = lens < self.l
            rid[:n] = np.fromiter((g for g, _, _ in chunk), dtype=np.int32,
                                  count=n)
            if self._v4:
                pc, pv = host_pack_bits(codes, validb)
                pci, pvi = host_interleave_packed(pc, pv)
                hlo, hhi, srid, valid, total = _extract_step_v4(
                    jnp.asarray(pc), jnp.asarray(pv), jnp.asarray(pci),
                    jnp.asarray(pvi), jnp.asarray(mlen),
                    jnp.asarray(allow_short), jnp.asarray(rid),
                    jnp.float32(self.entropy),
                    k=self.k, w=self.w, Br=self.budget_row,
                    use_entropy=self.entropy != 0.0 and self.k >= 10,
                )
            else:
                hlo, hhi, srid, valid, total = _extract_step(
                    jnp.asarray(codes), jnp.asarray(orig),
                    jnp.asarray(validb), jnp.asarray(mlen),
                    jnp.asarray(allow_short), jnp.asarray(rid),
                    jnp.float32(self.entropy),
                    k=self.k, w=self.w, budget=self.budget,
                    use_entropy=self.entropy != 0.0 and self.k >= 10,
                )
            outs.append(_fuse_extract_out(hlo, hhi, srid, valid, total))

        if not outs:
            return [np.empty(0, dtype=np.uint64) for _ in seqs]
        if len(outs) == 1:
            fused = np.asarray(outs[0])
        else:
            fused = np.asarray(_extract_concat(outs))
        B = self._slots
        cap = self.budget_row if self._v4 else self.budget
        for chunk in fused.reshape(len(outs), 4 * B + 1):
            total = int(chunk[4 * B].view(np.int32))
            if total > cap:
                raise BudgetOverflow(
                    f"minimizer budget exceeded: {total} > {cap}"
                )
            hv = chunk[:B].astype(np.uint64) | (
                chunk[B : 2 * B].astype(np.uint64) << np.uint64(32)
            )
            rv = chunk[2 * B : 3 * B].view(np.int32)
            vm = chunk[3 * B : 4 * B] != 0
            hv, rv = hv[vm], rv[vm]
            order = np.argsort(rv, kind="stable")
            hv, rv = hv[order], rv[order]
            bounds = np.searchsorted(rv, np.arange(len(seqs) + 1))
            for g in range(len(seqs)):
                if bounds[g + 1] > bounds[g]:
                    per_seq[g].append(hv[bounds[g] : bounds[g + 1]])
        return [
            np.concatenate(parts) if parts else np.empty(0, dtype=np.uint64)
            for parts in per_seq
        ]
