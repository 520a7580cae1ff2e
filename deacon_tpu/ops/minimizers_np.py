"""NumPy oracle for the deacon-tpu canonical minimizer scheme.

This file defines the *specification* of our minimizer pipeline. The JAX/Pallas
device implementation (deacon_tpu/ops/engine.py) must produce bit-identical
results; tests/test_minimizers.py enforces the equivalence.

Behavioral contract with the reference (semantics, not implementation):

* Index side (ref: src/minimizers.rs:125-191): IUPAC bytes are canonicalised to
  ACGT first (R->G, Y->C, ..., N->C, anything else ->C; ref src/minimizers.rs:24-43),
  minimizers are selected on the canonicalised sequence, positions whose k-mer in
  the ORIGINAL sequence contains non-ACGT are dropped, an optional scaled-entropy
  filter applies (ref: src/minimizers.rs:73-121), and surviving minimizer values
  are hashed with XXH3-64 of their little-endian bytes.
* Filter side (ref: src/filter_common.rs:211-310): optional prefix truncation,
  exactly one trailing "\n" stripped, raw bytes packed 2-bit (non-ACGT mapped
  silently via the same (b>>1)&3 rule as packed-seq), minimizers selected on the
  packed codes, positions overlapping any non-ACGT base dropped (requires k<=56),
  values hashed identically.

Scheme (TPU-first design, replaces simd-minimizers' SIMD internals):

* Base codes use the packed-seq convention ``code = (ascii >> 1) & 3``
  (A=0, C=1, T=2, G=3) so that complement is ``code ^ 2``.
* Canonical minimizer value = min(packed_fwd, packed_rc) where
  ``packed_fwd = sum(code[p+j] << 2j)`` and ``packed_rc`` packs the reverse
  complement the same way. (u64 for k<=32, u128 as (hi, lo) u64 pair for
  k<=57.) Values are computed at every position with log2(k) span-doubling
  steps — pure elementwise shifts, no rolling dependency, no gathers.
* Per-k-mer selection key = fmix32 (murmur3 finalizer) of the XOR-fold of the
  canonical value's 32-bit limbs — strand-symmetric by construction and
  elementwise-only on TPU (no seed tables, no variable rotates, no scans).
* Window minimum over w consecutive k-mer keys with leftmost tie-break; the
  argmin positions of consecutive windows are deduplicated.
* Membership hash = XXH3-64 of the value's little-endian bytes (8 or 16).

Divergence note: the exact selection differs from simd-minimizers v1.3.0 (whose
internal hash/tie-break rules are not reproducible here), so index files are
format-compatible but not content-identical with upstream deacon. Within this
framework, index build and filter are exactly consistent, which is the property
the reference test-suite actually exercises.
"""

from __future__ import annotations

import numpy as np

from ..utils.xxh3 import xxh3_64_u64, xxh3_64_u128

# ---------------------------------------------------------------------------
# Byte-level tables
# ---------------------------------------------------------------------------

_ACGT_BYTES = b"ACGTacgt"

#: validity: True where byte is one of ACGTacgt (ref: src/minimizers.rs:9-14)
VALID_BASE = np.zeros(256, dtype=bool)
VALID_BASE[list(_ACGT_BYTES)] = True

#: IUPAC canonicalisation map, byte -> byte (ref: src/minimizers.rs:24-43)
IUPAC_CANON = np.full(256, ord("C"), dtype=np.uint8)
for _src, _dst in {
    "Aa": "A", "Cc": "C", "Gg": "G", "Tt": "T",
    "Rr": "G", "Yy": "C", "Ss": "G", "Ww": "A",
    "Kk": "G", "Mm": "C", "Bb": "C", "Dd": "G",
    "Hh": "C", "Vv": "G", "Nn": "C",
}.items():
    for _ch in _src:
        IUPAC_CANON[ord(_ch)] = ord(_dst)

#: 2-bit packing code, byte -> (byte >> 1) & 3 (packed-seq convention)
PACK_CODE = ((np.arange(256, dtype=np.uint16) >> 1) & 3).astype(np.uint8)

_U32 = np.uint32
_U64 = np.uint64


def ascii_to_codes(seq: np.ndarray) -> np.ndarray:
    """Pack raw ASCII bytes to 2-bit codes (filter-side rule)."""
    return PACK_CODE[seq]


def canonicalise_iupac(seq: np.ndarray) -> np.ndarray:
    """IUPAC->ACGT byte canonicalisation (index-side rule)."""
    return IUPAC_CANON[seq]


def fmix32(x: np.ndarray) -> np.ndarray:
    """murmur3 32-bit finalizer (avalanche mixer)."""
    x = np.asarray(x, dtype=np.uint32)
    with np.errstate(over="ignore"):
        x = x ^ (x >> _U32(16))
        x = x * _U32(0x85EBCA6B)
        x = x ^ (x >> _U32(13))
        x = x * _U32(0xC2B2AE35)
        x = x ^ (x >> _U32(16))
    return x


def windowed_canonical_values(codes: np.ndarray, k: int):
    """Canonical min(fwd, rc) packed value at every k-mer position.

    Returns (lo, hi) uint64 arrays of length len(codes) - k + 1 (hi is zero
    for k <= 32). Built with log2(k) span-doubling steps — the same
    construction as the device engine (elementwise shifts only).
    """
    n = codes.shape[0]
    m = n - k + 1
    if m <= 0:
        z = np.empty(0, dtype=np.uint64)
        return z, z.copy()

    def shift_elems(arr, s):
        out = np.zeros_like(arr)
        out[: arr.shape[0] - s] = arr[s:]
        return out

    def pshl(pair, nbits):
        lo, hi = pair
        with np.errstate(over="ignore"):
            if nbits == 0:
                return pair
            if nbits < 64:
                return (
                    lo << _U64(nbits),
                    (hi << _U64(nbits)) | (lo >> _U64(64 - nbits)),
                )
            return np.zeros_like(lo), lo << _U64(nbits - 64)

    def por(a, b):
        return a[0] | b[0], a[1] | b[1]

    def pshift(pair, s):
        return shift_elems(pair[0], s), shift_elems(pair[1], s)

    z = np.zeros(n, dtype=np.uint64)
    cf = (codes.astype(np.uint64), z)
    cr = ((codes ^ 2).astype(np.uint64), z.copy())
    span_tables = {1: (cf, cr)}
    vf, vr = cf, cr
    s = 1
    while s * 2 <= k:
        vf = por(vf, pshl(pshift(vf, s), 2 * s))
        vr = por(pshl(vr, 2 * s), pshift(vr, s))
        s *= 2
        span_tables[s] = (vf, vr)

    acc_f = None
    acc_r = None
    off = 0
    for s in sorted(span_tables, reverse=True):
        if k & s:
            bf, br = span_tables[s]
            bf = pshift(bf, off)
            br = pshift(br, off)
            if acc_f is None:
                acc_f = bf
                acc_r = pshl(br, 2 * (k - s - off))
            else:
                acc_f = por(acc_f, pshl(bf, 2 * off))
                acc_r = por(acc_r, pshl(br, 2 * (k - s - off)))
            off += s
    take_f = (acc_f[1] < acc_r[1]) | (
        (acc_f[1] == acc_r[1]) & (acc_f[0] <= acc_r[0])
    )
    lo = np.where(take_f, acc_f[0], acc_r[0])[:m]
    hi = np.where(take_f, acc_f[1], acc_r[1])[:m]
    return lo, hi


def kmer_selection_keys(codes: np.ndarray, k: int) -> np.ndarray:
    """Strand-canonical selection key for every k-mer position: the top 16
    bits of fmix32 of the XOR-fold of the canonical value's 32-bit limbs
    (returned as ``key & 0xFFFF0000``).

    Strand-symmetric because the value is canonical; elementwise-only on
    TPU (no seed tables, variable rotates, or scans — all measured slow on
    v5e). The low 16 bits are zero so the device engine can pack the
    window-local position there and run the window argmin as a plain
    doubling MIN over one u32 array (the (key, pos) tuple-combine form is
    an axon compile bomb); ties in the 16-bit priority resolve to the
    leftmost position in both implementations."""
    lo, hi = windowed_canonical_values(codes, k)
    if lo.size == 0:
        return np.empty(0, dtype=np.uint32)
    fold = (
        lo.astype(np.uint32)
        ^ (lo >> _U64(32)).astype(np.uint32)
        ^ hi.astype(np.uint32)
        ^ (hi >> _U64(32)).astype(np.uint32)
    )
    return fmix32(fold) & _U32(0xFFFF0000)


def window_argmin_positions(keys: np.ndarray, w: int) -> np.ndarray:
    """Leftmost argmin of each w-window of keys, deduplicated, sorted.

    If there are fewer than w k-mers, a single window over all k-mers is used
    (minimizer of the whole sequence).
    """
    m = keys.shape[0]
    if m == 0:
        return np.empty(0, dtype=np.uint32)
    if m <= w:
        return np.array([np.argmin(keys)], dtype=np.uint32)
    win = np.lib.stride_tricks.sliding_window_view(keys, w)
    mins = win.argmin(axis=1) + np.arange(m - w + 1)
    return np.unique(mins).astype(np.uint32)


def valid_kmer_mask(seq: np.ndarray, k: int) -> np.ndarray:
    """True at position p iff seq[p:p+k] consists solely of ACGT/acgt bytes."""
    n = seq.shape[0]
    m = n - k + 1
    if m <= 0:
        return np.empty(0, dtype=bool)
    invalid = (~VALID_BASE[seq]).astype(np.int32)
    c = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(invalid, out=c[1:])
    return (c[k : k + m] - c[:m]) == 0


def canonical_values(codes: np.ndarray, positions: np.ndarray, k: int):
    """Canonical packed values at the given k-mer positions.

    Returns ``(lo, hi)`` uint64 arrays; ``hi`` is all zeros when k <= 32.
    value = min(fwd_pack, rc_pack) over the 2k-bit packings
    ``fwd = sum(code[p+j] << 2j)``, ``rc = sum((code[p+k-1-j]^2) << 2j)``.
    """
    pos = np.asarray(positions, dtype=np.int64)
    if pos.size == 0:
        z = np.empty(0, dtype=np.uint64)
        return z, z.copy()
    window = codes[pos[:, None] + np.arange(k)[None, :]].astype(np.uint64)
    window_rc = (window[:, ::-1] ^ _U64(2))

    def pack(mat):
        lo = np.zeros(mat.shape[0], dtype=np.uint64)
        hi = np.zeros(mat.shape[0], dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(min(k, 32)):
                lo |= mat[:, j] << _U64(2 * j)
            for j in range(32, k):
                hi |= mat[:, j] << _U64(2 * (j - 32))
        return lo, hi

    flo, fhi = pack(window)
    rlo, rhi = pack(window_rc)
    take_f = (fhi < rhi) | ((fhi == rhi) & (flo <= rlo))
    lo = np.where(take_f, flo, rlo)
    hi = np.where(take_f, fhi, rhi)
    return lo, hi


def hash_values(lo: np.ndarray, hi: np.ndarray, k: int) -> np.ndarray:
    """Membership hash of canonical values: XXH3-64 of LE bytes (8 or 16)."""
    if k > 32:
        return xxh3_64_u128(lo, hi)
    return xxh3_64_u64(lo)


def scaled_entropy(seq: np.ndarray, positions: np.ndarray, k: int) -> np.ndarray:
    """Scaled Shannon entropy of each k-mer's ACGT composition, in [0, 1].

    Mirrors the reference exactly (ref: src/minimizers.rs:73-121): k < 10
    always yields 1.0; non-ACGT bytes are skipped from the counts; entropy is
    computed in float32 and divided by 2.0.
    """
    pos = np.asarray(positions, dtype=np.int64)
    if pos.size == 0:
        return np.empty(0, dtype=np.float32)
    if k < 10:
        return np.ones(pos.size, dtype=np.float32)
    window = seq[pos[:, None] + np.arange(k)[None, :]]
    counts = np.zeros((pos.size, 4), dtype=np.float32)
    for ci, chars in enumerate(("Aa", "Cc", "Gg", "Tt")):
        match = np.zeros(window.shape, dtype=bool)
        for ch in chars:
            match |= window == ord(ch)
        counts[:, ci] = match.sum(axis=1, dtype=np.float32)
    total = counts.sum(axis=1)
    out = np.ones(pos.size, dtype=np.float32)
    nz = total > 0
    with np.errstate(divide="ignore", invalid="ignore"):
        p = counts[nz] / total[nz, None]
        terms = np.where(p > 0, p * np.log2(p, where=p > 0), np.float32(0.0))
    out[nz] = -terms.sum(axis=1) / np.float32(2.0)
    return out


# ---------------------------------------------------------------------------
# Reference-facing entry points
# ---------------------------------------------------------------------------


def compute_minimizer_hashes(
    seq: bytes | np.ndarray,
    kmer_length: int,
    window_size: int,
    entropy_threshold: float = 0.0,
) -> np.ndarray:
    """Index-side extraction (ref: src/minimizers.rs:125-191).

    Returns uint64 XXH3-64 hashes of canonical minimizer values.
    """
    seq = np.frombuffer(bytes(seq), dtype=np.uint8) if not isinstance(seq, np.ndarray) else seq
    k, w = int(kmer_length), int(window_size)
    if seq.shape[0] < k:
        return np.empty(0, dtype=np.uint64)
    canon = canonicalise_iupac(seq)
    codes = ascii_to_codes(canon)
    keys = kmer_selection_keys(codes, k)
    positions = window_argmin_positions(keys, w)
    valid = valid_kmer_mask(seq, k)
    positions = positions[valid[positions]]
    if entropy_threshold != 0.0 and positions.size:
        ent = scaled_entropy(seq, positions, k)
        positions = positions[ent >= np.float32(entropy_threshold)]
    lo, hi = canonical_values(codes, positions, k)
    return hash_values(lo, hi, k)


def get_minimizer_hashes_and_positions(
    seq: bytes | np.ndarray,
    prefix_length: int,
    kmer_length: int,
    window_size: int,
):
    """Filter-side extraction (ref: src/filter_common.rs:211-310).

    Returns ``(hashes u64, positions u32, effective_seq bytes)``.
    """
    raw = np.frombuffer(bytes(seq), dtype=np.uint8) if not isinstance(seq, np.ndarray) else seq
    k, w = int(kmer_length), int(window_size)
    if k > 56:
        raise ValueError(
            f"Indexing the bitmask of invalid characters requires k<=56, but it is {k}"
        )
    if raw.shape[0] < k:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint32), b""
    eff = raw
    if prefix_length > 0 and eff.shape[0] > prefix_length:
        eff = eff[:prefix_length]
    # Strip exactly one trailing newline (ref: src/filter_common.rs:229)
    if eff.shape[0] and eff[-1] == 0x0A:
        eff = eff[:-1]
    if eff.shape[0] < k:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint32), eff.tobytes()
    codes = ascii_to_codes(eff)
    keys = kmer_selection_keys(codes, k)
    positions = window_argmin_positions(keys, w)
    valid = valid_kmer_mask(eff, k)
    positions = positions[valid[positions]]
    lo, hi = canonical_values(codes, positions, k)
    hashes = hash_values(lo, hi, k)
    return hashes, positions.astype(np.uint32), eff.tobytes()


def get_paired_minimizer_hashes_and_positions(
    seq1, seq2, prefix_length: int, kmer_length: int, window_size: int
):
    """Paired extraction: concatenation of both mates' hashes/positions
    (ref: src/filter_common.rs:312-348)."""
    h1, p1, e1 = get_minimizer_hashes_and_positions(
        seq1, prefix_length, kmer_length, window_size
    )
    h2, p2, e2 = get_minimizer_hashes_and_positions(
        seq2, prefix_length, kmer_length, window_size
    )
    return (
        np.concatenate([h1, h2]),
        np.concatenate([p1, p2]),
        (e1, e2),
    )
