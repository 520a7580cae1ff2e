"""Match/threshold logic (ref: src/filter_common.rs:84-198)."""

from __future__ import annotations

import math

import numpy as np


def calculate_required_hits(
    abs_threshold: int, rel_threshold: float, total_minimizers: int
) -> int:
    """required = max(abs, total==0 ? 0 : max(1, round_half_away(rel*total)))
    (ref: src/filter_common.rs:84-96; Rust f64::round rounds half away from zero)."""
    if total_minimizers == 0:
        rel_required = 0
    else:
        rel_required = max(1, math.floor(rel_threshold * total_minimizers + 0.5))
    return max(int(abs_threshold), rel_required)


def meets_filtering_criteria(
    hit_count: int,
    total_minimizers: int,
    abs_threshold: int,
    rel_threshold: float,
    deplete: bool,
) -> bool:
    """Keep iff hits >= required (search) / hits < required (deplete)
    (ref: src/filter_common.rs:99-112)."""
    required = calculate_required_hits(abs_threshold, rel_threshold, total_minimizers)
    return hit_count < required if deplete else hit_count >= required


def required_hits_batch(
    abs_threshold: int, rel_threshold: float, totals: np.ndarray
) -> np.ndarray:
    """Vectorized calculate_required_hits over an int array of totals."""
    totals = np.asarray(totals, dtype=np.int64)
    rel = np.floor(rel_threshold * totals.astype(np.float64) + 0.5).astype(np.int64)
    rel = np.maximum(rel, 1)
    rel = np.where(totals == 0, 0, rel)
    return np.maximum(np.int64(abs_threshold), rel)


def keep_mask_batch(
    hits: np.ndarray,
    totals: np.ndarray,
    abs_threshold: int,
    rel_threshold: float,
    deplete: bool,
) -> np.ndarray:
    """Vectorized meets_filtering_criteria."""
    required = required_hits_batch(abs_threshold, rel_threshold, totals)
    hits = np.asarray(hits, dtype=np.int64)
    return hits < required if deplete else hits >= required


def count_distinct_hits(
    member_mask: np.ndarray, hashes: np.ndarray
) -> int:
    """Count distinct hash values among those flagged as index members
    (ref: src/filter_common.rs:129-155 seen-set semantics)."""
    if member_mask.size == 0:
        return 0
    return int(np.unique(np.asarray(hashes)[member_mask]).size)
