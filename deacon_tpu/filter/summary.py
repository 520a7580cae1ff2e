"""JSON --summary report (ref: src/filter_common.rs:10-38, C11)."""

from __future__ import annotations

import json


def build_summary(
    *,
    version: str,
    index: str,
    input: str,
    input2: str | None,
    output: str,
    output2: str | None,
    k: int,
    w: int,
    abs_threshold: int,
    rel_threshold: float,
    prefix_length: int,
    deplete: bool,
    rename: bool,
    seqs_in: int,
    seqs_out: int,
    seqs_removed: int,
    bp_in: int,
    bp_out: int,
    bp_removed: int,
    time: float,
) -> dict:
    """Field names and order mirror the reference FilterSummary struct."""
    seqs_out_proportion = seqs_out / seqs_in if seqs_in else 0.0
    seqs_removed_proportion = seqs_removed / seqs_in if seqs_in else 0.0
    bp_out_proportion = bp_out / bp_in if bp_in else 0.0
    bp_removed_proportion = bp_removed / bp_in if bp_in else 0.0
    seqs_per_second = int(seqs_in / time) if time > 0 else 0
    bp_per_second = int(bp_in / time) if time > 0 else 0
    return {
        "version": version,
        "index": index,
        "input": input,
        "input2": input2,
        "output": output,
        "output2": output2,
        "k": k,
        "w": w,
        "abs_threshold": abs_threshold,
        "rel_threshold": rel_threshold,
        "prefix_length": prefix_length,
        "deplete": deplete,
        "rename": rename,
        "seqs_in": seqs_in,
        "seqs_out": seqs_out,
        "seqs_out_proportion": seqs_out_proportion,
        "seqs_removed": seqs_removed,
        "seqs_removed_proportion": seqs_removed_proportion,
        "bp_in": bp_in,
        "bp_out": bp_out,
        "bp_out_proportion": bp_out_proportion,
        "bp_removed": bp_removed,
        "bp_removed_proportion": bp_removed_proportion,
        "time": time,
        "seqs_per_second": seqs_per_second,
        "bp_per_second": bp_per_second,
    }


def write_summary(summary: dict, path: str) -> None:
    with open(path, "w") as f:
        json.dump(summary, f, indent=2)
