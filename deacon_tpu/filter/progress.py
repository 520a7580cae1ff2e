"""Progress reporting (ref: src/local_filter.rs:309-342,653-664, C12)."""

from __future__ import annotations

import sys
import time


class Spinner:
    """stderr live status line, updated per batch; clears itself on finish."""

    def __init__(self, enabled: bool):
        self.enabled = enabled and sys.stderr.isatty()
        self._last_len = 0

    def update(self, stats: "FilterStats", start_time: float) -> None:
        if not self.enabled:
            return
        elapsed = max(time.monotonic() - start_time, 1e-9)
        seqs_per_sec = stats.total_seqs / elapsed
        mbp_per_sec = stats.total_bp / elapsed / 1_000_000.0
        out_seqs = stats.total_seqs - stats.filtered_seqs
        sp = out_seqs / stats.total_seqs * 100 if stats.total_seqs else 0.0
        bp = stats.output_bp / stats.total_bp * 100 if stats.total_bp else 0.0
        msg = (
            f"Retained {out_seqs}/{stats.total_seqs} sequences ({sp:.2f}%), "
            f"{stats.output_bp}/{stats.total_bp} bp ({bp:.2f}%). "
            f"{seqs_per_sec:.0f} seqs/s ({mbp_per_sec:.1f} Mbp/s)"
        )
        pad = " " * max(0, self._last_len - len(msg))
        sys.stderr.write("\r" + msg + pad)
        sys.stderr.flush()
        self._last_len = len(msg)

    def finish(self) -> None:
        if self.enabled and self._last_len:
            sys.stderr.write("\r" + " " * self._last_len + "\r")
            sys.stderr.flush()
            self._last_len = 0


class FilterStats:
    """ref: src/local_filter.rs:179-187."""

    __slots__ = (
        "total_seqs",
        "filtered_seqs",
        "total_bp",
        "output_bp",
        "filtered_bp",
        "output_seq_counter",
    )

    def __init__(self):
        self.total_seqs = 0
        self.filtered_seqs = 0
        self.total_bp = 0
        self.output_bp = 0
        self.filtered_bp = 0
        self.output_seq_counter = 0
