"""Config layer: FilterConfig / IndexConfig with reference defaults
(ref: src/lib.rs:39-274)."""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from .constants import (
    DEFAULT_ABS_THRESHOLD,
    DEFAULT_CAPACITY_MILLIONS,
    DEFAULT_COMPRESSION_LEVEL,
    DEFAULT_INDEX_THREADS,
    DEFAULT_KMER_LENGTH,
    DEFAULT_REL_THRESHOLD,
    DEFAULT_WINDOW_SIZE,
)


@dataclass
class FilterConfig:
    """ref: src/lib.rs:39-109 (defaults from FilterConfig::new)."""

    minimizers_path: str | None = None
    server_address: str | None = None
    input_path: str = "-"
    input2_path: str | None = None
    output_path: str = "-"
    output2_path: str | None = None
    abs_threshold: int = DEFAULT_ABS_THRESHOLD
    rel_threshold: float = DEFAULT_REL_THRESHOLD
    prefix_length: int = 0
    summary_path: str | None = None
    deplete: bool = False
    rename: bool = False
    threads: int = 0
    compression_level: int = DEFAULT_COMPRESSION_LEVEL
    debug: bool = False
    quiet: bool = False
    # TPU-native extras (not in the reference surface):
    device: str = "auto"  # "auto" | "tpu" | "cpu" | "numpy"
    batch_size: int = 10_000
    #: device mesh "DATAxSHARD" (e.g. "2x4"): rows data-parallel over DATA
    #: chips, index range-sharded over SHARD chips, psum-merged (SURVEY §2.3)
    mesh: str | None = None

    def execute(self) -> None:
        from .filter.engine import run

        run(self)


@dataclass
class IndexConfig:
    """ref: src/lib.rs:187-226."""

    input_path: str = "-"
    kmer_length: int = DEFAULT_KMER_LENGTH
    window_size: int = DEFAULT_WINDOW_SIZE
    output_path: str | None = None
    capacity_millions: int = DEFAULT_CAPACITY_MILLIONS
    threads: int = DEFAULT_INDEX_THREADS
    quiet: bool = False
    entropy_threshold: float = 0.0
    # TPU-native extras (not in the reference surface):
    device: str = "auto"  # "auto" | "tpu" | "cpu" | "numpy"
    #: "pod-data": ranks build partial indexes from record-aligned byte
    #: ranges of the input; rank 0 merges (index/pod_build.py)
    mesh: str | None = None

    def execute(self) -> None:
        from .index.build import build

        build(self)
