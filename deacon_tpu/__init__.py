"""deacon-tpu: a TPU-native minimizer read-filtering framework.

Re-exports the public API surface mirroring the reference crate's lib.rs
(ref: src/lib.rs:10-33). Heavy modules (JAX engine, I/O) are imported lazily
by the CLI so that light-weight operations stay fast.
"""

from .constants import (
    DEFAULT_KMER_LENGTH,
    DEFAULT_WINDOW_SIZE,
    VERSION,
)
from .config import FilterConfig, IndexConfig
from .index.store import IndexHeader, MinimizerIndex, load_index, write_index
from .ops.minimizers_np import (
    compute_minimizer_hashes,
    get_minimizer_hashes_and_positions,
    get_paired_minimizer_hashes_and_positions,
)
from .filter.thresholds import calculate_required_hits, meets_filtering_criteria

__version__ = VERSION

# reference lib.rs convenience names (src/lib.rs:276-286)
load_minimizers = load_index
write_minimizers = write_index

__all__ = [
    "DEFAULT_KMER_LENGTH",
    "DEFAULT_WINDOW_SIZE",
    "VERSION",
    "FilterConfig",
    "IndexConfig",
    "load_minimizers",
    "write_minimizers",
    "IndexHeader",
    "MinimizerIndex",
    "load_index",
    "write_index",
    "compute_minimizer_hashes",
    "get_minimizer_hashes_and_positions",
    "get_paired_minimizer_hashes_and_positions",
    "calculate_required_hits",
    "meets_filtering_criteria",
]
