"""Global constants for the deacon-tpu framework.

Mirrors the reference defaults (ref: src/minimizers.rs:4-5, src/lib.rs:89-109,
src/lib.rs:213-226) without copying any code: these are behavioral parameters.
"""

VERSION = "0.1.0"
TOOL_NAME = "deacon-tpu"

# Minimizer scheme defaults (ref: src/minimizers.rs:4-5)
DEFAULT_KMER_LENGTH = 31
DEFAULT_WINDOW_SIZE = 15

# Index container (ref: src/index.rs:17-31)
INDEX_FORMAT_VERSION = 2

# Filtering defaults (ref: src/lib.rs:89-109)
DEFAULT_ABS_THRESHOLD = 2
DEFAULT_REL_THRESHOLD = 0.01
DEFAULT_COMPRESSION_LEVEL = 2

# Index build defaults (ref: src/lib.rs:213-226)
DEFAULT_CAPACITY_MILLIONS = 400
DEFAULT_INDEX_THREADS = 8

# Filter-side extraction requires k <= 56 for the invalid-base window test
# (ref: src/filter_common.rs:269-272); index build accepts 1..=57
# (ref: src/main.rs:166) and diff-vs-FASTX 1..=32 (ref: src/main.rs:223).
MAX_K_FILTER = 56
MAX_K_BUILD = 57
MAX_K_DIFF_FASTX = 32

# Batch sizes used by the streaming engines (ref: src/index.rs:225,
# src/remote_filter.rs:727).
INDEX_BUILD_BATCH = 10_000
FILTER_BATCH = 10_000
DIFF_STREAM_BATCH = 1_000
