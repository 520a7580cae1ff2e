"""Multi-host pod-slice support: jax.distributed + host-spanning meshes.

Replaces the reference's "whole index replicated in every process" model
(ref: src/index.rs:96-107) with config 4 of BASELINE.json: the sorted index
range-sharded across all hosts' HBM, reads data-parallel across hosts, and
per-shard membership merged with one psum over ICI/DCN.

Each host runs the same CLI with:

    python -m deacon_tpu filter INDEX READS_SHARD -o OUT_SHARD \
        --device tpu ...                                    \
    # env: DEACON_COORD=host0:1234 DEACON_NUM_PROC=4 DEACON_PROC_ID=0..3

Input sharding is by file (each host filters its own read shard — embarrassingly
data-parallel, like running N deacon processes, but with the index split N
ways instead of replicated N times).
"""

from __future__ import annotations

import os

import numpy as np


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed from DEACON_* env vars when present.

    Returns True if a multi-process runtime was initialized.
    """
    coord = os.environ.get("DEACON_COORD")
    if not coord:
        return False
    import jax

    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["DEACON_NUM_PROC"]),
        process_id=int(os.environ["DEACON_PROC_ID"]),
    )
    return True


def make_pod_pipeline(index_hashes: np.ndarray, k: int, w: int, **kwargs):
    """ShardedPipeline over every device in the pod slice: index sharded
    across all chips ("shard" axis), rows data-parallel on the local host's
    chips ("data" axis = per-process devices).

    On a single host this degrades to the local mesh.
    """
    import jax

    from .sharded import ShardedPipeline, make_mesh

    n_total = len(jax.devices())
    n_local = len(jax.local_devices())
    n_data = max(1, n_local)
    n_shard = max(1, n_total // n_data)
    mesh = make_mesh(n_data, n_shard)
    return ShardedPipeline(index_hashes, k, w, mesh, **kwargs)
