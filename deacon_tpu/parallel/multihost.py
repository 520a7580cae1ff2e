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


def make_pod_mesh():
    """(data, shard) mesh with the SHARD axis running across processes.

    Column j of the device grid holds process j's devices, so each host's
    HBM (and host RAM via load_index_shard) holds exactly one index shard —
    the geometry that makes index sharding save memory per host. Data rows
    span processes: every host feeds the same global read batch (SPMD) and
    each row block is probed cooperatively. Single-process: (n_local, 1).
    """
    import jax

    from jax.sharding import Mesh

    procs: dict[int, list] = {}
    for d in jax.devices():
        procs.setdefault(d.process_index, []).append(d)
    per = min(len(v) for v in procs.values())
    cols = [procs[p][:per] for p in sorted(procs)]
    dev_arr = np.stack([np.asarray(c, dtype=object) for c in cols], axis=1)
    return Mesh(dev_arr, ("data", "shard"))


def make_pod_pipeline_from_file(index_path: str, mesh=None, **kwargs):
    """Memory-lean pod pipeline straight from an index file (config 4).

    Each process stream-decodes ONLY the value-range shards of its own
    addressable devices (store.load_index_shard) and contributes them via
    ShardedPipeline.from_shards — no host ever materializes the full index
    (vs the reference's full-set-per-process model, src/index.rs:96-107).

    pad_to and max_run are derived from the file's header count, identical
    on every process, so all processes compile the same program.
    """
    import jax

    from ..index.store import load_header_and_count, load_index_shard
    from .sharded import ShardedPipeline

    if mesh is None:
        mesh = make_pod_mesh()
    n_shard = int(mesh.shape["shard"])

    header, count = load_header_and_count(index_path)
    # uniform-hash shard sizes concentrate tightly around count/n_shard;
    # 2% + 1024 margin is astronomically safe at any real index size and
    # raw `count` (pre-dedup) only overestimates
    pad_to = count // n_shard + max(1024, (2 * count) // (100 * n_shard))

    pid = jax.process_index()
    owned = sorted(
        {j for (_, j), d in np.ndenumerate(mesh.devices)
         if d.process_index == pid}
    )
    shards: list = [None] * n_shard
    for j in owned:
        _, shards[j], _ = load_index_shard(index_path, j, n_shard)
    return ShardedPipeline.from_shards(
        shards, header.kmer_length, header.window_size, mesh,
        pad_to=pad_to, max_run=16, **kwargs,
    )


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
