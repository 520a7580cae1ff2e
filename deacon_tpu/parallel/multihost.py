"""Multi-host pod-slice support: jax.distributed + host-spanning meshes.

Replaces the reference's "whole index replicated in every process" model
(ref: src/index.rs:96-107) with config 4 of BASELINE.json: the sorted index
range-sharded across all hosts' HBM, reads data-parallel across hosts, and
per-shard membership merged with one psum over ICI/DCN.

Each host runs the same CLI with:

    python -m deacon_tpu filter INDEX READS -o OUT --mesh pod ...
    # env: DEACON_COORD=host0:1234 DEACON_NUM_PROC=4 DEACON_PROC_ID=0..3

SPMD contract: EVERY rank must be fed the SAME input file — the global
batch is identical on all ranks, each host holds only its 1/N value-range
slice of the index, and the shard-axis psum merges per-slice membership
bits for the same global rows (see ShardedDecider and tools/pod_worker.py).
Feeding different read shards per rank would silently sum membership bits
of unrelated reads. What scales across hosts in pod mode is the INDEX
(memory), not the input stream.

``--mesh pod-data`` is the complementary mode: each rank filters its OWN
record-aligned byte range of the input over a rank-local mesh (index
sharded across local devices only), so aggregate reads/s scales with the
number of hosts (filter/pod_data.py, io/split.py).
"""

from __future__ import annotations

import os

import numpy as np


_distributed_initialized = False


def maybe_init_distributed() -> bool:
    """Initialize jax.distributed from DEACON_* env vars when present.

    Idempotent (pod-data calls it from both the runner and the decider).
    Returns True if a multi-process runtime was initialized.
    """
    global _distributed_initialized
    coord = os.environ.get("DEACON_COORD")
    if not coord:
        return False
    if _distributed_initialized:
        return True
    import jax

    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["DEACON_NUM_PROC"]),
        process_id=int(os.environ["DEACON_PROC_ID"]),
    )
    _distributed_initialized = True
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
    if mesh is None:
        mesh = make_pod_mesh()
    return _pipeline_from_file(index_path, mesh, **kwargs)


def make_pod2d_group_mesh():
    """Mesh for ``--mesh pod-2d``: the combined 2D distribution (BASELINE
    config 4 at full strength). Ranks form groups of S consecutive
    processes (S = ``DEACON_POD_SHARDS``); each group owns one input byte
    range (reads/s scales with the number of groups) while the index is
    value-range sharded ACROSS the group's hosts (index memory scales with
    S). The returned mesh covers only THIS rank's group: shard axis runs
    across the group's processes (column j = process g*S+j's devices, the
    same geometry as make_pod_mesh), data axis over each process's local
    devices. The reference can scale neither axis (its index is replicated
    per process, ref: src/index.rs:96-107).
    """
    import jax

    from jax.sharding import Mesh

    nproc = int(os.environ.get("DEACON_NUM_PROC", "1"))
    rank = int(os.environ.get("DEACON_PROC_ID", "0"))
    try:
        n_shard = int(os.environ.get("DEACON_POD_SHARDS", ""))
    except ValueError:
        n_shard = 0
    if n_shard <= 0 or nproc % n_shard:
        raise ValueError(
            "--mesh pod-2d requires DEACON_POD_SHARDS (index shards per "
            f"group) to divide DEACON_NUM_PROC; got shards={n_shard!r}, "
            f"nproc={nproc}"
        )
    group = rank // n_shard
    members = list(range(group * n_shard, (group + 1) * n_shard))
    procs: dict[int, list] = {}
    for d in jax.devices():
        procs.setdefault(d.process_index, []).append(d)
    missing = [p for p in members if p not in procs]
    if missing:
        raise ValueError(
            f"pod-2d group {group} expects jax processes {members}, but "
            f"{missing} own no devices — DEACON_PROC_ID must match the "
            "jax.distributed process id"
        )
    per = min(len(procs[p]) for p in members)
    cols = [procs[p][:per] for p in members]
    dev_arr = np.stack([np.asarray(c, dtype=object) for c in cols], axis=1)
    return Mesh(dev_arr, ("data", "shard"))


def make_pod2d_pipeline_from_file(index_path: str, **kwargs):
    """Memory-lean pipeline over this rank's pod-2d group mesh: each rank
    stream-decodes only the value-range shards of its own devices within
    the group (the same per-shard loading as ``--mesh pod``)."""
    return _pipeline_from_file(index_path, make_pod2d_group_mesh(), **kwargs)


def make_local_data_mesh():
    """Rank-local mesh for ``--mesh pod-data``: reads data-parallel over
    this host's devices, index replicated per device by default (panhuman's
    3.3 GB probe fits a single v5e chip's 16 GB HBM with room to spare).
    DEACON_POD_LOCAL_MESH=DxS (e.g. 4x2) trades rows for per-device index
    memory when an index outgrows one chip.
    """
    import jax

    from jax.sharding import Mesh

    devs = jax.local_devices()
    spec = os.environ.get("DEACON_POD_LOCAL_MESH")
    if spec:
        from .sharded import parse_mesh_spec

        n_data, n_shard = parse_mesh_spec(spec)
        if n_data * n_shard > len(devs):
            raise ValueError(
                f"DEACON_POD_LOCAL_MESH={spec} needs {n_data * n_shard} local "
                f"devices, have {len(devs)}"
            )
    else:
        n_data, n_shard = len(devs), 1
    arr = np.asarray(devs[: n_data * n_shard], dtype=object)
    return Mesh(arr.reshape(n_data, n_shard), ("data", "shard"))


def make_local_pipeline_from_file(index_path: str, mesh=None, **kwargs):
    """Pipeline for pod-data mode: same per-shard streaming index load as
    pod mode, but over a RANK-LOCAL mesh — no cross-host collectives in the
    hot loop, so each rank filters its own input shard at full local speed
    and aggregate reads/s scales with the number of hosts."""
    if mesh is None:
        mesh = make_local_data_mesh()
    return _pipeline_from_file(index_path, mesh, **kwargs)


def _pipeline_from_file(index_path: str, mesh, **kwargs):
    import jax

    from ..index.store import load_header_and_count, load_index_shard
    from .sharded import ShardedPipeline

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
