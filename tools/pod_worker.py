"""One process of a multi-host pod-slice filter run (BASELINE config 4).

Used by tests/test_multiprocess_pod.py (two local processes over Gloo) and
as the reference recipe for real pods: every host runs this with its own
process id; the index file is stream-decoded per shard so each host's RAM
holds only its 1/N slice (store.load_index_shard), probe planes live
sharded across the pod's HBM, and per-shard membership merges with one
psum. Each process sees the full result (outputs are all-gathered).

Usage: pod_worker.py PROC_ID NUM_PROCS COORD_PORT INDEX GENOME_FASTA
"""

import os
import sys

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
idx_path = sys.argv[4]
genome_path = sys.argv[5]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)

import numpy as np  # noqa: E402

from deacon_tpu.index.store import load_index  # noqa: E402
from deacon_tpu.ops import minimizers_np as mnp  # noqa: E402
from deacon_tpu.parallel.multihost import make_pod_pipeline_from_file  # noqa: E402

pipe = make_pod_pipeline_from_file(idx_path, row_len=256, rows_per_shard=16)
print(
    f"[{pid}] mesh data={pipe.n_data} x shard={pipe.n_shard}; "
    f"local index slice only",
    flush=True,
)

with open(genome_path, "rb") as f:
    genome = b"".join(
        line.strip() for line in f.read().splitlines() if not line.startswith(b">")
    )

# identical global read batch on every process (SPMD)
seqs = [genome[i * 37 : i * 37 + 150] for i in range(12)]
seqs.append(b"ACGT" * 40)
hits, totals = pipe.counts_single(seqs, 0)

index = load_index(idx_path)  # oracle only; a real host never loads this
for i, s in enumerate(seqs):
    h, _, _ = mnp.get_minimizer_hashes_and_positions(s, 0, 31, 15)
    oh = int(np.unique(h[index.contains(h)]).size)
    assert (hits[i], totals[i]) == (oh, h.size), (
        f"seq {i}: got ({hits[i]},{totals[i]}) want ({oh},{h.size})"
    )

print(f"POD_OK pid={pid} hits={hits.tolist()}", flush=True)
