"""Stage-LOCAL profiling of the device engine, calling the engine's OWN
jitted stage functions (deacon_tpu/ops/engine.py) so this tool can never
drift from the shipped pipeline. Each stage is timed steady-state with
device-resident inputs, then the full chained step and the single fused
program are timed for comparison.

Usage: python tools/profile_stages.py [R] [L] [index_millions]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from deacon_tpu import jaxenv

jaxenv.ensure()

import jax
import jax.numpy as jnp

from deacon_tpu.ops import engine as eng
from deacon_tpu.ops import minimizers_np as mnp

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
NIDX = int(float(sys.argv[3]) if len(sys.argv) > 3 else 100) * 1_000_000
K, W = 31, 15
# the staged v2/v3 stage timings below use the global budget; the FUSED
# production program (arch 4 on pow2 L) uses the per-row budget
BUDGET = (int(0.35 * R * L) + 191) // 128 * 128
BUDGET_FUSED = (
    eng.v4_row_budget(L, W, eng.default_budget_frac(W))
    if eng.engine_arch(31, L, R) == 4 else BUDGET
)

rng = np.random.default_rng(0)
raw = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(R, L)).astype(np.uint8)
codes = jnp.asarray(mnp.PACK_CODE[raw])
validb = jnp.asarray(mnp.VALID_BASE[raw])
mlen = jnp.asarray(np.full(R, L - K + 1, np.int32))
allow_short = jnp.asarray(np.zeros(R, bool))
rid = jnp.asarray(np.arange(R, dtype=np.int32))
mate = jnp.asarray(np.zeros(R, np.int32))
cstart = jnp.asarray(np.zeros(R, np.int32))

idx = np.sort(rng.integers(0, 2**64, size=NIDX, dtype=np.uint64))
n_pad = 1024
while n_pad < idx.size:
    n_pad *= 2
hi_np, lo_np, NV, MAX_RUN = eng.build_padded_shard_planes(idx, n_pad)
inv = jax.device_put(jnp.asarray([NV], dtype=jnp.int32))
ihi = jax.device_put(jnp.asarray(hi_np))
ilo = jax.device_put(jnp.asarray(lo_np))


def timeone(name, f, *a, iters=10, **kw):
    t0 = time.time()
    r = f(*a, **kw)
    jax.block_until_ready(r)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        r = f(*a, **kw)
    jax.block_until_ready(r)
    print(
        f"{name:30s} compile {c:7.1f}s steady "
        f"{(time.time() - t0) / iters * 1e3:8.3f} ms",
        flush=True,
    )
    return r


# S1: canonical value limbs + masked selection keys
out1 = timeone("S1 values+keys", eng._stage_values, codes, mlen, k=K)
limbs, keys = out1[:-1], out1[-1]

# S2a: doubling window argmin
wp_i = timeone("S2a window argmin", eng._stage_argmin, keys, w=W)

# S2b: new-minimizer + k-mer-valid flags
flag = timeone(
    "S2b flag mask", eng._stage_flag_mask, wp_i, validb, mlen, allow_short,
    k=K, w=W,
)

# Pallas fused S1+S2 (TPU only; compare against S1+S2a above)
if jax.devices()[0].platform == "tpu":
    from deacon_tpu.ops import pallas_kernels as pk

    timeone(
        "S1+S2a Pallas fused", pk.values_argmin_fused, codes, mlen, k=K, w=W
    )

# S3: compaction
slot_row, slot_pos, slot_valid, total = timeone(
    "S3 compaction", eng._stage_compact, flag, wp_i, budget=BUDGET
)

# S4: slot gathers + XXH3-64
hlo, hhi = timeone("S4 gather+xxh3", eng._stage_hash, limbs, slot_row, slot_pos, k=K)

# S5: probe
member, pos = timeone(
    "S5 probe", eng._stage_probe, ihi, ilo, inv, hlo, hhi, slot_valid,
    max_run=MAX_RUN,
)

# S6: distinct counting
timeone(
    "S6 counting", eng._stage_count, member, pos, slot_row, slot_pos,
    slot_valid, rid, mate, cstart, num_segments=R, dedup_positions=True,
)


# chained staged pipeline (all dispatches async)
def chain(codes, validb, mlen, allow_short, rid, mate, cstart):
    return eng._engine_step(
        codes, validb, mlen, allow_short, rid, mate, cstart, ihi, ilo, inv,
        k=K, w=W, budget=BUDGET, num_segments=R, max_run=MAX_RUN,
        dedup_positions=True,
    )


timeone("CHAIN total", chain, codes, validb, mlen, allow_short, rid, mate,
        cstart, iters=20)

# single fused program (the production path; takes bit-packed inputs).
# NB: pack from host NumPy, NOT np.asarray(device_array) — the first
# device->host materialization permanently degrades the tunneled axon
# process (PERFNOTES "cassette" notes) and would poison the timings below.
pc_np, pv_np = eng.host_pack_bits(
    mnp.PACK_CODE[raw].astype(np.uint8), mnp.VALID_BASE[raw]
)
pci_np, pvi_np = eng.host_interleave_packed(pc_np, pv_np)
pcodes, pvalid = jnp.asarray(pc_np), jnp.asarray(pv_np)
pci, pvi = jnp.asarray(pci_np), jnp.asarray(pvi_np)
# production probe routing: arch-4 shapes default to the arch-5 radix
# probe (ops/radix_probe.py) — time the FUSED program with the same
# table representation the CLI uses, falling back like the engine does
statics = (K, W, BUDGET_FUSED, R, MAX_RUN, True)
fused_ihi, fused_ilo, fused_inv = ihi, ilo, inv
if (
    eng.engine_arch(K, L, R) == 4
    and os.environ.get("DEACON_PROBE", "radix") == "radix"
):
    from deacon_tpu.ops.radix_probe import build_radix_table

    rt = build_radix_table(idx)
    if rt is not None:
        statics = statics + (("radix", rt.p, rt.k, rt.nplanes, rt.sp),)
        fused_ihi = jax.device_put(jnp.asarray(rt.planes))
        fused_ilo = jax.device_put(
            jnp.asarray(rt.spill) if rt.sp
            else jnp.zeros(1, dtype=jnp.uint32))
        fused_inv = jax.device_put(jnp.zeros(1, dtype=jnp.int32))
        print(f"FUSED probe: radix p={rt.p} k={rt.k} npl={rt.nplanes} "
              f"sp={rt.sp}", flush=True)
fused = eng.engine_step_fused(statics)
timeone("FUSED total", fused, pcodes, pvalid, mlen, allow_short, rid, mate,
        cstart, fused_ihi, fused_ilo, fused_inv, pci, pvi, iters=20)
print("DONE", flush=True)
