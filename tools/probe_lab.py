"""Round-4 probe-economics lab: measure the primitives for the arch-5
"partitioned stream probe" design on the REAL device timeline (the
round-3 profiler technique — jax.profiler records actual on-chip op
durations through the tunnel).

Design being evaluated (VERDICT r3 items #1/#2/#4): replace the two
element-serial cuckoo gather passes (68 ms/step) with
  sort-or-partition queries by key prefix
  -> per-group windows (exact offsets from an MXU one-hot histogram)
  -> MXU one-hot fine-bucket gather (int8 matmul over u8 key planes)
  -> dense plane compare
  -> neq-prev dedup flags + MXU segment counts
All stages are dense/sequential — no random HBM access at all.

Usage: python tools/probe_lab.py exp1 exp2 ...   (or 'all')
Each experiment prints one line: name, device-ms per iteration.

NB: no device->host materialization happens before the measurements
(the tunneled process degrades permanently after the first d2h —
PERFNOTES 'cassette' notes).
"""

import functools
import glob
import gzip
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from deacon_tpu import jaxenv

jaxenv.ensure()

import jax
import jax.numpy as jnp

Q = 3_145_728          # queries per step (matches R=16384 x budget 192)
R = 16384              # reads per step
NIDX = 100_000_000     # index keys
P = 20                 # fine-bucket bits  -> 1M buckets, mean 95.4/bucket
KPAD = 128             # keys per fine bucket (padded)
PG = 14                # group bits -> 16384 groups
G = 1 << PG
F = 1 << (P - PG)      # fine buckets per group = 64
W = 512                # query window per group (mean 192)

rng = np.random.default_rng(0)


def measure(name, fn, args, iters=8):
    """Compile, run iters under the profiler, report real device ms."""
    out = fn(*args)
    jax.block_until_ready(out)
    tdir = tempfile.mkdtemp(prefix="lab_")
    jax.profiler.start_trace(tdir)
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    jax.profiler.stop_trace()
    files = sorted(glob.glob(os.path.join(tdir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(files[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"] if isinstance(tr, dict) else tr
    pids = {
        e["pid"]: e["args"].get("name")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    # top-level jit_ events only (inner HLO ops are nested inside them and
    # would double-count)
    dev_us = 0.0
    per_op = {}
    for e in ev:
        if e.get("ph") == "X" and str(pids.get(e["pid"], "")).startswith("/device:TPU"):
            n = str(e.get("name", ""))
            if n.startswith("jit_"):
                dev_us += e.get("dur", 0)
            per_op[n[:46]] = per_op.get(n[:46], 0.0) + e.get("dur", 0)
    ms = dev_us / 1e3 / iters
    print(f"LAB {name:28s} {ms:9.3f} ms/iter", flush=True)
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:14]
    for n, us in top:
        print(f"      {n:50s} {us/1e3/iters:8.3f} ms", flush=True)
    return ms


# ---------- inputs (host-built, device_put) ----------

def q_keys():
    hhi = jnp.asarray(rng.integers(0, 2**32, Q, dtype=np.uint32))
    hlo = jnp.asarray(rng.integers(0, 2**32, Q, dtype=np.uint32))
    ridpos = jnp.asarray(rng.integers(0, 2**31, Q, dtype=np.int32))
    matepos = jnp.asarray(rng.integers(0, 2**31, Q, dtype=np.int32))
    return hhi, hlo, ridpos, matepos


# ---------- experiments ----------

def exp_sort2():
    hhi, hlo, _, _ = q_keys()

    @jax.jit
    def f(a, b):
        return jax.lax.sort((a, b), num_keys=2)

    measure("sort 2op(u32,u32) 3.1M", f, (hhi, hlo))


def exp_sort3():
    hhi, hlo, rp, _ = q_keys()

    @jax.jit
    def f(a, b, c):
        return jax.lax.sort((a, b, c), num_keys=3)

    measure("sort 3op 3.1M", f, (hhi, hlo, rp))


def exp_sort4():
    hhi, hlo, rp, mp = q_keys()

    @jax.jit
    def f(a, b, c, d):
        return jax.lax.sort((a, b, c, d), num_keys=3)

    measure("sort 4op(3keys) 3.1M", f, (hhi, hlo, rp, mp))


def exp_rowsort():
    a = jnp.asarray(rng.integers(0, 2**32, (G, W), dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, (G, W), dtype=np.uint32))
    c = jnp.asarray(rng.integers(0, 2**31, (G, W), dtype=np.int32))
    d = jnp.asarray(rng.integers(0, 2**31, (G, W), dtype=np.int32))

    @jax.jit
    def f(a, b, c, d):
        return jax.lax.sort((a, b, c, d), dimension=1, num_keys=3)

    measure(f"rowsort ({G},{W}) 4op", f, (a, b, c, d))


def exp_hist():
    hhi, _, _, _ = q_keys()

    @jax.jit
    def f(hhi):
        gid = (hhi >> np.uint32(32 - PG)).astype(jnp.int32)
        oh = jax.nn.one_hot(gid, G, dtype=jnp.bfloat16)
        ones = jnp.ones((1, Q), dtype=jnp.bfloat16)
        counts = jax.lax.dot_general(
            ones, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return counts

    measure("hist onehot-mm Q->16K", f, (hhi,))


def exp_window():
    hhi, hlo, rp, mp = q_keys()
    starts = jnp.asarray(
        np.sort(rng.integers(0, Q - W, G)).astype(np.int32)
    )

    @jax.jit
    def f(starts, a, b, c, d):
        idx = starts[:, None] + jnp.arange(W, dtype=jnp.int32)[None, :]
        return a[idx], b[idx], c[idx], d[idx]

    measure(f"window gather ({G},{W})x4", f, (starts, hhi, hlo, rp, mp))


def exp_finegather():
    # batched int8 one-hot gather: (G,W,F) @ (G,F,KPAD*8planes)
    fid = jnp.asarray(rng.integers(0, F, (G, W), dtype=np.int32))
    planes = jnp.asarray(
        rng.integers(0, 127, (G, F, KPAD * 8), dtype=np.int8)
    )

    @jax.jit
    def f(fid, planes):
        oh = jax.nn.one_hot(fid, F, dtype=jnp.int8)
        out = jax.lax.dot_general(
            oh, planes, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        )
        return out

    measure(f"finegather mm ({G},{W},{F})@({F},{KPAD}*8)", f, (fid, planes))


def exp_compare():
    got = jnp.asarray(
        rng.integers(0, 255, (G, W, 8, KPAD), dtype=np.int32)
    )
    qpl = jnp.asarray(rng.integers(0, 255, (G, W, 8), dtype=np.int32))

    @jax.jit
    def f(got, qpl):
        eq = got == qpl[:, :, :, None]
        m = jnp.all(eq, axis=2)                      # (G,W,KPAD)
        member = jnp.any(m, axis=-1)
        j = jnp.argmax(m, axis=-1).astype(jnp.int32)
        return member, j

    measure(f"compare ({G},{W},8,{KPAD})", f, (got, qpl))


def exp_segcount():
    rid = jnp.asarray(rng.integers(0, R, Q, dtype=np.int32))
    flags = jnp.asarray(rng.integers(0, 2, (Q, 2), dtype=np.int8))

    @jax.jit
    def f(rid, flags):
        oh = jax.nn.one_hot(rid, R, dtype=jnp.bfloat16)
        return jax.lax.dot_general(
            oh.T, flags.astype(jnp.bfloat16), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    measure("segcount onehot-mm Qx16Kx2", f, (rid, flags))


def exp_gatherwidth():
    # XLA row-gather cost vs row width: is cost per query flat in bytes?
    B = 1 << 25
    ids = jnp.asarray(rng.integers(0, B, Q, dtype=np.int32))
    for width in (4, 8, 16, 32):
        tbl = jnp.asarray(
            rng.integers(0, 2**32, (B, width), dtype=np.uint32)
        )

        @jax.jit
        def f(tbl, ids):
            return tbl[ids, :].sum(axis=1)

        measure(f"xla row-gather w={width}", f, (tbl, ids))
        del tbl


def exp_stream():
    # sequential-read roofline: sum a big array (bandwidth-bound)
    big = jnp.asarray(rng.integers(0, 2**31, (NIDX,), dtype=np.int32))

    @jax.jit
    def f(x):
        return jnp.sum(x, dtype=jnp.int64)

    measure("stream sum 400MB", f, (big,))


def exp_fhist():
    # factorized one-hot histogram on the MXU: counts[hi,lo] =
    # A[hi,q]·B[q,lo] with A,B byte one-hots — exact (f32 accum, Q < 2^24),
    # no (Q, bins) materialization. Lab2 showed jax.nn.one_hot @ ones
    # lowers to a 56 ms select_reduce; this is the replacement.
    rid = jnp.asarray(rng.integers(0, R, Q, dtype=np.int32))
    flag = jnp.asarray(rng.integers(0, 2, Q, dtype=np.int8))

    @jax.jit
    def f(rid, flag):
        hi = rid >> 7
        lo = rid & 127
        steps = jnp.arange(128, dtype=jnp.int32)
        A = (hi[None, :] == steps[:, None]).astype(jnp.bfloat16)
        A = A * flag.astype(jnp.bfloat16)[None, :]
        B = (lo[:, None] == steps[None, :]).astype(jnp.bfloat16)
        C = jax.lax.dot_general(
            A, B, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return C.reshape(-1).astype(jnp.int32)  # counts per rid

    measure("fhist mxu Qx16K", f, (rid, flag))


def exp_pwin():
    # Pallas probe kernel, STATIC-TILE design: grid over fixed 1024-query
    # tiles of the sorted arrays (BlockSpec, no dynamic query DMA at all
    # — the i32 DMA granule is 1024 elements, so dynamic windows are
    # impossible anyway). Per tile the kernel DMAs a 512-row slab of the
    # byte-plane table at a prefetched 32-aligned row base
    # (double-buffered), then probes 8 sub-windows of 128 queries via
    # int8 one-hot matmuls against 128-row VMEM sub-slices, and
    # accumulates the factorized (128,128) rid histogram on the MXU.
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P_ = 21                 # fine-bucket bits (table; lambda = 47.7)
    NPL = 6                 # stored byte planes (P >= 17)
    K_ = 128                # slots per bucket (128-granule lane dim)
    NK = NPL * K_           # row width 768
    TQ = 1024               # queries per tile
    SUB = 128               # queries per sub-window
    FW = 512                # table rows per tile slab (32-aligned base)
    FSUB = 128              # table rows per sub-window slice
    n_tiles = Q // TQ
    sh_np = np.sort(rng.integers(0, 2**31, Q, dtype=np.int32))
    sh = jnp.asarray(sh_np)
    sl = jnp.asarray(rng.integers(0, 2**31, Q, dtype=np.int32))
    first = jnp.asarray(rng.integers(0, 2, Q, dtype=np.int32))
    rid = jnp.asarray(rng.integers(0, R, Q, dtype=np.int32))
    # per-tile slab base + per-sub-window local base (32-aligned),
    # host-built here; XLA-built in the real pipeline
    fid_np = (sh_np >> (31 - P_)) & ((1 << P_) - 1)
    tb = fid_np[::TQ]
    tbase_np = np.clip((tb - 8) // 32 * 32, 0, (1 << P_) - FW).astype(np.int32)
    sb = fid_np[::SUB].reshape(n_tiles, TQ // SUB)
    sbase_np = np.clip(
        (sb - 8) // 32 * 32 - tbase_np[:, None], 0, FW - FSUB
    ).astype(np.int32)
    bases = jnp.asarray(
        np.concatenate([tbase_np[:, None], sbase_np], axis=1).reshape(-1)
    )  # (n_tiles * 9,)
    planes = jnp.asarray(
        rng.integers(0, 127, (1 << P_, NK), dtype=np.int8)
    )

    import os as _os
    SKIP = set(_os.environ.get("DEACON_LAB_SKIP", "").split(","))

    def kern(bases_ref, sh_ref, sl_ref, first_ref, rid_ref, pl_ref,
             hist_ref, slab, acc, sem):
        t = pl.program_id(0)
        nt = pl.num_programs(0)

        @pl.when(t == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            b0 = pl.multiple_of(bases_ref[0], 32)
            cp = pltpu.make_async_copy(
                pl_ref.at[pl.ds(b0, FW), :], slab.at[0], sem.at[0]
            )
            cp.start()

        # prefetch next tile's slab while computing this one
        @pl.when(t + 1 < nt)
        def _():
            bn = pl.multiple_of(bases_ref[(t + 1) * 9], 32)
            cp = pltpu.make_async_copy(
                pl_ref.at[pl.ds(bn, FW), :], slab.at[(t + 1) % 2],
                sem.at[(t + 1) % 2],
            )
            cp.start()

        b = pl.multiple_of(bases_ref[t * 9], 32)
        pltpu.make_async_copy(
            pl_ref.at[pl.ds(b, FW), :], slab.at[t % 2], sem.at[t % 2]
        ).wait()
        whi = sh_ref[:].reshape(8, SUB)
        wlo = sl_ref[:].reshape(8, SUB)
        members = []
        for s in range(8):
            qh = whi[s, :][:, None]              # (SUB, 1)
            ql = wlo[s, :][:, None]
            fid = (qh >> (31 - P_)) & ((1 << P_) - 1)
            lb = pl.multiple_of(bases_ref[t * 9 + 1 + s], 32)
            loc = fid - (b + lb)
            oh = jnp.where(
                loc == jax.lax.broadcasted_iota(jnp.int32, (SUB, FSUB), 1),
                1, 0,
            ).astype(jnp.int8)
            eqc = jnp.zeros((SUB, K_), jnp.int32)
            for p in range(NPL if "mm" not in SKIP else 1):
                blk = slab[t % 2, pl.ds(lb, FSUB), p * K_:(p + 1) * K_]
                got = jax.lax.dot_general(
                    oh, blk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )                                 # (SUB, K_)
                qb = ((qh if p >= 4 else ql) >> (8 * (p % 4))) & 255
                qb = ((qb + 128) & 255) - 128
                if "cmp" in SKIP:
                    eqc += got
                else:
                    eqc += jnp.where(got == qb, 1, 0)
            members.append(
                jnp.sum(jnp.where(eqc == NPL, 1, 0), axis=1)[None, :]
            )
        member = jnp.concatenate(members, axis=0)      # (8, SUB)
        flag = jnp.minimum(member, 1) * first_ref[:].reshape(8, SUB)
        rid2 = rid_ref[:].reshape(8, SUB)
        h = jnp.zeros((128, 128), jnp.float32)
        for s in range(8 if "hist" not in SKIP else 1):
            hi = (rid2[s, :] >> 7)[None, :]
            lo = (rid2[s, :] & 127)[:, None]
            A = jnp.where(
                hi == jax.lax.broadcasted_iota(jnp.int32, (128, SUB), 0),
                flag[s, :][None, :], 0,
            ).astype(jnp.bfloat16)
            B = jnp.where(
                lo == jax.lax.broadcasted_iota(jnp.int32, (SUB, 128), 1),
                1, 0,
            ).astype(jnp.bfloat16)
            h += jax.lax.dot_general(
                A, B, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        acc[:] += h

        @pl.when(t == nt - 1)
        def _():
            hist_ref[:] = acc[:].astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TQ,), lambda i, b: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ,), lambda i, b: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ,), lambda i, b: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ,), lambda i, b: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (128, 128), lambda i, b: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, FW, NK), jnp.int8),
            pltpu.VMEM((128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    @jax.jit
    def f(bases, sh, sl, first, rid, planes):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
            grid_spec=grid_spec,
        )(bases, sh, sl, first, rid, planes)

    measure("pallas static-tile probe", f,
            (bases, sh, sl, first, rid, planes))


def exp_arch5():
    # FULL arch-5 engine step at the bench tile (R=16384, L=1024) against
    # a 100M-key radix table: extraction kernel + sort3 + radix-window
    # probe kernel + grid totals, one fused program — the number that
    # replaces the v4 88 ms step.
    from deacon_tpu.ops import engine as eng
    from deacon_tpu.ops import minimizers_np as mnp
    from deacon_tpu.ops import radix_probe as rp

    R_ = int(os.environ.get("DEACON_LAB_R", "16384"))
    L_ = int(os.environ.get("DEACON_LAB_L", "1024"))
    K_, W_ = 31, 15
    nidx = int(float(os.environ.get("DEACON_LAB_NIDX_M", "100")) * 1e6)
    cache = f"/dev/shm/lab_radix_{nidx}.npz"
    t = None
    if os.path.exists(cache):
        z = np.load(cache)
        t = rp.RadixTable(
            z["planes"], int(z["p"]), int(z["k"]), int(z["n"]), "lab",
            z["spill"] if z["sp"] else None, int(z["sp"]),
        )
    if t is None:
        keys = np.unique(rng.integers(0, 2**64, nidx, dtype=np.uint64))
        t = rp.build_radix_table(keys)
        np.savez(cache, planes=t.planes, p=t.p, k=t.k, n=t.n_keys,
                 sp=t.sp,
                 spill=t.spill if t.spill is not None
                 else np.zeros((1, 1), np.int8))
    print(f"table: P={t.p} K={t.k} npl={t.nplanes} "
          f"{t.nbytes/1e9:.2f} GB", flush=True)
    planes = jnp.asarray(t.planes)
    raw = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(R_, L_))
    pc, pv = eng.host_pack_bits(
        mnp.PACK_CODE[raw].astype(np.uint8), mnp.VALID_BASE[raw]
    )
    pci, pvi = eng.host_interleave_packed(pc, pv)
    budget = eng.v4_row_budget(L_, W_, eng.default_budget_frac(W_))
    mlen = jnp.asarray(np.full(R_, L_ - K_ + 1, np.int32))
    allow_short = jnp.asarray(np.zeros(R_, bool))
    rid = jnp.asarray(np.arange(R_, dtype=np.int32))
    mate = jnp.asarray(np.zeros(R_, np.int32))
    cstart = jnp.asarray(np.zeros(R_, np.int32))
    dummy_lo = (jnp.asarray(t.spill) if t.sp
                else jnp.zeros(1, dtype=jnp.uint32))
    dummy_nv = jnp.zeros(1, dtype=jnp.int32)
    statics = (K_, W_, budget, R_, 8, True,
               ("radix", t.p, t.k, t.nplanes, t.sp))
    fn = eng.engine_step_fused(statics)
    args = (jnp.asarray(pc), jnp.asarray(pv), mlen, allow_short, rid,
            mate, cstart, planes, dummy_lo, dummy_nv,
            jnp.asarray(pci), jnp.asarray(pvi))
    measure("arch5 full step (16.8Mbp)", f_wrap(fn), args, iters=8)


def f_wrap(fn):
    return fn


def exp_r5sort():
    # Round-5: the sort wall at the 4x batch (VERDICT r4 #1a).  Q4 =
    # 12.58M slots (R=4096 x Br=3072).  Questions: (a) does ns/elem hold
    # at 4x, (b) does num_keys matter (movement- vs comparator-bound),
    # (c) how much cheaper are SEGMENTED sorts of the same total volume
    # (the T-bit pre-binning design would buy rows of Q4/2^T), (d) what
    # a compacted real-only sort (0.75 bound) saves.
    Q4 = 12_582_912
    a = jnp.asarray(rng.integers(0, 2**32, Q4, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, Q4, dtype=np.uint32))
    c = jnp.asarray(rng.integers(0, 2**31, Q4, dtype=np.int32))

    @jax.jit
    def f3(a, b, c):
        return jax.lax.sort((a, b, c), num_keys=3)

    @jax.jit
    def f1(a, b, c):
        return jax.lax.sort((a, b, c), num_keys=1)

    measure("r5 sort3 nk3 12.58M", f3, (a, b, c), iters=4)
    measure("r5 sort3 nk1 12.58M", f1, (a, b, c), iters=4)

    Qc = 9_437_184  # 0.75 compacted bound
    measure("r5 sort3 nk3 9.4M", f3, (a[:Qc], b[:Qc], c[:Qc]), iters=4)

    for rows in (16, 64, 256):
        cols = Q4 // rows
        ar = a.reshape(rows, cols)
        br = b.reshape(rows, cols)
        cr = c.reshape(rows, cols)

        @jax.jit
        def fr(x, y, z):
            return jax.lax.sort((x, y, z), dimension=1, num_keys=3)

        measure(f"r5 rowsort ({rows},{cols//1024}K) nk3", fr,
                (ar, br, cr), iters=4)


def exp_r5sort2():
    # Round-5 follow-up: the sort knee between 2.36M and 6.3M (candidate
    # compacted-q sizes), and the 1-bit stable butterfly split that
    # compacts reals to the front before the sort (23 shifted-select
    # stages; displacement d = count of invalids before i is monotone so
    # the greedy high-bit-first shift never collides).
    for q in (2_359_296, 3_145_728, 4_718_592, 6_291_456):
        a = jnp.asarray(rng.integers(0, 2**32, q, dtype=np.uint32))
        b = jnp.asarray(rng.integers(0, 2**32, q, dtype=np.uint32))
        c = jnp.asarray(rng.integers(0, 2**31, q, dtype=np.int32))

        @jax.jit
        def f3(a, b, c):
            return jax.lax.sort((a, b, c), num_keys=3)

        measure(f"r5 sort3 {q/1e6:.2f}M", f3, (a, b, c), iters=6)

    Q1 = 3_145_728
    a = jnp.asarray(rng.integers(0, 2**32, Q1, dtype=np.uint32))
    b = jnp.asarray(rng.integers(0, 2**32, Q1, dtype=np.uint32))
    c = jnp.asarray(rng.integers(0, 2**31, Q1, dtype=np.int32))
    v = jnp.asarray(rng.random(Q1) < 0.67)

    @jax.jit
    def fsplit(a, b, c, v):
        d = jnp.cumsum((~v).astype(jnp.int32)) - (~v).astype(jnp.int32)
        d = jnp.where(v, d, 0)
        n = Q1
        s = 1 << (n - 1).bit_length() - 1
        while s >= 1:
            dm = jnp.pad(d[s:], (0, s))
            mv = dm >= s
            am = jnp.pad(a[s:], (0, s))
            bm = jnp.pad(b[s:], (0, s))
            cm = jnp.pad(c[s:], (0, s))
            a = jnp.where(mv, am, a)
            b = jnp.where(mv, bm, b)
            c = jnp.where(mv, cm, c)
            d = jnp.where(mv, dm - s, d)
            s >>= 1
        return a, b, c

    r = measure("r5 split1bit 3.1M", fsplit, (a, b, c, v), iters=6)

    @jax.jit
    def fsplit_sort(a, b, c, v):
        aa, bb, cc = fsplit(a, b, c, v)
        qc = (Q1 // 4) * 3
        return jax.lax.sort((aa[:qc], bb[:qc], cc[:qc]), num_keys=3)

    measure("r5 split+sort(0.75) 3.1M", fsplit_sort, (a, b, c, v), iters=6)


def exp_r5floor():
    # Round-5: decompose the probe kernel's ~2 us/tile floor.  (a) an
    # empty-body grid over 3072 tiles with the bases prefetch + slab DMA
    # pattern but no compute, (b) the same with G=4 tiles merged per grid
    # step (grid 768, body unrolled 4x) — if (b) ~= (a)/4 the floor is
    # grid-iteration overhead and the real kernel should merge tiles.
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P_ = 21
    NK = 768
    TQ = 1024
    FW = 512
    n_tiles = Q // TQ
    sh_np = np.sort(rng.integers(0, 2**31, Q, dtype=np.int32))
    sh = jnp.asarray(sh_np)
    fid_np = (sh_np >> (31 - P_)) & ((1 << P_) - 1)
    tb = fid_np[::TQ]
    tbase_np = np.clip((tb - 8) // 32 * 32, 0, (1 << P_) - FW).astype(np.int32)
    bases = jnp.asarray(tbase_np)
    planes = jnp.asarray(rng.integers(0, 127, (1 << P_, NK), dtype=np.int8))

    def make(G):
        def kern(bases_ref, sh_ref, out_ref, slab, acc, sem):
            t = pl.program_id(0)
            nt = pl.num_programs(0)

            @pl.when(t == 0)
            def _():
                acc[:] = jnp.zeros_like(acc)

            for g in range(G):
                tt = t * G + g
                slot = tt % 2

                @pl.when(tt == 0)
                def _():
                    b0 = pl.multiple_of(bases_ref[0], 32)
                    pltpu.make_async_copy(
                        pl_ref_.at[pl.ds(b0, FW), :], slab.at[0], sem.at[0]
                    ).start()

                nxt = tt + 1

                @pl.when(nxt < nt * G)
                def _():
                    bn = pl.multiple_of(bases_ref[nxt % (nt * G)], 32)
                    pltpu.make_async_copy(
                        pl_ref_.at[pl.ds(bn, FW), :], slab.at[nxt % 2],
                        sem.at[nxt % 2],
                    ).start()

                b = pl.multiple_of(bases_ref[tt], 32)
                pltpu.make_async_copy(
                    pl_ref_.at[pl.ds(b, FW), :], slab.at[slot], sem.at[slot]
                ).wait()
                acc[:] += jnp.float32(1.0)

            @pl.when(t == nt - 1)
            def _():
                out_ref[:] = acc[:].astype(jnp.int32)

        def kern3(bases_ref, sh_ref, pl_ref, out_ref, slab, acc, sem):
            global pl_ref_
            pl_ref_ = pl_ref
            kern(bases_ref, sh_ref, out_ref, slab, acc, sem)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_tiles // G,),
            in_specs=[
                pl.BlockSpec((TQ * G,), lambda i, b: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(
                (128, 128), lambda i, b: (0, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, FW, NK), jnp.int8),
                pltpu.VMEM((128, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )

        @jax.jit
        def f(bases, sh, planes):
            return pl.pallas_call(
                kern3,
                out_shape=jax.ShapeDtypeStruct((128, 128), jnp.int32),
                grid_spec=grid_spec,
            )(bases, sh, planes)

        return f

    for G in (1, 2, 4, 8):
        measure(f"r5 floor dma-only G={G}", make(G),
                (bases, sh, planes), iters=8)


def exp_r5probe410():
    # Round-5: the radix probe at panhuman scale (VERDICT r4 #2) in the
    # POST-SPLIT regime: q stays at the 1x-batch 3.1M (and the compacted
    # 2.36M) with a ~0.97-dense sorted stream, p=23, and the VMEM slab
    # cap raised past 4096 (slab 2 x fw x 768B; fw ~6-7K = 9-11 MB of
    # the 16 MB VMEM).  If this compiles and runs near the p=21 rate,
    # panhuman-scale needs neither a 4x batch nor a spill table.
    # Table planes are zeros (timing is shape/DMA-driven).
    from deacon_tpu.ops import radix_probe as rp

    P5, K5 = 23, 128
    NPL5 = rp.n_planes_for(P5)
    planes = jnp.asarray(
        np.zeros(((1 << P5), NPL5 * K5), dtype=np.int8))

    def go(tag, q, dens, p_):
        R5, BR5 = 1024, q // 1024
        hhi = jnp.asarray(
            rng.integers(0, 2**32, (R5, BR5), dtype=np.uint32))
        hlo = jnp.asarray(
            rng.integers(0, 2**32, (R5, BR5), dtype=np.uint32))
        sv = jnp.asarray(rng.random((R5, BR5)) < dens)
        rid_s = jnp.asarray(
            np.repeat(np.arange(R5, dtype=np.int32), BR5).reshape(R5, BR5))
        pos_s = jnp.asarray(np.zeros((R5, BR5), np.int32))

        @jax.jit
        def f(planes, hlo, hhi, sv, rid_s, pos_s):
            return rp.radix_probe_hits(
                planes, p_, K5, NPL5, hlo, hhi, sv, rid_s, pos_s,
                num_segments=R5)

        from deacon_tpu.ops.radix_probe import _radix_sizing
        print(f"   sizing: {_radix_sizing(q, p_)}", flush=True)
        measure(f"r5 probe410 {tag}", f,
                (planes, hlo, hhi, sv, rid_s, pos_s), iters=4)

    os.environ["DEACON_RADIX_FWCAP"] = "8192"
    os.environ["DEACON_RADIX_SPARSE"] = "1.35"
    go("q3.1M dens.97 p23 fwcap8K", 3_145_728, 0.97, P5)
    go("q2.36M dens.97 p23 fwcap8K", 2_359_296, 0.97, P5)
    os.environ["DEACON_RADIX_SPARSE"] = "3.5"
    os.environ["DEACON_RADIX_FWCAP"] = "4096"
    # the r4-default regime on the same table for reference (fits only
    # with the 0.67-density sizing at p=21)
    go("q3.1M dens.67 p21 (100M ref)", 3_145_728, 0.67, 21)
    os.environ.pop("DEACON_RADIX_SPARSE")
    os.environ.pop("DEACON_RADIX_FWCAP")


def exp_r5probe100():
    # Same 4x-batch probe against the 100M-scale table (p=21): TQ and
    # CH sweeps that the p=23 cap forbids.
    from deacon_tpu.ops import radix_probe as rp

    P5, K5 = 21, 128
    NPL5 = rp.n_planes_for(P5)
    R5, BR5 = 4096, 3072
    planes = jnp.asarray(
        np.zeros(((1 << P5), NPL5 * K5), dtype=np.int8))
    hhi = jnp.asarray(rng.integers(0, 2**32, (R5, BR5), dtype=np.uint32))
    hlo = jnp.asarray(rng.integers(0, 2**32, (R5, BR5), dtype=np.uint32))
    sv = jnp.asarray(rng.random((R5, BR5)) < 0.67)
    rid_s = jnp.asarray(
        np.repeat(np.arange(R5, dtype=np.int32), BR5).reshape(R5, BR5))
    pos_s = jnp.asarray(np.zeros((R5, BR5), np.int32))

    def go(tag):
        @jax.jit
        def f(planes, hlo, hhi, sv, rid_s, pos_s):
            return rp.radix_probe_hits(
                planes, P5, K5, NPL5, hlo, hhi, sv, rid_s, pos_s,
                num_segments=R5)

        measure(f"r5 probe100 q12.58M {tag}", f,
                (planes, hlo, hhi, sv, rid_s, pos_s), iters=4)

    go("tq1024 ch1024")
    os.environ["DEACON_RADIX_TQ"] = "2048"
    go("tq2048 ch1024")
    os.environ["DEACON_RADIX_CH"] = "512"
    go("tq2048 ch512")
    os.environ.pop("DEACON_RADIX_TQ")
    go("tq1024 ch512")
    os.environ["DEACON_RADIX_CH"] = "256"
    go("tq1024 ch256")
    os.environ.pop("DEACON_RADIX_CH")


def exp_r5emul():
    # Round-5 robustness: the exact-emulation rerun (tail batches,
    # overflow batches) at PRODUCTION scale on the real chip — it
    # gathers (q, 768B) rows; confirm it completes, its memory
    # behavior, and its cost (the amortization argument needs the
    # number).
    from deacon_tpu.ops import radix_probe as rp

    nidx = int(float(os.environ.get("DEACON_LAB_NIDX_M", "410")) * 1e6)
    cache = f"/dev/shm/lab_radix_{nidx}.npz"
    z = np.load(cache)
    t = rp.RadixTable(
        z["planes"], int(z["p"]), int(z["k"]), int(z["n"]), "lab",
        z["spill"] if z["sp"] else None, int(z["sp"]),
    )
    planes = jnp.asarray(t.planes)
    spill = jnp.asarray(t.spill) if t.sp else None
    R5, BR5 = 1024, 3072
    hhi = jnp.asarray(rng.integers(0, 2**32, (R5, BR5), dtype=np.uint32))
    hlo = jnp.asarray(rng.integers(0, 2**32, (R5, BR5), dtype=np.uint32))
    sv = jnp.asarray(rng.random((R5, BR5)) < 0.3)   # tail-batch density
    rid_s = jnp.asarray(
        np.repeat(np.arange(R5, dtype=np.int32), BR5).reshape(R5, BR5))
    pos_s = jnp.asarray(np.zeros((R5, BR5), np.int32))

    @jax.jit
    def f(planes, spill, hlo, hhi, sv, rid_s, pos_s):
        return rp.radix_probe_hits(
            planes, t.p, t.k, t.nplanes, hlo, hhi, sv, rid_s, pos_s,
            num_segments=R5, mode="emulate", spill=spill, sp=t.sp)

    measure(f"r5 emulation rerun q3.1M p{t.p}", f,
            (planes, spill, hlo, hhi, sv, rid_s, pos_s), iters=3)


EXPS = {
    "arch5": exp_arch5,
    "r5emul": exp_r5emul,
    "r5sort": exp_r5sort,
    "r5sort2": exp_r5sort2,
    "r5floor": exp_r5floor,
    "r5probe410": exp_r5probe410,
    "r5probe100": exp_r5probe100,
    "fhist": exp_fhist,
    "pwin": exp_pwin,
    "sort2": exp_sort2,
    "sort3": exp_sort3,
    "sort4": exp_sort4,
    "rowsort": exp_rowsort,
    "hist": exp_hist,
    "window": exp_window,
    "finegather": exp_finegather,
    "compare": exp_compare,
    "segcount": exp_segcount,
    "gatherwidth": exp_gatherwidth,
    "stream": exp_stream,
}

if __name__ == "__main__":
    names = sys.argv[1:] or ["all"]
    if names == ["all"]:
        names = list(EXPS)
    t0 = time.time()
    for n in names:
        EXPS[n]()
    print(f"LAB done in {time.time()-t0:.1f}s", flush=True)
