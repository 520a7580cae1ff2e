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
    dev_us = 0.0
    per_op = {}
    for e in ev:
        if e.get("ph") == "X" and str(pids.get(e["pid"], "")).startswith("/device:TPU"):
            dev_us += e.get("dur", 0)
            n = str(e.get("name", ""))[:46]
            per_op[n] = per_op.get(n, 0.0) + e.get("dur", 0)
    ms = dev_us / 1e3 / iters
    print(f"LAB {name:28s} {ms:9.3f} ms/iter", flush=True)
    top = sorted(per_op.items(), key=lambda kv: -kv[1])[:4]
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


EXPS = {
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
