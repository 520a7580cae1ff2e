"""Stage-by-stage timing of the engine on the current JAX default device.

Builds successively larger prefixes of the engine computation as separate
jitted programs and times compile + steady-state for each, so both compile
and runtime hot spots are attributable. Usage:

    python tools/profile_engine.py [R] [L] [index_millions]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from jax import lax

from deacon_tpu.ops import engine as eng
from deacon_tpu.ops import minimizers_np as mnp

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
NIDX = int(float(sys.argv[3]) if len(sys.argv) > 3 else 100) * 1_000_000
K, W = 31, 15
BUDGET = int(0.35 * R * L) + 64

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
hi_np, lo_np, MAX_RUN = eng.build_probe_planes(idx)
ihi = jax.device_put(jnp.asarray(hi_np))
ilo = jax.device_put(jnp.asarray(lo_np))


def timeit(name, f, *args, iters=5):
    t0 = time.time()
    r = f(*args)
    jax.block_until_ready(r)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    dt = (time.time() - t0) / iters
    print(f"{name:34s} compile {c:7.1f}s   steady {dt*1e3:8.2f} ms", flush=True)
    return dt


def checksum(*arrs):
    # order-statistics checksum defeating algebraic simplification
    return sum(jnp.asarray(a).ravel()[:: max(1, a.size // 257)].astype(jnp.int64).sum()
               for a in arrs)


def _keys(codes):
    limbs = eng._windowed_value_limbs(codes.astype(jnp.uint32), K)
    fold = limbs[0]
    for x in limbs[1:]:
        fold = fold ^ x
    return eng._fmix32(fold)[:, : codes.shape[1] - K + 1]


@jax.jit
def s1_keys(codes):
    return checksum(_keys(codes))


@jax.jit
def s2_argmin(codes):
    wk, wp = eng._window_argmin(_keys(codes), W)
    return checksum(wk, wp)


@jax.jit
def s3_compact(codes, validb, mlen, allow_short):
    slot_row, slot_pos, slot_valid, total, h = eng._select_compact(
        codes, validb, mlen, allow_short, k=K, w=W, budget=BUDGET
    )
    return checksum(slot_row, slot_pos) + total.astype(jnp.int64)


@jax.jit
def s4_probe(codes, validb, mlen, allow_short, ihi, ilo):
    slot_row, slot_pos, slot_valid, total, h = eng._select_compact(
        codes, validb, mlen, allow_short, k=K, w=W, budget=BUDGET
    )
    member, pos = eng.probe_split_u32_pos(ihi, ilo, h, max_run=MAX_RUN)
    return checksum(member, pos)


@jax.jit
def s5_full(codes, validb, mlen, allow_short, rid, mate, cstart, ihi, ilo):
    hits, totals, total = eng.engine_core(
        codes, validb, mlen, allow_short, rid, mate, cstart,
        lambda h: eng.probe_split_u32_pos(ihi, ilo, h, max_run=MAX_RUN),
        k=K, w=W, budget=BUDGET, num_segments=R, dedup_positions=True,
    )
    return checksum(hits, totals)


@jax.jit
def s6_sort2(a, b):
    x, y = lax.sort((a, b), num_keys=2)
    return checksum(x, y)


print(f"profile: R={R} L={L} budget={BUDGET} index={NIDX} max_run={MAX_RUN} "
      f"device={jax.devices()[0]}", flush=True)
timeit("1 selection keys", s1_keys, codes)
timeit("2 + window argmin", s2_argmin, codes)
timeit("3 + compact+pack+hash", s3_compact, codes, validb, mlen, allow_short)
timeit("4 + probe", s4_probe, codes, validb, mlen, allow_short, ihi, ilo)
timeit("5 full engine", s5_full, codes, validb, mlen, allow_short, rid, mate,
       cstart, ihi, ilo)
qa = jnp.asarray(rng.integers(0, R, size=BUDGET, dtype=np.int32))
qb = jnp.asarray(rng.integers(0, 2**30, size=BUDGET, dtype=np.int32))
timeit("isolated 2-op sort (budget)", s6_sort2, qa, qb)
