"""Stage-LOCAL profiling: each engine stage as its own jit with device-array
inputs — exactly the decomposition a multi-dispatch pipeline would use.
Validates that splitting the mega-program into small jits recovers the
per-op speeds measured in isolation (the axon backend pessimizes large
fused programs).
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
from deacon_tpu.ops import u64pair as u64

R = int(sys.argv[1]) if len(sys.argv) > 1 else 64
L = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
NIDX = int(float(sys.argv[3]) if len(sys.argv) > 3 else 100) * 1_000_000
K, W = 31, 15
BUDGET = (int(0.35 * R * L) + 191) // 128 * 128

rng = np.random.default_rng(0)
raw = rng.choice(np.frombuffer(b"ACGT", np.uint8), size=(R, L)).astype(np.uint8)
codes = jnp.asarray(mnp.PACK_CODE[raw])
validb = jnp.asarray(mnp.VALID_BASE[raw])
mlen = jnp.asarray(np.full(R, L - K + 1, np.int32))
allow_short = jnp.asarray(np.zeros(R, bool))
rid = jnp.asarray(np.arange(R, dtype=np.int32))

idx = np.sort(rng.integers(0, 2**64, size=NIDX, dtype=np.uint64))
hi_np, lo_np, MAX_RUN = eng.build_probe_planes(idx)
ihi = jax.device_put(jnp.asarray(hi_np))
ilo = jax.device_put(jnp.asarray(lo_np))


def timeone(name, f, *a, iters=10):
    t0 = time.time()
    r = f(*a)
    jax.block_until_ready(r)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    print(f"{name:30s} compile {c:7.1f}s steady {(time.time()-t0)/iters*1e3:8.3f} ms",
          flush=True)
    return r


# J1: codes -> value limbs + keys
@jax.jit
def j1(codes):
    cu = codes.astype(jnp.uint32)
    limbs = eng._windowed_value_limbs(cu, K)
    fold = limbs[0]
    for x in limbs[1:]:
        fold = fold ^ x
    keys = eng._fmix32(fold)
    return (*limbs, keys)


out1 = timeone("J1 limbs+keys", j1, codes)
limb0, limb1, keys = out1[0], out1[1], out1[-1]


# J2: keys -> window argmin + flags
@jax.jit
def j2(keys, validb, mlen, allow_short):
    p_idx = jnp.arange(L, dtype=jnp.int32)
    in_row = p_idx[None, :] < mlen[:, None]
    keys = jnp.where(in_row, keys, eng._MAXU32)
    wk, wp = eng._window_argmin(keys, W)
    q = p_idx[None, :]
    win_valid = (q <= (mlen[:, None] - W)) | (
        (q == 0) & allow_short[:, None] & (mlen[:, None] >= 1))
    inv = (~validb).astype(jnp.int32)
    cs = jnp.cumsum(inv, axis=1)
    cs_end = eng._shift_cols(cs, K - 1)
    cs_start = jnp.concatenate(
        [jnp.zeros((R, 1), dtype=jnp.int32), cs[:, :-1]], axis=1)
    kmer_valid = ((cs_end - cs_start) == 0) & in_row
    wp_i = jnp.minimum(wp.astype(jnp.int32), L - 1)
    prev_wp = jnp.concatenate(
        [jnp.full((R, 1), -1, dtype=jnp.int32), wp_i[:, :-1]], axis=1)
    new_min = win_valid & ((q == 0) | (wp_i != prev_wp))
    row_ids = jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[:, None], (R, L))
    kv_flat = kmer_valid.astype(jnp.int32).reshape(-1)
    pos_ok = kv_flat[(row_ids * L + wp_i).reshape(-1)].reshape(R, L) == 1
    return wp_i, new_min & pos_ok


wp_i, flag = timeone("J2 argmin+flags", j2, keys, validb, mlen, allow_short)


# J3: flags -> compaction
@jax.jit
def j3(flag, wp_i):
    flat_flag = flag.reshape(-1)
    csel = jnp.cumsum(flat_flag.astype(jnp.int32))
    total = csel[-1]
    slot_id = jnp.searchsorted(
        csel, jnp.arange(1, BUDGET + 1, dtype=jnp.int32), side="left")
    slot_id = jnp.minimum(slot_id, R * L - 1)
    slot_row = (slot_id // L).astype(jnp.int32)
    slot_pos = wp_i.reshape(-1)[slot_id]
    slot_valid = jnp.arange(BUDGET, dtype=jnp.int32) < jnp.minimum(total, BUDGET)
    return slot_row, slot_pos, slot_valid, total


slot_row, slot_pos, slot_valid, total = timeone("J3 compaction", j3, flag, wp_i)


# J4: slot gathers + xxh3
@jax.jit
def j4(limb0, limb1, slot_row, slot_pos):
    slot_flat = slot_row * L + slot_pos
    s0 = limb0.reshape(-1)[slot_flat]
    s1 = limb1.reshape(-1)[slot_flat]
    return u64.xxh3_64_pair_u64(s0, s1)


hlo, hhi = timeone("J4 gather+xxh3", j4, limb0, limb1, slot_row, slot_pos)


# J5: probe
@jax.jit
def j5(ihi, ilo, hlo, hhi, slot_valid):
    member, pos = eng.probe_split_u32_pos(ihi, ilo, (hlo, hhi), max_run=MAX_RUN)
    return member & slot_valid, pos


member, pos = timeone("J5 probe", j5, ihi, ilo, hlo, hhi, slot_valid)


# J6: counting
@jax.jit
def j6(member, pos, slot_row, slot_valid, rid):
    srid = jnp.where(slot_valid, rid[slot_row], R)
    filler = jnp.int32(1 << 30) + jnp.arange(BUDGET, dtype=jnp.int32)
    poskey = jnp.where(member, pos, filler)
    srid_h, poskey_h = lax.sort((srid, poskey), num_keys=2)

    def neq_prev(x):
        return jnp.concatenate([jnp.ones((1,), dtype=bool), x[1:] != x[:-1]])

    hit_flag = (neq_prev(srid_h) | neq_prev(poskey_h)) & (
        poskey_h < jnp.int32(1 << 30))
    c = jnp.cumsum(hit_flag.astype(jnp.int32))
    c_ex = jnp.concatenate([jnp.zeros((1,), jnp.int32), c])
    seg = jnp.arange(R, dtype=jnp.int32)
    st = jnp.searchsorted(srid_h, seg, side="left")
    en = jnp.searchsorted(srid_h, seg, side="right")
    return c_ex[en] - c_ex[st]


timeone("J6 counting", j6, member, pos, slot_row, slot_valid, rid)

# chained end-to-end (all six dispatches, async)
def chain(codes, validb, mlen, allow_short, rid):
    o = j1(codes)
    l0, l1, ks = o[0], o[1], o[-1]
    wp, fl = j2(ks, validb, mlen, allow_short)
    sr, sp, sv, tt = j3(fl, wp)
    a, b = j4(l0, l1, sr, sp)
    mm, pp = j5(ihi, ilo, a, b, sv)
    return j6(mm, pp, sr, sv, rid)


timeone("CHAIN total", chain, codes, validb, mlen, allow_short, rid, iters=20)
print("DONE", flush=True)
