"""Arch-5 radix-window probe: builder/oracle, device-path equality vs a
brute-force set oracle, grid-side totals, and the full DevicePipeline on
arch-4 tiles (CPU backend; the kernel runs its XLA emulation twin here —
tools/validate_tpu.py exercises the compiled Mosaic path on chip)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from deacon_tpu.index.store import IndexHeader, MinimizerIndex  # noqa: E402
from deacon_tpu.ops import minimizers_np as mnp  # noqa: E402
from deacon_tpu.ops import radix_probe as rp  # noqa: E402
from deacon_tpu.ops.engine import DevicePipeline  # noqa: E402

RNG = np.random.default_rng(77)
_B = np.frombuffer(b"ACGT", np.uint8)


def rs(n):
    return RNG.choice(_B, size=n).tobytes()


def test_builder_and_oracle_membership():
    for n in (0, 1, 5, 630, 120_000):
        keys = np.unique(RNG.integers(0, 2**64, n, dtype=np.uint64))
        t = rp.build_radix_table(keys)
        qm = RNG.choice(keys, size=min(n, 3000)) if n else np.array([], np.uint64)
        qr = RNG.integers(0, 2**64, 3000, dtype=np.uint64)
        q = np.concatenate([qm, qr])
        got = rp.oracle_member(t, q)
        kset = set(keys.tolist())
        want = np.array([int(x) in kset for x in q.tolist()])
        assert np.array_equal(got, want), n


def test_probe_hits_emulate_and_interpret_vs_bruteforce():
    keys = np.unique(RNG.integers(0, 2**64, 150_000, dtype=np.uint64))
    t = rp.build_radix_table(keys)
    planes = jnp.asarray(t.planes)
    R, Br, nseg = 32, 128, 16
    rid_rows = np.repeat(np.arange(nseg, dtype=np.int32), 2)
    rid_s = jnp.asarray(np.broadcast_to(rid_rows[:, None], (R, Br)).copy())
    pos_s = jnp.asarray(
        np.broadcast_to(np.arange(Br, dtype=np.int32)[None, :], (R, Br)).copy()
    )
    qk = np.where(
        RNG.random((R, Br)) < 0.5,
        RNG.choice(keys, size=(R, Br)),
        RNG.integers(0, 2**64, (R, Br), dtype=np.uint64),
    )
    qk[1, :] = qk[0, :]          # whole-row duplicate (same unit)
    qk[2, :16] = qk[2, 0]        # in-row duplicates
    valid = RNG.random((R, Br)) < 0.8
    hlo = jnp.asarray((qk & 0xFFFFFFFF).astype(np.uint32))
    hhi = jnp.asarray((qk >> 32).astype(np.uint32))
    sv = jnp.asarray(valid)
    kset = set(keys.tolist())
    want = np.zeros(nseg, np.int64)
    for u in range(nseg):
        vals = set()
        for r in np.nonzero(rid_rows == u)[0]:
            for j in range(Br):
                if valid[r, j] and int(qk[r, j]) in kset:
                    vals.add(int(qk[r, j]))
        want[u] = len(vals)
    for mode in ("emulate", "interpret"):
        hits, ov = rp.radix_probe_hits(
            planes, t.p, t.k, t.nplanes, hlo, hhi, sv, rid_s, pos_s,
            num_segments=nseg, mode=mode,
        )
        assert not bool(np.asarray(ov))
        assert np.array_equal(np.asarray(hits), want), mode


def test_totals_grid_overlap_dedup():
    k, w = 31, 15
    l = k + w - 1
    L = 64
    stride = L - l + 1
    R, Br, nseg = 12, 16, 4
    rid = np.repeat(np.arange(nseg, dtype=np.int32), 3)
    mate = np.zeros(R, np.int32)
    cstart = np.tile(np.arange(3, dtype=np.int32) * stride, nseg)
    slot_pos = np.zeros((R, Br), np.int32)
    valid = np.zeros((R, Br), bool)
    truth = [set() for _ in range(nseg)]
    for r in range(R):
        cnt = int(RNG.integers(5, 10))
        ps = np.sort(RNG.choice(np.arange(0, L - k + 1), cnt, replace=False))
        slot_pos[r, :cnt] = ps
        valid[r, :cnt] = True
        for p_ in ps:
            truth[rid[r]].add(int(cstart[r] + p_))
    for r in (1, 2, 4, 7, 10):  # force overlap duplicates
        prev = slot_pos[r - 1][valid[r - 1]] + cstart[r - 1]
        cand = prev[(prev >= cstart[r]) & (prev <= cstart[r] + L - k)]
        if cand.size:
            p_ = int(cand[-1]) - int(cstart[r])
            row = np.sort(np.unique(
                np.concatenate([slot_pos[r][valid[r]], [p_]])
            ))
            slot_pos[r, :] = 0
            valid[r, :] = False
            slot_pos[r, :row.size] = row
            valid[r, :row.size] = True
            truth[rid[r]].add(p_ + int(cstart[r]))
    want = np.array([len(s) for s in truth])
    tot = rp.totals_grid(
        jnp.asarray(slot_pos), jnp.asarray(valid), jnp.asarray(rid),
        jnp.asarray(mate), jnp.asarray(cstart),
        num_segments=nseg, k=k, l=l, stride=stride, dedup_positions=True,
    )
    assert np.array_equal(np.asarray(tot), want)


@pytest.fixture(scope="module")
def radix_pipe():
    genome = rs(120_000)
    idx = np.unique(mnp.compute_minimizer_hashes(genome, 31, 15))
    pipe = DevicePipeline(idx, 31, 15, tiles=((128, 32), (256, 16)))
    assert pipe._probe_extra and pipe._probe_extra[0] == "radix"
    return pipe, genome, MinimizerIndex(IndexHeader.new(31, 15), idx)


def test_pipeline_radix_vs_oracle(radix_pipe):
    pipe, genome, index = radix_pipe

    def oracle(seq):
        h, _, _ = mnp.get_minimizer_hashes_and_positions(seq, 0, 31, 15)
        m = index.contains(h)
        return int(np.unique(h[m]).size), int(h.size)

    seqs = []
    for _ in range(50):
        n = int(RNG.integers(31, 700))
        if RNG.random() < 0.5:
            s = int(RNG.integers(0, len(genome) - n))
            seqs.append(genome[s:s + n])
        else:
            seqs.append(rs(n))
    seqs.append(b"A" * 100)               # duplicate-value read
    seqs.append(genome[1000:1031] * 2)    # tandem repeat
    hits, totals = pipe.counts_single(seqs, 0)
    for i, s in enumerate(seqs):
        assert (hits[i], totals[i]) == oracle(s), (i, len(s))


def test_pipeline_radix_paired_union(radix_pipe):
    pipe, genome, index = radix_pipe
    pairs = [
        (genome[0:100], genome[50:150]),
        (genome[200:260], genome[200:260]),  # shared minimizers count once
        (rs(80), genome[500:600]),
    ]
    ph, pt = pipe.counts_paired(pairs, 0)
    for i, (a, b) in enumerate(pairs):
        ha, _, _ = mnp.get_minimizer_hashes_and_positions(a, 0, 31, 15)
        hb, _, _ = mnp.get_minimizer_hashes_and_positions(b, 0, 31, 15)
        hs = np.concatenate([ha, hb])
        m = index.contains(hs)
        assert (ph[i], pt[i]) == (
            int(np.unique(hs[m]).size), int(ha.size + hb.size)
        ), i


def test_radix_sidecar_roundtrip(tmp_path):
    ip = tmp_path / "x.idx"
    ip.write_bytes(b"dummy")
    keys = np.unique(RNG.integers(0, 2**64, 50_000, dtype=np.uint64))
    t1 = rp.build_radix_table(keys, cache_path=str(ip))
    t2 = rp.build_radix_table(keys, cache_path=str(ip))
    assert np.array_equal(t1.planes, t2.planes) and (t1.p, t1.k) == (t2.p, t2.k)


@pytest.mark.parametrize("density", [1.0, 0.66, 0.3])
def test_probe_hits_sparse_grids_vs_bruteforce(density):
    """Clustered-filler redesign: real-query spans drive the windows, so
    batches whose grids are mostly invalid slots (sparse reads, partial
    batches) must stay exact down to ~1/SPARSE density; the kernel skips
    all-filler tiles entirely (r4: probe cost scales with real count)."""
    rng = np.random.default_rng(int(density * 100))
    keys = np.unique(rng.integers(0, 2**64, 200_000, dtype=np.uint64))
    t = rp.build_radix_table(keys)
    planes = jnp.asarray(t.planes)
    R, Br, nseg = 32, 128, 16
    rid_rows = np.repeat(np.arange(nseg, dtype=np.int32), 2)
    rid_s = jnp.asarray(np.broadcast_to(rid_rows[:, None], (R, Br)).copy())
    pos_s = jnp.asarray(
        np.broadcast_to(np.arange(Br, dtype=np.int32)[None, :], (R, Br)).copy()
    )
    qk = np.where(
        rng.random((R, Br)) < 0.5,
        rng.choice(keys, size=(R, Br)),
        rng.integers(0, 2**64, (R, Br), dtype=np.uint64),
    )
    # valid slots form each row's prefix, like the real compacted grid
    # (small per-row jitter around the target density)
    cnt = np.clip(
        (density * Br + rng.integers(-8, 9, R)).astype(int), 1, Br
    )
    valid = np.arange(Br)[None, :] < cnt[:, None]
    hlo = jnp.asarray((qk & 0xFFFFFFFF).astype(np.uint32))
    hhi = jnp.asarray((qk >> 32).astype(np.uint32))
    kset = set(keys.tolist())
    want = np.zeros(nseg, np.int64)
    for u in range(nseg):
        vals = set()
        for r in np.nonzero(rid_rows == u)[0]:
            for j in range(int(cnt[r])):
                if int(qk[r, j]) in kset:
                    vals.add(int(qk[r, j]))
        want[u] = len(vals)
    for mode in ("emulate", "interpret"):
        hits, ov = rp.radix_probe_hits(
            planes, t.p, t.k, t.nplanes, hlo, hhi, jnp.asarray(valid),
            rid_s, pos_s, num_segments=nseg, mode=mode,
        )
        assert not bool(np.asarray(ov)), (mode, density)
        assert np.array_equal(np.asarray(hits), want), (mode, density)


def test_probe_hits_ultra_sparse_overflows_to_rerun():
    """Below ~1/SPARSE real density the real spans exceed the widened
    window: the kernel must RAISE the overflow flag (the engine then
    reruns the batch through the exact emulation), never return wrong
    counts silently."""
    rng = np.random.default_rng(5)
    keys = np.unique(rng.integers(0, 2**64, 200_000, dtype=np.uint64))
    t = rp.build_radix_table(keys)
    planes = jnp.asarray(t.planes)
    R, Br, nseg = 32, 128, 16
    rid_rows = np.repeat(np.arange(nseg, dtype=np.int32), 2)
    rid_s = jnp.asarray(np.broadcast_to(rid_rows[:, None], (R, Br)).copy())
    pos_s = jnp.asarray(
        np.broadcast_to(np.arange(Br, dtype=np.int32)[None, :], (R, Br)).copy()
    )
    qk = rng.choice(keys, size=(R, Br))
    valid = np.zeros((R, Br), bool)
    valid[:, :4] = True  # ~3% density: far beyond the sparse headroom
    hlo = jnp.asarray((qk & 0xFFFFFFFF).astype(np.uint32))
    hhi = jnp.asarray((qk >> 32).astype(np.uint32))
    hits, ov = rp.radix_probe_hits(
        planes, t.p, t.k, t.nplanes, hlo, hhi, jnp.asarray(valid),
        rid_s, pos_s, num_segments=nseg, mode="interpret",
    )
    assert bool(np.asarray(ov))
    # and the emulation (the rerun target) is exact on the same input
    kset = set(keys.tolist())
    want = np.zeros(nseg, np.int64)
    for u in range(nseg):
        vals = set()
        for r in np.nonzero(rid_rows == u)[0]:
            for j in range(4):
                if int(qk[r, j]) in kset:
                    vals.add(int(qk[r, j]))
        want[u] = len(vals)
    ehits, eov = rp.radix_probe_hits(
        planes, t.p, t.k, t.nplanes, hlo, hhi, jnp.asarray(valid),
        rid_s, pos_s, num_segments=nseg, mode="emulate",
    )
    assert not bool(np.asarray(eov))
    assert np.array_equal(np.asarray(ehits), want)


def test_pipeline_sparse_overflow_reruns_exactly(monkeypatch, capfd):
    """End-to-end engine path for ultra-sparse batches: reads that are
    mostly Ns leave the slot grid far below the radix windows' sparse
    floor; the kernel's overflow bit must route the batch through
    _radix_overflow_rerun (exact emulation) and the counts must still
    match the oracle. DEACON_PALLAS=interpret runs the real kernel (and
    its real overflow flag) on CPU."""
    monkeypatch.setenv("DEACON_PALLAS", "interpret")
    genome = rs(150_000)
    idx = np.unique(mnp.compute_minimizer_hashes(genome, 31, 15))
    index = MinimizerIndex(IndexHeader.new(31, 15), idx)
    pipe = DevicePipeline(idx, 31, 15, tiles=((2048, 64),))
    assert pipe._probe_extra and pipe._probe_extra[0] == "radix"
    reads = []
    for i in range(8):
        s = int(RNG.integers(0, len(genome) - 120))
        reads.append(genome[s:s + 120] + b"N" * 1800)
    units = [(i, ((0, r),)) for i, r in enumerate(reads)]
    hits, totals = pipe.launch_counts(units, len(units), 0)()
    err = capfd.readouterr().err
    assert "radix probe span overflow" in err
    idx_set = set(idx.tolist())
    for r, gh, gt in zip(reads, hits, totals):
        h, _, _ = mnp.get_minimizer_hashes_and_positions(r, 0, 31, 15)
        distinct = len(set(x for x in h.tolist() if x in idx_set))
        assert gt == len(h)
        assert gh == distinct


def test_pipeline_radix_chunked_long_reads_sparse_mix():
    """Long reads spanning multiple chunk rows (cross-chunk overlap
    dedup) mixed with N-heavy sparse reads and short reads, all through
    the radix probe on arch-4 tiles — the exact row-utilization mix the
    round-4 skip/sparse redesign changed. Counts must match the oracle
    read-for-read."""
    rng = np.random.default_rng(4242)
    genome = rs(200_000)
    idx = np.unique(mnp.compute_minimizer_hashes(genome, 31, 15))
    index = MinimizerIndex(IndexHeader.new(31, 15), idx)
    pipe = DevicePipeline(idx, 31, 15, tiles=((512, 64), (1024, 32)))
    assert pipe._probe_extra and pipe._probe_extra[0] == "radix"
    reads = []
    for i in range(6):  # multi-chunk long reads (several rows each)
        s = int(rng.integers(0, len(genome) - 2600))
        reads.append(genome[s:s + 2600])
    reads.append(genome[5000:5400] + b"N" * 2000)        # sparse tail rows
    reads.append(b"N" * 900 + genome[9000:9500])         # sparse head
    reads.append(rs(2600))                                # non-host long
    reads.append(genome[700:760])                         # short
    reads.append((genome[3000:3100]) * 8)                 # repetitive long
    units = [(i, ((0, r),)) for i, r in enumerate(reads)]
    hits, totals = pipe.launch_counts(units, len(units), 0)()
    idx_set = set(idx.tolist())
    for i, (r, gh, gt) in enumerate(zip(reads, hits, totals)):
        h, _, _ = mnp.get_minimizer_hashes_and_positions(r, 0, 31, 15)
        distinct = len(set(x for x in h.tolist() if x in idx_set))
        assert gt == len(h), (i, len(r), gt, len(h))
        assert gh == distinct, (i, len(r), gh, distinct)


# ---------------------------------------------------------------------------
# round 5: spill side table (p targets load ~97, K=128, excess keys in a
# VMEM-resident side table) + the real-only stable split before the sort
# ---------------------------------------------------------------------------

def _index_with_spill(genome, k=31, w=15):
    """Minimizer hashes of ``genome`` plus 140 crafted keys that share the
    top 30 bits of one REAL hash h and sort BELOW it in its bucket, so h
    itself is forced into the spill table — spill hits are then reachable
    from real reads."""
    idx = np.unique(mnp.compute_minimizer_hashes(genome, k, w))
    h = None
    for cand in idx:
        if int(cand) & 0xFFFFFFFF > 10_000:  # room below for crafted lows
            h = int(cand)
            break
    assert h is not None
    top = np.uint64(h & ~0x3FFFFFFFF)  # keep top 30 bits
    lows = RNG.integers(0, h & 0x3FFFFFFFF, 140, dtype=np.uint64)
    crafted = np.unique(top | lows)
    allk = np.unique(np.concatenate([idx, crafted]))
    return allk, h


def test_spill_build_forced_and_oracle():
    genome = rs(400_000)
    allk, h = _index_with_spill(genome)
    t = rp.build_radix_table(allk)
    assert t.sp > 0, "expected a spill table"
    # h must actually have spilled (not be in the primary planes)
    t_nospill = rp.RadixTable(t.planes, t.p, t.k, t.n_keys, t.fp)
    assert not rp.oracle_member(t_nospill, np.array([h], np.uint64))[0]
    assert rp.oracle_member(t, np.array([h], np.uint64))[0]
    # full membership parity
    q = np.concatenate([
        allk[:: max(1, allk.size // 2000)],
        RNG.integers(0, 2**64, 3000, dtype=np.uint64),
    ])
    kset = set(allk.tolist())
    want = np.array([int(x) in kset for x in q.tolist()])
    assert np.array_equal(rp.oracle_member(t, q), want)


def test_probe_hits_spill_and_split_vs_bruteforce():
    """q=8192 engages the stable split (qc=7168) in kernel modes; the
    index carries a forced spill table.  emulate (no split) and
    interpret (split + spill compare in-kernel) must both match the
    brute-force distinct-hit counts."""
    genome = rs(400_000)
    allk, h = _index_with_spill(genome)
    t = rp.build_radix_table(allk)
    assert t.sp > 0
    planes = jnp.asarray(t.planes)
    spill = jnp.asarray(t.spill)
    R, Br, nseg = 64, 128, 32
    rid_rows = np.repeat(np.arange(nseg, dtype=np.int32), 2)
    rid_s = jnp.asarray(np.broadcast_to(rid_rows[:, None], (R, Br)).copy())
    pos_s = jnp.asarray(
        np.broadcast_to(np.arange(Br, dtype=np.int32)[None, :], (R, Br)).copy()
    )
    qk = np.where(
        RNG.random((R, Br)) < 0.5,
        RNG.choice(allk, size=(R, Br)),
        RNG.integers(0, 2**64, (R, Br), dtype=np.uint64),
    )
    qk[0, 0] = h                 # guaranteed spill hit
    qk[3, :8] = h                # spill hit deduped within a unit
    valid = RNG.random((R, Br)) < 0.67
    valid[0, 0] = True
    valid[3, :8] = True
    hlo = jnp.asarray((qk & 0xFFFFFFFF).astype(np.uint32))
    hhi = jnp.asarray((qk >> 32).astype(np.uint32))
    sv = jnp.asarray(valid)
    kset = set(allk.tolist())
    want = np.zeros(nseg, np.int64)
    for u in range(nseg):
        vals = set()
        for r in np.nonzero(rid_rows == u)[0]:
            for j in range(Br):
                if valid[r, j] and int(qk[r, j]) in kset:
                    vals.add(int(qk[r, j]))
        want[u] = len(vals)
    from deacon_tpu.ops.radix_probe import split_bound
    assert split_bound(R * Br) < R * Br  # split engaged at this q
    for mode in ("emulate", "interpret"):
        hits, ov = rp.radix_probe_hits(
            planes, t.p, t.k, t.nplanes, hlo, hhi, sv, rid_s, pos_s,
            num_segments=nseg, mode=mode, spill=spill, sp=t.sp,
        )
        assert not bool(np.asarray(ov)), mode
        assert np.array_equal(np.asarray(hits), want), mode


def test_split_bound_overflow_flags_rerun():
    """A batch denser than the 0.78 split bound must raise the overflow
    flag (host reruns via emulation), never silently drop reals.
    400K keys at q=8192 is a geometry where the UNCOMPACTED sizing
    fails, so the auto-split actually engages."""
    keys = np.unique(RNG.integers(0, 2**64, 400_000, dtype=np.uint64))
    t = rp.build_radix_table(keys)
    from deacon_tpu.ops.radix_probe import _radix_sizing
    assert _radix_sizing(64 * 128, t.p, compacted=False) is None, (
        "geometry no longer forces the split path"
    )
    planes = jnp.asarray(t.planes)
    R, Br, nseg = 64, 128, 32
    rid_rows = np.repeat(np.arange(nseg, dtype=np.int32), 2)
    rid_s = jnp.asarray(np.broadcast_to(rid_rows[:, None], (R, Br)).copy())
    pos_s = jnp.asarray(np.zeros((R, Br), np.int32))
    qk = RNG.integers(0, 2**64, (R, Br), dtype=np.uint64)
    hlo = jnp.asarray((qk & 0xFFFFFFFF).astype(np.uint32))
    hhi = jnp.asarray((qk >> 32).astype(np.uint32))
    sv = jnp.asarray(np.ones((R, Br), bool))  # 100% > 0.78 bound
    hits, ov = rp.radix_probe_hits(
        planes, t.p, t.k, t.nplanes, hlo, hhi, sv, rid_s, pos_s,
        num_segments=nseg, mode="interpret",
        spill=jnp.asarray(t.spill) if t.sp else None, sp=t.sp,
    )
    assert bool(np.asarray(ov))


def test_pipeline_spilled_index_matches_host(tmp_path):
    """DevicePipeline end-to-end with a spilled index: per-read counts
    must equal the host set oracle, including reads whose minimizer
    landed in the spill table."""
    genome = rs(400_000)
    allk, h = _index_with_spill(genome)
    t = rp.build_radix_table(allk)
    assert t.sp > 0
    index = MinimizerIndex(IndexHeader.new(31, 15), allk)
    pipe = DevicePipeline(allk, 31, 15, tiles=[(512, 64)])
    assert pipe._probe_extra is not None and pipe._probe_extra[0] == "radix"
    assert pipe._probe_extra[4] == t.sp
    seqs = []
    for _ in range(30):
        n = int(RNG.integers(31, 480))
        if RNG.random() < 0.6:
            s = int(RNG.integers(0, len(genome) - n))
            seqs.append(genome[s:s + n])
        else:
            seqs.append(rs(n))
    hits, totals = pipe.counts_single(seqs, 0)
    for i, s in enumerate(seqs):
        hh, _, _ = mnp.get_minimizer_hashes_and_positions(s, 0, 31, 15)
        m = index.contains(hh)
        assert (hits[i], totals[i]) == (
            int(np.unique(hh[m]).size), int(hh.size)
        ), i
