"""v3 engine architecture (packed-input kernel + cumsum-free compaction +
slot-level value recomputation) == v2 stages, bit-exact.

The v3 design's load-bearing invariants:
* the packed 2-bit code stream read as little-endian u32 words has the
  forward k-mer value at position p in bits [2p, 2p+2k) (_words_view);
* _stage_hash_packed's recomputed canonical value at a slot equals the
  kernel-v2 propagated value plane entry (same min(fwd, rc) math);
* _stage_compact3's two-level search yields exactly _stage_compact2's
  slots (same row-major flag enumeration);
* the full _engine_step (packed=True) produces identical hits/totals under
  DEACON_ENGINE=2 and the default v3 routing.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from deacon_tpu.ops import engine as eng  # noqa: E402
from deacon_tpu.ops import minimizers_np as mnp  # noqa: E402


def _random_tile(rng, R, L, k, dirty=0.05):
    codes = rng.integers(0, 4, (R, L)).astype(np.uint8)
    validb = rng.random((R, L)) > dirty
    mlen = rng.integers(-1, L - k + 2, (R,)).astype(np.int32)
    mlen[0] = L - k + 1
    mlen[1] = 0
    allow_short = rng.random(R) > 0.5
    return codes, validb, mlen, allow_short


def test_words_view_is_little_endian_value_stream():
    rng = np.random.default_rng(1)
    R, L, k = 4, 256, 31
    codes = rng.integers(0, 4, (R, L)).astype(np.uint8)
    pc, _ = eng.host_pack_bits(codes, np.ones((R, L), bool))
    words = np.asarray(eng._words_view(jnp.asarray(pc)))
    # numpy little-endian view of the same bytes
    want = pc.reshape(R, -1).view("<u4")
    np.testing.assert_array_equal(words, want)
    # bits [2p, 2p+2k) == forward k-mer value at p
    stream = np.zeros(R * L // 4, dtype=np.uint8)
    for r in range(R):
        p = 17
        fwd = 0
        for j in range(k):
            fwd |= int(codes[r, p + j]) << (2 * j)
        w64 = (
            int(words[r, p // 16])
            | (int(words[r, p // 16 + 1]) << 32)
            | (int(words[r, p // 16 + 2]) << 64)
        )
        got = (w64 >> (2 * (p % 16))) & ((1 << (2 * k)) - 1)
        assert got == fwd


@pytest.mark.parametrize("k,w", [(31, 15), (32, 15), (21, 7), (16, 16),
                                 (5, 3), (31, 2), (2, 15), (13, 11),
                                 (31, 25), (15, 63)])
def test_values_csum_kernel_matches_emulation(k, w, monkeypatch):
    rng = np.random.default_rng(k * 37 + w)
    R, L = 16, 512
    codes, validb, mlen, allow_short = _random_tile(rng, R, L, k)
    l = k + w - 1
    mlen[2] = l - k  # short read: single window via allow_short
    allow_short[2] = True
    pc, pv = eng.host_pack_bits(codes, validb)
    pci, pvi = eng.host_interleave_packed(pc, pv)
    args = (jnp.asarray(pc), jnp.asarray(pv), jnp.asarray(pci),
            jnp.asarray(pvi), jnp.asarray(mlen), jnp.asarray(allow_short))

    monkeypatch.setenv("DEACON_PALLAS", "off")
    want_plane, want_tot = eng._values_csum(*args, k=k, w=w)
    monkeypatch.setenv("DEACON_PALLAS", "interpret")
    got_plane, got_tot = eng._values_csum(*args, k=k, w=w)
    np.testing.assert_array_equal(np.asarray(got_tot), np.asarray(want_tot))
    np.testing.assert_array_equal(
        np.asarray(got_plane), np.asarray(want_plane)
    )


@pytest.mark.parametrize("k", [31, 32, 21, 16, 15, 8, 2])
def test_hash_packed_matches_hash2(k):
    """Recomputed slot values hash identically to the v2 value planes."""
    w = 15 if k > 15 else 3
    rng = np.random.default_rng(k)
    R, L = 16, 512
    codes, validb, mlen, allow_short = _random_tile(rng, R, L, k, dirty=0.02)
    pc, pv = eng.host_pack_bits(codes, validb)
    ja = (jnp.asarray(codes), jnp.asarray(validb), jnp.asarray(mlen),
          jnp.asarray(allow_short))
    vplanes, wpf = eng._values_select(*ja, k=k, w=w)
    budget = 1024
    slot_id, slot_row, slot_pos, slot_valid, total = eng._stage_compact2(
        wpf, budget=budget
    )
    want = eng._stage_hash2(vplanes, slot_id, k=k)
    got = eng._stage_hash_packed(
        eng._words_view(jnp.asarray(pc)), slot_row, slot_pos, k=k
    )
    sv = np.asarray(slot_valid)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a)[sv], np.asarray(b)[sv])


@pytest.mark.parametrize("budget", [64, 1024, 8192])
def test_compact3_matches_compact2(budget):
    k, w = 31, 15
    rng = np.random.default_rng(budget)
    R, L = 32, 384
    codes, validb, mlen, allow_short = _random_tile(rng, R, L, k)
    pc, pv = eng.host_pack_bits(codes, validb)
    ja = (jnp.asarray(codes), jnp.asarray(validb), jnp.asarray(mlen),
          jnp.asarray(allow_short))
    _, wpf = eng._values_select(*ja, k=k, w=w)
    want = eng._stage_compact2(wpf, budget=budget)
    pci, pvi = eng.host_interleave_packed(pc, pv)
    plane, row_tot = eng._values_csum(
        jnp.asarray(pc), jnp.asarray(pv), jnp.asarray(pci),
        jnp.asarray(pvi), jnp.asarray(mlen), jnp.asarray(allow_short),
        k=k, w=w,
    )
    got = eng._stage_compact3(plane, row_tot, budget=budget)
    assert int(got[4]) == int(want[4])  # total
    sv = np.asarray(want[3])
    np.testing.assert_array_equal(np.asarray(got[3]), sv)  # slot_valid
    for gi, wi in ((0, 0), (1, 1), (2, 2)):  # slot_id, row, pos at valid
        np.testing.assert_array_equal(
            np.asarray(got[gi])[sv], np.asarray(want[wi])[sv]
        )


@pytest.mark.parametrize("kernel", ["off", "interpret"])
def test_engine_step_v3_matches_v2(kernel, monkeypatch):
    k, w = 31, 15
    rng = np.random.default_rng(7)
    R, L = 32, 512
    codes, validb, mlen, allow_short = _random_tile(rng, R, L, k)
    pc, pv = eng.host_pack_bits(codes, validb)
    rid = np.repeat(np.arange(R // 2, dtype=np.int32), 2)
    mate = np.tile(np.array([0, 1], np.int32), R // 2)
    cstart = np.zeros(R, np.int32)
    # index: hashes drawn from the tile itself so probes actually hit
    hs = []
    for r in range(R):
        if mlen[r] <= 0:
            continue
        h, _, _ = mnp.get_minimizer_hashes_and_positions(
            bytes(np.frombuffer(b"ACGT", np.uint8)[codes[r]]), 0, k, w
        )
        hs.extend(h.tolist()[:5])
    arr = np.unique(np.array(hs, dtype=np.uint64))
    hi, lo, nv, max_run = eng.build_padded_shard_planes(arr, 4096)
    budget = 2048
    pci, pvi = eng.host_interleave_packed(pc, pv)
    args = [jnp.asarray(pc), jnp.asarray(pv), jnp.asarray(mlen),
            jnp.asarray(allow_short), jnp.asarray(rid), jnp.asarray(mate),
            jnp.asarray(cstart), jnp.asarray(hi), jnp.asarray(lo),
            jnp.asarray(np.array([nv], np.int32)),
            jnp.asarray(pci), jnp.asarray(pvi)]
    kw = dict(k=k, w=w, budget=budget, num_segments=R // 2, max_run=max_run,
              dedup_positions=True, packed=True)

    monkeypatch.setenv("DEACON_PALLAS", kernel)
    monkeypatch.setenv("DEACON_ENGINE", "2")
    want = eng._engine_step(*args, **kw)
    monkeypatch.setenv("DEACON_ENGINE", "3")
    got = eng._engine_step(*args, **kw)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # arch 4: per-row slot grid — hits/totals identical, `used` is the max
    # per-row total (a different overflow metric by design)
    monkeypatch.delenv("DEACON_ENGINE")
    assert eng.engine_arch(k, L, R) == 4
    kw4 = dict(kw)
    kw4["budget"] = 256  # per-row Br
    got4 = eng._engine_step(*args, **kw4)
    for a, b in zip(got4[:2], want[:2]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(got4[2]) <= 256


def test_device_pipeline_v3_oracle(monkeypatch):
    """Integrated DevicePipeline decisions through the v3 emulation path
    (CPU default) must match the NumPy oracle exactly, including long
    chunked reads and paired units."""
    k, w = 31, 15
    rng = np.random.default_rng(11)
    alpha = np.frombuffer(b"ACGTNryK", dtype=np.uint8)
    genome = rng.choice(alpha[:4], 5000).tobytes()
    index_hashes = np.unique(mnp.compute_minimizer_hashes(genome, k, w, 0.0))
    reads = []
    for i in range(10):
        n = int(rng.integers(0, 700))
        reads.append(rng.choice(alpha, n).tobytes())
    for i in range(6):
        s = int(rng.integers(0, 4000))
        reads.append(genome[s : s + 600])
    pipe = eng.DevicePipeline(index_hashes, k, w, tiles=((384, 64),))
    units = [(i, ((0, r),)) for i, r in enumerate(reads)]
    resolve = pipe.launch_counts(units, len(units), prefix_length=0)
    got_hits, got_totals = resolve()
    idx_set = set(index_hashes.tolist())
    for r, (gh, gt) in zip(reads, zip(got_hits, got_totals)):
        h, _, _ = mnp.get_minimizer_hashes_and_positions(r, 0, k, w)
        distinct = set(x for x in h.tolist() if x in idx_set)
        assert gt == len(h), (len(r), gt, len(h))
        assert gh == len(distinct), (len(r), gh, len(distinct))


def test_native_interleave_matches_numpy():
    """dx_interleave_tile (C++) == host_interleave_packed's NumPy path."""
    import unittest.mock as um

    import deacon_tpu.io.native_loader as nl
    from deacon_tpu.io.native_loader import native_interleave_tile

    rng = np.random.default_rng(13)
    for (R, L) in [(16, 512), (8, 2048), (32, 128)]:
        codes = rng.integers(0, 4, (R, L)).astype(np.uint8)
        validb = rng.random((R, L)) > 0.1
        pc, pv = eng.host_pack_bits(codes, validb)
        nat = native_interleave_tile(pc, pv)
        if nat is None:
            pytest.skip("native library unavailable")
        with um.patch.object(nl, "get_lib", lambda: None):
            ref = eng.host_interleave_packed(pc, pv)
        np.testing.assert_array_equal(nat[0], ref[0])
        np.testing.assert_array_equal(nat[1], ref[1])


def test_values_csum_kernel_L16384_boundary(monkeypatch):
    """L = 16384 is the v3 packing ceiling (wp 14 bits, csum << 16 = 2^30):
    the kernel must stay exact at the boundary tile width."""
    k, w = 31, 15
    rng = np.random.default_rng(99)
    R, L = 8, 16384
    codes = rng.integers(0, 4, (R, L)).astype(np.uint8)
    validb = np.ones((R, L), bool)
    mlen = np.full(R, L - k + 1, np.int32)
    allow_short = np.zeros(R, bool)
    pc, pv = eng.host_pack_bits(codes, validb)
    pci, pvi = eng.host_interleave_packed(pc, pv)
    args = (jnp.asarray(pc), jnp.asarray(pv), jnp.asarray(pci),
            jnp.asarray(pvi), jnp.asarray(mlen), jnp.asarray(allow_short))
    monkeypatch.setenv("DEACON_PALLAS", "off")
    want_p, want_t = eng._values_csum(*args, k=k, w=w)
    monkeypatch.setenv("DEACON_PALLAS", "interpret")
    got_p, got_t = eng._values_csum(*args, k=k, w=w)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(want_t))
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(want_p))
    assert int(np.asarray(want_p).max()) < 2**31 - 1  # no sign overflow


def test_cuckoo_probe_matches_isin():
    """Cuckoo membership + unique positions == ground truth, including the
    all-ones sentinel key as a real member and as a non-member query."""
    rng = np.random.default_rng(21)
    keys = np.unique(rng.integers(0, 2**64, 50_000, dtype=np.uint64))
    keys = np.concatenate([keys, np.array([0xFFFFFFFFFFFFFFFF], np.uint64)])
    table, c1, c2, has_sent = eng.build_cuckoo_planes(keys)
    assert has_sent
    queries = np.concatenate([
        keys[rng.integers(0, keys.size, 30_000)],
        rng.integers(0, 2**64, 30_000, dtype=np.uint64),
        np.array([0xFFFFFFFFFFFFFFFF], np.uint64),
    ])
    qlo = jnp.asarray((queries & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    qhi = jnp.asarray((queries >> np.uint64(32)).astype(np.uint32))
    sv = jnp.ones(queries.shape, dtype=bool)
    member, pos = eng._stage_probe_cuckoo(
        jnp.asarray(table), qlo, qhi, sv, c1=c1, c2=c2, has_sentinel=True
    )
    member, pos = np.asarray(member), np.asarray(pos)
    want = np.isin(queries, keys)
    np.testing.assert_array_equal(member, want)
    # positions: unique per distinct key, equal for equal keys, -1 otherwise
    assert (pos[~member] == -1).all()
    by_key = {}
    for q, p in zip(queries[member].tolist(), pos[member].tolist()):
        by_key.setdefault(q, set()).add(p)
    assert all(len(v) == 1 for v in by_key.values())
    all_pos = [next(iter(v)) for v in by_key.values()]
    assert len(set(all_pos)) == len(all_pos)


def test_cuckoo_without_sentinel_rejects_sentinel_query():
    rng = np.random.default_rng(22)
    keys = np.unique(rng.integers(0, 2**64, 10_000, dtype=np.uint64))
    table, c1, c2, has_sent = eng.build_cuckoo_planes(keys)
    assert not has_sent
    q = np.array([0xFFFFFFFFFFFFFFFF], np.uint64)
    member, pos = eng._stage_probe_cuckoo(
        jnp.asarray(table),
        jnp.asarray((q & np.uint64(0xFFFFFFFF)).astype(np.uint32)),
        jnp.asarray((q >> np.uint64(32)).astype(np.uint32)),
        jnp.ones(1, dtype=bool), c1=c1, c2=c2, has_sentinel=False,
    )
    assert not bool(member[0]) and int(pos[0]) == -1


def test_device_pipeline_cuckoo_matches_sorted(monkeypatch):
    """DevicePipeline decisions must be identical under the cuckoo probe
    (default) and DEACON_PROBE=sorted."""
    k, w = 31, 15
    rng = np.random.default_rng(23)
    alpha = np.frombuffer(b"ACGTN", dtype=np.uint8)
    genome = rng.choice(alpha[:4], 4000).tobytes()
    index_hashes = np.unique(mnp.compute_minimizer_hashes(genome, k, w, 0.0))
    reads = [rng.choice(alpha, int(rng.integers(0, 500))).tobytes()
             for _ in range(10)]
    reads += [genome[s : s + 400] for s in (0, 700, 2200)]
    units = [(i, ((0, r),)) for i, r in enumerate(reads)]

    pipe = eng.DevicePipeline(index_hashes, k, w)
    assert pipe._probe_extra is not None  # cuckoo active by default
    got = pipe.launch_counts(units, len(units), prefix_length=0)()

    monkeypatch.setenv("DEACON_PROBE", "sorted")
    pipe2 = eng.DevicePipeline(index_hashes, k, w)
    assert pipe2._probe_extra is None
    want = pipe2.launch_counts(units, len(units), prefix_length=0)()
    for a, b in zip(got, want):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("k,w", [(31, 15), (32, 15), (21, 7), (13, 11),
                                 (5, 3), (31, 2)])
def test_values_compact_kernel_matches_emulation(k, w, monkeypatch):
    """v4 kernel (in-kernel butterfly compaction) == XLA emulation on the
    valid slot region of every row."""
    rng = np.random.default_rng(k * 41 + w)
    R, L, Br = 16, 512, 256
    codes, validb, mlen, allow_short = _random_tile(rng, R, L, k)
    l = k + w - 1
    mlen[2] = l - k
    allow_short[2] = True
    pc, pv = eng.host_pack_bits(codes, validb)
    pci, pvi = eng.host_interleave_packed(pc, pv)
    args = (jnp.asarray(pc), jnp.asarray(pv), jnp.asarray(pci),
            jnp.asarray(pvi), jnp.asarray(mlen), jnp.asarray(allow_short))
    monkeypatch.setenv("DEACON_PALLAS", "off")
    wpos, (wv0, wv1), wrt = eng._values_compact(*args, k=k, w=w, Br=Br)
    monkeypatch.setenv("DEACON_PALLAS", "interpret")
    gpos, (gv0, gv1), grt = eng._values_compact(*args, k=k, w=w, Br=Br)
    np.testing.assert_array_equal(np.asarray(grt), np.asarray(wrt))
    rt = np.asarray(wrt)
    assert rt.max() <= Br  # fixture stays inside the row budget
    valid = np.arange(Br)[None, :] < rt[:, None]
    for g, wnt in ((gpos, wpos), (gv0, wv0), (gv1, wv1)):
        np.testing.assert_array_equal(
            np.asarray(g)[valid], np.asarray(wnt)[valid]
        )


def test_device_pipeline_v4_sparse_rows_oracle():
    """Regression: arch-4's per-row slot grid leaves srid unsorted, which
    broke the non-chunked (dedup_positions=False) totals path for sparse
    rows (reads with 1-2 minimizers among many-N bases). Default pow2
    tiles -> arch 4 on the small tile classes."""
    k, w = 31, 15
    rng = np.random.default_rng(31)
    a = np.frombuffer(b"ACGTACGTNn", dtype=np.uint8)
    genome = rng.choice(a[:4], 3000).tobytes()
    index_hashes = np.unique(mnp.compute_minimizer_hashes(genome, k, w, 0.0))
    # heavy-N reads (few minimizers), empty reads, normal reads
    reads = [rng.choice(a, int(rng.integers(0, 1800))).tobytes()
             for _ in range(16)]
    reads += [genome[s : s + 250] for s in (0, 500, 900)]
    assert eng.engine_arch(k, 256, 8192) == 4
    pipe = eng.DevicePipeline(index_hashes, k, w)
    units = [(i, ((0, r),)) for i, r in enumerate(reads)]
    got_hits, got_totals = pipe.launch_counts(units, len(units), 0)()
    idx_set = set(index_hashes.tolist())
    for r, (gh, gt) in zip(reads, zip(got_hits, got_totals)):
        h, p, _ = mnp.get_minimizer_hashes_and_positions(r, 0, k, w)
        distinct = set(x for x in h.tolist() if x in idx_set)
        assert gt == len(h), (len(r), gt, len(h))
        assert gh == len(distinct), (len(r), gh, len(distinct))


def test_cuckoo_sidecar_roundtrip(tmp_path):
    """A valid sidecar skips the build; stale/mismatched ones are ignored."""
    import os

    rng = np.random.default_rng(41)
    keys = np.unique(rng.integers(0, 2**64, 20_000, dtype=np.uint64))
    idx_file = tmp_path / "x.idx"
    idx_file.write_bytes(b"fake-index-bytes")
    t1 = eng.build_cuckoo_planes(keys, cache_path=str(idx_file))
    assert (tmp_path / "x.idx.cuckoo").exists()
    t2 = eng.build_cuckoo_planes(keys, cache_path=str(idx_file))
    np.testing.assert_array_equal(t1[0], t2[0])
    assert t1[1:] == t2[1:]
    # different key set under the same file -> count mismatch -> rebuild
    t3 = eng.build_cuckoo_planes(keys[:-5], cache_path=str(idx_file))
    assert t3 is not None
    # touching the index invalidates
    os.utime(idx_file, ns=(1, 1))
    t4 = eng.build_cuckoo_planes(keys, cache_path=str(idx_file))
    np.testing.assert_array_equal(t4[0], t1[0])
