"""Value-range shard loading + presharded pipeline (the memory-lean
multi-host index path, BASELINE config 4): stream-decoded shards must
reassemble exactly, and ShardedPipeline.from_shards must match both the
classic constructor and the NumPy oracle — including empty shards."""

import numpy as np
import pytest

from deacon_tpu.index.store import (
    IndexHeader,
    MinimizerIndex,
    load_index,
    load_index_shard,
    shard_value_range,
    write_index,
)
from deacon_tpu.ops import minimizers_np as mnp
from deacon_tpu.utils import bincode

jax = pytest.importorskip("jax")

RNG = np.random.default_rng(7)
_B = np.frombuffer(b"ACGT", np.uint8)


def rs(n):
    return RNG.choice(_B, size=n).tobytes()


def test_shard_value_ranges_partition():
    n = 5
    lo0, _ = shard_value_range(0, n)
    assert lo0 == 0
    prev_hi = 0
    for i in range(n):
        lo, hi = shard_value_range(i, n)
        assert lo == prev_hi
        prev_hi = hi
    assert prev_hi == 1 << 64


@pytest.mark.parametrize("n_shards", [1, 3, 4])
def test_load_index_shard_reassembles(tmp_path, n_shards):
    hashes = RNG.integers(0, 2**64, 50_000, dtype=np.uint64)
    path = tmp_path / "a.idx"
    write_index(hashes, IndexHeader.new(31, 15), path)
    full = load_index(path).hashes
    parts = []
    total_counts = set()
    for j in range(n_shards):
        header, part, count = load_index_shard(path, j, n_shards, chunk=7_001)
        assert header.kmer_length == 31 and header.window_size == 15
        total_counts.add(count)
        lo, hi = shard_value_range(j, n_shards)
        if part.size:
            assert int(part.min()) >= lo and int(part.max()) < hi
            assert (np.diff(part) > 0).all()  # sorted unique
        parts.append(part)
    assert total_counts == {full.size}
    assert np.array_equal(np.concatenate(parts), full)


def test_load_index_shard_unsorted_reference_style_file(tmp_path):
    # reference-written files stream FxHashSet iteration order (arbitrary,
    # with no duplicates; we also tolerate duplicates)
    vals = RNG.integers(0, 2**64, 10_000, dtype=np.uint64)
    vals = np.concatenate([vals, vals[:100]])  # dupes
    RNG.shuffle(vals)
    path = tmp_path / "ref.idx"
    with open(path, "wb") as f:
        f.write(bytes([2, 31, 15]))
        f.write(bincode.encode_uint(vals.size))
        f.write(bincode.encode_u64_array(vals))
    full = load_index(path).hashes
    parts = [load_index_shard(path, j, 4, chunk=999)[1] for j in range(4)]
    assert np.array_equal(np.concatenate(parts), full)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_from_shards_matches_classic_and_oracle():
    from deacon_tpu.parallel.sharded import ShardedPipeline, make_mesh

    genome = rs(3000)
    idx_hashes = np.unique(mnp.compute_minimizer_hashes(genome, 31, 15))
    index = MinimizerIndex(IndexHeader.new(31, 15), idx_hashes)
    mesh = make_mesh(2, 4)
    n_shard = 4
    shards = []
    for j in range(n_shard):
        lo, hi = shard_value_range(j, n_shard)
        sel = idx_hashes[(idx_hashes >= np.uint64(lo))
                         & (idx_hashes <= np.uint64(hi - 1))]
        shards.append(np.sort(sel))

    classic = ShardedPipeline(idx_hashes, 31, 15, mesh,
                              row_len=256, rows_per_shard=16)
    pre = ShardedPipeline.from_shards(shards, 31, 15, mesh,
                                      row_len=256, rows_per_shard=16)
    seqs = [genome[100:250], rs(150), genome[0:60],
            genome[500:1200]] + [genome[i * 53 : i * 53 + 140] for i in range(8)]
    hc, tc = classic.counts_single(seqs, 0)
    hp, tp = pre.counts_single(seqs, 0)
    assert np.array_equal(hc, hp) and np.array_equal(tc, tp)
    for i, s in enumerate(seqs):
        h, _, _ = mnp.get_minimizer_hashes_and_positions(s, 0, 31, 15)
        oh = int(np.unique(h[index.contains(h)]).size)
        assert (hp[i], tp[i]) == (oh, h.size), f"seq {i}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_from_shards_empty_shards_exact():
    """Indexes concentrated in one value range leave other shards empty;
    the pad filler must never report membership (n_valid masking)."""
    from deacon_tpu.parallel.sharded import ShardedPipeline, make_mesh

    mesh = make_mesh(2, 4)
    # all members in shard 0's range; probes include near-miss values and
    # the all-ones value that naive sentinel padding would false-positive
    members = np.sort(RNG.integers(0, 2**60, 500, dtype=np.uint64))
    shards = [members, np.zeros(0, np.uint64), np.zeros(0, np.uint64),
              np.zeros(0, np.uint64)]
    pre = ShardedPipeline.from_shards(shards, 31, 15, mesh,
                                      row_len=256, rows_per_shard=16,
                                      pad_to=600)
    # drive the probe directly through a sequence batch: build an index of
    # these members' hashes is impossible (they aren't minimizer hashes),
    # so probe via DeviceHashProbe mesh variant instead
    from deacon_tpu.ops.engine import DeviceHashProbe

    probe = DeviceHashProbe(members, mesh=mesh)
    queries = np.concatenate([
        members[::17],
        RNG.integers(2**60, 2**64 - 1, 200, dtype=np.uint64),
        np.array([2**64 - 1, 0], dtype=np.uint64),
    ])
    got = probe(queries)
    want = np.isin(queries, members)
    assert np.array_equal(got, want)
    # and the presharded pipeline compiles/runs with the empty shards
    hits, totals = pre.counts_single([rs(300)], 0)
    assert totals[0] > 0 and hits[0] == 0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_from_shards_loaded_from_file_matches_full(tmp_path):
    """End-to-end config-4 path: index file -> per-shard streaming load ->
    presharded mesh pipeline == classic full-load pipeline."""
    from deacon_tpu.parallel.sharded import ShardedPipeline, make_mesh

    genome = rs(4000)
    hashes = mnp.compute_minimizer_hashes(genome, 31, 15)
    path = tmp_path / "g.idx"
    write_index(hashes, IndexHeader.new(31, 15), path)

    mesh = make_mesh(2, 4)
    shards = [load_index_shard(path, j, 4)[1] for j in range(4)]
    pre = ShardedPipeline.from_shards(shards, 31, 15, mesh,
                                      row_len=256, rows_per_shard=16,
                                      max_run=16)
    classic = ShardedPipeline(load_index(path).hashes, 31, 15, mesh,
                              row_len=256, rows_per_shard=16)
    seqs = [genome[i * 91 : i * 91 + 200] for i in range(12)] + [rs(200)]
    hp, tp = pre.counts_single(seqs, 0)
    hc, tc = classic.counts_single(seqs, 0)
    assert np.array_equal(hp, hc) and np.array_equal(tp, tc)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_from_shards_rejects_position_key_overflow():
    """Global padded size beyond the non-negative-i32 position key space
    would overflow upper-shard positions (position-keyed distinct
    counting); must refuse with an actionable message. pad_to=2^29 per
    shard x 4 shards = 2^31 total clears the ~2^31 limit while a
    panhuman-union-scale 2.75e8 x 4 = 1.1e9 passes validation (the round-2
    2^30 ceiling sat one index-union below the flagship use-case)."""
    from deacon_tpu.parallel.sharded import ShardedPipeline, make_mesh

    mesh = make_mesh(2, 4)
    shards = [np.arange(10, dtype=np.uint64) + j * 1000 for j in range(4)]
    with pytest.raises(ValueError, match="position-keyed"):
        ShardedPipeline.from_shards(shards, 31, 15, mesh, pad_to=1 << 29)
    # 1.1e9 global padded entries (panhuman ∪ panmouse scale) must pass the
    # size validation (planes for tiny shards; pad region masked by n_valid
    # is never materialized at pad_to length — only validated arithmetic).
    # Actually materializing pad_to-length planes would need ~9 GB, so this
    # asserts the validator's arithmetic only via a direct call.
    from deacon_tpu.ops.engine import PROBE_POSITION_LIMIT

    assert 4 * 275_000_000 < PROBE_POSITION_LIMIT


def test_probe_planes_limit_fail_fast():
    """build_probe_planes must reject indexes past the position-key limit
    BEFORE allocating planes (zero-copy broadcast keeps this test cheap)."""
    from deacon_tpu.ops.engine import PROBE_POSITION_LIMIT, build_probe_planes

    fake = np.broadcast_to(np.uint64(1), (PROBE_POSITION_LIMIT,))
    with pytest.raises(ValueError, match="position-keyed"):
        build_probe_planes(fake)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_regeometry_and_overflow_regrow():
    """A unit bigger than the batch geometry must regrow the geometry (pod
    mode has no host fallback) and still produce oracle-exact counts."""
    from deacon_tpu.filter.engine import ShardedDecider
    from deacon_tpu.ops.engine import BudgetOverflow
    from deacon_tpu.parallel.sharded import ShardedPipeline, make_mesh

    genome = rs(6000)
    idx_hashes = np.unique(mnp.compute_minimizer_hashes(genome, 31, 15))
    index = MinimizerIndex(IndexHeader.new(31, 15), idx_hashes)
    mesh = make_mesh(2, 4)
    pipe = ShardedPipeline(idx_hashes, 31, 15, mesh,
                           row_len=256, rows_per_shard=2)
    long_read = genome[:2500]  # needs ~12 rows at L=256 > Rs=2
    with pytest.raises(BudgetOverflow):
        pipe.counts_single([long_read], 0)

    dec = ShardedDecider.__new__(ShardedDecider)
    dec.pipe = pipe
    dec.fallback = None
    dec._overflow = BudgetOverflow
    hits, totals = dec._counts_with_regrow("counts_single", [long_read], 0)
    assert dec.pipe.Rs > 2
    h, _, _ = mnp.get_minimizer_hashes_and_positions(long_read, 0, 31, 15)
    oh = int(np.unique(h[index.contains(h)]).size)
    assert (hits[0], totals[0]) == (oh, h.size)
