"""Sharded multi-chip pipeline on a virtual 8-device CPU mesh: results must
match the NumPy oracle (index sharded over 'shard', rows over 'data',
membership merged via psum)."""

import numpy as np
import pytest

from deacon_tpu.index.store import IndexHeader, MinimizerIndex
from deacon_tpu.ops import minimizers_np as mnp

jax = pytest.importorskip("jax")

RNG = np.random.default_rng(123)
_B = np.frombuffer(b"ACGT", np.uint8)


def rs(n):
    return RNG.choice(_B, size=n).tobytes()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_counts_match_oracle():
    from deacon_tpu.parallel.sharded import ShardedPipeline, make_mesh

    genome = rs(3000)
    idx_hashes = np.unique(mnp.compute_minimizer_hashes(genome, 31, 15))
    index = MinimizerIndex(IndexHeader.new(31, 15), idx_hashes)

    mesh = make_mesh(2, 4)
    pipe = ShardedPipeline(idx_hashes, 31, 15, mesh, row_len=256, rows_per_shard=16)

    seqs = [
        genome[100:250], rs(150), genome[0:60], b"A" * 80,
        genome[500:1200],  # chunked
        rs(45), genome[40:70],  # short/below-k
    ] + [genome[i * 37 : i * 37 + 120] for i in range(10)]
    hits, totals = pipe.counts_single(seqs, 0)
    for i, s in enumerate(seqs):
        h, _, _ = mnp.get_minimizer_hashes_and_positions(s, 0, 31, 15)
        member = index.contains(h)
        oh = int(np.unique(h[member]).size)
        assert (hits[i], totals[i]) == (oh, h.size), f"seq {i}"

    pairs = [(genome[100:250], genome[100:250]), (rs(100), genome[700:850])]
    hp, tp = pipe.counts_paired(pairs, 0)
    for i, (s1, s2) in enumerate(pairs):
        h, _, _ = mnp.get_paired_minimizer_hashes_and_positions(s1, s2, 0, 31, 15)
        member = index.contains(h)
        oh = int(np.unique(h[member]).size)
        assert (hp[i], tp[i]) == (oh, h.size), f"pair {i}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_paired_matches_oracle():
    from deacon_tpu.parallel.sharded import ShardedPipeline, make_mesh

    genome = rs(2500)
    idx_hashes = np.unique(mnp.compute_minimizer_hashes(genome, 31, 15))
    index = MinimizerIndex(IndexHeader.new(31, 15), idx_hashes)
    pipe = ShardedPipeline(
        idx_hashes, 31, 15, make_mesh(4, 2), row_len=256, rows_per_shard=16
    )
    pairs = [
        (genome[100:250], genome[100:250]),  # shared minimizers count once
        (rs(150), genome[300:450]),          # one matching mate
        (rs(120), rs(130)),
        (genome[50:95], b"A" * 40),
    ]
    hits, totals = pipe.counts_paired(pairs, 0)
    for i, (s1, s2) in enumerate(pairs):
        h, _, _ = mnp.get_paired_minimizer_hashes_and_positions(s1, s2, 0, 31, 15)
        member = index.contains(h)
        assert hits[i] == np.unique(h[member]).size, f"pair {i}"
        assert totals[i] == h.size, f"pair {i}"


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_cli_filter_mesh(tmp_path):
    """--mesh 2x4 end-to-end through the CLI on the virtual device mesh."""
    from helpers import run_cli, write_fasta, write_fastq, random_dna

    genome = random_dna(4000)
    write_fasta(tmp_path / "host.fa", [("chr", genome)])
    run_cli(["index", "build", tmp_path / "host.fa", "-o", tmp_path / "h.idx", "-q"])
    reads = [
        ("host1", genome[500:800]),
        ("rand1", random_dna(300)),
        ("host2", genome[1000:1300]),
        ("rand2", random_dna(300)),
    ]
    write_fastq(tmp_path / "reads.fq", reads)
    run_cli([
        "filter", tmp_path / "h.idx", tmp_path / "reads.fq",
        "-o", tmp_path / "out.fq", "--mesh", "2x4", "-q",
    ])
    out = (tmp_path / "out.fq").read_text()
    assert "@host1" in out and "@host2" in out
    assert "rand1" not in out and "rand2" not in out


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_radix_counts_match_oracle():
    """Arch-5 radix probe under shard_map (row-sharded byte-plane table,
    psum of per-shard hit histograms) must match the oracle exactly."""
    from deacon_tpu.parallel.sharded import ShardedPipeline, make_mesh

    genome = rs(600_000)
    idx_hashes = np.unique(mnp.compute_minimizer_hashes(genome, 31, 15))
    index = MinimizerIndex(IndexHeader.new(31, 15), idx_hashes)

    mesh = make_mesh(4, 2)
    pipe = ShardedPipeline(
        idx_hashes, 31, 15, mesh, row_len=256, rows_per_shard=64
    )
    assert pipe._radix is not None, "radix path not selected"

    seqs = []
    for _ in range(40):
        n = int(RNG.integers(31, 600))
        if RNG.random() < 0.5:
            s = int(RNG.integers(0, len(genome) - n))
            seqs.append(genome[s:s + n])
        else:
            seqs.append(rs(n))
    seqs.append(b"A" * 80)
    hits, totals = pipe.counts_single(seqs)
    for i, s in enumerate(seqs):
        h, _, _ = mnp.get_minimizer_hashes_and_positions(s, 0, 31, 15)
        m = index.contains(h)
        assert (hits[i], totals[i]) == (
            int(np.unique(h[m]).size), int(h.size)
        ), (i, len(s))

    # paired units across data shards
    pairs = [(genome[:100], genome[60:160]), (rs(90), genome[300:400])]
    ph, pt = pipe.counts_paired(pairs)
    for i, (a, b) in enumerate(pairs):
        ha, _, _ = mnp.get_minimizer_hashes_and_positions(a, 0, 31, 15)
        hb, _, _ = mnp.get_minimizer_hashes_and_positions(b, 0, 31, 15)
        hs = np.concatenate([ha, hb])
        m = index.contains(hs)
        assert (ph[i], pt[i]) == (
            int(np.unique(hs[m]).size), int(ha.size + hb.size)
        ), i


def test_sharded_radix_spilled_index_matches_oracle():
    """r5 spill side table under shard_map: the spill is REPLICATED and a
    match counts only on the shard owning the query's primary bucket, so
    the psum of per-shard histograms stays exact — including for a read
    whose minimizer was forced into the spill."""
    from deacon_tpu.parallel.sharded import ShardedPipeline, make_mesh
    from tests.test_radix_probe import _index_with_spill
    from deacon_tpu.ops import radix_probe as rp

    genome = rs(400_000)
    allk, h = _index_with_spill(genome)
    t = rp.build_radix_table(allk)
    assert t.sp > 0
    index = MinimizerIndex(IndexHeader.new(31, 15), allk)

    mesh = make_mesh(4, 2)
    pipe = ShardedPipeline(
        allk, 31, 15, mesh, row_len=256, rows_per_shard=64
    )
    assert pipe._radix is not None and pipe._radix[4] == t.sp

    seqs = []
    for _ in range(40):
        n = int(RNG.integers(31, 600))
        if RNG.random() < 0.5:
            s = int(RNG.integers(0, len(genome) - n))
            seqs.append(genome[s:s + n])
        else:
            seqs.append(rs(n))
    hits, totals = pipe.counts_single(seqs)
    for i, s in enumerate(seqs):
        hh, _, _ = mnp.get_minimizer_hashes_and_positions(s, 0, 31, 15)
        m = index.contains(hh)
        assert (hits[i], totals[i]) == (
            int(np.unique(hh[m]).size), int(hh.size)
        ), (i, len(s))
