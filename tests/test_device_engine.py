"""Device engine (JAX) vs NumPy oracle: bit-identical hit/total counts.

Runs on the CPU backend with small tile classes to bound compile time.
"""

import numpy as np
import pytest

from deacon_tpu.index.store import IndexHeader, MinimizerIndex
from deacon_tpu.ops import minimizers_np as mnp

jax = pytest.importorskip("jax")

from deacon_tpu.ops.engine import DevicePipeline  # noqa: E402

RNG = np.random.default_rng(77)
_B = np.frombuffer(b"ACGT", np.uint8)


def rs(n):
    return RNG.choice(_B, size=n).tobytes()


GENOME = rs(2000)
IDX_HASHES = np.unique(mnp.compute_minimizer_hashes(GENOME, 31, 15))
INDEX = MinimizerIndex(IndexHeader.new(31, 15), IDX_HASHES)
TILES = ((64, 32), (160, 16))  # tiny static shapes; second class exercises chunking


@pytest.fixture(scope="module")
def pipe():
    return DevicePipeline(IDX_HASHES, 31, 15, tiles=TILES)


def oracle_counts_single(seq):
    h, _, _ = mnp.get_minimizer_hashes_and_positions(seq, 0, 31, 15)
    member = INDEX.contains(h)
    return int(np.unique(h[member]).size), int(h.size)


def test_single_matrix(pipe):
    seqs = [
        GENOME[100:150],          # match, fits smallest tile
        rs(60),                    # no match
        GENOME[0:60],              # match
        rs(40),                    # shorter than l: single-window rule
        b"A" * 100,                # homopolymer
        GENOME[300:800],           # long -> chunked rows (L=160, stride 116)
        GENOME[50:80],             # < k -> zero minimizers
        GENOME[200:260] + b"N" + GENOME[261:320],  # N handling
        b"",                       # empty
    ]
    hits, totals = pipe.counts_single(seqs, 0)
    for i, s in enumerate(seqs):
        oh, ot = oracle_counts_single(s)
        assert (hits[i], totals[i]) == (oh, ot), f"seq {i} (len {len(s)})"


def test_single_prefix_length(pipe):
    seqs = [rs(60) + GENOME[100:160], GENOME[100:160] + rs(60)]
    hits, totals = pipe.counts_single(seqs, 60)
    for i, s in enumerate(seqs):
        h, _, _ = mnp.get_minimizer_hashes_and_positions(s, 60, 31, 15)
        member = INDEX.contains(h)
        assert hits[i] == int(np.unique(h[member]).size)
        assert totals[i] == h.size


def test_paired_union_semantics(pipe):
    pairs = [
        (GENOME[100:160], GENOME[100:160]),  # identical mates: shared counted once
        (rs(60), GENOME[400:460]),           # mate-OR
        (b"A" * 60, b"A" * 60),
        (GENOME[0:45], rs(33)),              # short mates
    ]
    hits, totals = pipe.counts_paired(pairs, 0)
    for i, (s1, s2) in enumerate(pairs):
        h, _, _ = mnp.get_paired_minimizer_hashes_and_positions(s1, s2, 0, 31, 15)
        member = INDEX.contains(h)
        oh = int(np.unique(h[member]).size)
        assert (hits[i], totals[i]) == (oh, h.size), f"pair {i}"


def test_device_xxh3_matches_host(rng):
    # device hashing is pair-based; exactness covered in tests/test_u64pair.py
    import jax.numpy as jnp

    from deacon_tpu.ops import u64pair
    from deacon_tpu.utils.xxh3 import xxh3_64_u64

    v = rng.integers(0, 2**64, size=256, dtype=np.uint64)
    lo = jnp.asarray((v & np.uint64(0xFFFFFFFF)).astype(np.uint32))
    hi = jnp.asarray((v >> np.uint64(32)).astype(np.uint32))
    rlo, rhi = u64pair.xxh3_64_pair_u64(lo, hi)
    got = np.asarray(rlo).astype(np.uint64) | (
        np.asarray(rhi).astype(np.uint64) << np.uint64(32)
    )
    np.testing.assert_array_equal(got, xxh3_64_u64(v))


def test_many_random_reads_vs_oracle(pipe):
    seqs = []
    for _ in range(40):
        n = int(RNG.integers(31, 150))
        if RNG.random() < 0.5:
            s = int(RNG.integers(0, len(GENOME) - n))
            seqs.append(GENOME[s : s + n])
        else:
            seqs.append(rs(n))
    hits, totals = pipe.counts_single(seqs, 0)
    for i, s in enumerate(seqs):
        oh, ot = oracle_counts_single(s)
        assert (hits[i], totals[i]) == (oh, ot), f"read {i} len {len(s)}"


def test_cuckoo_fallback_warns(monkeypatch, capsys):
    """Crossing the cuckoo probe ceiling must warn on stderr naming the
    consequence and the DEACON_PROBE knob (r3 VERDICT item 5) — and the
    explicit DEACON_PROBE=sorted opt-out must stay silent."""
    from deacon_tpu.ops import engine as eng

    monkeypatch.setattr(eng, "build_cuckoo_planes", lambda *a, **k: None)
    DevicePipeline(IDX_HASHES, 31, 15, tiles=TILES)
    err = capsys.readouterr().err
    assert "cuckoo probe ceiling" in err and "DEACON_PROBE" in err

    monkeypatch.setenv("DEACON_PROBE", "sorted")
    DevicePipeline(IDX_HASHES, 31, 15, tiles=TILES)
    assert "ceiling" not in capsys.readouterr().err
