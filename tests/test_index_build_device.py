"""Device index-build extraction vs NumPy oracle (set equality)."""

import numpy as np
import pytest

from deacon_tpu.ops import minimizers_np as mnp

jax = pytest.importorskip("jax")

from deacon_tpu.ops.engine import IndexBuildPipeline  # noqa: E402

RNG = np.random.default_rng(11)
_B = np.frombuffer(b"ACGT", np.uint8)


def rs(n):
    return RNG.choice(_B, size=n).tobytes()


SEQS = [
    rs(500),
    b"A" * 200 + rs(300),
    rs(60),
    rs(20),                       # below k
    rs(100) + b"N" + rs(100),     # invalid base
    rs(5000),                     # chunked contig
    b"RYKMWSN" * 30 + rs(100),    # IUPAC soup
]


@pytest.mark.parametrize("entropy", [0.0, 0.01, 0.5, 0.9])
def test_extract_matches_oracle(entropy):
    # low-complexity fixtures make the entropy filter decisive: the v4
    # chain computes it from the canonical VALUE limbs (SWAR popcounts,
    # r3 VERDICT item 7) and must stay set-equal to the byte oracle
    seqs = SEQS + [
        b"ACAC" * 25 + rs(200),   # 2-base repeat (entropy ~0.5)
        b"ACG" * 30 + rs(200),    # 3-base repeat (entropy ~0.79)
        b"AATT" * 20 + rs(200),   # 2-base repeat, AT
    ]
    pipe = IndexBuildPipeline(
        31, 15, entropy_threshold=entropy, row_len=1024, rows_per_batch=8
    )
    got = pipe.extract_batch(seqs)
    for i, s in enumerate(seqs):
        oracle = mnp.compute_minimizer_hashes(s, 31, 15, entropy)
        assert set(got[i].tolist()) == set(oracle.tolist()), f"seq {i}"


def test_extract_k41():
    pipe = IndexBuildPipeline(41, 15, row_len=1024, rows_per_batch=8)
    got = pipe.extract_batch(SEQS[:3])
    for i, s in enumerate(SEQS[:3]):
        oracle = mnp.compute_minimizer_hashes(s, 41, 15)
        assert set(got[i].tolist()) == set(oracle.tolist()), f"seq {i}"
