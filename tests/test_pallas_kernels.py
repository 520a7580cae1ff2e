"""Fused Pallas S1+S2 kernel == XLA stages (bit-exact).

The Mosaic kernel itself only runs compiled on TPU; here it runs in
interpreter mode, which executes the identical kernel math. The integrated
engine path (DEACON_PALLAS=interpret) is exercised against the NumPy oracle
through the DevicePipeline.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from deacon_tpu.ops import engine as eng  # noqa: E402
from deacon_tpu.ops import minimizers_np as mnp  # noqa: E402
from deacon_tpu.ops.pallas_kernels import values_argmin_fused  # noqa: E402


@pytest.mark.parametrize(
    "k,w",
    [
        (31, 15), (32, 15), (21, 7), (5, 3), (16, 16), (31, 2), (2, 15),
        # wide path: 4 value limbs (the reference's u128 k-mers)
        (41, 15), (33, 15), (48, 7), (56, 9),
    ],
)
def test_fused_matches_xla_stages(k, w):
    rng = np.random.default_rng(k * 100 + w)
    R, L = 8, 512
    codes = rng.integers(0, 4, (R, L)).astype(np.uint8)
    # mix of empty, short, and full rows
    mlen = rng.integers(0, L - k + 2, (R,)).astype(np.int32)
    mlen[0] = 0
    mlen[1] = 1
    mlen[-1] = L - k + 1
    out = eng._stage_values(jnp.asarray(codes), jnp.asarray(mlen), k=k)
    *limbs, keys = out
    wp = eng._stage_argmin(keys, w=w)
    limbs2, wp2 = values_argmin_fused(
        jnp.asarray(codes), jnp.asarray(mlen), k=k, w=w, interpret=True
    )
    assert len(limbs) == len(limbs2)
    for a, b in zip(limbs, limbs2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(wp), np.asarray(wp2))


def test_engine_pipeline_with_pallas_interpret(monkeypatch):
    # integrated path: DevicePipeline decisions with the fused kernel must
    # match the NumPy oracle exactly
    monkeypatch.setenv("DEACON_PALLAS", "interpret")
    k, w = 31, 15
    rng = np.random.default_rng(0)
    alpha = np.frombuffer(b"ACGTN", dtype=np.uint8)
    genome = rng.choice(alpha[:4], 3000).tobytes()
    index_hashes = np.unique(mnp.compute_minimizer_hashes(genome, k, w, 0.0))
    reads = []
    for i in range(12):
        n = int(rng.integers(0, 400))
        reads.append(rng.choice(alpha, n).tobytes())
    for i in range(6):
        s = int(rng.integers(0, 2500))
        reads.append(genome[s : s + 300])
    pipe = eng.DevicePipeline(index_hashes, k, w)
    units = [(i, ((0, r),)) for i, r in enumerate(reads)]
    resolve = pipe.launch_counts(units, len(units), prefix_length=0)
    got_hits, got_totals = resolve()
    idx_set = set(index_hashes.tolist())
    for r, (gh, gt) in zip(reads, zip(got_hits, got_totals)):
        h, _, _ = mnp.get_minimizer_hashes_and_positions(r, 0, k, w)
        distinct = set(x for x in h.tolist() if x in idx_set)
        assert gt == len(h), (len(r), gt, len(h))
        assert gh == len(distinct), (len(r), gh, len(distinct))


@pytest.mark.parametrize("k,w", [(31, 15), (21, 7), (41, 15), (56, 9)])
def test_select_fused_matches_xla_emulation(k, w):
    """Kernel v2 (values_select_fused: selection + argmin + flags + value
    propagation in one kernel) must match the XLA emulation path (v1 stages
    + flat gather) bit-for-bit, including dirty bases and short rows."""
    from deacon_tpu.ops.pallas_kernels import values_select_fused

    rng = np.random.default_rng(3)
    R, L = 16, 640
    codes = rng.integers(0, 4, (R, L)).astype(np.uint8)
    validb = rng.random((R, L)) > 0.05
    mlen = rng.integers(-1, L - k + 2, (R,)).astype(np.int32)
    mlen[0] = L - k + 1
    mlen[1] = 0
    allow_short = rng.random(R) > 0.5
    l = k + w - 1
    mlen[2] = l - k  # short read: single window via allow_short
    allow_short[2] = True

    want_v, want_wpf = eng._values_select(
        jnp.asarray(codes), jnp.asarray(validb), jnp.asarray(mlen),
        jnp.asarray(allow_short), k=k, w=w,
    )
    got_v, got_wpf = values_select_fused(
        jnp.asarray(codes), jnp.asarray(validb), jnp.asarray(mlen),
        jnp.asarray(allow_short), k=k, w=w, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_wpf), np.asarray(want_wpf))
    # vplanes only matter where a flag selects them; compare at flagged ids
    fsel = (np.asarray(want_wpf).reshape(-1) >> 16) != 0
    for a, b in zip(got_v, want_v):
        np.testing.assert_array_equal(
            np.asarray(a).reshape(-1)[fsel], np.asarray(b).reshape(-1)[fsel]
        )


def test_engine_pipeline_with_pallas_v2_interpret(monkeypatch):
    """Integrated DevicePipeline decisions through the v2 kernel (interpret
    mode) must match the NumPy oracle exactly."""
    monkeypatch.setenv("DEACON_PALLAS", "interpret")
    k, w = 31, 15
    rng = np.random.default_rng(9)
    alpha = np.frombuffer(b"ACGTNryK", dtype=np.uint8)
    genome = rng.choice(alpha[:4], 3000).tobytes()
    index_hashes = np.unique(mnp.compute_minimizer_hashes(genome, k, w, 0.0))
    reads = []
    for i in range(12):
        n = int(rng.integers(0, 400))
        reads.append(rng.choice(alpha, n).tobytes())
    for i in range(6):
        s = int(rng.integers(0, 2500))
        reads.append(genome[s : s + 300])
    pipe = eng.DevicePipeline(index_hashes, k, w)
    units = [(i, ((0, r),)) for i, r in enumerate(reads)]
    resolve = pipe.launch_counts(units, len(units), prefix_length=0)
    got_hits, got_totals = resolve()
    idx_set = set(index_hashes.tolist())
    for r, (gh, gt) in zip(reads, zip(got_hits, got_totals)):
        h, _, _ = mnp.get_minimizer_hashes_and_positions(r, 0, k, w)
        distinct = set(x for x in h.tolist() if x in idx_set)
        assert gt == len(h), (len(r), gt, len(h))
        assert gh == len(distinct), (len(r), gh, len(distinct))
