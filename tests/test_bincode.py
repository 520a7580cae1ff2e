"""Round-trip and format tests for the bincode-standard index codec."""

import numpy as np

from deacon_tpu.utils import bincode
from deacon_tpu.index import store


def test_varint_scalar_roundtrip():
    for v in [0, 1, 250, 251, 252, 65535, 65536, 2**32 - 1, 2**32, 2**64 - 1]:
        enc = bincode.encode_uint(v)
        dec, off = bincode.decode_uint(memoryview(enc), 0)
        assert dec == v and off == len(enc)


def test_varint_wire_format():
    # bincode standard: <251 one byte; then 0xFB+u16, 0xFC+u32, 0xFD+u64.
    assert bincode.encode_uint(5) == b"\x05"
    assert bincode.encode_uint(250) == b"\xfa"
    assert bincode.encode_uint(251) == b"\xfb\xfb\x00"
    assert bincode.encode_uint(2**16) == b"\xfc\x00\x00\x01\x00"
    assert bincode.encode_uint(2**32) == b"\xfd\x00\x00\x00\x00\x01\x00\x00\x00"


def test_array_roundtrip_mixed(rng):
    vals = np.concatenate(
        [
            rng.integers(0, 2**64, size=5000, dtype=np.uint64),
            np.arange(300, dtype=np.uint64),  # spans 1-byte and u16 classes
            rng.integers(0, 2**16, size=100, dtype=np.uint64),
            rng.integers(0, 2**32, size=100, dtype=np.uint64),
        ]
    )
    rng.shuffle(vals)
    enc = bincode.encode_u64_array(vals)
    buf = np.frombuffer(enc, dtype=np.uint8)
    dec, pos = bincode.decode_u64_array(buf, 0, vals.size)
    assert pos == buf.size
    np.testing.assert_array_equal(dec, vals)


def test_index_file_roundtrip(tmp_path, rng):
    hashes = rng.integers(0, 2**64, size=1234, dtype=np.uint64)
    header = store.IndexHeader.new(31, 15)
    path = tmp_path / "t.idx"
    store.write_index(hashes, header, path)

    h2, count = store.load_header_and_count(path)
    assert (h2.kmer_length, h2.window_size, h2.format_version) == (31, 15, 2)
    assert count == np.unique(hashes).size

    idx = store.load_index(path)
    np.testing.assert_array_equal(idx.hashes, np.unique(hashes))
    member = idx.contains(hashes[:10])
    assert member.all()
    assert not idx.contains(np.array([], dtype=np.uint64)).size


def test_index_tiny_values_format(tmp_path):
    # Mirrors the reference's create_test_index fixture: 5 small hashes
    # (ref: src/remote_filter.rs:1454-1467). Small values use 1-byte varints.
    header = store.IndexHeader.new(5, 3)
    path = tmp_path / "small.idx"
    store.write_index(np.array([1, 2, 3, 4, 5], dtype=np.uint64), header, path)
    data = path.read_bytes()
    # header(3) + count(1) + five 1-byte hashes + 9-byte provenance trailer
    assert data == bytes([2, 5, 3, 5, 1, 2, 3, 4, 5]) + (
        store.PROVENANCE_MAGIC + bytes([store.SCHEME_DXTP_FMIX32_V1])
    )
    idx = store.load_index(path)
    assert list(idx.hashes) == [1, 2, 3, 4, 5]


def test_bad_format_version(tmp_path):
    path = tmp_path / "bad.idx"
    path.write_bytes(bytes([1, 31, 15, 0]))
    try:
        store.load_index(path)
        raise AssertionError("expected IndexFormatError")
    except store.IndexFormatError:
        pass


def test_large_array_fixed9_fast_path(rng):
    """>=1M all-big values take the parallel fixed-9 native path; must be
    byte-identical to the scalar wire format and roundtrip exactly."""
    vals = rng.integers(2**32, 2**64, 1_200_000, dtype=np.uint64)
    enc = bytes(bincode.encode_u64_array(vals))
    assert len(enc) == 9 * vals.size
    assert enc[0] == 253 and enc[9] == 253
    # element 0 wire check against the scalar encoder
    assert enc[:9] == bytes(bincode.encode_uint(int(vals[0])))
    dec, off = bincode.decode_u64_array(np.frombuffer(enc, np.uint8), 0, vals.size)
    assert off == len(enc)
    assert np.array_equal(dec, vals)


def test_large_array_mixed_fallback(rng):
    """One small value among >=1M forces the scalar fallback on both sides;
    results must stay exact."""
    vals = rng.integers(2**32, 2**64, 1_100_000, dtype=np.uint64)
    vals[517_123] = np.uint64(7)          # 1-byte record
    vals[900_001] = np.uint64(70_000)     # u32 record
    enc = bytes(bincode.encode_u64_array(vals))
    assert len(enc) == 9 * (vals.size - 2) + 1 + 5
    dec, off = bincode.decode_u64_array(np.frombuffer(enc, np.uint8), 0, vals.size)
    assert off == len(enc)
    assert np.array_equal(dec, vals)


def test_large_sort_unique_native(rng):
    """>=65536 values engage the bucketed radix path; must equal np.unique."""
    from deacon_tpu.io.native_loader import native_u64_sort_unique

    vals = rng.integers(0, 2**64, 300_000, dtype=np.uint64)
    vals[::5] = vals[1::5][: vals[::5].size]  # force duplicates
    out = native_u64_sort_unique(vals.copy())
    if out is None:
        import pytest

        pytest.skip("native lib unavailable")
    assert np.array_equal(out, np.unique(vals))
