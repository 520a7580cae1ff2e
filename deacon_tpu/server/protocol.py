"""RPC protocol types, wire-compatible with the reference's JSON schema
(ref: src/server_common.rs:8-58).

UnpairedFilterRequest.input: list of [hashes: [u64], positions: [u32],
seq: [u8]] triples; PairedFilterRequest.input uses seqs: [[u8], ...].
FilterResponse.should_output: list of [keep, hit_count, total, [kmers]].

The client sends pre-hashed minimizers — minimizer computation stays
client-side; the server does set membership + thresholds only.
"""

from __future__ import annotations

import json

import numpy as np


def encode_unpaired_request(
    batch: list[tuple[np.ndarray, np.ndarray, bytes]],
    abs_threshold: int,
    rel_threshold: float,
    deplete: bool,
    kmer_length: int,
    debug: bool,
) -> bytes:
    payload = {
        "input": [
            [h.tolist(), p.tolist(), list(s)] for h, p, s in batch
        ],
        "abs_threshold": abs_threshold,
        "rel_threshold": rel_threshold,
        "deplete": deplete,
        "kmer_length": kmer_length,
        "debug": debug,
    }
    return json.dumps(payload).encode()


def encode_paired_request(
    batch: list[tuple[np.ndarray, np.ndarray, tuple]],
    abs_threshold: int,
    rel_threshold: float,
    deplete: bool,
    kmer_length: int,
    debug: bool,
) -> bytes:
    payload = {
        "input": [
            [h.tolist(), p.tolist(), [list(s) for s in seqs]]
            for h, p, seqs in batch
        ],
        "abs_threshold": abs_threshold,
        "rel_threshold": rel_threshold,
        "deplete": deplete,
        "kmer_length": kmer_length,
        "debug": debug,
    }
    return json.dumps(payload).encode()


def decode_request(body: bytes, paired: bool):
    """Returns (batch, abs, rel, deplete, k, debug) where batch entries are
    (hashes u64 array, positions u32 array, seq bytes or list of seq bytes)."""
    obj = json.loads(body)
    batch = []
    for entry in obj["input"]:
        h = np.asarray(entry[0], dtype=np.uint64)
        p = np.asarray(entry[1], dtype=np.uint32)
        if paired:
            seqs = tuple(bytes(s) for s in entry[2])
        else:
            seqs = bytes(entry[2])
        batch.append((h, p, seqs))
    return (
        batch,
        int(obj["abs_threshold"]),
        float(obj["rel_threshold"]),
        bool(obj["deplete"]),
        int(obj["kmer_length"]),
        bool(obj["debug"]),
    )


def encode_response(decisions) -> bytes:
    return json.dumps(
        {"should_output": [[k, h, t, km] for k, h, t, km in decisions]}
    ).encode()


def decode_response(body: bytes):
    obj = json.loads(body)
    return [
        (bool(k), int(h), int(t), list(km))
        for k, h, t, km in obj["should_output"]
    ]
