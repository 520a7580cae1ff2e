"""Server/client mode tests (mirrors tests/server_tests.rs technique:
real server in-process on an ephemeral port, real client CLI against it)."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from helpers import (
    FRAGMENT_60,
    build_index,
    fastq_ids,
    load_summary,
    random_dna,
    read_output,
    revcomp,
    run_cli,
    write_fasta,
    write_fastq,
)


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("srv")
    genome = random_dna(500)
    ref = tmp / "ref.fa"
    write_fasta(ref, [("frag", FRAGMENT_60), ("genome", genome)])
    idx = tmp / "ref.idx"
    build_index(ref, idx)

    from deacon_tpu.server.app import make_server

    httpd = make_server(str(idx), 0, host="127.0.0.1")
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    addr = f"http://127.0.0.1:{port}"
    # poll until ready (ref: tests/server_tests.rs:19-62)
    for _ in range(20):
        try:
            urllib.request.urlopen(addr + "/", timeout=1)
            break
        except Exception:
            time.sleep(0.1)
    yield {"addr": addr, "idx": idx, "tmp": tmp, "genome": genome}
    httpd.shutdown()
    httpd.server_close()


def test_root_and_header_endpoints(server):
    body = urllib.request.urlopen(server["addr"] + "/").read().decode()
    assert "Index loaded with" in body and "minimizers" in body
    header = json.loads(
        urllib.request.urlopen(server["addr"] + "/index_header").read()
    )
    assert header == {"format_version": 2, "kmer_length": 31, "window_size": 15}
    version = urllib.request.urlopen(server["addr"] + "/index_version").read().decode()
    assert version.startswith(str(server["idx"]) + "@")
    assert len(version.split("@")[1]) == 64


def test_client_matches_local_filter(server):
    tmp = server["tmp"]
    reads = tmp / "reads.fq"
    write_fastq(
        reads,
        [
            ("m_fwd", FRAGMENT_60),
            ("m_rev", revcomp(FRAGMENT_60)),
            ("r1", random_dna(60)),
            ("r2", random_dna(60)),
        ],
    )
    out_local = tmp / "local.fq"
    run_cli(["filter", server["idx"], reads, "-o", out_local, "-a", "1", "-q",
             "--device", "numpy"])
    out_remote = tmp / "remote.fq"
    run_cli(["client", server["addr"], reads, "-o", out_remote, "-a", "1", "-q"])
    assert read_output(out_remote) == read_output(out_local)
    assert fastq_ids(read_output(out_remote)) == ["m_fwd", "m_rev"]


def test_client_deplete_paired(server):
    tmp = server["tmp"]
    r1, r2 = tmp / "c_r1.fq", tmp / "c_r2.fq"
    write_fastq(r1, [("p1/1", FRAGMENT_60), ("p2/1", random_dna(60))])
    write_fastq(r2, [("p1/2", random_dna(60)), ("p2/2", random_dna(60))])
    out = tmp / "c_out.fq"
    run_cli(["client", server["addr"], r1, r2, "-o", out, "-a", "1", "-d", "-q"])
    assert fastq_ids(read_output(out)) == ["p2/1", "p2/2"]


def test_client_summary_has_versioned_index(server):
    tmp = server["tmp"]
    reads = tmp / "s_reads.fq"
    write_fastq(reads, [("m", FRAGMENT_60)])
    summ = tmp / "s.json"
    run_cli(["client", server["addr"], reads, "-o", tmp / "s_out.fq", "-s", summ,
             "-q"])
    s = load_summary(summ)
    assert s["index"].startswith(server["addr"] + ":")
    assert "@" in s["index"]
    assert s["k"] == 31 and s["w"] == 15
    assert s["seqs_in"] == 1 and s["seqs_out"] == 1


def test_client_debug_kmers(server):
    tmp = server["tmp"]
    reads = tmp / "d_reads.fq"
    write_fastq(reads, [("m", FRAGMENT_60)])
    proc = run_cli(["client", server["addr"], reads, "-o", tmp / "d_out.fq",
                    "-a", "1", "--debug"])
    err = proc.stderr.decode()
    assert "DEBUG: m hits=" in err and "keep=true" in err
    # debug k-mers are real 31-mers of the read
    kmers = err.split("kmers=[")[1].split("]")[0].split(",")
    assert all(len(k) == 31 and set(k) <= set("ACGT") for k in kmers if k)


def test_client_interleaved_stdin(server):
    data = (
        f"@p1/1\n{FRAGMENT_60}\n+\n{'I'*60}\n"
        f"@p1/2\n{random_dna(60)}\n+\n{'I'*60}\n"
    ).encode()
    proc = run_cli(["client", server["addr"], "-", "-", "-a", "1", "-q"],
                   stdin_data=data)
    assert fastq_ids(proc.stdout.decode()) == ["p1/1", "p1/2"]


def test_client_server_down():
    proc = run_cli(
        ["client", "http://127.0.0.1:1", "whatever.fq", "-q"], expect_ok=False
    )
    assert proc.returncode != 0
    assert b"Failed to contact server" in proc.stderr


def test_bad_request_rejected(server):
    req = urllib.request.Request(
        server["addr"] + "/should_output_unpaired",
        data=b"{broken json",
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    try:
        urllib.request.urlopen(req, timeout=5)
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_mesh_backed_server_matches_host_probe(server, tmp_path):
    """A server running decisions on a sharded device mesh (--mesh, config 5
    "pod-backed filter service") must answer identically to the host probe."""
    import threading
    import urllib.request as _url

    from deacon_tpu.server.app import make_server

    httpd = make_server(str(server["idx"]), 0, host="127.0.0.1",
                        device="jax", mesh="2x2")
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    addr = f"http://127.0.0.1:{port}"
    try:
        for _ in range(20):
            try:
                _url.urlopen(addr + "/", timeout=1)
                break
            except Exception:
                time.sleep(0.1)
        reads = tmp_path / "mesh_reads.fq"
        write_fastq(
            reads,
            [
                ("m_fwd", FRAGMENT_60),
                ("m_rev", revcomp(FRAGMENT_60)),
                ("r1", random_dna(60)),
                ("r2", random_dna(60)),
            ],
        )
        out_host = tmp_path / "host.fq"
        run_cli(["client", server["addr"], reads, "-o", out_host, "-a", "1", "-q"])
        out_mesh = tmp_path / "mesh.fq"
        run_cli(["client", addr, reads, "-o", out_mesh, "-a", "1", "-q"])
        assert read_output(out_mesh) == read_output(out_host)
        assert fastq_ids(read_output(out_mesh)) == ["m_fwd", "m_rev"]
        # paired decisions through the mesh probe too
        r1, r2 = tmp_path / "m_r1.fq", tmp_path / "m_r2.fq"
        write_fastq(r1, [("p1/1", FRAGMENT_60), ("p2/1", random_dna(60))])
        write_fastq(r2, [("p1/2", random_dna(60)), ("p2/2", random_dna(60))])
        out_p = tmp_path / "mesh_p.fq"
        run_cli(["client", addr, r1, r2, "-o", out_p, "-a", "1", "-d", "-q"])
        assert fastq_ids(read_output(out_p)) == ["p2/1", "p2/2"]
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_client_mesh_pod_is_ignored_with_warning(server, tmp_path):
    """--mesh pod without a local index (client mode) must not crash; the
    flag is ignored with a warning (decisions run on the server)."""
    reads = tmp_path / "mp.fq"
    write_fastq(reads, [("m", FRAGMENT_60), ("x", random_dna(60))])
    out = tmp_path / "mp_out.fq"
    proc = run_cli(["client", server["addr"], reads, "-o", out, "-a", "1",
                    "-q", "--mesh", "pod"])
    assert b"--mesh is ignored in client mode" in proc.stderr
    assert fastq_ids(read_output(out)) == ["m"]


def test_binary_wire_roundtrip():
    """Packed binary frame encode/decode (protocol extension): exact
    structural roundtrip for unpaired and paired batches."""
    from deacon_tpu.server import protocol as pr

    rng = np.random.default_rng(3)
    batch = [
        (
            rng.integers(0, 2**64, int(n), dtype=np.uint64),
            rng.integers(0, 2**32, int(n), dtype=np.uint32),
            bytes(rng.integers(65, 90, int(n) + 30, dtype=np.uint8)),
        )
        for n in rng.integers(0, 50, 7)
    ]
    body = pr.encode_binary_request(batch, 2, 0.01, True, 31, False, False)
    assert pr.is_binary_request(body)
    got, abs_t, rel_t, deplete, k, debug, paired = pr.decode_binary_request(body)
    assert (abs_t, rel_t, deplete, k, debug, paired) == (2, 0.01, True, 31, False)[:5] + (False,)
    for (h, p, s), (h2, p2, s2) in zip(batch, got):
        assert np.array_equal(h, h2) and np.array_equal(p, p2) and s == s2

    pbatch = [
        (h, p, (s[:10], s[10:])) for h, p, s in batch
    ]
    body = pr.encode_binary_request(pbatch, 1, 0.5, False, 21, False, True)
    got, abs_t, rel_t, deplete, k, debug, paired = pr.decode_binary_request(body)
    assert (abs_t, rel_t, deplete, k, paired) == (1, 0.5, False, 21, True)
    for (h, p, ss), (h2, p2, ss2) in zip(pbatch, got):
        assert np.array_equal(h, h2) and ss == ss2

    dec = [(True, 3, 10, []), (False, 0, 7, [])]
    assert pr.decode_binary_response(pr.encode_binary_response(dec)) == dec


def test_binary_wire_against_server(server):
    """The negotiated binary frame must return byte-identical decisions to
    the JSON wire against a live server, and the client must fall back to
    JSON when the server rejects binary."""
    import os

    from deacon_tpu.ops import minimizers_np as mnp
    from deacon_tpu.server.client import RemoteBackend

    genome = server["genome"]
    reads = [(FRAGMENT_60 + genome[:40]).encode(), random_dna(80).encode(), genome[100:200].encode()]
    batch = []
    for s in reads:
        h, p, eff = mnp.get_minimizer_hashes_and_positions(s, 0, 31, 15)
        batch.append((h.astype(np.uint64), p.astype(np.uint32), eff))

    rb = RemoteBackend(server["addr"])
    assert rb._binary is None
    out_bin = rb.decide_unpaired(batch, 31, 2, 0.01, True, False)
    assert rb._binary is True  # negotiated
    rb2 = RemoteBackend(server["addr"])
    rb2._binary = False  # force JSON
    out_json = rb2.decide_unpaired(batch, 31, 2, 0.01, True, False)
    assert out_bin == out_json

    # paired too
    pb = [(batch[0][0], batch[0][1], (reads[0][:40], reads[0][40:]))]
    assert rb.decide_paired(pb, 31, 2, 0.01, True, False) == \
        rb2.decide_paired(pb, 31, 2, 0.01, True, False)

    # env kill-switch
    os.environ["DEACON_WIRE"] = "json"
    try:
        rb3 = RemoteBackend(server["addr"])
        assert rb3._binary is False
    finally:
        del os.environ["DEACON_WIRE"]
