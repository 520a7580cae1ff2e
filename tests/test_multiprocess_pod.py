"""True multi-process pod test: two jax.distributed processes (Gloo over
localhost), index value-range-sharded so each process decodes and holds only
its half, reads probed cooperatively, results identical on both processes
and equal to the oracle (asserted inside tools/pod_worker.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "pod_worker.py")


def test_two_process_pod(tmp_path):
    rng = np.random.default_rng(99)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), 3000).astype(np.uint8)
    gpath = tmp_path / "g.fa"
    with open(gpath, "wb") as f:
        f.write(b">g\n" + genome.tobytes() + b"\n")

    from deacon_tpu.index.store import IndexHeader, write_index
    from deacon_tpu.ops import minimizers_np as mnp

    idx = tmp_path / "g.idx"
    write_index(
        mnp.compute_minimizer_hashes(genome.tobytes(), 31, 15),
        IndexHeader.new(31, 15),
        idx,
    )

    port = str(20000 + (os.getpid() % 10000))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu itself
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", port, str(idx), str(gpath)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"POD_OK pid={i}" in out, f"proc {i} output:\n{out}"
    # both processes saw the same replicated result
    line0 = [l for l in outs[0].splitlines() if l.startswith("POD_OK")][0]
    line1 = [l for l in outs[1].splitlines() if l.startswith("POD_OK")][0]
    assert line0.split("hits=")[1] == line1.split("hits=")[1]


def test_two_process_pod_cli(tmp_path):
    """Full `filter --mesh pod` CLI across two jax.distributed ranks: both
    ranks stream the same reads, each holds half the index, and both write
    byte-identical output equal to a single-process filter run."""
    rng = np.random.default_rng(5)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), 4000).astype(np.uint8)
    gpath = tmp_path / "g.fa"
    with open(gpath, "wb") as f:
        f.write(b">g\n" + genome.tobytes() + b"\n")

    from deacon_tpu.index.store import IndexHeader, write_index
    from deacon_tpu.ops import minimizers_np as mnp

    idx = tmp_path / "g.idx"
    write_index(
        mnp.compute_minimizer_hashes(genome.tobytes(), 31, 15),
        IndexHeader.new(31, 15),
        idx,
    )
    g = genome.tobytes()
    reads = tmp_path / "reads.fq"
    with open(reads, "wb") as f:
        for i in range(30):
            s = i * 113
            seq = g[s : s + 150]
            f.write(b"@m%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))
        for i in range(30):
            seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 150))
            f.write(b"@x%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))

    # single-process truth
    out_ref = tmp_path / "ref.fq"
    env1 = dict(os.environ)
    env1["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "deacon_tpu", "filter", str(idx), str(reads),
         "-o", str(out_ref), "--deplete", "-q"],
        capture_output=True, env=env1, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr.decode()

    port = str(21000 + (os.getpid() % 9000))
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            # scrub the deployment's axon site hook: it forces the tunneled
            # TPU platform regardless of JAX_PLATFORMS (conftest.py note)
            "PYTHONPATH": REPO,
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "DEACON_COORD": f"127.0.0.1:{port}",
            "DEACON_NUM_PROC": "2",
            "DEACON_PROC_ID": str(i),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "deacon_tpu", "filter", str(idx),
             str(reads), "-o", str(tmp_path / f"pod{i}.fq"),
             "--deplete", "-q", "--mesh", "pod"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=REPO,
        ))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out}"
    ref = out_ref.read_bytes()
    assert (tmp_path / "pod0.fq").read_bytes() == ref
    assert (tmp_path / "pod1.fq").read_bytes() == ref
    assert ref.count(b"@x") == 30 and ref.count(b"@m") == 0


def test_two_process_pod_server(tmp_path):
    """`server --mesh pod` across two jax.distributed ranks (VERDICT r2
    item 4): rank 0 serves HTTP with each probe broadcast to rank 1 and
    psum-merged across the process-spanning shard axis; each rank
    stream-decodes only its own index shard. A real `client` run through
    the pod server must match a local filter run."""
    import time
    import urllib.request

    rng = np.random.default_rng(83)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), 3000).astype(np.uint8)

    from deacon_tpu.index.store import IndexHeader, write_index
    from deacon_tpu.ops import minimizers_np as mnp

    idx = tmp_path / "g.idx"
    write_index(
        mnp.compute_minimizer_hashes(genome.tobytes(), 31, 15),
        IndexHeader.new(31, 15),
        idx,
    )
    g = genome.tobytes()
    reads = tmp_path / "reads.fq"
    with open(reads, "wb") as f:
        for i in range(10):
            seq = g[i * 200 : i * 200 + 150]
            f.write(b"@m%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))
        for i in range(10):
            seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 150))
            f.write(b"@x%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))

    env1 = dict(os.environ)
    env1["JAX_PLATFORMS"] = "cpu"
    out_ref = tmp_path / "ref.fq"
    r = subprocess.run(
        [sys.executable, "-m", "deacon_tpu", "filter", str(idx), str(reads),
         "-o", str(out_ref), "--deplete", "-q"],
        capture_output=True, env=env1, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr.decode()

    coord_port = str(24000 + (os.getpid() % 8000))
    http_port = 25000 + (os.getpid() % 8000)
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": REPO,
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "DEACON_COORD": f"127.0.0.1:{coord_port}",
            "DEACON_NUM_PROC": "2",
            "DEACON_PROC_ID": str(i),
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "deacon_tpu", "server", str(idx),
             "-p", str(http_port), "--host", "127.0.0.1", "--mesh", "pod"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=REPO,
        ))
    try:
        addr = f"http://127.0.0.1:{http_port}"
        deadline = time.monotonic() + 120
        while True:
            try:
                with urllib.request.urlopen(addr + "/", timeout=2) as resp:
                    assert b"minimizers" in resp.read()
                break
            except Exception:
                if time.monotonic() > deadline:
                    for q in procs:
                        q.kill()
                    outs = [p.communicate()[0].decode() for p in procs]
                    raise AssertionError(
                        "pod server never came up:\n" + "\n---\n".join(outs)
                    )
                if any(p.poll() is not None for p in procs):
                    outs = [p.communicate()[0].decode() for p in procs]
                    raise AssertionError(
                        "pod server rank exited early:\n" + "\n---\n".join(outs)
                    )
                time.sleep(0.25)

        out = tmp_path / "pod_client.fq"
        r = subprocess.run(
            [sys.executable, "-m", "deacon_tpu", "client", addr, str(reads),
             "-o", str(out), "--deplete", "-q"],
            capture_output=True, env=env1, cwd=REPO, timeout=240,
        )
        assert r.returncode == 0, r.stderr.decode()
        assert out.read_bytes() == out_ref.read_bytes()
        assert out.read_bytes().count(b"@x") == 10
    finally:
        for p in procs:
            p.kill()
        for p in procs:
            p.communicate()


def test_two_process_pod_data_cli(tmp_path):
    """`filter --mesh pod-data` across two jax.distributed ranks: each rank
    streams a DISJOINT record-aligned byte range of the input, filters it on
    a rank-local mesh, and rank 0 concatenates the parts — output and
    summary equal to a single-process run (aggregate reads/s scales with
    ranks; VERDICT r1 item 2)."""
    import json

    rng = np.random.default_rng(17)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), 4000).astype(np.uint8)
    gpath = tmp_path / "g.fa"
    with open(gpath, "wb") as f:
        f.write(b">g\n" + genome.tobytes() + b"\n")

    from deacon_tpu.index.store import IndexHeader, write_index
    from deacon_tpu.ops import minimizers_np as mnp

    idx = tmp_path / "g.idx"
    write_index(
        mnp.compute_minimizer_hashes(genome.tobytes(), 31, 15),
        IndexHeader.new(31, 15),
        idx,
    )
    g = genome.tobytes()
    reads = tmp_path / "reads.fq"
    with open(reads, "wb") as f:
        for i in range(40):
            s = (i * 97) % 3800
            seq = g[s : s + 150]
            f.write(b"@m%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))
        for i in range(40):
            seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 150))
            f.write(b"@x%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))

    # single-process truth
    out_ref = tmp_path / "ref.fq"
    env1 = dict(os.environ)
    env1["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "deacon_tpu", "filter", str(idx), str(reads),
         "-o", str(out_ref), "--deplete", "-q"],
        capture_output=True, env=env1, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr.decode()

    port = str(22000 + (os.getpid() % 9000))
    out = tmp_path / "pod.fq"
    summary = tmp_path / "pod_summary.json"
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            # scrub the deployment's axon site hook: it forces the tunneled
            # TPU platform regardless of JAX_PLATFORMS (conftest.py note)
            "PYTHONPATH": REPO,
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "DEACON_COORD": f"127.0.0.1:{port}",
            "DEACON_NUM_PROC": "2",
            "DEACON_PROC_ID": str(i),
            # exercise the rank-local sharded device pipeline (the default
            # per-rank engine is the host path); also proves pod-data
            # coexists with a jax.distributed coordinator
            "DEACON_POD_ENGINE": "sharded",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "deacon_tpu", "filter", str(idx),
             str(reads), "-o", str(out), "--deplete", "-q",
             "--mesh", "pod-data", "-s", str(summary)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=REPO,
        ))
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o.decode())
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{o}"
    ref = out_ref.read_bytes()
    assert out.read_bytes() == ref
    assert ref.count(b"@x") == 40 and ref.count(b"@m") == 0
    # part files were cleaned up after the concat
    assert not (tmp_path / "pod.fq.pod0").exists()
    assert not (tmp_path / "pod.fq.pod1").exists()
    # rank-0 summary carries the aggregated (global) stats
    s = json.loads(summary.read_text())
    assert s["seqs_in"] == 80 and s["seqs_out"] == 40
    assert s["seqs_removed"] == 40


def test_four_process_pod_2d_cli(tmp_path):
    """`filter --mesh pod-2d` with 4 jax.distributed ranks as 2 groups x 2
    index shards (VERDICT r2 item 3): each group owns a disjoint byte range
    (reads/s axis) while the index is value-range sharded across the two
    processes WITHIN each group and psum-merged (memory axis). Concatenated
    output must be byte-identical to a single-process run."""
    import json

    rng = np.random.default_rng(41)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), 4000).astype(np.uint8)

    from deacon_tpu.index.store import IndexHeader, write_index
    from deacon_tpu.ops import minimizers_np as mnp

    idx = tmp_path / "g.idx"
    write_index(
        mnp.compute_minimizer_hashes(genome.tobytes(), 31, 15),
        IndexHeader.new(31, 15),
        idx,
    )
    g = genome.tobytes()
    reads = tmp_path / "reads.fq"
    with open(reads, "wb") as f:
        for i in range(40):
            s = (i * 97) % 3800
            seq = g[s : s + 150]
            f.write(b"@m%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))
        for i in range(40):
            seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 150))
            f.write(b"@x%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))

    out_ref = tmp_path / "ref.fq"
    env1 = dict(os.environ)
    env1["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "deacon_tpu", "filter", str(idx), str(reads),
         "-o", str(out_ref), "--deplete", "-q"],
        capture_output=True, env=env1, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr.decode()

    port = str(23000 + (os.getpid() % 9000))
    out = tmp_path / "pod2d.fq"
    summary = tmp_path / "pod2d_summary.json"
    procs = []
    for i in range(4):
        env = dict(os.environ)
        env.update({
            "JAX_PLATFORMS": "cpu",
            "PYTHONPATH": REPO,
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "DEACON_COORD": f"127.0.0.1:{port}",
            "DEACON_NUM_PROC": "4",
            "DEACON_PROC_ID": str(i),
            "DEACON_POD_SHARDS": "2",
        })
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "deacon_tpu", "filter", str(idx),
             str(reads), "-o", str(out), "--deplete", "-q",
             "--mesh", "pod-2d", "-s", str(summary)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, cwd=REPO,
        ))
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o.decode())
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{o}"
    ref = out_ref.read_bytes()
    assert out.read_bytes() == ref
    assert ref.count(b"@x") == 40 and ref.count(b"@m") == 0
    for gi in range(2):
        assert not (tmp_path / f"pod2d.fq.pod{gi}").exists()
    s = json.loads(summary.read_text())
    assert s["seqs_in"] == 80 and s["seqs_out"] == 40


def test_pod_2d_validation(tmp_path, monkeypatch):
    from deacon_tpu.config import FilterConfig
    from deacon_tpu.index.store import IndexHeader, write_index
    from deacon_tpu.ops import minimizers_np as mnp

    idx = tmp_path / "g.idx"
    write_index(
        mnp.compute_minimizer_hashes(b"ACGT" * 300, 31, 15),
        IndexHeader.new(31, 15), idx,
    )
    reads = tmp_path / "r.fq"
    reads.write_bytes(b"@a\n" + b"ACGT" * 40 + b"\n+\n" + b"I" * 160 + b"\n")
    base = dict(minimizers_path=str(idx), input_path=str(reads),
                output_path=str(tmp_path / "o.fq"), mesh="pod-2d", quiet=True)
    monkeypatch.setenv("DEACON_NUM_PROC", "4")
    monkeypatch.setenv("DEACON_PROC_ID", "0")
    monkeypatch.delenv("DEACON_POD_SHARDS", raising=False)
    with pytest.raises(ValueError, match="DEACON_POD_SHARDS"):
        FilterConfig(**base).execute()
    monkeypatch.setenv("DEACON_POD_SHARDS", "3")  # does not divide 4
    with pytest.raises(ValueError, match="DEACON_POD_SHARDS"):
        FilterConfig(**base).execute()
    monkeypatch.setenv("DEACON_POD_SHARDS", "2")
    with pytest.raises(ValueError, match="DEACON_COORD"):
        FilterConfig(**base).execute()


def test_pod_data_single_process(tmp_path):
    """pod-data without any DEACON_* env: one rank, whole file, output equal
    to a plain run; also exercises part concat + sidecar cleanup in-process."""
    import json

    from deacon_tpu.config import FilterConfig
    from deacon_tpu.index.store import IndexHeader, write_index
    from deacon_tpu.ops import minimizers_np as mnp

    rng = np.random.default_rng(23)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), 3000).astype(np.uint8)
    idx = tmp_path / "g.idx"
    write_index(
        mnp.compute_minimizer_hashes(genome.tobytes(), 31, 15),
        IndexHeader.new(31, 15),
        idx,
    )
    g = genome.tobytes()
    reads = tmp_path / "reads.fq"
    with open(reads, "wb") as f:
        for i in range(10):
            seq = g[i * 120 : i * 120 + 150]
            f.write(b"@m%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))
        for i in range(10):
            seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 150))
            f.write(b"@x%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq)))

    out_ref = tmp_path / "ref.fq"
    FilterConfig(
        minimizers_path=str(idx), input_path=str(reads),
        output_path=str(out_ref), deplete=True, quiet=True,
    ).execute()
    out = tmp_path / "pod.fq"
    summary = tmp_path / "s.json"
    FilterConfig(
        minimizers_path=str(idx), input_path=str(reads),
        output_path=str(out), deplete=True, quiet=True, mesh="pod-data",
        summary_path=str(summary),
    ).execute()
    assert out.read_bytes() == out_ref.read_bytes()
    assert not (tmp_path / "pod.fq.pod0").exists()
    assert not (tmp_path / "pod.fq.pod0.stats.json").exists()
    s = json.loads(summary.read_text())
    assert s["seqs_in"] == 20 and s["seqs_out"] == 10


def test_pod_data_bgzf_input(tmp_path, monkeypatch):
    """BGZF-compressed input splits across pod-data ranks in decompressed
    space (io/split.py BgzfRange): two sequential in-process ranks over a
    bgzip-style file produce output byte-identical to a plain-input run
    (ADVICE r2: the BGZF splitting section is now live)."""
    from helpers import bgzf_compress

    from deacon_tpu.config import FilterConfig
    from deacon_tpu.index.store import IndexHeader, write_index
    from deacon_tpu.ops import minimizers_np as mnp

    rng = np.random.default_rng(29)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), 3000).astype(np.uint8)
    idx = tmp_path / "g.idx"
    write_index(
        mnp.compute_minimizer_hashes(genome.tobytes(), 31, 15),
        IndexHeader.new(31, 15),
        idx,
    )
    g = genome.tobytes()
    raw = bytearray()
    for i in range(20):
        seq = g[(i * 130) % 2800 : (i * 130) % 2800 + 150]
        raw += b"@m%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq))
    for i in range(20):
        seq = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), 150))
        raw += b"@x%d\n%s\n+\n%s\n" % (i, seq, b"I" * len(seq))
    plain = tmp_path / "reads.fq"
    plain.write_bytes(bytes(raw))
    bgzf = tmp_path / "reads.fq.gz"
    bgzf.write_bytes(bgzf_compress(bytes(raw), block=512))

    out_ref = tmp_path / "ref.fq"
    FilterConfig(
        minimizers_path=str(idx), input_path=str(plain),
        output_path=str(out_ref), deplete=True, quiet=True,
    ).execute()

    out = tmp_path / "pod.fq"
    monkeypatch.setenv("DEACON_NUM_PROC", "2")
    base = dict(
        minimizers_path=str(idx), input_path=str(bgzf),
        output_path=str(out), deplete=True, quiet=True, mesh="pod-data",
    )
    # rank 1 first (writes its part + sidecar and returns), then rank 0
    # (filters its own range, waits on the sidecar barrier, concatenates)
    monkeypatch.setenv("DEACON_PROC_ID", "1")
    FilterConfig(**base).execute()
    monkeypatch.setenv("DEACON_PROC_ID", "0")
    FilterConfig(**base).execute()
    assert out.read_bytes() == out_ref.read_bytes()
    assert not (tmp_path / "pod.fq.pod0").exists()
    assert not (tmp_path / "pod.fq.pod1").exists()


def test_pod_data_paired_bgzf_rejected(tmp_path):
    from helpers import bgzf_compress

    from deacon_tpu.config import FilterConfig
    from deacon_tpu.index.store import IndexHeader, write_index
    from deacon_tpu.ops import minimizers_np as mnp

    idx = tmp_path / "g.idx"
    write_index(
        mnp.compute_minimizer_hashes(b"ACGT" * 300, 31, 15),
        IndexHeader.new(31, 15), idx,
    )
    rec = b"@a\n" + b"ACGT" * 40 + b"\n+\n" + b"I" * 160 + b"\n"
    r1 = tmp_path / "r1.fq.gz"
    r1.write_bytes(bgzf_compress(rec))
    r2 = tmp_path / "r2.fq"
    r2.write_bytes(rec)
    with pytest.raises(ValueError, match="single-end only"):
        FilterConfig(
            minimizers_path=str(idx), input_path=str(r1),
            input2_path=str(r2), output_path=str(tmp_path / "o.fq"),
            mesh="pod-data", quiet=True,
        ).execute()


def test_pod_data_validation(tmp_path):
    from deacon_tpu.config import FilterConfig
    from deacon_tpu.index.store import IndexHeader, write_index
    from deacon_tpu.ops import minimizers_np as mnp

    idx = tmp_path / "g.idx"
    write_index(
        mnp.compute_minimizer_hashes(b"ACGT" * 300, 31, 15),
        IndexHeader.new(31, 15), idx,
    )
    reads = tmp_path / "r.fq"
    reads.write_bytes(b"@a\n" + b"ACGT" * 40 + b"\n+\n" + b"I" * 160 + b"\n")

    base = dict(minimizers_path=str(idx), input_path=str(reads),
                output_path=str(tmp_path / "o.fq"), mesh="pod-data", quiet=True)
    with pytest.raises(ValueError, match="rename"):
        FilterConfig(**base, rename=True).execute()
    with pytest.raises(ValueError, match="seekable"):
        FilterConfig(
            **{**base, "input_path": "-", "input2_path": "-"}
        ).execute()
    with pytest.raises(ValueError, match="file path"):
        FilterConfig(**{**base, "output_path": "-"}).execute()
    with pytest.raises(ValueError, match="seekable"):
        FilterConfig(**{**base, "input_path": "-"}).execute()


def test_two_process_pod_data_paired(tmp_path):
    """Paired `--mesh pod-data`: two ranks (env-identified only — no
    coordinator; the host engine needs no jax), each filtering the SAME
    record-index range of r1.fq and r2.fq, separate -O outputs; both final
    outputs and the summary must equal a single-process run."""
    import json

    rng = np.random.default_rng(19)
    genome = rng.choice(np.frombuffer(b"ACGT", np.uint8), 4000).astype(np.uint8)
    from deacon_tpu.index.store import IndexHeader, write_index
    from deacon_tpu.ops import minimizers_np as mnp

    idx = tmp_path / "g.idx"
    write_index(
        mnp.compute_minimizer_hashes(genome.tobytes(), 31, 15),
        IndexHeader.new(31, 15),
        idx,
    )
    g = genome.tobytes()
    r1p, r2p = tmp_path / "r1.fq", tmp_path / "r2.fq"
    with open(r1p, "wb") as f1, open(r2p, "wb") as f2:
        for i in range(60):
            # pair-OR semantics in play: only mate 2 of odd pairs matches
            host = g[(i * 61) % 3800 : (i * 61) % 3800 + 150]
            rand = bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8),
                                    int(rng.integers(80, 250))))
            m1 = rand
            m2 = host if i % 2 else rand[::-1]
            f1.write(b"@p%d/1\n%s\n+\n%s\n" % (i, m1, b"I" * len(m1)))
            f2.write(b"@p%d/2\n%s\n+\n%s\n" % (i, m2, b"I" * len(m2)))

    def run_filter(out1, out2, extra, env_extra):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = REPO
        env.update(env_extra)
        return subprocess.Popen(
            [sys.executable, "-m", "deacon_tpu", "filter", str(idx),
             str(r1p), str(r2p), "-o", str(out1), "-O", str(out2),
             "--deplete", "-q"] + extra,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=REPO,
        )

    ref1, ref2 = tmp_path / "ref1.fq", tmp_path / "ref2.fq"
    p = run_filter(ref1, ref2, [], {})
    o, _ = p.communicate(timeout=240)
    assert p.returncode == 0, o.decode()

    out1, out2 = tmp_path / "pod1.fq", tmp_path / "pod2.fq"
    summary = tmp_path / "ps.json"
    procs = [
        run_filter(
            out1, out2, ["--mesh", "pod-data", "-s", str(summary)],
            {"DEACON_NUM_PROC": "2", "DEACON_PROC_ID": str(i)},
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            o, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(o.decode())
    for i, (p, o) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{o}"
    assert out1.read_bytes() == ref1.read_bytes()
    assert out2.read_bytes() == ref2.read_bytes()
    # odd pairs match via mate 2 -> depleted together (pair-OR)
    kept = ref1.read_bytes().count(b"@p")
    assert kept == 30
    assert not (tmp_path / "pod1.fq.pod0").exists()
    assert not (tmp_path / "pod2.fq.pod0").exists()
    s = json.loads(summary.read_text())
    assert s["seqs_in"] == 120 and s["seqs_out"] == 60


def test_pod_build_matches_plain_build(tmp_path):
    """`index build --mesh pod-data`: partial indexes built per rank merge
    into an index byte-identical to a single-process build (minimizer
    selection is per-record, so record-granular sharding is exact)."""
    rng = np.random.default_rng(29)
    fa = tmp_path / "pan.fa"
    with open(fa, "wb") as f:
        for i in range(10):
            g = rng.choice(
                np.frombuffer(b"ACGTACGTN", np.uint8),
                int(rng.integers(2000, 20000)),
            ).tobytes()
            f.write(b">g%d\n" % i)
            for j in range(0, len(g), 60):
                f.write(g[j : j + 60] + b"\n")

    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    ref = tmp_path / "ref.idx"
    r = subprocess.run(
        [sys.executable, "-m", "deacon_tpu", "index", "build", str(fa),
         "-o", str(ref), "-q", "-e", "0.3"],
        capture_output=True, env=env, cwd=REPO,
    )
    assert r.returncode == 0, r.stderr.decode()

    out = tmp_path / "pod.idx"
    procs = []
    for i in range(3):
        env_i = dict(env, DEACON_NUM_PROC="3", DEACON_PROC_ID=str(i))
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "deacon_tpu", "index", "build", str(fa),
             "-o", str(out), "-q", "-e", "0.3", "--mesh", "pod-data"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env_i,
            cwd=REPO,
        ))
    for i, p in enumerate(procs):
        o, _ = p.communicate(timeout=240)
        assert p.returncode == 0, f"rank {i} failed:\n{o.decode()}"
    assert out.read_bytes() == ref.read_bytes()
    assert not (tmp_path / "pod.idx.pod0").exists()
    assert not (tmp_path / "pod.idx.pod0.stats.json").exists()


def test_pod_build_validation(tmp_path):
    from deacon_tpu.config import IndexConfig

    fa = tmp_path / "g.fa"
    fa.write_bytes(b">g\n" + b"ACGT" * 100 + b"\n")
    with pytest.raises(ValueError, match="file path"):
        IndexConfig(input_path=str(fa), output_path=None,
                    mesh="pod-data").execute()
    with pytest.raises(ValueError, match="pod-data only"):
        IndexConfig(input_path=str(fa), output_path=str(tmp_path / "o.idx"),
                    mesh="2x4").execute()
