"""HTTP filter server: holds the index in RAM and answers batched decision
requests (ref: src/server.rs, C9).

Routes (identical surface to the reference, src/server.rs:48-58):
  GET  /                        -> human-readable status line
  GET  /index_header            -> IndexHeader JSON
  GET  /index_version           -> "path@sha256(bytes)"
  POST /should_output_unpaired  -> FilterResponse JSON
  POST /should_output_paired    -> FilterResponse JSON

Implementation: stdlib ThreadingHTTPServer — requests carry pre-hashed
minimizers, so each request is a vectorized sorted-array probe over the
resident index (optionally the TPU-resident probe for very large batches).
Body limit 2 GiB (ref: src/server.rs:58).
"""

from __future__ import annotations

import hashlib
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..filter.backend import LocalBackend
from ..index.store import MinimizerIndex, load_index
from . import protocol

MAX_BODY = 2_147_483_648  # 2 GiB, ref: src/server.rs:58


def _file_sha256(path: str) -> str:
    """Streaming sha256 (a full read() would briefly double peak RAM next
    to a decoded multi-GB index). hashlib.file_digest needs Python >= 3.11;
    fall back to a chunked loop on 3.10."""
    with open(path, "rb") as f:
        if hasattr(hashlib, "file_digest"):
            return hashlib.file_digest(f, "sha256").hexdigest()
        h = hashlib.sha256()
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
        return h.hexdigest()


class PodProbe:
    """Rank-0 wrapper around a pod-mesh DeviceHashProbe: every probe is a
    collective over the process-spanning mesh, so each padded query batch
    is first broadcast to the worker ranks (probe_worker_loop), then all
    ranks execute the same jitted program. Serialized — interleaved
    broadcasts from the HTTP thread pool would desynchronize the ranks."""

    def __init__(self, probe):
        import threading

        self.probe = probe
        self._lock = threading.Lock()

    def __call__(self, hashes):
        import numpy as np

        n = int(np.asarray(hashes).size)
        if n == 0:
            return np.zeros(0, dtype=bool)
        q = np.zeros(self.probe.padded_size(n), dtype=np.uint64)
        q[:n] = np.asarray(hashes, dtype=np.uint64)
        with self._lock:
            q = _pod_broadcast_query(q)
            member = self.probe.probe_padded(q)
        return member[:n]

    def shutdown(self):
        """Release the worker ranks (they exit on a zero-size header)."""
        import numpy as np

        from jax.experimental import multihost_utils

        with self._lock:
            multihost_utils.broadcast_one_to_all(np.zeros(1, dtype=np.int32))


def _pod_broadcast_query(q):
    """Broadcast a padded u64 query batch from rank 0 to every rank.
    Two-phase (size header, then payload) because broadcast_one_to_all
    needs identical shapes everywhere; u64 rides as a u32 view (device
    code is strictly 32-bit — x64 stays off)."""
    import numpy as np

    from jax.experimental import multihost_utils

    multihost_utils.broadcast_one_to_all(
        np.asarray([q.size], dtype=np.int32)
    )
    q32 = multihost_utils.broadcast_one_to_all(
        np.ascontiguousarray(q).view(np.uint32)
    )
    return np.asarray(q32).view(np.uint64)


def probe_worker_loop(probe) -> None:
    """Ranks > 0 of a ``--mesh pod`` server: mirror rank 0's collectives.
    Blocks on the size-header broadcast; a zero size is the shutdown
    signal (sent by PodProbe.shutdown on server close)."""
    import numpy as np

    from jax.experimental import multihost_utils

    while True:
        size = int(
            np.asarray(
                multihost_utils.broadcast_one_to_all(
                    np.zeros(1, dtype=np.int32)
                )
            )[0]
        )
        if size == 0:
            return
        q32 = multihost_utils.broadcast_one_to_all(
            np.zeros(2 * size, dtype=np.uint32)
        )
        probe.probe_padded(np.asarray(q32).view(np.uint64))


class ServerState:
    def __init__(self, index_path: str, device: str = "host", mesh: str | None = None):
        import os

        import numpy as np

        from ..index.store import load_header_and_count

        # long-lived process: huge pages on the probe table pay off
        os.environ.setdefault("DEACON_PROBE_THP", "1")
        self.version = f"{index_path}@{_file_sha256(index_path)}"
        print(f"Loading index from: {index_path}", file=sys.stderr)
        from ..index.store import warn_if_foreign_index

        warn_if_foreign_index(index_path)
        self.header, self.count = load_header_and_count(index_path)
        # the raw hash array stays resident ONLY when no probe owns the
        # keys (pure-Python fallback); every probe path below drops it —
        # at panhuman scale that halves steady-state RAM
        _stub = MinimizerIndex(self.header, np.empty(0, dtype=np.uint64))
        probe = None
        self.device_probe = None
        index = _stub
        if device == "jax" or mesh:
            # pod-backed decisions: membership probes run on the accelerator
            # mesh (index range-partitioned across `shard`, queries across
            # `data`, per-shard bits psum-merged) instead of the host probe
            from ..ops.engine import DeviceHashProbe

            m = None
            if mesh == "pod":
                # multi-host pod server: shard axis across processes, each
                # rank stream-decodes only its own shards (config 5 at full
                # strength); ranks > 0 run probe_worker_loop
                from ..parallel.multihost import (
                    make_pod_mesh,
                    maybe_init_distributed,
                )

                maybe_init_distributed()
                m = make_pod_mesh()
                shape = dict(m.shape)
                print(
                    f"Index sharded on pod mesh data={shape['data']} x "
                    f"shard={shape['shard']}",
                    file=sys.stderr,
                )
            elif mesh:
                from ..parallel.sharded import make_mesh, parse_mesh_spec

                n_data, n_shard = parse_mesh_spec(mesh)
                m = make_mesh(n_data, n_shard)
                print(
                    f"Index sharded on device mesh data={n_data} x shard={n_shard}",
                    file=sys.stderr,
                )
            # memory-lean: stream-decode value-range shards straight from
            # the file — no host ever materializes the full hash array
            probe = DeviceHashProbe.from_index_file(index_path, mesh=m)
            self.device_probe = probe
            if probe.spans_processes:
                import jax

                probe = PodProbe(probe) if jax.process_index() == 0 else None
        else:
            # host mode: pre-build the membership table now (not lazily on
            # the first request) — via the '<index>.probe' sidecar when one
            # is valid, skipping the multi-GB hash decode entirely
            nprobe = None
            try:
                from ..io.native_loader import (
                    maybe_save_probe_sidecar,
                    native_probe,
                    native_probe_load_sidecar,
                )

                nprobe = native_probe_load_sidecar(str(index_path), self.count)
                if nprobe is None:
                    index = load_index(index_path)
                    nprobe = native_probe(index.hashes)
                    if nprobe is not None:
                        maybe_save_probe_sidecar(
                            nprobe, str(index_path), len(index)
                        )
                        index = _stub  # probe owns the keys now
            except Exception:
                nprobe = None
            if nprobe is not None:
                probe = lambda q: nprobe.query(q)  # noqa: E731
                self._nprobe = nprobe  # keep the table alive
            elif index is _stub:
                index = load_index(index_path)  # no probe: need the hashes
        self.index: MinimizerIndex = index
        self.backend = LocalBackend(self.index, probe=probe)
        print("Loaded index!", file=sys.stderr)


def make_handler(state: ServerState):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, fmt, *args):  # tracing only via env, keep quiet
            import os

            if os.environ.get("DEACON_TPU_LOG"):
                super().log_message(fmt, *args)

        def _send(self, code: int, body: bytes, ctype="application/json"):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/":
                h = state.header
                msg = (
                    f"Index loaded with {state.count} minimizers and "
                    f"header: IndexHeader {{ format_version: {h.format_version}, "
                    f"kmer_length: {h.kmer_length}, window_size: {h.window_size} }}"
                )
                self._send(200, msg.encode(), "text/plain; charset=utf-8")
            elif self.path == "/index_header":
                self._send(200, json.dumps(state.header.to_dict()).encode())
            elif self.path == "/index_version":
                self._send(200, state.version.encode(), "text/plain; charset=utf-8")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            if self.path not in ("/should_output_unpaired", "/should_output_paired"):
                # unread body bytes would desynchronize this keep-alive
                # connection's next request
                self.close_connection = True
                self._send(404, b"not found", "text/plain")
                return
            try:
                length = int(self.headers.get("Content-Length", "0"))
            except ValueError:
                self.close_connection = True
                self._send(400, b"bad Content-Length", "text/plain")
                return
            if length < 0 or length > MAX_BODY:
                self.close_connection = True
                code, msg = (413, b"body too large") if length > 0 else (400, b"bad Content-Length")
                self._send(code, msg, "text/plain")
                return
            body = self.rfile.read(length)
            paired = self.path.endswith("_paired")
            binary = protocol.is_binary_request(body)
            try:
                if binary:
                    (batch, abs_t, rel_t, deplete, k, debug,
                     req_paired) = protocol.decode_binary_request(body)
                    if req_paired != paired:
                        raise ValueError("paired flag/route mismatch")
                else:
                    batch, abs_t, rel_t, deplete, k, debug = (
                        protocol.decode_request(body, paired)
                    )
                if paired:
                    decisions = state.backend.decide_paired(
                        batch, k, abs_t, rel_t, deplete, debug
                    )
                else:
                    decisions = state.backend.decide_unpaired(
                        batch, k, abs_t, rel_t, deplete, debug
                    )
                if binary:
                    self._send(
                        200, protocol.encode_binary_response(decisions),
                        protocol.BINARY_CTYPE,
                    )
                else:
                    self._send(200, protocol.encode_response(decisions))
            except Exception as e:  # noqa: BLE001 - report to client
                self._send(400, f"bad request: {e}".encode(), "text/plain")

    return Handler


def make_server(index_path: str, port: int, host: str = "0.0.0.0",
                device: str = "host", mesh: str | None = None):
    state = ServerState(index_path, device=device, mesh=mesh)
    httpd = ThreadingHTTPServer((host, port), make_handler(state))
    return httpd


def run_server(index_path: str, port: int, host: str = "0.0.0.0",
               device: str = "host", mesh: str | None = None) -> None:
    print("Loading server!", file=sys.stderr)
    if mesh == "pod":
        # multi-host: initialize the distributed runtime BEFORE any state
        # construction touches jax, then split by rank — rank 0 serves
        # HTTP, the others mirror its probe collectives
        from ..parallel.multihost import maybe_init_distributed

        maybe_init_distributed()
        import jax

        if jax.process_count() > 1 and jax.process_index() != 0:
            state = ServerState(index_path, device=device, mesh=mesh)
            print(
                f"Pod worker rank {jax.process_index()}: mirroring rank 0 "
                "probes", file=sys.stderr,
            )
            probe_worker_loop(state.device_probe)
            return
    state = ServerState(index_path, device=device, mesh=mesh)
    httpd = ThreadingHTTPServer((host, port), make_handler(state))
    print(f"Serving on {host}:{port}", file=sys.stderr)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.server_close()
        pod = getattr(state.backend, "_probe", None)
        if isinstance(pod, PodProbe):
            pod.shutdown()
