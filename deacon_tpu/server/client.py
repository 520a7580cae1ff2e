"""Remote filtering client backend (ref: src/remote_filter.rs:306-428, C8).

The client computes minimizer hashes locally (exactly like local filtering)
and POSTs batches of pre-hashed minimizers to a deacon server for the
membership + threshold decision. Implements the same decide_* contract as
filter.backend.LocalBackend so the streaming engine is backend-agnostic.
"""

from __future__ import annotations

import urllib.error
import urllib.request

from ..index.store import IndexHeader
from . import protocol


class ServerError(RuntimeError):
    pass


class RemoteBackend:
    def __init__(self, server_address: str, timeout: float = 600.0):
        self.address = server_address.rstrip("/")
        self.timeout = timeout
        self.header = self._fetch_header()

    # ------------------------------------------------------------------
    def _get(self, path: str) -> bytes:
        try:
            with urllib.request.urlopen(
                self.address + path, timeout=self.timeout
            ) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:  # reached the server: its error
            raise ServerError(f"Server returned an error: {e.code}") from e
        except urllib.error.URLError as e:
            raise ServerError(
                f"Failed to contact server at {self.address}: {e}"
            ) from e

    def _post(self, path: str, body: bytes) -> bytes:
        req = urllib.request.Request(
            self.address + path,
            data=body,
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.read()
        except urllib.error.HTTPError as e:
            raise ServerError(f"Server returned an error: {e.code}") from e
        except urllib.error.URLError as e:
            raise ServerError(
                f"Failed to contact server at {self.address}: {e}"
            ) from e

    def _fetch_header(self) -> IndexHeader:
        """GET /index_header (ref: src/server_common.rs:63-81)."""
        import json

        obj = json.loads(self._get("/index_header"))
        header = IndexHeader(
            obj["format_version"], obj["kmer_length"], obj["window_size"]
        )
        header.validate()
        return header

    def summary_index(self) -> str:
        """addr:path@sha256 via GET /index_version
        (ref: src/filter_common.rs:46-81)."""
        return self.address + ":" + self._get("/index_version").decode()

    # ------------------------------------------------------------------
    def decide_unpaired(self, batch, kmer_length, abs_threshold, rel_threshold,
                        deplete, debug):
        if not batch:
            return []
        body = protocol.encode_unpaired_request(
            batch, abs_threshold, rel_threshold, deplete, kmer_length, debug
        )
        return protocol.decode_response(
            self._post("/should_output_unpaired", body)
        )

    def decide_paired(self, batch, kmer_length, abs_threshold, rel_threshold,
                      deplete, debug):
        if not batch:
            return []
        body = protocol.encode_paired_request(
            batch, abs_threshold, rel_threshold, deplete, kmer_length, debug
        )
        return protocol.decode_response(
            self._post("/should_output_paired", body)
        )
