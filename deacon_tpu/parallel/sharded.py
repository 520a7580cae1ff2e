"""Multi-chip sharded filter pipeline: pjit/shard_map over a device mesh.

TPU-native replacement for the reference's replicated-index model (the Rust
tool holds the whole FxHashSet in every process; ref: src/index.rs:96-107,
SURVEY §2.3): here the sorted minimizer index lives sharded across the
``shard`` mesh axis in HBM while read rows are data-parallel across the
``data`` axis. Each device probes its contiguous index shard and the 0/1
membership vectors are merged with a single ``psum`` over the ``shard`` axis
— the only cross-chip traffic, riding ICI.

The index is range-partitioned (it is sorted), so each query hits exactly one
shard; shard padding duplicates the last real hash, which keeps membership
semantics exact under psum (a duplicated boundary value can only double-count
a true member, and membership is evaluated as sum >= 1).

With ``shard=1`` this degrades gracefully to pure data parallelism with a
replicated index (the right call whenever the index fits one chip's HBM).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import engine as eng


def parse_mesh_spec(mesh_spec: str) -> tuple[int, int]:
    """Parse a DATAxSHARD mesh spec like "2x4" into (n_data, n_shard)."""
    try:
        n_data, n_shard = (int(x) for x in mesh_spec.lower().split("x"))
        if n_data < 1 or n_shard < 1:
            raise ValueError
    except ValueError:
        raise ValueError(
            f"--mesh must be DATAxSHARD (e.g. 2x4), got {mesh_spec!r}"
        ) from None
    return n_data, n_shard


def make_mesh(n_data: int, n_shard: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    need = n_data * n_shard
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    dev_arr = np.asarray(devices[:need]).reshape(n_data, n_shard)
    return Mesh(dev_arr, ("data", "shard"))


def _sharded_step(
    codes_p, valid_p, il_codes, il_valid, mlen, allow_short, rid, mate,
    chunk_start, index_hi, index_lo, n_valid,
    *, k, w, budget, num_segments, max_run, gather_out=False,
):
    """Runs per-device under shard_map: local rows x local index shard.

    ``codes_p``/``valid_p`` arrive bit-packed (4 bases + 8 validity bits per
    byte) from the native host packer (plus the kernel-v3 interleaved
    planes ``il_codes``/``il_valid``) — 5x fewer bytes over PCIe/ICI than
    raw (R, L) u8 planes. engine_core_packed runs the same v3 stage chain
    as the single-chip engine (packed-input select kernel, cumsum-free
    compaction, slot value recompute), unpacking only on v2-only shapes.

    An equal-hi run split across two shards is still covered exactly: the
    query's local searchsorted lands at the run's continuation (position 0)
    on the next shard, and membership ORs across shards via the psum.
    """

    def probe(h):
        member_l, pos_l = eng.probe_split_u32_pos(
            index_hi, index_lo, h, max_run=max_run, n_valid=n_valid[0]
        )
        shard_size = index_hi.shape[0]
        offset = jax.lax.axis_index("shard").astype(jnp.int32) * shard_size
        gpos = jnp.where(member_l, pos_l + offset, jnp.int32(2**31 - 1))
        member = jax.lax.psum(member_l.astype(jnp.int32), "shard") >= 1
        gpos = jax.lax.pmin(gpos, "shard")
        return member, jnp.where(member, gpos, jnp.int32(-1))

    hits, totals, used = eng.engine_core_packed(
        codes_p, valid_p, il_codes, il_valid, mlen, allow_short, rid, mate,
        chunk_start, probe,
        k=k, w=w, budget=budget, num_segments=num_segments,
        dedup_positions=True,
    )
    used = jnp.reshape(used, (1,))
    if gather_out:
        # multi-process: replicate outputs so every host can read the whole
        # result (a P("data") output is only partially addressable per host)
        hits = jax.lax.all_gather(hits, "data", tiled=True)
        totals = jax.lax.all_gather(totals, "data", tiled=True)
        used = jax.lax.all_gather(used, "data", tiled=True)
    return hits, totals, used


def _sharded_step_radix(
    codes_p, valid_p, il_codes, il_valid, mlen, allow_short, rid, mate,
    chunk_start, planes, spill, _dummy_nv,
    *, k, w, budget, num_segments, p, kslots, npl, rows_local, l, stride,
    mode, sp=0, gather_out=False,
):
    """Arch-5 radix-window probe under shard_map: the byte-plane table is
    ROW-SHARDED over the ``shard`` axis (each device holds a contiguous
    bucket-row range = a contiguous key-value range, since buckets are the
    keys' top bits).  Every shard runs the same static-tile kernel over
    its local queries with GLOBAL bases clamped into its range; matches
    outside the range are masked, so a single psum of per-shard hit
    histograms is the exact global distinct-hit count — no slot-id
    bookkeeping at all (dedup is by value+rid, not index position, which
    is what un-blocked the v4-class probe for meshes; r3 VERDICT item 3).
    Totals are shard-independent (grid-side) and stay replicated."""
    from ..ops import radix_probe as rp

    R_local = codes_p.shape[0]
    pos_c, v_c, rt = eng._values_compact(
        codes_p, valid_p, il_codes, il_valid, mlen, allow_short,
        k=k, w=w, Br=budget,
    )
    valid2d = (
        jax.lax.broadcasted_iota(jnp.int32, (R_local, budget), 1)
        < jnp.minimum(rt, budget)[:, None]
    )
    hlo, hhi = eng.u64.xxh3_64_pair_u64(
        v_c[0].reshape(-1), v_c[1].reshape(-1)
    )
    shard_lo = jax.lax.axis_index("shard").astype(jnp.int32) * rows_local
    rid_s = jnp.broadcast_to(rid[:, None], (R_local, budget))
    hits_l, ov = rp.radix_probe_hits(
        planes, p, kslots, npl, hlo, hhi, valid2d, rid_s, pos_c,
        num_segments=num_segments, mode=mode,
        shard_lo=shard_lo, shard_rows=rows_local,
        spill=spill if sp else None, sp=sp,
    )
    hits = jax.lax.psum(hits_l, "shard")
    totals = rp.totals_grid(
        pos_c, valid2d, rid, mate, chunk_start,
        num_segments=num_segments, k=k, l=l, stride=stride,
        dedup_positions=True,
    )
    used = jnp.max(rt) | (ov.astype(jnp.int32) << jnp.int32(30))
    used = jnp.reshape(used, (1,))
    if gather_out:
        hits = jax.lax.all_gather(hits, "data", tiled=True)
        totals = jax.lax.all_gather(totals, "data", tiled=True)
        used = jax.lax.all_gather(used, "data", tiled=True)
    return hits, totals, used


class ShardedPipeline:
    """Device-mesh version of ops.engine.DevicePipeline.

    Row batches are split across the ``data`` axis (each data shard receives
    whole logical units so distinct-hit counting stays exact); the index is
    sharded across ``shard``.
    """

    def __init__(
        self,
        index_hashes: np.ndarray,
        k: int,
        w: int,
        mesh: Mesh,
        row_len: int = 8192,
        rows_per_shard: int = 128,
        budget_frac: float | None = None,
    ):
        self._init_geometry(k, w, mesh, row_len, rows_per_shard, budget_frac)

        arr = np.sort(np.asarray(index_hashes, dtype=np.uint64))
        if self._try_radix(arr):
            return
        pad = (-arr.size) % self.n_shard
        if arr.size == 0:
            self._empty_index = True
            arr = np.zeros(self.n_shard, dtype=np.uint64)
        else:
            self._empty_index = False
            if pad:
                # pad by duplicating the last real member (membership-safe)
                arr = np.concatenate(
                    [arr, np.full(pad, arr[-1], dtype=np.uint64)]
                )
        hi, lo, max_run = eng.build_probe_planes(arr)
        idx_sharding = NamedSharding(mesh, P("shard"))
        self.index_hi = jax.device_put(jnp.asarray(hi), idx_sharding)
        self.index_lo = jax.device_put(jnp.asarray(lo), idx_sharding)
        # the global pads above ARE members (duplicates): every slot valid
        shard_size = arr.size // self.n_shard
        self._n_valid = jax.device_put(
            jnp.full((self.n_shard,), shard_size, jnp.int32), idx_sharding
        )
        self._compile(max_run, idx_sharding)

    def _try_radix(self, arr: np.ndarray) -> bool:
        """Build + compile the sharded arch-5 radix probe when eligible;
        returns False to fall through to the sorted-plane path."""
        import os

        if os.environ.get("DEACON_PROBE", "radix") != "radix":
            return False
        if eng.engine_arch(self.k, self.L, self.Rs) != 4 or self.Rs > 16384:
            return False
        from ..ops.radix_probe import (
            _radix_sizing, build_radix_table, split_bound,
        )

        t = build_radix_table(arr)
        if t is None:
            return False
        nrows = 1 << t.p
        if nrows % self.n_shard:
            return False
        rows_local = nrows // self.n_shard
        q = self.Rs * self.budget_per_shard
        # mirror radix_probe_hits' own sizing decision (uncompacted
        # first, split only when that is what fits)
        sz = _radix_sizing(q, t.p, max_fw=rows_local, compacted=False)
        if sz is None and (
            os.environ.get("DEACON_RADIX_SPLIT", "1") != "0" and q >= 4096
        ):
            qc = split_bound(q)
            if qc < q:
                sz = _radix_sizing(qc, t.p, max_fw=rows_local,
                                   compacted=True)
        if sz is None or rows_local % 32 or rows_local < sz["fw"]:
            return False
        self._radix = (t.p, t.k, t.nplanes, rows_local, t.sp)
        self._empty_index = arr.size == 0
        self._raw_hashes = arr  # host copy for the lazy --debug hash probe
        idx_sharding = NamedSharding(self.mesh, P("shard"))
        self.index_hi = jax.device_put(jnp.asarray(t.planes), idx_sharding)
        # spill side table rides the index_lo slot, REPLICATED across the
        # mesh (tiny); matches count only on the shard owning the query's
        # primary bucket, so the psum stays exact
        repl = NamedSharding(self.mesh, P())
        self.index_lo = jax.device_put(
            jnp.asarray(t.spill) if t.sp
            else jnp.zeros(1, dtype=jnp.uint32),
            repl,
        )
        self._n_valid = jax.device_put(
            jnp.zeros(self.n_shard, dtype=jnp.int32), idx_sharding
        )
        self._max_run = 8
        mode = "compiled" if eng._pallas_mode() == "compiled" else "emulate"
        self._fn = self._compile_radix(mode, idx_sharding)
        self._fn_emul_cache = None
        return True

    def _fn_emul(self):
        if self._fn_emul_cache is None:
            idx_sharding = NamedSharding(self.mesh, P("shard"))
            self._fn_emul_cache = self._compile_radix("emulate", idx_sharding)
        return self._fn_emul_cache

    def _compile_radix(self, mode: str, idx_sharding):
        mesh = self.mesh
        gather_out = len({d.process_index for d in mesh.devices.flat}) > 1
        row_sharding = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        self._in_shardings = (
            (row_sharding,) * 9 + (idx_sharding, repl, idx_sharding)
        )
        p, kslots, npl, rows_local, sp = self._radix
        fn = functools.partial(
            _sharded_step_radix,
            k=self.k, w=self.w, budget=self.budget_per_shard,
            num_segments=self.Rs, p=p, kslots=kslots, npl=npl,
            rows_local=rows_local, l=self.l, stride=self._stride,
            mode=mode, sp=sp, gather_out=gather_out,
        )
        out_specs = (
            (P(), P(), P()) if gather_out
            else (P("data"), P("data"), P(("data",)))
        )
        smap_kwargs = dict(
            mesh=mesh,
            in_specs=(
                P("data"), P("data"), P("data"), P("data"),
                P("data"), P("data"), P("data"), P("data"), P("data"),
                P("shard"), P(), P("shard"),
            ),
            out_specs=out_specs,
        )
        try:
            mapped = shard_map(fn, check_vma=False, **smap_kwargs)
        except TypeError:
            mapped = shard_map(fn, check_rep=False, **smap_kwargs)
        return jax.jit(mapped, in_shardings=self._in_shardings)

    @classmethod
    def from_shards(
        cls,
        shards: list,
        k: int,
        w: int,
        mesh: Mesh,
        pad_to: int | None = None,
        max_run: int | None = None,
        row_len: int = 8192,
        rows_per_shard: int = 128,
        budget_frac: float | None = None,
    ) -> "ShardedPipeline":
        """Build from per-shard hash arrays instead of one global array.

        ``shards[j]`` is the sorted-unique u64 slice for mesh shard ``j``
        under value-range partitioning (store.load_index_shard), or None
        when shard ``j`` has no device addressable from this process — the
        memory-lean multi-host path: each host decodes and holds only its
        1/N of the index, and the global probe planes are assembled with
        jax.make_array_from_single_device_arrays (no host ever materializes
        the whole index).

        Multi-host callers MUST pass identical ``pad_to`` (common padded
        shard length, >= every shard's size) and ``max_run`` (static probe
        unroll; 16 covers any hash-uniform index — the chance of a 16-run
        of equal hi-words among even 5.5e8 uniform u64 keys is ~1e-5) on
        every process, so all processes compile the same program. The
        defaults (local max size / locally-observed runs) are only safe
        single-process.
        """
        self = cls.__new__(cls)
        self._init_geometry(k, w, mesh, row_len, rows_per_shard, budget_frac)
        # Input-dependent validation below may fail on ONE rank only (hash
        # skew vs pad_to, run-bound overflow, missing shard); raising before
        # the other ranks enter the collectives would hang the pod. All
        # checks funnel into `err`, then every rank reaches the agreement
        # point together and they abort (or proceed) as a group.
        err: Exception | None = None
        try:
            self._from_shards_validate(shards, pad_to, max_run)
        except ValueError as e:
            err = e
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(
                np.int32(0 if err is None else 1)
            )
            if int(np.asarray(flags).sum()):
                raise err if err is not None else ValueError(
                    "a peer process failed shard validation; see its log"
                )
        elif err is not None:
            raise err
        planes, pad_to, max_run = self._planes
        del self._planes

        idx_sharding = NamedSharding(mesh, P("shard"))
        pid = jax.process_index()
        pieces_hi, pieces_lo, pieces_nv = [], [], []
        for (_, j), dev in np.ndenumerate(mesh.devices):
            if dev.process_index != pid:
                continue
            hi, lo, nv = planes[j]
            pieces_hi.append(jax.device_put(jnp.asarray(hi), dev))
            pieces_lo.append(jax.device_put(jnp.asarray(lo), dev))
            pieces_nv.append(
                jax.device_put(jnp.asarray([nv], dtype=jnp.int32), dev)
            )
        gshape = (self.n_shard * pad_to,)
        self.index_hi = jax.make_array_from_single_device_arrays(
            gshape, idx_sharding, pieces_hi
        )
        self.index_lo = jax.make_array_from_single_device_arrays(
            gshape, idx_sharding, pieces_lo
        )
        self._n_valid = jax.make_array_from_single_device_arrays(
            (self.n_shard,), idx_sharding, pieces_nv
        )
        self._compile(max_run, idx_sharding)
        return self

    def _from_shards_validate(self, shards, pad_to, max_run) -> None:
        """Validation + probe-plane construction for from_shards; every
        input-dependent ValueError must originate here (see the agreement
        logic above). Leaves (planes, pad_to, max_run) in self._planes."""
        if len(shards) != self.n_shard:
            raise ValueError(
                f"need {self.n_shard} shards for this mesh, got {len(shards)}"
            )
        local = [np.asarray(s, dtype=np.uint64) for s in shards if s is not None]
        if not local:
            raise ValueError("no shard provided for any addressable device")
        sizes = [int(s.size) for s in local]
        if pad_to is None:
            pad_to = max(max(sizes), 1)
        pad_to = int(pad_to)
        if max(sizes) > pad_to:
            raise ValueError(
                f"largest shard ({max(sizes)}) exceeds pad_to={pad_to}; "
                "value-range skew — raise pad_to"
            )
        if self.n_shard * pad_to >= eng.PROBE_POSITION_LIMIT:
            # global positions (shard offset + local pos) double as
            # distinct-count keys (non-negative i32, engine._count_core);
            # beyond the limit, upper-shard positions would overflow
            raise ValueError(
                f"global padded index size {self.n_shard * pad_to} >= "
                f"{eng.PROBE_POSITION_LIMIT} exceeds the position-keyed "
                "probe's limit (~2.1e9 entries, ~5.2x panhuman-1); the "
                "host engine has no such limit"
            )
        # per-shard n_valid masks the pad region exactly (incl. empty shards)
        self._empty_index = False

        run_bound = 8
        planes: dict[int, tuple[np.ndarray, np.ndarray, int]] = {}
        for j, s in enumerate(shards):
            if s is None:
                continue
            # sort-preserving distinct-hi filler + n_valid mask (one shared
            # implementation with the server's DeviceHashProbe)
            hi, lo, nv, mr = eng.build_padded_shard_planes(s, pad_to)
            run_bound = max(run_bound, mr)
            planes[j] = (hi, lo, nv)
        if max_run is None:
            max_run = run_bound
        elif max_run < run_bound:
            raise ValueError(
                f"max_run={max_run} < locally observed run bound {run_bound}"
            )

        pid = jax.process_index()
        for (_, j), dev in np.ndenumerate(self.mesh.devices):
            if dev.process_index == pid and j not in planes:
                raise ValueError(
                    f"shard {j} is addressable from this process but was None"
                )
        self._planes = (planes, pad_to, max_run)

    def regeometry(self, rows_per_shard: int | None = None,
                   row_len: int | None = None) -> "ShardedPipeline":
        """Clone with a different batch geometry, sharing the device-resident
        index planes (no reload/re-device_put). Used to retry units whose
        row count overflows the current Rs (e.g. chromosome-scale records)."""
        clone = type(self).__new__(type(self))
        clone._init_geometry(
            self.k, self.w, self.mesh,
            self.L if row_len is None else row_len,
            self.Rs if rows_per_shard is None else rows_per_shard,
            self._budget_frac,
        )
        clone._empty_index = self._empty_index
        clone.index_hi = self.index_hi
        clone.index_lo = self.index_lo
        clone._n_valid = self._n_valid
        clone._max_run = self._max_run
        if self._radix is not None:
            # re-derive sizing for the new geometry; if the new (Q, P)
            # can't run the kernel, fall back to emulation mode (exact)
            from ..ops.radix_probe import _radix_sizing, split_bound

            p, kslots, npl, rows_local, sp = self._radix
            clone._radix = self._radix
            clone._raw_hashes = self._raw_hashes
            clone._fn_emul_cache = None
            clone.budget_per_shard = eng.v4_row_budget(
                clone.L, clone.w, clone._budget_frac
            )
            q2 = clone.Rs * clone.budget_per_shard
            import os as _os
            sz = _radix_sizing(q2, p, max_fw=rows_local, compacted=False)
            if sz is None and (
                _os.environ.get("DEACON_RADIX_SPLIT", "1") != "0"
                and q2 >= 4096
            ):
                qc2 = split_bound(q2)
                if qc2 < q2:
                    sz = _radix_sizing(qc2, p, max_fw=rows_local,
                                       compacted=True)
            mode = (
                "compiled"
                if eng._pallas_mode() == "compiled" and sz is not None
                and rows_local >= sz["fw"]
                and eng.engine_arch(clone.k, clone.L, clone.Rs) == 4
                else "emulate"
            )
            idx_sharding = NamedSharding(self.mesh, P("shard"))
            clone._fn = clone._compile_radix(mode, idx_sharding)
        else:
            clone._compile(
                self._max_run, NamedSharding(self.mesh, P("shard"))
            )
        return clone

    def _init_geometry(self, k, w, mesh, row_len, rows_per_shard, budget_frac):
        # every constructor path funnels through here; the radix probe
        # (arch 5) is opted in afterwards by _try_radix
        self._radix = None
        self._raw_hashes = None
        if budget_frac is None:
            budget_frac = eng.default_budget_frac(w)
        self._budget_frac = budget_frac
        self.k, self.w = int(k), int(w)
        self.l = self.k + self.w - 1
        self.mesh = mesh
        self.n_data = mesh.shape["data"]
        self.n_shard = mesh.shape["shard"]
        self.L = max(int(row_len), self.l)
        self.Rs = int(rows_per_shard)  # rows per data shard
        self.R = self.Rs * self.n_data
        if eng.engine_arch(self.k, self.L, self.Rs) == 4:
            # arch 4: budget is the PER-ROW slot count (engine_core_packed)
            self.budget_per_shard = eng.v4_row_budget(
                self.L, self.w, budget_frac
            )
        else:
            self.budget_per_shard = (
                int(budget_frac * self.L * self.Rs) + 191
            ) // 128 * 128
        self._stride = self.L - self.l + 1
        # cross-batch d2h amortizer (ops/engine.py FetchGroup). On a
        # process-spanning mesh (pod mode) the device-side concat is skipped:
        # a jit-chosen output sharding may not be fully addressable per host
        # (fetches are still batched per resolve).
        spans_procs = (
            len({d.process_index for d in mesh.devices.flat}) > 1
        )
        self.fetch_group = eng.FetchGroup(fuse=not spans_procs)

    def _compile(self, max_run: int, idx_sharding):
        self._max_run = max_run
        mesh = self.mesh
        # outputs only need replication when the mesh itself spans processes
        # (pod mode); a rank-local mesh in a multi-process runtime (pod-data)
        # reads its own P("data") outputs directly
        gather_out = (
            len({d.process_index for d in mesh.devices.flat}) > 1
        )
        row_sharding = NamedSharding(mesh, P("data"))
        self._in_shardings = (
            row_sharding,  # packed codes (R, L/4)
            row_sharding,  # packed validity (R, L/8)
            row_sharding,  # interleaved codes (kernel v3)
            row_sharding,  # interleaved validity
            row_sharding,  # mlen
            row_sharding,  # allow_short
            row_sharding,  # rid
            row_sharding,  # mate
            row_sharding,  # chunk_start
            idx_sharding,  # index hi plane
            idx_sharding,  # index lo plane
            idx_sharding,  # per-shard valid lengths
        )

        fn = functools.partial(
            _sharded_step,
            k=self.k,
            w=self.w,
            budget=self.budget_per_shard,
            num_segments=self.Rs,
            max_run=max_run,
            gather_out=gather_out,
        )
        out_specs = (
            (P(), P(), P()) if gather_out
            else (P("data"), P("data"), P(("data",)))
        )
        smap_kwargs = dict(
            mesh=mesh,
            in_specs=(
                P("data"), P("data"), P("data"), P("data"),
                P("data"), P("data"), P("data"), P("data"), P("data"),
                P("shard"), P("shard"), P("shard"),
            ),
            out_specs=out_specs,
        )
        try:  # jax >= 0.8 renamed check_rep -> check_vma
            mapped = shard_map(fn, check_vma=False, **smap_kwargs)
        except TypeError:
            mapped = shard_map(fn, check_rep=False, **smap_kwargs)
        self._fn = jax.jit(mapped, in_shardings=self._in_shardings)

    # ------------------------------------------------------------------
    def probe_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Membership of a raw u64 hash batch against the pipeline's
        resident sharded planes (psum over ``shard``). Serves the
        ``--debug`` path: host extraction supplies (hash, position, seq)
        per record while membership still runs on the mesh, so debug works
        without a host-resident index. On a process-spanning mesh every
        rank must call this with identical batches (the SPMD engine loop
        guarantees that)."""
        probe = getattr(self, "_hash_probe", None)
        if probe is None:
            if self._radix is not None:
                probe = eng.DeviceHashProbe(self._raw_hashes, self.mesh)
            else:
                probe = eng.DeviceHashProbe.from_planes(
                    self.index_hi, self.index_lo, self._n_valid,
                    self._max_run, self.mesh,
                )
            self._hash_probe = probe
        member = probe(np.asarray(hashes, dtype=np.uint64))
        if self._empty_index:
            member = np.zeros_like(member)
        return member

    def _rows_for(self, rid, mate, seq: bytes, prefix_length: int):
        return eng.rows_for_read(
            rid, mate, seq, prefix_length,
            k=self.k, l=self.l, stride=self._stride, max_len=self.L,
        )

    def _launch_counts(self, units, n_logical: int, prefix_length: int):
        """Pack + dispatch every global batch, returning a resolver.

        Dispatch is async (JAX only blocks on materialization), so the
        caller overlaps host read/format/write of neighboring batches with
        device compute — the same two-deep pipeline DevicePipeline has.
        BudgetOverflow may surface here (a unit wider than Rs rows) or at
        resolve time (minimizer budget exceeded on device).
        """
        # Assign whole units round-robin to data shards, capacity Rs rows each.
        # Each data shard keeps its own local rid numbering (< Rs).
        groups: list[list[eng._Row]] = []
        for gid, mates in units:
            rows = []
            for mate, seq in mates:
                rows.extend(self._rows_for(gid, mate, seq, prefix_length))
            if rows:
                if len(rows) > self.Rs:
                    raise eng.BudgetOverflow(
                        f"unit {gid} needs {len(rows)} rows > Rs={self.Rs}"
                    )
                groups.append(rows)

        batches = []  # (shard_gids, args, hits_dev, totals_dev, used_dev)
        gi = 0
        while gi < len(groups):
            # fill one global batch: n_data shards x Rs rows
            shard_rows: list[list[eng._Row]] = [[] for _ in range(self.n_data)]
            shard_gids: list[list[int]] = [[] for _ in range(self.n_data)]
            progressed = True
            while gi < len(groups) and progressed:
                progressed = False
                tgt = min(
                    range(self.n_data), key=lambda d: len(shard_rows[d])
                )
                if len(shard_rows[tgt]) + len(groups[gi]) <= self.Rs:
                    local_id = len(shard_gids[tgt])
                    if local_id < self.Rs:
                        for r in groups[gi]:
                            shard_rows[tgt].append(
                                eng._Row(local_id, r.mate, r.chunk_start, r.seq)
                            )
                        shard_gids[tgt].append(groups[gi][0].rid)
                        gi += 1
                        progressed = True
            args, outs = self._launch_global_batch(shard_rows)
            batches.append((shard_gids, args, *outs))

        flat_outs: list = []
        for _, _a, h_dev, t_dev, used_dev in batches:
            flat_outs.extend((h_dev, t_dev, used_dev))
        ticket = self.fetch_group.register(flat_outs)

        def resolve():
            hits = np.zeros(n_logical, dtype=np.int64)
            totals = np.zeros(n_logical, dtype=np.int64)
            fetched = self.fetch_group.materialize(ticket)
            for bi, (shard_gids, args, _h, _t, _u) in enumerate(batches):
                h, t, used = fetched[3 * bi : 3 * bi + 3]
                if self._radix is not None and int(used.max()) & (1 << 30):
                    import sys

                    print(
                        "deacon: note: radix probe span overflow — sharded "
                        "batch rerun via the emulation path",
                        file=sys.stderr,
                    )
                    h, t, used = (
                        np.asarray(x) for x in self._fn_emul()(*args)
                    )
                if int(used.max()) > self.budget_per_shard:
                    raise eng.BudgetOverflow(
                        f"minimizer budget exceeded: {used.max()} > "
                        f"{self.budget_per_shard}"
                    )
                h = h.astype(np.int64)
                t = t.astype(np.int64)
                if self._empty_index:
                    h = np.zeros_like(h)
                for d in range(self.n_data):
                    for li, g in enumerate(shard_gids[d]):
                        hits[g] += h[d * self.Rs + li]
                        totals[g] += t[d * self.Rs + li]
            return hits, totals

        return resolve

    def _counts(self, units, n_logical: int, prefix_length: int):
        return self._launch_counts(units, n_logical, prefix_length)()

    def _launch_global_batch(self, shard_rows: list[list[eng._Row]]):
        R, L = self.R, self.L
        codes_p = np.zeros((R, L // 4), dtype=np.uint8)
        valid_p = np.zeros((R, L // 8), dtype=np.uint8)
        mlen = np.full(R, -1, dtype=np.int32)
        allow_short = np.zeros(R, dtype=bool)
        rid = np.zeros(R, dtype=np.int32)
        mate = np.zeros(R, dtype=np.int32)
        cstart = np.zeros(R, dtype=np.int32)
        for d, rows in enumerate(shard_rows):
            base = d * self.Rs
            (codes_p[base : base + self.Rs], valid_p[base : base + self.Rs],
             mlen[base : base + self.Rs], allow_short[base : base + self.Rs],
             rid[base : base + self.Rs], mate[base : base + self.Rs],
             cstart[base : base + self.Rs]) = eng.pack_rows_packed(
                rows, self.Rs, L, self.k, self.l
            )
        if eng._v3_eligible(self.k, L, self.Rs):
            il_codes, il_valid = eng.host_interleave_packed(codes_p, valid_p)
        else:  # unused by the v2 path, but shard_map needs real (R, *) rows
            il_codes = np.zeros((R, 1), dtype=np.uint8)
            il_valid = np.zeros((R, 1), dtype=np.uint8)
        args = (
            jnp.asarray(codes_p), jnp.asarray(valid_p),
            jnp.asarray(il_codes), jnp.asarray(il_valid), jnp.asarray(mlen),
            jnp.asarray(allow_short), jnp.asarray(rid), jnp.asarray(mate),
            jnp.asarray(cstart), self.index_hi, self.index_lo, self._n_valid,
        )
        # inputs ride along only for the (rare) radix overflow rerun
        keep = args if self._radix is not None else None
        return keep, self._fn(*args)

    # ------------------------------------------------------------------
    def counts_single(self, seqs, prefix_length: int = 0):
        return self.launch_single(seqs, prefix_length)()

    def counts_paired(self, pairs, prefix_length: int = 0):
        return self.launch_paired(pairs, prefix_length)()

    def launch_single(self, seqs, prefix_length: int = 0):
        seqs = list(seqs)
        units = ((i, [(0, s)]) for i, s in enumerate(seqs))
        return self._launch_counts(units, len(seqs), prefix_length)

    def launch_paired(self, pairs, prefix_length: int = 0):
        pairs = list(pairs)
        units = ((i, [(0, s1), (1, s2)]) for i, (s1, s2) in enumerate(pairs))
        return self._launch_counts(units, len(pairs), prefix_length)
