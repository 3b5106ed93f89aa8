"""Data-parallel batch runner: pairs sharded over the mesh's data axis.

Each device fills an independent slab of the batch with the Gotoh kernel
(ops.nw_affine) under shard_map; scores come back either sharded (left on
device for the next pipeline stage) or gathered to every host via an XLA
all_gather over ICI/DCN -- the merge pattern of BASELINE config 5.

Per-pair failure isolation is structural: invalid rows (PairBatch.valid
False) are padding that aligns to score 0 and is dropped on the host, so a
bad pair can never poison its neighbors (the batch-level analog of the
reference driver's per-pair error handling, src/main.rs:68-76).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from sequencealigning_tpu.config import ScoringScheme
from sequencealigning_tpu.io.encode import PairBatch, round_up, trim_for_stream
from sequencealigning_tpu.ops.nw_affine import (
    _gotoh_fill_lax,
    gotoh_fill_pallas,
)
from sequencealigning_tpu.ops.nw_affine_modes import modes_reduce
from sequencealigning_tpu.ops.nw_affine_stream import (
    capture_params,
    gotoh_fill_stream_lax,
    gotoh_fill_stream_pallas,
    plan_stream,
    stream_finals,
)
from sequencealigning_tpu.ops.nw_affine_stream_modes import (
    gotoh_fill_stream_modes_lax,
    gotoh_fill_stream_modes_pallas,
    stream_modes_lanes,
)
from sequencealigning_tpu.parallel.mesh import make_mesh


def _mk_streams(q_r, d_r, plan):
    """Per-row code streams from the compact (R_loc, NP, L) int8 batch,
    built on device (host->device traffic = 1 byte/char)."""
    S, T = plan.s, plan.t_total

    def one(a):
        r, np_, l = a.shape
        s_ = jnp.pad(a.astype(jnp.int32), ((0, 0), (0, 0), (1, S - l - 1)))
        s_ = s_.reshape(r, np_ * S)
        return jnp.pad(s_, ((0, 0), (0, T - np_ * S)))

    return one(q_r), one(d_r)


class DataParallelRunner:
    """Shards batches of pairs over mesh axis 'data' and runs the fill.

    backend: 'pallas' (TPU), 'lax', or 'auto'.
    """

    def __init__(
        self,
        mesh: Optional[Mesh] = None,
        scheme: ScoringScheme = ScoringScheme(),
        compat: bool = True,
        wildcard: bool = False,
        backend: str = "auto",
        gather: bool = True,
        kernel: str = "stream",
        np_slots: int = 32,
        bt: int = 16,
        state_dtype="i32",
        traceback: str = "auto",
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.scheme = scheme
        self.compat = compat
        self.wildcard = wildcard
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "lax"
        self.backend = backend
        self.gather = gather
        if kernel not in ("stream", "plain"):
            raise ValueError(f"unknown kernel {kernel!r}")
        self.kernel = kernel
        self.np_slots = np_slots
        self.bt = bt
        # "i32" | "i16" | "auto" | dtype, resolved per plan at fn-build
        # time (ops.nw_affine_stream.resolve_stream_state).
        self.state_dtype = state_dtype
        # fast4 traceback routing for the streaming cigars path:
        # "auto" (device walk when the fill ran on TPU) / "host" /
        # "device" (ops.traceback_device.use_device_walk).
        self.traceback = traceback
        self._fn_cache = {}

    @property
    def n_devices(self) -> int:
        return int(np.prod(self.mesh.devices.shape))

    def _sharded_fn(self, l1: int, l2: int, p: int):
        key = (l1, l2, p, self.gather)
        if key in self._fn_cache:
            return self._fn_cache[key]
        scheme, compat, wildcard = self.scheme, self.compat, self.wildcard
        backend, gather = self.backend, self.gather

        def per_shard(seq1, s2v, dsum, n2mask):
            if backend == "pallas":
                finals, _ = gotoh_fill_pallas(
                    seq1, s2v, dsum, n2mask, l1, l2,
                    scheme, compat, wildcard, with_dirs=False,
                )
            else:
                finals, _ = _gotoh_fill_lax(
                    seq1, s2v, dsum, n2mask != 0, l1, l2,
                    scheme, compat, wildcard, with_dirs=False,
                )
            if gather:
                # Result merge over ICI/DCN: every host sees every score.
                finals = jax.lax.all_gather(
                    finals, "data", axis=0, tiled=True
                )
            return finals

        spec = P("data")
        out_spec = P() if gather else P("data")
        fn = jax.jit(
            jax.shard_map(
                per_shard,
                mesh=self.mesh,
                in_specs=(spec, spec, spec, spec),
                out_specs=out_spec,
                # all_gather(tiled) output is value-replicated; opt out of
                # the static varying-axes proof for the P() out_spec.
                check_vma=False,
            )
        )
        self._fn_cache[key] = fn
        return fn

    def _stream_fn(self, plan, dirs_mode=False):
        from sequencealigning_tpu.ops.nw_affine_stream import (
            resolve_stream_state,
        )

        sdt = resolve_stream_state(self.state_dtype, self.scheme, plan)
        key = ("stream", plan, self.gather, dirs_mode, jnp.dtype(sdt).name)
        if key in self._fn_cache:
            return self._fn_cache[key]
        scheme, compat, wildcard = self.scheme, self.compat, self.wildcard
        backend, bt, gather = self.backend, self.bt, self.gather
        NP = plan.np_slots

        def per_shard(q_r, d_r, dsy, n2y, dso, n2o):
            qstream, dstream = _mk_streams(q_r, d_r, plan)
            if backend == "pallas":
                outs, dirs = gotoh_fill_stream_pallas(
                    qstream, dstream, dsy, n2y, dso, n2o,
                    plan, scheme, compat, wildcard, dirs_mode=dirs_mode,
                    bt=bt, state_dtype=sdt,
                )
                finals = stream_finals(outs, NP)
            else:
                (fm, fi, fd), dirs = gotoh_fill_stream_lax(
                    qstream, dstream, dsy[:NP, :, 0], n2y[:NP, :, 0],
                    plan, scheme, compat, wildcard, dirs_mode=dirs_mode,
                    state_dtype=sdt,
                )
                finals = jnp.stack(
                    [fm.T.reshape(-1), fi.T.reshape(-1), fd.T.reshape(-1)],
                    axis=1,
                )
            if gather:
                finals = jax.lax.all_gather(finals, "data", axis=0, tiled=True)
            if dirs_mode:
                # dirs stay row-sharded (huge); the host fetches them per
                # drained batch for traceback.
                return finals, dirs
            return finals

        row = P("data")
        slot = P(None, "data")
        out_specs = (
            ((P() if gather else P("data")), P(None, "data"))
            if dirs_mode
            else (P() if gather else P("data"))
        )
        fn = jax.jit(
            jax.shard_map(
                per_shard,
                mesh=self.mesh,
                in_specs=(row, row, slot, slot, slot, slot),
                out_specs=out_specs,
                check_vma=False,
            )
        )
        self._fn_cache[key] = fn
        return fn

    def _stream_modes_fn(self, plan, mode: str, with_dirs: bool):
        from sequencealigning_tpu.ops.nw_affine_stream import (
            resolve_stream_state,
        )

        sdt = resolve_stream_state(self.state_dtype, self.scheme, plan)
        key = (
            "stream_modes", plan, self.gather, mode, with_dirs,
            jnp.dtype(sdt).name,
        )
        if key in self._fn_cache:
            return self._fn_cache[key]
        scheme, wildcard = self.scheme, self.wildcard
        backend, bt, gather = self.backend, self.bt, self.gather
        NP = plan.np_slots

        def per_shard(q_r, d_r, dsy, n2y, dso, n2o):
            qstream, dstream = _mk_streams(q_r, d_r, plan)
            if backend == "pallas":
                outs, dirs = gotoh_fill_stream_modes_pallas(
                    qstream, dstream, dsy, n2y, dso, n2o,
                    plan, scheme, wildcard, mode, with_dirs, bt=bt,
                    state_dtype=sdt,
                )
                bv, bd = stream_modes_lanes(outs, NP)
            else:
                (bv_k, bd_k), dirs = gotoh_fill_stream_modes_lax(
                    qstream, dstream, dsy[:NP, :, 0], n2y[:NP, :, 0],
                    plan, scheme, wildcard, mode, with_dirs,
                    state_dtype=sdt,
                )
                bv = jnp.swapaxes(bv_k, 0, 1).reshape(-1, plan.p)
                bd = jnp.swapaxes(bd_k, 0, 1).reshape(-1, plan.p)
            # Per-pair end-cell reduction on device, per shard (each
            # pair's lanes are shard-local) -- the gather/fetch then moves
            # 3 ints per pair instead of 2 * P.
            best, x, y = modes_reduce(bv, bd)
            if gather:
                best = jax.lax.all_gather(best, "data", axis=0, tiled=True)
                x = jax.lax.all_gather(x, "data", axis=0, tiled=True)
                y = jax.lax.all_gather(y, "data", axis=0, tiled=True)
            if with_dirs:
                # dirs stay row-sharded (huge); host fetches per batch.
                return best, x, y, dirs
            return best, x, y

        row = P("data")
        slot = P(None, "data")
        pair_spec = P() if gather else P("data")
        out_specs = (
            (pair_spec, pair_spec, pair_spec, P(None, "data"))
            if with_dirs
            else (pair_spec, pair_spec, pair_spec)
        )
        fn = jax.jit(
            jax.shard_map(
                per_shard,
                mesh=self.mesh,
                in_specs=(row, row, slot, slot, slot, slot),
                out_specs=out_specs,
                check_vma=False,
            )
        )
        self._fn_cache[key] = fn
        return fn

    def fill_modes(self, batch: PairBatch, mode: str, with_dirs: bool = True):
        """Semi-global/local streamed fill on the runner's mesh (textbook
        semantics; ops.nw_affine_stream_modes).  Returns (best[:B],
        best_x[:B], best_y[:B], dirs, plan) -- each pair's end cell,
        reduced on device; walk dirs from (x, y) with
        d_offset = slot * plan.s."""
        if self.kernel != "stream":
            raise ValueError("fill_modes requires kernel='stream'")
        if mode not in ("semi", "local"):
            raise ValueError(f"unknown mode {mode!r}")
        args, plan, B = self._stream_args(batch)
        out = self._stream_modes_fn(plan, mode, with_dirs)(*args)
        if with_dirs:
            best, x, y, dirs = out
        else:
            (best, x, y), dirs = out, None
        return best[:B], x[:B], y[:B], dirs, plan

    def _stream_args(self, batch: PairBatch):
        """(device args, plan, B) for the streamed fill, sharded over the
        mesh's data axis."""
        nd = self.n_devices
        batch = trim_for_stream(batch)
        B = batch.query.shape[0]
        L1 = batch.query.shape[1]
        L2 = batch.db.shape[1]
        NP = max(1, min(self.np_slots, B // (8 * nd)))
        Bp = round_up(max(B, NP * 8 * nd), NP * 8 * nd)
        plan = plan_stream(Bp, L1, L2, np_slots=NP)
        assert plan.n_rows % (8 * nd) == 0, (plan, nd)

        def pad(a, fill):
            out = np.full((Bp,) + a.shape[1:], fill, dtype=np.int32)
            out[:B] = a
            return out

        R = plan.n_rows
        q_all = pad(np.asarray(batch.query, np.int32), 0).astype(np.int8)
        d_all = pad(np.asarray(batch.db, np.int32), 0).astype(np.int8)
        qlen = pad(np.asarray(batch.query_len, np.int32), 1)
        dlen = pad(np.asarray(batch.db_len, np.int32), 1)
        q_r = q_all.reshape(R, NP, L1)
        d_r = d_all.reshape(R, NP, L2)
        dsy, n2y, dso, n2o = capture_params(qlen, dlen, plan)

        row = NamedSharding(self.mesh, P("data"))
        slot = NamedSharding(self.mesh, P(None, "data"))
        args = [
            jax.device_put(a, s)
            for a, s in zip(
                (q_r, d_r, dsy, n2y, dso, n2o),
                (row, row, slot, slot, slot, slot),
            )
        ]
        return args, plan, B

    def _scores_stream(self, batch: PairBatch):
        args, plan, B = self._stream_args(batch)
        finals = self._stream_fn(plan)(*args)
        return finals[:B]

    def device_walk_fast4(self, dirs, plan, finals, seqs1, seqs2):
        """On-device fast4 traceback over the runner's row-sharded dirs
        tensor (fill_with_dirs output): each device walks exactly the
        pairs whose rows it holds (shard_map over 'data'; pair order is
        row-major, so pair blocks align with row shards), and only the
        2-bit packed op codes cross the device boundary (~(l1+l2)/4
        bytes/pair vs the 0.5 byte/cell dirs fetch of the host path).

        Returns a traceback_stream_batch-shaped list: (score, [(a1, a2)])
        or AlignmentError per pair; a pair whose device walk fails
        validation falls back to fetching its single dirs row."""
        from sequencealigning_tpu.errors import AlignmentError
        from sequencealigning_tpu.ops import traceback_device as tbd
        from sequencealigning_tpu.ops.traceback import fast4_traceback_pair

        finals = np.asarray(finals)
        B = len(seqs1)
        nd = self.n_devices
        NP, R = plan.np_slots, plan.n_rows
        Bp = NP * R
        n1 = np.ones(Bp, np.int32)
        n2 = np.ones(Bp, np.int32)
        n1[:B] = [len(s) for s in seqs1]
        n2[:B] = [len(s) for s in seqs2]
        p0 = np.zeros(Bp, np.int32)
        p0[:B] = tbd.seed_planes(finals[:B])
        bs = np.arange(Bp)
        rowloc = ((bs // NP) % (R // nd)).astype(np.int32)  # shard-local
        off = ((bs % NP) * plan.s).astype(np.int32)
        t_steps = int(plan.l1 + plan.l2)

        key = ("walk", plan)
        if key not in self._fn_cache:

            def per_shard(dirs_l, x0, y0, pl0, rowp, offp):
                # Drop the per-shard n_chunks_used scalar (shards may
                # exit at different chunks; the full packed buffer is
                # gathered either way).
                (x, y), packed, _n = tbd._walk_fast4_impl(
                    dirs_l, x0, y0, pl0, rowp, offp, t_steps=t_steps
                )
                return (x, y), packed

            pb = P("data")
            self._fn_cache[key] = jax.jit(
                jax.shard_map(
                    per_shard,
                    mesh=self.mesh,
                    in_specs=(P(None, "data", None), pb, pb, pb, pb, pb),
                    out_specs=((pb, pb), P("data", None)),
                    check_vma=False,
                )
            )
        shard = NamedSharding(self.mesh, P("data"))
        args = [
            jax.device_put(a, shard)
            for a in (n2, n1, p0, rowloc, off)  # x walks db, y walks query
        ]
        (xf, yf), packed = self._fn_cache[key](dirs, *args)
        packed, xf, yf = jax.device_get((packed[:B], xf[:B], yf[:B]))
        alns = tbd.decode_packed_alignments(packed, seqs1, seqs2)
        ended = (xf == 0) & (yf == 0)
        out = []
        for b in range(B):
            if alns[b] is None or not ended[b]:
                row, _slot, doff = plan.pair_coords(b)
                try:
                    out.append(
                        fast4_traceback_pair(
                            np.asarray(dirs[:, row, :]), finals[b],
                            seqs1[b], seqs2[b], compat=self.compat,
                            d_offset=doff,
                        )
                    )
                except AlignmentError as e:
                    out.append(e)
                continue
            out.append((int(finals[b].max()), [alns[b]]))
        return out

    def device_walk_modes(
        self, dirs, plan, best_x, best_y, seqs1, seqs2, mode: str
    ):
        """Sharded on-device walk over fill_modes' row-sharded full-byte
        dirs (mirrors device_walk_fast4).  Returns, per pair, the walked
        segment (mid1, mid2, stop_x, stop_y) -- the caller assembles the
        free end gaps (semi) or start coordinates (local) -- or None
        where the walk failed validation (fall back to the host walkers
        on a fetched dirs row)."""
        from sequencealigning_tpu.ops import traceback_device as tbd

        local = mode == "local"
        B = len(seqs1)
        nd = self.n_devices
        NP, R = plan.np_slots, plan.n_rows
        Bp = NP * R
        x0 = np.zeros(Bp, np.int32)
        y0 = np.zeros(Bp, np.int32)
        x0[:B] = np.asarray(best_x[:B], np.int32)
        y0[:B] = np.asarray(best_y[:B], np.int32)
        bs = np.arange(Bp)
        rowloc = ((bs // NP) % (R // nd)).astype(np.int32)
        off = ((bs % NP) * plan.s).astype(np.int32)
        t_steps = int(plan.l1 + plan.l2)

        key = ("walk_modes", plan, local)
        if key not in self._fn_cache:

            def per_shard(dirs_l, x_, y_, rowp_, off_):
                (x, y, st), packed, _n = tbd._walk_modes_impl(
                    dirs_l, x_, y_, rowp_, off_, local=local,
                    t_steps=t_steps,
                )
                return (x, y, st), packed

            pb = P("data")
            self._fn_cache[key] = jax.jit(
                jax.shard_map(
                    per_shard,
                    mesh=self.mesh,
                    in_specs=(P(None, "data", None), pb, pb, pb, pb),
                    out_specs=((pb, pb, pb), P("data", None)),
                    check_vma=False,
                )
            )
        shard = NamedSharding(self.mesh, P("data"))
        args = [
            jax.device_put(a, shard) for a in (x0, y0, rowloc, off)
        ]
        (xf, yf, st), packed = self._fn_cache[key](dirs, *args)
        packed, xf, yf, st = jax.device_get(
            (packed[:B], xf[:B], yf[:B], st[:B])
        )
        return tbd.decode_modes_walk(
            packed, xf, yf, st, x0[:B], y0[:B], seqs1, seqs2
        )

    def fill_with_dirs(self, batch: PairBatch, dirs_mode: str = "fast4"):
        """Streamed fill WITH direction words, on the runner's mesh (the
        round-1 cigars path silently ran single-device): returns
        (finals[:B] -- gathered per self.gather, dirs -- row-sharded device
        array in the stream layout, plan).  Host traceback:
        ops.traceback.traceback_stream_batch(np.asarray(dirs), ...)."""
        if self.kernel != "stream":
            raise ValueError("fill_with_dirs requires kernel='stream'")
        args, plan, B = self._stream_args(batch)
        finals, dirs = self._stream_fn(plan, dirs_mode=dirs_mode)(*args)
        return finals[:B], dirs, plan

    def scores(self, batch: PairBatch):
        """Returns (B, 3) int32 finals (M/I/D at each pair's corner).

        The batch size is padded up to a multiple of 8 * n_devices
        (kernel='stream' pads to np_slots * 8 * n_devices).
        """
        if self.kernel == "stream":
            return self._scores_stream(batch)
        nd = self.n_devices
        B = batch.query.shape[0]
        Bp = round_up(max(B, 8 * nd), 8 * nd)
        L1 = batch.query.shape[1]
        L2 = batch.db.shape[1]
        P_ = round_up(L2 + 1, 128)

        def pad(a, fill=0):
            out = np.full((Bp,) + a.shape[1:], fill, dtype=a.dtype)
            out[:B] = a
            return out

        query = pad(np.asarray(batch.query, np.int32))
        s2v = np.zeros((Bp, P_), np.int32)
        s2v[:B, 1 : L2 + 1] = batch.db
        dlen = pad(np.asarray(batch.db_len, np.int32))
        qlen = pad(np.asarray(batch.query_len, np.int32))
        dsum = (qlen + dlen)[:, None].astype(np.int32)
        n2mask = (
            np.arange(P_, dtype=np.int32)[None, :] == dlen[:, None]
        ).astype(np.int32)

        fn = self._sharded_fn(L1, L2, P_)
        sharding = NamedSharding(self.mesh, P("data"))
        args = [
            jax.device_put(a, sharding)
            for a in (query, s2v, dsum, n2mask)
        ]
        finals = fn(*args)
        # Returned as a (lazy) device array so callers can pipeline; slice
        # off the batch padding.
        return finals[:B]
