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

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from sequencealigning_tpu.config import ScoringScheme
from sequencealigning_tpu.io.encode import PairBatch, round_up
from sequencealigning_tpu.ops.nw_affine import (
    _gotoh_fill_lax,
    gotoh_fill_pallas,
)
from sequencealigning_tpu.parallel.mesh import make_mesh


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
    ):
        self.mesh = mesh if mesh is not None else make_mesh()
        self.scheme = scheme
        self.compat = compat
        self.wildcard = wildcard
        if backend == "auto":
            backend = "pallas" if jax.default_backend() == "tpu" else "lax"
        self.backend = backend
        self.gather = gather
        self._fn_cache = {}

    @property
    def n_devices(self) -> int:
        return int(np.prod(self.mesh.devices.shape))

    def _sharded_fn(self, l1: int, l2: int, p: int):
        key = (l1, l2, p)
        if key in self._fn_cache:
            return self._fn_cache[key]
        scheme, compat, wildcard = self.scheme, self.compat, self.wildcard
        backend = self.backend

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
            if self.gather:
                # Result merge over ICI/DCN: every host sees every score.
                finals = jax.lax.all_gather(
                    finals, "data", axis=0, tiled=True
                )
            return finals

        spec = P("data")
        out_spec = P() if self.gather else P("data")
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

    def scores(self, batch: PairBatch):
        """Returns (B, 3) int32 finals (M/I/D at each pair's corner).

        The batch size is padded up to a multiple of 8 * n_devices.
        """
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
