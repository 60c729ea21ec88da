"""Session-parallel encoding: N live calls batched on one chip.

The reference runs one kvazaar instance per outgoing session on its own
threads (filtergraph.h:94-108 per-peer senders); here N sessions' frames
ride ONE vmapped device dispatch per tick — the wavefront's idle MXU rows
absorb the extra sessions (SURVEY §2.7 "session parallelism"), the same
mechanism gop_batch.py uses for GOP segments.  Host entropy coding runs
per session on a thread pool.

Each session's Annex-B output is byte-identical to a dedicated sequential
Encoder: the vmapped kernels run the same ops, just batched, and CABAC is
per-session (pinned by tests/test_sessions.py).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

import numpy as np
import jax.numpy as jnp

from ..core.params import StreamConfig
from ..encoder.top import Encoder
from .gop_batch import GopBatchDeviceEncoder


class MultiSessionEncoder:
    """Encode N independent low-delay sessions, one device dispatch per
    tick (two when intra phases are staggered: the I group and the P
    group batch separately)."""

    def __init__(self, cfg: StreamConfig, n_sessions: int,
                 intra_period: int = 64, cabac_workers: int = 4) -> None:
        self.cfg = cfg
        self.n = n_sessions
        self.intra_period = intra_period
        self._batcher = GopBatchDeviceEncoder(cfg, gop_size=intra_period,
                                              batch=n_sessions)
        self._enc = Encoder(cfg, intra_period=intra_period, vps_period=1)
        self._pool = ThreadPoolExecutor(max_workers=cabac_workers)
        self._recon = [None] * n_sessions  # per-session (ry, ru, rv)
        self._t = [0] * n_sessions         # per-session frame index

    def close(self) -> None:
        self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False

    def push(self, frames) -> list[bytes]:
        """frames: list of n (y, u, v) numpy frames (one per session).
        Returns the n per-session Annex-B chunks for this tick."""
        assert len(frames) == self.n
        is_i = [self._t[k] % self.intra_period == 0 for k in range(self.n)]
        futs: dict[int, object] = {}
        for want_i in (True, False):
            group = [k for k in range(self.n) if is_i[k] == want_i]
            if not group:
                continue
            b = len(group)
            step_i, step_p = self._batcher._fns(b)
            ys = jnp.stack([jnp.asarray(frames[k][0]) for k in group])
            us = jnp.stack([jnp.asarray(frames[k][1]) for k in group])
            vs = jnp.stack([jnp.asarray(frames[k][2]) for k in group])
            if want_i:
                out, recon, sao = step_i(ys, us, vs)
            else:
                ry = jnp.stack([self._recon[k][0] for k in group])
                ru = jnp.stack([self._recon[k][1] for k in group])
                rv = jnp.stack([self._recon[k][2] for k in group])
                out, recon, sao = step_p(ys, us, vs, ry, ru, rv)
            for j, k in enumerate(group):
                self._recon[k] = tuple(r[j] for r in recon)
                kind = "idr" if want_i else "p"
                first = want_i  # parameter sets re-sent at every IDR
                futs[k] = self._pool.submit(
                    self._batcher._entropy, self._enc, kind, out, sao,
                    recon, j, self._t[k] % self.intra_period, first)
        chunks = [futs[k].result() for k in range(self.n)]
        for k in range(self.n):
            self._t[k] += 1
        return chunks
