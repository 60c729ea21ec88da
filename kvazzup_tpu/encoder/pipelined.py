"""Frame-pipelined encoder: device compute overlaps host CABAC.

kvazaar's `--owf` ("open work frames", reference wiring:
/root/reference/src/media/processing/kvazaarfilter.cpp:203) keeps several
frames in flight so entropy coding of frame N never blocks the search of
frame N+1.  The TPU translation: `Encoder.encode_frame_device` is pure
JAX — dispatch is async and the reference-picture chain stays on-device —
so successive device stages queue onto the chip back-to-back while a
single host worker thread drains CABAC + NAL muxing in order (CABAC is
inherently sequential per frame; WPP already parallelizes inside one).

`depth` bounds frames in flight (device memory for recon + levels).
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor

from .top import Encoder


class PipelinedEncoder:
    """Same API shape as Encoder but asynchronous: push() accepts a frame,
    returns any finished (stream, recon) tuples; flush() drains the rest."""

    def __init__(self, cfg, intra_period: int = 1, depth: int = 3,
                 materialize_recon: bool = True) -> None:
        self.enc = Encoder(cfg, intra_period=intra_period)
        self.depth = max(1, depth)
        self.materialize_recon = materialize_recon
        # three stages in flight: device compute | device->host fetch | CABAC.
        # The fetch stage exists because the host link can be slower than
        # CABAC itself (remote-attached TPU); overlapping them bounds the
        # steady-state frame cost by max(transfer, cabac), not their sum.
        self._fetch_pool = ThreadPoolExecutor(max_workers=1)
        self._pool = ThreadPoolExecutor(max_workers=1)  # in-order CABAC
        self._pending: deque = deque()
        # cumulative per-stage accounting (each stage is a single worker
        # thread, so plain accumulation is safe): the e2e bottleneck
        # analysis and bench.py's co-located projection read these
        self.stage = {"fetch_s": 0.0, "fetch_bytes": 0, "cabac_s": 0.0,
                      "frames": 0}

    @staticmethod
    def _materialize(ctx):
        import numpy as np

        # entropy never reads out["recon_*"] (ctx["recon"] holds the
        # loop-filtered picture) — don't pay their transfer.  Coefficient
        # levels almost never exceed |127| at streaming QPs: fetch one
        # scalar to check, then ship int8 instead of int16 when safe
        # (halves the dominant device->host transfer again).
        out = dict(ctx["out"])
        lev_keys = [k for k in out if k.startswith("lev_")]
        if lev_keys:
            import jax.numpy as jnp

            maxabs = int(
                jnp.maximum(
                    jnp.abs(out["lev_y"]).max(),
                    jnp.maximum(
                        jnp.abs(out["lev_cb"]).max(), jnp.abs(out["lev_cr"]).max()
                    ),
                )
            )
            if maxabs <= 127:
                for k in lev_keys:
                    out[k] = out[k].astype(jnp.int8)
        ctx["out"] = {
            k: (v if k.startswith("recon") else np.asarray(v))
            for k, v in out.items()
        }
        if "dev" in ctx:  # multi-slice: materialize each strip's arrays
            ctx["dev"]["strips"] = [
                {k: (v if k.startswith("recon") else np.asarray(v))
                 for k, v in s.items()}
                for s in ctx["dev"]["strips"]
            ]
        return ctx

    def _materialize_timed(self, ctx):
        import time as _time

        t0 = _time.monotonic()
        ctx = self._materialize(ctx)
        self.stage["fetch_s"] += _time.monotonic() - t0
        import numpy as _np

        self.stage["fetch_bytes"] += sum(
            v.nbytes for v in ctx["out"].values()
            if isinstance(v, _np.ndarray))
        return ctx

    def _entropy_timed(self, f):
        import time as _time

        ctx = f.result()
        t0 = _time.monotonic()
        out = self.enc.encode_frame_entropy(ctx, self.materialize_recon)
        self.stage["cabac_s"] += _time.monotonic() - t0
        self.stage["frames"] += 1
        return out

    def push(self, y, u, v, qp=None, qp_map=None):
        ctx = self.enc.encode_frame_device(y, u, v, qp, qp_map)
        fetched = self._fetch_pool.submit(self._materialize_timed, ctx)
        self._pending.append(
            self._pool.submit(self._entropy_timed, fetched)
        )
        done = []
        while self._pending and (
            len(self._pending) > self.depth or self._pending[0].done()
        ):
            done.append(self._pending.popleft().result())
        return done

    def flush(self):
        out = [f.result() for f in self._pending]
        self._pending.clear()
        return out

    def close(self) -> None:
        self.flush()
        self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc) -> None:
        self.close()
