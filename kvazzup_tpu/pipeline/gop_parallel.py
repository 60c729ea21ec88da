"""GOP-parallel encoding: distribute closed GOPs over a worker pool.

The multi-host scale-out axis of the TPU build (SURVEY §2.7: kvazaar's
OWF "frames in flight" generalized to segment-level data parallelism;
§2.8: GOP distribution over DCN hosts).  Each segment is an IDR-led
closed GOP — the IDR resets the DPB and POC, and parameter sets are
re-sent per segment (the reference's videoVPS behaviour,
kvazaarfilter.cpp:221) — so segments are fully independent encodes and
the concatenated bitstream is BYTE-IDENTICAL to a sequential encoder
running with vps_period=1.

The pool is pluggable: in-process threads (the device stage releases the
GIL during XLA execution, so device work overlaps across segments),
processes, or any executor with a `map` — a gRPC/DCN remote executor
drops in for real multi-host runs.
"""

from __future__ import annotations

from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

import numpy as np


def _encode_segment(args):
    cfg, frames, intra_period = args
    from ..encoder.top import Encoder

    enc = Encoder(cfg, intra_period=intra_period)
    out = b"".join(enc.encode_frame(*f)[0] for f in frames)
    return out


class GopParallelEncoder:
    """Encode a frame sequence as `gop_size`-frame closed GOPs in
    parallel; `executor` is "thread" (default), "process", or any object
    with a `map(fn, iterable)` method (e.g. a remote/DCN pool)."""

    def __init__(self, cfg, gop_size: int = 8, workers: int = 4,
                 executor="thread") -> None:
        if gop_size < 1:
            raise ValueError("gop_size must be >= 1")
        self.cfg = cfg
        self.gop_size = gop_size
        self.workers = workers
        self.executor = executor

    def encode(self, frames) -> bytes:
        """Frames: list of (y, u, v).  Returns the concatenated Annex-B
        stream (parameter sets lead every segment)."""
        segs = [frames[i : i + self.gop_size]
                for i in range(0, len(frames), self.gop_size)]
        jobs = [(self.cfg, seg, self.gop_size) for seg in segs]
        if hasattr(self.executor, "map"):
            results = list(self.executor.map(_encode_segment, jobs))
        elif self.executor == "process":
            with ProcessPoolExecutor(max_workers=self.workers) as ex:
                results = list(ex.map(_encode_segment, jobs))
        else:
            with ThreadPoolExecutor(max_workers=self.workers) as ex:
                results = list(ex.map(_encode_segment, jobs))
        return b"".join(results)


def encode_sequential_reference(cfg, frames, gop_size: int) -> bytes:
    """The equivalence baseline: one Encoder, vps_period=1 (parameter
    sets re-sent at every IDR), same GOP structure."""
    from ..encoder.top import Encoder

    enc = Encoder(cfg, intra_period=gop_size, vps_period=1)
    return b"".join(enc.encode_frame(*f)[0] for f in frames)
