"""DCN TCP worker pool (pipeline/dcn.py): GOP segments dispatched to
worker PROCESSES over real sockets concatenate byte-identically to the
sequential encoder, and a mid-run worker loss re-dispatches its jobs to
the survivors (SURVEY §2.8 DCN backend; §5 failure detection/recovery).
Reference analogue: uvgComm trusts one kvazaar instance per host —
kvazzup_tpu scales a single stream across hosts by closed-GOP segments
(/root/reference/src/media/processing/kvazaarfilter.cpp:221 videoVPS
re-send is what makes segments independent)."""

import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.io.yuv import synthetic_frames
from kvazzup_tpu.pipeline.dcn import DcnJobError, DcnPool, spawn_local_workers
from kvazzup_tpu.pipeline.gop_parallel import (
    GopParallelEncoder,
    encode_sequential_reference,
)


def _terminate(procs):
    for p in procs:
        p.terminate()
    for p in procs:
        p.wait(timeout=10)


def test_dcn_pool_map_and_failure_redispatch():
    """8 cheap jobs over [dies-after-1-job, healthy]: order preserved,
    the lost worker's jobs land on the survivor."""
    flaky, flaky_addr = spawn_local_workers(1, extra_args=["--max-jobs", "1"])
    healthy, healthy_addr = spawn_local_workers(1)
    procs = flaky + healthy
    try:
        pool = DcnPool(flaky_addr + healthy_addr)
        assert pool.map(abs, [-i for i in range(8)]) == list(range(8))
    finally:
        _terminate(procs)


def test_dcn_job_error_propagates():
    procs, addrs = spawn_local_workers(1)
    try:
        with pytest.raises(DcnJobError):
            DcnPool(addrs).map(int, ["not-a-number"])
    finally:
        _terminate(procs)


def test_dcn_all_workers_lost():
    procs, addrs = spawn_local_workers(1, extra_args=["--max-jobs", "1"])
    try:
        with pytest.raises(ConnectionError):
            DcnPool(addrs).map(abs, [-1, -2, -3])
    finally:
        _terminate(procs)


def test_dcn_gop_encode_byte_identical():
    """The production composition: GopParallelEncoder over the DCN pool.
    Two worker processes each stand in for a remote host."""
    procs, addrs = spawn_local_workers(2)
    try:
        w, h = 64, 64
        frames = synthetic_frames(w, h, 4, seed=9)
        cfg = StreamConfig(width=w, height=h, qp=32)
        par = GopParallelEncoder(cfg, gop_size=2,
                                 executor=DcnPool(addrs)).encode(frames)
        seq = encode_sequential_reference(cfg, frames, gop_size=2)
        assert par == seq
    finally:
        _terminate(procs)
