"""QuadRABatchEncoder (level-batched RA B-pyramid) must be byte-identical
to the sequential QuadRAEncoder — vmap batches the same ops per lane and
the finish tail is shared code (encoder/ra_batch.py).

The sequential reference runs in a SUBPROCESS: one process compiling both
encoders' full jit sets aborts in jaxlib's cache serialize under the
combined compile load (see pytest.ini); splitting halves each process's
compile count and peak memory."""

import os
import pickle
import subprocess
import sys

# this file's compile mix (vmapped b64 engines) deterministically aborts
# jaxlib's executable.serialize() in the persistent-cache put path; keep
# cache READS, skip writes (utils/cache.py)
os.environ["KVZ_TPU_CACHE_NO_PUT"] = "1"
# and unroll the wave scans 1x: the 2x-unrolled vmap4 b64 program OOMs
# the LLVM CPU backend when other xdist workers compile concurrently
# (unroll is bit-exact — speed-only)
os.environ["KVZ_TPU_QUAD_UNROLL"] = "1"
os.environ["KVZ_TPU_WAVE_UNROLL"] = "1"

import numpy as np

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.encoder.ra_batch import QuadRABatchEncoder
from kvazzup_tpu.io.yuv import synthetic_frames

_SEQ_SCRIPT = r"""
import pickle, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")
import cpu_env  # noqa: F401
import numpy as np
from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.encoder.ra import QuadRAEncoder

inp, outp = sys.argv[1], sys.argv[2]
with open(inp, "rb") as f:
    job = pickle.load(f)
cfg = StreamConfig(**job["cfg"])
enc = QuadRAEncoder(cfg, gop_size=job["gop"], intra_period=32)
nals = {}
for (y, u, v) in job["frames"]:
    for poc, nal, rec in enc.push_frame(y, u, v):
        nals[poc] = nal
for poc, nal, rec in enc.flush():
    nals[poc] = nal
with open(outp, "wb") as f:
    pickle.dump(nals, f)
"""


def _cfg_kwargs(w, h, **kw):
    kw.setdefault("deblocking_enabled", True)
    return dict(width=w, height=h, qp=32, ctb_log2=6, min_cb_log2=3,
                max_tb_log2=5, num_reorder_pics=3,
                max_dec_pic_buffering=6, **kw)


def _cfg(w, h, **kw):
    return StreamConfig(**_cfg_kwargs(w, h, **kw))


def _encode_seq_subprocess(cfg_kwargs, frames, gop_size, tmp_path):
    inp = tmp_path / "job.pkl"
    outp = tmp_path / "nals.pkl"
    with open(inp, "wb") as f:
        pickle.dump({"cfg": cfg_kwargs, "frames": frames, "gop": gop_size}, f)
    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu")
    # Serialize the reference subprocesses across xdist workers: each one
    # compiles a full sequential-RA jit set (minutes of LLVM work, GBs of
    # peak RSS); two at once on this 4-core rig thrash and have deadlocked
    # the suite (VERDICT r4 weak #2).
    import fcntl
    lock_path = os.path.join(os.path.dirname(__file__), ".ra_seq.lock")
    with open(lock_path, "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        r = subprocess.run([sys.executable, "-c", _SEQ_SCRIPT, str(inp),
                            str(outp)], env=env, capture_output=True,
                           text=True, timeout=2400)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(outp, "rb") as f:
        return pickle.load(f)


def _encode(enc_cls, cfg, frames, gop_size, **kw):
    enc = enc_cls(cfg, gop_size=gop_size, intra_period=32)
    nals = {}
    recs = {}
    for (y, u, v) in frames:
        for poc, nal, rec in enc.push_frame(y, u, v, **kw):
            nals[poc] = nal
            recs[poc] = rec
    for poc, nal, rec in enc.flush():
        nals[poc] = nal
        recs[poc] = rec
    return nals, recs


def test_ra_batch_gop8_byte_identical(tmp_path):
    w, h = 192, 128
    frames = synthetic_frames(w, h, 11, seed=17)
    kwargs = _cfg_kwargs(w, h, wpp=True, sao_enabled=True, merge_cand=5,
                         temporal_mvp=True, rdoq=True)
    seq = _encode_seq_subprocess(kwargs, frames, 8, tmp_path)
    bat, _ = _encode(QuadRABatchEncoder, StreamConfig(**kwargs), frames, 8)
    assert sorted(seq) == sorted(bat)
    for poc in sorted(seq):
        assert seq[poc] == bat[poc], f"stream mismatch at poc {poc}"


# gop4 lives in test_ra_batch_gop4.py: one heavy byte-identity case per
# xdist worker keeps each below the jaxlib compile-count segfault
# threshold (see pytest.ini).
