"""Device-native CTB32 quadtree intra encoder (encoder/frame_intra32.py).

The TPU wavefront replacement for the host-sequential cu32.py recursion
(kvazaar `search.c` depth-0/1 at CTB32): streams must decode bit-exactly
in our own decoder AND in libavcodec, and the device recon must equal
the decode — at sizes that mix CU32 leaves and 4xCU16 splits.
"""

import subprocess

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.io.yuv import synthetic_frames, write_yuv420

from test_e2e_intra import _ensure_oracle


def _cfg(w, h, qp, deblock=True, sao=False, fast=True):
    return StreamConfig(width=w, height=h, qp=qp, ctb_log2=5, min_cb_log2=3,
                        max_tb_log2=5, deblocking_enabled=deblock,
                        sao_enabled=sao, fast_decision=fast)


@pytest.mark.parametrize("w,h,qp,deblock", [
    (96, 64, 31, True),
    (64, 64, 38, False),
    (160, 96, 26, True),
])
def test_intra32_device_self_decode(w, h, qp, deblock):
    y, u, v = synthetic_frames(w, h, 1, seed=9)[0]
    enc = Encoder(_cfg(w, h, qp, deblock))
    stream, recon = enc.encode_frame(y, u, v)
    dec = Decoder().decode(stream)
    for p in range(3):
        assert np.array_equal(np.asarray(dec[0][p]), np.asarray(recon[p])), p


def test_intra32_device_split_mix():
    """The dense split decision must actually produce a mix of CU32 leaves
    and CU16 splits on structured content (otherwise the quadtree buys
    nothing)."""
    import jax.numpy as jnp

    from kvazzup_tpu.encoder.frame_intra32 import encode_frame_intra32_fast

    w, h = 160, 96
    y, u, v = synthetic_frames(w, h, 1, seed=7)[0]
    out = encode_frame_intra32_fast(jnp.asarray(y), jnp.asarray(u),
                                    jnp.asarray(v), 26, width=w, height=h)
    sp = np.asarray(out["split"])
    assert 0 < sp.sum() < sp.size


@pytest.mark.parametrize("qp,sao", [(30, False), (24, True)])
def test_intra32_device_oracle(tmp_path, qp, sao):
    tool = _ensure_oracle()
    w, h = 128, 96
    y, u, v = synthetic_frames(w, h, 1, seed=3)[0]
    enc = Encoder(_cfg(w, h, qp, deblock=True, sao=sao))
    stream, recon = enc.encode_frame(y, u, v)
    f = tmp_path / "s.265"
    f.write_bytes(stream)
    out = tmp_path / "o.yuv"
    r = subprocess.run([tool, "decode", str(f), str(out)], capture_output=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip("libavcodec oracle unavailable")
    mine = b"".join(bytes(np.asarray(p).astype(np.uint8)) for p in recon)
    assert out.read_bytes() == mine


def test_intra32_device_matches_host_conformance(tmp_path):
    """Host (fast_decision=False) and device paths make different RD
    decisions but BOTH must be conformant; pin the host path too so the
    reference implementation keeps its coverage."""
    tool = _ensure_oracle()
    w, h = 64, 64
    y, u, v = synthetic_frames(w, h, 1, seed=11)[0]
    for fast in (False, True):
        enc = Encoder(_cfg(w, h, 29, fast=fast))
        stream, recon = enc.encode_frame(y, u, v)
        f = tmp_path / f"s{int(fast)}.265"
        f.write_bytes(stream)
        out = tmp_path / f"o{int(fast)}.yuv"
        r = subprocess.run([tool, "decode", str(f), str(out)],
                           capture_output=True)
        if r.returncode != 0 or not out.exists():
            pytest.skip("libavcodec oracle unavailable")
        mine = b"".join(bytes(np.asarray(p).astype(np.uint8)) for p in recon)
        assert out.read_bytes() == mine, f"fast={fast}"
