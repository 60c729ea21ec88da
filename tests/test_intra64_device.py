"""Device-native CTB64 quadtree intra encoder (encoder/frame_intra64.py).

kvazaar's default CTU size as a TPU wavefront (CU64 forced-TT leaf +
CU32/CU16 recursion).  Streams must decode bit-exactly in our decoder
AND libavcodec, with split decisions exercised at both tree levels.
"""

import subprocess

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.io.yuv import synthetic_frames

from test_e2e_intra import _ensure_oracle


def _cfg(w, h, qp, deblock=True, sao=False):
    return StreamConfig(width=w, height=h, qp=qp, ctb_log2=6, min_cb_log2=3,
                        max_tb_log2=5, deblocking_enabled=deblock,
                        sao_enabled=sao)


@pytest.mark.parametrize("w,h,qp,deblock", [
    (128, 64, 31, True),
    (64, 64, 38, False),
    (192, 128, 26, True),
])
def test_intra64_device_self_decode(w, h, qp, deblock):
    y, u, v = synthetic_frames(w, h, 1, seed=9)[0]
    enc = Encoder(_cfg(w, h, qp, deblock))
    stream, recon = enc.encode_frame(y, u, v)
    dec = Decoder().decode(stream)
    for p in range(3):
        assert np.array_equal(np.asarray(dec[0][p]), np.asarray(recon[p])), p


def test_intra64_device_split_mix():
    import jax.numpy as jnp

    from kvazzup_tpu.encoder.frame_intra64 import encode_frame_intra64_fast

    w, h = 192, 128
    y, u, v = synthetic_frames(w, h, 1, seed=7)[0]
    out = encode_frame_intra64_fast(jnp.asarray(y), jnp.asarray(u),
                                    jnp.asarray(v), 28, width=w, height=h)
    s64 = np.asarray(out["split64"])
    s32 = np.asarray(out["split32"])
    assert s64.sum() > 0, "quadtree never splits the CTB64"
    assert (s64 == 0).sum() + (s32[s64 != 0] == 0).sum() > 0, \
        "no large-CU leaf survives"


@pytest.mark.parametrize("qp,sao", [(30, False), (24, True)])
def test_intra64_device_oracle(tmp_path, qp, sao):
    tool = _ensure_oracle()
    w, h = 128, 128
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
