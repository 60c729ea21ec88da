"""Device-native CTB64 quadtree P encoding (encoder/frame_inter64.py —
kvazaar's default CTU size for inter, reference config surface
kvazaarfilter.cpp:176-276).

The 64-wave codes inter CU64 leaves (forced TU32 transform tree) and the
split path (CU32/CU16 leaves with intra competition) with merge/AMVP
lists at 16-cell granularity via the z-scan cell resolver.  Streams must
decode bit-exactly in our decoder AND libavcodec across merge/SAO/WPP/
TMVP combinations and IDR refreshes.
"""

import subprocess

import numpy as np
import pytest

from kvazzup_tpu.core.params import StreamConfig
from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.encoder.top import Encoder
from kvazzup_tpu.io.yuv import synthetic_frames

from test_e2e_intra import _ensure_oracle


def _cfg(w, h, qp, merge=1, sao=False, tmvp=False, wpp=False):
    return StreamConfig(width=w, height=h, qp=qp, ctb_log2=6, min_cb_log2=3,
                        max_tb_log2=5, deblocking_enabled=True,
                        sao_enabled=sao, merge_cand=merge, temporal_mvp=tmvp,
                        wpp=wpp)


def _frames(w, h, nf, seed=5, divergent=False):
    f0 = synthetic_frames(w, h, 1, seed=seed)[0]
    if not divergent:
        return [f0] + [tuple(np.roll(p, (3 * i, 5 * i), axis=(0, 1))
                             for p in f0) for i in range(1, nf)]
    out = [f0]
    for i in range(1, nf):
        fr = []
        for p in f0:
            q = p.copy()
            band = 32 if p.shape[0] >= w // 2 else 16
            for bi in range(q.shape[0] // band):
                q[bi * band : (bi + 1) * band] = np.roll(
                    q[bi * band : (bi + 1) * band],
                    (bi % 5 - 2) * 3 * i, axis=1)
            fr.append(q)
        out.append(tuple(fr))
    return out


def _roundtrip(cfg, frames, intra_period=16):
    enc = Encoder(cfg, intra_period=intra_period)
    stream, recons = b"", []
    for (y, u, v) in frames:
        s, rec = enc.encode_frame(y, u, v)
        stream += s
        recons.append(rec)
    return stream, recons


def _check(stream, recons, tmp_path, tool):
    dec = Decoder().decode(stream)
    for fi in range(len(recons)):
        for p in range(3):
            assert np.array_equal(np.asarray(dec[fi][p]),
                                  np.asarray(recons[fi][p])), (fi, p)
    f = tmp_path / "s.265"
    f.write_bytes(stream)
    out = tmp_path / "o.yuv"
    r = subprocess.run([tool, "decode", str(f), str(out)], capture_output=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip("libavcodec oracle unavailable")
    mine = b"".join(bytes(np.asarray(p).astype(np.uint8))
                    for rec in recons for p in rec)
    assert out.read_bytes() == mine


@pytest.mark.parametrize("merge,sao", [(1, False), (5, True)])
def test_p64_oracle(tmp_path, merge, sao):
    tool = _ensure_oracle()
    w, h = 192, 128
    stream, recons = _roundtrip(_cfg(w, h, 30, merge, sao), _frames(w, h, 4))
    _check(stream, recons, tmp_path, tool)


def test_p64_exercises_all_levels():
    """Divergent motion must force split64 on part of the picture while
    static regions keep CU64 skip leaves."""
    import jax.numpy as jnp

    from kvazzup_tpu.encoder.frame_inter64 import encode_frame_p64_fast

    w, h = 256, 128
    f0 = synthetic_frames(w, h, 1, seed=9)[0]
    # left half: per-band divergent shifts (forces split64); right half:
    # one uniform shift (a single CU64 MV matches it).
    f1 = []
    for p in f0:
        q = p.copy()
        half = q.shape[1] // 2
        band = 32 if q.shape[0] >= h // 2 else 16
        for bi in range(q.shape[0] // band):
            q[bi * band : (bi + 1) * band, :half] = np.roll(
                q[bi * band : (bi + 1) * band, :half],
                (bi % 5 - 2) * 3, axis=1)
        q[:, half:] = np.roll(q[:, half:], 2, axis=1)
        f1.append(q)
    f1 = tuple(f1)
    dev = encode_frame_p64_fast(
        jnp.asarray(f1[0]), jnp.asarray(f1[1]), jnp.asarray(f1[2]),
        jnp.asarray(f0[0]), jnp.asarray(f0[1]), jnp.asarray(f0[2]),
        30, width=w, height=h, merge_cand=3)
    s64 = np.asarray(dev["split64"])
    ct64 = np.asarray(dev["ct64"])
    assert s64.sum() > 0, "split64 never fired on divergent motion"
    assert (s64 == 0).any(), "uniform motion never kept a CU64 leaf"
    assert (ct64[s64 == 0] != 0).any(), "no inter CU64 leaf coded"
    # static pair -> CU64 skips dominate
    devs = encode_frame_p64_fast(
        jnp.asarray(f0[0]), jnp.asarray(f0[1]), jnp.asarray(f0[2]),
        jnp.asarray(f0[0]), jnp.asarray(f0[1]), jnp.asarray(f0[2]),
        34, width=w, height=h, merge_cand=3)
    cts = np.asarray(devs["ct64"])
    sps = np.asarray(devs["split64"])
    assert (cts[sps == 0] == 3).mean() > 0.5, "static content should skip64"


def test_p64_production_combo_oracle(tmp_path):
    """kvazaar's default operating point: CTB64 quadtree inter + WPP +
    SAO + deblock + TMVP + merge 5, across an IDR refresh."""
    tool = _ensure_oracle()
    w, h = 192, 128
    frames = _frames(w, h, 6, seed=7, divergent=True)
    stream, recons = _roundtrip(
        _cfg(w, h, 29, merge=5, sao=True, tmvp=True, wpp=True), frames,
        intra_period=3)
    base, _ = _roundtrip(_cfg(w, h, 29, merge=5, sao=True, wpp=True), frames,
                         intra_period=3)
    assert stream != base, "temporal candidate never engaged at CTB64"
    _check(stream, recons, tmp_path, tool)
