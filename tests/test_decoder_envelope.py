"""Round-2 decoder envelope: conformance-class tools beyond the x265 core.

Each feature is validated the same way as the round-1 alien suite: encode
with libx265 (or hand-build a stream), decode with libavcodec as the
oracle (tools/hevcref), and require byte-identical output from our
decoder.  Reference scope: the openHEVC API surface the reference app
consumes (/root/reference/src/media/processing/openhevcfilter.cpp:38-199).
"""

import subprocess

import numpy as np
import pytest

from kvazzup_tpu.decoder.top import Decoder
from kvazzup_tpu.io.yuv import synthetic_frames, write_yuv420

from test_e2e_intra import _ensure_oracle


def _run_x265(tmp_path, w, h, nframes, qp, params, seed=9, motion=False):
    tool = _ensure_oracle()
    if motion:
        base = synthetic_frames(w, h, 1, seed=seed)[0]
        frames = [
            (np.roll(base[0], (i * 2, i * 3), axis=(0, 1)),
             np.roll(base[1], i, axis=1), np.roll(base[2], i, axis=0))
            for i in range(nframes)
        ]
    else:
        frames = synthetic_frames(w, h, nframes, seed=seed)
    src = tmp_path / "in.yuv"
    write_yuv420(str(src), frames)
    out = tmp_path / "out.265"
    gold_p = tmp_path / "gold.yuv"
    r = subprocess.run(
        [tool, "encode", str(src), f"{w}x{h}", str(qp), str(out), params],
        capture_output=True, text=True,
    )
    if r.returncode != 0 or not out.exists():
        pytest.skip(f"libx265 unavailable: {r.stderr[-160:]}")
    subprocess.run([tool, "decode", str(out), str(gold_p)], capture_output=True)
    return out.read_bytes(), gold_p.read_bytes()


def _assert_match(stream, gold, w, h, tag=""):
    fsz = w * h * 3 // 2
    nf = len(gold) // fsz
    decoded = Decoder().decode(stream)
    assert len(decoded) == nf, (tag, len(decoded), nf)
    for i in range(nf):
        c = np.frombuffer(gold[i * fsz : (i + 1) * fsz], np.uint8)
        planes = (c[: w * h].reshape(h, w),
                  c[w * h : w * h + w * h // 4].reshape(h // 2, w // 2),
                  c[w * h + w * h // 4 :].reshape(h // 2, w // 2))
        for p in range(3):
            assert np.array_equal(planes[p], np.asarray(decoded[i][p])), (tag, i, p)


INTRA32 = ("ctu=32:min-cu-size=8:keyint=1:frame-threads=1:no-wpp=1:"
           "no-info=1:bframes=0:no-scenecut=1:repeat-headers=1")
LOWDELAY = ("ctu=32:min-cu-size=8:keyint=12:frame-threads=1:no-wpp=1:"
            "no-info=1:bframes=0:ref=2:no-scenecut=1:repeat-headers=1:"
            "rc-lookahead=0")


@pytest.mark.parametrize("offs", ["cbqpoffs=3", "crqpoffs=-4", "cbqpoffs=2:crqpoffs=-2"])
def test_decode_chroma_qp_offsets_intra(tmp_path, offs):
    """pps_cb/cr_qp_offset feed dequant + deblock chroma QP (8.6.1)."""
    w, h = 96, 64
    stream, gold = _run_x265(tmp_path, w, h, 2, 30, INTRA32 + ":" + offs)
    _assert_match(stream, gold, w, h, offs)


def test_decode_chroma_qp_offsets_inter(tmp_path):
    w, h = 96, 64
    stream, gold = _run_x265(
        tmp_path, w, h, 5, 30, LOWDELAY + ":cbqpoffs=2:crqpoffs=-2", motion=True)
    _assert_match(stream, gold, w, h, "inter-chroma-offs")


def test_poc_msb_wrap_unit():
    """8.3.1: full POC derivation across the lsb wrap boundary."""
    from kvazzup_tpu.core.params import ParsedSliceHeader, ParsedSps

    d = Decoder.__new__(Decoder)
    d.sps = ParsedSps()
    d.sps.log2_max_poc_lsb = 4  # MaxPicOrderCntLsb = 16
    d._poc_prev = (0, 0)
    seq = [(0, 19), (1, 0)]  # (lsb, nal_type): IDR first
    pocs = []
    for lsb in [0, 4, 8, 12, 14, 2, 6, 10, 14, 1, 5]:
        sh = ParsedSliceHeader(pic_order_cnt_lsb=lsb)
        nal = 19 if lsb == 0 and not pocs else 1
        pocs.append(d._derive_poc(sh, nal))
    assert pocs == [0, 4, 8, 12, 14, 18, 22, 26, 30, 33, 37]


def test_missing_reference_raises(tmp_path):
    """A P picture whose reference was never decoded must raise, not
    silently predict from the wrong picture (ADVICE round 1)."""
    w, h = 96, 64
    stream, gold = _run_x265(tmp_path, w, h, 5, 30, LOWDELAY, motion=True)
    # drop the second picture's NAL: find AUs by first_slice flag
    from kvazzup_tpu.core.nal import split_annexb

    nals = list(split_annexb(stream))
    # remove the first non-IDR slice NAL
    drop = next(i for i, n in enumerate(nals)
                if n.nal_type <= 31 and not (16 <= n.nal_type <= 21))
    kept = [n for i, n in enumerate(nals) if i != drop]
    from kvazzup_tpu.core.nal import compose_nal

    with pytest.raises(ValueError):
        Decoder().decode(b"".join(compose_nal(n) for n in kept))


@pytest.mark.parametrize("cfg,motion", [
    (INTRA32 + ":scaling-list=default", False),
    (LOWDELAY + ":scaling-list=default", True),
    (INTRA32 + ":scaling-list=default:sao=1:signhide=1", False),
])
def test_decode_scaling_lists(tmp_path, cfg, motion):
    """Default quantization matrices (7.4.5 / 8.6.3): x265 scaling-list
    streams decode byte-identically (round-1 gap: params.py raised)."""
    w, h = 96, 64
    stream, gold = _run_x265(tmp_path, w, h, 4 if motion else 2, 30, cfg,
                             motion=motion)
    _assert_match(stream, gold, w, h, cfg)


def test_dependent_slice_segments_roundtrip(tmp_path):
    """Dependent slice segments (7.3.6.1/9.3.1): the picture is one slice
    split into segments with continued CABAC contexts and slice-wide
    prediction.  Our encoder emits them; libavcodec is the oracle; our
    decoder reproduces the oracle exactly."""
    import subprocess

    from kvazzup_tpu.core.nal import compose_nal
    from kvazzup_tpu.core.params import StreamConfig, compose_pps, compose_sps, compose_vps
    from kvazzup_tpu.encoder.sliced import encode_frame_intra_dependent_slices

    w, h = 96, 64
    cfg = StreamConfig(width=w, height=h, qp=30, dependent_slices=True,
                       deblocking_enabled=True)
    frames = synthetic_frames(w, h, 1, seed=3)
    y, u, v = frames[0]
    hdrs = b"".join(compose_nal(n) for n in
                    (compose_vps(cfg), compose_sps(cfg), compose_pps(cfg)))
    payload, recon = encode_frame_intra_dependent_slices(cfg, y, u, v, 30, 3)
    stream = hdrs + payload
    p = tmp_path / "dep.265"
    p.write_bytes(stream)
    gold_p = tmp_path / "gold.yuv"
    tool = _ensure_oracle()
    r = subprocess.run([tool, "decode", str(p), str(gold_p)],
                       capture_output=True, text=True)
    assert r.returncode == 0 and gold_p.exists(), r.stderr[-400:]
    gold = gold_p.read_bytes()
    assert len(gold) == w * h * 3 // 2, "oracle decoded zero/short output"
    # oracle output must equal our recon (encoder loop) ...
    ry = np.asarray(recon[0])
    assert np.array_equal(np.frombuffer(gold[: w * h], np.uint8).reshape(h, w), ry)
    # ... and our decoder must match the oracle byte-for-byte
    _assert_match(stream, gold, w, h, "dependent-slices")


def test_decode_multi_slice_inter(tmp_path):
    """Multi-slice P pictures (round-1 NotImplementedError at the fast
    tier) decode via the generic engine, byte-identical to libavcodec.
    x265 requires WPP for slices, so this also exercises per-slice ranged
    WPP substreams."""
    w, h = 128, 128
    cfg = ("ctu=32:min-cu-size=8:keyint=12:frame-threads=1:wpp=1:no-info=1:"
           "bframes=0:ref=2:no-scenecut=1:repeat-headers=1:rc-lookahead=0:slices=2")
    stream, gold = _run_x265(tmp_path, w, h, 4, 30, cfg, motion=True)
    _assert_match(stream, gold, w, h, "multi-slice-inter")


def _pcm_stream(w, h, frames, pcm_mask_fn):
    """Build an intra stream with PCM CUs: masked CTUs carry raw samples,
    others code DC mode with no residual (prediction exercised across PCM
    boundaries without needing an RD search)."""
    from kvazzup_tpu.core.nal import NalUnit, NalType, compose_nal
    from kvazzup_tpu.core.params import (SliceHeader, StreamConfig,
                                         compose_pps, compose_slice_header,
                                         compose_sps, compose_vps)
    from kvazzup_tpu.entropy.slice_data import encode_slice_data_intra_pcm

    cfg = StreamConfig(width=w, height=h, qp=30, pcm_enabled=True,
                       deblocking_enabled=False)
    cw, chh = cfg.ctbs_w, cfg.ctbs_h
    nctu = cw * chh
    hdrs = b"".join(compose_nal(n) for n in
                    (compose_vps(cfg), compose_sps(cfg), compose_pps(cfg)))
    out = hdrs
    n = 16
    for (y, u, v) in frames:
        mask = [pcm_mask_fn(i) for i in range(nctu)]
        modes = np.ones(nctu, np.int32)  # DC
        zl = np.zeros((nctu, n, n), np.int32)
        zc = np.zeros((nctu, n // 2, n // 2), np.int32)
        payload = encode_slice_data_intra_pcm(
            cfg, modes, zl, zc, zc, mask, y, u, v, 30)
        sh = SliceHeader(slice_type=2, qp=30, nal_type=NalType.IDR_W_RADL,
                         first_slice=True, deblocking_disabled=True)
        wtr = compose_slice_header(cfg, sh)
        wtr.write_bytes(payload)
        out += compose_nal(NalUnit(sh.nal_type, wtr.data()))
    return out


@pytest.mark.parametrize("pattern", ["all", "checker"])
def test_decode_pcm(tmp_path, pattern):
    """PCM CUs (7.3.8.7 / 9.3.1): raw samples, CABAC engine re-init with
    carried contexts, prediction from PCM neighbors.  libavcodec is the
    oracle; for the all-PCM stream the decode must equal the source."""
    import subprocess

    w, h = 96, 64
    frames = synthetic_frames(w, h, 2, seed=4)
    mask_fn = (lambda i: True) if pattern == "all" else (lambda i: i % 2 == 0)
    stream = _pcm_stream(w, h, frames, mask_fn)
    p = tmp_path / "pcm.265"
    p.write_bytes(stream)
    gold_p = tmp_path / "gold.yuv"
    tool = _ensure_oracle()
    r = subprocess.run([tool, "decode", str(p), str(gold_p)],
                       capture_output=True, text=True)
    assert r.returncode == 0 and gold_p.exists(), r.stderr[-400:]
    gold = gold_p.read_bytes()
    assert len(gold) == 2 * w * h * 3 // 2, "oracle rejected the PCM stream"
    if pattern == "all":
        fsz = w * h * 3 // 2
        for i, (y, u, v) in enumerate(frames):
            raw = y.tobytes() + u.tobytes() + v.tobytes()
            assert gold[i * fsz : (i + 1) * fsz] == raw, "all-PCM != source"
    _assert_match(stream, gold, w, h, f"pcm-{pattern}")


def _main10_stream(w, h, nframes=2, qp=30, deblock=True, seed=11):
    """Hand-built Main10 intra streams: random modes + sparse random
    levels are a valid bitstream; libavcodec computes the reconstruction
    as ground truth (conformance-vector style — no RD search needed)."""
    from kvazzup_tpu.core.nal import NalUnit, NalType, compose_nal
    from kvazzup_tpu.core.params import (SliceHeader, StreamConfig,
                                         compose_pps, compose_slice_header,
                                         compose_sps, compose_vps)
    from kvazzup_tpu.entropy.slice_data import encode_slice_data_intra

    rng = np.random.RandomState(seed)
    cfg = StreamConfig(width=w, height=h, qp=qp, bit_depth=10,
                       deblocking_enabled=deblock)
    nctu = cfg.ctbs_w * cfg.ctbs_h
    out = b"".join(compose_nal(n) for n in
                   (compose_vps(cfg), compose_sps(cfg), compose_pps(cfg)))
    for _ in range(nframes):
        modes = rng.randint(0, 35, nctu).astype(np.int32)
        def sparse(shape, density=0.15, mag=40):
            lv = rng.randint(-mag, mag + 1, shape).astype(np.int32)
            mask = rng.rand(*shape) < density
            return np.where(mask, lv, 0).astype(np.int32)
        lev_y = sparse((nctu, 16, 16))
        lev_cb = sparse((nctu, 8, 8))
        lev_cr = sparse((nctu, 8, 8))
        payload = encode_slice_data_intra(cfg, modes, lev_y, lev_cb, lev_cr,
                                          use_native=False, slice_qp=qp)
        sh = SliceHeader(slice_type=2, qp=qp, nal_type=NalType.IDR_W_RADL,
                         first_slice=True, deblocking_disabled=not deblock)
        wtr = compose_slice_header(cfg, sh)
        wtr.write_bytes(payload)
        out += compose_nal(NalUnit(sh.nal_type, wtr.data()))
    return out


@pytest.mark.parametrize("deblock", [False, True])
def test_decode_main10(tmp_path, deblock):
    """Main10: 10-bit intra decode (prediction, dequant bdShift, inverse
    transform shift, deblock scaling) byte-identical to libavcodec."""
    import subprocess

    w, h = 96, 64
    stream = _main10_stream(w, h, deblock=deblock)
    p = tmp_path / "m10.265"
    p.write_bytes(stream)
    gold_p = tmp_path / "gold10.yuv"
    tool = _ensure_oracle()
    r = subprocess.run([tool, "decode", str(p), str(gold_p)],
                       capture_output=True, text=True)
    assert r.returncode == 0 and gold_p.exists(), r.stderr[-400:]
    gold = gold_p.read_bytes()
    fsz = w * h * 3  # 2 bytes/sample at 10-bit
    assert len(gold) == 2 * fsz, (len(gold), "oracle rejected Main10 stream")
    decoded = Decoder().decode(stream)
    assert len(decoded) == 2
    for i in range(2):
        c = np.frombuffer(gold[i * fsz : (i + 1) * fsz], np.uint16)
        planes = (c[: w * h].reshape(h, w),
                  c[w * h : w * h + w * h // 4].reshape(h // 2, w // 2),
                  c[w * h + w * h // 4 :].reshape(h // 2, w // 2))
        for pi in range(3):
            got = np.asarray(decoded[i][pi])
            assert got.dtype == np.uint16
            assert np.array_equal(planes[pi], got), ("main10", deblock, i, pi)


@pytest.mark.parametrize("qp,seed", [(0, 1), (17, 2), (45, 3), (51, 4)])
def test_decode_fuzz_random_levels_8bit(tmp_path, qp, seed):
    """Conformance-vector-style fuzz: random modes + random levels at QP
    extremes are valid streams; our decode must equal libavcodec's."""
    import subprocess

    from kvazzup_tpu.core.nal import NalUnit, NalType, compose_nal
    from kvazzup_tpu.core.params import (SliceHeader, StreamConfig,
                                         compose_pps, compose_slice_header,
                                         compose_sps, compose_vps)
    from kvazzup_tpu.entropy.slice_data import encode_slice_data_intra

    rng = np.random.RandomState(seed)
    w, h = 64, 48
    cfg = StreamConfig(width=w, height=h, qp=qp, deblocking_enabled=True)
    nctu = cfg.ctbs_w * cfg.ctbs_h
    stream = b"".join(compose_nal(n) for n in
                      (compose_vps(cfg), compose_sps(cfg), compose_pps(cfg)))
    modes = rng.randint(0, 35, nctu).astype(np.int32)
    def sparse(shape, mag):
        lv = rng.randint(-mag, mag + 1, shape).astype(np.int32)
        return np.where(rng.rand(*shape) < 0.2, lv, 0).astype(np.int32)
    payload = encode_slice_data_intra(
        cfg, modes, sparse((nctu, 16, 16), 80), sparse((nctu, 8, 8), 60),
        sparse((nctu, 8, 8), 60), use_native=False, slice_qp=qp)
    sh = SliceHeader(slice_type=2, qp=qp, nal_type=NalType.IDR_W_RADL,
                     first_slice=True, deblocking_disabled=False)
    wtr = compose_slice_header(cfg, sh)
    wtr.write_bytes(payload)
    stream += compose_nal(NalUnit(sh.nal_type, wtr.data()))
    p = tmp_path / "fuzz.265"
    p.write_bytes(stream)
    gold_p = tmp_path / "gold.yuv"
    tool = _ensure_oracle()
    subprocess.run([tool, "decode", str(p), str(gold_p)], capture_output=True)
    gold = gold_p.read_bytes()
    assert len(gold) == w * h * 3 // 2
    _assert_match(stream, gold, w, h, f"fuzz-qp{qp}")


def _p_stream(w, h, cfg, headers_fn, nframes=4, seed=5):
    """Hand-built I + P streams: random inter syntax is a valid bitstream;
    libavcodec computes the reconstruction (incl. MC) as ground truth.
    headers_fn(poc) -> SliceHeader for each P picture."""
    from kvazzup_tpu.core.nal import NalUnit, NalType, compose_nal
    from kvazzup_tpu.core.params import (SliceHeader, compose_pps,
                                         compose_slice_header, compose_sps,
                                         compose_vps)
    from kvazzup_tpu.entropy.slice_data import (encode_slice_data_intra,
                                                encode_slice_data_p)

    rng = np.random.RandomState(seed)
    nctu = cfg.ctbs_w * cfg.ctbs_h
    out = b"".join(compose_nal(n) for n in
                   (compose_vps(cfg), compose_sps(cfg), compose_pps(cfg)))

    def sparse(shape, mag=30, density=0.1):
        lv = rng.randint(-mag, mag + 1, shape).astype(np.int32)
        return np.where(rng.rand(*shape) < density, lv, 0).astype(np.int32)

    # IDR
    modes = rng.randint(0, 35, nctu).astype(np.int32)
    payload = encode_slice_data_intra(
        cfg, modes, sparse((nctu, 16, 16)), sparse((nctu, 8, 8)),
        sparse((nctu, 8, 8)), use_native=False, slice_qp=cfg.qp)
    sh = SliceHeader(slice_type=2, qp=cfg.qp, nal_type=NalType.IDR_W_RADL,
                     first_slice=True, deblocking_disabled=True)
    wtr = compose_slice_header(cfg, sh)
    wtr.write_bytes(payload)
    out += compose_nal(NalUnit(sh.nal_type, wtr.data()))
    for poc in range(1, nframes):
        ctype = rng.choice([0, 1, 2, 3], nctu, p=[0.2, 0.3, 0.3, 0.2]).astype(np.int32)
        imodes = rng.randint(0, 35, nctu).astype(np.int32)
        mvs = rng.randint(-32, 33, (nctu, 2)).astype(np.int32)
        mvp_flags = rng.randint(0, 2, nctu).astype(np.int32)
        mvds = rng.randint(-16, 17, (nctu, 2)).astype(np.int32)
        payload = encode_slice_data_p(
            cfg, ctype, imodes, mvs, mvp_flags, mvds,
            sparse((nctu, 16, 16)), sparse((nctu, 8, 8)), sparse((nctu, 8, 8)),
            slice_qp=cfg.qp)
        sh = headers_fn(poc)
        wtr = compose_slice_header(cfg, sh)
        wtr.write_bytes(payload)
        out += compose_nal(NalUnit(sh.nal_type, wtr.data()))
    return out


def _decode_both(tmp_path, stream, w, h, tag):
    import subprocess

    p = tmp_path / (tag + ".265")
    p.write_bytes(stream)
    gold_p = tmp_path / (tag + ".yuv")
    tool = _ensure_oracle()
    r = subprocess.run([tool, "decode", str(p), str(gold_p)],
                       capture_output=True, text=True)
    assert r.returncode == 0 and gold_p.exists(), r.stderr[-400:]
    gold = gold_p.read_bytes()
    assert len(gold) >= w * h * 3 // 2, "oracle rejected stream"
    _assert_match(stream, gold, w, h, tag)


def test_ref_pic_list_modification(tmp_path):
    """RPLM (7.3.6.2): a P picture whose RPS holds two pictures selects the
    FARTHER one via list_entry_l0 — decode must follow the modified list."""
    from kvazzup_tpu.core.nal import NalType
    from kvazzup_tpu.core.params import SliceHeader, StreamConfig

    w, h = 96, 64
    cfg = StreamConfig(width=w, height=h, qp=30, deblocking_enabled=False,
                       lists_modification=True)

    def hdr(poc):
        if poc < 2:
            return SliceHeader(slice_type=1, qp=30, nal_type=NalType.TRAIL_R,
                               first_slice=True, pic_order_cnt_lsb=poc,
                               num_negative_pics=1, delta_pocs=(-1,),
                               deblocking_disabled=True)
        # two refs in the RPS, active=1, RPLM picks candidate index 1
        # (poc-2) instead of the default poc-1
        return SliceHeader(slice_type=1, qp=30, nal_type=NalType.TRAIL_R,
                           first_slice=True, pic_order_cnt_lsb=poc,
                           num_negative_pics=2, delta_pocs=(-1, -2),
                           list_entry_l0=(1,), deblocking_disabled=True)

    stream = _p_stream(w, h, cfg, hdr)
    _decode_both(tmp_path, stream, w, h, "rplm")


def test_long_term_reference_pictures(tmp_path):
    """Long-term refs (7.4.7.1/8.3.2): the IDR stays in the DPB as an LT
    picture and a later P picture references it with an EMPTY short-term
    RPS — decode must fetch the LT picture."""
    from kvazzup_tpu.core.nal import NalType
    from kvazzup_tpu.core.params import SliceHeader, StreamConfig

    w, h = 96, 64
    cfg = StreamConfig(width=w, height=h, qp=30, deblocking_enabled=False,
                       long_term_refs=True)

    def hdr(poc):
        if poc < 3:
            # keep the IDR (poc 0) alive as LT, predict short-term as usual
            return SliceHeader(slice_type=1, qp=30, nal_type=NalType.TRAIL_R,
                               first_slice=True, pic_order_cnt_lsb=poc,
                               num_negative_pics=1, delta_pocs=(-1,),
                               lt_pics=((0, False, True, 0),),
                               deblocking_disabled=True)
        # poc 3: ONLY the long-term IDR in the RPS
        return SliceHeader(slice_type=1, qp=30, nal_type=NalType.TRAIL_R,
                           first_slice=True, pic_order_cnt_lsb=poc,
                           num_negative_pics=0, delta_pocs=(),
                           lt_pics=((0, True, True, 0),),
                           deblocking_disabled=True)

    stream = _p_stream(w, h, cfg, hdr)
    _decode_both(tmp_path, stream, w, h, "ltr")


@pytest.mark.parametrize("mincu,h,extra", [
    (8, 72, "wpp=1:sao=1:signhide=1"),
    (8, 40, "no-wpp=1:no-sao=1:no-signhide=1"),
    (16, 72, "no-wpp=1:no-sao=1:no-signhide=1"),  # x265 pads to 80 + conf
    # window but picks explicit chroma modes -> fast tier falls back
])
def test_partial_ctu_rows_decode(tmp_path, mincu, h, extra):
    """Non-CTB-multiple picture heights at CTB16: partial bottom CTUs have
    inferred boundary splits the fast tier does not model -- they must
    route (or fall back) to the generic engine and still decode
    byte-exactly (round-2 fix; found by the 1080p slow tests)."""
    import subprocess

    from test_e2e_intra import _ensure_oracle

    tool = _ensure_oracle()
    w = 128
    src = tmp_path / "in.yuv"
    write_yuv420(str(src), synthetic_frames(w, h, 1, seed=11))
    out = tmp_path / "out.265"
    params = (f"ctu=16:min-cu-size={mincu}:tu-intra-depth=1:no-tskip=1:"
              "keyint=1:frame-threads=1:no-scenecut=1:repeat-headers=1:"
              "no-info=1:bframes=0:ref=1:rd=2:" + extra)
    r = subprocess.run([tool, "encode", str(src), f"{w}x{h}", "32",
                        str(out), params], capture_output=True, text=True)
    if r.returncode != 0 or not out.exists():
        pytest.skip(f"libx265 unavailable: {r.stderr[-200:]}")
    gold_f = tmp_path / "gold.yuv"
    subprocess.run([tool, "decode", str(out), str(gold_f)], capture_output=True)
    gold = gold_f.read_bytes()
    fsz = w * h * 3 // 2
    frames = Decoder().decode(out.read_bytes())
    assert len(frames) == len(gold) // fsz
    for i in range(len(frames)):
        c = np.frombuffer(gold[i * fsz : (i + 1) * fsz], np.uint8)
        planes = (c[: w * h].reshape(h, w),
                  c[w * h : w * h + w * h // 4].reshape(h // 2, w // 2),
                  c[w * h + w * h // 4 :].reshape(h // 2, w // 2))
        for p in range(3):
            assert np.array_equal(planes[p], np.asarray(frames[i][p])), (i, p)
