"""Command-line interface: file-based encode / decode / quality tools.

The io/CLI edge of SURVEY.md §7 step 8 — y4m/yuv in, Annex-B out, plus the
conformance-runner entry used by benchmarks and tests.

    python -m kvazzup_tpu encode in.y4m out.265 --qp 32 [--intra-period 64]
    python -m kvazzup_tpu decode in.265 out.yuv
    python -m kvazzup_tpu psnr a.yuv b.yuv --size WxH
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _read_input(path: str, size: str | None, max_frames: int | None,
                bitdepth: int = 8):
    from .io.yuv import read_y4m, read_yuv420, read_yuv420_10

    if path.endswith(".y4m"):
        frames, w, h, _fps = read_y4m(path, max_frames)
        return frames, w, h
    if not size:
        raise SystemExit("raw .yuv input requires --size WxH")
    w, h = (int(t) for t in size.split("x"))
    rd = read_yuv420_10 if bitdepth > 8 else read_yuv420
    return rd(path, w, h, max_frames), w, h


def cmd_encode(args) -> int:
    from .core.params import StreamConfig
    from .encoder.top import Encoder, RandomAccessEncoder
    from .io.yuv import psnr
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    frames, w, h = _read_input(args.input, args.size, args.frames,
                               getattr(args, "bitdepth", 8))
    if not frames:
        raise SystemExit("no frames read")
    ra = args.gop == "ra"
    ctb_log2 = {16: 4, 32: 5, 64: 6}[args.ctu]
    ra_quad = ra and ctb_log2 == 6
    # --cutree wins; otherwise the documented KVZ_TPU_RA_CUTREE env knob
    # applies (ADVICE r4: the CLI used to pass 0.0 and silently mask it)
    cutree = args.cutree if args.cutree > 0 else float(
        os.environ.get("KVZ_TPU_RA_CUTREE", "0") or 0)
    # non-CTB-aligned source sizes pad internally and signal a
    # conformance window (so e.g. true 1920x1080 encodes spec-correctly)
    cfg = StreamConfig.for_source(
        w, h, qp=args.qp,
        ctb_log2=ctb_log2,
        deblocking_enabled=not args.no_deblock,
        sao_enabled=args.sao,
        wpp=args.wpp or (args.sao and ctb_log2 == 4 and args.tiles == 1),
        tile_cols=args.tiles, slices=args.slices,
        min_cb_log2=3 if (args.cu8 or ctb_log2 > 4) else 4,
        max_tb_log2=5 if ctb_log2 > 4 else 4,
        max_transform_hierarchy_depth_intra=args.tu_intra_depth - 1,
        num_reorder_pics=(3 if ra_quad else 2) if ra else 0,
        max_dec_pic_buffering=(6 if ra_quad else 5) if ra else 2,
        merge_cand=args.merge,
        temporal_mvp=args.tmvp,
        rdoq=args.rdoq,
        cu_qp_delta=cutree > 0,
        bit_depth=args.bitdepth,
    )
    if cutree > 0 and not ra_quad:
        raise SystemExit("--cutree needs the RA quad path (--gop ra --ctu 64)")
    if ctb_log2 > 4 and args.intra_period != 1:
        if (ra and not ra_quad) or args.tu_intra_depth != 1:
            raise SystemExit(
                "--ctu 32 inter is low-delay (--gop ld) without --tu-intra-depth; "
                "use --gop ra with --ctu 16/64, --tu-intra-depth with --ctu 16, "
                "or all-intra")
    if args.tiles > 1 and ra:
        raise SystemExit("--tiles requires low-delay GOPs (--gop ld)")
    if args.slices > 1 and ra:
        raise SystemExit("--slices requires low-delay GOPs (--gop ld)")
    if args.dcn:
        if ra:
            raise SystemExit("--dcn distributes closed low-delay GOPs (--gop ld)")
        from .pipeline.dcn import DcnPool, spawn_local_workers
        from .pipeline.gop_parallel import GopParallelEncoder

        procs = []
        if args.dcn.startswith("spawn:"):
            procs, addrs = spawn_local_workers(int(args.dcn[len("spawn:"):]))
        else:
            addrs = [(hp.rsplit(":", 1)[0], int(hp.rsplit(":", 1)[1]))
                     for hp in args.dcn.split(",")]
        t0 = time.time()
        try:
            stream = GopParallelEncoder(
                cfg, gop_size=args.intra_period,
                executor=DcnPool(addrs)).encode(frames)
        finally:
            for p in procs:
                p.terminate()
        with open(args.output, "wb") as f:
            f.write(stream)
        dt = time.time() - t0
        print(f"encoded {len(frames)} frames {w}x{h} qp{args.qp} over "
              f"{len(addrs)} DCN workers: {len(stream)} bytes, {dt:.2f}s "
              f"({len(frames)/dt:.2f} fps)")
        return 0
    t0 = time.time()
    total_psnr = 0.0
    nf = 0
    with open(args.output, "wb") as f:
        if ra:
            if ra_quad:
                from .encoder.ra_batch import QuadRABatchEncoder

                gop = 8
                ip = max(gop, args.intra_period - args.intra_period % gop)
                enc = QuadRABatchEncoder(cfg, gop_size=gop, intra_period=ip,
                                         cutree=cutree)
            else:
                enc = RandomAccessEncoder(cfg, gop_size=4,
                                          intra_period=args.intra_period)
            for (y, u, v) in frames:
                for _poc, nal, recon in enc.push_frame(y, u, v):
                    f.write(nal)
                    nf += 1
            for _poc, nal, recon in enc.flush():
                f.write(nal)
                nf += 1
            total_psnr = float("nan")
        else:
            rc = None
            if args.bitrate:
                from .pipeline.rate_control import RateController

                rc = RateController(args.bitrate, args.fps, base_qp=args.qp)
            enc = Encoder(cfg, intra_period=args.intra_period)
            for i, (y, u, v) in enumerate(frames):
                qp_i = None
                is_idr = i % args.intra_period == 0
                if rc is not None:
                    qp_i = rc.frame_qp(is_idr)
                stream, recon = enc.encode_frame(y, u, v, qp=qp_i)
                if rc is not None:
                    rc.update(qp_i, len(stream) * 8, is_idr)
                f.write(stream)
                total_psnr += psnr(y, recon[0],
                                   peak=(1 << args.bitdepth) - 1)
    dt = time.time() - t0
    nbytes = sum(1 for _ in open(args.output, "rb").read())
    print(
        f"encoded {len(frames)} frames {w}x{h} qp{args.qp}: {nbytes} bytes, "
        f"{dt:.2f}s ({len(frames)/dt:.2f} fps), mean PSNR-Y {total_psnr/len(frames):.2f} dB"
    )
    return 0


def cmd_decode(args) -> int:
    from .decoder.top import Decoder
    from .io.yuv import write_yuv420, write_yuv420_10
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    stream = open(args.input, "rb").read()
    t0 = time.time()
    frames = Decoder().decode(stream)
    dt = time.time() - t0
    if frames and np.asarray(frames[0][0]).dtype == np.uint16:
        write_yuv420_10(args.output, frames)  # Main10 -> yuv420p10le
    else:
        write_yuv420(args.output, frames)
    if frames:
        h, w = frames[0][0].shape
        print(f"decoded {len(frames)} frames {w}x{h} in {dt:.2f}s ({len(frames)/dt:.2f} fps)")
    return 0


def cmd_info(args) -> int:
    """Stream inspector: NAL/SPS/PPS/slice summary (bitstream tooling
    parity -- the reference relies on external analyzers)."""
    from .core.nal import NalType, split_annexb
    from .core.params import parse_pps, parse_slice_header, parse_sps

    stream = open(args.input, "rb").read()
    sps = pps = None
    counts: dict = {}
    for nal in split_annexb(stream):
        counts[nal.nal_type] = counts.get(nal.nal_type, 0) + 1
        if nal.nal_type == NalType.SPS:
            sps = parse_sps(nal.rbsp)
            print(f"SPS: {sps.width}x{sps.height} ctb={1 << sps.ctb_log2} "
                  f"min_cb={1 << sps.min_cb_log2} tb={1 << sps.min_tb_log2}.."
                  f"{1 << sps.max_tb_log2} td_i={getattr(sps, 'max_td_intra', 0)} "
                  f"td_p={getattr(sps, 'max_td_inter', 0)} sao={sps.sao_enabled} "
                  f"tmvp={sps.temporal_mvp} amp={getattr(sps, 'amp_enabled', False)} "
                  f"strong_smooth={getattr(sps, 'strong_intra_smoothing', False)}")
        elif nal.nal_type == NalType.PPS:
            pps = parse_pps(nal.rbsp)
            print(f"PPS: init_qp={pps.init_qp} wpp={pps.entropy_sync} "
                  f"tiles={pps.tiles_enabled} sdh={pps.sign_data_hiding} "
                  f"cu_qp_delta={pps.cu_qp_delta_enabled} "
                  f"weightp={pps.weighted_pred} deblock="
                  f"{'off' if pps.deblocking_disabled else 'on'}")
        elif nal.nal_type <= 31 and sps is not None and pps is not None:
            sh = parse_slice_header(nal.rbsp, nal.nal_type, sps, pps)
            kind = {0: "B", 1: "P", 2: "I"}[sh.slice_type]
            extra = ""
            if sh.slice_type != 2:
                negs, poss, _ = sh.rps
                extra = (f" refs={negs}+{poss} nref={sh.num_ref_idx_l0}"
                         f" merge<={getattr(sh, 'max_num_merge_cand', 1)}")
            print(f"{kind}-slice nal={nal.nal_type} poc={sh.pic_order_cnt_lsb} "
                  f"qp={sh.qp}{extra}")
    total = sum(counts.values())
    print(f"{total} NAL units: " + ", ".join(
        f"{k}:{v}" for k, v in sorted(counts.items())))
    return 0


def cmd_psnr(args) -> int:
    from .io.yuv import psnr, read_yuv420

    w, h = (int(t) for t in args.size.split("x"))
    fa = read_yuv420(args.a, w, h)
    fb = read_yuv420(args.b, w, h)
    n = min(len(fa), len(fb))
    for i in range(n):
        vals = [psnr(fa[i][p], fb[i][p]) for p in range(3)]
        print(f"frame {i}: Y {vals[0]:.3f}  U {vals[1]:.3f}  V {vals[2]:.3f}")
    return 0


def cmd_call(args) -> int:
    """Headless call endpoint: SIP over real TCP, RTP video over UDP.

    Callee:  kvazzup_tpu call --listen --sip-port 5060 --name bob
    Caller:  kvazzup_tpu call sip:bob@host:5060 --name alice --duration 5

    This is the reference's two-uvgComm-instances-plus-Kamailio manual
    system test (SURVEY.md §4) as a shippable command: direct endpoint-to-
    endpoint TCP signaling (Via/rport routing), SDP-negotiated media
    ports, live H.265 both ways, BYE teardown.
    """
    import socket as socketlib
    import threading

    from .controller import CallSession
    from .core.params import StreamConfig
    from .delivery.rtp import H265Depacketizer, H265Packetizer
    from .io.yuv import synthetic_frames
    from .pipeline.media_pipeline import Frame
    from .signaling.dialog import CallState
    from .signaling.transport import SipEndpoint
    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()
    w, h = (int(t) for t in args.size.split("x"))
    cfg = StreamConfig(width=w, height=h, qp=args.qp)

    # media socket: the port we advertise in SDP and read RTP from
    vsock = socketlib.socket(socketlib.AF_INET, socketlib.SOCK_DGRAM)
    vsock.bind((args.bind, args.media_port))
    vport = vsock.getsockname()[1]
    vsock.settimeout(0.25)

    state = {"dest": None, "rx_frames": 0, "tx_frames": 0, "done": threading.Event()}
    pk = H265Packetizer(mtu=1200)

    from .delivery.rtp import PacketPacer

    def _udp_send(data: bytes) -> None:
        dest = state["dest"]
        if dest is not None:
            vsock.sendto(data, dest)

    # paced release + NAT keepalive (delivery.cpp parity)
    pacer = PacketPacer(_udp_send, fps=args.fps)

    def media_sink(data: bytes, frame) -> None:
        if state["dest"] is None:
            return
        pacer.send_frame([pkt.pack() for pkt in
                          pk.packetize(data, state["tx_frames"] / args.fps)])
        state["tx_frames"] += 1

    # live render surface when one exists (fbdev/kitty), else null — the
    # DisplayFilter/VideoYUVWidget seam (io/display.py)
    from .io.display import DisplaySink

    render = DisplaySink("auto")

    def display(y, u, v) -> None:
        state["rx_frames"] += 1
        try:
            render(y, u, v)
        except Exception:
            pass  # rendering must never kill the call

    ep = SipEndpoint(args.name, args.bind, args.sip_port,
                     media_sink=media_sink, display=display,
                     video_cfg=cfg, media_ports=(0, vport))
    sessions: list = []

    def on_connected(sess: CallSession) -> None:
        remote = sess.negotiation.remote_sdp
        vm = next(m for m in remote.media if m.media == "video")
        state["dest"] = (remote.connection_address, vm.port)
        sessions.append(sess)
        print(f"call connected; sending video to {state['dest']}")

    def on_incoming(sess: CallSession) -> None:
        print("incoming call: answering")
        ep.controller.accept_call(sess)
        on_connected(sess)  # callee: remote SDP is the offer

    ep.controller.on_call_connected = on_connected
    ep.controller.on_incoming_call = on_incoming

    def on_ended(sess) -> None:
        state["done"].set()

    ep.controller.on_call_ended = on_ended

    # RTP receive loop -> depacketize -> decode pipeline
    de = H265Depacketizer()

    def rx_loop() -> None:
        from .delivery.rtp import RtpPacket

        while not state["done"].is_set():
            try:
                data, _ = vsock.recvfrom(65536)
            except (socketlib.timeout, OSError):
                continue
            if not data:
                continue  # peer's NAT keepalive
            try:
                au = de.push(RtpPacket.parse(data))
            except ValueError:
                continue
            if au and sessions and sessions[0].media:
                sessions[0].media.recv.put_packet(au)

    rx = threading.Thread(target=rx_loop, daemon=True)
    rx.start()

    if args.uri:  # caller
        sess = ep.controller.start_call(args.uri)
        deadline = time.time() + 10
        while sess.invite.state != CallState.CONNECTED and time.time() < deadline:
            time.sleep(0.05)
        if sess.invite.state != CallState.CONNECTED:
            print("call failed to connect", file=sys.stderr)
            ep.close()
            return 1
    else:
        print(f"listening on {ep.host}:{ep.port} as {args.name} "
              f"(URI {ep.uri}); media port {vport}")
        while not sessions and not state["done"].is_set():
            time.sleep(0.05)

    # stream synthetic frames for the call duration
    frames = synthetic_frames(w, h, max(2, int(args.duration * args.fps) or 2),
                              seed=1 if args.uri else 2)
    t_end = time.time() + args.duration
    i = 0
    while time.time() < t_end and not state["done"].is_set():
        if sessions and sessions[0].media:
            f = frames[i % len(frames)]
            sessions[0].media.send.put_frame(Frame(f[0], f[1], f[2], time.time()))
            i += 1
        time.sleep(1.0 / args.fps)

    if args.uri and sessions and not state["done"].is_set():
        ep.controller.end_call(sessions[0])
        time.sleep(0.5)
    elif not args.uri:
        state["done"].wait(timeout=15)
    state["done"].set()
    pacer.stop()
    for sess in sessions:
        if sess.media is not None:
            sess.media.stop()
    rx.join(timeout=2)
    ep.close()
    vsock.close()
    print(f"call over: sent {state['tx_frames']} frames, "
          f"received {state['rx_frames']} decoded frames", flush=True)
    ok = bool(state["tx_frames"] and (not args.uri or state["rx_frames"]))
    # skip interpreter teardown: XLA CPU + daemon pipeline threads race the
    # runtime destructor (the reference's Qt app also hard-exits its
    # process after uninit)
    os._exit(0 if ok else 1)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="kvazzup_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("encode")
    pe.add_argument("input")
    pe.add_argument("output")
    pe.add_argument("--qp", type=int, default=32)
    pe.add_argument("--bitrate", type=int, default=0,
                    help="target bits/s (enables closed-loop rate control)")
    pe.add_argument("--fps", type=float, default=30.0)
    pe.add_argument("--size", help="WxH for raw .yuv input")
    pe.add_argument("--frames", type=int, default=None)
    pe.add_argument("--intra-period", type=int, default=64)
    pe.add_argument("--no-deblock", action="store_true")
    pe.add_argument("--sao", action="store_true")
    pe.add_argument("--wpp", action="store_true")
    pe.add_argument("--tiles", type=int, default=1, metavar="N",
                    help="N tile columns (all-intra; the multi-chip shard axis)")
    pe.add_argument("--slices", type=int, default=1, metavar="N",
                    help="N row-aligned slices per picture (RTP loss unit)")
    pe.add_argument("--ctu", type=int, choices=(16, 32, 64), default=16,
                    help="CTU size (kvazaar --ctu; 32/64 quadtree, intra + low-delay P)")
    pe.add_argument("--tu-intra-depth", type=int, choices=(1, 2), default=1,
                    help="intra TU tree depth (kvazaar --tr-depth-intra analog)")
    pe.add_argument("--cu8", action="store_true",
                    help="CU quadtree: allow 8x8 CUs (all-intra; better detail)")
    pe.add_argument("--merge", type=int, choices=(1, 2, 3, 4, 5), default=1,
                    help="MaxNumMergeCand for P slices (kvazaar --merge)")
    pe.add_argument("--rdoq", action="store_true",
                    help="RD-optimized quantization (kvazaar --rd quant)")
    pe.add_argument("--tmvp", action="store_true",
                    help="temporal MV prediction (kvazaar --tmvp)")
    pe.add_argument("--bitdepth", type=int, choices=(8, 10), default=8,
                    help="sample bit depth (10 = Main10; raw input read as "
                         "yuv420p10le)")
    pe.add_argument("--cutree", type=float, default=0.0, metavar="S",
                    help="cu-tree lookahead strength (RA quad64; per-CTB "
                         "adaptive QP from temporal propagation)")
    pe.add_argument("--gop", choices=["ld", "ra"], default="ld",
                    help="ld = low-delay P, ra = hierarchical B GOP4")
    pe.add_argument("--dcn", default=None, metavar="HOST:PORT,...|spawn:N",
                    help="distribute closed GOPs (one per --intra-period) "
                         "over DCN workers (python -m kvazzup_tpu.pipeline.dcn); "
                         "spawn:N launches N local worker processes")
    pe.set_defaults(fn=cmd_encode)

    pi = sub.add_parser("info")
    pi.add_argument("input")
    pi.set_defaults(fn=cmd_info)

    pd = sub.add_parser("decode")
    pd.add_argument("input")
    pd.add_argument("output")
    pd.set_defaults(fn=cmd_decode)

    pc = sub.add_parser("call")
    pc.add_argument("uri", nargs="?", default=None,
                    help="sip:user@host:port to call; omit with --listen")
    pc.add_argument("--listen", action="store_true")
    pc.add_argument("--name", default="kvz")
    pc.add_argument("--bind", default="0.0.0.0")
    pc.add_argument("--sip-port", type=int, default=0)
    pc.add_argument("--media-port", type=int, default=0)
    pc.add_argument("--size", default="96x64")
    pc.add_argument("--qp", type=int, default=30)
    pc.add_argument("--fps", type=float, default=10.0)
    pc.add_argument("--duration", type=float, default=3.0)
    pc.set_defaults(fn=cmd_call)

    pp = sub.add_parser("psnr")
    pp.add_argument("a")
    pp.add_argument("b")
    pp.add_argument("--size", required=True)
    pp.set_defaults(fn=cmd_psnr)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
