"""RTP/RTCP and the H.265 RTP payload format (RFC 3550 + RFC 7798).

Parity: the reference delegates this to uvgRTP (delivery.cpp:84-90 codec ->
rtp_format map, fragmentation pacing :309-349; uvgrtpsender/receiver glue).
Here the packetization lives in-framework: single-NAL and FU (type 49)
fragmentation units, Annex-B <-> RTP in both directions, plus minimal RTCP
SR/RR (the receiver-report fields the AIMD controller consumes,
uvgrtpsender.cpp:121-148).
"""

from __future__ import annotations

import struct
import time
from dataclasses import dataclass, field

from ..core.nal import split_annexb

RTP_VERSION = 2
MTU_PAYLOAD = 1400
FU_TYPE = 49


@dataclass
class RtpPacket:
    payload_type: int
    seq: int
    timestamp: int
    ssrc: int
    payload: bytes
    marker: bool = False

    def pack(self) -> bytes:
        b0 = RTP_VERSION << 6
        b1 = (0x80 if self.marker else 0) | (self.payload_type & 0x7F)
        return struct.pack("!BBHII", b0, b1, self.seq & 0xFFFF,
                          self.timestamp & 0xFFFFFFFF, self.ssrc) + self.payload

    @classmethod
    def parse(cls, data: bytes) -> "RtpPacket":
        if len(data) < 12:
            raise ValueError("short RTP packet")
        b0, b1, seq, ts, ssrc = struct.unpack("!BBHII", data[:12])
        if b0 >> 6 != RTP_VERSION:
            raise ValueError("bad RTP version")
        csrc = b0 & 0x0F
        off = 12 + 4 * csrc
        if b0 & 0x10:  # extension
            if len(data) < off + 4:
                raise ValueError("truncated extension")
            ext_len = struct.unpack("!H", data[off + 2 : off + 4])[0]
            off += 4 + 4 * ext_len
        payload = data[off:]
        if b0 & 0x20 and payload:  # padding
            payload = payload[: -payload[-1]]
        return cls(b1 & 0x7F, seq, ts, ssrc, payload, bool(b1 & 0x80))


class H265Packetizer:
    """Annex-B access unit -> RTP packets (single NAL / FU)."""

    def __init__(self, payload_type: int = 97, ssrc: int = 0x12345678,
                 mtu: int = MTU_PAYLOAD, clock_rate: int = 90000) -> None:
        self.payload_type = payload_type
        self.ssrc = ssrc
        self.mtu = mtu
        self.clock = clock_rate
        self.seq = 0
        self.bytes_sent = 0
        self.packets_sent = 0

    def packetize(self, annexb: bytes, pts_seconds: float) -> list:
        ts = int(pts_seconds * self.clock)
        packets = []
        nals = split_annexb(annexb)
        for i, nal in enumerate(nals):
            # rebuild the on-wire NAL (header + EPB payload)
            from ..core.bitstream import insert_emulation_prevention

            raw = bytes(
                [
                    (int(nal.nal_type) << 1) | (nal.layer_id >> 5),
                    ((nal.layer_id & 0x1F) << 3) | nal.temporal_id_plus1,
                ]
            ) + insert_emulation_prevention(nal.rbsp)
            last_nal = i == len(nals) - 1
            if len(raw) <= self.mtu:
                packets.append(self._make(raw, ts, marker=last_nal))
            else:
                packets += self._fragment(raw, ts, last_nal)
        return packets

    def _make(self, payload: bytes, ts: int, marker: bool) -> RtpPacket:
        pkt = RtpPacket(self.payload_type, self.seq, ts, self.ssrc, payload, marker)
        self.seq = (self.seq + 1) & 0xFFFF
        self.bytes_sent += len(payload) + 12
        self.packets_sent += 1
        return pkt

    def _fragment(self, nal: bytes, ts: int, last_nal: bool) -> list:
        """FU (RFC 7798 4.4.3): PayloadHdr(type=49) + FU header + fragments."""
        nal_type = (nal[0] >> 1) & 0x3F
        ph = bytes([(nal[0] & 0x81) | (FU_TYPE << 1), nal[1]])
        data = nal[2:]
        out = []
        pos = 0
        chunk = self.mtu - 3
        while pos < len(data):
            frag = data[pos : pos + chunk]
            start = pos == 0
            end = pos + len(frag) >= len(data)
            fu_hdr = (0x80 if start else 0) | (0x40 if end else 0) | nal_type
            out.append(self._make(ph + bytes([fu_hdr]) + frag, ts, marker=end and last_nal))
            pos += len(frag)
        return out


class H265Depacketizer:
    """RTP packets -> Annex-B byte stream (reassembles FUs; inserts start
    codes — uvgrtpreceiver.cpp:86-104 start-code fallback parity)."""

    def __init__(self, expected_ssrc: int | None = None) -> None:
        self.expected_ssrc = expected_ssrc
        self._fu_buf: bytearray | None = None
        self._fu_type = 0
        self.packets_lost = 0
        self._last_seq: int | None = None

    def push(self, pkt: RtpPacket) -> bytes:
        """Returns any completed Annex-B bytes (possibly empty)."""
        if self.expected_ssrc is not None and pkt.ssrc != self.expected_ssrc:
            return b""
        if self._last_seq is not None:
            gap = (pkt.seq - self._last_seq) & 0xFFFF
            if gap > 1 and gap < 0x8000:
                self.packets_lost += gap - 1
                self._fu_buf = None  # drop incomplete fragment run
        self._last_seq = pkt.seq
        p = pkt.payload
        if len(p) < 2:
            return b""
        nal_type = (p[0] >> 1) & 0x3F
        if nal_type != FU_TYPE:
            return b"\x00\x00\x00\x01" + p
        if len(p) < 3:
            return b""
        fu = p[2]
        orig_type = fu & 0x3F
        if fu & 0x80:  # start
            hdr0 = (p[0] & 0x81) | (orig_type << 1)
            self._fu_buf = bytearray([hdr0, p[1]]) + bytearray(p[3:])
            return b""
        if self._fu_buf is None:
            return b""
        self._fu_buf += p[3:]
        if fu & 0x40:  # end
            out = b"\x00\x00\x00\x01" + bytes(self._fu_buf)
            self._fu_buf = None
            return out
        return b""


# ------------------------------------------------------------------ RTCP


@dataclass
class ReportBlock:
    ssrc: int
    fraction_lost: int  # 0..255
    cumulative_lost: int
    highest_seq: int
    jitter: int
    lsr: int = 0
    dlsr: int = 0

    def pack(self) -> bytes:
        lost24 = self.cumulative_lost & 0xFFFFFF
        return struct.pack(
            "!IIIIII",
            self.ssrc,
            (self.fraction_lost << 24) | lost24,
            self.highest_seq,
            self.jitter,
            self.lsr,
            self.dlsr,
        )

    @classmethod
    def parse(cls, data: bytes) -> "ReportBlock":
        ssrc, fl, seq, jit, lsr, dlsr = struct.unpack("!IIIIII", data[:24])
        return cls(ssrc, fl >> 24, fl & 0xFFFFFF, seq, jit, lsr, dlsr)


def pack_receiver_report(sender_ssrc: int, blocks: list) -> bytes:
    hdr = struct.pack("!BBH", (RTP_VERSION << 6) | len(blocks), 201, 1 + 6 * len(blocks))
    return hdr + struct.pack("!I", sender_ssrc) + b"".join(b.pack() for b in blocks)


def parse_rtcp(data: bytes) -> list:
    """Parse a compound RTCP packet; returns list of ('rr'|'sr', ssrc, blocks)."""
    out = []
    pos = 0
    while pos + 4 <= len(data):
        b0, pt, length = struct.unpack("!BBH", data[pos : pos + 4])
        count = b0 & 0x1F
        size = 4 * (length + 1)
        body = data[pos + 4 : pos + size]
        if pt in (200, 201):
            ssrc = struct.unpack("!I", body[:4])[0]
            off = 4 + (20 if pt == 200 else 0)
            blocks = [
                ReportBlock.parse(body[off + i * 24 : off + (i + 1) * 24])
                for i in range(count)
                if off + (i + 1) * 24 <= len(body)
            ]
            out.append(("sr" if pt == 200 else "rr", ssrc, blocks))
        pos += size
    return out


def pack_sdes(ssrc: int, cname: str) -> bytes:
    """RTCP SDES with one CNAME chunk (RFC 3550 6.5; uvgRTP emits this in
    every compound report)."""
    item = bytes([1, len(cname)]) + cname.encode()
    chunk = struct.pack("!I", ssrc) + item + b"\x00"
    pad = (4 - len(chunk) % 4) % 4
    chunk += b"\x00" * pad
    hdr = struct.pack("!BBH", (RTP_VERSION << 6) | 1, 202, len(chunk) // 4)
    return hdr + chunk


def pack_bye(ssrc: int, reason: str = "") -> bytes:
    """RTCP BYE (RFC 3550 6.6): session teardown on the media plane (the
    reference's uvgRTP sends this when a stream is destroyed)."""
    body = struct.pack("!I", ssrc)
    if reason:
        r = reason.encode()[:255]
        body += bytes([len(r)]) + r
        pad = (4 - len(body) % 4) % 4
        body += b"\x00" * pad
    hdr = struct.pack("!BBH", (RTP_VERSION << 6) | 1, 203, len(body) // 4)
    return hdr + body


def parse_rtcp_full(data: bytes) -> list:
    """Parse a compound RTCP packet including SDES ('sdes', ssrc, cname)
    and BYE ('bye', ssrc, reason) entries alongside SR/RR."""
    out = list(parse_rtcp(data))
    pos = 0
    while pos + 4 <= len(data):
        b0, pt, length = struct.unpack("!BBH", data[pos : pos + 4])
        size = 4 * (length + 1)
        body = data[pos + 4 : pos + size]
        if pt == 202 and len(body) >= 6:
            ssrc = struct.unpack("!I", body[:4])[0]
            if body[4] == 1:
                n = body[5]
                out.append(("sdes", ssrc, body[6 : 6 + n].decode(errors="replace")))
        elif pt == 203 and len(body) >= 4:
            ssrc = struct.unpack("!I", body[:4])[0]
            reason = ""
            if len(body) > 4:
                n = body[4]
                reason = body[5 : 5 + n].decode(errors="replace")
            out.append(("bye", ssrc, reason))
        pos += size
    return out


class PacketPacer:
    """Frame-burst pacing (delivery.cpp:309-343 parity): an encoded frame
    fragments into many RTP packets; blasting them back-to-back overflows
    home-router queues, so packets are released spread over a pace window
    (a fraction of the frame interval).  Also owns the hole-punch
    keepalive: when nothing was sent for `keepalive_s`, a zero-length UDP
    datagram keeps the NAT binding alive (delivery.cpp keepalive timer).
    """

    def __init__(self, send_fn, fps: float = 30.0, window_frac: float = 0.5,
                 keepalive_s: float = 2.0, max_burst: int = 4) -> None:
        import threading
        import time as _time

        self.send_fn = send_fn
        self.window = window_frac / max(fps, 1.0)
        self.keepalive_s = keepalive_s
        self.max_burst = max_burst
        self._q: list = []
        self._lock = threading.Lock()
        self._kick = threading.Event()
        self._stop = threading.Event()
        self._last_send = _time.monotonic()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def send_frame(self, packets: list) -> None:
        """Queue one frame's packets for paced release."""
        with self._lock:
            self._q.append(list(packets))
        self._kick.set()

    def stop(self) -> None:
        self._stop.set()
        self._kick.set()
        self._thread.join(timeout=2)

    def _run(self) -> None:
        import time as _time

        while not self._stop.is_set():
            with self._lock:
                frame = self._q.pop(0) if self._q else None
            if frame is None:
                if self._kick.wait(timeout=self.keepalive_s):
                    self._kick.clear()
                    continue
                # idle for keepalive_s: punch the NAT
                if _time.monotonic() - self._last_send >= self.keepalive_s:
                    self.send_fn(b"")
                    self._last_send = _time.monotonic()
                continue
            n = len(frame)
            bursts = [frame[i : i + self.max_burst]
                      for i in range(0, n, self.max_burst)]
            gap = self.window / max(len(bursts), 1)
            for burst in bursts:
                for pkt in burst:
                    self.send_fn(pkt)
                self._last_send = _time.monotonic()
                if self._stop.is_set():
                    return
                _time.sleep(gap)
