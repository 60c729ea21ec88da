"""SDP (RFC 8866) session descriptions: model, parser, serializer,
offer/answer.

Parity: the reference's sdptypes.h:131-170 data model, sipcontent.{h,cpp}
text codec, sdpdefault.h template generation (dynamic payload types for
opus/H265), and the sdpnegotiation.cpp offer/answer state machine.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum


@dataclass
class RtpMap:
    payload_type: int
    codec: str
    clock_rate: int
    channels: int | None = None

    def to_attr(self) -> str:
        ch = f"/{self.channels}" if self.channels else ""
        return f"rtpmap:{self.payload_type} {self.codec}/{self.clock_rate}{ch}"


@dataclass
class IceCandidate:
    foundation: str
    component: int
    transport: str
    priority: int
    address: str
    port: int
    cand_type: str
    rel_address: str | None = None
    rel_port: int | None = None

    def to_attr(self) -> str:
        s = (
            f"candidate:{self.foundation} {self.component} {self.transport} "
            f"{self.priority} {self.address} {self.port} typ {self.cand_type}"
        )
        if self.rel_address:
            s += f" raddr {self.rel_address} rport {self.rel_port}"
        return s

    @classmethod
    def parse(cls, value: str) -> "IceCandidate":
        t = value.split()
        c = cls(t[0], int(t[1]), t[2], int(t[3]), t[4], int(t[5]), t[7])
        if "raddr" in t:
            i = t.index("raddr")
            c.rel_address = t[i + 1]
            c.rel_port = int(t[t.index("rport") + 1])
        return c


@dataclass
class MediaInfo:
    media: str  # audio / video
    port: int
    proto: str = "RTP/AVP"
    payload_types: list = field(default_factory=list)
    rtpmaps: list = field(default_factory=list)
    attributes: list = field(default_factory=list)  # (name, value|None)
    connection_address: str | None = None
    direction: str = "sendrecv"
    candidates: list = field(default_factory=list)
    mid: str | None = None

    def codec_names(self) -> list:
        return [m.codec for m in self.rtpmaps]


@dataclass
class SdpInfo:
    origin_username: str = "-"
    session_id: int = 0
    session_version: int = 0
    origin_address: str = "0.0.0.0"
    session_name: str = "-"
    connection_address: str = "0.0.0.0"
    timing: tuple = (0, 0)
    media: list = field(default_factory=list)
    attributes: list = field(default_factory=list)


def compose_sdp(s: SdpInfo) -> str:
    lines = [
        "v=0",
        f"o={s.origin_username} {s.session_id} {s.session_version} IN IP4 {s.origin_address}",
        f"s={s.session_name}",
        f"c=IN IP4 {s.connection_address}",
        f"t={s.timing[0]} {s.timing[1]}",
    ]
    for name, value in s.attributes:
        lines.append(f"a={name}" if value is None else f"a={name}:{value}")
    for m in s.media:
        pts = " ".join(str(p) for p in m.payload_types)
        lines.append(f"m={m.media} {m.port} {m.proto} {pts}")
        if m.connection_address:
            lines.append(f"c=IN IP4 {m.connection_address}")
        if m.mid:
            lines.append(f"a=mid:{m.mid}")
        for r in m.rtpmaps:
            lines.append(f"a={r.to_attr()}")
        for c in m.candidates:
            lines.append(f"a={c.to_attr()}")
        lines.append(f"a={m.direction}")
        for name, value in m.attributes:
            lines.append(f"a={name}" if value is None else f"a={name}:{value}")
    return "\r\n".join(lines) + "\r\n"


def parse_sdp(text: str) -> SdpInfo:
    s = SdpInfo()
    cur: MediaInfo | None = None
    for raw in text.replace("\r\n", "\n").split("\n"):
        if len(raw) < 2 or raw[1] != "=":
            continue
        key, val = raw[0], raw[2:].strip()
        if key == "o":
            t = val.split()
            s.origin_username = t[0]
            s.session_id = int(t[1])
            s.session_version = int(t[2])
            s.origin_address = t[5]
        elif key == "s":
            s.session_name = val
        elif key == "c":
            addr = val.split()[2]
            if cur is None:
                s.connection_address = addr
            else:
                cur.connection_address = addr
        elif key == "t":
            a, b = val.split()[:2]
            s.timing = (int(a), int(b))
        elif key == "m":
            t = val.split()
            cur = MediaInfo(t[0], int(t[1]), t[2], [int(p) for p in t[3:]])
            s.media.append(cur)
        elif key == "a":
            name, _, value = val.partition(":")
            target = cur.attributes if cur is not None else s.attributes
            if name == "rtpmap" and cur is not None:
                pt, codec = value.split(" ", 1)
                parts = codec.split("/")
                cur.rtpmaps.append(
                    RtpMap(int(pt), parts[0], int(parts[1]),
                           int(parts[2]) if len(parts) > 2 else None)
                )
            elif name == "candidate" and cur is not None:
                cur.candidates.append(IceCandidate.parse(value))
            elif name == "mid" and cur is not None:
                cur.mid = value
            elif name in ("sendrecv", "sendonly", "recvonly", "inactive") and cur is not None:
                cur.direction = name
            else:
                target.append((name, value if value else None))
    return s


def default_sdp(username: str, local_address: str, audio_port: int = 0, video_port: int = 0) -> SdpInfo:
    """Template offer: opus + H265 with dynamic payload types
    (sdpdefault.h:13-20 parity)."""
    return SdpInfo(
        origin_username=username,
        origin_address=local_address,
        connection_address=local_address,
        session_name="kvazzup_tpu",
        media=[
            MediaInfo("audio", audio_port, payload_types=[96],
                      rtpmaps=[RtpMap(96, "opus", 48000, 2)]),
            MediaInfo("video", video_port, payload_types=[97],
                      rtpmaps=[RtpMap(97, "H265", 90000)]),
        ],
    )


class NegotiationState(Enum):
    NO_STATE = 0
    OFFER_SENT = 1
    OFFER_RECEIVED = 2
    FINISHED = 3


class SdpNegotiation:
    """Offer/answer state machine (sdpnegotiation.cpp:47-272 parity)."""

    def __init__(self, local_template: SdpInfo) -> None:
        self.state = NegotiationState.NO_STATE
        self.local_template = local_template
        self.local_sdp: SdpInfo | None = None
        self.remote_sdp: SdpInfo | None = None

    def make_offer(self) -> SdpInfo:
        if self.state not in (NegotiationState.NO_STATE, NegotiationState.FINISHED):
            raise RuntimeError(f"cannot offer in state {self.state}")
        self.local_sdp = self.local_template
        self.state = NegotiationState.OFFER_SENT
        return self.local_sdp

    def handle_offer(self, offer: SdpInfo) -> None:
        if self.state not in (NegotiationState.NO_STATE, NegotiationState.FINISHED):
            raise RuntimeError(f"unexpected offer in state {self.state}")
        self.remote_sdp = offer
        self.state = NegotiationState.OFFER_RECEIVED

    def make_answer(self) -> SdpInfo:
        if self.state != NegotiationState.OFFER_RECEIVED:
            raise RuntimeError("no offer to answer")
        answer = SdpInfo(
            origin_username=self.local_template.origin_username,
            origin_address=self.local_template.origin_address,
            connection_address=self.local_template.connection_address,
            session_name=self.local_template.session_name,
        )
        # answer each offered m-line with our matching codecs (or reject with port 0)
        ours = {m.media: m for m in self.local_template.media}
        for m in self.remote_sdp.media:
            local = ours.get(m.media)
            common = []
            if local:
                local_codecs = {r.codec.lower() for r in local.rtpmaps}
                common = [r for r in m.rtpmaps if r.codec.lower() in local_codecs]
            if not common:
                answer.media.append(MediaInfo(m.media, 0, m.proto, m.payload_types))
                continue
            answer.media.append(
                MediaInfo(
                    m.media,
                    local.port,
                    m.proto,
                    [r.payload_type for r in common],
                    rtpmaps=common,
                )
            )
        self.local_sdp = answer
        self.state = NegotiationState.FINISHED
        return answer

    def handle_answer(self, answer: SdpInfo) -> None:
        if self.state != NegotiationState.OFFER_SENT:
            raise RuntimeError("answer without pending offer")
        self.remote_sdp = answer
        self.state = NegotiationState.FINISHED
