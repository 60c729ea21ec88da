"""STUN messages (RFC 5389): encode/decode with XOR-mapped addresses.

Parity: the reference's in-repo STUN stack (/root/reference/src/
stunmessage.h:41 magic cookie 0x2112A442, XOR-mapped addr, transaction-ID
tracking in stunmessagefactory.h:5-35) — the foundation of ICE
connectivity checks (media/delivery/ice*).
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field

MAGIC_COOKIE = 0x2112A442

BINDING_REQUEST = 0x0001
BINDING_RESPONSE = 0x0101
BINDING_ERROR = 0x0111
BINDING_INDICATION = 0x0011

ATTR_MAPPED_ADDRESS = 0x0001
ATTR_USERNAME = 0x0006
ATTR_ERROR_CODE = 0x0009
ATTR_XOR_MAPPED_ADDRESS = 0x0020
ATTR_PRIORITY = 0x0024
ATTR_USE_CANDIDATE = 0x0025
ATTR_ICE_CONTROLLED = 0x8029
ATTR_ICE_CONTROLLING = 0x802A


@dataclass
class StunMessage:
    msg_type: int = BINDING_REQUEST
    transaction_id: bytes = field(default_factory=lambda: os.urandom(12))
    attributes: list = field(default_factory=list)  # (type, bytes)

    def add_attr(self, atype: int, data: bytes) -> None:
        self.attributes.append((atype, data))

    def get_attr(self, atype: int) -> bytes | None:
        for t, d in self.attributes:
            if t == atype:
                return d
        return None

    def set_xor_mapped_address(self, address: str, port: int) -> None:
        ip = bytes(int(x) for x in address.split("."))
        xport = port ^ (MAGIC_COOKIE >> 16)
        xip = bytes(b ^ m for b, m in zip(ip, struct.pack("!I", MAGIC_COOKIE)))
        self.add_attr(ATTR_XOR_MAPPED_ADDRESS, struct.pack("!BBH", 0, 1, xport) + xip)

    def xor_mapped_address(self) -> tuple | None:
        d = self.get_attr(ATTR_XOR_MAPPED_ADDRESS)
        if not d or len(d) < 8 or d[1] != 1:
            return None
        xport = struct.unpack("!H", d[2:4])[0] ^ (MAGIC_COOKIE >> 16)
        ip = bytes(b ^ m for b, m in zip(d[4:8], struct.pack("!I", MAGIC_COOKIE)))
        return ".".join(str(b) for b in ip), xport

    def pack(self) -> bytes:
        body = b""
        for t, d in self.attributes:
            pad = (4 - len(d) % 4) % 4
            body += struct.pack("!HH", t, len(d)) + d + b"\x00" * pad
        hdr = struct.pack("!HHI", self.msg_type, len(body), MAGIC_COOKIE)
        return hdr + self.transaction_id + body

    @classmethod
    def parse(cls, data: bytes) -> "StunMessage":
        if len(data) < 20:
            raise ValueError("short STUN message")
        mtype, length, cookie = struct.unpack("!HHI", data[:8])
        if cookie != MAGIC_COOKIE:
            raise ValueError("bad magic cookie")
        msg = cls(mtype, data[8:20])
        pos = 20
        end = 20 + length
        while pos + 4 <= min(end, len(data)):
            t, alen = struct.unpack("!HH", data[pos : pos + 4])
            msg.attributes.append((t, data[pos + 4 : pos + 4 + alen]))
            pos += 4 + alen + ((4 - alen % 4) % 4)
        return msg


class StunTransactionTracker:
    """Outstanding-transaction bookkeeping (StunMessageFactory parity)."""

    def __init__(self) -> None:
        self._pending: dict[bytes, float] = {}

    def track(self, msg: StunMessage, now: float) -> None:
        self._pending[msg.transaction_id] = now

    def match_response(self, msg: StunMessage) -> bool:
        return self._pending.pop(msg.transaction_id, None) is not None

    def expire(self, now: float, timeout: float = 3.0) -> int:
        old = [t for t, ts in self._pending.items() if now - ts > timeout]
        for t in old:
            del self._pending[t]
        return len(old)
