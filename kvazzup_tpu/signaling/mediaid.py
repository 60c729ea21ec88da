"""MediaID: stable identity for negotiated media streams (m-lines).

Parity: /root/reference/src/mediaid.{h,cpp} — a monotonically numbered
handle for one SDP media description with send/receive direction state,
equal to a MediaInfo when mid/ssrc/type/port/proto/address all match
(mediaid.cpp:86-96).  The registry keeps IDs stable across re-INVITEs:
an m-line that renegotiates unchanged keeps its MediaID (and therefore
its RTP session / pipelines), while a changed one gets a fresh ID so
the media layer rebuilds only what actually changed.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field


def _attr(media, name: str) -> str | None:
    """First a=<name>:<value> attribute of an SDP MediaInfo, if any."""
    for a in getattr(media, "attributes", []) or []:
        if isinstance(a, tuple) and len(a) == 2 and a[0] == name:
            return a[1]
        if isinstance(a, str) and a.startswith(name + ":"):
            return a[len(name) + 1 :]
    return None


def _key(media, connection_address: str = "") -> tuple:
    """The identity tuple (mediaid.cpp areMediasEqual fields)."""
    return (
        _attr(media, "mid"),
        _attr(media, "ssrc"),
        getattr(media, "media", None),
        getattr(media, "port", None),
        getattr(media, "proto", "RTP/AVP"),
        connection_address or getattr(media, "connection_address", ""),
    )


@dataclass
class MediaID:
    """One media stream's stable handle + direction state."""

    id: int
    key: tuple
    send: bool = True
    receive: bool = True

    def matches(self, media, connection_address: str = "") -> bool:
        return self.key == _key(media, connection_address)

    def __str__(self) -> str:
        return str(self.id)

    def __hash__(self) -> int:
        return hash(self.id)

    def __eq__(self, other) -> bool:
        return isinstance(other, MediaID) and other.id == self.id


class MediaIDRegistry:
    """Maps negotiated m-lines to stable MediaIDs across renegotiations."""

    def __init__(self) -> None:
        self._next = itertools.count(1)
        self._ids: list[MediaID] = []

    def get(self, media, connection_address: str = "") -> MediaID:
        """Existing ID for an unchanged m-line, else a fresh one."""
        key = _key(media, connection_address)
        for mid in self._ids:
            if mid.key == key:
                return mid
        mid = MediaID(next(self._next), key)
        self._ids.append(mid)
        return mid

    def resolve_sdp(self, sdp) -> list:
        """MediaIDs for every m-line of a parsed SDP (in order)."""
        addr = getattr(sdp, "connection_address", "")
        return [self.get(m, addr) for m in sdp.media]

    def prune(self, keep) -> None:
        """Drop IDs not in `keep` (session ended / m-line removed)."""
        keep_ids = {m.id for m in keep}
        self._ids = [m for m in self._ids if m.id in keep_ids]
