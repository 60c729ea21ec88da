"""Mesh-conference SDP synthesis.

Parity: the reference's SDPMeshConference (/root/reference/src/initiation/
negotiation/sdpmeshconference.h:6-53): the conference host keeps a template
per participant and synthesizes cross-participant SDPs so every pair gets a
distinct media session — either RTP-multiplexed (shared port + SSRC/MID
demux) or port-shifted (distinct ports per remote peer).
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from enum import Enum

from .sdp import MediaInfo, SdpInfo


class MeshType(Enum):
    NONE = 0
    RTP_MULTIPLEX = 1  # all peers on the same m-line ports, demux by SSRC/MID
    PORT_SHIFTED = 2  # distinct port pair per remote peer


class SdpMeshConference:
    """Host-side synthesis of per-pair SDPs for an N-way mesh call."""

    def __init__(self, mesh_type: MeshType = MeshType.PORT_SHIFTED, port_step: int = 4) -> None:
        self.mesh_type = mesh_type
        self.port_step = port_step
        self.templates: dict[int, SdpInfo] = {}  # session id -> that peer's SDP

    def add_remote_sdp(self, session_id: int, sdp: SdpInfo) -> None:
        self.templates[session_id] = sdp

    def remove_session(self, session_id: int) -> None:
        self.templates.pop(session_id, None)

    def synthesize(self, for_session: int, from_session: int) -> SdpInfo:
        """SDP describing `from_session`'s media as offered to `for_session`.

        With PORT_SHIFTED, each (from, for) pair gets a unique port offset so
        peers address distinct sockets; with RTP_MULTIPLEX ports are shared
        and a per-pair MID distinguishes streams."""
        base = self.templates[from_session]
        out = copy.deepcopy(base)
        if self.mesh_type == MeshType.PORT_SHIFTED:
            shift = self.port_step * self._pair_index(for_session, from_session)
            for m in out.media:
                if m.port:
                    m.port += shift
        elif self.mesh_type == MeshType.RTP_MULTIPLEX:
            for k, m in enumerate(out.media):
                m.mid = f"{from_session}-{for_session}-{k}"
        return out

    def _pair_index(self, a: int, b: int) -> int:
        """Combinatorial index of the unordered pair {a, b}: every pair of
        participants gets its own port offset, so all directed streams in
        the conference land on distinct ports (the reference's port-shifted
        strategy, sdpmeshconference.h)."""
        from itertools import combinations

        ids = sorted(self.templates)
        pair = tuple(sorted((a, b)))
        for i, p in enumerate(combinations(ids, 2)):
            if p == pair:
                return i
        return 0

    def all_for(self, for_session: int) -> list:
        """All other participants' synthesized SDPs for one participant."""
        return [
            self.synthesize(for_session, sid)
            for sid in sorted(self.templates)
            if sid != for_session
        ]
