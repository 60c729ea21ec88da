"""ICE connectivity establishment (RFC 8445 subset).

Parity: the reference's ICE stack (/root/reference/src/media/delivery/
ice.cpp pair formation per component :217-272, RFC-8445 pair priority
:248-252, IceSessionTester / ICECandidateTester / ICEPairTester check
threads, controller nominates / controllee waits
icesessiontester.cpp:128-190) and NetworkCandidates (interface enumeration,
ICE port pool 23000-24000, global.h:34-35).
"""

from __future__ import annotations

import queue
import socket
import threading
import time
from dataclasses import dataclass, field

from ..signaling.sdp import IceCandidate
from ..utils.logging import Logger
from .stun import (
    ATTR_ICE_CONTROLLED,
    ATTR_ICE_CONTROLLING,
    ATTR_PRIORITY,
    ATTR_USE_CANDIDATE,
    ATTR_USERNAME,
    BINDING_REQUEST,
    BINDING_RESPONSE,
    StunMessage,
    StunTransactionTracker,
)

ICE_PORT_MIN = 23000  # global.h:34-35
ICE_PORT_MAX = 24000

TYPE_PREF = {"host": 126, "prflx": 110, "srflx": 100, "relay": 0}


def candidate_priority(cand_type: str, local_pref: int, component: int) -> int:
    """RFC 8445 5.1.2.1."""
    return (TYPE_PREF.get(cand_type, 0) << 24) + (local_pref << 8) + (256 - component)


def pair_priority(controlling_prio: int, controlled_prio: int) -> int:
    """RFC 8445 6.1.2.3 (ice.cpp:248-252 parity)."""
    g, d = controlling_prio, controlled_prio
    return (min(g, d) << 32) + 2 * max(g, d) + (1 if g > d else 0)


def local_host_addresses() -> list:
    """Local interface enumeration (NetworkCandidates parity)."""
    addrs = set()
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.connect(("10.255.255.255", 1))
        addrs.add(s.getsockname()[0])
        s.close()
    except OSError:
        pass
    try:
        for info in socket.getaddrinfo(socket.gethostname(), None, socket.AF_INET):
            addrs.add(info[4][0])
    except OSError:
        pass
    addrs.add("127.0.0.1")
    return sorted(addrs)


def gather_host_candidates(components: int = 2, port_base: int | None = None) -> list:
    """Host candidates for each local interface x component."""
    out = []
    foundation = 1
    for li, addr in enumerate(local_host_addresses()):
        for comp in range(1, components + 1):
            out.append(
                IceCandidate(
                    foundation=str(foundation),
                    component=comp,
                    transport="udp",
                    priority=candidate_priority("host", 65535 - li, comp),
                    address=addr,
                    port=0 if port_base is None else port_base + comp - 1,
                    cand_type="host",
                )
            )
        foundation += 1
    return out


@dataclass(order=True)
class CandidatePair:
    priority: int
    local: IceCandidate = field(compare=False)
    remote: IceCandidate = field(compare=False)
    nominated: bool = field(default=False, compare=False)
    succeeded: bool = field(default=False, compare=False)


def form_pairs(local, remote, controlling: bool) -> list:
    """Pair local x remote per component, sorted by decreasing priority
    (ice.cpp:217-272)."""
    pairs = []
    for lc in local:
        for rc in remote:
            if lc.component != rc.component or lc.transport.lower() != rc.transport.lower():
                continue
            g = lc.priority if controlling else rc.priority
            d = rc.priority if controlling else lc.priority
            pairs.append(CandidatePair(pair_priority(g, d), lc, rc))
    return sorted(pairs, key=lambda p: -p.priority)


class IceAgent:
    """Per-session connectivity agent: runs STUN binding checks over one
    UDP socket per component; the controlling side nominates the first
    working pair, the controlled side mirrors (IceSessionTester parity)."""

    def __init__(self, controlling: bool, username: str = "kvz", password: str = "") -> None:
        self.controlling = controlling
        self.username = username
        self._socks: dict[int, socket.socket] = {}
        self._tracker = StunTransactionTracker()
        self._stop = threading.Event()
        self._nominated: dict[int, CandidatePair] = {}
        self._result_q: queue.Queue = queue.Queue()

    def bind_component(self, component: int, address: str = "0.0.0.0", port: int = 0) -> tuple:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind((address, port))
        s.settimeout(0.2)
        self._socks[component] = s
        return s.getsockname()

    def nominated_pairs(self) -> dict:
        return dict(self._nominated)

    def run_checks(self, pairs: list, timeout: float = 5.0) -> dict:
        """Run connectivity checks until every component has a nominated
        pair or timeout.  Returns {component: CandidatePair}."""
        deadline = time.monotonic() + timeout
        components = {p.local.component for p in pairs}
        listener = threading.Thread(target=self._listen_loop, args=(deadline,), daemon=True)
        listener.start()
        idx = 0
        ordered = list(pairs)
        while time.monotonic() < deadline and not self._stop.is_set():
            if components <= set(self._nominated):
                break
            if idx < len(ordered):
                p = ordered[idx]
                idx += 1
                if p.local.component in self._nominated:
                    continue
                self._send_check(p, nominate=self.controlling)
            else:
                time.sleep(0.05)
                idx = 0  # retransmit round
        self._stop.set()
        listener.join(timeout=1)
        return dict(self._nominated)

    def _send_check(self, pair: CandidatePair, nominate: bool) -> None:
        sock = self._socks.get(pair.local.component)
        if sock is None:
            return
        msg = StunMessage(BINDING_REQUEST)
        msg.add_attr(ATTR_USERNAME, self.username.encode())
        msg.add_attr(ATTR_PRIORITY, pair.local.priority.to_bytes(4, "big"))
        msg.add_attr(
            ATTR_ICE_CONTROLLING if self.controlling else ATTR_ICE_CONTROLLED, b"\0" * 8
        )
        if nominate:
            msg.add_attr(ATTR_USE_CANDIDATE, b"")
        self._tracker.track(msg, time.monotonic())
        self._pending_pair = (msg.transaction_id, pair)
        try:
            sock.sendto(msg.pack(), (pair.remote.address, pair.remote.port))
        except OSError:
            pass

    def _listen_loop(self, deadline: float) -> None:
        while time.monotonic() < deadline and not self._stop.is_set():
            for comp, sock in list(self._socks.items()):
                try:
                    data, addr = sock.recvfrom(2048)
                except (socket.timeout, OSError):
                    continue
                try:
                    msg = StunMessage.parse(data)
                except ValueError:
                    continue
                if msg.msg_type == BINDING_REQUEST:
                    resp = StunMessage(BINDING_RESPONSE, msg.transaction_id)
                    resp.set_xor_mapped_address(addr[0], addr[1])
                    sock.sendto(resp.pack(), addr)
                    if msg.get_attr(ATTR_USE_CANDIDATE) is not None and not self.controlling:
                        # controlled side: peer nominated this path
                        cand = IceCandidate("peer", comp, "udp", 0, addr[0], addr[1], "prflx")
                        local = IceCandidate(
                            "local", comp, "udp", 0, sock.getsockname()[0], sock.getsockname()[1], "host"
                        )
                        pair = CandidatePair(0, local, cand, nominated=True, succeeded=True)
                        self._nominated.setdefault(comp, pair)
                elif msg.msg_type == BINDING_RESPONSE:
                    if self._tracker.match_response(msg):
                        tid, pair = getattr(self, "_pending_pair", (None, None))
                        if pair is not None and self.controlling:
                            pair.succeeded = True
                            pair.nominated = True
                            self._nominated.setdefault(pair.local.component, pair)
