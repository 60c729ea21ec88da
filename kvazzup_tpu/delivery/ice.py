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


# ----------------------------------------------------- server-reflexive

BINDING_INDICATION = 0x0011


class StunServer:
    """Minimal STUN binding server (RFC 5389): replies with the source's
    XOR-MAPPED-ADDRESS.  The reference points NetworkCandidates at a
    public server (stunserver.org, networkcandidates.cpp); this ships the
    server side too so LAN/test deployments need no egress."""

    def __init__(self, host: str = "0.0.0.0", port: int = 0) -> None:
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self.sock.bind((host, port))
        self.host, self.port = self.sock.getsockname()[:2]
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._stop.set()
        try:
            self.sock.close()
        except OSError:
            pass

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                data, addr = self.sock.recvfrom(2048)
            except OSError:
                break
            try:
                msg = StunMessage.parse(data)
            except ValueError:
                continue
            if msg.msg_type == BINDING_REQUEST:
                resp = StunMessage(BINDING_RESPONSE, msg.transaction_id)
                resp.set_xor_mapped_address(addr[0], addr[1])
                try:
                    self.sock.sendto(resp.pack(), addr)
                except OSError:
                    break
            # Binding Indications are keepalives: no response (RFC 5389 7.1)


def discover_srflx(stun_host: str, stun_port: int, sock: socket.socket,
                   retries: int = 3, timeout: float = 0.5):
    """One server-reflexive discovery on an existing socket: STUN Binding
    request -> (mapped_host, mapped_port), or None on timeout.

    Parity: networkcandidates.cpp STUN bindings (the reference keeps one
    binding per pooled port and refreshes it as a keepalive)."""
    req = StunMessage(BINDING_REQUEST)
    old_to = sock.gettimeout()
    try:
        for _ in range(max(1, retries)):
            sock.sendto(req.pack(), (stun_host, stun_port))
            sock.settimeout(timeout)
            try:
                while True:
                    data, addr = sock.recvfrom(2048)
                    if addr[:2] != (stun_host, stun_port):
                        continue  # unrelated traffic on a shared socket
                    msg = StunMessage.parse(data)
                    if (msg.msg_type == BINDING_RESPONSE
                            and msg.transaction_id == req.transaction_id):
                        return msg.xor_mapped_address()
            except (socket.timeout, ValueError):
                continue
    finally:
        sock.settimeout(old_to)
    return None


class StunKeepalive:
    """Periodic Binding Indications so the NAT mapping for a pooled port
    stays alive while a session is being negotiated (networkcandidates.h
    refresh timer parity)."""

    def __init__(self, sock: socket.socket, stun_host: str, stun_port: int,
                 interval: float = 15.0) -> None:
        self.sock, self.dest = sock, (stun_host, stun_port)
        self.interval = interval
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()

    def _loop(self) -> None:
        while not self._stop.wait(self.interval):
            try:
                self.sock.sendto(StunMessage(BINDING_INDICATION).pack(), self.dest)
            except OSError:
                break


class PortPool:
    """ICE media-port reservations (networkcandidates.h:24-104 parity):
    even RTP/odd RTCP pairs handed out per session and returned on
    teardown, from the reference's 23000-24000 range by default."""

    def __init__(self, lo: int = ICE_PORT_MIN, hi: int = ICE_PORT_MAX) -> None:
        self._lo, self._hi = lo, hi
        self._next = lo
        self._free: list = []
        self._held: dict = {}  # session_id -> [(sock, sock), ...]
        self._lock = threading.Lock()

    def reserve_pair(self, session_id) -> tuple:
        """-> ((rtp_sock, rtp_port), (rtcp_sock, rtcp_port)); sockets stay
        bound (the reservation) until release()."""
        with self._lock:
            while True:
                if self._free:
                    base = self._free.pop()
                else:
                    base = self._next
                    self._next += 2
                    if base + 1 > self._hi:
                        raise RuntimeError("ICE port pool exhausted")
                socks = []
                try:
                    for p in (base, base + 1):
                        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
                        s.bind(("0.0.0.0", p))
                        socks.append(s)
                except OSError:
                    for s in socks:
                        s.close()
                    continue  # port taken by someone else: skip the pair
                self._held.setdefault(session_id, []).append(tuple(socks))
                return (socks[0], base), (socks[1], base + 1)

    def release(self, session_id) -> None:
        with self._lock:
            for pair in self._held.pop(session_id, []):
                base = pair[0].getsockname()[1]
                for s in pair:
                    s.close()
                self._free.append(base)


def gather_candidates(components: int = 2, session_id=0,
                      stun_server: tuple | None = None,
                      pool: PortPool | None = None) -> tuple:
    """Host + (optionally) server-reflexive candidates on pooled ports.

    -> (candidates, sockets_by_component).  With a pool the sockets stay
    bound so the advertised ports are actually ours when checks start."""
    cands = []
    socks = {}
    if pool is None:
        cands = gather_host_candidates(components)
        return cands, socks
    foundation = 1
    (s_rtp, p_rtp), (s_rtcp, p_rtcp) = pool.reserve_pair(session_id)
    comp_socks = {1: (s_rtp, p_rtp), 2: (s_rtcp, p_rtcp)}
    for li, addr in enumerate(local_host_addresses()):
        for comp in range(1, components + 1):
            sock_i, port_i = comp_socks[comp]
            socks[comp] = sock_i
            cands.append(IceCandidate(
                foundation=str(foundation), component=comp, transport="udp",
                priority=candidate_priority("host", 65535 - li, comp),
                address=addr, port=port_i, cand_type="host"))
        foundation += 1
    if stun_server is not None:
        for comp in range(1, components + 1):
            sock_i, port_i = comp_socks[comp]
            mapped = discover_srflx(stun_server[0], stun_server[1], sock_i)
            if mapped is not None and mapped[0] not in local_host_addresses():
                cands.append(IceCandidate(
                    foundation=str(foundation), component=comp,
                    transport="udp",
                    priority=candidate_priority("srflx", 65535, comp),
                    address=mapped[0], port=mapped[1], cand_type="srflx"))
        foundation += 1
    return cands, socks
