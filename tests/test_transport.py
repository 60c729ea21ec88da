"""SIP-over-TCP transport: framing, sanity, Via/rport routing, real
two-endpoint calls on loopback sockets, and srflx/port-pool gathering.

Reference parity: src/initiation/transport/{tcpconnection,connectionserver,
siprouting,sipmessagesanity}.* and negotiation/networkcandidates.h.
"""

import socket
import time

import pytest

from kvazzup_tpu.signaling.sip import SipMessage, compose_message, parse_message
from kvazzup_tpu.signaling.transport import (
    SanityError,
    SipEndpoint,
    SipRouting,
    SipTcpConnection,
    SipTcpServer,
    extract_messages,
    sanity_check,
)


def _req(method="INVITE", body=b"", extra=()):
    m = SipMessage(method=method)
    from kvazzup_tpu.signaling.sip import SipUri

    m.request_uri = SipUri.parse("sip:bob@10.0.0.2:5060")
    m.add("Via", "SIP/2.0/TCP 10.0.0.1:5070;branch=z9hG4bKabc;rport")
    m.add("From", "<sip:alice@10.0.0.1>;tag=aaa")
    m.add("To", "<sip:bob@10.0.0.2>")
    m.add("Call-ID", "cid1@10.0.0.1")
    m.add("CSeq", f"1 {method}")
    m.add("Max-Forwards", "70")
    for k, v in extra:
        m.add(k, v)
    m.body = body
    return m


# ------------------------------------------------------------- framing


def test_framing_fragmented_and_pipelined():
    a = compose_message(_req("INVITE", body=b"v=0\r\n"))
    b = compose_message(_req("BYE"))
    stream = b"\r\n\r\n" + a + b  # leading CRLF keepalive must be skipped
    # feed one byte at a time: every prefix yields only complete messages
    buf = b""
    got = []
    for i in range(len(stream)):
        buf += stream[i : i + 1]
        msgs, buf = extract_messages(buf)
        got.extend(msgs)
    assert got == [a, b]
    assert buf == b""


def test_framing_body_split_exactly_at_header_end():
    a = compose_message(_req("INVITE", body=b"x" * 40))
    msgs, rest = extract_messages(a[:-10])
    assert msgs == [] and rest == a[:-10]
    msgs, rest = extract_messages(a)
    assert msgs == [a] and rest == b""


# -------------------------------------------------------------- sanity


def test_sanity_accepts_good_request():
    sanity_check(_req())


@pytest.mark.parametrize(
    "mutate",
    [
        lambda m: m.headers.remove(("Call-ID", "cid1@10.0.0.1")),
        lambda m: m.set("CSeq", "1 BYE"),  # method mismatch
        lambda m: m.set("Max-Forwards", "0"),
        lambda m: m.set("CSeq", "0 INVITE"),
    ],
)
def test_sanity_rejects(mutate):
    m = _req()
    mutate(m)
    with pytest.raises(SanityError):
        sanity_check(m)


def test_sanity_response_needs_status_in_range():
    r = SipMessage(status=999)
    with pytest.raises(SanityError):
        sanity_check(r)


# ---------------------------------------------------------- via / rport


def test_via_stamping_and_response_destination():
    routing = SipRouting("10.0.0.2", 5060, "bob")
    m = _req()
    routing.stamp_received(m, ("192.168.1.9", 41000))  # NATed source
    via = m.get("Via")
    assert "received=192.168.1.9" in via
    assert "rport=41000" in via
    assert SipRouting.response_destination(m) == ("192.168.1.9", 41000)


def test_learn_nat_address_from_response():
    routing = SipRouting("10.0.0.1", 5070, "alice")
    resp = SipMessage(status=200)
    resp.add("Via", "SIP/2.0/TCP 10.0.0.1:5070;branch=z9hG4bKabc;received=1.2.3.4;rport=9999")
    assert routing.learn_from_response(resp)
    assert routing.received == "1.2.3.4" and routing.rport == 9999
    assert routing.contact().uri.host == "1.2.3.4"
    assert routing.contact().uri.port == 9999
    # a response whose Via is not ours is dropped
    other = SipMessage(status=200)
    other.add("Via", "SIP/2.0/TCP 9.9.9.9:1;branch=z9hG4bKzzz")
    assert not routing.learn_from_response(other)


# ------------------------------------------------------ TCP connections


def test_tcp_connection_roundtrip():
    got = []
    conns = []

    def on_conn(sock):
        conns.append(SipTcpConnection(sock, lambda c, raw: got.append(raw)))

    srv = SipTcpServer("127.0.0.1", 0, on_conn)
    try:
        echoes = []
        cli = SipTcpConnection.connect("127.0.0.1", srv.port,
                                       lambda c, raw: echoes.append(raw))
        wire = compose_message(_req("INVITE", body=b"hello"))
        # fragment the send to exercise stream reassembly
        cli.send(wire[:20])
        time.sleep(0.05)
        cli.send(wire[20:])
        deadline = time.time() + 3
        while not got and time.time() < deadline:
            time.sleep(0.01)
        assert got == [wire]
        # server replies over the same connection
        conns[0].send(wire)
        deadline = time.time() + 3
        while not echoes and time.time() < deadline:
            time.sleep(0.01)
        assert echoes == [wire]
        cli.close()
    finally:
        srv.close()
        for c in conns:
            c.close()


def _wait(pred, timeout=8.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        if pred():
            return True
        time.sleep(0.02)
    return False


def test_two_endpoint_tcp_call():
    """Two endpoints find each other over real TCP sockets: INVITE/200/ACK
    then BYE/200 — the flow the reference only achieves through Kamailio."""
    from kvazzup_tpu.signaling.dialog import CallState

    alice = SipEndpoint("alice", "127.0.0.1", 0)
    bob = SipEndpoint("bob", "127.0.0.1", 0)
    try:
        bob.controller.on_incoming_call = lambda s: bob.controller.accept_call(s)
        sess_a = alice.controller.start_call(bob.uri)
        assert _wait(lambda: sess_a.invite.state == CallState.CONNECTED)
        sess_b = next(iter(bob.controller.sessions.values()))
        assert _wait(lambda: sess_b.invite.state == CallState.CONNECTED)
        assert sess_a.negotiation.remote_sdp is not None

        alice.controller.end_call(sess_a)
        assert _wait(lambda: sess_b.invite.state == CallState.ENDED)
        assert _wait(lambda: not alice.controller.sessions)
    finally:
        alice.close()
        bob.close()


def test_insane_request_gets_400():
    endpoint = SipEndpoint("bob", "127.0.0.1", 0)
    try:
        replies = []
        cli = SipTcpConnection.connect("127.0.0.1", endpoint.port,
                                       lambda c, raw: replies.append(raw))
        bad = _req("INVITE")
        bad.set("CSeq", "1 BYE")  # sanity violation
        cli.send(compose_message(bad))
        assert _wait(lambda: replies)
        resp = parse_message(replies[0])
        assert resp.status == 400
        assert not endpoint.controller.sessions  # never reached dialogs
        cli.close()
    finally:
        endpoint.close()


# ------------------------------------------------- srflx / port pooling


def test_stun_server_and_srflx_discovery():
    from kvazzup_tpu.delivery.ice import StunServer, discover_srflx

    srv = StunServer("127.0.0.1", 0)
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        s.bind(("127.0.0.1", 0))
        mapped = discover_srflx("127.0.0.1", srv.port, s)
        assert mapped == s.getsockname()[:2]  # loopback: mapping == local
        s.close()
    finally:
        srv.close()


def test_port_pool_reserve_release():
    from kvazzup_tpu.delivery.ice import PortPool

    pool = PortPool(25000, 25010)
    (s1, p1), (s2, p2) = pool.reserve_pair("sess1")
    assert p2 == p1 + 1 and p1 % 2 == 0
    (s3, p3), _ = pool.reserve_pair("sess2")
    assert p3 != p1
    pool.release("sess1")
    # released ports come back
    (s4, p4), _ = pool.reserve_pair("sess3")
    assert p4 == p1
    pool.release("sess2")
    pool.release("sess3")


def test_gather_candidates_with_pool_and_stun():
    from kvazzup_tpu.delivery.ice import PortPool, StunServer, gather_candidates

    srv = StunServer("0.0.0.0", 0)
    pool = PortPool(25100, 25140)
    try:
        cands, socks = gather_candidates(2, "s", ("127.0.0.1", srv.port), pool)
        hosts = [c for c in cands if c.cand_type == "host"]
        assert {c.component for c in hosts} == {1, 2}
        # sockets actually own the advertised ports
        for comp, sock in socks.items():
            port = sock.getsockname()[1]
            assert any(c.port == port for c in hosts if c.component == comp)
        # loopback mapping equals a host address -> srflx pruned as redundant
        assert all(c.cand_type == "host" for c in cands)
    finally:
        pool.release("s")
        srv.close()


@pytest.mark.slow
def test_cli_call_two_processes(tmp_path):
    """The shipped `call` command: two OS processes, TCP signaling, RTP
    video both directions, clean BYE (rc 0 both sides)."""
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
               PYTHONPATH="/root/repo")
    # don't inherit pytest's 8-virtual-device XLA_FLAGS: it changes the
    # compile-cache key and forces a full recompile in the subprocess
    env.pop("XLA_FLAGS", None)
    port = 15070
    callee = subprocess.Popen(
        [sys.executable, "-m", "kvazzup_tpu", "call", "--listen",
         "--name", "bob", "--bind", "127.0.0.1", "--sip-port", str(port),
         "--duration", "45", "--fps", "5"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        cwd=tmp_path)
    try:
        time.sleep(3)
        caller = subprocess.run(
            [sys.executable, "-m", "kvazzup_tpu", "call",
             f"sip:bob@127.0.0.1:{port}", "--name", "alice",
             "--bind", "127.0.0.1", "--duration", "20", "--fps", "5"],
            env=env, capture_output=True, text=True, timeout=120, cwd=tmp_path)
        out_callee, _ = callee.communicate(timeout=120)
    finally:
        if callee.poll() is None:
            callee.kill()
    assert caller.returncode == 0, caller.stdout + caller.stderr
    assert callee.returncode == 0, out_callee
    assert "call over: sent" in caller.stdout
    assert "received" in out_callee


# ------------------------------------------------------ middleware flow


def test_sip_flow_middleware_seam():
    """SipFlow (sipmessageprocessor/sipmessageflow parity): processors
    chain in order (reverse for incoming), can rewrite, absorb, or
    generate a response."""
    from kvazzup_tpu.signaling.flow import SipFlow, SipProcessor

    log = []

    class Tag(SipProcessor):
        def __init__(self, name):
            self.name = name

        def outgoing_request(self, msg, ctx):
            log.append(("out", self.name))
            msg.add("X-Tag", self.name)
            return msg

        def incoming_request(self, msg, ctx):
            log.append(("in", self.name))
            return msg

    class Absorb(SipProcessor):
        def incoming_request(self, msg, ctx):
            if msg.get("X-Drop"):
                return None
            return msg

    flow = SipFlow([Tag("a"), Tag("b"), Absorb()])
    m = _req("OPTIONS")
    out = flow.outgoing_request(m, {})
    assert out.get_all("X-Tag") == ["a", "b"]  # in order
    assert log == [("out", "a"), ("out", "b")]

    log.clear()
    inc = _req("OPTIONS")
    assert flow.incoming_request(inc, {}) is inc
    assert log == [("in", "b"), ("in", "a")]  # reverse order

    dropped = _req("OPTIONS", extra=[("X-Drop", "1")])
    assert flow.incoming_request(dropped, {}) is None


def test_sip_flow_generated_response():
    from kvazzup_tpu.signaling.flow import SanityProcessor, SipFlow

    flow = SipFlow([SanityProcessor()])
    bad = _req("INVITE")
    bad.set("CSeq", "1 BYE")
    ctx = {}
    assert flow.incoming_request(bad, ctx) is None
    gen = ctx["generated_response"]
    assert gen.status == 400 and gen.call_id == bad.call_id


def test_endpoint_custom_processor_extension():
    """A user-added processor sees endpoint traffic (the seam round-1
    dropped when it folded the middleware into hardcoded calls)."""
    from kvazzup_tpu.signaling.dialog import CallState
    from kvazzup_tpu.signaling.flow import SipProcessor

    seen = []

    class Logger(SipProcessor):
        def incoming_request(self, msg, ctx):
            seen.append(msg.method)
            return msg

    alice = SipEndpoint("alice", "127.0.0.1", 0)
    bob = SipEndpoint("bob", "127.0.0.1", 0)
    try:
        bob.flow.add(Logger())
        bob.controller.on_incoming_call = lambda s: bob.controller.accept_call(s)
        sess = alice.controller.start_call(bob.uri)
        assert _wait(lambda: sess.invite.state == CallState.CONNECTED)
        alice.controller.end_call(sess)
        assert _wait(lambda: "BYE" in seen)
        assert "INVITE" in seen and "ACK" in seen
    finally:
        alice.close()
        bob.close()
