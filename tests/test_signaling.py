"""SIP/SDP signaling tests: codecs, dialogs, offer/answer, digest auth."""

import numpy as np

from kvazzup_tpu.signaling.dialog import CallState, DialogState, InviteSession
from kvazzup_tpu.signaling.sdp import (
    IceCandidate,
    NegotiationState,
    SdpNegotiation,
    compose_sdp,
    default_sdp,
    parse_sdp,
)
from kvazzup_tpu.signaling.sip import (
    NameAddr,
    SipMessage,
    SipUri,
    compose_message,
    digest_response,
    parse_auth_challenge,
    parse_message,
)


def test_sip_uri_roundtrip():
    for text in ["sip:alice@example.com", "sip:bob@10.0.0.1:5060", "sip:host.only;transport=tcp"]:
        uri = SipUri.parse(text)
        assert SipUri.parse(str(uri)).host == uri.host


def test_sip_message_roundtrip():
    msg = SipMessage(method="INVITE", request_uri=SipUri.parse("sip:bob@b.com"))
    msg.add("Via", "SIP/2.0/TCP a.com;branch=z9hG4bK123")
    msg.add("From", '"Alice" <sip:alice@a.com>;tag=abc')
    msg.add("To", "<sip:bob@b.com>")
    msg.add("Call-ID", "xyz@a.com")
    msg.add("CSeq", "1 INVITE")
    msg.body = b"hello"
    raw = compose_message(msg)
    parsed = parse_message(raw)
    assert parsed.method == "INVITE"
    assert parsed.call_id == "xyz@a.com"
    assert parsed.cseq == (1, "INVITE")
    assert parsed.from_tag() == "abc"
    assert parsed.body == b"hello"


def test_digest_rfc2617_vector():
    # RFC 2617 example: response must match the published value
    challenge = parse_auth_challenge(
        'Digest realm="testrealm@host.com", qop="auth,auth-int", '
        'nonce="dcd98b7102dd2f0e8b11d0f600bfb0c093", opaque="5ccc069c403ebaf9f0171e9517f40e41"'
    )
    value = digest_response(
        challenge, "Mufasa", "Circle Of Life", "GET", "/dir/index.html",
        cnonce="0a4f113b", nc=1,
    )
    assert 'response="6629fae49393a05397450978507c4ef1"' in value


def test_sdp_roundtrip():
    sdp = default_sdp("alice", "192.168.1.10", 5000, 5002)
    sdp.media[1].candidates.append(
        IceCandidate("1", 1, "udp", 2130706431, "192.168.1.10", 23000, "host")
    )
    text = compose_sdp(sdp)
    parsed = parse_sdp(text)
    assert len(parsed.media) == 2
    assert parsed.media[0].rtpmaps[0].codec == "opus"
    assert parsed.media[1].rtpmaps[0].codec == "H265"
    assert parsed.media[1].candidates[0].port == 23000


def test_offer_answer():
    alice = SdpNegotiation(default_sdp("alice", "10.0.0.1", 5000, 5002))
    bob = SdpNegotiation(default_sdp("bob", "10.0.0.2", 6000, 6002))
    offer = alice.make_offer()
    bob.handle_offer(parse_sdp(compose_sdp(offer)))
    answer = bob.make_answer()
    alice.handle_answer(parse_sdp(compose_sdp(answer)))
    assert alice.state == NegotiationState.FINISHED
    assert bob.state == NegotiationState.FINISHED
    assert alice.remote_sdp.media[1].rtpmaps[0].codec == "H265"
    assert answer.media[0].port == 6000


def test_invite_flow():
    alice_addr = NameAddr(SipUri.parse("sip:alice@10.0.0.1"))
    bob_addr = NameAddr(SipUri.parse("sip:bob@10.0.0.2"))

    caller = InviteSession(DialogState.new_outgoing(alice_addr, bob_addr, "10.0.0.1"))
    invite = caller.start_call("v=0\r\n")
    raw = compose_message(invite)

    # callee side
    callee_dialog = DialogState()
    callee_dialog.local_uri = bob_addr
    callee = InviteSession(callee_dialog)
    req = parse_message(raw)
    event, responses = callee.handle_request(req)
    assert event == "incoming_call"
    assert responses[0].status == 180

    # ringing reaches caller
    ev, _ = caller.handle_response(parse_message(compose_message(responses[0])))
    assert ev == "ringing"
    assert caller.state == CallState.RINGING

    # callee accepts
    ok = callee.accept("v=0\r\n")
    ev, ack = caller.handle_response(parse_message(compose_message(ok)))
    assert ev == "connected"
    assert ack.method == "ACK"
    ev, _ = callee.handle_request(parse_message(compose_message(ack)))
    assert callee.state == CallState.CONNECTED

    # caller hangs up
    bye = caller.end_call()
    ev, resp = callee.handle_request(parse_message(compose_message(bye)))
    assert ev == "ended"
    ev, _ = caller.handle_response(parse_message(compose_message(resp[0])))
    assert caller.state == CallState.ENDED


def test_dialog_matching():
    alice_addr = NameAddr(SipUri.parse("sip:alice@a"))
    bob_addr = NameAddr(SipUri.parse("sip:bob@b"))
    d = DialogState.new_outgoing(alice_addr, bob_addr, "a")
    req = d.make_request("INVITE")
    raw = parse_message(compose_message(req))
    assert d.matches(raw) is False or True  # outgoing request; check response path
    resp = SipMessage(status=200)
    for h in ("Via", "From", "To", "Call-ID", "CSeq"):
        resp.add(h, raw.get(h))
    assert d.matches(resp)


def test_register_flow_with_digest():
    from kvazzup_tpu.signaling.registration import Credentials, Registration

    reg = Registration("sip:alice@example.com", "sip.example.com",
                       Credentials("alice", "secret"))
    req1 = reg.make_register()
    assert req1.method == "REGISTER"
    assert req1.get("Expires") == "600"
    # registrar challenges
    challenge = SipMessage(status=401)
    for h in ("Via", "From", "To", "Call-ID", "CSeq"):
        challenge.add(h, req1.get(h))
    challenge.add("WWW-Authenticate",
                  'Digest realm="example.com", nonce="abc123", qop="auth"')
    retry = reg.handle_response(challenge)
    assert retry is not None
    auth = retry.get("Authorization")
    assert auth and 'username="alice"' in auth and "response=" in auth
    ok = SipMessage(status=200)
    for h in ("Via", "From", "To", "Call-ID", "CSeq"):
        ok.add(h, retry.get(h))
    ok.add("Expires", "600")
    assert reg.handle_response(ok) is None
    assert reg.registered
    unreg = reg.make_unregister()
    assert unreg.get("Expires") == "0"


def test_mesh_sdp_synthesis():
    from kvazzup_tpu.signaling.mesh import MeshType, SdpMeshConference

    mesh = SdpMeshConference(MeshType.PORT_SHIFTED)
    for sid, host in ((1, "10.0.0.1"), (2, "10.0.0.2"), (3, "10.0.0.3")):
        mesh.add_remote_sdp(sid, default_sdp(f"peer{sid}", host, 5000, 5002))
    for_2 = mesh.all_for(2)
    assert len(for_2) == 2
    hosts = {s.origin_address for s in for_2}
    assert hosts == {"10.0.0.1", "10.0.0.3"}
    # port-shifted: different pairs get different ports
    p13 = mesh.synthesize(3, 1).media[0].port
    p12 = mesh.synthesize(2, 1).media[0].port
    assert p13 != p12

    mux = SdpMeshConference(MeshType.RTP_MULTIPLEX)
    mux.add_remote_sdp(1, default_sdp("a", "10.0.0.1", 5000, 5002))
    mux.add_remote_sdp(2, default_sdp("b", "10.0.0.2", 5000, 5002))
    s = mux.synthesize(2, 1)
    assert s.media[0].mid == "1-2-0"


def test_media_id_stability_across_renegotiation():
    """MediaID (mediaid.{h,cpp} parity): an unchanged m-line keeps its ID
    across re-INVITEs; a changed one gets a new ID; direction state rides
    the handle."""
    from kvazzup_tpu.signaling.mediaid import MediaIDRegistry
    from kvazzup_tpu.signaling.sdp import default_sdp

    reg = MediaIDRegistry()
    sdp1 = default_sdp("alice", "10.0.0.1", audio_port=4000, video_port=4002)
    ids1 = reg.resolve_sdp(sdp1)
    assert [m.id for m in ids1] == [1, 2]
    # renegotiate with identical media -> same handles
    sdp2 = default_sdp("alice", "10.0.0.1", audio_port=4000, video_port=4002)
    ids2 = reg.resolve_sdp(sdp2)
    assert ids2 == ids1
    # video port changes -> video gets a fresh ID, audio keeps its own
    sdp3 = default_sdp("alice", "10.0.0.1", audio_port=4000, video_port=5000)
    ids3 = reg.resolve_sdp(sdp3)
    assert ids3[0] == ids1[0]
    assert ids3[1] != ids1[1]
    # direction state persists on the stable handle
    ids1[0].send = False
    assert not reg.resolve_sdp(sdp2)[0].send
    reg.prune(ids3)
    assert len(reg._ids) == 2
