"""Call controller: the control-plane glue.

Parity: uvgCommController (/root/reference/src/controller.{h,cpp}) — owns
the signaling, media, and stats subsystems, drives the INVITE transaction
state machine (controller.h:131-151), creates media sessions from the
negotiated SDP (createCall -> media addParticipant, controller.cpp:480-560),
and tears everything down on BYE/failure (ICE failure -> session teardown,
controller.cpp:446-455).

Transport is injected (send_fn + incoming-message feed), so the controller
runs identically over TCP, an in-memory loopback (tests), or any future
transport — the seam the reference lacks (SURVEY.md §4).
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Callable

from .core.params import StreamConfig
from .delivery.ice import IceAgent, form_pairs, gather_host_candidates
from .pipeline.media_pipeline import MediaSession
from .signaling.dialog import CallState, DialogState, InviteSession
from .signaling.sdp import SdpNegotiation, compose_sdp, default_sdp, parse_sdp
from .signaling.sip import NameAddr, SipMessage, SipUri, compose_message, parse_message
from .utils.logging import Logger
from .utils.stats import SessionInfo, Statistics


@dataclass
class CallSession:
    session_id: int
    invite: InviteSession
    negotiation: SdpNegotiation
    media: MediaSession | None = None
    ice: IceAgent | None = None


class Controller:
    """One endpoint: place/receive calls, negotiate media, run sessions."""

    def __init__(
        self,
        username: str,
        local_address: str,
        send_fn: Callable[[bytes], None],
        media_sink=None,
        display=None,
        video_cfg: StreamConfig | None = None,
        media_ports: tuple = (0, 0),
    ) -> None:
        self.username = username
        self.local_address = local_address
        self.send_fn = send_fn
        self.media_sink = media_sink or (lambda data, frame: None)
        self.display = display or (lambda y, u, v: None)
        self.video_cfg = video_cfg or StreamConfig(width=96, height=64, qp=30)
        self.media_ports = media_ports
        self.stats = Statistics()
        self.sessions: dict[str, CallSession] = {}  # by Call-ID
        self._next_id = 1
        self._lock = threading.Lock()
        self.on_incoming_call: Callable[[CallSession], None] | None = None
        self.on_call_connected: Callable[[CallSession], None] | None = None
        self.on_call_ended: Callable[[CallSession], None] | None = None

    # ------------------------------------------------------------- calls
    def start_call(self, remote_uri: str) -> CallSession:
        local = NameAddr(SipUri(self.username, self.local_address))
        remote = NameAddr(SipUri.parse(remote_uri))
        dialog = DialogState.new_outgoing(local, remote, self.local_address)
        sess = self._new_session(dialog)
        offer = sess.negotiation.make_offer()
        msg = sess.invite.start_call(compose_sdp(offer))
        self._send(msg)
        return sess

    def accept_call(self, sess: CallSession) -> None:
        answer = sess.negotiation.make_answer()
        resp = sess.invite.accept(compose_sdp(answer))
        self._create_media(sess)
        self._send(resp)

    def reject_call(self, sess: CallSession) -> None:
        self._send(sess.invite.reject())
        self._remove(sess)

    def end_call(self, sess: CallSession) -> None:
        self._send(sess.invite.end_call())
        self._teardown_media(sess)

    def renegotiate(self, sess: CallSession, video_cfg: StreamConfig | None = None) -> None:
        """Mid-call media change (settings update -> re-INVITE, the
        reference's live-reconfiguration flow, SURVEY §3.5).  The media
        session is rebuilt when the peer's 200 arrives."""
        if video_cfg is not None:
            self.video_cfg = video_cfg
        offer = sess.negotiation.make_offer()
        self._send(sess.invite.reinvite(compose_sdp(offer)))

    # --------------------------------------------------------- transport
    def receive(self, data: bytes) -> None:
        """Feed one SIP message from the transport."""
        msg = parse_message(data)
        self.stats.add_sip_message("in", msg.method or str(msg.status))
        if msg.method:
            self._handle_request(msg)
        else:
            self._handle_response(msg)

    def _handle_request(self, msg: SipMessage) -> None:
        call_id = msg.call_id
        sess = self.sessions.get(call_id)
        if sess is None:
            if msg.method != "INVITE":
                return
            dialog = DialogState()
            dialog.local_uri = NameAddr(SipUri(self.username, self.local_address))
            sess = self._new_session(dialog, call_id=call_id)
        event, responses = sess.invite.handle_request(msg)
        for r in responses:
            self._send(r)
        if event == "incoming_call":
            sess.negotiation.handle_offer(parse_sdp(msg.body.decode()))
            if self.on_incoming_call:
                self.on_incoming_call(sess)
        elif event == "reinvite":
            # auto-accept the renegotiation and rebuild media with it
            sess.negotiation.handle_offer(parse_sdp(msg.body.decode()))
            answer = sess.negotiation.make_answer()
            self._send(sess.invite.accept(compose_sdp(answer)))
            self._rebuild_media(sess)
        elif event == "ack":
            pass
        elif event in ("ended", "cancelled"):
            self._teardown_media(sess)
            if self.on_call_ended:
                self.on_call_ended(sess)

    def _handle_response(self, msg: SipMessage) -> None:
        sess = self.sessions.get(msg.call_id)
        if sess is None:
            return
        event, request = sess.invite.handle_response(msg)
        if request is not None:
            self._send(request)
        if event == "connected":
            sess.negotiation.handle_answer(parse_sdp(msg.body.decode()))
            self._create_media(sess)
            if self.on_call_connected:
                self.on_call_connected(sess)
        elif event == "renegotiated":
            sess.negotiation.handle_answer(parse_sdp(msg.body.decode()))
            self._rebuild_media(sess)
        elif event in ("rejected", "ended"):
            self._teardown_media(sess)
            if self.on_call_ended:
                self.on_call_ended(sess)

    # ------------------------------------------------------------- media
    def _new_session(self, dialog: DialogState, call_id: str | None = None) -> CallSession:
        with self._lock:
            sid = self._next_id
            self._next_id += 1
        sess = CallSession(
            session_id=sid,
            invite=InviteSession(dialog),
            negotiation=SdpNegotiation(
                default_sdp(self.username, self.local_address,
                            audio_port=self.media_ports[0],
                            video_port=self.media_ports[1])
            ),
        )
        self.sessions[dialog.call_id or call_id] = sess
        self.stats.add_session(SessionInfo(sid))
        return sess

    def _create_media(self, sess: CallSession) -> None:
        sess.media = MediaSession(
            sess.session_id, self.video_cfg, self.media_sink, self.display
        )
        sess.media.start()
        Logger.get().debug("Controller", "media session created", session=sess.session_id)

    def _rebuild_media(self, sess: CallSession) -> None:
        if sess.media:
            sess.media.stop()
        sess.media = MediaSession(
            sess.session_id, self.video_cfg, self.media_sink, self.display
        )
        sess.media.start()
        Logger.get().debug("Controller", "media session rebuilt", session=sess.session_id)

    def _teardown_media(self, sess: CallSession) -> None:
        if sess.media:
            sess.media.stop()
            sess.media = None
        self._remove(sess)

    def _remove(self, sess: CallSession) -> None:
        self.stats.remove_session(sess.session_id)
        for k, v in list(self.sessions.items()):
            if v is sess:
                del self.sessions[k]

    def _send(self, msg: SipMessage) -> None:
        self.stats.add_sip_message("out", msg.method or str(msg.status))
        self.send_fn(compose_message(msg))
