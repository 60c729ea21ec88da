"""SIP dialogs and INVITE transactions.

Parity: SIPDialogState (Call-ID + to/from-tag matching, CSeq bookkeeping —
/root/reference/src/initiation/transaction/sipdialogstate.h:42-92),
SIPClient request generation / SIPServer response generation
(sipclient.cpp:236-311, sipserver.cpp:97-186), and the controller's INVITE
state machine (controller.h:131-151).
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field

from .sip import NameAddr, SipMessage, SipUri, compose_message, random_string

INVITE_TIMEOUT_S = 60  # global.h:16


class CallState(enum.Enum):
    IDLE = 0
    INVITE_SENT = 1
    RINGING = 2
    INVITE_RECEIVED = 3
    CONNECTED = 4
    ENDING = 5
    ENDED = 6


@dataclass
class DialogState:
    """Dialog identification + sequencing (SIPDialogState parity)."""

    call_id: str = ""
    local_tag: str = ""
    remote_tag: str = ""
    local_uri: NameAddr | None = None
    remote_uri: NameAddr | None = None
    remote_target: SipUri | None = None
    local_cseq: int = 0
    remote_cseq: int = 0

    @classmethod
    def new_outgoing(cls, local: NameAddr, remote: NameAddr, host: str) -> "DialogState":
        return cls(
            call_id=f"{random_string(16)}@{host}",
            local_tag=random_string(8),
            local_uri=local,
            remote_uri=remote,
            remote_target=remote.uri,
        )

    def matches(self, msg: SipMessage) -> bool:
        if msg.call_id != self.call_id:
            return False
        ft, tt = msg.from_tag(), msg.to_tag()
        if msg.method:  # request from remote: their tag is in From
            return ft == self.remote_tag or not self.remote_tag
        return ft == self.local_tag

    def make_request(self, method: str) -> SipMessage:
        if method != "ACK":
            self.local_cseq += 1
        msg = SipMessage(method=method, request_uri=self.remote_target)
        via = f"SIP/2.0/TCP {self.local_uri.uri.host};branch=z9hG4bK{random_string(12)}"
        msg.add("Via", via)
        local = NameAddr(self.local_uri.uri, self.local_uri.display, {"tag": self.local_tag})
        remote_params = {"tag": self.remote_tag} if self.remote_tag else {}
        remote = NameAddr(self.remote_uri.uri, self.remote_uri.display, remote_params)
        msg.add("From", str(local))
        msg.add("To", str(remote))
        msg.add("Call-ID", self.call_id)
        msg.add("CSeq", f"{self.local_cseq} {method}")
        msg.add("Contact", f"<{self.local_uri.uri}>")
        msg.add("Max-Forwards", "70")
        return msg

    def make_response(self, request: SipMessage, status: int) -> SipMessage:
        msg = SipMessage(status=status)
        for v in request.get_all("Via"):
            msg.add("Via", v)
        msg.add("From", request.get("From"))
        to = NameAddr.parse(request.get("To"))
        if "tag" not in to.params and status != 100:
            if not self.local_tag:
                self.local_tag = random_string(8)
            to.params["tag"] = self.local_tag
        msg.add("To", str(to))
        msg.add("Call-ID", request.get("Call-ID"))
        msg.add("CSeq", request.get("CSeq"))
        if self.local_uri:
            msg.add("Contact", f"<{self.local_uri.uri}>")
        return msg

    def register_incoming_request(self, msg: SipMessage) -> None:
        self.call_id = msg.call_id
        self.remote_tag = msg.from_tag() or ""
        self.remote_uri = NameAddr.parse(msg.get("From"))
        self.local_uri = NameAddr.parse(msg.get("To"))
        contact = msg.get("Contact")
        if contact:
            self.remote_target = NameAddr.parse(contact).uri
        self.remote_cseq = msg.cseq[0]

    def register_response(self, msg: SipMessage) -> None:
        tag = msg.to_tag()
        if tag:
            self.remote_tag = tag
        contact = msg.get("Contact")
        if contact:
            self.remote_target = NameAddr.parse(contact).uri


class InviteSession:
    """One call's INVITE transaction state machine (client + server roles)."""

    def __init__(self, dialog: DialogState) -> None:
        self.dialog = dialog
        self.state = CallState.IDLE
        self._invite_time = 0.0
        self._pending_invite: SipMessage | None = None

    # -- client role ------------------------------------------------------
    def start_call(self, sdp_offer: str) -> SipMessage:
        msg = self.dialog.make_request("INVITE")
        msg.add("Content-Type", "application/sdp")
        msg.body = sdp_offer.encode()
        self.state = CallState.INVITE_SENT
        self._invite_time = time.monotonic()
        return msg

    def reinvite(self, sdp_offer: str) -> SipMessage:
        """Mid-call re-INVITE (renegotiation / live reconfiguration —
        the reference's settings-update path, controller.cpp:208-218)."""
        if self.state != CallState.CONNECTED:
            raise RuntimeError("re-INVITE requires a connected call")
        msg = self.dialog.make_request("INVITE")
        msg.add("Content-Type", "application/sdp")
        msg.body = sdp_offer.encode()
        self._renegotiating = True
        return msg

    def handle_response(self, msg: SipMessage):
        """Returns (event, optional request to send)."""
        self.dialog.register_response(msg)
        num, method = msg.cseq
        if method == "INVITE":
            if msg.status == 180:
                if self.state != CallState.CONNECTED:
                    self.state = CallState.RINGING
                    return "ringing", None
                return None, None
            if 200 <= msg.status < 300:
                renegotiated = self.state == CallState.CONNECTED and getattr(
                    self, "_renegotiating", False
                )
                self._renegotiating = False
                self.state = CallState.CONNECTED
                ack = self.dialog.make_request("ACK")
                ack.set("CSeq", f"{num} ACK")
                return ("renegotiated" if renegotiated else "connected"), ack
            if msg.status >= 300:
                self.state = CallState.ENDED
                ack = self.dialog.make_request("ACK")
                ack.set("CSeq", f"{num} ACK")
                return "rejected", ack
        if method == "BYE" and 200 <= msg.status < 300:
            self.state = CallState.ENDED
            return "ended", None
        return None, None

    def timed_out(self) -> bool:
        return (
            self.state == CallState.INVITE_SENT
            and time.monotonic() - self._invite_time > INVITE_TIMEOUT_S
        )

    # -- server role ------------------------------------------------------
    def handle_request(self, msg: SipMessage):
        """Returns (event, [responses to send])."""
        if msg.method == "INVITE":
            self.dialog.register_incoming_request(msg)
            self._pending_invite = msg
            if self.state == CallState.CONNECTED:
                # mid-call re-INVITE: the caller renegotiates media
                return "reinvite", []
            self.state = CallState.INVITE_RECEIVED
            return "incoming_call", [self.dialog.make_response(msg, 180)]
        if msg.method == "ACK":
            if self.state == CallState.CONNECTED:
                return "ack", []
            return None, []
        if msg.method == "BYE":
            self.state = CallState.ENDED
            return "ended", [self.dialog.make_response(msg, 200)]
        if msg.method == "CANCEL":
            self.state = CallState.ENDED
            resp = [self.dialog.make_response(msg, 200)]
            if self._pending_invite is not None:
                resp.append(self.dialog.make_response(self._pending_invite, 487))
            return "cancelled", resp
        return None, [self.dialog.make_response(msg, 501 if msg.method else 400)]

    def accept(self, sdp_answer: str) -> SipMessage:
        if self.state not in (CallState.INVITE_RECEIVED, CallState.CONNECTED):
            raise RuntimeError("no call to accept")
        resp = self.dialog.make_response(self._pending_invite, 200)
        resp.add("Content-Type", "application/sdp")
        resp.body = sdp_answer.encode()
        self.state = CallState.CONNECTED
        return resp

    def reject(self, status: int = 603) -> SipMessage:
        resp = self.dialog.make_response(self._pending_invite, status)
        self.state = CallState.ENDED
        return resp

    def end_call(self) -> SipMessage:
        self.state = CallState.ENDING
        return self.dialog.make_request("BYE")
