"""SIP registration (REGISTER) client.

Parity: the reference's registration handling in SIPManager (registration
pipes state->client, sipmanager.cpp:852-873: REGISTER refresh every 600 s
via retry timer; digest challenge handling via sipauthentication.cpp).
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from .dialog import DialogState
from .sip import NameAddr, SipMessage, SipUri, digest_response, parse_auth_challenge

REGISTER_INTERVAL_S = 600  # global.h:14


@dataclass
class Credentials:
    username: str
    password: str


class Registration:
    """One account's registration state machine."""

    def __init__(self, aor: str, registrar_host: str, credentials: Credentials | None = None,
                 expires: int = REGISTER_INTERVAL_S) -> None:
        self.aor = NameAddr(SipUri.parse(aor))
        self.registrar = SipUri(host=registrar_host)
        self.credentials = credentials
        self.expires = expires
        self.registered = False
        self.dialog = DialogState.new_outgoing(self.aor, NameAddr(SipUri.parse(aor)), registrar_host)
        self.dialog.remote_target = self.registrar
        self._next_refresh = 0.0
        self._auth_header: tuple | None = None

    def make_register(self) -> SipMessage:
        msg = self.dialog.make_request("REGISTER")
        msg.request_uri = self.registrar
        msg.set("Expires", str(self.expires))
        if self._auth_header:
            msg.add(*self._auth_header)
        return msg

    def handle_response(self, msg: SipMessage):
        """Returns a follow-up request (auth retry / None)."""
        if msg.status in (401, 407):
            hdr = msg.get("WWW-Authenticate") or msg.get("Proxy-Authenticate")
            if not hdr or not self.credentials:
                self.registered = False
                return None
            challenge = parse_auth_challenge(hdr)
            value = digest_response(
                challenge,
                self.credentials.username,
                self.credentials.password,
                "REGISTER",
                str(self.registrar),
            )
            name = "Authorization" if msg.status == 401 else "Proxy-Authorization"
            self._auth_header = (name, value)
            return self.make_register()
        if msg.status is not None and 200 <= msg.status < 300:
            self.registered = True
            exp = msg.get("Expires")
            period = int(exp) if exp else self.expires
            self._next_refresh = time.monotonic() + max(30, period - 60)
            return None
        self.registered = False
        return None

    def due_for_refresh(self) -> bool:
        return self.registered and time.monotonic() >= self._next_refresh

    def make_unregister(self) -> SipMessage:
        msg = self.dialog.make_request("REGISTER")
        msg.request_uri = self.registrar
        msg.set("Expires", "0")
        self.registered = False
        return msg
