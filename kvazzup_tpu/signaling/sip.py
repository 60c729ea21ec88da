"""SIP (RFC 3261) message model, text codec, and digest authentication.

Parity targets in the reference's signaling layer (~14.4k LoC,
/root/reference/src/initiation/): siptypes.h request/response model,
siptransport.cpp:149-231 wire parse, sipfieldparsing/composing field
codecs, sipmessagesanity.cpp checks, sipauthentication.cpp:59-182 digest.
This module is the wire codec; transactions/dialogs live in dialog.py.
"""

from __future__ import annotations

import hashlib
import random
import string
from dataclasses import dataclass, field

SIP_VERSION = "SIP/2.0"

RESPONSE_PHRASES = {
    100: "Trying",
    180: "Ringing",
    200: "OK",
    400: "Bad Request",
    401: "Unauthorized",
    403: "Forbidden",
    404: "Not Found",
    407: "Proxy Authentication Required",
    408: "Request Timeout",
    486: "Busy Here",
    487: "Request Terminated",
    488: "Not Acceptable Here",
    500: "Server Internal Error",
    603: "Decline",
}


def random_string(length: int = 16) -> str:
    return "".join(random.choices(string.ascii_letters + string.digits, k=length))


@dataclass
class SipUri:
    user: str = ""
    host: str = ""
    port: int | None = None
    scheme: str = "sip"
    params: dict = field(default_factory=dict)

    def __str__(self) -> str:
        hostpart = f"{self.host}:{self.port}" if self.port else self.host
        userpart = f"{self.user}@" if self.user else ""
        p = "".join(f";{k}" if v is None else f";{k}={v}" for k, v in self.params.items())
        return f"{self.scheme}:{userpart}{hostpart}{p}"

    @classmethod
    def parse(cls, text: str) -> "SipUri":
        text = text.strip().strip("<>")
        scheme, _, rest = text.partition(":")
        rest, *params = rest.split(";")
        user, _, hostport = rest.rpartition("@")
        host, _, port = hostport.partition(":")
        uri = cls(user, host, int(port) if port else None, scheme)
        for p in params:
            k, _, v = p.partition("=")
            uri.params[k] = v if v else None
        return uri


@dataclass
class NameAddr:
    uri: SipUri
    display: str = ""
    params: dict = field(default_factory=dict)  # e.g. tag

    def __str__(self) -> str:
        disp = f'"{self.display}" ' if self.display else ""
        p = "".join(f";{k}={v}" for k, v in self.params.items())
        return f"{disp}<{self.uri}>{p}"

    @classmethod
    def parse(cls, text: str) -> "NameAddr":
        text = text.strip()
        display = ""
        params: dict = {}
        if "<" in text:
            pre, _, rest = text.partition("<")
            display = pre.strip().strip('"')
            uri_text, _, param_text = rest.partition(">")
            for p in param_text.split(";"):
                if "=" in p:
                    k, _, v = p.partition("=")
                    params[k.strip()] = v.strip()
        else:
            uri_text, *ps = text.split(";")
            for p in ps:
                if "=" in p:
                    k, _, v = p.partition("=")
                    params[k.strip()] = v.strip()
        return cls(SipUri.parse(uri_text), display, params)


@dataclass
class SipMessage:
    """One SIP request or response (siptypes.h:396-571 condensed)."""

    method: str | None = None  # requests
    request_uri: SipUri | None = None
    status: int | None = None  # responses
    reason: str | None = None
    headers: list = field(default_factory=list)  # ordered (name, value)
    body: bytes = b""

    # -- header helpers ---------------------------------------------------
    def get(self, name: str) -> str | None:
        for k, v in self.headers:
            if k.lower() == name.lower():
                return v
        return None

    def get_all(self, name: str) -> list:
        return [v for k, v in self.headers if k.lower() == name.lower()]

    def set(self, name: str, value: str) -> None:
        for i, (k, _) in enumerate(self.headers):
            if k.lower() == name.lower():
                self.headers[i] = (name, value)
                return
        self.headers.append((name, value))

    def add(self, name: str, value: str) -> None:
        self.headers.append((name, value))

    @property
    def call_id(self) -> str | None:
        return self.get("Call-ID")

    @property
    def cseq(self) -> tuple:
        v = self.get("CSeq")
        if not v:
            return (0, "")
        num, _, method = v.strip().partition(" ")
        return (int(num), method.strip())

    def from_tag(self) -> str | None:
        v = self.get("From")
        return NameAddr.parse(v).params.get("tag") if v else None

    def to_tag(self) -> str | None:
        v = self.get("To")
        return NameAddr.parse(v).params.get("tag") if v else None


def compose_message(msg: SipMessage) -> bytes:
    if msg.method:
        first = f"{msg.method} {msg.request_uri} {SIP_VERSION}"
    else:
        reason = msg.reason or RESPONSE_PHRASES.get(msg.status, "Unknown")
        first = f"{SIP_VERSION} {msg.status} {reason}"
    lines = [first]
    has_length = any(k.lower() == "content-length" for k, _ in msg.headers)
    for k, v in msg.headers:
        lines.append(f"{k}: {v}")
    if not has_length:
        lines.append(f"Content-Length: {len(msg.body)}")
    raw = "\r\n".join(lines).encode() + b"\r\n\r\n" + msg.body
    return raw


def parse_message(data: bytes) -> SipMessage:
    head, _, body = data.partition(b"\r\n\r\n")
    lines = head.decode(errors="replace").split("\r\n")
    first = lines[0]
    msg = SipMessage(body=body)
    if first.startswith(SIP_VERSION):
        parts = first.split(" ", 2)
        msg.status = int(parts[1])
        msg.reason = parts[2] if len(parts) > 2 else ""
    else:
        method, uri, version = first.split(" ")
        if version != SIP_VERSION:
            raise ValueError(f"unsupported SIP version {version}")
        msg.method = method
        msg.request_uri = SipUri.parse(uri)
    for line in lines[1:]:
        if not line.strip():
            continue
        name, _, value = line.partition(":")
        msg.headers.append((name.strip(), value.strip()))
    # basic sanity (sipmessagesanity.cpp role)
    if msg.method and msg.method != "ACK":
        for required in ("Via", "From", "To", "Call-ID", "CSeq"):
            if msg.get(required) is None:
                raise ValueError(f"missing mandatory header {required}")
    clen = msg.get("Content-Length")
    if clen is not None and int(clen) != len(msg.body):
        msg.body = msg.body[: int(clen)]
    return msg


# ---------------------------------------------------------------- digest


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def parse_auth_challenge(value: str) -> dict:
    """Parse WWW-Authenticate / Proxy-Authenticate header value."""
    scheme, _, rest = value.partition(" ")
    out = {"scheme": scheme}
    for part in rest.split(","):
        k, _, v = part.strip().partition("=")
        out[k.strip()] = v.strip().strip('"')
    return out


def digest_response(
    challenge: dict,
    username: str,
    password: str,
    method: str,
    uri: str,
    cnonce: str | None = None,
    nc: int = 1,
    body: bytes = b"",
) -> str:
    """Digest Authorization header value (RFC 2617; sipauthentication.cpp
    :103-182 parity: MD5, qop auth / auth-int, cnonce)."""
    realm = challenge.get("realm", "")
    nonce = challenge.get("nonce", "")
    qop = challenge.get("qop", "")
    algorithm = challenge.get("algorithm", "MD5")
    cnonce = cnonce or random_string(16)
    ha1 = _md5(f"{username}:{realm}:{password}")
    if algorithm.upper() == "MD5-SESS":
        ha1 = _md5(f"{ha1}:{nonce}:{cnonce}")
    if "auth-int" in qop:
        qop_used = "auth-int"
        ha2 = _md5(f"{method}:{uri}:{_md5(body.decode(errors='replace'))}")
    elif qop:
        qop_used = "auth"
        ha2 = _md5(f"{method}:{uri}")
    else:
        qop_used = ""
        ha2 = _md5(f"{method}:{uri}")
    if qop_used:
        resp = _md5(f"{ha1}:{nonce}:{nc:08x}:{cnonce}:{qop_used}:{ha2}")
    else:
        resp = _md5(f"{ha1}:{nonce}:{ha2}")
    fields = [
        f'Digest username="{username}"',
        f'realm="{realm}"',
        f'nonce="{nonce}"',
        f'uri="{uri}"',
        f'response="{resp}"',
    ]
    if algorithm:
        fields.append(f"algorithm={algorithm}")
    if qop_used:
        fields += [f"qop={qop_used}", f"cnonce=\"{cnonce}\"", f"nc={nc:08x}"]
    return ", ".join(fields)
