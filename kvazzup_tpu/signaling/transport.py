"""SIP transport over real TCP: stream framing, connection + listener
threads, Via/rport routing, and message sanity.

Parity targets (behavior, not code) in the reference:
- src/initiation/transport/tcpconnection.{h,cpp}: framed stream
  connection with a send queue, reader thread, leftover buffering.
- src/initiation/transport/connectionserver.{h,cpp}: TCP listener that
  hands accepted sockets to connection objects.
- src/initiation/transport/siprouting.{h,cpp}: add Via (branch, rport)
  and Contact on requests; stamp received=/rport= on incoming top Via
  (RFC 3581); learn our NAT address from response Vias; route responses
  back via received/rport.
- src/initiation/transport/sipmessagesanity.cpp: header sanity before a
  message reaches the transaction layer (reject -> 400, drop responses).

The controller keeps its injected-transport seam (send_fn + receive);
`SipEndpoint` binds one controller to real sockets.
"""

from __future__ import annotations

import socket
import threading
from dataclasses import dataclass, field

from .sip import (
    NameAddr,
    SipMessage,
    SipUri,
    compose_message,
    parse_message,
    random_string,
)
from ..utils.logging import Logger

SIP_PORT = 5060
BRANCH_COOKIE = "z9hG4bK"  # RFC 3261 magic branch prefix


# --------------------------------------------------------------- framing


def extract_messages(buf: bytes):
    """Incremental SIP stream framing: split `buf` into complete messages
    (header block + Content-Length body) and the unconsumed remainder.

    Mirrors tcpconnection.cpp's leftovers_ handling; leading CRLFs are
    skipped (RFC 5626 keep-alive pings ride bare CRLF pairs).
    """
    msgs = []
    while True:
        while buf[:2] == b"\r\n":
            buf = buf[2:]
        end = buf.find(b"\r\n\r\n")
        if end < 0:
            break
        head = buf[:end].decode(errors="replace")
        clen = 0
        for line in head.split("\r\n")[1:]:
            name, _, value = line.partition(":")
            if name.strip().lower() in ("content-length", "l"):
                try:
                    clen = int(value.strip())
                except ValueError:
                    clen = 0
        total = end + 4 + clen
        if len(buf) < total:
            break
        msgs.append(buf[:total])
        buf = buf[total:]
    return msgs, buf


# ------------------------------------------------------------ connection


class SipTcpConnection:
    """One framed SIP-over-TCP connection (tcpconnection.{h,cpp} parity).

    A reader thread frames the byte stream and feeds complete messages to
    `on_message(conn, raw)`; `send` is thread-safe.
    """

    def __init__(self, sock: socket.socket, on_message, on_closed=None) -> None:
        self.sock = sock
        self.on_message = on_message
        self.on_closed = on_closed
        self.local_addr = sock.getsockname()[:2]
        self.remote_addr = sock.getpeername()[:2]
        self._send_lock = threading.Lock()
        self._buf = b""
        self._closed = threading.Event()
        self._thread = threading.Thread(target=self._read_loop, daemon=True)
        self._thread.start()

    @classmethod
    def connect(cls, host: str, port: int, on_message, on_closed=None,
                timeout: float = 5.0) -> "SipTcpConnection":
        sock = socket.create_connection((host, port), timeout=timeout)
        sock.settimeout(None)
        return cls(sock, on_message, on_closed)

    def send(self, data: bytes) -> None:
        with self._send_lock:
            self.sock.sendall(data)

    def close(self) -> None:
        if not self._closed.is_set():
            self._closed.set()
            try:
                self.sock.shutdown(socket.SHUT_RDWR)
            except OSError:
                pass
            self.sock.close()

    def join(self, timeout: float = 2.0) -> None:
        self._thread.join(timeout)

    def _read_loop(self) -> None:
        try:
            while not self._closed.is_set():
                data = self.sock.recv(65536)
                if not data:
                    break
                self._buf += data
                msgs, self._buf = extract_messages(self._buf)
                for raw in msgs:
                    self.on_message(self, raw)
        except OSError:
            pass
        finally:
            self._closed.set()
            try:
                self.sock.close()
            except OSError:
                pass
            if self.on_closed:
                self.on_closed(self)


class SipTcpServer:
    """Listening socket handing accepted connections to a callback
    (connectionserver.{h,cpp} parity)."""

    def __init__(self, host: str, port: int, on_connection) -> None:
        self.sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.sock.bind((host, port))
        self.sock.listen(16)
        self.host, self.port = self.sock.getsockname()[:2]
        self.on_connection = on_connection
        self._closed = threading.Event()
        self._thread = threading.Thread(target=self._accept_loop, daemon=True)
        self._thread.start()

    def close(self) -> None:
        self._closed.set()
        try:
            self.sock.close()
        except OSError:
            pass

    def _accept_loop(self) -> None:
        while not self._closed.is_set():
            try:
                sock, _addr = self.sock.accept()
            except OSError:
                break
            self.on_connection(sock)


# --------------------------------------------------------------- routing


class SipRouting:
    """Via/Contact handling for one transport flow (siprouting.{h,cpp})."""

    def __init__(self, local_host: str, local_port: int, user: str = "") -> None:
        self.local_host = local_host
        self.local_port = local_port
        self.user = user
        # NAT address learned from response Via received=/rport= (RFC 3581)
        self.received: str | None = None
        self.rport: int | None = None

    # -- outgoing ---------------------------------------------------------
    def prepare_request(self, msg: SipMessage) -> None:
        """Add our Via (branch + rport request) and a Contact."""
        via = (f"SIP/2.0/TCP {self.local_host}:{self.local_port}"
               f";branch={BRANCH_COOKIE}{random_string(12)};rport")
        # prepend: our Via must be topmost
        msg.headers.insert(0, ("Via", via))
        if msg.method != "ACK":
            # rewrite Contact with the transport's reachable address
            # (siprouting.cpp addContactField: dialogs route in-dialog
            # requests to this, so it must carry the real port)
            msg.set("Contact", str(self.contact()))

    def prepare_response(self, msg: SipMessage) -> None:
        if msg.get("Contact") is not None or msg.status == 200:
            msg.set("Contact", str(self.contact()))

    def contact(self) -> NameAddr:
        """Our reachable address: NAT mapping if learned, else local."""
        host = self.received or self.local_host
        port = self.rport or self.local_port
        return NameAddr(SipUri(self.user, host, port, params={"transport": "tcp"}))

    # -- incoming ---------------------------------------------------------
    def stamp_received(self, msg: SipMessage, source: tuple) -> None:
        """RFC 3581: on an incoming request, record the actual source in
        the top Via's received=/rport= so responses route through NAT."""
        for i, (k, v) in enumerate(msg.headers):
            if k.lower() != "via":
                continue
            sent_by, params = _parse_via(v)
            host, port = source
            if sent_by[0] != host:
                params["received"] = host
            if "rport" in params and params["rport"] is None:
                params["rport"] = str(port)
            elif sent_by[1] != port and "received" in params:
                params["rport"] = str(port)
            msg.headers[i] = (k, _compose_via(sent_by, params))
            return

    def learn_from_response(self, msg: SipMessage) -> bool:
        """Check the top Via is ours and learn received=/rport=.  Returns
        False when the response was not meant for us (drop it)."""
        via = msg.get("Via")
        if via is None:
            return False
        sent_by, params = _parse_via(via)
        if sent_by != (self.local_host, self.local_port):
            return False
        if "received" in params and params["received"]:
            self.received = params["received"]
        rport = params.get("rport")
        if rport:
            try:
                self.rport = int(rport)
            except ValueError:
                pass
        return True

    @staticmethod
    def response_destination(msg: SipMessage) -> tuple:
        """Where to send a response: top Via received/rport, else sent-by
        (RFC 3261 18.2.2 + RFC 3581 4)."""
        via = msg.get("Via")
        if via is None:
            raise ValueError("response without Via")
        sent_by, params = _parse_via(via)
        host = params.get("received") or sent_by[0]
        port = params.get("rport")
        port = int(port) if port else sent_by[1]
        return host, port


def _parse_via(value: str):
    """-> ((host, port), params) for one Via header value."""
    first = value.split(",")[0].strip()
    parts = first.split(";")
    proto_addr = parts[0].split()
    hostport = proto_addr[1] if len(proto_addr) > 1 else ""
    host, _, port = hostport.partition(":")
    params: dict = {}
    for p in parts[1:]:
        k, eq, v = p.partition("=")
        params[k.strip()] = v.strip() if eq else None
    return (host, int(port) if port else SIP_PORT), params


def _compose_via(sent_by, params) -> str:
    host, port = sent_by
    out = f"SIP/2.0/TCP {host}:{port}"
    for k, v in params.items():
        out += f";{k}" if v is None else f";{k}={v}"
    return out


# ---------------------------------------------------------------- sanity


class SanityError(ValueError):
    """Message fails RFC 3261 sanity (sipmessagesanity.cpp parity)."""


_TOKEN_METHODS = {"INVITE", "ACK", "BYE", "CANCEL", "OPTIONS", "REGISTER",
                  "INFO", "UPDATE", "MESSAGE", "SUBSCRIBE", "NOTIFY", "PRACK"}


def sanity_check(msg: SipMessage) -> None:
    """Reject malformed messages before they reach dialogs: mandatory
    headers, CSeq/method agreement, status range, Max-Forwards, parseable
    From/To/Contact addresses."""
    if msg.method is not None:
        if msg.method not in _TOKEN_METHODS:
            raise SanityError(f"unknown method {msg.method}")
        required = ("Via", "From", "To", "Call-ID", "CSeq", "Max-Forwards")
        for name in required:
            if msg.method == "ACK" and name == "Max-Forwards":
                continue
            if msg.get(name) is None:
                raise SanityError(f"request missing {name}")
        mf = msg.get("Max-Forwards")
        if mf is not None:
            try:
                if int(mf) <= 0:
                    raise SanityError("Max-Forwards exhausted")
            except ValueError:
                raise SanityError("bad Max-Forwards")
        num, method = msg.cseq
        if method != msg.method and not (msg.method == "ACK" and method == "INVITE"):
            raise SanityError(f"CSeq method {method} != {msg.method}")
        if num <= 0:
            raise SanityError("bad CSeq number")
    else:
        if not (100 <= (msg.status or 0) <= 699):
            raise SanityError(f"bad status {msg.status}")
        for name in ("Via", "From", "To", "Call-ID", "CSeq"):
            if msg.get(name) is None:
                raise SanityError(f"response missing {name}")
    for name in ("From", "To"):
        v = msg.get(name)
        if v is not None:
            try:
                NameAddr.parse(v)
            except Exception:
                raise SanityError(f"unparseable {name}: {v!r}")


# -------------------------------------------------------------- endpoint


@dataclass
class _Flow:
    conn: SipTcpConnection
    addr: tuple


class SipEndpoint:
    """One SIP endpoint on real TCP sockets: listener + outbound
    connections + routing, feeding an injected-transport Controller.

    Requests are routed by request-URI (host:port, default 5060);
    responses ride the connection the request arrived on, falling back to
    top-Via received/rport.  This is the assembly the reference builds in
    SIPManager::createSIPTransport (sipmanager.cpp).
    """

    def __init__(self, username: str, bind_host: str = "127.0.0.1",
                 port: int = 0, advertised_host: str | None = None,
                 **controller_kw) -> None:
        from ..controller import Controller

        self.server = SipTcpServer(bind_host, port, self._on_accept)
        if advertised_host is None:
            if self.server.host == "0.0.0.0":
                from ..delivery.ice import local_host_addresses

                addrs = [a for a in local_host_addresses() if a != "127.0.0.1"]
                advertised_host = addrs[0] if addrs else "127.0.0.1"
            else:
                advertised_host = self.server.host
        self.host, self.port = advertised_host, self.server.port
        self.routing = SipRouting(self.host, self.port, username)
        # middleware pipe (sipmessageflow.h): dialog side first, transport
        # side last; incoming messages traverse in reverse (sanity before
        # routing).  Extend with SipFlow.add (e.g. auth, logging).
        from .flow import RoutingProcessor, SanityProcessor, SipFlow

        self.flow = SipFlow([RoutingProcessor(self.routing),
                             SanityProcessor()])
        self.controller = Controller(
            username, self.host, send_fn=self._send_bytes, **controller_kw)
        self._flows: dict[tuple, _Flow] = {}  # (host, port) -> flow
        self._lock = threading.Lock()
        self._log = Logger.get()

    # -- lifecycle --------------------------------------------------------
    def close(self) -> None:
        self.server.close()
        with self._lock:
            flows = list(self._flows.values())
            self._flows.clear()
        for f in flows:
            f.conn.close()

    @property
    def uri(self) -> str:
        return f"sip:{self.controller.username}@{self.host}:{self.port}"

    # -- outbound ---------------------------------------------------------
    def _send_bytes(self, data: bytes) -> None:
        msg = parse_message(data)
        if msg.method is not None:
            msg = self.flow.outgoing_request(msg, {})
            if msg is None:
                return  # a processor absorbed it
            dest = (msg.request_uri.host,
                    msg.request_uri.port or SIP_PORT)
        else:
            msg = self.flow.outgoing_response(msg, {})
            if msg is None:
                return
            dest = self.routing.response_destination(msg)
        flow = self._get_flow(dest)
        flow.conn.send(compose_message(msg))

    def _get_flow(self, dest: tuple) -> _Flow:
        with self._lock:
            flow = self._flows.get(dest)
        if flow is not None:
            return flow
        conn = SipTcpConnection.connect(
            dest[0], dest[1], self._on_message, self._on_closed)
        flow = _Flow(conn, dest)
        with self._lock:
            self._flows[dest] = flow
        return flow

    # -- inbound ----------------------------------------------------------
    def _on_accept(self, sock: socket.socket) -> None:
        conn = SipTcpConnection(sock, self._on_message, self._on_closed)
        with self._lock:
            self._flows[conn.remote_addr] = _Flow(conn, conn.remote_addr)

    def _on_message(self, conn: SipTcpConnection, raw: bytes) -> None:
        try:
            msg = parse_message(raw)
        except ValueError as e:
            self._log.warning("SipEndpoint", f"dropping unparseable message: {e}")
            return
        ctx = {"source": conn.remote_addr}
        if msg.method is not None:
            out = self.flow.incoming_request(msg, ctx)
            gen = ctx.get("generated_response")
            if gen is not None:  # e.g. sanity -> 400
                self._log.warning(
                    "SipEndpoint",
                    f"rejecting request: {ctx.get('sanity_error', 'refused')}")
                conn.send(compose_message(gen))
                return
            if out is None:
                self._log.warning(
                    "SipEndpoint",
                    f"dropped request: {ctx.get('sanity_error', 'absorbed')}")
                return
            # responses for this request ride the same connection
            with self._lock:
                self._flows.setdefault(
                    SipRouting.response_destination(out),
                    _Flow(conn, conn.remote_addr))
            self.controller.receive(compose_message(out))
        else:
            out = self.flow.incoming_response(msg, ctx)
            if out is None:
                reason = ("not for us" if ctx.get("not_for_us")
                          else ctx.get("sanity_error", "absorbed"))
                self._log.warning("SipEndpoint", f"response dropped: {reason}")
                return
            self.controller.receive(compose_message(out))

    def _on_closed(self, conn: SipTcpConnection) -> None:
        with self._lock:
            for k, f in list(self._flows.items()):
                if f.conn is conn:
                    del self._flows[k]
