"""ZRTP (RFC 6189): Diffie-Hellman media-path keying for SRTP.

Reference parity: uvgRTP's ZRTP is what the reference selects with
RCE_SRTP_KMNGMNT_ZRTP (/root/reference/src/media/delivery/delivery.cpp:
309-343, "DH mode" for the first stream, multistream for the rest).

Implements the RFC 6189 message flow and key schedule:

    F1  Hello / HelloACK      (ZID + algorithm agreement, 5.2/5.3)
    F3  Commit                (initiator chosen by hvi, 5.4/4.4.1.1)
    F5  DHPart1 / DHPart2     (public values + hash commitment, 5.5/5.6)
        s0 = hash(counter | DHResult | "ZRTP-HMAC-KDF" | ZIDi | ZIDr |
                  total_hash | len(s1) | s1 | ...)            (4.4.1.4)
        KDF(KI, label, context, L) = HMAC(KI, i | label | 0x00 |
                  context | L)                                 (4.5.1)
    F7  Confirm1 / Confirm2   (encrypted H0 + flags, MACed, 5.7) -> Conf2ACK
    SAS  sashash -> B32 short-authentication-string  (4.5.2, 5.1.6)

Hash chain (RFC 6189 9.): each endpoint draws H0 at random and publishes
H3 in Hello, H2 in Commit, H1 in DHPart, H0 (encrypted) in Confirm; the
MAC on each message is keyed with the *next* hash down the chain and is
verified by the receiver as soon as that key is revealed, binding the
whole exchange to one party.  Confirm bodies are AES-128-CFB encrypted
per 5.7 and compared in constant time.

Algorithms: S256 / AES1 / HS80 / EC25 (P-256) / B32 — the mandatory-to-
implement RFC set with EC25 instead of DH3k for key agreement.  The wire
format (preamble 0x505a, 8-char type blocks, CRC-32C framing) follows
5.1; both ends of a call run this module, deriving matching SRTP master
keys/salts fed to delivery/srtp.py.  MITM resistance ultimately rests on
the users comparing the SAS out of band (RFC 6189 4.5.2).
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
import os
import struct
from dataclasses import dataclass, field

_MAGIC = 0x5A525450  # "ZRTP"
_PREAMBLE = 0x505A

_HASH = "S256"
_CIPHER = "AES1"
_AUTH = "HS80"
_KEYX = "EC25"
_SAS = "B32 "

_B32_ALPHA = "ybndrfg8ejkmcpqxot1uwisza345h769"  # z-base-32 (5.1.6)


def _sha256(b: bytes) -> bytes:
    return hashlib.sha256(b).digest()


def _hmac(key: bytes, msg: bytes) -> bytes:
    return hmac_mod.new(key, msg, hashlib.sha256).digest()


def kdf(ki: bytes, label: bytes, context: bytes, length_bytes: int) -> bytes:
    """RFC 6189 4.5.1 (NIST SP 800-108 counter-mode, one block)."""
    block = _hmac(ki, struct.pack(">I", 1) + label + b"\x00" + context
                  + struct.pack(">I", length_bytes * 8))
    return block[:length_bytes]


def _aes_cfb(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

    c = Cipher(algorithms.AES(key), modes.CFB(iv))
    op = c.encryptor() if encrypt else c.decryptor()
    return op.update(data) + op.finalize()


# ------------------------------------------------------------- messages

def _msg(type8: bytes, body: bytes) -> bytes:
    assert len(type8) == 8
    words = (12 + len(body)) // 4
    return struct.pack(">HH", _PREAMBLE, words) + type8 + body


def _packet(seq: int, ssrc: int, message: bytes) -> bytes:
    hdr = struct.pack(">BBH", 0x10, 0, seq & 0xFFFF)
    body = hdr + struct.pack(">II", _MAGIC, ssrc) + message
    crc = _crc32c(body)
    return body + struct.pack(">I", crc)


def parse_packet(data: bytes):
    """Returns (msg_type bytes, body bytes) or None if not ZRTP/corrupt."""
    if len(data) < 16 + 12 + 4:
        return None
    if struct.unpack(">I", data[4:8])[0] != _MAGIC:
        return None
    body, crc = data[:-4], struct.unpack(">I", data[-4:])[0]
    if _crc32c(body) != crc:
        return None
    msg = body[12:]
    pre, _words = struct.unpack(">HH", msg[:4])
    if pre != _PREAMBLE:
        return None
    return msg[4:12], msg[12:]


def _crc32c(data: bytes) -> int:
    poly = 0x82F63B78
    crc = 0xFFFFFFFF
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


# ------------------------------------------------------------- endpoint

@dataclass
class SrtpKeys:
    master_key_tx: bytes
    master_salt_tx: bytes
    master_key_rx: bytes
    master_salt_rx: bytes
    sas: str


# Hello body layout: version(4) + client-id(16) + H3(32) + zid(12) + ...
_HELLO_H3_OFF = 4 + 16
_HELLO_ZID_OFF = _HELLO_H3_OFF + 32


@dataclass
class ZrtpEndpoint:
    """One side of a ZRTP exchange.  Drive with packets_to_send() /
    receive(); `keys` is set when the handshake completes."""

    ssrc: int
    zid: bytes = field(default_factory=lambda: os.urandom(12))
    keys: SrtpKeys | None = None

    def __post_init__(self) -> None:
        from cryptography.hazmat.primitives.asymmetric import ec

        self._priv = ec.generate_private_key(ec.SECP256R1())
        self._pub = self._priv.public_key().public_numbers()
        self._pv = self._pub.x.to_bytes(32, "big") + self._pub.y.to_bytes(32, "big")
        self._seq = 1
        self._peer_hello: bytes | None = None
        self._peer_hello_body: bytes | None = None
        self._peer_zid: bytes | None = None
        self._peer_pv: bytes | None = None
        self._peer_commit_body: bytes | None = None
        self._peer_dhpart_body: bytes | None = None
        self._role: str | None = None  # "initiator" / "responder"
        # Hash chain H0..H3 (RFC 6189 9.): H0 random, H_{n+1} = sha256(H_n)
        self._h = [os.urandom(32)]
        for _ in range(3):
            self._h.append(_sha256(self._h[-1]))
        self._sent_commit: bytes | None = None
        self._peer_commit: bytes | None = None
        self._hello_msg = self._make_hello()
        self._done = False
        self._outbox = [self._pkt(self._hello_msg)]

    # ---------------------------------------------------------- wire out
    def _pkt(self, message: bytes) -> bytes:
        p = _packet(self._seq, self.ssrc, message)
        self._seq += 1
        return p

    def packets_to_send(self):
        out, self._outbox = self._outbox, []
        return out

    # ---------------------------------------------------------- messages
    def _make_hello(self) -> bytes:
        body = b"1.10" + b"kvazzup_tpu-zrtp" + self._h[3] + self.zid
        body += b"\x00\x01\x01\x01"  # flags + hc/cc/ac/kc/sc counts (simplified)
        body += _HASH.encode() + _CIPHER.encode() + _AUTH.encode()
        body += _KEYX.encode() + _SAS.encode()
        mac = _hmac(self._h[2], body)[:8]  # Hello MAC keyed with H2 (9.)
        return _msg(b"Hello   ", body + mac)

    def _make_commit(self) -> bytes:
        dh2 = self._make_dhpart(b"DHPart2 ")
        hvi = _sha256(dh2[4:] + self._peer_hello[4:])
        body = self._h[2] + self.zid + _HASH.encode() + _CIPHER.encode()
        body += _AUTH.encode() + _KEYX.encode() + _SAS.encode() + hvi
        mac = _hmac(self._h[1], body)[:8]  # Commit carries H2, MAC keyed H1
        return _msg(b"Commit  ", body + mac)

    def _make_dhpart(self, type8: bytes) -> bytes:
        rs = b"\x00" * 8  # no retained/cached secrets (fresh DH each call)
        body = self._h[1] + rs * 4 + self._pv
        mac = _hmac(self._h[0], body)[:8]  # DHPart carries H1, MAC keyed H0
        return _msg(type8, body + mac)

    def _make_confirm(self, type8: bytes) -> bytes:
        """RFC 6189 5.7: conf_mac(8) | CFB IV(16) | E(H0 | flags | exp)."""
        iv = os.urandom(16)
        plaintext = self._h[0] + b"\x00\x00\x00\x00" + struct.pack(">I", 0xFFFFFFFF)
        enc = _aes_cfb(self._zrtp_key_tx, iv, plaintext, encrypt=True)
        conf_mac = _hmac(self._hmac_key_tx, enc)[:8]
        return _msg(type8, conf_mac + iv + enc)

    # ---------------------------------------------------------- chain checks
    def _verify_hello_chain(self, h2: bytes) -> bool:
        """With peer H2 (from Commit): check H3 = sha256(H2) and Hello MAC."""
        if self._peer_hello_body is None:
            return False
        body, mac = self._peer_hello_body[:-8], self._peer_hello_body[-8:]
        h3 = body[_HELLO_H3_OFF : _HELLO_H3_OFF + 32]
        return (
            hmac_mod.compare_digest(_sha256(h2), h3)
            and hmac_mod.compare_digest(_hmac(h2, body)[:8], mac)
        )

    def _verify_commit_chain(self, h1: bytes) -> bool:
        """With peer H1 (from DHPart): check H2 = sha256(H1) and Commit MAC."""
        if self._peer_commit_body is None:
            # peer never sent a Commit (pure responder) — nothing to bind
            return True
        body, mac = self._peer_commit_body[:-8], self._peer_commit_body[-8:]
        h2 = body[:32]
        return (
            hmac_mod.compare_digest(_sha256(h1), h2)
            and hmac_mod.compare_digest(_hmac(h1, body)[:8], mac)
            and self._verify_hello_chain(h2)
        )

    def _verify_dhpart_chain(self, h0: bytes) -> bool:
        """With peer H0 (from Confirm): check H1 = sha256(H0) and DHPart MAC."""
        if self._peer_dhpart_body is None:
            return False
        body, mac = self._peer_dhpart_body[:-8], self._peer_dhpart_body[-8:]
        h1 = body[:32]
        return (
            hmac_mod.compare_digest(_sha256(h0), h1)
            and hmac_mod.compare_digest(_hmac(h0, body)[:8], mac)
            and self._verify_commit_chain(h1)
        )

    # ---------------------------------------------------------- receive
    def receive(self, data: bytes) -> None:
        parsed = parse_packet(data)
        if parsed is None or self._done:
            return
        mtype, body = parsed
        if mtype == b"Hello   ":
            self._peer_hello = _msg(mtype, body)
            self._peer_hello_body = body
            self._peer_zid = body[_HELLO_ZID_OFF : _HELLO_ZID_OFF + 12]
            self._outbox.append(self._pkt(_msg(b"HelloACK", b"")))
            # both sides compute a commit; lower hvi -> responder (4.4.1.1)
            my_commit = self._make_commit()
            self._sent_commit = my_commit
            self._outbox.append(self._pkt(my_commit))
        elif mtype == b"Commit  ":
            self._peer_commit = _msg(mtype, body)
            self._peer_commit_body = body
            if self._sent_commit is not None:
                my_hvi = self._sent_commit[-8 - 32 : -8]
                peer_hvi = body[-8 - 32 : -8]
                self._role = "initiator" if my_hvi > peer_hvi else "responder"
            else:
                self._role = "responder"
            if self._role == "responder":
                self._outbox.append(self._pkt(self._make_dhpart(b"DHPart1 ")))
        elif mtype == b"DHPart1 ":
            # we are the initiator: answer with DHPart2 and derive
            self._peer_dhpart_body = body
            if not self._verify_commit_chain(body[:32]):
                return
            self._peer_pv = body[32 + 32 : 32 + 32 + 64]
            self._role = "initiator"
            self._outbox.append(self._pkt(self._make_dhpart(b"DHPart2 ")))
            self._derive()
            self._outbox.append(self._pkt(self._make_confirm(b"Confirm2")))
        elif mtype == b"DHPart2 ":
            self._peer_dhpart_body = body
            if not self._verify_commit_chain(body[:32]):
                return
            self._peer_pv = body[32 + 32 : 32 + 32 + 64]
            self._derive()
            self._outbox.append(self._pkt(self._make_confirm(b"Confirm1")))
        elif mtype in (b"Confirm1", b"Confirm2"):
            if self.keys is None or len(body) < 8 + 16 + 40:
                return
            conf_mac, iv, enc = body[:8], body[8:24], body[24:]
            if not hmac_mod.compare_digest(
                _hmac(self._hmac_key_rx, enc)[:8], conf_mac
            ):
                return
            plaintext = _aes_cfb(self._zrtp_key_rx, iv, enc, encrypt=False)
            peer_h0 = plaintext[:32]
            if not self._verify_dhpart_chain(peer_h0):
                self.keys = None  # hash chain broken: reject the exchange
                return
            self._done = True
            self._outbox.append(self._pkt(_msg(b"Conf2ACK", b"")))
        elif mtype in (b"HelloACK", b"Conf2ACK"):
            pass

    # ---------------------------------------------------------- keying
    def _dh_result(self) -> bytes:
        from cryptography.hazmat.primitives.asymmetric import ec

        x = int.from_bytes(self._peer_pv[:32], "big")
        y = int.from_bytes(self._peer_pv[32:], "big")
        peer = ec.EllipticCurvePublicNumbers(x, y, ec.SECP256R1()).public_key()
        return self._priv.exchange(ec.ECDH(), peer)

    def _derive(self) -> None:
        # total_hash covers the RESPONDER's Hello and the INITIATOR's Commit
        # (4.4.1.4) — each side must hash the same two messages
        if self._role == "initiator":
            zidi, zidr = self.zid, self._peer_zid
            total_hash = _sha256(self._peer_hello + self._sent_commit)
        else:
            zidi, zidr = self._peer_zid, self.zid
            total_hash = _sha256(self._hello_msg + self._peer_commit)
        dhres = self._dh_result()
        s0 = _sha256(
            struct.pack(">I", 1) + dhres + b"ZRTP-HMAC-KDF" + zidi + zidr
            + total_hash + struct.pack(">I", 0) * 3  # no s1/s2/s3 (4.4.1.4)
        )
        ctx = zidi + zidr + total_hash
        ki = kdf(s0, b"Initiator SRTP master key", ctx, 16)
        si = kdf(s0, b"Initiator SRTP master salt", ctx, 14)
        kr = kdf(s0, b"Responder SRTP master key", ctx, 16)
        sr = kdf(s0, b"Responder SRTP master salt", ctx, 14)
        sashash = kdf(s0, b"SAS", ctx, 4)
        sas_val = int.from_bytes(sashash, "big") >> 12
        sas = "".join(_B32_ALPHA[(sas_val >> s) & 31] for s in (15, 10, 5, 0))
        zki = kdf(s0, b"Initiator ZRTP key", ctx, 16)
        zkr = kdf(s0, b"Responder ZRTP key", ctx, 16)
        hki = kdf(s0, b"Initiator HMAC key", ctx, 32)
        hkr = kdf(s0, b"Responder HMAC key", ctx, 32)
        if self._role == "initiator":
            self.keys = SrtpKeys(ki, si, kr, sr, sas)
            self._zrtp_key_tx, self._zrtp_key_rx = zki, zkr
            self._hmac_key_tx, self._hmac_key_rx = hki, hkr
        else:
            self.keys = SrtpKeys(kr, sr, ki, si, sas)
            self._zrtp_key_tx, self._zrtp_key_rx = zkr, zki
            self._hmac_key_tx, self._hmac_key_rx = hkr, hki


def run_loopback(a: ZrtpEndpoint, b: ZrtpEndpoint, max_rounds: int = 10) -> bool:
    """Pump packets between two endpoints until both have keys."""
    for _ in range(max_rounds):
        moved = False
        for pkt in a.packets_to_send():
            b.receive(pkt)
            moved = True
        for pkt in b.packets_to_send():
            a.receive(pkt)
            moved = True
        if a.keys and b.keys and not moved:
            break
    return a.keys is not None and b.keys is not None
