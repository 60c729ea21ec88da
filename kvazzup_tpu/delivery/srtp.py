"""SRTP (RFC 3711): AES-CM encryption + HMAC-SHA1 authentication.

Parity: the reference's media encryption — uvgRTP's SRTP with Crypto++
(delivery.cpp:309-343 selects SRTP + ZRTP/multistream keying).  Here the
SRTP transform itself (protect/unprotect with the AES-CM keystream, the
RFC 3711 key derivation (AES-CM PRF), ROC/seq handling and auth tags).
Keying is external (the reference's ZRTP DH exchange is a round-2 item;
keys can come from SDES-style SDP attributes or any out-of-band channel).
"""

from __future__ import annotations

import hmac
import hashlib
import struct

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

SRTP_MKI_LEN = 0
AUTH_TAG_LEN = 10  # HMAC-SHA1-80


def _aes_ctr(key: bytes, iv: bytes, data: bytes) -> bytes:
    c = Cipher(algorithms.AES(key), modes.CTR(iv)).encryptor()
    return c.update(data) + c.finalize()


def _derive(master_key: bytes, master_salt: bytes, label: int, length: int) -> bytes:
    """RFC 3711 4.3.1 key derivation (AES-CM PRF, kdr = 0)."""
    x = bytearray(master_salt + b"\x00\x00")
    x[7] ^= label
    return _aes_ctr(master_key, bytes(x), b"\x00" * length)


class SrtpContext:
    """One direction's SRTP crypto context."""

    def __init__(self, master_key: bytes, master_salt: bytes) -> None:
        if len(master_key) != 16 or len(master_salt) != 14:
            raise ValueError("AES-CM-128 requires 16-byte key + 14-byte salt")
        self.session_key = _derive(master_key, master_salt, 0x00, 16)
        self.auth_key = _derive(master_key, master_salt, 0x01, 20)
        self.session_salt = _derive(master_key, master_salt, 0x02, 14)
        self.roc = 0
        self._last_seq: int | None = None

    def _update_roc(self, seq: int, sending: bool) -> int:
        if self._last_seq is None:
            self._last_seq = seq
            return self.roc
        if sending:
            if seq < self._last_seq and self._last_seq - seq > 0x8000:
                self.roc = (self.roc + 1) & 0xFFFFFFFF
            self._last_seq = seq
            return self.roc
        # receiving: estimate ROC for possibly-reordered packets
        roc = self.roc
        if self._last_seq > 0x8000 and seq < self._last_seq - 0x8000:
            roc = (self.roc + 1) & 0xFFFFFFFF
            self.roc = roc
        self._last_seq = max(self._last_seq, seq) if abs(seq - self._last_seq) < 0x8000 else seq
        return roc

    def _keystream_iv(self, ssrc: int, roc: int, seq: int) -> bytes:
        # IV = (salt * 2^16) XOR (ssrc * 2^64) XOR (packet index * 2^16)
        idx = (roc << 16) | seq
        iv = bytearray(16)
        iv[: 14] = self.session_salt
        tmp = int.from_bytes(iv, "big")
        tmp ^= ssrc << 64
        tmp ^= idx << 16
        return tmp.to_bytes(16, "big")

    def protect(self, rtp_packet: bytes) -> bytes:
        """RTP -> SRTP: encrypt payload, append HMAC-SHA1-80 tag."""
        if len(rtp_packet) < 12:
            raise ValueError("short RTP packet")
        seq = struct.unpack("!H", rtp_packet[2:4])[0]
        ssrc = struct.unpack("!I", rtp_packet[8:12])[0]
        roc = self._update_roc(seq, sending=True)
        hdr_len = 12 + 4 * (rtp_packet[0] & 0x0F)
        iv = self._keystream_iv(ssrc, roc, seq)
        enc = rtp_packet[:hdr_len] + _aes_ctr(self.session_key, iv, rtp_packet[hdr_len:])
        mac = hmac.new(self.auth_key, enc + struct.pack("!I", roc), hashlib.sha1).digest()
        return enc + mac[:AUTH_TAG_LEN]

    def unprotect(self, srtp_packet: bytes) -> bytes:
        """SRTP -> RTP: verify tag, decrypt payload.  Raises on bad auth."""
        if len(srtp_packet) < 12 + AUTH_TAG_LEN:
            raise ValueError("short SRTP packet")
        body, tag = srtp_packet[:-AUTH_TAG_LEN], srtp_packet[-AUTH_TAG_LEN:]
        seq = struct.unpack("!H", body[2:4])[0]
        ssrc = struct.unpack("!I", body[8:12])[0]
        roc = self._update_roc(seq, sending=False)
        mac = hmac.new(self.auth_key, body + struct.pack("!I", roc), hashlib.sha1).digest()
        if not hmac.compare_digest(mac[:AUTH_TAG_LEN], tag):
            raise ValueError("SRTP authentication failed")
        hdr_len = 12 + 4 * (body[0] & 0x0F)
        iv = self._keystream_iv(ssrc, roc, seq)
        return body[:hdr_len] + _aes_ctr(self.session_key, iv, body[hdr_len:])
