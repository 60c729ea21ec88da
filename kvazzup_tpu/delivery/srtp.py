"""SRTP (RFC 3711): AES-CM encryption + HMAC-SHA1 authentication.

Parity: the reference's media encryption — uvgRTP's SRTP with Crypto++
(delivery.cpp:309-343 selects SRTP + ZRTP/multistream keying).  Here the
SRTP transform itself (protect/unprotect with the AES-CM keystream, the
RFC 3711 key derivation (AES-CM PRF), ROC/seq handling, replay protection
and auth tags).  Keying comes from the ZRTP DH exchange (delivery/zrtp.py)
or SDES-style out-of-band keys.
"""

from __future__ import annotations

import hmac
import hashlib
import struct

from cryptography.hazmat.primitives.ciphers import Cipher, algorithms, modes

SRTP_MKI_LEN = 0
AUTH_TAG_LEN = 10  # HMAC-SHA1-80
REPLAY_WINDOW = 64  # RFC 3711 3.3.2 minimum window size


def _aes_ctr(key: bytes, iv: bytes, data: bytes) -> bytes:
    c = Cipher(algorithms.AES(key), modes.CTR(iv)).encryptor()
    return c.update(data) + c.finalize()


def _derive(master_key: bytes, master_salt: bytes, label: int, length: int) -> bytes:
    """RFC 3711 4.3.1 key derivation (AES-CM PRF, kdr = 0)."""
    x = bytearray(master_salt + b"\x00\x00")
    x[7] ^= label
    return _aes_ctr(master_key, bytes(x), b"\x00" * length)


def _rtp_header_len(pkt: bytes) -> int:
    """Fixed header + CSRCs + (if X bit) the RFC 3550 5.3.1 extension.

    RFC 3711 4.1: encryption covers only the payload, which starts after
    the header extension when present.
    """
    hdr_len = 12 + 4 * (pkt[0] & 0x0F)
    if pkt[0] & 0x10:  # X bit
        if len(pkt) < hdr_len + 4:
            raise ValueError("truncated RTP header extension")
        ext_words = struct.unpack("!H", pkt[hdr_len + 2 : hdr_len + 4])[0]
        hdr_len += 4 + 4 * ext_words
    if len(pkt) < hdr_len:
        raise ValueError("truncated RTP header")
    return hdr_len


class SrtpContext:
    """One direction's SRTP crypto context."""

    def __init__(self, master_key: bytes, master_salt: bytes) -> None:
        if len(master_key) != 16 or len(master_salt) != 14:
            raise ValueError("AES-CM-128 requires 16-byte key + 14-byte salt")
        self.session_key = _derive(master_key, master_salt, 0x00, 16)
        self.auth_key = _derive(master_key, master_salt, 0x01, 20)
        self.session_salt = _derive(master_key, master_salt, 0x02, 14)
        self.roc = 0
        self._last_seq: int | None = None  # s_l of RFC 3711 3.3.1
        # Replay list: highest authenticated index + sliding bitmask of the
        # REPLAY_WINDOW indices below it (bit k = index _max_idx - k seen).
        self._max_idx: int | None = None
        self._replay_bits = 0

    # -- index handling -----------------------------------------------------

    def _estimate_index(self, seq: int) -> tuple[int, int]:
        """RFC 3711 3.3.1 index estimate from (roc, s_l) WITHOUT mutating state.

        Returns (roc_guess, index).
        """
        if self._last_seq is None:
            return self.roc, (self.roc << 16) | seq
        s_l = self._last_seq
        if s_l < 0x8000:
            if seq - s_l > 0x8000:
                v = (self.roc - 1) & 0xFFFFFFFF  # late packet from previous ROC
            else:
                v = self.roc
        else:
            if s_l - 0x8000 > seq:
                v = (self.roc + 1) & 0xFFFFFFFF  # seq wrapped
            else:
                v = self.roc
        return v, (v << 16) | seq

    def _check_replay(self, idx: int) -> None:
        if self._max_idx is None:
            return
        delta = self._max_idx - idx
        if delta < 0:
            return  # newer than anything seen
        if delta >= REPLAY_WINDOW:
            raise ValueError("SRTP replay: packet index too old")
        if (self._replay_bits >> delta) & 1:
            raise ValueError("SRTP replay: duplicate packet index")

    def _commit_receive(self, roc_guess: int, idx: int, seq: int) -> None:
        """Update ROC/s_l/replay state — only after successful authentication."""
        if self._max_idx is None:
            self._max_idx = idx
            self._replay_bits = 1
        elif idx > self._max_idx:
            shift = idx - self._max_idx
            self._replay_bits = ((self._replay_bits << shift) | 1) & ((1 << REPLAY_WINDOW) - 1)
            self._max_idx = idx
        else:
            self._replay_bits |= 1 << (self._max_idx - idx)
        # RFC 3711 3.3.1: advance (roc, s_l) when the authenticated packet is new
        if roc_guess == ((self.roc + 1) & 0xFFFFFFFF):
            self.roc = roc_guess
            self._last_seq = seq
        elif roc_guess == self.roc:
            if self._last_seq is None or seq > self._last_seq:
                self._last_seq = seq

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
        # sender side: ROC increments exactly on seq wrap
        if self._last_seq is not None and seq < self._last_seq and self._last_seq - seq > 0x8000:
            self.roc = (self.roc + 1) & 0xFFFFFFFF
        self._last_seq = seq
        roc = self.roc
        hdr_len = _rtp_header_len(rtp_packet)
        iv = self._keystream_iv(ssrc, roc, seq)
        enc = rtp_packet[:hdr_len] + _aes_ctr(self.session_key, iv, rtp_packet[hdr_len:])
        mac = hmac.new(self.auth_key, enc + struct.pack("!I", roc), hashlib.sha1).digest()
        return enc + mac[:AUTH_TAG_LEN]

    def unprotect(self, srtp_packet: bytes) -> bytes:
        """SRTP -> RTP: verify tag + replay, decrypt payload.  Raises on bad auth.

        RFC 3711 3.3.2 order: estimate index (no state change), reject replays,
        authenticate, and only then commit ROC/s_l/replay-list updates.
        """
        if len(srtp_packet) < 12 + AUTH_TAG_LEN:
            raise ValueError("short SRTP packet")
        body, tag = srtp_packet[:-AUTH_TAG_LEN], srtp_packet[-AUTH_TAG_LEN:]
        seq = struct.unpack("!H", body[2:4])[0]
        ssrc = struct.unpack("!I", body[8:12])[0]
        roc_guess, idx = self._estimate_index(seq)
        self._check_replay(idx)
        mac = hmac.new(self.auth_key, body + struct.pack("!I", roc_guess), hashlib.sha1).digest()
        if not hmac.compare_digest(mac[:AUTH_TAG_LEN], tag):
            raise ValueError("SRTP authentication failed")
        self._commit_receive(roc_guess, idx, seq)
        hdr_len = _rtp_header_len(body)
        iv = self._keystream_iv(ssrc, roc_guess, seq)
        return body[:hdr_len] + _aes_ctr(self.session_key, iv, body[hdr_len:])
