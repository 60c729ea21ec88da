"""Host-side bit-level I/O for HEVC headers and NAL payloads.

This is the writer/reader for everything *outside* CABAC: NAL headers,
parameter sets (Exp-Golomb ue(v)/se(v), fixed-width u(n)), slice headers,
and Annex-B byte-stream framing with emulation prevention.

Counterpart in the reference: kvazaar's `Bitstream` group
(dependencies/kvazaar_CMakeLists.txt:207 "Bitstream": encoder_state-bitstream,
nal) — re-implemented from the H.265 spec, host-side, as the serial edge of
the TPU pipeline.
"""

from __future__ import annotations


class BitWriter:
    """MSB-first bit writer producing an RBSP byte string."""

    def __init__(self) -> None:
        self._bytes = bytearray()
        self._cur = 0
        self._nbits = 0  # bits currently in _cur (0..7)

    def u(self, value: int, nbits: int) -> None:
        """Write `value` as an unsigned fixed-width field of `nbits` bits."""
        if nbits < 0 or (nbits < 64 and value >> nbits):
            raise ValueError(f"value {value} does not fit in {nbits} bits")
        for i in range(nbits - 1, -1, -1):
            self._cur = (self._cur << 1) | ((value >> i) & 1)
            self._nbits += 1
            if self._nbits == 8:
                self._bytes.append(self._cur)
                self._cur = 0
                self._nbits = 0

    def flag(self, value: int | bool) -> None:
        self.u(1 if value else 0, 1)

    def ue(self, value: int) -> None:
        """Unsigned Exp-Golomb (H.265 9.2)."""
        if value < 0:
            raise ValueError("ue(v) requires non-negative value")
        code = value + 1
        nbits = code.bit_length()
        self.u(0, nbits - 1)
        self.u(code, nbits)

    def se(self, value: int) -> None:
        """Signed Exp-Golomb: 0,1,-1,2,-2,... -> 0,1,2,3,4,..."""
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def bytes_aligned(self) -> bool:
        return self._nbits == 0

    def align_zero(self) -> None:
        """Pad with zero bits to the next byte boundary."""
        if self._nbits:
            self.u(0, 8 - self._nbits)

    def rbsp_trailing_bits(self) -> None:
        """rbsp_stop_one_bit followed by zero alignment."""
        self.flag(1)
        self.align_zero()

    def byte_alignment(self) -> None:
        """alignment_bit_equal_to_one + zeros (slice-header style alignment)."""
        self.flag(1)
        self.align_zero()

    def write_bytes(self, data: bytes) -> None:
        if self._nbits:
            raise ValueError("write_bytes requires byte alignment")
        self._bytes.extend(data)

    def num_bits(self) -> int:
        return len(self._bytes) * 8 + self._nbits

    def data(self) -> bytes:
        if self._nbits:
            raise ValueError("bitstream not byte aligned; call align/trailing first")
        return bytes(self._bytes)


class BitReader:
    """MSB-first bit reader over an RBSP byte string."""

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # bit position

    def u(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            byte = self._data[self._pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self._pos & 7))) & 1)
            self._pos += 1
        return v

    def flag(self) -> int:
        return self.u(1)

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 63:
                raise ValueError("malformed ue(v)")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def byte_alignment(self) -> None:
        one = self.u(1)
        if one != 1:
            raise ValueError("alignment bit is not 1")
        while self._pos & 7:
            self.u(1)

    def bit_pos(self) -> int:
        return self._pos

    def byte_pos(self) -> int:
        if self._pos & 7:
            raise ValueError("not byte aligned")
        return self._pos >> 3

    def remaining_bytes(self) -> bytes:
        return self._data[(self._pos + 7) >> 3 :]

    def more_rbsp_data(self) -> bool:
        """True if there is RBSP data left before the rbsp trailing bits."""
        nbits = len(self._data) * 8
        if self._pos >= nbits:
            return False
        # find last set bit in the stream (the rbsp_stop_one_bit)
        for bytepos in range(len(self._data) - 1, -1, -1):
            b = self._data[bytepos]
            if b:
                for bit in range(7, -1, -1):
                    if (b >> (7 - bit)) & 1:
                        pass
                # lowest set bit index (from MSB ordering)
                low = 0
                bb = b
                while bb & 1 == 0:
                    bb >>= 1
                    low += 1
                stop_bitpos = bytepos * 8 + (7 - low)
                return self._pos < stop_bitpos
        return False


def insert_emulation_prevention(rbsp: bytes) -> bytes:
    """RBSP -> NAL payload: insert 0x03 after any 0x0000 followed by 0x00..0x03."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def remove_emulation_prevention(payload: bytes) -> bytes:
    """NAL payload -> RBSP: strip emulation-prevention 0x03 bytes."""
    return remove_emulation_prevention_pos(payload)[0]


def remove_emulation_prevention_pos(payload: bytes) -> tuple:
    """As remove_emulation_prevention, but also return the RBSP offsets at
    which a 0x03 byte was dropped (needed to map the slice header's
    entry_point_offsets — which count emulation bytes, 7.4.7.1 — onto the
    RBSP payload)."""
    out = bytearray()
    removals = []
    zeros = 0
    i = 0
    n = len(payload)
    while i < n:
        b = payload[i]
        if zeros >= 2 and b == 3 and i + 1 <= n:
            removals.append(len(out))
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out), tuple(removals)
