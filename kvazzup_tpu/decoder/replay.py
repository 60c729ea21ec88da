"""Replay decoder: the Python generic tier's CabacDecoder stand-in fed by
the native parser's record (native/slice_cabac.c parse_generic_slice_c).

The C side runs the real CABAC over the slice payloads and emits every
structural bin VALUE in decode order plus residual level blocks and PCM
samples; this class pops them, so GenericIntra/Inter/BDecoder logic runs
unchanged with no arithmetic decoding in Python — the openHEVC-class
split of native parse vs reconstructible state (SURVEY §2.6)."""

from __future__ import annotations

import numpy as np


class ReplayDecoder:
    """Pops pre-parsed syntax values; drop-in for CabacDecoder in the
    generic tier (contexts are irrelevant on replay)."""

    __slots__ = ("bins", "levs", "meta", "pcm", "bi", "li", "mi", "pi", "ctx")

    def __init__(self, bins, levs, meta, pcm):
        self.bins = bins
        self.levs = levs
        self.meta = meta
        self.pcm = pcm
        self.bi = 0
        self.li = 0
        self.mi = 0
        self.pi = 0
        self.ctx = None  # dependent-segment carry is handled natively

    def decode_bin(self, ctx_idx: int) -> int:
        v = self.bins[self.bi]
        self.bi += 1
        return int(v)

    def decode_bypass(self) -> int:
        v = self.bins[self.bi]
        self.bi += 1
        return int(v)

    def decode_bypass_bits(self, nbits: int) -> int:
        v = 0
        b = self.bins
        i = self.bi
        for _ in range(nbits):
            v = (v << 1) | int(b[i])
            i += 1
        self.bi = i
        return v

    def decode_terminate(self) -> int:
        v = self.bins[self.bi]
        self.bi += 1
        return int(v)

    def next_residual(self, log2: int, c_idx: int, tskip: bool):
        """The decode_residual seam: (coeffs (N,N) int32, ts_flag)."""
        n = 1 << log2
        ts = int(self.meta[self.mi])
        self.mi += 1
        lev = np.asarray(self.levs[self.li : self.li + n * n]).reshape(n, n)
        self.li += n * n
        return (lev, bool(ts)) if tskip else lev

    def read_pcm_samples(self, counts_and_bits):
        out = []
        for count, _bits in counts_and_bits:
            out.append(np.asarray(self.pcm[self.pi : self.pi + count]))
            self.pi += count
        return out
