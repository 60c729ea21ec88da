"""Opus audio codec via the system libopus (ctypes).

Parity: the reference's OpusEncoderFilter / OpusDecoderFilter
(/root/reference/src/media/processing/opusencoderfilter.cpp:41-110,
opusdecoderfilter.cpp:35-59): VoIP application, 48 kHz, 10/20 ms frames,
per-frame live bitrate control from the ResourceAllocator.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

OPUS_APPLICATION_VOIP = 2048
OPUS_SET_BITRATE_REQUEST = 4002
OPUS_SET_COMPLEXITY_REQUEST = 4010
OPUS_SET_INBAND_FEC_REQUEST = 4012
OPUS_SET_PACKET_LOSS_PERC_REQUEST = 4014

_lib = None
_load_failed = False


def _opus():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    for name in ("libopus.so.0", "libopus.so", ctypes.util.find_library("opus")):
        if not name:
            continue
        try:
            lib = ctypes.CDLL(name)
            lib.opus_encoder_create.restype = ctypes.c_void_p
            lib.opus_decoder_create.restype = ctypes.c_void_p
            lib.opus_encode.restype = ctypes.c_int
            lib.opus_decode.restype = ctypes.c_int
            _lib = lib
            return _lib
        except OSError:
            continue
    _load_failed = True
    return None


def available() -> bool:
    return _opus() is not None


class OpusEncoder:
    """48 kHz VoIP-tuned Opus encoder (10/20 ms int16 frames)."""

    def __init__(self, sample_rate: int = 48000, channels: int = 1,
                 bitrate: int = 24000, complexity: int = 10) -> None:
        lib = _opus()
        if lib is None:
            raise RuntimeError("libopus unavailable")
        err = ctypes.c_int(0)
        self._lib = lib
        self._channels = channels
        self._enc = lib.opus_encoder_create(
            sample_rate, channels, OPUS_APPLICATION_VOIP, ctypes.byref(err)
        )
        if err.value != 0:
            raise RuntimeError(f"opus_encoder_create failed: {err.value}")
        self.set_bitrate(bitrate)
        lib.opus_encoder_ctl(ctypes.c_void_p(self._enc), OPUS_SET_COMPLEXITY_REQUEST, complexity)

    def set_bitrate(self, bitrate: int) -> None:
        """Live bitrate control (opusencoderfilter.cpp:106 reads the
        allocator every frame)."""
        self._lib.opus_encoder_ctl(ctypes.c_void_p(self._enc), OPUS_SET_BITRATE_REQUEST, int(bitrate))

    def encode(self, pcm: np.ndarray) -> bytes:
        """pcm: (samples,) or (samples, channels) int16."""
        pcm = np.ascontiguousarray(pcm, dtype=np.int16)
        frames = pcm.size // self._channels
        out = np.zeros(4000, np.uint8)
        n = self._lib.opus_encode(
            ctypes.c_void_p(self._enc),
            pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            frames,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            out.size,
        )
        if n < 0:
            raise RuntimeError(f"opus_encode failed: {n}")
        return out[:n].tobytes()

    def __del__(self):
        try:
            if self._enc:
                self._lib.opus_encoder_destroy(ctypes.c_void_p(self._enc))
        except Exception:
            pass


class OpusDecoder:
    def __init__(self, sample_rate: int = 48000, channels: int = 1) -> None:
        lib = _opus()
        if lib is None:
            raise RuntimeError("libopus unavailable")
        err = ctypes.c_int(0)
        self._lib = lib
        self._channels = channels
        self._rate = sample_rate
        self._dec = lib.opus_decoder_create(sample_rate, channels, ctypes.byref(err))
        if err.value != 0:
            raise RuntimeError(f"opus_decoder_create failed: {err.value}")

    def decode(self, packet: bytes | None, frame_ms: int = 20) -> np.ndarray:
        """Decode one packet (None = packet-loss concealment)."""
        max_samples = self._rate * frame_ms // 1000 * 2
        out = np.zeros(max_samples * self._channels, np.int16)
        if packet is None:
            data = None
            length = 0
        else:
            buf = np.frombuffer(packet, np.uint8)
            data = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
            length = len(packet)
        n = self._lib.opus_decode(
            ctypes.c_void_p(self._dec),
            data,
            length,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
            max_samples,
            0,
        )
        if n < 0:
            raise RuntimeError(f"opus_decode failed: {n}")
        return out[: n * self._channels].reshape(-1, self._channels).squeeze()

    def __del__(self):
        try:
            if self._dec:
                self._lib.opus_decoder_destroy(ctypes.c_void_p(self._dec))
        except Exception:
            pass
