"""Audio send/receive pipelines (the audio half of the filter graph).

Parity with the reference's audio chains (filtergraph.cpp:357-421,592-680):
send: capture -> framebuffer -> DSP (AEC+AGC+denoise) -> Opus encode;
receive: Opus decode -> mixer -> echo-reference tap -> playback.
"""

from __future__ import annotations

import numpy as np

from ..pipeline.resource_allocator import ResourceAllocator
from ..utils.stats import Statistics
from .dsp import EchoCanceller, Preprocessor
from .frames import AudioFrameBuffer, AudioMixer
from .opus_codec import OpusDecoder, OpusEncoder, available as opus_available

SAMPLE_RATE = 48000
FRAME_MS = 20  # the reference uses 10 ms (20 on Linux); global.h:22-32
SAMPLES_PER_FRAME = SAMPLE_RATE * FRAME_MS // 1000


class AudioSendPipeline:
    def __init__(self, sink, allocator: ResourceAllocator | None = None,
                 stats: Statistics | None = None, aec: bool = True) -> None:
        if not opus_available():
            raise RuntimeError("libopus unavailable")
        self.sink = sink
        self.allocator = allocator or ResourceAllocator()
        self.stats = stats or Statistics()
        self.buffer = AudioFrameBuffer(SAMPLES_PER_FRAME)
        self.aec = EchoCanceller(SAMPLES_PER_FRAME) if aec else None
        # full input-chain DSP (reference filtergraph.cpp:377-382: AEC +
        # AGC + denoise + dereverb)
        self.pre = Preprocessor(dereverb=True,
                                frame_samples=SAMPLES_PER_FRAME)
        self.encoder = OpusEncoder(SAMPLE_RATE, 1, self.allocator.audio_bitrate)

    def put_capture(self, chunk: np.ndarray) -> None:
        """Mic capture edge; emits encoded packets to the sink."""
        self.buffer.input_data(chunk)
        while (frame := self.buffer.get_frame()) is not None:
            if self.aec:
                frame = self.aec.process_input_frame(frame)
            frame = self.pre.process(frame)
            self.encoder.set_bitrate(self.allocator.audio_bitrate)
            pkt = self.encoder.encode(frame)
            self.stats.record_bytes("audio_send", len(pkt))
            self.sink(pkt)

    def playback_reference(self, frame: np.ndarray) -> None:
        """Feed speaker output as the AEC far-end reference."""
        if self.aec:
            self.aec.put_echo_frame(frame)


class AudioReceivePipeline:
    def __init__(self, playback, stats: Statistics | None = None) -> None:
        if not opus_available():
            raise RuntimeError("libopus unavailable")
        self.playback = playback
        self.stats = stats or Statistics()
        self.mixer = AudioMixer()
        self._decoders: dict[int, OpusDecoder] = {}

    def put_packet(self, session_id: int, packet: bytes | None) -> None:
        dec = self._decoders.get(session_id)
        if dec is None:
            dec = self._decoders[session_id] = OpusDecoder(SAMPLE_RATE, 1)
            self.mixer.add_session(session_id)
        pcm = dec.decode(packet, FRAME_MS)
        mixed = self.mixer.input_frame(session_id, pcm)
        if mixed is not None:
            self.playback(mixed)

    def remove_session(self, session_id: int) -> None:
        self._decoders.pop(session_id, None)
        self.mixer.remove_session(session_id)
