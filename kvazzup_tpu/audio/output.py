"""Audio playback output: clock-paced device sink with AEC far-end tap.

Parity: the reference's AudioOutputDevice/AudioOutput
(/root/reference/src/media/processing/audiooutputdevice.cpp — a
QAudioSink fed from the mixer, whose played frames also feed the echo
canceller's far-end reference).  Container images rarely expose a sound
card, so the device layer is pluggable:

* ``alsa`` — real playback through libasound (ctypes) when present;
* ``wav``  — capture-to-file device (regression-friendly);
* ``null`` — timing-accurate discard device (keeps the clock honest so
  buffer levels / underrun stats behave like a real device).

All backends run the same pacing thread: frames are pulled from a
bounded jitter buffer every FRAME_MS, underruns are filled with silence
and counted (the reference's underflow path), and every played frame is
offered to the AEC reference callback.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import queue
import threading
import time
import wave

import numpy as np

from ..utils.logging import Logger
from ..utils.stats import Statistics

SAMPLE_RATE = 48000
FRAME_MS = 20
SAMPLES_PER_FRAME = SAMPLE_RATE * FRAME_MS // 1000


class _NullDevice:
    def write(self, pcm: np.ndarray) -> None:
        pass

    def close(self) -> None:
        pass


class _WavDevice:
    def __init__(self, path: str, rate: int = SAMPLE_RATE) -> None:
        self._w = wave.open(path, "wb")
        self._w.setnchannels(1)
        self._w.setsampwidth(2)
        self._w.setframerate(rate)

    def write(self, pcm: np.ndarray) -> None:
        self._w.writeframes(np.asarray(pcm, np.int16).tobytes())

    def close(self) -> None:
        self._w.close()


class _AlsaDevice:
    """Minimal blocking ALSA PCM playback via libasound (ctypes)."""

    def __init__(self, device: str = "default", rate: int = SAMPLE_RATE) -> None:
        name = ctypes.util.find_library("asound")
        if not name:
            raise RuntimeError("libasound not found")
        self.lib = ctypes.CDLL(name)
        self.pcm = ctypes.c_void_p()
        # SND_PCM_STREAM_PLAYBACK = 0, blocking mode = 0
        if self.lib.snd_pcm_open(ctypes.byref(self.pcm), device.encode(), 0, 0):
            raise RuntimeError(f"cannot open ALSA device {device!r}")
        # SND_PCM_FORMAT_S16_LE = 2, SND_PCM_ACCESS_RW_INTERLEAVED = 3
        if self.lib.snd_pcm_set_params(self.pcm, 2, 3, 1, rate, 1, 100000):
            raise RuntimeError("snd_pcm_set_params failed")

    def write(self, pcm: np.ndarray) -> None:
        data = np.asarray(pcm, np.int16)
        n = self.lib.snd_pcm_writei(self.pcm, data.ctypes.data, len(data))
        if n < 0:
            self.lib.snd_pcm_recover(self.pcm, n, 1)

    def close(self) -> None:
        try:
            self.lib.snd_pcm_drain(self.pcm)
            self.lib.snd_pcm_close(self.pcm)
        except Exception:
            pass


class AudioOutput:
    """Clock-paced playback sink.

    Feed decoded/mixed frames with put_frame(); a pacing thread plays one
    frame every FRAME_MS through the backend, filling underruns with
    silence.  `aec_reference` (if set) receives every played frame — wire
    it to AudioSendPipeline.playback_reference for echo cancellation.
    """

    def __init__(self, backend: str = "auto", wav_path: str | None = None,
                 stats: Statistics | None = None, max_buffer: int = 10,
                 aec_reference=None) -> None:
        self.stats = stats or Statistics()
        self.aec_reference = aec_reference
        if backend == "auto":
            try:
                self.device = _AlsaDevice()
                self.backend = "alsa"
            except Exception:
                self.device = _NullDevice()
                self.backend = "null"
        elif backend == "alsa":
            self.device = _AlsaDevice()
            self.backend = "alsa"
        elif backend == "wav":
            self.device = _WavDevice(wav_path or "out.wav")
            self.backend = "wav"
        elif backend == "null":
            self.device = _NullDevice()
            self.backend = "null"
        else:
            raise ValueError(f"unknown audio backend {backend!r}")
        self._q: queue.Queue = queue.Queue(maxsize=max_buffer)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.frames_played = 0
        self.underruns = 0

    # -- pipeline edge ----------------------------------------------------
    def put_frame(self, pcm: np.ndarray) -> None:
        """Mixer edge; drops the oldest frame when the buffer is full
        (late audio is worse than lost audio)."""
        try:
            self._q.put_nowait(np.asarray(pcm, np.int16))
        except queue.Full:
            try:
                self._q.get_nowait()
                self.stats.increment("audio_frames_dropped")
            except queue.Empty:
                pass
            self._q.put_nowait(np.asarray(pcm, np.int16))
        self.stats.update_buffer_level("audio_out", self._q.qsize(), 10)

    # -- lifecycle --------------------------------------------------------
    def start(self) -> None:
        self._thread = threading.Thread(target=self._run, name="audio-out",
                                        daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=2)
        self.device.close()

    def _run(self) -> None:
        period = FRAME_MS / 1000.0
        next_t = time.monotonic()
        silence = np.zeros(SAMPLES_PER_FRAME, np.int16)
        while not self._stop.is_set():
            try:
                frame = self._q.get(timeout=period)
            except queue.Empty:
                frame = silence
                self.underruns += 1
                self.stats.increment("audio_underruns")
            # real devices (alsa) pace themselves by blocking; virtual
            # devices pace on the monotonic clock
            if self.backend in ("null", "wav"):
                next_t += period
                delay = next_t - time.monotonic()
                if delay > 0:
                    time.sleep(delay)
                else:
                    next_t = time.monotonic()
            self.device.write(frame)
            self.frames_played += 1
            if self.aec_reference is not None:
                self.aec_reference(frame)
