"""Audio framing and mixing.

Parity components:
* AudioFrameBuffer (/root/reference/src/media/processing/audioframebuffer.h:
  13-18): reassembles arbitrary capture chunks into exact codec frames
  (10/20 ms per AUDIO_FRAMES_PER_SECOND, global.h:25-32).
* AudioMixer (/root/reference/src/media/processing/audiomixer.cpp:38-63):
  N-way conference mix — mixes when every session has a sample queued, or
  force-flushes at MAX_MIX_BUFFER.
"""

from __future__ import annotations

import threading
from collections import deque

import numpy as np

MAX_MIX_BUFFER = 6


class AudioFrameBuffer:
    """Accumulates arbitrary-size int16 chunks, emits fixed-size frames."""

    def __init__(self, samples_per_frame: int, channels: int = 1) -> None:
        self.samples_per_frame = samples_per_frame
        self.channels = channels
        self._buf = np.zeros((0, channels), np.int16)
        self._lock = threading.Lock()

    def input_data(self, chunk: np.ndarray) -> None:
        chunk = np.asarray(chunk, np.int16).reshape(-1, self.channels)
        with self._lock:
            self._buf = np.concatenate([self._buf, chunk])

    def get_frame(self) -> np.ndarray | None:
        with self._lock:
            if len(self._buf) < self.samples_per_frame:
                return None
            frame = self._buf[: self.samples_per_frame]
            self._buf = self._buf[self.samples_per_frame :]
            return frame.squeeze() if self.channels == 1 else frame

    def buffered_frames(self) -> int:
        with self._lock:
            return len(self._buf) // self.samples_per_frame


class AudioMixer:
    """N-way mix with per-session queues (AudioMixer parity)."""

    def __init__(self) -> None:
        self._queues: dict[int, deque] = {}
        self._lock = threading.Lock()

    def add_session(self, session_id: int) -> None:
        with self._lock:
            self._queues.setdefault(session_id, deque())

    def remove_session(self, session_id: int) -> None:
        with self._lock:
            self._queues.pop(session_id, None)

    def input_frame(self, session_id: int, frame: np.ndarray) -> np.ndarray | None:
        """Queue one session's frame; returns the mixed frame when ready."""
        with self._lock:
            q = self._queues.setdefault(session_id, deque())
            q.append(np.asarray(frame, np.int16))
            ready = all(len(qq) > 0 for qq in self._queues.values())
            force = any(len(qq) >= MAX_MIX_BUFFER for qq in self._queues.values())
            if not (ready or force):
                return None
            frames = [qq.popleft() for qq in self._queues.values() if qq]
        if not frames:
            return None
        acc = np.sum([f.astype(np.int32) for f in frames], axis=0)
        return np.clip(acc, -32768, 32767).astype(np.int16)
