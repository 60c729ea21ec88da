"""Media pipeline: the idiomatic successor of the reference's filter graph.

The reference runs one QThread per filter with bounded deques
(/root/reference/src/media/processing/filter.h:21-24, filtergraph.cpp).
Here the device does all pixel compute inside jitted scans, so the pipeline
inverts: a small number of host threads move frames between the edges
(capture/network callbacks) and the device, with the same bounded-queue /
drop-to-next-intra overflow semantics (filter.cpp:177-218) and per-stage
delay accounting (statisticsinterface.h:40-49).
"""

from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from ..core.params import StreamConfig
from ..decoder.top import Decoder
from ..encoder.top import Encoder
from ..utils.logging import Logger
from ..utils.stats import Statistics
from .resource_allocator import ResourceAllocator

MAX_QUEUE = 10  # reference default buffer size (filter.h)


@dataclass
class Frame:
    y: np.ndarray
    u: np.ndarray
    v: np.ndarray
    timestamp: float = field(default_factory=time.monotonic)


class VideoSendPipeline:
    """capture -> [ROI] -> encode -> sink(annexb bytes).

    Overflow policy: when the input queue is full, drop queued frames and
    force the next frame to start an intra period (the reference's
    drop-to-next-HEVC-intra valve, filter.cpp:177-197)."""

    def __init__(
        self,
        cfg: StreamConfig,
        sink: Callable[[bytes, Frame], None],
        stats: Statistics | None = None,
        allocator: ResourceAllocator | None = None,
        intra_period: int = 64,
        fps: float = 30.0,
        roi_fn: Callable[[Frame], np.ndarray] | None = None,
    ) -> None:
        from .rate_control import RateController

        self.cfg = cfg
        self.encoder = Encoder(cfg, intra_period=intra_period)
        self.sink = sink
        self.stats = stats or Statistics()
        self.allocator = allocator or ResourceAllocator()
        self.fps = fps
        self.roi_fn = roi_fn
        # closed-loop frame-level RC toward the allocator's live bitrate
        # (RTCP feedback retargets it between frames)
        self.rate_control = RateController(
            bitrate=self.allocator.video_bitrate, fps=fps, base_qp=cfg.qp
        )
        self._q: queue.Queue[Frame] = queue.Queue(maxsize=MAX_QUEUE)
        self._force_intra = False
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(target=self._run, name="video-send", daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._q.put(None)  # wake
            self._thread.join(timeout=5)

    def put_frame(self, frame: Frame) -> None:
        """Capture edge (called from the camera/capture thread)."""
        try:
            self._q.put_nowait(frame)
        except queue.Full:
            # drop everything queued; recover at the next intra
            dropped = 0
            try:
                while True:
                    self._q.get_nowait()
                    dropped += 1
            except queue.Empty:
                pass
            self._force_intra = True
            self.stats.increment("video_frames_dropped", dropped)
            Logger.get().warning("VideoSendPipeline", "queue overflow", dropped=dropped)
            self._q.put_nowait(frame)
        self.stats.update_buffer_level("video_send", self._q.qsize(), MAX_QUEUE)

    def _run(self) -> None:
        while not self._stop.is_set():
            frame = self._q.get()
            if frame is None:
                break
            t0 = time.monotonic()
            if self._force_intra:
                self.encoder._frame_count = 0  # restart intra period
                self._force_intra = False
            is_idr = (
                self.encoder._frame_count % self.encoder.intra_period == 0
                or self.encoder._ref is None
            )
            self.rate_control.retarget(self.allocator.video_bitrate)
            qp = self.rate_control.frame_qp(is_idr)
            qp_map = None
            if self.roi_fn is not None and self.cfg.cu_qp_delta:
                delta = np.asarray(self.roi_fn(frame))  # (ctbs_h, ctbs_w) int8
                qp_map = np.clip(qp + delta.astype(np.int32), 0, 51)
            stream, _recon = self.encoder.encode_frame(
                frame.y, frame.u, frame.v, qp=qp, qp_map=qp_map
            )
            self.rate_control.update(qp, len(stream) * 8, is_idr)
            dt = time.monotonic() - t0
            self.stats.record_delay("encode", dt)
            self.stats.record_bytes("video_send", len(stream))
            self.sink(stream, frame)


class VideoReceivePipeline:
    """source(annexb bytes) -> decode -> display callback."""

    def __init__(
        self,
        display: Callable[[np.ndarray, np.ndarray, np.ndarray], None],
        stats: Statistics | None = None,
    ) -> None:
        self.decoder = Decoder()
        self.display = display
        self.stats = stats or Statistics()
        self._q: queue.Queue[bytes] = queue.Queue(maxsize=MAX_QUEUE * 3)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(target=self._run, name="video-recv", daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._q.put(None)
            self._thread.join(timeout=5)

    def put_packet(self, data: bytes) -> None:
        try:
            self._q.put_nowait(data)
        except queue.Full:
            self.stats.increment("video_packets_dropped")

    def _run(self) -> None:
        while not self._stop.is_set():
            data = self._q.get()
            if data is None:
                break
            t0 = time.monotonic()
            try:
                frames = self.decoder.decode(data)
            except Exception as e:  # corrupted input: wait for next parameter sets
                Logger.get().warning("VideoReceivePipeline", f"decode error: {e}")
                self.stats.increment("video_decode_errors")
                continue
            self.stats.record_delay("decode", time.monotonic() - t0)
            for y, u, v in frames:
                self.display(y, u, v)


class MediaSession:
    """One peer's media: send+receive pipelines plus the rate-control loop
    closing RTCP receiver reports into the encoder QP (MediaManager /
    ResourceAllocator parity: mediamanager.cpp:88-181,
    uvgrtpsender.cpp:121-148)."""

    def __init__(self, session_id: int, cfg: StreamConfig, send_sink, display) -> None:
        self.session_id = session_id
        self.stats = Statistics()
        self.allocator = ResourceAllocator()
        self.send = VideoSendPipeline(cfg, send_sink, self.stats, self.allocator)
        self.recv = VideoReceivePipeline(display, self.stats)

    def start(self) -> None:
        self.send.start()
        self.recv.start()

    def stop(self) -> None:
        self.send.stop()
        self.recv.stop()

    def handle_receiver_report(self, rr) -> None:
        self.allocator.handle_receiver_report(rr)
