"""kvazzup_tpu — a TPU-native HEVC video framework.

A from-scratch re-design of the capabilities of ultravideo/kvazzup (uvgComm):
the HEVC encode/decode compute core that the reference delegates to the
kvazaar encoder and openHEVC decoder, rebuilt TPU-first in JAX/XLA/Pallas,
plus the surrounding media pipeline (format conversion, ROI-driven adaptive
QP, AIMD rate control, session management).

Layering (bottom-up):
  core/      bitstream & data model: NAL/RBSP, parameter sets, HEVC tables
  ops/       device compute: transforms, quant, intra prediction, SATD, ...
  entropy/   CABAC engine (host-serial part of the codec)
  encoder/   frame encoder orchestration (device scan + host entropy mux)
  decoder/   bit-exact HEVC decoder (host entropy demux + device reconstruct)
  parallel/  device-mesh sharding: tiles/WPP within a frame, GOPs across hosts
  pipeline/  media pipeline: sessions, rate control, filter-graph successor
  models/    JAX ROI models (successor of the reference's ONNX YOLO filter)
  io/        y4m/yuv readers, Annex-B muxing
  utils/     logging, settings, statistics

Reference architecture survey: SURVEY.md (uvgComm layer map at
/root/reference/src — e.g. media pipeline filtergraph.cpp, kvazaarfilter.cpp).
"""

__version__ = "0.1.0"
