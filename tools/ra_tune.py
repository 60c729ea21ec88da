"""RA hierarchical-coding calibration: measure BD deltas of lambda/QP
cascade variants against the current defaults (VERDICT r4: quality work
must be measurement-driven; each knob change gets a BD number).

Runs the quad64 RA production combo at a reduced operating point
(1280x704, 16 frames, 3 QPs) for fast iteration; variants are expressed
through the KVZ_TPU_RA_BLAM / KVZ_TPU_RA_DQP env knobs (encoder/ra.py).
BD is computed variant-vs-baseline (both ours), so the x265 oracle isn't
needed.

Usage: python tools/ra_tune.py            # on the TPU
       KVZ_TPU_TUNE_SIZE=1920x1088 ...    # override size
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import numpy as np  # noqa: E402

# keep the TPU backend: importing bd_sweep would pull in cpu_env
os.environ.setdefault("KVZ_TPU_BD_TPU", "1")
from bd_sweep import bd_metrics  # noqa: E402

QPS = [24, 29, 34, 39]

# dqp variants are compile-free (qp is traced); each distinct lam value
# recompiles the b64 jits once per batch width — keep the lam list short.
# Round 1 (2026-08-20): dqp 0,1,3,4 +0.068 dB/-0.9%; 0,1,1,2 -0.18 dB;
# blam-hm (1.0,1.12,1.26,1.41) +0.004 dB (neutral).  Round 2 probes
# deeper cascades around the winner.
VARIANTS = [
    ("baseline", {}),
    ("dqp-0134", {"KVZ_TPU_RA_DQP": "0,1,3,4"}),
    ("dqp-0245", {"KVZ_TPU_RA_DQP": "0,2,4,5"}),
    ("dqp-0135", {"KVZ_TPU_RA_DQP": "0,1,3,5"}),
    ("dqp-0234", {"KVZ_TPU_RA_DQP": "0,2,3,4"}),
]

# KVZ_TPU_TUNE_SET=cutree probes the lookahead strengths
# (encoder/lookahead.py) on top of the shipping cascade.
VARIANT_SETS = {
    "dqp2": VARIANTS,
    "cutree": [
        ("baseline", {}),
        ("cutree-1.0", {"KVZ_TPU_RA_CUTREE": "1.0"}),
        ("cutree-2.0", {"KVZ_TPU_RA_CUTREE": "2.0"}),
        ("cutree-3.0", {"KVZ_TPU_RA_CUTREE": "3.0"}),
    ],
}


def run_variant(frames, w, h, qp, env):
    for k in ("KVZ_TPU_RA_BLAM", "KVZ_TPU_RA_DQP", "KVZ_TPU_RA_CUTREE"):
        os.environ.pop(k, None)
    os.environ.update(env)
    from kvazzup_tpu.core.params import StreamConfig
    from kvazzup_tpu.encoder.ra_batch import QuadRABatchEncoder
    from kvazzup_tpu.io.yuv import psnr

    cfg = StreamConfig(width=w, height=h, qp=qp, ctb_log2=6, min_cb_log2=3,
                       max_tb_log2=5, wpp=True, sao_enabled=True,
                       deblocking_enabled=True, merge_cand=5,
                       temporal_mvp=True, rdoq=True, num_reorder_pics=3,
                       max_dec_pic_buffering=6,
                       cu_qp_delta=float(
                           env.get("KVZ_TPU_RA_CUTREE", "0") or 0) > 0)
    enc = QuadRABatchEncoder(cfg, gop_size=8, intra_period=64)
    bits = len(enc.headers()) * 8
    recs = {}
    for (y, u, v) in frames:
        for poc, nal, rec in enc.push_frame(y, u, v):
            bits += len(nal) * 8
            recs[poc] = rec
    for poc, nal, rec in enc.flush():
        bits += len(nal) * 8
        recs[poc] = rec
    ps = [psnr(frames[p][0], np.asarray(recs[p][0]))
          for p in sorted(recs) if p < len(frames)]
    return bits / len(frames), float(np.mean(ps))


def main():
    from kvazzup_tpu.io.yuv import synthetic_frames
    from kvazzup_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    size = os.environ.get("KVZ_TPU_TUNE_SIZE", "1280x704")
    w, h = (int(t) for t in size.split("x"))
    nf = int(os.environ.get("KVZ_TPU_TUNE_FRAMES", "16"))
    frames = synthetic_frames(w, h, nf, seed=42)
    curves = {}
    variants = VARIANT_SETS[os.environ.get("KVZ_TPU_TUNE_SET", "dqp2")]
    only = os.environ.get("KVZ_TPU_TUNE_VARIANTS")
    if only:
        keep = set(only.split(","))
        variants = [v for v in variants if v[0] in keep]
    for name, env in variants:
        pts = []
        for qp in QPS:
            t0 = time.time()
            r, p = run_variant(frames, w, h, qp, env)
            pts.append((r, p))
            print(f"{name} qp{qp}: {r/1000:.0f} kb/f {p:.3f} dB "
                  f"({time.time()-t0:.0f}s)", flush=True)
        curves[name] = pts
    base = curves["baseline"]
    rb = np.array([c[0] for c in base])
    pb = np.array([c[1] for c in base])
    for name, pts in curves.items():
        if name == "baseline":
            continue
        rv = np.array([c[0] for c in pts])
        pv = np.array([c[1] for c in pts])
        bdp, bdr = bd_metrics(rb, pb, rv, pv)
        print(f"BD {name} vs baseline @{size}: BD-PSNR {bdp:+.3f} dB, "
              f"BD-rate {bdr:+.1f}%", flush=True)


if __name__ == "__main__":
    main()
