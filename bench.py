"""Benchmark: all-intra HEVC encode throughput on one chip.

Prints ONE JSON line: encoded frames/s/chip at 1080p (device compute path:
35-mode intra search + transform/quant/recon CTU scan).  vs_baseline is
measured against 30 fps — a kvazaar-medium-class single-CPU 1080p all-intra
operating point (the reference publishes no numbers; see BASELINE.md).
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from kvazzup_tpu.encoder.frame_intra import encode_frame_intra
    from kvazzup_tpu.io.yuv import synthetic_frames

    w, h = 1920, 1088
    n_frames = 8
    frames = synthetic_frames(w, h, 2, seed=7)

    dev_frames = [
        (jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)) for (y, u, v) in frames
    ]
    qp = jnp.int32(32)

    def run(y, u, v):
        return encode_frame_intra(y, u, v, qp, width=w, height=h)

    # compile + warmup
    t0 = time.time()
    out = run(*dev_frames[0])
    jax.block_until_ready(out["mode"])
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(n_frames):
        out = run(*dev_frames[i % len(dev_frames)])
    jax.block_until_ready(out["mode"])
    dt = time.time() - t0
    fps = n_frames / dt

    print(
        f"[bench] 1080p all-intra device-scan: {fps:.2f} fps "
        f"(compile {compile_s:.1f}s, {dt/n_frames*1000:.0f} ms/frame) on {jax.devices()[0].platform}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "encode_fps_1080p_intra_device",
                "value": round(fps, 3),
                "unit": "frames/s/chip",
                "vs_baseline": round(fps / 30.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
