"""Benchmark: all-intra HEVC encode throughput on one chip.

Prints ONE JSON line: encoded frames/s/chip at 1080p through the device
compute path (wavefront 35-mode intra search + transform/quant/recon, MXU
matmul kernels).  vs_baseline is measured against 30 fps — a
kvazaar-medium-class single-CPU 1080p all-intra operating point (the
reference publishes no numbers; see BASELINE.md).

Secondary lines on stderr: host entropy (CABAC) throughput and the
low-delay P device path, so the end-to-end picture is visible.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    from kvazzup_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from kvazzup_tpu.core.params import StreamConfig
    from kvazzup_tpu.encoder.frame_intra import encode_frame_intra
    from kvazzup_tpu.entropy.slice_data import encode_slice_data_intra
    from kvazzup_tpu.io.yuv import synthetic_frames

    w, h = 1920, 1088
    reps = 16
    frames = synthetic_frames(w, h, 2, seed=7)
    dev = [(jnp.asarray(f[0]), jnp.asarray(f[1]), jnp.asarray(f[2])) for f in frames]
    qp = jnp.int32(32)

    def run(i):
        y, u, v = dev[i % len(dev)]
        return encode_frame_intra(y, u, v, qp, width=w, height=h)

    t0 = time.time()
    out = run(0)
    jax.block_until_ready(out["mode"])
    compile_s = time.time() - t0

    t0 = time.time()
    for i in range(reps):
        out = run(i)
    jax.block_until_ready(out["mode"])
    dt = time.time() - t0
    fps = reps / dt

    # low-delay P device path (ME + MC + merge/AMVP + residual)
    from kvazzup_tpu.encoder.frame_inter import encode_frame_p

    ref = (out["recon_y"], out["recon_u"], out["recon_v"])
    y2, u2, v2 = dev[1]
    t0 = time.time()
    outp = encode_frame_p(y2, u2, v2, *ref, qp, width=w, height=h)
    jax.block_until_ready(outp["ctype"])
    compile_p = time.time() - t0
    t0 = time.time()
    for _ in range(8):
        outp = encode_frame_p(y2, u2, v2, *ref, qp, width=w, height=h)
    jax.block_until_ready(outp["ctype"])
    p_ms = (time.time() - t0) / 8 * 1000

    # host entropy stage on the real coefficient data (native C CABAC)
    cfg = StreamConfig(width=w, height=h, qp=32)
    modes = np.asarray(out["mode"])
    ly = np.asarray(out["lev_y"])
    lcb = np.asarray(out["lev_cb"])
    lcr = np.asarray(out["lev_cr"])
    t0 = time.time()
    payload = encode_slice_data_intra(cfg, modes, ly, lcb, lcr)
    cabac_dt = time.time() - t0

    print(
        f"[bench] 1080p all-intra device path: {fps:.2f} fps "
        f"({dt/reps*1000:.0f} ms/frame, compile {compile_s:.1f}s) on "
        f"{jax.devices()[0].platform}; P-frame {p_ms:.0f} ms "
        f"(compile {compile_p:.0f}s); entropy {cabac_dt*1000:.0f} ms/frame "
        f"({len(payload)} bytes/frame)",
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
