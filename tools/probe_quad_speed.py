"""Probe: quad32/quad64 intra+P wave speed at 1080p on the attached TPU.

Methodology follows bench.py: distinct content per rep (tunnel memoizes
content-addressed), device-scalar checksum forcing.
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kvazzup_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from kvazzup_tpu.io.yuv import synthetic_frames


def checksum(o):
    return sum(jnp.sum(jnp.abs(v.astype(jnp.int32))) for v in o.values()
               if hasattr(v, "dtype"))


def main():
    w, h = 1920, 1088
    reps = 10
    seed = int.from_bytes(os.urandom(4), "little") % 1_000_000
    print(f"seed {seed} platform {jax.devices()[0].platform}", file=sys.stderr)
    frames = synthetic_frames(w, h, reps, seed=seed)
    dev = [(jnp.asarray(f[0]), jnp.asarray(f[1]), jnp.asarray(f[2]))
           for f in frames]
    jax.block_until_ready(dev)
    qp = 32

    rows = []

    def timeit(name, fn, pairs):
        t0 = time.time()
        int(fn(*pairs[0]))
        comp = time.time() - t0
        t0 = time.time()
        outs = [fn(*p) for p in pairs]
        int(outs[-1])
        dt = (time.time() - t0) / len(pairs)
        rows.append((name, dt * 1000, 1.0 / dt, comp))
        print(f"{name}: {dt*1000:.1f} ms ({1.0/dt:.2f} fps) compile {comp:.0f}s",
              file=sys.stderr)

    from kvazzup_tpu.encoder.frame_inter32 import encode_frame_p32_fast
    from kvazzup_tpu.encoder.frame_inter64 import encode_frame_p64_fast
    from kvazzup_tpu.encoder.frame_intra32 import encode_frame_intra32_fast
    from kvazzup_tpu.encoder.frame_intra64 import encode_frame_intra64_fast

    p_pairs = [(*dev[i], *dev[i - 1]) for i in range(1, reps)]

    @jax.jit
    def runp32(y, u, v, ry, ru, rv):
        return checksum(encode_frame_p32_fast(y, u, v, ry, ru, rv, qp,
                                              width=w, height=h,
                                              merge_cand=5))

    timeit("quad32 P merge5", runp32, p_pairs)

    @jax.jit
    def runp64(y, u, v, ry, ru, rv):
        return checksum(encode_frame_p64_fast(y, u, v, ry, ru, rv, qp,
                                              width=w, height=h,
                                              merge_cand=5))

    timeit("quad64 P merge5", runp64, p_pairs)

    i_pairs = [tuple(d) for d in dev]

    @jax.jit
    def runi32(y, u, v):
        return checksum(encode_frame_intra32_fast(y, u, v, qp, width=w,
                                                  height=h))

    timeit("quad32 intra", runi32, i_pairs)

    @jax.jit
    def runi64(y, u, v):
        return checksum(encode_frame_intra64_fast(y, u, v, qp, width=w,
                                                  height=h))

    timeit("quad64 intra", runi64, i_pairs)

    for r in rows:
        print(f"{r[0]:20s} {r[1]:8.1f} ms {r[2]:7.2f} fps  compile {r[3]:.0f}s")


if __name__ == "__main__":
    main()
