"""Speed-of-light accounting for the hot kernels on the real chip.

Per VERDICT round-1 #10: measure each kernel's achieved throughput at the
1080p operating point and compare with the hardware ceiling that binds
it.  The codec's kernels are integer/elementwise-dominated, so the
binding ceiling for most is HBM bandwidth; the transform/SATD/intra
matmuls additionally get an MXU-FLOP utilization figure.

TPU v5e (v5 lite) single-chip peaks used:
  HBM:  819 GB/s     MXU: 197 TFLOP/s bf16 (394 TOPS int8)

Methodology: distinct content per rep (the axon tunnel memoizes
content-addressed executions), jit-compiled once, block_until_ready
timing over >=6 reps.  Bytes model = sum of operand+result HBM traffic
assuming perfect on-chip reuse (a lower bound, so %peak is conservative).

Run on the TPU (no cpu_env):  python tools/sol_audit.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from kvazzup_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kvazzup_tpu.io.yuv import synthetic_frames  # noqa: E402
from kvazzup_tpu.ops import ctu_kernels as ck  # noqa: E402

HBM_GBPS = 819.0
MXU_TFLOPS = 197.0

W, H = 1920, 1088
NCTU = (W // 16) * (H // 16)
REPS = 6


def bench(name, fn, args_list, bytes_model, flops_model=0.0):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.time()
    outs = [fn(*a) for a in args_list[1:]]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / (len(args_list) - 1)
    gbps = bytes_model / dt / 1e9
    line = (f"{name:34s} {dt*1e3:7.2f} ms  {gbps:7.1f} GB/s "
            f"({100*gbps/HBM_GBPS:5.1f}% HBM)")
    if flops_model:
        tf = flops_model / dt / 1e12
        line += f"  {tf:6.2f} TFLOP/s ({100*tf/MXU_TFLOPS:5.1f}% MXU)"
    print(line, flush=True)


CHAIN = 48  # sequential op applications fused into ONE dispatch


def bench_chain(name, op, xs, bytes_model, flops_model=0.0):
    """Time `op` as a CHAIN-long lax.scan inside one jit dispatch.

    Individual op dispatches through the axon tunnel bottom out at a
    ~4 ms call-latency floor (r4 finding: quantize, SATD and even their
    Pallas variants all 'measured' 3.99-4.07 ms — the floor, not the
    op).  Chaining the op on its own output amortizes the floor away and
    times real device throughput.  op must map x -> x-shaped."""

    @jax.jit
    def run(x):
        def body(c, _):
            return op(c), None
        y, _ = jax.lax.scan(body, x, None, length=CHAIN)
        return y

    jax.block_until_ready(run(xs[0]))
    t0 = time.time()
    outs = [run(x) for x in xs[1:]]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / (len(xs) - 1) / CHAIN
    gbps = bytes_model / dt / 1e9
    line = (f"{name:34s} {dt*1e3:7.3f} ms  {gbps:7.1f} GB/s "
            f"({100*gbps/HBM_GBPS:5.1f}% HBM)")
    if flops_model:
        tf = flops_model / dt / 1e12
        line += f"  {tf:6.2f} TFLOP/s ({100*tf/MXU_TFLOPS:5.1f}% MXU)"
    print(line, flush=True)


def main():
    import os as _os

    # fresh content EVERY RUN: the axon tunnel memoizes executions
    # content-addressed ACROSS processes (bench.py r1 finding; this
    # script used a fixed seed until r4 — those rows were partly cached)
    seed = int.from_bytes(_os.urandom(4), "little") % 1_000_000
    print(f"[sol_audit] run_seed {seed}", flush=True)
    rng = np.random.default_rng(seed)
    n_in = REPS + 1
    resids = [jnp.asarray(rng.integers(-200, 200, (NCTU, 256), np.int32))
              for _ in range(n_in)]
    coefs = [jnp.asarray(rng.integers(-3000, 3000, (NCTU, 256), np.int32))
             for _ in range(n_in)]
    blocks = [jnp.asarray(rng.integers(0, 255, (NCTU, 256), np.int32))
              for _ in range(n_in)]
    bounds = [jnp.asarray(rng.integers(0, 255, (NCTU, 65), np.int32))
              for _ in range(n_in)]
    frames = synthetic_frames(W, H, n_in, seed=31)
    devf = [tuple(jnp.asarray(p) for p in f) for f in frames]
    jax.block_until_ready([resids, coefs, blocks, bounds, devf])
    qp = jnp.int32(32)

    # ---- transforms: (NCTU, 256) x two kron-stage matmuls (256x256-class)
    f = jax.jit(lambda r: ck.fwd_transform_flat(r, 4))
    # traffic: in 256*4B + out 256*4B per CTU; flops: 2 * 256 * (16*2) * 2 stages
    bytes_t = NCTU * 256 * 8
    flops_t = NCTU * 2 * (256 * 16 * 2) * 2  # two separable stages as matmul
    bench("fwd_transform 16x16 (frame)", f, [(r,) for r in resids], bytes_t, flops_t)

    inv = jax.jit(lambda c: ck.inv_transform_flat(c, 4))
    bench("inv_transform 16x16 (frame)", inv, [(c,) for c in coefs], bytes_t, flops_t)

    from kvazzup_tpu.ops.quant import dequantize, quantize

    # ---- XLA vs Pallas rows, chained past the tunnel dispatch floor
    _os.environ["KVZ_TPU_NO_PALLAS"] = "1"
    bench_chain("quantize (chained, XLA)",
                lambda c: quantize(c, qp, 4, True), coefs, bytes_t)
    bench_chain("dequantize (chained, XLA)",
                lambda c: dequantize(c, qp, 4), coefs, bytes_t)
    blocks0 = blocks[0]
    bench_chain("SATD 16x16 (chained, XLA)",
                lambda a: a + ck.satd_flat(a, blocks0, 4)[:, None],
                blocks, NCTU * 256 * 8, NCTU * 2 * (256 * 16 * 2) * 2)
    _os.environ.pop("KVZ_TPU_NO_PALLAS", None)

    # Pallas rows (ops/pallas_q.py): the same ops as single fused VMEM
    # kernels; TPU-measured per VERDICT r3 ask #7
    if jax.default_backend() == "tpu":
        from kvazzup_tpu.ops.pallas_q import (dequantize_2d, quantize_2d,
                                              satd_2d)

        qcol = jnp.full((NCTU, 1), 32, jnp.int32)
        dz = jnp.full((NCTU, 1), 171, jnp.int32)
        bench_chain("quantize (chained, Pallas)",
                    lambda c: quantize_2d(c, qcol, dz, 4), coefs, bytes_t)
        bench_chain("dequantize (chained, Pallas)",
                    lambda c: dequantize_2d(c, qcol, 4), coefs, bytes_t)
        wsatd = jnp.asarray(ck._satd_weights(4))
        bench_chain("SATD 16x16 (chained, Pallas)",
                    lambda a: a + satd_2d(a, blocks0, wsatd, 4)[:, None],
                    blocks, NCTU * 256 * 8, NCTU * 2 * (256 * 16 * 2) * 2)

        from kvazzup_tpu.ops.sao import _sao_apply_pallas

        try:
            typ16 = jnp.asarray(rng.integers(0, 5, (H // 16, W // 16),
                                             np.int32))
            aux16 = jnp.asarray(rng.integers(0, 4, (H // 16, W // 16),
                                             np.int32))
            offs16 = jnp.asarray(rng.integers(-3, 3, (H // 16, W // 16, 4),
                                              np.int32))
            fr2 = synthetic_frames(W, H, n_in, seed=seed + 9)
            bench_chain("sao_apply (chained, Pallas)",
                        lambda y: _sao_apply_pallas(
                            y.astype(jnp.int32), typ16, aux16, offs16,
                            ctb=16),
                        [jnp.asarray(f[0]) for f in fr2], W * H * 2 * 2)
            _os.environ["KVZ_TPU_NO_PALLAS"] = "1"
            from kvazzup_tpu.ops.sao import _sao_apply_xla

            bench_chain("sao_apply (chained, XLA)",
                        lambda y: _sao_apply_xla(
                            y.astype(jnp.int32), typ16, aux16, offs16,
                            ctb=16),
                        [jnp.asarray(f[0]) for f in fr2], W * H * 2 * 2)
            _os.environ.pop("KVZ_TPU_NO_PALLAS", None)
        except Exception as e:
            print(f"sao pallas row skipped: {e}", flush=True)

    p = jax.jit(lambda a: ck.predict_all_modes_flat(a, 4, True))
    # out: 35 modes x 256 px
    bench("intra predict all 35 (frame)", p, [(b,) for b in bounds],
          NCTU * (65 + 35 * 256) * 4, NCTU * 2 * 65 * 35 * 256)

    from kvazzup_tpu.encoder.frame_inter import (SEARCH_RANGE, _frame_setup,
                                                 motion_search)

    @jax.jit
    def me(y, ry):
        _, _, lam, oy, _, _ = _frame_setup(y, y, y, qp, NCTU)
        lam_x1k = (lam.mean() * 1024.0).astype(jnp.int32)
        mv, _ = motion_search(y, ry, lam_x1k, block=16,
                              search_range=SEARCH_RANGE, width=W, height=H)
        return mv

    # stage1 reads: half-res orig+ref x 17 rows of shifted strips (~17x)
    me_bytes = (W * H // 4) * (17 * 17 // 4 + 2) * 1 + NCTU * (24 * 24) * 5
    bench("motion_search full (frame)", me,
          [(devf[i][0], devf[i - 1][0]) for i in range(1, n_in)], me_bytes)

    from kvazzup_tpu.ops.deblock import deblock_frame

    @jax.jit
    def db(y, u, v):
        return deblock_frame(y, u, v, 32, spacing=16)  # default all-bS-2

    bench("deblock_frame", db, [tuple(devf[i]) for i in range(n_in)],
          int(W * H * 1.5 * 2 * 3))  # r/w luma+chroma, ~3 passes

    from kvazzup_tpu.ops.sao import sao_apply

    typ = jnp.asarray(rng.integers(0, 5, (H // 16, W // 16), np.int32))
    aux = jnp.asarray(rng.integers(0, 4, (H // 16, W // 16), np.int32))
    offs = jnp.asarray(rng.integers(-3, 3, (H // 16, W // 16, 4), np.int32))
    sa = jax.jit(lambda y: sao_apply(y, typ, aux, offs, ctb=16))
    bench("sao_apply (luma)", sa, [(devf[i][0],) for i in range(n_in)],
          W * H * 2 * 2)

    from kvazzup_tpu.encoder.frame_intra import encode_frame_intra_fast

    fi = jax.jit(lambda y, u, v: encode_frame_intra_fast(
        y, u, v, qp, width=W, height=H))
    bench("FULL intra frame (fast)", fi, [tuple(devf[i]) for i in range(n_in)],
          int(W * H * 1.5 * 12))

    from kvazzup_tpu.encoder.frame_inter import encode_frame_p_fast

    fp = jax.jit(lambda y, u, v, ry, ru, rv: encode_frame_p_fast(
        y, u, v, ry, ru, rv, qp, width=W, height=H))
    bench("FULL P frame (fast)", fp,
          [tuple(devf[i]) + tuple(devf[i - 1]) for i in range(1, n_in)],
          int(W * H * 1.5 * 20))


if __name__ == "__main__":
    main()
