"""P-frame stage profile on the real chip (round-2 perf push).

Times each dense pre-pass of encode_frame_p_fast separately, plus the
full P and intra fast paths, to locate the remaining milliseconds at
1080p.  Methodology per bench.py: distinct content per rep (the axon
tunnel memoizes executions content-addressed), and each stage wrapped
in a jitted device-scalar checksum whose fetch is the only reliable
barrier over the tunnel (block_until_ready can resolve early).

Run on the TPU:  python tools/p_profile.py [width height]
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402

from kvazzup_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kvazzup_tpu.io.yuv import synthetic_frames  # noqa: E402

W = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
H = int(sys.argv[2]) if len(sys.argv) > 2 else 1088
REPS = 8
QP = 32


def _cs(o):
    if isinstance(o, dict):
        o = tuple(v for v in o.values() if hasattr(v, "dtype"))
    if not isinstance(o, tuple):
        o = (o,)
    return sum(jnp.sum(jnp.abs(v.astype(jnp.int32))) for v in o)


def timeit(name, fn, args_list):
    run = jax.jit(lambda *a: _cs(fn(*a)))
    int(run(*args_list[0]))  # compile + warm
    t0 = time.time()
    outs = [run(*a) for a in args_list[1:]]
    int(outs[-1])
    med = (time.time() - t0) / (len(args_list) - 1)
    print(f"{name:44s} {med*1e3:8.2f} ms", flush=True)
    return med


def main():
    seed = int.from_bytes(os.urandom(4), "little") % 1_000_000
    frames = synthetic_frames(W, H, REPS + 1, seed=seed)
    dev = [(jnp.asarray(f[0]), jnp.asarray(f[1]), jnp.asarray(f[2])) for f in frames]
    jax.block_until_ready(dev)
    refs = dev[:-1]
    curs = dev[1:]

    from kvazzup_tpu.encoder.frame_intra import (
        P_PREPASS_MODES, _frame_setup, encode_frame_intra_fast,
        intra_cost_prepass)
    from kvazzup_tpu.encoder.frame_inter import (REF_PAD, SEARCH_RANGE,
                                                 encode_frame_p_fast)
    from kvazzup_tpu.ops import ctu_kernels as ck
    from kvazzup_tpu.ops.mc import extract_mc_neighborhoods, mc_luma_window_batch
    from kvazzup_tpu.ops.me import motion_search

    n = 16
    cw, ch = W // n, H // n
    nctu = cw * ch

    # full paths
    timeit("FULL intra fast", lambda y, u, v: encode_frame_intra_fast(
        y, u, v, QP, width=W, height=H), [(c[0], c[1], c[2]) for c in curs])
    timeit("FULL P fast (merge5)", lambda y, u, v, ry, ru, rv: encode_frame_p_fast(
        y, u, v, ry, ru, rv, QP, width=W, height=H, merge_cand=5, tmvp=False),
        [(c[0], c[1], c[2], r[0], r[1], r[2]) for c, r in zip(curs, refs)])
    timeit("FULL P fast (merge1)", lambda y, u, v, ry, ru, rv: encode_frame_p_fast(
        y, u, v, ry, ru, rv, QP, width=W, height=H, merge_cand=1, tmvp=False),
        [(c[0], c[1], c[2], r[0], r[1], r[2]) for c, r in zip(curs, refs)])

    # stage: motion search
    lam = np.sqrt(0.57 * 2.0 ** ((QP - 12.0) / 3.0))
    lam_x1k = jnp.int32(lam * 1024)
    timeit("motion_search (int+frac)", lambda y, r: motion_search(
        y, r, lam_x1k, block=n, search_range=SEARCH_RANGE, width=W, height=H),
        [(c[0], r[0]) for c, r in zip(curs, refs)])

    # stage: intra cost prepass (11-mode subset)
    def prep(y, u, v):
        qp, qp_c, lam_, oy, ou, ov = _frame_setup(y, u, v, QP, nctu)
        return intra_cost_prepass(y, oy, qp, qp_c, lam_, width=W, height=H,
                                  modes=P_PREPASS_MODES)

    timeit("intra_cost_prepass (11 modes)", prep,
           [(c[0], c[1], c[2]) for c in curs])

    # stage: luma window extraction alone
    def wins_y(ry):
        refp = jnp.pad(ry, REF_PAD, mode="edge")
        return extract_mc_neighborhoods(refp, n, SEARCH_RANGE, cw, ch, REF_PAD)

    timeit("luma windows", wins_y, [(r[0],) for r in refs])

    # stage: windows + MC at ME mv + SATD (no int search)
    def mc_satd(y, ry):
        oy = y.astype(jnp.int32).reshape(ch, n, cw, n).transpose(0, 2, 1, 3).reshape(nctu, n, n)
        mv, _ = motion_search(y, ry, lam_x1k, block=n,
                              search_range=SEARCH_RANGE, width=W, height=H)
        refp = jnp.pad(ry, REF_PAD, mode="edge")
        win = extract_mc_neighborhoods(refp, n, SEARCH_RANGE, cw, ch, REF_PAD)
        pred = mc_luma_window_batch(win, mv, n, SEARCH_RANGE)
        sat = ck.satd_flat(pred.reshape(nctu, -1), oy.reshape(nctu, -1), 4)
        return sat

    timeit("ME + luma windows + MC + SATD", mc_satd,
           [(c[0], r[0]) for c, r in zip(curs, refs)])

    # stage: chroma windows alone
    def wins_c(ru, rv):
        rpu = jnp.pad(ru, REF_PAD // 2, mode="edge")
        rpv = jnp.pad(rv, REF_PAD // 2, mode="edge")
        wu = extract_mc_neighborhoods(rpu, n // 2, SEARCH_RANGE, cw, ch,
                                      REF_PAD // 2, chroma=True)
        wv = extract_mc_neighborhoods(rpv, n // 2, SEARCH_RANGE, cw, ch,
                                      REF_PAD // 2, chroma=True)
        return wu, wv

    timeit("chroma windows", wins_c, [(r[1], r[2]) for r in refs])


if __name__ == "__main__":
    main()
