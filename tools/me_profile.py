"""ME stage micro-profile on the TPU (see p_profile.py for methodology)."""

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

W, H, REPS, QP = 1920, 1088, 8, 32


def _cs(o):
    if isinstance(o, dict):
        o = tuple(v for v in o.values() if hasattr(v, "dtype"))
    if not isinstance(o, tuple):
        o = (o,)
    return sum(jnp.sum(jnp.abs(v.astype(jnp.int32))) for v in o)


def timeit(name, fn, args_list):
    run = jax.jit(lambda *a: _cs(fn(*a)))
    int(run(*args_list[0]))
    t0 = time.time()
    outs = [run(*a) for a in args_list[1:]]
    int(outs[-1])
    med = (time.time() - t0) / (len(args_list) - 1)
    print(f"{name:44s} {med*1e3:8.2f} ms", flush=True)
    return med


def main():
    import functools

    from kvazzup_tpu.ops import me as me_mod
    from kvazzup_tpu.ops.mc import (LUMA_FILTERS, extract_windows_static,
                                    window_select_batch)
    from kvazzup_tpu.ops.me import _mv_bits, motion_search

    seed = int.from_bytes(os.urandom(4), "little") % 1_000_000
    frames = synthetic_frames(W, H, REPS + 1, seed=seed)
    dev = [(jnp.asarray(f[0]), jnp.asarray(f[1]), jnp.asarray(f[2])) for f in frames]
    jax.block_until_ready(dev)
    refs, curs = dev[:-1], dev[1:]
    lam = np.sqrt(0.57 * 2.0 ** ((QP - 12.0) / 3.0))
    lam_x1k = jnp.int32(lam * 1024)
    n, R = 16, 16
    cw, ch = W // n, H // n
    nctu = cw * ch

    timeit("motion_search full", lambda y, r: motion_search(
        y, r, lam_x1k, block=n, search_range=R, width=W, height=H),
        [(c[0], r[0]) for c, r in zip(curs, refs)])

    # stage 1 alone: replicate the half-res full search
    def stage1(orig_y, ref_y):
        lam_ = lam_x1k / 1024.0
        orig = orig_y.astype(jnp.int32)
        ref = ref_y.astype(jnp.int32)
        h2, w2 = H // 2, W // 2
        pc2 = jnp.asarray(np.kron(np.eye(w2, dtype=np.float32),
                                  np.ones((2, 1), np.float32)), jnp.bfloat16)
        pr2 = jnp.asarray(np.kron(np.eye(h2, dtype=np.float32),
                                  np.ones((1, 2), np.float32)))

        def _half(x):
            t = jnp.matmul(x.astype(jnp.bfloat16), pc2,
                           preferred_element_type=jnp.float32)
            s = jnp.matmul(pr2, t, precision=jax.lax.Precision.HIGHEST)
            return (s.astype(jnp.int32) + 2) >> 2

        oh = _half(orig)
        rh = _half(ref)
        r2 = R // 2
        rh_pad = jnp.pad(rh, r2, mode="edge")
        side = 2 * r2 + 1
        hb = n // 2
        pool_c = jnp.asarray(np.kron(np.eye(cw, dtype=np.float32),
                                     np.ones((hb, 1), np.float32)), jnp.bfloat16)
        pool_r = jnp.asarray(np.kron(np.eye(ch, dtype=np.float32),
                                     np.ones((1, hb), np.float32)))

        def s1_row(_, dyi):
            strip = jax.lax.dynamic_slice(rh_pad, (dyi, 0), (h2, w2 + 2 * r2))
            shifted = jnp.stack([strip[:, dxi: dxi + w2] for dxi in range(side)])
            d = jnp.abs(oh[None] - shifted).astype(jnp.bfloat16)
            t = jnp.matmul(d.reshape(side * h2, w2), pool_c,
                           preferred_element_type=jnp.float32)
            t = t.reshape(side, h2, cw)
            sad = jnp.einsum("rh,shc->src", pool_r, t,
                             precision=jax.lax.Precision.HIGHEST)
            return None, sad.astype(jnp.int32)

        _, sads = jax.lax.scan(s1_row, None, jnp.arange(side, dtype=jnp.int32))
        dxy = jnp.arange(side, dtype=jnp.int32) - r2
        mvb = lam_ * (_mv_bits(8 * dxy)[None, :] + _mv_bits(8 * dxy)[:, None])
        cost = sads * 4 + mvb[..., None, None].astype(jnp.int32)
        flat = cost.reshape(side * side, nctu)
        best_i = jnp.argmin(flat, axis=0)
        best_cost = jnp.take_along_axis(flat, best_i[None], axis=0)[0]
        best_mv = jnp.stack([2 * (best_i % side - r2), 2 * (best_i // side - r2)],
                            axis=1)
        return best_mv, best_cost

    timeit("  stage1 half-res full search", stage1,
           [(c[0], r[0]) for c, r in zip(curs, refs)])

    # stage 1+2
    def stage12(orig_y, ref_y):
        lam_ = lam_x1k / 1024.0
        best_mv, _ = stage1(orig_y, ref_y)
        orig = orig_y.astype(jnp.int32)
        pad2 = R + 4
        ref_pad8 = jnp.pad(ref_y, pad2, mode="edge")
        orig_blocks = orig.reshape(ch, n, cw, n).transpose(0, 2, 1, 3).reshape(nctu, n, n)
        win_side = n + 2 * (R + 4)
        winS = extract_windows_static(ref_pad8, n, win_side, cw, ch, pad2, 4, R)
        org_s = R + 4
        win2 = window_select_batch(
            winS, best_mv[:, 1] + org_s - 2, best_mv[:, 0] + org_s - 2, n + 4, n + 4)
        best_cost = jnp.full((nctu,), 1 << 30, jnp.int32)
        best_d = jnp.zeros((nctu, 2), jnp.int32)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                cand = win2[:, 2 + dy: 2 + dy + n, 2 + dx: 2 + dx + n]
                sad = jnp.abs(orig_blocks - cand).sum(axis=(1, 2))
                mvx = 4 * (best_mv[:, 0] + dx)
                mvy = 4 * (best_mv[:, 1] + dy)
                cost = sad + (lam_ * (_mv_bits(mvx) + _mv_bits(mvy))).astype(jnp.int32)
                better = cost < best_cost
                best_cost = jnp.where(better, cost, best_cost)
                best_d = jnp.where(better[:, None],
                                   jnp.array([dx, dy], jnp.int32)[None, :], best_d)
        int_mv = jnp.clip(best_mv + best_d, -(R - 1), R - 1)
        return int_mv, best_cost

    timeit("  stage1+2 (+-2 fullpel refine)", stage12,
           [(c[0], r[0]) for c, r in zip(curs, refs)])


if __name__ == "__main__":
    main()


def main2():
    from kvazzup_tpu.ops.mc import extract_windows_static, window_select_batch
    from kvazzup_tpu.ops.me import _mv_bits

    seed = int.from_bytes(os.urandom(4), "little") % 1_000_000
    frames = synthetic_frames(W, H, REPS + 1, seed=seed)
    dev = [(jnp.asarray(f[0]), jnp.asarray(f[1])) for f in
           [(f[0], f[0]) for f in frames]]
    jax.block_until_ready(dev)
    n, R = 16, 16
    cw, ch = W // n, H // n
    nctu = cw * ch
    rng = np.random.default_rng(seed)
    mvs = [jnp.asarray(rng.integers(-14, 15, size=(nctu, 2), dtype=np.int32) & ~1)
           for _ in range(REPS + 1)]
    jax.block_until_ready(mvs)

    def winS_only(ref_y):
        pad2 = R + 4
        ref_pad8 = jnp.pad(ref_y, pad2, mode="edge")
        win_side = n + 2 * (R + 4)
        return extract_windows_static(ref_pad8, n, win_side, cw, ch, pad2, 4, R)

    timeit("  winS extraction (56x56)", winS_only, [(d[0],) for d in dev])

    def win2_sel(ref_y, mv):
        winS = winS_only(ref_y)
        org_s = R + 4
        return window_select_batch(winS, mv[:, 1] + org_s - 2,
                                   mv[:, 0] + org_s - 2, n + 4, n + 4)

    timeit("  winS + win2 select (20x20)", win2_sel,
           [(d[0], m) for d, m in zip(dev, mvs)])

    def sad25(orig_y, ref_y, mv):
        lam_ = jnp.float32(3.0)
        win2 = win2_sel(ref_y, mv)
        orig_blocks = orig_y.astype(jnp.int32).reshape(
            ch, n, cw, n).transpose(0, 2, 1, 3).reshape(nctu, n, n)
        best_cost = jnp.full((nctu,), 1 << 30, jnp.int32)
        best_d = jnp.zeros((nctu, 2), jnp.int32)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                cand = win2[:, 2 + dy: 2 + dy + n, 2 + dx: 2 + dx + n]
                sad = jnp.abs(orig_blocks - cand).sum(axis=(1, 2))
                mvx = 4 * (mv[:, 0] + dx)
                mvy = 4 * (mv[:, 1] + dy)
                cost = sad + (lam_ * (_mv_bits(mvx) + _mv_bits(mvy))).astype(jnp.int32)
                better = cost < best_cost
                best_cost = jnp.where(better, cost, best_cost)
                best_d = jnp.where(better[:, None],
                                   jnp.array([dx, dy], jnp.int32)[None, :], best_d)
        return best_cost, best_d

    timeit("  winS + win2 + 25-pos SAD", sad25,
           [(d[0], d[1], m) for d, m in zip(dev, mvs)])


if __name__ == "__main__":
    main2()
