"""Wavefront CU-quadtree intra codec (CTB16 -> 4x CU8) on the device.

The TPU port of encoder/cu8.py's sequential reference: the picture lives
as 8x8 (luma) / 4x4 (chroma) block grids, the CTB wavefront runs as a
`lax.scan` over static scheduling tables (encoder/wavefront.py), and each
wave evaluates the CU16 candidate plus the four z-order CU8 candidates as
batched MXU matmuls (ops/ctu_kernels.py).  The z-order dependency inside
a CTB becomes four sequential sub-steps per wave, each scattering its
recon into the working grids so the next sub-step's boundary gather sees
it — lanes of one wave are never neighbors, so the scatters cannot race.

Availability is the exact z-scan rule (6.4.1) evaluated per boundary
sample via the same zaddr arithmetic as cu8.py (including the chroma
4x4-cell granularity).  kvazaar parity: search.c CU-depth recursion,
compressed to depth in {0,1}.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import ctu_kernels as ck
from ..ops import intra as intra_ops
from ..ops.quant import dequantize, quantize
from .frame_intra import _mpm_list, from_blocks, to_blocks, wave_inputs
from .wavefront import schedule

_ZOFF = [(0, 0), (0, 1), (1, 0), (1, 1)]  # z-order (row, col) in sub-blocks


def _mode_bits_ab(cand_a, cand_b):
    """(35,) estimated mode-signalling bits given both MPM candidates."""
    mpm = _mpm_list(cand_a, cand_b)
    modes = jnp.arange(35, dtype=jnp.int32)
    is0 = modes == mpm[0]
    is12 = (modes == mpm[1]) | (modes == mpm[2])
    return jnp.where(is0, 2.0, jnp.where(is12, 3.0, 6.0))


def _gather8(blocks, r0, c0, nb: int, cwB: int, chB: int, W: int, H: int,
             cw_ctb: int, shift: int):
    """Boundary walk A[0..4n] + z-scan availability from a B-granular grid.

    blocks: (nblk, B, B); (r0, c0): block coords of the target; nb: target
    size in blocks (n = nb*B).  Layout matches frame_intra._gather_refs_blocks:
    [below-left(n) bottom-up | left(n) bottom-up | corner | top(n) | tr(n)].
    """
    B = blocks.shape[-1]
    n = nb * B
    nblk = cwB * chB
    clampi = lambda i: jnp.clip(i, 0, nblk - 1)
    lcols = [blocks[clampi((r0 + j) * cwB + c0 - 1)][:, B - 1] for j in range(2 * nb)]
    la = jnp.concatenate(lcols)[::-1]  # A[0..2n-1] bottom-up
    corner = blocks[clampi((r0 - 1) * cwB + c0 - 1)][B - 1, B - 1]
    trows = [blocks[clampi((r0 - 1) * cwB + c0 + j)][B - 1, :] for j in range(2 * nb)]
    ta = jnp.concatenate(trows)  # A[2n+1..4n]
    a_raw = jnp.concatenate([la, corner[None], ta])

    x0 = c0 * B
    y0 = r0 * B
    j = jnp.arange(2 * n, dtype=jnp.int32)
    xs = jnp.concatenate([jnp.full((2 * n,), x0 - 1), jnp.asarray([x0 - 1]), x0 + j])
    ys = jnp.concatenate([y0 + 2 * n - 1 - j, jnp.asarray([y0 - 1]),
                          jnp.full((2 * n,), y0 - 1)])

    def zaddr(x, y):
        rb = y >> shift
        cb = x >> shift
        return ((rb >> 1) * cw_ctb + (cb >> 1)) * 4 + (rb & 1) * 2 + (cb & 1)

    avail = (xs >= 0) & (ys >= 0) & (xs < W) & (ys < H) & (
        zaddr(xs, ys) < zaddr(x0, y0)
    )
    return a_raw, avail


def _boundary_batch(blocks, r0s, c0s, nb, cwB, chB, W, H, cw_ctb, shift):
    a_raw, avail = jax.vmap(
        _gather8, in_axes=(None, 0, 0, None, None, None, None, None, None, None)
    )(blocks, r0s, c0s, nb, cwB, chB, W, H, cw_ctb, shift)
    return intra_ops.substitute_refs(a_raw, avail)


def _lev_bits_flat(lev):
    return jnp.sum(
        jnp.where(lev != 0, 2.0 * jnp.log2(jnp.abs(lev).astype(jnp.float32) + 1.0) + 1.0, 0.0),
        axis=-1,
    )


def _code_flat(orig, pred, qp, log2):
    resid = orig - pred
    lev = quantize(ck.fwd_transform_flat(resid, log2), qp, log2, True)
    rec = jnp.clip(pred + ck.inv_transform_flat(dequantize(lev, qp, log2), log2), 0, 255)
    return lev, rec


def _best_mode_flat(a, orig, cand_a, cand_b, qp, lam, log2: int, K: int = 3):
    """Batched two-stage luma decision.  a: (L, 4n+1); orig: (L, n*n).
    Returns (mode (L,), lev (L, n*n), rec (L, n*n), rd (L,))."""
    preds = ck.predict_all_modes_flat(a, log2, True)  # (L, 35, n*n)
    satd = ck.satd_flat(preds, orig[:, None, :], log2).astype(jnp.float32)
    bits = jax.vmap(_mode_bits_ab)(cand_a, cand_b)  # (L, 35)
    lam_ = lam[:, None]
    _, cand = jax.lax.top_k(-(satd + lam_ * bits), K)
    cand_preds = jnp.take_along_axis(preds, cand[:, :, None], axis=1)
    lev_k, rec_k = _code_flat(orig[:, None, :], cand_preds, qp, log2)
    sse = jnp.sum((rec_k - orig[:, None, :]) ** 2, axis=-1).astype(jnp.float32)
    rd = sse + (lam_ * lam_) * (_lev_bits_flat(lev_k) + jnp.take_along_axis(bits, cand, axis=1))
    best_k = jnp.argmin(rd, axis=1)
    take = lambda x: jnp.take_along_axis(x, best_k[:, None, None], 1)[:, 0]
    return (
        jnp.take_along_axis(cand, best_k[:, None], 1)[:, 0].astype(jnp.int32),
        take(lev_k), take(rec_k),
        jnp.take_along_axis(rd, best_k[:, None], 1)[:, 0],
    )


def _chroma_code_flat(a, mode, orig, qp_c, lam, log2c: int):
    """DM-mode chroma for one plane: predict chosen mode, code, rd."""
    preds = ck.predict_all_modes_flat(a, log2c, False)
    pred = jnp.take_along_axis(preds, mode[:, None, None], axis=1)[:, 0]
    lev, rec = _code_flat(orig, pred, qp_c, log2c)
    sse = jnp.sum((rec - orig) ** 2, axis=-1).astype(jnp.float32)
    rd = sse + lam * lam * _lev_bits_flat(lev)
    return lev, rec, rd


def _assemble16(quads):
    """(L,4,64) z-order 8x8 quads -> (L,16,16)."""
    L = quads.shape[0]
    q = quads.reshape(L, 2, 2, 8, 8)
    return q.transpose(0, 1, 3, 2, 4).reshape(L, 16, 16)


def _assemble8(quads):
    """(L,4,16) z-order 4x4 quads -> (L,8,8)."""
    L = quads.shape[0]
    q = quads.reshape(L, 2, 2, 4, 4)
    return q.transpose(0, 1, 3, 2, 4).reshape(L, 8, 8)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def encode_frame_intra_cu8(y, u, v, qp, *, width: int, height: int):
    """CU-quadtree wavefront encoder; returns the cu8.py output contract:
    split (nctu,), modes8 (nctu,4), quadrant-packed levels, recon planes."""
    from ..core.tables import CHROMA_QP_TABLE

    n = 16
    cw, ch = width // n, height // n
    nctu = cw * ch
    cw8, ch8 = 2 * cw, 2 * ch
    nblk8 = cw8 * ch8
    sched = schedule(cw, ch)
    qp = jnp.broadcast_to(jnp.asarray(qp, jnp.int32), (nctu,))
    qp_c = jnp.asarray(CHROMA_QP_TABLE)[jnp.clip(qp, 0, 57)]
    lam_all = jnp.sqrt(0.57 * 2.0 ** ((qp.astype(jnp.float32) - 12.0) / 3.0))

    oy = to_blocks(y.astype(jnp.int32), 16)
    ou = to_blocks(u.astype(jnp.int32), 8)
    ov = to_blocks(v.astype(jnp.int32), 8)

    blk_y8 = jnp.zeros((nblk8, 8, 8), jnp.int32)
    blk_u4 = jnp.zeros((nblk8, 4, 4), jnp.int32)
    blk_v4 = jnp.zeros((nblk8, 4, 4), jnp.int32)
    mode_map = jnp.ones((nblk8,), jnp.int32)  # DC default for not-yet-coded blocks

    ins = wave_inputs(sched, nctu, [oy, ou, ov, qp, qp_c, lam_all])
    xs = tuple(ins) + (
        jnp.asarray(sched["rs"]), jnp.asarray(sched["cs"]),
        jnp.asarray(sched["valid"]), jnp.asarray(sched["idx"]),
    )

    def wave(carry, x):
        blk_y8, blk_u4, blk_v4, mode_map = carry
        oyw, ouw, ovw, qpw, qpcw, lamw, rs, cs, valid, idx = x
        L = rs.shape[0]
        r8 = 2 * rs
        c8 = 2 * cs

        # ---------------- CU16 candidate (from the pre-wave grids)
        cand_a16 = jnp.where(
            cs > 0, mode_map[jnp.clip(r8 * cw8 + c8 - 1, 0, nblk8 - 1)], 1
        )
        one = jnp.ones_like(cand_a16)
        a16 = _boundary_batch(blk_y8, r8, c8, 2, cw8, ch8, width, height, cw, 3)
        m16, lev16, rec16, rd16 = _best_mode_flat(
            a16, oyw.reshape(L, 256), cand_a16, one, qpw, lamw, 4
        )
        a16cb = _boundary_batch(blk_u4, r8, c8, 2, cw8, ch8, width // 2, height // 2, cw, 2)
        a16cr = _boundary_batch(blk_v4, r8, c8, 2, cw8, ch8, width // 2, height // 2, cw, 2)
        lcb16, rcb16, rdcb16 = _chroma_code_flat(a16cb, m16, ouw.reshape(L, 64), qpcw, lamw, 3)
        lcr16, rcr16, rdcr16 = _chroma_code_flat(a16cr, m16, ovw.reshape(L, 64), qpcw, lamw, 3)
        rd16_t = rd16 + rdcb16 + rdcr16 + lamw * lamw * 5.0

        # ---------------- CU8 split candidate: 4 sequential z-order steps
        out_base = jnp.where(valid, r8 * cw8 + c8, nblk8)
        wy8, wu4, wv4 = blk_y8, blk_u4, blk_v4
        m8s, l8s, r8s_, lc8s, rc8s, lr8s, rr8s = [], [], [], [], [], [], []
        rd8_t = lamw * lamw * 21.0
        oq = oyw.reshape(L, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4).reshape(L, 4, 64)
        ouq = ouw.reshape(L, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(L, 4, 16)
        ovq = ovw.reshape(L, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(L, 4, 16)
        for k, (dr, dc) in enumerate(_ZOFF):
            rk = r8 + dr
            ck_ = c8 + dc
            if k == 0:
                ca = cand_a16
                cb = one
            elif k == 1:
                ca, cb = m8s[0], one
            elif k == 2:
                ca = jnp.where(
                    cs > 0, mode_map[jnp.clip((r8 + 1) * cw8 + c8 - 1, 0, nblk8 - 1)], 1
                )
                cb = m8s[0]
            else:
                ca, cb = m8s[2], m8s[1]
            a8 = _boundary_batch(wy8, rk, ck_, 1, cw8, ch8, width, height, cw, 3)
            m8, l8, r8v, rd8 = _best_mode_flat(a8, oq[:, k], ca, cb, qpw, lamw, 3)
            wy8 = wy8.at[jnp.where(valid, rk * cw8 + ck_, nblk8)].set(
                r8v.reshape(L, 8, 8), mode="drop"
            )
            a4b = _boundary_batch(wu4, rk, ck_, 1, cw8, ch8, width // 2, height // 2, cw, 2)
            a4r = _boundary_batch(wv4, rk, ck_, 1, cw8, ch8, width // 2, height // 2, cw, 2)
            lcb8, rcb8, rdcb8 = _chroma_code_flat(a4b, m8, ouq[:, k], qpcw, lamw, 2)
            lcr8, rcr8, rdcr8 = _chroma_code_flat(a4r, m8, ovq[:, k], qpcw, lamw, 2)
            wu4 = wu4.at[jnp.where(valid, rk * cw8 + ck_, nblk8)].set(
                rcb8.reshape(L, 4, 4), mode="drop"
            )
            wv4 = wv4.at[jnp.where(valid, rk * cw8 + ck_, nblk8)].set(
                rcr8.reshape(L, 4, 4), mode="drop"
            )
            m8s.append(m8)
            l8s.append(l8)
            r8s_.append(r8v)
            lc8s.append(lcb8)
            rc8s.append(rcb8)
            lr8s.append(lcr8)
            rr8s.append(rcr8)
            rd8_t = rd8_t + rd8 + rdcb8 + rdcr8

        split = (rd8_t < rd16_t).astype(jnp.int32)
        spb = split.astype(bool)
        sp1 = spb[:, None]
        sp2 = spb[:, None, None]

        # chosen per-sub modes (CU16 replicates its mode)
        modes8 = jnp.where(sp1, jnp.stack(m8s, 1), m16[:, None])  # (L, 4)

        # levels: quadrant-packed when split
        lev_y = jnp.where(sp2, _assemble16(jnp.stack(l8s, 1)), lev16.reshape(L, 16, 16))
        lev_cb = jnp.where(sp2, _assemble8(jnp.stack(lc8s, 1)), lcb16.reshape(L, 8, 8))
        lev_cr = jnp.where(sp2, _assemble8(jnp.stack(lr8s, 1)), lcr16.reshape(L, 8, 8))

        # recon: write the four 8-blocks with the chosen quadrants
        rec16q = rec16.reshape(L, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4).reshape(L, 4, 64)
        rcb16q = rcb16.reshape(L, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(L, 4, 16)
        rcr16q = rcr16.reshape(L, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(L, 4, 16)
        rec_q = jnp.where(sp1[:, :, None], jnp.stack(r8s_, 1), rec16q)
        rcb_q = jnp.where(sp1[:, :, None], jnp.stack(rc8s, 1), rcb16q)
        rcr_q = jnp.where(sp1[:, :, None], jnp.stack(rr8s, 1), rcr16q)
        for k, (dr, dc) in enumerate(_ZOFF):
            tgt = jnp.where(valid, (r8 + dr) * cw8 + (c8 + dc), nblk8)
            blk_y8 = blk_y8.at[tgt].set(rec_q[:, k].reshape(L, 8, 8), mode="drop")
            blk_u4 = blk_u4.at[tgt].set(rcb_q[:, k].reshape(L, 4, 4), mode="drop")
            blk_v4 = blk_v4.at[tgt].set(rcr_q[:, k].reshape(L, 4, 4), mode="drop")
            mode_map = mode_map.at[tgt].set(modes8[:, k], mode="drop")

        out_idx = jnp.where(valid, rs * cw + cs, nctu)
        return (blk_y8, blk_u4, blk_v4, mode_map), (split, modes8, lev_y, lev_cb, lev_cr, out_idx)

    (blk_y8, blk_u4, blk_v4, _), outs = jax.lax.scan(
        wave, (blk_y8, blk_u4, blk_v4, mode_map), xs
    )
    split_w, modes8_w, lev_y_w, lev_cb_w, lev_cr_w, idx_w = outs
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    idxf = idx_w.reshape(-1)

    def unwave(a, shape, dtype=jnp.int32):
        out = jnp.zeros((nctu + 1,) + shape, dtype)
        return out.at[idxf].set(flat(a))[:nctu]

    return {
        "split": unwave(split_w, ()),
        "modes8": unwave(modes8_w, (4,)),
        "lev_y": unwave(lev_y_w, (16, 16)).astype(jnp.int16),
        "lev_cb": unwave(lev_cb_w, (8, 8)).astype(jnp.int16),
        "lev_cr": unwave(lev_cr_w, (8, 8)).astype(jnp.int16),
        "recon_y": from_blocks(blk_y8, height, width).astype(jnp.uint8),
        "recon_u": from_blocks(blk_u4, height // 2, width // 2).astype(jnp.uint8),
        "recon_v": from_blocks(blk_v4, height // 2, width // 2).astype(jnp.uint8),
    }


@functools.partial(jax.jit, static_argnames=("width", "height"))
def reconstruct_frame_intra_cu8(split, modes8, lev_y, lev_cb, lev_cr, qp,
                                *, width: int, height: int):
    """Decoder-side wavefront reconstruction for CU8 streams."""
    from ..core.tables import CHROMA_QP_TABLE

    n = 16
    cw, ch = width // n, height // n
    nctu = cw * ch
    cw8, ch8 = 2 * cw, 2 * ch
    nblk8 = cw8 * ch8
    sched = schedule(cw, ch)
    qp = jnp.broadcast_to(jnp.asarray(qp, jnp.int32), (nctu,))
    qp_c = jnp.asarray(CHROMA_QP_TABLE)[jnp.clip(qp, 0, 57)]

    blk_y8 = jnp.zeros((nblk8, 8, 8), jnp.int32)
    blk_u4 = jnp.zeros((nblk8, 4, 4), jnp.int32)
    blk_v4 = jnp.zeros((nblk8, 4, 4), jnp.int32)

    ins = wave_inputs(
        sched, nctu,
        [jnp.asarray(split), jnp.asarray(modes8),
         jnp.asarray(lev_y, jnp.int32), jnp.asarray(lev_cb, jnp.int32),
         jnp.asarray(lev_cr, jnp.int32), qp, qp_c],
    )
    xs = tuple(ins) + (
        jnp.asarray(sched["rs"]), jnp.asarray(sched["cs"]),
        jnp.asarray(sched["valid"]), jnp.asarray(sched["idx"]),
    )

    def rec_one(a, mode, lev, qpv, log2, is_luma):
        preds = ck.predict_all_modes_flat(a, log2, is_luma)
        pred = jnp.take_along_axis(preds, mode[:, None, None], axis=1)[:, 0]
        L = pred.shape[0]
        resid = ck.inv_transform_flat(
            dequantize(lev.reshape(L, 1, -1), qpv, log2), log2
        )[:, 0]
        return jnp.clip(pred + resid, 0, 255)

    def wave(carry, x):
        blk_y8, blk_u4, blk_v4 = carry
        spw, m8w, lyw, lcbw, lcrw, qpw, qpcw, rs, cs, valid, idx = x
        L = rs.shape[0]
        r8 = 2 * rs
        c8 = 2 * cs
        sp = spw.astype(bool)

        # CU16 path (uses pre-wave grids)
        a16 = _boundary_batch(blk_y8, r8, c8, 2, cw8, ch8, width, height, cw, 3)
        rec16 = rec_one(a16, m8w[:, 0], lyw.reshape(L, 256), qpw, 4, True)
        a16cb = _boundary_batch(blk_u4, r8, c8, 2, cw8, ch8, width // 2, height // 2, cw, 2)
        a16cr = _boundary_batch(blk_v4, r8, c8, 2, cw8, ch8, width // 2, height // 2, cw, 2)
        rcb16 = rec_one(a16cb, m8w[:, 0], lcbw.reshape(L, 64), qpcw, 3, False)
        rcr16 = rec_one(a16cr, m8w[:, 0], lcrw.reshape(L, 64), qpcw, 3, False)

        lyq = lyw.reshape(L, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4).reshape(L, 4, 64)
        lcbq = lcbw.reshape(L, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(L, 4, 16)
        lcrq = lcrw.reshape(L, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(L, 4, 16)

        wy8, wu4, wv4 = blk_y8, blk_u4, blk_v4
        r8subs, rcbsubs, rcrsubs = [], [], []
        for k, (dr, dc) in enumerate(_ZOFF):
            rk = r8 + dr
            ck_ = c8 + dc
            a8 = _boundary_batch(wy8, rk, ck_, 1, cw8, ch8, width, height, cw, 3)
            r8v = rec_one(a8, m8w[:, k], lyq[:, k], qpw, 3, True)
            # only split lanes feed their sub recon forward; CU16 lanes keep
            # zeros there until the final combined write (their sub gathers
            # are unused)
            tgt = jnp.where(valid & sp, rk * cw8 + ck_, nblk8)
            wy8 = wy8.at[tgt].set(r8v.reshape(L, 8, 8), mode="drop")
            a4b = _boundary_batch(wu4, rk, ck_, 1, cw8, ch8, width // 2, height // 2, cw, 2)
            a4r = _boundary_batch(wv4, rk, ck_, 1, cw8, ch8, width // 2, height // 2, cw, 2)
            rcb8 = rec_one(a4b, m8w[:, k], lcbq[:, k], qpcw, 2, False)
            rcr8 = rec_one(a4r, m8w[:, k], lcrq[:, k], qpcw, 2, False)
            wu4 = wu4.at[tgt].set(rcb8.reshape(L, 4, 4), mode="drop")
            wv4 = wv4.at[tgt].set(rcr8.reshape(L, 4, 4), mode="drop")
            r8subs.append(r8v)
            rcbsubs.append(rcb8)
            rcrsubs.append(rcr8)

        rec16q = rec16.reshape(L, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4).reshape(L, 4, 64)
        rcb16q = rcb16.reshape(L, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(L, 4, 16)
        rcr16q = rcr16.reshape(L, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(L, 4, 16)
        spm = sp[:, None, None]
        rec_q = jnp.where(spm, jnp.stack(r8subs, 1), rec16q)
        rcb_q = jnp.where(spm, jnp.stack(rcbsubs, 1), rcb16q)
        rcr_q = jnp.where(spm, jnp.stack(rcrsubs, 1), rcr16q)
        for k, (dr, dc) in enumerate(_ZOFF):
            tgt = jnp.where(valid, (r8 + dr) * cw8 + (c8 + dc), nblk8)
            blk_y8 = blk_y8.at[tgt].set(rec_q[:, k].reshape(L, 8, 8), mode="drop")
            blk_u4 = blk_u4.at[tgt].set(rcb_q[:, k].reshape(L, 4, 4), mode="drop")
            blk_v4 = blk_v4.at[tgt].set(rcr_q[:, k].reshape(L, 4, 4), mode="drop")
        return (blk_y8, blk_u4, blk_v4), None

    (blk_y8, blk_u4, blk_v4), _ = jax.lax.scan(wave, (blk_y8, blk_u4, blk_v4), xs)
    return (
        from_blocks(blk_y8, height, width).astype(jnp.uint8),
        from_blocks(blk_u4, height // 2, width // 2).astype(jnp.uint8),
        from_blocks(blk_v4, height // 2, width // 2).astype(jnp.uint8),
    )
