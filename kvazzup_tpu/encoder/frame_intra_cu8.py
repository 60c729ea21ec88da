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
from .frame_intra import (WAVE_UNROLL, _mpm_list, from_blocks, to_blocks,
                          wave_inputs)
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


@functools.partial(jax.jit, static_argnames=("width", "height", "nxn"))
def encode_frame_intra_cu8(y, u, v, qp, *, width: int, height: int, nxn: bool = True):
    """CU-quadtree wavefront encoder (CU16 / 4x CU8, each 2Nx2N or NxN).

    Output contract matches encoder/cu8.py: split (nctu,), part (nctu,4),
    modes4 (nctu,16), modes8 view, quadrant-packed levels, recon planes."""
    from ..core.tables import CHROMA_QP_TABLE

    n = 16
    cw, ch = width // n, height // n
    nctu = cw * ch
    cw8, ch8 = 2 * cw, 2 * ch
    nblk8 = cw8 * ch8
    cw4, ch4 = 4 * cw, 4 * ch
    nblk4 = cw4 * ch4
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
    # 4x4-cell mode raster (for MPM cands incl. NxN neighbors)
    map4 = jnp.ones((nblk4,), jnp.int32)

    ins = wave_inputs(sched, nctu, [oy, ou, ov, qp, qp_c, lam_all])
    xs = tuple(ins) + (
        jnp.asarray(sched["rs"]), jnp.asarray(sched["cs"]),
        jnp.asarray(sched["valid"]), jnp.asarray(sched["idx"]),
    )

    def wave(carry, x):
        blk_y8, blk_u4, blk_v4, map4 = carry
        oyw, ouw, ovw, qpw, qpcw, lamw, rs, cs, valid, idx = x
        L = rs.shape[0]
        r8 = 2 * rs
        c8 = 2 * cs
        r4 = 4 * rs
        c4 = 4 * cs
        one = jnp.ones((L,), jnp.int32)

        # local 4x4-cell mode state for this CTB (updated as CUs decide)
        local4 = jnp.ones((L, 4, 4), jnp.int32)

        def cand_at(local4, rr, cc):
            """MPM cands for a PU whose top-left cell is local (rr, cc)."""
            if cc > 0:
                ca = local4[:, rr, cc - 1]
            else:
                ca = jnp.where(
                    cs > 0, map4[jnp.clip((r4 + rr) * cw4 + c4 - 1, 0, nblk4 - 1)], 1
                )
            cb = local4[:, rr - 1, cc] if rr > 0 else one
            return ca, cb

        # ---------------- CU16 candidate (from the pre-wave grids)
        ca16, cb16 = cand_at(local4, 0, 0)
        a16 = _boundary_batch(blk_y8, r8, c8, 2, cw8, ch8, width, height, cw, 3)
        m16, lev16, rec16, rd16 = _best_mode_flat(
            a16, oyw.reshape(L, 256), ca16, cb16, qpw, lamw, 4
        )
        a16cb = _boundary_batch(blk_u4, r8, c8, 2, cw8, ch8, width // 2, height // 2, cw, 2)
        a16cr = _boundary_batch(blk_v4, r8, c8, 2, cw8, ch8, width // 2, height // 2, cw, 2)
        lcb16, rcb16, rdcb16 = _chroma_code_flat(a16cb, m16, ouw.reshape(L, 64), qpcw, lamw, 3)
        lcr16, rcr16, rdcr16 = _chroma_code_flat(a16cr, m16, ovw.reshape(L, 64), qpcw, lamw, 3)
        rd16_t = rd16 + rdcb16 + rdcr16 + lamw * lamw * 5.0

        # ---------------- split candidate: 4 sequential z-order sub-CUs,
        # each the better of 2Nx2N (TU8) and NxN (4x 4x4 DST TUs)
        wy8, wu4, wv4 = blk_y8, blk_u4, blk_v4
        sub_modes, sub_part, l8s, r8s_, lc8s, rc8s, lr8s, rr8s = [], [], [], [], [], [], [], []
        rd8_t = lamw * lamw * 1.0
        oq = oyw.reshape(L, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4).reshape(L, 4, 64)
        ouq = ouw.reshape(L, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(L, 4, 16)
        ovq = ovw.reshape(L, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(L, 4, 16)
        for k, (dr, dc) in enumerate(_ZOFF):
            rk = r8 + dr
            ck_ = c8 + dc
            kr, kc = dr * 2, dc * 2
            ca, cb = cand_at(local4, kr, kc)
            a8_raw, av8 = _boundary_batch_raw(
                wy8, rk, ck_, 1, cw8, ch8, width, height, cw, 3
            )
            a8 = intra_ops.substitute_refs(a8_raw, av8)
            m8, l8, r8v, rd8 = _best_mode_flat(a8, oq[:, k], ca, cb, qpw, lamw, 3)
            rd2n = rd8 + lamw * lamw * 5.0
            modes_k = jnp.stack([m8, m8, m8, m8], 1)  # (L, 4) per-cell
            lev_k8 = l8
            rec_k8 = r8v
            part_k = jnp.zeros((L,), jnp.int32)
            if nxn:
                # ---- NxN: 4 sequential 4x4 PUs on a local fork
                locN = local4
                recs = []
                levs = []
                msN = []
                rdn = lamw * lamw * 9.0
                o4 = oq[:, k].reshape(L, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(L, 4, 16)
                for j, (jr, jc) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                    caj, cbj = cand_at(locN, kr + jr, kc + jc)
                    a4, av4 = _pu_boundary(a8_raw, av8, recs, False, j)
                    a4s = intra_ops.substitute_refs(a4, av4)
                    mj, lj, rj, rdj = _best_mode_flat_dst(a4s, o4[:, j], caj, cbj, qpw, lamw)
                    recs.append(rj)
                    levs.append(lj)
                    msN.append(mj)
                    rdn = rdn + rdj
                    locN = locN.at[:, kr + jr, kc + jc].set(mj)
                use_nxn = rdn < rd2n
                part_k = use_nxn.astype(jnp.int32)
                un = use_nxn[:, None]
                modes_k = jnp.where(un, jnp.stack(msN, 1), modes_k)
                # assemble the 8x8 from 4x4 z-quads
                asm = lambda q: jnp.stack(q, 1).reshape(L, 2, 2, 4, 4).transpose(
                    0, 1, 3, 2, 4).reshape(L, 64)
                lev_k8 = jnp.where(un, asm(levs), lev_k8)
                rec_k8 = jnp.where(un, asm(recs), rec_k8)
                rd_k = jnp.where(use_nxn, rdn, rd2n)
            else:
                rd_k = rd2n
            # commit this sub-CU to the local mode state + working grids
            for j, (jr, jc) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                local4 = local4.at[:, kr + jr, kc + jc].set(modes_k[:, j])
            wy8 = wy8.at[jnp.where(valid, rk * cw8 + ck_, nblk8)].set(
                rec_k8.reshape(L, 8, 8), mode="drop"
            )
            # chroma (DM from the CU derivation mode = cell 0 of the sub-CU)
            dm = modes_k[:, 0]
            a4b = _boundary_batch(wu4, rk, ck_, 1, cw8, ch8, width // 2, height // 2, cw, 2)
            a4r = _boundary_batch(wv4, rk, ck_, 1, cw8, ch8, width // 2, height // 2, cw, 2)
            lcb8, rcb8, rdcb8 = _chroma_code_flat(a4b, dm, ouq[:, k], qpcw, lamw, 2)
            lcr8, rcr8, rdcr8 = _chroma_code_flat(a4r, dm, ovq[:, k], qpcw, lamw, 2)
            wu4 = wu4.at[jnp.where(valid, rk * cw8 + ck_, nblk8)].set(
                rcb8.reshape(L, 4, 4), mode="drop"
            )
            wv4 = wv4.at[jnp.where(valid, rk * cw8 + ck_, nblk8)].set(
                rcr8.reshape(L, 4, 4), mode="drop"
            )
            sub_modes.append(modes_k)
            sub_part.append(part_k)
            l8s.append(lev_k8)
            r8s_.append(rec_k8)
            lc8s.append(lcb8)
            rc8s.append(rcb8)
            lr8s.append(lcr8)
            rr8s.append(rcr8)
            rd8_t = rd8_t + rd_k + rdcb8 + rdcr8

        split = (rd8_t < rd16_t).astype(jnp.int32)
        spb = split.astype(bool)
        sp1 = spb[:, None]
        sp2 = spb[:, None, None]

        part = jnp.where(sp1, jnp.stack(sub_part, 1), 0)  # (L, 4)
        modes4_out = jnp.where(
            sp1[:, :, None], jnp.stack(sub_modes, 1), m16[:, None, None]
        ).reshape(L, 16)  # (L, 4 sub, 4 cell)

        lev_y = jnp.where(sp2, _assemble16(jnp.stack(l8s, 1)), lev16.reshape(L, 16, 16))
        lev_cb = jnp.where(sp2, _assemble8(jnp.stack(lc8s, 1)), lcb16.reshape(L, 8, 8))
        lev_cr = jnp.where(sp2, _assemble8(jnp.stack(lr8s, 1)), lcr16.reshape(L, 8, 8))

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
        # scatter the 16 cell modes into the global 4-cell raster
        chosen4 = modes4_out.reshape(L, 4, 2, 2)  # (L, sub, jr, jc)
        for k, (dr, dc) in enumerate(_ZOFF):
            for jr in range(2):
                for jc in range(2):
                    tgt4 = jnp.where(
                        valid, (r4 + dr * 2 + jr) * cw4 + (c4 + dc * 2 + jc), nblk4
                    )
                    map4 = map4.at[tgt4].set(chosen4[:, k, jr, jc], mode="drop")

        out_idx = jnp.where(valid, rs * cw + cs, nctu)
        return (blk_y8, blk_u4, blk_v4, map4), (
            split, part, modes4_out, lev_y, lev_cb, lev_cr, out_idx
        )

    (blk_y8, blk_u4, blk_v4, _), outs = jax.lax.scan(
        wave, (blk_y8, blk_u4, blk_v4, map4), xs, unroll=WAVE_UNROLL
    )
    split_w, part_w, modes4_w, lev_y_w, lev_cb_w, lev_cr_w, idx_w = outs
    flat = lambda a: a.reshape((-1,) + a.shape[2:])
    idxf = idx_w.reshape(-1)

    def unwave(a, shape, dtype=jnp.int32):
        out = jnp.zeros((nctu + 1,) + shape, dtype)
        return out.at[idxf].set(flat(a))[:nctu]

    modes4 = unwave(modes4_w, (16,))
    return {
        "split": unwave(split_w, ()),
        "part": unwave(part_w, (4,)),
        "modes4": modes4,
        "modes8": modes4.reshape(-1, 4, 4)[:, :, 0],
        "lev_y": unwave(lev_y_w, (16, 16)).astype(jnp.int16),
        "lev_cb": unwave(lev_cb_w, (8, 8)).astype(jnp.int16),
        "lev_cr": unwave(lev_cr_w, (8, 8)).astype(jnp.int16),
        "recon_y": from_blocks(blk_y8, height, width).astype(jnp.uint8),
        "recon_u": from_blocks(blk_u4, height // 2, width // 2).astype(jnp.uint8),
        "recon_v": from_blocks(blk_v4, height // 2, width // 2).astype(jnp.uint8),
    }


@functools.partial(jax.jit, static_argnames=("width", "height"))
def reconstruct_frame_intra_cu8(split, part, modes4, lev_y, lev_cb, lev_cr, qp,
                                *, width: int, height: int, cmode4=None):
    """Decoder-side wavefront reconstruction for CU8 streams (incl. NxN and
    explicit chroma modes — cmode4 (nctu, 4) per-sub-CU resolved chroma
    prediction modes, defaulting to DM)."""
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

    if cmode4 is None:
        m4 = jnp.asarray(modes4)
        cmode4 = m4.reshape(-1, 4, 4)[:, :, 0]
    ins = wave_inputs(
        sched, nctu,
        [jnp.asarray(split), jnp.asarray(part), jnp.asarray(modes4),
         jnp.asarray(cmode4),
         jnp.asarray(lev_y, jnp.int32), jnp.asarray(lev_cb, jnp.int32),
         jnp.asarray(lev_cr, jnp.int32), qp, qp_c],
    )
    xs = tuple(ins) + (
        jnp.asarray(sched["rs"]), jnp.asarray(sched["cs"]),
        jnp.asarray(sched["valid"]), jnp.asarray(sched["idx"]),
    )

    def rec_one(a, mode, lev, qpv, log2, is_luma, dst=False):
        preds = ck.predict_all_modes_flat(a, log2, is_luma)
        pred = jnp.take_along_axis(preds, mode[:, None, None], axis=1)[:, 0]
        L = pred.shape[0]
        resid = ck.inv_transform_flat(
            dequantize(lev.reshape(L, 1, -1), qpv, log2), log2, dst=dst
        )[:, 0]
        return jnp.clip(pred + resid, 0, 255)

    def wave(carry, x):
        blk_y8, blk_u4, blk_v4 = carry
        spw, paw, m4w, cm4w, lyw, lcbw, lcrw, qpw, qpcw, rs, cs, valid, idx = x
        L = rs.shape[0]
        r8 = 2 * rs
        c8 = 2 * cs
        sp = spw.astype(bool)

        # CU16 path (uses pre-wave grids)
        a16 = _boundary_batch(blk_y8, r8, c8, 2, cw8, ch8, width, height, cw, 3)
        rec16 = rec_one(a16, m4w[:, 0], lyw.reshape(L, 256), qpw, 4, True)
        a16cb = _boundary_batch(blk_u4, r8, c8, 2, cw8, ch8, width // 2, height // 2, cw, 2)
        a16cr = _boundary_batch(blk_v4, r8, c8, 2, cw8, ch8, width // 2, height // 2, cw, 2)
        rcb16 = rec_one(a16cb, cm4w[:, 0], lcbw.reshape(L, 64), qpcw, 3, False)
        rcr16 = rec_one(a16cr, cm4w[:, 0], lcrw.reshape(L, 64), qpcw, 3, False)

        lyq = lyw.reshape(L, 2, 8, 2, 8).transpose(0, 1, 3, 2, 4).reshape(L, 4, 64)
        lcbq = lcbw.reshape(L, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(L, 4, 16)
        lcrq = lcrw.reshape(L, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(L, 4, 16)

        wy8, wu4, wv4 = blk_y8, blk_u4, blk_v4
        r8subs, rcbsubs, rcrsubs = [], [], []
        for k, (dr, dc) in enumerate(_ZOFF):
            rk = r8 + dr
            ck_ = c8 + dc
            pk = paw[:, k].astype(bool)
            a8_raw, av8 = _boundary_batch_raw(
                wy8, rk, ck_, 1, cw8, ch8, width, height, cw, 3
            )
            a8 = intra_ops.substitute_refs(a8_raw, av8)
            rec2n = rec_one(a8, m4w[:, k * 4], lyq[:, k], qpw, 3, True)
            # NxN path: 4 sequential 4x4 PU recons (DST)
            l4q = lyq[:, k].reshape(L, 2, 4, 2, 4).transpose(0, 1, 3, 2, 4).reshape(L, 4, 16)
            recs = []
            for j in range(4):
                a4, av4 = _pu_boundary(a8_raw, av8, recs, False, j)
                a4s = intra_ops.substitute_refs(a4, av4)
                rj = rec_one(a4s, m4w[:, k * 4 + j], l4q[:, j], qpw, 2, True, dst=True)
                recs.append(rj)
            recN = jnp.stack(recs, 1).reshape(L, 2, 2, 4, 4).transpose(
                0, 1, 3, 2, 4).reshape(L, 64)
            rec8 = jnp.where(pk[:, None], recN, rec2n)
            tgt = jnp.where(valid & sp, rk * cw8 + ck_, nblk8)
            wy8 = wy8.at[tgt].set(rec8.reshape(L, 8, 8), mode="drop")
            dm = cm4w[:, k]
            a4b = _boundary_batch(wu4, rk, ck_, 1, cw8, ch8, width // 2, height // 2, cw, 2)
            a4r = _boundary_batch(wv4, rk, ck_, 1, cw8, ch8, width // 2, height // 2, cw, 2)
            rcb8 = rec_one(a4b, dm, lcbq[:, k], qpcw, 2, False)
            rcr8 = rec_one(a4r, dm, lcrq[:, k], qpcw, 2, False)
            wu4 = wu4.at[tgt].set(rcb8.reshape(L, 4, 4), mode="drop")
            wv4 = wv4.at[tgt].set(rcr8.reshape(L, 4, 4), mode="drop")
            r8subs.append(rec8)
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

    (blk_y8, blk_u4, blk_v4), _ = jax.lax.scan(wave, (blk_y8, blk_u4, blk_v4), xs,
                                               unroll=WAVE_UNROLL)
    return (
        from_blocks(blk_y8, height, width).astype(jnp.uint8),
        from_blocks(blk_u4, height // 2, width // 2).astype(jnp.uint8),
        from_blocks(blk_v4, height // 2, width // 2).astype(jnp.uint8),
    )


# ---------------------------------------------------------------- NxN (4x4)

def _boundary_batch_raw(blocks, r0s, c0s, nb, cwB, chB, W, H, cw_ctb, shift):
    return jax.vmap(
        _gather8, in_axes=(None, 0, 0, None, None, None, None, None, None, None)
    )(blocks, r0s, c0s, nb, cwB, chB, W, H, cw_ctb, shift)


def _pu_boundary(a8_raw, av8, recs, k_avail_tr1: bool, j: int):
    """Per-PU 4x4 boundary (L, 17) + avail from the CU8's raw 33-walk and
    the local PU recons `recs` (list of (L, 16) chosen so far, z-order).

    Index map of the 8-walk: [0..7]=below-left bottom-up, [8..15]=left
    bottom-up, [16]=corner, [17..24]=top, [25..32]=top-right."""
    L = a8_raw.shape[0]
    f = jnp.full
    zeros4 = jnp.zeros((L, 4), jnp.int32)
    fT = f((L, 4), True)
    fF = f((L, 4), False)
    if j == 0:
        a = jnp.concatenate([a8_raw[:, 8:12], a8_raw[:, 12:16], a8_raw[:, 16:17],
                             a8_raw[:, 17:21], a8_raw[:, 21:25]], axis=1)
        av = jnp.concatenate([av8[:, 8:12], av8[:, 12:16], av8[:, 16:17],
                              av8[:, 17:21], av8[:, 21:25]], axis=1)
        return a, av
    r0 = recs[0].reshape(L, 4, 4) if len(recs) > 0 else None
    if j == 1:  # top-right PU: left col from PU0
        left = r0[:, ::-1, 3]  # bottom-up
        a = jnp.concatenate([zeros4, left, a8_raw[:, 20:21],
                             a8_raw[:, 21:25], a8_raw[:, 25:29]], axis=1)
        av = jnp.concatenate([fF, fT, av8[:, 20:21],
                              av8[:, 21:25], av8[:, 25:29]], axis=1)
        return a, av
    if j == 2:  # bottom-left PU: top from PU0, top-right from PU1
        r1 = recs[1].reshape(L, 4, 4)
        a = jnp.concatenate([a8_raw[:, 4:8], a8_raw[:, 8:12], a8_raw[:, 12:13],
                             r0[:, 3, :], r1[:, 3, :]], axis=1)
        av = jnp.concatenate([av8[:, 4:8], av8[:, 8:12], av8[:, 12:13], fT, fT],
                             axis=1)
        return a, av
    r1 = recs[1].reshape(L, 4, 4)
    r2 = recs[2].reshape(L, 4, 4)
    a = jnp.concatenate([zeros4, r2[:, ::-1, 3], r0[:, 3:4, 3],
                         r1[:, 3, :], zeros4], axis=1)
    av = jnp.concatenate([fF, fT, f((L, 1), True), fT, fF], axis=1)
    return a, av


def _best_mode_flat_dst(a, orig, cand_a, cand_b, qp, lam, K: int = 3):
    """4x4 luma decision with DST-VII TUs (intra 4x4 luma, 8.6.4.2)."""
    preds = ck.predict_all_modes_flat(a, 2, True)
    satd = ck.satd_flat(preds, orig[:, None, :], 2).astype(jnp.float32)
    bits = jax.vmap(_mode_bits_ab)(cand_a, cand_b)
    lam_ = lam[:, None]
    _, cand = jax.lax.top_k(-(satd + lam_ * bits), K)
    cand_preds = jnp.take_along_axis(preds, cand[:, :, None], axis=1)
    resid = orig[:, None, :] - cand_preds
    lev_k = quantize(ck.fwd_transform_flat(resid, 2, dst=True), qp, 2, True)
    rec_k = jnp.clip(
        cand_preds + ck.inv_transform_flat(dequantize(lev_k, qp, 2), 2, dst=True),
        0, 255,
    )
    sse = jnp.sum((rec_k - orig[:, None, :]) ** 2, axis=-1).astype(jnp.float32)
    rd = sse + (lam_ * lam_) * (_lev_bits_flat(lev_k) + jnp.take_along_axis(bits, cand, axis=1))
    best_k = jnp.argmin(rd, axis=1)
    take = lambda x: jnp.take_along_axis(x, best_k[:, None, None], 1)[:, 0]
    return (
        jnp.take_along_axis(cand, best_k[:, None], 1)[:, 0].astype(jnp.int32),
        take(lev_k), take(rec_k),
        jnp.take_along_axis(rd, best_k[:, None], 1)[:, 0],
    )
