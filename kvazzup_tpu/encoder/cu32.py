"""CTB-32 CU quadtree (CU32 -> CU16 -> CU8/NxN) intra coding — reference path.

Extends the two-level cu8.py quadtree to kvazaar's deeper CTU recursion
(`search.c` depth 0..3, SURVEY §2.6 Compression group): each 32x32 CTB
recursively chooses leaf-CU coding (one intra PU + one TU, DM chroma) or
a 4-way split, with PART_NxN (4x4 DST-VII PUs) available at CU8.  RD =
true SSE + lambda^2 * estimated rate at every node, exactly the cu8.py
decision shape.

Sequential numpy implementation on full-frame canvases with exact
generic z-scan availability (6.4.1, arbitrary CTB size); the entropy
pair lives in entropy/quad.py and the produced stream is validated
against libavcodec (tests/test_cu32.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import intra as intra_ops
from ..ops.quant import dequantize, quantize
from ..ops.satd import satd_blocks
from ..ops.transforms import fwd_transform, inv_transform
from .cu8 import _lev_bits, _mode_bits


# ---- fused jitted steps: one dispatch per block instead of dozens of
# eager jnp ops (the sequential search is host-driven; the per-op
# dispatch overhead dominated the profile before fusing)

@functools.partial(jax.jit, static_argnames=("log2", "is_luma"))
def _jit_sweep(a_raw, av, orig, log2, is_luma=True):
    a = intra_ops.substitute_refs(a_raw, av)
    preds = intra_ops.predict_all_modes(a, log2, is_luma)
    return preds, satd_blocks(preds, orig[None])


@functools.partial(jax.jit, static_argnames=("log2", "is_luma"))
def _jit_pred1(a_raw, av, mode, log2, is_luma):
    a = intra_ops.substitute_refs(a_raw, av)
    return intra_ops.predict_mode(a, log2, is_luma, mode)


@functools.partial(jax.jit, static_argnames=("log2", "dst"))
def _jit_code(orig, pred, qp, log2, dst=False):
    resid = orig - pred
    lev = quantize(fwd_transform(resid, log2, dst), qp, log2, True)
    rec = jnp.clip(pred + inv_transform(dequantize(lev, qp, log2), log2, dst),
                   0, 255)
    return lev, rec


def _code_np(orig, pred, qp, log2, dst=False):
    lev, rec = _jit_code(jnp.asarray(orig, jnp.int32),
                         jnp.asarray(pred, jnp.int32), qp, log2, dst)
    return np.asarray(lev), np.asarray(rec)

_ZO = ((0, 0), (0, 1), (1, 0), (1, 1))  # (dy, dx) halves in z-order


def _zaddr_g(x: int, y: int, cw_ctb: int, ctb_log2: int) -> int:
    """Generic z-scan (6.4.1) index of the 4x4 cell containing pixel
    (x, y): CTB raster order, Morton order within the CTB."""
    lvl = ctb_log2 - 2
    cx = (x >> 2) & ((1 << lvl) - 1)
    cy = (y >> 2) & ((1 << lvl) - 1)
    m = 0
    for k in range(lvl):
        m |= ((cx >> k) & 1) << (2 * k)
        m |= ((cy >> k) & 1) << (2 * k + 1)
    return (((y >> ctb_log2) * cw_ctb + (x >> ctb_log2)) << (2 * lvl)) + m


def boundary_g(canvas: np.ndarray, x0: int, y0: int, n: int, cw_ctb: int,
               ctb_log2: int):
    """(a_raw, avail) of length 4n+1, frame_intra layout (below-left(n)
    bottom-up | left(n) bottom-up | corner | top(n) | top-right(n)) with
    availability = inside picture and earlier in z-scan order."""
    h, w = canvas.shape
    cur = _zaddr_g(x0, y0, cw_ctb, ctb_log2)

    def ok(x, y):
        return 0 <= x < w and 0 <= y < h and _zaddr_g(x, y, cw_ctb, ctb_log2) < cur

    a = np.zeros(4 * n + 1, np.int32)
    av = np.zeros(4 * n + 1, bool)
    for j in range(n):  # below-left, bottom-up
        x, y = x0 - 1, y0 + 2 * n - 1 - j
        if ok(x, y):
            a[j], av[j] = canvas[y, x], True
    for j in range(n):  # left, bottom-up
        x, y = x0 - 1, y0 + n - 1 - j
        if ok(x, y):
            a[n + j], av[n + j] = canvas[y, x], True
    if ok(x0 - 1, y0 - 1):
        a[2 * n], av[2 * n] = canvas[y0 - 1, x0 - 1], True
    for j in range(2 * n):  # top + top-right
        x, y = x0 + j, y0 - 1
        if ok(x, y):
            a[2 * n + 1 + j], av[2 * n + 1 + j] = canvas[y, x], True
    return a, av


def predict_g(canvas, x0, y0, log2, is_luma, mode, cw_ctb, ctb_log2):
    a_raw, av = boundary_g(canvas, x0, y0, 1 << log2, cw_ctb, ctb_log2)
    return np.asarray(_jit_pred1(jnp.asarray(a_raw), jnp.asarray(av),
                                 mode, log2, is_luma))


class _QuadEncoder:
    """One frame's worth of state for the recursive CU search."""

    def __init__(self, y, u, v, qp, width, height, ctb_log2, nxn,
                 td_intra: int = 0):
        from ..core.tables import CHROMA_QP_TABLE

        self.oy = np.asarray(y, np.int32)
        self.ou = np.asarray(u, np.int32)
        self.ov = np.asarray(v, np.int32)
        self.w, self.h = width, height
        self.ctb_log2 = ctb_log2
        self.cw = width >> ctb_log2
        self.nxn = nxn
        self.td_intra = td_intra  # max_transform_hierarchy_depth_intra (0/1)
        self.qp = qp
        self.qp_c = int(CHROMA_QP_TABLE[min(max(qp, 0), 57)])
        self.lam = float(np.sqrt(0.57 * 2.0 ** ((qp - 12) / 3.0)))
        # committed state (forked per candidate): recon canvases + 4x4 mode map
        self.st = {
            "y": np.zeros((height, width), np.int32),
            "u": np.zeros((height // 2, width // 2), np.int32),
            "v": np.zeros((height // 2, width // 2), np.int32),
            "m4": np.ones((height // 4, width // 4), np.int32),
        }

    # ------------------------------------------------------------- helpers
    def _cands(self, st, x0, y0):
        """MPM neighbor modes (8.4.2): left, above; above-CTB row -> DC."""
        cl = 1 << self.ctb_log2
        a = 1 if x0 == 0 else int(st["m4"][y0 >> 2, (x0 - 1) >> 2])
        if y0 == 0 or ((y0 - 1) // cl) != (y0 // cl):
            b = 1
        else:
            b = int(st["m4"][(y0 - 1) >> 2, x0 >> 2])
        return a, b

    def _best_mode(self, st, x0, y0, log2, K=3, dst=False):
        """SATD top-K -> SSE + lambda^2*rate, cu8.py shape."""
        n = 1 << log2
        orig = self.oy[y0 : y0 + n, x0 : x0 + n]
        a_raw, av = boundary_g(st["y"], x0, y0, n, self.cw, self.ctb_log2)
        preds, satd_d = _jit_sweep(jnp.asarray(a_raw), jnp.asarray(av),
                                   jnp.asarray(orig), log2)
        satd = np.asarray(satd_d).astype(np.float64)
        ca, cb = self._cands(st, x0, y0)
        bits = np.array([_mode_bits(m, ca, cb) for m in range(35)])
        order = np.argsort(satd + self.lam * bits, kind="stable")[:K]
        preds_np = np.asarray(preds)
        best = None
        for m in order:
            lev, rec = _code_np(orig, preds_np[m], self.qp, log2, dst)
            sse = float(np.sum((rec.astype(np.int64) - orig) ** 2))
            rd = sse + self.lam * self.lam * (_lev_bits(lev) + bits[m])
            if best is None or rd < best[3]:
                best = (int(m), lev, rec, rd)
        return best

    def _chroma(self, st, plane, xc, yc, log2c, mode):
        canvas = st[plane]
        orig = (self.ou if plane == "u" else self.ov)[
            yc : yc + (1 << log2c), xc : xc + (1 << log2c)
        ]
        pred = predict_g(canvas, xc, yc, log2c, False, mode, self.cw,
                         self.ctb_log2 - 1)
        lev, rec = _code_np(orig, pred, self.qp_c, log2c)
        sse = float(np.sum((rec.astype(np.int64) - orig) ** 2))
        canvas[yc : yc + (1 << log2c), xc : xc + (1 << log2c)] = rec
        return lev, sse + self.lam * self.lam * _lev_bits(lev)

    # --------------------------------------------------------------- leafs
    def _tsplit_code(self, st, x0, y0, log2, m):
        """Code a 2Nx2N CU with its transform tree split once (7.3.8.8
        trafoDepth 1): four quarter luma TUs + four quarter chroma TUs,
        all predicted sequentially with the CU's mode.  Commits into st;
        returns (lev_y, lev_cb, lev_cr, rd)."""
        lam2 = self.lam * self.lam
        n = 1 << log2
        h = n >> 1
        ly = np.zeros((n, n), np.int32)
        lcb = np.zeros((n >> 1, n >> 1), np.int32)
        lcr = np.zeros((n >> 1, n >> 1), np.int32)
        rd = lam2 * 4.0  # 4 cbf_luma bins (chroma cbf folded into parent est)
        for dy, dx in _ZO:
            xs, ys = x0 + dx * h, y0 + dy * h
            orig = self.oy[ys : ys + h, xs : xs + h]
            pred = predict_g(st["y"], xs, ys, log2 - 1, True, m, self.cw,
                             self.ctb_log2)
            lev, rec = _code_np(orig, pred, self.qp, log2 - 1)
            st["y"][ys : ys + h, xs : xs + h] = rec
            ly[dy * h : (dy + 1) * h, dx * h : (dx + 1) * h] = lev
            rd += float(np.sum((rec.astype(np.int64) - orig) ** 2)) \
                + lam2 * _lev_bits(lev)
            q = h >> 1
            lb, rb_ = self._chroma(st, "u", xs >> 1, ys >> 1, log2 - 2, m)
            lr, rr_ = self._chroma(st, "v", xs >> 1, ys >> 1, log2 - 2, m)
            lcb[dy * q : (dy + 1) * q, dx * q : (dx + 1) * q] = lb
            lcr[dy * q : (dy + 1) * q, dx * q : (dx + 1) * q] = lr
            rd += rb_ + rr_
        st["m4"][y0 >> 2 : (y0 + n) >> 2, x0 >> 2 : (x0 + n) >> 2] = m
        return ly, lcb, lcr, rd

    def _leaf(self, st, x0, y0, log2):
        """Code one leaf CU (committing into st); returns (node, rd)."""
        lam2 = self.lam * self.lam
        n = 1 << log2
        if log2 == 3 and self.nxn:
            # PART_2Nx2N candidate on a fork
            st2 = {k: v.copy() for k, v in st.items()}
            m, lev, rec, rd = self._best_mode(st2, x0, y0, 3)
            st2["y"][y0 : y0 + 8, x0 : x0 + 8] = rec
            st2["m4"][y0 >> 2 : (y0 + 8) >> 2, x0 >> 2 : (x0 + 8) >> 2] = m
            cand2 = (st2, dict(part=0, modes=[m], lev_y=lev), rd + lam2 * 5.0, m)
            # PART_NxN candidate: 4 sequential DST-VII PUs
            stn = {k: v.copy() for k, v in st.items()}
            m4l, rdn = [], lam2 * 9.0
            lq = np.zeros((8, 8), np.int32)
            for jr, jc in _ZO:
                xp, yp = x0 + jc * 4, y0 + jr * 4
                mj, lj, rj, rdj = self._best_mode(stn, xp, yp, 2, dst=True)
                stn["y"][yp : yp + 4, xp : xp + 4] = rj
                stn["m4"][yp >> 2, xp >> 2] = mj
                m4l.append(mj)
                lq[jr * 4 : jr * 4 + 4, jc * 4 : jc * 4 + 4] = lj
                rdn += rdj
            candn = (stn, dict(part=1, modes=m4l, lev_y=lq), rdn, m4l[0])
            stw, node, rd, dm = candn if rdn < cand2[2] else cand2
            for k in st:
                st[k][...] = stw[k]
        else:
            m, lev, rec, rd = self._best_mode(st, x0, y0, log2)
            rd += lam2 * 5.0
            if self.td_intra and log2 in (4, 5):
                # explicit split_transform_flag: single-TU vs quarter-TUs
                sta = {k: v.copy() for k, v in st.items()}
                sta["y"][y0 : y0 + n, x0 : x0 + n] = rec
                sta["m4"][y0 >> 2 : (y0 + n) >> 2, x0 >> 2 : (x0 + n) >> 2] = m
                lcb_a, rdb_a = self._chroma(sta, "u", x0 >> 1, y0 >> 1, log2 - 1, m)
                lcr_a, rdr_a = self._chroma(sta, "v", x0 >> 1, y0 >> 1, log2 - 1, m)
                rd_a = rd + rdb_a + rdr_a
                stb = {k: v.copy() for k, v in st.items()}
                ly_b, lcb_b, lcr_b, rd_tt = self._tsplit_code(stb, x0, y0, log2, m)
                rd_b = lam2 * (_mode_bits(m, *self._cands(st, x0, y0)) + 5.0) + rd_tt
                if rd_b < rd_a:
                    for k in st:
                        st[k][...] = stb[k]
                    return dict(size=n, part=0, modes=[m], tsplit=1, lev_y=ly_b,
                                lev_cb=lcb_b, lev_cr=lcr_b), rd_b
                for k in st:
                    st[k][...] = sta[k]
                return dict(size=n, part=0, modes=[m], lev_y=lev,
                            lev_cb=lcb_a, lev_cr=lcr_a), rd_a
            st["y"][y0 : y0 + n, x0 : x0 + n] = rec
            st["m4"][y0 >> 2 : (y0 + n) >> 2, x0 >> 2 : (x0 + n) >> 2] = m
            node = dict(part=0, modes=[m], lev_y=lev)
            dm = m
        lcb, rdb = self._chroma(st, "u", x0 >> 1, y0 >> 1, log2 - 1, dm)
        lcr, rdr = self._chroma(st, "v", x0 >> 1, y0 >> 1, log2 - 1, dm)
        node.update(size=n, lev_cb=lcb, lev_cr=lcr)
        return node, rd + rdb + rdr

    # -------------------------------------------------------- CU64 leaf
    def _leaf64(self, st, x0, y0, K=2):
        """Intra CU64 (7.3.8.5 at log2CbSize 6): one luma mode, transform
        tree force-split to four TU32s + per-quadrant chroma TU16s
        (log2TrafoSize > MaxTbLog2SizeY, 7.3.8.8).  Mode candidates by
        SATD over the four quadrants, then true sequential TU coding."""
        lam2 = self.lam * self.lam
        ca, cb = self._cands(st, x0, y0)
        bits = np.array([_mode_bits(m, ca, cb) for m in range(35)])
        satd = np.zeros(35)
        # quadrants 1..3 border pixels of this CU that are not yet coded at
        # estimation time; approximate them with original pixels so the
        # SATD sweep sees realistic boundaries (kvazaar's orig-ref search)
        pseudo = st["y"].copy()
        pseudo[y0 : y0 + 64, x0 : x0 + 64] = self.oy[y0 : y0 + 64, x0 : x0 + 64]
        for dy, dx in _ZO:
            xs, ys = x0 + dx * 32, y0 + dy * 32
            a_raw, av = boundary_g(pseudo, xs, ys, 32, self.cw, self.ctb_log2)
            o = self.oy[ys : ys + 32, xs : xs + 32]
            _p, sd = _jit_sweep(jnp.asarray(a_raw), jnp.asarray(av),
                                jnp.asarray(o), 5)
            satd += np.asarray(sd).astype(np.float64)
        order = np.argsort(satd + self.lam * bits, kind="stable")[:K]
        best = None
        for m in order:
            stm = {k: v.copy() for k, v in st.items()}
            rd = lam2 * (bits[int(m)] + 5.0)
            ly = np.zeros((64, 64), np.int32)
            lcb = np.zeros((32, 32), np.int32)
            lcr = np.zeros((32, 32), np.int32)
            for dy, dx in _ZO:
                xs, ys = x0 + dx * 32, y0 + dy * 32
                orig = self.oy[ys : ys + 32, xs : xs + 32]
                pred = predict_g(stm["y"], xs, ys, 5, True, int(m), self.cw,
                                 self.ctb_log2)
                lev, rec = _code_np(orig, pred, self.qp, 5)
                stm["y"][ys : ys + 32, xs : xs + 32] = rec
                ly[dy * 32 : dy * 32 + 32, dx * 32 : dx * 32 + 32] = lev
                rd += float(np.sum((rec.astype(np.int64) - orig) ** 2)) \
                    + lam2 * _lev_bits(lev)
                lb, rb_ = self._chroma(stm, "u", xs >> 1, ys >> 1, 4, int(m))
                lr, rr_ = self._chroma(stm, "v", xs >> 1, ys >> 1, 4, int(m))
                lcb[dy * 16 : dy * 16 + 16, dx * 16 : dx * 16 + 16] = lb
                lcr[dy * 16 : dy * 16 + 16, dx * 16 : dx * 16 + 16] = lr
                rd += rb_ + rr_
            if best is None or rd < best[1]:
                best = (stm, rd, int(m), ly, lcb, lcr)
        stm, rd, m, ly, lcb, lcr = best
        for k in st:
            st[k][...] = stm[k]
        st["m4"][y0 >> 2 : (y0 + 64) >> 2, x0 >> 2 : (x0 + 64) >> 2] = m
        return dict(size=64, part=0, modes=[m], lev_y=ly, lev_cb=lcb,
                    lev_cr=lcr), rd

    # ------------------------------------------------------------ quadtree
    def _cu(self, st, x0, y0, log2):
        """Recursive CU decision committing into st; returns (node, rd)."""
        lam2 = self.lam * self.lam
        if log2 == 3:
            node, rd = self._leaf(st, x0, y0, log2)
            return node, rd + lam2  # split_cu_flag bin
        stl = {k: v.copy() for k, v in st.items()}
        if log2 == 6:
            leaf_node, leaf_rd = self._leaf64(stl, x0, y0)
        else:
            leaf_node, leaf_rd = self._leaf(stl, x0, y0, log2)
        leaf_rd += lam2
        sts = {k: v.copy() for k, v in st.items()}
        h = 1 << (log2 - 1)
        sub, split_rd = [], lam2
        for dy, dx in _ZO:
            nd, rd = self._cu(sts, x0 + dx * h, y0 + dy * h, log2 - 1)
            sub.append(nd)
            split_rd += rd
        if split_rd < leaf_rd:
            for k in st:
                st[k][...] = sts[k]
            return dict(size=1 << log2, split=sub), split_rd
        for k in st:
            st[k][...] = stl[k]
        return leaf_node, leaf_rd

    def run(self):
        trees = []
        n = 1 << self.ctb_log2
        for r in range(self.h >> self.ctb_log2):
            for c in range(self.w >> self.ctb_log2):
                node, _ = self._cu(self.st, c * n, r * n, self.ctb_log2)
                trees.append(node)
        return trees


def quad_bs_maps(trees, width: int, height: int, ctb_log2: int):
    """Intra boundary-strength maps from the decision trees — the mirror
    of GenericIntraDecoder._mark_edges + decoder/top.py's all-intra bS=2
    derivation, so encoder and decoder deblock identically."""
    h8, w8 = height // 8, width // 8
    ev = np.zeros((h8, w8), bool)
    eh = np.zeros((h8, w8), bool)

    def mark(x0, y0, n):
        if x0 % 8 == 0 and x0 // 8 < w8:
            ev[y0 // 8 : -(-(y0 + n) // 8), x0 // 8] = True
        if y0 % 8 == 0 and y0 // 8 < h8:
            eh[y0 // 8, x0 // 8 : -(-(x0 + n) // 8)] = True

    def walk(node, x0, y0, n):
        if "split" in node:
            h = n >> 1
            for (dy, dx), s in zip(_ZO, node["split"]):
                walk(s, x0 + dx * h, y0 + dy * h, h)
            return
        if n == 64:  # forced TT: the four TU32s are deblocking edges too
            for dy, dx in _ZO:
                mark(x0 + dx * 32, y0 + dy * 32, 32)
        elif node.get("tsplit"):
            for dy, dx in _ZO:  # explicit TT split: quarter-TU edges
                mark(x0 + dx * (n >> 1), y0 + dy * (n >> 1), n >> 1)
        else:
            mark(x0, y0, n)

    cw = width >> ctb_log2
    nctb = 1 << ctb_log2
    for i, t in enumerate(trees):
        walk(t, (i % cw) * nctb, (i // cw) * nctb, nctb)
    bs_v = np.zeros((w8 - 1, h8), np.int32)
    for e in range(1, w8):
        bs_v[e - 1, :] = 2 * ev[:, e]
    bs_h = np.zeros((h8 - 1, w8), np.int32)
    for e in range(1, h8):
        bs_h[e - 1, :] = 2 * eh[e, :]
    return bs_v, bs_h


def encode_frame_intra_quad_ref(y, u, v, qp: int, *, width: int, height: int,
                                ctb_log2: int = 5, nxn: bool = True,
                                td_intra: int = 0):
    """Sequential CTB-`2^ctb_log2` quadtree intra encoder.

    Returns dict(trees: list of per-CTB decision trees in raster order,
    recon planes).  A tree node is either {"size", "split": [4 nodes]}
    (z-order) or a leaf {"size", "part", "modes", "lev_y", "lev_cb",
    "lev_cr"} (part=1 only at size 8: PART_NxN with 4 luma modes)."""
    qe = _QuadEncoder(y, u, v, qp, width, height, ctb_log2, nxn, td_intra)
    trees = qe.run()
    return {
        "trees": trees,
        "recon_y": qe.st["y"].astype(np.uint8),
        "recon_u": qe.st["u"].astype(np.uint8),
        "recon_v": qe.st["v"].astype(np.uint8),
    }
