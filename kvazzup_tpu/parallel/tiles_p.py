"""Sharded motion-constrained tile encoding with ICI halo collectives.

This is the real multi-chip encode axis (SURVEY.md §2.7/§2.8): each
device owns one tile column of the picture AND of the DPB, frames flow
through a low-delay P GOP, and the only cross-device traffic is the
loop-filter halo — one CTB column of reconstruction plus one column of
CTU metadata per neighbor per frame, moved with `lax.ppermute` over the
mesh "tile" axis (ICI on hardware).

Why this is exact (byte-identical to the single-device tiled Encoder):

- Prediction never crosses a tile boundary: intra/merge/AMVP
  availability stops at the tile edge (HEVC tile semantics), and motion
  vectors are MCTS-constrained (ops/me.mv_valid_x — kvazaar
  `--mv-constraint frametile`, /root/reference/src/media/processing/
  kvazaarfilter.cpp:246-276) so MC support stays inside the shard's own
  DPB column.
- Deblocking DOES cross tile boundaries
  (loop_filter_across_tiles_enabled_flag = 1): HEVC's picture-level
  filter order (all vertical edges on unfiltered recon, then all
  horizontal edges) makes every vertical edge independent, so each
  shard can filter its own side of the boundary from a 1-CTB halo of
  the neighbor's *unfiltered* recon + that column's (ctype, cbf, mv)
  for the boundary bS — redundantly computing only the shared edge.
  The horizontal pass then reads vertically-filtered pixels from the
  shard's own columns only.  The cropped result equals the full-frame
  `deblock_frame` column for column.

Entropy stays on the host: per-tile CABAC substreams with entry points
(entropy/slice_data.encode_slice_data_p_tiles).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.params import StreamConfig
from ..encoder.top import Encoder


def make_tile_mesh(n_tiles: int, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    assert len(devices) >= n_tiles, "not enough devices"
    return Mesh(np.asarray(devices[:n_tiles]), ("tile",))


class ShardedTileEncoder:
    """Low-delay (IDR + P chain) encoder sharded over tile columns.

    Byte-identical to `Encoder(cfg, intra_period)` with the same cfg
    (tile_cols == mesh "tile" size); requires the CTB16 fast-decision
    toolset and uniform tile columns.  Deblock and SAO both run sharded:
    cross-tile edges are resolved with ppermute halo exchanges (SAO rides
    the deblock halos, so SAO requires deblocking on).
    """

    def __init__(self, mesh: Mesh, cfg: StreamConfig, intra_period: int = 8):
        n_t = mesh.shape["tile"]
        if cfg.tile_cols != n_t:
            raise ValueError("cfg.tile_cols must equal the mesh tile size")
        if cfg.ctbs_w % n_t:
            raise ValueError("sharded tiles require uniform CTB-aligned columns")
        if cfg.wpp or cfg.cu_qp_delta or cfg.slices > 1:
            raise NotImplementedError("sharded tiles exclude wpp/qp_map/slices")
        if cfg.sao_enabled and not cfg.deblocking_enabled:
            raise NotImplementedError("sharded SAO rides the deblock halos")
        if not cfg.fast_decision:
            raise NotImplementedError("sharded tiles use the fast-decision path")
        self.mesh = mesh
        self.cfg = cfg
        self.intra_period = intra_period
        self._enc = Encoder(cfg, intra_period=intra_period)
        self._step_i, self._step_p = self._build()

    # ---- SPMD per-frame programs
    def _build(self):
        cfg = self.cfg
        mesh = self.mesh
        n = cfg.ctb_size
        n_t = mesh.shape["tile"]
        cwt = cfg.ctbs_w // n_t
        tile_w = cwt * n
        ch = cfg.ctbs_h
        qp = cfg.qp
        m = n // 2
        fwd = [(i, i + 1) for i in range(n_t - 1)]  # x -> right neighbor
        bwd = [(i + 1, i) for i in range(n_t - 1)]  # x -> left neighbor

        def halo_deblock(ry, ru, rv, ct2, cb2, mv2, left_f, right_f):
            """ry: (H, tile_w) unfiltered recon; ct2/cb2: (ch, cwt);
            mv2: (ch, cwt, 2).  Returns the shard's column of the
            picture-level deblocked frame."""
            from ..ops.deblock import compute_bs, deblock_frame

            send_r = lambda x: jax.lax.ppermute(x, "tile", fwd)
            send_l = lambda x: jax.lax.ppermute(x, "tile", bwd)
            # 1-CTB recon halo (unfiltered) in each direction
            hl_y, hl_u, hl_v = (send_r(p[:, -k:]) for p, k in
                                ((ry, n), (ru, m), (rv, m)))
            hr_y, hr_u, hr_v = (send_l(p[:, :k]) for p, k in
                                ((ry, n), (ru, m), (rv, m)))
            # boundary-column metadata for the cross-tile bS
            meta = jnp.concatenate(
                [ct2[..., None], cb2[..., None], mv2], axis=-1)  # (ch, cwt, 4)
            ml = send_r(meta[:, -1])  # (ch, 4) from left neighbor
            mr = send_l(meta[:, 0])
            ct_e = jnp.concatenate([ml[:, :1], ct2, mr[:, :1]], axis=1)
            cb_e = jnp.concatenate([ml[:, 1:2], cb2, mr[:, 1:2]], axis=1)
            mv_e = jnp.concatenate([ml[:, None, 2:], mv2, mr[:, None, 2:]],
                                   axis=1)
            bs_v, bs_h = compute_bs(ct_e.reshape(-1), cb_e.reshape(-1) != 0,
                                    mv_e.reshape(-1, 2), cwt + 2, ch)
            # picture-edge boundaries are not deblocked
            bs_v = bs_v.at[0].set(jnp.where(left_f, bs_v[0], 0))
            bs_v = bs_v.at[cwt].set(jnp.where(right_f, bs_v[cwt], 0))
            ext = lambda hl, p, hr: jnp.concatenate([hl, p, hr], axis=1)
            fy, fu, fv = deblock_frame(
                ext(hl_y, ry, hr_y), ext(hl_u, ru, hr_u), ext(hl_v, rv, hr_v),
                qp, spacing=n, bs_v=bs_v, bs_h=bs_h)
            return fy[:, n:-n], fu[:, m:-m], fv[:, m:-m]

        def halo_sao(oy, ou, ov, ry, ru, rv, left_f, right_f):
            """SAO decide+apply on the shard's deblocked column with a
            1-CTB ppermute halo of the neighbors' deblocked recon + the
            original frame: classification at the tile edge reads the TRUE
            neighbor pixels, so per-CTB stats (and hence params) equal the
            assembled-picture sao_decide's — byte-identical entropy.  Halo
            CTB columns' params/output are cropped; picture-edge shards
            exclude the missing side via lvalid/rvalid (8.7.3)."""
            from ..ops.sao import sao_apply, sao_decide, sao_decide_chroma

            send_r = lambda x: jax.lax.ppermute(x, "tile", fwd)
            send_l = lambda x: jax.lax.ppermute(x, "tile", bwd)
            ext = lambda p, k: jnp.concatenate(
                [send_r(p[:, -k:]), p, send_l(p[:, :k])], axis=1)
            lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))
            kw = dict(lvalid=left_f, rvalid=right_f)
            exto, extr = ext(oy, n), ext(ry, n)
            t_l, aux_l, off_l, _ = sao_decide(exto, extr, lam, ctb=n,
                                              xpad=n, **kw)
            extou, extru = ext(ou, m), ext(ru, m)
            extov, extrv = ext(ov, m), ext(rv, m)
            t_c, _cls, aux_cb, aux_cr, off_cb, off_cr = sao_decide_chroma(
                extou, extru, extov, extrv, lam, ctb=m, xpad=m, **kw)
            fy = sao_apply(extr, t_l, aux_l, off_l, ctb=n, xpad=n,
                           **kw)[:, n:-n]
            fu = sao_apply(extru, t_c, aux_cb, off_cb, ctb=m, xpad=m,
                           **kw)[:, m:-m]
            fv = sao_apply(extrv, t_c, aux_cr, off_cr, ctb=m, xpad=m,
                           **kw)[:, m:-m]
            mid = lambda p: p[:, 1:-1]
            params = (mid(t_l), mid(aux_l), mid(off_l), mid(t_c),
                      mid(aux_cb), mid(aux_cr), mid(off_cb), mid(off_cr))
            return fy, fu, fv, params

        def shard_i(y, u, v):
            from ..encoder.frame_intra import encode_frame_intra

            idx = jax.lax.axis_index("tile")
            left_f, right_f = idx > 0, idx < n_t - 1
            out = encode_frame_intra(y, u, v, qp, width=tile_w,
                                     height=cfg.height, rdoq=cfg.rdoq)
            ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
            if cfg.deblocking_enabled:
                ct2 = jnp.zeros((ch, cwt), jnp.int32)  # all-intra: bS = 2
                ry, ru, rv = halo_deblock(
                    ry, ru, rv, ct2, ct2, jnp.zeros((ch, cwt, 2), jnp.int32),
                    left_f, right_f)
            res = (out["mode"], out["lev_y"].astype(jnp.int16),
                   out["lev_cb"].astype(jnp.int16),
                   out["lev_cr"].astype(jnp.int16))
            if cfg.sao_enabled:
                ry, ru, rv, params = halo_sao(y, u, v, ry, ru, rv,
                                              left_f, right_f)
                return res + (ry, ru, rv) + params
            return res + (ry, ru, rv)

        def shard_p(y, u, v, ref_y, ref_u, ref_v):
            from ..encoder.frame_inter import encode_frame_p_fast

            idx = jax.lax.axis_index("tile")
            left_f, right_f = idx > 0, idx < n_t - 1
            out = encode_frame_p_fast(
                y, u, v, ref_y, ref_u, ref_v, qp, width=tile_w,
                height=cfg.height, rdoq=cfg.rdoq, xtile=(True, True),
                xflags=(left_f, right_f), merge_cand=cfg.merge_cand)
            ry, ru, rv = out["recon_y"], out["recon_u"], out["recon_v"]
            if cfg.deblocking_enabled:
                ct2 = out["ctype"].reshape(ch, cwt)
                cb2 = jnp.any(out["lev_y"] != 0, axis=(1, 2)).reshape(
                    ch, cwt).astype(jnp.int32)
                mv2 = out["mv"].reshape(ch, cwt, 2)
                ry, ru, rv = halo_deblock(ry, ru, rv, ct2, cb2, mv2,
                                          left_f, right_f)
            res = (out["ctype"], out["intra_mode"], out["mv"],
                   out["mvp_flag"], out["mvd"], out["merge_idx"],
                   out["lev_y"].astype(jnp.int16),
                   out["lev_cb"].astype(jnp.int16),
                   out["lev_cr"].astype(jnp.int16))
            if cfg.sao_enabled:
                ry, ru, rv, params = halo_sao(y, u, v, ry, ru, rv,
                                              left_f, right_f)
                return res + (ry, ru, rv) + params
            return res + (ry, ru, rv)

        from jax import shard_map

        plane = P(None, "tile")
        ctu1 = P("tile")
        ctu2 = P("tile", None)
        ctu3 = P("tile", None, None)
        planes3 = (plane, plane, plane)
        # SAO param grids are (ch, cwt) per shard -> picture (ch, cw)
        pg2 = P(None, "tile")
        pg3 = P(None, "tile", None)
        sao_specs = (pg2, pg2, pg3, pg2, pg2, pg2, pg3, pg3) \
            if cfg.sao_enabled else ()
        step_i = jax.jit(shard_map(
            shard_i, mesh=mesh, in_specs=planes3,
            out_specs=(ctu1, ctu3, ctu3, ctu3) + planes3 + sao_specs,
            check_vma=False))
        step_p = jax.jit(shard_map(
            shard_p, mesh=mesh, in_specs=planes3 + planes3,
            out_specs=(ctu1, ctu1, ctu2, ctu1, ctu2, ctu1, ctu3, ctu3, ctu3)
            + planes3 + sao_specs, check_vma=False))
        return step_i, step_p

    def _put(self, y, u, v):
        sh = NamedSharding(self.mesh, P(None, "tile"))
        return tuple(jax.device_put(jnp.asarray(p), sh) for p in (y, u, v))

    def encode_frame(self, y, u, v):
        """Returns (annexb_bytes, recon tuple of device arrays)."""
        from ..encoder.tiled import strip_to_raster
        from ..entropy.slice_data import tile_grid

        cfg = self.cfg
        enc = self._enc
        n = cfg.ctb_size
        cw, ch = cfg.ctbs_w, cfg.ctbs_h
        nctu = cw * ch
        cols = tile_grid(cfg, cfg.tile_cols)
        is_idr = enc._frame_count % self.intra_period == 0 or enc._ref is None
        yd, ud, vd = self._put(y, u, v)
        if is_idr:
            enc._idr_count += 1
            res = self._step_i(yd, ud, vd)
            mode_s, ly_s, lcb_s, lcr_s = res[:4]
            ry, ru, rv = res[4:7]
            sao_parts = res[7:]
            strips = {"mode": mode_s, "lev_y": ly_s, "lev_cb": lcb_s,
                      "lev_cr": lcr_s}
        else:
            res = self._step_p(yd, ud, vd, *enc._ref)
            (ct_s, im_s, mv_s, mf_s, mvd_s, mi_s, ly_s, lcb_s, lcr_s) = res[:9]
            ry, ru, rv = res[9:12]
            sao_parts = res[12:]
            strips = {"ctype": ct_s, "intra_mode": im_s, "mv": mv_s,
                      "mvp_flag": mf_s, "mvd": mvd_s, "merge_idx": mi_s,
                      "lev_y": ly_s, "lev_cb": lcb_s, "lev_cr": lcr_s}
        sao_state = None
        if cfg.sao_enabled:
            from ..entropy.slice_data import SaoState, tile_of_map

            (t_l, aux_l, off_l, t_c, aux_cb, aux_cr, off_cb, off_cr) = (
                np.asarray(p) for p in sao_parts)
            sao_state = SaoState(
                cw, ch,
                typ=np.stack([t_l, t_c, t_c]),
                aux=np.stack([aux_l, aux_cb, aux_cr]),
                offs=np.stack([off_l, off_cb, off_cr]),
            )
            sao_state.tile_of = tile_of_map(cfg, cfg.tile_cols)
        # strip-concatenated CTU arrays -> picture raster
        out = {}
        per_tile = nctu // cfg.tile_cols
        for key, val in strips.items():
            val = np.asarray(val).astype(np.int32)
            dst = np.zeros((nctu,) + val.shape[1:], np.int32)
            for t in range(cfg.tile_cols):
                strip_to_raster(val[t * per_tile:(t + 1) * per_tile], cols, t,
                                cw, ch, dst)
            out[key] = dst
        first = enc._frame_count == 0
        enc._frame_count += 1
        enc._poc = 0 if is_idr else enc._poc + 1
        enc._ref = (ry, ru, rv)
        ctx = {"kind": "tiles" if is_idr else "tiles_p", "out": out, "qp": cfg.qp,
               "first": first, "poc": enc._poc, "recon": (ry, ru, rv),
               "sao_state": sao_state, "flat_map": None}
        return enc.encode_frame_entropy(ctx, materialize_recon=False)

    def encode(self, frames) -> bytes:
        return b"".join(self.encode_frame(*f)[0] for f in frames)


# CTB64 quad device outputs: every per-CTB array shards on its leading
# (strip-raster CTB) axis; recon planes shard on width.
_Q64_I_KEYS = ("split64", "split32", "mode64", "modes32", "modes16",
               "lev_y", "lev_cb", "lev_cr")
_Q64_P_KEYS = ("split64", "split32", "imode32", "imode16",
               "ct64", "mv64", "merge_idx64", "mvp_flag64", "mvd64",
               "ct32", "mv32", "merge_idx32", "mvp_flag32", "mvd32",
               "ct16", "mv16", "merge_idx16", "mvp_flag16", "mvd16",
               "lev_y", "lev_cb", "lev_cr")


class ShardedQuadTileEncoder:
    """The quad64 production combo sharded over tile columns — the
    multi-chip form of Encoder's quad_tiles path (VERDICT r3 ask #4),
    byte-identical to it.

    Three stages per frame (same split as the single-device path, whose
    deblock bS comes from host-extracted CU trees):
      1. sharded quad64 wavefront per tile column (MCTS xflags from
         lax.axis_index) — all device compute;
      2. host: per-tile trees -> picture trees -> bS maps; per-shard
         extended bS windows are sliced from the picture maps (on a
         multi-host rig this is the only metadata that moves, a few KB);
      3. sharded deblock (1-CTB ppermute recon halo, picture-level
         across-tiles semantics) + sharded SAO (decide on true neighbor
         pixels via halos), as in ShardedTileEncoder.
    Entropy: per-tile quad CABAC substreams with entry points
    (entropy/quad.encode_slice_data_quad_tiles), shared with the
    single-device path.
    """

    def __init__(self, mesh: Mesh, cfg: StreamConfig, intra_period: int = 8):
        n_t = mesh.shape["tile"]
        if cfg.ctb_log2 != 6:
            raise NotImplementedError("quad tile sharding requires CTB64")
        if cfg.tile_cols != n_t:
            raise ValueError("cfg.tile_cols must equal the mesh tile size")
        if cfg.ctbs_w % n_t:
            raise ValueError("sharded tiles require uniform CTB-aligned columns")
        if cfg.wpp or cfg.cu_qp_delta or cfg.slices > 1:
            raise NotImplementedError(
                "sharded quad tiles exclude wpp/qp_map/slices")
        if cfg.sao_enabled and not cfg.deblocking_enabled:
            raise NotImplementedError("sharded SAO rides the deblock halos")
        if not cfg.fast_decision or cfg.max_transform_hierarchy_depth_intra:
            raise NotImplementedError(
                "quad tile sharding uses the device quad path")
        self.mesh = mesh
        self.cfg = cfg
        self.intra_period = intra_period
        self._enc = Encoder(cfg, intra_period=intra_period)
        # TMVP (r5): picture-level 16-grid collocated store of the
        # reference picture, host numpy (h16, w16[, 2]) — each shard gets
        # its tile column's slice extended by one cell column
        # (encoder/tiled.col_strip_slice semantics, col_xext)
        self._col2 = None
        self._step_i, self._step_p, self._filters = self._build()

    def _build(self):
        cfg = self.cfg
        mesh = self.mesh
        n = cfg.ctb_size  # 64
        m = n // 2
        n_t = mesh.shape["tile"]
        cwt = cfg.ctbs_w // n_t
        tile_w = cwt * n
        qp = cfg.qp
        fwd = [(i, i + 1) for i in range(n_t - 1)]
        bwd = [(i + 1, i) for i in range(n_t - 1)]

        def shard_i(y, u, v):
            from ..encoder.frame_intra64 import encode_frame_intra64_fast

            dev = encode_frame_intra64_fast(y, u, v, qp, width=tile_w,
                                            height=cfg.height, rdoq=cfg.rdoq)
            return tuple(dev[k] for k in _Q64_I_KEYS) + (
                dev["recon_y"], dev["recon_u"], dev["recon_v"])

        def shard_p(y, u, v, ref_y, ref_u, ref_v, *col):
            from ..encoder.frame_inter64 import encode_frame_p64_fast

            idx = jax.lax.axis_index("tile")
            tmvp_kw = {}
            if cfg.temporal_mvp:
                tmvp_kw = dict(tmvp=True, col_mv=col[0][0],
                               col_inter=col[1][0], col_xext=True)
            dev = encode_frame_p64_fast(
                y, u, v, ref_y, ref_u, ref_v, qp, width=tile_w,
                height=cfg.height, merge_cand=cfg.merge_cand, rdoq=cfg.rdoq,
                xtile=(True, True), xflags=(idx > 0, idx < n_t - 1),
                **tmvp_kw)
            return tuple(dev[k] for k in _Q64_P_KEYS) + (
                dev["recon_y"], dev["recon_u"], dev["recon_v"])

        def shard_filters(y, u, v, ry, ru, rv, bsv_t, bsh_t, rep_flag):
            """Deblock + SAO on the shard's column with ppermute halos.
            bsv_t: (1, Ev, L) per-shard extended-window bS slices (host
            precomputed); rep_flag selects intra (8-grid) vs P (4-px)
            granularity statically via two jit variants."""
            from ..ops.deblock import deblock_frame
            from ..ops.sao import sao_apply, sao_decide, sao_decide_chroma

            idx = jax.lax.axis_index("tile")
            left_f, right_f = idx > 0, idx < n_t - 1
            send_r = lambda x: jax.lax.ppermute(x, "tile", fwd)
            send_l = lambda x: jax.lax.ppermute(x, "tile", bwd)
            ext = lambda p, k: jnp.concatenate(
                [send_r(p[:, -k:]), p, send_l(p[:, :k])], axis=1)
            if cfg.deblocking_enabled:
                fy, fu, fv = deblock_frame(
                    ext(ry, n), ext(ru, m), ext(rv, m), qp, spacing=8,
                    bs_v=bsv_t[0], bs_h=bsh_t[0], chroma_every=2,
                    bs_rep=rep_flag)
                ry, ru, rv = fy[:, n:-n], fu[:, m:-m], fv[:, m:-m]
            res = (ry, ru, rv)
            if cfg.sao_enabled:
                lam = float(0.57 * 2.0 ** ((qp - 12) / 3.0))
                kw = dict(lvalid=left_f, rvalid=right_f)
                exto, extr = ext(y, n), ext(ry, n)
                t_l, aux_l, off_l, _ = sao_decide(exto, extr, lam, ctb=n,
                                                  xpad=n, **kw)
                extou, extru = ext(u, m), ext(ru, m)
                extov, extrv = ext(v, m), ext(rv, m)
                t_c, _cls, aux_cb, aux_cr, off_cb, off_cr = sao_decide_chroma(
                    extou, extru, extov, extrv, lam, ctb=m, xpad=m, **kw)
                fy = sao_apply(extr, t_l, aux_l, off_l, ctb=n, xpad=n,
                               **kw)[:, n:-n]
                fu = sao_apply(extru, t_c, aux_cb, off_cb, ctb=m, xpad=m,
                               **kw)[:, m:-m]
                fv = sao_apply(extrv, t_c, aux_cr, off_cr, ctb=m, xpad=m,
                               **kw)[:, m:-m]
                mid = lambda p: p[:, 1:-1]
                res = (fy, fu, fv) + (mid(t_l), mid(aux_l), mid(off_l),
                                      mid(t_c), mid(aux_cb), mid(aux_cr),
                                      mid(off_cb), mid(off_cr))
            return res

        from jax import shard_map

        plane = P(None, "tile")
        ctu = P("tile")
        planes3 = (plane, plane, plane)
        i_specs = tuple(ctu for _ in _Q64_I_KEYS) + planes3
        p_specs = tuple(ctu for _ in _Q64_P_KEYS) + planes3
        pg2 = P(None, "tile")
        pg3 = P(None, "tile", None)
        sao_specs = (pg2, pg2, pg3, pg2, pg2, pg2, pg3, pg3) \
            if cfg.sao_enabled else ()
        step_i = jax.jit(shard_map(
            shard_i, mesh=mesh, in_specs=planes3, out_specs=i_specs,
            check_vma=False))
        col_specs = ((P("tile"), P("tile")) if cfg.temporal_mvp else ())
        step_p = jax.jit(shard_map(
            shard_p, mesh=mesh, in_specs=planes3 + planes3 + col_specs,
            out_specs=p_specs, check_vma=False))
        filt = {}
        for rep in (0, 4):
            filt[rep] = jax.jit(shard_map(
                functools.partial(shard_filters, rep_flag=rep), mesh=mesh,
                in_specs=planes3 + planes3 + (P("tile"), P("tile")),
                out_specs=planes3 + sao_specs, check_vma=False))
        return step_i, step_p, filt

    def _put(self, y, u, v):
        sh = NamedSharding(self.mesh, P(None, "tile"))
        return tuple(jax.device_put(jnp.asarray(p), sh) for p in (y, u, v))

    def _bs_windows(self, bv, bh):
        """Per-shard extended-window slices of the picture bS maps.

        The filter stage runs on [px0-64, px1+64) strips; vertical edge
        rows and horizontal segment columns outside the picture get bS 0
        (picture edges are never deblocked), which also covers the
        zero halos ppermute delivers to edge shards."""
        cfg = self.cfg
        n_t = cfg.tile_cols
        tile_w = cfg.width // n_t
        we = tile_w + 128  # extended strip width
        bv = np.asarray(bv)
        bh = np.asarray(bh)
        seg = bv.shape[1] * 8 // cfg.height  # 1 for 8-grid, 2 for 4-px
        # vertical: picture edge at x=8e -> row e-1; pad 8 edge-rows/side
        pad_v = np.zeros((bv.shape[0] + 16, bv.shape[1]), np.int32)
        pad_v[8:8 + bv.shape[0]] = bv
        # horizontal: columns in (8/seg)-px units; pad one CTB each side
        cps = 64 * seg // 8  # columns per 64 px
        pad_h = np.zeros((bh.shape[0], bh.shape[1] + 2 * cps), np.int32)
        pad_h[:, cps:cps + bh.shape[1]] = bh
        bsv, bsh = [], []
        for t in range(n_t):
            px0 = t * tile_w
            e0 = px0 // 8  # first padded edge row for local edge x=8
            bsv.append(pad_v[e0:e0 + we // 8 - 1])
            c0 = px0 * seg // 8
            bsh.append(pad_h[:, c0:c0 + we * seg // 8])
        return (jnp.asarray(np.stack(bsv)), jnp.asarray(np.stack(bsh)))

    def encode_frame(self, y, u, v):
        """Returns (annexb_bytes, recon tuple of device arrays)."""
        from ..encoder.frame_intra64 import quad_trees_from_device64
        from ..encoder.frame_inter64 import quad_p64_trees_from_device
        from ..encoder.cu32 import quad_bs_maps
        from ..encoder.frame_inter32 import (quad_p_bs_maps,
                                             quad_p_cell_maps)
        from ..entropy.slice_data import SaoState, tile_of_map, tile_grid

        cfg = self.cfg
        enc = self._enc
        cw, ch = cfg.ctbs_w, cfg.ctbs_h
        n_t = cfg.tile_cols
        cwt = cw // n_t
        per_tile = cwt * ch
        is_idr = enc._frame_count % self.intra_period == 0 or enc._ref is None
        yd, ud, vd = self._put(y, u, v)
        if is_idr:
            enc._idr_count += 1
            res = self._step_i(yd, ud, vd)
            keys = _Q64_I_KEYS
            mk_trees = quad_trees_from_device64
            self._col2 = None  # IDR ref: all-intra collocated
        else:
            col_args = ()
            if cfg.temporal_mvp:
                h16, w16 = cfg.height // 16, cfg.width // 16
                w16t = w16 // n_t
                cmv2 = (np.zeros((h16, w16, 2), np.int32)
                        if self._col2 is None else self._col2[0])
                cif2 = (np.zeros((h16, w16), np.int32)
                        if self._col2 is None else self._col2[1])
                mv_s = np.zeros((n_t, h16, w16t + 1, 2), np.int32)
                if_s = np.zeros((n_t, h16, w16t + 1), np.int32)
                for t in range(n_t):
                    xe = min((t + 1) * w16t + 1, w16)
                    mv_s[t, :, : xe - t * w16t] = cmv2[:, t * w16t : xe]
                    if_s[t, :, : xe - t * w16t] = cif2[:, t * w16t : xe]
                sh_t = NamedSharding(self.mesh, P("tile"))
                col_args = (
                    jax.device_put(
                        jnp.asarray(mv_s.reshape(n_t, -1, 2)), sh_t),
                    jax.device_put(
                        jnp.asarray(if_s.reshape(n_t, -1)), sh_t))
            res = self._step_p(yd, ud, vd, *enc._ref, *col_args)
            keys = _Q64_P_KEYS
            mk_trees = quad_p64_trees_from_device
        dev_np = {k: np.asarray(res[j]) for j, k in enumerate(keys)}
        ry, ru, rv = res[len(keys):len(keys) + 3]
        # per-tile trees -> picture raster
        trees = [None] * (cw * ch)
        tile_wp = cwt * cfg.ctb_size
        for t in range(n_t):
            sl = {k: v[t * per_tile:(t + 1) * per_tile]
                  for k, v in dev_np.items()}
            tt = mk_trees(sl, tile_wp, cfg.height)
            for r in range(ch):
                for ci in range(cwt):
                    trees[r * cw + t * cwt + ci] = tt[r * cwt + ci]
        # bS maps on the assembled picture (across-tiles deblock)
        rep = 0
        bs_args = None
        if cfg.deblocking_enabled:
            if is_idr:
                bv, bh = quad_bs_maps(trees, cfg.width, cfg.height,
                                      cfg.ctb_log2)
            else:
                mv4, inter4, cbf4 = quad_p_cell_maps(
                    trees, cfg.width, cfg.height, ctb=cfg.ctb_size)
                bv, bh = quad_p_bs_maps(trees, mv4, inter4, cbf4, cfg.width,
                                        cfg.height, ctb=cfg.ctb_size)
                rep = 4
            bs_args = self._bs_windows(bv, bh)
        if cfg.temporal_mvp and not is_idr:
            # publish the 16x16-compressed collocated store (the spec's
            # compression reads each cell's top-left 4x4), host-side like
            # the single-device quad-tiles path — on a multi-host rig this
            # is a few KB of metadata per frame
            if not cfg.deblocking_enabled:
                mv4, inter4, _ = quad_p_cell_maps(
                    trees, cfg.width, cfg.height, ctb=cfg.ctb_size)
            self._col2 = (mv4[::4, ::4], inter4[::4, ::4])
        if cfg.deblocking_enabled or cfg.sao_enabled:
            if bs_args is None:
                z = jnp.zeros((n_t, 1, 1), jnp.int32)
                bs_args = (z, z)
            out = self._filters[rep](yd, ud, vd, ry, ru, rv, *bs_args)
            ry, ru, rv = out[:3]
            sao_parts = out[3:]
        else:
            sao_parts = ()
        sao_state = None
        if cfg.sao_enabled:
            (t_l, aux_l, off_l, t_c, aux_cb, aux_cr, off_cb, off_cr) = (
                np.asarray(p) for p in sao_parts)
            sao_state = SaoState(
                cw, ch,
                typ=np.stack([t_l, t_c, t_c]),
                aux=np.stack([aux_l, aux_cb, aux_cr]),
                offs=np.stack([off_l, off_cb, off_cr]),
            )
            sao_state.tile_of = tile_of_map(cfg, n_t)
        first = enc._frame_count == 0
        enc._frame_count += 1
        enc._poc = 0 if is_idr else enc._poc + 1
        enc._ref = (ry, ru, rv)
        ctx = {"kind": "quad_tiles" if is_idr else "quad_p_tiles",
               "out": {"trees": trees}, "qp": cfg.qp, "first": first,
               "poc": enc._poc, "recon": (ry, ru, rv),
               "sao_state": sao_state, "flat_map": None}
        return enc.encode_frame_entropy(ctx, materialize_recon=False)

    def encode(self, frames) -> bytes:
        return b"".join(self.encode_frame(*f)[0] for f in frames)
