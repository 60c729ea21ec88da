"""Sample Adaptive Offset (H.265 8.7.3): estimation + application.

SAO runs after deblocking and reads only the deblocked picture, so both
halves are dense full-frame ops: the encoder accumulates per-CTB category
statistics for every edge class and band simultaneously (one pass over the
picture), picks offsets/classes by the standard RD estimate, and the
applier adds per-pixel offsets selected by each pixel's CTB parameters.

Counterpart: kvazaar `sao.c` + strategy kernels (Reconstruction group,
dependencies/kvazaar_CMakeLists.txt:207-218).

Parameter encoding per CTB and component:
  type: 0 = off, 1 = band (BO), 2 = edge (EO)
  eo_class: 0 = 0deg, 1 = 90deg, 2 = 135deg, 3 = 45deg
  offsets[4]: per EO category 1..4 or 4 consecutive bands from band_pos
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

SAO_OFF, SAO_BAND, SAO_EDGE = 0, 1, 2
_EO_DIRS = [(-1, 0, 1, 0), (0, -1, 0, 1), (-1, -1, 1, 1), (1, -1, -1, 1)]
# (hPos0, vPos0, hPos1, vPos1) per class: left/right, up/down, diagonals


def _shift(img, dy: int, dx: int):
    """Shifted copy with edge rows/cols marked invalid via a mask."""
    h, w = img.shape
    pad = jnp.pad(img, 1, mode="edge")
    return pad[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]


def _edge_index_maps(rec, xpad: int = 0, lvalid=False, rvalid=False):
    """Per-class (4, H, W) final edgeIdx in {0..4} (0 = flat / no offset),
    with picture-boundary samples forced to 0.

    xpad: number of horizontal CONTEXT columns attached on each side of
    the plane (a shard's ppermute halo of the neighbor tile's deblocked
    recon).  lvalid/rvalid (traced bools): True when that context is real
    picture — neighbors there classify normally; False means the picture
    ends at the strip edge, so those reads are excluded (8.7.3).  With
    xpad == 0 the flags describe columns beyond the array: False is the
    picture-edge exclusion of the non-sharded path."""
    h, w = rec.shape
    x0, x1 = xpad, w - xpad
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    maps = []
    for dx0, dy0, dx1, dy1 in _EO_DIRS:
        n0 = _shift(rec, dy0, dx0)
        n1 = _shift(rec, dy1, dx1)
        raw = 2 + jnp.sign(rec - n0) + jnp.sign(rec - n1)
        idx = jnp.where(raw == 2, 0, jnp.where(raw < 2, raw + 1, raw)).astype(jnp.int32)
        # samples whose neighbors fall outside the picture: no EO
        okx = lambda dx: jnp.where(
            xs + dx < x0, lvalid, jnp.where(xs + dx >= x1, rvalid, True))
        ok = (
            okx(dx0) & okx(dx1)
            & (ys + dy0 >= 0) & (ys + dy0 < h) & (ys + dy1 >= 0) & (ys + dy1 < h)
        )
        maps.append(jnp.where(ok, idx, 0))
    return jnp.stack(maps)  # (4, H, W)


def _per_ctb_sums(x, ctb: int):
    h, w = x.shape[-2], x.shape[-1]
    lead = x.shape[:-2]
    return x.reshape(lead + (h // ctb, ctb, w // ctb, ctb)).sum(axis=(-3, -1))


@functools.partial(jax.jit, static_argnames=("ctb", "xpad"))
def sao_statistics(orig, rec, *, ctb: int, xpad: int = 0, lvalid=False,
                   rvalid=False):
    """Per-CTB SAO statistics for one plane.

    orig/rec: (H, W) uint8/int32 (rec = deblocked).  Returns dict:
      eo_sum/eo_cnt: (4, 4, cb_h, cb_w)  [class, category-1]
      band_sum/band_cnt: (32, cb_h, cb_w)
    """
    o = orig.astype(jnp.int32)
    r = rec.astype(jnp.int32)
    diff = o - r
    emaps = _edge_index_maps(r, xpad, lvalid, rvalid)  # (4, H, W)
    eo_sum = []
    eo_cnt = []
    for cat in range(1, 5):
        m = emaps == cat  # (4, H, W)
        eo_sum.append(_per_ctb_sums(jnp.where(m, diff[None], 0), ctb))
        eo_cnt.append(_per_ctb_sums(m.astype(jnp.int32), ctb))
    eo_sum = jnp.stack(eo_sum, axis=1)  # (4, 4, cbh, cbw)
    eo_cnt = jnp.stack(eo_cnt, axis=1)

    band = r >> 3  # (H, W) in 0..31
    onehot = band[None] == jnp.arange(32, dtype=jnp.int32)[:, None, None]
    band_sum = _per_ctb_sums(jnp.where(onehot, diff[None], 0), ctb)
    band_cnt = _per_ctb_sums(onehot.astype(jnp.int32), ctb)
    return dict(eo_sum=eo_sum, eo_cnt=eo_cnt, band_sum=band_sum, band_cnt=band_cnt)


def _best_offset(ssum, cnt, lo, hi):
    """Distortion-optimal integer offset in [lo, hi] and its dist delta.

    delta-D for offset o on a category: cnt*o^2 - 2*o*sum (negative good)."""
    o = jnp.clip(jnp.round(ssum / jnp.maximum(cnt, 1)).astype(jnp.int32), lo, hi)
    # moving toward zero can only help rate; test o and its toward-zero nbr
    o2 = o - jnp.sign(o)
    d1 = cnt * o * o - 2 * o * ssum
    d2 = cnt * o2 * o2 - 2 * o2 * ssum
    better = d2 < d1
    return jnp.where(better, o2, o), jnp.where(better, d2, d1)


@functools.partial(jax.jit, static_argnames=("ctb", "xpad"))
def sao_decide(orig, rec, lam, *, ctb: int, xpad: int = 0, lvalid=False,
               rvalid=False):
    """Choose per-CTB SAO params for one plane.

    Returns (type (cbh,cbw), class_or_bandpos, offsets (cbh,cbw,4), cost)
    where cost is the RD delta (<= 0 improves).  lam: scalar f32.
    xpad/lvalid/rvalid: sharded-strip context columns (_edge_index_maps);
    the halo CTB columns' params are meaningless — callers slice them off.
    """
    st = sao_statistics(orig, rec, ctb=ctb, xpad=xpad, lvalid=lvalid,
                        rvalid=rvalid)
    # EO: per class, best offsets with inferred signs (+,+,-,-)
    eo_off_hi = jnp.array([7, 7, 0, 0], jnp.int32)
    eo_off_lo = jnp.array([0, 0, -7, -7], jnp.int32)
    eo_o, eo_d = _best_offset(
        st["eo_sum"], st["eo_cnt"], eo_off_lo[None, :, None, None], eo_off_hi[None, :, None, None]
    )
    eo_dist = eo_d.sum(axis=1)  # (4, cbh, cbw)
    eo_bits = 2.0 + 2.0 + jnp.abs(eo_o).sum(axis=1).astype(jnp.float32)  # type+class+offsets
    eo_cost = eo_dist.astype(jnp.float32) + lam * eo_bits
    best_class = jnp.argmin(eo_cost, axis=0)  # (cbh, cbw)
    best_eo_cost = jnp.min(eo_cost, axis=0)
    best_eo_off = jnp.take_along_axis(
        eo_o, best_class[None, None], axis=0
    )[0].transpose(1, 2, 0)  # (cbh, cbw, 4)

    # BO: best window of 4 consecutive bands
    bo_o, bo_d = _best_offset(st["band_sum"], st["band_cnt"], -7, 7)  # (32, cbh, cbw)
    win_d = jnp.stack([
        bo_d[k : k + 4].sum(axis=0) if k + 4 <= 32 else
        (bo_d[k:].sum(axis=0) + bo_d[: k + 4 - 32].sum(axis=0))
        for k in range(29)
    ])  # (29, cbh, cbw) — non-wrapping windows only (band_position <= 28)
    bo_pos = jnp.argmin(win_d, axis=0)  # (cbh, cbw)
    bo_dist = jnp.min(win_d, axis=0)
    idx = bo_pos[None] + jnp.arange(4)[:, None, None]
    bo_off = jnp.take_along_axis(bo_o, idx, axis=0).transpose(1, 2, 0)  # (cbh,cbw,4)
    bo_bits = 2.0 + 5.0 + (jnp.abs(bo_off).sum(axis=-1) + (bo_off != 0).sum(axis=-1)).astype(jnp.float32)
    bo_cost = bo_dist.astype(jnp.float32) + lam * bo_bits

    off_cost = lam * 1.0  # type bin only
    t_eo = best_eo_cost < jnp.minimum(bo_cost, off_cost)
    t_bo = (bo_cost < off_cost) & ~t_eo
    typ = jnp.where(t_eo, SAO_EDGE, jnp.where(t_bo, SAO_BAND, SAO_OFF)).astype(jnp.int32)
    aux = jnp.where(t_eo, best_class, bo_pos).astype(jnp.int32)
    offs = jnp.where(
        t_eo[..., None], best_eo_off, jnp.where(t_bo[..., None], bo_off, 0)
    ).astype(jnp.int32)
    cost = jnp.where(t_eo, best_eo_cost, jnp.where(t_bo, bo_cost, off_cost))
    return typ, aux, offs, cost


# --------------------------------------------------------- Pallas applier
#
# The XLA sao_apply below round-trips several full-plane intermediates
# through HBM (upsampled parameter planes, four edge-index maps); the
# Pallas kernel is ONE pass: a CTB-row-strip grid where each step reads
# its strip plus one-row halos (shifted index maps on the same operand),
# upsamples that strip's per-CTB parameters inside VMEM, classifies only
# the selected EO class, and writes the offset strip.  Traffic = 3 reads
# + 1 write of the plane.  TPU-only (interpret mode covers CPU tests);
# KVZ_TPU_NO_PALLAS=1 is the kill switch.

import os as _os


def _sao_strip_kernel(typ_r, aux_r, o0_r, o1_r, o2_r, o3_r, sel_r,
                      cur_r, up_r, dn_r, out_r, *, ctb: int, bd: int):
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    i = pl.program_id(0)
    n_i = pl.num_programs(0)
    h, w = cur_r.shape
    r = cur_r[:].astype(jnp.int32)
    # vertical neighbors: shift within the strip, splicing the halo rows
    above = jnp.concatenate([up_r[h - 1 : h], cur_r[: h - 1]], axis=0
                            ).astype(jnp.int32)
    below = jnp.concatenate([cur_r[1:], dn_r[0:1]], axis=0).astype(jnp.int32)
    left = jnp.concatenate([r[:, :1], r[:, : w - 1]], axis=1)
    right = jnp.concatenate([r[:, 1:], r[:, w - 1 :]], axis=1)
    ul = jnp.concatenate([above[:, :1], above[:, : w - 1]], axis=1)
    dr = jnp.concatenate([below[:, 1:], below[:, w - 1 :]], axis=1)
    dl = jnp.concatenate([below[:, :1], below[:, : w - 1]], axis=1)
    ur = jnp.concatenate([above[:, 1:], above[:, w - 1 :]], axis=1)

    # strip-local parameter planes: the param refs carry the FULL (cbh,
    # cbw) grids (a (1, cbw) block spec does not lower when cbh is not
    # the full array dim).  Column upsample rides a (cbw, w) 0/1 selector
    # MATMUL (Mosaic rejects the repeat/reshape form); rows broadcast.
    def up_px(p):
        row = p[pl.ds(i, 1), :].astype(jnp.float32)       # (1, cbw)
        px = jnp.dot(row, sel_r[:], preferred_element_type=jnp.float32)
        return jnp.broadcast_to(px.astype(jnp.int32), (h, w))

    typ_px = up_px(typ_r)
    aux_px = up_px(aux_r)
    offs_px = [up_px(o) for o in (o0_r, o1_r, o2_r, o3_r)]

    # EO neighbors for the selected class (0 H, 1 V, 2 135deg, 3 45deg)
    n0 = jnp.where(aux_px == 0, left,
         jnp.where(aux_px == 1, above,
         jnp.where(aux_px == 2, ul, dl)))
    n1 = jnp.where(aux_px == 0, right,
         jnp.where(aux_px == 1, below,
         jnp.where(aux_px == 2, dr, ur)))
    raw = 2 + jnp.sign(r - n0) + jnp.sign(r - n1)
    eidx = jnp.where(raw == 2, 0, jnp.where(raw < 2, raw + 1, raw))
    # picture-boundary exclusion (8.7.3): both neighbors must exist
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    first, last = i == 0, i == n_i - 1
    # int32-valued selects: Mosaic rejects i1-vector select operands
    # ("Unsupported target bitwidth for truncation")
    row_bad = ((first & (ys == 0)) | (last & (ys == h - 1))).astype(jnp.int32)
    col_bad = ((xs == 0) | (xs == w - 1)).astype(jnp.int32)
    row_ok = jnp.where(aux_px == 0, 1, 1 - row_bad)
    col_ok = jnp.where(aux_px == 1, 1, 1 - col_bad)
    eidx = jnp.where(row_ok * col_ok > 0, eidx, 0)
    cat_off = jnp.zeros_like(r)
    for j in range(4):
        cat_off = jnp.where(eidx == j + 1, offs_px[j], cat_off)
    band = r >> (bd - 5)
    brel = (band - aux_px) & 31
    bo_val = jnp.zeros_like(r)
    for j in range(4):
        bo_val = jnp.where(brel == j, offs_px[j], bo_val)
    delta = jnp.where(typ_px == SAO_EDGE, cat_off,
                      jnp.where(typ_px == SAO_BAND, bo_val, 0))
    # int32 store: Mosaic rejects the in-kernel 8-bit truncation
    # ("Unsupported target bitwidth"); the caller casts outside
    out_r[:] = jnp.clip(r + delta, 0, (1 << bd) - 1)


@functools.partial(jax.jit, static_argnames=("ctb", "bd", "interpret"))
def _sao_apply_pallas(rec, typ, aux, offs, *, ctb: int, bd: int = 8,
                      interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = rec.astype(jnp.int32)
    h, w = r.shape
    cbh, cbw = h // ctb, w // ctb
    typ = typ.astype(jnp.int32).reshape(cbh, cbw)
    aux = aux.astype(jnp.int32).reshape(cbh, cbw)
    offs = offs.astype(jnp.int32).reshape(cbh, cbw, 4)
    prow = pl.BlockSpec((cbh, cbw), lambda i: (0, 0))
    selspec = pl.BlockSpec((cbw, w), lambda i: (0, 0))
    strip = pl.BlockSpec((ctb, w), lambda i: (i, 0))
    strip_up = pl.BlockSpec((ctb, w), lambda i: (jnp.maximum(i - 1, 0), 0))
    strip_dn = pl.BlockSpec((ctb, w), lambda i: (jnp.minimum(i + 1, cbh - 1), 0))
    out_dtype = jnp.uint8 if bd == 8 else jnp.uint16
    kern = functools.partial(_sao_strip_kernel, ctb=ctb, bd=bd)
    # (cbw, w) 0/1 column-upsample selector for the in-kernel param matmul
    sel = jnp.asarray(np.kron(np.eye(cbw, dtype=np.float32),
                              np.ones((1, ctb), np.float32)))
    out = pl.pallas_call(
        kern,
        grid=(cbh,),
        in_specs=[prow, prow, prow, prow, prow, prow, selspec, strip,
                  strip_up, strip_dn],
        out_specs=strip,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        interpret=interpret,
    )(typ, aux, offs[..., 0], offs[..., 1], offs[..., 2], offs[..., 3],
      sel, r, r, r)
    return out.astype(out_dtype)


_PALLAS_OK: list = []  # memoized probe result


def _pallas_wanted() -> bool:
    if _os.environ.get("KVZ_TPU_NO_PALLAS"):
        return False
    if _PALLAS_OK:
        return _PALLAS_OK[0]
    try:
        # never run the probe while tracing (shard_map/jit callers):
        # materializing inside a trace would concretize tracers
        from jax._src import core as _core

        if not _core.trace_state_clean():
            return False
    except Exception:
        return False
    ok = False
    try:
        if jax.default_backend() != "cpu":
            # one-time smoke run: a failed lowering/execution on this
            # backend downgrades every sao_apply to the XLA path
            r = jnp.zeros((16, 128), jnp.int32)
            t = jnp.ones((1, 1), jnp.int32)
            a = jnp.zeros((1, 1), jnp.int32)
            o = jnp.ones((1, 1, 4), jnp.int32)
            np.asarray(_sao_apply_pallas(r, t, a, o, ctb=16))
            ok = True
    except Exception:
        ok = False
    _PALLAS_OK.append(ok)
    return ok


def sao_apply(rec, typ, aux, offs, *, ctb: int, bd: int = 8, xpad: int = 0,
              lvalid=False, rvalid=False):
    """Apply SAO to one plane.  typ/aux: (cbh, cbw); offs: (cbh, cbw, 4).

    Dispatcher: the fused Pallas strip kernel on TPU (CTB-aligned,
    unsharded planes), the XLA one-hot-select path otherwise.

    bd: sample bit depth (band classification uses the 5 MSBs, 8.7.3;
    saoOffsetVal scales by 1 << (bd - min(bd, 10)), zero for bd <= 10)."""
    h, w = rec.shape
    if (xpad == 0 and h % ctb == 0 and w % ctb == 0 and _pallas_wanted()):
        return _sao_apply_pallas(rec.astype(jnp.int32), jnp.asarray(typ),
                                 jnp.asarray(aux), jnp.asarray(offs),
                                 ctb=ctb, bd=bd)
    return _sao_apply_xla(rec, typ, aux, offs, ctb=ctb, bd=bd, xpad=xpad,
                          lvalid=lvalid, rvalid=rvalid)


@functools.partial(jax.jit, static_argnames=("ctb", "bd", "xpad"))
def _sao_apply_xla(rec, typ, aux, offs, *, ctb: int, bd: int = 8,
                   xpad: int = 0, lvalid=False, rvalid=False):
    r = rec.astype(jnp.int32)
    h, w = r.shape
    emaps = _edge_index_maps(r, xpad, lvalid, rvalid)  # (4, H, W)
    # planes need not be CTB multiples (conformance-cropped sizes): the
    # upsampled per-CTB parameter maps are cropped to the plane
    up = lambda m: jnp.repeat(jnp.repeat(m, ctb, 0), ctb, 1)[:h, :w]
    typ_px = up(typ)
    aux_px = up(aux)
    # per-pixel dynamic indexing (take_along_axis on 4/5-wide minor axes)
    # lowers to gather soup on TPU (profiled 97 ms for one 1080p plane);
    # unrolled one-hot selects are pure VPU selects instead (~100x)
    eo_idx = jnp.zeros_like(r)
    for k in range(4):
        eo_idx = jnp.where(aux_px == k, emaps[k], eo_idx)  # (H, W) in 0..4
    offs_up = [up(offs[..., j]) for j in range(4)]  # 4 x (H, W)
    cat_off = jnp.zeros_like(r)
    for j in range(4):
        cat_off = jnp.where(eo_idx == j + 1, offs_up[j], cat_off)
    # BO offset per pixel (band window wraps modulo 32)
    band = r >> (bd - 5)
    brel = (band - aux_px) & 31
    bo_val = jnp.zeros_like(r)
    for j in range(4):
        bo_val = jnp.where(brel == j, offs_up[j], bo_val)
    delta = jnp.where(typ_px == SAO_EDGE, cat_off, jnp.where(typ_px == SAO_BAND, bo_val, 0))
    return jnp.clip(r + delta, 0, (1 << bd) - 1).astype(
        jnp.uint8 if bd == 8 else jnp.uint16)


@functools.partial(jax.jit, static_argnames=("ctb", "xpad"))
def sao_decide_chroma(orig_cb, rec_cb, orig_cr, rec_cr, lam, *, ctb: int,
                      xpad: int = 0, lvalid=False, rvalid=False):
    """Joint chroma decision: type and EO class are shared between Cb and Cr
    (sao_type_idx_chroma / sao_eo_class_chroma coded once); offsets and band
    positions stay per-component.  Returns
    (typ, class_shared, aux_cb, aux_cr, offs_cb, offs_cr)."""
    st_cb = sao_statistics(orig_cb, rec_cb, ctb=ctb, xpad=xpad,
                           lvalid=lvalid, rvalid=rvalid)
    st_cr = sao_statistics(orig_cr, rec_cr, ctb=ctb, xpad=xpad,
                           lvalid=lvalid, rvalid=rvalid)

    eo_off_hi = jnp.array([7, 7, 0, 0], jnp.int32)[None, :, None, None]
    eo_off_lo = jnp.array([0, 0, -7, -7], jnp.int32)[None, :, None, None]
    o_cb, d_cb = _best_offset(st_cb["eo_sum"], st_cb["eo_cnt"], eo_off_lo, eo_off_hi)
    o_cr, d_cr = _best_offset(st_cr["eo_sum"], st_cr["eo_cnt"], eo_off_lo, eo_off_hi)
    eo_dist = (d_cb + d_cr).sum(axis=1)  # (4, cbh, cbw)
    eo_bits = 2.0 + 2.0 + (jnp.abs(o_cb) + jnp.abs(o_cr)).sum(axis=1).astype(jnp.float32)
    eo_cost = eo_dist.astype(jnp.float32) + lam * eo_bits
    cls = jnp.argmin(eo_cost, axis=0)
    best_eo_cost = jnp.min(eo_cost, axis=0)
    take = lambda o: jnp.take_along_axis(o, cls[None, None], axis=0)[0].transpose(1, 2, 0)
    eo_off_cb, eo_off_cr = take(o_cb), take(o_cr)

    def bo_plane(st):
        bo_o, bo_d = _best_offset(st["band_sum"], st["band_cnt"], -7, 7)
        win_d = jnp.stack([bo_d[k : k + 4].sum(axis=0) for k in range(29)])
        pos = jnp.argmin(win_d, axis=0)
        dist = jnp.min(win_d, axis=0)
        idx = pos[None] + jnp.arange(4)[:, None, None]
        off = jnp.take_along_axis(bo_o, idx, axis=0).transpose(1, 2, 0)
        bits = 5.0 + (jnp.abs(off).sum(axis=-1) + (off != 0).sum(axis=-1)).astype(jnp.float32)
        return pos, off, dist.astype(jnp.float32), bits

    pos_cb, boff_cb, bd_cb, bb_cb = bo_plane(st_cb)
    pos_cr, boff_cr, bd_cr, bb_cr = bo_plane(st_cr)
    bo_cost = bd_cb + bd_cr + lam * (2.0 + bb_cb + bb_cr)

    off_cost = lam * 1.0
    t_eo = best_eo_cost < jnp.minimum(bo_cost, off_cost)
    t_bo = (bo_cost < off_cost) & ~t_eo
    typ = jnp.where(t_eo, SAO_EDGE, jnp.where(t_bo, SAO_BAND, SAO_OFF)).astype(jnp.int32)
    aux_cb = jnp.where(t_eo, cls, pos_cb).astype(jnp.int32)
    aux_cr = jnp.where(t_eo, cls, pos_cr).astype(jnp.int32)
    z = jnp.zeros_like(eo_off_cb)
    offs_cb = jnp.where(t_eo[..., None], eo_off_cb, jnp.where(t_bo[..., None], boff_cb, z)).astype(jnp.int32)
    offs_cr = jnp.where(t_eo[..., None], eo_off_cr, jnp.where(t_bo[..., None], boff_cr, z)).astype(jnp.int32)
    return typ, cls.astype(jnp.int32), aux_cb, aux_cr, offs_cb, offs_cr
