"""Integer + half-pel motion estimation as dense frame-level passes.

TPU inversion of kvazaar's TZ/hex search (`search_inter.c`, Compression
group): data-dependent stepping becomes a static three-stage funnel —
full-search SAD at half resolution, +-2 full-pel refinement, half-pel
refinement with the normative interpolation filters — each stage one
batched tensor expression over every block of the frame.  ME reads only
the original frame and the (already final) reference picture, so it runs
*before* the CTU wavefront; only AMVP/merge resolution stays in the scan.

MV cost is approximated with an exp-Golomb-ish bit model (lambda-weighted),
the same role as kvazaar's mv cost tables.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from .mc import LUMA_FILTERS


def _block_sums(x, bs: int):
    """(H, W) -> (H/bs * W/bs,) sums per block, raster order."""
    h, w = x.shape
    return x.reshape(h // bs, bs, w // bs, bs).sum(axis=(1, 3)).reshape(-1)


def _mv_bits(v):
    """~ exp-Golomb coded length of one MV component (quarter-pel units)."""
    return 2.0 * jnp.log2(jnp.abs(v).astype(jnp.float32) + 1.0) + 1.0


def mv_valid_x(mvx_q, x0, block: int, tile_w: int, left_interior: bool,
               right_interior: bool):
    """Horizontal MCTS validity of a quarter-pel MV (kvazaar mv-constraint
    `frametile` semantics, kvazaarfilter.cpp:246-276): the full MC support
    (8-tap luma -3..+4, 4-tap chroma in luma units -4..+4) must stay inside
    the tile column [0, tile_w) at interior boundaries.  MVs with integer
    luma AND chroma phase (mvx_q % 8 == 0) read only the block itself, so
    they are exempt from the margin.  Picture-edge sides are unconstrained
    (reference padding there is normative).

    mvx_q, x0: (N,) int32 (x0 = tile-local block x in pixels).  The side
    flags may be python bools (static structure — the untiled path
    compiles to `True`) or traced booleans (the SPMD tile shard derives
    them from `lax.axis_index`); equal flag VALUES give bit-identical
    selections either way."""
    static = isinstance(left_interior, bool) and isinstance(right_interior, bool)
    if static and not (left_interior or right_interior):
        return True
    ix = mvx_q >> 2
    margin = jnp.where((mvx_q & 7) == 0, 0, 4)
    lo_ok = x0 + ix - margin >= 0
    hi_ok = x0 + ix + block + margin <= tile_w
    if static:
        ok = None
        if left_interior:
            ok = lo_ok
        if right_interior:
            ok = hi_ok if ok is None else ok & hi_ok
        return ok
    return (lo_ok | ~left_interior) & (hi_ok | ~right_interior)


@functools.partial(jax.jit, static_argnames=("block", "search_range", "width",
                                             "height", "xtile"))
def motion_search(orig_y, ref_y, lam_x1k, *, block: int = 16, search_range: int = 16,
                  width: int, height: int, xtile=(False, False), xflags=None):
    """Full-frame motion search.  orig_y/ref_y: (H, W) uint8.

    Returns (mv_qpel (nctu, 2) int32 [x, y], cost (nctu,) int32 SAD at the
    chosen MV).  MVs are clamped to +-search_range full-pel.
    """
    bs = block
    cw, ch = width // bs, height // bs
    nctu = cw * ch
    constrained = xtile[0] or xtile[1]
    x0_col = jnp.asarray(np.arange(cw, dtype=np.int32) * bs)
    x0_ctu = jnp.asarray(np.tile(np.arange(cw, dtype=np.int32) * bs, ch))
    lflag, rflag = xtile if xflags is None else xflags
    vx = functools.partial(mv_valid_x, block=bs, tile_w=width,
                           left_interior=lflag, right_interior=rflag)
    lam = lam_x1k / 1024.0
    orig = orig_y.astype(jnp.int32)
    ref = ref_y.astype(jnp.int32)

    # ---- stage 1: full search at half resolution, offsets +-R/2.
    # 2x2 averaging as MATMUL pooling: both reduce_window and strided
    # x[0::2,0::2] lower to lane-misaligned memory shuffles on this TPU
    # (profiled ~12 ms per plane at 1080p!); one-hot pooling matrices ride
    # the MXU instead.  Column pool bf16 (uint8 inputs exact), row pool f32
    # (intermediate sums up to 510 exceed bf16's 8-bit mantissa).
    h2, w2 = height // 2, width // 2
    pc2 = jnp.asarray(np.kron(np.eye(w2, dtype=np.float32),
                              np.ones((2, 1), np.float32)), jnp.bfloat16)
    pr2 = jnp.asarray(np.kron(np.eye(h2, dtype=np.float32),
                              np.ones((1, 2), np.float32)))

    def _half(x):
        t = jnp.matmul(x.astype(jnp.bfloat16), pc2,
                       preferred_element_type=jnp.float32)  # (H, w2)
        s = jnp.matmul(pr2, t, precision=jax.lax.Precision.HIGHEST)
        return (s.astype(jnp.int32) + 2) >> 2

    oh = _half(orig)
    rh = _half(ref)
    r2 = search_range // 2
    rh_pad = jnp.pad(rh, r2, mode="edge")
    side = 2 * r2 + 1
    hb = bs // 2

    # Per-position SAD block sums as MATMUL pooling: reshape-based 8x8
    # block reduction lowers to layout-shuffle soup (profiled 27 ms for the
    # 17x17 grid at 1080p); one-hot pooling matrices ride the MXU instead
    # (~1 ms).  Column pool in bf16 (|diff| <= 255, sums < 2^24: exact);
    # row pool in f32 (inputs up to 16320 exceed bf16's 8-bit mantissa).
    pool_c = jnp.asarray(np.kron(np.eye(cw, dtype=np.float32),
                                 np.ones((hb, 1), np.float32)), jnp.bfloat16)
    pool_r = jnp.asarray(np.kron(np.eye(ch, dtype=np.float32),
                                 np.ones((1, hb), np.float32)))

    def s1_row(_, dyi):
        # one traced row of the search grid; all dx shifts of a single
        # horizontal strip evaluated as one batched pooled-SAD matmul
        strip = jax.lax.dynamic_slice(rh_pad, (dyi, 0), (h2, w2 + 2 * r2))
        shifted = jnp.stack([strip[:, dxi : dxi + w2] for dxi in range(side)])
        d = jnp.abs(oh[None] - shifted).astype(jnp.bfloat16)  # (side, h2, w2)
        t = jnp.matmul(d.reshape(side * h2, w2), pool_c,
                       preferred_element_type=jnp.float32)
        t = t.reshape(side, h2, cw)
        sad = jnp.einsum("rh,shc->src", pool_r, t,
                         precision=jax.lax.Precision.HIGHEST)  # (side, ch, cw)
        return None, sad.astype(jnp.int32)

    _, sads = jax.lax.scan(s1_row, None, jnp.arange(side, dtype=jnp.int32))
    # sads: (side_dy, side_dx, ch, cw); add the lambda-weighted MV bits and
    # pick the arg-min over the whole grid in one reduction
    dxy = jnp.arange(side, dtype=jnp.int32) - r2
    mvb = lam * (_mv_bits(8 * dxy)[None, :] + _mv_bits(8 * dxy)[:, None])
    cost = sads * 4 + mvb[..., None, None].astype(jnp.int32)
    if constrained:
        v1 = vx((8 * dxy)[:, None], x0_col[None, :])  # (side_dx, cw)
        cost = jnp.where(v1[None, :, None, :], cost, 1 << 29)
    flat = cost.reshape(side * side, nctu)
    best_i = jnp.argmin(flat, axis=0)
    best_cost = jnp.take_along_axis(flat, best_i[None], axis=0)[0]
    best_mv = jnp.stack([2 * (best_i % side - r2), 2 * (best_i // side - r2)],
                        axis=1)

    # ---- stage 2: +-2 full-pel refinement around stage-1 MV, per block.
    # Per-CTU static windows cover the whole +-R reach; MV-dependent
    # sub-windows come from gather-free one-hot selects (ops/mc.py).
    #
    # LAYOUT: everything below runs CHANNELS-LAST — (win_i, win_j, nctu)
    # with the block axis minor.  The position sweeps slice the MAJOR axes
    # (free) and reduce over them with the block axis riding the vector
    # lanes; the (nctu, 20, 20) layout this replaces burned ~7 ms/frame in
    # lane shuffles at 1080p (minor dims 16/20 vs the 128-lane tile).
    from .mc import extract_windows_static, window_select_batch

    # One select serves BOTH refinement stages: the per-CTU winS extraction
    # fuses into its one-hot-select consumer, and that fused extraction —
    # not the matmul — is the dominant cost (~3.7 ms/einsum at 1080p), so
    # stage 2 and the fractional sweep share a single (bs+12)^2 window
    # around the stage-1 anchor; stage 3's +-2 re-anchor becomes ten masked
    # shift-adds (below) instead of a second select.  The winS side stays
    # at bs+2(R+4) — wider sources trip a 6x-slower XLA layout (measured:
    # 28-from-60 select 32 ms vs 28-from-56 5.5 ms) — so the anchor is
    # clamped to +-(R-2); the +-2 refine still reaches +-R.
    pad2 = search_range + 4
    ref_pad8 = jnp.pad(ref_y, pad2, mode="edge")  # uint8: compact windows
    orig_t = orig.reshape(ch, bs, cw, bs).transpose(1, 3, 0, 2).reshape(bs, bs, nctu)

    win_side = bs + 2 * (search_range + 4)
    winS = extract_windows_static(ref_pad8, bs, win_side, cw, ch, pad2, 4, search_range)
    org_s = search_range + 4  # static-window offset of the block origin

    best_mv = jnp.clip(best_mv, -(search_range - 2), search_range - 2)
    win23 = window_select_batch(
        winS, best_mv[:, 1] + org_s - 6, best_mv[:, 0] + org_s - 6,
        bs + 12, bs + 12, channels_last=True)
    best_cost = jnp.full((nctu,), 1 << 30, jnp.int32)
    best_d = jnp.zeros((nctu, 2), jnp.int32)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            cand = win23[6 + dy : 6 + dy + bs, 6 + dx : 6 + dx + bs, :]
            sad = jnp.abs(orig_t - cand).sum(axis=(0, 1))
            mvx = 4 * (best_mv[:, 0] + dx)
            mvy = 4 * (best_mv[:, 1] + dy)
            cost = sad + (lam * (_mv_bits(mvx) + _mv_bits(mvy))).astype(jnp.int32)
            if constrained:
                cost = jnp.where(vx(mvx, x0_ctu), cost, 1 << 30)
            better = cost < best_cost
            best_cost = jnp.where(better, cost, best_cost)
            best_d = jnp.where(better[:, None], jnp.array([dx, dy], jnp.int32)[None, :], best_d)
    # full-pel, clamped to R-1 so the sub-pel refinement (up to +3 qpel)
    # stays within the |MV| <= 4R window contract of ops/mc.py windows
    int_mv = jnp.clip(best_mv + best_d, -(search_range - 1), search_range - 1)

    # ---- stages 3+4 fused: fractional refinement as ONE static 7x7
    # sweep.  Every (sx, sy) in [-3, 3]^2 qpel around the integer anchor is
    # a static phase + static shift into the shared windows, so the whole
    # half+quarter search is evaluate-all-then-select — a SUPERSET of the
    # hierarchical half-then-quarter ladder (kvazaar search_inter.c), at
    # lower cost: horizontal filter passes are computed once per sx phase
    # (7 passes) instead of once per position (49), and the half-pel
    # stage's 9 extra interpolations disappear entirely (TPU ablation:
    # dense ME was 23 ms of the 54 ms 1080p P frame).
    #
    # win3 = the (bs+8)^2 window around int_mv, re-anchored from win23 by
    # the stage-2 shift d = int_mv - best_mv via masked shift-adds (d is
    # one of 5 values per axis; slices are on MAJOR axes, channels-last).
    sh = int_mv - best_mv  # (nctu, 2) in [-2, 2]
    rows3 = jnp.zeros((bs + 8, bs + 12, nctu), jnp.int32)
    for s in range(5):
        rows3 = rows3 + jnp.where((sh[:, 1] == s - 2)[None, None, :],
                                  win23[s : s + bs + 8, :, :], 0)
    win3 = jnp.zeros((bs + 8, bs + 8, nctu), jnp.int32)
    for s in range(5):
        win3 = win3 + jnp.where((sh[:, 0] == s - 2)[None, None, :],
                                rows3[:, s : s + bs + 8, :], 0)
    qx = 4 * int_mv[:, 0]
    qy = 4 * int_mv[:, 1]

    def horiz_at(sx: int):
        """Horizontal 8-tap pass at qpel offset sx (all rows kept)."""
        ox = 4 + (sx >> 2)
        fx = sx & 3
        w = win3
        if fx == 0:
            return w[:, ox : ox + bs, :] * 64
        cf = LUMA_FILTERS[fx]
        acc = jnp.zeros((w.shape[0], bs, nctu), jnp.int32)
        for k in range(8):
            acc = acc + int(cf[k]) * w[:, ox - 3 + k : ox - 3 + k + bs, :]
        return acc

    # integer-position seed
    cand0 = win3[4 : 4 + bs, 4 : 4 + bs, :]
    best_cost_q = jnp.abs(orig_t - cand0).sum(axis=(0, 1)) + (
        lam * (_mv_bits(qx) + _mv_bits(qy))
    ).astype(jnp.int32)
    if constrained:
        best_cost_q = jnp.where(vx(qx, x0_ctu), best_cost_q, 1 << 30)
    best_mv_q = jnp.stack([qx, qy], axis=1)
    for sx in range(-3, 4):
        horiz = horiz_at(sx)
        for sy in range(-3, 4):
            if sx == 0 and sy == 0:
                continue  # integer position already seeded
            oy = 4 + (sy >> 2)
            fy = sy & 3
            if fy == 0:
                pred = jnp.clip((horiz[oy : oy + bs, :, :] + 32) >> 6, 0, 255)
            else:
                cf = LUMA_FILTERS[fy]
                acc = jnp.zeros((bs, bs, nctu), jnp.int32)
                for k in range(8):
                    acc = acc + int(cf[k]) * horiz[oy - 3 + k : oy - 3 + k + bs, :, :]
                pred = jnp.clip(((acc >> 6) + 32) >> 6, 0, 255)
            sad = jnp.abs(orig_t - pred).sum(axis=(0, 1))
            mvx = qx + sx
            mvy = qy + sy
            cost = sad + (lam * (_mv_bits(mvx) + _mv_bits(mvy))).astype(jnp.int32)
            if constrained:
                cost = jnp.where(vx(mvx, x0_ctu), cost, 1 << 30)
            better = cost < best_cost_q
            best_cost_q = jnp.where(better, cost, best_cost_q)
            best_mv_q = jnp.where(better[:, None], jnp.stack([mvx, mvy], axis=1),
                                  best_mv_q)

    if constrained:
        # zero-MV fallback: the stage-2 clip can in rare corners land on an
        # invalid anchor; (0, 0) is always MCTS-valid.
        ref_t = ref.reshape(ch, bs, cw, bs).transpose(1, 3, 0, 2).reshape(
            bs, bs, nctu)
        sad0 = jnp.abs(orig_t - ref_t).sum(axis=(0, 1)) + (
            2.0 * lam).astype(jnp.int32)
        ok = vx(best_mv_q[:, 0], x0_ctu)
        best_mv_q = jnp.where(ok[:, None], best_mv_q, 0)
        best_cost_q = jnp.where(ok, best_cost_q, sad0)
    return best_mv_q, best_cost_q
