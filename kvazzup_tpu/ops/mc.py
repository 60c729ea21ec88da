"""Motion compensation: HEVC sub-pel interpolation (8.5.4.2).

Luma 8-tap and chroma 4-tap DCT-IF filters, two-stage (horizontal then
vertical) with the normative 14-bit intermediate domain.  Fractional parts
are traced scalars indexing the filter bank, so one compiled kernel serves
every sub-pel position.  Reference-picture edge extension is realized by
padding + MV clamp (identical semantics to the spec's coordinate clipping).

Counterpart: kvazaar `inter.c` / `ipol` strategy kernels (Reconstruction
group, dependencies/kvazaar_CMakeLists.txt:207-218).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# Table 8-11: luma interpolation coefficients per quarter-pel phase
LUMA_FILTERS = np.array(
    [
        [0, 0, 0, 64, 0, 0, 0, 0],
        [-1, 4, -10, 58, 17, -5, 1, 0],
        [-1, 4, -11, 40, 40, -11, 4, -1],
        [0, 1, -5, 17, 58, -10, 4, -1],
    ],
    dtype=np.int32,
)
# Table 8-13: chroma interpolation coefficients per eighth-pel phase
CHROMA_FILTERS = np.array(
    [
        [0, 64, 0, 0],
        [-2, 58, 10, -2],
        [-4, 54, 16, -2],
        [-6, 46, 28, -4],
        [-4, 36, 36, -4],
        [-4, 28, 46, -6],
        [-2, 16, 54, -4],
        [-2, 10, 58, -2],
    ],
    dtype=np.int32,
)

LUMA_PAD = 4  # taps reach [-3, +4] around the integer position
CHROMA_PAD = 2


def pad_reference(plane: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Edge-replicated padded reference (spec 8.5.4.2: coordinate clamping)."""
    return jnp.pad(plane.astype(jnp.int32), pad, mode="edge")


def _filt_h(window, coef):
    """window: (..., H, W+7); coef: (8,) -> (..., H, W)."""
    taps = coef.shape[0]
    w_out = window.shape[-1] - taps + 1
    acc = jnp.zeros(window.shape[:-1] + (w_out,), jnp.int32)
    for k in range(taps):
        acc = acc + coef[k] * window[..., k : k + w_out]
    return acc


def _filt_v(window, coef):
    taps = coef.shape[0]
    h_out = window.shape[-2] - taps + 1
    acc = jnp.zeros(window.shape[:-2] + (h_out,) + window.shape[-1:], jnp.int32)
    for k in range(taps):
        acc = acc + coef[k] * window[..., k : k + h_out, :]
    return acc


def mc_luma(ref_pad, x0, y0, mv_x, mv_y, size: int, width: int, height: int, pad: int):
    """Uni-directional luma prediction block, quarter-pel MV.

    ref_pad: edge-padded reference, pad >= LUMA_PAD + max MV reach.
    (x0, y0): block origin; (mv_x, mv_y): MV in quarter-pel units (traced).
    Returns (size, size) uint8-range int32.
    """
    ix = x0 + (mv_x >> 2)
    iy = y0 + (mv_y >> 2)
    fx = mv_x & 3
    fy = mv_y & 3
    # clamp integer position so all taps stay inside the padded plane —
    # matches normative coordinate clipping given edge-replicated padding
    ix = jnp.clip(ix, -pad + LUMA_PAD, width + pad - size - LUMA_PAD)
    iy = jnp.clip(iy, -pad + LUMA_PAD, height + pad - size - LUMA_PAD)
    win = jax.lax.dynamic_slice(
        ref_pad,
        (pad + iy - 3, pad + ix - 3),
        (size + 7, size + 7),
    )
    ch = jnp.asarray(LUMA_FILTERS)[fx]
    cv = jnp.asarray(LUMA_FILTERS)[fy]
    tmp = _filt_h(win, ch)  # (size+7, size), 14-bit domain (shift1=0 @8bit)
    val = _filt_v(tmp, cv) >> 6  # vertical, shift2=6
    return jnp.clip((val + 32) >> 6, 0, 255)


def mc_chroma(ref_pad, x0, y0, mv_x, mv_y, size: int, width: int, height: int, pad: int):
    """Uni-directional chroma prediction (eighth-pel; MV given in luma
    quarter-pel units -> chroma eighth-pel is the same integer value)."""
    ix = x0 + (mv_x >> 3)
    iy = y0 + (mv_y >> 3)
    fx = mv_x & 7
    fy = mv_y & 7
    ix = jnp.clip(ix, -pad + CHROMA_PAD, width + pad - size - CHROMA_PAD)
    iy = jnp.clip(iy, -pad + CHROMA_PAD, height + pad - size - CHROMA_PAD)
    win = jax.lax.dynamic_slice(
        ref_pad,
        (pad + iy - 1, pad + ix - 1),
        (size + 3, size + 3),
    )
    ch = jnp.asarray(CHROMA_FILTERS)[fx]
    cv = jnp.asarray(CHROMA_FILTERS)[fy]
    tmp = _filt_h(win, ch)
    val = _filt_v(tmp, cv) >> 6
    return jnp.clip((val + 32) >> 6, 0, 255)


def mc_luma_14bit(ref_pad, x0, y0, mv_x, mv_y, size: int, width: int, height: int, pad: int):
    """Luma prediction in the 14-bit intermediate domain (before the
    uni-pred rounding) — the operand of bi-prediction (8.5.4.2.3)."""
    ix = x0 + (mv_x >> 2)
    iy = y0 + (mv_y >> 2)
    fx = mv_x & 3
    fy = mv_y & 3
    ix = jnp.clip(ix, -pad + LUMA_PAD, width + pad - size - LUMA_PAD)
    iy = jnp.clip(iy, -pad + LUMA_PAD, height + pad - size - LUMA_PAD)
    win = jax.lax.dynamic_slice(ref_pad, (pad + iy - 3, pad + ix - 3), (size + 7, size + 7))
    ch = jnp.asarray(LUMA_FILTERS)[fx]
    cv = jnp.asarray(LUMA_FILTERS)[fy]
    tmp = _filt_h(win, ch)
    return _filt_v(tmp, cv) >> 6  # 14-bit domain


def mc_chroma_14bit(ref_pad, x0, y0, mv_x, mv_y, size: int, width: int, height: int, pad: int):
    ix = x0 + (mv_x >> 3)
    iy = y0 + (mv_y >> 3)
    fx = mv_x & 7
    fy = mv_y & 7
    ix = jnp.clip(ix, -pad + CHROMA_PAD, width + pad - size - CHROMA_PAD)
    iy = jnp.clip(iy, -pad + CHROMA_PAD, height + pad - size - CHROMA_PAD)
    win = jax.lax.dynamic_slice(ref_pad, (pad + iy - 1, pad + ix - 1), (size + 3, size + 3))
    ch = jnp.asarray(CHROMA_FILTERS)[fx]
    cv = jnp.asarray(CHROMA_FILTERS)[fy]
    tmp = _filt_h(win, ch)
    return _filt_v(tmp, cv) >> 6


def uni_round(p14):
    """14-bit -> sample domain for uni-prediction: (p + 32) >> 6, clip."""
    return jnp.clip((p14 + 32) >> 6, 0, 255)


def bi_round(p14_l0, p14_l1):
    """Default bi-prediction combine: (L0 + L1 + 64) >> 7, clip (8.5.4.2.3)."""
    return jnp.clip((p14_l0 + p14_l1 + 64) >> 7, 0, 255)


def extract_mc_neighborhoods(ref_pad, n: int, search_range: int, cw: int, ch: int,
                             pad: int, chroma: bool = False):
    """Per-CTU reference neighborhoods covering every |MV| <= search_range.

    Hoists the reference reads out of the wavefront: per-lane MC then
    selects from a small private window instead of gathering from the
    picture-sized buffer.  All window starts are static (the CTU grid), so
    extraction lowers to dense slicing.  Returns (nctu, W, W) with
    W = n + 2*range + taps span; offset of integer position (0,0) within a
    window is `mc_window_origin(search_range, chroma)`.
    """
    taps_lo, taps_hi = (1, 2) if chroma else (3, 4)
    rng = search_range // 2 if chroma else search_range
    win = n + 2 * rng + taps_lo + taps_hi
    return extract_windows_static(ref_pad, n, win, cw, ch, pad, taps_lo, rng)


def mc_window_origin(search_range: int, chroma: bool = False) -> int:
    return (search_range // 2 if chroma else search_range) + (1 if chroma else 3)


def mc_luma_window(win, mv_x, mv_y, size: int, search_range: int):
    """MC from a per-CTU neighborhood window (bit-identical to mc_luma for
    |MV| <= search_range, which the encoder guarantees).  win may be uint8
    (windows are stored compact; math happens in int32 after the slice)."""
    org = mc_window_origin(search_range, False)
    ix = org + (mv_x >> 2)
    iy = org + (mv_y >> 2)
    fx = mv_x & 3
    fy = mv_y & 3
    w = jax.lax.dynamic_slice(win, (iy - 3, ix - 3), (size + 7, size + 7)).astype(jnp.int32)
    ch = jnp.asarray(LUMA_FILTERS)[fx]
    cv = jnp.asarray(LUMA_FILTERS)[fy]
    tmp = _filt_h(w, ch)
    val = _filt_v(tmp, cv) >> 6
    return jnp.clip((val + 32) >> 6, 0, 255)


def mc_chroma_window(win, mv_x, mv_y, size: int, search_range: int):
    org = mc_window_origin(search_range, True)
    ix = org + (mv_x >> 3)
    iy = org + (mv_y >> 3)
    fx = mv_x & 7
    fy = mv_y & 7
    w = jax.lax.dynamic_slice(win, (iy - 1, ix - 1), (size + 3, size + 3)).astype(jnp.int32)
    ch = jnp.asarray(CHROMA_FILTERS)[fx]
    cv = jnp.asarray(CHROMA_FILTERS)[fy]
    tmp = _filt_h(w, ch)
    val = _filt_v(tmp, cv) >> 6
    return jnp.clip((val + 32) >> 6, 0, 255)


# --------------------------------------------------------------------------
# Gather-free batched window ops.
#
# A vmapped `dynamic_slice` with traced starts lowers to a SEQUENTIAL
# per-lane device loop on TPU (profiled: 4 nested while loops x lanes
# iterations per wavefront step = the round-1 P-frame bottleneck).  The
# batched forms below express the same selection as one-hot matmuls (MXU
# work, exact: one-hot rows x uint8 samples) + static tap arithmetic, so a
# whole wave's MC is a handful of dense ops.

def window_select_batch(wins, oy, ox, oh: int, ow: int,
                        channels_last: bool = False):
    """Batched (oh, ow) sub-window at per-lane offsets (oy, ox).

    wins: (L, Hw, Ww) integer samples (values < 2^15); oy/ox: (L,) int32.
    Exact: selection matrices are one-hot; f32 HIGHEST keeps integers
    below 2^24 exact on the MXU.

    channels_last: emit (oh, ow, L) with the batch axis MINOR — the layout
    positional sweeps want (slices on major axes, lane-parallel reductions)
    — straight out of the einsum so no separate relayout op."""
    L, Hw, Ww = wins.shape
    wf = wins.astype(jnp.float32)
    hh = jnp.arange(Hw, dtype=jnp.int32)[None, None, :]
    R = (hh == (oy[:, None] + jnp.arange(oh, dtype=jnp.int32)[None, :])[..., None])
    ww_ = jnp.arange(Ww, dtype=jnp.int32)[None, None, :]
    C = (ww_ == (ox[:, None] + jnp.arange(ow, dtype=jnp.int32)[None, :])[..., None])
    hp = jax.lax.Precision.HIGHEST
    t = jnp.einsum("lih,lhw->liw", R.astype(jnp.float32), wf, precision=hp)
    if channels_last:
        out = jnp.einsum("ljw,liw->ijl", C.astype(jnp.float32), t, precision=hp)
    else:
        out = jnp.einsum("ljw,liw->lij", C.astype(jnp.float32), t, precision=hp)
    return jnp.round(out).astype(jnp.int32)


def _phase_coeffs(frac, table):
    """(L,) phase indices -> (L, taps) int32 filter rows via one-hot."""
    tab = jnp.asarray(table, jnp.float32)
    oh = jax.nn.one_hot(frac, tab.shape[0], dtype=jnp.float32)
    return jnp.round(oh @ tab).astype(jnp.int32)


def mc_luma_window_batch_14bit(wins, mvs, size: int, search_range: int):
    """Batched luma MC in the 14-bit intermediate domain (the bi-prediction
    operand, 8.5.4.2.3) — mc_luma_14bit over per-lane windows."""
    org = mc_window_origin(search_range, False)
    ix = org + (mvs[:, 0] >> 2) - 3
    iy = org + (mvs[:, 1] >> 2) - 3
    w = window_select_batch(wins, iy, ix, size + 7, size + 7)
    cfh = _phase_coeffs(mvs[:, 0] & 3, LUMA_FILTERS)
    cfv = _phase_coeffs(mvs[:, 1] & 3, LUMA_FILTERS)
    acc = jnp.zeros((w.shape[0], size + 7, size), jnp.int32)
    for k in range(8):
        acc = acc + cfh[:, k, None, None] * w[:, :, k : k + size]
    out = jnp.zeros((w.shape[0], size, size), jnp.int32)
    for k in range(8):
        out = out + cfv[:, k, None, None] * acc[:, k : k + size, :]
    return out >> 6


def mc_luma_window_batch(wins, mvs, size: int, search_range: int):
    """Batched mc_luma_window: (L, Hw, Ww) windows, (L, 2) qpel MVs ->
    (L, size, size).  Bit-identical to mc_luma for |MV| <= 4*search_range."""
    return uni_round(mc_luma_window_batch_14bit(wins, mvs, size, search_range))


def mc_chroma_window_batch_14bit(wins, mvs, size: int, search_range: int):
    """Batched chroma MC in the 14-bit domain (bi-prediction operand)."""
    org = mc_window_origin(search_range, True)
    ix = org + (mvs[:, 0] >> 3) - 1
    iy = org + (mvs[:, 1] >> 3) - 1
    w = window_select_batch(wins, iy, ix, size + 3, size + 3)
    cfh = _phase_coeffs(mvs[:, 0] & 7, CHROMA_FILTERS)
    cfv = _phase_coeffs(mvs[:, 1] & 7, CHROMA_FILTERS)
    acc = jnp.zeros((w.shape[0], size + 3, size), jnp.int32)
    for k in range(4):
        acc = acc + cfh[:, k, None, None] * w[:, :, k : k + size]
    out = jnp.zeros((w.shape[0], size, size), jnp.int32)
    for k in range(4):
        out = out + cfv[:, k, None, None] * acc[:, k : k + size, :]
    return out >> 6


def mc_chroma_window_batch(wins, mvs, size: int, search_range: int):
    """Batched mc_chroma_window (4-tap, eighth-pel phases)."""
    return uni_round(mc_chroma_window_batch_14bit(wins, mvs, size,
                                                  search_range))


def sheared_ref_strips(ref_pad, n: int, search_range: int, ch: int,
                       pad: int, chroma: bool = False):
    """Per-lane reference strips, SHEARED so the wavefront anti-diagonal is
    axis-aligned.

    Lane k of the row-aligned wavefront (wavefront.schedule_r) always holds
    CTU row k, so its vertical MC window range is static: rows
    off + n*k .. + win of the padded reference (off = pad - range - taps_lo).
    Horizontally, wave d puts lane k at CTU column c = d - 2k, i.e. pixel
    x0 = off + n*d - 2n*k.  Placing lane k's strip at column 2n*k makes the
    window start column off + n*d — IDENTICAL for every lane — so a whole
    wave's MC windows are ONE `dynamic_slice` of this array (see
    strip_window_slice) instead of a materialized (nctu, win, win) tensor
    re-gathered into wave order (profiled ~40 ms/frame at 1080p, the
    round-2 P bottleneck).

    Returns (ch, win, 2n*(ch-1) + ref_pad.shape[1]) in ref_pad's dtype.
    """
    taps_lo, taps_hi = (1, 2) if chroma else (3, 4)
    rng = search_range // 2 if chroma else search_range
    win = n + 2 * rng + taps_lo + taps_hi
    off = pad - rng - taps_lo
    _, w = ref_pad.shape
    shear = 2 * n
    # columns are laid out so wave d's windows start at column n*d exactly:
    # lane k's strip (ref_pad cols off..w) sits at columns shear*k .. —
    # i.e. ref_pad col x maps to strip col (x - off) + shear*k
    total = shear * (ch - 1) + (w - off)
    rows = []
    for k in range(ch):
        y0 = off + n * k
        s = jax.lax.slice(ref_pad, (y0, off), (y0 + win, w))
        rows.append(jnp.pad(
            s, ((0, 0), (shear * k, total - (w - off) - shear * k))))
    return jnp.stack(rows)


def strip_window_slice(strips, d, n: int, search_range: int,
                       chroma: bool = False):
    """Wave d's per-lane MC windows from sheared strips: (lanes, win, win).

    Bit-identical to indexing the extract_mc_neighborhoods output at the
    wave's CTU indices (garbage in lanes whose CTU column is out of range —
    callers mask by wave validity, as with the pre-gathered form)."""
    taps_lo, taps_hi = (1, 2) if chroma else (3, 4)
    rng = search_range // 2 if chroma else search_range
    win = n + 2 * rng + taps_lo + taps_hi
    # strips col (off + n*d) holds padded-ref col (off + n*c) for lane k:
    # the per-lane shear 2n*k cancels the schedule's c = d - 2k skew.  The
    # `off` placement offset is already baked into the strip columns.
    lanes = strips.shape[0]
    return jax.lax.dynamic_slice(
        strips, (0, 0, n * d), (lanes, win, win))


def extract_windows_static(ref_pad, n: int, win: int, cw: int, ch: int,
                           pad: int, lo: int, rng: int):
    """(nctu, win, win) sliding windows on the static n-strided CTU grid.

    Start of CTU (r, c)'s window = (pad + n*r - rng - lo, ...) — all starts
    static, so this lowers to dense slicing (no serialized gathers).
    """
    h, w = ref_pad.shape
    off = pad - rng - lo
    rows = []
    for r in range(ch):
        y0 = off + n * r
        rows.append(jax.lax.slice(ref_pad, (y0, 0), (y0 + win, w)))
    strips = jnp.stack(rows)  # (ch, win, w)
    cols = []
    for c in range(cw):
        x0 = off + n * c
        cols.append(jax.lax.slice(strips, (0, 0, x0), (ch, win, x0 + win)))
    blocks = jnp.stack(cols, axis=1)  # (ch, cw, win, win)
    return blocks.reshape(ch * cw, win, win)
