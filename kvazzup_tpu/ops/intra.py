"""HEVC intra prediction (8.4.4.2) for all 35 modes, batched and TPU-first.

Design: the reference samples form one contiguous boundary walk
`A[0..4N]` = [left column bottom->top, corner, top row left->right].  Every
angular mode then becomes a *static* pair of gather-index tables plus
interpolation weights into A (the invAngle projection of 8.4.4.2.6 is
resolved at table-build time), so evaluating all 33 angular modes for a
block is a single gather + weighted-sum expression; planar and DC are small
closed forms.  Reference-sample substitution (8.4.4.2.2) is a vectorized
forward fill; the [1,2,1] smoothing filter (8.4.4.2.3) is a 1-D convolution
along A.

This replaces kvazaar's per-mode intra strategies (`intra.c` +
avx2/sse41/generic dispatch, Reconstruction group in
dependencies/kvazaar_CMakeLists.txt:207-218) with one dense formulation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from ..core.tables import INTRA_INV_ANGLE, INTRA_PRED_ANGLE, intra_hor_ver_dist_thres


def _angle(mode: int) -> int:
    return int(INTRA_PRED_ANGLE[mode - 2])


def _inv_angle(mode: int) -> int:
    return int(INTRA_INV_ANGLE[mode - 11])


def _filter_flag(mode: int, n: int, is_luma: bool) -> bool:
    """Reference smoothing decision (8.4.4.2.3)."""
    if not is_luma or mode == 1 or n == 4:
        return False
    min_dist = min(abs(mode - 26), abs(mode - 10))
    return min_dist > intra_hor_ver_dist_thres(n)


@functools.lru_cache(maxsize=None)
def _angular_tables(log2: int, is_luma: bool):
    """Static (33, N, N) index/weight tables for modes 2..34.

    Returns (I1, I2, F, use_filtered) where I1/I2 index into A (length 4N+1)
    and the prediction is ((32-F)*S[I1] + F*S[I2] + 16) >> 5 with S the
    (possibly filtered) reference walk.
    """
    n = 1 << log2
    i1 = np.zeros((33, n, n), dtype=np.int32)
    i2 = np.zeros((33, n, n), dtype=np.int32)
    fr = np.zeros((33, n, n), dtype=np.int32)
    filt = np.zeros((33,), dtype=bool)
    for mode in range(2, 35):
        m = mode - 2
        ang = _angle(mode)
        filt[m] = _filter_flag(mode, n, is_luma)
        vertical = mode >= 18
        # ref[k] in A coordinates:
        #  vertical family:   ref[k] = A[2N + k]      (k >= 0: corner/top row)
        #  horizontal family: ref[k] = A[2N - k]      (k >= 0: corner/left col)
        # negative-angle extension (k < 0) projects onto the other side:
        #  vertical:   ref[k] = A[2N - ((k*invAngle + 128) >> 8)]
        #  horizontal: ref[k] = A[2N + ((k*invAngle + 128) >> 8)]
        def ref_to_a(k: int) -> int:
            if k >= 0:
                return 2 * n + k if vertical else 2 * n - k
            proj = (k * _inv_angle(mode) + 128) >> 8
            return 2 * n - proj if vertical else 2 * n + proj

        for y in range(n):
            for x in range(n):
                # along-prediction coordinate / across coordinate
                u, v = (x, y) if vertical else (y, x)
                idx = ((v + 1) * ang) >> 5
                fact = ((v + 1) * ang) & 31
                a1 = ref_to_a(u + idx + 1)
                a2 = ref_to_a(u + idx + 2) if fact else a1
                i1[m, y, x] = a1
                i2[m, y, x] = a2
                fr[m, y, x] = fact
    assert i1.min() >= 0 and i1.max() <= 4 * n and i2.max() <= 4 * n
    return i1, i2, fr, filt  # numpy: converted to device constants at trace time


def substitute_refs(a_raw: jnp.ndarray, avail: jnp.ndarray, bd: int = 8) -> jnp.ndarray:
    """Reference sample substitution (8.4.4.2.2), vectorized forward fill.

    a_raw: (..., 4N+1) int32 gathered boundary walk (garbage where
    unavailable); avail: same-shape bool.  Fully-unavailable -> 1 << (bd-1).
    """
    ln = a_raw.shape[-1]
    idx = jnp.where(avail, jnp.arange(ln, dtype=jnp.int32), -1)
    last = jax_cummax(idx)
    first_avail = jnp.argmax(avail, axis=-1)
    first_val = jnp.take_along_axis(a_raw, first_avail[..., None], axis=-1)[..., 0]
    filled = jnp.take_along_axis(a_raw, jnp.maximum(last, 0), axis=-1)
    filled = jnp.where(last < 0, first_val[..., None], filled)
    any_avail = jnp.any(avail, axis=-1, keepdims=True)
    return jnp.where(any_avail, filled, 1 << (bd - 1))


def jax_cummax(x: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.associative_scan(jnp.maximum, x, axis=-1)


def substitute_refs_ctb(a_raw: jnp.ndarray, left: jnp.ndarray, above: jnp.ndarray,
                        above_right: jnp.ndarray, n: int, bd: int = 8) -> jnp.ndarray:
    """Reference substitution specialized to whole-CTB availability.

    Exact (8.4.4.2.2) when availability has the CTB-grid segment structure
    produced by `_gather_refs_blocks` at CTB-aligned frames: the below-left
    run is never available and each remaining segment (left column, corner,
    top row, top-right row) is available as a whole per the boolean flags.
    The generic forward-fill (associative cummax + gathers) then collapses
    to a handful of selects — profiled ~30 us/wave cheaper inside the
    encoder scan.

    a_raw: (..., 4n+1); left/above/above_right: (...,) bool.
    """
    A = a_raw
    l = left[..., None]
    a = above[..., None]
    tr = above_right[..., None]
    mid = jnp.int32(1 << (bd - 1))
    first = jnp.where(l, A[..., n : n + 1],
                      jnp.where(a, A[..., 2 * n + 1 : 2 * n + 2], mid))
    lseg = jnp.where(l, A[..., n : 2 * n], first)
    ltop = A[..., 2 * n - 1 : 2 * n]  # top-most left-column sample
    corner = jnp.where(l & a, A[..., 2 * n : 2 * n + 1],
                       jnp.where(l, ltop, first))
    tseg = jnp.where(a, A[..., 2 * n + 1 : 3 * n + 1], jnp.where(l, ltop, first))
    trseg = jnp.where(tr, A[..., 3 * n + 1 :], tseg[..., n - 1 : n])
    lbseg = jnp.broadcast_to(first, A[..., :n].shape)
    return jnp.concatenate([lbseg, lseg, corner, tseg, trseg], axis=-1)


def filter_refs(a: jnp.ndarray) -> jnp.ndarray:
    """[1,2,1]/4 smoothing along the boundary walk; endpoints unfiltered."""
    left = a[..., :-2]
    mid = a[..., 1:-1]
    right = a[..., 2:]
    f = (left + 2 * mid + right + 2) >> 2
    return jnp.concatenate([a[..., :1], f, a[..., -1:]], axis=-1)


def strong_filter_refs(a: jnp.ndarray, log2: int) -> jnp.ndarray:
    """Strong intra smoothing (8.4.4.2.3 bilinear): the 32x32 filtered walk
    becomes linear interpolations corner->corner along each side."""
    n = 1 << log2
    j = jnp.arange(2 * n + 1)
    # side A: A[0..2n] from A[0] to A[2n] (left run incl. corner)
    left = (a[0] * (2 * n - j) + a[2 * n] * j + n) >> (log2 + 1)
    # side B: A[2n..4n] from A[2n] to A[4n]
    top = (a[2 * n] * (2 * n - j) + a[4 * n] * j + n) >> (log2 + 1)
    return jnp.concatenate([left[:-1], top])


def predict_all_modes(a: jnp.ndarray, log2: int, is_luma: bool,
                      strong: bool = False, bd: int = 8) -> jnp.ndarray:
    """All 35 intra predictions from a substituted boundary walk.

    a: (4N+1,) int32.  Returns (35, N, N) int32 in [0, 255]; planar=0, DC=1,
    angular 2..34 (spec mode numbering).  strong: use the bilinear 32x32
    smoothing for the filtered walk (caller evaluates 8.4.4.2.3's
    bilIntFlag conditions).
    """
    n = 1 << log2
    af = (strong_filter_refs(a, log2) if strong else filter_refs(a)) if is_luma else a
    i1_np, i2_np, fr_np, filt_np = _angular_tables(log2, is_luma)
    i1, i2, fr = jnp.asarray(i1_np), jnp.asarray(i2_np), jnp.asarray(fr_np)
    src = jnp.stack([a, af])  # (2, 4N+1)
    sel = jnp.asarray(filt_np.astype(np.int32))  # (33,)
    s1 = src[sel[:, None, None], i1]
    s2 = src[sel[:, None, None], i2]
    angular = ((32 - fr) * s1 + fr * s2 + 16) >> 5

    top = a[2 * n + 1 : 2 * n + 1 + n]  # top row, x = 0..N-1
    left = a[2 * n - 1 : n - 1 : -1]  # left col, y = 0..N-1
    top_f = af[2 * n + 1 : 2 * n + 1 + n]
    left_f = af[2 * n - 1 : n - 1 : -1]
    corner = a[2 * n]

    # planar (8.4.4.2.4) — uses filtered refs when luma & N >= 8
    use_f = is_luma and n >= 8
    pt, pl = (top_f, left_f) if use_f else (top, left)
    tr = af[2 * n + 1 + n] if use_f else a[2 * n + 1 + n]  # p[N][-1]
    bl = af[n - 1] if use_f else a[n - 1]  # p[-1][N]
    xs = jnp.arange(n, dtype=jnp.int32)
    planar = (
        (n - 1 - xs)[None, :] * pl[:, None]
        + (xs + 1)[None, :] * tr
        + (n - 1 - xs)[:, None] * pt[None, :]
        + (xs + 1)[:, None] * bl
        + n
    ) >> (log2 + 1)

    # DC (8.4.4.2.5) — unfiltered refs
    dc = (jnp.sum(top) + jnp.sum(left) + n) >> (log2 + 1)
    dcpred = jnp.full((n, n), dc, dtype=jnp.int32)
    if is_luma and n < 32:
        row0 = (top + 3 * dc + 2) >> 2
        col0 = (left + 3 * dc + 2) >> 2
        corner_px = (left[0] + 2 * dc + top[0] + 2) >> 2
        dcpred = dcpred.at[0, :].set(row0)
        dcpred = dcpred.at[:, 0].set(col0)
        dcpred = dcpred.at[0, 0].set(corner_px)

    # pure horizontal (10) / vertical (26) boundary fix, luma & N < 32
    if is_luma and n < 32:
        m10 = angular[8]  # mode 10
        m26 = angular[24]  # mode 26
        mx = (1 << bd) - 1
        row0 = jnp.clip(left[0] + ((top - corner) >> 1), 0, mx)
        col0 = jnp.clip(top[0] + ((left - corner) >> 1), 0, mx)
        angular = angular.at[8, 0, :].set(row0)
        angular = angular.at[24, :, 0].set(col0)

    return jnp.concatenate([planar[None], dcpred[None], angular], axis=0)


def predict_mode(a: jnp.ndarray, log2: int, is_luma: bool, mode,
                 strong: bool = False, bd: int = 8) -> jnp.ndarray:
    """Prediction for a single (traced scalar) mode: evaluate-all + select.

    The dense all-modes path is what the encoder needs anyway; the decoder
    reuses it and selects.  (A dedicated single-mode kernel is a later
    optimization.)
    """
    allp = predict_all_modes(a, log2, is_luma, strong, bd=bd)
    return allp[mode]
