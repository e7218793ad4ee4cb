"""Pallas TPU kernels for the SETTLS interpolation hot path.

Why these kernels exist: the reference's inner loop is a full-grid scipy
``map_coordinates`` per wind component per SETTLS iteration
(/root/reference/LCS/tools.py:26-41) — a data-dependent gather.  XLA's TPU
gather lowers to a scalar-unit loop (~10M elements/s measured on v5e —
~100ms per 1M-parcel evaluation, 100x off the <1s/field budget) and Mosaic
has no vectorised in-VMEM gather.  The gather is reformulated as **windowed
one-hot matmuls on the MXU**:

* parcels are processed in (8, 128) home-grid tiles; departure positions of
  a tile cluster spatially (smooth flow), so the tile's spline taps fit a
  (WY, WX) window of a wrap-padded copy of the field;
* per-tile window offsets are **precomputed in XLA** (vectorised
  fold/unwrap/min over tiles) and fed through scalar prefetch; the windows
  themselves are pipelined kernel *inputs* via ``pl.Element``-indexed
  BlockSpecs, so Pallas double-buffers the HBM→VMEM window streams behind
  compute — no in-kernel DMA waits;
* per home row, the 4x4-tap evaluation is ``D = OneHot_y @ Win`` (one
  (128, WY) x (WY, WX) MXU matmul per field) followed by a lane reduction
  against ``OneHot_x``;
* scipy's ``mode='wrap'`` fold (period n-1, SURVEY.md quirk Q4) plus
  mirror-at-edge tap semantics are reproduced exactly: positions are
  unwrapped mod n around each tile's anchor (wrap-straddling tiles stay
  compact; aliasing is harmless because the padded operand repeats with
  period n), and the mirrored edge-tap collisions are fixed by in-kernel
  offset remaps;
* **polar bands**: within ``polar_band`` tile rows of either pole the
  zonal displacement is metric-amplified by 1/cos(lat)
  (/root/reference/LCS/trajectory.py:56), so a tile's x-taps can span the
  whole circle; those rows re-run through a full-x variant (offsets taken
  directly in folded space — overflow-free in x by construction);
* any remaining window overflow clamps the offending taps and raises the
  ``overflow`` output flag.

The order-1/'constant' pole-home-row path (/root/reference/LCS/tools.py:
31-39) applies to the ``order`` home rows nearest each pole and runs in a
third small kernel with direct (unfolded) indices.

Numerics: weights/taps match ops/interp.py exactly; matmuls run at
``Precision.HIGHEST`` (default-precision bf16 rounding of the one-hot
weights costs ~1e-2; HIGHEST restores ~1e-4-absolute f32 agreement).
Verified bit-identical to the jnp path in f64 interpret mode.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pad_coeffs_for_pallas", "pallas_interp_multi"]

TILE_R = 8      # home rows per tile
TILE_C = 128    # home cols per tile
_HIGH = jax.lax.Precision.HIGHEST


def _dot_f32x3(a, b, cdt):
    """f32-accurate matmul in 3 bf16 MXU passes (hi/lo operand split).

    Mosaic's default f32 dot is a single bf16 pass (~1e-2 error — fatal for
    interpolation weights) and ``Precision.HIGHEST`` costs 6 passes; the
    DotAlgorithmPreset x3 algorithms don't lower.  This manual split gets
    ~1e-7 relative accuracy at half the HIGHEST cost.  Falls back to a
    HIGHEST dot for non-f32 compute dtypes (f64 interpret-mode tests).
    """
    if cdt != jnp.float32:
        return jnp.dot(a, b, preferred_element_type=cdt, precision=_HIGH)
    a_hi = a.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    d = jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
    d = d + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32)
    d = d + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
    return d


def _cdiv(a, b):
    return -(-a // b)


def pad_coeffs_for_pallas(coeffs: jax.Array):
    """Wrap-pad the coefficient field for the kernels' windows.

    ``coeffs``: (..., ny, nx) → (..., nyp, nxp), both axes padded
    periodically **with period n** (index j holds row/col ``j mod n``).
    Pad widths are ``n//2`` (the unwrap's maximum excursion) plus
    (8, 128)-alignment slop plus tap margins, so a window start can never
    be clipped away from its tile's taps.  Both pads are themselves
    multiples of the respective alignment (8 rows, 128 lanes): the polar
    full-x pass feeds ``xpad`` directly through a
    ``pl.multiple_of(..., 128)``-asserted index map, so a misaligned pad
    would be undefined behaviour for Mosaic's Element-indexed DMA.
    """
    ny, nx = coeffs.shape[-2], coeffs.shape[-1]
    ypad = -(-(ny // 2 + 16) // 8) * 8
    xpad = -(-(nx // 2 + 8) // 128) * 128 + 2 * 128

    def wrap_pad(a, axis, pad, n):
        idx = np.arange(-pad, n + pad) % n
        return jnp.take(a, jnp.asarray(idx), axis=axis)

    t = wrap_pad(coeffs, coeffs.ndim - 2, ypad, ny)
    t = wrap_pad(t, coeffs.ndim - 1, xpad, nx)
    return t


def _fold(x, n):
    """scipy map_coordinates mode='wrap' coordinate fold: period n-1
    (ops/interp.py semantics, quirk Q4)."""
    sz = float(n - 1)
    neg = x + sz * (jnp.floor(-x / sz) + 1.0)
    pos = x - sz * jnp.floor(x / sz)
    return jnp.where(x < 0, neg, jnp.where(x > sz, pos, x))


def _unwrap(fold_c, anchor, n):
    """Tile-anchored mod-n unwrap: same fractional parts, compact spread."""
    return anchor + jnp.mod(fold_c - anchor + 0.5 * n, float(n)) - 0.5 * n


def _cubic_w(t):
    one = 1.0 - t
    w0 = one * one * one / 6.0
    w1 = 2.0 / 3.0 - t * t + 0.5 * t * t * t
    w2 = 2.0 / 3.0 - one * one + 0.5 * one * one * one
    w3 = t * t * t / 6.0
    return (w0, w1, w2, w3)


def _tap_offsets_and_weights(fold_c, u, base, n, order):
    """Window-relative tap offsets (with exact mirror remaps) + weights.

    ``fold_c``: folded coordinate (period n-1, in [0, n-1]); ``u``: the
    unwrapped coordinate (≡ fold_c mod n, same fractional part); ``base``:
    window start in unwrapped index space.  The padded operand repeats with
    period n, so an in-range folded tap t is correct at any offset
    o ≡ t (mod n); the mirrored edge taps are fixed by:

      * fold < 1       : tap k=-1 mirrors -1→1    → use k=+1's offset
      * floor == n-2   : tap k=+2 mirrors n→n-2   → use k= 0's offset
      * floor == n-1   : tap k=+1 mirrors n→n-2   → use k=-1's offset
                         tap k=+2 mirrors n+1→n-3 → use k=-1's offset - 1
    """
    fu = jnp.floor(u)
    t = u - fu
    ff = jnp.floor(fold_c)
    o0 = fu.astype(jnp.int32) - base
    if order == 1:
        hi = ff >= n - 1
        off1 = jnp.where(hi, o0 - 1, o0 + 1)
        return [(o0, 1.0 - t), (off1, t)]
    w = _cubic_w(t)
    lo = fold_c < 1.0
    hi2 = ff == n - 2
    hi1 = ff >= n - 1
    off_m1 = jnp.where(lo, o0 + 1, o0 - 1)
    off_p1 = jnp.where(hi1, o0 - 1, o0 + 1)
    off_p2 = jnp.where(hi1, o0 - 2, jnp.where(hi2, o0, o0 + 2))
    return [(off_m1, w[0]), (o0, w[1]), (off_p1, w[2]), (off_p2, w[3])]


def _tile_window_starts(fold_t, n, pad, w, tile_r, tile_c, align):
    """Per-tile aligned window starts, vectorised over all tiles (XLA).

    ``fold_t``: folded coordinates (nyt, nxt).  Returns int32 (gy, gx)
    offsets in PADDED element space (multiples of ``align``).
    """
    nyt, nxt = fold_t.shape
    gy, gx = nyt // tile_r, nxt // tile_c
    tiles = fold_t.reshape(gy, tile_r, gx, tile_c)
    anchor = tiles[:, 0, :, 0][:, None, :, None]
    u = _unwrap(tiles, anchor, n)
    mn = jnp.min(jnp.floor(u), axis=(1, 3)).astype(jnp.int32) - 3
    start = jnp.clip(mn, -pad, n + pad - w)
    return ((start + pad) // align) * align  # padded-space, aligned


def _bspline3(s):
    """Cubic B-spline basis evaluated at lane distances ``s``: the 4 tap
    weights w0..w3 of ops/interp.py are exactly B3 at s = lane - (o0+t)."""
    a = jnp.abs(s)
    near = (4.0 - 6.0 * a * a + 3.0 * a * a * a) / 6.0
    t2 = 2.0 - a
    far = t2 * t2 * t2 / 6.0
    return jnp.where(a <= 1.0, near, jnp.where(a < 2.0, far, 0.0))


def _tent(s):
    """Linear B-spline (order-1 weights)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(s))


def _onehot_direct(pos_rel, iota, order):
    """Weight matrix (TILE_C, W): the spline basis evaluated at each lane's
    distance from the interpolation point — one fused pass instead of one
    compare/select per tap.  Valid where no mirror remap applies."""
    s = iota.astype(pos_rel.dtype) - pos_rel[:, None]
    return _bspline3(s) if order == 3 else _tent(s)


def _remap_corrections(ohw, fold_r, u_r, base, n, iota, order):
    """Move edge-tap weight mass per the mirror remaps (rare; see
    _tap_offsets_and_weights).  ``fold_r``/``u_r``: one row's (TILE_C,)
    coordinates.  Returns the corrected weight matrix."""
    fu = jnp.floor(u_r)
    t = u_r - fu
    ff = jnp.floor(fold_r)
    o0 = (fu.astype(jnp.int32) - base)[:, None]
    if order == 1:
        hi = (ff >= n - 1)[:, None]
        w1 = t[:, None]
        d = jnp.where(hi & (iota == o0 + 1), -w1, 0.0) \
            + jnp.where(hi & (iota == o0 - 1), w1, 0.0)
        return ohw + d
    w = _cubic_w(t)
    lo = (fold_r < 1.0)[:, None]
    hi2 = (ff == n - 2)[:, None]
    hi1 = (ff >= n - 1)[:, None]
    w0 = w[0][:, None]
    w2 = w[2][:, None]
    w3 = w[3][:, None]
    d = jnp.where(lo & (iota == o0 - 1), -w0, 0.0) \
        + jnp.where(lo & (iota == o0 + 1), w0, 0.0) \
        + jnp.where(hi2 & (iota == o0 + 2), -w3, 0.0) \
        + jnp.where(hi2 & (iota == o0), w3, 0.0) \
        + jnp.where(hi1 & (iota == o0 + 1), -w2, 0.0) \
        + jnp.where(hi1 & (iota == o0 - 1), w2, 0.0) \
        + jnp.where(hi1 & (iota == o0 + 2), -w3, 0.0) \
        + jnp.where(hi1 & (iota == o0 - 2), w3, 0.0)
    return ohw + d


def _spline_body(py, px, win, out_ref, write_flag, scratch, y0, x0, *,
                 F, ny, nx, y_min, y_max, x_min, x_max, WY, WX, order,
                 x_full: bool):
    """Shared spline evaluation body.  ``y0``/``x0``: window starts in
    unpadded index space; with ``x_full`` the x offsets come directly from
    folded space (base 0) and cannot overflow."""
    dtype = out_ref.dtype
    cdt = py.dtype
    yi = ny * (py - y_min) / (y_max - y_min)
    xi = nx * (px - x_min) / (x_max - x_min)
    yfold = _fold(yi, ny)
    xfold = _fold(xi, nx)
    yu = _unwrap(yfold, yfold[0, 0], ny)
    xu = xfold if x_full else _unwrap(xfold, xfold[0, 0], nx)
    ytaps = _tap_offsets_and_weights(yfold, yu, y0, ny, order)
    xtaps = _tap_offsets_and_weights(xfold, xu, x0, nx, order)

    over = jnp.zeros((), jnp.int32)
    for off, _ in ytaps:
        over = over | jnp.any((off < 0) | (off >= WY)).astype(jnp.int32)
    if not x_full:
        for off, _ in xtaps:
            over = over | jnp.any((off < 0) | (off >= WX)).astype(jnp.int32)
    write_flag(over)

    # edge-remap predicates, per tile (rare: folded coords within one cell
    # of the domain edges) — the direct basis build is exact elsewhere
    y_edge = jnp.any((yfold < 1.0) | (jnp.floor(yfold) >= ny - 2))
    x_edge = jnp.any((xfold < 1.0) | (jnp.floor(xfold) >= nx - 2))
    # window-relative positions (offsets already clamped into the window by
    # the flag contract; clamp keeps the basis evaluation in-range too)
    ypos = jnp.clip(yu - y0, 0.0, WY - 1.0)
    xpos = jnp.clip(xu - x0, 0.0, WX - 1.0)

    iota_y = jax.lax.broadcasted_iota(jnp.int32, (TILE_C, WY), 1)
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (TILE_C, WX), 1)

    # static row unroll, but each row's result is stored into the scratch
    # ref immediately — the sequential ref dependency lets Mosaic reuse the
    # (TILE_C, WX)-sized intermediates instead of keeping 8 x F of them
    # live (which blows the 16MB VMEM budget at full-x window widths)
    for r in range(TILE_R):
        ohy = _onehot_direct(ypos[:, r], iota_y, order)
        ohy = jax.lax.cond(
            y_edge,
            lambda o: _remap_corrections(o, yfold[:, r], yu[:, r], y0, ny,
                                         iota_y, order),
            lambda o: o, ohy)
        ohx = _onehot_direct(xpos[:, r], iota_x, order)
        ohx = jax.lax.cond(
            x_edge,
            lambda o: _remap_corrections(o, xfold[:, r], xu[:, r], x0, nx,
                                         iota_x, order),
            lambda o: o, ohx)
        for f in range(F):
            # HIGHEST (6-pass bf16): the 3-pass hi/lo split's ~2^-16
            # relative error compounds over 576 evaluations to ~0.06
            # log-FTLE p99 — measured, not acceptable for parity
            d = jnp.dot(ohy, win[f].astype(cdt),
                        preferred_element_type=cdt, precision=_HIGH)
            scratch[f, :, r] = jnp.sum(d * ohx, axis=1).astype(dtype)
    for f in range(F):
        out_ref[f] = scratch[f].T    # (TILE_R, TILE_C)


def _interp_kernel(y0s, x0s, py_ref, px_ref, win_ref, out_ref, flag_ref,
                   scratch, *, F, ny, nx, y_min, y_max, x_min, x_max, WY,
                   WX, YPAD, XPAD, order, row_base, x_full):
    i = pl.program_id(0)
    j = pl.program_id(1)
    y0 = y0s[i + row_base, j] - YPAD
    x0 = jnp.zeros((), jnp.int32) if x_full else x0s[i + row_base, j] - XPAD

    def write_flag(v):
        flag_ref[i, j] = v

    _spline_body(py_ref[:].T, px_ref[:].T, win_ref, out_ref, write_flag,
                 scratch, y0, x0, F=F, ny=ny, nx=nx, y_min=y_min,
                 y_max=y_max, x_min=x_min, x_max=x_max, WY=WY, WX=WX,
                 order=order, x_full=x_full)


def _retry_kernel(iy, jx, iy_out, y0s, x0s, py_ref, px_ref, win_ref,
                  out_ref, flag_ref, scratch, *, F, ny, nx, y_min, y_max,
                  x_min, x_max, WY, WX, YPAD, XPAD, order):
    i = pl.program_id(0)
    y0 = y0s[i] - YPAD
    x0 = x0s[i] - XPAD

    def write_flag(v):
        flag_ref[i, 0] = v

    _spline_body(py_ref[:].T, px_ref[:].T, win_ref, out_ref, write_flag,
                 scratch, y0, x0, F=F, ny=ny, nx=nx,
                 y_min=y_min, y_max=y_max, x_min=x_min, x_max=x_max,
                 WY=WY, WX=WX, order=order, x_full=False)


def _pole_kernel(rows_ref, yw0s, py_ref, px_ref, win_ref, out_ref, flag_ref,
                 scratch, *, F, ny, nx, nx_t, x_min, x_max, y_min, y_max,
                 WYC):
    """Order-1 mode='constant' evaluation for pole-home-row tiles
    (/root/reference/LCS/tools.py:31-39): direct (unfolded) indices,
    out-of-range → 0, full-x window."""
    dtype = out_ref.dtype
    py = py_ref[:].T
    px = px_ref[:].T
    cdt = py.dtype
    yi = ny * (py - y_min) / (y_max - y_min)
    xi = nx * (px - x_min) / (x_max - x_min)
    in_range = (yi >= 0) & (yi <= ny - 1) & (xi >= 0) & (xi <= nx - 1)
    y0f = jnp.clip(jnp.floor(yi), 0, ny - 2)
    x0f = jnp.clip(jnp.floor(xi), 0, nx - 2)
    ty = (yi - y0f).astype(cdt)
    tx = (xi - x0f).astype(cdt)

    yw0 = yw0s[pl.program_id(0), pl.program_id(1)]
    oy_raw = y0f.astype(jnp.int32) - yw0
    flag_ref[pl.program_id(0), pl.program_id(1)] = jnp.any(
        (oy_raw < 0) | (oy_raw > WYC - 2)).astype(jnp.int32)
    oy = jnp.clip(oy_raw, 0, WYC - 2)
    ox = x0f.astype(jnp.int32)

    iota_y = jax.lax.broadcasted_iota(jnp.int32, (TILE_C, WYC), 1)
    iota_x = jax.lax.broadcasted_iota(jnp.int32, (TILE_C, nx_t), 1)

    for r in range(TILE_R):
        o_y = oy[:, r][:, None]
        w_y = ty[:, r][:, None]
        ohy = jnp.where(iota_y == o_y, 1.0 - w_y, 0.0) \
            + jnp.where(iota_y == o_y + 1, w_y, 0.0)
        o_x = ox[:, r][:, None]
        w_x = tx[:, r][:, None]
        ohx = jnp.where(iota_x == o_x, 1.0 - w_x, 0.0) \
            + jnp.where(iota_x == o_x + 1, w_x, 0.0)
        mask = in_range[:, r]
        for f in range(F):
            d = jnp.dot(ohy, win_ref[f].astype(cdt),
                        preferred_element_type=cdt, precision=_HIGH)
            val = jnp.sum(d * ohx, axis=1)
            scratch[f, :, r] = jnp.where(mask, val, 0.0).astype(dtype)
    for f in range(F):
        out_ref[f] = scratch[f].T


def pallas_interp_multi(raw: jax.Array, cw_pad: jax.Array,
                        px: jax.Array, py: jax.Array, *,
                        ny: int, nx: int, y_min, y_max, x_min, x_max,
                        order: int = 3, wy: int = 48, wx: int = 384,
                        wyc: int = 192, polar_band: int = 2,
                        retry_tiles: int = 128, retry_wy: int = 192,
                        retry_wx: int = 768, interpret: bool = False,
                        debug_flags: bool = False):
    """Evaluate F stacked fields at parcel positions — the TPU fast path.

    ``raw``: (F, ny, nx) raw fields (pole-home path); ``cw_pad``: padded
    coefficients from :func:`pad_coeffs_for_pallas` (pass padded raw fields
    for order 1); ``px``/``py``: (ny, nx) positions; ``polar_band``: tile
    rows per pole routed through the overflow-free full-x variant.
    Returns ``(out (F, ny, nx), overflow int32 scalar)``.
    """
    F = raw.shape[0]
    ny_t = _cdiv(ny, TILE_R) * TILE_R
    nx_t = _cdiv(nx, TILE_C) * TILE_C
    gy, gx = ny_t // TILE_R, nx_t // TILE_C
    dtype = raw.dtype
    ypad = (cw_pad.shape[-2] - ny) // 2
    xpad = (cw_pad.shape[-1] - nx) // 2
    if ny + 2 * ypad < wy or nx + 2 * xpad < wx:
        raise ValueError(f"window ({wy},{wx}) exceeds padded field "
                         f"({ny + 2 * ypad},{nx + 2 * xpad})")
    polar_band = min(polar_band, gy // 2)
    wx_full = nx_t + 128   # full-x slab: covers folded taps up to nx+1

    def pad_pos(p):
        return jnp.pad(p, ((0, ny_t - ny), (0, nx_t - nx)), mode="edge")

    pyt = pad_pos(py)
    pxt = pad_pos(px)

    # --- precompute per-tile window starts in XLA (padded space, aligned)
    yi = ny * (pyt - y_min) / (y_max - y_min)
    xi = nx * (pxt - x_min) / (x_max - x_min)
    yfold = _fold(yi, ny)
    xfold = _fold(xi, nx)
    y0s = _tile_window_starts(yfold, ny, ypad, wy, TILE_R, TILE_C, 8)
    x0s = _tile_window_starts(xfold, nx, xpad, wx, TILE_R, TILE_C, 128)

    common = dict(F=F, ny=ny, nx=nx, y_min=float(y_min), y_max=float(y_max),
                  x_min=float(x_min), x_max=float(x_max), order=order)
    pos_spec = pl.BlockSpec((TILE_R, TILE_C), lambda i, j, *_: (i, j),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((F, TILE_R, TILE_C), lambda i, j, *_: (0, i, j),
                            memory_space=pltpu.VMEM)

    def win_spec(wy_, wx_, row_base):
        def imap(i, j, y0ref, x0ref):
            return (0, pl.multiple_of(y0ref[i + row_base, j], 8),
                    pl.multiple_of(x0ref[i + row_base, j], 128))
        return pl.BlockSpec((pl.Element(F), pl.Element(wy_), pl.Element(wx_)),
                            imap, memory_space=pltpu.VMEM)

    def run_spline(row_base, rows, wx_, x_full):
        grid = (rows, gx)
        kern = partial(_interp_kernel, **common, WY=wy, WX=wx_,
                       YPAD=ypad, XPAD=xpad, row_base=row_base,
                       x_full=x_full)
        if x_full:
            x0z = jnp.full_like(x0s, xpad)  # slab starts at real col 0
        else:
            x0z = x0s
        gridspec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_R, TILE_C),
                             lambda i, j, *_: (i + row_base, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_R, TILE_C),
                             lambda i, j, *_: (i + row_base, j),
                             memory_space=pltpu.VMEM),
                win_spec(wy, wx_, row_base)],
            out_specs=[pl.BlockSpec((F, TILE_R, TILE_C),
                                    lambda i, j, *_: (0, i + row_base, j),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec(grid, lambda i, j, *_: (0, 0),
                                    memory_space=pltpu.SMEM)],
            scratch_shapes=[pltpu.VMEM((F, TILE_C, TILE_R), dtype)],
        )
        return pl.pallas_call(
            kern, grid_spec=gridspec,
            out_shape=[jax.ShapeDtypeStruct((F, ny_t, nx_t), dtype),
                       jax.ShapeDtypeStruct(grid, jnp.int32)],
            interpret=interpret,
        )(y0s, x0z, pyt, pxt, cw_pad)

    mid_rows = gy - 2 * polar_band
    flag_map = jnp.zeros((gy, gx), jnp.int32)
    if mid_rows > 0:
        out_arr, flags_mid = run_spline(polar_band, mid_rows, wx, False)
        flag_map = flag_map.at[polar_band:gy - polar_band].set(flags_mid)
    else:
        out_arr = jnp.zeros((F, ny_t, nx_t), dtype)

    if polar_band > 0:
        row = jax.lax.broadcasted_iota(jnp.int32, (ny_t, nx_t), 0)
        for base in (0, gy - polar_band):
            p_out, p_flags = run_spline(base, polar_band, wx_full, True)
            flag_map = flag_map.at[base:base + polar_band].set(p_flags)
            lo = base * TILE_R
            hi = (base + polar_band) * TILE_R
            in_band = (row >= lo) & (row < hi)
            out_arr = jnp.where(in_band[None], p_out, out_arr)

    overflow = jnp.zeros((), jnp.int32)

    # ---- adaptive retry (pass B): re-run flagged tiles with a tall window
    # and the overflow-free full-x variant.  FTLE flows shear chaotically —
    # stretched tiles are expected, not exceptional (stretching IS the
    # signal), so correctness cannot rely on the pass-A windows alone.
    retry_tiles = min(retry_tiles, gy * gx)
    if retry_tiles > 0:
        wy2 = min(retry_wy, ny + 2 * ypad)
        wx2 = min(retry_wx, nx + 2 * xpad)
        y0b = _tile_window_starts(yfold, ny, ypad, wy2, TILE_R, TILE_C, 8)
        x0b = _tile_window_starts(xfold, nx, xpad, wx2, TILE_R, TILE_C, 128)
        flat = flag_map.ravel()
        sel = jnp.argsort(-flat)[:retry_tiles]
        n_flag = jnp.sum(flat)
        iy = (sel // gx).astype(jnp.int32)
        jx = (sel - gx * (sel // gx)).astype(jnp.int32)
        live = jnp.arange(retry_tiles) < n_flag
        iy_out = jnp.where(live, iy, gy)      # dead iterations → garbage row
        y0b_sel = y0b[iy, jx]

        kern = partial(_retry_kernel, **common, WY=wy2, WX=wx2,
                       YPAD=ypad, XPAD=xpad)
        grid_b = (retry_tiles,)
        x0full = x0b[iy, jx]

        def bimap(i, iyr, jxr, iyo, y0r, x0r):
            return (0, pl.multiple_of(y0r[i], 8),
                    pl.multiple_of(x0r[i], 128))

        gridspec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid_b,
            in_specs=[
                pl.BlockSpec((TILE_R, TILE_C),
                             lambda i, iyr, jxr, iyo, y0r, x0r:
                             (iyr[i], jxr[i]), memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_R, TILE_C),
                             lambda i, iyr, jxr, iyo, y0r, x0r:
                             (iyr[i], jxr[i]), memory_space=pltpu.VMEM),
                pl.BlockSpec((pl.Element(F), pl.Element(wy2),
                              pl.Element(wx2)), bimap,
                             memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((F, TILE_R, TILE_C),
                                    lambda i, iyr, jxr, iyo, y0r, x0r:
                                    (0, iyo[i], jxr[i]),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((retry_tiles, 1),
                                    lambda i, *_: (0, 0),
                                    memory_space=pltpu.SMEM)],
            scratch_shapes=[pltpu.VMEM((F, TILE_C, TILE_R), dtype)],
        )
        out_b, flags_b = pl.pallas_call(
            kern, grid_spec=gridspec,
            out_shape=[jax.ShapeDtypeStruct((F, ny_t + TILE_R, nx_t), dtype),
                       jax.ShapeDtypeStruct((retry_tiles, 1), jnp.int32)],
            interpret=interpret,
        )(iy, jx, iy_out, y0b_sel, x0full, pyt, pxt, cw_pad)
        # merge ONLY the tiles the retry pass actually wrote (when more
        # tiles flagged than retry_tiles, the excess keeps pass-A values
        # and the overflow flag stays raised)
        written = jnp.zeros((gy + 1, gx), jnp.int32).at[iy_out, jx].max(
            live.astype(jnp.int32))[:gy]
        retried = jnp.repeat(jnp.repeat(written > 0, TILE_R, 0), TILE_C, 1)
        out_arr = jnp.where(retried[None], out_b[:, :ny_t], out_arr)
        overflow = overflow | (n_flag > retry_tiles).astype(jnp.int32) \
            | jnp.max(flags_b * live[:, None].astype(jnp.int32))
    else:
        overflow = jnp.max(flag_map)
        n_flag = jnp.sum(flag_map)
        flags_b = jnp.zeros((1, 1), jnp.int32)
        live = jnp.zeros((1,), bool)

    if order > 0:
        # pole-home rows: the constant path keys on HOME row — first
        # `order` and last `order` rows (/root/reference/LCS/tools.py:31-39)
        pole_rows = sorted({0} | {r // TILE_R
                                  for r in range(max(ny - order, 0), ny)})
        pad_rows = ny_t + 8 - ny
        raw_p = jnp.pad(raw, ((0, 0), (0, pad_rows), (0, nx_t + 128 - nx)))
        ny_p = ny + pad_rows
        wyc_eff = min(wyc, ny_p)
        # per-pole-tile y window starts over raw (unfolded) indices
        y0f_all = jnp.clip(jnp.floor(yi), 0, ny - 2).astype(jnp.int32)
        tiles = y0f_all.reshape(gy, TILE_R, gx, TILE_C)
        yw0_all = jnp.clip(jnp.min(tiles, axis=(1, 3)), 0,
                           max(ny_p - wyc_eff, 0))
        yw0_all = (yw0_all // 8) * 8
        row_sel = np.asarray(pole_rows, dtype=np.int32)
        yw0s = yw0_all[jnp.asarray(row_sel)]
        grid_p = (len(pole_rows), gx)
        pkern = partial(_pole_kernel, F=F, ny=ny, nx=nx, nx_t=nx_t + 128,
                        y_min=float(y_min), y_max=float(y_max),
                        x_min=float(x_min), x_max=float(x_max), WYC=wyc_eff)

        def pimap(i, j, rs, yw0ref):
            return (0, pl.multiple_of(yw0ref[i, j], 8), 0)

        gridspec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid_p,
            in_specs=[
                pl.BlockSpec((TILE_R, TILE_C),
                             lambda i, j, rs, _: (rs[i], j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_R, TILE_C),
                             lambda i, j, rs, _: (rs[i], j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pl.Element(F), pl.Element(wyc_eff),
                              pl.Element(nx_t + 128)), pimap,
                             memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((F, TILE_R, TILE_C),
                                    lambda i, j, rs, _: (0, rs[i], j),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec(grid_p, lambda i, j, rs, _: (0, 0),
                                    memory_space=pltpu.SMEM)],
            scratch_shapes=[pltpu.VMEM((F, TILE_C, TILE_R), dtype)],
        )
        pole_out, pole_flags = pl.pallas_call(
            pkern, grid_spec=gridspec,
            out_shape=[jax.ShapeDtypeStruct((F, ny_t, nx_t), dtype),
                       jax.ShapeDtypeStruct(grid_p, jnp.int32)],
            interpret=interpret,
        )(jnp.asarray(row_sel), yw0s, pyt, pxt, raw_p)
        overflow = jnp.maximum(overflow, jnp.max(pole_flags))

        row = jax.lax.broadcasted_iota(jnp.int32, (ny_t, nx_t), 0)
        is_pole = (row < order) | ((row >= ny - order) & (row < ny))
        out_arr = jnp.where(is_pole[None], pole_out, out_arr)
    else:
        pole_flags = jnp.zeros((1, 1), jnp.int32)

    if debug_flags:
        return out_arr[:, :ny, :nx], dict(
            overflow=overflow,
            passA_tiles_flagged=jnp.sum(flag_map),
            retry_cap_exceeded=(n_flag > retry_tiles).astype(jnp.int32)
            if retry_tiles else jnp.zeros((), jnp.int32),
            retry_residual=jnp.max(flags_b * live[:, None].astype(jnp.int32))
            if retry_tiles else jnp.zeros((), jnp.int32),
            pole_flagged=jnp.max(pole_flags))
    return out_arr[:, :ny, :nx], overflow
