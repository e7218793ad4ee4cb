"""Pallas TPU kernels for the SETTLS interpolation hot path.

Why these kernels exist: the reference's inner loop is a full-grid scipy
``map_coordinates`` per wind component per SETTLS iteration
(/root/reference/LCS/tools.py:26-41) — a data-dependent gather.  XLA's TPU
gather lowers to a scalar-unit loop (~10M elements/s measured on v5e) and
Mosaic has no vectorised in-VMEM gather (``take_along_axis`` fails to
lower).  The gather is reformulated as **windowed one-hot matmuls on the
MXU**:

* parcels are processed in (8, 128) home-grid tiles; departure positions of
  a tile cluster spatially (smooth flow), so the tile's spline taps fit a
  (WY, WX) window of a wrap-padded copy of the field.  The padded field is
  stored as X_COPIES lane-shifted copies so logical window starts are
  32-granular despite Mosaic's hard 128-lane start-alignment requirement
  — which is what makes a 256-lane base window possible;
* positions are scaled and FOLDED once, in XLA routing, and the kernels
  receive the folded coordinates (recomputing them in Mosaic can slip a
  floor by an excess-precision ulp — across the period-(n-1) fold jump,
  by the whole period); per-tile tap spans route every tile to the
  smallest window tier that provably holds its taps, escalating up to
  full-longitude slabs for whirl-band tiles (1/cos(lat) metric
  amplification, /root/reference/LCS/trajectory.py:56).  The cascade is
  decided entirely in routing, so empty tiers are lax.cond-skipped and
  the ``overflow`` bitmask only raises when a tile is left windowless;
* each tile is evaluated **whole**: an x basis matrix is materialised at
  every window lane (direct piecewise-B3 evaluation for interior tiles; a
  per-tap one-hot carrying the exact mirror-at-edge offset remaps for
  tiles near the domain edges, selected per tile by ``pl.when``),
  ``G = B(1024, WX) @ Win(F*WY, WX)^T`` contracts the x axis on the MXU
  for all 8 rows x 128 lanes x F fields at once, and a masked full-lane
  reduction against the y basis on the f-repeated mod-WY iota finishes
  the tensor product (never WY-lane slices — those relayout vregs at
  ~5 us/tile);
* tier passes run over **compacted tile lists** (scalar-prefetched
  indices); dead capacity slots are ``pl.when``-gated off and their block
  index maps repeat the previous slot, so Mosaic skips both the compute and
  the window DMA — escalation costs scale with the *actual* number of
  stretched tiles per step.

The order-1/'constant' pole-home-row path (/root/reference/LCS/tools.py:
31-39) — the ``order`` home rows nearest each pole, whose positions are
decorrelated garbage after the reference's 1/cos(lat) conversion — is
evaluated as two compact north/south candidate blocks under a 3-level
full-longitude y-ladder (wyc, 3*wyc, 9*wyc rows), from clipped direct
indices precomputed in routing, with per-row-masked flags.

Numerics: weights/taps match ops/interp.py exactly; the contraction runs
at ``Precision.HIGHEST`` (measured ~5-6x DEFAULT at compute-bound sizes —
default bf16 rounds the weights to ~1e-2 and a manual 3-pass hi/lo split
still compounds to ~0.06 p99 log-FTLE over a full integration; HIGHEST
restores the XLA-f32 error class).  Agrees with the jnp path to 1e-11 in
f64 interpret mode (tests/test_pallas_interp.py) and to f32 rounding on
real TPU (bench.py emits the measured max|pallas-xla| each run).  See
docs/source/kernel.rst for the design rationale and measured cost
anatomy.
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pad_coeffs_for_pallas", "pallas_interp_multi",
           "resolve_engine"]

TILE_R = 8      # home rows per tile
TILE_C = 128    # home cols per tile
# raw-slab row padding beyond the tile-rounded field: wrap-replicated
# rows that give the sorted-slot pole windows clip headroom near the
# field top (the pole path uses raw indices and never selects a wrap
# row with nonzero weight).  Rounded so ny + pad stays 8-aligned for
# every ny; must match the prepadded-raw contract in models/settls.py.
POLE_PAD = 48
_M = TILE_R * TILE_C
_HIGH = jax.lax.Precision.HIGHEST
# v5e has 128MB of VMEM; the default 16MB scoped limit rejects the
# full-longitude tier windows plus their basis/remap temporaries
_CPARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


def _cdiv(a, b):
    return -(-a // b)


X_COPIES = 4    # lane-shifted field copies: x window starts at 128/4=32
X_GRAN = 128 // X_COPIES

# Launch-machinery default: 'blockspec' (per-tier Element-BlockSpec grid
# pipelines), 'dma' (manual-DMA engine for the escalation tiers) or
# 'dma-all' (engine absorbs tiers A/A-sub too).  Every
# ``pallas_engine='auto'`` in the stack resolves to this.  Measured on
# v5e (tools/probe_engine.py + probe_sort.py, 2026-08-19): dma-all
# 1803 ms flagship scan vs dma 1889 vs blockspec 2013, and 1501 ms with
# the sort-binning default — 'dma-all' is the device-validated winner.
# LCS_PALLAS_ENGINE overrides for experiments.
DEFAULT_ENGINE = os.environ.get("LCS_PALLAS_ENGINE", "dma-all")

# Pole-path y-window ladder (rows, each rounded to a multiple of 8):
# level 1 runs EVERY y0-sorted point slot, taller levels run the
# compacted residue, the last level clamps + raises the overflow flag.
# Sorted slots span ~a dozen rows on realistic flows (flagship census:
# 81% of slots fit 16 rows, 100% fit 160), so level 1 carries almost all
# of the work at ~1/10 the MXU cost of a 160-row window.  Tunable via
# LCS_POLE_LADDER="16,160,288" for on-device experiments — read at TRACE
# time (like LCS_LADDER / LCS_HALF_TILE), so one sweep process can A/B
# several values by re-tracing.
def _pole_ladder():
    raw = os.environ.get("LCS_POLE_LADDER", "16,160,288")
    try:
        return tuple(max(8, (int(s) // 8) * 8) for s in raw.split(","))
    except (ValueError, TypeError) as e:
        raise ValueError(f"LCS_POLE_LADDER={raw!r}: expected comma-"
                         f"separated ints, e.g. '16,160,288'") from e


POLE_LADDER = _pole_ladder()


def resolve_engine(engine: str) -> str:
    return DEFAULT_ENGINE if engine == "auto" else engine


def coeff_pad_dims(ny: int, nx: int):
    """(ypad, xpad) of the padded coefficient stack
    (pad_coeffs_for_pallas's geometry, computable without the stack)."""
    ypad = -(-(ny // 2 + 16) // 8) * 8
    xpad = -(-(nx // 2 + 8) // 128) * 128 + 2 * 128
    return ypad, xpad


def pad_coeffs_for_pallas(coeffs: jax.Array):
    """Wrap-pad the coefficient field and build the lane-shifted copies.

    ``coeffs``: (..., ny, nx) → (X_COPIES+1, ..., nyp, nxp-128).  Both axes
    are padded periodically **with period n** (index j holds row/col
    ``j mod n``); pad widths are ``n//2`` (the unwrap's maximum
    excursion) plus alignment slop plus tap margins, so a window start
    can never be clipped away from its tile's taps.

    The leading axis holds X_COPIES copies, copy ``c`` shifted left by
    ``c*X_GRAN`` lanes.  Mosaic requires window starts on the lane axis
    to be PROVABLY 128-aligned (finer Element starts fail to compile), so
    a logical 32-granular start ``s`` is realised as the 128-aligned
    start ``(s//128)*128`` in copy ``(s%128)//32`` — buying 4x finer
    effective window placement, which shrinks the base tier from
    (32, 384) to (32, 256) and every escalation tier accordingly.  The
    128-lane trim keeps every copy's window in-bounds.

    A final extra copy holds the **mirror-baked full-longitude slab**: in
    direct folded-x space every lane position is unique (no periodic
    aliasing), so scipy's mirror-at-edge tap semantics can be encoded in
    the data itself — lane ``l`` holds the sample for fold position
    ``l-1``: lane 0 = col 1 (the fold<1 tap -1 mirror), lanes 1..n =
    cols 0..n-1, lane n+1 = col n-2 and lane n+2 = col n-3 (the
    floor>=n-2 mirrors of positions n and n+1).  Full-x tiles evaluate a
    direct B-spline basis at ``fold+1`` against this slab and need no
    one-hot mirror handling at all.
    """
    ny, nx = coeffs.shape[-2], coeffs.shape[-1]
    ypad, xpad = coeff_pad_dims(ny, nx)
    ax_x = coeffs.ndim - 1

    def wrap_pad(a, axis, pad, n):
        # periodic pad as slice+concat (pure copies — a jnp.take here
        # lowers to a TPU gather over the whole ~GB-scale stack)
        if pad <= n:
            lo = jax.lax.slice_in_dim(a, n - pad, n, axis=axis)
            hi = jax.lax.slice_in_dim(a, 0, pad, axis=axis)
            return jnp.concatenate([lo, a, hi], axis=axis)
        reps = -(-pad // n)
        big = jnp.concatenate([a] * (2 * reps + 1), axis=axis)
        start = reps * n - pad
        return jax.lax.slice_in_dim(big, start, start + n + 2 * pad,
                                    axis=axis)

    # Two passes, both measured near their TPU floor (tools/probe_asm.py
    # barrier-probe, v5e 2026-08-21: this layout 37 ms/field marginal vs
    # 43 for the round-4 take-based assembly, 41 for per-slab concats,
    # 50 for a one-concat lane-major stack — lane-axis concat of
    # misaligned pieces runs at ~2x roofline, so the "minimal-traffic"
    # single concat LOSES to double-write with aligned pieces):
    #   1. ONE wide precursor per field: [x-wrap-padded row | mirror
    #      row] in a single lane concat of slices of the y-padded field
    #      (~2.7 GB at flagship — the only misaligned-piece concat);
    #   2. the 5-slab stack as a concat of 5 SINGLE slices of it
    #      (aligned slab-major copies at copy bandwidth).
    # The round-4 assembly built the mirror slab with a jnp.take (a
    # slab-sized TPU gather) and materialised the x-padded intermediate
    # separately; both passes are gone.
    ty = wrap_pad(coeffs, coeffs.ndim - 2, ypad, ny)
    nxp_c = nx + 2 * xpad - 128
    col = partial(jax.lax.slice_in_dim, ty, axis=ax_x)

    # x-pad span [-xpad, nx+xpad) as cycling slices of ty
    pieces, j, s = [], 0, (-xpad) % nx
    total = nx + 2 * xpad
    while j < total:
        w = min(nx - s, total - j)
        pieces.append(col(s, s + w))
        j += w
        s = 0
    # mirror-baked span appended on the same lane axis: lane 0 = col 1,
    # lanes 1..nx = cols 0..nx-1, then cols nx-2, nx-3, and edge-repeat
    # of col nx-3 — all slices
    edge = jnp.broadcast_to(col(nx - 3, nx - 2),
                            ty.shape[:-1] + (nxp_c - (nx + 3),))
    pieces += [col(1, 2), ty, col(nx - 2, nx - 1), col(nx - 3, nx - 2),
               edge]
    t_ext = jnp.concatenate(pieces, axis=ax_x)

    # (A "lean" 2-slab layout without the lane-shifted copies was designed
    # for the manual-DMA engine and FALSIFIED on device — Mosaic requires
    # HBM memref_slice lane starts provably divisible by 128, so every
    # engine shares this 5-slab layout; see kernel.rst.  Dropping the
    # copies in favour of 128-aligned window starts was re-costed round 5
    # and stays falsified: tier-A windows would widen 256→384 lanes,
    # +50% on the MXU contraction pool ≫ the assembly saving.)
    ecol = partial(jax.lax.slice_in_dim, t_ext, axis=ax_x)
    slabs = [ecol(c * X_GRAN, c * X_GRAN + nxp_c)
             for c in range(X_COPIES)]
    slabs.append(ecol(total, total + nxp_c))
    return jnp.stack(slabs, axis=0)


def _fold(x, n):
    """scipy map_coordinates mode='wrap' coordinate fold: period n-1
    (ops/interp.py semantics, quirk Q4)."""
    sz = float(n - 1)
    neg = x + sz * (jnp.floor(-x / sz) + 1.0)
    pos = x - sz * jnp.floor(x / sz)
    return jnp.where(x < 0, neg, jnp.where(x > sz, pos, x))


def _unwrap(fold_c, anchor, n):
    """Tile-anchored mod-n unwrap: same fractional parts, compact spread.

    NOTE: the float result can ROUND ACROSS an integer relative to
    ``fold_c`` (e.g. fold 1-ulp-below-1 plus a period landing exactly on
    an integer), making ``floor(unwrap)`` disagree with
    ``floor(fold) + n*k`` — tap/branch decisions must therefore never
    mix the two.  Kernel bodies use :func:`_unwrap_k` and derive floors
    in exact integer arithmetic."""
    return anchor + jnp.mod(fold_c - anchor + 0.5 * n, float(n)) - 0.5 * n


def _unwrap_k(fold_c, anchor, n):
    """Integer period count k with ``unwrap = fold + n*k`` — the
    round-across-integer-safe form of :func:`_unwrap`."""
    u = _unwrap(fold_c, anchor, n)
    return jnp.round((u - fold_c) / n).astype(jnp.int32)


def _cubic_w(t):
    one = 1.0 - t
    w0 = one * one * one / 6.0
    w1 = 2.0 / 3.0 - t * t + 0.5 * t * t * t
    w2 = 2.0 / 3.0 - one * one + 0.5 * one * one * one
    w3 = t * t * t / 6.0
    return (w0, w1, w2, w3)


def _tap_offsets(fold_c, kper, base, n, order):
    """Window-relative tap offsets (with exact mirror remaps).

    ``fold_c``: folded coordinate (period n-1, in [0, n-1]); ``kper``:
    int32 period count (the unwrapped coordinate is fold + n*kper);
    ``base``: window start in unwrapped index space.  The unwrapped
    floor is formed in EXACT integer arithmetic ``floor(fold) + n*kper``
    — a float unwrap can round across an integer relative to the fold
    (fold 1-ulp-below-1 plus a period), which would put the floor and
    the fold-decided mirror branches out of sync and corrupt the
    stencil.  The padded operand repeats with period n, so an in-range
    folded tap t is correct at any offset o ≡ t (mod n); the mirrored
    edge taps are fixed by:

      * fold < 1       : tap k=-1 mirrors -1→1    → use k=+1's offset
      * floor == n-2   : tap k=+2 mirrors n→n-2   → use k= 0's offset
      * floor == n-1   : tap k=+1 mirrors n→n-2   → use k=-1's offset
                         tap k=+2 mirrors n+1→n-3 → use k=-1's offset - 1
    """
    ff = jnp.floor(fold_c)
    o0 = ff.astype(jnp.int32) + n * kper - base
    if order == 1:
        hi = ff >= n - 1
        off1 = jnp.where(hi, o0 - 1, o0 + 1)
        return [o0, off1]
    lo = fold_c < 1.0
    hi2 = ff == n - 2
    hi1 = ff >= n - 1
    off_m1 = jnp.where(lo, o0 + 1, o0 - 1)
    off_p1 = jnp.where(hi1, o0 - 1, o0 + 1)
    off_p2 = jnp.where(hi1, o0 - 2, jnp.where(hi2, o0, o0 + 2))
    return [off_m1, o0, off_p1, off_p2]


def _bspline3(s):
    """Cubic B-spline basis evaluated at lane distances ``s``: the 4 tap
    weights of ops/interp.py are exactly B3 at s = lane - position."""
    a = jnp.abs(s)
    near = (4.0 - 6.0 * a * a + 3.0 * a * a * a) / 6.0
    t2 = 2.0 - a
    far = t2 * t2 * t2 / 6.0
    return jnp.where(a <= 1.0, near, jnp.where(a < 2.0, far, 0.0))


def _tent(s):
    """Linear B-spline (order-1 weights)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(s))


def _basis_direct(pos_rel, iota, order):
    """Basis matrix (..., W): the spline basis evaluated at each lane's
    distance from the interpolation point — one fused pass instead of one
    compare/select per tap.  Valid where no mirror remap applies."""
    s = iota.astype(pos_rel.dtype) - pos_rel[..., None]
    return _bspline3(s) if order == 3 else _tent(s)


def _tap_weights(fold_c, order):
    """Per-tap spline weights, (TR, TC) each, ordered like _tap_offsets.

    w_k is exactly the B-spline basis at the tap's lane distance: for tap
    floor+d the distance is d - t, so [w0..w3] = _cubic_w(t) matches
    _bspline3 at s = -1-t, -t, 1-t, 2-t (taps floor-1 .. floor+2).  The
    fraction comes from the FOLD (not a float unwrap, which can round
    across an integer — see _tap_offsets)."""
    t = fold_c - jnp.floor(fold_c)
    if order == 1:
        return [1.0 - t, t]
    return list(_cubic_w(t))


def _finish_y(g3, build_y, out_ref, F, WY, dtype, in_range=None,
              tr=TILE_R):
    """Finish the tensor-product spline: per-field y reduction WITHOUT
    WY-lane slices.  Slicing ``g3[..., f*WY:(f+1)*WY]`` relayouts the
    vregs (measured ~5 us/tile at F*WY=128); instead the y basis is
    evaluated on the f-repeated mod-WY iota — a compile-time-constant
    lane pattern — and each field's contribution isolated by a constant
    lane mask, so every op is a full-(F*WY)-lane elementwise or a plain
    lane reduction.  ``tr``: candidate block rows (TILE_R, or 2*TILE_R
    for the merged pole block)."""
    F_WY = F * WY
    i3e = jax.lax.broadcasted_iota(jnp.int32, (tr, TILE_C, F_WY), 2)
    yl = i3e % WY
    P = g3 * build_y(yl)
    fl = i3e // WY
    for f in range(F):
        val = jnp.sum(jnp.where(fl == f, P, 0.0), axis=2)
        if in_range is not None:
            val = jnp.where(in_range, val, 0.0)
        out_ref[f] = val.astype(dtype)


def _offs_oob(offs, W):
    """Elementwise out-of-bounds mask for a tap-offset list: min/max over
    the taps then ONE bounds compare — same truth value as checking every
    tap, at 2 compares instead of 2 per tap, and lets callers OR several
    groups together before the (expensive, relayouting) any-reduce.
    Device-measured: the per-tap any-reduces were ~11% of a gather
    group's engine time (tools/probe_slotbody.py)."""
    mn, mx = offs[0], offs[0]
    for o in offs[1:]:
        mn = jnp.minimum(mn, o)
        mx = jnp.maximum(mx, o)
    return (mn < 0) | (mx >= W)


def _onehot_basis(offs, ws, iota, W):
    """Weighted one-hot basis (TR, TC, W): B = sum_k w_k * [lane == off_k].

    Replaces the piecewise-polynomial lane evaluation (_basis_direct +
    _remap_corrections under lax.cond): the mirror remaps are already in
    the integer ``offs`` (_tap_offsets), collisions of remapped taps on
    one lane sum naturally, and the per-element cost drops from ~21 VPU
    passes (cubic eval + selects + remap corrections) to 3 per tap
    (compare / select / accumulate).  Offsets are clipped into the window
    so mis-routed (flagged) tiles still produce finite clamped-ish values
    instead of zeros — the flag contract."""
    acc = None
    for o, w in zip(offs, ws):
        oc = jnp.clip(o, 0, W - 1)[..., None]
        term = jnp.where(iota == oc, w[..., None], 0.0)
        acc = term if acc is None else acc + term
    return acc


# ---------------------------------------------------------------------------
# Whole-tile kernel bodies
# ---------------------------------------------------------------------------

def _spline_tile_body(fyx, win_ref, out_ref, write_flag, y0, x0, *,
                      F, ny, nx, WY, WX, order, x_full, edge=None,
                      anchor=None, path="when"):
    """Evaluate one (TILE_R, TILE_C) tile: whole-tile one-hot contraction.

    ``fy``/``fx``: (TR, TC) FOLDED fractional grid coordinates (period
    n-1, scaled/folded ONCE by the XLA routing pass — the kernel must
    not recompute them: XLA may contract the scaling arithmetic with
    surrounding ops (``--xla_allow_excess_precision``), so a Mosaic
    recomputation can differ by an ulp and slip a floor across a cell or,
    at a fold jump, across the period); ``win_ref``: (F, WY, WX) window
    block; ``out_ref``: (F, TR, TC) output block; ``y0``/``x0``: window
    starts in unpadded unwrapped index space.  With ``x_full`` the x
    offsets come directly from folded space (base 0) and cannot overflow.

    ``edge``: optional traced scalar — nonzero when the tile's folded
    coords may touch the domain edges (mirror-remap zone, computed
    conservatively by the routing pass).  Interior tiles (>99% of a
    global field) take the cheap direct B-spline lane evaluation —
    ~2x fewer VPU ops than the per-tap one-hot build; edge tiles take
    the one-hot build whose integer offsets carry the exact mirror
    remaps.  ``pl.when`` branches on the scalar, so only one path runs.
    """
    dtype = out_ref.dtype
    yfold = fyx[0]      # fyx: (2, TR, TC) ref, array, or (y, x) pair
    xfold = fyx[1]
    cdt = yfold.dtype
    # period-count anchor: the tile's first fold (identical to the
    # routing frame); ``anchor`` overrides for callers whose folds can
    # cross a period boundary relative to the tile's first element (any
    # in-window parcel unwraps to the same taps under either anchor).
    ya = yfold[0, 0] if anchor is None else anchor[0]
    ky = _unwrap_k(yfold, ya, ny)
    # full-x tiles evaluate against the mirror-baked slab (lane = fold+1,
    # see pad_coeffs_for_pallas) — mirrors are in the data, so x always
    # takes the direct basis there
    if not x_full:
        xa = xfold[0, 0] if anchor is None else anchor[1]
        kx = _unwrap_k(xfold, xa, nx)

    # tap-offset/weight builds and the full oob check are EDGE-path-only
    # (below): interior tiles (edge == 0, >99% of a global field) have no
    # mirror remaps, so their taps are exactly q-lo .. q+hi of the
    # integer window position q — the safety flag needs 2 compares on
    # arrays that already exist, and the (TR, TC) offset/select chains
    # never build.  Measured ~0.5-0.7 ms/group of the engine's tile
    # compute (tools/probe_slotbody.py noflag/flagmm variants).
    lo, hi = (1, 2) if order == 3 else (0, 1)

    def eval_pipeline(build_y, build_x):
        # MXU contraction over x, in <=512-lane chunks so the
        # materialised x basis stays within the scoped-VMEM budget for
        # full-longitude windows.  (F, WY, WX) -> (F*WY, WX) and
        # (8, 128, XC) -> (M, XC) merge major dims only — layout no-ops.
        w2 = win_ref[...].reshape(F * WY, WX).astype(cdt)
        g = jnp.zeros((_M, F * WY), cdt)
        xchunk = 256 if WX > 512 else 512
        c0 = 0
        while c0 < WX:
            xc = min(xchunk, WX - c0)
            i3c = c0 + jax.lax.broadcasted_iota(
                jnp.int32, (TILE_R, TILE_C, xc), 2)
            ohc = build_x(i3c)
            g = g + jax.lax.dot_general(
                ohc.reshape(_M, xc), w2[:, c0:c0 + xc],
                (((1,), (1,)), ((), ())),
                preferred_element_type=cdt, precision=_HIGH)
            c0 += xc
        g3 = g.reshape(TILE_R, TILE_C, F * WY)
        _finish_y(g3, build_y, out_ref, F, WY, dtype)

    # window-relative positions for the direct evaluation (integer floor
    # + fold fraction — consistent with the offsets by construction),
    # clamped so a mis-routed tile still evaluates in-range (flagged)
    yq = (jnp.floor(yfold).astype(jnp.int32) + ny * ky - y0)
    ypos = jnp.clip(yq.astype(cdt) + (yfold - jnp.floor(yfold)),
                    0.0, WY - 1.0)
    if x_full:
        xpos = jnp.clip(xfold + 1.0, 0.0, WX - 1.0)
    else:
        xq = (jnp.floor(xfold).astype(jnp.int32) + nx * kx - x0)
        xpos = jnp.clip(xq.astype(cdt) + (xfold - jnp.floor(xfold)),
                        0.0, WX - 1.0)

    def onehot_path():
        # exact mirror-remapped offsets + the full per-tap oob check
        # (safety flag: exact routing makes it 0; capacity overflow and
        # mis-routed tiles clamp and raise it)
        offs_y = _tap_offsets(yfold, ky, y0, ny, order)
        ws_y = _tap_weights(yfold, order)
        oob = _offs_oob(offs_y, WY)
        if x_full:
            bx = lambda i3: _basis_direct(xpos, i3, order)
        else:
            offs_x = _tap_offsets(xfold, kx, x0, nx, order)
            ws_x = _tap_weights(xfold, order)
            oob = oob | _offs_oob(offs_x, WX)
            bx = lambda i3: _onehot_basis(offs_x, ws_x, i3, WX)
        write_flag(jnp.any(oob).astype(jnp.int32))
        eval_pipeline(lambda i3: _onehot_basis(offs_y, ws_y, i3, WY), bx)

    def interior_path():
        # no mirror remaps possible: taps are exactly yq-lo..yq+hi /
        # xq-lo..xq+hi — flag from the existing integer positions
        oob = (yq < lo) | (yq > WY - 1 - hi)
        if not x_full:
            oob = oob | (xq < lo) | (xq > WX - 1 - hi)
        write_flag(jnp.any(oob).astype(jnp.int32))
        eval_pipeline(lambda i3: _basis_direct(ypos, i3, order),
                      lambda i3: _basis_direct(xpos, i3, order))

    # ``path``: Mosaic IF-CONVERTS the per-slot pl.when in the engine's
    # fori_loop body — BOTH branches execute and interior tiles pay the
    # one-hot/mirror build too (measured 0.9 ms/group at 11% edge tiles,
    # tools/probe_slotbody.py 'noonehot').  The engine therefore splits
    # its slot lists by edge class in ROUTING and compiles branch-free
    # single-path bodies ('interior'/'onehot'); the 2-D grid kernels
    # keep the dynamic 'when' selection (one branch per grid step).
    if path == "onehot" or edge is None:
        onehot_path()
        return
    if path == "interior":
        interior_path()
        return

    @pl.when(edge == 0)
    def _interior():
        interior_path()

    @pl.when(edge != 0)
    def _edge():
        onehot_path()


N_SUB = 4          # tier A-sub: 128/N_SUB-lane sub-blocks, 128-wide windows
_SUBW = TILE_C // N_SUB


def _sub_tile_body(fyx, win_refs, out_ref, write_flag, y0, x0s, *,
                   F, ny, nx, WY, order, edge, anchor=None,
                   path="when"):
    """Sub-tile fast path (tier A-sub): each 32-lane sub-block of the
    tile contracts against its own (F, WY, 128) window.

    The windowed one-hot contraction costs M*WX*(F*WY) MXU flops; the
    home mesh alone spans ~128.1 cells (quirk-Q4 stretch), so whole-tile
    windows can never go below WX=256.  A 32-lane sub-block spans only
    ~32.01 cells, so when every sub-block's taps fit a 128-lane window
    of its own (dev spread <= ~54 cells after the X_GRAN alignment tax —
    the majority of tiles), the contraction runs as N_SUB (256, 128) @
    (128, F*WY) dots: HALF the MXU flops and basis-build area of the
    (32, 256) tier at the same K=128 MXU efficiency.  Edge tiles take
    the one-hot build (integer offsets carry the exact mirror remaps);
    interior tiles the direct B-spline evaluation, as in tier A."""
    dtype = out_ref.dtype
    yfold = fyx[0]      # fyx: (2, TR, TC) ref, array, or (y, x) pair
    xfold_full = fyx[1]
    cdt = yfold.dtype
    # anchor: see _spline_tile_body — (ya, (xa_q0..xa_q3)) or None
    ya = yfold[0, 0] if anchor is None else anchor[0]
    ky = _unwrap_k(yfold, ya, ny)
    yq = jnp.floor(yfold).astype(jnp.int32) + ny * ky - y0
    ypos = jnp.clip(yq.astype(cdt) + (yfold - jnp.floor(yfold)),
                    0.0, WY - 1.0)
    lo, hi = (1, 2) if order == 3 else (0, 1)

    def x_contract(build_x_q):
        gs = []
        for q in range(N_SUB):
            i3 = jax.lax.broadcasted_iota(jnp.int32,
                                          (TILE_R, _SUBW, 128), 2)
            bq = build_x_q(q, i3)
            w2 = win_refs[q][...].reshape(F * WY, 128).astype(cdt)
            gq = jax.lax.dot_general(bq.reshape(TILE_R * _SUBW, 128), w2,
                                     (((1,), (1,)), ((), ())),
                                     preferred_element_type=cdt,
                                     precision=_HIGH)
            gs.append(gq.reshape(TILE_R, _SUBW, F * WY))
        return jnp.concatenate(gs, axis=1)

    # per-sub-block folded coords / period counts / offsets (tiny arrays)
    sub = []
    for q in range(N_SUB):
        xfold_q = xfold_full[:, _SUBW * q:_SUBW * (q + 1)]
        xa_q = xfold_q[0, 0] if anchor is None else anchor[1][q]
        kx_q = _unwrap_k(xfold_q, xa_q, nx)
        sub.append((xfold_q, kx_q))
    def interior_path():
        # no mirror remaps: taps exactly q-lo..q+hi, flag from the
        # integer window positions (see _spline_tile_body)
        oob = (yq < lo) | (yq > WY - 1 - hi)
        oob_x = None
        for q in range(N_SUB):
            fq = sub[q][0]
            xq = jnp.floor(fq).astype(jnp.int32) + nx * sub[q][1] - x0s[q]
            oq = (xq < lo) | (xq > 128 - 1 - hi)
            oob_x = oq if oob_x is None else (oob_x | oq)
        write_flag((jnp.any(oob) | jnp.any(oob_x)).astype(jnp.int32))

        def bx(q, i3):
            fq = sub[q][0]
            xq = jnp.floor(fq).astype(jnp.int32) + nx * sub[q][1] - x0s[q]
            xpos = jnp.clip(xq.astype(cdt) + (fq - jnp.floor(fq)),
                            0.0, 127.0)
            return _basis_direct(xpos, i3, order)

        g3 = x_contract(bx)
        _finish_y(g3, lambda i3: _basis_direct(ypos, i3, order), out_ref,
                  F, WY, dtype)

    def onehot_path():
        offs_y = _tap_offsets(yfold, ky, y0, ny, order)
        ws_y = _tap_weights(yfold, order)
        oob_y = _offs_oob(offs_y, WY)
        # offsets/weights built ONCE per quarter and shared by the flag
        # check and the one-hot basis build (they were traced twice)
        offs_qs = [_tap_offsets(sub[q][0], sub[q][1], x0s[q], nx, order)
                   for q in range(N_SUB)]
        ws_qs = [_tap_weights(sub[q][0], order) for q in range(N_SUB)]
        oob_x = None
        for q in range(N_SUB):
            oq = _offs_oob(offs_qs[q], 128)
            oob_x = oq if oob_x is None else (oob_x | oq)
        # two any-reduces total (y is (TR, TC), the x quarters (TR, SUBW))
        write_flag((jnp.any(oob_y) | jnp.any(oob_x)).astype(jnp.int32))

        def bx(q, i3):
            return _onehot_basis(offs_qs[q], ws_qs[q], i3, 128)

        g3 = x_contract(bx)
        _finish_y(g3, lambda i3: _onehot_basis(offs_y, ws_y, i3, WY),
                  out_ref, F, WY, dtype)

    # see _spline_tile_body on ``path`` (engine if-conversion)
    if path == "onehot":
        onehot_path()
        return
    if path == "interior":
        interior_path()
        return

    @pl.when(edge == 0)
    def _interior():
        interior_path()

    @pl.when(edge != 0)
    def _edge():
        onehot_path()


def _sub_grid_kernel(live_s, y0s, x0q, f0s, pos_ref, w0, w1, w2, w3,
                     out_ref, flag_ref, *, F, WY, YPAD, XPAD, common):
    """Tier A-sub kernel: 2-D grid over all tiles, gated to the tiles
    whose sub-blocks provably fit their 128-lane windows.  ``live_s``
    carries the mirror-edge flag in bit 1, as in tier A."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    flag_ref[i, j] = jnp.int32(0)

    @pl.when(live_s[i, j] > 0)
    def _():
        def write_flag(v):
            flag_ref[i, j] = v

        _sub_tile_body(pos_ref, (w0, w1, w2, w3), out_ref, write_flag,
                       y0s[i, j] - YPAD,
                       tuple(x0q[i, j, q] - XPAD for q in range(N_SUB)),
                       F=F, WY=WY, edge=live_s[i, j] >> 1, **common)


def _pole_block_body(yc, xc, vmask, mask, win_ref, out_ref, write_flag,
                     y0, *, F, ny, nx, WY, WXS, TR=TILE_R):
    """Order-1 mode='constant' evaluation for one (TR, TILE_C) block of
    pole-row points (/root/reference/LCS/tools.py:31-39): direct
    (unfolded) indices on the RAW field, out-of-range → 0.  ``yc``/``xc``
    are the CLIPPED direct float indices and ``vmask`` the in-range value
    mask, all computed ONCE by the XLA routing pass (recomputing them
    here from raw positions can slip a floor vs the routing spans — the
    same excess-precision hazard as the spline path).  The x window is
    always the full slab (``WXS`` >= nx), so only the y window can clamp;
    ``mask`` (TR, TC) selects the entries that are real pole points —
    only their clamps raise the flag (pad-rank / non-pole candidate
    entries are discarded by the caller's unsort + ``is_pole``
    scatter)."""
    dtype = out_ref.dtype
    cdt = yc.dtype

    oy = jnp.clip(jnp.floor(yc), 0, ny - 2).astype(jnp.int32) - y0
    bad = (oy < 0) | (oy > WY - 2)
    over = jnp.any(bad & (mask > 0)).astype(jnp.int32)
    write_flag(over)

    ypos = jnp.clip(yc - y0, 0.0, WY - 1.0)
    xpos = jnp.clip(xc, 0.0, WXS - 1.0)
    in_range = vmask > 0

    M = TR * TILE_C
    w2 = win_ref[...].reshape(F * WY, WXS).astype(cdt)
    g = jnp.zeros((M, F * WY), cdt)
    xchunk = 256 if WXS > 512 else 512
    c0 = 0
    while c0 < WXS:
        xck = min(xchunk, WXS - c0)
        i3c = c0 + jax.lax.broadcasted_iota(jnp.int32,
                                            (TR, TILE_C, xck), 2)
        ohc = _basis_direct(xpos, i3c, 1)
        g = g + jax.lax.dot_general(ohc.reshape(M, xck),
                                    w2[:, c0:c0 + xck],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=cdt,
                                    precision=_HIGH)
        c0 += xck
    g3 = g.reshape(TR, TILE_C, F * WY)
    _finish_y(g3, lambda i3: _basis_direct(ypos, i3, 1), out_ref,
              F, WY, dtype, in_range=in_range, tr=TR)


def _grid_kernel(live_s, y0s, x0s, f0s, pos_ref, win_ref, out_ref,
                 flag_ref, *, body, F, WY, WX, YPAD, XPAD, x_full, common):
    """Tier-A kernel: 2-D grid over all tiles in place, gated to the tiles
    routed to this tier (plus unrouted overflow tiles, which clamp).
    ``live_s`` encodes liveness in bit 0 and the mirror-edge flag in
    bit 1 (see _spline_tile_body's ``edge``)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    flag_ref[i, j] = jnp.int32(0)

    @pl.when(live_s[i, j] > 0)
    def _():
        y0 = y0s[i, j] - YPAD
        x0 = jnp.zeros((), jnp.int32) if x_full else x0s[i, j] - XPAD

        def write_flag(v):
            flag_ref[i, j] = v

        body(pos_ref, win_ref, out_ref, write_flag, y0, x0,
             F=F, WY=WY, WX=WX, x_full=x_full, edge=live_s[i, j] >> 1,
             **common)


def _pole_grid_kernel(y0s, f0s, pk_ref, win_ref, out_ref, flag_ref, *,
                      F, WY, WXS, common):
    """Pole level-1 pass: (S,) grid over the y0-SORTED point slots (one
    (TILE_R, TILE_C)-point block per slot).  Sorting by y0 makes each
    slot span a handful of consecutive field rows, so a short window
    suffices no matter how chaotically the pole rows' y positions have
    diverged (the one-hot-matmul cost is ∝ WY, see _pole_block_body)."""
    j = pl.program_id(0)

    def write_flag(v):
        flag_ref[0, j] = v

    _pole_block_body(pk_ref[0], pk_ref[1], pk_ref[2], pk_ref[3],
                     win_ref, out_ref, write_flag, y0s[j],
                     F=F, WY=WY, WXS=WXS, **common)


def _pole_list_kernel(n_live, jx, jx_out, y0s, f0s, pk_ref, win_ref,
                      out_ref, flag_ref, *, F, WY, WXS, common):
    """Sorted-slot pole escalation pass over a compacted slot list; dead
    slots repeat slot 0's blocks and write the garbage row block."""
    i = pl.program_id(0)
    flag_ref[i, 0] = jnp.int32(0)

    @pl.when(i < n_live[0])
    def _():
        def write_flag(v):
            flag_ref[i, 0] = v

        _pole_block_body(pk_ref[0], pk_ref[1], pk_ref[2], pk_ref[3],
                         win_ref, out_ref, write_flag, y0s[i],
                         F=F, WY=WY, WXS=WXS, **common)


def _list_kernel(n_live, iy, jx, iy_out, y0s, x0s, edges, f0s, pos_ref,
                 win_ref, out_ref, flag_ref, *, body, F, WY, WX, YPAD,
                 XPAD, x_full, common):
    """Escalation-tier kernel: 1-D grid over a compacted tile list; slots
    past ``n_live`` are dead (their index maps repeat slot 0, so the window
    DMA is skipped, and the body is gated off)."""
    i = pl.program_id(0)
    flag_ref[i, 0] = jnp.int32(0)

    @pl.when(i < n_live[0])
    def _():
        y0 = y0s[i] - YPAD
        x0 = jnp.zeros((), jnp.int32) if x_full else x0s[i] - XPAD

        def write_flag(v):
            flag_ref[i, 0] = v

        body(pos_ref, win_ref, out_ref, write_flag, y0, x0,
             F=F, WY=WY, WX=WX, x_full=x_full, edge=edges[i], **common)


def _engine_kernel(counts, sel_s, pack_s, x0q2_s, f0_s,
                   folds_ref, cw_hbm, *refs, body, F, tiers, seg_off,
                   ypad, xpad, wx_full, common, gx, nb=2, unroll=1):
    """Manual-DMA escalation engine: ONE grid step services every
    escalation tier's LIVE slots — VMEM-resident edition.

    The BlockSpec tier pipeline costs its DMA/grid machinery per
    CAPACITY slot — dead slots pay ~1.6 us each even though their index
    maps repeat slot 0 (tools/probe_deadslot.py).  Here an in-kernel
    ``fori_loop(0, counts[t])`` per tier touches LIVE slots only, so
    capacity margins are free and the per-tier launch + cond +
    full-array merge chain collapses into one launch.

    The v1 engine paid THREE DMA round-trips per live slot (window in,
    position tile in, output tile out): the device trace measured
    ~7.6 us/slot on the flagship — DMA issue + semaphore latency, not
    bandwidth.  The folds and the output are small enough to live
    entirely in VMEM at flagship scale ((2, ny_t, nx_t) ~9 MB and
    (F, ny_t, nx_t) ~18 MB of the v5e's 128 MB), so v2 keeps them as
    full-block VMEM operands: position reads and output writes become
    dynamically-offset VMEM accesses (tile offsets are provably 8/128-
    aligned — products of TILE_R/TILE_C), and per-slot DMA traffic
    collapses to the ONE data-dependent window copy, prefetched
    ``nb`` slots ahead so its latency hides behind the tile body.

    Scalar-prefetch operands are the concatenated per-tier slot lists
    (``seg_off`` static segment offsets), PACKED to shrink the SMEM
    prefetch load (the slot lists were ~78 KB/launch, a measured
    ~1 ms/launch class of in-call overhead): ``sel_s`` is the linear
    tile index (iy*gx + jx), ``pack_s`` carries (y0 << 16) | (x0 << 2)
    | edge with starts in PADDED space, and ``x0q2_s`` holds the
    A-sub quarter starts two-per-int32 ((q1 << 16) | q0).  Alignment
    facts (y0 % 8 == 0, x0 % X_GRAN == 0) are re-asserted after
    unpacking with ``pl.multiple_of`` — the routing guarantees them.
    ``tiers`` is the static ladder [(wy, wx_or_None), ...]; window
    shapes per tier are static, so every DMA shape is static.  ``out_ref`` starts as a copy
    of ``outA_ref`` (tier A's output for engine='dma'; zeros for
    'dma-all', where the engine's own sections write every tile), so
    un-escalated tiles pass through unchanged.

    When the layout carries "pole" sections (models/settls.py merged
    hoisted pole loop), ``refs`` additionally holds the pole-padded raw
    field stack (HBM — the pole path interpolates order-1/'constant'
    RAW values, not spline coefficients), the packed per-point operand
    [yc, xc, vmask, flagmask] in sorted-slot layout, and a second
    output for the sorted pole values; pole slots DMA a full-longitude
    (F, WY, nx_t) raw window and run :func:`_pole_block_body`."""
    has_pole = any(t[0] == "pole" for t in tiers)
    if has_pole:
        (raw_hbm, pack_p_ref, outA_ref, out_ref, out_pole_ref,
         flags_ref, win_buf, win_sems) = refs
    else:
        outA_ref, out_ref, flags_ref, win_buf, win_sems = refs
    nx_t2 = _cdiv(common["nx"], TILE_C) * TILE_C
    f0 = f0_s[0]
    # pass-through base: one whole-array VMEM copy replaces the v1
    # aliased-HBM in-place writes
    out_ref[...] = outA_ref[...]

    def unpack(sl):
        sel = sel_s[sl]
        iy = sel // gx
        jx = sel - gx * iy
        pk = pack_s[sl]
        ed = pk & 3
        x0 = (pk >> 2) & 0x3FFF
        y0 = pl.multiple_of(pk >> 16, 8)
        return iy, jx, y0, x0, ed

    def pos_view(sl):
        iy, jx, *_ = unpack(sl)
        return folds_ref.at[
            :, pl.ds(pl.multiple_of(iy * TILE_R, TILE_R), TILE_R),
            pl.ds(pl.multiple_of(jx * TILE_C, TILE_C), TILE_C)]

    def out_view(sl):
        iy, jx, *_ = unpack(sl)
        return out_ref.at[
            :, pl.ds(pl.multiple_of(iy * TILE_R, TILE_R), TILE_R),
            pl.ds(pl.multiple_of(jx * TILE_C, TILE_C), TILE_C)]

    def x0q_at(sl, q):
        w = x0q2_s[sl * 2 + (q >> 1)]
        return pl.multiple_of((w >> (16 * (q & 1))) & 0xFFFF, X_GRAN)

    for t_i, (kind, wy_t, wx_t, path_t) in enumerate(tiers):
        x_full = wx_t is None and kind == "spline"
        if kind == "sub":
            wxe = N_SUB * 128
        elif kind == "pole":
            wxe = nx_t2
        else:
            wxe = wx_full if x_full else wx_t
        n = counts[t_i]
        off = seg_off[t_i]

        def win_dma(slot, k, q, wy_t=wy_t, wxe=wxe, x_full=x_full,
                    off=off, kind=kind):
            sl = off + k
            if kind == "pole":
                # full-longitude raw window at the slot's sorted-y0
                # start (8-aligned by construction: (kymn//8)*8 clipped
                # to the 8-aligned ny_p - WY)
                y0 = pl.multiple_of(pack_s[sl] >> 16, 8)
                return pltpu.make_async_copy(
                    raw_hbm.at[pl.ds(f0, F), pl.ds(y0, wy_t),
                               pl.ds(0, wxe)],
                    win_buf.at[slot, 0, :, :wy_t, :wxe],
                    win_sems.at[slot, 0])
            # Mosaic must PROVE HBM slice starts divisible by the (8,128)
            # memref tiling; scalar-prefetched values carry no such fact
            # (device compile fails "Failed to prove that a tile index in
            # dimension 1 is divisible by the tiling (8)"), so assert what
            # the routing guarantees: y starts 8-aligned, x starts
            # 128-aligned via the (copy, start) decomposition.
            _iy, _jx, y0, x0u, _ed = unpack(sl)
            if kind == "sub":
                # A-sub quarter starts ride x0q2_s two-per-int32 (a flat
                # 1-D list: a 2-D SMEM operand is lane-padded to 128
                # ints/row, which blew the 1 MiB SMEM budget once)
                x0 = x0q_at(sl, q)
                c = (x0 % 128) // X_GRAN
                x128 = pl.multiple_of((x0 // 128) * 128, 128)
                return pltpu.make_async_copy(
                    cw_hbm.at[pl.ds(c, 1), pl.ds(f0, F),
                              pl.ds(y0, wy_t), pl.ds(x128, 128)],
                    win_buf.at[slot, :, :, :wy_t,
                               128 * q:128 * (q + 1)],
                    win_sems.at[slot, q])
            if x_full:
                c = X_COPIES                  # mirror-baked slab
                x128 = 0
            else:
                x0 = pl.multiple_of(x0u, X_GRAN)
                c = (x0 % 128) // X_GRAN
                x128 = pl.multiple_of((x0 // 128) * 128, 128)
            return pltpu.make_async_copy(
                cw_hbm.at[pl.ds(c, 1), pl.ds(f0, F), pl.ds(y0, wy_t),
                          pl.ds(x128, wxe)],
                win_buf.at[slot, :, :, :wy_t, :wxe], win_sems.at[slot, 0])

        flags_ref[t_i, 0] = jnp.int32(0)

        qs = range(N_SUB) if kind == "sub" else (0,)

        def run_body(slot, k, t_i=t_i, off=off, wy_t=wy_t, wxe=wxe,
                     x_full=x_full, kind=kind, path_t=path_t):
            sl = off + k

            def write_flag(v, t_i=t_i):
                flags_ref[t_i, 0] = jnp.maximum(flags_ref[t_i, 0], v)

            if kind == "pole":
                # sorted pole point slot: pack rows sl_p*8..+8 of the
                # (4, S*8, 128) operand; values land in the matching
                # rows of the sorted pole output
                sl_p = sel_s[sl]
                base = pl.multiple_of(sl_p * TILE_R, TILE_R)
                y0 = pack_s[sl] >> 16
                pk = pack_p_ref[:, pl.ds(base, TILE_R), :]
                _pole_block_body(
                    pk[0], pk[1], pk[2], pk[3],
                    win_buf.at[slot, 0, :, :wy_t, :wxe],
                    out_pole_ref.at[:, pl.ds(base, TILE_R), :],
                    write_flag, y0, F=F, WY=wy_t, WXS=wxe,
                    ny=common["ny"], nx=common["nx"])
                return

            _iy, _jx, y0p, x0u, ed = unpack(sl)
            y0 = y0p - ypad
            # sections are edge-class-split in routing: the bodies take
            # a STATIC single path (Mosaic if-converts per-slot pl.when
            # — see _spline_tile_body), so ``ed`` is only passed through
            # for the legacy 'when' mode
            if kind == "sub":
                _sub_tile_body(
                    pos_view(sl),
                    tuple(win_buf.at[slot, 0, :, :wy_t,
                                     128 * q:128 * (q + 1)]
                          for q in range(N_SUB)),
                    out_view(sl), write_flag, y0,
                    tuple(x0q_at(sl, q) - xpad
                          for q in range(N_SUB)),
                    F=F, WY=wy_t, edge=ed, path=path_t, **common)
            else:
                x0 = (jnp.zeros((), jnp.int32) if x_full
                      else x0u - xpad)
                body(pos_view(sl),
                     win_buf.at[slot, 0, :, :wy_t, :wxe],
                     out_view(sl), write_flag, y0, x0,
                     F=F, WY=wy_t, WX=wxe, x_full=x_full,
                     edge=ed, path=path_t, **common)

        @pl.when(n > 0)
        def _(n=n, t_i=t_i, off=off, wy_t=wy_t, wxe=wxe, x_full=x_full,
              kind=kind, qs=qs, win_dma=win_dma, run_body=run_body):
            if unroll > 1:
                # K-way unrolled, block-double-buffered: the serial
                # fori_loop body is issue/latency-bound (~7 us/slot vs
                # the grid pipeline's ~2.8 us for the same tile body —
                # ROUND3_NOTES engine v2), so process K independent
                # slots per iteration: the K bodies share no data (each
                # has its own window buffer and output tile), letting
                # the VLIW scheduler interleave their dependency chains
                # and amortising per-iteration scalar/loop overhead.
                # Ring = 2K buffers: block b computes on set b%2 while
                # block b+1's K window DMAs fill set (b+1)%2.
                K = unroll
                for j in range(K):
                    @pl.when(j < n)
                    def _(j=j):
                        for q in qs:
                            win_dma(j, j, q).start()

                def blk(b, _, n=n, qs=qs, win_dma=win_dma,
                        run_body=run_body, K=K):
                    par = jax.lax.rem(b, jnp.asarray(2, b.dtype)) * K
                    nxt_par = K - par  # (b+1)%2 * K
                    base = b * K
                    for j in range(K):
                        @pl.when(base + K + j < n)
                        def _(j=j):
                            for q in qs:
                                win_dma(nxt_par + j, base + K + j,
                                        q).start()
                    for j in range(K):
                        @pl.when(base + j < n)
                        def _(j=j):
                            for q in qs:
                                win_dma(par + j, base + j, q).wait()
                    for j in range(K):
                        @pl.when(base + j < n)
                        def _(j=j):
                            run_body(par + j, base + j)
                    return 0

                jax.lax.fori_loop(0, (n + K - 1) // K, blk, 0)
                return

            # prologue: fill the nb-deep window prefetch ring
            for b in range(nb - 1):
                @pl.when(b < n)
                def _(b=b):
                    for q in qs:
                        win_dma(b % nb, b, q).start()

            def step(k, _, qs=qs):
                slot = jax.lax.rem(k, jnp.asarray(nb, k.dtype))

                @pl.when(k + nb - 1 < n)
                def _():
                    for q in qs:
                        win_dma(jax.lax.rem(k + nb - 1, jnp.asarray(nb, k.dtype)),
                                k + nb - 1, q).start()

                for q in qs:
                    win_dma(slot, k, q).wait()
                run_body(slot, k)
                return 0

            jax.lax.fori_loop(0, n, step, 0)


# ---------------------------------------------------------------------------
# XLA-side routing
# ---------------------------------------------------------------------------

def _tile_minmax(fold_t, n, x_full=False):
    """Per-tile floor-min/max of unwrapped coords, (gy, gx) int32 each.

    Floors are formed as ``floor(fold) + n*k`` in integer arithmetic —
    the same construction the kernels use — so routing spans can never
    disagree with the kernels' tap indices at a fold/period boundary."""
    nyt, nxt = fold_t.shape
    gy, gx = nyt // TILE_R, nxt // TILE_C
    tiles = fold_t.reshape(gy, TILE_R, gx, TILE_C)
    if x_full:
        f = jnp.floor(tiles).astype(jnp.int32)
    else:
        anchor = tiles[:, :1, :, :1]
        k = _unwrap_k(tiles, anchor, n)
        f = jnp.floor(tiles).astype(jnp.int32) + n * k
    return (jnp.min(f, axis=(1, 3)),
            jnp.max(f, axis=(1, 3)))


def _starts(mn, n, pad, w, align, slop=4):
    """Aligned window starts in PADDED element space for floor-mins ``mn``.

    The default -4 slop pairs with _fits' edge-tile conservatism: a
    position clamped exactly onto the domain edge folds to the OTHER end
    of the period-(n-1) wrap, and a 1-ulp arithmetic difference between
    the XLA routing pass and the Mosaic kernel across that fold boundary
    moves the unwrapped floor by up to TWO cells (observed at the clamped
    polar rows).  Interior tiles (no fold jump possible) use slop=2.
    """
    s = ((mn - slop + pad) // align) * align
    # the upper clip must itself be align-granular or a clipped start
    # breaks the alignment contract of the realised window
    return jnp.clip(s, 0, ((n + 2 * pad - w) // align) * align)


def _fits(mn, mx, s_pad, pad, w, margin, ulp=2):
    """Does window [s_pad-pad, s_pad-pad+w) hold taps
    [mn-margin-ulp, mx+2+ulp]?

    ``ulp`` is the routing-vs-kernel arithmetic slack: the kernel
    recomputes the scaled coordinates with Mosaic's own arithmetic, which
    may differ from the XLA routing pass by 1 ulp.  Away from the
    period-(n-1) fold boundary that moves a floor by at most ONE cell
    (only at exact cell boundaries); across the fold (positions clamped
    exactly onto a domain edge — edge tiles only) by up to two cells
    after the mod-n unwrap.  Callers pass ulp=1 for provably interior
    tiles and ulp=2 for edge tiles.
    """
    lo = s_pad - pad
    return ((mn - margin - ulp) >= lo) & ((mx + 2 + ulp) <= lo + w - 1)


# ---------------------------------------------------------------------------
# Public entry
# ---------------------------------------------------------------------------

def _pole_eval_block(px_b, py_b, mask_b, raw_p, f0_arr, *, F, order,
                     ny, nx, nx_t, ny_p, dtype, x_min, x_max, y_min,
                     y_max, interpret=False, presorted=False):
    """Sorted-slot pole evaluation for one (2*order, nx) pole-row
    position block in exp2 row order ([0..order-1, ny-order..ny-1]):
    order-1 mode='constant' on the raw fields, 3-level y-window
    ladder over y0-sorted point slots.  Factored from the pole
    section of pallas_interp_multi so models/settls.py's hoisted
    per-step pole loop can iterate it (``pole_block=True``).  Returns
    ``(blk_rows (F, 2*order, nx_t), pole_flag int32)``.

    ``presorted=True``: ``px_b``/``py_b``/``mask_b`` are (2, Mpad)
    flat per-side lists ALREADY in (approximately) y0-sorted rank
    order — the per-group argsort + 4 permutation gathers (~1 ms/
    gather-group of XLA glue on the flagship, tools/probe_trace) are
    hoisted to once per scan step by models/settls.py, which carries
    the pole block in sorted layout across the step's 5 gather groups.
    Slot windows are computed from the CURRENT positions (exactness
    never depends on sort quality — a drifted slot escalates or
    flags), and values return in the same sorted layout,
    ``(F, 2, Mpad)``, with the caller owning the un-sort."""
    ycapP = (ny_p // 8) * 8
    wy1, wy2, wy3 = (min(w, ycapP) for w in _pole_ladder())

    from .interp import scale_positions
    xi_b, yi_b = scale_positions(px_b, py_b, x_min=x_min, x_max=x_max,
                                 y_min=y_min, y_max=y_max,
                                 nx=nx, ny=ny)
    # clipped direct float indices + in-range value mask, computed
    # once here and handed to the kernels (no Mosaic recomputation)
    yc_b = jnp.clip(yi_b, 0.0, float(ny - 1))
    xc_b = jnp.clip(xi_b, 0.0, float(nx - 1))
    vm_b = ((yi_b >= 0) & (yi_b <= ny - 1)
            & (xi_b >= 0) & (xi_b <= nx - 1)).astype(px_b.dtype)

    # ---- flat per-side point lists, sorted by y0.  Pad ranks
    # replicate the side's last point (mode='edge'): they evaluate a
    # real point's values (discarded on unsort) and can only raise
    # flags that point itself would raise. ----
    Ms = order * nx                        # real points per side
    Mpad = _cdiv(Ms, TILE_R * TILE_C) * (TILE_R * TILE_C)
    ns = Mpad // (TILE_R * TILE_C)
    S = 2 * ns                             # total (8,128) point slots

    def side_flat(a):                      # (2*order, nx) → (2, Mpad)
        return jnp.pad(a.reshape(2, Ms), ((0, 0), (0, Mpad - Ms)),
                       mode="edge")

    if presorted:
        mk_b = mask_b.astype(px_b.dtype)   # already (2, Mpad) flat
        y0_s = jnp.clip(jnp.floor(yc_b), 0, ny - 2).astype(
            jnp.int32).reshape(S, TILE_R * TILE_C)
        pack = jnp.stack([yc_b, xc_b, vm_b, mk_b]).reshape(
            4, S * TILE_R, TILE_C)
    else:
        mk_b = jnp.broadcast_to(mask_b[:, :, None], (2, order, nx)
                                ).astype(px_b.dtype).reshape(
                                    2 * order, nx)
        y0_f = jnp.clip(jnp.floor(side_flat(yc_b)), 0,
                        ny - 2).astype(jnp.int32)
        perm = jnp.argsort(y0_f, axis=1)   # (2, Mpad) sorted ranks

        def sortp(a):
            return jnp.take_along_axis(side_flat(a), perm, axis=1)

        # one packed operand [yc, xc, vmask, flagmask] in sorted-rank
        # storage: rank r of side k at row k*ns*TILE_R + r//TILE_C
        pack = jnp.stack([sortp(yc_b), sortp(xc_b), sortp(vm_b),
                          sortp(mk_b)]).reshape(4, S * TILE_R, TILE_C)
        y0_s = jnp.take_along_axis(y0_f, perm, axis=1).reshape(
            S, TILE_R * TILE_C)
    kymn = jnp.clip(jnp.min(y0_s, axis=1) - 1, 0, ny - 2)
    kymx = jnp.clip(jnp.max(y0_s, axis=1) + 1, 0, ny - 2)
    kymn = jnp.minimum(kymn, kymx)         # (S,)
    pcommon = dict(ny=ny, nx=nx)

    def pole_fit(wy_):
        ys = jnp.clip((kymn // 8) * 8, 0, max(ny_p - wy_, 0))
        return (kymn >= ys) & (kymx + 1 <= ys + wy_ - 1), ys

    # ---- level 1: EVERY slot, short window ----
    fit1, ys1 = pole_fit(wy1)
    kern1 = partial(_pole_grid_kernel, F=F, WY=wy1, WXS=nx_t,
                    common=pcommon)
    grid1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((4, TILE_R, TILE_C),
                         lambda i, y0r, f0r: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pl.Element(F), pl.Element(wy1),
                          pl.Element(nx_t)),
                         lambda i, y0r, f0r:
                         (f0r[0], pl.multiple_of(y0r[i], 8), 0),
                         memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((F, TILE_R, TILE_C),
                                lambda i, *_: (0, i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, S), lambda i, *_: (0, 0),
                                memory_space=pltpu.SMEM)],
    )
    blk1, pflags1 = pl.pallas_call(
        kern1, grid_spec=grid1,
        out_shape=[jax.ShapeDtypeStruct((F, S * TILE_R, TILE_C),
                                        dtype),
                   jax.ShapeDtypeStruct((1, S), jnp.int32)],
        interpret=interpret,
        compiler_params=_CPARAMS,
    )(ys1, f0_arr, pack, raw_p)

    vals = blk1                            # (F, S*TILE_R, TILE_C)
    covP = fit1
    residP = jnp.zeros((), jnp.int32)

    def compacted_level(wy_, want, ys_, kern_):
        """Run `kern_` over the compacted slot list `want` with
        per-slot window starts `ys_`; returns (blk, pflags, ran,
        live)."""
        flat = want.astype(jnp.int32)
        sel = jnp.nonzero(flat, size=S, fill_value=0)[0].astype(
            jnp.int32)
        count = jnp.sum(flat)
        live = jnp.arange(S) < count
        jx = jnp.where(live, sel, sel[0])
        jx_out = jnp.where(live, jx, S)    # dead → garbage block
        y0v = jnp.where(live, ys_[jx], ys_[jx[0]])
        nl = jnp.full((1,), count, jnp.int32)
        gridL = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(S,),
            in_specs=[
                pl.BlockSpec((4, TILE_R, TILE_C),
                             lambda i, nl, jxr, jxo, y0r, f0r:
                             (0, jxr[i], 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pl.Element(F), pl.Element(wy_),
                              pl.Element(nx_t)),
                             lambda i, nl, jxr, jxo, y0r, f0r:
                             (f0r[0], pl.multiple_of(y0r[i], 8), 0),
                             memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((F, TILE_R, TILE_C),
                                    lambda i, nl, jxr, jxo, y0r,
                                    f0r: (0, jxo[i], 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((S, 1), lambda i, *_: (0, 0),
                                    memory_space=pltpu.SMEM)],
        )

        def go(nl, jx, jx_out, y0v):
            return pl.pallas_call(
                kern_, grid_spec=gridL,
                out_shape=[
                    jax.ShapeDtypeStruct(
                        (F, (S + 1) * TILE_R, TILE_C), dtype),
                    jax.ShapeDtypeStruct((S, 1), jnp.int32)],
                interpret=interpret,
                compiler_params=_CPARAMS,
            )(nl, jx, jx_out, y0v, f0_arr, pack, raw_p)

        def skip(nl, jx, jx_out, y0v):
            return (jnp.zeros((F, (S + 1) * TILE_R, TILE_C), dtype),
                    jnp.zeros((S, 1), jnp.int32))

        # the cond is a measured WIN, not a skipped cleanup: an
        # unconditional tallest-window pass (one launch, no conds) was
        # tried round 4 and REGRESSED the flagship 0.911 -> 0.837
        # fields/s (~0.46 ms/group — consistent with Mosaic
        # if-converting the dead slots' pl.when bodies, so all S slots
        # pay the tall-window compute on every gather even when the
        # escalation list is empty).  Cond-skipping the whole launch
        # keeps the common empty case free.
        blk, pflags = jax.lax.cond(count > 0, go, skip,
                                   nl, jx, jx_out, y0v)
        ran = jnp.zeros((S + 1,), jnp.int32).at[jx_out].max(
            live.astype(jnp.int32))[:S] > 0
        return blk, pflags, ran, live

    # ---- level 2: compacted escalation (sorted-slot spans make
    # this rare — flagship census: ~2 of 10 slots, late steps) ----
    fit2, ys2 = pole_fit(wy2)
    kern2 = partial(_pole_list_kernel, F=F, WY=wy2, WXS=nx_t,
                    common=pcommon)
    blk2, pflags2, ran2, live2 = compacted_level(
        wy2, (~covP) & fit2, ys2, kern2)
    cov2 = ran2 & fit2
    rowm2 = jnp.repeat(cov2, TILE_R)       # (S*TILE_R,)
    vals = jnp.where(rowm2[None, :, None], blk2[:, :S * TILE_R],
                     vals)
    covP = covP | cov2
    residP = residP | jnp.max(pflags2[:, 0] * live2.astype(jnp.int32))

    # ---- final level: every leftover slot, tallest window; values
    # are taken for every slot it ran — even clamped (flagged) ones,
    # whose tallest-window values are the closest available ----
    _, ys3 = pole_fit(wy3)
    kern3 = partial(_pole_list_kernel, F=F, WY=wy3, WXS=nx_t,
                    common=pcommon)
    blk3, pflags3, ran3, live3 = compacted_level(
        wy3, ~covP, ys3, kern3)
    rowm3 = jnp.repeat(ran3, TILE_R)
    vals = jnp.where(rowm3[None, :, None], blk3[:, :S * TILE_R],
                     vals)
    covP = covP | ran3
    residP = residP | jnp.max(pflags3[:, 0] * live3.astype(jnp.int32))

    pole_flag = \
        (jnp.max(pflags1[0] * (1 - covP.astype(jnp.int32))) << 3) \
        | (residP << 4)

    if presorted:
        # caller owns the layout: values return in sorted rank order
        return vals.reshape(F, 2, Mpad), pole_flag

    # un-sort and place: sorted rank j of side k holds original
    # point perm[k, j], so original point i reads back via inv[k, i]
    ar = jnp.broadcast_to(jnp.arange(Mpad, dtype=perm.dtype),
                          (2, Mpad))
    inv = jnp.zeros_like(perm).at[jnp.arange(2)[:, None], perm].set(
        ar)
    vals_u = jnp.take_along_axis(
        vals.reshape(F, 2, Mpad),
        jnp.broadcast_to(inv[None], (F, 2, Mpad)), axis=2)[:, :, :Ms]
    blk_rows = jnp.pad(vals_u.reshape(F, 2 * order, nx),
                       ((0, 0), (0, 0), (0, nx_t - nx)))
    return blk_rows, pole_flag


def _engine_layout(ladder, n_tiles, half_tile, wy, wx, pole=None):
    """STATIC engine section layout for the edge-class-split manual-DMA
    engine: [(kind, wy, wx, path), ...], per-section capacities, segment
    offsets and flag bits — in exactly the order the fresh assembly
    builds them (A-int, A-edge, [sub-int, sub-edge,] then per ladder
    tier an interior and an edge half, then — when the hoisted pole loop
    rides the same launch — one section per pole-ladder level).

    ``pole``: (S, (wy1, wy2, wy3)) appends three "pole" sections of S
    point slots each (models/settls.py merged-launch hoist: the separate
    pole pallas launch paid the ~0.3 ms/launch floor 5x per step —
    2 + settls_order gather groups — on top of the main launch).  Unlike
    the standalone pole ladder (level 1 runs EVERY slot as a blanket),
    each engine pole section runs only the slots ASSIGNED to its level
    (live-only slot lists make compaction free), so escalated slots pay
    exactly one evaluation and proven-fit sections can never flag; the
    final level takes clamped values and raises bit 4, exactly the
    standalone ladder's contract (bit 3 could never fire there: the
    final level runs every leftover slot)."""
    tiers, caps, bits = [], [], []
    tiers += [("spline", wy, wx, "interior"), ("spline", wy, wx, "onehot")]
    caps += [n_tiles, n_tiles]
    bits += [2, 2]
    if half_tile:
        tiers += [("sub", wy, None, "interior"), ("sub", wy, None,
                                                  "onehot")]
        caps += [n_tiles, n_tiles]
        bits += [2, 2]
    for t_i, (wy_, wx_, cap) in enumerate(ladder):
        cap = min(cap, n_tiles)        # assign_plan's caps_l clamp
        tiers += [("spline", wy_, wx_, "interior"),
                  ("spline", wy_, wx_, "onehot")]
        caps += [cap, cap]
        bits += [5 + t_i, 5 + t_i]
    if pole is not None:
        S_p, wys_p = pole
        for wy_p in wys_p:
            tiers.append(("pole", wy_p, None, "pole"))
            caps.append(S_p)
            bits.append(4)
    seg = []
    off = 0
    for c in caps:
        seg.append(off)
        off += c
    return tiers, caps, seg, bits, off


def _launch_engine(counts_arr, sel_cat, pack_cat, x0q2_cat, f0_arr,
                   folds, cw_pad, out_base, *, body, F, tiers_static,
                   seg_off, ypad, xpad, wx_full, common, gx, dtype,
                   ny_t, nx_t, interpret, pole=None):
    """One manual-DMA engine launch from prebuilt packed operands.

    ``pole``: optional dict(raw_p, pack_p, S) adding the merged pole
    sections' operands (see _engine_layout / _engine_kernel) and a
    second output — returns (out, flags, pole_vals) in that case."""
    unroll_e = max(1, int(os.environ.get("LCS_ENGINE_UNROLL", "1")))
    nb_e = (2 * unroll_e if unroll_e > 1
            else int(os.environ.get("LCS_ENGINE_NB", "3")))
    T_n = len(tiers_static)
    wymax = max(t[1] for t in tiers_static)
    wxmax = max((N_SUB * 128 if t[0] == "sub"
                 else (nx_t if t[0] == "pole"
                       else (wx_full if t[2] is None else t[2])))
                for t in tiers_static)
    kern_e = partial(_engine_kernel, body=body, F=F,
                     tiers=tuple(tiers_static), seg_off=tuple(seg_off),
                     ypad=ypad, xpad=xpad, wx_full=wx_full,
                     common=common, gx=gx, nb=nb_e, unroll=unroll_e)
    in_specs = [pl.BlockSpec((2, ny_t, nx_t), lambda *_: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY)]
    operands = [folds, cw_pad]
    out_specs = [pl.BlockSpec((F, ny_t, nx_t), lambda *_: (0, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((F, ny_t, nx_t), dtype)]
    if pole is not None:
        S_p = pole["S"]
        in_specs += [pl.BlockSpec(memory_space=pl.ANY),
                     pl.BlockSpec((4, S_p * TILE_R, TILE_C),
                                  lambda *_: (0, 0, 0),
                                  memory_space=pltpu.VMEM)]
        operands += [pole["raw_p"], pole["pack_p"]]
        out_specs.append(pl.BlockSpec((F, S_p * TILE_R, TILE_C),
                                      lambda *_: (0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct(
            (F, S_p * TILE_R, TILE_C), dtype))
    in_specs.append(pl.BlockSpec((F, ny_t, nx_t), lambda *_: (0, 0, 0),
                                 memory_space=pltpu.VMEM))
    operands.append(out_base)
    out_specs.append(pl.BlockSpec((T_n, 1), memory_space=pltpu.SMEM))
    out_shapes.append(jax.ShapeDtypeStruct((T_n, 1), jnp.int32))
    # folds and the output stay resident in VMEM for the whole
    # launch (~9 + 2*18 MB at flagship scale) — see _engine_kernel.
    res = pl.pallas_call(
        kern_e,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(1,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((nb_e, 1, F, wymax, wxmax), dtype),
                pltpu.SemaphoreType.DMA((nb_e, N_SUB)),
            ]),
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(counts_arr, sel_cat, pack_cat, x0q2_cat, f0_arr, *operands)
    if pole is not None:
        out, pole_vals, eflags = res
        return out, eflags, pole_vals
    return res


def pole_flat_dims(order: int, nx: int):
    """(Ms, Mpad) of the flat per-side pole point lists."""
    Ms = order * nx
    Mpad = _cdiv(Ms, TILE_R * TILE_C) * (TILE_R * TILE_C)
    return Ms, Mpad


def _pole_side_flat(a, order, nx):
    """(..., 2*order, nx) home layout → (..., 2, Mpad), edge-padded."""
    Ms, Mpad = pole_flat_dims(order, nx)
    a2 = a.reshape(*a.shape[:-2], 2, Ms)
    pad = [(0, 0)] * (a2.ndim - 1) + [(0, Mpad - Ms)]
    return jnp.pad(a2, pad, mode="edge")


def pole_sort_state(px_rows, py_rows, *, order, ny, nx, x_min, x_max,
                    y_min, y_max):
    """Once-per-step sort state for the hoisted pole loop
    (models/settls.py): flatten the (2*order, nx) pole-row block to
    per-side lists and y0-argsort them.  Returns ``(perm, inv)`` int32
    (2, Mpad) — apply with :func:`pole_apply_perm`, invert with
    :func:`pole_unsort_rows`.  The sort key matches _pole_eval_block's
    slot key (floor of the clipped scaled y index), so slots stay as
    tight as the per-group sort produced; intra-step drift only widens
    windows, never breaks exactness (drifted slots escalate or flag)."""
    from .interp import scale_positions
    _, Mpad = pole_flat_dims(order, nx)
    pxf = _pole_side_flat(px_rows, order, nx)
    pyf = _pole_side_flat(py_rows, order, nx)
    _, yi = scale_positions(pxf, pyf, x_min=x_min, x_max=x_max,
                            y_min=y_min, y_max=y_max, nx=nx, ny=ny)
    y0 = jnp.clip(jnp.floor(jnp.clip(yi, 0.0, float(ny - 1))), 0,
                  ny - 2).astype(jnp.int32)
    perm = jnp.argsort(y0, axis=1)
    ar = jnp.broadcast_to(jnp.arange(Mpad, dtype=perm.dtype), (2, Mpad))
    inv = jnp.zeros_like(perm).at[jnp.arange(2)[:, None], perm].set(ar)
    return perm, inv


def pole_apply_perm(a_rows, perm, *, order, nx):
    """(2*order, nx) home layout → (2, Mpad) sorted flat."""
    return jnp.take_along_axis(_pole_side_flat(a_rows, order, nx), perm,
                               axis=1)


def pole_unsort_rows(flat, inv, *, order, nx):
    """(..., 2, Mpad) sorted flat → (..., 2*order, nx) home layout."""
    Ms, Mpad = pole_flat_dims(order, nx)
    idx = jnp.broadcast_to(inv, flat.shape[:-2] + inv.shape)
    u = jnp.take_along_axis(flat, idx, axis=-1)[..., :Ms]
    return u.reshape(*flat.shape[:-2], 2 * order, nx)


def pallas_interp_multi(raw: jax.Array, cw_pad: jax.Array,
                        px: jax.Array, py: jax.Array, *,
                        ny: int, nx: int, y_min, y_max, x_min, x_max,
                        order: int = 3, wy: int = 32, wx: int = 256,
                        wyc: int = 32,
                        retry_tiles: int = 256, retry_wy: int = 64,
                        retry_wx: int = 512,
                        home_rows=None, pole_tile_rows=None,
                        f0=None, nf: int | None = None,
                        raw_prepadded: bool = False,
                        ladder=None, half_tile: bool = True,
                        engine: str = "auto",
                        interpret: bool = False,
                        debug_flags: bool = False,
                        pole_block: bool = False,
                        pole_presorted: bool = False,
                        skip_pole: bool = False,
                        pole_lists=None):
    """Evaluate F stacked fields at parcel positions — the TPU fast path.

    ``raw``: (F, ny, nx) raw fields (pole-home path); ``cw_pad``:
    (X_COPIES, F, nyp, nxp) lane-shifted padded coefficients from
    :func:`pad_coeffs_for_pallas` (pass padded raw fields for order 1);
    ``px``/``py``: (ny, nx) positions.

    Tier A — window ``(wy, wx)``, a 2-D grid over all tiles, gated to the
    tiles whose taps provably fit — is followed by an escalation ladder of
    wider windows (see ``ladder`` in the body: y-stretched, x-stretched,
    both, violent, and full-longitude levels) over compacted tile lists.
    Routing is exact (per-tile tap spans computed in XLA), and the cascade
    is capacity-aware: a tile spills to the next level that holds it when
    a level's capacity is exhausted.  The ``overflow`` flag raises only if
    a tile is left windowless (every holding level full, or spans beyond
    the widest level) — such tiles keep tier-A clamped values.

    ``retry_tiles=0`` disables all escalation: unfit tiles clamp and flag,
    as callers relying on the overflow contract expect.

    Sharded blocks: ``px``/``py`` may hold a latitude BLOCK of the parcel
    grid ((rows, nx) with rows != ny).  ``home_rows`` ((rows, 1) int32,
    traced) then supplies each block row's GLOBAL home row (the reference
    keys its pole special-case on home row, /root/reference/LCS/tools.py:
    31-39).  The pole pass always evaluates the first/last ``order`` block
    rows as candidates and masks by home row, so no static tile-row hint
    is needed (``pole_tile_rows`` is accepted and ignored for backward
    compatibility).  Window routing itself is position-only.

    Scan fast path: ``f0``/``nf``/``raw_prepadded`` let the SETTLS scan
    keep the WHOLE padded coefficient stack resident and window it by
    time directly in the block specs — ``cw_pad`` is then
    (X_COPIES+1, T*2, nyp, nxp), ``raw`` the (T*2, ny_p, nx_t)
    pole-padded raw stack, ``f0`` the traced first-field index (2*t) and
    ``nf`` the static field count.  This removes the former per-step
    ~200 MB dynamic-slice+concat of the padded coefficients (measured
    ~100 ms/field of pure HBM copying on the flagship).

    Returns ``(out (F, rows, nx), overflow int32 scalar)``.
    """
    engine = resolve_engine(engine)
    F = int(nf) if nf is not None else raw.shape[0]
    f0_arr = (jnp.zeros((1,), jnp.int32) if f0 is None
              else jnp.asarray(f0, jnp.int32).reshape(1))
    R = py.shape[0]
    ny_t = _cdiv(R, TILE_R) * TILE_R          # position-block tiling
    nx_t = _cdiv(nx, TILE_C) * TILE_C
    gy, gx = ny_t // TILE_R, nx_t // TILE_C
    n_tiles = gy * gx
    dtype = raw.dtype
    assert cw_pad.ndim == raw.ndim + 1 and \
        cw_pad.shape[0] == X_COPIES + 1, (cw_pad.shape, raw.shape)
    assert cw_pad.shape[1] == raw.shape[0], (cw_pad.shape, raw.shape)
    ypad = (cw_pad.shape[-2] - ny) // 2
    # copies are trimmed by 128 lanes (pad_coeffs_for_pallas)
    xpad = (cw_pad.shape[-1] + 128 - nx) // 2
    nxp_c = cw_pad.shape[-1]
    if ny + 2 * ypad < wy or nxp_c < wx:
        raise ValueError(f"window ({wy},{wx}) exceeds padded field "
                         f"({ny + 2 * ypad},{nxp_c})")
    wx_full = nx_t + 128   # full-x slab: covers folded taps up to nx+1

    if pole_block:
        # ---- pole-rows-only fast path (the hoisted per-step pole loop
        # of models/settls.py): ``px``/``py`` are the
        # (2*order, nx) pole-row position block in exp2 row order
        # ([0..order-1, ny-order..ny-1]) — or, with
        # ``pole_presorted=True``, (2, Mpad) flat per-side lists already
        # in sorted rank order (see _pole_eval_block).  Evaluates the
        # order-1/constant pole semantics and returns the values block
        # directly — no spline routing, no tiers. ----
        assert order > 0 and home_rows is None and not debug_flags
        presorted = pole_presorted
        if not presorted:
            assert py.shape[0] == 2 * order, py.shape
        ny_tf = _cdiv(ny, TILE_R) * TILE_R
        pad_rows = ny_tf + POLE_PAD - ny
        ny_p = ny + pad_rows
        if raw_prepadded:
            assert raw.shape[-2:] == (ny_p, nx_t), (raw.shape, ny_p, nx_t)
            raw_p = raw
        else:
            wrap = jnp.take(raw, jnp.arange(pad_rows) % ny, axis=1)
            raw_p = jnp.pad(jnp.concatenate([raw, wrap], axis=1),
                            ((0, 0), (0, 0), (0, nx_t - nx)))
        mask = (jnp.ones(py.shape, bool) if presorted
                else jnp.ones((2, order), bool))
        blk_rows, pole_flag = _pole_eval_block(
            px, py, mask, raw_p, f0_arr, F=F,
            order=order, ny=ny, nx=nx, nx_t=nx_t, ny_p=ny_p, dtype=dtype,
            x_min=x_min, x_max=x_max, y_min=y_min, y_max=y_max,
            interpret=interpret, presorted=presorted)
        if presorted:
            return blk_rows, pole_flag          # (F, 2, Mpad) sorted
        return blk_rows[:, :, :nx], pole_flag

    # ---- merged hoisted-pole launch: the per-step sorted pole lists
    # (models/settls.py hoist) ride the SAME engine launch as the main
    # gather instead of a separate pole_block pallas call — the
    # standalone call paid the per-launch floor (~0.3 ms, probe_slotbody
    # empty-nokern) 2+settls_order times per scan step.  Routing mirrors
    # _pole_eval_block's presorted branch; each slot is assigned to
    # exactly ONE pole-ladder level (fit1 / ~fit1&fit2 / rest), so
    # proven-fit sections never flag and the final level takes clamped
    # values raising bit 4 — the standalone ladder's exact contract. ----
    pole_merge = None
    if pole_lists is not None:
        if engine != "dma-all" or debug_flags:
            raise NotImplementedError(
                "pole_lists (merged pole launch) requires the 'dma-all' "
                "engine without debug_flags; call pole_block=True "
                "separately for other engines")
        assert order > 0 and not pole_block
        skip_pole = True
        pxp_l, pyp_l = pole_lists
        ny_tf_p = _cdiv(ny, TILE_R) * TILE_R
        pad_rows_p = ny_tf_p + POLE_PAD - ny
        ny_p_m = ny + pad_rows_p
        nx_t_p = _cdiv(nx, TILE_C) * TILE_C
        if raw_prepadded:
            assert raw.shape[-2:] == (ny_p_m, nx_t_p), (raw.shape,)
            raw_pm = raw
        else:
            wrapm = jnp.take(raw, jnp.arange(pad_rows_p) % ny, axis=1)
            raw_pm = jnp.pad(jnp.concatenate([raw, wrapm], axis=1),
                             ((0, 0), (0, 0), (0, nx_t_p - nx)))
        ycap_m = (ny_p_m // 8) * 8
        wy123 = tuple(min(w_, ycap_m) for w_ in _pole_ladder())
        from .interp import scale_positions as _sp_m
        xi_p, yi_p = _sp_m(pxp_l, pyp_l, x_min=x_min, x_max=x_max,
                           y_min=y_min, y_max=y_max, nx=nx, ny=ny)
        yc_p = jnp.clip(yi_p, 0.0, float(ny - 1))
        xc_p = jnp.clip(xi_p, 0.0, float(nx - 1))
        vm_p = ((yi_p >= 0) & (yi_p <= ny - 1) & (xi_p >= 0)
                & (xi_p <= nx - 1)).astype(pxp_l.dtype)
        Mpad_p = pxp_l.shape[-1]
        S_p = 2 * (Mpad_p // (TILE_R * TILE_C))
        y0_p = jnp.clip(jnp.floor(yc_p), 0, ny - 2).astype(
            jnp.int32).reshape(S_p, TILE_R * TILE_C)
        pack_p = jnp.stack([yc_p, xc_p, vm_p, jnp.ones_like(vm_p)]
                           ).reshape(4, S_p * TILE_R, TILE_C)
        kymn_p = jnp.clip(jnp.min(y0_p, axis=1) - 1, 0, ny - 2)
        kymx_p = jnp.clip(jnp.max(y0_p, axis=1) + 1, 0, ny - 2)
        kymn_p = jnp.minimum(kymn_p, kymx_p)
        fits_p, ys_p = [], []
        for w_ in wy123:
            ys_ = jnp.clip((kymn_p // 8) * 8, 0, max(ny_p_m - w_, 0))
            fits_p.append((kymn_p >= ys_) & (kymx_p + 1 <= ys_ + w_ - 1))
            ys_p.append(ys_.astype(jnp.int32))
        assigns_p = (fits_p[0], (~fits_p[0]) & fits_p[1],
                     (~fits_p[0]) & (~fits_p[1]))
        pole_merge = dict(raw_p=raw_pm, pack_p=pack_p, S=S_p,
                          wys=wy123, assigns=assigns_p, ys=ys_p,
                          Mpad=Mpad_p)

    def pad_pos(p):
        return jnp.pad(p, ((0, ny_t - R), (0, nx_t - nx)), mode="edge")

    # ---- spline-path positions: pole home rows (evaluated by the
    # dedicated order-1/constant pole path below, which overwrites their
    # output) are substituted with the nearest non-pole row's positions
    # BEFORE routing and spline evaluation.  Their true positions can be
    # unbounded garbage — ``conv_x = 1/cos(lat)`` is ~1e10 at exact-pole
    # home latitudes (/root/reference/LCS/trajectory.py:56), so one step
    # flings them to O(2^27) degrees — which would poison the tap spans of
    # the tiles they share with normal rows, force spurious full-x
    # escalations, and (worse) make the XLA-routing vs Mosaic-kernel fold
    # arithmetic diverge by O(ulp(|x|)/cell) = dozens of cells, raising
    # phantom overflow flags.  The spline path never needs these rows.
    if order > 0 and R > 2 * order and home_rows is None and R == ny:
        # single-chip blocks: the substitution map is STATIC (rows
        # 0..order-1 -> row ``order``, rows ny-order.. -> row
        # ny-1-order), so build it from slices + broadcasts instead of a
        # full-grid row gather — the gather ran in EVERY gather group
        # (2 + settls_order per step) over the ~4 MB position arrays
        def _sub_rows(p):
            return jnp.concatenate(
                [jnp.broadcast_to(p[order:order + 1], (order, nx)),
                 p[order:ny - order],
                 jnp.broadcast_to(p[ny - 1 - order:ny - order],
                                  (order, nx))], axis=0)

        px_sp = _sub_rows(px)
        py_sp = _sub_rows(py)
    elif order > 0 and R > 2 * order:
        hrow = (jnp.arange(R, dtype=jnp.int32) if home_rows is None
                else home_rows[:, 0].astype(jnp.int32))
        safe_idx = jnp.clip(
            jnp.clip(hrow, order, ny - 1 - order) - hrow[0], 0, R - 1)
        px_sp = jnp.take(px, safe_idx, axis=0)
        py_sp = jnp.take(py, safe_idx, axis=0)
    else:
        px_sp, py_sp = px, py

    pyt = pad_pos(py_sp)
    pxt = pad_pos(px_sp)

    # ---- exact per-tile tap spans (XLA, vectorised over tiles) ----
    from .interp import scale_positions
    xi, yi = scale_positions(pxt, pyt, x_min=x_min, x_max=x_max,
                             y_min=y_min, y_max=y_max, nx=nx, ny=ny)
    yfold = _fold(yi, ny)
    xfold = _fold(xi, nx)

    ymn, ymx = _tile_minmax(yfold, ny)
    xmn, xmx = _tile_minmax(xfold, nx)

    # conservative mirror-edge flag per tile: folded floors within one
    # cell of the remap zones (fold < 1 / floor >= n-2, _tap_offsets) —
    # the +-1 margin absorbs routing-vs-kernel 1-ulp fold differences.
    # Interior tiles take the cheap direct-B3 basis in the kernel.
    def _fold_floor_mm(fold_t, n):
        t = jnp.floor(fold_t).reshape(gy, TILE_R, gx, TILE_C)
        return (t.min(axis=(1, 3)).astype(jnp.int32),
                t.max(axis=(1, 3)).astype(jnp.int32))

    folds = jnp.stack([yfold, xfold])      # one packed position operand

    yfmn, yfmx = _fold_floor_mm(yfold, ny)
    xfmn, xfmx = _fold_floor_mm(xfold, nx)
    me = 1
    mex = 1
    edge_y_t = ((yfmn <= me) | (yfmx >= ny - 2 - me)).astype(jnp.int32)
    edge_t = (edge_y_t
              | (xfmn <= mex) | (xfmx >= nx - 2 - mex)).astype(jnp.int32)

    # ---- escalation ladder: (wy, wx or None=full-x, capacity) ----
    # Tuned on flagship-final-step span histograms (ROUND2_NOTES): y spans
    # p50/p90/p99/max = 16/33/67/124, x spans p50/p90 = 144/838 with ~10%
    # of tiles (polar) genuinely spanning the whole circle.  MXU passes per
    # tile = 8*ceil(WX/128)*ceil(F*WY/128)*3, so tiers separate y- and
    # x-escalations to keep ceil products minimal.
    # NOTE on tier-A width: logical window starts are X_GRAN(=32)-aligned
    # via the lane-shifted copies, so a tier holds x spans up to
    # wx - home(129) - taps - 31.  The HOME mesh itself spans ~128.1
    # cells per tile (the quirk-Q4 N/(N-1) stretch), so (32, 256) is the
    # narrowest viable base tier.
    wy_cap = ((ny + 2 * ypad) // 8) * 8
    wx_cap = (nxp_c // 128) * 128
    if ladder is None and os.environ.get("LCS_LADDER"):
        # on-device cap-tuning hook: JSON [[wy, wx|null, cap], ...]
        # (null = full-x slab).  Read at trace time — one process per
        # config, as tools/tpu_contact.sh does.
        import json
        ladder = [(int(w), None if x is None else int(x), int(c))
                  for w, x, c in json.loads(os.environ["LCS_LADDER"])]
    if ladder is None:
        # capacities: a BLOCKSPEC tier launch costs its DMA/grid
        # machinery per SLOT, live or dead (~1.6 us/dead slot measured),
        # so blockspec caps are sized ~2x the flagship's per-step maxima
        # with tier A-sub active (offline plan census, max taken
        # [342, 37, 31, 27, 27, 44, 39, 85, 0]); overflow spills down
        # the ladder (the full-x tiers hold any x span), so tighter caps
        # trade a rare extra escalation hop, never exactness.  The
        # manual-DMA engines iterate LIVE slots only (dead capacity is
        # free — probe_dma: 0.42 ms fixed at n_live=0), so their caps
        # scale with the tile count instead: arbitrary flows (not just
        # the drift-accumulated flagship) must route without raising
        # overflow — e.g. an instant full-circle polar whirl escalates
        # hundreds of tiles in ONE step (tests_tpu flagship gather).
        if engine in ("dma", "dma-all"):
            n = n_tiles
            ladder = [
                (64, wx, max(384, n // 2)),      # y-stretched
                (32, 384, max(96, n // 4)),      # x-stretched mild
                (64, 384, max(96, n // 4)),      # both mild
                (32, retry_wx, max(64, n // 8)),     # x-stretched
                (retry_wy, retry_wx, max(64, n // 8)),   # both
                (128, 768, max(96, n // 4)),     # violent
                (32, None, max(96, n // 2)),     # polar full-circle
                (64, None, max(128, n // 2)),
                (192, None, max(16, n // 4)),    # polar + tall
            ]
        else:
            ladder = [
                (64, wx, 384),          # y-stretched
                (32, 384, 96),          # x-stretched mild
                (64, 384, 96),          # both mild
                (32, retry_wx, 64),     # x-stretched
                (retry_wy, retry_wx, 64),   # both
                (128, 768, 96),         # violent
                (32, None, 96),         # polar full-circle
                (64, None, 128),
                (192, None, 16),        # polar + tall (rare)
            ]
    ladder = [(min(wy_, wy_cap),
               None if wx_ is None else min(wx_, wx_cap), cap)
              for wy_, wx_, cap in ladder]
    # lowest tap offset after mirror remaps is mn-2 (order 3, fold >= n-1
    # case of _tap_offsets) / mn-1 (order 1); highest is mx+2
    m = 2 if order == 3 else 1

    # per-tile routing slack: interior tiles can only slip one cell
    # (edge_t's fold-jump hazard is excluded by construction), buying
    # several cells of effective window height/width.  The start slop
    # must be >= m + ulp or _fits' low-side test can fail when mn - slop
    # lands exactly on an alignment boundary.
    ulp_t = jnp.where(edge_t > 0, 2, 1)
    slop_t = m + ulp_t

    def fit_many(specs, ymn_f, ymx_f, xmn_f, xmx_f, slop_f, ulp_f):
        """Batched window routing for all (wy, wx) tier specs at once:
        one (T, gy, gx) op chain instead of a per-tier chain — the
        routing runs 5x per step, so per-op launch overhead adds up."""
        wy_a = jnp.asarray([s[0] for s in specs]).reshape(-1, 1, 1)
        ysb = jnp.clip(((ymn_f[None] - slop_f[None] + ypad) // 8) * 8, 0,
                       ((ny + 2 * ypad - wy_a) // 8) * 8)
        oky = (((ymn_f[None] - m - ulp_f[None]) >= ysb - ypad)
               & ((ymx_f[None] + 2 + ulp_f[None])
                  <= ysb - ypad + wy_a - 1))
        has_x = [s[1] is not None for s in specs]
        wx_a = jnp.asarray([s[1] if h else wx for s, h in
                            zip(specs, has_x)]).reshape(-1, 1, 1)
        xsb = jnp.clip(((xmn_f[None] - slop_f[None] + xpad) // X_GRAN)
                       * X_GRAN, 0,
                       ((nx + 2 * xpad - 128 - wx_a) // X_GRAN) * X_GRAN)
        okx = (((xmn_f[None] - m - ulp_f[None]) >= xsb - xpad)
               & ((xmx_f[None] + 2 + ulp_f[None])
                  <= xsb - xpad + wx_a - 1))
        return [(oky[i] & okx[i] if h else oky[i], ysb[i],
                 xsb[i] if h else None)
                for i, h in enumerate(has_x)]

    fit_specs = ([(wy, wx)] + [(t[0], t[1]) for t in ladder]
                 if retry_tiles > 0 else [(wy, wx)])
    all_fits = fit_many(fit_specs, ymn, ymx, xmn, xmx, slop_t, ulp_t)
    fitA, y0A, x0A = all_fits[0]

    # ---- tier A-sub routing: per-32-lane-sub-block tap spans and
    # (wy, 128) window starts (see _sub_tile_body); y uses tier A's
    # window/starts. ----
    # retry_tiles=0 callers expect pure-tier-A behavior (unfit tiles
    # clamp and flag); keep A-sub under the same switch.  LCS_HALF_TILE=0
    # is the on-device bisection hook (bench.py fallback, tpu_contact.sh):
    # A-sub has device-compile risk the blockspec tiers don't, so it must
    # be disableable without a code edit.  Read at trace time.
    half_tile = (half_tile and retry_tiles > 0
                 and os.environ.get("LCS_HALF_TILE", "1") != "0")

    def sub_fit(xfold_f, y0A_f, ymn_f, ymx_f, slop_f, ulp_f):
        """A-sub routing for one fold set: per-32-lane-sub-block tap
        spans, (wy, 128) window starts, and the combined fit mask
        (y uses tier A's window/starts)."""
        xt = xfold_f.reshape(gy, TILE_R, gx, N_SUB, _SUBW)
        anchor2 = xt[:, :1, :, :, :1]
        k2 = _unwrap_k(xt, anchor2, nx)
        f2 = jnp.floor(xt).astype(jnp.int32) + nx * k2
        xmn2 = jnp.min(f2, axis=(1, 4))                    # (gy,gx,NS)
        xmx2 = jnp.max(f2, axis=(1, 4))
        slop2 = slop_f[..., None]
        ulp2 = ulp_f[..., None]
        xs2 = jnp.clip(((xmn2 - slop2 + xpad) // X_GRAN) * X_GRAN, 0,
                       ((nx + 2 * xpad - 128 - 128) // X_GRAN) * X_GRAN)
        okx2 = (((xmn2 - m - ulp2) >= xs2 - xpad)
                & ((xmx2 + 2 + ulp2) <= xs2 - xpad + 128 - 1)).all(-1)
        oky_A = (((ymn_f - m - ulp_f) >= y0A_f - ypad)
                 & ((ymx_f + 2 + ulp_f) <= y0A_f - ypad + wy - 1))
        return oky_A & okx2, xs2

    fitA2 = jnp.zeros((gy, gx), bool)
    if half_tile:
        fitA2, xs2 = sub_fit(xfold, y0A, ymn, ymx, slop_t, ulp_t)

    common = dict(ny=ny, nx=nx, order=order)
    body = partial(_spline_tile_body)

    # ---- escalation tiers over compacted tile lists ----
    def run_tier(sel, count, cap, wy_, wx_, ys_full, xs, x_full, tbody,
                 tcommon, operand, ypad_t, xpad_t):
        """Run one escalation tier over its precomputed compacted tile
        list — ``sel``: (cap,) rank-ordered tile indices (0-filled tail),
        ``count``: live prefix length; both built for ALL tiers at once by
        the batched assignment below.  Returns (out+garbage-row, covered
        mask, residual in-kernel flag, per-tile flag map)."""
        # full-x tiles use the mirror-baked slab, so only the Y axis can
        # need the one-hot mirror path
        edge_src = edge_y_t if x_full else edge_t
        slot = jnp.arange(cap)
        live = slot < count
        iy = (sel // gx).astype(jnp.int32)
        jx = (sel - gx * (sel // gx)).astype(jnp.int32)
        # dead slots repeat slot 0's blocks → Mosaic skips their DMAs
        iy_d = jnp.where(live, iy, iy[0])
        jx_d = jnp.where(live, jx, jx[0])
        iy_out = jnp.where(live, iy, gy)          # garbage row for dead
        y0sel = jnp.where(live, ys_full[iy, jx], ys_full[iy[0], jx[0]])
        if x_full:
            x0sel = jnp.zeros((cap,), jnp.int32)
        else:
            x0sel = jnp.where(live, xs[iy, jx], xs[iy[0], jx[0]])
        edge_sel = edge_src[iy_d, jx_d]
        n_live = jnp.full((1,), count, jnp.int32)

        kern = partial(_list_kernel, body=tbody, F=F, WY=wy_, WX=wx_,
                       YPAD=ypad_t, XPAD=xpad_t, x_full=x_full,
                       common=tcommon)

        def wmap(i, nl, iyr, jxr, iyo, y0r, x0r, edr, f0r):
            if x_full:
                # mirror-baked slab (last copy), lane = fold+1, start 0
                return (X_COPIES, f0r[0], pl.multiple_of(y0r[i], 8), 0)
            x = x0r[i]
            # logical X_GRAN-aligned start -> (copy, 128-aligned start)
            return ((x % 128) // X_GRAN, f0r[0],
                    pl.multiple_of(y0r[i], 8),
                    pl.multiple_of((x // 128) * 128, 128))

        gridspec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,
            grid=(cap,),
            in_specs=[
                pl.BlockSpec((2, TILE_R, TILE_C),
                             lambda i, nl, iyr, jxr, iyo, y0r, x0r, edr,
                             f0r: (0, iyr[i], jxr[i]),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((pl.Element(1), pl.Element(F),
                              pl.Element(wy_), pl.Element(wx_)), wmap,
                             memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((F, TILE_R, TILE_C),
                                    lambda i, nl, iyr, jxr, iyo, y0r, x0r,
                                    edr, f0r: (0, iyo[i], jxr[i]),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((cap, 1), lambda i, *_: (0, 0),
                                    memory_space=pltpu.SMEM)],
        )
        out_t, flags_t = pl.pallas_call(
            kern, grid_spec=gridspec,
            out_shape=[jax.ShapeDtypeStruct((F, ny_t + TILE_R, nx_t), dtype),
                       jax.ShapeDtypeStruct((cap, 1), jnp.int32)],
            interpret=interpret,
            compiler_params=_CPARAMS,
        )(n_live, iy_d, jx_d, iy_out, y0sel, x0sel, edge_sel, f0_arr,
          folds, operand)
        covered = jnp.zeros((gy + 1, gx), jnp.int32).at[iy_out, jx_d].max(
            live.astype(jnp.int32))[:gy] > 0
        live_flags = flags_t[:, 0] * live.astype(jnp.int32)
        resid = jnp.max(live_flags)
        fmap = jnp.zeros((gy + 1, gx), jnp.int32).at[iy_out, jx_d].max(
            live_flags)[:gy]
        return out_t, covered, resid, fmap

    # ---- routing-only cascade: decide every tier's tile set in XLA
    # BEFORE any launch, batched over tiers.  The former per-tier
    # cumsum+nonzero cascade built 6-9 small op chains per gather group
    # (~120 glue ops x 160 groups/scan); here every tile is assigned to
    # the FIRST ladder tier that fits it with remaining capacity in 3
    # batched passes over one (T, n_tiles) stack, and all tiers'
    # compacted slot lists come from ONE scatter.  Semantics vs the old
    # sequential cascade: identical whenever no tier overflows its cap
    # (the census-sized default — caps carry 2x margins); under extreme
    # contention a tile spilling more than twice goes uncovered (tier-A
    # clamped values + overflow bit 1) instead of probing further tiers —
    # the flag fires either way, exactness is never silently lost.
    # Knowing the final uncovered set without launching anything lets
    # each tier launch AND merge under one lax.cond, skipped entirely on
    # the (common) empty case: an empty launch still costs ~0.1 ms, and
    # an unconditional merge streams the full output array per tier. ----
    overflow = jnp.zeros((), jnp.int32)

    def assign_plan(lad_fits, fit_base_f):
        """3-pass batched first-fit over one fold set's ladder fits;
        returns ([(sel, cnt, ys, xs, wy, wx, cap)] per tier, covered
        mask, uncovered count)."""
        plan_f = []
        T_n = len(ladder)
        caps_l = [min(t[2], n_tiles) for t in ladder]
        caps_j = jnp.asarray(caps_l, jnp.int32)[:, None]
        fits_T = jnp.stack([f.ravel() for (f, _, _) in lad_fits])
        elig = fits_T & (~fit_base_f).ravel()[None]
        t_iota = jax.lax.broadcasted_iota(jnp.int32, elig.shape, 0)
        assigned = jnp.zeros((n_tiles,), bool)
        tried = jnp.zeros_like(elig)
        taken_T = jnp.zeros_like(elig)
        rank_T = jnp.zeros(elig.shape, jnp.int32)
        cnt = jnp.zeros((T_n,), jnp.int32)
        for _ in range(min(3, T_n)):
            avail = elig & ~tried & ~assigned[None]
            first = jnp.argmax(avail, axis=0)
            oh = (t_iota == first[None]) & avail
            rank = jnp.cumsum(oh.astype(jnp.int32), axis=1) - 1 \
                + cnt[:, None]
            take = oh & (rank < caps_j)
            taken_T = taken_T | take
            rank_T = jnp.where(take, rank, rank_T)
            cnt = cnt + jnp.sum(take, axis=1)
            assigned = assigned | jnp.any(take, axis=0)
            tried = tried | oh
        covered_f = jnp.any(taken_T, axis=0).reshape(gy, gx)
        # ONE scatter builds every tier's rank-ordered slot list (the
        # stable tile-index order the former per-tier nonzero produced);
        # unassigned entries dump into a spare trailing slot
        maxcap = max(caps_l)
        tile_iota = jax.lax.broadcasted_iota(jnp.int32, elig.shape, 1)
        dst = jnp.where(taken_T, t_iota * maxcap + rank_T, T_n * maxcap)
        sel_all = jnp.zeros((T_n * maxcap + 1,), jnp.int32).at[
            dst.ravel()].set(tile_iota.ravel())[:-1].reshape(T_n, maxcap)
        for t_i, ((wy_, wx_, _cap), (fitT, ysT, xsT)) in enumerate(
                zip(ladder, lad_fits)):
            plan_f.append((sel_all[t_i, :caps_l[t_i]], cnt[t_i],
                           ysT, xsT, wy_, wx_, caps_l[t_i]))
        uncov_f = jnp.sum((~fit_base_f) & (~covered_f))
        taken_maps_f = [taken_T[t].reshape(gy, gx)
                        for t in range(T_n)]
        return plan_f, covered_f, uncov_f, taken_maps_f

    tier_plan = []
    covered = jnp.zeros((gy, gx), bool)
    fit_base = fitA | fitA2
    if retry_tiles > 0 and len(ladder):
        tier_plan, covered, uncovered, taken_maps = assign_plan(
            all_fits[1:], fit_base)
        # bit 1: some tile fit no tier (or every holding tier was full) —
        # it keeps tier-A clamped values.  The overflow word is a
        # diagnostic bitmask; callers test nonzero.
        overflow = overflow | ((uncovered > 0).astype(jnp.int32) << 1)
    elif retry_tiles > 0:
        uncovered = jnp.sum(~fit_base)
        overflow = overflow | ((uncovered > 0).astype(jnp.int32) << 1)

    # ---- tier A: 2-D grid over all tiles; unrouted/uncovered tiles also
    # run here (clamped windows, flag raised by the in-kernel check).
    # Bit 1 of liveA carries the per-tile mirror-edge flag.  Tiles taken
    # by the cheaper A-half tier are excluded. ----
    liveA = ((fitA | ~covered) & ~fitA2).astype(jnp.int32) \
        * (1 + 2 * edge_t)
    # engine='dma-all' absorbs tier A itself into the manual-DMA engine
    # (tier A is ALL-live — ~n_tiles slots per gather group — so if the
    # engine's per-live-slot cost beats the grid pipeline's per-slot
    # machinery, the biggest fixed pool moves too); its tiles become the
    # engine's first section and its in-kernel flag keeps bit 2.
    absorb_A = engine == "dma-all" and not debug_flags
    kernA = partial(_grid_kernel, body=body, F=F, WY=wy, WX=wx,
                    YPAD=ypad, XPAD=xpad, x_full=False, common=common)
    gridA = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(gy, gx),
        in_specs=[
            pl.BlockSpec((2, TILE_R, TILE_C),
                         lambda i, j, *_: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pl.Element(1), pl.Element(F), pl.Element(wy),
                          pl.Element(wx)),
                         # dead tiles pin their window to offset 0 so
                         # consecutive dead grid steps request the same
                         # block (skippable DMA)
                         lambda i, j, lv, y0r, x0r, f0r:
                         (((xd := jnp.where(lv[i, j] > 0, x0r[i, j], 0))
                           % 128) // X_GRAN, f0r[0],
                          pl.multiple_of(
                              jnp.where(lv[i, j] > 0, y0r[i, j], 0), 8),
                          pl.multiple_of((xd // 128) * 128, 128)),
                         memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((F, TILE_R, TILE_C),
                                lambda i, j, *_: (0, i, j),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((gy, gx), lambda i, j, *_: (0, 0),
                                memory_space=pltpu.SMEM)],
    )
    if absorb_A:
        flagsA = jnp.zeros((gy, gx), jnp.int32)
        out_arr = jnp.zeros((F, ny_t, nx_t), dtype)
    else:
        outA, flagsA = pl.pallas_call(
            kernA, grid_spec=gridA,
            out_shape=[jax.ShapeDtypeStruct((F, ny_t, nx_t), dtype),
                       jax.ShapeDtypeStruct((gy, gx), jnp.int32)],
            interpret=interpret,
            compiler_params=_CPARAMS,
        )(liveA, y0A, x0A, f0_arr, folds, cw_pad)
        overflow = overflow | \
            (jnp.max(flagsA * (liveA > 0).astype(jnp.int32)) << 2)
        out_arr = outA

    # ---- tier A-sub: 2-D grid over all tiles, gated to fitA2 (absorbed
    # into the manual-DMA engine with engine='dma-all') ----
    if half_tile and not absorb_A:
        live2 = fitA2.astype(jnp.int32) * (1 + 2 * edge_t)
        kern2 = partial(_sub_grid_kernel, F=F, WY=wy, YPAD=ypad,
                        XPAD=xpad,
                        common=dict(ny=ny, nx=nx, order=order))

        def wmap2(q):
            return (lambda i, j, lv, y0r, x0q, f0r:
                    (((xd := jnp.where(lv[i, j] > 0, x0q[i, j, q], 0))
                      % 128) // X_GRAN, f0r[0],
                     pl.multiple_of(
                         jnp.where(lv[i, j] > 0, y0r[i, j], 0), 8),
                     pl.multiple_of((xd // 128) * 128, 128)))

        win_specs = [
            pl.BlockSpec((pl.Element(1), pl.Element(F),
                          pl.Element(wy), pl.Element(128)),
                         wmap2(q), memory_space=pltpu.VMEM)
            for q in range(N_SUB)]
        grid2 = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(gy, gx),
            in_specs=[
                pl.BlockSpec((2, TILE_R, TILE_C),
                             lambda i, j, *_: (0, i, j),
                             memory_space=pltpu.VMEM)] + win_specs,
            out_specs=[pl.BlockSpec((F, TILE_R, TILE_C),
                                    lambda i, j, *_: (0, i, j),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((gy, gx), lambda i, j, *_: (0, 0),
                                    memory_space=pltpu.SMEM)],
        )
        outA2, flagsA2 = pl.pallas_call(
            kern2, grid_spec=grid2,
            out_shape=[jax.ShapeDtypeStruct((F, ny_t, nx_t), dtype),
                       jax.ShapeDtypeStruct((gy, gx), jnp.int32)],
            interpret=interpret,
            compiler_params=_CPARAMS,
        )(live2, y0A, xs2, f0_arr, folds,
          cw_pad, cw_pad, cw_pad, cw_pad)
        mask2 = jnp.repeat(jnp.repeat(fitA2, TILE_R, 0), TILE_C, 1)
        out_arr = jnp.where(mask2[None], outA2, out_arr)
        overflow = overflow | \
            (jnp.max(flagsA2 * (live2 > 0).astype(jnp.int32)) << 2)

    # ---- escalation tiers ----
    tier_fmaps = []
    use_engine = absorb_A \
        or (engine == "dma" and tier_plan and not debug_flags)
    if use_engine:
        # manual-DMA engine: one launch for all tiers' live slots,
        # writing in place into tier A's output (see _engine_kernel)
        sel_l, pack_l, x0q2_l = [], [], []
        counts_l = []
        tiers_static = []
        flag_bits = []
        seg_off = []
        off = 0
        # edge-class split (see _spline_tile_body ``path``): each
        # section becomes an interior half and an edge half over the
        # same capacity, so the loop bodies compile single-path
        eflat_t = (edge_t.ravel() != 0)
        eflat_y = (edge_y_t.ravel() != 0)

        def esplit(selT, cntT, cap, eflat):
            live = jnp.arange(cap) < cntT
            e = jnp.take(eflat, selT) & live
            i = (~e) & live
            sel_i = jnp.take(selT, jnp.nonzero(
                i.astype(jnp.int32), size=cap, fill_value=0)[0])
            sel_e = jnp.take(selT, jnp.nonzero(
                e.astype(jnp.int32), size=cap, fill_value=0)[0])
            return ((sel_i, jnp.sum(i.astype(jnp.int32))),
                    (sel_e, jnp.sum(e.astype(jnp.int32))))
        # packed-operand bit budget: y0 (bits 16..30, int32 sign bit must
        # stay clear) needs < 2^15, x0 (bits 2..15) < 2^14
        assert ny + 2 * ypad < (1 << 15) and nxp_c < (1 << 14), \
            (ny, ypad, nxp_c)
        if absorb_A:
            # ---- batched section assignment (dma-all): every tile
            # belongs to EXACTLY one edge-class-split section (A-int,
            # A-edge, [sub-int, sub-edge,] tier_i-int/edge: liveA,
            # fitA2 and the assign_plan taken sets are disjoint by
            # construction), so ONE per-tile section-id map + one
            # cumsum rank + one scatter build every slot list — this
            # replaced ~16 per-section nonzero compactions of XLA glue.
            # pack/x0q2 then GATHER from per-tile window maps. ----
            # the tile scatter below spans the TILE sections only; the
            # merged pole sections are appended to the layout and the
            # packed operands afterwards (their slot ids live in their
            # own 0..S space, not the tile-index space)
            tiers_static, caps_list, seg_off, flag_bits, off = \
                _engine_layout([(t[0], t[1], t[2]) for t in ladder],
                               n_tiles, half_tile, wy, wx)
            eT = edge_t != 0
            eY = edge_y_t != 0
            win_y0 = y0A.astype(jnp.int32)
            win_x0 = x0A.astype(jnp.int32)
            fullx_m = jnp.zeros((gy, gx), bool)
            sec = eT.astype(jnp.int32)              # A-int=0 / A-edge=1
            base_s = 2
            if half_tile:
                sec = jnp.where(fitA2, 2 + eT.astype(jnp.int32), sec)
                base_s = 4
            for t_i, ((wy_t_, wx_t_, _cap), (fitT, ysT, xsT), tk) in \
                    enumerate(zip(ladder, all_fits[1:], taken_maps)):
                e_cls = (eY if wx_t_ is None else eT).astype(jnp.int32)
                sec = jnp.where(tk, base_s + 2 * t_i + e_cls, sec)
                win_y0 = jnp.where(tk, ysT.astype(jnp.int32), win_y0)
                if xsT is None:
                    fullx_m = fullx_m | tk
                else:
                    win_x0 = jnp.where(tk, xsT.astype(jnp.int32),
                                       win_x0)
            S_n = len(tiers_static)
            secf = sec.ravel()
            onehot_s = secf[None, :] == jnp.arange(S_n)[:, None]
            rank_s = jnp.cumsum(onehot_s.astype(jnp.int32), axis=1) - 1
            rank_t = jnp.take_along_axis(rank_s, secf[None, :],
                                         axis=0)[0]
            caps_j = jnp.asarray(caps_list, jnp.int32)
            cap_t = jnp.take(caps_j, secf)
            seg_j = jnp.asarray(seg_off, jnp.int32)
            okc = rank_t < cap_t
            dst = jnp.where(okc, jnp.take(seg_j, secf) + rank_t, off)
            tile_iota = jnp.arange(n_tiles, dtype=jnp.int32)
            sel_cat = jnp.zeros((off + 1,), jnp.int32).at[dst].set(
                tile_iota)[:-1]
            counts_arr = jnp.sum(onehot_s & okc[None, :], axis=1
                                 ).astype(jnp.int32)
            # per-tile packed operand maps
            x0_eff = jnp.where(fullx_m | (fitA2 if half_tile
                                          else jnp.zeros((gy, gx),
                                                         bool)),
                               0, win_x0)
            pack_map = ((win_y0 << 16) | (x0_eff << 2)
                        | eT.astype(jnp.int32))
            pack_cat = jnp.take(pack_map.ravel(), sel_cat)
            if half_tile:
                xsq = xs2.astype(jnp.int32)
                x0q2_map = jnp.stack(
                    [xsq[..., 0] | (xsq[..., 1] << 16),
                     xsq[..., 2] | (xsq[..., 3] << 16)],
                    axis=-1).reshape(n_tiles, 2)
            else:
                x0q2_map = jnp.zeros((n_tiles, 2), jnp.int32)
            x0q2_cat = jnp.take(x0q2_map, sel_cat, axis=0).reshape(-1)
        else:
            # engine='dma': ladder sections only, per-section esplit
            plan = []
            for t_i, (selT, cntT, ysT, xsT, wy_, wx_, cap) in \
                    enumerate(tier_plan):
                (s_i, c_i), (s_e, c_e) = esplit(
                    selT, cntT, cap, eflat_y if wx_ is None else eflat_t)
                plan.append(("spline", s_i, c_i, ysT, xsT, None, wy_,
                             wx_, cap, 5 + t_i, "interior"))
                plan.append(("spline", s_e, c_e, ysT, xsT, None, wy_,
                             wx_, cap, 5 + t_i, "onehot"))
            for (kind, selT, cntT, ysT, xsT, xqT, wy_, wx_, cap,
                 bit, path_s) in plan:
                iyT = (selT // gx).astype(jnp.int32)
                jxT = (selT - gx * iyT).astype(jnp.int32)
                sel_l.append(selT.astype(jnp.int32))
                y0v = ysT[iyT, jxT].astype(jnp.int32)
                x0v = (jnp.zeros((cap,), jnp.int32) if xsT is None
                       else xsT[iyT, jxT].astype(jnp.int32))
                edv = (edge_y_t if (wx_ is None and kind == "spline")
                       else edge_t)[iyT, jxT].astype(jnp.int32)
                pack_l.append((y0v << 16) | (x0v << 2) | edv)
                if xqT is None:
                    x0q2_l.append(jnp.zeros((cap, 2), jnp.int32))
                else:
                    xq = xqT[iyT, jxT].astype(jnp.int32)
                    x0q2_l.append(jnp.stack(
                        [xq[:, 0] | (xq[:, 1] << 16),
                         xq[:, 2] | (xq[:, 3] << 16)], axis=1))
                counts_l.append(cntT)
                tiers_static.append((kind, wy_, wx_, path_s))
                flag_bits.append(bit)
                seg_off.append(off)
                off += cap
            counts_arr = jnp.stack(counts_l).astype(jnp.int32)
            sel_cat = jnp.concatenate(sel_l)
            pack_cat = jnp.concatenate(pack_l)
            x0q2_cat = jnp.concatenate(x0q2_l, axis=0).reshape(-1)
        assert all(len(t) == 4 for t in tiers_static)
        pole_vals_m = None
        if pole_merge is not None:
            assert absorb_A     # guaranteed by the dma-all gate above
            S_p = pole_merge["S"]
            sel_p, pack_p_l, cnt_p = [], [], []
            for a_, ys_ in zip(pole_merge["assigns"], pole_merge["ys"]):
                s_ = jnp.nonzero(a_, size=S_p, fill_value=0)[0].astype(
                    jnp.int32)
                sel_p.append(s_)
                pack_p_l.append(jnp.take(ys_, s_) << 16)
                cnt_p.append(jnp.sum(a_.astype(jnp.int32)))
            sel_cat = jnp.concatenate([sel_cat] + sel_p)
            pack_cat = jnp.concatenate([pack_cat] + pack_p_l)
            x0q2_cat = jnp.concatenate(
                [x0q2_cat, jnp.zeros((S_p * 6,), jnp.int32)])
            counts_arr = jnp.concatenate(
                [counts_arr, jnp.stack(cnt_p).astype(jnp.int32)])
            for wy_p in pole_merge["wys"]:
                tiers_static.append(("pole", wy_p, None, "pole"))
                flag_bits.append(4)
                seg_off.append(off)
                off += S_p
            res_e = _launch_engine(
                counts_arr, sel_cat, pack_cat, x0q2_cat, f0_arr,
                folds, cw_pad, out_arr, body=body, F=F,
                tiers_static=tiers_static, seg_off=seg_off, ypad=ypad,
                xpad=xpad, wx_full=wx_full, common=common, gx=gx,
                dtype=dtype, ny_t=ny_t, nx_t=nx_t, interpret=interpret,
                pole=dict(raw_p=pole_merge["raw_p"],
                          pack_p=pole_merge["pack_p"], S=S_p))
            out_arr, eflags, pole_vals_m = res_e
        else:
            out_arr, eflags = _launch_engine(
                counts_arr, sel_cat, pack_cat, x0q2_cat, f0_arr,
                folds, cw_pad, out_arr, body=body, F=F,
                tiers_static=tiers_static, seg_off=seg_off, ypad=ypad,
                xpad=xpad, wx_full=wx_full, common=common, gx=gx,
                dtype=dtype, ny_t=ny_t, nx_t=nx_t, interpret=interpret)
        for t_i in range(len(tiers_static)):
            overflow = overflow | (eflags[t_i, 0] << flag_bits[t_i])
        tier_plan = []

    for t_i, (selT, cntT, ysT, xsT, wy_, wx_, cap) in enumerate(tier_plan):
        xsT_c = jnp.zeros((gy, gx), jnp.int32) if xsT is None else xsT

        def go(selT, cntT, ysT, xsT_c, out_arr, wy_=wy_, wx_=wx_, cap=cap):
            out_t, cov, resid, fmap = run_tier(
                selT, cntT, cap, wy_, wx_full if wx_ is None else wx_,
                ysT, xsT_c, wx_ is None, body, common, cw_pad,
                ypad, xpad)
            mask = jnp.repeat(jnp.repeat(cov, TILE_R, 0), TILE_C, 1)
            return (jnp.where(mask[None], out_t[:, :ny_t], out_arr),
                    resid, fmap)

        def skip(selT, cntT, ysT, xsT_c, out_arr):
            return (out_arr, jnp.zeros((), jnp.int32),
                    jnp.zeros((gy, gx), jnp.int32))

        out_arr, resid, fmap = jax.lax.cond(
            cntT > 0, go, skip, selT, cntT, ysT, xsT_c, out_arr)
        tier_fmaps.append(fmap)
        overflow = overflow | (resid << (5 + t_i))

    # ---- pole-home rows: order-1 mode='constant' on the raw fields,
    # keyed on HOME row (/root/reference/LCS/tools.py:31-39).  The
    # 2*order pole home rows are evaluated as flat per-side point lists
    # SORTED by y0 (the floor of the clipped direct y index): each
    # (TILE_R, TILE_C)-point slot of a sorted list spans a handful of
    # consecutive field rows, so a SHORT full-longitude window serves it
    # regardless of how chaotically the rows' y positions diverge over
    # the integration.  Full-x is structural (pole x positions are
    # decorrelated over the whole circle — the 1/cos conv_x blowup,
    # /root/reference/LCS/trajectory.py:56); the one-hot-matmul cost is
    # M*WXS*F*WY per slot, so the y window height is the ONLY cost
    # lever — sorting holds it at POLE_LADDER[0] instead of the
    # O(drift) spans of the home-layout blocks (the former merged-N+S
    # slab ladder escalated to 288-row windows in ~80% of flagship
    # steps once rows drifted past its wrap pad: ~0.3-0.4 s/field). ----
    pole_flag = jnp.zeros((), jnp.int32)
    # ``skip_pole``: the caller owns the pole-home rows (models/settls.py
    # hoisted per-step pole loop) — the spline path still substitutes
    # their positions (safe_idx above), but the pole machinery (sorted
    # point lists + ladder launches, ~1 ms of XLA glue per gather group)
    # does not run and the pole-home OUTPUT rows carry spline values the
    # caller must overwrite.
    if order > 0 and not skip_pole:
        # candidate block rows for the 2*order pole HOME rows: shards
        # hold a contiguous home-row range starting at home_rows[0], so
        # home row h lives at block row h - home_rows[0].  A candidate
        # only counts (mask_b) when its home row actually matches;
        # clipped / out-of-shard candidates evaluate harmlessly (the
        # clipped block row's positions are valid field positions) and
        # are discarded by the is_pole scatter.  Duplicated candidates
        # (ny <= 2*order, or shard clipping) evaluate identical values,
        # so their overlapping scatter writes are benign.
        exp_s = np.r_[max(ny - order, 0):ny]
        exp_s = np.pad(exp_s, (0, order - exp_s.size), mode="edge")
        exp2 = jnp.asarray(np.stack([np.r_[0:order], exp_s]), jnp.int32)
        hr0 = (jnp.zeros((), jnp.int32) if home_rows is None
               else home_rows[0, 0].astype(jnp.int32))
        idx2 = jnp.clip(exp2 - hr0, 0, R - 1)     # (2, order) block rows
        px_b = jnp.take(px, idx2.ravel(), axis=0)      # (2*order, nx)
        py_b = jnp.take(py, idx2.ravel(), axis=0)
        if home_rows is None:
            hr_b = idx2
        else:
            hr_b = jnp.take(home_rows[:, 0].astype(jnp.int32),
                            idx2.ravel()).reshape(2, order)
        mask_b = hr_b == exp2                     # (2, order)

        ny_tf = _cdiv(ny, TILE_R) * TILE_R     # field-side row tiling
        pad_rows = ny_tf + POLE_PAD - ny
        ny_p = ny + pad_rows
        if raw_prepadded:
            assert raw.shape[-2:] == (ny_p, nx_t), (raw.shape, ny_p, nx_t)
            raw_p = raw
        else:
            # y-wrap padding (slab rows ny..ny_p replicate field rows
            # 0..pad): unread by the raw-index pole windows (taps clip
            # to yc <= ny-1 and the row-(ny-y0) linear weight is 0 when
            # yc == ny-1 exactly), but keeps the raw_prepadded slab
            # contract and gives tall windows clip headroom
            # (ys <= ny_p - WY)
            wrap = jnp.take(raw, jnp.arange(pad_rows) % ny, axis=1)
            raw_p = jnp.pad(jnp.concatenate([raw, wrap], axis=1),
                            ((0, 0), (0, 0), (0, nx_t - nx)))
        blk_rows, pole_flag = _pole_eval_block(
            px_b, py_b, mask_b, raw_p, f0_arr, F=F, order=order,
            ny=ny, nx=nx, nx_t=nx_t, ny_p=ny_p, dtype=dtype,
            x_min=x_min, x_max=x_max, y_min=y_min, y_max=y_max,
            interpret=interpret)
        pole_vals = out_arr.at[:, idx2.ravel()].set(blk_rows)
        if home_rows is None:
            row = jax.lax.broadcasted_iota(jnp.int32, (ny_t, nx_t), 0)
            is_pole = (row < order) | ((row >= ny - order) & (row < ny))
        else:
            hm = (home_rows < order) | (home_rows >= ny - order)
            hm = jnp.pad(hm, ((0, ny_t - R), (0, 0)), mode="edge")
            is_pole = jnp.broadcast_to(hm, (ny_t, nx_t))
        out_arr = jnp.where(is_pole[None], pole_vals, out_arr)
        overflow = overflow | pole_flag

    out = out_arr[:, :R, :nx]
    if pole_merge is not None:
        # sorted-rank pole values ride back beside the main block; the
        # caller (models/settls.py) owns the un-sort, exactly as for the
        # standalone presorted pole_block call
        return out, pole_vals_m.reshape(F, 2, pole_merge["Mpad"]), \
            overflow
    if debug_flags:
        return out, dict(
            overflow=overflow,
            tiles_escalated=jnp.sum(~fitA),
            uncovered=jnp.sum((~fitA) & (~covered)),
            _uncov_map=(~fitA) & (~covered),
            _fitA=fitA,
            # per-tier live tile counts (the plan stores compacted slot
            # lists, not masks; consumers only ever counted the mask)
            _tier_taken=[t[1] for t in tier_plan],
            _spans=(ymn, ymx, xmn, xmx),
            _edge=edge_t,
            tierA_resid=jnp.max(flagsA * (liveA > 0).astype(jnp.int32)),
            pole_flag=pole_flag,
            _tier_fmaps=tier_fmaps,
            _pflags=pflags1 if order > 0 else None,
            _pfit=fit1 if order > 0 else None,
            _pcov=covP if order > 0 else None)
    return out, overflow
