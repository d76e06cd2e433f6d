"""Pallas TPU kernel: banded-matmul bilinear line sampling (+ derivatives).

Motivation (PERF.md): XLA:TPU lowers the sampler's gathers to a per-element
path running at ~1% of HBM bandwidth; the finest-level solver round dominates
eval time.  The S2GP geo projection has exploitable structure: the
ground-plane depth w(v) is constant per ground row, so every ground row
samples the satellite map along a *straight line*, affine in the column
index u:

    uv(v, u) = A(v) + u * B(v).

One (batch, ground-row) per grid program:

  1. DMA a row band (static height RB, full width) of the satellite map
     HBM -> VMEM at a runtime row offset;
  2. integer-shear the band per column so the line becomes ~horizontal
     (4 sheared rows suffice whenever |dy/dx| = |tan(heading-ish)| < 1);
  3. emit bilinear value, d/dx and d/dy as 12 banded [W, A] x [A, C]
     matmuls on the MXU (band weights from iota arithmetic on the VPU).

Bilinear semantics (incl. the reference's exact-integer-edge weight quirk
and in-bounds mask, /root/reference/jacobian.py:138-205) are preserved;
parity vs ops.grid_sample is tested in tests/test_banded_warp.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# row-chunk size for the shear contraction (bounds the [chunk, A, C] temp)
_SHEAR_CHUNK = 8

# coef lanes per row (ax, bx, ay, by, slope, oy, n_chunks, pad).  The
# scalar-prefetch operand is passed FLATTENED to [B, V*8]: a [B, V, 8]
# SMEM operand gets its minor dim padded 8 -> 128 (16x), which blows the
# 1MB SMEM budget at batch*hypotheses >= 32.
_NCOEF = 8


def _cread(coef_ref, b, v, i: int):
    """Read coef lane i of row (b, v) from the flattened [B, V*8] SMEM ref."""
    return coef_ref[b, v * _NCOEF + i]


# feature channels per pyramid slot (coarse /8 ... fine /1; VGGUnet decoder)
SLOT_CHANNELS = (256, 128, 64, 16)


def default_rb(A: int) -> int:
    """Production window height for an AxA map: covers the in-bounds
    vertical span at |heading| <= 25 deg (A*tan(25 deg) + floor margin),
    8-aligned, capped at A.  The single source of truth — the models and
    the perf scripts must size their kernels identically or PERF.md
    numbers stop corresponding to the shipped path."""
    return min(A, ((int(A * 0.47) + 13) // 8) * 8)


def _weights(coef_ref, b, v, *, W: int, A: int, col0=None, ncols=None):
    """Shared per-row weight construction (forward and backward kernels).

    ``col0``/``ncols`` restrict the map-column extent to a block (backward
    accumulator blocking); default = all A columns.  Returns
    (wx, dwx [W, ncols]; gy/dgy builders via rel; sj [1, ncols]; m [W];
    fy [W]; oy_f scalar)."""
    if ncols is None:
        ncols = A
    ax = _cread(coef_ref, b, v, 0)
    bx = _cread(coef_ref, b, v, 1)
    ay = _cread(coef_ref, b, v, 2)
    by = _cread(coef_ref, b, v, 3)
    slope = _cread(coef_ref, b, v, 4)
    oy_f = _cread(coef_ref, b, v, 5)

    u = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0]
    u = u.astype(jnp.float32)
    x = ax + bx * u
    y = ay + by * u

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    mask = ((x >= 0) & (x <= A - 1) & (y >= 0) & (y <= A - 1))
    quirk = ((x0f < A - 1) & (y0f < A - 1)).astype(jnp.float32)
    m = mask.astype(jnp.float32) * quirk

    j = jax.lax.broadcasted_iota(jnp.int32, (W, ncols), 1).astype(jnp.float32)
    if col0 is not None:
        j = j + jnp.float32(col0) if isinstance(col0, (int, float)) \
            else j + col0.astype(jnp.float32)
    x0b = x0f[:, None]
    hit0 = (j == x0b).astype(jnp.float32)
    hit1 = (j == (x0b + 1.0)).astype(jnp.float32)
    # the in-bounds mask folds into wx/dwx once (every downstream weight
    # matrix is a product with one of them)
    mb = m[:, None]
    wx = ((1.0 - fx)[:, None] * hit0 + fx[:, None] * hit1) * mb
    dwx = (hit1 - hit0) * mb

    jcols = j[:1]
    yj = ay + (jcols - ax) * slope
    sj = jnp.floor(yj)
    rel = y0f[:, None] - sj + 1.0
    return wx, dwx, rel, fy, sj, m, oy_f


def _row_weight_mats4(wx, dwx, rel, fy, *, with_dxy: bool = True):
    """The 4 banded weight matrices (value, d/dx, d/dy, d2/dxdy), each
    [W, ncols], for ALL four sheared rows r = 0..3 in one pass.

    Rows r and r+1 share the one-hot ``(rel == r)``: building the five
    distinct comparisons once cuts the [W, ncols] compare count from 8 to
    5, and ``with_dxy=False`` skips the d2/dxdy product entirely (the
    backward and eval-moment paths discard it).  The per-row arithmetic is
    identical to the unfused form, so results are bit-equal.
    ``wx``/``dwx`` already carry the mask."""
    h = [(rel == float(k)).astype(jnp.float32) for k in range(-1, 4)]
    a = (1.0 - fy)[:, None]
    b = fy[:, None]
    mats = []
    for r in range(4):
        is_r0, is_r1 = h[r + 1], h[r]
        gy = a * is_r0 + b * is_r1
        dgy = -is_r0 + is_r1
        mats.append((wx * gy, dwx * gy, wx * dgy,
                     dwx * dgy if with_dxy else None))
    return mats


def _shear_rows4(read_chunk, sj, oy_f, *, RB: int, A: int, C: int,
                 cfirst: bool, n_chunks=None):
    """Extract all four sheared rows (r = 0..3) in ONE chunk scan.

    Identical per-row accumulation order to four _shear_row calls (so the
    result is bit-identical), but each chunk is read from VMEM and its row
    iota built ONCE instead of four times — the chunk loads were ~40% of the
    shear scan's data movement (round-4 VPU-bound finding, PERF.md)."""
    tgt0 = sj - oy_f - 1.0  # target row for r = 0; r adds +r
    if n_chunks is None:
        n_chunks = RB // _SHEAR_CHUNK
    shape = (C, A) if cfirst else (A, C)
    init = tuple(jnp.zeros(shape, jnp.float32) for _ in range(4))

    def chunk_body(ci, shs):
        base = ci * _SHEAR_CHUNK
        rr = (jax.lax.broadcasted_iota(jnp.int32, (_SHEAR_CHUNK, A), 0)
              .astype(jnp.float32) + base.astype(jnp.float32))
        rel = rr - tgt0                                    # [chunk, A]
        wchunk = read_chunk(base)            # [chunk, C, A] | [chunk, A, C]
        outs = []
        for r in range(4):
            sel = (rel == float(r)).astype(jnp.float32)
            if cfirst:
                outs.append(shs[r] + jnp.sum(sel[:, None, :] * wchunk,
                                             axis=0))
            else:
                outs.append(shs[r] + jnp.sum(sel[:, :, None] * wchunk,
                                             axis=0))
        return tuple(outs)

    return jax.lax.fori_loop(0, n_chunks, chunk_body, init)


_DN_CFIRST = (((1,), (1,)), ((), ()))  # [W, A] x [C, A] -> [W, C]


def _kernel(coef_ref, sat_ref, out_ref, dx_ref, dy_ref, *rest,
            RB: int, W: int, A: int, C: int, cfirst: bool,
            with_dxy: bool = True):
    """Forward: coef_ref scalar-prefetched SMEM f32, FLATTENED to [B, V*8]
    (see _NCOEF; read via _cread) — lanes per row are
    (ax, bx, ay, by, slope, oy, n_chunks, pad); sat_ref [B, A, A, C] HBM (or
    [B, A, C, A] when ``cfirst``); out/dx/dy[/dxy] [1, 1, W, C] VMEM blocks.
    ``with_dxy=False`` (the non-differentiated eval path) skips the cross-
    derivative output and its 4 banded matmuls."""
    if with_dxy:
        dxy_ref, win_ref, sem = rest
    else:
        dxy_ref, (win_ref, sem) = None, rest
    b = pl.program_id(0)
    v = pl.program_id(1)

    oy_f = _cread(coef_ref, b, v, 5)
    oy = oy_f.astype(jnp.int32)
    cp = pltpu.make_async_copy(sat_ref.at[b, pl.ds(oy, RB)], win_ref, sem)
    cp.start()

    wx, dwx, rel, fy, sj, m, _ = _weights(coef_ref, b, v, W=W, A=A)
    nck = _cread(coef_ref, b, v, 6).astype(jnp.int32)

    cp.wait()

    def read_chunk(base):
        return win_ref[pl.ds(base, _SHEAR_CHUNK)]

    _accumulate_rows(read_chunk, oy_f, wx, dwx, rel, fy, sj, m,
                     out_ref, dx_ref, dy_ref, dxy_ref,
                     RB=RB, W=W, A=A, C=C, cfirst=cfirst, n_chunks=nck)


def _kernel_fullmap(coef_ref, sat_ref, out_ref, dx_ref, dy_ref, *rest,
                    RB: int, W: int, A: int, C: int, cfirst: bool,
                    with_dxy: bool = True):
    """Full-map forward variant: the whole satellite level rides in VMEM as a
    blocked input indexed by batch only, so Pallas keeps it resident across
    all V row-programs (no per-row window DMA).  Used when the (possibly
    bf16) level fits VMEM.  The shear scan is still restricted to the RB-row
    window at the packed origin ``oy`` — scanning all A resident rows would
    cost more VPU time than the windowed kernel's DMA it replaces.
    """
    dxy_ref = rest[0] if with_dxy else None
    b = pl.program_id(0)
    v = pl.program_id(1)

    oy_f = _cread(coef_ref, b, v, 5)
    oy = oy_f.astype(jnp.int32)

    wx, dwx, rel, fy, sj, m, _ = _weights(coef_ref, b, v, W=W, A=A)
    nck = _cread(coef_ref, b, v, 6).astype(jnp.int32)

    def read_chunk(base):
        return sat_ref[0, pl.ds(oy + base, _SHEAR_CHUNK)]

    _accumulate_rows(read_chunk, oy_f, wx, dwx, rel, fy, sj, m,
                     out_ref, dx_ref, dy_ref, dxy_ref,
                     RB=RB, W=W, A=A, C=C, cfirst=cfirst, n_chunks=nck)


def _accumulate_rows(read_chunk, oy_f, wx, dwx, rel, fy, sj, m,
                     out_ref, dx_ref, dy_ref, dxy_ref,
                     *, RB: int, W: int, A: int, C: int, cfirst: bool,
                     n_chunks=None):
    """Shared forward accumulation: 4 sheared rows x banded matmuls."""
    acc_o = jnp.zeros((W, C), jnp.float32)
    acc_dx = jnp.zeros((W, C), jnp.float32)
    acc_dy = jnp.zeros((W, C), jnp.float32)
    acc_dxy = jnp.zeros((W, C), jnp.float32) if dxy_ref is not None else None

    shs = _shear_rows4(read_chunk, sj, oy_f, RB=RB, A=A, C=C,
                       cfirst=cfirst, n_chunks=n_chunks)
    mats = _row_weight_mats4(wx, dwx, rel, fy, with_dxy=dxy_ref is not None)
    for r in range(4):
        sh = shs[r]
        w_o, w_dx, w_dy, w_dxy = mats[r]

        def contract(wmat):
            if cfirst:
                return jax.lax.dot_general(
                    wmat, sh, dimension_numbers=_DN_CFIRST,
                    preferred_element_type=jnp.float32)
            return jnp.dot(wmat, sh, preferred_element_type=jnp.float32)

        acc_o = acc_o + contract(w_o)
        acc_dx = acc_dx + contract(w_dx)
        acc_dy = acc_dy + contract(w_dy)
        if acc_dxy is not None:
            acc_dxy = acc_dxy + contract(w_dxy)

    out_ref[0, 0] = acc_o
    dx_ref[0, 0] = acc_dx
    dy_ref[0, 0] = acc_dy
    if dxy_ref is not None:
        dxy_ref[0, 0] = acc_dxy


# fused-moment vector layout (lane indices into the kernel's 16-lane output)
MOM_IDX = dict(ss=0, gg=1, sxx=2, sxy=3, syy=4, dxs=5, dys=6, dxg=7, dyg=8)
_MOM_LANES = 16
# per-pixel channel moments of the G2SP unnormalized residual r = out - tgt
# (lm_update_pixel_moments lanes; see make_projline_pixmom)
PIXMOM_IDX = dict(sxx=0, sxy=1, syy=2, rx=3, ry=4)


def _moments_from_rows(acc_o, acc_dx, acc_dy, grd, mrow, *, W: int):
    """The 9 masked per-pixel channel moments and their u-moment sums.

    acc_o/acc_dx/acc_dy/grd: [W, C] (value, d/dx, d/dy, target feature);
    mrow: [W] binary ray mask.  Returns [3, _MOM_LANES] (rows: sum, u-sum,
    u^2-sum; lanes: MOM_IDX order, rest zero) — everything the implicit LM
    update (solver/updates.py:lm_update_from_moments) needs from this row.
    """
    cols = [
        jnp.sum(acc_o * acc_o, -1, keepdims=True),    # ss
        jnp.sum(grd * grd, -1, keepdims=True),        # gg
        jnp.sum(acc_dx * acc_dx, -1, keepdims=True),  # sxx
        jnp.sum(acc_dx * acc_dy, -1, keepdims=True),  # sxy
        jnp.sum(acc_dy * acc_dy, -1, keepdims=True),  # syy
        jnp.sum(acc_dx * acc_o, -1, keepdims=True),   # dxs
        jnp.sum(acc_dy * acc_o, -1, keepdims=True),   # dys
        jnp.sum(acc_dx * grd, -1, keepdims=True),     # dxg
        jnp.sum(acc_dy * grd, -1, keepdims=True),     # dyg
    ]
    # lane-select construction ([W, 1] cols broadcast onto one-hot lanes)
    # instead of stack/concat of 1-D vectors, which Mosaic dislikes
    lane = jax.lax.broadcasted_iota(jnp.int32, (W, _MOM_LANES), 1)
    P = jnp.zeros((W, _MOM_LANES), jnp.float32)
    for i, c in enumerate(cols):
        P = P + c * (lane == i).astype(jnp.float32)
    P = P * mrow[:, None]
    u = (jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0).astype(jnp.float32))
    m0 = jnp.sum(P, 0, keepdims=True)                  # [1, 16]
    m1 = jnp.sum(P * u, 0, keepdims=True)
    m2 = jnp.sum(P * (u * u), 0, keepdims=True)
    row = jax.lax.broadcasted_iota(jnp.int32, (3, _MOM_LANES), 0)
    return (m0 * (row == 0).astype(jnp.float32)
            + m1 * (row == 1).astype(jnp.float32)
            + m2 * (row == 2).astype(jnp.float32))     # [3, 16]


def _kernel_moments(coef_ref, sat_ref, grd_ref, mask_ref, mom_ref,
                    win_ref, sem, *, RB: int, W: int, A: int, C: int,
                    cfirst: bool):
    """Windowed fused-moment forward (eval-only, non-differentiable)."""
    b = pl.program_id(0)
    v = pl.program_id(1)
    oy_f = _cread(coef_ref, b, v, 5)
    oy = oy_f.astype(jnp.int32)
    cp = pltpu.make_async_copy(sat_ref.at[b, pl.ds(oy, RB)], win_ref, sem)
    cp.start()
    wx, dwx, rel, fy, sj, m, _ = _weights(coef_ref, b, v, W=W, A=A)
    nck = _cread(coef_ref, b, v, 6).astype(jnp.int32)
    cp.wait()

    def read_chunk(base):
        return win_ref[pl.ds(base, _SHEAR_CHUNK)]

    acc = _accumulate_values(read_chunk, oy_f, wx, dwx, rel, fy, sj, m,
                             RB=RB, W=W, A=A, C=C, cfirst=cfirst,
                             n_chunks=nck)
    mrow = mask_ref[pl.ds(v, 1)][0]
    mom_ref[0, 0] = _moments_from_rows(*acc, grd_ref[0, 0], mrow, W=W)


def _kernel_moments_fullmap(coef_ref, sat_ref, grd_ref, mask_ref, mom_ref,
                            *, RB: int, W: int, A: int, C: int, cfirst: bool):
    """Full-map fused-moment forward (map VMEM-resident, RB-row scan)."""
    b = pl.program_id(0)
    v = pl.program_id(1)
    oy_f = _cread(coef_ref, b, v, 5)
    oy = oy_f.astype(jnp.int32)
    wx, dwx, rel, fy, sj, m, _ = _weights(coef_ref, b, v, W=W, A=A)
    nck = _cread(coef_ref, b, v, 6).astype(jnp.int32)

    def read_chunk(base):
        return sat_ref[0, pl.ds(oy + base, _SHEAR_CHUNK)]

    acc = _accumulate_values(read_chunk, oy_f, wx, dwx, rel, fy, sj, m,
                             RB=RB, W=W, A=A, C=C, cfirst=cfirst,
                             n_chunks=nck)
    mrow = mask_ref[pl.ds(v, 1)][0]
    mom_ref[0, 0] = _moments_from_rows(*acc, grd_ref[0, 0], mrow, W=W)


def _kernel_moments_fullmap_blocked(coef_ref, sat_ref, grd_ref, mask_ref,
                                    mom_ref, *, W: int, A: int, C: int,
                                    CBW: int, cfirst: bool):
    """Column-blocked full-map fused-moment forward (round-3 eval lever).

    The full-map kernel scans the ROW's whole y-window over all A map
    columns per sheared row; within one CBW-column block the line's
    y-extent is only |slope|*CBW + pad rows, so a per-block chunk scan does
    ~1.5-2x less select work at the production levels.  Accumulates the
    per-sample (value, d/dx, d/dy) in registers across blocks, then emits
    the moment rows once — numerics identical to the unblocked kernel up to
    fp32 summation order."""
    b = pl.program_id(0)
    v = pl.program_id(1)
    acc_o, acc_dx, acc_dy, _ = _accumulate_values_blocked(
        coef_ref, sat_ref, b, v, W=W, A=A, C=C, CBW=CBW, cfirst=cfirst,
        with_dxy=False)
    mrow = mask_ref[pl.ds(v, 1)][0]
    mom_ref[0, 0] = _moments_from_rows(acc_o, acc_dx, acc_dy, grd_ref[0, 0],
                                       mrow, W=W)


def _kernel_fullmap_blocked(coef_ref, sat_ref, out_ref, dx_ref, dy_ref,
                            *rest, W: int, A: int, C: int, CBW: int,
                            cfirst: bool, with_dxy: bool = True):
    """Column-blocked full-map forward (same per-block y-window trick as the
    moments kernel); serves the differentiable sampler's forward (train) and
    the 3-output eval path."""
    dxy_ref = rest[0] if with_dxy else None
    b = pl.program_id(0)
    v = pl.program_id(1)
    acc_o, acc_dx, acc_dy, acc_dxy = _accumulate_values_blocked(
        coef_ref, sat_ref, b, v, W=W, A=A, C=C, CBW=CBW, cfirst=cfirst,
        with_dxy=with_dxy)
    out_ref[0, 0] = acc_o
    dx_ref[0, 0] = acc_dx
    dy_ref[0, 0] = acc_dy
    if dxy_ref is not None:
        dxy_ref[0, 0] = acc_dxy


def _accumulate_values_blocked(coef_ref, sat_ref, b, v, *, W: int, A: int,
                               C: int, CBW: int, cfirst: bool,
                               with_dxy: bool):
    """Register accumulation of (value, d/dx, d/dy[, d2/dxdy]) over static
    CBW-column blocks with per-block dynamic y-windows.

    The unblocked kernels scan the row's WHOLE y-window over all A map
    columns per sheared row; within one block the line's y-extent is only
    |slope|*CBW + pad rows, so the per-block chunk scan does ~1.5-2x less
    select work at the production levels.  Numerics identical to
    _accumulate_values up to fp32 summation order."""
    ax = _cread(coef_ref, b, v, 0)
    bx = _cread(coef_ref, b, v, 1)
    ay = _cread(coef_ref, b, v, 2)
    by = _cread(coef_ref, b, v, 3)
    slope = _cread(coef_ref, b, v, 4)

    u = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0].astype(jnp.float32)
    x = ax + bx * u
    y = ay + by * u
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    mask = ((x >= 0) & (x <= A - 1) & (y >= 0) & (y <= A - 1))
    quirk = ((x0f < A - 1) & (y0f < A - 1)).astype(jnp.float32)
    m = mask.astype(jnp.float32) * quirk
    x0b = x0f[:, None]
    mb = m[:, None]

    acc_o = jnp.zeros((W, C), jnp.float32)
    acc_dx = jnp.zeros((W, C), jnp.float32)
    acc_dy = jnp.zeros((W, C), jnp.float32)
    acc_dxy = jnp.zeros((W, C), jnp.float32) if with_dxy else None
    max_ck = A // _SHEAR_CHUNK
    for jb in range(A // CBW):
        col0 = jb * CBW
        # line y-window over this block's x-range (affine: y = ay+(x-ax)*sl)
        xa = jnp.float32(col0 - 1)
        xb_ = jnp.float32(col0 + CBW)
        ya = ay + (xa - ax) * slope
        yb = ay + (xb_ - ax) * slope
        ymin_b = jnp.minimum(ya, yb)
        ymax_b = jnp.clip(jnp.maximum(ya, yb), 0.0, A - 1.0)
        oy_b = jnp.clip(((jnp.floor(ymin_b) - 1.0).astype(jnp.int32)
                         // _SHEAR_CHUNK) * _SHEAR_CHUNK,
                        0, A - _SHEAR_CHUNK)
        avail = (A - oy_b) // _SHEAR_CHUNK
        nck_b = jnp.ceil((ymax_b + 4.0 - oy_b.astype(jnp.float32))
                         / _SHEAR_CHUNK).astype(jnp.int32)
        nck_b = jnp.minimum(jnp.clip(nck_b, 1, max_ck), avail)

        j = (jax.lax.broadcasted_iota(jnp.int32, (W, CBW), 1)
             .astype(jnp.float32) + jnp.float32(col0))
        hit0 = (j == x0b).astype(jnp.float32)
        hit1 = (j == (x0b + 1.0)).astype(jnp.float32)
        wx = ((1.0 - fx)[:, None] * hit0 + fx[:, None] * hit1) * mb
        dwx = (hit1 - hit0) * mb
        jcols = j[:1]
        yj = ay + (jcols - ax) * slope
        sj = jnp.floor(yj)
        rel = y0f[:, None] - sj + 1.0
        oy_bf = oy_b.astype(jnp.float32)

        if cfirst:
            def read_chunk(base, oy_b=oy_b, col0=col0):
                return sat_ref[0, pl.ds(oy_b + base, _SHEAR_CHUNK), :,
                               col0:col0 + CBW]
        else:
            def read_chunk(base, oy_b=oy_b, col0=col0):
                return sat_ref[0, pl.ds(oy_b + base, _SHEAR_CHUNK),
                               col0:col0 + CBW]

        shs = _shear_rows4(read_chunk, sj, oy_bf, RB=A, A=CBW, C=C,
                           cfirst=cfirst, n_chunks=nck_b)
        mats = _row_weight_mats4(wx, dwx, rel, fy,
                                 with_dxy=acc_dxy is not None)
        for r in range(4):
            sh = shs[r]
            w_o, w_dx, w_dy, w_dxy = mats[r]

            def contract(wmat):
                if cfirst:
                    return jax.lax.dot_general(
                        wmat, sh, dimension_numbers=_DN_CFIRST,
                        preferred_element_type=jnp.float32)
                return jnp.dot(wmat, sh, preferred_element_type=jnp.float32)

            acc_o = acc_o + contract(w_o)
            acc_dx = acc_dx + contract(w_dx)
            acc_dy = acc_dy + contract(w_dy)
            if acc_dxy is not None:
                acc_dxy = acc_dxy + contract(w_dxy)

    return acc_o, acc_dx, acc_dy, acc_dxy


def _accumulate_values_blocked_uwin(coef_ref, sat_ref, b, v, emit, *,
                                    W: int, A: int, C: int, CBW: int,
                                    UC: int, cfirst: bool, with_dxy: bool):
    """Column-blocked affine accumulation with per-(row, block) dynamic
    u-windows (round-5 lever; the S2GP port of the projline u-window).

    Real S2GP geometry (scripts/r5_s2gp_window_stats.py): ground-row lines
    cross every column block with partial sample windows — the UC-aligned
    live window covers only 0.63-0.82 of the W samples a hit block builds
    weights for, and the r5 isolation probe showed these kernels are
    VPU-build-bound with the matmuls hidden under the build.  Per block:
    masked min/max over the line's x(u) gives [umin, umax]; a dynamic-trip
    fori_loop rebuilds weights + issues the matmuls on [UC, CBW] row chunks
    and hands each chunk to ``emit(row_slice, acc_o, acc_dx, acc_dy,
    acc_dxy)`` (the fwd kernel RMWs its output refs, the moments kernel its
    VMEM scratch).  Excluded rows have exactly-zero block weights, so the
    accumulated per-row sums are bit-identical to
    _accumulate_values_blocked."""
    ax = _cread(coef_ref, b, v, 0)
    bx = _cread(coef_ref, b, v, 1)
    ay = _cread(coef_ref, b, v, 2)
    by = _cread(coef_ref, b, v, 3)
    slope = _cread(coef_ref, b, v, 4)

    u = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0].astype(jnp.float32)
    x = ax + bx * u
    y = ay + by * u
    valid = ((x >= 0) & (x <= A - 1) & (y >= 0) & (y <= A - 1)
             & (jnp.floor(x) < A - 1) & (jnp.floor(y) < A - 1))

    max_ck = A // _SHEAR_CHUNK
    for jb in range(A // CBW):
        col0 = jb * CBW
        hitb = valid & (x >= col0 - 1) & (x < col0 + CBW)
        umin = jnp.min(jnp.where(hitb, u, jnp.float32(W)))
        umax = jnp.max(jnp.where(hitb, u, -1.0))

        @pl.when(umax >= umin)
        def _block(col0=col0, umin=umin, umax=umax):
            u0 = (umin.astype(jnp.int32) // UC) * UC
            n_uch = (umax.astype(jnp.int32) - u0) // UC + 1
            # per-block y-window (same formula as the base blocked kernel)
            xa = jnp.float32(col0 - 1)
            xb_ = jnp.float32(col0 + CBW)
            ya = ay + (xa - ax) * slope
            yb = ay + (xb_ - ax) * slope
            ymin_b = jnp.minimum(ya, yb)
            ymax_b = jnp.clip(jnp.maximum(ya, yb), 0.0, A - 1.0)
            oy_b = jnp.clip(((jnp.floor(ymin_b) - 1.0).astype(jnp.int32)
                             // _SHEAR_CHUNK) * _SHEAR_CHUNK,
                            0, A - _SHEAR_CHUNK)
            avail = (A - oy_b) // _SHEAR_CHUNK
            nck_b = jnp.ceil((ymax_b + 4.0 - oy_b.astype(jnp.float32))
                             / _SHEAR_CHUNK).astype(jnp.int32)
            nck_b = jnp.minimum(jnp.clip(nck_b, 1, max_ck), avail)
            jcols = (jax.lax.broadcasted_iota(jnp.int32, (1, CBW), 1)
                     .astype(jnp.float32) + jnp.float32(col0))
            yj = ay + (jcols - ax) * slope
            sj = jnp.floor(yj)
            oy_bf = oy_b.astype(jnp.float32)

            if cfirst:
                def read_chunk(base, oy_b=oy_b, col0=col0):
                    return sat_ref[0, pl.ds(oy_b + base, _SHEAR_CHUNK), :,
                                   col0:col0 + CBW]
            else:
                def read_chunk(base, oy_b=oy_b, col0=col0):
                    return sat_ref[0, pl.ds(oy_b + base, _SHEAR_CHUNK),
                                   col0:col0 + CBW]

            shs = _shear_rows4(read_chunk, sj, oy_bf, RB=A, A=CBW, C=C,
                               cfirst=cfirst, n_chunks=nck_b)

            def chunk_body(k, _):
                ub = u0 + k * UC
                uu = (jax.lax.broadcasted_iota(jnp.int32, (UC, 1), 0)[:, 0]
                      .astype(jnp.float32) + ub.astype(jnp.float32))
                xc = ax + bx * uu
                yc = ay + by * uu
                x0f = jnp.floor(xc)
                y0f = jnp.floor(yc)
                fxc = xc - x0f
                fyc = yc - y0f
                mc = (((xc >= 0) & (xc <= A - 1) & (yc >= 0)
                       & (yc <= A - 1)).astype(jnp.float32)
                      * ((x0f < A - 1) & (y0f < A - 1)).astype(jnp.float32))
                j = (jax.lax.broadcasted_iota(jnp.int32, (UC, CBW), 1)
                     .astype(jnp.float32) + jnp.float32(col0))
                x0b = x0f[:, None]
                hit0 = (j == x0b).astype(jnp.float32)
                hit1 = (j == (x0b + 1.0)).astype(jnp.float32)
                mb = mc[:, None]
                wx = ((1.0 - fxc)[:, None] * hit0
                      + fxc[:, None] * hit1) * mb
                dwx = (hit1 - hit0) * mb
                rel = y0f[:, None] - sj + 1.0
                mats = _row_weight_mats4(wx, dwx, rel, fyc,
                                         with_dxy=with_dxy)
                acc_o = jnp.zeros((UC, C), jnp.float32)
                acc_dx = jnp.zeros((UC, C), jnp.float32)
                acc_dy = jnp.zeros((UC, C), jnp.float32)
                acc_dxy = (jnp.zeros((UC, C), jnp.float32) if with_dxy
                           else None)
                for r in range(4):
                    sh = shs[r]
                    w_o, w_dx, w_dy, w_dxy = mats[r]

                    def contract(wmat):
                        if cfirst:
                            return jax.lax.dot_general(
                                wmat, sh, dimension_numbers=_DN_CFIRST,
                                preferred_element_type=jnp.float32)
                        return jnp.dot(wmat, sh,
                                       preferred_element_type=jnp.float32)

                    acc_o = acc_o + contract(w_o)
                    acc_dx = acc_dx + contract(w_dx)
                    acc_dy = acc_dy + contract(w_dy)
                    if with_dxy:
                        acc_dxy = acc_dxy + contract(w_dxy)
                emit(pl.ds(ub, UC), acc_o, acc_dx, acc_dy, acc_dxy)
                return 0

            jax.lax.fori_loop(0, n_uch, chunk_body, 0)


def _kernel_fullmap_blocked_uwin(coef_ref, sat_ref, out_ref, dx_ref, dy_ref,
                                 *rest, W: int, A: int, C: int, CBW: int,
                                 UC: int, cfirst: bool,
                                 with_dxy: bool = True):
    """u-windowed variant of _kernel_fullmap_blocked (bit-identical)."""
    dxy_ref = rest[0] if with_dxy else None
    b = pl.program_id(0)
    v = pl.program_id(1)
    out_ref[0, 0] = jnp.zeros((W, C), jnp.float32)
    dx_ref[0, 0] = jnp.zeros((W, C), jnp.float32)
    dy_ref[0, 0] = jnp.zeros((W, C), jnp.float32)
    if with_dxy:
        dxy_ref[0, 0] = jnp.zeros((W, C), jnp.float32)

    def emit(sl, acc_o, acc_dx, acc_dy, acc_dxy):
        out_ref[0, 0, sl] += acc_o
        dx_ref[0, 0, sl] += acc_dx
        dy_ref[0, 0, sl] += acc_dy
        if with_dxy:
            dxy_ref[0, 0, sl] += acc_dxy

    _accumulate_values_blocked_uwin(coef_ref, sat_ref, b, v, emit, W=W,
                                    A=A, C=C, CBW=CBW, UC=UC, cfirst=cfirst,
                                    with_dxy=with_dxy)


def _kernel_moments_fullmap_blocked_uwin(coef_ref, sat_ref, grd_ref,
                                         mask_ref, mom_ref, scr_o, scr_dx,
                                         scr_dy, *, W: int, A: int, C: int,
                                         CBW: int, UC: int, cfirst: bool):
    """u-windowed variant of _kernel_moments_fullmap_blocked: the chunked
    (value, d/dx, d/dy) land in VMEM scratch (register accumulators cannot
    take dynamic-offset updates), then the moment rows contract once.
    Per-row sums accumulate in the same block order as the base kernel, so
    the moments are bit-identical."""
    b = pl.program_id(0)
    v = pl.program_id(1)
    scr_o[...] = jnp.zeros((W, C), jnp.float32)
    scr_dx[...] = jnp.zeros((W, C), jnp.float32)
    scr_dy[...] = jnp.zeros((W, C), jnp.float32)

    def emit(sl, acc_o, acc_dx, acc_dy, _):
        scr_o[sl] += acc_o
        scr_dx[sl] += acc_dx
        scr_dy[sl] += acc_dy

    _accumulate_values_blocked_uwin(coef_ref, sat_ref, b, v, emit, W=W,
                                    A=A, C=C, CBW=CBW, UC=UC, cfirst=cfirst,
                                    with_dxy=False)
    mrow = mask_ref[pl.ds(v, 1)][0]
    mom_ref[0, 0] = _moments_from_rows(scr_o[...], scr_dx[...], scr_dy[...],
                                       grd_ref[0, 0], mrow, W=W)


def _accumulate_values(read_chunk, oy_f, wx, dwx, rel, fy, sj, m,
                       *, RB: int, W: int, A: int, C: int, cfirst: bool,
                       n_chunks=None):
    """Value + d/dx + d/dy accumulators ([W, C] each) without HBM writes."""
    acc_o = jnp.zeros((W, C), jnp.float32)
    acc_dx = jnp.zeros((W, C), jnp.float32)
    acc_dy = jnp.zeros((W, C), jnp.float32)
    shs = _shear_rows4(read_chunk, sj, oy_f, RB=RB, A=A, C=C,
                       cfirst=cfirst, n_chunks=n_chunks)
    mats = _row_weight_mats4(wx, dwx, rel, fy, with_dxy=False)
    for r in range(4):
        sh = shs[r]
        w_o, w_dx, w_dy, _ = mats[r]

        def contract(wmat):
            if cfirst:
                return jax.lax.dot_general(
                    wmat, sh, dimension_numbers=_DN_CFIRST,
                    preferred_element_type=jnp.float32)
            return jnp.dot(wmat, sh, preferred_element_type=jnp.float32)

        acc_o = acc_o + contract(w_o)
        acc_dx = acc_dx + contract(w_dx)
        acc_dy = acc_dy + contract(w_dy)
    return acc_o, acc_dx, acc_dy


def make_banded_moments(A: int, C: int, V: int, W: int, RB: int,
                        interpret: bool = False, bf16_map: bool = False,
                        u_chunk: int = 0):
    """Build the fused-moment eval sampler.

    fn(sat [B,A,A,C] (kernel-x-major, i.e. already axis-swapped like
    make_banded_sampler's input), grd [B,V,W,C], mask [V,W], uv0, uv1)
      -> moments [B, V, 3, _MOM_LANES]

    Equivalent to running make_banded_sampler and contracting the 9 masked
    per-pixel channel moments + u-moments outside (see MOM_IDX), but the
    [B,V,W,C] out/dx/dy arrays never exist in HBM — this is the implicit-LM
    eval fast path.  NOT differentiable (eval only).
    """
    assert RB % _SHEAR_CHUNK == 0
    cfirst = (C % 128 != 0) and (A % 128 == 0)
    map_dtype = jnp.bfloat16 if bf16_map else jnp.float32
    itemsize = 2 if bf16_map else 4
    full_map = (A % _SHEAR_CHUNK == 0
                and A * A * C * itemsize <= _FULLMAP_VMEM_BUDGET)
    win_shape = (RB, C, A) if cfirst else (RB, A, C)
    sat_shape = (A, C, A) if cfirst else (A, A, C)

    def build(B: int):
        grd_spec = pl.BlockSpec((1, 1, W, C), lambda b, v, c: (b, v, 0, 0),
                                memory_space=pltpu.VMEM)
        # whole [V, W] mask resident (a (1, W) row block would violate the
        # (8, 128) tiling rule for V not multiple of 8); rows picked by
        # program id inside the kernel
        mask_spec = pl.BlockSpec((V, W), lambda b, v, c: (0, 0),
                                 pipeline_mode=pl.Buffered(buffer_count=1),
                                 memory_space=pltpu.VMEM)
        mom_spec = pl.BlockSpec((1, 1, 3, _MOM_LANES),
                                lambda b, v, c: (b, v, 0, 0),
                                memory_space=pltpu.VMEM)
        if full_map:
            CBW = 128 if cfirst else 32
            mom_scratch = []
            if (A % CBW == 0 and u_chunk and W % u_chunk == 0
                    and u_chunk % 8 == 0):
                kernel = functools.partial(
                    _kernel_moments_fullmap_blocked_uwin, W=W, A=A, C=C,
                    CBW=CBW, UC=u_chunk, cfirst=cfirst)
                mom_scratch = [pltpu.VMEM((W, C), jnp.float32)] * 3
            elif A % CBW == 0:
                kernel = functools.partial(
                    _kernel_moments_fullmap_blocked, W=W, A=A, C=C, CBW=CBW,
                    cfirst=cfirst)
            else:
                kernel = functools.partial(_kernel_moments_fullmap, RB=RB,
                                           W=W, A=A, C=C, cfirst=cfirst)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, V),
                in_specs=[pl.BlockSpec(
                    (1,) + sat_shape, lambda b, v, c: (b, 0, 0, 0),
                    pipeline_mode=pl.Buffered(buffer_count=1),
                    memory_space=pltpu.VMEM), grd_spec, mask_spec],
                out_specs=mom_spec,
                scratch_shapes=mom_scratch,
            )
        else:
            kernel = functools.partial(_kernel_moments, RB=RB, W=W, A=A, C=C,
                                       cfirst=cfirst)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, V),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY), grd_spec,
                          mask_spec],
                out_specs=mom_spec,
                scratch_shapes=[
                    pltpu.VMEM(win_shape, map_dtype),
                    pltpu.SemaphoreType.DMA(()),
                ],
            )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, V, 3, _MOM_LANES),
                                           jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )

    def moments(sat_k, grd, mask, uv0, uv1):
        coefs = pack_row_coefs(uv0, uv1, A, RB, W)
        sat_k = sat_k.astype(map_dtype)
        if cfirst:
            sat_k = jnp.transpose(sat_k, (0, 1, 3, 2))
        return build(sat_k.shape[0])(coefs.reshape(coefs.shape[0], -1),
                                     sat_k, grd.astype(jnp.float32),
                                     mask.astype(jnp.float32))

    return moments


def _bwd_kernel(coef_ref, go_ref, gdx_ref, gdy_ref, grad_ref,
                *, W: int, A: int, C: int, CB: int, cfirst: bool):
    """Backward w.r.t. the satellite map: scatter-free banded transpose with
    a VMEM-RESIDENT gradient accumulator.

    Grid (B, n_cb, V), V innermost; grad_ref is an output block whose index
    map ignores v (the standard Pallas accumulation pattern): it stays
    resident in VMEM across all V row-programs of one (batch, column-block),
    is zeroed at v == 0, and is flushed to HBM once per block.  This
    replaces the per-row window read-modify-write DMA, which moved
    2*RB*A*C bytes per ground row (the round-2 training bottleneck —
    ~8 GB/call at the finest level).

    Column blocks (CB map columns each) bound the resident block's VMEM
    footprint; weights are rebuilt per block (cheap [W]-sized recompute).
    grad_ref block: [1, A, CB, C] (or [1, A, C, CB] when ``cfirst`` — the
    map-column axis j sits in lanes there, so CB is a multiple of 128).
    """
    b = pl.program_id(0)
    cb = pl.program_id(1)
    v = pl.program_id(2)

    @pl.when(v == 0)
    def _zero():
        grad_ref[...] = jnp.zeros_like(grad_ref)

    col0 = cb * CB
    # (row, block) skip: row v's samples span kernel-x in [min, max] of the
    # affine endpoints; a block the span never touches receives only zeros —
    # skip its weights/matmuls/unshear entirely (round-3 backward lever).
    ax = _cread(coef_ref, b, v, 0)
    bx = _cread(coef_ref, b, v, 1)
    xe = ax + bx * jnp.float32(W - 1)
    xlo = jnp.minimum(ax, xe)
    xhi = jnp.maximum(ax, xe)
    blk_hit = (xhi >= jnp.float32(col0 - 1)) & (xlo <= jnp.float32(col0 + CB))

    @pl.when(blk_hit)
    def _body():
        wx, dwx, rel, fy, sj, m, oy_f = _weights(coef_ref, b, v, W=W, A=A,
                                                 col0=col0, ncols=CB)
        # per-block y-window (same trick as the blocked forward kernels):
        # the line's y-extent within this block's x-range bounds the unshear
        # scan — far fewer chunks than the row's whole y-span when CB < the
        # row's x-extent
        ay = _cread(coef_ref, b, v, 2)
        slope = _cread(coef_ref, b, v, 4)
        xa2 = jnp.maximum(jnp.float32(col0 - 1), xlo - 1.0)
        xb2 = jnp.minimum(jnp.float32(col0 + CB), xhi + 1.0)
        ya2 = ay + (xa2 - ax) * slope
        yb2 = ay + (xb2 - ax) * slope
        ymin_b = jnp.minimum(ya2, yb2)
        ymax_b = jnp.clip(jnp.maximum(ya2, yb2), 0.0, A - 1.0)
        oy_b = jnp.clip(((jnp.floor(ymin_b) - 1.0).astype(jnp.int32)
                         // _SHEAR_CHUNK) * _SHEAR_CHUNK,
                        0, max(A - _SHEAR_CHUNK, 0))
        avail = (A - oy_b) // _SHEAR_CHUNK
        nck = jnp.ceil((ymax_b + 4.0 - oy_b.astype(jnp.float32))
                       / _SHEAR_CHUNK).astype(jnp.int32)
        nck = jnp.minimum(jnp.clip(nck, 1, A // _SHEAR_CHUNK), avail)
        c0 = oy_b // _SHEAR_CHUNK

        g_o = go_ref[0, 0]
        g_dx = gdx_ref[0, 0]
        g_dy = gdy_ref[0, 0]

        dn_t = (((0,), (0,)), ((), ()))
        Gs = []
        mats = _row_weight_mats4(wx, dwx, rel, fy, with_dxy=False)
        for r in range(4):
            w_o, w_dx, w_dy, _ = mats[r]
            if cfirst:
                # G [C, CB] to match the [A, C, CB] block layout
                G = (jax.lax.dot_general(g_o, w_o, dimension_numbers=dn_t,
                                         preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(g_dx, w_dx, dimension_numbers=dn_t,
                                           preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(g_dy, w_dy, dimension_numbers=dn_t,
                                           preferred_element_type=jnp.float32))
            else:
                G = (jax.lax.dot_general(w_o, g_o, dimension_numbers=dn_t,
                                         preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(w_dx, g_dx, dimension_numbers=dn_t,
                                           preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(w_dy, g_dy, dimension_numbers=dn_t,
                                           preferred_element_type=jnp.float32))
            Gs.append(G)
        # un-shear: ABSOLUTE map row (sj + r - 1) at column j gets Gs[r][:, j]
        _unshear_scatter4(grad_ref, Gs, sj, c0, nck, A=A, CB=CB,
                          cfirst=cfirst)


def _bwd_kernel_uwin(coef_ref, go_ref, gdx_ref, gdy_ref, grad_ref,
                     *, W: int, A: int, C: int, CB: int, UC: int,
                     cfirst: bool):
    """u-windowed variant of _bwd_kernel: the transposed weight x cotangent
    contractions run over [UC]-row chunks of the block's live sample window
    instead of all W rows (cotangent rows read at pl.ds offsets; the G
    accumulators carry through the fori_loop).  NOTE: chunking splits the
    W-contraction, so G is the same sum REASSOCIATED — gradients match the
    base kernel to fp32 round-off (~1e-6 rel), not bit-exactly (the forward
    u-window variants ARE bit-exact; parity-tested accordingly)."""
    b = pl.program_id(0)
    cb = pl.program_id(1)
    v = pl.program_id(2)

    @pl.when(v == 0)
    def _zero():
        grad_ref[...] = jnp.zeros_like(grad_ref)

    col0 = cb * CB
    ax = _cread(coef_ref, b, v, 0)
    bx = _cread(coef_ref, b, v, 1)
    ay = _cread(coef_ref, b, v, 2)
    by = _cread(coef_ref, b, v, 3)
    slope = _cread(coef_ref, b, v, 4)

    u = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0].astype(jnp.float32)
    x = ax + bx * u
    y = ay + by * u
    valid = ((x >= 0) & (x <= A - 1) & (y >= 0) & (y <= A - 1)
             & (jnp.floor(x) < A - 1) & (jnp.floor(y) < A - 1))
    hitb = valid & (x >= col0 - 1) & (x < col0 + CB)
    umin = jnp.min(jnp.where(hitb, u, jnp.float32(W)))
    umax = jnp.max(jnp.where(hitb, u, -1.0))

    @pl.when(umax >= umin)
    def _body():
        u0 = (umin.astype(jnp.int32) // UC) * UC
        n_uch = (umax.astype(jnp.int32) - u0) // UC + 1
        # per-block y-window for the unshear scan (same as _bwd_kernel)
        xe = ax + bx * jnp.float32(W - 1)
        xlo = jnp.minimum(ax, xe)
        xhi = jnp.maximum(ax, xe)
        xa2 = jnp.maximum(jnp.float32(col0 - 1), xlo - 1.0)
        xb2 = jnp.minimum(jnp.float32(col0 + CB), xhi + 1.0)
        ya2 = ay + (xa2 - ax) * slope
        yb2 = ay + (xb2 - ax) * slope
        ymin_b = jnp.minimum(ya2, yb2)
        ymax_b = jnp.clip(jnp.maximum(ya2, yb2), 0.0, A - 1.0)
        oy_b = jnp.clip(((jnp.floor(ymin_b) - 1.0).astype(jnp.int32)
                         // _SHEAR_CHUNK) * _SHEAR_CHUNK,
                        0, max(A - _SHEAR_CHUNK, 0))
        avail = (A - oy_b) // _SHEAR_CHUNK
        nck = jnp.ceil((ymax_b + 4.0 - oy_b.astype(jnp.float32))
                       / _SHEAR_CHUNK).astype(jnp.int32)
        nck = jnp.minimum(jnp.clip(nck, 1, A // _SHEAR_CHUNK), avail)
        c0 = oy_b // _SHEAR_CHUNK
        jcols = (jax.lax.broadcasted_iota(jnp.int32, (1, CB), 1)
                 .astype(jnp.float32) + jnp.float32(col0))
        yj = ay + (jcols - ax) * slope
        sj = jnp.floor(yj)

        dn_t = (((0,), (0,)), ((), ()))
        gshape = (C, CB) if cfirst else (CB, C)
        init = tuple(jnp.zeros(gshape, jnp.float32) for _ in range(4))

        def chunk_body(k, Gs):
            ub = u0 + k * UC
            uu = (jax.lax.broadcasted_iota(jnp.int32, (UC, 1), 0)[:, 0]
                  .astype(jnp.float32) + ub.astype(jnp.float32))
            xc = ax + bx * uu
            yc = ay + by * uu
            x0f = jnp.floor(xc)
            y0f = jnp.floor(yc)
            fxc = xc - x0f
            fyc = yc - y0f
            mc = (((xc >= 0) & (xc <= A - 1) & (yc >= 0)
                   & (yc <= A - 1)).astype(jnp.float32)
                  * ((x0f < A - 1) & (y0f < A - 1)).astype(jnp.float32))
            j = (jax.lax.broadcasted_iota(jnp.int32, (UC, CB), 1)
                 .astype(jnp.float32) + jnp.float32(col0))
            x0b = x0f[:, None]
            hit0 = (j == x0b).astype(jnp.float32)
            hit1 = (j == (x0b + 1.0)).astype(jnp.float32)
            mb = mc[:, None]
            wx = ((1.0 - fxc)[:, None] * hit0 + fxc[:, None] * hit1) * mb
            dwx = (hit1 - hit0) * mb
            rel = y0f[:, None] - sj + 1.0
            sl = pl.ds(ub, UC)
            g_o = go_ref[0, 0, sl]
            g_dx = gdx_ref[0, 0, sl]
            g_dy = gdy_ref[0, 0, sl]
            mats = _row_weight_mats4(wx, dwx, rel, fyc, with_dxy=False)
            out = []
            for r in range(4):
                w_o, w_dx, w_dy, _ = mats[r]
                if cfirst:
                    G = (jax.lax.dot_general(
                            g_o, w_o, dimension_numbers=dn_t,
                            preferred_element_type=jnp.float32)
                         + jax.lax.dot_general(
                            g_dx, w_dx, dimension_numbers=dn_t,
                            preferred_element_type=jnp.float32)
                         + jax.lax.dot_general(
                            g_dy, w_dy, dimension_numbers=dn_t,
                            preferred_element_type=jnp.float32))
                else:
                    G = (jax.lax.dot_general(
                            w_o, g_o, dimension_numbers=dn_t,
                            preferred_element_type=jnp.float32)
                         + jax.lax.dot_general(
                            w_dx, g_dx, dimension_numbers=dn_t,
                            preferred_element_type=jnp.float32)
                         + jax.lax.dot_general(
                            w_dy, g_dy, dimension_numbers=dn_t,
                            preferred_element_type=jnp.float32))
                out.append(Gs[r] + G)
            return tuple(out)

        Gs = jax.lax.fori_loop(0, n_uch, chunk_body, init)
        _unshear_scatter4(grad_ref, list(Gs), sj, c0, nck, A=A, CB=CB,
                          cfirst=cfirst)


def _unshear_scatter4(grad_ref, Gs, sj, c0, nck, *, A: int, CB: int,
                      cfirst: bool):
    """Accumulate all four bilinear rows' G matrices into the VMEM-resident
    gradient block in ONE chunk scan.

    The transpose of _shear_rows4: for column j, row r's contribution lands
    on absolute map row sj[j] + r - 1, so the four rows have DISJOINT row
    support per column — summing their one-hot scatters before the single
    read-modify-write of grad_ref is exact, and the accumulator traffic +
    row iota drop 4x (the same VPU finding that bought the forward ~20%,
    PERF.md round 4)."""
    def chunk_body(ci, _):
        base = (c0 + ci) * _SHEAR_CHUNK

        @pl.when(base < A)
        def _acc():
            rr = (jax.lax.broadcasted_iota(jnp.int32, (_SHEAR_CHUNK, CB), 0)
                  .astype(jnp.float32) + base.astype(jnp.float32))
            drow = rr - sj                                     # [chunk, CB]
            sl = pl.ds(base, _SHEAR_CHUNK)
            if cfirst:
                upd = sum((drow == float(r - 1)).astype(jnp.float32)
                          [:, None, :] * Gs[r][None] for r in range(4))
            else:
                upd = sum((drow == float(r - 1)).astype(jnp.float32)
                          [:, :, None] * Gs[r][None] for r in range(4))
            grad_ref[0, sl] = grad_ref[0, sl] + upd
        return 0

    jax.lax.fori_loop(0, nck, chunk_body, 0)


def _raw_forward(A: int, C: int, V: int, W: int, RB: int, cfirst: bool,
                 interpret: bool, full_map: bool = False,
                 map_dtype=jnp.float32, with_dxy: bool = True,
                 u_chunk: int = 0):
    """fn(sat_kernel_layout, coefs) -> (out, dx, dy[, dxy]) [B, V, W, C].

    full_map: whole level rides in VMEM as a blocked input (kept resident
    across the V row-programs by the Pallas pipeline) — no window DMA.
    with_dxy=False builds the eval-only kernel (no cross-derivative).
    u_chunk > 0 selects the dynamic u-window blocked kernel (bit-identical;
    must divide W and be a multiple of 8).
    """
    win_shape = (RB, C, A) if cfirst else (RB, A, C)
    sat_shape = (A, C, A) if cfirst else (A, A, C)
    n_out = 4 if with_dxy else 3

    def build(B: int):
        out_spec = pl.BlockSpec((1, 1, W, C), lambda b, v, c: (b, v, 0, 0),
                                memory_space=pltpu.VMEM)
        if full_map:
            CBW = 128 if cfirst else 32
            if (A % CBW == 0 and u_chunk and W % u_chunk == 0
                    and u_chunk % 8 == 0):
                kernel = functools.partial(
                    _kernel_fullmap_blocked_uwin, W=W, A=A, C=C, CBW=CBW,
                    UC=u_chunk, cfirst=cfirst, with_dxy=with_dxy)
            elif A % CBW == 0:
                kernel = functools.partial(
                    _kernel_fullmap_blocked, W=W, A=A, C=C, CBW=CBW,
                    cfirst=cfirst, with_dxy=with_dxy)
            else:
                kernel = functools.partial(_kernel_fullmap, RB=RB, W=W, A=A,
                                           C=C, cfirst=cfirst,
                                           with_dxy=with_dxy)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, V),
                in_specs=[pl.BlockSpec(
                    (1,) + sat_shape, lambda b, v, c: (b, 0, 0, 0),
                    # block index varies only with b: single-buffer the map
                    # so its VMEM cost is 1x (not the pipeline's default 2x)
                    pipeline_mode=pl.Buffered(buffer_count=1),
                    memory_space=pltpu.VMEM)],
                out_specs=(out_spec,) * n_out,
            )
        else:
            kernel = functools.partial(_kernel, RB=RB, W=W, A=A, C=C,
                                       cfirst=cfirst, with_dxy=with_dxy)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,  # coefs land whole in SMEM
                grid=(B, V),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=(out_spec,) * n_out,
                scratch_shapes=[
                    pltpu.VMEM(win_shape, map_dtype),
                    pltpu.SemaphoreType.DMA(()),
                ],
            )
        return pl.pallas_call(
            kernel,
            out_shape=tuple(jax.ShapeDtypeStruct((B, V, W, C), jnp.float32)
                            for _ in range(n_out)),
            grid_spec=grid_spec,
            interpret=interpret,
        )

    def fwd(sat_k, coefs):
        coefs = coefs.reshape(coefs.shape[0], -1)
        return build(sat_k.shape[0])(coefs, sat_k.astype(map_dtype))

    return fwd


def _bwd_col_blocks(A: int, C: int, cfirst: bool,
                    target: int = 8 * 2 ** 20):
    """Column-block width CB for the resident backward accumulator: the
    [A, CB, C] (or [A, C, CB]) block must fit the VMEM target.  The
    map-column axis sits in lanes when ``cfirst`` (CB multiple of 128),
    in sublanes otherwise (multiple of 8)."""
    n = 1
    while A * (A // n) * C * 4 > target and (A // n) > (128 if cfirst else 8):
        n *= 2
    cb = A // n
    # NOTE (round 3): shrinking non-cfirst blocks to CB=32 to sharpen the
    # (row, block) skip measured NEUTRAL-to-negative end-to-end — the 4x
    # per-program dispatch overhead offset the ~42% skipped pairs at L1.
    # Keep the natural (VMEM-target) block size; the skip still prunes
    # whatever the coarse blocks allow.
    # non-power-of-two A large enough to trigger halving can land on a CB
    # that is neither alignment-divisible nor equal to A — a Mosaic-invalid
    # output block tiling.  Fail with a clear message instead (production A
    # values 64-512 never hit this).
    align = 128 if cfirst else 8
    if cb != A and cb % align != 0:
        raise ValueError(
            f"banded backward: column block {cb} for A={A}, C={C} is not "
            f"{align}-aligned; choose a map side A that is a multiple of "
            f"{align} times a power of two")
    return cb


def _raw_backward(A: int, C: int, V: int, W: int, cfirst: bool,
                  interpret: bool, u_chunk: int = 0):
    """fn(coefs, g_o, g_dx, g_dy) -> grad_sat (kernel layout), accumulated
    in VMEM-resident column blocks (see _bwd_kernel).  u_chunk > 0 selects
    the dynamic u-window contraction (same sum reassociated — ~1e-6 rel)."""
    assert A % _SHEAR_CHUNK == 0
    CB = _bwd_col_blocks(A, C, cfirst)
    n_cb = A // CB
    if u_chunk and W % u_chunk == 0 and u_chunk % 8 == 0:
        kernel = functools.partial(_bwd_kernel_uwin, W=W, A=A, C=C, CB=CB,
                                   UC=u_chunk, cfirst=cfirst)
    else:
        kernel = functools.partial(_bwd_kernel, W=W, A=A, C=C, CB=CB,
                                   cfirst=cfirst)
    sat_shape = (A, C, A) if cfirst else (A, A, C)
    if cfirst:
        out_spec = pl.BlockSpec((1, A, C, CB),
                                lambda b, cb, v, c: (b, 0, 0, cb),
                                pipeline_mode=pl.Buffered(buffer_count=1),
                                memory_space=pltpu.VMEM)
    else:
        out_spec = pl.BlockSpec((1, A, CB, C),
                                lambda b, cb, v, c: (b, 0, cb, 0),
                                pipeline_mode=pl.Buffered(buffer_count=1),
                                memory_space=pltpu.VMEM)

    def build(B: int):
        g_spec = pl.BlockSpec((1, 1, W, C), lambda b, cb, v, c: (b, v, 0, 0),
                              memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_cb, V),
            in_specs=[g_spec, g_spec, g_spec],
            out_specs=out_spec,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B,) + sat_shape, jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )

    def bwd(coefs, g_o, g_dx, g_dy):
        coefs = coefs.reshape(coefs.shape[0], -1)
        return build(g_o.shape[0])(coefs, g_o, g_dx, g_dy)

    return bwd


# Full-map blocks are single-buffered (pl.Buffered(1) — the block index only
# changes with the batch), so the budget is the block size itself plus
# headroom for weights/outputs.  Verified bit-identical to the windowed
# kernel compiled on TPU (an earlier "zero output" scare was a test bug —
# out-of-bounds probe lines).
_FULLMAP_VMEM_BUDGET = 9 * 2 ** 20


def make_banded_sampler(A: int, C: int, V: int, W: int, RB: int,
                        interpret: bool = False, bf16_map: bool = False,
                        u_chunk: int = 0):
    """Build fn(sat [B,A,A,C], coefs [B,V,8]) -> (out, dx, dy) [B,V,W,C],
    differentiable w.r.t. both sat and coefs (custom VJP — the backward is
    scatter-free banded-transpose matmuls; see _bwd_kernel).

    When C isn't a multiple of 128 (TPU lane width), the satellite map is
    transposed to [B, A, C, A] around the kernel so DMA slices stay
    lane-aligned.  ``bf16_map`` samples from a bfloat16 copy of the map
    (half the VMEM/DMA; fp32 accumulation) — enables the DMA-free full-map
    kernel for larger levels at a small numeric cost.
    """
    assert RB % _SHEAR_CHUNK == 0, "RB must be a multiple of the shear chunk"
    cfirst = (C % 128 != 0) and (A % 128 == 0)
    map_dtype = jnp.bfloat16 if bf16_map else jnp.float32
    itemsize = 2 if bf16_map else 4
    full_map = (A % _SHEAR_CHUNK == 0
                and A * A * C * itemsize <= _FULLMAP_VMEM_BUDGET)
    raw_fwd = _raw_forward(A, C, V, W, RB, cfirst, interpret,
                           full_map=full_map, map_dtype=map_dtype,
                           u_chunk=u_chunk)
    # eval-only variant: the non-differentiated primal never needs the
    # cross-derivative (it only exists for the VJP's coef gradients) —
    # skips 4 of the 16 banded matmuls and one [B,V,W,C] HBM write
    raw_fwd_eval = _raw_forward(A, C, V, W, RB, cfirst, interpret,
                                full_map=full_map, map_dtype=map_dtype,
                                with_dxy=False, u_chunk=u_chunk)
    raw_bwd = _raw_backward(A, C, V, W, cfirst, interpret, u_chunk=u_chunk)

    def _prep(sat):
        sat_k = sat.astype(jnp.float32)
        if cfirst:
            sat_k = jnp.transpose(sat_k, (0, 1, 3, 2))
        return sat_k

    @jax.custom_vjp
    def sample(sat, coefs):
        out, dx, dy = raw_fwd_eval(_prep(sat), coefs.astype(jnp.float32))
        return out, dx, dy

    def sample_fwd(sat, coefs):
        out, dx, dy, dxy = raw_fwd(_prep(sat), coefs.astype(jnp.float32))
        return (out, dx, dy), (coefs, dx, dy, dxy)

    def sample_bwd(res, cts):
        coefs, dx, dy, dxy = res
        g_o, g_dx, g_dy = cts
        grad_sat = raw_bwd(coefs.astype(jnp.float32), g_o, g_dx, g_dy)
        if cfirst:
            grad_sat = jnp.transpose(grad_sat, (0, 1, 3, 2))

        # grad w.r.t. the line coefficients (bilinear second derivatives:
        # d2/dx2 = d2/dy2 = 0 a.e.; the cross term dxy survives)
        u = jnp.arange(W, dtype=jnp.float32)[None, None, :, None]
        gax = jnp.sum(g_o * dx + g_dy * dxy, axis=(2, 3))        # [B, V]
        gay = jnp.sum(g_o * dy + g_dx * dxy, axis=(2, 3))
        gbx = jnp.sum(u * (g_o * dx + g_dy * dxy), axis=(2, 3))
        gby = jnp.sum(u * (g_o * dy + g_dx * dxy), axis=(2, 3))
        zeros = jnp.zeros_like(gax)
        grad_coefs = jnp.stack(
            [gax, gbx, gay, gby, zeros, zeros, zeros, zeros], axis=-1)
        return grad_sat, grad_coefs

    sample.defvjp(sample_fwd, sample_bwd)

    # Public API: take the per-row uv endpoints and pack internally.
    # pack_row_coefs is plain jnp, so autodiff chains uv-gradients through
    # the custom VJP.  The f32 cast sits OUTSIDE the custom_vjp so its
    # primal (and therefore the cotangent the VJP must return) is f32 even
    # for bf16 feature maps — autodiff casts the gradient back upstream.
    def sample_uv(sat, uv0, uv1):
        coefs = pack_row_coefs(uv0, uv1, A, RB, W)
        return sample(sat.astype(jnp.float32), coefs)

    return sample_uv


def pack_row_coefs(uv0, uv1, A: int, RB: int, W: int):
    """Per-row line coefficients + window origin.

    uv0/uv1: [B, V, 2] — uv at u=0 and u=1 per ground row (exact: the map is
    affine in u).  Returns [B, V, 8] float32 rows
    (ax, bx, ay, by, slope, oy, 0, 0).
    """
    Ac, Bc = uv0, uv1 - uv0
    ax, ay = Ac[..., 0], Ac[..., 1]
    bx, by = Bc[..., 0], Bc[..., 1]
    eps = 1e-12
    safe_bx = jnp.where(jnp.abs(bx) > eps, bx, jnp.where(bx >= 0, eps, -eps))
    slope = by / safe_bx

    # exact in-mask u-interval: x(u) in [0, A-1] & y(u) in [0, A-1] & u in
    # [0, W-1]; y is monotone (affine), so its in-mask extrema sit at the
    # interval endpoints.
    def interval(a, b):
        lo = (0.0 - a) / jnp.where(jnp.abs(b) > eps, b,
                                   jnp.where(b >= 0, eps, -eps))
        hi = ((A - 1.0) - a) / jnp.where(jnp.abs(b) > eps, b,
                                         jnp.where(b >= 0, eps, -eps))
        return jnp.minimum(lo, hi), jnp.maximum(lo, hi)

    ux_lo, ux_hi = interval(ax, bx)
    uy_lo, uy_hi = interval(ay, by)
    u_lo = jnp.maximum(jnp.maximum(ux_lo, uy_lo), 0.0)
    u_hi = jnp.minimum(jnp.minimum(ux_hi, uy_hi), float(W - 1))
    # empty interval -> all masked; any window works
    u_hi = jnp.maximum(u_hi, u_lo)

    y_a = ay + by * u_lo
    y_b = ay + by * u_hi
    ymin = jnp.clip(jnp.minimum(y_a, y_b), 0.0, A - 1.0)
    ymax = jnp.clip(jnp.maximum(y_a, y_b), 0.0, A - 1.0)
    oy = jnp.clip(jnp.floor(ymin) - 1.0, 0.0, float(max(A - RB, 0)))

    # validity guards: the 4-row shear needs |slope| < 1, and the window must
    # cover the in-bounds vertical span.  Invalid rows are pushed fully
    # out-of-bounds -> masked-zero output (graceful degradation for extreme
    # headings far outside the solver's operating range).
    valid = (jnp.abs(slope) < 0.95) & ((ymax - ymin) <= (RB - 3))
    ax = jnp.where(valid, ax, 1e9)

    # lane 6: shear-scan chunk count — only chunks that can contain in-bounds
    # target rows (tgt <= ymax - oy + 3; see _shear_rows4).  At the solver's
    # typical |heading| <= 10 deg the span is ~A/5, so the dynamic bound cuts
    # the scan ~2-3x vs the static RB window.
    n_chunks = jnp.clip(jnp.ceil((ymax - oy + 4.0) / _SHEAR_CHUNK),
                        1.0, RB // _SHEAR_CHUNK)

    zeros = jnp.zeros_like(ax)
    return jnp.stack([ax, bx, ay, by, slope, oy, n_chunks, zeros],
                     axis=-1).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Projective-line sampler (G2SP eval fast path)
#
# The G2SP direction samples the GROUND image at the perspective projection
# of satellite-grid points (reference models_kitti.py:86-161).  Along one
# sat COLUMN the 3D points form a line, and the perspective image of a line
# is a line: homogeneous coords h(u) = h0 + u*dh are affine in the sat row
# index u, so x(u) = hx/hz, y(u) = hy/hz lie on a straight, near-horizontal
# image line (sat columns are constant-depth at heading 0).  The same
# integer-shear + banded-matmul machinery applies with a rectangular map
# [AY, AX] and the per-u coordinates computed by a projective divide.
# Eval-only (no VJP); requires the bf16 full-map residency (every level's
# ground map fits VMEM at bf16).
# ---------------------------------------------------------------------------

_NCOEF_PL = 16  # nx0 dnx ny0 dny d0 dd slope oy nck xref yref xlo xhi pad...


def _cread_pl(coef_ref, b, v, i: int):
    return coef_ref[b, v * _NCOEF_PL + i]


def _weights_projline(coef_ref, b, v, *, W: int, AY: int, AX: int,
                      col0=None, ncols=None):
    """Per-row weight construction for projective lines.

    Same contract as _weights (wx/dwx [W, ncols], rel, fy, sj, m, oy_f) with
    x(u), y(u) from the homogeneous divide and the in-bounds mask extended
    by the den > eps (in-front-of-camera) condition.  ``col0``/``ncols``
    restrict the map-column extent to a block (backward accumulator
    blocking); default = all AX columns."""
    if ncols is None:
        ncols = AX
    nx0 = _cread_pl(coef_ref, b, v, 0)
    dnx = _cread_pl(coef_ref, b, v, 1)
    ny0 = _cread_pl(coef_ref, b, v, 2)
    dny = _cread_pl(coef_ref, b, v, 3)
    d0 = _cread_pl(coef_ref, b, v, 4)
    dd = _cread_pl(coef_ref, b, v, 5)
    slope = _cread_pl(coef_ref, b, v, 6)
    oy_f = _cread_pl(coef_ref, b, v, 7)
    xref = _cread_pl(coef_ref, b, v, 9)
    yref = _cread_pl(coef_ref, b, v, 10)

    u = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0].astype(jnp.float32)
    den = d0 + dd * u
    infront = den > 1e-6
    deni = 1.0 / jnp.where(infront, den, 1.0)
    x = (nx0 + dnx * u) * deni
    y = (ny0 + dny * u) * deni

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    mask = ((x >= 0) & (x <= AX - 1) & (y >= 0) & (y <= AY - 1) & infront)
    quirk = ((x0f < AX - 1) & (y0f < AY - 1)).astype(jnp.float32)
    m = mask.astype(jnp.float32) * quirk

    j = jax.lax.broadcasted_iota(jnp.int32, (W, ncols), 1).astype(jnp.float32)
    if col0 is not None:
        j = j + (jnp.float32(col0) if isinstance(col0, (int, float))
                 else col0.astype(jnp.float32))
    x0b = x0f[:, None]
    hit0 = (j == x0b).astype(jnp.float32)
    hit1 = (j == (x0b + 1.0)).astype(jnp.float32)
    mb = m[:, None]
    wx = ((1.0 - fx)[:, None] * hit0 + fx[:, None] * hit1) * mb
    dwx = (hit1 - hit0) * mb

    jcols = j[:1]
    yj = yref + (jcols - xref) * slope
    sj = jnp.floor(yj)
    rel = y0f[:, None] - sj + 1.0
    return wx, dwx, rel, fy, sj, m, oy_f


def _kernel_projline_fullmap(coef_ref, map_ref, out_ref, dx_ref, dy_ref,
                             *rest, RB: int, W: int, AY: int, AX: int,
                             C: int, cfirst: bool, with_dxy: bool = False):
    """Full-map projective-line forward (map VMEM-resident, dynamic scan).
    ``with_dxy`` adds the cross-derivative output (the differentiable train
    variant's VJP needs it for the coefficient gradients)."""
    dxy_ref = rest[0] if with_dxy else None
    b = pl.program_id(0)
    v = pl.program_id(1)
    oy_f = _cread_pl(coef_ref, b, v, 7)
    oy = oy_f.astype(jnp.int32)
    wx, dwx, rel, fy, sj, m, _ = _weights_projline(coef_ref, b, v, W=W,
                                                   AY=AY, AX=AX)
    nck = _cread_pl(coef_ref, b, v, 8).astype(jnp.int32)

    def read_chunk(base):
        return map_ref[0, pl.ds(oy + base, _SHEAR_CHUNK)]

    _accumulate_rows(read_chunk, oy_f, wx, dwx, rel, fy, sj, m,
                     out_ref, dx_ref, dy_ref, dxy_ref,
                     RB=RB, W=W, A=AX, C=C, cfirst=cfirst, n_chunks=nck)


def _kernel_projline_blocked(coef_ref, map_ref, out_ref, dx_ref, dy_ref,
                             *rest, W: int, AY: int, AX: int, C: int,
                             CBW: int, cfirst: bool, with_dxy: bool = False):
    """Column-blocked projective-line forward (round-3 VERDICT #3).

    The full-map kernel scans the whole map width (and the row's full
    y-range) per sheared row; on the real G2SP geometry the in-bounds
    segment of a line touches only a few column blocks, and within one
    CBW-column block the line's y-extent is at most |slope|*CBW + 4 rows —
    far less than the row's total.  Processing the map in static CBW-column
    blocks with a per-block dynamic chunk scan (and skipping blocks outside
    the row's x-extent via pl.when) cuts the VPU select-scan work ~9-32x at
    the production levels (PERF.md round-3 measurement).
    """
    dxy_ref = rest[0] if with_dxy else None
    b = pl.program_id(0)
    v = pl.program_id(1)
    out_ref[0, 0] = jnp.zeros((W, C), jnp.float32)
    dx_ref[0, 0] = jnp.zeros((W, C), jnp.float32)
    dy_ref[0, 0] = jnp.zeros((W, C), jnp.float32)
    if with_dxy:
        dxy_ref[0, 0] = jnp.zeros((W, C), jnp.float32)

    def writer(acc_o, acc_dx, acc_dy, acc_dxy):
        out_ref[0, 0] += acc_o
        dx_ref[0, 0] += acc_dx
        dy_ref[0, 0] += acc_dy
        if with_dxy:
            dxy_ref[0, 0] += acc_dxy

    _projline_blocked_scan(coef_ref, map_ref, b, v, writer, W=W, AY=AY,
                           AX=AX, C=C, CBW=CBW, cfirst=cfirst,
                           with_dxy=with_dxy)


def _projline_blocked_scan(coef_ref, map_ref, b, v, writer, *, W: int,
                           AY: int, AX: int, C: int, CBW: int, cfirst: bool,
                           with_dxy: bool):
    """Shared column-blocked projective-line accumulation.

    Computes each hit block's (value, d/dx, d/dy[, d2/dxdy]) contribution
    ([W, C] registers) and hands it to ``writer(acc_o, acc_dx, acc_dy,
    acc_dxy)`` under the block's pl.when — the forward kernel accumulates
    into its VMEM-resident output blocks, the fused pixel-moments kernel
    into VMEM scratch (registers cannot cross pl.when, so skipped blocks
    cost only the window math)."""
    nx0 = _cread_pl(coef_ref, b, v, 0)
    dnx = _cread_pl(coef_ref, b, v, 1)
    ny0 = _cread_pl(coef_ref, b, v, 2)
    dny = _cread_pl(coef_ref, b, v, 3)
    d0 = _cread_pl(coef_ref, b, v, 4)
    dd = _cread_pl(coef_ref, b, v, 5)
    slope = _cread_pl(coef_ref, b, v, 6)
    xref = _cread_pl(coef_ref, b, v, 9)
    yref = _cread_pl(coef_ref, b, v, 10)
    xlo = _cread_pl(coef_ref, b, v, 11)
    xhi = _cread_pl(coef_ref, b, v, 12)

    # per-sample coordinates (shared by every block)
    u = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0].astype(jnp.float32)
    den = d0 + dd * u
    infront = den > 1e-6
    deni = 1.0 / jnp.where(infront, den, 1.0)
    x = (nx0 + dnx * u) * deni
    y = (ny0 + dny * u) * deni
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    mask = ((x >= 0) & (x <= AX - 1) & (y >= 0) & (y <= AY - 1) & infront)
    quirk = ((x0f < AX - 1) & (y0f < AY - 1)).astype(jnp.float32)
    m = mask.astype(jnp.float32) * quirk
    x0b = x0f[:, None]

    max_ck = AY // _SHEAR_CHUNK
    for jb in range(AX // CBW):
        col0 = jb * CBW
        # columns j in [col0, col0+CBW) are hit by samples with
        # x0f in [col0-1, col0+CBW-1] -> x in [col0-1, col0+CBW)
        xa = jnp.maximum(jnp.float32(col0 - 1), xlo - 1.0)
        xb_ = jnp.minimum(jnp.float32(col0 + CBW), xhi + 1.0)
        blk_hit = xb_ >= xa
        # y-window of the line segment over this block's x-range (the image
        # line is y = yref + (x - xref)*slope exactly)
        ya = yref + (xa - xref) * slope
        yb = yref + (xb_ - xref) * slope
        ymin_b = jnp.minimum(ya, yb)
        ymax_b = jnp.clip(jnp.maximum(ya, yb), 0.0, AY - 1.0)
        # chunk-aligned window start; bound trips so reads stay in the map
        oy_i = jnp.clip(((jnp.floor(ymin_b) - 1.0).astype(jnp.int32)
                         // _SHEAR_CHUNK) * _SHEAR_CHUNK,
                        0, AY - _SHEAR_CHUNK)
        avail = (AY - oy_i) // _SHEAR_CHUNK
        nck_b = jnp.ceil((ymax_b + 4.0 - oy_i.astype(jnp.float32))
                         / _SHEAR_CHUNK).astype(jnp.int32)
        nck_b = jnp.clip(nck_b, 1, max_ck)
        nck_b = jnp.minimum(nck_b, avail)

        @pl.when(blk_hit)
        def _block(col0=col0, oy_i=oy_i, nck_b=nck_b):
            j = (jax.lax.broadcasted_iota(jnp.int32, (W, CBW), 1)
                 .astype(jnp.float32) + jnp.float32(col0))
            hit0 = (j == x0b).astype(jnp.float32)
            hit1 = (j == (x0b + 1.0)).astype(jnp.float32)
            mb = m[:, None]
            wx = ((1.0 - fx)[:, None] * hit0 + fx[:, None] * hit1) * mb
            dwx = (hit1 - hit0) * mb
            jcols = j[:1]
            yj = yref + (jcols - xref) * slope
            sj = jnp.floor(yj)
            rel = y0f[:, None] - sj + 1.0
            oy_f = oy_i.astype(jnp.float32)

            if cfirst:
                def read_chunk(base):
                    return map_ref[0, pl.ds(oy_i + base, _SHEAR_CHUNK), :,
                                   col0:col0 + CBW]
            else:
                def read_chunk(base):
                    return map_ref[0, pl.ds(oy_i + base, _SHEAR_CHUNK),
                                   col0:col0 + CBW]

            acc_o = jnp.zeros((W, C), jnp.float32)
            acc_dx = jnp.zeros((W, C), jnp.float32)
            acc_dy = jnp.zeros((W, C), jnp.float32)
            acc_dxy = jnp.zeros((W, C), jnp.float32) if with_dxy else None
            shs = _shear_rows4(read_chunk, sj, oy_f, RB=AY, A=CBW, C=C,
                               cfirst=cfirst, n_chunks=nck_b)
            mats = _row_weight_mats4(wx, dwx, rel, fy, with_dxy=with_dxy)
            for r in range(4):
                sh = shs[r]
                w_o, w_dx, w_dy, w_dxy = mats[r]

                def contract(wmat):
                    if cfirst:
                        return jax.lax.dot_general(
                            wmat, sh, dimension_numbers=_DN_CFIRST,
                            preferred_element_type=jnp.float32)
                    return jnp.dot(wmat, sh,
                                   preferred_element_type=jnp.float32)

                acc_o = acc_o + contract(w_o)
                acc_dx = acc_dx + contract(w_dx)
                acc_dy = acc_dy + contract(w_dy)
                if with_dxy:
                    acc_dxy = acc_dxy + contract(w_dxy)
            writer(acc_o, acc_dx, acc_dy, acc_dxy)


def _kernel_projline_blocked_uwin(coef_ref, map_ref, out_ref, dx_ref,
                                  dy_ref, *rest, W: int, AY: int, AX: int,
                                  C: int, CBW: int, UC: int, cfirst: bool,
                                  with_dxy: bool = False):
    """Column-blocked projective-line forward with per-(line, block) dynamic
    u-windows (round-5 lever; VERDICT r4 #4's named successor to the static
    grid restriction).

    The blocked kernel builds [W, CBW] weights and issues its banded matmuls
    over ALL W samples per hit block, yet only samples whose x(u) lands in
    the block's column range have nonzero weights there — a span of roughly
    CBW/|dx/du| rows.  The round-5 isolation probe (scripts/r5_train_probe.py)
    measured these kernels VPU-build-bound with the matmuls fully hidden
    under the build, so per-sample work is THE remaining schedule lever.

    Per block: the live sample window [umin, umax] comes from a masked
    min/max over the per-line x(u) (robust for the projective divide — no
    Mobius edge cases), gets UC-aligned, and a dynamic-trip fori_loop
    rebuilds weights + issues the matmuls on [UC, CBW] row chunks,
    accumulating straight into the output refs at pl.ds row offsets.
    Excluded rows have exactly-zero weights for the block, so outputs are
    BIT-IDENTICAL to _kernel_projline_blocked (parity-tested)."""
    dxy_ref = rest[0] if with_dxy else None
    b = pl.program_id(0)
    v = pl.program_id(1)
    out_ref[0, 0] = jnp.zeros((W, C), jnp.float32)
    dx_ref[0, 0] = jnp.zeros((W, C), jnp.float32)
    dy_ref[0, 0] = jnp.zeros((W, C), jnp.float32)
    if with_dxy:
        dxy_ref[0, 0] = jnp.zeros((W, C), jnp.float32)

    nx0 = _cread_pl(coef_ref, b, v, 0)
    dnx = _cread_pl(coef_ref, b, v, 1)
    ny0 = _cread_pl(coef_ref, b, v, 2)
    dny = _cread_pl(coef_ref, b, v, 3)
    d0 = _cread_pl(coef_ref, b, v, 4)
    dd = _cread_pl(coef_ref, b, v, 5)
    slope = _cread_pl(coef_ref, b, v, 6)
    xref = _cread_pl(coef_ref, b, v, 9)
    yref = _cread_pl(coef_ref, b, v, 10)

    # full-line x(u)/validity once, for the per-block window min/max only
    u = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0].astype(jnp.float32)
    den = d0 + dd * u
    infront = den > 1e-6
    deni = 1.0 / jnp.where(infront, den, 1.0)
    x = (nx0 + dnx * u) * deni
    y = (ny0 + dny * u) * deni
    valid = ((x >= 0) & (x <= AX - 1) & (y >= 0) & (y <= AY - 1) & infront
             & (jnp.floor(x) < AX - 1) & (jnp.floor(y) < AY - 1))

    max_ck = AY // _SHEAR_CHUNK
    for jb in range(AX // CBW):
        col0 = jb * CBW
        # columns j in [col0, col0+CBW) are hit by samples with
        # x0f in [col0-1, col0+CBW-1] -> x in [col0-1, col0+CBW)
        hitb = valid & (x >= col0 - 1) & (x < col0 + CBW)
        umin = jnp.min(jnp.where(hitb, u, jnp.float32(W)))
        umax = jnp.max(jnp.where(hitb, u, -1.0))

        @pl.when(umax >= umin)
        def _block(col0=col0, umin=umin, umax=umax):
            u0 = (umin.astype(jnp.int32) // UC) * UC
            n_uch = (umax.astype(jnp.int32) - u0) // UC + 1
            # y-window of the line segment over this block's x-range
            xa = jnp.float32(col0 - 1)
            xb_ = jnp.float32(col0 + CBW)
            ya = yref + (xa - xref) * slope
            yb = yref + (xb_ - xref) * slope
            ymin_b = jnp.minimum(ya, yb)
            ymax_b = jnp.clip(jnp.maximum(ya, yb), 0.0, AY - 1.0)
            oy_i = jnp.clip(((jnp.floor(ymin_b) - 1.0).astype(jnp.int32)
                             // _SHEAR_CHUNK) * _SHEAR_CHUNK,
                            0, AY - _SHEAR_CHUNK)
            avail = (AY - oy_i) // _SHEAR_CHUNK
            nck_b = jnp.ceil((ymax_b + 4.0 - oy_i.astype(jnp.float32))
                             / _SHEAR_CHUNK).astype(jnp.int32)
            nck_b = jnp.minimum(jnp.clip(nck_b, 1, max_ck), avail)
            jcols = (jax.lax.broadcasted_iota(jnp.int32, (1, CBW), 1)
                     .astype(jnp.float32) + jnp.float32(col0))
            yj = yref + (jcols - xref) * slope
            sj = jnp.floor(yj)
            oy_f = oy_i.astype(jnp.float32)

            if cfirst:
                def read_chunk(base):
                    return map_ref[0, pl.ds(oy_i + base, _SHEAR_CHUNK), :,
                                   col0:col0 + CBW]
            else:
                def read_chunk(base):
                    return map_ref[0, pl.ds(oy_i + base, _SHEAR_CHUNK),
                                   col0:col0 + CBW]

            shs = _shear_rows4(read_chunk, sj, oy_f, RB=AY, A=CBW, C=C,
                               cfirst=cfirst, n_chunks=nck_b)

            def chunk_body(k, _):
                ub = u0 + k * UC
                uu = (jax.lax.broadcasted_iota(jnp.int32, (UC, 1), 0)[:, 0]
                      .astype(jnp.float32) + ub.astype(jnp.float32))
                denc = d0 + dd * uu
                infc = denc > 1e-6
                denic = 1.0 / jnp.where(infc, denc, 1.0)
                xc = (nx0 + dnx * uu) * denic
                yc = (ny0 + dny * uu) * denic
                x0f = jnp.floor(xc)
                y0f = jnp.floor(yc)
                fxc = xc - x0f
                fyc = yc - y0f
                mc = (((xc >= 0) & (xc <= AX - 1) & (yc >= 0)
                       & (yc <= AY - 1) & infc).astype(jnp.float32)
                      * ((x0f < AX - 1) & (y0f < AY - 1)).astype(jnp.float32))
                j = (jax.lax.broadcasted_iota(jnp.int32, (UC, CBW), 1)
                     .astype(jnp.float32) + jnp.float32(col0))
                x0b = x0f[:, None]
                hit0 = (j == x0b).astype(jnp.float32)
                hit1 = (j == (x0b + 1.0)).astype(jnp.float32)
                mb = mc[:, None]
                wx = ((1.0 - fxc)[:, None] * hit0
                      + fxc[:, None] * hit1) * mb
                dwx = (hit1 - hit0) * mb
                rel = y0f[:, None] - sj + 1.0
                mats = _row_weight_mats4(wx, dwx, rel, fyc,
                                         with_dxy=with_dxy)
                acc_o = jnp.zeros((UC, C), jnp.float32)
                acc_dx = jnp.zeros((UC, C), jnp.float32)
                acc_dy = jnp.zeros((UC, C), jnp.float32)
                acc_dxy = (jnp.zeros((UC, C), jnp.float32) if with_dxy
                           else None)
                for r in range(4):
                    sh = shs[r]
                    w_o, w_dx, w_dy, w_dxy = mats[r]

                    def contract(wmat):
                        if cfirst:
                            return jax.lax.dot_general(
                                wmat, sh, dimension_numbers=_DN_CFIRST,
                                preferred_element_type=jnp.float32)
                        return jnp.dot(wmat, sh,
                                       preferred_element_type=jnp.float32)

                    acc_o = acc_o + contract(w_o)
                    acc_dx = acc_dx + contract(w_dx)
                    acc_dy = acc_dy + contract(w_dy)
                    if with_dxy:
                        acc_dxy = acc_dxy + contract(w_dxy)
                sl = pl.ds(ub, UC)
                out_ref[0, 0, sl] += acc_o
                dx_ref[0, 0, sl] += acc_dx
                dy_ref[0, 0, sl] += acc_dy
                if with_dxy:
                    dxy_ref[0, 0, sl] += acc_dxy
                return 0

            jax.lax.fori_loop(0, n_uch, chunk_body, 0)


def pack_projline_coefs(h0, dh, AY: int, AX: int, RB: int, W: int):
    """Per-row projective-line coefficients.

    h0, dh: [B, V, 3] — homogeneous image coords of the row's 3D line,
    h(u) = h0 + u*dh for the sample index u in [0, W).  Returns
    [B, V, _NCOEF_PL] f32.
    """
    eps = 1e-6
    nx0, ny0, d0 = h0[..., 0], h0[..., 1], h0[..., 2]
    dnx, dny, dd = dh[..., 0], dh[..., 1], dh[..., 2]

    # the image line through all projections: l = h0 x h1 (homogeneous)
    l = jnp.cross(h0, h0 + dh)
    la, lb, lc = l[..., 0], l[..., 1], l[..., 2]
    safe_lb = jnp.where(jnp.abs(lb) > eps, lb,
                        jnp.where(lb >= 0, eps, -eps))
    slope = -la / safe_lb
    xref = jnp.full_like(slope, (AX - 1) / 2.0)
    yref = (-lc - la * xref) / safe_lb

    # valid-u interval: all constraints affine in u given den > 0:
    #   den-eps >= 0; x>=0; x<=AX-1; y>=0; y<=AY-1
    cons_a = jnp.stack([d0 - eps, nx0, (AX - 1.0) * d0 - nx0,
                        ny0, (AY - 1.0) * d0 - ny0], -1)
    cons_b = jnp.stack([dd, dnx, (AX - 1.0) * dd - dnx,
                        dny, (AY - 1.0) * dd - dny], -1)
    bpos = cons_b > eps
    bneg = cons_b < -eps
    ratio = -cons_a / jnp.where(jnp.abs(cons_b) > eps, cons_b, 1.0)
    lo = jnp.maximum(jnp.max(jnp.where(bpos, ratio, 0.0), -1), 0.0)
    hi = jnp.minimum(jnp.min(jnp.where(bneg, ratio, W - 1.0), -1), W - 1.0)
    flat_bad = jnp.any((~bpos) & (~bneg) & (cons_a < 0), -1)
    nonempty = (hi >= lo) & ~flat_bad

    def yat(u):
        den = d0 + dd * u
        return (ny0 + dny * u) / jnp.where(den > eps, den, 1.0)

    ya, yb = yat(lo), yat(hi)
    ymin = jnp.clip(jnp.minimum(ya, yb), 0.0, AY - 1.0)
    ymax = jnp.clip(jnp.maximum(ya, yb), 0.0, AY - 1.0)
    oy = jnp.clip(jnp.floor(ymin) - 1.0, 0.0, float(max(AY - RB, 0)))
    nck = jnp.clip(jnp.ceil((ymax - oy + 4.0) / _SHEAR_CHUNK),
                   1.0, RB // _SHEAR_CHUNK)

    valid = (nonempty & (jnp.abs(slope) < 0.95)
             & ((ymax - ymin) <= (RB - 3)) & (jnp.abs(lb) > eps))
    # invalid rows: force x far out of bounds with a safe denominator
    nx0 = jnp.where(valid, nx0, 1e9)
    dnx = jnp.where(valid, dnx, 0.0)
    d0 = jnp.where(valid, d0, 1.0)
    dd = jnp.where(valid, dd, 0.0)

    # x-extent of the valid segment (x(u) is Moebius in u with den > 0 on
    # [lo, hi] -> monotone -> extent = endpoints).  The blocked kernel skips
    # map-column blocks outside [xlo, xhi] entirely.
    def xat(u):
        den = d0 + dd * u
        return (nx0 + dnx * u) / jnp.where(den > eps, den, 1.0)

    xa_, xb_ = xat(lo), xat(hi)
    xlo = jnp.clip(jnp.minimum(xa_, xb_), 0.0, AX - 1.0)
    xhi = jnp.clip(jnp.maximum(xa_, xb_), 0.0, AX - 1.0)
    xlo = jnp.where(valid, xlo, float(AX + 10))   # no block hits
    xhi = jnp.where(valid, xhi, -10.0)

    z = jnp.zeros_like(slope)
    return jnp.stack([nx0, dnx, ny0, dny, d0, dd, slope, oy, nck,
                      xref, yref, xlo, xhi, z, z, z], -1).astype(jnp.float32)


def projline_supported(AY: int, AX: int, C: int) -> bool:
    """Whether the projective-line sampler can serve this map shape
    (8-row chunking + bf16 full-map VMEM residency)."""
    return AY % _SHEAR_CHUNK == 0 and AY * AX * C * 2 <= _FULLMAP_VMEM_BUDGET


def _raw_projline_forward(AY: int, AX: int, C: int, V: int, W: int,
                          cfirst: bool, interpret: bool, blocked: bool,
                          with_dxy: bool, u_chunk: int = 0):
    """fn(img_kernel_layout bf16, coefs_flat) -> (out, dx, dy[, dxy]).

    ``u_chunk`` > 0 selects the dynamic u-window kernel (bit-identical
    outputs, per-block sample windows in UC=u_chunk row chunks); it must
    divide W and be a multiple of 8."""
    RB = AY  # window = whole height; the dynamic chunk bound does the work
    map_shape = (AY, C, AX) if cfirst else (AY, AX, C)
    CBW = 128
    n_out = 4 if with_dxy else 3
    if blocked and AX % CBW == 0 and u_chunk and W % u_chunk == 0 \
            and u_chunk % 8 == 0:
        kernel = functools.partial(_kernel_projline_blocked_uwin, W=W,
                                   AY=AY, AX=AX, C=C, CBW=CBW, UC=u_chunk,
                                   cfirst=cfirst, with_dxy=with_dxy)
    elif blocked and AX % CBW == 0:
        kernel = functools.partial(_kernel_projline_blocked, W=W, AY=AY,
                                   AX=AX, C=C, CBW=CBW, cfirst=cfirst,
                                   with_dxy=with_dxy)
    else:
        kernel = functools.partial(_kernel_projline_fullmap, RB=RB, W=W,
                                   AY=AY, AX=AX, C=C, cfirst=cfirst,
                                   with_dxy=with_dxy)

    def build(B: int):
        out_spec = pl.BlockSpec((1, 1, W, C), lambda b, v, c: (b, v, 0, 0),
                                memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, V),
            in_specs=[pl.BlockSpec(
                (1,) + map_shape, lambda b, v, c: (b, 0, 0, 0),
                pipeline_mode=pl.Buffered(buffer_count=1),
                memory_space=pltpu.VMEM)],
            out_specs=(out_spec,) * n_out,
        )
        return pl.pallas_call(
            kernel,
            out_shape=tuple(jax.ShapeDtypeStruct((B, V, W, C), jnp.float32)
                            for _ in range(n_out)),
            grid_spec=grid_spec,
            interpret=interpret,
        )

    def fwd(img_k, coefs_flat):
        return build(img_k.shape[0])(coefs_flat, img_k)

    return fwd


def _bwd_kernel_projline(coef_ref, go_ref, gdx_ref, gdy_ref, grad_ref,
                         *, W: int, AY: int, AX: int, C: int, CB: int,
                         cfirst: bool):
    """Backward w.r.t. the (rectangular) image for the projective-line
    sampler: the same scatter-free banded transpose as _bwd_kernel, with
    the per-row weights built from the projective divide and the block
    skip / y-window driven by the packed x-extent + exact image line
    (slope, xref, yref — pack_projline_coefs lanes 6/9-12)."""
    b = pl.program_id(0)
    cb = pl.program_id(1)
    v = pl.program_id(2)

    @pl.when(v == 0)
    def _zero():
        grad_ref[...] = jnp.zeros_like(grad_ref)

    col0 = cb * CB
    xlo = _cread_pl(coef_ref, b, v, 11)
    xhi = _cread_pl(coef_ref, b, v, 12)
    blk_hit = (xhi >= jnp.float32(col0 - 1)) & (xlo <= jnp.float32(col0 + CB))

    @pl.when(blk_hit)
    def _body():
        wx, dwx, rel, fy, sj, m, _ = _weights_projline(
            coef_ref, b, v, W=W, AY=AY, AX=AX, col0=col0, ncols=CB)
        slope = _cread_pl(coef_ref, b, v, 6)
        xref = _cread_pl(coef_ref, b, v, 9)
        yref = _cread_pl(coef_ref, b, v, 10)
        xa2 = jnp.maximum(jnp.float32(col0 - 1), xlo - 1.0)
        xb2 = jnp.minimum(jnp.float32(col0 + CB), xhi + 1.0)
        ya2 = yref + (xa2 - xref) * slope
        yb2 = yref + (xb2 - xref) * slope
        ymin_b = jnp.minimum(ya2, yb2)
        ymax_b = jnp.clip(jnp.maximum(ya2, yb2), 0.0, AY - 1.0)
        oy_b = jnp.clip(((jnp.floor(ymin_b) - 1.0).astype(jnp.int32)
                         // _SHEAR_CHUNK) * _SHEAR_CHUNK,
                        0, max(AY - _SHEAR_CHUNK, 0))
        avail = (AY - oy_b) // _SHEAR_CHUNK
        nck = jnp.ceil((ymax_b + 4.0 - oy_b.astype(jnp.float32))
                       / _SHEAR_CHUNK).astype(jnp.int32)
        nck = jnp.minimum(jnp.clip(nck, 1, AY // _SHEAR_CHUNK), avail)
        c0 = oy_b // _SHEAR_CHUNK

        g_o = go_ref[0, 0]
        g_dx = gdx_ref[0, 0]
        g_dy = gdy_ref[0, 0]

        dn_t = (((0,), (0,)), ((), ()))
        Gs = []
        mats = _row_weight_mats4(wx, dwx, rel, fy, with_dxy=False)
        for r in range(4):
            w_o, w_dx, w_dy, _ = mats[r]
            if cfirst:
                # G [C, CB] to match the [AY, C, CB] block layout
                G = (jax.lax.dot_general(g_o, w_o, dimension_numbers=dn_t,
                                         preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(g_dx, w_dx, dimension_numbers=dn_t,
                                           preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(g_dy, w_dy, dimension_numbers=dn_t,
                                           preferred_element_type=jnp.float32))
            else:
                G = (jax.lax.dot_general(w_o, g_o, dimension_numbers=dn_t,
                                         preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(w_dx, g_dx, dimension_numbers=dn_t,
                                           preferred_element_type=jnp.float32)
                     + jax.lax.dot_general(w_dy, g_dy, dimension_numbers=dn_t,
                                           preferred_element_type=jnp.float32))
            Gs.append(G)
        _unshear_scatter4(grad_ref, Gs, sj, c0, nck, A=AY, CB=CB,
                          cfirst=cfirst)


def _bwd_col_blocks_rect(AY: int, AX: int, C: int, cfirst: bool,
                         target: int = 8 * 2 ** 20):
    """Column-block width over AX for the projline backward accumulator
    (rectangular-map variant of _bwd_col_blocks)."""
    n = 1
    while AY * (AX // n) * C * 4 > target and (AX // n) > (128 if cfirst
                                                           else 8):
        n *= 2
    cb = AX // n
    align = 128 if cfirst else 8
    if cb != AX and cb % align != 0:
        raise ValueError(
            f"projline backward: column block {cb} for AX={AX}, C={C} is "
            f"not {align}-aligned; use a map width that is a multiple of "
            f"{align} times a power of two")
    return cb


def _raw_projline_backward(AY: int, AX: int, C: int, V: int, W: int,
                           cfirst: bool, interpret: bool):
    """fn(coefs_flat, g_o, g_dx, g_dy) -> grad_img (kernel layout, f32),
    accumulated in VMEM-resident column blocks (see _bwd_kernel_projline)."""
    assert AY % _SHEAR_CHUNK == 0
    CB = _bwd_col_blocks_rect(AY, AX, C, cfirst)
    n_cb = AX // CB
    kernel = functools.partial(_bwd_kernel_projline, W=W, AY=AY, AX=AX, C=C,
                               CB=CB, cfirst=cfirst)
    img_shape = (AY, C, AX) if cfirst else (AY, AX, C)
    if cfirst:
        out_spec = pl.BlockSpec((1, AY, C, CB),
                                lambda b, cb, v, c: (b, 0, 0, cb),
                                pipeline_mode=pl.Buffered(buffer_count=1),
                                memory_space=pltpu.VMEM)
    else:
        out_spec = pl.BlockSpec((1, AY, CB, C),
                                lambda b, cb, v, c: (b, 0, cb, 0),
                                pipeline_mode=pl.Buffered(buffer_count=1),
                                memory_space=pltpu.VMEM)

    def build(B: int):
        g_spec = pl.BlockSpec((1, 1, W, C), lambda b, cb, v, c: (b, v, 0, 0),
                              memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, n_cb, V),
            in_specs=[g_spec, g_spec, g_spec],
            out_specs=out_spec,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B,) + img_shape, jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )

    def bwd(coefs_flat, g_o, g_dx, g_dy):
        return build(g_o.shape[0])(coefs_flat, g_o, g_dx, g_dy)

    return bwd


def make_projline_sampler(AY: int, AX: int, C: int, V: int, W: int,
                          interpret: bool = False, blocked: bool = True,
                          differentiable: bool = False, u_chunk: int = 0):
    """Build fn(img [B, AY, AX, C], coefs [B, V, _NCOEF_PL])
      -> (out, dx, dy) [B, V, W, C].

    Samples the (rectangular) image along V projective lines with W samples
    each; bilinear semantics identical to grid_sample with the G2SP clamped
    denominator replaced by an explicit in-front mask.  bf16 full-map only
    (every ground-feature level fits VMEM at bf16).  ``blocked`` selects the
    column-blocked kernel (x-span block skipping + per-block y-windows; see
    _kernel_projline_blocked).

    ``differentiable`` wraps the sampler in a custom VJP (the G2SP TRAIN
    path): grad w.r.t. the image comes from the scatter-free resident-block
    transpose kernel (_bwd_kernel_projline — the XLA scatter formulation
    measured 0.43 fps at batch 8, PERF.md round 3), grad w.r.t. the first 6
    coefficient lanes (nx0, dnx, ny0, dny, d0, dd) from the analytic
    quotient-rule chain through the saved (dx, dy, dxy); window/mask lanes
    get zero gradient (they only move masking discontinuities).  Autodiff
    then chains coef gradients through pack_projline_coefs to h0/dh and the
    pose."""
    assert AY % _SHEAR_CHUNK == 0
    cfirst = (C % 128 != 0) and (AX % 128 == 0)
    assert AY * AX * C * 2 <= _FULLMAP_VMEM_BUDGET, "map too large for VMEM"

    def _prep(img):
        img = img.astype(jnp.bfloat16)
        if cfirst:
            img = jnp.transpose(img, (0, 1, 3, 2))
        return img

    raw_eval = _raw_projline_forward(AY, AX, C, V, W, cfirst, interpret,
                                     blocked, with_dxy=False,
                                     u_chunk=u_chunk)

    if not differentiable:
        def sample(img, coefs):
            coefs = coefs.astype(jnp.float32).reshape(coefs.shape[0], -1)
            return raw_eval(_prep(img), coefs)
        return sample

    raw_fwd = _raw_projline_forward(AY, AX, C, V, W, cfirst, interpret,
                                    blocked, with_dxy=True,
                                    u_chunk=u_chunk)
    raw_bwd = _raw_projline_backward(AY, AX, C, V, W, cfirst, interpret)

    @jax.custom_vjp
    def sample(img, coefs):
        return raw_eval(_prep(img), coefs.reshape(coefs.shape[0], -1))

    def sample_fwd(img, coefs):
        out, dx, dy, dxy = raw_fwd(_prep(img),
                                   coefs.reshape(coefs.shape[0], -1))
        return (out, dx, dy), (coefs, dx, dy, dxy)

    def sample_bwd(res, cts):
        coefs, dx, dy, dxy = res
        g_o, g_dx, g_dy = cts
        grad_img = raw_bwd(coefs.reshape(coefs.shape[0], -1),
                           g_o, g_dx, g_dy)
        if cfirst:
            grad_img = jnp.transpose(grad_img, (0, 1, 3, 2))

        # coef gradients: out depends on (x, y) via the bilinear surface
        # (d2/dx2 = d2/dy2 = 0 a.e., the cross term dxy survives) and
        # x = (nx0 + dnx*u)/den, y = (ny0 + dny*u)/den, den = d0 + dd*u
        nx0, dnx = coefs[..., 0], coefs[..., 1]
        ny0, dny = coefs[..., 2], coefs[..., 3]
        d0, dd = coefs[..., 4], coefs[..., 5]
        u = jnp.arange(W, dtype=jnp.float32)
        den = d0[..., None] + dd[..., None] * u            # [B, V, W]
        infront = (den > 1e-6).astype(jnp.float32)
        deni = infront / jnp.where(den > 1e-6, den, 1.0)
        x = (nx0[..., None] + dnx[..., None] * u) * deni
        y = (ny0[..., None] + dny[..., None] * u) * deni
        g_x = jnp.sum(g_o * dx + g_dy * dxy, axis=-1)      # [B, V, W]
        g_y = jnp.sum(g_o * dy + g_dx * dxy, axis=-1)
        gd = g_x * deni
        ge = g_y * deni
        gden = -(x * g_x + y * g_y) * deni
        cols = [jnp.sum(gd, -1), jnp.sum(gd * u, -1),
                jnp.sum(ge, -1), jnp.sum(ge * u, -1),
                jnp.sum(gden, -1), jnp.sum(gden * u, -1)]
        zeros = jnp.zeros_like(cols[0])
        grad_coefs = jnp.stack(cols + [zeros] * (_NCOEF_PL - 6), axis=-1)
        return grad_img, grad_coefs

    # NOTE on remat (measured, round 3): the G2SP train path always wraps
    # its solver rounds in jax.checkpoint (lm_g2sp.py), and plain custom_vjp
    # residuals are opaque to remat — the backward re-runs sample_fwd, so
    # the kernel executes twice per round (raw_eval primal + raw_fwd remat).
    # defvjp(..., optimize_remat=True) eliminates the re-run by SAVING the
    # residuals (coefs, dx, dy, dxy) through the checkpoint — but storing
    # 3x[B,A,A,C] f32 per round x 15 rounds (~3.5 GB at batch 8) trades the
    # recompute for HBM pressure: measured NEUTRAL at fp32 (322.8 vs 327 ms)
    # and -22% at bf16 feature compute (371 vs ~290 ms) on TPU v5e
    # (scripts/r3_g2sp_remat_probe.py) — rejected; the recompute is the
    # cheaper side of the trade at these shapes.  Gradient-neutrality of
    # remat over this VJP is pinned by test_projline_diff_grad_under_remat.
    sample.defvjp(sample_fwd, sample_bwd)

    def sample_pub(img, coefs):
        # f32 casts OUTSIDE the custom_vjp: the cotangents the VJP returns
        # are then f32 and autodiff casts them back upstream (bf16 feature
        # compute), same pattern as make_banded_sampler.sample_uv
        return sample(img.astype(jnp.float32), coefs.astype(jnp.float32))

    return sample_pub


def _pixmom_from_accs(acc_o, acc_dx, acc_dy, tgt, *, W: int):
    """The five per-pixel channel moments of the G2SP residual.

    acc_o/acc_dx/acc_dy: [W, C] sampled value + screen derivatives;
    tgt: [W, C] target (satellite) feature row.  Returns [W, _MOM_LANES]
    f32 in PIXMOM_IDX lane order (sxx, sxy, syy, rx, ry; rest zero) —
    everything ``lm_update_pixel_moments`` needs, with the [W, C]x3 kernel
    outputs never reaching HBM.  Out-of-view pixels carry zero dx/dy, so
    every lane is implicitly masked (same as lm_update_implicit_pixel)."""
    r = acc_o - tgt.astype(jnp.float32)
    cols = [
        jnp.sum(acc_dx * acc_dx, -1, keepdims=True),   # sxx
        jnp.sum(acc_dx * acc_dy, -1, keepdims=True),   # sxy
        jnp.sum(acc_dy * acc_dy, -1, keepdims=True),   # syy
        jnp.sum(acc_dx * r, -1, keepdims=True),        # rx
        jnp.sum(acc_dy * r, -1, keepdims=True),        # ry
    ]
    lane = jax.lax.broadcasted_iota(jnp.int32, (W, _MOM_LANES), 1)
    P = jnp.zeros((W, _MOM_LANES), jnp.float32)
    for i, c in enumerate(cols):
        P = P + c * (lane == i).astype(jnp.float32)
    return P


def _kernel_projline_pixmom_fullmap(coef_ref, map_ref, tgt_ref, pm_ref,
                                    *, RB: int, W: int, AY: int, AX: int,
                                    C: int, cfirst: bool):
    """Full-map fused pixel-moments projective-line forward (eval-only)."""
    b = pl.program_id(0)
    v = pl.program_id(1)
    oy_f = _cread_pl(coef_ref, b, v, 7)
    oy = oy_f.astype(jnp.int32)
    wx, dwx, rel, fy, sj, m, _ = _weights_projline(coef_ref, b, v, W=W,
                                                   AY=AY, AX=AX)
    nck = _cread_pl(coef_ref, b, v, 8).astype(jnp.int32)

    def read_chunk(base):
        return map_ref[0, pl.ds(oy + base, _SHEAR_CHUNK)]

    acc = _accumulate_values(read_chunk, oy_f, wx, dwx, rel, fy, sj, m,
                             RB=RB, W=W, A=AX, C=C, cfirst=cfirst,
                             n_chunks=nck)
    pm_ref[0, 0] = _pixmom_from_accs(*acc, tgt_ref[0, 0], W=W)


def _kernel_projline_pixmom_blocked(coef_ref, map_ref, tgt_ref, pm_ref,
                                    scr_o, scr_dx, scr_dy, *, W: int,
                                    AY: int, AX: int, C: int, CBW: int,
                                    cfirst: bool):
    """Column-blocked fused pixel-moments projective-line forward.

    Identical block scan to _kernel_projline_blocked (x-span block skip +
    per-block y-windows), but the (value, d/dx, d/dy) accumulate into VMEM
    scratch and only the [W, 16] moment lanes are written — the [W, C]x3
    outputs and the separate lm_update contraction pass never touch HBM."""
    b = pl.program_id(0)
    v = pl.program_id(1)
    scr_o[...] = jnp.zeros((W, C), jnp.float32)
    scr_dx[...] = jnp.zeros((W, C), jnp.float32)
    scr_dy[...] = jnp.zeros((W, C), jnp.float32)

    def writer(acc_o, acc_dx, acc_dy, _):
        scr_o[...] += acc_o
        scr_dx[...] += acc_dx
        scr_dy[...] += acc_dy

    _projline_blocked_scan(coef_ref, map_ref, b, v, writer, W=W, AY=AY,
                           AX=AX, C=C, CBW=CBW, cfirst=cfirst,
                           with_dxy=False)
    pm_ref[0, 0] = _pixmom_from_accs(scr_o[...], scr_dx[...], scr_dy[...],
                                     tgt_ref[0, 0], W=W)


def _raw_projline_pixmom(AY: int, AX: int, C: int, V: int, W: int,
                         cfirst: bool, interpret: bool, blocked: bool):
    """fn(img_kernel_layout bf16, tgt [B, V, W, C], coefs_flat)
    -> pm [B, V, W, _MOM_LANES] f32 (PIXMOM_IDX lanes)."""
    RB = AY
    map_shape = (AY, C, AX) if cfirst else (AY, AX, C)
    CBW = 128
    use_blocked = blocked and AX % CBW == 0
    if use_blocked:
        kernel = functools.partial(_kernel_projline_pixmom_blocked, W=W,
                                   AY=AY, AX=AX, C=C, CBW=CBW, cfirst=cfirst)
        scratch = [pltpu.VMEM((W, C), jnp.float32)] * 3
    else:
        kernel = functools.partial(_kernel_projline_pixmom_fullmap, RB=RB,
                                   W=W, AY=AY, AX=AX, C=C, cfirst=cfirst)
        scratch = []

    def build(B: int):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, V),
            in_specs=[
                pl.BlockSpec((1,) + map_shape, lambda b, v, c: (b, 0, 0, 0),
                             pipeline_mode=pl.Buffered(buffer_count=1),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W, C), lambda b, v, c: (b, v, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, W, _MOM_LANES),
                                   lambda b, v, c: (b, v, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=scratch,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((B, V, W, _MOM_LANES),
                                           jnp.float32),
            grid_spec=grid_spec,
            interpret=interpret,
        )

    def fwd(img_k, tgt, coefs_flat):
        return build(img_k.shape[0])(coefs_flat, img_k, tgt)

    return fwd


def make_projline_pixmom(AY: int, AX: int, C: int, V: int, W: int,
                         interpret: bool = False, blocked: bool = True):
    """Build fn(img [B, AY, AX, C], tgt [B, V, W, C], coefs
    [B, V, _NCOEF_PL]) -> pm [B, V, W, 16] (PIXMOM_IDX lanes).

    Fused pixel-moments variant of make_projline_sampler (G2SP EVAL fast
    path): the same projective-line bilinear sampling, but the per-pixel
    channel contractions of ``lm_update_implicit_pixel``
    (solver/updates.py:441 — sxx/sxy/syy and dx.r/dy.r with
    r = out - tgt) happen inside the kernel, so the [B, V, W, C]x3
    (out, dx, dy) fields never exist in HBM and the separate moments pass
    disappears.  Feed the result to ``lm_update_pixel_moments``.
    Eval-only: non-differentiable (training keeps the differentiable
    sampler and its custom VJP)."""
    assert AY % _SHEAR_CHUNK == 0
    cfirst = (C % 128 != 0) and (AX % 128 == 0)
    assert AY * AX * C * 2 <= _FULLMAP_VMEM_BUDGET, "map too large for VMEM"
    raw = _raw_projline_pixmom(AY, AX, C, V, W, cfirst, interpret, blocked)

    def pixmom(img, tgt, coefs):
        img = img.astype(jnp.bfloat16)
        if cfirst:
            img = jnp.transpose(img, (0, 1, 3, 2))
        coefs = coefs.astype(jnp.float32).reshape(coefs.shape[0], -1)
        return raw(img, tgt, coefs)

    return pixmom
