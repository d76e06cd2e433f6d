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


def _kernel(coef_ref, sat_ref, out_ref, dx_ref, dy_ref, win_ref, sem,
            *, RB: int, W: int, A: int, C: int, cfirst: bool):
    """coef_ref: scalar-prefetched [B, V, 8] SMEM f32 rows
    (ax, bx, ay, by, slope, oy, _, _); sat_ref: [B, A, A, C] HBM (or
    [B, A, C, A] when ``cfirst`` — used when C isn't 128-lane aligned);
    out/dx/dy_ref: [1, 1, W, C] VMEM blocks; win_ref matches sat layout."""
    b = pl.program_id(0)
    v = pl.program_id(1)

    oy_f = coef_ref[b, v, 5]
    oy = oy_f.astype(jnp.int32)
    cp = pltpu.make_async_copy(sat_ref.at[b, pl.ds(oy, RB)], win_ref, sem)
    cp.start()

    ax = coef_ref[b, v, 0]
    bx = coef_ref[b, v, 1]
    ay = coef_ref[b, v, 2]
    by = coef_ref[b, v, 3]
    slope = coef_ref[b, v, 4]

    u = jax.lax.broadcasted_iota(jnp.int32, (W, 1), 0)[:, 0]
    u = u.astype(jnp.float32)  # [W]
    x = ax + bx * u
    y = ay + by * u

    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = x - x0f
    fy = y - y0f
    mask = ((x >= 0) & (x <= A - 1) & (y >= 0) & (y <= A - 1))
    # exact-integer right/bottom-edge quirk: under the mask, x0f == A-1 only
    # when x == A-1 exactly, where the reference's clamped weights all vanish
    quirk = ((x0f < A - 1) & (y0f < A - 1)).astype(jnp.float32)
    m = mask.astype(jnp.float32) * quirk  # [W]

    # banded x-weights over window columns j
    j = jax.lax.broadcasted_iota(jnp.int32, (W, A), 1).astype(jnp.float32)
    x0b = x0f[:, None]
    hit0 = (j == x0b).astype(jnp.float32)
    hit1 = (j == (x0b + 1.0)).astype(jnp.float32)
    wx = (1.0 - fx)[:, None] * hit0 + fx[:, None] * hit1
    dwx = -hit0 + hit1

    # line height per window column and integer shear
    jcols = jax.lax.broadcasted_iota(jnp.int32, (1, A), 1).astype(jnp.float32)
    yj = ay + (jcols - ax) * slope        # [1, A]
    sj = jnp.floor(yj)                    # [1, A]

    cp.wait()

    y0b = y0f[:, None]                    # [W, 1]
    rel = y0b - sj + 1.0                  # [W, A] tap row in sheared coords

    acc_o = jnp.zeros((W, C), jnp.float32)
    acc_dx = jnp.zeros((W, C), jnp.float32)
    acc_dy = jnp.zeros((W, C), jnp.float32)

    n_chunks = RB // _SHEAR_CHUNK

    dn_cfirst = (((1,), (1,)), ((), ()))  # [W, A] x [C, A] -> [W, C]

    for r in range(4):
        tgt = sj - oy_f + (r - 1.0)       # [1, A] window row per column

        if cfirst:
            def chunk_body(ci, sh):
                base = ci * _SHEAR_CHUNK
                rr = (jax.lax.broadcasted_iota(jnp.int32, (_SHEAR_CHUNK, A), 0)
                      .astype(jnp.float32) + base.astype(jnp.float32))
                sel = (rr == tgt).astype(jnp.float32)          # [chunk, A]
                wchunk = win_ref[pl.ds(base, _SHEAR_CHUNK)]    # [chunk, C, A]
                return sh + jnp.sum(sel[:, None, :] * wchunk, axis=0)

            sh = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                   jnp.zeros((C, A), jnp.float32))
        else:
            def chunk_body(ci, sh):
                base = ci * _SHEAR_CHUNK
                rr = (jax.lax.broadcasted_iota(jnp.int32, (_SHEAR_CHUNK, A), 0)
                      .astype(jnp.float32) + base.astype(jnp.float32))
                sel = (rr == tgt).astype(jnp.float32)          # [chunk, A]
                wchunk = win_ref[pl.ds(base, _SHEAR_CHUNK)]    # [chunk, A, C]
                return sh + jnp.sum(sel[:, :, None] * wchunk, axis=0)

            sh = jax.lax.fori_loop(0, n_chunks, chunk_body,
                                   jnp.zeros((A, C), jnp.float32))

        is_r0 = (rel == float(r)).astype(jnp.float32)      # y0 tap here
        is_r1 = (rel == float(r - 1)).astype(jnp.float32)  # y0+1 tap here
        gy = (1.0 - fy)[:, None] * is_r0 + fy[:, None] * is_r1
        dgy = -is_r0 + is_r1

        mb = m[:, None]

        def contract(wmat):
            if cfirst:
                return jax.lax.dot_general(
                    wmat, sh, dimension_numbers=dn_cfirst,
                    preferred_element_type=jnp.float32)
            return jnp.dot(wmat, sh, preferred_element_type=jnp.float32)

        acc_o = acc_o + contract(wx * gy * mb)
        acc_dx = acc_dx + contract(dwx * gy * mb)
        acc_dy = acc_dy + contract(wx * dgy * mb)

    out_ref[0, 0] = acc_o
    dx_ref[0, 0] = acc_dx
    dy_ref[0, 0] = acc_dy


def make_banded_sampler(A: int, C: int, V: int, W: int, RB: int,
                        interpret: bool = False):
    """Build fn(sat [B,A,A,C], coefs [B,V,8]) -> (out, dx, dy) [B,V,W,C].

    When C isn't a multiple of 128 (TPU lane width), the satellite map is
    transposed to [B, A, C, A] before the kernel so the DMA slice's minor
    dimension stays lane-aligned.
    """
    assert RB % _SHEAR_CHUNK == 0, "RB must be a multiple of the shear chunk"
    cfirst = (C % 128 != 0) and (A % 128 == 0)
    kernel = functools.partial(_kernel, RB=RB, W=W, A=A, C=C, cfirst=cfirst)
    win_shape = (RB, C, A) if cfirst else (RB, A, C)

    def build(B: int):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # coefs land whole in SMEM
            grid=(B, V),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, W, C), lambda b, v, c: (b, v, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W, C), lambda b, v, c: (b, v, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, W, C), lambda b, v, c: (b, v, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM(win_shape, jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((B, V, W, C), jnp.float32),
                jax.ShapeDtypeStruct((B, V, W, C), jnp.float32),
                jax.ShapeDtypeStruct((B, V, W, C), jnp.float32),
            ),
            grid_spec=grid_spec,
            interpret=interpret,
        )

    def sample(sat, coefs):
        B = sat.shape[0]
        call = build(B)
        sat = sat.astype(jnp.float32)
        if cfirst:
            sat = jnp.transpose(sat, (0, 1, 3, 2))  # [B, A, C, A]
        return call(coefs.astype(jnp.float32), sat)

    return sample


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

    zeros = jnp.zeros_like(ax)
    return jnp.stack([ax, bx, ay, by, slope, oy, zeros, zeros],
                     axis=-1).astype(jnp.float32)
