"""Differentiable bilinear sampling with pose-Jacobian chaining.

TPU-native re-design of the reference sampler
(reference: /root/reference/jacobian.py:138-205).

Semantics preserved exactly:
  * ``uv`` is in **pixel units** ([0, W] x [0, H]), not normalized;
  * corner indices are clamped to the image, and the bilinear weights are
    computed from the *clamped* corner coordinates (so a sample exactly on
    the right/bottom edge gets weight 0 — a reference quirk kept for parity);
  * the in-bounds mask is computed from the raw (unclamped) coordinates and
    multiplies both value and Jacobian.

Layout is channel-last ``[B, H, W, C]`` (TPU-first; the reference is NCHW).

The gather is expressed as 4 flattened-spatial ``take_along_axis`` ops which
XLA lowers to native TPU gathers; the Jacobian chain
``jac = dout/duv @ duv/dpose`` is a fused per-pixel [C,2]x[2,3] contraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _gather_corners(image, ix, iy):
    """Gather the 4 bilinear corner values.

    image: [B, IH, IW, C]; ix, iy: [B, H, W] float pixel coords.
    Returns corner values (nw, ne, sw, se) each [B, H, W, C] and the clamped
    corner coordinates needed for the weights.

    TPU note: fetched as ONE [2, 2, C] block gather per point (~30% faster
    than 4 row gathers; scripts/microbench_gather2.py).  Block slice-starts
    clip to [0, A-2] which can fetch different raw values than the
    reference's per-corner clamping ONLY at points whose bilinear weights /
    in-bounds mask are zero — so sampled values are bit-identical (verified
    against the reference-semantics oracle in tests/test_grid_sample.py).
    """
    B, IH, IW, C = image.shape

    ix_nw = jnp.floor(ix)
    iy_nw = jnp.floor(iy)
    ix_se = ix_nw + 1
    iy_se = iy_nw + 1

    # clamped corner coords for the weights (reference jacobian.py:156-166)
    cx_nw = jnp.clip(ix_nw, 0, IW - 1)
    cy_nw = jnp.clip(iy_nw, 0, IH - 1)
    cx_se = jnp.clip(ix_se, 0, IW - 1)
    cy_se = jnp.clip(iy_se, 0, IH - 1)

    y0 = jnp.clip(iy_nw, 0, IH - 2).astype(jnp.int32).reshape(B, -1)
    x0 = jnp.clip(ix_nw, 0, IW - 2).astype(jnp.int32).reshape(B, -1)

    def per_b(im, ys, xs):
        starts = jnp.stack([ys, xs], axis=-1)  # [P, 2]
        dnums = lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        return lax.gather(im, starts, dnums, slice_sizes=(2, 2, C),
                          mode=lax.GatherScatterMode.CLIP)  # [P, 2, 2, C]

    block = jax.vmap(per_b)(image, y0, x0)  # [B, P, 2, 2, C]
    shape = ix.shape + (C,)
    nw_val = block[:, :, 0, 0].reshape(shape)
    ne_val = block[:, :, 0, 1].reshape(shape)
    sw_val = block[:, :, 1, 0].reshape(shape)
    se_val = block[:, :, 1, 1].reshape(shape)
    return (nw_val, ne_val, sw_val, se_val), (cx_nw, cy_nw, cx_se, cy_se)


def _sample_parts(image, uv):
    """Shared bilinear core: out + the pieces for the uv-derivatives."""
    IH, IW = image.shape[1:3]
    ix = uv[..., 0]
    iy = uv[..., 1]

    (nw_val, ne_val, sw_val, se_val), (cx_nw, cy_nw, cx_se, cy_se) = \
        _gather_corners(image, ix, iy)

    mask = ((ix >= 0) & (ix <= IW - 1) & (iy >= 0) & (iy <= IH - 1))
    maskf = mask.astype(image.dtype)

    # weights from *clamped* corner coords (reference jacobian.py:174-177)
    nw = (cx_se - ix) * (cy_se - iy) * maskf
    ne = (ix - cx_nw) * (cy_se - iy) * maskf
    sw = (cx_se - ix) * (iy - cy_nw) * maskf
    se = (ix - cx_nw) * (iy - cy_nw) * maskf

    out = (nw_val * nw[..., None] + ne_val * ne[..., None]
           + sw_val * sw[..., None] + se_val * se[..., None])
    corners = (nw_val, ne_val, sw_val, se_val)
    coords = (ix, iy, cx_nw, cy_nw, cx_se, cy_se, maskf)
    return out, corners, coords


def _screen_derivs(corners, coords):
    """d(out)/d(u), d(out)/d(v) from corner values (reference
    jacobian.py:190-194).

    dup factors: the reference clamps each corner separately, so at an exact
    boundary coordinate both x (or y) corners collapse to the same texel and
    the cross-derivative vanishes; the block fetch reads distinct texels, so
    (cx_se-cx_nw) / (cy_se-cy_nw) (1 interior, 0 collapsed) restores parity.
    """
    nw_val, ne_val, sw_val, se_val = corners
    ix, iy, cx_nw, cy_nw, cx_se, cy_se, maskf = coords
    dup_x = (cx_se - cx_nw)
    dup_y = (cy_se - cy_nw)
    dout_du = (nw_val * (-(cy_se - iy) * maskf)[..., None]
               + ne_val * ((cy_se - iy) * maskf)[..., None]
               + sw_val * (-(iy - cy_nw) * maskf)[..., None]
               + se_val * ((iy - cy_nw) * maskf)[..., None]) * dup_x[..., None]
    dout_dv = (nw_val * (-(cx_se - ix) * maskf)[..., None]
               + ne_val * (-(ix - cx_nw) * maskf)[..., None]
               + sw_val * ((cx_se - ix) * maskf)[..., None]
               + se_val * ((ix - cx_nw) * maskf)[..., None]) * dup_y[..., None]
    return dout_du, dout_dv


def grid_sample(image, uv, duv_dpose=None):
    """Bilinear sample ``image`` at ``uv``; optionally chain a pose Jacobian.

    Args:
      image: [B, IH, IW, C].
      uv:    [B, H, W, 2] pixel coords (u = x in [0, IW], v = y in [0, IH]).
      duv_dpose: optional [B, H, W, 2, P] Jacobian of uv w.r.t. P pose DoFs.

    Returns:
      out: [B, H, W, C]
      jac: [B, H, W, C, P] = d(out)/d(pose), or None.
    """
    out, corners, coords = _sample_parts(image, uv)
    if duv_dpose is None:
        return out, None
    dout_du, dout_dv = _screen_derivs(corners, coords)
    dout_duv = jnp.stack([dout_du, dout_dv], axis=-1)  # [B, H, W, C, 2]
    jac = jnp.einsum("bhwcu,bhwup->bhwcp", dout_duv,
                     duv_dpose.astype(dout_duv.dtype))
    return out, jac


def grid_sample_derivs(image, uv):
    """Bilinear sample + screen-space derivatives, NO pose-Jacobian chain.

    Feeds the implicit-J LM updates (solver/updates.py): H and g contract
    from (out, dout/du, dout/dv) and the analytic duv/dpose without ever
    materializing the [B, H, W, C, P] feature Jacobian in HBM — the
    gather-path analogue of the banded kernel's implicit fast path
    (round-2 VERDICT next-step #2).

    Returns (out, dout_du, dout_dv), each [B, H, W, C].  Identical numerics
    to the pieces ``grid_sample`` chains (same corner gathers, clamped-corner
    weights, dup factors, in-bounds masking).
    """
    out, corners, coords = _sample_parts(image, uv)
    dout_du, dout_dv = _screen_derivs(corners, coords)
    return out, dout_du, dout_dv
