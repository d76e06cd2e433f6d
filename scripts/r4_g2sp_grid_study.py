"""Round 4: G2SP restricted-residual-grid study (VERDICT r3 next-item #2).

The G2SP residual grid is the full A x A satellite plane, but a sat point
only contributes to the LM normal equations when it projects in front of the
camera AND inside the ground image (otherwise its sampled features and
screen derivatives are zero -> zero rows of J).  Geometry
(geometry/kitti.py:242-296): the camera sits near the patch center looking
east (+u); points west of the camera are NEVER visible for any pose in
range, and the visible wedge is bounded by the horizontal FOV (~83deg for
the fixed reference K) + heading range.

This script measures, per level, the UNION in-view mask over the pose range
(with a safety margin for transient LM overshoot), reports the union
fraction, and derives the best static rectangle restriction
(kernel rows = sat columns j; line axis = sat rows i):

  * j-range [j0, A): columns east of the camera's westmost in-range position
  * i-range [i0, i1): union wedge bounding box

Run CPU-only: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/r4_g2sp_grid_study.py
"""

import itertools

import numpy as np
import jax.numpy as jnp

from highlyaccurate_tpu.geometry import kitti as geom


def in_view_mask(pose, A, Hg, Wg, grd_h=256, grd_w=1024):
    k = np.broadcast_to(geom.DEFAULT_CAMERA_K, (pose.shape[0], 3, 3))
    XYZ1 = jnp.asarray(geom.warp_sat2real(A))
    uv, _, mask = geom.g2sp_uv_jac(
        jnp.asarray(pose), XYZ1, jnp.asarray(k), Hg, Wg, grd_h, grd_w,
        rotation_range=10.0, shift_range_lat=20.0, shift_range_lon=20.0)
    uv = np.asarray(uv)
    m = np.asarray(mask)
    # bilinear support slop of 1px on each side (clamped-corner sampler)
    inb = (uv[..., 0] > -1) & (uv[..., 0] < Wg + 1) \
        & (uv[..., 1] > -1) & (uv[..., 1] < Hg + 1)
    return (m & inb)  # [B, A(i), A(j)]


def study(margin=1.5, n_random=64):
    print(f"pose box: [-{margin}, {margin}]^3 (normalized; 1.0 = "
          "20 m / 20 m / 10 deg)")
    rng = np.random.RandomState(0)
    corners = np.array(list(itertools.product([-margin, margin], repeat=3)),
                       np.float32)
    edges = []  # extremes along each axis with others swept
    for ax in range(3):
        for v in (-margin, margin):
            e = rng.uniform(-margin, margin, (8, 3)).astype(np.float32)
            e[:, ax] = v
            edges.append(e)
    poses = np.concatenate([corners, np.concatenate(edges),
                            rng.uniform(-margin, margin, (n_random, 3))
                            .astype(np.float32)])

    for lvl, (A, Hg, Wg) in enumerate([(64, 32, 128), (128, 64, 256),
                                       (256, 128, 512)]):
        union = np.zeros((A, A), bool)
        for i in range(0, len(poses), 16):
            m = in_view_mask(poses[i:i + 16], A, Hg, Wg)
            union |= m.any(axis=0)
        frac = union.mean()
        # rectangle: j = sat column (east), i = sat row (south)
        js = np.where(union.any(axis=0))[0]
        is_ = np.where(union.any(axis=1))[0]
        j0, j1 = int(js.min()), int(js.max()) + 1
        i0, i1 = int(is_.min()), int(is_.max()) + 1
        rect = (j1 - j0) * (i1 - i0) / (A * A)
        print(f"L{lvl}: A={A:3d} grd {Hg}x{Wg} | union in-view {frac:6.1%} | "
              f"rect j[{j0:3d},{j1:3d}) i[{i0:3d},{i1:3d}) keep {rect:6.1%}")
        # per-column (j) i-spans: how much a per-row restriction could save
        spans = union.sum(axis=0)[j0:j1]
        print(f"     kept-rect in-view density "
              f"{union[i0:i1, j0:j1].mean():6.1%}; "
              f"mean per-j i-span inside rect {spans.mean() / (i1 - i0):6.1%}")


if __name__ == "__main__":
    study()
