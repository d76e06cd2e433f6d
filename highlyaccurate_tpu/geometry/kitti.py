"""KITTI cross-view geometry: ground-plane rays and pose->pixel projections.

TPU-native re-design of the reference's projection math
(reference: /root/reference/models_kitti.py:54-161, 655-801, 289-331).

Everything here is a *pure function* of the pose so that the analytic
Jacobians can be unit-verified against ``jax.jacfwd`` (the reference kept
equivalent checks commented out, e.g. models_kitti.py:825-910).

Layout conventions (TPU-first, differs from the torch reference):
  * features are channel-last ``[B, H, W, C]``;
  * pose is a single array ``[B, 3] = (shift_u, shift_v, heading)`` in
    normalized units (multiplied by the config ranges inside);
  * Jacobians of pixel coords w.r.t. pose are ``[B, H, W, 2, 3]``.

Frames (identical to the reference):
  * real world: X south, Y down, Z east; origin on the ground plane;
  * camera: +x south (u), +y down (v), +z forward (east at heading 0);
  * satellite pixels: u east, v south, origin at patch top-left.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from highlyaccurate_tpu.utils import geo

# The reference uses one fixed K for ray precomputation regardless of the
# per-drive calibration (models_kitti.py:657-660) — preserved exactly.
DEFAULT_CAMERA_K = np.array(
    [[582.9802, 0.0, 496.2420],
     [0.0, 482.7076, 125.0034],
     [0.0, 0.0, 1.0]], dtype=np.float32)


def grd_img2cam(grd_H: int, grd_W: int, ori_grdH: int, ori_grdW: int,
                camera_k: np.ndarray | None = None):
    """Per-pixel ground-plane ray intersections in the camera frame.

    Re-implements the ray precomputation of reference models_kitti.py:655-682.

    Returns (host numpy, computed once at model build):
      xyz_grd: [H, W, 3] 3D point on the ground plane for each ground pixel
      mask:    [H, W]    1.0 where the ray points forward (z > 0)
      xyz_w:   [H, W, 3] unit-depth ray (used for the gt/estimated-depth lift)
    """
    if camera_k is None:
        camera_k = DEFAULT_CAMERA_K
    k = camera_k.astype(np.float64).copy()
    k[0, :] *= grd_W / ori_grdW
    k[1, :] *= grd_H / ori_grdH
    k_inv = np.linalg.inv(k)

    v, u = np.meshgrid(np.arange(grd_H, dtype=np.float64),
                       np.arange(grd_W, dtype=np.float64), indexing="ij")
    uv1 = np.stack([u, v, np.ones_like(u)], axis=-1)  # [H, W, 3]
    xyz_w = uv1 @ k_inv.T  # [H, W, 3]

    denom = np.where(np.abs(xyz_w[..., 1:2]) > geo.EPS, xyz_w[..., 1:2], geo.EPS)
    w = geo.CAMERA_HEIGHT / denom
    xyz_grd = xyz_w * w
    mask = (xyz_grd[..., 2] > 0).astype(np.float32)
    return xyz_grd.astype(np.float32), mask, xyz_w.astype(np.float32)


def grd_img2cam_polar(grd_H: int, grd_W: int, max_radius: float = 30.0):
    """Polar ground-plane parameterization (reference models_kitti.py:684-698)."""
    v, u = np.meshgrid(np.arange(grd_H, dtype=np.float64),
                       np.arange(grd_W, dtype=np.float64), indexing="ij")
    theta = u / grd_W * np.pi / 4
    radius = (1 - v / grd_H) * max_radius
    z = radius * np.cos(np.pi / 4 - theta)
    x = -radius * np.sin(np.pi / 4 - theta)
    y = geo.CAMERA_HEIGHT * np.ones_like(z)
    xyz_grd = np.stack([x, y, z], axis=-1).astype(np.float32)
    mask = np.ones((grd_H, grd_W), dtype=np.float32)
    return xyz_grd, mask


def pose_to_cam2world(pose, rotation_range: float, shift_range_lat: float,
                      shift_range_lon: float):
    """Camera->world rotation/translation from a normalized pose.

    Reference math: models_kitti.py:718-737.
      R = Ry(heading) (world<-camera), T = -R @ [shift_v, h_cam, -shift_u].

    Args:
      pose: [B, 3] normalized (shift_u, shift_v, heading).
    Returns:
      R [B, 3, 3], T [B, 3].
    """
    heading = pose[:, 2] * (rotation_range / 180.0 * np.pi)
    shift_u = pose[:, 0] * shift_range_lon
    shift_v = pose[:, 1] * shift_range_lat

    cos, sin = jnp.cos(heading), jnp.sin(heading)
    zeros, ones = jnp.zeros_like(cos), jnp.ones_like(cos)
    R = jnp.stack([cos, zeros, -sin,
                   zeros, ones, zeros,
                   sin, zeros, cos], axis=-1).reshape(-1, 3, 3)
    height = geo.CAMERA_HEIGHT * ones
    T0 = jnp.stack([shift_v, height, -shift_u], axis=-1)  # [B, 3]
    T = -jnp.einsum("bij,bj->bi", R, T0)
    return R, T


def s2gp_uv(pose, xyz_grd, satmap_sidelength: int, rotation_range: float,
            shift_range_lat: float, shift_range_lon: float):
    """Satellite pixel coords of each ground pixel under pose.

    Pure-function core of reference models_kitti.py:700-766 (sans Jacobian).

    Args:
      pose: [B, 3]; xyz_grd: [H, W, 3] or [B, H, W, 3] ground-plane points.
    Returns:
      sat_uv: [B, H, W, 2] in satellite pixel units.
    """
    R, T = pose_to_cam2world(pose, rotation_range, shift_range_lat, shift_range_lon)
    if xyz_grd.ndim == 3:
        xyz = jnp.einsum("bij,hwj->bhwi", R, xyz_grd) + T[:, None, None, :]
    else:
        xyz = jnp.einsum("bij,bhwj->bhwi", R, xyz_grd) + T[:, None, None, :]
    zx = jnp.stack([xyz[..., 2], xyz[..., 0]], axis=-1)  # [B, H, W, 2]
    meter_per_pixel = geo.get_meter_per_pixel() * (
        geo.get_process_satmap_sidelength() / satmap_sidelength)
    return zx / meter_per_pixel + satmap_sidelength / 2


def s2gp_uv_jac(pose, xyz_grd, satmap_sidelength: int, rotation_range: float,
                shift_range_lat: float, shift_range_lon: float):
    """``s2gp_uv`` plus the closed-form Jacobian d(uv)/d(pose).

    Analytic chain of reference models_kitti.py:767-799, re-derived for the
    [B, H, W, 2, 3] layout.  Verified against jax.jacfwd in
    tests/test_geometry.py.

    Returns:
      sat_uv [B, H, W, 2], duv_dpose [B, H, W, 2, 3].
    """
    heading = pose[:, 2] * (rotation_range / 180.0 * np.pi)
    cos, sin = jnp.cos(heading), jnp.sin(heading)
    zeros = jnp.zeros_like(cos)
    R, T = pose_to_cam2world(pose, rotation_range, shift_range_lat, shift_range_lon)

    batched = xyz_grd.ndim == 4
    if batched:
        xyz = jnp.einsum("bij,bhwj->bhwi", R, xyz_grd) + T[:, None, None, :]
    else:
        xyz = jnp.einsum("bij,hwj->bhwi", R, xyz_grd) + T[:, None, None, :]
    zx = jnp.stack([xyz[..., 2], xyz[..., 0]], axis=-1)

    meter_per_pixel = geo.get_meter_per_pixel() * (
        geo.get_process_satmap_sidelength() / satmap_sidelength)
    sat_uv = zx / meter_per_pixel + satmap_sidelength / 2

    # d(xyz)/d(shift_u): T = -R @ T0, dT0/du = [0, 0, -shift_range_lon]
    rot_scale = rotation_range / 180.0 * np.pi
    dT0_du = jnp.array([0.0, 0.0, -1.0]) * shift_range_lon
    dT0_dv = jnp.array([1.0, 0.0, 0.0]) * shift_range_lat
    dxyz_du = -jnp.einsum("bij,j->bi", R, dT0_du)  # [B, 3]
    dxyz_dv = -jnp.einsum("bij,j->bi", R, dT0_dv)  # [B, 3]

    dR_dtheta = rot_scale * jnp.stack(
        [-sin, zeros, -cos,
         zeros, zeros, zeros,
         cos, zeros, -sin], axis=-1).reshape(-1, 3, 3)
    heading_ = pose[:, 2] * rot_scale
    del heading_
    shift_u = pose[:, 0] * shift_range_lon
    shift_v = pose[:, 1] * shift_range_lat
    height = geo.CAMERA_HEIGHT * jnp.ones_like(shift_u)
    T0 = jnp.stack([shift_v, height, -shift_u], axis=-1)
    dT_dtheta = -jnp.einsum("bij,bj->bi", dR_dtheta, T0)  # [B, 3]
    if batched:
        dxyz_dtheta = jnp.einsum("bij,bhwj->bhwi", dR_dtheta, xyz_grd) \
            + dT_dtheta[:, None, None, :]
    else:
        dxyz_dtheta = jnp.einsum("bij,hwj->bhwi", dR_dtheta, xyz_grd) \
            + dT_dtheta[:, None, None, :]

    # uv = [xyz.z, xyz.x] / mpp + A/2 -> duv = [dxyz.z, dxyz.x] / mpp
    def to_uv(dxyz):
        return jnp.stack([dxyz[..., 2], dxyz[..., 0]], axis=-1) / meter_per_pixel

    H, W = xyz.shape[1:3]
    duv_du = jnp.broadcast_to(to_uv(dxyz_du)[:, None, None, :], sat_uv.shape)
    duv_dv = jnp.broadcast_to(to_uv(dxyz_dv)[:, None, None, :], sat_uv.shape)
    duv_dtheta = to_uv(dxyz_dtheta)

    duv_dpose = jnp.stack([duv_du, duv_dv, duv_dtheta], axis=-1)  # [B,H,W,2,3]
    return sat_uv, duv_dpose


def warp_sat2real(satmap_sidelength: int):
    """Ground-plane 3D point under each satellite pixel (G2SP direction).

    Re-implements reference models_kitti.py:54-84 (host-side precompute).
    Returns XYZ1 [A, A, 4] homogeneous world points (Y = 0 ground plane).
    """
    i = np.arange(satmap_sidelength, dtype=np.float64)
    ii, jj = np.meshgrid(i, i, indexing="ij")  # ii: v (south), jj: u (east)
    u0 = v0 = satmap_sidelength // 2
    uc, vc = jj - u0, ii - v0
    meter_per_pixel = geo.get_meter_per_pixel() * (
        geo.get_process_satmap_sidelength() / satmap_sidelength)
    # Aff_sat2real = mpp * [[0, 1], [1, 0]]: u_center->Z (east), v_center->X (south)
    X = meter_per_pixel * vc
    Z = meter_per_pixel * uc
    Y = np.zeros_like(X)
    ones = np.ones_like(X)
    return np.stack([X, Y, Z, ones], axis=-1).astype(np.float32)


def g2sp_inview_col_start(A: int, grd_H: int, grd_W: int,
                          rotation_range: float,
                          shift_range_lat: float, shift_range_lon: float,
                          margin: float = 1.5, align: int = 8,
                          fov_slack: float = 1.1) -> int:
    """Westmost satellite column that can EVER project into the ground image.

    The G2SP residual grid spans the full A x A satellite plane, but a sat
    point only contributes to the LM normal equations when it projects in
    front of the camera AND inside the ground image — otherwise its sampled
    features and screen derivatives are zero, i.e. zero rows of J (reference
    mask: /root/reference/models_kitti.py:123-125 + jacobian.py:168-172).
    The camera sits near the patch center looking east; columns west of its
    westmost in-range position are never visible, so dropping them changes
    nothing numerically for any pose within ``margin`` x the training range
    (margin covers transient LM overshoot — G2SP has no re-init/clamp).

    Host-side numpy (model setup).  The bound is taken over a dense 5^3 pose
    grid of the ``margin``-scaled box (measured: the extremum sits at box
    corners; see scripts/r4_g2sp_grid_study.py), with the default K's FOV
    widened by ``fov_slack`` to cover per-drive calibration variation, a
    2-px bilinear-support slop, and alignment DOWN to a multiple of
    ``align``.  Returns j0: use satellite columns [j0, A).

    ``grd_H``/``grd_W`` are the LEVEL's feature-map size.  DEFAULT_CAMERA_K
    is calibrated for the reference's 1024x256 network input
    (models_kitti.py:657-660); the KITTI loader rescales the per-drive K to
    the input size the same way (KITTI_dataset.py:84-100), so scaling the
    default straight to the level size matches the runtime K the model sees
    up to per-drive variation (covered by fov_slack).
    """
    import itertools as _it

    k = DEFAULT_CAMERA_K.astype(np.float64).copy()
    k[0, 0] /= fov_slack  # widen FOV: conservative for any real K
    k[1, 1] /= fov_slack
    k[0, :] *= grd_W / 1024.0
    k[1, :] *= grd_H / 256.0
    XYZ1 = warp_sat2real(A).astype(np.float64)  # [A(i), A(j), 4]
    rot_scale = rotation_range / 180.0 * np.pi

    vals = np.array([-margin, -margin / 2, 0.0, margin / 2, margin])
    jmin = A
    for su, sv, th in _it.product(vals, repeat=3):
        heading = -th * rot_scale  # G2SP rotates by -heading (g2sp_P)
        cos, sin = np.cos(heading), np.sin(heading)
        R = np.array([[cos, 0.0, -sin], [0.0, 1.0, 0.0], [sin, 0.0, cos]])
        T = np.array([[sv * shift_range_lat], [geo.CAMERA_HEIGHT],
                      [-su * shift_range_lon]])
        P = k @ np.concatenate([R, T], axis=1)  # [3, 4]
        uv1 = XYZ1 @ P.T  # [A, A, 3]
        front = uv1[..., 2] > 1e-6
        den = np.maximum(uv1[..., 2], 1e-6)
        u, v = uv1[..., 0] / den, uv1[..., 1] / den
        # 1-px slop on each side: the clamped-corner sampler has nonzero
        # screen derivatives up to one pixel outside the image
        inb = front & (u > -1) & (u < grd_W + 1) & (v > -1) & (v < grd_H + 1)
        js = np.where(inb.any(axis=0))[0]
        if len(js):
            jmin = min(jmin, int(js.min()))
    j0 = max(jmin - 2, 0)
    return (j0 // align) * align


def g2sp_P(pose, camera_k, grd_H: int, grd_W: int, ori_grdH: int,
           ori_grdW: int, rotation_range: float, shift_range_lat: float,
           shift_range_lon: float):
    """The G2SP perspective projection matrix P = K' [R(-heading) | T]
    (reference models_kitti.py:101-121).  Returns [B, 3, 4]."""
    B = pose.shape[0]
    shift_u_m = pose[:, 0:1] * shift_range_lon
    shift_v_m = pose[:, 1:2] * shift_range_lat
    rot_scale = rotation_range / 180.0 * np.pi
    heading = pose[:, 2:3] * rot_scale

    cos = jnp.cos(-heading)[:, 0]
    sin = jnp.sin(-heading)[:, 0]
    zeros, ones = jnp.zeros_like(cos), jnp.ones_like(cos)
    R = jnp.stack([cos, zeros, -sin,
                   zeros, ones, zeros,
                   sin, zeros, cos], axis=-1).reshape(B, 3, 3)

    height = geo.CAMERA_HEIGHT * jnp.ones_like(shift_u_m)
    T = jnp.concatenate([shift_v_m, height, -shift_u_m], axis=-1)[..., None]

    k = camera_k.astype(jnp.float32)
    k = k.at[:, 0, :].multiply(grd_W / ori_grdW)
    k = k.at[:, 1, :].multiply(grd_H / ori_grdH)
    return k @ jnp.concatenate([R, T], axis=-1)  # [B, 3, 4]


def g2sp_uv_jac(pose, XYZ1, camera_k, grd_H: int, grd_W: int,
                ori_grdH: int, ori_grdW: int, rotation_range: float,
                shift_range_lat: float, shift_range_lon: float):
    """Perspective projection of satellite ground points into the camera.

    Reference math: models_kitti.py:86-150 (seq_warp_real2camera) with its
    analytic quotient-rule Jacobian.  Note the G2SP rotation uses -heading
    (world->camera) — preserved.

    Args:
      pose: [B, 3] normalized; XYZ1: [A, A, 4]; camera_k: [B, 3, 3] raw K.
    Returns:
      uv [B, A, A, 2] ground-image pixel coords,
      duv_dpose [B, A, A, 2, 3],
      mask [B, A, A] (points in front of the camera).
    """
    B = pose.shape[0]
    rot_scale = rotation_range / 180.0 * np.pi
    heading = pose[:, 2:3] * rot_scale
    cos = jnp.cos(-heading)[:, 0]
    sin = jnp.sin(-heading)[:, 0]
    zeros = jnp.zeros_like(cos)
    k = camera_k.astype(jnp.float32)
    k = k.at[:, 0, :].multiply(grd_W / ori_grdW)
    k = k.at[:, 1, :].multiply(grd_H / ori_grdH)
    P = g2sp_P(pose, camera_k, grd_H, grd_W, ori_grdH, ori_grdW,
               rotation_range, shift_range_lat, shift_range_lon)

    uv1 = jnp.einsum("bij,hwj->bhwi", P, XYZ1)  # [B, A, A, 3]
    uv1_last = jnp.maximum(uv1[..., 2:], 1e-6)
    uv = uv1[..., :2] / uv1_last
    mask = uv1[..., 2] > 1e-6

    # Jacobians (quotient rule), reference models_kitti.py:126-150.
    dT_du = shift_range_lon * jnp.array([0.0, 0.0, -1.0]).reshape(3, 1)
    dT_dv = shift_range_lat * jnp.array([1.0, 0.0, 0.0]).reshape(3, 1)
    zeros33 = jnp.zeros((B, 3, 3))
    # d(-heading)/d(theta_norm) = -rot_scale; dR terms below already folded.
    dR_dtheta = rot_scale * jnp.stack(
        [sin, zeros, cos,
         zeros, zeros, zeros,
         -cos, zeros, sin], axis=-1).reshape(B, 3, 3)
    dP_du = k @ jnp.concatenate([zeros33, jnp.broadcast_to(dT_du, (B, 3, 1))], axis=-1)
    dP_dv = k @ jnp.concatenate([zeros33, jnp.broadcast_to(dT_dv, (B, 3, 1))], axis=-1)
    dP_dtheta = k @ jnp.concatenate([dR_dtheta, jnp.zeros((B, 3, 1))], axis=-1)

    def quotient(dP):
        duv1 = jnp.einsum("bij,hwj->bhwi", dP, XYZ1)
        return duv1[..., :2] / uv1_last - uv[..., :2] * duv1[..., 2:] / uv1_last

    duv_du = jnp.where(mask[..., None], quotient(dP_du), 0.0)
    duv_dv = jnp.where(mask[..., None], quotient(dP_dv), 0.0)
    duv_dtheta = jnp.where(mask[..., None], quotient(dP_dtheta), 0.0)
    duv_dpose = jnp.stack([duv_du, duv_dv, duv_dtheta], axis=-1)
    return uv, duv_dpose, mask


def inplane_uv_jac(pose, satmap_sidelength: int, rotation_range: float,
                   shift_range_lat: float, shift_range_lon: float):
    """In-plane SE(2) warp for proj='nn' (reference models_kitti.py:289-331).

    Returns uv [B, A, A, 2], duv_dpose [B, A, A, 2, 3], mask [B, A, A].
    """
    A = satmap_sidelength
    meter_per_pixel = geo.get_meter_per_pixel() * (
        geo.get_process_satmap_sidelength() / A)
    B = pose.shape[0]
    shift_u_px = pose[:, 0:1] * shift_range_lon / meter_per_pixel
    shift_v_px = pose[:, 1:2] * shift_range_lat / meter_per_pixel
    T = jnp.concatenate([-shift_u_px, shift_v_px], axis=-1)  # [B, 2]

    rot_scale = rotation_range / 180.0 * np.pi
    heading = pose[:, 2] * rot_scale
    cos, sin = jnp.cos(heading), jnp.sin(heading)
    R = jnp.stack([cos, -sin, sin, cos], axis=-1).reshape(B, 2, 2)

    i = np.arange(A, dtype=np.float32)
    vg, ug = np.meshgrid(i, i, indexing="ij")
    uv2 = jnp.asarray(np.stack([ug, vg], axis=-1)) - A / 2  # [A, A, 2]

    uv1 = jnp.einsum("bij,hwj->bhwi", R, uv2)
    uv = uv1 + T[:, None, None, :] + A / 2
    mask = jnp.ones(uv.shape[:-1], dtype=uv.dtype)

    duv_du = jnp.broadcast_to(
        jnp.array([-1.0, 0.0]) * (shift_range_lon / meter_per_pixel), uv.shape)
    duv_dv = jnp.broadcast_to(
        jnp.array([0.0, 1.0]) * (shift_range_lat / meter_per_pixel), uv.shape)
    dR_dtheta = rot_scale * jnp.stack([-sin, -cos, cos, -sin], axis=-1).reshape(B, 2, 2)
    duv_dtheta = jnp.einsum("bij,hwj->bhwi", dR_dtheta, uv2)
    duv_dpose = jnp.stack([duv_du, duv_dv, duv_dtheta], axis=-1)
    return uv, duv_dpose, mask
