"""Ford-AV geometry: camera->body->world->satellite projection chain.

TPU-native re-design of the reference's Ford projection
(reference: /root/reference/models_ford.py:110-264).

Frames (Ford): body X north, Y east, Z down; camera extrinsics (R_FL, T_FL)
from the calibration YAML map camera->body (Xb = R_FL @ Xc + T_FL).  The
normalized pose scales are *swapped* relative to KITTI in the reference
(shift_u uses shift_range_lat, shift_v uses shift_range_lon,
models_ford.py:212-213) — preserved.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from highlyaccurate_tpu.utils import geo

# Front-left camera intrinsics (reference models_ford.py:116-130): original
# 1656x860 frame K, pre-scaled to the 1024x256 network input.
K_FL_RAW = np.array([[945.391406, 0.0, 855.502825],
                     [0.0, 945.668274, 566.372868],
                     [0.0, 0.0, 1.0]], dtype=np.float64)
H_FL, W_FL = 860, 1656
NET_H, NET_W = 256, 1024


def ford_camera_k(net_h: int = NET_H, net_w: int = NET_W) -> np.ndarray:
    k = K_FL_RAW.copy()
    k[0, :] = k[0, :] / W_FL * net_w
    k[1, :] = k[1, :] / H_FL * net_h
    return k


def grd_img2cam_ford(grd_H: int, grd_W: int, ori_grdH: int, ori_grdW: int):
    """Ground-plane ray intersections under the Ford camera
    (reference models_ford.py:110-155).

    Returns xyz_grd [H, W, 3], mask [H, W], xyz_w [H, W, 3] (unit-depth rays,
    used by the estimated-depth lift).
    """
    k = ford_camera_k(ori_grdH, ori_grdW)
    k[0, :] *= grd_W / ori_grdW
    k[1, :] *= grd_H / ori_grdH
    k_inv = np.linalg.inv(k)

    v, u = np.meshgrid(np.arange(grd_H, dtype=np.float64),
                       np.arange(grd_W, dtype=np.float64), indexing="ij")
    uv1 = np.stack([u, v, np.ones_like(u)], axis=-1)
    xyz_w = uv1 @ k_inv.T
    denom = np.where(np.abs(xyz_w[..., 1:2]) > geo.EPS, xyz_w[..., 1:2], geo.EPS)
    w = geo.CAMERA_HEIGHT / denom
    xyz_grd = xyz_w * w
    mask = (xyz_grd[..., 2] > 0).astype(np.float32)
    return xyz_grd.astype(np.float32), mask, xyz_w.astype(np.float32)


def depth_lift(xyz_w, depth):
    """Estimated-height ground lift (reference models_ford.py:192-200).

    xyz_w: [H, W, 3] unit-depth rays; depth: [B, H, W, 1] estimated height.
    Returns Xc [B, H, W, 3], mask [B, H, W].
    """
    denom = jnp.where(jnp.abs(xyz_w[..., 1:2]) > geo.EPS, xyz_w[..., 1:2],
                      geo.EPS)
    w = (geo.CAMERA_HEIGHT - depth) / denom[None]
    Xc = xyz_w[None] * w
    mask = (Xc[..., 2] > 0).astype(jnp.float32)
    return Xc, mask


# satellite-alignment rotation: world(N,E,D) -> sat pixel axes (u east, v south)
_RS = np.array([[0.0, 1.0, 0.0],
                [-1.0, 0.0, 0.0],
                [0.0, 0.0, 1.0]], dtype=np.float32)


def ford_uv_jac(pose, R_FL, T_FL, Xc, satmap_sidelength_meters: float,
                satmap_sidelength_pixels: int, rotation_range: float,
                shift_range_lat: float, shift_range_lon: float,
                require_jac: bool = True):
    """Pose -> satellite pixel coords + analytic Jacobian.

    Reference models_ford.py:173-264 (cam2body2world2sat):
      Xb = R_FL Xc + T_FL; Tw = [shift_v_m, -shift_u_m, 0];
      Xw = Rz(yaw) (Xb + Tw); Xs = Rs Xw; uv = Xs[:2]/mpp + A//2.

    Args:
      pose: [B, 3] normalized (shift_u, shift_v, theta).
      R_FL [B, 3, 3]; T_FL [B, 3]; Xc [H, W, 3] or [B, H, W, 3].
    Returns uv [B, H, W, 2], duv_dpose [B, H, W, 2, 3] (or None).
    """
    B = pose.shape[0]
    shift_u_m = pose[:, 0] * shift_range_lat  # reference's swapped scaling
    shift_v_m = pose[:, 1] * shift_range_lon
    yaw = pose[:, 2] * (rotation_range / 180.0 * np.pi)

    if Xc.ndim == 3:
        Xb = jnp.einsum("bij,hwj->bhwi", R_FL, Xc) + T_FL[:, None, None, :]
    else:
        Xb = jnp.einsum("bij,bhwj->bhwi", R_FL, Xc) + T_FL[:, None, None, :]

    Tw = jnp.stack([shift_v_m, -shift_u_m, jnp.zeros_like(shift_u_m)], axis=-1)

    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    zeros, ones = jnp.zeros_like(cos), jnp.ones_like(cos)
    Rw = jnp.stack([cos, sin, zeros,
                    -sin, cos, zeros,
                    zeros, zeros, ones], axis=-1).reshape(B, 3, 3)
    Xbt = Xb + Tw[:, None, None, :]
    Xw = jnp.einsum("bij,bhwj->bhwi", Rw, Xbt)
    Rs = jnp.asarray(_RS)
    Xs = jnp.einsum("ij,bhwj->bhwi", Rs, Xw)

    # mpp may be a python scalar or a per-sample [B] vector (the dataset's
    # satmap_sidelength_meters is constant, but the API accepts either);
    # reshape a vector so it broadcasts over the trailing (..., 2) axes —
    # naive division would line [B] up against the uv-component axis.
    mpp = jnp.asarray(satmap_sidelength_meters) / satmap_sidelength_pixels
    mpp_hw = mpp.reshape(mpp.shape + (1,) * (Xs.ndim - mpp.ndim)) \
        if mpp.ndim else mpp
    uv = Xs[..., :2] / mpp_hw + satmap_sidelength_pixels // 2

    if not require_jac:
        return uv, None

    rot_scale = rotation_range / 180.0 * np.pi
    dRw = rot_scale * jnp.stack([-sin, cos, zeros,
                                 -cos, -sin, zeros,
                                 zeros, zeros, zeros], axis=-1).reshape(B, 3, 3)
    dTw_du = shift_range_lat * jnp.array([0.0, -1.0, 0.0])
    dTw_dv = shift_range_lon * jnp.array([1.0, 0.0, 0.0])

    dXw_dtheta = jnp.einsum("bij,bhwj->bhwi", dRw, Xbt)
    dXw_du = jnp.einsum("bij,j->bi", Rw, dTw_du)  # [B, 3]
    dXw_dv = jnp.einsum("bij,j->bi", Rw, dTw_dv)

    dXs_dtheta = jnp.einsum("ij,bhwj->bhwi", Rs, dXw_dtheta)
    dXs_du = jnp.einsum("ij,bj->bi", Rs, dXw_du)
    dXs_dv = jnp.einsum("ij,bj->bi", Rs, dXw_dv)

    mpp_b = mpp.reshape(mpp.shape + (1,)) if mpp.ndim else mpp  # for [B, 2]
    duv_dtheta = dXs_dtheta[..., :2] / mpp_hw
    duv_du = jnp.broadcast_to((dXs_du[..., :2] / mpp_b)[:, None, None, :],
                              uv.shape)
    duv_dv = jnp.broadcast_to((dXs_dv[..., :2] / mpp_b)[:, None, None, :],
                              uv.shape)
    duv = jnp.stack([duv_du, duv_dv, duv_dtheta], axis=-1)  # [B,H,W,2,3]
    return uv, duv


def qvec2rotmat(qvec):
    """Quaternion [w, x, y, z] -> rotation matrix
    (reference dataLoader/Ford_dataset.py:62-72)."""
    w, x, y, z = qvec
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * z * x + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
        [2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y]])


def qvec2angle(q0, q1, q2, q3):
    """Quaternion -> (roll, pitch, yaw) degrees
    (reference dataLoader/Ford_dataset.py:74-78)."""
    roll = np.arctan2(2.0 * (q3 * q2 + q0 * q1),
                      1.0 - 2.0 * (q1 * q1 + q2 * q2)) / np.pi * 180
    pitch = np.arcsin(2.0 * (q2 * q0 - q3 * q1)) / np.pi * 180
    yaw = np.arctan2(2.0 * (q3 * q0 + q1 * q2),
                     -1.0 + 2.0 * (q0 * q0 + q1 * q1)) / np.pi * 180
    return roll, pitch, yaw
