"""Geometry parity tests: analytic Jacobians vs jax.jacfwd.

These replace the reference's commented-out autodiff cross-checks
(reference models_kitti.py:179-230, 825-910; see SURVEY.md §4.1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from highlyaccurate_tpu.geometry import kitti as G

ROT, LAT, LON = 10.0, 20.0, 20.0


@pytest.fixture(scope="module")
def rays():
    return G.grd_img2cam(32, 128, 256, 1024)


def test_grd_img2cam_shapes_and_mask(rays):
    xyz, mask, xyz_w = rays
    assert xyz.shape == (32, 128, 3)
    assert mask.shape == (32, 128)
    # rows looking above the horizon must be masked out, bottom rows valid
    assert mask[-1].all()
    assert not mask[0].any()
    # all unmasked points sit on the ground plane (y = camera height)
    assert np.allclose(xyz[..., 1][mask > 0], 1.65, atol=1e-4)


def test_s2gp_uv_center(rays):
    """Zero pose maps the point right under the camera to the patch center."""
    xyz, mask, _ = rays
    pose = jnp.zeros((1, 3))
    uv = G.s2gp_uv(pose, jnp.asarray(xyz), 512, ROT, LAT, LON)
    # a ground point at (X=0, Z=0) would be exactly at A/2; the closest ray
    # points (bottom rows, small Z) must land near the center
    from highlyaccurate_tpu.utils import geo
    d = np.linalg.norm(np.asarray(uv[0, -1]) - 256.0, axis=-1)
    mpp = geo.get_meter_per_pixel()
    z_bottom = xyz[-1, :, 2] / mpp  # forward distance in px
    assert (d <= z_bottom + np.abs(xyz[-1, :, 0]) / mpp + 1e-3).all()


def test_s2gp_jac_matches_jacfwd(rays):
    xyz, mask, _ = rays
    xyz = jnp.asarray(xyz)
    key = jax.random.PRNGKey(0)
    pose = jax.random.uniform(key, (4, 3), minval=-1, maxval=1)

    uv, duv = G.s2gp_uv_jac(pose, xyz, 512, ROT, LAT, LON)
    uv2 = G.s2gp_uv(pose, xyz, 512, ROT, LAT, LON)
    np.testing.assert_allclose(uv, uv2, rtol=1e-5, atol=1e-4)

    def single(p):
        return G.s2gp_uv(p[None], xyz, 512, ROT, LAT, LON)[0]

    auto = jax.vmap(jax.jacfwd(single))(pose)  # [B, H, W, 2, 3]
    np.testing.assert_allclose(np.asarray(duv), np.asarray(auto),
                               rtol=1e-4, atol=1e-2)


def test_g2sp_jac_matches_jacfwd():
    XYZ1 = jnp.asarray(G.warp_sat2real(64))
    k = jnp.asarray(G.DEFAULT_CAMERA_K)[None].repeat(3, axis=0)
    key = jax.random.PRNGKey(1)
    pose = jax.random.uniform(key, (3, 3), minval=-0.5, maxval=0.5)

    uv, duv, mask = G.g2sp_uv_jac(pose, XYZ1, k, 32, 128, 256, 1024,
                                  ROT, LAT, LON)

    def single(p, kk):
        u, _, m = G.g2sp_uv_jac(p[None], XYZ1, kk[None], 32, 128, 256, 1024,
                                ROT, LAT, LON)
        return u[0]

    auto = jax.vmap(jax.jacfwd(single))(pose, k)  # [B, A, A, 2, 3]
    m = np.asarray(mask)[..., None, None]
    np.testing.assert_allclose(np.asarray(duv) * m, np.asarray(auto) * m,
                               rtol=1e-4, atol=1e-2)


def test_inplane_jac_matches_jacfwd():
    key = jax.random.PRNGKey(2)
    pose = jax.random.uniform(key, (2, 3), minval=-1, maxval=1)
    uv, duv, mask = G.inplane_uv_jac(pose, 64, ROT, LAT, LON)

    def single(p):
        return G.inplane_uv_jac(p[None], 64, ROT, LAT, LON)[0][0]

    auto = jax.vmap(jax.jacfwd(single))(pose)
    np.testing.assert_allclose(np.asarray(duv), np.asarray(auto),
                               rtol=1e-4, atol=1e-2)


def test_polar_rays():
    xyz, mask = G.grd_img2cam_polar(32, 128)
    assert xyz.shape == (32, 128, 3)
    r = np.linalg.norm(xyz[..., [0, 2]], axis=-1)
    # top row at max radius, bottom row near 0
    np.testing.assert_allclose(r[0], 30.0, atol=1e-4)
    assert (r[-1] < 1.0).all()


def test_geo_utils_conversions():
    from highlyaccurate_tpu.utils import geo as G2
    # meter<->latlon roundtrip
    lat, lon = G2.meter2latlon(49.0, 8.4, 100.0, -50.0)
    x, y = G2.gps2meters(49.0, 8.4, lat, lon)
    np.testing.assert_allclose([x, y], [100.0, -50.0], atol=0.5)
    # gps2utm is monotone in lon/lat
    x1, y1 = G2.gps2utm(49.0, 8.4)
    x2, y2 = G2.gps2utm(49.001, 8.401)
    assert x2 > x1 and y2 > y1
    # camera shift magnitudes
    sx, sy = G2.get_camera_gps_shift(0.0)
    np.testing.assert_allclose([sx, sy], [1.08, 0.26], atol=1e-9)
    assert abs(G2.get_camera_max_meter_shift()
               - np.hypot(1.08, 0.26)) < 1e-9
