"""Native C++ warp parity tests against PIL."""

import numpy as np
import pytest

from highlyaccurate_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native warp unavailable")


def _pil_affine(img_arr, matrix, out_size=None):
    from PIL import Image
    img = Image.fromarray(img_arr)
    out = img.transform(img.size, Image.AFFINE, matrix,
                        resample=Image.BILINEAR)
    return np.asarray(out)


def test_translation_parity_vs_pil():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)
    m = (1.0, 0.0, 5.3, 0.0, 1.0, -2.7)
    want = _pil_affine(img, m)
    got = native.affine_warp(img, m, (64, 64))
    # interior parity (PIL's edge fill differs by design)
    diff = np.abs(want[8:-8, 8:-8].astype(int) - got[8:-8, 8:-8].astype(int))
    assert diff.max() <= 1  # rounding-only differences


def test_rotation_parity_vs_pil():
    """Matches PIL rotate with BILINEAR resampling.  (Note: the reference's
    GT chain uses PIL's default NEAREST rotations — the PIL-parity eval path
    in data/kitti.py keeps that; this native kernel is the bilinear fused
    training path.)"""
    from PIL import Image
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (64, 64, 3), np.uint8)
    want = np.asarray(Image.fromarray(img).rotate(
        17.0, resample=Image.BILINEAR))
    m = native.rotate_matrix(17.0, 64, 64)
    got = native.affine_warp(img, m, (64, 64))
    diff = np.abs(want[10:-10, 10:-10].astype(int)
                  - got[10:-10, 10:-10].astype(int))
    assert np.percentile(diff, 99) <= 2


def test_fused_chain_geometry_matches_pil_chain():
    """On a smooth image (no resampling aliasing) the fused single-pass warp
    must land within ~a pixel of the 4-pass PIL chain everywhere interior."""
    from highlyaccurate_tpu.data.kitti import synthesize_sat
    from highlyaccurate_tpu.utils import geo
    from PIL import Image

    yy, xx = np.mgrid[0:512, 0:512].astype(np.float32)
    arr = np.stack([xx / 2, yy / 2, (xx + yy) / 4], -1).astype(np.uint8)
    img = Image.fromarray(arr)
    heading, sx, sy, th = 0.3, 0.4, -0.2, 0.5
    want = np.asarray(synthesize_sat(img, heading, sx, sy, th, 20.0, 20.0,
                                     10.0, 512)).astype(np.float32)
    mpp = geo.get_meter_per_pixel(scale=1)
    m = native.fused_synthesize_matrix(heading, sx, sy, th, 20.0, 20.0, 10.0,
                                       512, 512, 512, mpp)
    got = native.affine_warp(arr, m, (512, 512)).astype(np.float32)
    interior = (slice(64, -64), slice(64, -64))
    err = np.abs(want[interior] - got[interior])
    # gradient slope is 0.5 intensity/px: sub-2-intensity error ~ sub-4-px...
    # in practice NEAREST rotations cost < 1 px:
    assert err.mean() < 1.0
    assert np.percentile(err, 99) < 3.0


def test_u8_to_f32_normalize():
    img = np.full((8, 8, 3), 255, np.uint8)
    out = native.affine_warp(img, (1, 0, 0, 0, 1, 0), (8, 8), normalize=True)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, 1.0, atol=1e-6)


def test_compose_affine_identity():
    m = native.compose_affine((1, 0, 3, 0, 1, 4), (1, 0, -3, 0, 1, -4))
    np.testing.assert_allclose(m, (1, 0, 0, 0, 1, 0), atol=1e-12)


def test_ford_fused_chain_matches_pil_chain():
    """Ford GT-synthesis chain: fused single-pass warp vs the 4-pass PIL
    chain (smooth image, interior pixels)."""
    from highlyaccurate_tpu.data.ford import (METERS_PER_PIXEL,
                                              synthesize_ford_sat)
    from PIL import Image

    yy, xx = np.mgrid[0:640, 0:640].astype(np.float32)
    arr = np.stack([xx / 3, yy / 3, (xx + yy) / 6], -1).astype(np.uint8)
    img = Image.fromarray(arr)
    bdu, bdv, yaw, su, sv, th = 4.2, -2.8, 12.0, 0.4, -0.2, 0.5
    want = np.asarray(synthesize_ford_sat(
        img, bdu, bdv, yaw, su, sv, th, 20.0, 20.0, 10.0,
        512)).astype(np.float32)
    m = native.ford_synthesize_matrix(bdu, bdv, yaw, su, sv, th, 20.0, 20.0,
                                      10.0, 640, 640, 512, METERS_PER_PIXEL)
    got = native.affine_warp(arr, m, (512, 512)).astype(np.float32)
    interior = (slice(64, -64), slice(64, -64))
    err = np.abs(want[interior] - got[interior])
    assert err.mean() < 1.0
    assert np.percentile(err, 99) < 3.0
