"""Data-pipeline tests: PIL GT synthesis, loader, synthetic datasets."""

import numpy as np
import pytest

from highlyaccurate_tpu.data.kitti import (Loader, SyntheticKitti, collate,
                                           parse_calib_k, synthesize_sat)


def test_synthesize_sat_identity_center():
    """With zero heading/shift/rot the chain is (almost) a center crop +
    the constant camera-GPS offset."""
    from PIL import Image
    rng = np.random.RandomState(0)
    img = Image.fromarray(rng.randint(0, 255, (512, 512, 3), np.uint8))
    out = synthesize_sat(img, 0.0, 0.0, 0.0, 0.0, 20.0, 20.0, 10.0, 512)
    assert out.size == (512, 512)
    # camera-GPS offset = [1.08, 0.26] m / ~0.196 m/px ~ (5.5, 1.3) px
    a = np.asarray(out).astype(np.float32)
    b = np.asarray(img).astype(np.float32)
    assert not np.allclose(a, b)  # offset applied
    from highlyaccurate_tpu.utils import geo
    mpp = geo.get_meter_per_pixel(scale=1)
    dx = geo.CAMERA_GPS_SHIFT_LEFT[0] / mpp
    assert abs(dx - 5.5) < 0.1


def test_synthesize_sat_rotation_only():
    from PIL import Image
    img = Image.fromarray(np.zeros((512, 512, 3), np.uint8))
    out = synthesize_sat(img, np.pi / 2, 0.5, -0.3, 0.7, 20.0, 20.0, 10.0, 256)
    assert out.size == (256, 256)


def test_parse_calib(tmp_path):
    calib = tmp_path / "calib_cam_to_cam.txt"
    calib.write_text(
        "P_rect_02: 700.0 0.0 600.0 0.0 0.0 710.0 180.0 0.0 0.0 0.0 1.0 0.0\n")
    k = parse_calib_k(str(calib), grd_h=256, grd_w=1024)
    np.testing.assert_allclose(k[0, 0], 700.0 * 1024 / 1242, rtol=1e-6)
    np.testing.assert_allclose(k[1, 2], 180.0 * 256 / 375, rtol=1e-6)
    assert k[2, 2] == 1.0


def test_synthetic_dataset_and_loader():
    ds = SyntheticKitti(n=10, grd_h=32, grd_w=128, sat_size=64)
    loader = Loader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["sat"].shape == (4, 64, 64, 3)
    assert b["grd"].shape == (4, 32, 128, 3)
    assert b["gt_pose"].shape == (4, 3)
    assert b["camera_k"].shape == (4, 3, 3)
    assert len(b["names"]) == 4
    # deterministic per index
    s0a, s0b = ds[0], ds[0]
    np.testing.assert_array_equal(s0a.sat, s0b.sat)


def test_loader_drop_last_and_order():
    ds = SyntheticKitti(n=10, grd_h=8, grd_w=16, sat_size=16)
    loader = Loader(ds, batch_size=4, shuffle=False, drop_last=True)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["names"][0] == "synthetic/0000000000.png"


def test_vendored_split_files_parse():
    """The vendored reference split lists load and parse (fixed test
    perturbations; reference dataLoader/*.txt)."""
    from highlyaccurate_tpu.data.kitti import KittiDataset

    for split, want in (("train", 19655), ("test1", 3773), ("test2", 7542)):
        ds = KittiDataset("/nonexistent-root", split, use_native_warp=False)
        assert len(ds) == want, split
    ds = KittiDataset("/nonexistent-root", "test1", use_native_warp=False)
    name, sx, sy, th = ds.lines[0].split(" ")
    assert name.endswith(".png")
    float(sx), float(sy), float(th)
