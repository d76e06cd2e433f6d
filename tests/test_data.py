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


FORD_FL_BODY_YAML = """\
header:
  seq: 0
  stamp:
    secs: 0
    nsecs: 0
  frame_id: "body"
child_frame_id: "cameraFrontLeft"
transform:
  translation:
    x: 1.470563
    y: 0.405664
    z: 1.243369
  rotation:
    x: -0.486630591
    y: 0.507791308
    z: -0.509084328
    w: 0.496157034
"""

FORD_FL_INTRINSICS_YAML = """\
header:
  seq: 0
  stamp:
    secs: 0
    nsecs: 0
  frame_id: "cameraFrontLeft"
height: 860
width: 1656
distortion_model: "plumb_bob"
D: [-0.04849669, 0.01126224, 0.00086211, -0.00009653, 0.0]
K: [945.391406, 0.0, 855.502825, 0.0, 945.668274, 566.372868, 0.0, 0.0, 1.0]
R: [1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0]
P: [945.391406, 0.0, 855.502825, 0.0, 0.0, 945.668274, 566.372868, 0.0, 0.0, 0.0, 1.0, 0.0]
binning_x: 0
binning_y: 0
roi:
  x_offset: 0
  y_offset: 0
  height: 0
  width: 0
  do_rectify: False
"""


def test_ford_load_calibration_real_schema(tmp_path):
    """`load_calibration` against fixture YAMLs in the actual Ford-AV
    calibration schema (ROS TransformStamped / CameraInfo dumps — the
    field names and nesting the reference parses at
    Ford_dataset.py:118-145).  Round-2 VERDICT missing #3."""
    import os
    from highlyaccurate_tpu.data.ford import POSE_FILE_DIR, load_calibration
    from highlyaccurate_tpu.geometry.ford import qvec2rotmat

    cal_dir = tmp_path / POSE_FILE_DIR
    os.makedirs(cal_dir, exist_ok=True)
    (cal_dir / "cameraFrontLeft_body.yaml").write_text(FORD_FL_BODY_YAML)
    (cal_dir / "cameraFrontLeftIntrinsics.yaml").write_text(
        FORD_FL_INTRINSICS_YAML)

    R_FL, T_FL, K_FL = load_calibration(str(tmp_path))

    np.testing.assert_allclose(
        T_FL, [1.470563, 0.405664, 1.243369], rtol=1e-6)
    # reference order: qvec2rotmat([qw, qx, qy, qz]) (Ford_dataset.py:121-129)
    expect_R = qvec2rotmat(
        [0.496157034, -0.486630591, 0.507791308,
         -0.509084328]).astype(np.float32)
    np.testing.assert_allclose(R_FL, expect_R, atol=1e-6)
    assert np.allclose(R_FL @ R_FL.T, np.eye(3), atol=1e-5)
    # K rescaled from the 1656x860 sensor to the 1024x256 network input
    # (Ford_dataset.py:138-146)
    np.testing.assert_allclose(
        K_FL[0], np.array([945.391406, 0.0, 855.502825]) / 1656 * 1024,
        rtol=1e-6)
    np.testing.assert_allclose(
        K_FL[1], np.array([0.0, 945.668274, 566.372868]) / 860 * 256,
        rtol=1e-6)
    np.testing.assert_allclose(K_FL[2], [0.0, 0.0, 1.0])


def test_kitti_real_file_tree(tmp_path):
    """End-to-end __getitem__ over the reference's on-disk layout
    (satmap/ + raw_data/<day>/<drive>/{oxts/data,image_02/data} + calib),
    so the real-data path is proven before real KITTI ever shows up
    (reference KITTI_dataset.py:75-130 path scheme; [:10]/[:38]/[38:]
    file-name slicing).  Covers train (random GT) and test1 (fixed
    perturbations parsed from the split line) plus the Loader collate."""
    import numpy as np
    from PIL import Image

    from highlyaccurate_tpu.data.kitti import KittiDataset, Loader

    name = "2011_09_26/2011_09_26_drive_0002_sync/0000000048.png"
    day, drive = name[:10], name[:38]
    rng = np.random.RandomState(0)

    sat_dir = tmp_path / "satmap" / drive
    sat_dir.mkdir(parents=True)
    Image.fromarray(rng.randint(0, 255, (160, 160, 3), np.uint8)) \
        .save(tmp_path / "satmap" / name)

    raw = tmp_path / "raw_data"
    (raw / day).mkdir(parents=True)
    (raw / day / "calib_cam_to_cam.txt").write_text(
        "P_rect_02: 7.215377e+02 0.0 6.095593e+02 4.485728e+01 "
        "0.0 7.215377e+02 1.728540e+02 2.163791e-01 "
        "0.0 0.0 1.0 2.745884e-03\n")
    oxts = raw / drive / "oxts" / "data"
    oxts.mkdir(parents=True)
    # oxts line: lat lon alt roll pitch yaw ...
    (oxts / "0000000048.txt").write_text(
        "49.01 8.43 112.9 0.01 0.02 0.30 0 0 0\n")
    img02 = raw / drive / "image_02" / "data"
    img02.mkdir(parents=True)
    Image.fromarray(rng.randint(0, 255, (128, 512, 3), np.uint8)) \
        .save(img02 / "0000000048.png")

    # train split: bare file name, random GT; small ranges keep the crop
    # inside the 160px fixture map
    ds = KittiDataset(str(tmp_path), "train", shift_range_lat=2.0,
                      shift_range_lon=2.0, rotation_range=10.0,
                      grd_h=32, grd_w=128, sat_size=64, file_list=[name],
                      rng=np.random.RandomState(1), use_native_warp=False)
    s = ds[0]
    assert s.sat.shape == (64, 64, 3) and s.grd.shape == (32, 128, 3)
    assert s.sat.dtype == np.float32 and 0.0 <= s.sat.max() <= 1.0
    # calib K scaled to the network input size (reference :89-96)
    np.testing.assert_allclose(s.camera_k[0, 0], 721.5377 * 128 / 1242.0,
                               rtol=1e-5)
    assert s.name == name

    # native fused warp (if the C++ library built) must agree on shapes
    from highlyaccurate_tpu import native
    if native.available():
        ds_n = KittiDataset(str(tmp_path), "train", shift_range_lat=2.0,
                            shift_range_lon=2.0, rotation_range=10.0,
                            grd_h=32, grd_w=128, sat_size=64,
                            file_list=[name],
                            rng=np.random.RandomState(1),
                            use_native_warp=True)
        assert ds_n[0].sat.shape == (64, 64, 3)

    # test split: fixed perturbations from the line (sign convention:
    # stored sx negates into gt_shift_x, Sample carries -gt_shift_x = sx)
    ds_t = KittiDataset(str(tmp_path), "test1", shift_range_lat=2.0,
                        shift_range_lon=2.0, rotation_range=10.0,
                        grd_h=32, grd_w=128, sat_size=64,
                        file_list=[f"{name} 0.25 -0.5 0.125"],
                        use_native_warp=False)
    st = ds_t[0]
    np.testing.assert_allclose(
        [st.gt_shift_u, st.gt_shift_v, st.gt_heading], [0.25, -0.5, 0.125])

    batch = next(iter(Loader(ds_t, batch_size=1, shuffle=False)))
    assert batch["sat"].shape == (1, 64, 64, 3)
    assert batch["grd"].shape == (1, 32, 128, 3)


def test_ford_real_file_tree(tmp_path):
    """End-to-end FordDataset over the reference's on-disk layout
    (per-log data file + <log>-FL ground images + SatelliteMaps_18 tiles
    named <s_lat>_<s_lon>.png + Calibration-V2 YAMLs — reference
    Ford_dataset.py:100-110,233-243).  Train (random GT) and test (fixed
    perturbation columns) paths plus collate_ford."""
    import os

    import numpy as np
    from PIL import Image

    from highlyaccurate_tpu.data.ford import (DATA_FILE, DATA_FILE_TEST,
                                              POSE_FILE_DIR, SATMAP_DIR,
                                              FordDataset, collate_ford)

    log = "2017-08-04/V2/Log1"
    root = tmp_path
    cal_dir = root / POSE_FILE_DIR
    os.makedirs(cal_dir, exist_ok=True)
    (cal_dir / "cameraFrontLeft_body.yaml").write_text(FORD_FL_BODY_YAML)
    (cal_dir / "cameraFrontLeftIntrinsics.yaml").write_text(
        FORD_FL_INTRINSICS_YAML)

    rng = np.random.RandomState(0)
    fl_dir = root / log / (log.replace("/", "-") + "-FL")
    fl_dir.mkdir(parents=True)
    Image.fromarray(rng.randint(0, 255, (86, 166, 3), np.uint8)) \
        .save(fl_dir / "1501822908477787266.png")

    s_lat, s_lon = "42.294319", "-83.223880"
    sat_dir = root / log / SATMAP_DIR
    sat_dir.mkdir(parents=True)
    Image.fromarray(rng.randint(0, 255, (600, 600, 3), np.uint8)) \
        .save(sat_dir / f"{s_lat}_{s_lon}.png")

    # line: grd_name q0 q1 q2 q3 g_lat g_lon s_lat s_lon [fixed u v theta]
    base = (f"1501822908477787266.txt 0.9997 0.001 0.002 0.024 "
            f"42.294335 -83.223862 {s_lat} {s_lon}")
    (root / log / DATA_FILE).write_text(base + "\n")
    (root / log / DATA_FILE_TEST).write_text(base + " 0.25 -0.5 0.125\n")

    ds = FordDataset(str(root), "train", logs=[log], logs_img_inds=[[0]],
                     shift_range_lat=2.0, shift_range_lon=2.0,
                     rotation_range=10.0, whole=True, grd_h=32, grd_w=128,
                     rng=np.random.RandomState(1), use_native_warp=False)
    s = ds[0]
    assert s.sat.shape == (512, 512, 3) and s.grd.shape == (32, 128, 3)
    assert s.sat.dtype == np.float32 and np.isfinite(s.sat).all()
    assert s.R_FL.shape == (3, 3) and s.T_FL.shape == (3,)

    ds_t = FordDataset(str(root), "test", logs=[log], logs_img_inds=[[0]],
                       shift_range_lat=2.0, shift_range_lon=2.0,
                       rotation_range=10.0, grd_h=32, grd_w=128,
                       use_native_warp=False)
    st = ds_t[0]
    np.testing.assert_allclose(
        [st.gt_shift_u, st.gt_shift_v, st.gt_heading], [0.25, -0.5, 0.125])

    batch = collate_ford([st])
    assert batch["sat"].shape == (1, 512, 512, 3)
    assert batch["R_FL"].shape == (1, 3, 3)

    # a RELATIVE root must work too (the reference's doubled join only
    # collapses for absolute roots; FordDataset absolutizes)
    cwd = os.getcwd()
    os.chdir(tmp_path.parent)
    try:
        ds_rel = FordDataset(os.path.relpath(str(root)), "test", logs=[log],
                             logs_img_inds=[[0]], grd_h=32, grd_w=128,
                             use_native_warp=False)
        assert ds_rel[0].grd.shape == (32, 128, 3)
    finally:
        os.chdir(cwd)
