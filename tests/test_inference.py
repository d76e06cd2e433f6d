"""Localizer serving API: ragged batches, dtype handling, metric outputs."""

import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.inference import Localizer

TINY = dict(grd_h=32, grd_w=128, sat_size=64, N_iters=1, level=-1)


def test_predict_ragged_uint8():
    cfg = Config(**TINY)
    loc = Localizer(cfg, batch_size=2, random_init=True)
    rng = np.random.RandomState(0)
    n = 5  # ragged: 2 + 2 + 1(padded)
    sat = (rng.rand(n, 64, 64, 3) * 255).astype(np.uint8)
    grd = (rng.rand(n, 32, 128, 3) * 255).astype(np.uint8)
    out = loc.predict(sat, grd)
    for k in ("lateral_m", "longitudinal_m", "heading_deg"):
        assert out[k].shape == (n,)
        assert np.isfinite(out[k]).all()
    # denormalization ranges: |lat| <= reinit_range * shift_range
    assert np.abs(out["lateral_m"]).max() <= 2.5 * cfg.shift_range_lat + 1e-3


def test_padded_tail_matches_unpadded():
    """The padded tail batch must produce the same result for real rows."""
    cfg = Config(**TINY)
    loc = Localizer(cfg, batch_size=4, seed=7, random_init=True)
    rng = np.random.RandomState(1)
    sat = rng.rand(4, 64, 64, 3).astype(np.float32)
    grd = rng.rand(4, 32, 128, 3).astype(np.float32)
    full = loc.predict(sat, grd)

    loc2 = Localizer(cfg, params=loc.params, batch_size=4, seed=7)
    part = loc2.predict(sat[:3], grd[:3])
    for k in full:
        np.testing.assert_allclose(part[k], full[k][:3], rtol=1e-5, atol=1e-6)


def test_mesh_sharded_predict_matches_single():
    """Localizer over the virtual 8-device mesh == single-device results."""
    import jax
    from highlyaccurate_tpu.train.step import make_mesh_for_batch

    cfg = Config(**TINY)
    loc1 = Localizer(cfg, batch_size=8, seed=3, random_init=True)
    rng = np.random.RandomState(2)
    sat = rng.rand(8, 64, 64, 3).astype(np.float32)
    grd = rng.rand(8, 32, 128, 3).astype(np.float32)
    want = loc1.predict(sat, grd)

    mesh = make_mesh_for_batch(8, jax.devices())
    assert mesh.devices.size > 1  # conftest provides the 8-CPU mesh
    loc8 = Localizer(cfg, params=loc1.params, batch_size=8, mesh=mesh, seed=3)
    got = loc8.predict(sat, grd)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-4, atol=1e-5)


def test_requires_weight_source():
    import pytest
    with pytest.raises(ValueError, match="no weight source"):
        Localizer(Config(**TINY))


def test_empty_batch():
    loc = Localizer(Config(**TINY), batch_size=2, random_init=True)
    out = loc.predict(np.zeros((0, 64, 64, 3), np.float32),
                      np.zeros((0, 32, 128, 3), np.float32))
    assert out["lateral_m"].shape == (0,)


def _ford_extrinsics():
    # near-identity rig: keeps the tiny 64-px (14 m) patch's ground rays
    # on-map so the solver actually moves the pose (a rotated rig projects
    # every ray off this small patch -> vacuous zero outputs)
    from highlyaccurate_tpu.geometry import ford as fgeom
    R = np.asarray(fgeom.qvec2rotmat([0.997, 0.01, 0.05, 0.02]), np.float32)
    T = np.array([1.0, 0.5, -1.4], np.float32)
    return R, T


def test_ford_predict_ragged():
    """Ford-chain serving: constructor extrinsics, ragged tail, metric
    outputs (reference models_ford.py:652-1026 test forward)."""
    cfg = Config(**TINY)
    R, T = _ford_extrinsics()
    loc = Localizer(cfg, batch_size=2, random_init=True,
                    ford_extrinsics=(R, T), ford_side_m=64 * 0.22)
    rng = np.random.RandomState(4)
    n = 3
    sat = rng.rand(n, 64, 64, 3).astype(np.float32)
    grd = rng.rand(n, 32, 128, 3).astype(np.float32)
    out = loc.predict(sat, grd)
    for k in ("lateral_m", "longitudinal_m", "heading_deg"):
        assert out[k].shape == (n,)
        assert np.isfinite(out[k]).all()
    assert max(np.abs(out[k]).max() for k in out) > 1e-4, \
        "degenerate setup: pose never moved"

    # per-image extrinsics override pads with the batch and matches the
    # constructor values when identical (fresh Localizer: same RNG stream)
    loc2 = Localizer(cfg, params=loc.params, batch_size=2,
                     ford_extrinsics=(R, T), ford_side_m=64 * 0.22)
    out2 = loc2.predict(sat, grd, R_FL=np.broadcast_to(R, (n, 3, 3)),
                        T_FL=np.broadcast_to(T, (n, 3)))
    for k in out:
        np.testing.assert_allclose(out2[k], out[k], rtol=1e-6)


def test_ford_requires_both_calibration_args():
    import pytest
    R, T = _ford_extrinsics()
    with pytest.raises(ValueError, match="BOTH"):
        Localizer(Config(**TINY), random_init=True, ford_extrinsics=(R, T))
    loc = Localizer(Config(**TINY), batch_size=2, random_init=True)
    with pytest.raises(ValueError, match="Ford"):
        loc.predict(np.zeros((1, 64, 64, 3), np.float32),
                    np.zeros((1, 32, 128, 3), np.float32),
                    R_FL=np.zeros((1, 3, 3), np.float32))


def test_save_path_restore_via_eval_shape(tmp_path):
    """Localizer(save_path=...) builds the orbax restore template with
    jax.eval_shape — no solver compile/execution — and restores exact
    params (ADVICE r2: the old path ran a full train-mode model.init)."""
    import numpy as np
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.inference import Localizer
    from highlyaccurate_tpu.train.checkpoint import save_params

    cfg = Config(**TINY)
    loc = Localizer(cfg, batch_size=2, seed=5, random_init=True)
    save_params(str(tmp_path), "Model_best", loc.params)

    loc2 = Localizer(cfg, save_path=str(tmp_path), batch_size=2, seed=5)
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(loc.params),
                    jax.tree_util.tree_leaves(loc2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    rng = np.random.RandomState(3)
    sat = rng.rand(2, cfg.sat_size, cfg.sat_size, 3).astype(np.float32)
    grd = rng.rand(2, cfg.grd_h, cfg.grd_w, 3).astype(np.float32)
    o1 = loc.predict(sat, grd)
    o2 = loc2.predict(sat, grd)
    np.testing.assert_allclose(o1["lateral_m"], o2["lateral_m"])


def test_g2sp_predict():
    """G2SP serving: camera intrinsics at construction or per call; the
    [3,3] one-rig form broadcasts over the request."""
    import pytest
    from highlyaccurate_tpu.geometry.kitti import DEFAULT_CAMERA_K

    cfg = Config(direction="G2SP", **TINY)
    k = np.asarray(DEFAULT_CAMERA_K, np.float32).copy()
    k[0, :] *= 128 / 1024.0
    k[1, :] *= 32 / 256.0
    loc = Localizer(cfg, batch_size=2, seed=4, random_init=True, camera_k=k)
    rng = np.random.RandomState(5)
    sat = rng.rand(3, 64, 64, 3).astype(np.float32)
    grd = rng.rand(3, 32, 128, 3).astype(np.float32)
    out = loc.predict(sat, grd)  # constructor K
    assert out["lateral_m"].shape == (3,)
    assert np.isfinite(out["lateral_m"]).all()

    loc2 = Localizer(cfg, params=loc.params, batch_size=2, seed=4)
    out2 = loc2.predict(sat, grd, camera_k=k)  # per-call one-rig K
    for key in out:
        np.testing.assert_allclose(out2[key], out[key], rtol=1e-5,
                                   atol=1e-6)
    with pytest.raises(ValueError, match="camera intrinsics"):
        loc2.predict(sat, grd)  # no K anywhere
    # S2GP localizers reject G2SP inputs
    s2gp = Localizer(Config(**TINY), batch_size=2, random_init=True)
    with pytest.raises(ValueError, match="G2SP input"):
        s2gp.predict(sat, grd, camera_k=k)
