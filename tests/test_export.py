"""AOT deployment artifacts: Localizer.export / ExportedLocalizer.

The exported program (jax.export StableHLO with baked-in weights) must
reproduce the live Localizer bit-for-bit on the same platform, survive a
ragged batch, and refuse foreign/mismatched artifacts."""

import numpy as np
import pytest

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.inference import ExportedLocalizer, Localizer

TINY = dict(grd_h=32, grd_w=128, sat_size=64, N_iters=1, level=-1)


def _imgs(rng, n):
    return (rng.rand(n, 64, 64, 3).astype(np.float32),
            rng.rand(n, 32, 128, 3).astype(np.float32))


def test_export_roundtrip_matches_live(tmp_path):
    cfg = Config(**TINY)
    loc = Localizer(cfg, batch_size=2, seed=5, random_init=True)
    path = str(tmp_path / "kitti.halexp")
    loc.export(path)

    rng = np.random.RandomState(0)
    sat, grd = _imgs(rng, 3)  # ragged: 2 + 1(padded)
    want = loc.predict(sat, grd)

    srv = ExportedLocalizer(path, seed=5)
    got = srv.predict(sat, grd)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-7)


def test_export_ford_roundtrip(tmp_path):
    from highlyaccurate_tpu.geometry.ford import qvec2rotmat

    R = np.asarray(qvec2rotmat([0.5, -0.5, 0.5, -0.5]), np.float32)
    T = np.array([1.0, 0.5, -1.4], np.float32)
    cfg = Config(**TINY)
    loc = Localizer(cfg, batch_size=2, seed=1, random_init=True,
                    ford_extrinsics=(R, T), ford_side_m=64 * 0.22)
    path = str(tmp_path / "ford.halexp")
    loc.export(path)

    rng = np.random.RandomState(3)
    sat, grd = _imgs(rng, 2)
    want = loc.predict(sat, grd)

    srv = ExportedLocalizer(path, seed=1)
    got = srv.predict(sat, grd)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], rtol=1e-6, atol=1e-7)
    # per-image extrinsics override still works through the artifact
    got2 = srv.predict(sat, grd, R_FL=np.broadcast_to(R, (2, 3, 3)).copy(),
                       T_FL=np.broadcast_to(T, (2, 3)).copy())
    assert np.isfinite(got2["lateral_m"]).all()


def test_export_rejects_mesh_and_bad_artifacts(tmp_path):
    import zipfile

    cfg = Config(**TINY)
    loc = Localizer(cfg, batch_size=2, random_init=True)

    import jax
    from highlyaccurate_tpu.train.step import make_mesh_for_batch
    mesh = make_mesh_for_batch(8, jax.devices())
    loc_mesh = Localizer(cfg, params=loc.params, batch_size=8, mesh=mesh)
    with pytest.raises(ValueError, match="single-device"):
        loc_mesh.export(str(tmp_path / "nope.halexp"))

    bad = tmp_path / "bad.halexp"
    with zipfile.ZipFile(bad, "w") as z:
        z.writestr("meta.json", '{"format": "something-else"}')
        z.writestr("program.jaxexport", b"")
    with pytest.raises(ValueError, match="not a Localizer export"):
        ExportedLocalizer(str(bad))

    foreign = tmp_path / "foreign.zip"  # any zip, no meta.json at all
    with zipfile.ZipFile(foreign, "w") as z:
        z.writestr("something.txt", "hello")
    with pytest.raises(ValueError, match="not a Localizer export"):
        ExportedLocalizer(str(foreign))


def test_export_multi_batch_sizes(tmp_path):
    """batch_sizes=[1, 2]: a 3-image request runs one full chunk at 2 and
    the tail at the batch-1 program (no padding waste); results must match
    the single-size artifact exactly."""
    cfg = Config(**TINY)
    loc = Localizer(cfg, batch_size=2, seed=5, random_init=True)
    single = str(tmp_path / "single.halexp")
    multi = str(tmp_path / "multi.halexp")
    loc.export(single)
    loc.export(multi, batch_sizes=[1, 2])

    rng = np.random.RandomState(0)
    sat, grd = _imgs(rng, 3)
    a = ExportedLocalizer(single, seed=5)
    b = ExportedLocalizer(multi, seed=5)
    assert b.batch_sizes == [1, 2]
    got_a = a.predict(sat, grd)
    got_b = b.predict(sat, grd)
    for k in got_a:
        np.testing.assert_allclose(got_b[k], got_a[k], rtol=1e-6, atol=1e-7)


def test_export_g2sp_roundtrip(tmp_path):
    from highlyaccurate_tpu.geometry.kitti import DEFAULT_CAMERA_K

    cfg = Config(direction="G2SP", **TINY)
    k = np.asarray(DEFAULT_CAMERA_K, np.float32).copy()
    k[0, :] *= 128 / 1024.0
    k[1, :] *= 32 / 256.0
    loc = Localizer(cfg, batch_size=2, seed=2, random_init=True, camera_k=k)
    path = str(tmp_path / "g2sp.halexp")
    loc.export(path)

    rng = np.random.RandomState(7)
    sat, grd = _imgs(rng, 3)
    want = loc.predict(sat, grd)

    srv = ExportedLocalizer(path, seed=2)
    got = srv.predict(sat, grd)  # default K travels in the artifact
    for key in want:
        np.testing.assert_allclose(got[key], want[key], rtol=1e-6,
                                   atol=1e-7)
    got2 = srv.predict(sat, grd, camera_k=np.broadcast_to(k, (3, 3, 3)))
    for key in want:
        np.testing.assert_allclose(got2[key], want[key], rtol=1e-6,
                                   atol=1e-7)
