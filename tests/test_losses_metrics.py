"""Loss library and eval-metric protocol tests."""

import os

import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.eval.metrics import EvalResults, denormalize
from highlyaccurate_tpu.losses.losses import (loss_func, normalize_feature,
                                              soft_margin_triplet)


def _traj(B=4, I=3, L=2, seed=0):
    rng = np.random.RandomState(seed)
    lats = jnp.asarray(rng.randn(B, I, L).astype(np.float32))
    lons = jnp.asarray(rng.randn(B, I, L).astype(np.float32))
    ths = jnp.asarray(rng.randn(B, I, L).astype(np.float32))
    gt = [jnp.asarray(rng.randn(B).astype(np.float32)) for _ in range(3)]
    return lats, lons, ths, gt


def test_loss0_matches_manual():
    lats, lons, ths, (gl, go, gt) = _traj()
    out = loss_func(0, lats, lons, ths, gl, go, gt, 100.0, 100.0, 100.0)
    lat_d = np.mean(np.abs(np.asarray(lats) - np.asarray(gl)[:, None, None]), 0)
    lon_d = np.mean(np.abs(np.asarray(lons) - np.asarray(go)[:, None, None]), 0)
    th_d = np.mean(np.abs(np.asarray(ths) - np.asarray(gt)[:, None, None]), 0)
    want = np.mean(100 * lat_d + 100 * lon_d + 100 * th_d)
    np.testing.assert_allclose(float(out.loss), want, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out.shift_lat_last), lat_d[-1], rtol=1e-5)


def test_loss0_zero_at_gt():
    B, I, L = 2, 3, 2
    gt = jnp.asarray(np.random.RandomState(0).randn(B).astype(np.float32))
    traj = jnp.broadcast_to(gt[:, None, None], (B, I, L))
    out = loss_func(0, traj, traj, traj, gt, gt, gt)
    np.testing.assert_allclose(float(out.loss), 0.0, atol=1e-6)


def test_loss_methods_1_2_3_finite():
    B, I, L, H, W, C = 2, 3, 2, 4, 6, 3
    rng = np.random.RandomState(1)
    lats, lons, ths, (gl, go, gth) = _traj(B, I, L, seed=1)
    ref = [jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
           for _ in range(L)]
    pred = [jnp.asarray(rng.randn(B, I, H, W, C).astype(np.float32))
            for _ in range(L)]
    gtf = [jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
           for _ in range(L)]
    puv = [jnp.asarray(rng.rand(B, I, H, W, 2).astype(np.float32))
           for _ in range(L)]
    guv = [jnp.asarray(rng.rand(B, H, W, 2).astype(np.float32))
           for _ in range(L)]
    for method in (1, 2, 3):
        out = loss_func(method, lats, lons, ths, gl, go, gth,
                        ref_feat_list=ref, pred_feat_list=pred,
                        gt_feat_list=gtf, pred_uv_list=puv, gt_uv_list=guv)
        assert np.isfinite(float(out.loss)), method


def test_normalize_feature():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 3, 4, 5, 6).astype(np.float32))
    y = np.asarray(normalize_feature(x))
    norms = np.linalg.norm(y.reshape(2, 3, -1), axis=-1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_soft_margin_triplet_prefers_gt_min():
    corr = jnp.asarray(np.ones((1, 5, 5), np.float32))
    corr = corr.at[0, 2, 3].set(0.0)  # gt cell is the minimum
    good = float(soft_margin_triplet(corr, jnp.array([3]), jnp.array([2])))
    bad = float(soft_margin_triplet(corr, jnp.array([0]), jnp.array([0])))
    assert good < bad


def test_metrics_protocol():
    rng = np.random.RandomState(0)
    N = 100
    gt_shifts = rng.uniform(-20, 20, (N, 2))
    gt_headings = rng.uniform(-10, 10, (N, 1))
    # predictions: first 50 exact, last 50 off by 10 m / 20 deg
    pred_shifts = gt_shifts.copy()
    pred_headings = gt_headings.copy()
    pred_shifts[50:] += 10.0
    pred_headings[50:] += 20.0
    res = EvalResults(pred_shifts, pred_headings, gt_shifts, gt_headings)
    m = res.compute()
    np.testing.assert_allclose(m["distance_recall_1m"], 50.0)
    np.testing.assert_allclose(m["angle_recall_1deg"], 50.0)
    np.testing.assert_allclose(m["lateral_recall_5m"], 50.0)
    np.testing.assert_allclose(m["rank_result"], 50.0)
    assert m["pred_dis_mean"] > m["init_dis_mean"] * 0  # defined


def test_metrics_angle_wrap():
    """Angle differences wrap to [0, 180] (reference train_kitti.py:86-88)."""
    res = EvalResults(np.zeros((1, 2)), np.array([[350.0]]),
                      np.zeros((1, 2)), np.array([[0.0]]))
    m = res.compute()
    np.testing.assert_allclose(m["pred_angle_mean"], 10.0)


def test_metrics_writer(tmp_path):
    res = EvalResults(np.zeros((4, 2)), np.zeros((4, 1)),
                      np.ones((4, 2)), np.ones((4, 1)), time_per_image=0.01)
    res.write(str(tmp_path), "Test1", epoch=3)
    txt = (tmp_path / "Test1_results.txt").read_text()
    assert "EPOCH: 3" in txt and "lateral" in txt and "angle within" in txt
    assert (tmp_path / "Test1_results.mat").exists()


def test_denormalize():
    lat = np.array([0.5, -0.5])
    lon = np.array([1.0, 0.0])
    th = np.array([0.1, -1.0])
    shifts, headings = denormalize(lat, lon, th, 20.0, 10.0, 10.0)
    np.testing.assert_allclose(shifts, [[10.0, 10.0], [-10.0, 0.0]])
    np.testing.assert_allclose(headings, [[1.0], [-10.0]])


def test_acceptance_diff_script(tmp_path):
    """scripts/acceptance_diff.py (docs/ACCEPTANCE.md gate): parses the
    LAST epoch block of reference-format results files, passes on
    self-diff, fails when the criterion metric drifts past the tolerance."""
    import sys
    sys.path.insert(0, "scripts")
    try:
        from acceptance_diff import main, parse_last_block
    finally:
        sys.path.pop(0)

    def block(lat1, epoch):
        return "\n".join([
            "====================================",
            f"       EPOCH: {epoch}",
            "Time per image (second): 0.01",
            "distance within 1 meters (pred, init): 10.0 1.0",
            "------------------------",
            f"lateral      within 1 meters (pred, init): {lat1} 5.0",
            "longitudinal within 1 meters (pred, init): 20.0 5.0",
            "------------------------",
            "angle within 1 degrees (pred, init): 50.0 10.0",
            "------------------------",
            "lat within 1 & angle within 1 (pred, init): 9.0 0.5",
            "====================================", ""])

    ours = tmp_path / "ours.txt"
    ref = tmp_path / "ref.txt"
    # multi-epoch file: only the LAST block must be read (epoch 0 is junk)
    ours.write_text(block(1.0, 0) + block(80.4, 1))
    ref.write_text(block(80.0, 3))

    m = parse_last_block(str(ours))
    assert m["lateral_1m"] == 80.4 and m["angle_1deg"] == 50.0
    assert m["lat1m_joint"] == 9.0 and m["time_per_image"] == 0.01

    assert main([str(ours), str(ref)]) == 0            # +0.4 pt: PASS
    ours.write_text(block(80.4, 0) + block(79.0, 1))
    assert main([str(ours), str(ref)]) == 1            # -1.0 pt: FAIL
    assert main([str(ours), str(ref), "--tol", "1.5"]) == 0


def test_recall_table_matches_reference_metric_block(tmp_path):
    """Executes the reference's OWN metric code (train_kitti.py:77-162 —
    batch concat, denormalize, angle wrap, recall thresholds, results-file
    writer) on a recorded pose set and asserts our chain produces an
    identical recall table and a byte-identical Test1_results.txt body
    (VERDICT r4 #3: the last unverified link before the acceptance run).

    The reference block is EXECUTED from the mounted tree, not copied:
    the exact source lines are extracted at test time and exec'd with the
    pose lists a real eval loop would have accumulated
    (train_kitti.py:53-69: shifts=stack([lat,lon]), gt=cat([v,u]))."""
    import types

    import pytest
    torch = pytest.importorskip("torch")
    ref_path = "/root/reference/train_kitti.py"
    if not os.path.exists(ref_path):
        pytest.skip("reference tree not mounted")
    src = open(ref_path).read().splitlines()
    start = next(i for i, l in enumerate(src)
                 if l.strip().startswith("pred_shifts = np.concatenate"))
    end = next(i for i, l in enumerate(src)
               if l.strip().startswith("result = np.sum"))
    import textwrap
    block = textwrap.dedent("\n".join(src[start:end + 1]))

    # pose set accumulated exactly as the reference eval loop does,
    # including a ragged final batch
    rng = np.random.RandomState(11)
    args = types.SimpleNamespace(shift_range_lat=20.0, shift_range_lon=20.0,
                                 rotation_range=10.0)
    pred_shifts, pred_headings, gt_shifts, gt_headings = [], [], [], []
    flat = {"lat": [], "lon": [], "th": [], "gu": [], "gv": [], "gh": []}
    for bs in [4, 4, 4, 3]:
        lat, lon, th = (torch.tensor(rng.uniform(-1, 1, (bs,)))
                        for _ in range(3))
        gu, gv, gh = (torch.tensor(rng.uniform(-1, 1, (bs, 1)))
                      for _ in range(3))
        # reference accumulation (train_kitti.py:53-69)
        shifts = torch.stack([lat, lon], dim=-1)
        headings = th.unsqueeze(dim=-1)
        gt_shift = torch.cat([gv, gu], dim=-1)
        pred_shifts.append(shifts.data.cpu().numpy())
        pred_headings.append(headings.data.cpu().numpy())
        gt_shifts.append(gt_shift.data.cpu().numpy())
        gt_headings.append(gh.data.cpu().numpy())
        for k, v in zip(("lat", "lon", "th"), (lat, lon, th)):
            flat[k].append(v.numpy())
        for k, v in zip(("gu", "gv", "gh"), (gu, gv, gh)):
            flat[k].append(v.numpy()[:, 0])
    flat = {k: np.concatenate(v) for k, v in flat.items()}

    import scipy.io as scio
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    ns = dict(np=np, os=os, scio=scio, args=args, epoch=3, duration=0.125,
              save_path=str(ref_dir), pred_shifts=pred_shifts,
              pred_headings=pred_headings, gt_shifts=gt_shifts,
              gt_headings=gt_headings)
    exec(compile(block, ref_path, "exec"), ns)

    # our chain: denormalize -> EvalResults -> writer (cli/train_kitti.py
    # evaluate(): gt columns (v, u) feed (lat, lon), matching the
    # reference's cat([gt_shift_v, gt_shift_u]))
    ps, ph = denormalize(flat["lat"], flat["lon"], flat["th"],
                         args.shift_range_lat, args.shift_range_lon,
                         args.rotation_range)
    gs, gh_ = denormalize(flat["gv"], flat["gu"], flat["gh"],
                          args.shift_range_lat, args.shift_range_lon,
                          args.rotation_range)
    res = EvalResults(pred_shifts=ps, pred_headings=ph, gt_shifts=gs,
                      gt_headings=gh_, time_per_image=0.125)
    m = res.compute()
    ours_dir = tmp_path / "ours"
    ours_dir.mkdir()
    res.write(str(ours_dir), "Test1", epoch=3)

    # the denormalized arrays themselves must match bit-for-bit
    np.testing.assert_array_equal(ps, ns["pred_shifts"])
    np.testing.assert_array_equal(gs, ns["gt_shifts"])
    np.testing.assert_array_equal(ph, ns["pred_headings"])
    np.testing.assert_array_equal(gh_, ns["gt_headings"])

    # the reference's results file and ours must be BYTE-identical
    ref_txt = (ref_dir / "Test1_results.txt").read_bytes()
    our_txt = (ours_dir / "Test1_results.txt").read_bytes()
    assert ref_txt == our_txt

    # .mat payloads identical
    ref_mat = scio.loadmat(str(ref_dir / "Test1_results.mat"))
    our_mat = scio.loadmat(str(ours_dir / "Test1_results.mat"))
    for k in ("gt_shifts", "gt_headings", "pred_shifts", "pred_headings"):
        np.testing.assert_array_equal(ref_mat[k], our_mat[k])

    # Best-model criterion: the reference's `result` broadcasts [N] (dist)
    # against [N, 1] (angle) -> an [N, N] PAIR count, train_kitti.py:162 —
    # result == count(dist<1) * count(angle<1) / N * 100, which scales
    # with N and can exceed 100.  Verify that reading of their code, and
    # that our rank_result is the per-sample joint recall (the quantity
    # the reference's own printed joint-recall table uses, :148-152).
    distance = np.sqrt(np.sum((ps - gs) ** 2, axis=1))
    ang = np.remainder(np.abs(ph - gh_), 360)
    ang = np.where(ang > 180, 360 - ang, ang)
    N = distance.shape[0]
    assert ns["result"] == pytest.approx(
        np.sum(distance < 1) * np.sum(ang < 1) / N * 100)
    assert m["rank_result"] == pytest.approx(
        np.sum((distance < 1) & (ang[:, 0] < 1)) / N * 100)
