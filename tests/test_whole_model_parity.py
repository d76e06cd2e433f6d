"""WHOLE-MODEL numeric parity vs the reference's composed torch forwards.

Round-2 VERDICT item 1: per-op parity (test_reference_parity.py) does not
imply end-to-end agreement — the unrolled (N_iters x levels) solver
amplifies per-op fp32 deltas.  These tests build each reference model in
torch (torchvision stubbed, random weights), push its state_dict through the
repo's .pth importer, run BOTH composed forwards on identical inputs at a
reduced config, and compare the full [B, N_iters, L] pose trajectories and
the train-mode loss.

Reference forwards exercised:
  * LM_S2GP.forward_iter_first   /root/reference/models_kitti.py:1141-1316
  * LM_G2SP.forward              /root/reference/models_kitti.py:381-499
  * LM_S2GP_Ford.forward_iters_level /root/reference/models_ford.py:652-866

Reduced-config semantics: the repo treats (grd_h, grd_w)=(32, 128) as the
original camera size with the fixed K rescaled FOV-preserving
(models/lm_s2gp.py:_scaled_default_k).  The reference's own grd_img2cam
applies the same net scaling when called as grd_img2cam(h, w, 256, 1024)
(models_kitti.py:664-667: K_x * w/1024), so the reference models' ray
pyramids are rebuilt through their OWN builders at the reduced ladder —
no repo geometry leaks into the reference side.

Trajectories are captured from the reference by wrapping the module-global
``loss_func`` each model calls in train mode (positions 4-6 of the call are
shift_lats/shift_lons/thetas [B, N_iters, L]).

Tolerance: per-op deltas are ~1e-6; the LM solve contracts over few-thousand
-element residuals and each round multiplies the delta by O(1)-O(10) (the
PERF.md recall study documents the chaos amplification).  At the flagship's
full 15-round depth (S2GP, N_iters=5 x 3 levels) and the 6-round G2SP/Ford
configs the observed end-to-end drift stays below atol=1e-4; each assert
prints the per-round max-|delta| breakdown on failure.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the reference model modules with a stubbed torchvision whose
    vgg16 returns a deterministic random-init features stack."""
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")

    def _fake_vgg16(*args, **kwargs):
        torch.manual_seed(0)
        feats = tnn.Sequential(
            tnn.Conv2d(3, 64, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(64, 64, 3, padding=1), tnn.ReLU(),
            tnn.MaxPool2d(2),
            tnn.Conv2d(64, 128, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU(),
            tnn.MaxPool2d(2),
            tnn.Conv2d(128, 256, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
            tnn.Conv2d(256, 256, 3, padding=1),
        )
        return types.SimpleNamespace(features=feats)

    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional", "torchvision.models"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision.transforms"].functional = \
        sys.modules["torchvision.transforms.functional"]
    sys.modules["torchvision.models"].vgg16 = _fake_vgg16
    sys.modules["torchvision"].models.vgg16 = _fake_vgg16

    def _center_crop(t, size):
        # torchvision.transforms.functional.center_crop semantics (needed by
        # the reference's corr head, models_kitti.py:549)
        ch, cw = size
        H, W = t.shape[-2:]
        top = int(round((H - ch) / 2.0))
        left = int(round((W - cw) / 2.0))
        return t[..., top:top + ch, left:left + cw]

    sys.modules["torchvision.transforms.functional"].center_crop = _center_crop
    sys.path.insert(0, REF)
    try:
        import models_kitti as ref_kitti
        import models_ford as ref_ford
    finally:
        sys.path.remove(REF)
    return types.SimpleNamespace(kitti=ref_kitti, ford=ref_ford)


class _Args:
    """Reference argparse surface at the reduced parity config."""
    rotation_range = 10.0
    shift_range_lat = 20.0
    shift_range_lon = 20.0
    level = 3
    N_iters = 2
    using_weight = 0
    loss_method = 0
    damping = 0.1
    train_damping = 0
    dropout = 0
    use_hessian = 0
    use_gt_depth = 0
    estimate_depth = 0
    proj = "geo"
    Optimizer = "LM"
    direction = "S2GP"
    level_first = 0
    visualize = False
    coe_shift_lat = 100.0
    coe_shift_lon = 100.0
    coe_heading = 100.0
    coe_L1 = 100.0
    coe_L2 = 100.0
    coe_L3 = 100.0
    coe_L4 = 100.0
    beta1 = 0.9
    beta2 = 0.999


GRD_H, GRD_W, SAT = 32, 128, 64


def _randomize(module, seed, scale=0.05):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    return module


def _reduced_rays(tnet, proj="geo"):
    """Rebuild the reference model's ray pyramid through its OWN grd_img2cam
    (or grd_img2cam_polar) at the reduced ladder (net K scaling identical to
    full-size: K_x*w/1024, K_y*h/256 — models_kitti.py:664-667 /
    models_ford.py:112-137; polar rays models_kitti.py:684-698)."""
    builder = tnet.grd_img2cam if proj == "geo" else tnet.grd_img2cam_polar
    return [builder(GRD_H // (2 ** (3 - lvl)),
                    GRD_W // (2 ** (3 - lvl)), 256, 1024)
            for lvl in range(4)]


def _reduced_polar_grids(tnet, sat_size):
    """Rebuild the reference's polar satellite->panorama grids at a reduced
    satellite size.  The reference's polar_coordinates hardcodes the full
    A = 512 / 2**(3-level) ladder (models_kitti.py:1518-1541); this applies
    the same formula at A = sat_size / 2**(3-level) with meters-per-pixel
    rescaled by (512 / sat_size) so the 40 m radius covers the same map
    fraction — matching models/lm_s2gp.py:polar_grid."""
    grids = []
    for level in range(4):
        A = sat_size // (2 ** (3 - level))
        mpp = tnet.meters_per_pixel[level] * (512.0 / sat_size)
        gh, gw = A // 2, A * 2
        v, u = torch.meshgrid(torch.arange(gh, dtype=torch.float32),
                              torch.arange(4 * gw, dtype=torch.float32))
        theta = u / gw * np.pi * 2
        radius = (1 - v / gh) * 40.0 / mpp
        us = A / 2 + radius * torch.cos(np.pi / 4 - theta)
        vs = A / 2 - radius * torch.sin(np.pi / 4 - theta)
        grids.append(torch.stack([us, vs], dim=-1).unsqueeze(0))
    return grids


def _inputs(seed, batch=2):
    rng = np.random.RandomState(seed)
    sat = rng.rand(batch, SAT, SAT, 3).astype(np.float32)
    grd = rng.rand(batch, GRD_H, GRD_W, 3).astype(np.float32)
    gt = rng.uniform(-0.6, 0.6, (batch, 3)).astype(np.float32)
    return sat, grd, gt


def _nchw(x):
    return torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))


def _capture_loss(monkeypatch, module):
    """Wrap module.loss_func to record the trajectory args (positions 4-6)."""
    captured = {}
    orig = module.loss_func

    def wrapper(*args, **kwargs):
        captured["lats"] = args[4].detach().numpy()
        captured["lons"] = args[5].detach().numpy()
        captured["thetas"] = args[6].detach().numpy()
        return orig(*args, **kwargs)

    monkeypatch.setattr(module, "loss_func", wrapper)
    return captured


def _save_sd(tnet, tmp_path, name):
    path = tmp_path / name
    torch.save(tnet.state_dict(), path)
    return str(path)


def _compare_traj(jax_traj, ref_traj, names=("lat", "lon", "theta"),
                  atol=1e-4):
    """Assert trajectory agreement; print a per-round breakdown on failure."""
    # guard against vacuous parity: if the reference solver never moved the
    # pose (e.g. a fully-masked projection), 0==0 proves nothing
    ref_mag = max(float(np.abs(np.asarray(r)).max()) for r in ref_traj)
    assert ref_mag > 1e-3, (
        "degenerate parity setup: reference trajectory never moved "
        f"(max |pose| = {ref_mag:.1e}) — comparison would be vacuous")
    ok = True
    report = []
    for name, j, r in zip(names, jax_traj, ref_traj):
        j = np.asarray(j)
        d = np.abs(j - r)  # [B, I, L]
        per_round = d.max(axis=0).ravel()
        report.append(f"{name}: per-round max|delta| = "
                      + " ".join(f"{x:.2e}" for x in per_round))
        if d.max() > atol:
            ok = False
    assert ok, ("whole-model trajectory divergence (atol %.0e):\n" % atol
                + "\n".join(report))


@pytest.mark.parametrize("overrides", [
    {"N_iters": 5},                 # reference default: full 15-round depth
    {"level_first": 1},             # forward_level_first loop order
    {"Optimizer": "SGD"},
    {"Optimizer": "ADAM"},
    {"using_weight": 1, "use_hessian": 1, "train_damping": 1},
    {"Optimizer": "NN"},            # NNrefine learned pose head (RNNs.py:93)
    {"proj": "polar"},              # polar ray projection (models_kitti.py:684)
    {"loss_method": 3},             # four-term loss (models_ford.py:1157-1202)
    {"use_gt_depth": 1},            # gt-depth ray lift (models_kitti.py:741-748)
], ids=["default15", "level_first", "sgd", "adam", "weight_hess_damp",
        "nn_refine", "polar", "loss3", "gt_depth"])
def test_s2gp_whole_model(ref, tmp_path, monkeypatch, overrides):
    """Composed LM_S2GP forward (train loss + full trajectories + test pose)
    vs the flax model on imported weights and identical inputs, across the
    loop orders and inner-loop optimizers."""
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
    from highlyaccurate_tpu.train.checkpoint import import_pth

    args = _Args()
    for k_, v_ in overrides.items():
        setattr(args, k_, v_)
    tnet = ref.kitti.LM_S2GP(args)
    tnet.xyz_grds = _reduced_rays(tnet, proj=args.proj)
    _randomize(tnet, seed=11)
    tnet.eval()

    sat, grd, gt = _inputs(seed=12)
    sat_t, grd_t = _nchw(sat), _nchw(grd)
    gt_u = torch.from_numpy(gt[:, 0:1])
    gt_v = torch.from_numpy(gt[:, 1:2])
    gt_h = torch.from_numpy(gt[:, 2:3])

    depth_np = depth_t = None
    if args.use_gt_depth:
        # per-pixel depth at the original ground resolution, with invalid
        # (-1) holes, as the KITTI depth annotations provide it
        drng = np.random.RandomState(13)
        depth_np = drng.uniform(2.0, 50.0,
                                (sat.shape[0], GRD_H, GRD_W)).astype(np.float32)
        depth_np[drng.rand(*depth_np.shape) < 0.2] = -1.0
        depth_t = torch.from_numpy(depth_np)

    captured = _capture_loss(monkeypatch, ref.kitti)
    fwd = tnet.forward_level_first if args.level_first \
        else tnet.forward_iter_first
    t_out = fwd(sat_t, grd_t, gt_u, gt_v, gt_h, mode="train",
                gt_depth=depth_t)
    t_loss = float(t_out[0])
    t_lat_f, t_lon_f, t_th_f = fwd(sat_t, grd_t, gt_u, gt_v, gt_h,
                                   mode="test", gt_depth=depth_t)
    # the reference's random re-init must not have fired (it would inject
    # un-seeded torch randomness and void the comparison)
    for k in ("lats", "lons"):
        assert np.all(np.abs(captured[k]) < 2.5)

    cfg = Config(grd_h=GRD_H, grd_w=GRD_W, sat_size=SAT, level=3,
                 use_banded_warp=0, dropout=0, damping=0.1,
                 N_iters=args.N_iters, level_first=args.level_first,
                 Optimizer=args.Optimizer, using_weight=args.using_weight,
                 use_hessian=args.use_hessian, proj=args.proj,
                 loss_method=args.loss_method, use_gt_depth=args.use_gt_depth,
                 train_damping=args.train_damping)
    params = import_pth(_save_sd(tnet, tmp_path, "s2gp.pth"), cfg)
    model = LMS2GP(cfg=cfg)
    rngs = {"lm": jax.random.PRNGKey(0)}

    j_depth = None if depth_np is None else jnp.asarray(depth_np)
    j_lats, j_lons, j_ths = model.apply(
        {"params": params}, jnp.asarray(sat), jnp.asarray(grd),
        mode="trajectory", gt_depth=j_depth, rngs=rngs)
    _compare_traj((j_lats, j_lons, j_ths),
                  (captured["lats"], captured["lons"], captured["thetas"]))

    diag = model.apply({"params": params}, jnp.asarray(sat), jnp.asarray(grd),
                       jnp.asarray(gt), mode="train", gt_depth=j_depth,
                       rngs=rngs)
    np.testing.assert_allclose(float(diag.loss), t_loss, rtol=1e-4)

    j_lat, j_lon, j_th = model.apply(
        {"params": params}, jnp.asarray(sat), jnp.asarray(grd), mode="test",
        gt_depth=j_depth, rngs=rngs)
    np.testing.assert_allclose(np.asarray(j_lat), t_lat_f.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_lon), t_lon_f.detach().numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_th), t_th_f.detach().numpy(),
                               atol=1e-4)


@pytest.mark.parametrize("proj", ["geo", "nn"])
def test_g2sp_whole_model(ref, tmp_path, monkeypatch, proj):
    """Composed LM_G2SP forward vs the flax model (imported weights) —
    perspective ('geo') and in-plane SE(2) ('nn', with the VGGUnet_G2S
    re-laid-out ground branch) projections."""
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.geometry.kitti import DEFAULT_CAMERA_K
    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
    from highlyaccurate_tpu.train.checkpoint import import_pth

    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    args = _Args()
    args.direction = "G2SP"
    args.proj = proj
    tnet = ref.kitti.LM_G2SP(args)
    _randomize(tnet, seed=21)
    tnet.eval()

    sat, grd, gt = _inputs(seed=22)
    B = sat.shape[0]
    # K scaled to the network input size, as the KITTI loader provides it
    # (reference KITTI_dataset.py:84-100 rescales the calib K to 256x1024);
    # both sides then rescale by (feat size / input size) per level.
    k = np.broadcast_to(DEFAULT_CAMERA_K, (B, 3, 3)).astype(np.float32).copy()
    k[:, 0, :] *= GRD_W / 1024.0
    k[:, 1, :] *= GRD_H / 256.0
    sat_t, grd_t = _nchw(sat), _nchw(grd)
    k_t = torch.from_numpy(k)
    gt_u = torch.from_numpy(gt[:, 0:1])
    gt_v = torch.from_numpy(gt[:, 1:2])
    gt_h = torch.from_numpy(gt[:, 2:3])

    captured = _capture_loss(monkeypatch, ref.kitti)
    t_out = tnet(sat_t, grd_t, k_t, gt_u, gt_v, gt_h, mode="train")
    t_loss = float(t_out[0])

    cfg = Config(grd_h=GRD_H, grd_w=GRD_W, sat_size=SAT, N_iters=2, level=3,
                 direction="G2SP", proj=proj, use_banded_warp=0, damping=0.1)
    params = import_pth(_save_sd(tnet, tmp_path, "g2sp.pth"), cfg)
    model = LMG2SP(cfg=cfg)

    j_lats, j_lons, j_ths = model.apply(
        {"params": params}, jnp.asarray(sat), jnp.asarray(grd),
        jnp.asarray(k), mode="trajectory")
    # 'nn': the SE(2) warp puts samples exactly on the in-bounds boundary
    # (x == A-1), where a ~1e-7 coordinate difference flips the
    # DIScontinuous bounds mask — observed as a one-time ~3e-4 bump at the
    # finest level that the solver then contracts back to ~2e-6 by the
    # final round.  geo has no boundary-exact samples and holds 1e-4.
    _compare_traj((j_lats, j_lons, j_ths),
                  (captured["lats"], captured["lons"], captured["thetas"]),
                  atol=1e-4 if proj == "geo" else 5e-4)

    diag = model.apply({"params": params}, jnp.asarray(sat), jnp.asarray(grd),
                       jnp.asarray(k), jnp.asarray(gt), mode="train")
    np.testing.assert_allclose(float(diag.loss), t_loss, rtol=1e-4)


@pytest.mark.parametrize("overrides", [
    {},
    {"level_first": 1},            # forward_level_iters loop order
    {"estimate_depth": 1},         # learned ground-height lift
                                   # (models_ford.py:192-201; depth heads on
                                   # the grd branch only, VGG.py:85-118)
    # GN at batch 1: the reference's GN_update runs `if torch.isnan(...)` on
    # a [B,1] tensor, which raises for B>1 (latent upstream bug).  The
    # reference's Ford SGD_update is broken outright (`delta_pose[:, 0, 0]`
    # on a 2-D tensor) and cannot be executed for comparison — see
    # PARITY.md known deltas.
    # GN is not whole-model-testable: the reference's UNDAMPED H^-1 step on
    # random features walks off the satellite patch within a round (its
    # sampler hard-asserts), and its `if torch.isnan(tensor)` breaks B>1.
    # GN parity is covered per-op in test_reference_parity.py; the
    # reference's Ford SGD_update is broken outright (delta_pose[:, 0, 0]
    # on a 2-D tensor) — see PARITY.md known deltas.
], ids=["default", "level_first", "estimate_depth"])
def test_ford_whole_model(ref, tmp_path, monkeypatch, overrides):
    """Composed LM_S2GP_Ford forwards vs the flax model."""
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.geometry import ford as fgeom
    from highlyaccurate_tpu.models.ford import LMS2GPFord
    from highlyaccurate_tpu.train.checkpoint import import_pth

    overrides = dict(overrides)
    batch = overrides.pop("_batch", 2)
    args = _Args()
    for k_, v_ in overrides.items():
        setattr(args, k_, v_)
    tnet = ref.ford.LM_S2GP_Ford(args)
    tnet.xyz_grds = _reduced_rays(tnet)
    _randomize(tnet, seed=31)
    tnet.eval()

    sat, grd, gt = _inputs(seed=32, batch=batch)
    B = sat.shape[0]
    rng = np.random.RandomState(33)
    qs = rng.randn(B, 4)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    R_FL = np.stack([fgeom.qvec2rotmat(q) for q in qs]).astype(np.float32)
    T_FL = (rng.randn(B, 3) * 0.5).astype(np.float32)
    side_m = SAT * 0.22  # meters_per_pixel 0.22 (Ford_dataset.py:88)

    sat_t, grd_t = _nchw(sat), _nchw(grd)
    gt_u = torch.from_numpy(gt[:, 0])
    gt_v = torch.from_numpy(gt[:, 1])
    gt_h = torch.from_numpy(gt[:, 2])

    captured = _capture_loss(monkeypatch, ref.ford)
    fwd = tnet.forward_level_iters if args.level_first \
        else tnet.forward_iters_level
    t_out = fwd(sat_t, grd_t, side_m, torch.from_numpy(R_FL),
                torch.from_numpy(T_FL), gt_u, gt_v, gt_h, mode="train")
    t_loss = float(t_out[0])
    for kname in ("lats", "lons"):
        assert np.all(np.abs(captured[kname]) < 2.5)

    cfg = Config(grd_h=GRD_H, grd_w=GRD_W, sat_size=SAT, N_iters=2, level=3,
                 use_banded_warp=0, damping=0.1,
                 level_first=args.level_first, Optimizer=args.Optimizer,
                 estimate_depth=args.estimate_depth,
                 shift_range_lat=args.shift_range_lat,
                 shift_range_lon=args.shift_range_lon,
                 rotation_range=args.rotation_range)
    params = import_pth(_save_sd(tnet, tmp_path, "ford.pth"), cfg)
    model = LMS2GPFord(cfg=cfg)
    rngs = {"lm": jax.random.PRNGKey(0)}

    j_lats, j_lons, j_ths = model.apply(
        {"params": params}, jnp.asarray(sat), jnp.asarray(grd), side_m,
        jnp.asarray(R_FL), jnp.asarray(T_FL), mode="trajectory", rngs=rngs)
    _compare_traj((j_lats, j_lons, j_ths),
                  (captured["lats"], captured["lons"], captured["thetas"]))

    diag = model.apply(
        {"params": params}, jnp.asarray(sat), jnp.asarray(grd), side_m,
        jnp.asarray(R_FL), jnp.asarray(T_FL), jnp.asarray(gt), mode="train",
        rngs=rngs)
    np.testing.assert_allclose(float(diag.loss), t_loss, rtol=1e-4)


def test_g2sp_corr_head_parity(ref, tmp_path, monkeypatch):
    """Dense-correlation translation-search head (LM_G2SP.corr) vs the
    reference: train-mode soft-margin triplet loss and test-mode argmin
    shifts on imported weights (reference models_kitti.py:501-595)."""
    import jax.numpy as jnp
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.geometry.kitti import DEFAULT_CAMERA_K
    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
    from highlyaccurate_tpu.train.checkpoint import import_pth

    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    args = _Args()
    args.direction = "G2SP"
    # keep every level's crop window positive at SAT=64 and the crop margins
    # even (torchvision center-crop rounding is exercised by the even case;
    # the odd-margin rounding is covered by the stub itself)
    args.shift_range_lat = args.shift_range_lon = 1.6
    tnet = ref.kitti.LM_G2SP(args)
    _randomize(tnet, seed=41)
    tnet.eval()

    sat, grd, gt = _inputs(seed=42)
    B = sat.shape[0]
    k = np.broadcast_to(DEFAULT_CAMERA_K, (B, 3, 3)).astype(np.float32).copy()
    k[:, 0, :] *= GRD_W / 1024.0
    k[:, 1, :] *= GRD_H / 256.0
    sat_t, grd_t = _nchw(sat), _nchw(grd)
    k_t = torch.from_numpy(k)
    gt_u = torch.from_numpy(gt[:, 0:1])
    gt_v = torch.from_numpy(gt[:, 1:2])

    with torch.no_grad():
        t_loss = float(tnet.corr(sat_t, grd_t, k_t, gt_u, gt_v, mode="train"))
        t_pu, t_pv = tnet.corr(sat_t, grd_t, k_t, mode="test")

    cfg = Config(grd_h=GRD_H, grd_w=GRD_W, sat_size=SAT, level=3,
                 direction="G2SP", shift_range_lat=1.6, shift_range_lon=1.6)
    params = import_pth(_save_sd(tnet, tmp_path, "g2sp_corr.pth"), cfg)
    model = LMG2SP(cfg=cfg)

    j_loss = model.apply({"params": params}, jnp.asarray(sat),
                         jnp.asarray(grd), jnp.asarray(k), jnp.asarray(gt),
                         mode="train", method="corr")
    np.testing.assert_allclose(float(j_loss), t_loss, rtol=1e-4)

    j_pu, j_pv = model.apply({"params": params}, jnp.asarray(sat),
                             jnp.asarray(grd), jnp.asarray(k), mode="test",
                             method="corr")
    np.testing.assert_allclose(np.asarray(j_pu), t_pu.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_pv), t_pv.numpy(), atol=1e-5)


def test_s2gp_orien_corr_parity(ref, tmp_path, monkeypatch):
    """Orientation-only polar correlation head (LM_S2GP.orien_corr) vs the
    reference on imported weights: train-mode heading triplet loss and
    test-mode argmin orientation (reference models_kitti.py:1543-1624),
    with the reference's polar grids rebuilt at the reduced satellite size
    (see _reduced_polar_grids)."""
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
    from highlyaccurate_tpu.train.checkpoint import import_pth

    args = _Args()
    tnet = ref.kitti.LM_S2GP(args)
    tnet.xyz_grds = _reduced_rays(tnet)
    tnet.polar_grids = _reduced_polar_grids(tnet, SAT)
    _randomize(tnet, seed=51)
    tnet.eval()

    sat, grd, gt = _inputs(seed=52)
    sat_t, grd_t = _nchw(sat), _nchw(grd)
    gt_u = torch.from_numpy(gt[:, 0:1])
    gt_v = torch.from_numpy(gt[:, 1:2])
    gt_h = torch.from_numpy(gt[:, 2:3])

    with torch.no_grad():
        t_loss = float(tnet.orien_corr(sat_t, grd_t, gt_u, gt_v, gt_h,
                                       mode="train"))
        t_orien = tnet.orien_corr(sat_t, grd_t, mode="test")

    cfg = Config(grd_h=GRD_H, grd_w=GRD_W, sat_size=SAT, level=3,
                 use_banded_warp=0)
    params = import_pth(_save_sd(tnet, tmp_path, "s2gp_oc.pth"), cfg)
    model = LMS2GP(cfg=cfg)
    rngs = {"lm": jax.random.PRNGKey(0)}

    j_loss = model.apply({"params": params}, jnp.asarray(sat),
                         jnp.asarray(grd), jnp.asarray(gt), mode="train",
                         method="orien_corr", rngs=rngs)
    np.testing.assert_allclose(float(j_loss), t_loss, rtol=1e-4)

    j_orien = model.apply({"params": params}, jnp.asarray(sat),
                          jnp.asarray(grd), mode="test",
                          method="orien_corr", rngs=rngs)
    np.testing.assert_allclose(np.asarray(j_orien),
                               t_orien.numpy().astype(np.float32), atol=1e-5)


def _torch_grads_to_flax(tnet, estimate_depth=False):
    """Convert a backward pass's .grad tensors into the flax param layout
    via the SAME mapping as train/checkpoint.py:import_pth (OIHW->HWIO
    transposes apply identically to gradients)."""
    from highlyaccurate_tpu.models.vggunet import torch_branch_to_flax

    gsd = {k: (p.grad if p.grad is not None else torch.zeros_like(p))
           for k, p in tnet.named_parameters()}
    out = {
        "SatFeatureNet": torch_branch_to_flax(
            gsd, "SatFeatureNet.", estimate_depth=estimate_depth),
        "GrdFeatureNet": torch_branch_to_flax(
            gsd, "GrdFeatureNet.", estimate_depth=estimate_depth),
    }
    if "damping" in gsd:
        out["damping"] = np.asarray(gsd["damping"].detach().numpy())
    return out


def _compare_grads(jgrad, tgrad, rtol):
    """Leaf-wise relative-L2 gradient agreement: ||j-t|| / ||t|| per leaf
    (zero-grad leaves must be zero on both sides).  Frobenius, not
    max-element: fp32 round-off through the 6 unrolled solver rounds puts
    uncorrelated ~1e-3-relative noise on individual elements, while the
    gradient *direction* per leaf is what training uses."""
    import jax

    report, bad = [], []
    jflat = jax.tree_util.tree_flatten_with_path(jgrad)[0]
    tflat = dict(jax.tree_util.tree_flatten_with_path(tgrad)[0])
    assert len(jflat) == len(tflat) and all(k in tflat for k, _ in jflat), \
        "gradient trees have different structure"
    for path, j in jflat:
        name = jax.tree_util.keystr(path)
        t = np.asarray(tflat[path], np.float64)
        j = np.asarray(j, np.float64)
        scale = float(np.linalg.norm(t))
        if scale == 0.0:
            ok = float(np.abs(j).max()) < 1e-12
            report.append(f"{name}: torch grad 0, jax max {np.abs(j).max():.1e}")
        else:
            rel = float(np.linalg.norm(j - t)) / scale
            ok = rel < rtol
            report.append(f"{name}: relL2 {rel:.2e} (||t|| {scale:.2e})")
        if not ok:
            bad.append(report[-1])
    assert not bad, ("parameter-gradient divergence (rtol %.0e):\n" % rtol
                     + "\n".join(report))


@pytest.mark.parametrize("n_iters,level,impl,rtol", [
    # one solver round, no chaos amplification.  The residual ~5e-3 on the
    # earliest sat convs is TORCH's fp32 backward accumulation error, not
    # ours: at branch level (test_vggunet_gradient_accuracy_vs_f64) the
    # jax fp32 gradient sits within ~5e-7 of torch's own float64 backward
    # while torch fp32 drifts 1e-3..8e-3 from it (deepest convs worst).
    # The whole model can't run in torch float64 for a tighter comparison
    # (59 hardcoded .float() casts in models_kitti.py), so the fp32-vs-fp32
    # tolerance must absorb the reference's own error.
    (1, -1, 1, 1e-2),
    (1, -1, 0, 1e-2),   # materialized-jac LM (reference formulation)
    # 6 unrolled rounds: forward trajectories agree to 1e-4 (tests above);
    # the backward linearizes AROUND those trajectories, so fp32 forward
    # deltas amplify into ~1e-3-relative gradient noise — the round1 case
    # pins the per-round backward as the controlled variable
    (2, 3, 1, 5e-3),
], ids=["round1", "round1_matjac", "deep6"])
def test_s2gp_gradient_parity(ref, tmp_path, monkeypatch, n_iters, level,
                              impl, rtol):
    """TRAINING parity: d(loss)/d(params) of the composed LM_S2GP train
    forward vs torch autograd through the reference's own backward on
    identical imported weights and inputs.

    Trajectory/loss parity proves the forward; this proves the entire
    backward graph the reference trains with (reference train_kitti.py:365
    loss.backward()) — sampler VJP, LM-solve linearization, loss method 0."""
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
    from highlyaccurate_tpu.train.checkpoint import import_pth

    args = _Args()
    args.N_iters = n_iters
    args.level = level
    tnet = ref.kitti.LM_S2GP(args)
    tnet.xyz_grds = _reduced_rays(tnet)
    _randomize(tnet, seed=61)
    tnet.train()

    sat, grd, gt = _inputs(seed=62)
    t_loss = tnet.forward_iter_first(
        _nchw(sat), _nchw(grd), torch.from_numpy(gt[:, 0:1]),
        torch.from_numpy(gt[:, 1:2]), torch.from_numpy(gt[:, 2:3]),
        mode="train")[0]
    tnet.zero_grad()
    t_loss.backward()
    tgrad = _torch_grads_to_flax(tnet)

    cfg = Config(grd_h=GRD_H, grd_w=GRD_W, sat_size=SAT, level=level,
                 N_iters=n_iters, use_banded_warp=0, dropout=0, damping=0.1,
                 use_implicit_lm=impl)
    params = import_pth(_save_sd(tnet, tmp_path, "s2gp_grad.pth"), cfg)
    model = LMS2GP(cfg=cfg)
    rngs = {"lm": jax.random.PRNGKey(0)}

    def loss_fn(p):
        diag = model.apply({"params": p}, jnp.asarray(sat), jnp.asarray(grd),
                           jnp.asarray(gt), mode="train", rngs=rngs)
        return diag.loss

    jgrad = jax.grad(loss_fn)(params)
    _compare_grads(jgrad, tgrad, rtol=rtol)


def test_ford_gradient_parity(ref, tmp_path, monkeypatch):
    """d(loss)/d(params) of the composed Ford train forward vs torch
    autograd (reference models_ford.py:652-866 + train_ford.py backward)."""
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.geometry import ford as fgeom
    from highlyaccurate_tpu.models.ford import LMS2GPFord
    from highlyaccurate_tpu.train.checkpoint import import_pth

    args = _Args()
    tnet = ref.ford.LM_S2GP_Ford(args)
    tnet.xyz_grds = _reduced_rays(tnet)
    _randomize(tnet, seed=71)
    tnet.train()

    sat, grd, gt = _inputs(seed=72)
    B = sat.shape[0]
    rng = np.random.RandomState(73)
    qs = rng.randn(B, 4)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    R_FL = np.stack([fgeom.qvec2rotmat(q) for q in qs]).astype(np.float32)
    T_FL = (rng.randn(B, 3) * 0.5).astype(np.float32)
    side_m = SAT * 0.22

    t_loss = tnet.forward_iters_level(
        _nchw(sat), _nchw(grd), side_m, torch.from_numpy(R_FL),
        torch.from_numpy(T_FL), torch.from_numpy(gt[:, 0]),
        torch.from_numpy(gt[:, 1]), torch.from_numpy(gt[:, 2]),
        mode="train")[0]
    tnet.zero_grad()
    t_loss.backward()
    tgrad = _torch_grads_to_flax(tnet)

    cfg = Config(grd_h=GRD_H, grd_w=GRD_W, sat_size=SAT, N_iters=2, level=3,
                 use_banded_warp=0, damping=0.1)
    params = import_pth(_save_sd(tnet, tmp_path, "ford_grad.pth"), cfg)
    model = LMS2GPFord(cfg=cfg)
    rngs = {"lm": jax.random.PRNGKey(0)}

    def loss_fn(p):
        diag = model.apply({"params": p}, jnp.asarray(sat), jnp.asarray(grd),
                           side_m, jnp.asarray(R_FL), jnp.asarray(T_FL),
                           jnp.asarray(gt), mode="train", rngs=rngs)
        return diag.loss

    jgrad = jax.grad(loss_fn)(params)
    _compare_grads(jgrad, tgrad, rtol=1e-3)


def test_vggunet_gradient_accuracy_vs_f64(ref, tmp_path):
    """Backbone backward ACCURACY, not just agreement: against the
    reference VGGUnet's own float64 backward (ground truth), the flax
    branch's fp32 parameter gradients land within ~1e-5 while the
    reference's fp32 backward drifts 1e-3..8e-3 (its conv-backward
    accumulation error, worst at the earliest convs).  This pins the
    residual block-1 deltas in test_s2gp_gradient_parity[round1] on the
    reference's numerics, and shows the rebuilt backbone is strictly more
    accurate (XLA accumulates the conv backward reductions better than
    torch CPU's fp32 path)."""
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.models.vggunet import (VGGUnet,
                                                   torch_branch_to_flax)

    g = torch.Generator().manual_seed(61)
    tnet = ref.kitti.VGGUnet(level=-1)
    with torch.no_grad():
        for p in tnet.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    tnet.train()

    rng = np.random.RandomState(62)
    sat = rng.rand(2, SAT, SAT, 3).astype(np.float32)
    K = np.random.RandomState(99).randn(2, 256, SAT // 8, SAT // 8) \
        .astype(np.float32)  # fixed cotangent on the level--1 feature

    def torch_grads(net, dtype):
        x = torch.from_numpy(np.transpose(sat, (0, 3, 1, 2))).to(dtype)
        feats, _ = net(x)
        loss = (feats[0] * torch.from_numpy(K).to(dtype)).sum()
        net.zero_grad()
        loss.backward()
        return {k: (p.grad.detach().numpy() if p.grad is not None
                    else np.zeros(p.shape)) for k, p in
                net.named_parameters()}

    t32 = torch_grads(tnet, torch.float32)
    tnet64 = ref.kitti.VGGUnet(level=-1).double()
    tnet64.load_state_dict(tnet.state_dict())
    t64 = torch_grads(tnet64, torch.float64)

    sd = {("X." + k): v for k, v in tnet.state_dict().items()}
    params = torch_branch_to_flax(sd, "X.")
    model = VGGUnet(level=-1)

    def loss_fn(p):
        feats, _ = model.apply({"params": p}, jnp.asarray(sat))
        return jnp.sum(feats[0] * jnp.asarray(np.transpose(K, (0, 2, 3, 1))))

    jg = jax.grad(loss_fn)(params)

    report = []
    for conv in ("conv0", "conv2", "conv5", "conv7", "conv10", "conv12",
                 "conv14"):
        truth = np.transpose(t64[f"{conv}.weight"], (2, 3, 1, 0))
        scale = np.linalg.norm(truth)
        jerr = np.linalg.norm(np.asarray(jg[conv]["kernel"],
                                         np.float64) - truth) / scale
        terr = np.linalg.norm(np.transpose(
            t32[f"{conv}.weight"], (2, 3, 1, 0)) - truth) / scale
        report.append(f"{conv}: jax-fp32 {jerr:.2e}, ref-fp32 {terr:.2e}")
        assert jerr < 1e-5, "\n".join(report)
        assert jerr < terr, "\n".join(report)


def test_g2sp_gradient_parity(ref, tmp_path, monkeypatch):
    """d(loss)/d(params) of the composed G2SP train forward (remat'd
    solver rounds, per-pixel implicit-J gather path) vs torch autograd
    (reference models_kitti.py:381-499 + train_kitti.py:365 backward)."""
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.geometry.kitti import DEFAULT_CAMERA_K
    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
    from highlyaccurate_tpu.train.checkpoint import import_pth

    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    args = _Args()
    args.direction = "G2SP"
    tnet = ref.kitti.LM_G2SP(args)
    _randomize(tnet, seed=81)
    tnet.train()

    sat, grd, gt = _inputs(seed=82)
    B = sat.shape[0]
    k = np.broadcast_to(DEFAULT_CAMERA_K, (B, 3, 3)).astype(np.float32).copy()
    k[:, 0, :] *= GRD_W / 1024.0
    k[:, 1, :] *= GRD_H / 256.0

    t_loss = tnet(_nchw(sat), _nchw(grd), torch.from_numpy(k),
                  torch.from_numpy(gt[:, 0:1]), torch.from_numpy(gt[:, 1:2]),
                  torch.from_numpy(gt[:, 2:3]), mode="train")[0]
    tnet.zero_grad()
    t_loss.backward()
    tgrad = _torch_grads_to_flax(tnet)

    cfg = Config(grd_h=GRD_H, grd_w=GRD_W, sat_size=SAT, N_iters=2, level=3,
                 direction="G2SP", use_banded_warp=0, damping=0.1)
    params = import_pth(_save_sd(tnet, tmp_path, "g2sp_grad.pth"), cfg)
    model = LMG2SP(cfg=cfg)

    def loss_fn(p):
        diag = model.apply({"params": p}, jnp.asarray(sat), jnp.asarray(grd),
                           jnp.asarray(k), jnp.asarray(gt), mode="train")
        return diag.loss

    jgrad = jax.grad(loss_fn)(params)
    _compare_grads(jgrad, tgrad, rtol=5e-3)
