"""Numeric parity against the REFERENCE'S OWN torch computation.

Executes the mounted reference implementation (/root/reference, CPU torch)
on fixed random inputs and asserts the JAX ops match:

  * grid_sample values + Jacobian chain     (jacobian.py:138-205)      <=1e-6
  * S2GP uv + analytic pose-Jacobian        (models_kitti.py:700-801)  <=1e-5
  * one LM_update step                      (models_kitti.py:939-1041) <=1e-5
  * G2SP perspective uv + Jacobian          (models_kitti.py:86-160)   <=1e-5
  * Ford cam2body2world2sat uv + Jacobian   (models_ford.py:173-264)   <=1e-5
  * loss_func method 0                      (models_ford.py:1041-1093) <=1e-5

The reference is executed for testing only — none of its code is copied.
torchvision isn't installed (and would try to download weights); the
reference's module-level imports of it are satisfied with an inert stub —
none of the functions under test touch it.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Import the reference modules with a stubbed torchvision."""
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional", "torchvision.models"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision.transforms"].functional = \
        sys.modules["torchvision.transforms.functional"]
    sys.path.insert(0, REF)
    try:
        import jacobian as ref_jacobian
        import models_kitti as ref_kitti
        import models_ford as ref_ford
    finally:
        sys.path.remove(REF)
    return types.SimpleNamespace(jacobian=ref_jacobian, kitti=ref_kitti,
                                 ford=ref_ford)


class _Args:
    """Minimal reference-args namespace."""
    rotation_range = 10.0
    shift_range_lat = 20.0
    shift_range_lon = 20.0
    use_gt_depth = 0
    train_damping = 0
    damping = 0.1
    dropout = 0
    use_hessian = 0
    proj = "geo"


def _s2gp_obj(ref):
    """LM_S2GP methods without constructing the VGG backbones."""
    obj = ref.kitti.LM_S2GP.__new__(ref.kitti.LM_S2GP)
    obj.args = _Args()
    obj.using_weight = False
    xyz_grds = []
    for level in range(4):
        h, w = 256 // (2 ** (3 - level)), 1024 // (2 ** (3 - level))
        xyz_grds.append(ref.kitti.LM_S2GP.grd_img2cam(obj, h, w, 256, 1024))
    obj.xyz_grds = xyz_grds
    return obj


def test_grid_sample_parity(ref):
    from highlyaccurate_tpu.ops.grid_sample import grid_sample
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    B, C, IH, IW, H, W = 2, 5, 16, 24, 8, 12
    img = rng.rand(B, C, IH, IW).astype(np.float32)
    # mix of in-bounds and out-of-bounds points
    uv = rng.uniform(-3, IW + 3, (B, H, W, 2)).astype(np.float32)
    uv[..., 1] = rng.uniform(-3, IH + 3, (B, H, W)).astype(np.float32)
    uv[:, :2] = np.clip(uv[:, :2], 1.0, min(IH, IW) - 2)  # keep mask nonempty
    duv = rng.randn(B, H, W, 2, 3).astype(np.float32)

    t_img = torch.from_numpy(img)
    t_uv = torch.from_numpy(uv)
    t_jac = torch.from_numpy(np.transpose(duv, (4, 0, 1, 2, 3)))  # [3,B,H,W,2]
    t_out, t_jac_new = ref.jacobian.grid_sample(t_img, t_uv, t_jac)

    j_out, j_jac = grid_sample(jnp.asarray(np.transpose(img, (0, 2, 3, 1))),
                               jnp.asarray(uv), jnp.asarray(duv))

    np.testing.assert_allclose(
        np.asarray(j_out), np.transpose(t_out.detach().numpy(), (0, 2, 3, 1)),
        rtol=1e-6, atol=1e-6)
    # ref jac: [3, B, C, H, W]; ours: [B, H, W, C, 3]
    np.testing.assert_allclose(
        np.asarray(j_jac),
        np.transpose(t_jac_new.detach().numpy(), (1, 3, 4, 2, 0)),
        rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("level", [0, 2, 3])
def test_s2gp_uv_jac_parity(ref, level):
    from highlyaccurate_tpu.geometry import kitti as geom
    import jax.numpy as jnp

    obj = _s2gp_obj(ref)
    rng = np.random.RandomState(1)
    B = 3
    pose = rng.uniform(-0.8, 0.8, (B, 3)).astype(np.float32)

    t_u = torch.from_numpy(pose[:, 0:1])
    t_v = torch.from_numpy(pose[:, 1:2])
    t_t = torch.from_numpy(pose[:, 2:3])
    sat_uv, mask, du, dv, dth = ref.kitti.LM_S2GP.grd2cam2world2sat(
        obj, t_u, t_v, t_t, level, 512, require_jac=True)

    h, w = 256 // (2 ** (3 - level)), 1024 // (2 ** (3 - level))
    xyz, m, _ = geom.grd_img2cam(h, w, 256, 1024)
    # ray parity first (the fixed-K quirk).  Masked (backward-facing) rays
    # are excluded: their 1/denom is fp-precision-chaotic near the horizon
    # and the reference itself discards them via the z>0 mask.
    np.testing.assert_allclose(m, obj.xyz_grds[level][1][0].detach().numpy())
    mk = m[..., None]
    np.testing.assert_allclose(
        xyz * mk, obj.xyz_grds[level][0][0].detach().numpy() * mk,
        rtol=1e-5, atol=1e-3)  # mm-scale: fp32 (ref) vs fp64 (ours) ray build

    uv, duv = geom.s2gp_uv_jac(jnp.asarray(pose), jnp.asarray(xyz), 512,
                               _Args.rotation_range, _Args.shift_range_lat,
                               _Args.shift_range_lon)
    # atol 1e-2 px: rows just below the horizon sit km away, where fp32
    # rounding in the reference's ray build costs ~5e-4 px — far below any
    # sampling-relevant scale
    mb = m[None, ..., None]
    np.testing.assert_allclose(np.asarray(uv) * mb,
                               sat_uv.detach().numpy() * mb,
                               rtol=1e-5, atol=1e-2)
    for i, t_d in enumerate((du, dv, dth)):
        np.testing.assert_allclose(np.asarray(duv[..., i]) * mb,
                                   t_d.detach().numpy() * mb,
                                   rtol=1e-5, atol=1e-2, err_msg=f"dof {i}")


def test_lm_update_parity(ref):
    from highlyaccurate_tpu.solver.updates import LMConfig, lm_update
    import jax.numpy as jnp

    obj = _s2gp_obj(ref)
    rng = np.random.RandomState(2)
    B, C, H, W = 2, 6, 8, 16
    sat = rng.rand(B, C, H, W).astype(np.float32)
    grd = rng.rand(B, C, H, W).astype(np.float32)
    conf = rng.rand(B, 1, H, W).astype(np.float32)
    jac = (rng.randn(3, B, C, H, W) * 0.1).astype(np.float32)
    pose = (rng.uniform(-0.3, 0.3, (B, 3))).astype(np.float32)

    su, sv, th = (torch.from_numpy(pose[:, i:i + 1]) for i in range(3))
    su2, sv2, th2 = ref.kitti.LM_S2GP.LM_update(
        obj, su, sv, th, torch.from_numpy(sat), torch.from_numpy(conf),
        torch.from_numpy(grd), torch.from_numpy(conf),
        torch.from_numpy(jac))
    ref_new = np.concatenate([x.detach().numpy() for x in (su2, sv2, th2)], 1)
    # the reference's out-of-range reinit must not have fired (random draw)
    assert np.all(np.abs(ref_new[:, :2]) < 2.5)

    cfg = LMConfig(active_dims=(0, 1, 2), using_weight=False, damping=0.1,
                   normalize=True, reinit=False)
    new = lm_update(
        jnp.asarray(pose),
        jnp.asarray(np.transpose(sat, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(conf, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(grd, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(conf, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(jac, (1, 3, 4, 2, 0))),
        jnp.zeros((1, 3)), cfg, None)
    np.testing.assert_allclose(np.asarray(new), ref_new, rtol=1e-5, atol=1e-5)


def test_g2sp_perspective_parity(ref, monkeypatch):
    from highlyaccurate_tpu.geometry import kitti as geom
    import jax.numpy as jnp

    # get_warp_sat2real hardcodes .cuda() (models_kitti.py:59-74); run it on
    # CPU torch by making .cuda() a no-op for this test
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    obj = ref.kitti.LM_G2SP.__new__(ref.kitti.LM_G2SP)
    obj.args = _Args()
    rng = np.random.RandomState(3)
    B, A = 2, 64
    pose = rng.uniform(-0.8, 0.8, (B, 3)).astype(np.float32)
    k = np.broadcast_to(geom.DEFAULT_CAMERA_K, (B, 3, 3)).copy()

    XYZ1_t = ref.kitti.LM_G2SP.get_warp_sat2real(obj, A)  # [A, A, 4]
    XYZ1 = geom.warp_sat2real(A)
    np.testing.assert_allclose(XYZ1, XYZ1_t.detach().numpy(),
                               rtol=1e-5, atol=1e-5)

    su, sv, th = (torch.from_numpy(pose[:, i:i + 1]) for i in range(3))
    uv_t, du_t, dv_t, dth_t, mask_t = ref.kitti.LM_G2SP.seq_warp_real2camera(
        obj, su, sv, th, XYZ1_t, torch.from_numpy(k), 128, 512, 256, 1024,
        require_jac=True)

    uv, duv, mask = geom.g2sp_uv_jac(jnp.asarray(pose), jnp.asarray(XYZ1),
                                     jnp.asarray(k), 128, 512, 256, 1024,
                                     _Args.rotation_range,
                                     _Args.shift_range_lat,
                                     _Args.shift_range_lon)
    np.testing.assert_allclose(np.asarray(mask),
                               mask_t[..., 0].detach().numpy())
    np.testing.assert_allclose(np.asarray(uv), uv_t.detach().numpy(),
                               rtol=1e-4, atol=1e-3)
    for i, t_d in enumerate((du_t, dv_t, dth_t)):
        np.testing.assert_allclose(np.asarray(duv[..., i]),
                                   t_d.detach().numpy(),
                                   rtol=1e-4, atol=1e-3, err_msg=f"dof {i}")


def test_ford_chain_parity(ref):
    from highlyaccurate_tpu.geometry import ford as fgeom
    import jax.numpy as jnp

    obj = ref.ford.LM_S2GP_Ford.__new__(ref.ford.LM_S2GP_Ford)
    obj.args = _Args()
    obj.estimate_depth = False
    rng = np.random.RandomState(4)
    B = 2
    level = 2
    h, w = 256 // (2 ** (3 - level)), 1024 // (2 ** (3 - level))
    xyz, m, _ = fgeom.grd_img2cam_ford(h, w, 256, 1024)
    obj.xyz_grds = [None] * 4
    obj.xyz_grds[level] = (torch.from_numpy(xyz[None]),
                           torch.from_numpy(m[None]))
    # ray parity vs the reference's own builder
    ref_xyz = ref.ford.LM_S2GP_Ford.grd_img2cam(obj, h, w, 256, 1024)
    np.testing.assert_allclose(xyz, ref_xyz[0][0].detach().numpy(),
                               rtol=1e-4, atol=1e-4)

    pose = rng.uniform(-0.8, 0.8, (B, 3)).astype(np.float32)
    qs = rng.randn(B, 4)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    R_FL = np.stack([fgeom.qvec2rotmat(q) for q in qs]).astype(np.float32)
    T_FL = rng.randn(B, 3).astype(np.float32)
    side_m, side_px = 512 * 0.22, 512

    su, sv, th = (torch.from_numpy(pose[:, i:i + 1]) for i in range(3))
    uv_t, mask_t, ju, jv, jth = ref.ford.LM_S2GP_Ford.cam2body2world2sat(
        obj, torch.from_numpy(R_FL), torch.from_numpy(T_FL), su, sv, th,
        level, side_m, side_px, require_jac=True)

    uv, duv = fgeom.ford_uv_jac(jnp.asarray(pose), jnp.asarray(R_FL),
                                jnp.asarray(T_FL), jnp.asarray(xyz),
                                side_m, side_px, _Args.rotation_range,
                                _Args.shift_range_lat, _Args.shift_range_lon)
    np.testing.assert_allclose(np.asarray(uv), uv_t.detach().numpy(),
                               rtol=1e-4, atol=1e-3)
    for i, t_d in enumerate((ju, jv, jth)):
        np.testing.assert_allclose(np.asarray(duv[..., i]),
                                   t_d.detach().numpy(),
                                   rtol=1e-4, atol=1e-3, err_msg=f"dof {i}")


def test_loss_method0_parity(ref):
    from highlyaccurate_tpu.losses.losses import loss_func
    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    B, I, L = 3, 5, 3
    lats = rng.randn(B, I, L).astype(np.float32)
    lons = rng.randn(B, I, L).astype(np.float32)
    ths = rng.randn(B, I, L).astype(np.float32)
    gt = rng.randn(3, B).astype(np.float32)

    out = ref.ford.loss_func(
        0, None, None, None, torch.from_numpy(lats), torch.from_numpy(lons),
        torch.from_numpy(ths), torch.from_numpy(gt[0]),
        torch.from_numpy(gt[1]), torch.from_numpy(gt[2]), None, None)
    ref_loss = float(out[0])

    diag = loss_func(0, jnp.asarray(lats), jnp.asarray(lons), jnp.asarray(ths),
                     jnp.asarray(gt[0]), jnp.asarray(gt[1]), jnp.asarray(gt[2]),
                     100.0, 100.0, 100.0,
                     None, None, None, None, None,
                     100.0, 100.0, 100.0, 100.0)
    np.testing.assert_allclose(float(diag.loss), ref_loss, rtol=1e-5)


def test_inplane_uv_parity(ref, monkeypatch):
    """In-plane SE(2) warp ('nn' proj) vs reference inplane_grd_to_map
    (models_kitti.py:289-331)."""
    from highlyaccurate_tpu.geometry import kitti as geom
    import jax.numpy as jnp

    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    obj = ref.kitti.LM_G2SP.__new__(ref.kitti.LM_G2SP)
    obj.args = _Args()
    rng = np.random.RandomState(6)
    B, A = 2, 64
    pose = rng.uniform(-0.8, 0.8, (B, 3)).astype(np.float32)

    su, sv, th = (torch.from_numpy(pose[:, i:i + 1]) for i in range(3))
    uv_t, du_t, dv_t, dth_t, mask_t = ref.kitti.LM_G2SP.inplane_grd_to_map(
        obj, su, sv, th, A, require_jac=True)

    uv, duv, mask = geom.inplane_uv_jac(jnp.asarray(pose), A,
                                        _Args.rotation_range,
                                        _Args.shift_range_lat,
                                        _Args.shift_range_lon)
    np.testing.assert_allclose(np.asarray(uv), uv_t.detach().numpy(),
                               rtol=1e-5, atol=1e-4)
    for i, t_d in enumerate((du_t, dv_t, dth_t)):
        np.testing.assert_allclose(np.asarray(duv[..., i]),
                                   t_d.detach().numpy(),
                                   rtol=1e-5, atol=1e-4, err_msg=f"dof {i}")
    np.testing.assert_allclose(np.asarray(mask), mask_t.detach().numpy())


def test_sgd_update_parity(ref):
    """SGD inner-loop update vs reference SGD_update
    (models_kitti.py:1056-1084; L2 subgradient, lr 0.01)."""
    from highlyaccurate_tpu.solver.updates import LMConfig, sgd_update
    import jax.numpy as jnp

    obj = _s2gp_obj(ref)
    rng = np.random.RandomState(7)
    B, C, H, W = 2, 6, 8, 16
    sat = rng.rand(B, C, H, W).astype(np.float32)
    grd = rng.rand(B, C, H, W).astype(np.float32)
    conf = rng.rand(B, 1, H, W).astype(np.float32)
    jac = (rng.randn(3, B, C, H, W) * 0.1).astype(np.float32)
    pose = rng.uniform(-0.3, 0.3, (B, 3)).astype(np.float32)

    su, sv, th = (torch.from_numpy(pose[:, i:i + 1]) for i in range(3))
    su2, sv2, th2 = ref.kitti.LM_S2GP.SGD_update(
        obj, su, sv, th, torch.from_numpy(sat), torch.from_numpy(conf),
        torch.from_numpy(grd), torch.from_numpy(conf),
        torch.from_numpy(jac))
    ref_new = np.concatenate([x.detach().numpy() for x in (su2, sv2, th2)], 1)

    cfg = LMConfig(active_dims=(0, 1, 2))
    new = sgd_update(
        jnp.asarray(pose),
        jnp.asarray(np.transpose(sat, (0, 2, 3, 1))), None,
        jnp.asarray(np.transpose(grd, (0, 2, 3, 1))), None,
        jnp.asarray(np.transpose(jac, (1, 3, 4, 2, 0))), cfg)
    np.testing.assert_allclose(np.asarray(new), ref_new, rtol=1e-5, atol=1e-6)


def test_adam_update_parity(ref):
    """Adam inner-loop update vs reference ADAM_update
    (models_kitti.py:1086-1124), including the accumulators across two
    consecutive steps."""
    from highlyaccurate_tpu.solver.updates import LMConfig, adam_update
    import jax.numpy as jnp

    obj = _s2gp_obj(ref)
    obj.args.beta1, obj.args.beta2 = 0.9, 0.999
    rng = np.random.RandomState(8)
    B, C, H, W = 2, 6, 8, 16
    sat = rng.rand(B, C, H, W).astype(np.float32)
    grd = rng.rand(B, C, H, W).astype(np.float32)
    conf = rng.rand(B, 1, H, W).astype(np.float32)
    jac = (rng.randn(3, B, C, H, W) * 0.1).astype(np.float32)
    pose = rng.uniform(-0.3, 0.3, (B, 3)).astype(np.float32)

    su, sv, th = (torch.from_numpy(pose[:, i:i + 1]) for i in range(3))
    m_t = torch.zeros(B, 3)
    v_t = torch.zeros(B, 3)
    for t in range(2):
        su, sv, th, m_t, v_t = ref.kitti.LM_S2GP.ADAM_update(
            obj, su, sv, th, torch.from_numpy(sat), torch.from_numpy(conf),
            torch.from_numpy(grd), torch.from_numpy(conf),
            torch.from_numpy(jac), m_t, v_t, t)
    ref_new = np.concatenate([x.detach().numpy() for x in (su, sv, th)], 1)

    cfg = LMConfig(active_dims=(0, 1, 2))
    p = jnp.asarray(pose)
    m = jnp.zeros((B, 3))
    v = jnp.zeros((B, 3))
    for t in range(2):
        p, m, v = adam_update(
            p, jnp.asarray(np.transpose(sat, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(grd, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(jac, (1, 3, 4, 2, 0))), m, v, t, cfg)
    np.testing.assert_allclose(np.asarray(p), ref_new, rtol=1e-5, atol=1e-6)


def test_ford_gn_update_parity(ref):
    """Ford GN inner-loop update vs reference GN_update
    (models_ford.py:534-598: sat-norm scaling, undamped solve, re-init).

    Controlled tensors sized so H is well-conditioned and the step stays
    within the re-init bounds (the undamped solve diverges on arbitrary
    inputs — which is also why GN has no whole-model parity test)."""
    from highlyaccurate_tpu.solver.updates import LMConfig, gn_update
    import jax
    import jax.numpy as jnp

    obj = ref.ford.LM_S2GP_Ford.__new__(ref.ford.LM_S2GP_Ford)

    class _A:
        train_damping = 0
        damping = 0.1
    obj.args = _A()
    obj.using_weight = False

    rng = np.random.RandomState(9)
    B, C, H, W = 1, 6, 8, 16
    sat = rng.rand(B, C, H, W).astype(np.float32)
    grd = (sat + rng.randn(B, C, H, W) * 0.05).astype(np.float32)
    conf = rng.rand(B, 1, H, W).astype(np.float32)
    jac = (rng.randn(3, B, C, H, W) * 1.0).astype(np.float32)
    pose = rng.uniform(-0.3, 0.3, (B, 3)).astype(np.float32)

    su, sv, th = (torch.from_numpy(pose[:, i:i + 1]) for i in range(3))
    su2, sv2, th2 = ref.ford.LM_S2GP_Ford.GN_update(
        obj, su, sv, th, torch.from_numpy(sat), torch.from_numpy(conf),
        torch.from_numpy(grd), torch.from_numpy(conf), torch.from_numpy(jac))
    ref_new = np.concatenate([x.detach().numpy() for x in (su2, sv2, th2)], 1)
    assert np.all(np.abs(ref_new[:, :2]) < 2.5)  # re-init must not fire

    cfg = LMConfig(active_dims=(0, 1, 2), using_weight=False)
    new = gn_update(
        jnp.asarray(pose),
        jnp.asarray(np.transpose(sat, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(grd, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(conf, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(jac, (1, 3, 4, 2, 0))), cfg,
        jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(new), ref_new, rtol=1e-4, atol=1e-4)
