"""G2SP and Ford model smoke/parity tests on tiny geometry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.geometry import ford as fgeom

TINY = dict(grd_h=32, grd_w=128, sat_size=64, N_iters=1, level=-1)


def test_ford_jac_matches_jacfwd():
    xyz, mask, _ = fgeom.grd_img2cam_ford(8, 16, 32, 128)
    Xc = jnp.asarray(xyz)
    R_FL = jnp.broadcast_to(jnp.asarray(fgeom.qvec2rotmat(
        [0.9961947, 0.0, 0.0, 0.08715574]).astype(np.float32)), (2, 3, 3))
    T_FL = jnp.broadcast_to(jnp.array([1.0, 0.5, -1.4]), (2, 3))
    pose = jax.random.uniform(jax.random.PRNGKey(0), (2, 3), minval=-1, maxval=1)

    uv, duv = fgeom.ford_uv_jac(pose, R_FL, T_FL, Xc, 512 * 0.22, 64,
                                10.0, 20.0, 20.0)

    def single(p, r, t):
        u, _ = fgeom.ford_uv_jac(p[None], r[None], t[None], Xc, 512 * 0.22,
                                 64, 10.0, 20.0, 20.0, require_jac=False)
        return u[0]

    auto = jax.vmap(jax.jacfwd(single))(pose, R_FL, T_FL)
    np.testing.assert_allclose(np.asarray(duv), np.asarray(auto),
                               rtol=1e-4, atol=1e-2)


def test_ford_quaternion_identities():
    R = fgeom.qvec2rotmat([1.0, 0.0, 0.0, 0.0])
    np.testing.assert_allclose(R, np.eye(3), atol=1e-12)
    roll, pitch, yaw = fgeom.qvec2angle(1.0, 0.0, 0.0, 0.0)
    # identity quaternion: reference convention gives yaw=180 (atan2(0, -1))
    np.testing.assert_allclose([roll, pitch], [0.0, 0.0], atol=1e-9)
    q = [np.cos(np.pi / 8), 0, 0, np.sin(np.pi / 8)]  # 45 deg about z
    R2 = fgeom.qvec2rotmat(q)
    np.testing.assert_allclose(R2 @ R2.T, np.eye(3), atol=1e-12)


def _g2sp_setup(**over):
    cfg = Config(direction="G2SP", **{**TINY, **over})
    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
    model = LMG2SP(cfg=cfg)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(2, cfg.sat_size, cfg.sat_size, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(2, cfg.grd_h, cfg.grd_w, 3).astype(np.float32))
    k = jnp.broadcast_to(jnp.asarray(
        np.array([[582.98 * 128 / 1024, 0, 496.24 * 128 / 1024],
                  [0, 482.7 * 32 / 256, 125.0 * 32 / 256],
                  [0, 0, 1]], np.float32)), (2, 3, 3))
    gt = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 3)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "lm": jax.random.PRNGKey(1)},
                        sat, grd, k, gt, mode="train")
    return cfg, model, params, (sat, grd, k, gt)


def test_g2sp_train_and_test():
    cfg, model, params, (sat, grd, k, gt) = _g2sp_setup()
    out = model.apply(params, sat, grd, k, gt, mode="train",
                      rngs={"lm": jax.random.PRNGKey(2)})
    assert np.isfinite(float(out.loss))
    lat, lon, th = model.apply(params, sat, grd, k, mode="test",
                               rngs={"lm": jax.random.PRNGKey(2)})
    assert lat.shape == (2,)
    assert np.isfinite(np.asarray([lat, lon, th])).all()


def test_g2sp_corr_head():
    # small shift range so the corr search window fits the tiny sat map
    cfg, model, params, (sat, grd, k, gt) = _g2sp_setup(
        shift_range_lat=2.0, shift_range_lon=2.0)
    loss = model.apply(params, sat, grd, k, gt, mode="train",
                       method="corr", rngs={"lm": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))
    pu, pv = model.apply(params, sat, grd, k, mode="test", method="corr",
                         rngs={"lm": jax.random.PRNGKey(2)})
    assert pu.shape == (2,)


def _ford_setup(estimate_depth=0, optimizer="LM", **over):
    cfg = Config(Optimizer=optimizer, estimate_depth=estimate_depth,
                 **{**TINY, **over})
    from highlyaccurate_tpu.models.ford import LMS2GPFord
    model = LMS2GPFord(cfg=cfg)
    rng = np.random.RandomState(1)
    sat = jnp.asarray(rng.rand(2, cfg.sat_size, cfg.sat_size, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(2, cfg.grd_h, cfg.grd_w, 3).astype(np.float32))
    # near-identity extrinsics: with the tiny 64-px (14 m) patch, a rotated
    # rig (e.g. q=[.5,.5,-.5,.5]) projects every valid ground ray OFF the
    # map -> fully-masked residual -> the pose never moves and every
    # trajectory comparison is vacuously 0==0.  Keep rays on-map.
    R_FL = jnp.broadcast_to(jnp.asarray(fgeom.qvec2rotmat(
        [0.997, 0.01, 0.05, 0.02]).astype(np.float32)), (2, 3, 3))
    T_FL = jnp.broadcast_to(jnp.array([1.0, 0.5, -1.4], jnp.float32), (2, 3))
    gt = jnp.asarray(rng.uniform(-0.5, 0.5, (2, 3)).astype(np.float32))
    side_m = cfg.sat_size * 0.22  # Ford meters-per-pixel convention
    params = model.init({"params": jax.random.PRNGKey(0),
                         "lm": jax.random.PRNGKey(1)},
                        sat, grd, side_m, R_FL, T_FL, gt, mode="train")
    return cfg, model, params, (sat, grd, side_m, R_FL, T_FL, gt)


def test_ford_train_and_test():
    cfg, model, params, (sat, grd, side_m, R, T, gt) = _ford_setup()
    out = model.apply(params, sat, grd, side_m, R, T, gt, mode="train",
                      rngs={"lm": jax.random.PRNGKey(2)})
    assert np.isfinite(float(out.loss))
    lat, lon, th = model.apply(params, sat, grd, side_m, R, T, mode="test",
                               rngs={"lm": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray([lat, lon, th])).all()


def test_ford_estimate_depth():
    cfg, model, params, (sat, grd, side_m, R, T, gt) = _ford_setup(
        estimate_depth=1)
    out = model.apply(params, sat, grd, side_m, R, T, gt, mode="train",
                      rngs={"lm": jax.random.PRNGKey(2)})
    assert np.isfinite(float(out.loss))


def test_ford_gn_optimizer():
    cfg, model, params, (sat, grd, side_m, R, T, gt) = _ford_setup(
        optimizer="GN")
    lat, lon, th = model.apply(params, sat, grd, side_m, R, T, mode="test",
                               rngs={"lm": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray([lat, lon, th])).all()


def test_ford_banded_implicit_matches_gather():
    """Ford banded implicit-J eval == gather implicit eval (fp32 map).

    The banded fast paths mirror LMS2GP._project_banded; this pins the
    Ford wiring (cam->body->world->sat per-row affine duv fed to
    lm_update_implicit) to the reference-faithful gather path
    (models_ford.py:380-470 LM forward semantics)."""
    from highlyaccurate_tpu.models.ford import LMS2GPFord
    cfg_g, model_g, params, (sat, grd, side_m, R, T, gt) = _ford_setup(
        use_banded_warp=0, banded_bf16_map=0, N_iters=2)
    cfg_b = Config(Optimizer="LM", use_banded_warp=2, banded_bf16_map=0,
                   use_fused_moments=0, **{**TINY, "N_iters": 2})
    model_b = LMS2GPFord(cfg=cfg_b)

    def run(model):
        return model.apply(params, sat, grd, side_m, R, T,
                           mode="trajectory", rngs={"lm": jax.random.PRNGKey(3)})

    got = run(model_g)
    assert max(float(np.abs(np.asarray(t)).max()) for t in got) > 1e-3, \
        "degenerate setup: pose never moved, parity would be vacuous"
    for a, b in zip(got, run(model_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_ford_banded_train_grad_parity():
    """Ford banded-implicit TRAIN path: loss + parameter-gradient parity vs
    the banded materialized-Jacobian path (interpret mode).

    The implicit branch is what TPU training runs by default
    (use_implicit_lm=1); its backward goes through lm_update_implicit and
    the banded sampler's custom VJP, so gradient parity is the test that
    the Ford wiring differentiates correctly (reference semantics:
    models_ford.py:380-470 LM + train_ford.py:233-240 backprop)."""
    from highlyaccurate_tpu.models.ford import LMS2GPFord
    _, model_i, params, (sat, grd, side_m, R, T, gt) = _ford_setup(
        use_banded_warp=2, banded_bf16_map=0, use_fused_moments=0,
        use_implicit_lm=1)
    cfg_m = Config(Optimizer="LM", use_banded_warp=2, banded_bf16_map=0,
                   use_fused_moments=0, use_implicit_lm=0, **TINY)
    model_m = LMS2GPFord(cfg=cfg_m)

    def loss_fn(model, p):
        out = model.apply(p, sat, grd, side_m, R, T, gt, mode="train",
                          rngs={"lm": jax.random.PRNGKey(3)})
        return out.loss

    li, gi = jax.value_and_grad(lambda p: loss_fn(model_i, p))(params)
    lm_, gm = jax.value_and_grad(lambda p: loss_fn(model_m, p))(params)
    gnorm = max(float(np.abs(np.asarray(a)).max())
                for a in jax.tree_util.tree_leaves(gi))
    assert gnorm > 1e-6, \
        "degenerate setup: zero gradients, parity would be vacuous"
    np.testing.assert_allclose(float(li), float(lm_), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gi),
                    jax.tree_util.tree_leaves(gm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


def test_ford_fused_moments_matches_implicit():
    """Ford fused-moment eval kernel == banded implicit eval (fp32 map)."""
    from highlyaccurate_tpu.models.ford import LMS2GPFord
    _, model_i, params, (sat, grd, side_m, R, T, gt) = _ford_setup(
        use_banded_warp=2, banded_bf16_map=0, use_fused_moments=0, N_iters=2)
    cfg_f = Config(Optimizer="LM", use_banded_warp=2, banded_bf16_map=0,
                   use_fused_moments=1, **{**TINY, "N_iters": 2})
    model_f = LMS2GPFord(cfg=cfg_f)

    def run(model):
        return model.apply(params, sat, grd, side_m, R, T,
                           mode="trajectory", rngs={"lm": jax.random.PRNGKey(3)})

    got = run(model_i)
    assert max(float(np.abs(np.asarray(t)).max()) for t in got) > 1e-3, \
        "degenerate setup: pose never moved, parity would be vacuous"
    for a, b in zip(got, run(model_f)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_ford_multi_hypothesis_inference():
    """pose_hypotheses>1 routes Ford test-mode through the multi-start
    solver (mirror of LMS2GP.multi_hypothesis_test): finite [B] poses, and
    the single-hypothesis route stays available on the same params."""
    cfg, model, params, (sat, grd, side_m, R, T, gt) = _ford_setup(
        pose_hypotheses=3)
    lat, lon, th = model.apply(params, sat, grd, side_m, R, T, mode="test",
                               rngs={"lm": jax.random.PRNGKey(3)})
    B = sat.shape[0]
    assert lat.shape == lon.shape == th.shape == (B,)
    assert np.isfinite(np.asarray([lat, lon, th])).all()
    import dataclasses
    cfg1 = dataclasses.replace(cfg, pose_hypotheses=1)
    model1 = type(model)(cfg=cfg1)
    lat1, _, _ = model1.apply(params, sat, grd, side_m, R, T, mode="test",
                              rngs={"lm": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(lat1)).all()


def test_g2sp_multi_hypothesis_inference():
    """pose_hypotheses>1 routes G2SP test-mode through the multi-start
    solver; finite [B] poses, single-hypothesis path unaffected."""
    cfg, model, params, (sat, grd, k, gt) = _g2sp_setup(pose_hypotheses=3)
    lat, lon, th = model.apply(params, sat, grd, k, mode="test",
                               rngs={"lm": jax.random.PRNGKey(3)})
    assert lat.shape == lon.shape == th.shape == (2,)
    assert np.isfinite(np.asarray([lat, lon, th])).all()
    import dataclasses
    cfg1 = dataclasses.replace(cfg, pose_hypotheses=1)
    model1 = type(model)(cfg=cfg1)
    lat1, _, _ = model1.apply(params, sat, grd, k, mode="test",
                              rngs={"lm": jax.random.PRNGKey(3)})
    assert np.isfinite(np.asarray(lat1)).all()
