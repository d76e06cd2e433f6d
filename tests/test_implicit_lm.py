"""Implicit-J LM parity: lm_update_implicit vs the materialized-Jacobian
lm_update on identical banded-sampler outputs, plus end-to-end forward and
gradient parity of the banded-implicit solver path (interpret mode on CPU).

The implicit update (solver/updates.py:lm_update_implicit) contracts
H = J^T J and g = J^T r from per-pixel channel moments + the per-row affine
duv (PERF.md implicit-J plan); it must be numerically identical (up to fp32
reduction order) to building J = dx*duv_x + dy*duv_y explicitly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.ops.pallas.banded_warp import make_banded_sampler
from highlyaccurate_tpu.solver.updates import (LMConfig, lm_update,
                                               lm_update_implicit)

B, A, C, V, W, RB = 2, 32, 8, 4, 16, 16


def _pieces(seed=0):
    """Banded-sampler outputs + random affine duv coefficients + mask."""
    rng = np.random.RandomState(seed)
    sat = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
    ax = rng.uniform(0, A - 1, (B, V))
    ay = rng.uniform(0, A - 1, (B, V))
    bx = rng.uniform(0.5, 1.5, (B, V)) * rng.choice([-1, 1], (B, V))
    by = bx * rng.uniform(-0.6, 0.6, (B, V))
    uv0 = jnp.asarray(np.stack([ax, ay], -1).astype(np.float32))
    uv1 = jnp.asarray(np.stack([ax + bx, ay + by], -1).astype(np.float32))
    sampler = make_banded_sampler(A=A, C=C, V=V, W=W, RB=RB, interpret=True)
    out, dx, dy = sampler(sat, uv0, uv1)

    P0 = jnp.asarray(rng.randn(B, V, 2, 3).astype(np.float32))
    dP = jnp.asarray(rng.randn(B, V, 2, 3).astype(np.float32) * 0.1)
    grd = jnp.asarray(rng.rand(B, V, W, C).astype(np.float32))
    m2d = jnp.asarray((rng.rand(1, V, W) > 0.2).astype(np.float32))
    return out, dx, dy, grd, m2d, P0, dP


def _materialized_update(pose, out, dx, dy, grd, m2d, P0, dP, damping, cfg,
                         key):
    """Reference path: build jac = dx*duv_x + dy*duv_y, call lm_update."""
    u = jnp.arange(W, dtype=jnp.float32)
    duv = P0[:, :, None] + u[None, None, :, None, None] * dP[:, :, None]
    jac = (dx[..., None] * duv[:, :, :, None, 0, :]
           + dy[..., None] * duv[:, :, :, None, 1, :])
    m = jnp.broadcast_to(m2d, out.shape[:3])
    jac = jac * m[..., None, None]
    s = out * m[..., None]
    g = grd * m[..., None]
    conf = jnp.ones(s.shape[:3] + (1,), jnp.float32)
    return lm_update(pose, s, conf, g, conf, jac, damping, cfg, key)


CASES = [
    dict(),                                   # default 3-DoF
    dict(active_dims=(0, 1)),                 # frozen heading
    dict(use_hessian=True),                   # Hessian-diag damping
    dict(dropout=2),                          # pixel dropout
    dict(train_damping=True),                 # learned log-damping
]


@pytest.mark.parametrize("overrides", CASES)
def test_update_parity(overrides):
    out, dx, dy, grd, m2d, P0, dP = _pieces(seed=3)
    cfg = LMConfig(normalize=True, **overrides)
    pose = jnp.asarray(np.random.RandomState(4).randn(B, 3)
                       .astype(np.float32) * 0.3)
    damping = jnp.asarray(np.random.RandomState(5).randn(1, 3)
                          .astype(np.float32))
    key = jax.random.PRNGKey(7)

    want = _materialized_update(pose, out, dx, dy, grd, m2d, P0, dP,
                                damping, cfg, key)
    got = lm_update_implicit(pose, out, dx, dy, grd, m2d, P0, dP,
                             damping, cfg, key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_fused_moment_kernel_parity():
    """make_banded_moments == moments computed from make_banded_sampler
    outputs + grd + mask outside the kernel (interpret mode)."""
    from highlyaccurate_tpu.ops.pallas.banded_warp import (MOM_IDX,
                                                           make_banded_moments)
    rng = np.random.RandomState(31)
    sat = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
    ax = rng.uniform(0, A - 1, (B, V))
    ay = rng.uniform(0, A - 1, (B, V))
    bx = rng.uniform(0.5, 1.5, (B, V)) * rng.choice([-1, 1], (B, V))
    by = bx * rng.uniform(-0.6, 0.6, (B, V))
    uv0 = jnp.asarray(np.stack([ax, ay], -1).astype(np.float32))
    uv1 = jnp.asarray(np.stack([ax + bx, ay + by], -1).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, V, W, C).astype(np.float32))
    mask = jnp.asarray((rng.rand(V, W) > 0.2).astype(np.float32))

    sampler = make_banded_sampler(A=A, C=C, V=V, W=W, RB=RB, interpret=True)
    out, dx, dy = sampler(sat, uv0, uv1)
    msampler = make_banded_moments(A=A, C=C, V=V, W=W, RB=RB, interpret=True)
    M = msampler(sat, grd, mask, uv0, uv1)

    m = mask[None]
    want = {
        "ss": jnp.sum(out * out, -1) * m, "gg": jnp.sum(grd * grd, -1) * m,
        "sxx": jnp.sum(dx * dx, -1) * m, "sxy": jnp.sum(dx * dy, -1) * m,
        "syy": jnp.sum(dy * dy, -1) * m, "dxs": jnp.sum(dx * out, -1) * m,
        "dys": jnp.sum(dy * out, -1) * m, "dxg": jnp.sum(dx * grd, -1) * m,
        "dyg": jnp.sum(dy * grd, -1) * m,
    }
    u = jnp.arange(W, dtype=jnp.float32)
    for name, idx in MOM_IDX.items():
        for k, uk in enumerate((jnp.ones_like(u), u, u * u)):
            np.testing.assert_allclose(
                np.asarray(M[:, :, k, idx]),
                np.asarray(jnp.sum(want[name] * uk, -1)),
                rtol=1e-4, atol=1e-4, err_msg=f"{name} m{k}")


@pytest.mark.parametrize("overrides", [
    dict(), dict(active_dims=(0, 1)), dict(use_hessian=True),
    dict(train_damping=True)])
def test_moment_update_matches_implicit(overrides):
    """lm_update_from_moments == lm_update_implicit on identical inputs."""
    from highlyaccurate_tpu.solver.updates import lm_update_from_moments
    out, dx, dy, grd, m2d, P0, dP = _pieces(seed=17)
    cfg = LMConfig(normalize=True, **overrides)
    pose = jnp.asarray(np.random.RandomState(18).randn(B, 3)
                       .astype(np.float32) * 0.3)
    damping = jnp.asarray(np.random.RandomState(19).randn(1, 3)
                          .astype(np.float32))
    key = jax.random.PRNGKey(20)

    want = lm_update_implicit(pose, out, dx, dy, grd, m2d, P0, dP,
                              damping, cfg, key)

    # assemble the moment tensor the kernel would emit (kernel axes = the
    # (dx, dy) order of the inputs here, so P0/dP pass through unswapped)
    from highlyaccurate_tpu.ops.pallas.banded_warp import (MOM_IDX,
                                                           _MOM_LANES)
    m = jnp.broadcast_to(m2d, out.shape[:3])
    pp = {
        "ss": jnp.sum(out * out, -1) * m, "gg": jnp.sum(grd * grd, -1) * m,
        "sxx": jnp.sum(dx * dx, -1) * m, "sxy": jnp.sum(dx * dy, -1) * m,
        "syy": jnp.sum(dy * dy, -1) * m, "dxs": jnp.sum(dx * out, -1) * m,
        "dys": jnp.sum(dy * out, -1) * m, "dxg": jnp.sum(dx * grd, -1) * m,
        "dyg": jnp.sum(dy * grd, -1) * m,
    }
    u = jnp.arange(W, dtype=jnp.float32)
    M = jnp.zeros((B, V, 3, _MOM_LANES), jnp.float32)
    for name, idx in MOM_IDX.items():
        for k, uk in enumerate((jnp.ones_like(u), u, u * u)):
            M = M.at[:, :, k, idx].set(jnp.sum(pp[name] * uk, -1))

    got = lm_update_from_moments(pose, M, P0, dP, damping, cfg, key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def _tiny_cfg(**kw):
    return Config(grd_h=32, grd_w=128, sat_size=64, N_iters=2, level=3,
                  use_banded_warp=2, **kw)


def _init(cfg, seed=0):
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
    rng = np.random.RandomState(seed)
    sat = jnp.asarray(rng.rand(B, cfg.sat_size, cfg.sat_size, 3)
                      .astype(np.float32))
    grd = jnp.asarray(rng.rand(B, cfg.grd_h, cfg.grd_w, 3).astype(np.float32))
    gt = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32))
    model = LMS2GP(cfg=cfg)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "lm": jax.random.PRNGKey(1)}, sat, grd, gt,
                           mode="train")
    return model, variables["params"], sat, grd, gt


def test_forward_parity_end_to_end():
    """Banded-implicit eval == banded-materialized eval on the same params."""
    cfg_imp = _tiny_cfg(use_implicit_lm=1)
    cfg_mat = _tiny_cfg(use_implicit_lm=0)
    model_i, params, sat, grd, _ = _init(cfg_imp)
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
    model_m = LMS2GP(cfg=cfg_mat)

    def run(model):
        return model.apply({"params": params}, sat, grd, mode="test",
                           rngs={"lm": jax.random.PRNGKey(3)})

    lat_i, lon_i, th_i = run(model_i)
    lat_m, lon_m, th_m = run(model_m)
    np.testing.assert_allclose(np.asarray(lat_i), np.asarray(lat_m),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(lon_i), np.asarray(lon_m),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(th_i), np.asarray(th_m),
                               rtol=1e-3, atol=1e-4)


def test_grad_parity_end_to_end():
    """Loss + parameter-gradient parity of the banded-implicit train path."""
    cfg_imp = _tiny_cfg(use_implicit_lm=1)
    cfg_mat = _tiny_cfg(use_implicit_lm=0)
    model_i, params, sat, grd, gt = _init(cfg_imp)
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
    model_m = LMS2GP(cfg=cfg_mat)

    def loss_fn(model, p):
        diag = model.apply({"params": p}, sat, grd, gt, mode="train",
                           rngs={"lm": jax.random.PRNGKey(3)})
        return diag.loss

    li, gi = jax.value_and_grad(lambda p: loss_fn(model_i, p))(params)
    lm_, gm = jax.value_and_grad(lambda p: loss_fn(model_m, p))(params)
    np.testing.assert_allclose(float(li), float(lm_), rtol=1e-4)
    flat_i = jax.tree_util.tree_leaves(gi)
    flat_m = jax.tree_util.tree_leaves(gm)
    for a, b in zip(flat_i, flat_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=2e-4)


@pytest.mark.parametrize("overrides", [
    {}, {"use_hessian": True}, {"active_dims": (0, 1)},
    {"train_damping": True},
])
def test_pixel_norm_update_parity(overrides):
    """lm_update_implicit_pixel_norm (gather-path implicit) vs lm_update on
    the materialized per-pixel Jacobian jac = dx*duv_u + dy*duv_v."""
    from highlyaccurate_tpu.ops.grid_sample import (grid_sample,
                                                    grid_sample_derivs)
    from highlyaccurate_tpu.solver.updates import \
        lm_update_implicit_pixel_norm

    rng = np.random.RandomState(3)
    Bp, H, Wp, Cp, IA = 2, 6, 12, 8, 32
    sat = jnp.asarray(rng.rand(Bp, IA, IA, Cp).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-2, IA + 1, (Bp, H, Wp, 2))
                     .astype(np.float32))
    duv = jnp.asarray(rng.randn(Bp, H, Wp, 2, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(Bp, H, Wp, Cp).astype(np.float32))
    m2d = jnp.asarray((rng.rand(1, H, Wp) > 0.2).astype(np.float32))
    pose = jnp.asarray(rng.uniform(-0.3, 0.3, (Bp, 3)).astype(np.float32))
    damping = jnp.asarray(rng.rand(1, 3).astype(np.float32))

    cfg = LMConfig(normalize=True, reinit=False, **overrides)

    # materialized reference: mask applied to feat/jac/grd as _project does
    feat, jac = grid_sample(sat, uv, duv)
    feat = feat * m2d[..., None]
    jac = jac * m2d[..., None, None]
    conf = jnp.zeros_like(feat[..., :1])
    ref = lm_update(pose, feat, conf, grd * m2d[..., None], conf, jac,
                    damping, cfg, None)

    out, dx, dy = grid_sample_derivs(sat, uv)
    new = lm_update_implicit_pixel_norm(pose, out, dx, dy, grd, m2d, duv,
                                        damping, cfg, None)
    np.testing.assert_allclose(np.asarray(new), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_gather_implicit_forward_matches_materialized():
    """S2GP gather eval with use_implicit_lm on vs off: identical solver math
    (up to fp32 reduction order) through the full forward."""
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

    rng = np.random.RandomState(4)
    sat = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(2, 32, 128, 3).astype(np.float32))
    base = dict(grd_h=32, grd_w=128, sat_size=64, N_iters=2, level=3,
                use_banded_warp=0)
    poses = []
    for impl in (0, 1):
        cfg = Config(**base, use_implicit_lm=impl)
        model = LMS2GP(cfg=cfg)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "lm": jax.random.PRNGKey(1)},
                               sat, grd, jnp.zeros((2, 3)), mode="train")
        lat, lon, th = model.apply(
            {"params": variables["params"]}, sat, grd, mode="test",
            rngs={"lm": jax.random.PRNGKey(2)})
        poses.append(np.stack([np.asarray(lat), np.asarray(lon),
                               np.asarray(th)], -1))
    np.testing.assert_allclose(poses[0], poses[1], atol=5e-4)
