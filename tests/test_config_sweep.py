"""Smoke sweep over reference flag combinations (tiny shapes).

Covers the config surface of SURVEY.md §5.6 that other tests don't:
polar projection, NN/SGD/ADAM optimizers, gt-depth lift, dropout,
trained damping, Hessian-diagonal damping, level_first, G2SP 'nn' proj.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

TINY = dict(grd_h=32, grd_w=128, sat_size=64, N_iters=1, level=-1)


def _run(cfg, gt_depth=None, B=2, seed=0):
    model = LMS2GP(cfg=cfg)
    rng = np.random.RandomState(seed)
    sat = jnp.asarray(rng.rand(B, cfg.sat_size, cfg.sat_size, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, cfg.grd_h, cfg.grd_w, 3).astype(np.float32))
    gt = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32))
    kwargs = {}
    if gt_depth is not None:
        kwargs["gt_depth"] = gt_depth
    params = model.init({"params": jax.random.PRNGKey(0),
                         "lm": jax.random.PRNGKey(1)}, sat, grd, gt,
                        mode="train", **kwargs)
    out = model.apply(params, sat, grd, gt, mode="train",
                      rngs={"lm": jax.random.PRNGKey(2)}, **kwargs)
    assert np.isfinite(float(out.loss)), cfg
    lat, lon, th = model.apply(params, sat, grd, mode="test",
                               rngs={"lm": jax.random.PRNGKey(3)}, **kwargs)
    assert np.isfinite(np.asarray([lat, lon, th])).all(), cfg
    return float(out.loss)


@pytest.mark.parametrize("over", [
    dict(proj="polar"),
    dict(Optimizer="NN"),
    dict(Optimizer="SGD"),
    dict(Optimizer="ADAM"),
    dict(dropout=1),
    dict(train_damping=1),
    dict(use_hessian=1),
    dict(level_first=1),
    dict(using_weight=1),
    dict(rotation_range=0.0),
    dict(shift_range_lat=0.0, shift_range_lon=0.0),
    dict(loss_method=1),
    dict(loss_method=2),
    dict(loss_method=3),
])
def test_s2gp_flag_combinations(over):
    _run(Config(**{**TINY, **over}))


@pytest.mark.parametrize("over", [
    dict(use_banded_warp=2),                       # banded + fused eval
    dict(use_banded_warp=2, dropout=1),            # fused skipped -> implicit
    dict(use_banded_warp=2, use_hessian=1),
    dict(use_banded_warp=2, train_damping=1),
    dict(use_banded_warp=2, rotation_range=0.0),   # frozen-DoF 2x2 solve
    dict(use_banded_warp=2, use_implicit_lm=0),    # materialized banded jac
    dict(use_banded_warp=2, use_fused_moments=0),  # implicit, no fused kernel
    dict(use_banded_warp=2, banded_bf16_map=0),    # fp32 windowed map
    dict(use_banded_warp=2, pose_hypotheses=2),    # multi-start + fused eval
])
def test_banded_flag_combinations(over):
    """Banded kernel (interpret mode) across the solver-config surface,
    including the fused-moment eval path and its fallbacks."""
    _run(Config(**{**TINY, **over}))


def test_banded_bf16_train_grads():
    """bf16 feature compute through the banded custom VJP: the f32 cast
    sits outside the custom_vjp, so cotangent dtypes line up (a bf16 train
    step once crashed with an AssertionError here)."""
    cfg = Config(**{**TINY, "use_banded_warp": 2,
                    "compute_dtype": "bfloat16"})
    model = LMS2GP(cfg=cfg)
    rng = np.random.RandomState(3)
    B = 2
    sat = jnp.asarray(rng.rand(B, cfg.sat_size, cfg.sat_size, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, cfg.grd_h, cfg.grd_w, 3).astype(np.float32))
    gt = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "lm": jax.random.PRNGKey(1)}, sat, grd, gt,
                        mode="train")["params"]

    def loss(p):
        return model.apply({"params": p}, sat, grd, gt, mode="train",
                           rngs={"lm": jax.random.PRNGKey(2)}).loss

    l, g = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(l))
    assert all(np.isfinite(np.asarray(x)).all()
               for x in jax.tree_util.tree_leaves(g))


def test_use_gt_depth():
    cfg = Config(use_gt_depth=1, **TINY)
    rng = np.random.RandomState(1)
    depth = jnp.asarray(rng.uniform(0.5, 5.0,
                                    (2, cfg.grd_h, cfg.grd_w)).astype(np.float32))
    _run(cfg, gt_depth=depth)


def test_g2sp_nn_projection():
    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
    cfg = Config(direction="G2SP", proj="nn", **TINY)
    model = LMG2SP(cfg=cfg)
    rng = np.random.RandomState(2)
    sat = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(2, 32, 128, 3).astype(np.float32))
    k = jnp.broadcast_to(jnp.eye(3) * 50, (2, 3, 3)).astype(jnp.float32)
    gt = jnp.zeros((2, 3))
    params = model.init({"params": jax.random.PRNGKey(0),
                         "lm": jax.random.PRNGKey(1)}, sat, grd, k, gt,
                        mode="train")
    out = model.apply(params, sat, grd, k, gt, mode="train",
                      rngs={"lm": jax.random.PRNGKey(2)})
    assert np.isfinite(float(out.loss))


def test_g2sp_banded_eval_matches_gather():
    """G2SP projective-line eval fast path vs the gather path (interpret).

    One LM round at tiny shapes: the only numeric deltas are the bf16 map
    quantization and reduction order, so poses must agree closely."""
    import dataclasses
    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
    # level=-3 -> slot 2: the ground map is [16, 64] (8-row aligned, so the
    # projective-line kernel engages; slot 0 maps at these tiny shapes are
    # 4 rows tall and fall back to gather)
    cfg_b = Config(direction="G2SP", use_banded_warp=2, N_iters=1,
                   grd_h=32, grd_w=128, sat_size=64, level=-3)
    cfg_g = dataclasses.replace(cfg_b, use_banded_warp=0)
    rng = np.random.RandomState(9)
    B = 2
    sat = jnp.asarray(rng.rand(B, 64, 64, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, 32, 128, 3).astype(np.float32))
    k = jnp.broadcast_to(jnp.asarray(
        [[582.9802 / 8, 0, 496.242 / 8],
         [0, 482.7076 / 8, 125.0034 / 8],
         [0, 0, 1.0]], dtype=jnp.float32), (B, 3, 3))
    gt = jnp.zeros((B, 3))

    model_b = LMG2SP(cfg=cfg_b)
    params = model_b.init({"params": jax.random.PRNGKey(0),
                           "lm": jax.random.PRNGKey(1)}, sat, grd, k, gt,
                          mode="train")["params"]
    model_g = LMG2SP(cfg=cfg_g)

    out_b = model_b.apply({"params": params}, sat, grd, k, mode="test")
    out_g = model_g.apply({"params": params}, sat, grd, k, mode="test")
    for name, a, b in zip(("lat", "lon", "theta"), out_b, out_g):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-2, atol=2e-3, err_msg=name)
