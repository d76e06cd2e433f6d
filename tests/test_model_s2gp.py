"""End-to-end LM_S2GP model tests on tiny geometry (CPU-friendly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

TINY = dict(grd_h=32, grd_w=128, sat_size=64, N_iters=2, level=-1)


def _data(B=2, cfg=None, seed=0):
    rng = np.random.RandomState(seed)
    sat = jnp.asarray(rng.rand(B, cfg.sat_size, cfg.sat_size, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, cfg.grd_h, cfg.grd_w, 3).astype(np.float32))
    gt = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32))
    return sat, grd, gt


@pytest.fixture(scope="module")
def trained_setup():
    cfg = Config(**TINY)
    model = LMS2GP(cfg=cfg)
    sat, grd, gt = _data(cfg=cfg)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "lm": jax.random.PRNGKey(1)},
                        sat, grd, gt, mode="train")
    return cfg, model, params, (sat, grd, gt)


def test_train_mode_loss_finite(trained_setup):
    cfg, model, params, (sat, grd, gt) = trained_setup
    out = model.apply(params, sat, grd, gt, mode="train",
                      rngs={"lm": jax.random.PRNGKey(2)})
    assert np.isfinite(float(out.loss))
    assert out.loss_last.shape == (1,)  # one level


def test_test_mode_returns_final_pose(trained_setup):
    cfg, model, params, (sat, grd, gt) = trained_setup
    lat, lon, theta = model.apply(params, sat, grd, mode="test",
                                  rngs={"lm": jax.random.PRNGKey(2)})
    assert lat.shape == lon.shape == theta.shape == (2,)
    assert np.isfinite(np.asarray([lat, lon, theta])).all()


def test_jit_and_grad(trained_setup):
    cfg, model, params, (sat, grd, gt) = trained_setup

    @jax.jit
    def loss_fn(p):
        out = model.apply(p, sat, grd, gt, mode="train",
                          rngs={"lm": jax.random.PRNGKey(3)})
        return out.loss

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # gradient reaches both feature nets
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_level3_multi_level():
    cfg = Config(grd_h=32, grd_w=128, sat_size=64, N_iters=1, level=3)
    model = LMS2GP(cfg=cfg)
    sat, grd, gt = _data(cfg=cfg)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "lm": jax.random.PRNGKey(1)}, sat, grd, gt, mode="train")
    out = model.apply(params, sat, grd, gt, mode="train",
                      rngs={"lm": jax.random.PRNGKey(2)})
    assert out.loss_last.shape == (3,)
    assert np.isfinite(float(out.loss))


def test_pose_moves_toward_solution():
    """With sat features == projected pattern, LM should reduce pose error on
    a self-consistent problem (smoke check of the full chain)."""
    cfg = Config(**TINY)
    model = LMS2GP(cfg=cfg)
    sat, grd, gt = _data(cfg=cfg, seed=3)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "lm": jax.random.PRNGKey(1)}, sat, grd, gt, mode="train")
    lat, lon, theta = model.apply(params, sat, grd, mode="test",
                                  rngs={"lm": jax.random.PRNGKey(4)})
    # poses stay in the valid normalized range after reinit logic
    assert (np.abs(np.asarray([lat, lon])) <= 2.5).all()


def test_orien_corr_head():
    cfg = Config(grd_h=32, grd_w=128, sat_size=64, N_iters=1, level=-1)
    model = LMS2GP(cfg=cfg)
    sat, grd, gt = _data(cfg=cfg, seed=7)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "lm": jax.random.PRNGKey(1)}, sat, grd, gt,
                        mode="train")
    loss = model.apply(params, sat, grd, gt, mode="train", method="orien_corr",
                       rngs={"lm": jax.random.PRNGKey(2)})
    assert np.isfinite(float(loss))
    orien = model.apply(params, sat, grd, mode="test", method="orien_corr",
                        rngs={"lm": jax.random.PRNGKey(2)})
    # orientation estimates stay within the (grid-quantized) search range:
    # n = ceil(range / deg_per_px) cells each side
    W = cfg.grd_w // 8
    dpp = 90.0 / W
    bound = np.ceil(cfg.rotation_range / dpp) * dpp
    assert (np.abs(np.asarray(orien)) <= bound + 1e-4).all()


def test_multi_hypothesis_inference():
    cfg = Config(pose_hypotheses=3, **TINY)
    model = LMS2GP(cfg=cfg)
    sat, grd, gt = _data(cfg=cfg, seed=9)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "lm": jax.random.PRNGKey(1)}, sat, grd, gt,
                        mode="train")
    lat, lon, th = model.apply(params, sat, grd, mode="test",
                               rngs={"lm": jax.random.PRNGKey(3)})
    assert lat.shape == lon.shape == th.shape == (2,)
    assert np.isfinite(np.asarray([lat, lon, th])).all()
