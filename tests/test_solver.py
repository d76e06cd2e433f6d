"""LM / SGD / ADAM update-rule tests (reference models_kitti.py:939-1124)."""

import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.solver.updates import (
    LMConfig, _diag_embed, adam_update, compute_damping, lm_update, sgd_update)


def _quadratic_system(B=2, H=4, W=6, C=3, seed=0):
    """A synthetic residual system with known LM solution.

    sat_feat(pose) = grd_feat + J @ pose_err linearized: with jac J constant,
    one undamped LM step from pose recovers pose - pose_err exactly.
    """
    rng = np.random.RandomState(seed)
    grd = rng.randn(B, H, W, C).astype(np.float32)
    J = rng.randn(B, H, W, C, 3).astype(np.float32)
    err = rng.randn(B, 3).astype(np.float32) * 0.1
    sat = grd + np.einsum("bhwcp,bp->bhwc", J, err)
    conf = np.ones((B, H, W, 1), np.float32)
    return map(jnp.asarray, (sat, grd, conf, J, err))


def test_lm_exact_on_linear_system():
    sat, grd, conf, J, err = _quadratic_system()
    cfg = LMConfig(damping=0.0, normalize=False, reinit=False)
    pose = jnp.zeros((2, 3))
    new = lm_update(pose, sat, conf, grd, conf, J, jnp.zeros((1, 3)), cfg)
    # LM solves J^T J delta = -J^T (J err) => delta = -err
    np.testing.assert_allclose(np.asarray(new), -np.asarray(err),
                               rtol=1e-3, atol=1e-4)


def test_lm_normalized_still_descends():
    sat, grd, conf, J, err = _quadratic_system(seed=1)
    cfg = LMConfig(damping=0.1, normalize=True, reinit=False)
    pose = jnp.zeros((2, 3))
    new = lm_update(pose, sat, conf, grd, conf, J, jnp.zeros((1, 3)), cfg)

    def resid(p):
        s = sat - jnp.einsum("bhwcp,bp->bhwc", J, p + jnp.asarray(err)) \
            + jnp.einsum("bhwcp,bp->bhwc", J, jnp.asarray(err))
        return 0.0  # placeholder

    # the damped step must move toward -err (positive projection)
    d = np.asarray(new)
    e = -np.asarray(err)
    cos = (d * e).sum() / (np.linalg.norm(d) * np.linalg.norm(e) + 1e-9)
    assert cos > 0.5


def test_lm_active_dims_freeze():
    sat, grd, conf, J, err = _quadratic_system(seed=2)
    cfg = LMConfig(active_dims=(0, 1), damping=0.0, normalize=False, reinit=False)
    pose = jnp.zeros((2, 3))
    new = lm_update(pose, sat, conf, grd, conf, J, jnp.zeros((1, 3)), cfg)
    assert np.asarray(new)[:, 2].max() == 0.0  # heading frozen
    cfg1 = LMConfig(active_dims=(2,), damping=0.0, normalize=False, reinit=False)
    new1 = lm_update(pose, sat, conf, grd, conf, J, jnp.zeros((1, 3)), cfg1)
    assert np.abs(np.asarray(new1)[:, :2]).max() == 0.0  # shifts frozen


def test_lm_reinit_out_of_range():
    """Poses outside (-2.5, 2.5) must be re-drawn from U(-1, 1)."""
    sat, grd, conf, J, err = _quadratic_system(seed=3)
    cfg = LMConfig(damping=1e6, normalize=False, reinit=True)  # no-op step
    pose = jnp.array([[3.0, -3.0, 0.0], [0.5, 0.5, 0.0]])
    new = lm_update(pose, sat, conf, grd, conf, J, jnp.zeros((1, 3)), cfg,
                    key=jax.random.PRNGKey(0))
    n = np.asarray(new)
    assert -1 <= n[0, 0] <= 1 and -1 <= n[0, 1] <= 1  # re-drawn
    np.testing.assert_allclose(n[1, :2], [0.5, 0.5], atol=1e-4)  # kept


def test_lm_dropout_runs():
    sat, grd, conf, J, err = _quadratic_system(seed=4)
    cfg = LMConfig(damping=0.1, dropout=1, reinit=False)
    new = lm_update(jnp.zeros((2, 3)), sat, conf, grd, conf, J,
                    jnp.zeros((1, 3)), cfg, key=jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(new)).all()


def test_trained_damping_parameterization():
    cfg = LMConfig(train_damping=True)
    d = compute_damping(jnp.zeros((1, 3)), cfg, 3)
    # sigmoid(0)=0.5 -> 10^(-6+5.5) = 10^-0.5
    np.testing.assert_allclose(np.asarray(d), 10 ** (-0.5), rtol=1e-5)
    cfg2 = LMConfig(train_damping=False, damping=0.25)
    np.testing.assert_allclose(np.asarray(compute_damping(jnp.zeros(()), cfg2, 2)),
                               0.25)


def test_weighted_lm_uses_confidence():
    sat, grd, conf, J, err = _quadratic_system(seed=5)
    conf0 = jnp.zeros_like(conf)
    cfg = LMConfig(damping=1e-3, normalize=False, using_weight=True, reinit=False)
    new = lm_update(jnp.zeros((2, 3)), sat, conf0, grd, conf0, J,
                    jnp.zeros((1, 3)), cfg)
    # zero confidence -> zero Hessian & gradient -> no movement
    np.testing.assert_allclose(np.asarray(new), 0.0, atol=1e-5)


def test_sgd_and_adam_descend():
    sat, grd, conf, J, err = _quadratic_system(seed=6)
    cfg = LMConfig(reinit=False)
    pose = jnp.zeros((2, 3))
    p_sgd = sgd_update(pose, sat, conf, grd, conf, J, cfg, lr=1e-4)
    e = -np.asarray(err)
    d = np.asarray(p_sgd)
    assert (d * e).sum() > 0  # moves downhill

    m = jnp.zeros((2, 3))
    v = jnp.zeros((2, 3))
    p_adam, m, v = adam_update(pose, sat, grd, J, m, v, 0, cfg)
    assert np.isfinite(np.asarray(p_adam)).all()
    assert np.abs(np.asarray(p_adam)).max() <= 0.0101  # lr-bounded first step


def test_diag_embed():
    x = jnp.array([[1.0, 2.0, 3.0]])
    D = np.asarray(_diag_embed(x))
    assert D.shape == (1, 3, 3)
    np.testing.assert_allclose(np.diag(D[0]), [1, 2, 3])
    assert D[0].sum() == 6
