"""Functional solver test: LM converges toward the true pose when the ground
features are exactly the satellite features projected at the GT pose.

This exercises the full projection + sampler + Jacobian + damped-solve chain
semantically (not just shape/parity): starting from pose 0, iterations must
reduce the pose error substantially.
"""

import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP


def _smooth_map(rng, A, C):
    """Low-frequency random feature map (so bilinear LM has a wide basin)."""
    coarse = rng.randn(A // 8, A // 8, C).astype(np.float32)
    img = jax.image.resize(jnp.asarray(coarse), (A, A, C), method="linear")
    return img[None]  # [1, A, A, C]


def test_lm_converges_on_self_consistent_problem():
    cfg = Config(grd_h=64, grd_w=256, sat_size=128, N_iters=8, level=-1,
                 damping=0.05, rotation_range=10.0,
                 shift_range_lat=5.0, shift_range_lon=5.0)
    model = LMS2GP(cfg=cfg)
    rng = np.random.RandomState(0)

    sat_feat = _smooth_map(rng, 16, 8)  # slot-0 sat feature size (128/8)
    gt_pose = jnp.asarray([[0.4, -0.3, 0.2]], jnp.float32)

    # build a bound module to drive internals directly with synthetic feats
    sat_img = jnp.zeros((1, 128, 128, 3))
    grd_img = jnp.zeros((1, 64, 256, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "lm": jax.random.PRNGKey(1)},
                           sat_img, grd_img, gt_pose, mode="train")
    bound = model.bind(variables, rngs={"lm": jax.random.PRNGKey(2)})

    # ground features = sat features projected at the GT pose
    grd_feat, _, _, _, m = bound._project(sat_feat, None, gt_pose, 0,
                                          with_jac=False)
    grd_conf = jnp.ones_like(grd_feat[..., :1])

    conf = jnp.ones_like(sat_feat[..., :1])
    traj, _, _ = bound._run_rounds(
        jnp.zeros((1, 3)), [sat_feat], [conf], [grd_feat], [grd_conf],
        jax.random.PRNGKey(3), collect_aux=False, gt_depth=None, mode="test")

    errs = np.linalg.norm(np.asarray(traj[0]) - np.asarray(gt_pose[0]),
                          axis=-1)
    init_err = float(np.linalg.norm(np.asarray(gt_pose[0])))
    final_err = errs[-1]
    # the solver must cut the pose error at least in half
    assert final_err < 0.5 * init_err, (init_err, list(errs))


def test_multi_hypothesis_beats_single_on_hard_init():
    """With a far-off GT pose, the multi-start solver's selected hypothesis
    is at least as good as the zero-init one on a self-consistent problem."""
    cfg = Config(grd_h=64, grd_w=256, sat_size=128, N_iters=6, level=-1,
                 damping=0.05, rotation_range=10.0,
                 shift_range_lat=5.0, shift_range_lon=5.0, pose_hypotheses=5)
    model = LMS2GP(cfg=cfg)
    rng = np.random.RandomState(1)

    # synthesize images whose VGG features are irrelevant — drive internals
    sat_feat = _smooth_map(rng, 16, 8)
    gt_pose = jnp.asarray([[0.9, -0.8, 0.5]], jnp.float32)

    sat_img = jnp.zeros((1, 128, 128, 3))
    grd_img = jnp.zeros((1, 64, 256, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "lm": jax.random.PRNGKey(1)},
                           sat_img, grd_img, gt_pose, mode="train")
    bound = model.bind(variables, rngs={"lm": jax.random.PRNGKey(2)})

    grd_feat, _, _, _, _ = bound._project(sat_feat, None, gt_pose, 0,
                                          with_jac=False)
    grd_conf = jnp.ones_like(grd_feat[..., :1])
    conf = jnp.ones_like(sat_feat[..., :1])

    # single-start trajectory
    traj, _, _ = bound._run_rounds(
        jnp.zeros((1, 3)), [sat_feat], [conf], [grd_feat], [grd_conf],
        jax.random.PRNGKey(3), collect_aux=False, gt_depth=None, mode="test")
    err_single = float(np.linalg.norm(np.asarray(traj[0, -1])
                                      - np.asarray(gt_pose[0])))

    # multi-start: tile features per hypothesis, run, select by residual
    P = 5
    tile = lambda x: jnp.repeat(x, P, axis=0)
    init = jax.random.uniform(jax.random.PRNGKey(9), (1, P, 3),
                              minval=-1, maxval=1)
    init = init.at[:, 0].set(0.0)
    trajP, _, _ = bound._run_rounds(
        init.reshape(P, 3), [tile(sat_feat)], [tile(conf)],
        [tile(grd_feat)], [tile(grd_conf)], jax.random.PRNGKey(3),
        collect_aux=False, gt_depth=None, mode="test")
    errsP = np.linalg.norm(np.asarray(trajP[:, -1])
                           - np.asarray(gt_pose[0])[None], axis=-1)
    assert errsP.min() <= err_single + 1e-6


def test_g2sp_multi_hypothesis_scoring_rejects_offmap():
    """G2SP hypothesis selection on a self-consistent problem (sat :=
    project(grd, gt)): the selected hypothesis must land closer to GT than
    a fully-off-map start would.  Regression for the unnormalized-energy
    scoring bug: without per-hypothesis feature normalization, an off-map
    hypothesis' constant cost sum(sat^2) beats genuinely-aligned ones."""
    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP

    cfg = Config(grd_h=64, grd_w=256, sat_size=128, N_iters=6, level=-1,
                 direction="G2SP", damping=0.05, rotation_range=10.0,
                 shift_range_lat=5.0, shift_range_lon=5.0,
                 pose_hypotheses=5, use_banded_warp=0)
    model = LMG2SP(cfg=cfg)
    rng = np.random.RandomState(2)

    # smooth GROUND features at the slot-0 ladder (grd 64x256 -> /8)
    coarse = rng.randn(2, 8, 8).astype(np.float32)
    grd_feat = jax.image.resize(jnp.asarray(coarse).transpose(1, 2, 0),
                                (8, 32, 2), method="linear")[None]
    gt_pose = jnp.asarray([[0.8, -0.7, 0.4]], jnp.float32)
    k = jnp.asarray(
        np.array([[[582.98 * 256 / 1024, 0, 496.24 * 256 / 1024],
                   [0, 482.7 * 64 / 256, 125.0 * 64 / 256],
                   [0, 0, 1]]], np.float32))

    sat_img = jnp.zeros((1, 128, 128, 3))
    grd_img = jnp.zeros((1, 64, 256, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "lm": jax.random.PRNGKey(1)},
                           sat_img, grd_img, k, gt_pose, mode="train")
    bound = model.bind(variables, rngs={"lm": jax.random.PRNGKey(2)})

    A = 16  # slot-0 sat grid (128/8)
    sat_feat, _, _, m = bound._project_grd_to_map(
        grd_feat, None, gt_pose, k, A, with_jac=False)
    grd_conf = jnp.ones_like(grd_feat[..., :1])

    lat, lon, th = bound._multi_hypothesis_from_feats(
        [sat_feat], [grd_feat], [grd_conf], k, 5)
    sel = np.array([float(lon[0]), float(lat[0]), float(th[0])])  # (u, v, heading)
    err_sel = np.linalg.norm(sel - np.asarray(gt_pose[0]))
    # an off-map hypothesis sits >= |(1,1)|-|gt| away in normalized units
    err_offmap = np.linalg.norm(np.array([1.0, 1.0, 0.0])
                                - np.asarray(gt_pose[0])[:3])
    assert err_sel < err_offmap, (err_sel, err_offmap, sel)
    # and the winner must actually have moved toward GT from SOME start
    assert err_sel < np.linalg.norm(np.asarray(gt_pose[0])), (err_sel, sel)
