"""Training-step + multi-device sharding tests on the virtual 8-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
from highlyaccurate_tpu.train import step as step_lib
from highlyaccurate_tpu.train.state import (create_train_state, epoch_lr,
                                            reset_for_epoch)

# NOTE: grd_h=32 is the smallest non-degenerate geometry — at 16x64 the
# coarse 2-row ray grid is entirely sky-masked / out-of-bounds, the LM
# Jacobian is zero, and the loss no longer depends on params.
TINY = dict(grd_h=32, grd_w=128, sat_size=64, N_iters=1, level=-1, lr=1e-3)


def _setup(batch=8):
    cfg = Config(**TINY)
    model = LMS2GP(cfg=cfg)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(batch, cfg.sat_size, cfg.sat_size, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(batch, cfg.grd_h, cfg.grd_w, 3).astype(np.float32))
    gt = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, 3)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "lm": jax.random.PRNGKey(1)},
                           sat, grd, gt, mode="train")
    return cfg, model, variables["params"], (sat, grd, gt)


def _copy(tree):
    """Fresh buffers (train steps donate their input state)."""
    return jax.tree_util.tree_map(lambda x: jnp.array(x), tree)


def test_epoch_lr_decay():
    assert epoch_lr(1e-4, 0) == 1e-4
    np.testing.assert_allclose(epoch_lr(1e-4, 50), 5e-5)


def test_single_device_train_step_decreases_loss():
    cfg, model, params, (sat, grd, gt) = _setup(batch=4)
    state = create_train_state(cfg, _copy(params))
    train_step = step_lib.make_train_step(model, cfg, mesh=None)
    losses = []
    for i in range(3):
        state, metrics = train_step(state, sat, grd, gt,
                                    jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all() if hasattr(np, "isfinite") else True
    assert losses[-1] < losses[0]  # optimizes on a fixed batch


def test_reset_for_epoch_resets_moments():
    cfg, model, params, (sat, grd, gt) = _setup(batch=4)
    state = create_train_state(cfg, _copy(params))
    train_step = step_lib.make_train_step(model, cfg, mesh=None)
    state, _ = train_step(state, sat, grd, gt, jax.random.PRNGKey(0))
    mu_before = jax.tree_util.tree_leaves(state.opt_state)[0]
    state2 = reset_for_epoch(state, cfg, epoch=1)
    # Adam moments zeroed (reference rebuilds the optimizer, train_kitti.py:333)
    inner = state2.opt_state.inner_state  # type: ignore
    mus = jax.tree_util.tree_leaves(inner[0].mu)
    assert all(float(jnp.abs(m).max()) == 0.0 for m in mus)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_mesh_sharded_train_step():
    cfg, model, params, (sat, grd, gt) = _setup(batch=8)
    mesh = step_lib.make_mesh(jax.devices()[:8])
    state = create_train_state(cfg, _copy(params))
    state = step_lib.replicate(mesh, state)
    batch = step_lib.shard_batch(mesh, {"sat": sat, "grd": grd, "gt": gt})
    train_step = step_lib.make_train_step(model, cfg, mesh)
    new_state, metrics = train_step(state, batch["sat"], batch["grd"],
                                    batch["gt"], jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # params stay replicated after the step
    p0 = jax.tree_util.tree_leaves(new_state.params)[0]
    assert p0.sharding.is_fully_replicated


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_mesh_sharded_matches_single_device():
    """Data-parallel GRADIENTS == single-device gradients on the same batch.

    (Comparing post-Adam params is too fragile: m/sqrt(v) amplifies
    reduction-order noise on near-zero grads into O(lr) step differences.)
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    cfg, model, params, (sat, grd, gt) = _setup(batch=8)

    def loss_fn(p, sat, grd, gt):
        out = model.apply({"params": p}, sat, grd, gt, mode="train",
                          rngs={"lm": jax.random.PRNGKey(0)})
        return out.loss

    g1 = jax.jit(jax.grad(loss_fn))(params, sat, grd, gt)

    mesh = step_lib.make_mesh(jax.devices()[:8])
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    gradfn8 = jax.jit(jax.grad(loss_fn),
                      in_shardings=(repl, data, data, data),
                      out_shardings=repl)
    p8 = step_lib.replicate(mesh, params)
    b = step_lib.shard_batch(mesh, {"sat": sat, "grd": grd, "gt": gt})
    g8 = gradfn8(p8, b["sat"], b["grd"], b["gt"])

    for a, b_ in zip(jax.tree_util.tree_leaves(g1),
                     jax.tree_util.tree_leaves(g8)):
        scale = max(float(jnp.abs(a).max()), 1e-3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-4 * scale)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_mesh_eval_step():
    cfg, model, params, (sat, grd, gt) = _setup(batch=8)
    mesh = step_lib.make_mesh(jax.devices()[:8])
    params_r = step_lib.replicate(mesh, params)
    b = step_lib.shard_batch(mesh, {"sat": sat, "grd": grd})
    eval_step = step_lib.make_eval_step(model, cfg, mesh)
    lat, lon, th = eval_step(params_r, b["sat"], b["grd"], jax.random.PRNGKey(0))
    assert lat.shape == (8,)
    assert np.isfinite(np.asarray(lat)).all()


def test_ford_sharded_train_step():
    """Ford mesh-sharded train step (first-class path, VERDICT round-1 #6):
    runs on the 8-device mesh and decreases loss; frozen-backbone variant
    leaves the feature nets untouched."""
    from highlyaccurate_tpu.models.ford import LMS2GPFord

    cfg = Config(**TINY)
    model = LMS2GPFord(cfg=cfg)
    rng = np.random.RandomState(0)
    batch = 8
    side_m = 64 * 0.22
    sat = jnp.asarray(rng.rand(batch, cfg.sat_size, cfg.sat_size, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(batch, cfg.grd_h, cfg.grd_w, 3).astype(np.float32))
    gt = jnp.asarray(rng.uniform(-0.5, 0.5, (batch, 3)).astype(np.float32))
    R = jnp.broadcast_to(jnp.eye(3), (batch, 3, 3))
    T = jnp.zeros((batch, 3))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "lm": jax.random.PRNGKey(1)},
                           sat, grd, side_m, R, T, gt, mode="train")

    mesh = step_lib.make_mesh(jax.devices()[:8])
    state = step_lib.replicate(mesh, create_train_state(
        cfg, _copy(variables["params"])))
    b = step_lib.shard_batch(mesh, {"sat": sat, "grd": grd, "R": R, "T": T,
                                    "gt": gt})
    ts = step_lib.make_train_step(model, cfg, mesh, ford_side_m=side_m)
    losses = []
    for i in range(3):
        state, metrics = ts(state, b["sat"], b["grd"], b["R"], b["T"],
                            b["gt"], jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    # noisy 3-step optimization (random data + out-of-range pose reinit):
    # require finite + at least one improving step
    assert np.isfinite(losses).all() and min(losses[1:]) < losses[0]

    # frozen-backbone variant: feature nets must not move (train_damping=1
    # so at least one non-backbone param carries gradient)
    cfg2 = Config(**TINY, train_damping=1)
    model = LMS2GPFord(cfg=cfg2)
    state2 = step_lib.replicate(mesh, create_train_state(
        cfg2, _copy(variables["params"])))
    tsf = step_lib.make_train_step(model, cfg2, mesh, ford_side_m=side_m,
                                   freeze_backbones=True)
    new_state, _ = tsf(state2, b["sat"], b["grd"], b["R"], b["T"], b["gt"],
                       jax.random.PRNGKey(0))
    for k in ("SatFeatureNet", "GrdFeatureNet"):
        a = jax.tree_util.tree_leaves(variables["params"][k])
        bb = jax.tree_util.tree_leaves(new_state.params[k])
        for x, y in zip(a, bb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # but the damping param did move
    assert not np.allclose(np.asarray(new_state.params["damping"]),
                           np.asarray(variables["params"]["damping"]))


def test_device_prefetch_order_and_depth():
    """device_prefetch (SURVEY P8) must preserve order, call place exactly
    once per batch, keep at most `depth` placed batches in flight, and
    place batch N+1 BEFORE yielding batch N (the overlap property)."""
    from highlyaccurate_tpu.train.step import device_prefetch

    placed, events = [], []

    def place(b):
        placed.append(b)
        events.append(("place", b))
        return b * 10

    out = []
    for y in device_prefetch(range(5), place, depth=2):
        events.append(("yield", y // 10))
        out.append(y)
    assert out == [0, 10, 20, 30, 40]
    assert placed == [0, 1, 2, 3, 4]
    # batch 1 was placed before batch 0 was yielded (double buffering)
    assert events.index(("place", 1)) < events.index(("yield", 0))
    # never more than `depth` outstanding placements ahead of consumption
    outstanding = 0
    for kind, _ in events:
        outstanding += 1 if kind == "place" else -1
        assert outstanding <= 2

    # short iterables (fewer than depth) still drain completely
    placed.clear()
    assert list(device_prefetch([7], place, depth=2)) == [70]
    assert placed == [7]
    assert list(device_prefetch([], place, depth=2)) == []
