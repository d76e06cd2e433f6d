"""Round-2 TPU profile: per-level banded kernel + solver-round timings.

Bundles all round-2 perf measurements into one process (one TPU claim, one
remote-compile session).

Measurement protocol (axon platform):
  * block_until_ready does not fence -> fence via device->host VALUE fetch;
  * fetching big arrays measures the tunnel (~100 MB/s), not compute ->
    every benched function is wrapped to return a SCALAR sum of its outputs;
  * per-call fetch round-trips cost ~25 ms -> dispatch N times back-to-back
    (device executes FIFO) and fetch only the last scalar.

Usage: python scripts/r2_profile.py [--train]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP, _level_hw, level_slots
from highlyaccurate_tpu.ops.pallas.banded_warp import (SLOT_CHANNELS,
                                                       default_rb,
                                                       make_banded_sampler)

B = 8
REPS = 20


def _scalarize(fn):
    def g(*args):
        out = fn(*args)
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(out))
    return jax.jit(g)


def bench(name, fn, *args):
    g = _scalarize(fn)
    np.asarray(g(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = g(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name}: {dt:.2f} ms/call (batch {B})", flush=True)
    return dt


def main():
    run_train = "--train" in sys.argv
    rng = np.random.RandomState(0)
    cfg = Config(level=3, N_iters=5)
    model = LMS2GP(cfg=cfg)
    sat = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
    gt = jnp.zeros((B, 3))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd, gt, mode="train")
    params = v["params"]
    slots = level_slots(cfg)

    # --- kernel-only per level (eval 3-output path) ---
    for lvl, slot in enumerate(slots):
        h, w = _level_hw(cfg, slot)
        A = cfg.sat_size // (2 ** (3 - slot))
        C = SLOT_CHANNELS[slot]
        V_, W_ = h // 2, w
        RB = default_rb(A)
        sampler = make_banded_sampler(A=A, C=C, V=V_, W=W_, RB=RB,
                                      interpret=False)
        satf = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
        ay = rng.uniform(2, A - 2, (B, V_))
        bx = (A - 4.0) / W_
        uv0 = jnp.asarray(np.stack([np.full((B, V_), 2.0), ay], -1)
                          .astype(np.float32))
        uv1 = jnp.asarray(np.stack([np.full((B, V_), 2.0 + bx), ay + bx * 0.2],
                                   -1).astype(np.float32))
        bench(f"L{lvl} kernel-only (A={A} C={C} V={V_} W={W_} RB={RB})",
              sampler, satf, uv0, uv1)

    # --- solver round per level (banded implicit; pose-chained) ---
    def make_round(lvl, slot):
        def round_only(mdl, pose, sat_feat, grd_feat, key):
            grd_conf = jnp.ones(grd_feat.shape[:3] + (1,), jnp.float32)
            return mdl._solver_round(pose, lvl, slot, sat_feat, None,
                                     grd_feat, grd_conf, key, None, 0,
                                     banded=True)[0]
        return round_only

    for lvl, slot in enumerate(slots):
        h, w = _level_hw(cfg, slot)
        A = cfg.sat_size // (2 ** (3 - slot))
        C = SLOT_CHANNELS[slot]
        satf = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
        grdf = jnp.asarray(rng.rand(B, h, w, C).astype(np.float32))
        pose0 = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 3)).astype(np.float32))
        f = jax.jit(lambda p, pose, s, g, k, lvl=lvl, slot=slot: model.apply(
            {"params": p}, pose, s, g, k, method=make_round(lvl, slot)))
        pose = f(params, pose0, satf, grdf, jax.random.PRNGKey(0))
        np.asarray(pose)  # compile + warm
        t0 = time.perf_counter()
        pose = pose0
        for _ in range(REPS):
            pose = f(params, pose * 0.9, satf, grdf, jax.random.PRNGKey(0))
        np.asarray(pose)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"L{lvl} solver round (implicit): {dt:.2f} ms/call (batch {B})",
              flush=True)

    # --- feature extraction + full eval ---
    bench("features(sat+grd)", lambda p, s, g: model.apply(
        {"params": p}, s, g, method="extract_features"), params, sat, grd)

    bench("full eval", lambda p, s, g, k: model.apply(
        {"params": p}, s, g, mode="test", rngs={"lm": k}),
        params, sat, grd, jax.random.PRNGKey(0))

    if run_train:
        from highlyaccurate_tpu.train import step as step_lib
        from highlyaccurate_tpu.train.state import create_train_state
        state = create_train_state(cfg, params)
        ts = step_lib.make_train_step(model, cfg, mesh=None)
        out = ts(state, sat, grd, gt, jax.random.PRNGKey(0))
        np.asarray(out[1]["loss"])
        state = out[0]
        t0 = time.perf_counter()
        for i in range(REPS):
            state, metrics = ts(state, sat, grd, gt, jax.random.PRNGKey(i))
        np.asarray(metrics["loss"])
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"train step: {dt:.2f} ms/step (batch {B}) -> "
              f"{B / dt * 1e3:.1f} fps", flush=True)


if __name__ == "__main__":
    main()
