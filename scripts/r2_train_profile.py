"""Training-step breakdown on TPU: forward / forward+backward / full step,
plus banded-kernel backward cost per level.

Protocol: scalar-fetch fences (see scripts/r2_profile.py docstring).
Usage: python scripts/r2_train_profile.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP, _level_hw, level_slots
from highlyaccurate_tpu.ops.pallas.banded_warp import (SLOT_CHANNELS,
                                                       default_rb,
                                                       make_banded_sampler)

B, REPS = 8, 10


def bench(name, fn, *args):
    g = jax.jit(lambda *a: sum(jnp.sum(x) for x in
                               jax.tree_util.tree_leaves(fn(*a))))
    np.asarray(g(*args))
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = g(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name}: {dt:.2f} ms/call (batch {B})", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    cfg = Config(level=3, N_iters=5)
    model = LMS2GP(cfg=cfg)
    sat = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
    gt = jnp.zeros((B, 3))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd, gt, mode="train")
    params = v["params"]

    # banded kernel fwd+VJP per level (the training sampler path)
    for lvl, slot in enumerate(level_slots(cfg)):
        h, w = _level_hw(cfg, slot)
        A = cfg.sat_size // (2 ** (3 - slot))
        C = SLOT_CHANNELS[slot]
        V_, W_ = h // 2, w
        RB = default_rb(A)
        sampler = make_banded_sampler(A=A, C=C, V=V_, W=W_, RB=RB,
                                      bf16_map=True, interpret=False)
        satf = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
        ay = rng.uniform(2, A - 2, (B, V_))
        bxs = (A - 4.0) / W_
        uv0 = jnp.asarray(np.stack([np.full((B, V_), 2.0), ay], -1)
                          .astype(np.float32))
        uv1 = jnp.asarray(np.stack([np.full((B, V_), 2.0 + bxs),
                                    ay + bxs * 0.2], -1).astype(np.float32))

        def loss(s, u0, u1):
            o, dx, dy = sampler(s, u0, u1)
            return jnp.sum(o * o) + jnp.sum(dx) * 1e-3 + jnp.sum(dy) * 1e-3

        bench(f"L{lvl} kernel fwd+bwd (A={A} C={C} RB={RB})",
              lambda s, u0, u1: jax.grad(loss, argnums=(0, 1, 2))(s, u0, u1),
              satf, uv0, uv1)

    def train_loss(p, s, g, gtp, k):
        diag = model.apply({"params": p}, s, g, gtp, mode="train",
                           rngs={"lm": k})
        return diag.loss

    bench("train fwd only", train_loss, params, sat, grd, gt,
          jax.random.PRNGKey(0))
    bench("train fwd+bwd (value_and_grad)",
          lambda p, s, g, gtp, k: jax.value_and_grad(train_loss)(
              p, s, g, gtp, k)[1],
          params, sat, grd, gt, jax.random.PRNGKey(0))

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
    print(f"full train step: {dt:.2f} ms -> {B / dt * 1e3:.1f} fps",
          flush=True)


if __name__ == "__main__":
    main()
