"""Round-3 TPU probe: Ford banded fast paths (implicit-J + fused moments).

The Ford model gained the same banded implicit-J / fused-moment LM
variants as the flagship (models/ford.py _project_banded); this measures
them on real TPU for the first time (interpret-mode parity is already
pinned by tests/test_model_g2sp_ford.py).

One process = one TPU claim (CLAUDE.md).  Fencing via scalar fetches.

Measurements (batch 8, reference defaults: level 3, N_iters 5):
  1. ford eval, fused-moment kernel (new default)
  2. ford eval, banded implicit (use_fused_moments=0)
  3. ford eval, materialized [B,V,W,C,3] jac (use_implicit_lm=0; r2 path)
  4. ford train step, implicit (new default)
  5. ford train step, materialized (r2 path)
"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.geometry import ford as fgeom
from highlyaccurate_tpu.models.ford import LMS2GPFord

B = 8
REPS = 30


def main():
    skip = 0
    if "--skip" in sys.argv:
        skip = int(sys.argv[sys.argv.index("--skip") + 1])
    rng = np.random.RandomState(0)
    cfg = Config(level=3, N_iters=5)
    sat = jnp.asarray(rng.rand(B, cfg.sat_size, cfg.sat_size, 3)
                      .astype(np.float32))
    grd = jnp.asarray(rng.rand(B, cfg.grd_h, cfg.grd_w, 3).astype(np.float32))
    side_m = cfg.sat_size * 0.22
    R = jnp.broadcast_to(jnp.asarray(fgeom.qvec2rotmat(
        [0.997, 0.01, 0.05, 0.02])), (B, 3, 3))
    T = jnp.broadcast_to(jnp.array([1.0, 0.5, -1.4], jnp.float32), (B, 3))
    gt = jnp.zeros((B, 3))

    model0 = LMS2GPFord(cfg=cfg)
    v = model0.init({"params": jax.random.PRNGKey(0),
                     "lm": jax.random.PRNGKey(1)},
                    sat, grd, side_m, R, T, gt, mode="train")
    params = v["params"]

    def eval_fps(c, tag, reps=REPS):
        model = LMS2GPFord(cfg=c)

        @jax.jit
        def ev(params, carry, key):
            out = model.apply({"params": params}, sat + carry * 1e-38, grd,
                              side_m, R, T, mode="test", rngs={"lm": key})
            return carry + jnp.sum(out[0]) * 1e-30

        carry = ev(params, jnp.zeros(()), jax.random.PRNGKey(0))
        np.asarray(carry)
        t0 = time.perf_counter()
        carry = jnp.zeros(())
        for i in range(reps):
            carry = ev(params, carry,
                       jax.random.fold_in(jax.random.PRNGKey(0), i))
        np.asarray(carry)
        fps = B * reps / (time.perf_counter() - t0)
        print(f"{tag}: {fps:.2f} fps (batch {B})", flush=True)
        return fps

    def train_ms(c, tag, reps=10):
        model = LMS2GPFord(cfg=c)

        def loss_fn(p, key):
            return model.apply({"params": p}, sat, grd, side_m, R, T, gt,
                               mode="train", rngs={"lm": key}).loss

        @jax.jit
        def step(p, key):
            loss, g = jax.value_and_grad(loss_fn)(p, key)
            return loss + sum(jnp.sum(x) * 1e-30
                              for x in jax.tree_util.tree_leaves(g))

        np.asarray(step(params, jax.random.PRNGKey(0)))
        t0 = time.perf_counter()
        for i in range(reps):
            out = step(params, jax.random.fold_in(jax.random.PRNGKey(0), i))
        np.asarray(out)
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{tag}: {dt:.2f} ms -> {B / dt * 1e3:.2f} fps", flush=True)
        return dt

    if skip < 1:
        eval_fps(cfg, "ford_eval_fused(default)")
    if skip < 2:
        eval_fps(dataclasses.replace(cfg, use_fused_moments=0),
                 "ford_eval_implicit")
    if skip < 3:
        eval_fps(dataclasses.replace(cfg, use_implicit_lm=0,
                                     use_fused_moments=0),
                 "ford_eval_materialized(r2)")
    if skip < 4:
        train_ms(cfg, "ford_train_implicit(default)")
    if skip < 5:
        train_ms(dataclasses.replace(cfg, use_implicit_lm=0,
                                     use_fused_moments=0),
                 "ford_train_materialized(r2)")
    print("r3_ford_probe done", flush=True)


if __name__ == "__main__":
    main()
