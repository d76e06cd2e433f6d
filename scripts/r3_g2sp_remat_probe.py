"""Round-3 TPU probe: G2SP train with optimize_remat custom VJP.

The G2SP train path always wraps its solver rounds in jax.checkpoint
(lm_g2sp.py — the per-round [B, A, A, C] residuals OOM otherwise).  Plain
custom_vjp residuals are opaque to remat, so every round ran the projline
kernel TWICE: raw_eval in the primal pass + the with_dxy raw_fwd again in
the remat-backward.  ``defvjp(..., optimize_remat=True)`` runs the fwd
once and saves its residuals (coefs, dx, dy, dxy) through the checkpoint.

Baselines (pre-change, PERF.md round-3 session 3): g2sp train 24.5 fps
fp32 / 27.6 bf16; g2sp eval 81-83 (eval path untouched — sanity only).

RESULT (TPU v5e, 2026-08-19): fp32 322.8 ms (24.8 fps, NEUTRAL vs 327);
bf16 371.4 ms (21.5 fps, -22% vs ~290).  Saving 3x[B,A,A,C] f32 residuals
per round x 15 rounds (~3.5 GB at batch 8) trades the kernel recompute for
HBM pressure and loses — optimize_remat was REVERTED (banded_warp.py keeps
the plain defvjp + an explanatory note).  This probe is kept as the record
of the experiment; re-running it now measures the plain-remat path.

Measurements (batch 8, reference defaults: level 3, N_iters 5):
  1. g2sp train step fp32
  2. g2sp train step bf16 (compute_dtype bfloat16)
  3. g2sp eval fps sanity
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.geometry.kitti import DEFAULT_CAMERA_K
from highlyaccurate_tpu.models.lm_g2sp import LMG2SP

B = 8


def bench_train(cfg, sat, grd, k, gt, label):
    model = LMG2SP(cfg=cfg)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd, k, gt,
                   mode="train")
    params = v["params"]

    def loss_fn(p, key):
        return model.apply({"params": p}, sat, grd, k, gt, mode="train",
                           rngs={"lm": key}).loss

    @jax.jit
    def step(p, key):
        loss, g = jax.value_and_grad(loss_fn)(p, key)
        return loss + sum(jnp.sum(x) * 1e-30
                          for x in jax.tree_util.tree_leaves(g))

    np.asarray(step(params, jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    for i in range(10):
        out = step(params, jax.random.fold_in(jax.random.PRNGKey(0), i))
    np.asarray(out)
    dt = (time.perf_counter() - t0) / 10 * 1e3
    print(f"{label}: {dt:.2f} ms -> {B / dt * 1e3:.2f} fps", flush=True)
    return params, model


def main():
    skip = 0
    if "--skip" in sys.argv:
        skip = int(sys.argv[sys.argv.index("--skip") + 1])
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
    k = jnp.asarray(np.broadcast_to(DEFAULT_CAMERA_K, (B, 3, 3)).copy())
    gt = jnp.zeros((B, 3))

    if skip < 1:
        cfg = Config(level=3, N_iters=5, direction="G2SP", remat=1)
        params, model = bench_train(cfg, sat, grd, k, gt,
                                    "g2sp_train_fp32_optremat")

        @jax.jit
        def ev(params, carry, key):
            out = model.apply({"params": params}, sat + carry * 1e-38, grd,
                              k, mode="test", rngs={"lm": key})
            return carry + jnp.sum(out[0]) * 1e-30

        carry = ev(params, jnp.zeros(()), jax.random.PRNGKey(0))
        np.asarray(carry)
        t0 = time.perf_counter()
        carry = jnp.zeros(())
        for i in range(30):
            carry = ev(params, carry,
                       jax.random.fold_in(jax.random.PRNGKey(0), i))
        np.asarray(carry)
        print(f"g2sp_eval_sanity: {B * 30 / (time.perf_counter() - t0):.2f}"
              " fps", flush=True)

    if skip < 2:
        cfg16 = Config(level=3, N_iters=5, direction="G2SP", remat=1,
                       compute_dtype="bfloat16")
        bench_train(cfg16, sat, grd, k, gt, "g2sp_train_bf16_optremat")

    print("r3_g2sp_remat_probe done", flush=True)


if __name__ == "__main__":
    main()
