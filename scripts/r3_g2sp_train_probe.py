"""Round-3 TPU probe: G2SP training through the differentiable projline
Pallas kernel (first real-TPU run of the custom VJP at production shapes).

Before this path, G2SP training fell back to the XLA gather/scatter
sampler (0.43 fps at batch 8, PERF.md).  One process = one TPU claim.

Measurements (batch 8, reference defaults: level 3, N_iters 5):
  1. g2sp eval fps (sanity vs round-3 81.1)
  2. g2sp train step ms/fps, projline custom-VJP path (remat per round)
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


def main():
    skip = 0
    if "--skip" in sys.argv:
        skip = int(sys.argv[sys.argv.index("--skip") + 1])
    rng = np.random.RandomState(0)
    cfg = Config(level=3, N_iters=5, direction="G2SP", remat=1)
    sat = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
    k = jnp.asarray(np.broadcast_to(DEFAULT_CAMERA_K, (B, 3, 3)).copy())
    gt = jnp.zeros((B, 3))

    model = LMG2SP(cfg=cfg)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd, k, gt,
                   mode="train")
    params = v["params"]

    if skip < 1:
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
        print(f"g2sp_eval: {B * 30 / (time.perf_counter() - t0):.2f} fps",
              flush=True)

    if skip < 2:
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
        print(f"g2sp_train_projline: {dt:.2f} ms -> {B / dt * 1e3:.2f} fps",
              flush=True)
    print("r3_g2sp_train_probe done", flush=True)


if __name__ == "__main__":
    main()
