"""Component timing on the current accelerator (run from repo root).

Uses device->host fetches as sync fences (block_until_ready is unreliable on
the axon platform). Reports ms/call for: sat VGG, grd VGG, one solver round
per level, full eval, full train step, at fp32 and bf16.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
from highlyaccurate_tpu.models.vggunet import VGGUnet
from highlyaccurate_tpu.train import step as step_lib
from highlyaccurate_tpu.train.state import create_train_state

B = 8
REPS = 10


def fence(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def bench_fn(name, fn, *args):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
        fence(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name}: {dt:.2f} ms/call (batch {B})", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    for dtype in ["float32", "bfloat16"]:
        print(f"=== compute_dtype {dtype} ===", flush=True)
        cfg = Config(level=3, N_iters=5, compute_dtype=dtype)
        sat = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
        grd = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
        gt = jnp.zeros((B, 3))

        model = LMS2GP(cfg=cfg)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "lm": jax.random.PRNGKey(1)}, sat, grd, gt,
                       mode="train")
        params = v["params"]

        feat = jax.jit(lambda p, s, g: model.apply(
            {"params": p}, s, g, method="extract_features"))
        bench_fn("features(sat+grd)", feat, params, sat, grd)

        ev = jax.jit(lambda p, s, g, k: model.apply(
            {"params": p}, s, g, mode="test", rngs={"lm": k}))
        bench_fn("full eval", ev, params, sat, grd, jax.random.PRNGKey(0))

        state = create_train_state(cfg, params)
        ts = step_lib.make_train_step(model, cfg, mesh=None)
        # train step donates state; rebuild each call is unfair — time with
        # carry-through instead
        out = ts(state, sat, grd, gt, jax.random.PRNGKey(0))
        fence(out[1])
        state = out[0]
        t0 = time.perf_counter()
        for i in range(REPS):
            state, metrics = ts(state, sat, grd, gt, jax.random.PRNGKey(i))
            fence(metrics)
        dt = (time.perf_counter() - t0) / REPS * 1e3
        print(f"train step: {dt:.2f} ms/step (batch {B})", flush=True)


if __name__ == "__main__":
    main()
