"""Stage-A TPU bench: restricted-scan full-map banded kernel + bf16 map.

Measures per-level kernel-only time with the map in fp32 vs bf16 (bf16
halves VMEM so the finest level rides DMA-free in VMEM), plus full eval and
train step at the new defaults (banded_bf16_map=1).

Protocol: scalar-fetch fences (see scripts/r2_profile.py docstring).
Usage: python scripts/r2b_fullmap_bench.py [--train]
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
    slots = level_slots(cfg)

    # --- kernel-only per level, fp32 vs bf16 map ---
    for bf16 in (False, True):
        for lvl, slot in enumerate(slots):
            h, w = _level_hw(cfg, slot)
            A = cfg.sat_size // (2 ** (3 - slot))
            C = SLOT_CHANNELS[slot]
            V_, W_ = h // 2, w
            RB = default_rb(A)
            sampler = make_banded_sampler(A=A, C=C, V=V_, W=W_, RB=RB,
                                          bf16_map=bf16, interpret=False)
            satf = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
            ay = rng.uniform(2, A - 2, (B, V_))
            bx = (A - 4.0) / W_
            uv0 = jnp.asarray(np.stack([np.full((B, V_), 2.0), ay], -1)
                              .astype(np.float32))
            uv1 = jnp.asarray(np.stack([np.full((B, V_), 2.0 + bx),
                                        ay + bx * 0.2], -1).astype(np.float32))
            bench(f"L{lvl} kernel-only bf16={int(bf16)} "
                  f"(A={A} C={C} V={V_} W={W_} RB={RB})",
                  sampler, satf, uv0, uv1)

    # --- full eval at new defaults (banded_bf16_map=1) ---
    model = LMS2GP(cfg=cfg)
    sat = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
    gt = jnp.zeros((B, 3))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd, gt, mode="train")
    params = v["params"]

    dt = bench("full eval (banded_bf16_map=1)", lambda p, s, g, k: model.apply(
        {"params": p}, s, g, mode="test", rngs={"lm": k}),
        params, sat, grd, jax.random.PRNGKey(0))
    print(f"  -> {B / dt * 1e3:.1f} frames/sec/chip", flush=True)

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
              f"{B / dt * 1e3:.1f} fps  loss={float(metrics['loss']):.4f}",
              flush=True)


if __name__ == "__main__":
    main()
