"""bf16-compute training: speed + convergence check vs fp32.

Mixed precision the standard way (fp32 params + Adam state, bfloat16
feature compute; the LM solve is always fp32 — CLAUDE.md convention).
Trains both dtypes for --steps on the same geometry-consistent synthetic
stream (scripts/r2_recall_study.py generator) and prints the loss curves
and step times side by side.  A matching curve = bf16 train is safe to
offer as a documented speed option.

Usage: python scripts/r2_bf16_train_check.py [--steps 300]
"""

import argparse
import dataclasses
import time

import jax
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, "scripts")
    from r2_recall_study import make_generator, B

    from highlyaccurate_tpu.train import step as step_lib
    from highlyaccurate_tpu.train.state import create_train_state

    base = Config(level=3, N_iters=5, lr=2e-4)
    gen = make_generator(base)

    for name, cfg in [("fp32", base),
                      ("bf16", dataclasses.replace(
                          base, compute_dtype="bfloat16"))]:
        model = LMS2GP(cfg=cfg)
        sat, grd, gt = gen(jax.random.PRNGKey(0))
        v = model.init({"params": jax.random.PRNGKey(0),
                        "lm": jax.random.PRNGKey(1)}, sat, grd, gt,
                       mode="train")
        state = create_train_state(cfg, v["params"])
        ts = step_lib.make_train_step(model, cfg, mesh=None)
        state, m = ts(state, sat, grd, gt, jax.random.PRNGKey(0))
        np.asarray(m["loss"])  # compile fence
        losses = []
        t0 = time.perf_counter()
        for i in range(args.steps):
            sat, grd, gt = gen(jax.random.fold_in(jax.random.PRNGKey(42), i))
            state, m = ts(state, sat, grd, gt, jax.random.PRNGKey(i))
            if i % 50 == 0 or i == args.steps - 1:
                losses.append((i, float(m["loss"])))
        np.asarray(m["loss"])
        dt = (time.perf_counter() - t0) / args.steps
        curve = "  ".join(f"{i}:{l:.1f}" for i, l in losses)
        print(f"[{name}] {dt*1e3:.1f} ms/step ({B/dt:.1f} fps)  loss {curve}",
              flush=True)


if __name__ == "__main__":
    main()
