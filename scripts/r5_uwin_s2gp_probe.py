"""Round-5 A/B: dynamic u-windows in the S2GP/Ford banded kernels.

Real-geometry window stats (scripts/r5_s2gp_window_stats.py) show the
UC-aligned live window covers 0.63-0.82 of the sample rows a hit block
builds, and the isolation probe shows these kernels VPU-build-bound —
expected kernel cut ~15-30% where the projline port saw ~0.

Baselines (uc=0) are the same-protocol bench-seed numbers measured this
morning at commit 5554882 (PERF.md round-5 table): bf16_b8_eval 152.72,
flagship b32 157.99, train fp32 36.14, bf16_train 46.05, ford_eval 135.07,
batch1 9.73 ms.  One uc=0 guard re-measures bf16_b8_eval for
comparability; everything else runs uc=64 only.

Run: python scripts/r5_uwin_s2gp_probe.py
"""

import dataclasses
import sys

sys.path.insert(0, ".")

import numpy as np

from scripts.r5_train_probe import timeit


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    # ---- 1: kernel-only S2GP L2, real-ish geometry, base vs uc64 ----
    from highlyaccurate_tpu.ops.pallas.banded_warp import (
        default_rb, make_banded_moments, make_banded_sampler)

    B, A, C, V, W = 8, 256, 64, 64, 512
    RB = default_rb(A)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, V, W, C).astype(np.float32))
    mask = jnp.asarray((rng.rand(V, W) > 0.05).astype(np.float32))
    # lines spanning most of the map width (the stats regime: every block
    # hit with a partial window)
    ax = rng.uniform(0, A * 0.3, (B, V))
    bx = rng.uniform(0.3, 0.55, (B, V)) * rng.choice([-1, 1], (B, V))
    ax = np.where(bx < 0, A - 1 - ax, ax)
    ay = rng.uniform(A * 0.2, A * 0.8, (B, V))
    by = bx * rng.uniform(-0.2, 0.2, (B, V))
    uv0 = jnp.asarray(np.stack([ax, ay], -1).astype(np.float32))
    uv1 = jnp.asarray(np.stack([ax + bx, ay + by], -1).astype(np.float32))

    sums = {}
    for uc in (0, 64):
        s = make_banded_sampler(A=A, C=C, V=V, W=W, RB=RB, bf16_map=True,
                                interpret=jax.default_backend() != "tpu",
                                u_chunk=uc)

        @jax.jit
        def run(sat, uv0, uv1, c):
            o, dx, dy = s(sat + c * 1e-38, uv0, uv1)
            return (jnp.sum(o) * 1e-20 + c,
                    jnp.sum(jnp.abs(o)) + jnp.sum(jnp.abs(dx))
                    + jnp.sum(jnp.abs(dy)))

        c, asum = run(sat, uv0, uv1, jnp.zeros(()))
        np.asarray(c)
        sums[f"fwd{uc}"] = float(asum)
        timeit(f"s2gp_L2_fwd_uc{uc}", lambda cc: run(sat, uv0, uv1, cc)[0],
               n=20)

        m = make_banded_moments(A=A, C=C, V=V, W=W, RB=RB, bf16_map=True,
                                interpret=jax.default_backend() != "tpu",
                                u_chunk=uc)

        @jax.jit
        def runm(sat, grd, uv0, uv1, c):
            mm = m(sat + c * 1e-38, grd, mask, uv0, uv1)
            return jnp.sum(mm) * 1e-20 + c, jnp.sum(jnp.abs(mm))

        c, msum = runm(sat, grd, uv0, uv1, jnp.zeros(()))
        np.asarray(c)
        sums[f"mom{uc}"] = float(msum)
        timeit(f"s2gp_L2_mom_uc{uc}",
               lambda cc: runm(sat, grd, uv0, uv1, cc)[0], n=20)

        # train-side: fwd+VJP through the differentiable sampler
        @jax.jit
        def rung(sat, uv0, uv1, c):
            def lf(sat, uv0, uv1):
                o, dx, dy = s(sat + c * 1e-38, uv0, uv1)
                return jnp.sum(o ** 2) + jnp.sum(dx * dy)
            l, g = jax.value_and_grad(lf, argnums=(0, 1, 2))(sat, uv0, uv1)
            return (c + l * 1e-20
                    + sum(jnp.sum(x ** 2) for x in g) * 1e-30)

        timeit(f"s2gp_L2_fwdbwd_uc{uc}",
               lambda cc: rung(sat, uv0, uv1, cc), n=10)

    for k in ("fwd", "mom"):
        d = abs(sums[f"{k}64"] - sums[f"{k}0"])
        print(f"RESULT s2gp_{k}_sumdelta {d:.3e} (base {sums[f'{k}0']:.6e};"
              " 0 => bit-identical on TPU)", flush=True)

    # ---- 2: end-to-end at the bench protocol, uc=64 (+ one uc=0 guard) ----
    import bench
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

    batch, n = 8, 10
    cfg0 = Config(level=3, N_iters=5)

    def run_case(name, fn):
        try:
            v = fn()
            print(f"RESULT {name} {v:.2f}", flush=True)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}",
                  flush=True)

    cfg_b = dataclasses.replace(cfg0, compute_dtype="bfloat16")
    run_case("bf16_b8_eval_uc0_guard_fps", lambda: bench._bench_eval_fps(
        LMS2GP, cfg_b, batch, 3 * n))
    for uc in (64,):
        cfg = dataclasses.replace(cfg0, banded_u_chunk=uc)
        cfgb = dataclasses.replace(cfg, compute_dtype="bfloat16")
        run_case(f"bf16_b8_eval_uc{uc}_fps", lambda: bench._bench_eval_fps(
            LMS2GP, cfgb, batch, 3 * n))
        run_case(f"flagship_b32_uc{uc}_fps", lambda: bench._bench_eval_fps(
            LMS2GP, cfgb, 32, n))
        run_case(f"train_fp32_uc{uc}_fps", lambda: bench._bench_train_step(
            cfg, batch))
        run_case(f"bf16_train_uc{uc}_fps", lambda: bench._bench_train_step(
            cfgb, batch))
        run_case(f"ford_eval_uc{uc}_fps", lambda: bench._bench_ford_eval(
            cfg, batch, n))


if __name__ == "__main__":
    main()
