"""Round-5 A/B: dynamic u-windows in the blocked projline kernel (G2SP).

The r5 isolation probe measured the blocked kernels VPU-build-bound with
the banded matmuls fully hidden under the weight build, so cutting build
rows per (line, column-block) is the remaining schedule lever (VERDICT r4
#4's named successor).  This probe measures, in one TPU process:

  1. the corrected isolation variants (uwin static / udyn dynamic offsets)
     that failed to lower in the first run (dynamic_update_slice -> ref
     stores);
  2. kernel-only projline L2 geometry, base vs u_chunk=64/32, with
     bit-parity sums;
  3. G2SP end-to-end eval (fp32 + bf16) and train (fp32 remat) fps at the
     bench protocol, u_chunk 0 vs 64.

Run: python scripts/r5_uwin_probe.py
"""

import dataclasses
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from scripts.r5_train_probe import run_isolation, timeit


def main():
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    # ---- 1: corrected isolation variants ----
    run_isolation("s2gpL2", B=8, V=64, W=512, NC=128, C=64, NBLK=2)
    run_isolation("projL2", B=8, V=210, W=256, NC=128, C=64, NBLK=4)

    # ---- 2: kernel-only projline L2, real-ish geometry ----
    from highlyaccurate_tpu.ops.pallas.banded_warp import (
        make_projline_sampler, pack_projline_coefs)

    B, AY, AX, C, V, W = 8, 128, 512, 64, 210, 256
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, AY, AX, C).astype(np.float32))
    x0 = rng.uniform(2, AX - 300, (B, V))
    y0 = rng.uniform(20, AY - 40, (B, V))
    sl = rng.uniform(-0.12, 0.12, (B, V))
    step = rng.uniform(0.5, 1.0, (B, V))
    d0 = rng.uniform(0.8, 1.6, (B, V))
    dd = rng.uniform(-0.0005, 0.0005, (B, V))
    h0 = np.stack([x0 * d0, y0 * d0, d0], -1).astype(np.float32)
    h1x = (x0 + step * (W - 1)) * (d0 + dd * (W - 1))
    h1y = (y0 + sl * step * (W - 1)) * (d0 + dd * (W - 1))
    h1 = np.stack([h1x, h1y, d0 + dd * (W - 1)], -1).astype(np.float32)
    dh = (jnp.asarray(h1) - jnp.asarray(h0)) / (W - 1)
    coefs = pack_projline_coefs(jnp.asarray(h0), dh, AY, AX, AY, W)

    sums = {}
    for uc in (0, 64, 32):
        s = make_projline_sampler(AY=AY, AX=AX, C=C, V=V, W=W,
                                  interpret=jax.default_backend() != "tpu",
                                  u_chunk=uc)

        @jax.jit
        def run(img, coefs, c):
            o, dx, dy = s(img + c * 1e-38, coefs)
            return (jnp.sum(o) * 1e-20 + jnp.sum(dx) * 1e-20
                    + jnp.sum(dy) * 1e-20 + c,
                    jnp.sum(jnp.abs(o)) + jnp.sum(jnp.abs(dx))
                    + jnp.sum(jnp.abs(dy)))

        c, asum = run(img, coefs, jnp.zeros(()))
        np.asarray(c)
        sums[uc] = float(asum)
        timeit(f"projline_L2_uc{uc}",
               lambda cc: run(img, coefs, cc)[0], n=20)
    for uc in (64, 32):
        d = abs(sums[uc] - sums[0])
        print(f"RESULT projline_uc{uc}_sumdelta {d:.3e} "
              f"(base {sums[0]:.6e}; 0 => bit-identical on TPU)", flush=True)

    # ---- 3: G2SP end-to-end, bench protocol ----
    import bench
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP

    batch, n = 8, 10
    k = np.broadcast_to(
        np.array([[582.9802, 0.0, 496.2420],
                  [0.0, 482.7076, 125.0034],
                  [0.0, 0.0, 1.0]], np.float32), (batch, 3, 3)).copy()

    for uc in (0, 64):
        cfg = Config(level=3, N_iters=5, direction="G2SP",
                     banded_u_chunk=uc)
        cfg_bf16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
        for name, fn in [
            (f"g2sp_eval_fp32_uc{uc}", lambda: bench._bench_eval_fps(
                LMG2SP, cfg, batch, n, extra_init=(k,))),
            (f"g2sp_eval_bf16_uc{uc}", lambda: bench._bench_eval_fps(
                LMG2SP, cfg_bf16, batch, n, extra_init=(k,))),
            (f"g2sp_train_fp32_remat_uc{uc}", lambda: bench._bench_train_step(
                dataclasses.replace(cfg, remat=1), batch,
                model_cls=LMG2SP, extra=(k,))),
        ]:
            try:
                fps = fn()
                print(f"RESULT {name} {fps:.2f} fps", flush=True)
            except Exception as e:
                import traceback
                traceback.print_exc()
                print(f"RESULT {name} FAILED {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
