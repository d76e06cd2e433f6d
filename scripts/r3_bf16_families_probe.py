"""bf16 recommended-config coverage for the NON-flagship families (round 3).

The bf16 feature-compute config (fp32 params/Adam/LM-solve) is measured
recall-neutral and is the recommended production training config for the
flagship (PERF.md round-2 study, round-3 decomposition) — but G2SP and
Ford only have fp32 train numbers (24.4 / 37.7 fps).  This probe fills
the table: bf16 train + eval for both families, plus fp32 sanity repeats,
using bench.py's own timing helpers (one definition of the protocol).

One TPU process.  Usage: python scripts/r3_bf16_families_probe.py
"""

import dataclasses

import numpy as np

import bench
from highlyaccurate_tpu.config import Config


def main():
    import jax
    assert any(d.platform != "cpu" for d in jax.devices()), "run on the TPU"
    batch = 8
    cfg = Config(level=3, N_iters=5)                      # reference defaults
    bf16 = dataclasses.replace(cfg, compute_dtype="bfloat16")

    k = np.broadcast_to(
        np.array([[582.9802, 0.0, 496.2420],
                  [0.0, 482.7076, 125.0034],
                  [0.0, 0.0, 1.0]], np.float32), (batch, 3, 3)).copy()

    from highlyaccurate_tpu.geometry import ford as fgeom
    from highlyaccurate_tpu.models.ford import LMS2GPFord
    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
    R = np.broadcast_to(np.asarray(fgeom.qvec2rotmat(
        [0.997, 0.01, 0.05, 0.02]), np.float32), (batch, 3, 3)).copy()
    T = np.broadcast_to(np.array([1.0, 0.5, -1.4], np.float32),
                        (batch, 3)).copy()
    side = cfg.sat_size * 0.22

    g2sp_bf16 = dataclasses.replace(bf16, direction="G2SP", remat=1)
    g2sp_fp32 = dataclasses.replace(cfg, direction="G2SP", remat=1)

    fps = bench._bench_train_step(g2sp_bf16, batch, model_cls=LMG2SP,
                                  extra=(k,))
    print(f"g2sp_bf16_train_fps: {fps:.2f}", flush=True)
    fps = bench._bench_train_step(dataclasses.replace(bf16), batch,
                                  model_cls=LMS2GPFord, extra=(R, T),
                                  ford_side_m=side)
    print(f"ford_bf16_train_fps: {fps:.2f}", flush=True)

    fps = bench._bench_eval_fps(LMG2SP, dataclasses.replace(
        bf16, direction="G2SP"), batch, 10, extra_init=(k,))
    print(f"g2sp_bf16_eval_fps: {fps:.2f}", flush=True)
    fps = bench._bench_ford_eval(bf16, batch, 10)
    print(f"ford_bf16_eval_fps: {fps:.2f}", flush=True)

    # fp32 sanity repeats (regression guards vs the PERF.md round-3 log)
    fps = bench._bench_train_step(g2sp_fp32, batch, model_cls=LMG2SP,
                                  extra=(k,))
    print(f"g2sp_fp32_train_fps (expect ~24): {fps:.2f}", flush=True)
    fps = bench._bench_train_step(cfg, batch, model_cls=LMS2GPFord,
                                  extra=(R, T), ford_side_m=side)
    print(f"ford_fp32_train_fps (expect ~38): {fps:.2f}", flush=True)


if __name__ == "__main__":
    main()
