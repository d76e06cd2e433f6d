"""Round-3 probe: G2SP and Ford TRAINING throughput at the bench config.

These two paths gained bench extras this round (g2sp_train_fps /
ford_train_fps); measure them on the real chip before the driver does.
Run: python scripts/r3_train_probe.py   (TPU via axon tunnel)
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from highlyaccurate_tpu.config import Config  # noqa: E402
from highlyaccurate_tpu.models.ford import LMS2GPFord  # noqa: E402
from highlyaccurate_tpu.models.lm_g2sp import LMG2SP  # noqa: E402
from highlyaccurate_tpu.geometry import ford as fgeom  # noqa: E402


def main():
    import jax
    print("devices:", jax.devices())
    batch = 8
    cfg = Config(level=3, N_iters=5)

    k = np.broadcast_to(
        np.array([[582.9802, 0.0, 496.2420],
                  [0.0, 482.7076, 125.0034],
                  [0.0, 0.0, 1.0]], np.float32), (batch, 3, 3)).copy()
    R = np.broadcast_to(np.asarray(fgeom.qvec2rotmat(
        [0.997, 0.01, 0.05, 0.02]), np.float32), (batch, 3, 3)).copy()
    T = np.broadcast_to(np.array([1.0, 0.5, -1.4], np.float32),
                        (batch, 3)).copy()

    import dataclasses
    for name, fn in [
        ("ford_train_fp32", lambda: bench._bench_train_step(
            cfg, batch, model_cls=LMS2GPFord, extra=(R, T),
            ford_side_m=cfg.sat_size * 0.22)),
        ("ford_train_bf16", lambda: bench._bench_train_step(
            dataclasses.replace(cfg, compute_dtype="bfloat16"), batch,
            model_cls=LMS2GPFord, extra=(R, T),
            ford_side_m=cfg.sat_size * 0.22)),
        ("g2sp_train_fp32_remat", lambda: bench._bench_train_step(
            dataclasses.replace(cfg, direction="G2SP", remat=1), batch,
            model_cls=LMG2SP, extra=(k,))),
        ("g2sp_train_fp32_remat_b4", lambda: bench._bench_train_step(
            dataclasses.replace(cfg, direction="G2SP", remat=1), 4,
            model_cls=LMG2SP, extra=(k[:4],))),
    ]:
        try:
            fps = fn()
            print(f"{name}: {fps:.2f} fps ({1e3 * batch / fps:.1f} ms/step)",
                  flush=True)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
