"""Round-5: train-side A/B at the adoption candidate uc=128.

Eval picked uc=128 (flagship 164.3/164.3, ford 138.7 vs base 157.99/135.07
— scripts/r5_uwin_confirm.py); train was only measured at uc=64 (flat).
The banded_project dispatch feeds the SAME kernels to the train path, so
the default flip needs a train number at 128: S2GP fp32/bf16 + Ford fp32.
Baselines (uc0, round-5 seed): 36.14 / 46.05 / 36.18.

Run: python scripts/r5_uwin_train128_probe.py
"""

import dataclasses
import sys

sys.path.insert(0, ".")


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)

    import bench
    from highlyaccurate_tpu.config import Config

    cfg = dataclasses.replace(Config(level=3, N_iters=5),
                              banded_u_chunk=128)
    cfgb = dataclasses.replace(cfg, compute_dtype="bfloat16")

    def run_case(name, fn):
        try:
            v = fn()
            print(f"RESULT {name} {v:.2f}", flush=True)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}",
                  flush=True)

    run_case("train_fp32_uc128_fps", lambda: bench._bench_train_step(cfg, 8))
    run_case("bf16_train_uc128_fps", lambda: bench._bench_train_step(cfgb, 8))

    def ford_train_fps():
        import numpy as np

        from highlyaccurate_tpu.geometry import ford as fgeom
        from highlyaccurate_tpu.models.ford import LMS2GPFord
        batch = 8
        R = np.broadcast_to(np.asarray(fgeom.qvec2rotmat(
            [0.997, 0.01, 0.05, 0.02]), np.float32), (batch, 3, 3)).copy()
        T = np.broadcast_to(np.array([1.0, 0.5, -1.4], np.float32),
                            (batch, 3)).copy()
        return bench._bench_train_step(cfg, batch, model_cls=LMS2GPFord,
                                       extra=(R, T),
                                       ford_side_m=cfg.sat_size * 0.22)

    run_case("ford_train_uc128_fps", ford_train_fps)


if __name__ == "__main__":
    main()
