"""Round-5 follow-up: u-chunk sweep for the S2GP/Ford eval paths.

The uc=64 A/B (scripts/r5_uwin_s2gp_probe.py) measured on TPU v5e:
bf16_b8_eval 152.98 -> 160.12 (+4.7%), flagship b32 157.99 -> 161.46,
ford_eval 135.07 -> 138.25, train flat.  This sweep picks the chunk size:
uc in {32, 128} on the three eval cases.

Run: python scripts/r5_uwin_s2gp_sweep.py
"""

import dataclasses
import sys

sys.path.insert(0, ".")


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)

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

    for uc in (32, 128):
        cfg = dataclasses.replace(cfg0, banded_u_chunk=uc)
        cfgb = dataclasses.replace(cfg, compute_dtype="bfloat16")
        run_case(f"bf16_b8_eval_uc{uc}_fps", lambda: bench._bench_eval_fps(
            LMS2GP, cfgb, batch, 3 * n))
        run_case(f"flagship_b32_uc{uc}_fps", lambda: bench._bench_eval_fps(
            LMS2GP, cfgb, 32, n))
        run_case(f"ford_eval_uc{uc}_fps", lambda: bench._bench_ford_eval(
            cfg, batch, n))


if __name__ == "__main__":
    main()
