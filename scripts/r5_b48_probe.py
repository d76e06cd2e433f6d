"""Round-5: flagship eval batch sweep re-check at the uc=128 tree.

The round-4 sweep picked batch 32 (130.6 fps; 64 OOMs).  The solver got
~25% faster since (shear4 + pool + u-windows), so the saturation point
may have moved: re-check b32 and probe b48 (b64 known RESOURCE_EXHAUSTED,
unchanged by u-windows which add no arrays).

Run: python scripts/r5_b48_probe.py
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

    cfgb = Config(level=3, N_iters=5, compute_dtype="bfloat16")

    def run_case(name, fn):
        try:
            v = fn()
            print(f"RESULT {name} {v:.2f}", flush=True)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}",
                  flush=True)

    run_case("flagship_b32_guard_fps",
             lambda: bench._bench_eval_fps(LMS2GP, cfgb, 32, 10))
    run_case("flagship_b48_fps",
             lambda: bench._bench_eval_fps(LMS2GP, cfgb, 48, 7))


if __name__ == "__main__":
    main()
