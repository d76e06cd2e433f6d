"""Round-5 train lever: bf16 train at batch 12/16 (per-frame throughput).

Round-3 measured NEGATIVE batch-16 scaling in fp32 (543.8 ms = 29.4 fps vs
34.2 at b8) and attributed it to the ~1.2 GB of per-round solver residuals
crossing an XLA scheduling threshold.  bf16 feature compute halves the
residual working set, so the b16 regime was never measured under the
production bf16 config — this probe closes that.  Baselines (uc64 tree):
bf16 train b8 45.7-46.05 fps.

Run: python scripts/r5_train_b16_probe.py
"""

import dataclasses
import sys

sys.path.insert(0, ".")


def main():
    import jax

    print(f"devices: {jax.devices()}", flush=True)

    import bench
    from highlyaccurate_tpu.config import Config

    cfg0 = Config(level=3, N_iters=5, compute_dtype="bfloat16")

    def run_case(name, fn):
        try:
            v = fn()
            print(f"RESULT {name} {v:.2f}", flush=True)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}",
                  flush=True)

    run_case("bf16_train_b8_guard_fps",
             lambda: bench._bench_train_step(cfg0, 8))
    for b in (12, 16):
        cfg = dataclasses.replace(cfg0)
        run_case(f"bf16_train_b{b}_fps",
                 lambda: bench._bench_train_step(cfg, b))


if __name__ == "__main__":
    main()
