"""Round-5: batch-1 latency regression A/B — u-windows at B=1.

The adopted-tree bench re-seed measured batch1 11.5 ms (was 9.73) and
tracking_warm2 15.01 ms (was 8.16) while every batched metric improved.
Hypothesis: the per-(line, block) chunk-loop overhead (window min/max +
per-chunk coordinate recompute + chunked ref-RMW) is fixed per program
and dominates at B=1 where the kernels are launch/VPU-build bound.
A/B: uc=0 vs auto(128) on the two batch-1 programs.

Run: python scripts/r5_b1_uwin_probe.py
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

    def run_case(name, fn):
        try:
            v = fn()
            print(f"RESULT {name} {v:.2f}", flush=True)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}",
                  flush=True)

    # bench protocol: batch1/tracking extras run FP32 (bench.py:250,304-310)
    for uc, tag in ((0, "uc0"), (-1, "auto128")):
        cfg = dataclasses.replace(Config(level=3, N_iters=5),
                                  banded_u_chunk=uc)
        run_case(f"batch1_latency_ms_{tag}",
                 lambda: 1e3 / bench._bench_eval_fps(LMS2GP, cfg, 1, 30))
        run_case(f"tracking_warm2_ms_{tag}",
                 lambda: 1e3 / bench._bench_eval_fps(
                     LMS2GP, dataclasses.replace(cfg, N_iters=2), 1, 30,
                     warm=True))


if __name__ == "__main__":
    main()
