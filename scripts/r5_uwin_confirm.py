"""Round-5 u-chunk confirm: repeats at the contenders + a uc=256 point.

Sweep results (scripts/r5_uwin_s2gp_sweep.py + r5_uwin_s2gp_probe.py):
S2GP flagship b32 157.99(uc0) / 155.54(32) / 161.46(64) / 163.99(128);
ford_eval 135.07(0) / 132.35(32) / 138.25(64) / 134.24(128).  The 64-vs-128
gaps are inside the ~3% run-to-run band — this confirms with 2 repeats
each and adds uc=256 (W/2 at L2, whole-row at L0/L1) for S2GP.

Run: python scripts/r5_uwin_confirm.py
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

    n = 10
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

    for rep in (1, 2):
        for uc in (64, 128, 256):
            cfg = dataclasses.replace(cfg0, banded_u_chunk=uc)
            cfgb = dataclasses.replace(cfg, compute_dtype="bfloat16")
            run_case(f"flagship_b32_uc{uc}_rep{rep}_fps",
                     lambda: bench._bench_eval_fps(LMS2GP, cfgb, 32, n))
            if uc != 256:
                run_case(f"ford_eval_uc{uc}_rep{rep}_fps",
                         lambda: bench._bench_ford_eval(cfg, 8, n))


if __name__ == "__main__":
    main()
