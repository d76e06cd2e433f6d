"""Round-4 fused weight-matrix build probe (_row_weight_mats4).

The per-row banded weight builds computed 8 one-hot ``rel`` comparisons
per (line, column-block) program (2 per bilinear row r=0..3); rows r and
r+1 share (rel == r), so 5 distinct comparisons suffice, and the backward
/ eval paths discard the d2/dxdy matrix whose product can be skipped
outright.  Bit-identical arithmetic (unit-checked + interpret parity
suite).

Also re-guards the G2SP eval default now that g2sp_pixel_moments
defaults OFF (the pixmom A/B measured it 27% slower,
scripts/r4_pixmom_probe.py).

Baselines (post-unshear4 + pixmom-in-tree, /tmp/r4b_un4.log and
/tmp/r4c_pixmom.log):

  flagship_bf16_b32      154.9-158.5    bf16_train         49.9
  g2sp_train_bf16        32.7           g2sp_train_fp32    27.9
  g2sp_eval_bf16_b8      106.6 (pixmom0)
  ford_eval_bf16         138.2-146.7
"""

import dataclasses
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from bench import (_bench_eval_fps, _bench_ford_eval, _bench_train_step,
                       _flagship_cfg)
    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

    print(f"devices: {jax.devices()}", flush=True)
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    batch, cfg = _flagship_cfg(on_tpu)  # bf16 production eval config
    n = 10 if on_tpu else 2
    k8 = np.broadcast_to(
        np.array([[582.9802, 0.0, 496.2420],
                  [0.0, 482.7076, 125.0034],
                  [0.0, 0.0, 1.0]], np.float32), (batch, 3, 3)).copy()

    g2sp = dataclasses.replace(cfg, direction="G2SP")
    g2sp_f32 = dataclasses.replace(g2sp, compute_dtype="float32")
    runs = [
        ("flagship_bf16_b32_wm4", lambda: _bench_eval_fps(
            LMS2GP, cfg, 32, n)),
        ("bf16_train_wm4", lambda: _bench_train_step(cfg, batch)),
        ("g2sp_train_bf16_wm4", lambda: _bench_train_step(
            dataclasses.replace(g2sp, remat=1), batch, model_cls=LMG2SP,
            extra=(k8,))),
        ("g2sp_train_fp32_wm4", lambda: _bench_train_step(
            dataclasses.replace(g2sp_f32, remat=1), batch, model_cls=LMG2SP,
            extra=(k8,))),
        ("g2sp_eval_bf16_b8_wm4", lambda: _bench_eval_fps(
            LMG2SP, g2sp, batch, n, extra_init=(k8,))),
        ("ford_eval_bf16_wm4", lambda: _bench_ford_eval(cfg, batch, n)),
    ]
    for name, fn in runs:
        try:
            v = fn()
            print(f"RESULT {name} {v:.2f} fps", flush=True)
        except Exception as e:
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
