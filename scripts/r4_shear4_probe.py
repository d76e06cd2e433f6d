"""Round-4 fused-shear-scan probe (_shear_rows4) — one bundled TPU process.

The banded kernels' shear scans read every VMEM chunk and build its row
iota FOUR times (once per bilinear row r=0..3); the round-4 decomposition
showed the kernels are VPU-bound after the bf16-mm study proved the MXU
share already runs at bf16 rate.  _shear_rows4 extracts all four sheared
rows in ONE chunk pass with bit-identical per-row accumulation order
(16/16 interpret-mode parity tests green).

Measures the same production configs as scripts/r4_mm_bf16_probe.py so the
numbers compare directly against /tmp/r4_mm_probe.log (pre-change,
commit af452d3):

  flagship_bf16_b32   130.30 fps       bf16_train    46.71 fps
  g2sp_eval_bf16_b8    86.91 fps       g2sp_train    28.64 fps
  ford_eval_bf16      123.73 fps
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
    runs = [
        ("flagship_bf16_b32_sh4", lambda: _bench_eval_fps(
            LMS2GP, cfg, 32, n)),
        ("bf16_train_sh4", lambda: _bench_train_step(cfg, batch)),
        ("g2sp_eval_bf16_b8_sh4", lambda: _bench_eval_fps(
            LMG2SP, g2sp, batch, n, extra_init=(k8,))),
        ("g2sp_train_bf16_sh4", lambda: _bench_train_step(
            dataclasses.replace(g2sp, remat=1), batch, model_cls=LMG2SP,
            extra=(k8,))),
        ("ford_eval_bf16_sh4", lambda: _bench_ford_eval(cfg, batch, n)),
    ]
    for name, fn in runs:
        try:
            v = fn()
            print(f"RESULT {name} {v:.2f} fps", flush=True)
        except Exception as e:
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
