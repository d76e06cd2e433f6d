"""Round-4 fused backward un-shear scatter probe (_unshear_scatter4).

The backward banded kernels un-sheared each bilinear row r=0..3 with its
own chunk scan over the VMEM-resident gradient block — four read-modify-
write passes + four iota builds per (line, column-block) program, the
exact transpose of the forward inefficiency _shear_rows4 removed.
_unshear_scatter4 fuses the four one-hot scatters into ONE chunk pass
(the four rows land on disjoint absolute map rows per column, so summing
their updates before the single accumulate is exact; 23/23 interpret-mode
parity tests green).

Train configs are where the backward kernel runs; eval numbers are
regression guards.  Compare against /tmp/r4_shear4_tpu.log (working tree
at 4b9277e + possibly this change — this probe disambiguates):

  flagship_bf16_b32_sh4  158.45 fps    bf16_train_sh4        48.78 fps
  g2sp_eval_bf16_b8_sh4  104.54 fps    g2sp_train_bf16_sh4   31.72 fps
  ford_eval_bf16_sh4     146.71 fps

plus the fp32 series (pre-change: g2sp_train fp32 25.2, flagship fp32
110.7 — /tmp/r4_tpu_probe.log at c2618ee).
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
        ("flagship_bf16_b32_un4", lambda: _bench_eval_fps(
            LMS2GP, cfg, 32, n)),
        ("bf16_train_un4", lambda: _bench_train_step(cfg, batch)),
        ("g2sp_train_bf16_un4", lambda: _bench_train_step(
            dataclasses.replace(g2sp, remat=1), batch, model_cls=LMG2SP,
            extra=(k8,))),
        ("g2sp_train_fp32_un4", lambda: _bench_train_step(
            dataclasses.replace(g2sp_f32, remat=1), batch, model_cls=LMG2SP,
            extra=(k8,))),
        ("g2sp_eval_bf16_b8_un4", lambda: _bench_eval_fps(
            LMG2SP, g2sp, batch, n, extra_init=(k8,))),
        ("ford_eval_bf16_un4", lambda: _bench_ford_eval(cfg, batch, n)),
    ]
    for name, fn in runs:
        try:
            v = fn()
            print(f"RESULT {name} {v:.2f} fps", flush=True)
        except Exception as e:
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
