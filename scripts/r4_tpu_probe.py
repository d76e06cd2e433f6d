"""Round-4 TPU probe: G2SP static grid restriction on/off + regression guards.

One process, one run (remote compile helper is slow — bundle everything):
  1. G2SP eval fps, restrict=1 vs restrict=0  (VERDICT r3 #2: target >=100)
  2. G2SP train fps (remat), restrict=1 vs 0  (target >=35 fp32, from 24.5)
  3. flagship bf16 eval (production default)  (regression guard ~124.6)
  4. flagship fp32 banded eval                (regression guard ~116.5)

Protocol identical to bench.py (batch 8, reference defaults, fetch-fenced).
"""

import dataclasses
import sys

sys.path.insert(0, ".")  # repo root (bench.py measurement functions)

import numpy as np

from bench import _bench_eval_fps, _bench_train_step, _flagship_cfg
from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP


def main():
    import jax
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    print(f"devices: {jax.devices()} on_tpu={on_tpu}", flush=True)
    batch, cfg_bf16 = _flagship_cfg(on_tpu)
    cfg = dataclasses.replace(cfg_bf16, compute_dtype="float32")
    n = 10 if on_tpu else 2
    k = np.broadcast_to(
        np.array([[582.9802, 0.0, 496.2420],
                  [0.0, 482.7076, 125.0034],
                  [0.0, 0.0, 1.0]], np.float32), (batch, 3, 3)).copy()

    g2sp1 = dataclasses.replace(cfg, direction="G2SP", g2sp_restrict_grid=1)
    g2sp0 = dataclasses.replace(cfg, direction="G2SP", g2sp_restrict_grid=0)

    for name, fn in [
        ("g2sp_eval_restrict1", lambda: _bench_eval_fps(
            LMG2SP, g2sp1, batch, n, extra_init=(k,))),
        ("g2sp_eval_restrict0", lambda: _bench_eval_fps(
            LMG2SP, g2sp0, batch, n, extra_init=(k,))),
        ("g2sp_train_restrict1", lambda: _bench_train_step(
            dataclasses.replace(g2sp1, remat=1), batch, model_cls=LMG2SP,
            extra=(k,))),
        ("g2sp_train_restrict0", lambda: _bench_train_step(
            dataclasses.replace(g2sp0, remat=1), batch, model_cls=LMG2SP,
            extra=(k,))),
        ("flagship_bf16_eval", lambda: _bench_eval_fps(
            LMS2GP, cfg_bf16, batch, n)),
        ("flagship_fp32_eval", lambda: _bench_eval_fps(
            LMS2GP, cfg, batch, n)),
    ]:
        try:
            v = fn()
            print(f"RESULT {name} {v:.2f} fps", flush=True)
        except Exception as e:  # keep probing the rest
            print(f"RESULT {name} FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
