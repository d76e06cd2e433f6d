"""Round-4 fused pixel-moments probe (make_projline_pixmom) — one bundled
TPU process.

The G2SP eval banded path wrote (out, dx, dy) [B, A, A, C] f32 x3 to HBM
per solver round and contracted them to H/g in a separate XLA pass
(lm_update_implicit_pixel).  The pixmom kernel does the five per-pixel
channel contractions in-kernel and emits [B, V, W, 16] moment lanes
instead (PIXMOM_IDX; lm_update_pixel_moments assembles H/g from them).
Eval-only; train keeps the differentiable sampler.

A/B on the same process (use_fused_moments 1 vs 0), plus regression
guards.  Pre-change baselines (/tmp/r4b_un4.log, post-unshear4 tree):
g2sp_eval_bf16_b8 ~104.5 fps, flagship b32 ~157.6 fps.
"""

import dataclasses
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax

    from bench import _bench_eval_fps, _flagship_cfg
    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

    print(f"devices: {jax.devices()}", flush=True)
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    batch, cfg = _flagship_cfg(on_tpu)
    n = 10 if on_tpu else 2
    k8 = np.broadcast_to(
        np.array([[582.9802, 0.0, 496.2420],
                  [0.0, 482.7076, 125.0034],
                  [0.0, 0.0, 1.0]], np.float32), (batch, 3, 3)).copy()

    g2sp = dataclasses.replace(cfg, direction="G2SP")
    g2sp_f32 = dataclasses.replace(g2sp, compute_dtype="float32")
    runs = [
        # measured 2026-08-19: pixmom1 77.8 vs pixmom0 106.6 fps -> the
        # pixmom path REGRESSES G2SP eval 27%; default is now
        # g2sp_pixel_moments=0 (config.py)
        ("g2sp_eval_bf16_pixmom1", lambda: _bench_eval_fps(
            LMG2SP, dataclasses.replace(g2sp, g2sp_pixel_moments=1),
            batch, n, extra_init=(k8,))),
        ("g2sp_eval_bf16_pixmom0", lambda: _bench_eval_fps(
            LMG2SP, dataclasses.replace(g2sp, g2sp_pixel_moments=0),
            batch, n, extra_init=(k8,))),
        ("g2sp_eval_fp32_pixmom1", lambda: _bench_eval_fps(
            LMG2SP, g2sp_f32, batch, n, extra_init=(k8,))),
        ("flagship_bf16_b32_guard", lambda: _bench_eval_fps(
            LMS2GP, cfg, 32, n)),
        # batch sweep refresh: the shear fusion cut the solver share ~20%,
        # which may move the eval saturation point past b32
        ("flagship_bf16_b64", lambda: _bench_eval_fps(
            LMS2GP, cfg, 64, max(n // 2, 2))),
    ]
    for name, fn in runs:
        try:
            v = fn()
            print(f"RESULT {name} {v:.2f} fps", flush=True)
        except Exception as e:
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
