"""Round-4 bf16-MXU-matmul probe (banded_bf16_mm) — one bundled TPU process.

The banded kernels' weight x sheared-row contractions ran in fp32 on an MXU
whose native rate is bf16 (PERF.md round-4 decomposition: the projline
kernel is ~57% of G2SP eval, roughly half of it MXU matmuls; the S2GP
fused-moment/banded kernels share the structure).  banded_bf16_mm=-1 now
auto-enables bf16 matmuls under bf16 feature compute.  Measures the
production (bf16) configs with the flag auto-ON vs forced OFF:

  flagship eval b8 + b32, bf16 train, g2sp eval b8, g2sp train, ford eval

plus a pose-consistency guard (mm on vs off poses on identical inputs).
"""

import dataclasses
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

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
        ("flagship_bf16_b8_mm", lambda: _bench_eval_fps(
            LMS2GP, cfg, batch, n)),
        ("flagship_bf16_b32_mm", lambda: _bench_eval_fps(
            LMS2GP, cfg, 32, n)),
        ("bf16_train_mm", lambda: _bench_train_step(cfg, batch)),
        ("g2sp_eval_bf16_b8_mm", lambda: _bench_eval_fps(
            LMG2SP, g2sp, batch, n, extra_init=(k8,))),
        ("g2sp_train_bf16_mm", lambda: _bench_train_step(
            dataclasses.replace(g2sp, remat=1), batch, model_cls=LMG2SP,
            extra=(k8,))),
        ("ford_eval_bf16_mm", lambda: _bench_ford_eval(cfg, batch, n)),
    ]
    for name, fn in runs:
        try:
            v = fn()
            print(f"RESULT {name} {v:.2f} fps", flush=True)
        except Exception as e:
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}", flush=True)

    # pose-consistency guard: mm on vs off, identical inputs (flagship b2
    # to keep the extra compile small)
    try:
        rng = np.random.RandomState(0)
        B = 2
        sat = jnp.asarray(rng.rand(B, cfg.sat_size, cfg.sat_size, 3)
                          .astype(np.float32))
        grd = jnp.asarray(rng.rand(B, cfg.grd_h, cfg.grd_w, 3)
                          .astype(np.float32))
        outs = {}
        for mm in (1, 0):
            c = dataclasses.replace(cfg, banded_bf16_mm=mm)
            m = LMS2GP(cfg=c)
            v = m.init({"params": jax.random.PRNGKey(0),
                        "lm": jax.random.PRNGKey(1)}, sat, grd,
                       jnp.zeros((B, 3)), mode="train")
            lat, lon, th = jax.jit(
                lambda p, s, g, m=m: m.apply({"params": p}, s, g,
                                             mode="test",
                                             rngs={"lm": jax.random.PRNGKey(2)})
            )(v["params"], sat, grd)
            outs[mm] = np.stack([np.asarray(lat), np.asarray(lon),
                                 np.asarray(th)], -1)
        d = float(np.abs(outs[1] - outs[0]).max())
        print(f"RESULT mm_pose_maxdelta {d:.2e} (normalized pose units)",
              flush=True)
    except Exception as e:
        print(f"RESULT mm_pose_maxdelta FAILED {type(e).__name__}: {e}",
              flush=True)


if __name__ == "__main__":
    main()
