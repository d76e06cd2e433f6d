"""Benchmark: end-to-end LM inference throughput on the flagship KITTI model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: the reference's eval forward (LM_S2GP, level=3, N_iters=5, LM
optimizer, 512x512 satellite patch, 256x1024 ground image — reference
defaults, train_kitti.py:439-469) on synthetic data, batched, jitted, on the
available accelerator.  Metric = frames/sec/chip.

vs_baseline: the reference repo publishes no throughput number (SURVEY.md §6);
the eval protocol logs "time per image" per run.  We anchor against an
estimated reference GPU batch-1 inference rate of 2.86 fps (0.35 s/image,
single consumer GPU of the paper's era) — the BASELINE.json north star asks
for >=20x that (~57 fps/chip).
"""

import json
import time

REF_GPU_BATCH1_FPS = 2.86


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    if on_tpu:
        batch, cfg = 8, Config(level=3, N_iters=5)
    else:  # CPU smoke fallback
        batch, cfg = 2, Config(level=-1, N_iters=2, grd_h=32, grd_w=128,
                               sat_size=64, use_banded_warp=0)

    try:
        return run(cfg, batch, on_tpu)
    except Exception:
        if not cfg.use_banded_warp:
            raise
        # Pallas path unavailable in this environment -> gather fallback
        cfg = Config(**{**cfg.__dict__, "use_banded_warp": 0})
        return run(cfg, batch, on_tpu)


def run(cfg, batch, on_tpu):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

    model = LMS2GP(cfg=cfg)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(batch, cfg.sat_size, cfg.sat_size, 3)
                      .astype(np.float32))
    grd = jnp.asarray(rng.rand(batch, cfg.grd_h, cfg.grd_w, 3)
                      .astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "lm": jax.random.PRNGKey(1)},
                           sat, grd, jnp.zeros((batch, 3)), mode="train")

    @jax.jit
    def eval_step(params, sat, grd, key, carry):
        # ``carry`` chains successive calls on-device (forces serial
        # execution without per-call host syncs); 1e-38 scaling keeps the
        # data dependency while leaving the inputs numerically unchanged.
        sat = sat + carry * 1e-38
        lat, lon, th = model.apply({"params": params}, sat, grd, mode="test",
                                   rngs={"lm": key})
        return lat, lon, th, carry + jnp.sum(lat) * 1e-30

    params = variables["params"]
    key = jax.random.PRNGKey(0)

    # warmup + compile. NOTE: np.asarray (device->host fetch) is the sync
    # fence — on the experimental axon platform block_until_ready returns
    # before execution completes, so only a value fetch is reliable.
    carry = jnp.zeros(())
    out = eval_step(params, sat, grd, key, carry)
    np.asarray(out[0])

    # throughput: N chained dispatches, one final fetch (amortizes the
    # host<->device round-trip, which dominates a per-call fence here)
    n_iters = 30 if on_tpu else 3
    t0 = time.perf_counter()
    carry = jnp.zeros(())
    for i in range(n_iters):
        lat, lon, th, carry = eval_step(params, sat, grd,
                                        jax.random.fold_in(key, i), carry)
    np.asarray(carry)
    dt = time.perf_counter() - t0

    fps = batch * n_iters / dt
    print(json.dumps({
        "metric": "KITTI LM_S2GP end-to-end inference frames/sec/chip "
                  f"(batch {batch}, level {cfg.level}, N_iters {cfg.N_iters})",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / REF_GPU_BATCH1_FPS, 2),
    }))


if __name__ == "__main__":
    main()
