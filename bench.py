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


def _accelerator_responsive(timeout_s: float = 600.0) -> bool:
    """Probe the accelerator in a SUBPROCESS with a timeout.

    The axon TPU tunnel has been observed down for hours at a stretch with
    jax.devices() HANGING (no error) — which would hang the whole bench and
    leave the round with no number at all.  A subprocess probe can be
    killed; the in-process call cannot.  The probe exits before the real
    run starts (one JAX process at a time on the tunnel)."""
    import os
    import subprocess
    import sys

    timeout_s = float(os.environ.get("_BENCH_PROBE_TIMEOUT", timeout_s))
    try:
        proc = subprocess.run(
            [sys.executable, "-c",
             "import jax, numpy as np, jax.numpy as jnp;"
             "print(np.asarray(jnp.ones((64,64)) @ jnp.ones((64,64)))[0,0])"],
            timeout=timeout_s, capture_output=True)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import os
    import sys

    explicit_cpu = os.environ.get("JAX_PLATFORMS", "") == "cpu"
    if not explicit_cpu and not os.environ.get("_BENCH_CPU_FALLBACK") \
            and not _accelerator_responsive():
        # re-exec CPU-only (axon plugin stripped) with a labeled metric so
        # a fallback number can never be mistaken for a TPU regression
        print("bench: accelerator probe failed/hung — re-running CPU-only",
              file=sys.stderr)
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env.pop("PYTHONPATH", None)
        env["_BENCH_CPU_FALLBACK"] = "1"
        os.execve(sys.executable, [sys.executable, __file__], env)

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
    except Exception as e:
        if not cfg.use_banded_warp:
            raise
        # Pallas path unavailable in this environment -> gather fallback.
        # Loud on stderr: a silent fallback here once masked a Mosaic
        # lowering bug and benched the slow path.
        import sys
        import traceback
        print(f"bench: banded path FAILED ({type(e).__name__}: {e}); "
              "falling back to the gather sampler", file=sys.stderr)
        traceback.print_exc()
        cfg = Config(**{**cfg.__dict__, "use_banded_warp": 0})
        return run(cfg, batch, on_tpu)


def _bench_train_step(cfg, batch, model_cls=None, extra=(),
                      ford_side_m=None):
    """Training throughput (loss+backprop+Adam), frames/sec.

    ``extra``: extra per-batch data args between grd and gt (G2SP camera_k,
    Ford R_FL/T_FL); ``ford_side_m`` selects the Ford step signature."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
    from highlyaccurate_tpu.train import step as step_lib
    from highlyaccurate_tpu.train.state import create_train_state

    model = (model_cls or LMS2GP)(cfg=cfg)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(batch, cfg.sat_size, cfg.sat_size, 3)
                      .astype(np.float32))
    grd = jnp.asarray(rng.rand(batch, cfg.grd_h, cfg.grd_w, 3)
                      .astype(np.float32))
    gt = jnp.zeros((batch, 3))
    extra = tuple(jnp.asarray(a) for a in extra)
    init_args = ([sat, grd, ford_side_m] if ford_side_m is not None
                 else [sat, grd]) + list(extra) + [gt]
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, *init_args, mode="train")
    state = create_train_state(cfg, v["params"])
    ts = step_lib.make_train_step(model, cfg, mesh=None,
                                  ford_side_m=ford_side_m)
    state, metrics = ts(state, sat, grd, *extra, gt, jax.random.PRNGKey(0))
    np.asarray(metrics["loss"])  # fence (see run())
    # one timed step picks n: slow paths (e.g. G2SP's scatter-bound gather
    # backward) get fewer reps so the bench suite stays bounded
    t0 = time.perf_counter()
    state, metrics = ts(state, sat, grd, *extra, gt, jax.random.PRNGKey(99))
    np.asarray(metrics["loss"])
    n = 10 if (time.perf_counter() - t0) < 2.0 else 3
    t0 = time.perf_counter()
    for i in range(n):
        state, metrics = ts(state, sat, grd, *extra, gt,
                            jax.random.PRNGKey(i))
    np.asarray(metrics["loss"])
    return batch * n / (time.perf_counter() - t0)


def _bench_eval_fps(model_cls, cfg, batch, n_iters, extra_init=(),
                    warm: bool = False):
    """Chained-dispatch eval throughput for any model class.

    ``warm`` benches the tracking-mode program (init_pose input wired —
    the warm-start value itself is an accuracy property, PERF.md round 3)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    model = model_cls(cfg=cfg)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(batch, cfg.sat_size, cfg.sat_size, 3)
                      .astype(np.float32))
    grd = jnp.asarray(rng.rand(batch, cfg.grd_h, cfg.grd_w, 3)
                      .astype(np.float32))
    args = [sat, grd] + [jnp.asarray(a) for a in extra_init]
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, *args,
                   jnp.zeros((batch, 3)), mode="train")

    if warm:
        # true tracking loop: the previous call's estimate is the next
        # call's init_pose — a RUNTIME input (a constant init would trace
        # to the same HLO as the cold program and bench nothing new)
        @jax.jit
        def evw(params, init, key):
            lat, lon, th = model.apply(
                {"params": params}, *args, mode="test", init_pose=init,
                rngs={"lm": key})
            return jnp.stack([lon, lat, th], -1)

        init = evw(v["params"], jnp.zeros((batch, 3)), jax.random.PRNGKey(0))
        np.asarray(init)
        t0 = time.perf_counter()
        init = jnp.zeros((batch, 3))
        for i in range(n_iters):
            init = evw(v["params"], init,
                       jax.random.fold_in(jax.random.PRNGKey(0), i))
        np.asarray(init)
        return batch * n_iters / (time.perf_counter() - t0)

    @jax.jit
    def ev(params, carry, key):
        out = model.apply({"params": params}, args[0] + carry * 1e-38,
                          *args[1:], mode="test", rngs={"lm": key})
        return carry + jnp.sum(out[0]) * 1e-30

    carry = ev(v["params"], jnp.zeros(()), jax.random.PRNGKey(0))
    np.asarray(carry)
    t0 = time.perf_counter()
    carry = jnp.zeros(())
    for i in range(n_iters):
        carry = ev(v["params"], carry, jax.random.fold_in(
            jax.random.PRNGKey(0), i))
    np.asarray(carry)
    return batch * n_iters / (time.perf_counter() - t0)


def _best_effort(out, name, fn):
    """Record fn() under ``name``; retry once on failure (the axon TPU
    tunnel throws transient backend-setup errors — one retry recovered
    every flake observed so far), report the error instead of dying."""
    for attempt in (0, 1):  # pragma: no cover - error paths need a flake
        try:
            out[name] = round(fn(), 2)
            return
        except Exception as e:
            err = f"error: {type(e).__name__}"
            import sys
            print(f"bench: {name} attempt {attempt} failed "
                  f"({type(e).__name__}: {e})", file=sys.stderr)
    out[name] = err


def extra_metrics(cfg, batch, on_tpu):
    """Secondary bench surface (train / G2SP / multi-hypothesis) so perf
    work can't regress unmeasured paths. Each is best-effort."""
    import dataclasses

    import numpy as np

    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

    n = 10 if on_tpu else 2
    k = np.broadcast_to(
        np.array([[582.9802, 0.0, 496.2420],
                  [0.0, 482.7076, 125.0034],
                  [0.0, 0.0, 1.0]], np.float32), (batch, 3, 3)).copy()

    def _ford_train():
        # imports inside so a Ford-side failure error-tags this key only
        from highlyaccurate_tpu.geometry import ford as fgeom
        from highlyaccurate_tpu.models.ford import LMS2GPFord
        R = np.broadcast_to(np.asarray(fgeom.qvec2rotmat(
            [0.997, 0.01, 0.05, 0.02]), np.float32), (batch, 3, 3)).copy()
        T = np.broadcast_to(np.array([1.0, 0.5, -1.4], np.float32),
                            (batch, 3)).copy()
        return _bench_train_step(cfg, batch, model_cls=LMS2GPFord,
                                 extra=(R, T),
                                 ford_side_m=cfg.sat_size * 0.22)
    bf16_cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
    # reference-faithful eval path (mandatory for imported .pth checkpoints
    # — PERF.md recall study); implicit-J contraction rides the gather
    # sampler (round-3 VERDICT #2)
    gather_cfg = dataclasses.replace(cfg, use_banded_warp=0)
    # G2SP training: the differentiable projline custom-VJP kernel on TPU
    # (the XLA gather/scatter formulation measured 0.43 fps at batch 8).
    # remat per solver round is REQUIRED at batch 8: the implicit-path
    # (out, dx, dy) residuals of 15 unrolled rounds otherwise exceed v5e
    # HBM (measured OOM, PERF.md round 3).
    g2sp_cfg = dataclasses.replace(cfg, direction="G2SP")

    out = {}
    _best_effort(out, "train_fps", lambda: _bench_train_step(cfg, batch))
    _best_effort(out, "g2sp_eval_fps", lambda: _bench_eval_fps(
        LMG2SP, g2sp_cfg, batch, n, extra_init=(k,)))
    _best_effort(out, "gather_eval_fps", lambda: _bench_eval_fps(
        LMS2GP, gather_cfg, batch, n))
    _best_effort(out, "multihyp4_eval_fps", lambda: _bench_eval_fps(
        LMS2GP, dataclasses.replace(cfg, pose_hypotheses=4), batch, n))
    _best_effort(out, "ford_eval_fps",
                 lambda: _bench_ford_eval(cfg, batch, n))
    # bf16 feature compute at eval: recall-neutral (PERF.md recall study)
    _best_effort(out, "bf16_eval_fps", lambda: _bench_eval_fps(
        LMS2GP, bf16_cfg, batch, n))
    # mixed-precision training (fp32 params/Adam/LM-solve): the
    # recommended production config (PERF.md round-3 decomposition)
    _best_effort(out, "bf16_train_fps",
                 lambda: _bench_train_step(bf16_cfg, batch))
    # single-stream latency: one image per dispatch, chained (the
    # reference's batch-1 "time per image" scenario)
    _best_effort(out, "batch1_latency_ms",
                 lambda: 1e3 / _bench_eval_fps(LMS2GP, cfg, 1, 3 * n))
    # tracking mode (NEW): warm-started 2-iteration solve — the sequential-
    # frame serving config (accuracy study: PERF.md round-3 tracking study)
    _best_effort(out, "tracking_warm2_b1_latency_ms",
                 lambda: 1e3 / _bench_eval_fps(
                     LMS2GP, dataclasses.replace(cfg, N_iters=2), 1, 3 * n,
                     warm=True))
    _best_effort(out, "g2sp_train_fps", lambda: _bench_train_step(
        dataclasses.replace(g2sp_cfg, remat=1), batch, model_cls=LMG2SP,
        extra=(k,)))
    # Ford training (banded custom-VJP kernels, cam->body->world chain)
    _best_effort(out, "ford_train_fps", _ford_train)
    return out


def _bench_ford_eval(cfg, batch, n_iters):
    """Ford model eval throughput (cam->body->world->sat chain)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from highlyaccurate_tpu.geometry import ford as fgeom
    from highlyaccurate_tpu.models.ford import LMS2GPFord

    model = LMS2GPFord(cfg=cfg)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(batch, cfg.sat_size, cfg.sat_size, 3)
                      .astype(np.float32))
    grd = jnp.asarray(rng.rand(batch, cfg.grd_h, cfg.grd_w, 3)
                      .astype(np.float32))
    side_m = cfg.sat_size * 0.22  # scalar, as the CLI passes it
    R = jnp.broadcast_to(jnp.asarray(fgeom.qvec2rotmat(
        [0.997, 0.01, 0.05, 0.02])), (batch, 3, 3))
    T = jnp.broadcast_to(jnp.array([1.0, 0.5, -1.4], jnp.float32), (batch, 3))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)},
                   sat, grd, side_m, R, T, jnp.zeros((batch, 3)),
                   mode="train")

    @jax.jit
    def ev(params, carry, key):
        out = model.apply({"params": params}, sat + carry * 1e-38, grd,
                          side_m, R, T, mode="test", rngs={"lm": key})
        return carry + jnp.sum(out[0]) * 1e-30

    carry = ev(v["params"], jnp.zeros(()), jax.random.PRNGKey(0))
    np.asarray(carry)
    t0 = time.perf_counter()
    carry = jnp.zeros(())
    for i in range(n_iters):
        carry = ev(v["params"], carry,
                   jax.random.fold_in(jax.random.PRNGKey(0), i))
    np.asarray(carry)
    return batch * n_iters / (time.perf_counter() - t0)


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
    import os
    fallback = (" [CPU FALLBACK — TPU tunnel down, NOT a TPU number]"
                if os.environ.get("_BENCH_CPU_FALLBACK") else "")
    print(json.dumps({
        "metric": "KITTI LM_S2GP end-to-end inference frames/sec/chip "
                  f"(batch {batch}, level {cfg.level}, N_iters {cfg.N_iters})"
                  + fallback,
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / REF_GPU_BATCH1_FPS, 2),
        "extra": extra_metrics(cfg, batch, on_tpu),
    }))


if __name__ == "__main__":
    main()
