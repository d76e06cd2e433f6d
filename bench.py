"""Benchmark: end-to-end LM inference throughput on the flagship KITTI model.

Prints JSON lines of the contract {"metric", "value", "unit", "vs_baseline",
"extra"}.  Every printed line is complete and parseable; later lines carry
more extras — a consumer should take the LAST parseable line (or any line:
the flagship value is identical in all of them once measured live).

Protocol: the reference's eval forward (LM_S2GP, level=3, N_iters=5, LM
optimizer, 512x512 satellite patch, 256x1024 ground image — reference
defaults, train_kitti.py:439-469) on synthetic data, batched, jitted, on the
available accelerator, in the recommended production eval config (bfloat16
feature compute — recall-neutral per the PERF.md round-2 study; fp32 is the
``fp32_eval_fps`` extra and stays the default for imported .pth checkpoints).
Metric = frames/sec/chip.  The flagship batches 32 images per dispatch (the
round-4 sweep: 125.2 / 129.7 / 130.6 fps at batch 8 / 16 / 32 — dataset eval
is throughput-bound, latency-irrelevant); ``bf16_b8_eval_fps`` keeps the
round-3-comparable batch-8 number and ``batch1_latency_ms`` the single-image
latency.

vs_baseline: the reference repo publishes no throughput number (SURVEY.md §6);
the eval protocol logs "time per image" per run.  We anchor against an
estimated reference GPU batch-1 inference rate of 2.86 fps (0.35 s/image,
single consumer GPU of the paper's era) — the BASELINE.json north star asks
for >=20x that (~57 fps/chip).

Failure-mode design (round-3 postmortem, VERDICT r3 weak #1): the axon TPU
tunnel's REMOTE COMPILE HELPER can stall indefinitely even while the data
path answers probes, so any in-process jax work can hang unkillably.  This
orchestrator therefore NEVER imports jax in the parent:

  * every metric runs in its own killable subprocess with its own deadline
    (``python bench.py --metric NAME``);
  * the flagship line is printed THE MOMENT the flagship program finishes;
  * a watchdog thread flushes a parseable line at a fixed deadline even if
    the flagship child is still hung, falling back to the last cached
    same-platform flagship measurement (``.bench_cache.json``, labeled with
    its commit + timestamp) or a loudly-labeled zero;
  * a global budget skips (not hangs on) remaining extras.

Tunnel-down semantics (round-5, VERDICT r4 #1): if the accelerator probe
fails but ``.bench_cache.json`` holds a measured ``flagship@tpu``, the
HEADLINE is that cached TPU number, labeled ``[CACHED TPU measurement from
<commit> @ <when>; tunnel down at snapshot — ...]``; cached ``@tpu`` extras
are served under their own names (provenance in ``extra._cached``) and the
live CPU smoke results are demoted to ``extra.cpu_smoke_*``.  A CPU-labeled
headline therefore appears only when NO TPU measurement has ever been
cached.  If the probe passes but a child process itself falls back to CPU
(axon plugin init failure), the result is loudly labeled and never cached
under a tpu key.

Env knobs (seconds): _BENCH_PROBE_TIMEOUT (120), _BENCH_PROBE_RETRY_PAUSE
(30), _BENCH_FLUSH_S (420), _BENCH_FLAGSHIP_TIMEOUT_S (2400),
_BENCH_METRIC_TIMEOUT_S (900), _BENCH_TOTAL_S (7200).
_BENCH_ONLY="name1,name2" restricts extras.
"""

import json
import os
import subprocess
import sys
import threading
import time

REF_GPU_BATCH1_FPS = 2.86
CACHE_PATH = os.environ.get(
    "_BENCH_CACHE_PATH",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 ".bench_cache.json"))
MARKER = "##BENCH##"

# ---------------------------------------------------------------------------
# measurement functions (run inside --metric child processes; import jax)
# ---------------------------------------------------------------------------


def _flagship_cfg(on_tpu):
    from highlyaccurate_tpu.config import Config
    if on_tpu:
        # production eval config: bf16 feature compute (recall-neutral,
        # PERF.md recall study; config.py resolves the same default for
        # non-imported eval runs)
        return 8, Config(level=3, N_iters=5, compute_dtype="bfloat16")
    return 2, Config(level=-1, N_iters=2, grd_h=32, grd_w=128,
                     sat_size=64, use_banded_warp=0)


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
    np.asarray(metrics["loss"])  # fence (see _bench_eval_fps)
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
    the warm-start value itself is an accuracy property, PERF.md round 3).

    NOTE: np.asarray (device->host fetch) is the sync fence — on the
    experimental axon platform block_until_ready returns before execution
    completes, so only a value fetch is reliable."""
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
        # ``carry`` chains successive calls on-device (forces serial
        # execution without per-call host syncs); 1e-38 scaling keeps the
        # data dependency while leaving the inputs numerically unchanged.
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


def _bench_ford_eval(cfg, batch, n_iters):
    """Ford model eval throughput (cam->body->world->sat chain)."""
    import jax.numpy as jnp
    import numpy as np

    from highlyaccurate_tpu.geometry import ford as fgeom
    from highlyaccurate_tpu.models.ford import LMS2GPFord

    side_m = cfg.sat_size * 0.22  # scalar, as the CLI passes it
    R = np.broadcast_to(np.asarray(fgeom.qvec2rotmat(
        [0.997, 0.01, 0.05, 0.02]), np.float32), (batch, 3, 3)).copy()
    T = np.broadcast_to(np.array([1.0, 0.5, -1.4], np.float32),
                        (batch, 3)).copy()
    return _bench_eval_fps(
        LMS2GPFord, cfg, batch, n_iters,
        extra_init=(jnp.asarray(side_m), R, T))


def _measure_flagship(on_tpu):
    batch, cfg = _flagship_cfg(on_tpu)
    if on_tpu:
        batch = 32  # throughput-optimal (round-4 batch sweep); extras keep
        # batch 8 — G2SP/Ford TRAIN programs at batch 32 would exceed HBM
    n = 30 if on_tpu else 3
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
    try:
        return _bench_eval_fps(LMS2GP, cfg, batch, n)
    except Exception as e:
        if not cfg.use_banded_warp:
            raise
        # Pallas path unavailable in this environment -> gather fallback.
        # Loud on stderr: a silent fallback here once masked a Mosaic
        # lowering bug and benched the slow path.
        import dataclasses
        import traceback
        print(f"bench: banded path FAILED ({type(e).__name__}: {e}); "
              "falling back to the gather sampler", file=sys.stderr)
        traceback.print_exc()
        return _bench_eval_fps(
            LMS2GP, dataclasses.replace(cfg, use_banded_warp=0), batch, n)


def _make_extra_metrics(on_tpu):
    """name -> zero-arg callable.  Each runs in its own child process."""
    import dataclasses

    import numpy as np

    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

    batch, cfg_bf16 = _flagship_cfg(on_tpu)
    cfg = dataclasses.replace(cfg_bf16, compute_dtype="float32")
    n = 10 if on_tpu else 2
    k = np.broadcast_to(
        np.array([[582.9802, 0.0, 496.2420],
                  [0.0, 482.7076, 125.0034],
                  [0.0, 0.0, 1.0]], np.float32), (batch, 3, 3)).copy()

    def _ford_train():
        from highlyaccurate_tpu.geometry import ford as fgeom
        from highlyaccurate_tpu.models.ford import LMS2GPFord
        R = np.broadcast_to(np.asarray(fgeom.qvec2rotmat(
            [0.997, 0.01, 0.05, 0.02]), np.float32), (batch, 3, 3)).copy()
        T = np.broadcast_to(np.array([1.0, 0.5, -1.4], np.float32),
                            (batch, 3)).copy()
        return _bench_train_step(cfg, batch, model_cls=LMS2GPFord,
                                 extra=(R, T),
                                 ford_side_m=cfg.sat_size * 0.22)

    # reference-faithful eval path (mandatory for imported .pth checkpoints
    # — PERF.md recall study; fp32 + gather sampler + implicit-J)
    gather_cfg = dataclasses.replace(cfg, use_banded_warp=0)
    # G2SP training: the differentiable projline custom-VJP kernel on TPU
    # (the XLA gather/scatter formulation measured 0.43 fps at batch 8).
    # remat per solver round is REQUIRED at batch 8: the implicit-path
    # (out, dx, dy) residuals of 15 unrolled rounds otherwise exceed v5e
    # HBM (measured OOM, PERF.md round 3).
    g2sp_cfg = dataclasses.replace(cfg, direction="G2SP")

    return {
        # fp32 eval: round<=3's flagship config, kept for cross-round
        # comparability and as the --import_pth eval dtype
        "fp32_eval_fps": lambda: _bench_eval_fps(LMS2GP, cfg, batch, 3 * n),
        # batch-8 bf16 eval: rounds <=3 flagship protocol (the round-4
        # flagship moved to batch 32; this keeps the series comparable)
        "bf16_b8_eval_fps": lambda: _bench_eval_fps(
            LMS2GP, cfg_bf16, batch, 3 * n),
        "train_fps": lambda: _bench_train_step(cfg, batch),
        # mixed-precision training (fp32 params/Adam/LM-solve): the
        # recommended production config (PERF.md round-3 decomposition)
        "bf16_train_fps": lambda: _bench_train_step(
            dataclasses.replace(cfg, compute_dtype="bfloat16"), batch),
        "gather_eval_fps": lambda: _bench_eval_fps(
            LMS2GP, gather_cfg, batch, n),
        "g2sp_eval_fps": lambda: _bench_eval_fps(
            LMG2SP, g2sp_cfg, batch, n, extra_init=(k,)),
        "g2sp_train_fps": lambda: _bench_train_step(
            dataclasses.replace(g2sp_cfg, remat=1), batch, model_cls=LMG2SP,
            extra=(k,)),
        "multihyp4_eval_fps": lambda: _bench_eval_fps(
            LMS2GP, dataclasses.replace(cfg, pose_hypotheses=4), batch, n),
        "ford_eval_fps": lambda: _bench_ford_eval(cfg, batch, n),
        "ford_train_fps": _ford_train,
        # single-stream latency: one image per dispatch, chained (the
        # reference's batch-1 "time per image" scenario)
        "batch1_latency_ms": lambda: 1e3 / _bench_eval_fps(
            LMS2GP, cfg, 1, 3 * n),
        # tracking mode: warm-started 2-iteration solve — the sequential-
        # frame serving config (accuracy study: PERF.md round-3 tracking)
        "tracking_warm2_b1_latency_ms": lambda: 1e3 / _bench_eval_fps(
            LMS2GP, dataclasses.replace(cfg, N_iters=2), 1, 3 * n,
            warm=True),
    }


def child_main(metric: str):
    """--metric entry: measure ONE metric, print a marker JSON line."""
    hang = os.environ.get("_BENCH_FAKE_HANG", "")
    if metric in [h for h in hang.split(",") if h]:  # test hook: simulate a
        time.sleep(3600)                             # stuck compile helper
    import jax
    on_tpu = any(d.platform != "cpu" for d in jax.devices())
    if metric == "flagship":
        value = _measure_flagship(on_tpu)
    else:
        fns = _make_extra_metrics(on_tpu)
        if metric not in fns:
            print(f"bench child: unknown metric {metric}", file=sys.stderr)
            sys.exit(2)
        value = fns[metric]()
    print(f"{MARKER} " + json.dumps(
        {"name": metric, "value": round(float(value), 2),
         "platform": jax.devices()[0].platform}), flush=True)


# ---------------------------------------------------------------------------
# parent orchestrator (no jax imports anywhere below)
# ---------------------------------------------------------------------------


def _env_s(name, default):
    return float(os.environ.get(name, default))


def _load_cache():
    """Cache entries are keyed "<metric>@<platform_class>" so a CPU-fallback
    run (tunnel down) can never clobber previously measured TPU numbers —
    exactly the r3 failure mode the watchdog fallback exists for. Legacy
    flat keys are migrated using their recorded platform_class."""
    try:
        with open(CACHE_PATH) as f:
            raw = json.load(f)
    except Exception:
        return {}
    cache = {}
    for k, v in raw.items():
        if "@" in k or not isinstance(v, dict):
            cache[k] = v
        else:
            cache[f"{k}@{v.get('platform_class', 'tpu')}"] = v
    return cache


def _save_cache(cache):
    try:
        with open(CACHE_PATH, "w") as f:
            json.dump(cache, f, indent=1, sort_keys=True)
    except Exception as e:  # cache is best-effort, never fatal
        print(f"bench: cache write failed: {e}", file=sys.stderr)


def _git_commit():
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10,
            cwd=os.path.dirname(os.path.abspath(__file__))
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def _run_child(metric, timeout_s, env):
    """Run one --metric child; return (value, platform) or (None, why)."""
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--metric", metric],
            timeout=timeout_s, capture_output=True, text=True, env=env)
    except subprocess.TimeoutExpired:
        return None, f"timeout after {timeout_s:.0f}s"
    if proc.stderr:
        sys.stderr.write(proc.stderr)
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith(MARKER):
            d = json.loads(line[len(MARKER):])
            return d["value"], d["platform"]
    return None, f"exit {proc.returncode}, no result line"


class Scoreboard:
    """Thread-safe current-best results + JSON line printer.

    All flagship mutations go through ``set_flagship`` / ``flush_fallback``
    so the watchdog thread and the main thread can never interleave a
    half-updated line (ADVICE r4: _flush raced the live-result path)."""

    def __init__(self, cpu_fallback: bool, on_cpu: bool):
        self._lock = threading.Lock()
        self.flagship = None      # (value, label_suffix)
        self.extra = {}
        self.cpu_fallback = cpu_fallback
        # mirror _flagship_cfg's shapes for an honest label
        self.desc = ("batch 2, level -1, N_iters 2, CPU smoke shapes"
                     if on_cpu else
                     "batch 32, level 3, N_iters 5, bf16 features")

    def _line_locked(self, tag=""):
        if self.flagship is None:
            value, suffix = 0.0, (" [FAILED: flagship did not complete "
                                  "and no cached measurement exists]")
        else:
            value, suffix = self.flagship
        if self.cpu_fallback:
            suffix += " [CPU FALLBACK — TPU tunnel down, NOT a TPU number]"
        return json.dumps({
            "metric": "KITTI LM_S2GP end-to-end inference frames/sec/chip"
                      f" ({self.desc})" + suffix + tag,
            "value": round(float(value), 2),
            "unit": "frames/sec",
            "vs_baseline": round(float(value) / REF_GPU_BATCH1_FPS, 2),
            "extra": dict(self.extra),
        })

    def line(self, tag=""):
        with self._lock:
            return self._line_locked(tag)

    def set_flagship(self, value, suffix=""):
        """Set the flagship result and print a complete line, atomically."""
        with self._lock:
            self.flagship = (value, suffix)
            print(self._line_locked(), flush=True)

    def flush_fallback(self, fallback_fn):
        """If no flagship landed yet, install ``fallback_fn()``; then print
        a complete line.  Set + print happen under one lock acquisition so a
        concurrent live result can't interleave (compare-and-set)."""
        with self._lock:
            if self.flagship is None:
                self.flagship = fallback_fn()
            print(self._line_locked(), flush=True)

    def emit(self, tag=""):
        print(self.line(tag), flush=True)


def parent_main():
    t_start = time.monotonic()
    probe_timeout = _env_s("_BENCH_PROBE_TIMEOUT", 120)
    flush_s = _env_s("_BENCH_FLUSH_S", 420)
    flagship_timeout = _env_s("_BENCH_FLAGSHIP_TIMEOUT_S", 2400)
    metric_timeout = _env_s("_BENCH_METRIC_TIMEOUT_S", 900)
    total_s = _env_s("_BENCH_TOTAL_S", 7200)

    env = dict(os.environ)
    explicit_cpu = env.get("JAX_PLATFORMS", "") == "cpu"
    cpu_fallback = False
    if not explicit_cpu:
        # probe the accelerator in a killable subprocess (the tunnel has
        # hung for hours at a stretch with jax.devices() never returning).
        # Two attempts with a pause: a probe launched right as another JAX
        # process releases the TPU can deadlock on the relay even while the
        # tunnel is healthy (observed 2026-08-19 — a passing external probe
        # followed seconds later by a hung bench probe put a full seeding
        # run into CPU-only mode).
        ok = False
        for attempt in range(2):
            try:
                proc = subprocess.run(
                    [sys.executable, "-c",
                     "import jax, numpy as np, jax.numpy as jnp;"
                     "print(np.asarray(jnp.ones((64,64)) @ jnp.ones((64,64)))"
                     "[0,0])"],
                    timeout=probe_timeout, capture_output=True, env=env)
                ok = proc.returncode == 0
                why = ("" if ok else
                       f"rc={proc.returncode} stderr tail: "
                       + proc.stderr.decode(errors="replace")[-300:])
            except subprocess.TimeoutExpired:
                why = f"hung >{probe_timeout}s"
            if ok:
                break
            print(f"bench: accelerator probe attempt {attempt + 1} failed "
                  f"({why})", file=sys.stderr)
            if attempt == 0:
                time.sleep(_env_s("_BENCH_PROBE_RETRY_PAUSE", 30))
        if not ok:
            print("bench: accelerator probe failed/hung — running CPU-only",
                  file=sys.stderr)
            cpu_fallback = True
            env["JAX_PLATFORMS"] = "cpu"
            env.pop("PYTHONPATH", None)  # strip the axon plugin

    cache = _load_cache()
    # Tunnel-down mode (VERDICT r4 #1): when the probe fails but a measured
    # TPU flagship exists in the cache, the HEADLINE is that cached TPU
    # number (with provenance) — not a batch-2 CPU smoke figure 5x below the
    # real one.  Live CPU smoke runs still execute, demoted to
    # extra.cpu_smoke_*, and every cached @tpu extra is served with
    # provenance under extra._cached.
    cached_tpu_mode = cpu_fallback and "flagship@tpu" in cache
    want_platform = "cpu" if (cpu_fallback or explicit_cpu) else "tpu"
    # platform the child process is EXPECTED to report; a mismatch means the
    # child silently fell back (ADVICE r4: probe passed but the axon plugin
    # failed inside the child) — never cache or headline such a value as TPU
    child_platform = want_platform

    board = Scoreboard(cpu_fallback and not cached_tpu_mode,
                       on_cpu=(cpu_fallback or explicit_cpu)
                       and not cached_tpu_mode)

    only = os.environ.get("_BENCH_ONLY")  # "" selects NO extras (tests)
    names = (["bf16_b8_eval_fps", "fp32_eval_fps", "train_fps",
              "bf16_train_fps", "gather_eval_fps", "g2sp_eval_fps",
              "g2sp_train_fps", "multihyp4_eval_fps", "ford_eval_fps",
              "ford_train_fps", "batch1_latency_ms",
              "tracking_warm2_b1_latency_ms"]
             if only is None else [m for m in only.split(",") if m])

    if cached_tpu_mode:
        c = cache["flagship@tpu"]
        # serve every cached @tpu extra up front so even a first emitted
        # line carries the full TPU scoreboard
        for name in names:
            ce = cache.get(f"{name}@tpu")
            if ce:
                board.extra[name] = ce["value"]
                board.extra.setdefault("_cached", {})[name] = (
                    f"{ce['when']} @ {ce['commit']} "
                    "(TPU tunnel down at snapshot)")
        board.set_flagship(
            c["value"],
            f" [CACHED TPU measurement from {c['commit']} @ {c['when']}; "
            "tunnel down at snapshot — live CPU smoke numbers under "
            "extra.cpu_smoke_*]")

    def _flagship_fallback():
        """Watchdog/failure fallback value (runs under the board lock)."""
        c = cache.get(f"flagship@{want_platform}")
        if c:
            return (c["value"],
                    f" [CACHED {c['when']} @ {c['commit']} — live flagship "
                    "run did not finish before the watchdog deadline]")
        if want_platform == "tpu" and cache.get("flagship@cpu"):
            c = cache["flagship@cpu"]
            return (c["value"],
                    f" [CACHED CPU-smoke {c['when']} @ {c['commit']} — "
                    "live TPU flagship hung and no TPU cache exists; "
                    "NOT a TPU number]")
        return None  # -> FAILED label

    def _flush():
        board.flush_fallback(lambda: _flagship_fallback())

    # watchdog: guarantee a parseable line by flush_s even if the flagship
    # child hangs on a stuck remote compile helper
    watchdog = threading.Timer(flush_s, _flush)
    watchdog.daemon = True
    watchdog.start()

    def _stamp(value):
        return {"value": value, "platform_class": want_platform,
                "commit": _git_commit(),
                "when": time.strftime("%Y-%m-%d %H:%MZ", time.gmtime())}

    value, info = _run_child("flagship", flagship_timeout, env)
    if value is not None:
        platform_class = "cpu" if info == "cpu" else "tpu"
        if cached_tpu_mode:
            # headline already holds the cached TPU number; the live CPU
            # smoke is an extra (and refreshes the @cpu cache)
            board.extra["cpu_smoke_flagship"] = value
            if platform_class == "cpu":
                cache["flagship@cpu"] = _stamp(value)
                _save_cache(cache)
            board.emit()
        elif platform_class != child_platform:
            # ADVICE r4: probe passed but the child itself fell back to CPU
            # — label loudly, do NOT cache under the tpu key
            print(f"bench: flagship child reported platform "
                  f"'{platform_class}' but '{child_platform}' was expected "
                  "— NOT caching", file=sys.stderr)
            board.set_flagship(
                value, f" [CHILD FELL BACK TO {platform_class.upper()} — "
                f"probe passed but the child ran on {platform_class}; "
                "NOT a TPU number]")
        else:
            cache[f"flagship@{platform_class}"] = _stamp(value)
            _save_cache(cache)
            board.set_flagship(value)  # the moment the program finishes
    else:
        print(f"bench: flagship child failed ({info})", file=sys.stderr)
        _flush()  # cached fallback now; don't wait for the timer

    def _extra_fallback(name, why):
        """A failed/skipped extra serves its last cached same-platform
        measurement (labeled with provenance under extra._cached) rather
        than an opaque error — the scoreboard stays complete across
        compile-helper stalls (the r3 failure mode)."""
        c = cache.get(f"{name}@{want_platform}")
        if c:
            board.extra[name] = c["value"]
            board.extra.setdefault("_cached", {})[name] = (
                f"{c['when']} @ {c['commit']} (live run: {why})")
        else:
            board.extra[name] = f"error: {why}"

    for name in names:
        left = total_s - (time.monotonic() - t_start)
        if left < 60:
            if cached_tpu_mode:
                continue  # cached @tpu value (if any) is already served
            _extra_fallback(name, "skipped: total budget exhausted")
            continue
        value, info = _run_child(name, min(metric_timeout, left), env)
        if value is not None:
            platform_class = "cpu" if info == "cpu" else "tpu"
            if cached_tpu_mode:
                board.extra[f"cpu_smoke_{name}"] = value
                if platform_class == "cpu":
                    cache[f"{name}@cpu"] = _stamp(value)
                    _save_cache(cache)
            elif platform_class != child_platform:
                print(f"bench: {name} child reported platform "
                      f"'{platform_class}' but '{child_platform}' was "
                      "expected — NOT caching", file=sys.stderr)
                board.extra[f"cpu_smoke_{name}"] = value
                _extra_fallback(name, f"child fell back to {platform_class}")
            else:
                board.extra[name] = value
                cache[f"{name}@{want_platform}"] = _stamp(value)
                _save_cache(cache)  # per-metric: a kill loses nothing
        elif cached_tpu_mode:
            board.extra[f"cpu_smoke_{name}"] = f"error: {info}"
            print(f"bench: {name} failed ({info})", file=sys.stderr)
        else:
            _extra_fallback(name, info)
            print(f"bench: {name} failed ({info})", file=sys.stderr)
    _save_cache(cache)
    watchdog.cancel()
    board.emit()


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--metric":
        child_main(sys.argv[2])
    else:
        parent_main()
