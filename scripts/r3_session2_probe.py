"""Round-3 session-2 TPU bundle: new-path measurements + export check.

One process (axon tunnel allows one JAX process at a time):
  1. flagship banded eval sanity (regression guard vs the 116.5 fps log)
  2. Ford multi-hypothesis eval throughput (NEW path this session)
  3. Localizer.export on the TPU platform with the banded kernel ON:
     does a Mosaic custom call survive jax.export serialize/deserialize?
     (if not, the AOT deployment story is gather/CPU-only — document it)

All timings fence via device->host value fetches (block_until_ready does
not fence on axon — CLAUDE.md).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP


def eval_fps(model, cfg, batch, n_iters, extra=()):
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(batch, cfg.sat_size, cfg.sat_size, 3)
                      .astype(np.float32))
    grd = jnp.asarray(rng.rand(batch, cfg.grd_h, cfg.grd_w, 3)
                      .astype(np.float32))
    args = [sat, grd] + [jnp.asarray(a) for a in extra]
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, *args,
                   jnp.zeros((batch, 3)), mode="train")

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
        carry = ev(v["params"], carry,
                   jax.random.fold_in(jax.random.PRNGKey(0), i))
    np.asarray(carry)
    return batch * n_iters / (time.perf_counter() - t0)


def main():
    assert any(d.platform != "cpu" for d in jax.devices()), \
        "run this on the TPU"
    batch = 8

    # 1. flagship sanity
    cfg = Config(level=3, N_iters=5)
    fps = eval_fps(LMS2GP(cfg=cfg), cfg, batch, 20)
    print(f"flagship_eval_fps: {fps:.2f}")

    # 2. Ford multi-hypothesis (4 starts/sample)
    import dataclasses

    from highlyaccurate_tpu.geometry import ford as fgeom
    from highlyaccurate_tpu.models.ford import LMS2GPFord
    fcfg = dataclasses.replace(cfg, pose_hypotheses=4)
    R = np.broadcast_to(np.asarray(fgeom.qvec2rotmat(
        [0.997, 0.01, 0.05, 0.02]), np.float32), (batch, 3, 3)).copy()
    T = np.broadcast_to(np.array([1.0, 0.5, -1.4], np.float32),
                        (batch, 3)).copy()

    model = LMS2GPFord(cfg=fcfg)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(batch, fcfg.sat_size, fcfg.sat_size, 3)
                      .astype(np.float32))
    grd = jnp.asarray(rng.rand(batch, fcfg.grd_h, fcfg.grd_w, 3)
                      .astype(np.float32))
    side_m = fcfg.sat_size * 0.22
    Rj, Tj = jnp.asarray(R), jnp.asarray(T)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)},
                   sat, grd, side_m, Rj, Tj, jnp.zeros((batch, 3)),
                   mode="train")

    @jax.jit
    def fev(params, carry, key):
        out = model.apply({"params": params}, sat + carry * 1e-38, grd,
                          side_m, Rj, Tj, mode="test", rngs={"lm": key})
        return carry + jnp.sum(out[0]) * 1e-30

    carry = fev(v["params"], jnp.zeros(()), jax.random.PRNGKey(0))
    np.asarray(carry)
    t0 = time.perf_counter()
    carry = jnp.zeros(())
    for i in range(10):
        carry = fev(v["params"], carry,
                    jax.random.fold_in(jax.random.PRNGKey(0), i))
    np.asarray(carry)
    fps = batch * 10 / (time.perf_counter() - t0)
    print(f"ford_multihyp4_eval_fps: {fps:.2f} "
          f"({fps * 4:.0f} pose solves/sec)")

    # 3. TPU export roundtrip with the banded kernel on
    import tempfile

    from highlyaccurate_tpu.inference import ExportedLocalizer, Localizer
    try:
        loc = Localizer(cfg, batch_size=2, seed=5, random_init=True)
        path = tempfile.mktemp(suffix=".halexp")
        loc.export(path)
        srv = ExportedLocalizer(path, seed=5)
        rng = np.random.RandomState(1)
        si = rng.rand(2, cfg.sat_size, cfg.sat_size, 3).astype(np.float32)
        gi = rng.rand(2, cfg.grd_h, cfg.grd_w, 3).astype(np.float32)
        want = loc.predict(si, gi)
        got = srv.predict(si, gi)
        d = max(float(np.abs(got[k] - want[k]).max()) for k in want)
        print(f"tpu_export_roundtrip: OK (max|delta| {d:.2e})")
    except Exception as e:  # noqa: BLE001 - report, don't die
        print(f"tpu_export_roundtrip: FAILED ({type(e).__name__}: {e})")


if __name__ == "__main__":
    main()
