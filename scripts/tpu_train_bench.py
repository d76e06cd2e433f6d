"""Training-step throughput on TPU: remat on vs off (batch 8, defaults)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
from highlyaccurate_tpu.train import step as step_lib
from highlyaccurate_tpu.train.state import create_train_state

B = 8


def bench(remat):
    cfg = Config(level=3, N_iters=5, remat=remat)
    model = LMS2GP(cfg=cfg)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
    gt = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd, gt, mode="train")
    state = create_train_state(cfg, v["params"])
    ts = step_lib.make_train_step(model, cfg, mesh=None)
    state, m = ts(state, sat, grd, gt, jax.random.PRNGKey(0))
    np.asarray(m["loss"])
    n = 5
    t0 = time.perf_counter()
    for i in range(n):
        state, m = ts(state, sat, grd, gt, jax.random.PRNGKey(i))
    np.asarray(m["loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"train step remat={remat}: {dt * 1e3:.1f} ms "
          f"-> {B / dt:.1f} frames/sec", flush=True)


def main():
    bench(0)
    try:
        bench(1)
    except Exception as e:
        print("remat=1 failed:", type(e).__name__, str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
