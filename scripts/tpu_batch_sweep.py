"""Throughput vs batch size with the banded eval path (TPU)."""

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


def fps_at(batch, dtype="float32"):
    cfg = Config(level=3, N_iters=5, compute_dtype=dtype)
    model = LMS2GP(cfg=cfg)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(batch, 512, 512, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(batch, 256, 1024, 3).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd,
                   jnp.zeros((batch, 3)), mode="train")
    ev = jax.jit(lambda p, s, g, k: model.apply(
        {"params": p}, s, g, mode="test", rngs={"lm": k}))
    out = ev(v["params"], sat, grd, jax.random.PRNGKey(0))
    np.asarray(out[0])
    n = 5
    t0 = time.perf_counter()
    for i in range(n):
        out = ev(v["params"], sat, grd, jax.random.PRNGKey(i))
    np.asarray(out[0])
    dt = (time.perf_counter() - t0) / n
    print(f"batch {batch} {dtype}: {dt * 1e3:.1f} ms/call "
          f"-> {batch / dt:.1f} fps", flush=True)


def main():
    for b in (8, 16, 32):
        fps_at(b)
    fps_at(16, "bfloat16")


if __name__ == "__main__":
    main()
