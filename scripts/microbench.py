"""One-shot TPU microbenchmark bundle (bundled because each new program
signature pays a multi-minute remote compile on this tunnel).

Measures, with device->host fetch fences:
  1. VGG feature extraction (fp32 + bf16)
  2. raw 4-corner gather (grid_sample value-only) per pyramid level
  3. grid_sample with Jacobian per level
  4. one full LM solver round per level
  5. full eval fp32 vs bf16

Run: python scripts/microbench.py  (from repo root, TPU env)
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.geometry import kitti as geom
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP, precompute_rays
from highlyaccurate_tpu.models.vggunet import VGGUnet
from highlyaccurate_tpu.ops.grid_sample import grid_sample
from highlyaccurate_tpu.solver.updates import LMConfig, lm_update

B = 8
REPS = 5


def timeit(name, fn, *args):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    cfg = Config(level=3, N_iters=5)
    rays = precompute_rays(cfg)

    # --- per-level gather / jac / LM-round ---------------------------------
    for slot, (A, C) in enumerate([(64, 256), (128, 128), (256, 64)]):
        gh, gw = 32 * 2 ** slot, 128 * 2 ** slot
        sat = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
        xyz = jnp.asarray(rays[slot][0])
        pose = jnp.zeros((B, 3))

        def value_only(sat, pose):
            uv = geom.s2gp_uv(pose, xyz, A * 8, 10.0, 20.0, 20.0)
            out, _ = grid_sample(sat, uv)
            return out

        def with_jac(sat, pose):
            uv, duv = geom.s2gp_uv_jac(pose, xyz, A * 8, 10.0, 20.0, 20.0)
            out, jac = grid_sample(sat, uv, duv)
            return out, jac

        lmc = LMConfig()
        damp = jnp.zeros((1, 3))
        grd = jnp.asarray(rng.rand(B, gh, gw, C).astype(np.float32))
        conf = jnp.asarray(rng.rand(B, gh, gw, 1).astype(np.float32))

        def full_round(sat, grd, conf, pose, key):
            out, jac = with_jac(sat, pose)
            half = gh // 2
            return lm_update(pose, out[:, half:], conf[:, half:],
                             grd[:, half:], conf[:, half:], jac[:, half:],
                             damp, lmc, key)

        timeit(f"L{slot} gather value-only ({gh}x{gw} from {A}^2x{C})",
               jax.jit(value_only), sat, pose)
        timeit(f"L{slot} gather+jac", jax.jit(with_jac), sat, pose)
        timeit(f"L{slot} full LM round", jax.jit(full_round), sat, grd, conf,
               pose, jax.random.PRNGKey(0))

    # --- VGG + full model fp32 vs bf16 -------------------------------------
    sat_img = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
    grd_img = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
    for dt_name in ["float32", "bfloat16"]:
        dt = jnp.float32 if dt_name == "float32" else jnp.bfloat16
        net = VGGUnet(level=3, dtype=dt)
        p = net.init(jax.random.PRNGKey(0), grd_img)
        timeit(f"VGG grd {dt_name}", jax.jit(lambda p, x: net.apply(p, x)),
               p, grd_img)

        mcfg = Config(level=3, N_iters=5, compute_dtype=dt_name)
        model = LMS2GP(cfg=mcfg)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "lm": jax.random.PRNGKey(1)}, sat_img, grd_img,
                       jnp.zeros((B, 3)), mode="train")
        ev = jax.jit(lambda p, s, g, k: model.apply(
            {"params": p}, s, g, mode="test", rngs={"lm": k}))
        ms = timeit(f"full eval {dt_name}", ev, v["params"], sat_img,
                    grd_img, jax.random.PRNGKey(0))
        print(f"  -> {B / (ms / 1e3):.1f} frames/sec", flush=True)


if __name__ == "__main__":
    main()
