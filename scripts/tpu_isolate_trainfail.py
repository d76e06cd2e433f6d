"""Isolate the construct that crashes the remote compile helper in the
banded training program: single round grad -> +remat -> +scan -> full."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

B = 2
cfg = Config(level=-1, N_iters=2)  # single coarse level, small
model = LMS2GP(cfg=cfg)
rng = np.random.RandomState(0)
sat = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
grd = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
gt = jnp.asarray(rng.uniform(-0.5, 0.5, (B, 3)).astype(np.float32))
v = model.init({"params": jax.random.PRNGKey(0),
                "lm": jax.random.PRNGKey(1)}, sat, grd, gt, mode="train")
params = v["params"]


def try_case(name, fn, *args):
    try:
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        print(f"{name}: OK", flush=True)
        return True
    except Exception as e:
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:150]}", flush=True)
        return False


# 1. grad of full train loss, single level, banded, remat off
cfg_noremat = Config(level=-1, N_iters=2, remat=0)
m2 = LMS2GP(cfg=cfg_noremat)


def loss_noremat(p):
    out = m2.apply({"params": p}, sat, grd, gt, mode="train",
                   rngs={"lm": jax.random.PRNGKey(0)})
    return out.loss


try_case("grad scan-noremat banded L-1", jax.jit(jax.grad(loss_noremat)), params)


# 2. with remat
def loss_remat(p):
    out = model.apply({"params": p}, sat, grd, gt, mode="train",
                      rngs={"lm": jax.random.PRNGKey(0)})
    return out.loss


try_case("grad scan+remat banded L-1", jax.jit(jax.grad(loss_remat)), params)

# 3. full level-3 config, no remat
cfg3 = Config(level=3, N_iters=5, remat=0)
m3 = LMS2GP(cfg=cfg3)
v3 = m3.init({"params": jax.random.PRNGKey(0),
              "lm": jax.random.PRNGKey(1)}, sat, grd, gt, mode="train")


def loss3(p):
    out = m3.apply({"params": p}, sat, grd, gt, mode="train",
                   rngs={"lm": jax.random.PRNGKey(0)})
    return out.loss


try_case("grad scan-noremat banded L3", jax.jit(jax.grad(loss3)), v3["params"])
