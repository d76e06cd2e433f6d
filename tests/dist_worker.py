"""2-process jax.distributed data-parallel worker (CPU simulation)."""
import os
import sys

proc_id, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=2")
import jax
jax.distributed.initialize(f"localhost:{port}", num_processes=n_proc,
                           process_id=proc_id)
import numpy as np
import jax.numpy as jnp
from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
from highlyaccurate_tpu.train import step as step_lib
from highlyaccurate_tpu.train import distributed as dist
from highlyaccurate_tpu.train.state import create_train_state

assert jax.process_count() == n_proc
assert len(jax.devices()) == 2 * n_proc, jax.devices()

cfg = Config(grd_h=32, grd_w=128, sat_size=64, N_iters=1, level=-1,
             use_banded_warp=0)
model = LMS2GP(cfg=cfg)
G = 4
rng = np.random.RandomState(0)
sat = rng.rand(G, 64, 64, 3).astype(np.float32)
grd = rng.rand(G, 32, 128, 3).astype(np.float32)
gt = rng.uniform(-0.5, 0.5, (G, 3)).astype(np.float32)

local = dist.local_batch_slice(G)
lo = proc_id * local
mesh = step_lib.make_mesh(jax.devices())
b = dist.global_batch_from_host_shards(
    mesh, {"sat": sat[lo:lo + local], "grd": grd[lo:lo + local],
           "gt": gt[lo:lo + local]})

variables = model.init({"params": jax.random.PRNGKey(0),
                        "lm": jax.random.PRNGKey(1)},
                       jnp.asarray(sat[:1]), jnp.asarray(grd[:1]),
                       jnp.asarray(gt[:1]), mode="train")
state = create_train_state(cfg, variables["params"])
state = step_lib.replicate(mesh, state)
ts = step_lib.make_train_step(model, cfg, mesh)
state, metrics = ts(state, b["sat"], b["grd"], b["gt"], jax.random.PRNGKey(0))
loss = float(np.asarray(metrics["loss"].addressable_data(0)))
print(f"DISTLOSS {proc_id} {loss:.6f}", flush=True)

# single-process ground truth on the same global batch (proc 0 only,
# plain single-device jit) for gradient-equality comparison
if proc_id == 0:
    v2 = model.init({"params": jax.random.PRNGKey(0),
                     "lm": jax.random.PRNGKey(1)},
                    jnp.asarray(sat[:1]), jnp.asarray(grd[:1]),
                    jnp.asarray(gt[:1]), mode="train")
    s1 = create_train_state(cfg, v2["params"])
    ts1 = step_lib.make_train_step(model, cfg, mesh=None)
    _, m1 = ts1(s1, jnp.asarray(sat), jnp.asarray(grd), jnp.asarray(gt),
                jax.random.PRNGKey(0))
    print(f"SINGLELOSS {float(m1['loss']):.6f}", flush=True)
