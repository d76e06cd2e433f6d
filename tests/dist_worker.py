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
# host snapshot BEFORE the donated train step: replicate()'s device_put
# aliases the source device-0 buffer, so donation deletes variables too
host_params = jax.tree_util.tree_map(np.asarray, variables["params"])
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

# ---- multi-host checkpoint round-trip (SURVEY §5.4/P10) -------------------
# save_params/save_train_state are COLLECTIVE on multi-host: every process
# calls them; orbax syncs internally and the primary host writes.  Then
# every process restores from the shared path and continues one step —
# which must equal continuing from the in-memory state exactly.
import tempfile

from highlyaccurate_tpu.train.checkpoint import (load_train_state,
                                                 save_params,
                                                 save_train_state)
from highlyaccurate_tpu.train.state import create_train_state as _cts

save_dir = os.path.join(tempfile.gettempdir(), f"dist_ckpt_{port}")
os.makedirs(save_dir, exist_ok=True)
save_params(save_dir, "model_0", state.params)
save_train_state(save_dir, "model_0", state)
dist.barrier("ckpt-write")
assert os.path.isdir(os.path.join(save_dir, "model_0")), \
    "process 0 must have written the checkpoint before the barrier released"

template = _cts(cfg, host_params)
restored = load_train_state(save_dir, "model_0", template)
r_state = step_lib.replicate(mesh, restored)

_, m_mem = ts(state, b["sat"], b["grd"], b["gt"], jax.random.PRNGKey(1))
_, m_res = ts(r_state, b["sat"], b["grd"], b["gt"], jax.random.PRNGKey(1))
l_mem = float(np.asarray(m_mem["loss"].addressable_data(0)))
l_res = float(np.asarray(m_res["loss"].addressable_data(0)))
assert l_mem == l_res, (l_mem, l_res)   # bit-equal continuation
print(f"CKPTLOSS {proc_id} {l_res:.9e}", flush=True)
