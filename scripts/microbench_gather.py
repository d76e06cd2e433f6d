"""Gather strategy shootout at the hot level-2 shape + post-fix eval timing.

L2 shape (after the bottom-half-rows fix): sample P=64x512=32768 points per
image from a [256, 256, 64] satellite map, batch 8, 4 corners.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, A, C = 8, 256, 64
H, W = 64, 512
P = H * W
REPS = 5


def fence(out):
    np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]


def timeit(name, fn, *args):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    fence(out)
    dt = (time.perf_counter() - t0) / REPS * 1e3
    print(f"{name}: {dt:.2f} ms", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, A * A, (B, P)).astype(np.int32))

    def v_take_along(img, idx):
        flat = img.reshape(B, A * A, C)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.sum(out)

    def v_global_take(img, idx):
        flat = img.reshape(B * A * A, C)
        gidx = idx + (jnp.arange(B) * (A * A))[:, None]
        out = jnp.take(flat, gidx.reshape(-1), axis=0)
        return jnp.sum(out)

    def v_channel_last_gather(img, idx):
        # [B, C, A*A], gather along the minor (lane) axis
        t = jnp.transpose(img.reshape(B, A * A, C), (0, 2, 1))
        out = jnp.take_along_axis(t, idx[:, None, :], axis=2)
        return jnp.sum(out)

    def v_onehot_rowsplit(img, idx):
        # split the 2D index into row/col; gather rows by one-hot matmul,
        # then pick columns by a second one-hot: 2 MXU matmuls, no gather.
        # rows: [B, P] -> one-hot [B, P, A] @ img [B, A, A*C]
        r = idx // A
        c = idx % A
        oh_r = jax.nn.one_hot(r, A, dtype=img.dtype)  # [B, P, A]
        rows = jnp.einsum("bpa,bawc->bpwc", oh_r, img)  # [B, P, A, C]
        oh_c = jax.nn.one_hot(c, A, dtype=img.dtype)  # [B, P, A]
        out = jnp.einsum("bpw,bpwc->bpc", oh_c, rows)
        return jnp.sum(out)

    def v_take_bf16(img, idx):
        flat = img.astype(jnp.bfloat16).reshape(B, A * A, C)
        out = jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.sum(out.astype(jnp.float32))

    timeit("take_along_axis (rows of C)", jax.jit(v_take_along), img, idx)
    timeit("global jnp.take rows", jax.jit(v_global_take), img, idx)
    timeit("lane-axis gather [B,C,A^2]", jax.jit(v_channel_last_gather), img, idx)
    timeit("bf16 take_along_axis", jax.jit(v_take_bf16), img, idx)
    # one-hot is O(P*A*C) flops = 34 GF/batch — viable if MXU-bound
    timeit("one-hot row+col matmul", jax.jit(v_onehot_rowsplit), img, idx)

    # --- full eval after the bottom-half fix -------------------------------
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
    cfg = Config(level=3, N_iters=5)
    model = LMS2GP(cfg=cfg)
    sat = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd,
                   jnp.zeros((B, 3)), mode="train")
    ev = jax.jit(lambda p, s, g, k: model.apply(
        {"params": p}, s, g, mode="test", rngs={"lm": k}))
    ms = timeit("full eval (bottom-half sampling fix)", ev, v["params"],
                sat, grd, jax.random.PRNGKey(0))
    print(f"  -> {B / (ms / 1e3):.1f} frames/sec", flush=True)


if __name__ == "__main__":
    main()
