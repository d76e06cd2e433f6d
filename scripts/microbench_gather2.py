"""Gather shootout round 2: slice-based gathers (2x2xC block per point) and
row-pair strategies vs the 4-corner baseline, at the post-fix L2 shape."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, A, C = 8, 256, 64
P = 64 * 512
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
    y0 = jnp.asarray(rng.randint(0, A - 1, (B, P)).astype(np.int32))
    x0 = jnp.asarray(rng.randint(0, A - 1, (B, P)).astype(np.int32))

    def v_four_corner(img, y0, x0):
        flat = img.reshape(B, A * A, C)
        out = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                idx = (y0 + dy) * A + (x0 + dx)
                out = out + jnp.take_along_axis(flat, idx[..., None], axis=1)
        return jnp.sum(out)

    def v_block_gather(img, y0, x0):
        # one gather of a [2, 2, C] block per point
        def per_b(im, ys, xs):
            starts = jnp.stack([ys, xs], axis=-1)  # [P, 2]
            dnums = lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3),
                collapsed_slice_dims=(),
                start_index_map=(0, 1))
            return lax.gather(im, starts, dnums, slice_sizes=(2, 2, C),
                              mode=lax.GatherScatterMode.CLIP)
        out = jax.vmap(per_b)(img, y0, x0)  # [B, P, 2, 2, C]
        return jnp.sum(out)

    def v_rowpair_gather(img, y0, x0):
        # gather [2, A, C] row-pairs per point row-group? -> per point: rows
        # then in-register column select. Here: gather full 2-row strip per
        # point (2*A*C each) is too big; instead gather [2, 8, C] strips.
        def per_b(im, ys, xs):
            xs8 = jnp.minimum(xs, A - 8)
            starts = jnp.stack([ys, xs8], axis=-1)
            dnums = lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1))
            return lax.gather(im, starts, dnums, slice_sizes=(2, 8, C),
                              mode=lax.GatherScatterMode.CLIP)
        out = jax.vmap(per_b)(img, y0, x0)
        return jnp.sum(out)

    def v_two_col_pairs(img, y0, x0):
        # 2 gathers of [1, 2, C] (x-pair) rows at y0 and y0+1
        def per_b(im, ys, xs):
            dnums = lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1))
            a = lax.gather(im, jnp.stack([ys, xs], -1), dnums,
                           slice_sizes=(1, 2, C),
                           mode=lax.GatherScatterMode.CLIP)
            b = lax.gather(im, jnp.stack([ys + 1, xs], -1), dnums,
                           slice_sizes=(1, 2, C),
                           mode=lax.GatherScatterMode.CLIP)
            return a, b
        a, b = jax.vmap(per_b)(img, y0, x0)
        return jnp.sum(a) + jnp.sum(b)

    timeit("4x take_along_axis corners", jax.jit(v_four_corner), img, y0, x0)
    timeit("1x block gather [2,2,C]", jax.jit(v_block_gather), img, y0, x0)
    timeit("2x gather [1,2,C] row pairs", jax.jit(v_two_col_pairs), img, y0, x0)
    timeit("1x strip gather [2,8,C]", jax.jit(v_rowpair_gather), img, y0, x0)


if __name__ == "__main__":
    main()
