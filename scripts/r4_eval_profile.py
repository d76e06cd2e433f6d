"""Round-4 eval-throughput profile (VERDICT r3 #8: default eval >= 130 fps).

One TPU process, bundled:
  1. flagship bf16 eval fps at batch 8 / 16 / 32 (is the production config
     leaving batch-parallelism on the table? eval is embarrassingly
     parallel over images, unlike train where batch-16 measured negative)
  2. features-vs-solver split at bf16 per batch size
  3. early-conv microbench: XLA conv (C_in=3) vs im2col patches+matmul for
     the VGG conv1_1 shape — quantifies the "layout-bound early convs"
     hypothesis (round-3 decomposition: VGG fwd 24% MXU)

Fetch-fenced (np.asarray), chained-dispatch protocol as bench.py.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import _bench_eval_fps
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

    print(f"devices: {jax.devices()}", flush=True)
    rng = np.random.RandomState(0)

    # ---- 1+2: batch sweep, eval + features split ----
    for batch in (8, 16, 32):
        cfg = Config(level=3, N_iters=5, compute_dtype="bfloat16")
        try:
            fps = _bench_eval_fps(LMS2GP, cfg, batch, 10)
            print(f"RESULT eval_bf16_b{batch} {fps:.2f} fps "
                  f"({1e3 * batch / fps:.1f} ms/batch)", flush=True)
        except Exception as e:
            print(f"RESULT eval_bf16_b{batch} FAILED {type(e).__name__}: {e}",
                  flush=True)
            continue
        try:
            model = LMS2GP(cfg=cfg)
            sat = jnp.asarray(rng.rand(batch, 512, 512, 3).astype(np.float32))
            grd = jnp.asarray(rng.rand(batch, 256, 1024, 3)
                              .astype(np.float32))
            v = model.init({"params": jax.random.PRNGKey(0),
                            "lm": jax.random.PRNGKey(1)}, sat, grd,
                           jnp.zeros((batch, 3)), mode="train")
            feat = jax.jit(lambda p, s, g: model.apply(
                {"params": p}, s, g, method="extract_features"))
            out = feat(v["params"], sat, grd)
            np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
            t0 = time.perf_counter()
            for _ in range(10):
                out = feat(v["params"], sat, grd)
            np.asarray(jax.tree_util.tree_leaves(out)[0][0, 0, 0])
            ms = (time.perf_counter() - t0) / 10 * 1e3
            print(f"RESULT features_bf16_b{batch} {ms:.2f} ms/batch",
                  flush=True)
        except Exception as e:
            print(f"RESULT features_bf16_b{batch} FAILED "
                  f"{type(e).__name__}: {e}", flush=True)

    # ---- 3: early-conv formulation microbench (grd conv1_1 shape) ----
    # XLA conv with C_in=3 pads the channel dim onto 8x128 tiles; the
    # im2col formulation rewrites it as [B*H*W, 27] @ [27, 64].
    B, H, W = 8, 256, 1024
    x = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32),
                    dtype=jnp.bfloat16)
    k = jnp.asarray(rng.randn(3, 3, 3, 64).astype(np.float32) * 0.05,
                    dtype=jnp.bfloat16)

    @jax.jit
    def conv_xla(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    @jax.jit
    def conv_im2col(x, k):
        p = jax.lax.conv_general_dilated_patches(
            x, (3, 3), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B,H,W,27]
        return p.reshape(B, H, W, 27) @ k.reshape(27, 64)

    for name, fn in (("conv1_xla", conv_xla), ("conv1_im2col", conv_im2col)):
        try:
            o = fn(x, k)
            np.asarray(o[0, 0, 0])
            t0 = time.perf_counter()
            for _ in range(20):
                o = fn(x, k)
            np.asarray(o[0, 0, 0])
            ms = (time.perf_counter() - t0) / 20 * 1e3
            print(f"RESULT {name} {ms:.3f} ms (B8 256x1024x3->64)",
                  flush=True)
        except Exception as e:
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}", flush=True)
    # numerical sanity: the two formulations agree
    try:
        d = float(jnp.max(jnp.abs(conv_xla(x, k) - conv_im2col(x, k))))
        print(f"RESULT conv1_maxdiff {d:.2e}", flush=True)
    except Exception as e:
        print(f"RESULT conv1_maxdiff FAILED {e}", flush=True)


if __name__ == "__main__":
    main()
