"""Round-4 follow-up probe: reshape-max pool swap + batch headroom (TPU).

scripts/r4_feat_probe.py measured nn.max_pool (lax.reduce_window) at
11.2 ms standalone for [32, 512, 512, 64]; models/vggunet.py now pools via
reshape+max (bit-identical, tests/test_vggunet.py).  This probe measures:

  1. reshape-max pool standalone vs the reduce_window number (same shape)
  2. features-both in-graph time at the new tree (was 99.86 ms)
  3. flagship eval fps guard (was 157.8-160.3 fps)
  4. eval fps at batch 40 / 48 (b32 was the measured saturation point and
     b64 OOMs; run LAST so an OOM cannot lose the earlier results)

Same timing pattern as r4_feat_probe.py: carry-chained jit calls,
np.asarray fetch as the fence.
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

    def timeit(name, fn, n=10):
        try:
            c = fn(jnp.zeros(()))
            np.asarray(c)
            t0 = time.perf_counter()
            c = jnp.zeros(())
            for _ in range(n):
                c = fn(c)
            np.asarray(c)
            ms = (time.perf_counter() - t0) / n * 1e3
            print(f"RESULT {name} {ms:.2f} ms/call", flush=True)
            return ms
        except Exception as e:
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}",
                  flush=True)
            return float("nan")

    rng = np.random.RandomState(0)

    # ---- 1: reshape-max pool standalone ----
    from highlyaccurate_tpu.models.vggunet import max_pool_2x2
    xp = jnp.asarray(rng.rand(32, 512, 512, 64).astype(np.float32)
                     ).astype(jnp.bfloat16)

    @jax.jit
    def pool_jit(x, c):
        y = max_pool_2x2(x + c.astype(x.dtype) * 1e-30)
        return c + jnp.sum(y.astype(jnp.float32)) * 1e-30

    timeit("maxpool_reshape_512_64_b32", lambda c: pool_jit(xp, c))

    # ---- 2: features-both at the new tree ----
    B = 32
    cfg = Config(level=3, N_iters=5, compute_dtype="bfloat16")
    model = LMS2GP(cfg=cfg)
    sat = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd,
                   jnp.zeros((B, 3)), mode="train")
    params = v["params"]

    def feats_m(m, s, g):
        sf, sc = m.SatFeatureNet(s)
        gf, gc = m.GrdFeatureNet(g)
        return sf, sc, gf, gc

    @jax.jit
    def feats_jit(p, s, g, c):
        outs = model.apply({"params": p}, s + c * 1e-38, g, method=feats_m)
        return c + sum(jnp.sum(t.astype(jnp.float32)) * 1e-30
                       for group in outs for t in group)

    timeit("features_both_b32_reshapepool",
           lambda c: feats_jit(params, sat, grd, c))

    # ---- 2b: decoder concat-conv vs split-conv ----
    # conv(concat(a, b)) == conv_a(a) + conv_b(b) with the kernel split on
    # input channels (linear in Cin; accumulation order differs by ~1 ulp).
    # If XLA materializes the concat, the split saves a 0.4-0.8 GB HBM
    # round-trip per decoder stage.
    import flax.linen as nn

    def split_probe(name, H, W, ca, cb, cout, n=10):
        a = jnp.asarray(rng.rand(B, H, W, ca).astype(np.float32)
                        ).astype(jnp.bfloat16)
        b = jnp.asarray(rng.rand(B, H, W, cb).astype(np.float32)
                        ).astype(jnp.bfloat16)
        mod = nn.Conv(cout, (3, 3), padding=1, use_bias=False,
                      dtype=jnp.bfloat16)
        pc = mod.init(jax.random.PRNGKey(0),
                      jnp.zeros((1, 8, 8, ca + cb), jnp.bfloat16))
        k = pc["params"]["kernel"]
        pa = {"params": {"kernel": k[:, :, :ca]}}
        pb = {"params": {"kernel": k[:, :, ca:]}}
        moda = nn.Conv(cout, (3, 3), padding=1, use_bias=False,
                       dtype=jnp.bfloat16)

        @jax.jit
        def f_cat(a, b, c):
            y = mod.apply(pc, jnp.concatenate(
                [a + c.astype(a.dtype) * 1e-30, b], axis=-1))
            return c + jnp.sum(y.astype(jnp.float32)) * 1e-30

        @jax.jit
        def f_split(a, b, c):
            y = (moda.apply(pa, a + c.astype(a.dtype) * 1e-30)
                 + moda.apply(pb, b))
            return c + jnp.sum(y.astype(jnp.float32)) * 1e-30

        timeit(f"{name}_cat", lambda c: f_cat(a, b, c), n=n)
        timeit(f"{name}_split", lambda c: f_split(a, b, c), n=n)

    split_probe("dec1a_256p128to128_128", 128, 128, 256, 128, 128)
    split_probe("dec2a_128p64to64_256", 256, 256, 128, 64, 64)

    # ---- 3: flagship guard ----
    try:
        fps = _bench_eval_fps(LMS2GP, cfg, B, 10)
        print(f"RESULT flagship_bf16_b32_reshapepool {fps:.2f} fps",
              flush=True)
    except Exception as e:
        print(f"RESULT flagship_bf16_b32_reshapepool FAILED {e}", flush=True)

    # ---- 4: batch headroom (LAST: may OOM) ----
    for Bx in (40, 48):
        try:
            fps = _bench_eval_fps(LMS2GP, cfg, Bx, 6)
            print(f"RESULT flagship_bf16_b{Bx} {fps:.2f} fps", flush=True)
        except Exception as e:
            print(f"RESULT flagship_bf16_b{Bx} FAILED "
                  f"{type(e).__name__}: {e}", flush=True)
            break


if __name__ == "__main__":
    main()
