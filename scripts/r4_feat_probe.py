"""Round-4 feature-pass decomposition probe (TPU, one bundled process).

At the round-4 tree the flagship eval (b32 bf16) is ~200 ms/batch with the
feature pass measured at ~106 ms (scripts/r4_eval_profile.py) — features
are now the MAJORITY of eval time, so this probe answers where those
~106 ms go and whether any conv underruns the MXU:

  1. flagship eval fps guard (b32 bf16)
  2. features-only, both branches (ms/batch) + encoder-only per branch
  3. standalone per-conv timings for every distinct (spatial, Cin, Cout)
     in the live level<=3 path, with achieved TFLOP/s (v5e bf16 peak ~197)
  4. conf heads (Cout=1 — the MXU-tile pathology suspect) and the same
     conv padded to Cout=8/128 (channel 0 numerics identical: extra output
     channels are discarded; tests whether lane padding beats Cout=1)
  5. l2_norm_wholemap standalone (memory-bound reduce suspect)
  6. features fwd+bwd (the train-step share)

Patterns (see scripts/r4_g2sp_decomp.py): big arrays as jit ARGUMENTS,
carry-chained calls so dispatch can't CSE, np.asarray scalar fetch as the
fence (block_until_ready does not fence on the axon platform).
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
    B = 32
    cfg = Config(level=3, N_iters=5, compute_dtype="bfloat16")
    model = LMS2GP(cfg=cfg)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd,
                   jnp.zeros((B, 3)), mode="train")
    params = v["params"]

    def timeit(name, fn, n=10, flops=None):
        try:
            c = fn(jnp.zeros(()))
            np.asarray(c)
            t0 = time.perf_counter()
            c = jnp.zeros(())
            for _ in range(n):
                c = fn(c)
            np.asarray(c)
            ms = (time.perf_counter() - t0) / n * 1e3
            tail = ""
            if flops:
                tail = f"  {flops / (ms * 1e-3) / 1e12:.1f} TFLOP/s"
            print(f"RESULT {name} {ms:.2f} ms/call{tail}", flush=True)
            return ms
        except Exception as e:
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}",
                  flush=True)
            return float("nan")

    # ---- 1: guard ----
    try:
        fps = _bench_eval_fps(LMS2GP, cfg, B, 10)
        print(f"RESULT flagship_bf16_b32_guard {fps:.2f} fps", flush=True)
    except Exception as e:
        print(f"RESULT flagship_bf16_b32_guard FAILED {e}", flush=True)

    # ---- 2: features-only, both branches ----
    def feats_m(m, s, g):
        sf, sc = m.SatFeatureNet(s)
        gf, gc = m.GrdFeatureNet(g)
        return sf, sc, gf, gc

    @jax.jit
    def feats_jit(p, s, g, c):
        outs = model.apply({"params": p}, s + c * 1e-38, g, method=feats_m)
        return c + sum(jnp.sum(t.astype(jnp.float32)) * 1e-30
                       for group in outs for t in group)

    timeit("features_both_b32", lambda c: feats_jit(params, sat, grd, c))

    @jax.jit
    def feats_sat_jit(p, s, c):
        sf, sc = model.apply({"params": p}, s + c * 1e-38,
                             method=lambda m, x: m.SatFeatureNet(x))
        return c + sum(jnp.sum(t.astype(jnp.float32)) * 1e-30
                       for t in list(sf) + list(sc))

    timeit("features_sat_b32", lambda c: feats_sat_jit(params, sat, c))

    # fwd+bwd: the train-step share of the feature pass
    @jax.jit
    def feats_grad_jit(p, s, g, c):
        def loss(p):
            outs = model.apply({"params": p}, s + c * 1e-38, g,
                               method=feats_m)
            return sum(jnp.sum(t.astype(jnp.float32)) for group in outs
                       for t in group)
        gr = jax.grad(loss)(p)
        lv = sum(jnp.sum(x.astype(jnp.float32) ** 2)
                 for x in jax.tree_util.tree_leaves(gr))
        return c + lv * 1e-30

    timeit("features_both_fwdbwd_b32",
           lambda c: feats_grad_jit(params, sat, grd, c), n=5)

    # ---- 3: standalone convs (sat-branch spatial shapes; grd matches px) ----
    import flax.linen as nn

    def conv_probe(name, H, W, cin, cout, n=10):
        mod = nn.Conv(cout, (3, 3), padding=1, use_bias=False,
                      dtype=jnp.bfloat16)
        x = jnp.asarray(rng.rand(B, H, W, cin).astype(np.float32))
        p = mod.init(jax.random.PRNGKey(0), x)

        @jax.jit
        def f(p, x, c):
            y = mod.apply(p, x + c * 1e-38)
            return c + jnp.sum(y.astype(jnp.float32)) * 1e-30

        flops = 2.0 * B * H * W * cout * cin * 9
        return timeit(name, lambda c: f(p, x, c), n=n, flops=flops)

    conv_probe("conv0_3to64_512", 512, 512, 3, 64)
    # input-channel padding experiment: conv0 measured 24% MXU (round-4
    # early-conv study).  If Cin=4/8 beats Cin=3, zero-padding the RGB
    # input (kernel rows zero) is a numerics-identical lever.
    conv_probe("conv0pad_4to64_512", 512, 512, 4, 64)
    conv_probe("conv0pad_8to64_512", 512, 512, 8, 64)
    conv_probe("conv2_64to64_512", 512, 512, 64, 64)
    conv_probe("conv5_64to128_256", 256, 256, 64, 128)
    conv_probe("conv7_128to128_256", 256, 256, 128, 128)
    conv_probe("conv10_128to256_128", 128, 128, 128, 256)
    conv_probe("conv12_256to256_128", 128, 128, 256, 256)
    conv_probe("dec1a_384to128_128", 128, 128, 384, 128)
    conv_probe("dec2a_192to64_256", 256, 256, 192, 64)
    conv_probe("dec2b_64to64_256", 256, 256, 64, 64)
    # tile-padding experiment: is Cout=64 at 512^2 underrunning the MXU?
    conv_probe("conv2pad_64to128_512", 512, 512, 64, 128)

    # ---- 4: conf heads — Cout=1 vs lane-padded ----
    conv_probe("conf1_128to1_128", 128, 128, 128, 1)
    conv_probe("conf2_64to1_256", 256, 256, 64, 1)
    conv_probe("conf2pad8_64to8_256", 256, 256, 64, 8)
    conv_probe("conf2pad128_64to128_256", 256, 256, 64, 128)

    # ---- 5: l2_norm_wholemap standalone on the finest used level ----
    from highlyaccurate_tpu.models.vggunet import l2_norm_wholemap
    xf = jnp.asarray(rng.rand(B, 256, 256, 64).astype(np.float32)
                     ).astype(jnp.bfloat16)

    @jax.jit
    def l2_jit(x, c):
        y = l2_norm_wholemap(x + c.astype(x.dtype) * 1e-30)
        return c + jnp.sum(y.astype(jnp.float32)) * 1e-30

    timeit("l2norm_256x256x64_b32", lambda c: l2_jit(xf, c))

    # ---- 6: maxpool (layout suspect at 512^2) ----
    xp = jnp.asarray(rng.rand(B, 512, 512, 64).astype(np.float32)
                     ).astype(jnp.bfloat16)

    @jax.jit
    def pool_jit(x, c):
        y = nn.max_pool(x + c.astype(x.dtype) * 1e-30, (2, 2),
                        strides=(2, 2))
        return c + jnp.sum(y.astype(jnp.float32)) * 1e-30

    timeit("maxpool_512_64_b32", lambda c: pool_jit(xp, c))


if __name__ == "__main__":
    main()
