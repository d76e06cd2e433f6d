"""Round-3 TPU probe: implicit-gather eval, G2SP breakdown, train profile.

One process = one TPU claim, one remote-compile session (CLAUDE.md).
Fencing via scalar device->host fetches (block_until_ready does not fence
on the axon platform).

Measurements:
  1. flagship banded eval fps (sanity vs round-2 104.9)
  2. gather-path implicit-J eval fps (VERDICT #2; round-1 gather was 28.4)
  3. G2SP eval fps + per-level projline kernel-only times (VERDICT #3)
  4. train step ms + peak HBM at batch 8 (and fwd-only share) (VERDICT #4)

Usage: python scripts/r3_probe.py [--skip N]  (skip the first N phases)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP, _level_hw, level_slots

B = 8
REPS = 20


def _scalarize(fn):
    def g(*args):
        out = fn(*args)
        return sum(jnp.sum(leaf) for leaf in jax.tree_util.tree_leaves(out))
    return jax.jit(g)


def bench(name, fn, *args, reps=REPS):
    g = _scalarize(fn)
    np.asarray(g(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = g(*args)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name}: {dt:.2f} ms/call", flush=True)
    return dt


def mem_stats(tag):
    try:
        s = jax.local_devices()[0].memory_stats()
        peak = s.get("peak_bytes_in_use", 0) / 2**30
        cur = s.get("bytes_in_use", 0) / 2**30
        print(f"hbm[{tag}]: peak {peak:.2f} GiB, current {cur:.2f} GiB",
              flush=True)
    except Exception as e:
        print(f"hbm[{tag}]: unavailable ({type(e).__name__})", flush=True)


def eval_fps(model, params, args_, tag, reps=30):
    @jax.jit
    def ev(params, carry, key):
        out = model.apply({"params": params}, args_[0] + carry * 1e-38,
                          *args_[1:], mode="test", rngs={"lm": key})
        return carry + jnp.sum(out[0]) * 1e-30

    carry = ev(params, jnp.zeros(()), jax.random.PRNGKey(0))
    np.asarray(carry)
    t0 = time.perf_counter()
    carry = jnp.zeros(())
    for i in range(reps):
        carry = ev(params, carry, jax.random.fold_in(jax.random.PRNGKey(0), i))
    np.asarray(carry)
    fps = B * reps / (time.perf_counter() - t0)
    print(f"{tag}: {fps:.2f} fps (batch {B})", flush=True)
    return fps


def main():
    skip = 0
    if "--skip" in sys.argv:
        skip = int(sys.argv[sys.argv.index("--skip") + 1])
    stop = 99
    if "--stop" in sys.argv:
        stop = int(sys.argv[sys.argv.index("--stop") + 1])
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
    gt = jnp.zeros((B, 3))

    cfg = Config(level=3, N_iters=5)
    model = LMS2GP(cfg=cfg)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd, gt, mode="train")
    params = v["params"]

    # --- 1: flagship banded eval sanity ---
    if skip < 1:
        eval_fps(model, params, (sat, grd), "flagship_banded_eval")
        mem_stats("flagship_eval")

    # --- 2: gather-path implicit eval (VERDICT #2) ---
    if skip < 2:
        gcfg = Config(level=3, N_iters=5, use_banded_warp=0)
        gmodel = LMS2GP(cfg=gcfg)
        eval_fps(gmodel, params, (sat, grd), "gather_implicit_eval")
        mem_stats("gather_eval")

    # --- 3: G2SP eval + per-level projline kernel times ---
    if skip < 3:
        from highlyaccurate_tpu.geometry.kitti import DEFAULT_CAMERA_K
        from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
        k = jnp.asarray(np.broadcast_to(DEFAULT_CAMERA_K, (B, 3, 3)).copy())
        g2cfg = Config(level=3, N_iters=5, direction="G2SP")
        g2 = LMG2SP(cfg=g2cfg)
        v2 = g2.init({"params": jax.random.PRNGKey(0),
                      "lm": jax.random.PRNGKey(1)}, sat, grd, k, gt,
                     mode="train")
        eval_fps(g2, v2["params"], (sat, grd, k), "g2sp_eval")

        # kernel-only per level: the projline sampler on realistic coefs
        from highlyaccurate_tpu.geometry import kitti as geom
        from highlyaccurate_tpu.ops.pallas.banded_warp import (
            make_projline_sampler, pack_projline_coefs, projline_supported)
        pose = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 3)).astype(np.float32))
        for slot in (0, 1, 2):
            A = 512 // (2 ** (3 - slot))
            Hg, Wg = 256 // (2 ** (3 - slot)), 1024 // (2 ** (3 - slot))
            C = {0: 256, 1: 128, 2: 64, 3: 16}[slot]
            if not projline_supported(Hg, Wg, C):
                print(f"projline L{slot}: unsupported", flush=True)
                continue
            XYZ1 = jnp.asarray(geom.warp_sat2real(A))
            P = geom.g2sp_P(pose, k, Hg, Wg, 256, 1024, 10.0, 20.0, 20.0)
            X0, dX = XYZ1[0], XYZ1[1] - XYZ1[0]
            h0 = jnp.einsum("bik,jk->bji", P, X0)
            dh = jnp.einsum("bik,jk->bji", P, dX)
            coefs = pack_projline_coefs(h0, dh, Hg, Wg, Hg, A)
            img = jnp.asarray(rng.rand(B, Hg, Wg, C).astype(np.float32))
            sampler = make_projline_sampler(AY=Hg, AX=Wg, C=C, V=A, W=A)
            bench(f"projline_L{slot} (A={A} map {Hg}x{Wg}x{C})",
                  sampler, img, coefs)

    # --- 4: train profile (VERDICT #4) ---
    if skip < 4 and stop >= 4:
        from highlyaccurate_tpu.train import step as step_lib
        from highlyaccurate_tpu.train.state import create_train_state

        def fwd_only(params, key):
            out = model.apply({"params": params}, sat, grd, gt, mode="train",
                              rngs={"lm": key})
            return out.loss

        bench("train_fwd_only", fwd_only, params, jax.random.PRNGKey(0))

        def loss_grad(params, key):
            return jax.value_and_grad(
                lambda p: model.apply({"params": p}, sat, grd, gt,
                                      mode="train", rngs={"lm": key}).loss
            )(params)

        bench("train_fwd_bwd", loss_grad, params, jax.random.PRNGKey(0))
        mem_stats("fwd_bwd_b8")

        state = create_train_state(cfg, jax.device_get(params))
        ts = step_lib.make_train_step(model, cfg, mesh=None)
        st, metrics = ts(state, sat, grd, gt, jax.random.PRNGKey(0))
        np.asarray(metrics["loss"])
        t0 = time.perf_counter()
        for i in range(10):
            st, metrics = ts(st, sat, grd, gt, jax.random.PRNGKey(i))
        np.asarray(metrics["loss"])
        dt = (time.perf_counter() - t0) / 10 * 1e3
        print(f"train_step: {dt:.2f} ms -> {B / dt * 1e3:.2f} fps", flush=True)
        mem_stats("train_step_b8")

        # bf16 feature-compute full train step (mixed precision: fp32
        # params/Adam/LM solve)
        import dataclasses as _dc
        bcfg = _dc.replace(cfg, compute_dtype="bfloat16")
        bmodel = LMS2GP(cfg=bcfg)
        bts = step_lib.make_train_step(bmodel, bcfg, mesh=None)
        bstate = create_train_state(bcfg, jax.device_get(params))
        bstate, m2 = bts(bstate, sat, grd, gt, jax.random.PRNGKey(0))
        np.asarray(m2["loss"])
        t0 = time.perf_counter()
        for i in range(10):
            bstate, m2 = bts(bstate, sat, grd, gt, jax.random.PRNGKey(i))
        np.asarray(m2["loss"])
        dt = (time.perf_counter() - t0) / 10 * 1e3
        print(f"bf16_train_step: {dt:.2f} ms -> {B / dt * 1e3:.2f} fps",
              flush=True)

    # --- 5: train decomposition (where do the 230 ms go?) ---
    if skip < 5 and stop >= 5:
        import dataclasses

        # non-constant cotangent (sum of squares) + grads RETURNED from the
        # benched fn — returning only the value lets XLA dead-code-eliminate
        # the whole backward (the first phase-5 run proved it: fwd_bwd == fwd)
        def vgg_loss(params, x_sat, x_grd):
            sf, sc, gf, gc = model.apply({"params": params}, x_sat, x_grd,
                                         method="extract_features")
            return (sum(jnp.sum(f * f) for f in sf)
                    + sum(jnp.sum(f * f) for f in gf)) * 1e-6

        bench("vgg_fwd", vgg_loss, params, sat, grd)
        bench("vgg_fwd_bwd",
              lambda p, s, g: jax.value_and_grad(vgg_loss)(p, s, g),
              params, sat, grd)

        # (solver-only share = full fwd_bwd minus the vgg numbers above)
        # bf16 feature-compute training step
        bf_cfg = dataclasses.replace(cfg, compute_dtype="bfloat16")
        bf_model = LMS2GP(cfg=bf_cfg)

        def bf_loss(params, key):
            return bf_model.apply({"params": params}, sat, grd, gt,
                                  mode="train", rngs={"lm": key}).loss

        bench("bf16_train_fwd_bwd",
              lambda p, k: jax.value_and_grad(bf_loss)(p, k),
              params, jax.random.PRNGKey(0))

        # batch-16 step
        sat16 = jnp.concatenate([sat, sat])
        grd16 = jnp.concatenate([grd, grd])
        gt16 = jnp.concatenate([gt, gt])

        def loss16(params, key):
            return model.apply({"params": params}, sat16, grd16, gt16,
                               mode="train", rngs={"lm": key}).loss

        dt16 = bench("b16_train_fwd_bwd",
                     lambda p, k: jax.value_and_grad(loss16)(p, k),
                     params, jax.random.PRNGKey(0), reps=10)
        print(f"b16 train: {16 / dt16 * 1e3:.2f} fps", flush=True)

        # remat at batch 8 (round-2 measured it HURTING; re-check on the
        # current kernels)
        rm_cfg = dataclasses.replace(cfg, remat=1)
        rm_model = LMS2GP(cfg=rm_cfg)

        def rm_loss(params, key):
            return rm_model.apply({"params": params}, sat, grd, gt,
                                  mode="train", rngs={"lm": key}).loss

        bench("remat_train_fwd_bwd",
              lambda p, k: jax.value_and_grad(rm_loss)(p, k),
              params, jax.random.PRNGKey(0))

    print("r3_probe done", flush=True)


if __name__ == "__main__":
    main()
