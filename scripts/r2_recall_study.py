"""Recall-impact study: sampler variants on CONVERGED features (VERDICT #5).

Round-1 left the banded kernel's ~0.1% floor-cell flips unquantified at the
recall level ("expected nil with converged features" was asserted, not
measured).  This study measures it:

  1. synthesize geometry-consistent data ON DEVICE: smooth random satellite
     textures; the ground view is the true S2GP warp of the satellite patch
     at a random gt pose (sky rows gray+noise) — so the LM solver's model
     assumptions hold exactly and training converges quickly;
  2. train the full model (reference defaults, batch 8) for --steps steps;
  3. run the fixed eval protocol (--eval-batches x 8 samples, fixed keys;
     default 512 samples) under each sampler variant and report the recall
     suite side by side:
       gather      use_banded_warp=0 (reference-faithful XLA gather path)
       banded32    banded kernel, fp32 map (windowed L2)
       banded16    banded kernel, bf16 map (DMA-free full-map; DEFAULT)
       bf16feat    compute_dtype=bfloat16 (bf16 features AND map)

One TPU process; all programs compile in this session.
Usage: python scripts/r2_recall_study.py [--steps 4000] [--eval-batches 64]
"""

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.eval.metrics import EvalResults
from highlyaccurate_tpu.geometry import kitti as geom
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP, precompute_rays
from highlyaccurate_tpu.ops.grid_sample import grid_sample

B = 8


def make_generator(cfg: Config):
    """jitted (key) -> (sat [B,512,512,3], grd [B,256,1024,3], gt [B,3])."""
    rays = precompute_rays(cfg)
    xyz = jnp.asarray(rays[3][0])    # [H, W, 3] full-res ground rays
    mask = jnp.asarray(rays[3][1])   # [H, W]

    @jax.jit
    def gen(key):
        # multi-scale smooth textures: long-range gradients for the coarse
        # LM basins plus mid-frequency detail for the fine levels
        k1, k2, k3, k4 = jax.random.split(key, 4)
        S = cfg.sat_size
        base = jax.image.resize(jax.random.uniform(k1, (B, 16, 16, 3)),
                                (B, S, S, 3), "linear")
        mid = jax.image.resize(jax.random.uniform(k4, (B, 64, 64, 3)),
                               (B, S, S, 3), "linear")
        sat = 0.7 * base + 0.3 * mid
        gt = jax.random.uniform(k2, (B, 3), minval=-1.0, maxval=1.0)
        uv = geom.s2gp_uv(gt, xyz, cfg.sat_size, cfg.rotation_range,
                          cfg.shift_range_lat, cfg.shift_range_lon)
        g, _ = grid_sample(sat, uv)
        g = g * mask[None, ..., None] + 0.5 * (1.0 - mask[None, ..., None])
        g = g + 0.01 * jax.random.normal(k3, g.shape)
        return sat, g, gt

    return gen


def train(cfg, steps, gen):
    from highlyaccurate_tpu.train import step as step_lib
    from highlyaccurate_tpu.train.state import create_train_state

    model = LMS2GP(cfg=cfg)
    sat, grd, gt = jax.tree_util.tree_map(np.asarray, gen(jax.random.PRNGKey(0)))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)},
                   jnp.asarray(sat), jnp.asarray(grd), jnp.asarray(gt),
                   mode="train")
    state = create_train_state(cfg, v["params"])
    ts = step_lib.make_train_step(model, cfg, mesh=None)

    t0 = time.perf_counter()
    for i in range(steps):
        sat, grd, gt = gen(jax.random.fold_in(jax.random.PRNGKey(42), i))
        state, metrics = ts(state, sat, grd, gt, jax.random.PRNGKey(i))
        if i % 100 == 0 or i == steps - 1:
            print(f"step {i}: loss {float(metrics['loss']):.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    return state.params


def evaluate(name, cfg, params, gen, n_batches):
    model = LMS2GP(cfg=cfg)

    @jax.jit
    def ev(p, sat, grd, key):
        return model.apply({"params": p}, sat, grd, mode="test",
                           rngs={"lm": key})

    preds, gts = [], []
    # pre-generate the fixed eval set so data synthesis stays outside the
    # timed window (time_per_image must reflect eval only)
    batches = [gen(jax.random.fold_in(jax.random.PRNGKey(777), i))
               for i in range(n_batches)]
    # fence via a value fetch — block_until_ready is a no-op on the axon
    # platform (CLAUDE.md); fetching the LAST batch bounds all of them
    # (device executes FIFO)
    np.asarray(batches[-1][0])
    out = ev(params, batches[0][0], batches[0][1], jax.random.PRNGKey(0))
    np.asarray(out[0])  # warm/compile fence
    t0 = time.perf_counter()
    for i, (sat, grd, gt) in enumerate(batches):
        lat, lon, th = ev(params, sat, grd, jax.random.PRNGKey(1000 + i))
        preds.append(np.stack([np.asarray(lat), np.asarray(lon),
                               np.asarray(th)], -1))
        gts.append(np.asarray(gt))
    dt = time.perf_counter() - t0
    pred = np.concatenate(preds)  # [N, 3] (lat, lon, heading) normalized
    gt = np.concatenate(gts)      # [N, 3] (shift_u=lon, shift_v=lat, heading)

    res = EvalResults(
        pred_shifts=np.stack([pred[:, 0] * cfg.shift_range_lat,
                              pred[:, 1] * cfg.shift_range_lon], -1),
        gt_shifts=np.stack([gt[:, 1] * cfg.shift_range_lat,
                            gt[:, 0] * cfg.shift_range_lon], -1),
        pred_headings=(pred[:, 2] * cfg.rotation_range)[:, None],
        gt_headings=(gt[:, 2] * cfg.rotation_range)[:, None],
        time_per_image=dt / (n_batches * B),
    )
    m = res.compute()
    keys = ["lateral_recall_1m", "lateral_recall_3m", "lateral_recall_5m",
            "longitudinal_recall_1m", "angle_recall_1deg", "angle_recall_3deg",
            "distance_recall_1m", "pred_dis_mean", "pred_angle_mean",
            "time_per_image"]
    print(f"[{name}] " + "  ".join(f"{k}={m[k]:.2f}" for k in keys),
          flush=True)
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--eval-batches", type=int, default=64)
    args = ap.parse_args()

    cfg = Config(level=3, N_iters=5, lr=args.lr)  # reference defaults
    gen = make_generator(cfg)

    print("training...", flush=True)
    params = train(cfg, args.steps, gen)

    variants = {
        "banded16(default)": cfg,
        "banded32": dataclasses.replace(cfg, banded_bf16_map=0),
        "gather": dataclasses.replace(cfg, use_banded_warp=0),
        "bf16feat": dataclasses.replace(cfg, compute_dtype="bfloat16"),
    }
    results = {}
    for name, vcfg in variants.items():
        results[name] = evaluate(name, vcfg, params, gen, args.eval_batches)

    print("\n=== deltas vs gather ===", flush=True)
    base = results["gather"]
    for name, m in results.items():
        if name == "gather":
            continue
        deltas = {k: m[k] - base[k] for k in
                  ("lateral_recall_1m", "longitudinal_recall_1m",
                   "angle_recall_1deg", "distance_recall_1m")}
        print(f"{name}: " + "  ".join(f"d{k}={v:+.2f}"
                                      for k, v in deltas.items()), flush=True)


if __name__ == "__main__":
    main()
