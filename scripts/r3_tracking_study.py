"""Tracking-mode study: warm-start value on sequential frames (round 3).

The reference cold-starts every frame's LM solve from pose 0
(/root/reference/models_kitti.py:1165-1167).  This framework adds
``init_pose`` (models' __call__ / Localizer.predict) so frame t can start
from frame t-1's estimate.  This study quantifies the accuracy/latency
trade on geometry-consistent synthetic sequences with CONVERGED features:

  1. train the flagship (reference defaults, batch 8) on consistent data
     (same generator as scripts/r2_recall_study.py);
  2. simulate 8 parallel tracking sequences of --frames frames: the GT
     prior error follows a bounded random walk (inter-frame drift --drift
     in normalized units; 0.1 = 2 m / 1 deg at reference ranges);
  3. evaluate per-frame pose error + throughput for:
       cold5   N_iters=5, zero init        (production default)
       cold2   N_iters=2, zero init        (latency floor, no tracking)
       warm2   N_iters=2, init = previous frame's estimate
       warm1   N_iters=1, init = previous frame's estimate
  4. batch-1 latency for cold5 vs warm2 (the serving scenario);
  5. covariance calibration: predict with with_info=True on i.i.d. frames
     and compare the predicted [3,3] covariance against the actual error
     distribution (mean Mahalanobis z^2 vs the chi^2_3 expectation of 3,
     per-dim 1/2-sigma coverage, and error-vs-predicted-sigma quartile
     monotonicity — does the covariance RANK uncertainty correctly?).

Trained params are saved to /tmp/r3_track_params.npz for follow-up TPU
experiments in later processes (no retrain needed).

One TPU process.  Usage:
  python scripts/r3_tracking_study.py [--steps 2500] [--frames 64]
"""

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.geometry import kitti as geom
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP, precompute_rays
from highlyaccurate_tpu.ops.grid_sample import grid_sample

B = 8


def make_seq_generator(cfg: Config, drift: float):
    """jitted (key, gt_prev [B,3]) -> (sat, grd, gt): one tracking frame.

    Fresh satellite texture per frame (the patch moves with the vehicle);
    the GT prior error random-walks from the previous frame's, clipped to
    the +-1 normalized prior box."""
    rays = precompute_rays(cfg)
    xyz = jnp.asarray(rays[3][0])
    mask = jnp.asarray(rays[3][1])

    @jax.jit
    def gen(key, gt_prev):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        S = cfg.sat_size
        base = jax.image.resize(jax.random.uniform(k1, (B, 16, 16, 3)),
                                (B, S, S, 3), "linear")
        mid = jax.image.resize(jax.random.uniform(k4, (B, 64, 64, 3)),
                               (B, S, S, 3), "linear")
        sat = 0.7 * base + 0.3 * mid
        gt = jnp.clip(gt_prev + drift * jax.random.normal(k2, (B, 3)),
                      -1.0, 1.0)
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
    zeros = jnp.zeros((B, 3))
    sat, grd, gt = gen(jax.random.PRNGKey(0), zeros)
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd, gt, mode="train")
    state = create_train_state(cfg, v["params"])
    ts = step_lib.make_train_step(model, cfg, mesh=None)
    t0 = time.perf_counter()
    for i in range(steps):
        # i.i.d. frames for training (tracking correlation is an eval thing)
        sat, grd, gt = gen(jax.random.fold_in(jax.random.PRNGKey(42), i),
                           zeros)
        state, metrics = ts(state, sat, grd, gt, jax.random.PRNGKey(i))
        if i % 200 == 0 or i == steps - 1:
            print(f"step {i}: loss {float(metrics['loss']):.4f} "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
    return state.params


def run_variant(name, params, cfg, gen, frames, warm: bool, batch=B):
    """One tracking sweep over ``frames`` frames x ``batch`` sequences.
    Returns (mean shift err [m], mean angle err [deg], fps)."""
    model = LMS2GP(cfg=cfg)

    @jax.jit
    def ev(p, sat, grd, init, key):
        lat, lon, th = model.apply(
            {"params": p}, sat, grd, mode="test",
            init_pose=init if warm else None, rngs={"lm": key})
        return jnp.stack([lon, lat, th], -1)   # pose order (u, v, heading)

    # pre-generate the frame sequence (generation outside the timed loop);
    # the generator is compiled for B sequences — slice down for batch < B
    gts, sats, grds = [], [], []
    gt = jnp.zeros((B, 3))
    for t in range(frames):
        sat, grd, gt = gen(jax.random.fold_in(jax.random.PRNGKey(7), t), gt)
        sats.append(sat[:batch]), grds.append(grd[:batch])
        gts.append(gt[:batch])
    np.asarray(gts[-1])  # fence generation (FIFO)

    est = jnp.zeros((batch, 3))
    out = ev(params, sats[0], grds[0], est, jax.random.PRNGKey(0))
    np.asarray(out)      # compile fence
    est = jnp.zeros((batch, 3))
    ests = []
    t0 = time.perf_counter()
    for t in range(frames):
        est = ev(params, sats[t], grds[t], est,
                 jax.random.PRNGKey(100 + t))
        ests.append(est)
    np.asarray(ests[-1])
    dt = time.perf_counter() - t0
    fps = frames * batch / dt

    pred = np.stack([np.asarray(e) for e in ests], 0)   # [T, B, 3]
    gt_arr = np.stack([np.asarray(g) for g in gts], 0)
    derr = np.abs(pred[..., :2] - gt_arr[..., :2])
    lat_m = derr[..., 1] * cfg.shift_range_lat
    lon_m = derr[..., 0] * cfg.shift_range_lon
    dist = np.sqrt(lat_m ** 2 + lon_m ** 2)
    ang = np.abs(pred[..., 2] - gt_arr[..., 2]) * cfg.rotation_range
    print(f"[{name}] dist_mean {dist.mean():.3f} m  lat@1m "
          f"{(lat_m <= 1).mean() * 100:.1f}%  angle_mean {ang.mean():.3f} "
          f"deg  fps {fps:.1f}", flush=True)
    return dist.mean(), ang.mean(), fps


def evaluate_covariance(params, cfg, gen, n_batches=24):
    """Covariance calibration on i.i.d. frames (study step 5)."""
    model = LMS2GP(cfg=cfg)

    @jax.jit
    def ev(p, sat, grd, key):
        lat, lon, th, cov = model.apply(
            {"params": p}, sat, grd, mode="test", with_info=True,
            rngs={"lm": key})
        return jnp.stack([lon, lat, th], -1), cov   # pose order

    zeros = jnp.zeros((B, 3))
    errs, covs = [], []
    for i in range(n_batches):
        sat, grd, gt = gen(jax.random.fold_in(jax.random.PRNGKey(888), i),
                           zeros)
        pred, cov = ev(params, sat, grd, jax.random.PRNGKey(2000 + i))
        errs.append(np.asarray(pred) - np.asarray(gt))
        covs.append(np.asarray(cov))
    e = np.concatenate(errs)                    # [N, 3] normalized pose
    C = np.concatenate(covs)                    # [N, 3, 3]

    z2 = np.array([ee @ np.linalg.solve(cc, ee) for ee, cc in zip(e, C)])
    sig = np.sqrt(np.diagonal(C, axis1=1, axis2=2))       # [N, 3]
    within1 = (np.abs(e) <= sig).mean(0) * 100
    within2 = (np.abs(e) <= 2 * sig).mean(0) * 100
    print(f"[cov] N={len(e)}  mean z^2 {z2.mean():.2f} (chi2_3 expects 3)  "
          f"median z^2 {np.median(z2):.2f}", flush=True)
    print(f"[cov] 1-sigma coverage (u, v, heading): "
          f"{within1[0]:.0f}% {within1[1]:.0f}% {within1[2]:.0f}%  "
          f"(Gaussian: 68%)   2-sigma: {within2[0]:.0f}% {within2[1]:.0f}% "
          f"{within2[2]:.0f}% (95%)", flush=True)
    # ranking: actual |err| by predicted-sigma quartile (per dim 0 = u)
    for d, name in enumerate(("u", "v", "heading")):
        order = np.argsort(sig[:, d])
        q = np.array_split(np.abs(e[order, d]), 4)
        means = "  ".join(f"{x.mean():.4f}" for x in q)
        print(f"[cov] |err_{name}| by sigma quartile (low->high): {means}",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--drift", type=float, default=0.1)
    ap.add_argument("--lr", type=float, default=2e-4)
    args = ap.parse_args()

    cfg = Config(level=3, N_iters=5, lr=args.lr)   # reference defaults
    gen = make_seq_generator(cfg, args.drift)

    print("training...", flush=True)
    params = train(cfg, args.steps, gen)

    from flax import traverse_util
    flat = traverse_util.flatten_dict(params, sep="/")
    np.savez("/tmp/r3_track_params.npz",
             **{k: np.asarray(v) for k, v in flat.items()})
    print("params saved to /tmp/r3_track_params.npz", flush=True)

    evaluate_covariance(params, cfg, gen)

    cfg2 = dataclasses.replace(cfg, N_iters=2)
    cfg1 = dataclasses.replace(cfg, N_iters=1)
    run_variant("cold5", params, cfg, gen, args.frames, warm=False)
    run_variant("cold2", params, cfg2, gen, args.frames, warm=False)
    run_variant("warm2", params, cfg2, gen, args.frames, warm=True)
    run_variant("warm1", params, cfg1, gen, args.frames, warm=True)

    # batch-1 serving latency: cold5 vs warm2
    for name, c, w in (("cold5_b1", cfg, False), ("warm2_b1", cfg2, True)):
        _, _, fps = run_variant(name, params, c, gen, 32, warm=w, batch=1)
        print(f"[{name}] latency {1e3 / fps:.2f} ms/frame", flush=True)


if __name__ == "__main__":
    main()
