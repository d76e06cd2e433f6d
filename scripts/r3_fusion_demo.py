"""Fusion demo: warm-start tracking + calibrated covariance in an EKF loop.

The production story for the two round-3 capabilities: a vehicle runs
odometry (dead-reckoning drifts) and the localizer (absolute but noisy);
a constant-pose-plus-control EKF fuses them using the localizer's OWN
covariance output (with the cov_scale calibration from
scripts/r3_cov_calibration.py).  Compares mean position error of:

  odo-only   dead reckoning from frame 0 (drifts without bound)
  raw        per-frame localizer estimate (cold relative to odometry info)
  fused      EKF: predict with odometry, update with (estimate, cov)

The localizer runs in tracking mode (init_pose = fused state — the warm
start and the filter reinforce each other) at N_iters=2.

Loads trained params from /tmp/r3_track_params.npz (run
scripts/r3_tracking_study.py first).  One TPU process.
"""

import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

try:
    from scripts.r3_cov_calibration import load_params
    from scripts.r3_tracking_study import B, make_seq_generator
except ImportError:
    from r3_cov_calibration import load_params
    from r3_tracking_study import B, make_seq_generator

DRIFT = 0.1               # GT random-walk per frame (normalized)
ODO_SIGMA = 0.03          # odometry noise per frame (normalized)
FRAMES = 64
CAL_BATCHES = 6           # validation batches for Localizer.calibrate()


def main():
    import dataclasses
    cfg = Config(level=3, N_iters=5)
    cfg2 = dataclasses.replace(cfg, N_iters=2)
    params = load_params()
    gen = make_seq_generator(cfg, DRIFT)
    model = LMS2GP(cfg=cfg2)

    @jax.jit
    def ev(p, sat, grd, init, key):
        lat, lon, th, cov = model.apply(
            {"params": p}, sat, grd, mode="test", init_pose=init,
            with_info=True, rngs={"lm": key})
        return jnp.stack([lon, lat, th], -1), cov   # pose order

    # calibrate the covariance scale with the API (round-4: replaces the
    # hand-entered scalar from scripts/r3_cov_calibration.py) — fit in the
    # regime the EKF operates in: warm-started near GT at this N_iters
    from highlyaccurate_tpu.inference import Localizer

    def to_metric(p):  # normalized KITTI pose order -> metric API order
        return np.stack([p[:, 1] * cfg.shift_range_lat,
                         p[:, 0] * cfg.shift_range_lon,
                         p[:, 2] * cfg.rotation_range], -1)

    loc = Localizer(cfg2, params=params, batch_size=B)
    cal = []
    for i in range(CAL_BATCHES):
        key = jax.random.fold_in(jax.random.PRNGKey(4242), i)
        sat, grd, gtb = gen(key, jnp.zeros((B, 3)))
        gtb = np.asarray(gtb)
        init = (gtb + 0.05 * np.random.RandomState(100 + i)
                .randn(B, 3)).astype(np.float32)
        cal.append({"sat": np.asarray(sat), "grd": np.asarray(grd),
                    "gt_pose": to_metric(gtb), "init_pose": to_metric(init)})
    cov_scale = loc.calibrate(cal)
    print(f"[calibrate] Localizer.calibrate() -> cov_scale "
          f"{cov_scale:.0f} (stored on the instance; export() persists it)",
          flush=True)

    # simulate the sequence (GT + frames + odometry)
    rng = np.random.RandomState(0)
    gts, sats, grds = [], [], []
    gt = jnp.zeros((B, 3))
    for t in range(FRAMES):
        sat, grd, gt = gen(jax.random.fold_in(jax.random.PRNGKey(31), t), gt)
        sats.append(sat), grds.append(grd), gts.append(np.asarray(gt))
    odo = [np.zeros((B, 3), np.float32)]
    for t in range(1, FRAMES):
        odo.append((gts[t] - gts[t - 1]
                    + ODO_SIGMA * rng.randn(B, 3)).astype(np.float32))

    Q = (ODO_SIGMA ** 2) * np.eye(3, dtype=np.float32)
    x = np.zeros((B, 3), np.float32)            # fused state
    P = np.tile(np.eye(3, dtype=np.float32)[None], (B, 1, 1))
    dead = np.zeros((B, 3), np.float32)         # odometry-only
    err_raw, err_fused, err_odo = [], [], []
    for t in range(FRAMES):
        dead = dead + odo[t]
        # EKF predict: odometry as control input on a constant-pose model
        x = x + odo[t]
        P = P + Q[None]
        # measurement: tracking-mode localizer from the predicted state
        z, C = ev(params, sats[t], grds[t], jnp.asarray(x),
                  jax.random.PRNGKey(500 + t))
        z = np.asarray(z)
        # z^2 is invariant to the diagonal range scaling, so the scale fit
        # on metric covariance applies unchanged to normalized covariance
        R = np.asarray(C) * cov_scale
        # EKF update (H = I)
        for b in range(B):
            S = P[b] + R[b]
            K = P[b] @ np.linalg.inv(S)
            x[b] = x[b] + K @ (z[b] - x[b])
            P[b] = (np.eye(3, dtype=np.float32) - K) @ P[b]
        err_raw.append(np.abs(z - gts[t]))
        err_fused.append(np.abs(x - gts[t]))
        err_odo.append(np.abs(dead - gts[t]))

    def report(name, errs):
        e = np.stack(errs[5:])     # skip the acquisition frames
        lat = e[..., 1] * cfg.shift_range_lat
        lon = e[..., 0] * cfg.shift_range_lon
        dist = np.sqrt(lat ** 2 + lon ** 2)
        ang = e[..., 2] * cfg.rotation_range
        print(f"[{name}] mean dist {dist.mean():.3f} m  lat@1m "
              f"{(lat <= 1).mean() * 100:.1f}%  mean angle "
              f"{ang.mean():.3f} deg", flush=True)
        return dist.mean()

    d_odo = report("odo-only", err_odo)
    d_raw = report("raw localizer (warm2)", err_raw)
    d_fus = report("EKF fused", err_fused)
    print(f"fused improves raw by {100 * (1 - d_fus / d_raw):.1f}% and "
          f"dead-reckoning by {100 * (1 - d_fus / d_odo):.1f}%", flush=True)


if __name__ == "__main__":
    main()
