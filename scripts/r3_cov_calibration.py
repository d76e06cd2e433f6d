"""Covariance calibration in the NEAR-CONVERGED regime (round 3).

The tracking study's calibration mixed diverged cold-start solves into the
statistics, where the local GN covariance is meaningless.  This follow-up
measures calibration where the estimator actually operates (tracking /
successful solves): warm-start the solver near the GT (init = gt + 0.05
normal — one tracking frame's drift), solve N_iters=5, and compare errors
against the predicted covariance.

Reports mean/median Mahalanobis z^2 (chi2_3 expects 3), per-dim coverage,
the implied scalar ``cov_scale`` fitted on the first half of the samples,
and the held-out coverage AFTER applying that scale — the number a user
should expect from `Localizer(cov_scale=...)` calibrated the same way.

Loads the study's trained params from /tmp/r3_track_params.npz (run
scripts/r3_tracking_study.py first).  One TPU process.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import traverse_util

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
try:  # sibling import: works both as scripts.* and from inside scripts/
    from scripts.r3_tracking_study import B, make_seq_generator
except ImportError:
    from r3_tracking_study import B, make_seq_generator


def load_params(path="/tmp/r3_track_params.npz"):
    flat = dict(np.load(path))
    return traverse_util.unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})


def main():
    cfg = Config(level=3, N_iters=5)
    params = load_params()
    gen = make_seq_generator(cfg, drift=0.1)
    model = LMS2GP(cfg=cfg)

    @jax.jit
    def ev(p, sat, grd, init, key):
        lat, lon, th, cov = model.apply(
            {"params": p}, sat, grd, mode="test", init_pose=init,
            with_info=True, rngs={"lm": key})
        return jnp.stack([lon, lat, th], -1), cov   # pose order

    zeros = jnp.zeros((B, 3))
    errs, covs = [], []
    n_batches = 48
    for i in range(n_batches):
        key = jax.random.fold_in(jax.random.PRNGKey(4242), i)
        sat, grd, gt = gen(key, zeros)
        init = gt + 0.05 * jax.random.normal(jax.random.fold_in(key, 1),
                                             (B, 3))
        pred, cov = ev(params, sat, grd, init,
                       jax.random.PRNGKey(3000 + i))
        errs.append(np.asarray(pred) - np.asarray(gt))
        covs.append(np.asarray(cov))
    e = np.concatenate(errs)
    C = np.concatenate(covs)

    z2 = np.array([ee @ np.linalg.solve(cc, ee) for ee, cc in zip(e, C)])
    sig = np.sqrt(np.diagonal(C, axis1=1, axis2=2))
    print(f"[raw] N={len(e)}  mean z^2 {z2.mean():.1f}  median "
          f"{np.median(z2):.1f}  (chi2_3 expects 3)", flush=True)
    w1 = (np.abs(e) <= sig).mean(0) * 100
    print(f"[raw] 1-sigma coverage (u, v, heading): "
          f"{w1[0]:.0f}% {w1[1]:.0f}% {w1[2]:.0f}% (Gaussian: 68%)",
          flush=True)
    for d, name in enumerate(("u", "v", "heading")):
        order = np.argsort(sig[:, d])
        q = np.array_split(np.abs(e[order, d]), 4)
        print(f"[raw] |err_{name}| by sigma quartile: "
              + "  ".join(f"{x.mean():.4f}" for x in q), flush=True)

    # fit the scalar on the first half, evaluate coverage on the second
    half = len(e) // 2
    scale = float(np.mean(z2[:half]) / 3.0)
    sig_cal = sig[half:] * np.sqrt(scale)
    e2 = e[half:]
    z2_cal = z2[half:] / scale
    w1c = (np.abs(e2) <= sig_cal).mean(0) * 100
    w2c = (np.abs(e2) <= 2 * sig_cal).mean(0) * 100
    print(f"[calibrated] cov_scale = {scale:.1f} (fit on first half)",
          flush=True)
    print(f"[calibrated] held-out mean z^2 {z2_cal.mean():.2f} (expects 3)  "
          f"1-sigma coverage: {w1c[0]:.0f}% {w1c[1]:.0f}% {w1c[2]:.0f}% "
          f"(68%)  2-sigma: {w2c[0]:.0f}% {w2c[1]:.0f}% {w2c[2]:.0f}% (95%)",
          flush=True)


if __name__ == "__main__":
    main()
