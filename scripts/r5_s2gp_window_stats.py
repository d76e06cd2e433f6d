"""Round-5: per-block u-window statistics on REAL S2GP geometry (CPU).

The projline u-window port measured NEUTRAL because real G2SP lines hit
few column blocks with near-full sample windows (PERF.md round 5).  Before
porting the u-window to the S2GP kernels, measure the same statistic on
the REAL S2GP line geometry: for each production level, the ratio

    uwin_rows / base_rows,
    base_rows = sum over hit (line, block) pairs of W,
    uwin_rows = sum over hit pairs of the UC-aligned live sample window

is the VPU-build-row cut the port could deliver (the isolation showed the
kernels build-bound, so kernel time scales ~ with build rows).  Pure-jnp
geometry on CPU — no kernels, no TPU.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/r5_s2gp_window_stats.py
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.geometry import kitti as geom
    from highlyaccurate_tpu.models.lm_s2gp import (
        level_slots, precompute_rays)

    cfg = Config(level=3, N_iters=5)
    rays = precompute_rays(cfg)
    slots = level_slots(cfg)
    rng = np.random.RandomState(0)
    B = 64  # pose sample pool (uniform over the configured ranges)
    pose = jnp.asarray(rng.uniform(-1, 1, (B, 3)).astype(np.float32))

    for lvl_pos, slot in enumerate(slots):
        xyz, mask_vw = rays[slot][0], rays[slot][1]
        V2, W = mask_vw.shape
        row_start = V2 // 2  # sky crop (non-collect solver rounds)
        xyz01 = jnp.asarray(xyz[row_start:, :2])          # [V, 2, 3]
        mvw = np.asarray(mask_vw[row_start:])             # [V, W]
        from highlyaccurate_tpu.ops.pallas.banded_warp import SLOT_CHANNELS
        A = cfg.sat_size // (2 ** (3 - slot))  # pyramid /8 /4 /2 /1
        C = SLOT_CHANNELS[slot]

        uv01 = geom.s2gp_uv(pose, xyz01, A, cfg.rotation_range,
                            cfg.shift_range_lat, cfg.shift_range_lon)
        # kernel layout: axes swapped (banded_project), x = swapped u
        uv01s = np.asarray(uv01)[..., ::-1]               # [B, V, 2, 2]
        x0 = uv01s[:, :, 0, 0]                            # [B, V]
        x1 = uv01s[:, :, 1, 0]
        y0 = uv01s[:, :, 0, 1]
        y1 = uv01s[:, :, 1, 1]
        u = np.arange(W, dtype=np.float32)
        V = x0.shape[1]
        bx = (x1 - x0)
        by = (y1 - y0)
        x = x0[..., None] + bx[..., None] * u             # [B, V, W]
        y = y0[..., None] + by[..., None] * u
        valid = ((x >= 0) & (x <= A - 1) & (y >= 0) & (y <= A - 1)
                 & (np.floor(x) < A - 1) & (np.floor(y) < A - 1)
                 & (mvw[None] > 0))

        cfirst = (C % 128 != 0) and (A % 128 == 0)
        CBW = 128 if cfirst else 32
        if A % CBW != 0:
            print(f"L{lvl_pos} slot{slot}: A={A} not blocked (CBW={CBW})")
            continue
        nblk = A // CBW
        UC = 64 if W % 64 == 0 else 32
        base_rows = 0
        uwin_rows = 0
        hit_pairs = 0
        for jb in range(nblk):
            c0 = jb * CBW
            hit = valid & (x >= c0 - 1) & (x < c0 + CBW)  # [B, V, W]
            any_hit = hit.any(-1)
            umin = np.where(hit, u, np.float32(W)).min(-1)
            umax = np.where(hit, u, -1.0).max(-1)
            u0 = (umin.astype(np.int64) // UC) * UC
            nuc = (umax.astype(np.int64) - u0) // UC + 1
            rows = np.where(any_hit, nuc * UC, 0)
            base_rows += int(any_hit.sum()) * W
            uwin_rows += int(rows.sum())
            hit_pairs += int(any_hit.sum())
        tot_pairs = B * V * nblk
        print(f"L{lvl_pos} slot{slot}: A={A} C={C} V={V} W={W} CBW={CBW} "
              f"nblk={nblk} UC={UC} | hit pairs {hit_pairs}/{tot_pairs} "
              f"({hit_pairs / tot_pairs:.0%}) | build-row ratio "
              f"uwin/base = {uwin_rows / max(base_rows, 1):.3f}",
              flush=True)


if __name__ == "__main__":
    main()
