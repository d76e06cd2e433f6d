"""Round-4 G2SP eval/train decomposition probe (TPU, one bundled process).

The static grid restriction measured small (+3.9% eval / +3.6% train,
PERF.md round 4), so before designing the next G2SP lever this probe
answers WHERE the 97 ms/batch eval step and the 317 ms train step go:

  1. features            — SatFeatureNet + GrdFeatureNet fp32, batch 8
  2. proj_full           — 5 iters x 3 levels of _project_grd_banded
                           (coef pack + projline kernel + per-pixel duv)
  3. duv_only            — 5 x 3 of geom.g2sp_uv_jac alone
                           (kernel time ~= proj_full - duv_only)
  4. moments_only        — 5 x 3 of lm_update_implicit_pixel on resident
                           (out, dx, dy, target, duv) arrays
  5. solver_full         — 5-iter eval scan over precomputed features
                           (cross-check: eval_total ~= features + solver)
  6. train_round_fwd     — one L2 differentiable round, chained x5
  7. train_round_grad    — value_and_grad of (6) wrt (grd_feat, pose):
                           the projline custom-VJP cost ratio
  8. eval fps, bf16 + restrict, batch 8 and 32 (production candidates)

All programs return device scalars; chaining threads a carry into the pose
so successive calls cannot be CSE'd; np.asarray on the scalar is the fence
(block_until_ready does not fence on the axon platform).  Big arrays are
passed as jit ARGUMENTS, not closures — closed-over device arrays embed as
program constants and bloat the remote compile payload.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from bench import _bench_eval_fps
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.geometry import kitti as geom
    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
    from highlyaccurate_tpu.solver.updates import (LMConfig,
                                                   lm_update_implicit_pixel)

    print(f"devices: {jax.devices()}", flush=True)
    B = 8
    cfg = Config(level=3, N_iters=5, direction="G2SP",
                 compute_dtype="float32")
    model = LMG2SP(cfg=cfg)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
    k = jnp.asarray(np.broadcast_to(
        np.array([[582.9802, 0.0, 496.2420],
                  [0.0, 482.7076, 125.0034],
                  [0.0, 0.0, 1.0]], np.float32), (B, 3, 3)).copy())
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd, k,
                   jnp.zeros((B, 3)), mode="train")
    params = v["params"]
    N_LVL = 3

    def timeit(name, fn, n=10):
        """fn(carry scalar) -> scalar; chained, fetch-fenced."""
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
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}", flush=True)
            return float("nan")

    # ---- 1: features ----
    def feats_m(m, s, g):
        sf, _sc = m.SatFeatureNet(s)
        gf, gc = m.GrdFeatureNet(g)
        return sf, gf, gc

    @jax.jit
    def feats_jit(p, s, g, c):
        sf, gf, _ = model.apply({"params": p}, s + c * 1e-38, g,
                                method=feats_m)
        return c + sum(jnp.sum(f.astype(jnp.float32)) * 1e-30
                       for f in list(sf) + list(gf))

    timeit("features_fp32_b8", lambda c: feats_jit(params, sat, grd, c))

    # precompute feature pyramids once, device-resident
    sfeats, gfeats, gconfs = model.apply(
        {"params": params}, sat, grd, method=feats_m)
    np.asarray(jnp.sum(sfeats[0].astype(jnp.float32)))

    # ---- 2: proj_full (kernel + duv), 5 iters x 3 levels ----
    A_of = [sfeats[lvl].shape[1] for lvl in range(N_LVL)]

    def proj_m(m, gfeats, k, c):
        def body(carry, _):
            p = jnp.zeros((B, 3)) + carry * 1e-20
            s = carry
            for lvl in range(N_LVL):
                out, dx, _dy, duv = m._project_grd_banded(
                    gfeats[lvl], p, k, A_of[lvl], diff=False)
                s = s + (jnp.sum(out.astype(jnp.float32))
                         + jnp.sum(dx.astype(jnp.float32))
                         + jnp.sum(duv)) * 1e-30
            return s, None
        s, _ = jax.lax.scan(body, c, None, length=cfg.N_iters)
        return s

    @jax.jit
    def proj_jit(p, gfeats, k, c):
        return model.apply({"params": p}, gfeats, k, c, method=proj_m)

    timeit("proj_full_5x3", lambda c: proj_jit(params, gfeats, k, c))

    # ---- 3: duv_only ----
    xyz1 = []
    for lvl in range(N_LVL):
        A = A_of[lvl]
        j0 = (geom.g2sp_inview_col_start(
            A, 256 // (2 ** (3 - lvl)), 1024 // (2 ** (3 - lvl)),
            cfg.rotation_range, cfg.shift_range_lat, cfg.shift_range_lon)
            if cfg.g2sp_restrict_grid else 0)
        xyz1.append(jnp.asarray(geom.warp_sat2real(A)[:, j0:]))

    @jax.jit
    def duv_jit(xyz1, k, c):
        def body(carry, _):
            p = jnp.zeros((B, 3)) + carry * 1e-20
            s = carry
            for lvl in range(N_LVL):
                Hg, Wg = gfeats[lvl].shape[1], gfeats[lvl].shape[2]
                _uv, duv, _m = geom.g2sp_uv_jac(
                    p, xyz1[lvl], k, Hg, Wg, cfg.grd_h, cfg.grd_w,
                    cfg.rotation_range, cfg.shift_range_lat,
                    cfg.shift_range_lon)
                s = s + jnp.sum(duv) * 1e-30
            return s, None
        s, _ = jax.lax.scan(body, c, None, length=cfg.N_iters)
        return s

    timeit("duv_only_5x3", lambda c: duv_jit(xyz1, k, c))

    # ---- 4: moments_only on resident arrays ----
    res = []
    for lvl in range(N_LVL):
        A = A_of[lvl]
        Vr = xyz1[lvl].shape[1]
        C = sfeats[lvl].shape[-1]
        r = np.random.RandomState(lvl)
        res.append(tuple(
            jnp.asarray(r.rand(B, A, Vr, C).astype(np.float32))
            for _ in range(3)) + (
            jnp.asarray(r.rand(B, A, Vr, 2, 3).astype(np.float32)),))
    lm_cfg = LMConfig(active_dims=(0, 1, 2), using_weight=False,
                      train_damping=False, damping=cfg.damping,
                      use_hessian=False, dropout=0, normalize=False,
                      reinit=False, raw_damping=True)
    damping = jnp.full((1, 3), cfg.damping, jnp.float32)

    @jax.jit
    def moments_jit(res, sfeats, c):
        def body(carry, _):
            p = jnp.zeros((B, 3)) + carry * 1e-20
            for lvl in range(N_LVL):
                out, dx, dy, duv = res[lvl]
                j0 = sfeats[lvl].shape[2] - out.shape[2]
                p = lm_update_implicit_pixel(
                    p, out, dx, dy, sfeats[lvl][:, :, j0:], duv, damping,
                    lm_cfg)
            return jnp.sum(p) * 1e-20 + carry, None
        s, _ = jax.lax.scan(body, c, None, length=cfg.N_iters)
        return s

    timeit("moments_only_5x3", lambda c: moments_jit(res, sfeats, c))

    # ---- 5: solver_full over precomputed features ----
    def solver_m(m, sfeats, gfeats, gconfs, k, c):
        level_round = m._make_level_round(sfeats, gfeats, gconfs, k,
                                          "test", False)

        def body(p, _):
            for lvl in range(N_LVL):
                p, _aux = level_round(p, lvl)
            return p, None
        p0 = jnp.zeros((B, 3)) + c * 1e-20
        p, _ = jax.lax.scan(body, p0, None, length=cfg.N_iters)
        return jnp.sum(p) * 1e-20 + c

    @jax.jit
    def solver_jit(p, sfeats, gfeats, gconfs, k, c):
        return model.apply({"params": p}, sfeats, gfeats, gconfs, k, c,
                           method=solver_m,
                           rngs={"lm": jax.random.PRNGKey(2)})

    timeit("solver_full_5x3",
           lambda c: solver_jit(params, sfeats, gfeats, gconfs, k, c))

    # ---- 6+7: train round (L2, differentiable kernel) fwd and grad ----
    def round_m(m, sfeats, gfeats01, gf2, gconfs, k, p):
        level_round = m._make_level_round(
            sfeats, list(gfeats01) + [gf2], gconfs, k, "train", False)
        new_p, _g = level_round(p, 2)
        return jnp.sum(new_p)

    @jax.jit
    def round_fwd_jit(p_, sfeats, gfeats01, gf2, gconfs, k, c):
        p = jnp.zeros((B, 3)) + c * 1e-20
        s = model.apply({"params": p_}, sfeats, gfeats01, gf2, gconfs, k, p,
                        method=round_m)
        return s * 1e-20 + c

    timeit("train_round_L2_fwd",
           lambda c: round_fwd_jit(params, sfeats, gfeats[:2], gfeats[2],
                                   gconfs, k, c), n=5)

    @jax.jit
    def round_grad_jit(p_, sfeats, gfeats01, gf2, gconfs, k, c):
        p = jnp.zeros((B, 3)) + c * 1e-20

        def loss(gf2, p):
            return model.apply({"params": p_}, sfeats, gfeats01, gf2,
                               gconfs, k, p, method=round_m)
        g_gf, g_p = jax.grad(loss, argnums=(0, 1))(gf2, p)
        return (jnp.sum(g_gf.astype(jnp.float32)) + jnp.sum(g_p)) * 1e-20 + c

    timeit("train_round_L2_fwd_grad",
           lambda c: round_grad_jit(params, sfeats, gfeats[:2], gfeats[2],
                                    gconfs, k, c), n=5)

    # ---- 8: production eval candidates ----
    cfg_bf16 = dataclasses.replace(cfg, compute_dtype="bfloat16")
    for name, c_, b in [("g2sp_eval_bf16_b8", cfg_bf16, 8),
                        ("g2sp_eval_bf16_b32", cfg_bf16, 32)]:
        try:
            kb = np.broadcast_to(np.asarray(k[0]), (b, 3, 3)).copy()
            fps = _bench_eval_fps(LMG2SP, c_, b, 10, extra_init=(kb,))
            print(f"RESULT {name} {fps:.2f} fps", flush=True)
        except Exception as e:
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
