"""Round-5 train-step decomposition + kernel matmul-structure isolation.

VERDICT r4 #3: nobody knows the top term of the ~170 ms bf16 train step on
the current tree (the reshape-max pool landed unmeasured).  Section A splits
the step into features fwd / features bwd / solver fwd / solver VJP /
optimizer at the bench config (b8, bf16, flagship defaults) and reconciles
the pieces against the measured full step.

Section B isolates two candidate kernel levers identified from the
banded_warp source (same per-(line, column-block) structure in S2GP blocked,
projline, and their backwards):

  * matmul stacking: today each hit block issues 12 small [W,CBW]x[CBW,C]
    MXU matmuls (4 bilinear rows x {value, d/dx, d/dy}).  Stacking the rows
    along the contraction dim gives 3 [W,4CBW]x[4CBW,C]; stacking outputs
    along the sublane dim gives 1 [3W,4CBW]x[4CBW,C].  Same FLOPs, fewer
    MXU issues + weight-build sharing.
  * per-block dynamic u-windows (VERDICT r4 #4's named lever, on the SAMPLE
    axis): only ~CBW/|bx| of the W samples land in one column block, yet the
    weight build and matmuls cover all W rows.  'uwin' simulates the perfect
    restriction with static offsets (W/NBLK rows per block) to measure the
    CEILING of a dynamic-offset implementation before building it.

Section C: per-level single solver-round fwd / fwd+grad (train path:
banded implicit + custom-VJP kernels) to split the solver share by level
and forward-vs-backward.

Patterns per scripts/r4_feat_probe.py: big arrays as jit args, carry-chained
calls, np.asarray scalar fetch as the fence (block_until_ready does not
fence on the axon platform).  Run: python scripts/r5_train_probe.py
"""

import dataclasses
import functools
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(name, fn, n=10, flops=None):
    import jax.numpy as jnp
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
        import traceback
        traceback.print_exc()
        print(f"RESULT {name} FAILED {type(e).__name__}: {e}", flush=True)
        return float("nan")


# ---------------------------------------------------------------------------
# Section B: kernel matmul-structure isolation
# ---------------------------------------------------------------------------

def run_isolation(tag, B, V, W, NC, C, NBLK):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from highlyaccurate_tpu.ops.pallas.banded_warp import _row_weight_mats4

    A = NC * NBLK
    rng = np.random.RandomState(0)
    # stacked sheared rows per block: [NBLK, 4, NC, C] (whole-array VMEM)
    sh = jnp.asarray(rng.rand(NBLK, 4, NC, C).astype(np.float32))
    # per-(b, v) line coefs, flattened [B, V*8] like the real kernels
    ax = rng.uniform(1.0, 3.0, (B, V))
    bx = np.full((B, V), (A - 6.0) / W) * rng.uniform(0.9, 1.0, (B, V))
    ay = rng.uniform(A * 0.3, A * 0.6, (B, V))
    slope = rng.uniform(-0.15, 0.15, (B, V))
    by = bx * slope
    coefs = np.zeros((B, V, 8), np.float32)
    coefs[..., 0] = ax
    coefs[..., 1] = bx
    coefs[..., 2] = ay
    coefs[..., 3] = by
    coefs[..., 4] = slope
    coefs = jnp.asarray(coefs.reshape(B, V * 8))

    def cread(coef_ref, b, v, i):
        return coef_ref[b, v * 8 + i]

    def weights_block(coef_ref, b, v, col0, *, W_rows, u0=0):
        axv = cread(coef_ref, b, v, 0)
        bxv = cread(coef_ref, b, v, 1)
        ayv = cread(coef_ref, b, v, 2)
        byv = cread(coef_ref, b, v, 3)
        slv = cread(coef_ref, b, v, 4)
        u0f = (u0.astype(jnp.float32) if hasattr(u0, "astype")
               else jnp.float32(u0))
        u = (jax.lax.broadcasted_iota(jnp.int32, (W_rows, 1), 0)[:, 0]
             .astype(jnp.float32) + u0f)
        x = axv + bxv * u
        y = ayv + byv * u
        x0f = jnp.floor(x)
        y0f = jnp.floor(y)
        fx = x - x0f
        fy = y - y0f
        m = (((x >= 0) & (x <= A - 1) & (y >= 0) & (y <= A - 1))
             .astype(jnp.float32)
             * ((x0f < A - 1) & (y0f < A - 1)).astype(jnp.float32))
        j = (jax.lax.broadcasted_iota(jnp.int32, (W_rows, NC), 1)
             .astype(jnp.float32) + jnp.float32(col0))
        x0b = x0f[:, None]
        mb = m[:, None]
        hit0 = (j == x0b).astype(jnp.float32)
        hit1 = (j == (x0b + 1.0)).astype(jnp.float32)
        wx = ((1.0 - fx)[:, None] * hit0 + fx[:, None] * hit1) * mb
        dwx = (hit1 - hit0) * mb
        yj = ayv + (j[:1] - axv) * slv
        sj = jnp.floor(yj)
        rel = y0f[:, None] - sj + 1.0
        return wx, dwx, rel, fy

    def make_kernel(variant):
        def kernel(coef_ref, sh_ref, o_ref, dx_ref, dy_ref):
            b = pl.program_id(0)
            v = pl.program_id(1)
            acc_o = jnp.zeros((W, C), jnp.float32)
            acc_dx = jnp.zeros((W, C), jnp.float32)
            acc_dy = jnp.zeros((W, C), jnp.float32)
            if variant == "uwin":
                # per-block u-window ceiling sim: each block builds weights
                # and matmuls over W/NBLK sample rows only, writing its row
                # span straight through the output ref (dynamic_update_slice
                # on register arrays does not lower on TPU; ref stores do)
                WB = W // NBLK
                for jb in range(NBLK):
                    wx, dwx, rel, fy = weights_block(
                        coef_ref, b, v, jb * NC, W_rows=WB, u0=jb * WB)
                    mats = _row_weight_mats4(wx, dwx, rel, fy,
                                             with_dxy=False)
                    po = jnp.zeros((WB, C), jnp.float32)
                    pdx = jnp.zeros((WB, C), jnp.float32)
                    pdy = jnp.zeros((WB, C), jnp.float32)
                    for r in range(4):
                        s = sh_ref[jb, r]
                        po = po + jnp.dot(
                            mats[r][0], s,
                            preferred_element_type=jnp.float32)
                        pdx = pdx + jnp.dot(
                            mats[r][1], s,
                            preferred_element_type=jnp.float32)
                        pdy = pdy + jnp.dot(
                            mats[r][2], s,
                            preferred_element_type=jnp.float32)
                    sl = slice(jb * WB, (jb + 1) * WB)
                    o_ref[0, 0, sl] = po
                    dx_ref[0, 0, sl] = pdx
                    dy_ref[0, 0, sl] = pdy
                return
            elif variant == "udyn":
                # dynamic-offset u-window: the block's sample window start is
                # the (8-aligned) preimage of its first column under the
                # line's affine x(u) — the shape the REAL kernel needs
                # (pose-dependent offsets, pl.ds ref stores)
                WB = W // NBLK
                axv = cread(coef_ref, b, v, 0)
                bxv = cread(coef_ref, b, v, 1)
                for jb in range(NBLK):
                    u0f = (jnp.float32(jb * NC) - axv) / bxv
                    u0 = jnp.clip((jnp.floor(u0f).astype(jnp.int32) // 8) * 8,
                                  0, W - WB)
                    wx, dwx, rel, fy = weights_block(
                        coef_ref, b, v, jb * NC, W_rows=WB, u0=u0)
                    mats = _row_weight_mats4(wx, dwx, rel, fy,
                                             with_dxy=False)
                    po = jnp.zeros((WB, C), jnp.float32)
                    pdx = jnp.zeros((WB, C), jnp.float32)
                    pdy = jnp.zeros((WB, C), jnp.float32)
                    for r in range(4):
                        s = sh_ref[jb, r]
                        po = po + jnp.dot(
                            mats[r][0], s,
                            preferred_element_type=jnp.float32)
                        pdx = pdx + jnp.dot(
                            mats[r][1], s,
                            preferred_element_type=jnp.float32)
                        pdy = pdy + jnp.dot(
                            mats[r][2], s,
                            preferred_element_type=jnp.float32)
                    sl = pl.ds(u0, WB)
                    o_ref[0, 0, sl] = po
                    dx_ref[0, 0, sl] = pdx
                    dy_ref[0, 0, sl] = pdy
                return
            else:
                for jb in range(NBLK):
                    wx, dwx, rel, fy = weights_block(coef_ref, b, v,
                                                     jb * NC, W_rows=W)
                    mats = _row_weight_mats4(wx, dwx, rel, fy,
                                             with_dxy=False)
                    if variant == "build":
                        # touch every weight matrix so none is DCE'd
                        for r in range(4):
                            acc_o = acc_o + mats[r][0][:, :C]
                            acc_dx = acc_dx + mats[r][1][:, :C]
                            acc_dy = acc_dy + mats[r][2][:, :C]
                        continue
                    if variant == "mm12":
                        for r in range(4):
                            s = sh_ref[jb, r]
                            acc_o = acc_o + jnp.dot(
                                mats[r][0], s,
                                preferred_element_type=jnp.float32)
                            acc_dx = acc_dx + jnp.dot(
                                mats[r][1], s,
                                preferred_element_type=jnp.float32)
                            acc_dy = acc_dy + jnp.dot(
                                mats[r][2], s,
                                preferred_element_type=jnp.float32)
                        continue
                    wo = jnp.concatenate([mats[r][0] for r in range(4)], 1)
                    wdx = jnp.concatenate([mats[r][1] for r in range(4)], 1)
                    wdy = jnp.concatenate([mats[r][2] for r in range(4)], 1)
                    scat = sh_ref[jb].reshape(4 * NC, C)
                    if variant == "mm3":
                        acc_o = acc_o + jnp.dot(
                            wo, scat, preferred_element_type=jnp.float32)
                        acc_dx = acc_dx + jnp.dot(
                            wdx, scat, preferred_element_type=jnp.float32)
                        acc_dy = acc_dy + jnp.dot(
                            wdy, scat, preferred_element_type=jnp.float32)
                    else:  # mm1
                        wall = jnp.concatenate([wo, wdx, wdy], 0)
                        rall = jnp.dot(wall, scat,
                                       preferred_element_type=jnp.float32)
                        acc_o = acc_o + rall[:W]
                        acc_dx = acc_dx + rall[W:2 * W]
                        acc_dy = acc_dy + rall[2 * W:]
            o_ref[0, 0] = acc_o
            dx_ref[0, 0] = acc_dx
            dy_ref[0, 0] = acc_dy
        return kernel

    import jax

    for variant in ("build", "mm12", "mm3", "mm1", "uwin", "udyn"):
        try:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(B, V),
                in_specs=[pl.BlockSpec((NBLK, 4, NC, C),
                                       lambda b, v, *_: (0, 0, 0, 0))],
                out_specs=[pl.BlockSpec((1, 1, W, C),
                                        lambda b, v, *_: (b, v, 0, 0))] * 3,
            )
            f = pl.pallas_call(
                make_kernel(variant),
                grid_spec=grid_spec,
                out_shape=[jax.ShapeDtypeStruct((B, V, W, C), jnp.float32)
                           ] * 3,
                interpret=jax.default_backend() != "tpu",
            )

            @jax.jit
            def run(coefs, sh, c):
                o, dx, dy = f(coefs + c.astype(coefs.dtype) * 1e-38, sh)
                return (c + jnp.sum(o) * 1e-20 + jnp.sum(dx) * 1e-20
                        + jnp.sum(dy) * 1e-20)

            # FLOPs of the full (unwindowed) 12-matmul schedule, so the
            # achieved-rate column shows the schedule win, not a FLOP cut
            flops = 2.0 * B * V * NBLK * 3 * 4 * W * NC * C
            timeit(f"iso_{tag}_{variant}", lambda c: run(coefs, sh, c),
                   n=20, flops=flops)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"RESULT iso_{tag}_{variant} FAILED "
                  f"{type(e).__name__}: {e}", flush=True)


# ---------------------------------------------------------------------------
# Section A + C: train decomposition at the bench config
# ---------------------------------------------------------------------------

def main(smoke: bool = False):
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}", flush=True)

    # --- Section B first: small kernels, fast compiles, early signal ---
    if smoke:
        run_isolation("smoke", B=2, V=4, W=64, NC=128, C=64, NBLK=2)
    else:
        # S2GP L2 blocked shape: W=512 samples, A=256 cols in 2x128 blocks
        run_isolation("s2gpL2", B=8, V=64, W=512, NC=128, C=64, NBLK=2)
        # projline L2 shape: W=256 samples, AX=512 cols in 4x128 blocks
        run_isolation("projL2", B=8, V=210, W=256, NC=128, C=64, NBLK=4)

    # --- Section A: train-step decomposition ---
    import bench
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
    from highlyaccurate_tpu.train import step as step_lib
    from highlyaccurate_tpu.train.state import create_train_state

    B = 2 if smoke else 8
    cfg = Config(level=3, N_iters=5, compute_dtype="bfloat16")
    if smoke:
        # plumbing check on CPU: the tests' tiny geometry, banded kernels in
        # interpret mode (use_banded_warp=2 forces the path off-TPU)
        cfg = Config(level=-1, N_iters=2, grd_h=32, grd_w=128, sat_size=64,
                     compute_dtype="bfloat16", use_banded_warp=2)
    model = LMS2GP(cfg=cfg)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(B, cfg.sat_size, cfg.sat_size, 3)
                      .astype(np.float32))
    grd = jnp.asarray(rng.rand(B, cfg.grd_h, cfg.grd_w, 3)
                      .astype(np.float32))
    gt = jnp.zeros((B, 3))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd, gt, mode="train")
    params = v["params"]
    key = jax.random.PRNGKey(7)

    # 1. full step guard (fps, same protocol as the bench extra)
    try:
        fps = bench._bench_train_step(cfg, B)
        print(f"RESULT full_step_bf16_b8 {fps:.2f} fps "
              f"({1e3 * B / fps:.1f} ms/step)", flush=True)
    except Exception as e:
        print(f"RESULT full_step_bf16_b8 FAILED {e}", flush=True)

    # 2/3. loss fwd and fwd+bwd
    @jax.jit
    def loss_fwd(p, s, g, c):
        out = model.apply({"params": p}, s + c * 1e-38, g, gt, mode="train",
                          rngs={"lm": key})
        return c + out.loss * 1e-20

    timeit("loss_fwd", lambda c: loss_fwd(params, sat, grd, c))

    @jax.jit
    def loss_fwdbwd(p, s, g, c):
        def lf(p):
            out = model.apply({"params": p}, s + c * 1e-38, g, gt,
                              mode="train", rngs={"lm": key})
            return out.loss
        l, gr = jax.value_and_grad(lf)(p)
        gn = sum(jnp.sum(x.astype(jnp.float32) ** 2)
                 for x in jax.tree_util.tree_leaves(gr))
        return c + l * 1e-20 + gn * 1e-30

    timeit("loss_fwdbwd", lambda c: loss_fwdbwd(params, sat, grd, c))

    # 4/5. features fwd and fwd+bwd
    def feats_m(m, s, g):
        return m.extract_features(s, g)

    @jax.jit
    def feats_fwd(p, s, g, c):
        outs = model.apply({"params": p}, s + c * 1e-38, g, method=feats_m)
        return c + sum(jnp.sum(t.astype(jnp.float32)) * 1e-30
                       for group in outs for t in group)

    timeit("features_fwd", lambda c: feats_fwd(params, sat, grd, c))

    @jax.jit
    def feats_fwdbwd(p, s, g, c):
        def lf(p):
            outs = model.apply({"params": p}, s + c * 1e-38, g,
                               method=feats_m)
            return sum(jnp.sum(t.astype(jnp.float32))
                       for group in outs for t in group)
        gr = jax.grad(lf)(p)
        return c + sum(jnp.sum(x.astype(jnp.float32) ** 2)
                       for x in jax.tree_util.tree_leaves(gr)) * 1e-30

    timeit("features_fwdbwd", lambda c: feats_fwdbwd(params, sat, grd, c))

    # precompute features for the solver-side pieces
    feats = jax.jit(lambda p, s, g: model.apply(
        {"params": p}, s, g, method=feats_m))(params, sat, grd)
    sat_feats, sat_confs, grd_feats, grd_confs = jax.tree.map(
        lambda x: np.asarray(x), feats, is_leaf=lambda x: hasattr(x, "shape"))
    sat_feats = [jnp.asarray(x) for x in sat_feats]
    sat_confs = [jnp.asarray(x) for x in sat_confs]
    grd_feats = [jnp.asarray(x) for x in grd_feats]
    grd_confs = [jnp.asarray(x) for x in grd_confs]
    for i, (sf, gf) in enumerate(zip(sat_feats, grd_feats)):
        print(f"  level {i}: sat {sf.shape} {sf.dtype}, "
              f"grd {gf.shape} {gf.dtype}", flush=True)

    # 6/7. solver fwd and fwd+bwd w.r.t. features (15 rounds, train path)
    def solver_m(m, sfs, scs, gfs, gcs):
        pose0 = jnp.zeros((B, 3), jnp.float32)
        traj, _, _ = m._run_rounds(pose0, list(sfs), list(scs), list(gfs),
                                   list(gcs), key, collect_aux=False,
                                   gt_depth=None, mode="train")
        return traj

    @jax.jit
    def solver_fwd(p, sfs, gfs, c):
        sfs = tuple(x + c.astype(x.dtype) * 1e-38 for x in sfs)
        traj = model.apply({"params": p}, sfs, tuple(sat_confs), gfs,
                           tuple(grd_confs), method=solver_m)
        return c + jnp.sum(traj.astype(jnp.float32) ** 2) * 1e-20

    timeit("solver_fwd",
           lambda c: solver_fwd(params, tuple(sat_feats), tuple(grd_feats),
                                c))

    @jax.jit
    def solver_fwdbwd(p, sfs, gfs, c):
        def lf(sfs, gfs):
            sfs = tuple(x + c.astype(x.dtype) * 1e-38 for x in sfs)
            traj = model.apply({"params": p}, sfs, tuple(sat_confs), gfs,
                               tuple(grd_confs), method=solver_m)
            return jnp.sum(traj.astype(jnp.float32) ** 2)
        l, gr = jax.value_and_grad(lf, argnums=(0, 1))(sfs, gfs)
        gn = sum(jnp.sum(x.astype(jnp.float32) ** 2)
                 for x in jax.tree_util.tree_leaves(gr))
        return c + l * 1e-20 + gn * 1e-30

    timeit("solver_fwdbwd",
           lambda c: solver_fwdbwd(params, tuple(sat_feats),
                                   tuple(grd_feats), c), n=5)

    # 8. optimizer-only (Adam apply on precomputed grads)
    state = create_train_state(cfg, params)
    grads = jax.jit(jax.grad(lambda p: model.apply(
        {"params": p}, sat, grd, gt, mode="train",
        rngs={"lm": key}).loss))(params)

    @jax.jit
    def opt_step(st, gr, c):
        gr = jax.tree.map(lambda x: x + c.astype(x.dtype) * 1e-38, gr)
        st2 = st.apply_gradients(grads=gr)
        lv = sum(jnp.sum(x.astype(jnp.float32) ** 2)
                 for x in jax.tree_util.tree_leaves(st2.params)) * 1e-30
        return c + lv

    timeit("optimizer_adam", lambda c: opt_step(state, grads, c))

    # --- Section C: per-level single round fwd / fwd+grad (train path) ---
    def round_m(m, sat_f, grd_f, pose, lvl):
        adam0 = (jnp.zeros((B, 3)), jnp.zeros((B, 3)))
        new_pose, _, _ = m._solver_round(
            pose, lvl, m._slots[lvl], sat_f, None, grd_f, None,
            jax.random.PRNGKey(0), adam0, 0, banded=True)
        return new_pose

    pose = jnp.zeros((B, 3), jnp.float32)
    for lvl in range(len(sat_feats)):
        rfn = functools.partial(round_m, lvl=lvl)

        @jax.jit
        def r_fwd(p, sf, gf, c, rfn=rfn):
            np_ = model.apply({"params": p}, sf + c.astype(sf.dtype) * 1e-38,
                              gf, pose, method=rfn)
            return c + jnp.sum(np_ ** 2) * 1e-20

        timeit(f"round_L{lvl}_fwd",
               lambda c, lvl=lvl, rfn=r_fwd: rfn(params, sat_feats[lvl],
                                                 grd_feats[lvl], c))

        @jax.jit
        def r_fwdbwd(p, sf, gf, c, rfn=rfn):
            def lf(sf, gf):
                np_ = model.apply({"params": p},
                                  sf + c.astype(sf.dtype) * 1e-38, gf, pose,
                                  method=rfn)
                return jnp.sum(np_ ** 2)
            l, gr = jax.value_and_grad(lf, argnums=(0, 1))(sf, gf)
            return c + l * 1e-20 + sum(
                jnp.sum(x.astype(jnp.float32) ** 2)
                for x in jax.tree_util.tree_leaves(gr)) * 1e-30

        timeit(f"round_L{lvl}_fwdbwd",
               lambda c, lvl=lvl, rfn=r_fwdbwd: rfn(params, sat_feats[lvl],
                                                    grd_feats[lvl], c))


if __name__ == "__main__":
    main(smoke="--smoke" in sys.argv)
