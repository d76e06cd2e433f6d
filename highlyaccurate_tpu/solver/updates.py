"""Pose-update inner-loop optimizers as pure functions.

TPU-native re-design of the reference's update rules:
  * S2GP LM:  /root/reference/models_kitti.py:939-1041
  * G2SP LM:  /root/reference/models_kitti.py:333-379
  * SGD:      /root/reference/models_kitti.py:1056-1084
  * ADAM:     /root/reference/models_kitti.py:1086-1124
  * GN (Ford):/root/reference/models_ford.py:534-...

Design notes (TPU-first):
  * pose is [B, 3]; features channel-last [B, H, W, C]; Jacobian [B, H, W, C, 3].
  * the frozen-DoF logic (reference models_kitti.py:954-957, 1015-1026) is
    *static*: ``active_dims`` comes from the config, so XLA compiles a solve
    of exactly the right size (3x3 / 2x2 / 1x1).
  * the 3x3 damped solve runs in float32 regardless of the feature dtype
    (numerical-conditioning note, SURVEY.md §7.3-8).
  * randomness (pixel dropout, out-of-range pose re-init) is explicit via
    jax.random keys instead of global RNG state.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class LMConfig(NamedTuple):
    """Static solver knobs (subset of Config relevant to the update rules)."""
    active_dims: tuple = (0, 1, 2)
    using_weight: bool = False
    train_damping: bool = False
    damping: float = 0.1
    use_hessian: bool = False
    dropout: int = 0
    normalize: bool = True      # S2GP normalizes features; G2SP does not
    reinit_range: float = 2.5   # out-of-bounds re-init threshold (S2GP only)
    reinit: bool = True
    raw_damping: bool = False   # G2SP uses the raw damping param
                                # (reference models_kitti.py:356-359), not the
                                # S2GP 10^(-6+11*sigmoid) parameterization


def _flatten_residual_system(sat_feat, grd_feat, grd_conf, jac, active_dims,
                             dropout_key=None):
    """Flatten [B, H, W, C] tensors into the LM residual system.

    Returns J [B, D, N], r-pieces (sat [B, D], grd [B, D]), weight base
    (conf [B, H*W] flattened pixels repeated later), with optional random
    half-pixel dropout (reference models_kitti.py:968-974).
    """
    B, H, W, C = sat_feat.shape
    n = len(active_dims)
    jac = jac[..., jnp.array(active_dims)]  # [B, H, W, C, n]

    sat = sat_feat.reshape(B, H * W, C)
    grd = grd_feat.reshape(B, H * W, C)
    conf = grd_conf.reshape(B, H * W)
    J = jac.reshape(B, H * W, C, n)

    if dropout_key is not None:
        keep = (H * W) // 2
        inds = jax.random.permutation(dropout_key, H * W)[:keep]
        sat = sat[:, inds, :]
        grd = grd[:, inds, :]
        conf = conf[:, inds]
        J = J[:, inds, :, :]

    D = sat.shape[1] * C
    sat = sat.reshape(B, D)
    grd = grd.reshape(B, D)
    # conf repeats across channels: weight[b, p*C + c] = conf[b, p]
    weight = jnp.repeat(conf, C, axis=-1)
    J = J.reshape(B, D, n)
    return J, sat, grd, weight


def compute_damping(damping_param, cfg: LMConfig, n_active: int):
    """Per-DoF damping vector [n_active] (float32).

    Trained damping uses the reference's log-parameterization
    10^(-6 + 11*sigmoid(d)) (models_kitti.py:962-963); otherwise a constant.
    """
    if cfg.train_damping:
        d = damping_param.reshape(-1).astype(jnp.float32)
        if d.shape[0] == 1:
            d = jnp.broadcast_to(d, (3,))
        if not cfg.raw_damping:
            d = 10.0 ** (-6.0 + jax.nn.sigmoid(d) * 11.0)
        return d[jnp.array(cfg.active_dims)][:n_active]
    return jnp.full((n_active,), cfg.damping, dtype=jnp.float32)


def lm_update(pose, sat_feat, sat_conf, grd_feat, grd_conf, jac,
              damping_param, cfg: LMConfig, key: Optional[jax.Array] = None):
    """One damped Gauss-Newton (Levenberg-Marquardt) pose update.

    Mirrors reference models_kitti.py:939-1041 (S2GP, ``normalize=True``) and
    models_kitti.py:333-379 (G2SP, ``normalize=False, use eye damping``).

    Args:
      pose: [B, 3] normalized pose.
      sat_feat: projected source features [B, H, W, C] (the "moving" image).
      grd_feat: target features [B, H, W, C].
      grd_conf: target confidence [B, H, W, 1].
      jac: d(sat_feat)/d(pose) [B, H, W, C, 3].
      damping_param: learned damping parameter (any shape; see compute_damping).
      key: PRNG key; consumed when cfg.dropout>0 (pixel dropout) and for the
        out-of-range re-init draw.
    Returns:
      new pose [B, 3].
    """
    B = pose.shape[0]
    active = cfg.active_dims
    n = len(active)

    dropout_key = reinit_key = None
    if key is not None:
        dropout_key, reinit_key = jax.random.split(key)
    if not (cfg.dropout > 0):
        dropout_key = None

    J, sat, grd, weight = _flatten_residual_system(
        sat_feat, grd_feat, grd_conf, jac, active, dropout_key)
    J = J.astype(jnp.float32)
    sat = sat.astype(jnp.float32)
    grd = grd.astype(jnp.float32)

    if cfg.normalize:
        # feature-norm scaling, floors at 1e-6 (reference :982-989).
        # _safe_norm instead of linalg.norm: an all-masked projection gives an
        # exactly-zero vector, whose norm backward is 0/0=NaN (the reference
        # instead hard-asserts sum(mask)>0, jacobian.py:172 — not jittable).
        sat_norm = _safe_norm(sat, 1e-6)
        sat = sat / sat_norm[:, None]
        J = J / sat_norm[:, None, None]
        grd_norm = _safe_norm(grd, 1e-6)
        grd = grd / grd_norm[:, None]

    r = sat - grd  # [B, D]

    if cfg.using_weight:
        w = weight.astype(jnp.float32)
    else:
        w = jnp.ones_like(r)

    # Hessian = J^T W J  [B, n, n];  g = J^T W r  [B, n]
    Jw = J * w[..., None]
    hess = jnp.einsum("bdn,bdm->bnm", Jw, J)
    g = jnp.einsum("bdn,bd->bn", Jw, r)

    return _solve_and_reinit(pose, hess, g, damping_param, cfg, reinit_key)


def _solve_and_reinit(pose, hess, g, damping_param, cfg: LMConfig,
                      reinit_key):
    """Shared LM solve tail: damped 3x3 (or smaller) solve on the
    active-DoF system + the out-of-range uniform re-init
    (reference models_kitti.py:1005-1033).  Used by both the materialized
    and the moment-based implicit updates so the train and eval solver
    paths cannot diverge (PERF.md: path consistency dominates recall).

    hess [B, n, n] and g [B, n] are already active-dim sliced.
    """
    B = pose.shape[0]
    active = cfg.active_dims
    n = len(active)
    act = jnp.array(active)
    damping = compute_damping(damping_param, cfg, n)
    if cfg.use_hessian:
        diag = jnp.einsum("bnn->bn", hess)
    else:
        diag = jnp.ones((B, n), dtype=jnp.float32)
    lhs = hess + _diag_embed(damping[None, :] * diag)
    delta = -jnp.linalg.solve(lhs, g[..., None])[..., 0]

    new = pose.astype(jnp.float32).at[:, act].add(delta)
    if cfg.reinit and n == 3 and reinit_key is not None:
        k1, k2 = jax.random.split(reinit_key)
        rand_u = jax.random.uniform(k1, (B,), minval=-1.0, maxval=1.0)
        rand_v = jax.random.uniform(k2, (B,), minval=-1.0, maxval=1.0)
        lim = cfg.reinit_range
        su, sv = new[:, 0], new[:, 1]
        new = new.at[:, 0].set(jnp.where((su > -lim) & (su < lim), su, rand_u))
        new = new.at[:, 1].set(jnp.where((sv > -lim) & (sv < lim), sv, rand_v))
    return new


def _implicit_moments(out, dx, dy, grd_feat, m2d, cfg: LMConfig,
                      key: Optional[jax.Array]):
    """Shared preamble of the implicit-J LM updates (banded row-affine and
    gather per-pixel variants): f32 casts, the reference's half-pixel
    dropout (models_kitti.py:968-974 — the keep-set must match
    _flatten_residual_system's permutation exactly so the implicit and
    materialized paths stay bit-comparable), the 9 masked per-pixel channel
    moments, and the floored whole-map feature norms (reference :982-989).

    Returns (moments dict of [B, H, W] arrays, ns [B], ng [B], reinit_key).
    """
    f32 = jnp.float32
    out = out.astype(f32)
    dx = dx.astype(f32)
    dy = dy.astype(f32)
    grd = grd_feat.astype(f32)
    _, H, W, _ = out.shape

    dropout_key = reinit_key = None
    if key is not None:
        dropout_key, reinit_key = jax.random.split(key)
    m = jnp.broadcast_to(m2d.astype(f32), (m2d.shape[0], H, W))
    if cfg.dropout > 0 and dropout_key is not None:
        # the reference keeps a random half of the flattened pixels;
        # dropped pixels leave the norms too, exactly like the
        # index-selection in _flatten_residual_system
        hw = H * W
        perm = jax.random.permutation(dropout_key, hw)[: hw // 2]
        dmask = jnp.zeros((hw,), f32).at[perm].set(1.0).reshape(H, W)
        m = m * dmask[None]

    # per-pixel channel contractions [B, H, W] (one fused pass over the
    # four [B,H,W,C] arrays; the only O(N) work in these updates)
    mom = {
        "ss": jnp.sum(out * out, -1) * m,
        "gg": jnp.sum(grd * grd, -1) * m,
        "sxx": jnp.sum(dx * dx, -1) * m,
        "sxy": jnp.sum(dx * dy, -1) * m,
        "syy": jnp.sum(dy * dy, -1) * m,
        "dxs": jnp.sum(dx * out, -1) * m,
        "dys": jnp.sum(dy * out, -1) * m,
        "dxg": jnp.sum(dx * grd, -1) * m,
        "dyg": jnp.sum(dy * grd, -1) * m,
    }
    # whole-map feature norms, floored (reference :982-989 / _safe_norm)
    ns = jnp.sqrt(jnp.maximum(jnp.sum(mom["ss"], (1, 2)), 1e-12))  # [B]
    ng = jnp.sqrt(jnp.maximum(jnp.sum(mom["gg"], (1, 2)), 1e-12))
    return mom, ns, ng, reinit_key


def _pixel_hessian(Du, Dv, sxx, sxy, syy):
    """Sum_pix duv^T S duv with S = [[sxx, sxy], [sxy, syy]] per pixel —
    the shared H contraction of the per-pixel implicit LM updates and
    ``lm_information`` (one definition so the solver and the covariance
    numerics cannot drift apart)."""
    return (jnp.einsum("bhwp,bhwq,bhw->bpq", Du, Du, sxx)
            + jnp.einsum("bhwp,bhwq,bhw->bpq", Du, Dv, sxy)
            + jnp.einsum("bhwp,bhwq,bhw->bpq", Dv, Du, sxy)
            + jnp.einsum("bhwp,bhwq,bhw->bpq", Dv, Dv, syy))


def lm_update_implicit(pose, out, dx, dy, grd_feat, m2d, P0, dP,
                       damping_param, cfg: LMConfig,
                       key: Optional[jax.Array] = None):
    """LM update from implicit (un-materialized) Jacobians.

    Mathematically identical to ``lm_update`` when the sampled feature's
    pose-Jacobian has the row-affine structure of the S2GP geo projection
    (reference models_kitti.py:700-801): per ground row v the satellite
    sample point is affine in the column u, so

        J[b,v,u,c,p] = (dx*duv_x[p] + dy*duv_y[p]) ,
        duv[b,v,u,:,p] = P0[b,v,:,p] + u * dP[b,v,:,p].

    H = J^T J and g = J^T r therefore contract into per-pixel channel
    moments (sum over c) followed by u-moment sums — the [B,V,W,C,3]
    Jacobian never exists in HBM (PERF.md "implicit-J" plan).  Feature
    normalization, pixel dropout, and Hessian-diagonal damping all fold
    into per-pixel scalars, so the full S2GP LM semantics are preserved.

    Args:
      out, dx, dy: banded-sampler outputs [B, V, W, C] (value and screen-
        space derivatives; in-bounds masking already applied by the kernel).
      grd_feat: target features [B, V, W, C] (unmasked).
      m2d: ray-validity mask [1|B, V, W].
      P0, dP: per-row affine duv coefficients [B, V, 2, 3].
    Returns:
      new pose [B, 3].
    """
    assert not cfg.using_weight, "banded implicit path never carries conf weights"
    assert cfg.normalize, "implicit path implements the S2GP normalized LM"
    W = out.shape[2]
    active = cfg.active_dims
    f32 = jnp.float32
    mm, ns, ng, reinit_key = _implicit_moments(out, dx, dy, grd_feat, m2d,
                                               cfg, key)
    sxx, sxy, syy = mm["sxx"], mm["sxy"], mm["syy"]
    dxs, dys, dxg, dyg = mm["dxs"], mm["dys"], mm["dxg"], mm["dyg"]

    u = jnp.arange(W, dtype=f32)
    u2 = u * u

    def moms(x):  # u-moment sums -> ([B,V],)*3
        return jnp.sum(x, 2), jnp.sum(x * u, 2), jnp.sum(x * u2, 2)

    def pair(Pa, Da, Pb, Db, m0, m1, m2):
        """Sum_v Sum_u duv_a[p] * duv_b[q] * S(v,u) with duv = P + u*D."""
        t0 = jnp.einsum("bvp,bvq,bv->bpq", Pa, Pb, m0)
        t1 = (jnp.einsum("bvp,bvq,bv->bpq", Pa, Db, m1)
              + jnp.einsum("bvp,bvq,bv->bpq", Da, Pb, m1))
        t2 = jnp.einsum("bvp,bvq,bv->bpq", Da, Db, m2)
        return t0 + t1 + t2

    Px, Py = P0[:, :, 0].astype(f32), P0[:, :, 1].astype(f32)  # [B, V, 3]
    Dx_, Dy_ = dP[:, :, 0].astype(f32), dP[:, :, 1].astype(f32)

    hess = (pair(Px, Dx_, Px, Dx_, *moms(sxx))
            + pair(Px, Dx_, Py, Dy_, *moms(sxy))
            + pair(Py, Dy_, Px, Dx_, *moms(sxy))
            + pair(Py, Dy_, Py, Dy_, *moms(syy))) / (ns * ns)[:, None, None]

    # g = J^T r with r = s/ns - g/ng
    qx = dxs / (ns[:, None, None] ** 2) - dxg / (ns * ng)[:, None, None]
    qy = dys / (ns[:, None, None] ** 2) - dyg / (ns * ng)[:, None, None]
    g_full = (jnp.einsum("bvp,bv->bp", Px, jnp.sum(qx, 2))
              + jnp.einsum("bvp,bv->bp", Dx_, jnp.sum(qx * u, 2))
              + jnp.einsum("bvp,bv->bp", Py, jnp.sum(qy, 2))
              + jnp.einsum("bvp,bv->bp", Dy_, jnp.sum(qy * u, 2)))

    act = jnp.array(active)
    hess = hess[:, act[:, None], act[None, :]]  # [B, n, n]
    g = g_full[:, act]
    return _solve_and_reinit(pose, hess, g, damping_param, cfg, reinit_key)


def lm_update_from_moments(pose, M, P0, dP, damping_param, cfg: LMConfig,
                           key: Optional[jax.Array] = None):
    """LM update from the fused-moment kernel's per-row moments.

    Mathematically identical to ``lm_update_implicit`` — the kernel
    (ops/pallas/banded_warp.py:make_banded_moments) pre-contracts the 9
    masked per-pixel channel moments and their u-moment sums per ground row,
    so this function only assembles H and g from [B, V]-sized arrays.
    Eval-only fast path (the kernel is non-differentiable); requires
    dropout=0 / using_weight=0.

    Args:
      M: [B, V, 3, 16] moment rows (sum, u-sum, u^2-sum) in MOM_IDX lane
        order, KERNEL axes (dx = kernel-x derivative).
      P0, dP: per-row affine duv coefficients [B, V, 2, 3] in the SAME axis
        order as the kernel's (x, y) — i.e. already swapped like the uv
        endpoints fed to the kernel.
    Returns:
      new pose [B, 3].
    """
    from highlyaccurate_tpu.ops.pallas.banded_warp import MOM_IDX
    assert not cfg.using_weight and cfg.dropout == 0 and cfg.normalize
    B = pose.shape[0]
    active = cfg.active_dims
    n = len(active)
    f32 = jnp.float32
    M = M.astype(f32)

    def mom(name, k):
        return M[:, :, k, MOM_IDX[name]]  # [B, V]

    reinit_key = None
    if key is not None:
        _, reinit_key = jax.random.split(key)

    ns = jnp.sqrt(jnp.maximum(jnp.sum(mom("ss", 0), 1), 1e-12))  # [B]
    ng = jnp.sqrt(jnp.maximum(jnp.sum(mom("gg", 0), 1), 1e-12))

    def pair(Pa, Da, Pb, Db, name):
        m0, m1, m2 = mom(name, 0), mom(name, 1), mom(name, 2)
        t0 = jnp.einsum("bvp,bvq,bv->bpq", Pa, Pb, m0)
        t1 = (jnp.einsum("bvp,bvq,bv->bpq", Pa, Db, m1)
              + jnp.einsum("bvp,bvq,bv->bpq", Da, Pb, m1))
        t2 = jnp.einsum("bvp,bvq,bv->bpq", Da, Db, m2)
        return t0 + t1 + t2

    Px, Py = P0[:, :, 0].astype(f32), P0[:, :, 1].astype(f32)  # [B, V, 3]
    Dx_, Dy_ = dP[:, :, 0].astype(f32), dP[:, :, 1].astype(f32)

    hess = (pair(Px, Dx_, Px, Dx_, "sxx")
            + pair(Px, Dx_, Py, Dy_, "sxy")
            + pair(Py, Dy_, Px, Dx_, "sxy")
            + pair(Py, Dy_, Py, Dy_, "syy")) / (ns * ns)[:, None, None]

    inv_ss = 1.0 / (ns * ns)[:, None]
    inv_sg = 1.0 / (ns * ng)[:, None]
    qx0 = mom("dxs", 0) * inv_ss - mom("dxg", 0) * inv_sg  # [B, V]
    qx1 = mom("dxs", 1) * inv_ss - mom("dxg", 1) * inv_sg
    qy0 = mom("dys", 0) * inv_ss - mom("dyg", 0) * inv_sg
    qy1 = mom("dys", 1) * inv_ss - mom("dyg", 1) * inv_sg
    g_full = (jnp.einsum("bvp,bv->bp", Px, qx0)
              + jnp.einsum("bvp,bv->bp", Dx_, qx1)
              + jnp.einsum("bvp,bv->bp", Py, qy0)
              + jnp.einsum("bvp,bv->bp", Dy_, qy1))

    act = jnp.array(active)
    hess = hess[:, act[:, None], act[None, :]]
    g = g_full[:, act]
    return _solve_and_reinit(pose, hess, g, damping_param, cfg, reinit_key)


def lm_update_implicit_pixel_norm(pose, out, dx, dy, grd_feat, m2d, duv,
                                  damping_param, cfg: LMConfig,
                                  key: Optional[jax.Array] = None):
    """S2GP LM update from per-pixel implicit Jacobians (gather path).

    Mathematically identical to ``lm_update`` on the materialized Jacobian
    ``jac = dx*duv_u + dy*duv_v`` — H and g contract through per-pixel
    channel moments, so the [B,H,W,C,3] array never exists in HBM.  This is
    the gather-sampler analogue of ``lm_update_implicit`` (whose duv is
    row-affine); here duv is fully per-pixel, which also serves the polar /
    gt-depth projections.  Full S2GP semantics: whole-map feature
    normalization with 1e-6 floors, ray-mask, pixel dropout, Hessian-diag
    damping, out-of-range re-init (reference models_kitti.py:939-1041).

    Args:
      out, dx, dy: sampled value + screen derivatives [B, H, W, C]
        (in-bounds masking already inside, ops/grid_sample.py).
      grd_feat: target features [B, H, W, C] (unmasked).
      m2d: ray-validity mask [1|B, H, W].
      duv: [B, H, W, 2, 3] per-pixel d(uv)/d(pose).
    """
    assert not cfg.using_weight, "implicit path never carries conf weights"
    assert cfg.normalize, "implicit path implements the S2GP normalized LM"
    f32 = jnp.float32
    mm, ns, ng, reinit_key = _implicit_moments(out, dx, dy, grd_feat, m2d,
                                               cfg, key)
    sxx, sxy, syy = mm["sxx"], mm["sxy"], mm["syy"]
    dxs, dys, dxg, dyg = mm["dxs"], mm["dys"], mm["dxg"], mm["dyg"]

    Du = duv[..., 0, :].astype(f32)   # [B, H, W, 3]
    Dv = duv[..., 1, :].astype(f32)
    hess = _pixel_hessian(Du, Dv, sxx, sxy, syy) / (ns * ns)[:, None, None]

    # g = J^T r with r = s/ns - g/ng
    qx = dxs / (ns[:, None, None] ** 2) - dxg / (ns * ng)[:, None, None]
    qy = dys / (ns[:, None, None] ** 2) - dyg / (ns * ng)[:, None, None]
    g_full = (jnp.einsum("bhwp,bhw->bp", Du, qx)
              + jnp.einsum("bhwp,bhw->bp", Dv, qy))

    act = jnp.array(cfg.active_dims)
    hess = hess[:, act[:, None], act[None, :]]
    g = g_full[:, act]
    return _solve_and_reinit(pose, hess, g, damping_param, cfg, reinit_key)


def lm_update_implicit_pixel(pose, out, dx, dy, target, duv, damping_param,
                             cfg: LMConfig):
    """G2SP LM update from per-pixel moments — the [B,H,W,C,3] Jacobian is
    never materialized.

    Mirrors the G2SP ``lm_update`` semantics (reference
    models_kitti.py:333-379: residual r = out - target, NO feature
    normalization, raw per-DoF damping on the identity, no re-init) with
    J[p,c,:] = dx[p,c]*duv_x[p,:] + dy[p,c]*duv_y[p,:]:

        H = sum_p duv_p^T S_p duv_p,   S_p = [[sxx, sxy], [sxy, syy]]_p
        g = sum_p duv_p^T [sum_c dx*r; sum_c dy*r]_p

    Args:
      out/dx/dy: sampled value + screen derivatives [B, H, W, C];
      target: [B, H, W, C]; duv: [B, H, W, 2, 3].
    """
    assert not cfg.using_weight, "pixel-implicit path carries no conf weight"
    f32 = jnp.float32
    out = out.astype(f32)
    dx = dx.astype(f32)
    dy = dy.astype(f32)
    r = out - target.astype(f32)

    sxx = jnp.sum(dx * dx, -1)   # [B, H, W]
    sxy = jnp.sum(dx * dy, -1)
    syy = jnp.sum(dy * dy, -1)
    rx = jnp.sum(dx * r, -1)
    ry = jnp.sum(dy * r, -1)

    Du = duv[..., 0, :].astype(f32)   # [B, H, W, 3]
    Dv = duv[..., 1, :].astype(f32)
    hess = _pixel_hessian(Du, Dv, sxx, sxy, syy)
    g = (jnp.einsum("bhwp,bhw->bp", Du, rx)
         + jnp.einsum("bhwp,bhw->bp", Dv, ry))
    act = jnp.array(cfg.active_dims)
    hess = hess[:, act[:, None], act[None, :]]
    g = g[:, act]
    return _solve_and_reinit(pose, hess, g, damping_param, cfg, None)


def lm_update_pixel_moments(pose, pm, duv, damping_param, cfg: LMConfig):
    """G2SP LM update from the fused pixel-moments kernel output.

    Mathematically identical to ``lm_update_implicit_pixel`` — the kernel
    (ops/pallas/banded_warp.py:make_projline_pixmom) pre-contracts the five
    per-pixel channel moments (sxx, sxy, syy, dx.r, dy.r with
    r = out - target) over C, so the [B,H,W,C]x3 sampled fields never exist
    in HBM.  Same G2SP semantics (reference models_kitti.py:333-379: raw
    per-DoF damping, no normalization, no re-init).  Eval-only (the kernel
    is non-differentiable).

    Args:
      pm: [B, H, W, 16] moment lanes in PIXMOM_IDX order.
      duv: [B, H, W, 2, 3] per-pixel d(uv)/d(pose), axes matching the
        kernel's (x, y) derivative order.
    """
    from highlyaccurate_tpu.ops.pallas.banded_warp import PIXMOM_IDX
    assert not cfg.using_weight, "pixel-implicit path carries no conf weight"
    f32 = jnp.float32
    pm = pm.astype(f32)
    sxx = pm[..., PIXMOM_IDX["sxx"]]   # [B, H, W]
    sxy = pm[..., PIXMOM_IDX["sxy"]]
    syy = pm[..., PIXMOM_IDX["syy"]]
    rx = pm[..., PIXMOM_IDX["rx"]]
    ry = pm[..., PIXMOM_IDX["ry"]]

    Du = duv[..., 0, :].astype(f32)   # [B, H, W, 3]
    Dv = duv[..., 1, :].astype(f32)
    hess = _pixel_hessian(Du, Dv, sxx, sxy, syy)
    g = (jnp.einsum("bhwp,bhw->bp", Du, rx)
         + jnp.einsum("bhwp,bhw->bp", Dv, ry))
    act = jnp.array(cfg.active_dims)
    hess = hess[:, act[:, None], act[None, :]]
    g = g[:, act]
    return _solve_and_reinit(pose, hess, g, damping_param, cfg, None)


def _diag_embed(x):
    """[..., n] -> [..., n, n] diagonal matrices."""
    n = x.shape[-1]
    return x[..., None] * jnp.eye(n, dtype=x.dtype)


def _safe_norm(x, floor: float):
    """L2 norm over the last axis, floored, with a NaN-free backward at 0.

    sqrt(max(sum_sq, floor^2)) — the max's select gates the sqrt backward, so
    a zero vector yields gradient 0 instead of 0/0.
    """
    sq = jnp.sum(x * x, axis=-1)
    return jnp.sqrt(jnp.maximum(sq, floor * floor))


def sgd_update(pose, sat_feat, sat_conf, grd_feat, grd_conf, jac,
               cfg: LMConfig, lr: float = 0.01):
    """Plain gradient step on the L2 residual (reference models_kitti.py:1056-1084).

    grad = sum(2r * dfeat/dpose) over (H, W, C); pose -= lr * grad.
    """
    active = cfg.active_dims
    r = (sat_feat - grd_feat).astype(jnp.float32)
    grad = jnp.einsum("bhwc,bhwcn->bn", 2 * r,
                      jac[..., jnp.array(active)].astype(jnp.float32))
    return pose.at[:, jnp.array(active)].add(-lr * grad)


def gn_update(pose, sat_feat, grd_feat, grd_conf, jac, cfg: LMConfig,
              key: Optional[jax.Array] = None):
    """Undamped Gauss-Newton step (Ford variant, models_ford.py:534-598).

    Normalizes by the sat-feature whole-map norm, weights by grd confidence,
    solves H delta = -J^T W r with NO damping, then applies the out-of-range
    uniform re-init.
    """
    B = pose.shape[0]
    active = cfg.active_dims
    J, sat, grd, weight = _flatten_residual_system(
        sat_feat, grd_feat, grd_conf, jac, active, None)
    J = J.astype(jnp.float32)
    sat = sat.astype(jnp.float32)
    grd = grd.astype(jnp.float32)

    sat_norm = _safe_norm(sat, 1e-6)
    sat = sat / sat_norm[:, None]
    J = J / sat_norm[:, None, None]

    r = sat - grd
    w = weight.astype(jnp.float32) if cfg.using_weight else jnp.ones_like(r)
    Jw = J * w[..., None]
    hess = jnp.einsum("bdn,bdm->bnm", Jw, J)
    g = jnp.einsum("bdn,bd->bn", Jw, r)
    # tiny Tikhonov floor keeps the solve finite when H is singular (the
    # reference would raise on torch.inverse)
    n = len(active)
    delta = -jnp.linalg.solve(hess + 1e-8 * jnp.eye(n), g[..., None])[..., 0]
    new = pose.astype(jnp.float32).at[:, jnp.array(active)].add(delta)

    if key is not None and n == 3:
        k1, k2 = jax.random.split(key)
        rand_u = jax.random.uniform(k1, (B,), minval=-1.0, maxval=1.0)
        rand_v = jax.random.uniform(k2, (B,), minval=-1.0, maxval=1.0)
        su, sv = new[:, 0], new[:, 1]
        new = new.at[:, 0].set(jnp.where((su > -2.5) & (su < 2.5), su, rand_u))
        new = new.at[:, 1].set(jnp.where((sv > -2.5) & (sv < 2.5), sv, rand_v))
    return new


def sgd_update_l1(pose, sat_feat, grd_feat, jac, cfg: LMConfig,
                  lr: float = 0.001):
    """L1-subgradient SGD step (Ford variant, models_ford.py:609-634):
    grad = sum(sign(r)/(C*H*W) * dfeat/dpose)."""
    active = cfg.active_dims
    r = (sat_feat - grd_feat).astype(jnp.float32)
    H, W, C = r.shape[1:]
    sub = jnp.sign(r) / (C * H * W)
    grad = jnp.einsum("bhwc,bhwcn->bn", sub,
                      jac[..., jnp.array(active)].astype(jnp.float32))
    return pose.at[:, jnp.array(active)].add(-lr * grad)


def adam_update(pose, sat_feat, grd_feat, jac, m, v, t,
                cfg: LMConfig, beta1: float = 0.9, beta2: float = 0.999,
                lr: float = 0.01):
    """Adam-style inner-loop update (reference models_kitti.py:1086-1124).

    m, v: [B, n] accumulators; t: python int step index (static).
    Returns (pose, m, v).
    """
    active = cfg.active_dims
    r = (sat_feat - grd_feat).astype(jnp.float32)
    grad = jnp.einsum("bhwc,bhwcn->bn", 2 * r,
                      jac[..., jnp.array(active)].astype(jnp.float32))
    m = beta1 * m + (1 - beta1) * grad
    v = beta2 * v + (1 - beta2) * grad * grad
    m_hat = m / (1 - beta1 ** (t + 1))
    v_hat = v / (1 - beta2 ** (t + 1))
    delta = m_hat / (jnp.sqrt(v_hat) + 1e-8)
    pose = pose.at[:, jnp.array(active)].add(-lr * delta)
    return pose, m, v


def lm_information(out, dx, dy, target, m2d, duv, active_dims,
                   normalize: bool):
    """Gauss-Newton information of the LM objective at a pose.

    NEW capability (no reference counterpart): the solver's own J^T J at the
    final pose is the Fisher information of the local least-squares model,
    so its (residual-scaled) inverse estimates the pose covariance — which
    production consumers (fusion filters, planners) need alongside the point
    estimate.  Computed from the same per-pixel implicit pieces as the LM
    updates (the [B,H,W,C,3] Jacobian is never materialized).

    Args:
      out, dx, dy: sampled value + screen derivatives [B, H, W, C].
      target: the other branch's features [B, H, W, C] (unmasked).
      m2d: validity mask [1|B, H, W] (pass ones for the G2SP objective,
        whose residual keeps out-of-bounds pixels — the sampler zeroes them).
      duv: [B, H, W, 2, 3] per-pixel d(uv)/d(pose).
      normalize: True = S2GP/Ford residual r = s/ns - g/ng with whole-map
        floored norms (reference models_kitti.py:982-989); False = G2SP
        residual r = out - target (models_kitti.py:333-379).

    Returns (hess [B, 3, 3] with zero rows/cols on inactive dims,
    rss [B] residual sum-of-squares, n_res [B] residual count).
    """
    f32 = jnp.float32
    out = out.astype(f32)
    tgt = target.astype(f32)
    B, H, W, C = out.shape
    # reuse the solver's own moment preamble (no dropout at info time) so
    # the covariance H and the LM H share one definition
    mm, ns, ng, _ = _implicit_moments(out, dx, dy, target, m2d,
                                      LMConfig(dropout=0), None)
    Du = duv[..., 0, :].astype(f32)   # [B, H, W, 3]
    Dv = duv[..., 1, :].astype(f32)
    hess = _pixel_hessian(Du, Dv, mm["sxx"], mm["sxy"], mm["syy"])

    # rss from the residual DIRECTLY — the ss+gg-2sg moment identity
    # cancels catastrophically in f32 exactly when the fit is good (huge
    # sums, tiny difference), which would report near-zero covariance on
    # well-matched features
    m = jnp.broadcast_to(m2d.astype(f32), (m2d.shape[0], H, W))[..., None]
    if normalize:
        hess = hess / (ns * ns)[:, None, None]
        r = (out / ns[:, None, None, None]
             - tgt / ng[:, None, None, None]) * m
    else:
        r = (out - tgt) * m
    rss = jnp.sum(r * r, (1, 2, 3))
    n_res = jnp.broadcast_to(jnp.sum(m[..., 0], (1, 2)) * C, (B,))

    act = jnp.array(active_dims)
    sel = jnp.zeros((3,), f32).at[act].set(1.0)
    hess = hess * sel[None, :, None] * sel[None, None, :]
    return hess, rss, n_res


def pose_covariance(hess, rss, n_res, active_dims):
    """[B, 3, 3] pose covariance from ``lm_information`` outputs.

    cov = sigma^2 * H^-1 on the active-DoF block (sigma^2 = rss / dof, the
    standard nonlinear-least-squares residual-variance estimate); inactive
    dims get zero rows/cols.  float32 solve with a relative Tikhonov floor
    so a flat residual surface yields a large-but-finite covariance.
    """
    f32 = jnp.float32
    act = jnp.array(active_dims)
    n = len(active_dims)
    h = hess[:, act[:, None], act[None, :]].astype(f32)       # [B, n, n]
    tr = jnp.einsum("bnn->b", h)
    eye = jnp.eye(n, dtype=f32)
    h = h + (1e-9 * tr / n + 1e-20)[:, None, None] * eye
    sigma2 = rss / jnp.maximum(n_res - n, 1.0)
    cov_act = jnp.linalg.inv(h) * sigma2[:, None, None]
    cov = jnp.zeros((hess.shape[0], 3, 3), f32)
    return cov.at[:, act[:, None], act[None, :]].set(cov_act)
