"""LM_S2GP: satellite->ground projection + unrolled LM pose solver (KITTI).

TPU-native re-design of the reference's flagship model
(reference: /root/reference/models_kitti.py:598-1492).

Architecture (differs from the torch reference on purpose — SURVEY.md §7.1):
  * pure functional forward under ``jit``: the (N_iters x levels) solver is a
    ``lax.scan`` over iterations with the level sequence unrolled inside the
    scan body (per-level shapes are static);
  * channel-last [B, H, W, C] features; pose is one [B, P, 3] array vmapped
    over P multi-start hypotheses (reference is always P=1, batch-1);
  * randomness (LM pixel dropout, out-of-range pose re-init) threads explicit
    PRNG keys via the flax 'lm' RNG collection;
  * optional ``jax.checkpoint`` (remat) around each solver round bounds the
    memory of backprop through the unrolled loop.

Behavioral parity notes:
  * ground rays are precomputed per level with the reference's fixed K
    (models_kitti.py:655-682) — the per-drive K is NOT used in S2GP, a
    reference quirk preserved (SURVEY.md §7.4);
  * geo projection keeps only the bottom half of ground rows (sky crop,
    models_kitti.py:1194-1199);
  * gt-pose projections (for loss methods 1-3 / visualization) are computed
    once per level, outside the scan.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.geometry import kitti as geom
from highlyaccurate_tpu.losses.losses import LossDiagnostics, loss_func
from highlyaccurate_tpu.models.nnrefine import NNrefine
from highlyaccurate_tpu.models.vggunet import VGGUnet
from highlyaccurate_tpu.ops.grid_sample import grid_sample, grid_sample_derivs
from highlyaccurate_tpu.solver.updates import (LMConfig, adam_update,
                                               lm_information, lm_update,
                                               lm_update_from_moments,
                                               lm_update_implicit,
                                               lm_update_implicit_pixel_norm,
                                               pose_covariance, sgd_update)
from highlyaccurate_tpu.utils import geo

# cache of compiled banded samplers keyed by static shape
_BANDED_CACHE: dict = {}


def banded_project(cfg: Config, sat_feat, uv01, duv01, mask_vw,
                   with_jac: bool, implicit: bool = False, moments_grd=None):
    """Shared Pallas banded-sampler dispatch for every per-row-affine
    projection (KITTI S2GP geo and the Ford cam->body->world->sat chain —
    both map each ground row to a straight satellite line, so one kernel
    family serves both models).

    Geometry note: sat-u is the (near-)constant-depth axis, so ground rows
    trace near-VERTICAL lines in sat space.  The kernel shears along its x
    axis (needs |dy/dx| < 1), so the sat axes and uv components are swapped
    here and the returned d/dx, d/dy are swapped back accordingly.

    Args:
      uv01: [B, V, 2, 2] satellite uv of each row's u=0,1 pixels (the two
        endpoints determine the per-row affine map exactly).
      duv01: [B, V, 2, 2, 3] d(uv)/d(pose) at u=0,1, or None.
      mask_vw: [V, W] ray-validity mask.

    Returns (mirroring the three fast-path contracts):
      * default: (out*mask, jac*mask or None, mask2d [1, V, W]);
      * ``implicit``: (out, dx, dy, mask2d, P0, dP) for
        ``lm_update_implicit`` — out/dx/dy unmasked kernel outputs,
        duv(v, u) = P0 + u*dP;
      * ``moments_grd`` given ([B, V, W, C] target rows): (M [B, V, 3, 16],
        P0s, dPs) for ``lm_update_from_moments`` — even out/dx/dy never
        exist in HBM; P0s/dPs in kernel axis order.
    """
    from highlyaccurate_tpu.ops.pallas.banded_warp import (
        default_rb, make_banded_moments, make_banded_sampler)
    A, C = sat_feat.shape[1], sat_feat.shape[-1]
    V, Wg = mask_vw.shape
    RB = default_rb(A)
    mask2d = mask_vw[None]

    uv01s = uv01[..., ::-1]
    bf16_map = (cfg.compute_dtype == "bfloat16"
                or bool(cfg.banded_bf16_map))
    interp = jax.default_backend() != "tpu"
    sat_t = jnp.transpose(sat_feat, (0, 2, 1, 3))         # swap sat axes
    # -1 = auto: 128 measured best for the S2GP/Ford banded kernels at
    # batched shapes (scripts/r5_uwin_confirm.py), but the per-(line,
    # block) chunk overhead LOSES at batch 1 where the kernels are
    # launch/VPU-build bound (+0.8 ms batch-1 eval, +1.5 ms tracking —
    # scripts/r5_b1_uwin_probe.py), so small batches keep the base
    # schedule.  Bit-identical at any value.
    B = sat_feat.shape[0]
    u_chunk = ((128 if B >= 8 else 0) if cfg.banded_u_chunk < 0
               else cfg.banded_u_chunk)

    if moments_grd is not None:
        key_ = ("mom", A, C, V, Wg, RB, bf16_map, u_chunk)
        msampler = _BANDED_CACHE.get(key_)
        if msampler is None:
            msampler = make_banded_moments(
                A=A, C=C, V=V, W=Wg, RB=RB, bf16_map=bf16_map,
                interpret=interp, u_chunk=u_chunk)
            _BANDED_CACHE[key_] = msampler
        M = msampler(sat_t, moments_grd, mask_vw,
                     uv01s[:, :, 0], uv01s[:, :, 1])
        # kernel axis order (x = our v): swap the duv component axis too
        P0s = duv01[:, :, 0][:, :, ::-1]                  # [B, V, 2, 3]
        dPs = (duv01[:, :, 1] - duv01[:, :, 0])[:, :, ::-1]
        return M, P0s, dPs

    key_ = (A, C, V, Wg, RB, bf16_map, u_chunk)
    sampler = _BANDED_CACHE.get(key_)
    if sampler is None:
        sampler = make_banded_sampler(
            A=A, C=C, V=V, W=Wg, RB=RB, bf16_map=bf16_map,
            interpret=interp, u_chunk=u_chunk)
        _BANDED_CACHE[key_] = sampler
    out, dv_, du_ = sampler(sat_t, uv01s[:, :, 0], uv01s[:, :, 1])
    dx, dy = du_, dv_  # kernel x == our v; kernel y == our u

    if implicit:
        P0 = duv01[:, :, 0]                               # [B, V, 2, 3]
        dP = duv01[:, :, 1] - P0
        return out, dx, dy, mask2d, P0, dP

    jac = None
    if with_jac:
        P0 = duv01[:, :, 0]                               # [B, V, 2, 3]
        dP = duv01[:, :, 1] - P0
        u = jnp.arange(Wg, dtype=jnp.float32)
        duv = P0[:, :, None] + u[None, None, :, None, None] * dP[:, :, None]
        jac = (dx[..., None] * duv[:, :, :, None, 0, :]
               + dy[..., None] * duv[:, :, :, None, 1, :])
        jac = jac * mask2d[..., None, None]
    out = out * mask2d[..., None]
    return out, jac, mask2d


def _level_hw(cfg: Config, level_idx: int):
    """Feature map H, W of pyramid slot ``level_idx`` (0 coarse ... 3 fine)."""
    f = 2 ** (3 - level_idx)
    return cfg.grd_h // f, cfg.grd_w // f


def precompute_rays(cfg: Config):
    """Host-side per-level ground-plane rays (reference models_kitti.py:622-635).

    The reference's fixed K was calibrated for a 1242x375 original frame; we
    scale it by the configured ground image size exactly as the reference
    scales to its 1024x256 (models_kitti.py:664-667).
    """
    rays = []
    for lvl in range(4):
        h, w = _level_hw(cfg, lvl)
        if cfg.proj == "geo":
            xyz, mask, xyz_w = geom.grd_img2cam(h, w, cfg.grd_h, cfg.grd_w,
                                                camera_k=_scaled_default_k(cfg))
            rays.append((xyz, mask, xyz_w))
        else:
            xyz, mask = geom.grd_img2cam_polar(h, w)
            rays.append((xyz, mask, None))
    return rays


def _scaled_default_k(cfg: Config):
    """Reference fixed K (for 1024x256 inputs), rescaled to cfg.grd_{h,w}."""
    k = geom.DEFAULT_CAMERA_K.copy()
    k[0, :] *= cfg.grd_w / 1024.0
    k[1, :] *= cfg.grd_h / 256.0
    return k


def level_slots(cfg: Config):
    """Map config.level to pyramid slot indices (coarse->fine), matching
    VGGUnet's slice selection (reference VGG.py:178-203)."""
    return {
        -1: [0], -2: [1], -3: [2],
        2: [1, 2], 3: [0, 1, 2], 4: [0, 1, 2, 3],
    }[cfg.level]


def polar_grid(sat_size: int, slot: int, max_radius_m: float = 40.0):
    """Polar satellite->panorama sampling grid (reference
    models_kitti.py:1518-1541): [grd_H, 4*grd_W, 2] pixel coords."""
    A = sat_size // (2 ** (3 - slot))
    # meters-per-pixel ladder (reference models_kitti.py:637-640), adjusted
    # for non-default sat sizes
    mpp = geo.get_meter_per_pixel() * (geo.get_process_satmap_sidelength()
                                       / sat_size) * (2 ** (3 - slot))
    grd_H, grd_W = A // 2, A * 2
    v, u = np.meshgrid(np.arange(grd_H, dtype=np.float32),
                       np.arange(4 * grd_W, dtype=np.float32), indexing="ij")
    theta = u / grd_W * np.pi * 2
    radius = (1 - v / grd_H) * max_radius_m / mpp
    us = A / 2 + radius * np.cos(np.pi / 4 - theta)
    vs = A / 2 - radius * np.sin(np.pi / 4 - theta)
    return np.stack([us, vs], axis=-1).astype(np.float32)


class LMS2GP(nn.Module):
    """Flagship KITTI model, direction S2GP."""
    cfg: Config
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.SatFeatureNet = VGGUnet(level=cfg.level, dtype=dt,
                                     pad_cin=cfg.pad_input_channels)
        self.GrdFeatureNet = VGGUnet(level=cfg.level, dtype=dt,
                                     pad_cin=cfg.pad_input_channels)
        # damping parameter (reference models_kitti.py:615-620)
        shape = (1, 3) if cfg.rotation_range > 0 else ()
        self.damping = self.param("damping", nn.initializers.zeros, shape)
        if cfg.Optimizer == "NN":
            self.nn_refine = NNrefine(dtype=dt)

        self._rays = precompute_rays(cfg)
        self._slots = level_slots(cfg)
        self._polar_grids = tuple(polar_grid(cfg.sat_size, s)
                                  for s in range(4))
        self._meters_per_pixel = tuple(
            geo.get_meter_per_pixel() * (2 ** (3 - s)) for s in range(4))

    # -- geometry + sampling for one level ---------------------------------
    def _level_rays(self, slot: int, gt_depth, row_start: int):
        """Ground-plane points + validity mask for one pyramid slot
        (reference models_kitti.py:741-755: precomputed rays, or the
        gt-depth lift).  Returns (xyz [H', W, 3] or [B, H', W, 3],
        mask [1|B, H', W])."""
        cfg = self.cfg
        if cfg.use_gt_depth and gt_depth is not None:
            h, w = _level_hw(cfg, slot)
            xyz_w = jnp.asarray(self._rays[slot][2])  # [H, W, 3]
            # the reference downsamples depth AND mask with F.interpolate
            # mode='nearest' (models_kitti.py:741-748), whose index rule is
            # floor(i * in/out) — NOT half-pixel-center nearest; replicate
            # exactly (asymmetric subsample, no averaging)
            H, W = gt_depth.shape[1:3]
            ri = jnp.floor(jnp.arange(h) * (H / h)).astype(jnp.int32)
            ci = jnp.floor(jnp.arange(w) * (W / w)).astype(jnp.int32)
            depth = gt_depth[:, ri][:, :, ci][..., None]  # [B, h, w, 1]
            xyz = xyz_w[None] * depth
            mask2d = (depth[..., 0] != -1).astype(jnp.float32)
            if row_start:
                xyz = xyz[:, row_start:]
                mask2d = mask2d[:, row_start:]
            return xyz, mask2d
        return (jnp.asarray(self._rays[slot][0][row_start:]),
                jnp.asarray(self._rays[slot][1][row_start:])[None])

    def _project_derivs(self, sat_feat, pose, slot: int, row_start: int,
                        gt_depth=None):
        """Gather-path implicit-J pieces: sampled value + screen derivatives
        + per-pixel duv (the [B,H,W,C,3] Jacobian is never materialized —
        ``lm_update_implicit_pixel_norm`` contracts H/g from these).
        Returns (out, dx, dy, mask2d, duv)."""
        cfg = self.cfg
        A = sat_feat.shape[1]
        xyz, mask2d = self._level_rays(slot, gt_depth, row_start)
        uv, duv = geom.s2gp_uv_jac(pose, xyz, A, cfg.rotation_range,
                                   cfg.shift_range_lat, cfg.shift_range_lon)
        out, dx, dy = grid_sample_derivs(sat_feat, uv)
        return out, dx, dy, mask2d, duv

    def _project(self, sat_feat, sat_conf, pose, slot: int, with_jac: bool,
                 gt_depth=None, row_start: int = 0):
        """Project satellite features into the ground view at ``pose``.

        Reference models_kitti.py:803-937 (project_map_to_grd).
        ``row_start`` restricts sampling to ground rows >= row_start (the LM
        update only consumes the sky-cropped bottom half — sampling the rest
        is wasted gather bandwidth; used when the full map isn't needed).
        Returns (sat_feat_proj, sat_conf_proj, jac, uv_masked, mask).
        """
        cfg = self.cfg
        A = sat_feat.shape[1]
        xyz, mask2d = self._level_rays(slot, gt_depth, row_start)

        if with_jac:
            uv, duv = geom.s2gp_uv_jac(pose, xyz, A, cfg.rotation_range,
                                       cfg.shift_range_lat, cfg.shift_range_lon)
        else:
            uv = geom.s2gp_uv(pose, xyz, A, cfg.rotation_range,
                              cfg.shift_range_lat, cfg.shift_range_lon)
            duv = None

        feat_proj, jac = grid_sample(sat_feat, uv, duv)
        m = jnp.broadcast_to(mask2d, feat_proj.shape[:3])
        feat_proj = feat_proj * m[..., None]
        if jac is not None:
            jac = jac * m[..., None, None]
        conf_proj = None
        if sat_conf is not None:
            conf_proj, _ = grid_sample(sat_conf, uv)
            conf_proj = conf_proj * m[..., None]
        return feat_proj, conf_proj, jac, uv * m[..., None], m

    def _project_banded(self, sat_feat, pose, slot: int, row_start: int,
                        with_jac: bool, implicit: bool = False,
                        moments_grd=None):
        """Pallas banded line sampler path (ops/pallas/banded_warp.py).

        Exploits the per-row-affine structure of the geo projection; exact
        bilinear + Jacobian parity with _project (see tests/test_banded_warp),
        differentiable w.r.t. sat features and pose via the kernel's custom
        VJP.

        When ``implicit`` (LM fast path), the [B,V,W,C,3] feature Jacobian is
        NOT materialized; returns the raw pieces
        (out, dx, dy, mask2d, P0, dP) for ``lm_update_implicit`` — out/dx/dy
        unmasked kernel outputs, duv(v, u) = P0 + u*dP.

        When ``moments_grd`` is given (eval fast path; [B, V, W, C] target
        feature rows), even out/dx/dy never exist in HBM: the fused-moment
        kernel contracts the LM moments in-register and this returns
        (M [B,V,3,16], P0s, dPs) for ``lm_update_from_moments`` (P0s/dPs in
        kernel axis order).
        """
        cfg = self.cfg
        A = sat_feat.shape[1]
        xyz = jnp.asarray(self._rays[slot][0][row_start:])   # [V, W, 3]
        mask_vw = jnp.asarray(self._rays[slot][1][row_start:])  # [V, W]

        # uv and duv at u=0,1 determine the per-row affine maps exactly
        xyz01 = xyz[:, :2]                                    # [V, 2, 3]
        if moments_grd is not None:
            with_jac = True
        if with_jac:
            uv01, duv01 = geom.s2gp_uv_jac(pose, xyz01, A, cfg.rotation_range,
                                           cfg.shift_range_lat,
                                           cfg.shift_range_lon)
        else:
            uv01 = geom.s2gp_uv(pose, xyz01, A, cfg.rotation_range,
                                cfg.shift_range_lat, cfg.shift_range_lon)
            duv01 = None

        return banded_project(cfg, sat_feat, uv01, duv01, mask_vw,
                              with_jac=with_jac, implicit=implicit,
                              moments_grd=moments_grd)

    def _solver_round(self, pose, level_pos: int, slot: int, sat_feat, sat_conf,
                      grd_feat, grd_conf, key, adam_state, t, gt_depth=None,
                      collect: bool = False, banded: bool = False,
                      fused_eval: bool = False):
        """One (iteration, level) solver round. Returns (pose', adam', aux)."""
        cfg = self.cfg
        grd_H = grd_feat.shape[1]

        # When the full projected map isn't collected for aux losses, only
        # sample the bottom-half rows the sky crop keeps — halves the gather
        # work of the hot loop with identical LM numerics.
        half = grd_H // 2 if cfg.proj == "geo" else 0
        row_start = 0 if collect else half

        # conf maps feed the LM weight only when using_weight=1 — skip the
        # extra sampling otherwise (reference always samples; wasted work)
        need_conf = bool(cfg.using_weight)
        use_banded = (banded and cfg.proj == "geo" and not need_conf
                      and not collect and not cfg.use_gt_depth)
        if use_banded and cfg.Optimizer == "LM" and cfg.use_implicit_lm:
            # implicit-J fast path: H and g contract from (out, dx, dy) and
            # the per-row affine duv without materializing [B,V,W,C,3]
            lm_cfg = LMConfig(
                active_dims=cfg.active_pose_dims,
                using_weight=False,
                train_damping=bool(cfg.train_damping),
                damping=cfg.damping,
                use_hessian=bool(cfg.use_hessian),
                dropout=cfg.dropout,
                normalize=True,
            )
            if fused_eval and cfg.dropout == 0:
                # eval fast path: the kernel contracts the LM moments
                # in-register — no [B,V,W,C] intermediates in HBM at all
                M, P0s, dPs = self._project_banded(
                    sat_feat, pose, slot, row_start, with_jac=True,
                    moments_grd=grd_feat[:, row_start:])
                new_pose = lm_update_from_moments(
                    pose, M, P0s, dPs, self.damping, lm_cfg, key)
                return new_pose, adam_state, None
            out, dxs, dys, m2, P0, dP = self._project_banded(
                sat_feat, pose, slot, row_start, with_jac=True, implicit=True)
            new_pose = lm_update_implicit(
                pose, out, dxs, dys, grd_feat[:, row_start:], m2, P0, dP,
                self.damping, lm_cfg, key)
            return new_pose, adam_state, None
        if (not use_banded and cfg.Optimizer == "LM" and cfg.use_implicit_lm
                and not need_conf and not collect):
            # gather-path implicit-J fast path (round-2 VERDICT #2): same
            # per-pixel moment contraction as the banded implicit path, fed
            # by the gather sampler's (out, dx, dy) + the per-pixel duv —
            # works for geo/polar/gt-depth alike
            lm_cfg = LMConfig(
                active_dims=cfg.active_pose_dims,
                using_weight=False,
                train_damping=bool(cfg.train_damping),
                damping=cfg.damping,
                use_hessian=bool(cfg.use_hessian),
                dropout=cfg.dropout,
                normalize=True,
            )
            out, dxs, dys, m2, duv = self._project_derivs(
                sat_feat, pose, slot, row_start, gt_depth=gt_depth)
            new_pose = lm_update_implicit_pixel_norm(
                pose, out, dxs, dys, grd_feat[:, row_start:], m2, duv,
                self.damping, lm_cfg, key)
            return new_pose, adam_state, None
        if use_banded:
            sat_fp, jac, m2 = self._project_banded(
                sat_feat, pose, slot, row_start,
                with_jac=cfg.Optimizer != "NN")
            m = jnp.broadcast_to(m2, sat_fp.shape[:3])
            sat_cp, uv = None, None
        else:
            sat_fp, sat_cp, jac, uv, m = self._project(
                sat_feat, sat_conf if need_conf else None, pose, slot,
                with_jac=cfg.Optimizer != "NN", gt_depth=gt_depth,
                row_start=row_start)
        if sat_cp is None:
            sat_cp = jnp.zeros_like(sat_fp[..., :1])

        g_feat = grd_feat[:, row_start:] * m[..., None]
        g_conf = grd_conf[:, row_start:] * m[..., None]
        crop = half - row_start  # remaining rows to drop before the update

        if cfg.proj == "geo":  # sky crop (reference models_kitti.py:1194-1199)
            sat_f_n, sat_c_n = sat_fp[:, crop:], sat_cp[:, crop:]
            grd_f_n, grd_c_n = g_feat[:, crop:], g_conf[:, crop:]
            jac_n = jac[:, crop:] if jac is not None else None
        else:
            sat_f_n, sat_c_n, grd_f_n, grd_c_n, jac_n = sat_fp, sat_cp, g_feat, g_conf, jac

        lm_cfg = LMConfig(
            active_dims=cfg.active_pose_dims,
            using_weight=bool(cfg.using_weight),
            train_damping=bool(cfg.train_damping),
            damping=cfg.damping,
            use_hessian=bool(cfg.use_hessian),
            dropout=cfg.dropout,
            normalize=True,
        )

        if cfg.Optimizer == "LM":
            new_pose = lm_update(pose, sat_f_n, sat_c_n, grd_f_n, grd_c_n,
                                 jac_n, self.damping, lm_cfg, key)
        elif cfg.Optimizer == "SGD":
            new_pose = sgd_update(pose, sat_f_n, sat_c_n, grd_f_n, grd_c_n,
                                  jac_n, lm_cfg)
        elif cfg.Optimizer == "ADAM":
            m_acc, v_acc = adam_state
            new_pose, m_acc, v_acc = adam_update(
                pose, sat_f_n, grd_f_n, jac_n, m_acc, v_acc, t, lm_cfg,
                cfg.beta1, cfg.beta2)
            adam_state = (m_acc, v_acc)
        elif cfg.Optimizer == "NN":
            delta = self.nn_refine(sat_f_n, grd_f_n)  # [B, 3]
            new_pose = pose + delta
        else:
            raise ValueError(f"unknown Optimizer {cfg.Optimizer}")

        aux = None
        if collect:
            A = sat_feat.shape[1]
            aux = (sat_fp, uv / A)
        return new_pose, adam_state, aux

    def extract_features(self, sat_map, grd_img):
        sat_feats, sat_confs = self.SatFeatureNet(sat_map)
        grd_feats, grd_confs = self.GrdFeatureNet(grd_img)
        return sat_feats, sat_confs, grd_feats, grd_confs

    def polar_transform(self, sat_feat, slot: int):
        """Polar warp of satellite features (reference models_kitti.py:1494-1516).
        sat_feat [B, A, A, C] -> [B, A/2, 8A, C]."""
        B = sat_feat.shape[0]
        grids = jnp.broadcast_to(jnp.asarray(self._polar_grids[slot])[None],
                                 (B,) + self._polar_grids[slot].shape)
        polar, _ = grid_sample(sat_feat, grids)
        return polar

    def orien_corr(self, sat_map, grd_img, gt_pose=None, mode: str = "train"):
        """Orientation-only dense correlation head
        (reference models_kitti.py:1543-1624).

        Circularly correlates the ground panorama against a polar-warped
        satellite feature map over heading candidates within
        +-rotation_range; TPU-native grouped conv on the MXU.
        """
        cfg = self.cfg
        sat_feats, _, grd_feats, _ = self.extract_features(sat_map, grd_img)
        B = sat_map.shape[0]

        corr_list = []
        orien = None
        for lvl in range(len(self._slots)):
            slot = self._slots[lvl]
            grd_feat = grd_feats[lvl]  # [B, H, W, C]
            H, W, C = grd_feat.shape[1:]
            flat = grd_feat.reshape(B, -1)
            norm = jnp.sqrt(jnp.maximum(jnp.sum(flat * flat, -1), 1e-24))
            grd_feat = grd_feat / norm[:, None, None, None]

            polar = self.polar_transform(sat_feats[lvl], slot)  # [B,H,4W',C]
            degree_per_pixel = 90.0 / W
            n = int(np.ceil(cfg.rotation_range / degree_per_pixel))
            sat_W = polar.shape[2]
            if sat_W - W < n:
                polar1 = jnp.concatenate(
                    [polar[:, :, -n:], polar, polar[:, :, : (n - sat_W + W)]],
                    axis=2)
            else:
                polar1 = jnp.concatenate(
                    [polar[:, :, -n:], polar[:, :, : (W + n)]], axis=2)

            # grouped 1-row correlation: [1, H, L, B*C] vs kernel [H, W, C, B]
            L = polar1.shape[2]
            x = jnp.transpose(polar1, (1, 2, 0, 3)).reshape(1, H, L, B * C)
            k = jnp.transpose(grd_feat, (1, 2, 3, 0))  # [H, W, C, B]
            corr = jax.lax.conv_general_dilated(
                x, k, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=B)[0, 0]  # [L-W+1, B]
            corr = jnp.transpose(corr)  # [B, L-W+1]

            sq = jnp.sum(polar1 ** 2, axis=-1, keepdims=True)  # [B,H,L,1]
            denom = jax.lax.reduce_window(
                sq, 0.0, jax.lax.add, (1, H, W, 1), (1, 1, 1, 1),
                "VALID")[:, 0, :, 0]  # [B, L-W+1]
            denom = jnp.maximum(jnp.sqrt(denom), 1e-6)
            corr = 2 - 2 * corr / denom

            idx = jnp.argmin(corr, axis=-1)
            orien = (idx - n) * degree_per_pixel
            corr_list.append((corr, degree_per_pixel))

        if mode != "train":
            return orien

        # heading triplet loss (reference models_kitti.py:1607-1624)
        gt_deg = gt_pose[:, 2] * cfg.rotation_range
        losses = []
        for corr, dpp in corr_list:
            Wc = corr.shape[1]
            gt_idx = ((Wc - 1) / 2 + jnp.round(gt_deg / dpp)).astype(jnp.int32)
            pos = corr[jnp.arange(B), gt_idx]
            pos_neg = pos[:, None] - corr
            losses.append(jnp.sum(jnp.log1p(jnp.exp(pos_neg * 10.0)))
                          / (B * (Wc - 1)))
        return jnp.sum(jnp.stack(losses))

    def project_at_pose(self, sat_map, grd_img, pred_pose, gt_pose):
        """Per-level feature maps for ``--visualize`` PCA dumps.

        Mirrors the reference's in-forward visualization inputs
        (models_kitti.py:1285-1293: sat/grd features + predicted- and
        gt-pose projections).  Returns per level
        (sat_feat, grd_feat, proj_at_pred, proj_at_gt).
        """
        sat_feats, _, grd_feats, _ = self.extract_features(sat_map, grd_img)
        outs = []
        for lvl in range(len(self._slots)):
            slot = self._slots[lvl]
            fp_pred, _, _, _, _ = self._project(
                sat_feats[lvl], None, pred_pose, slot, with_jac=False)
            fp_gt, _, _, _, _ = self._project(
                sat_feats[lvl], None, gt_pose, slot, with_jac=False)
            outs.append((sat_feats[lvl], grd_feats[lvl], fp_pred, fp_gt))
        return outs

    def multi_hypothesis_test(self, sat_map, grd_img, n_hyp: int,
                              gt_depth=None, init_pose=None,
                              with_info: bool = False):
        """Multi-start LM inference (NEW capability; SURVEY.md §2.2 P6).

        Runs the solver from ``n_hyp`` initial poses per sample (hypothesis 0
        at the reference's zero init — or at ``init_pose`` [B, 3] when warm-
        starting, see __call__ — the rest uniform in [-1, 1]) and picks
        the hypothesis whose final normalized feature residual at the finest
        level is smallest.  Hypotheses ride the batch axis, so the whole
        sweep is one jitted program.

        Returns (shift_lat, shift_lon, theta) each [B]; ``with_info`` appends
        the [B, 3, 3] pose covariance of the winning hypothesis.
        """
        cfg = self.cfg
        B = sat_map.shape[0]
        P = n_hyp
        sat_feats0, sat_confs, grd_feats, grd_confs = self.extract_features(
            sat_map, grd_img)

        tile = lambda x: jnp.repeat(x, P, axis=0)  # [B,...] -> [B*P,...]
        sat_feats = [tile(f) for f in sat_feats0]
        sat_confs = [tile(c) for c in sat_confs]
        grd_feats_t = [tile(f) for f in grd_feats]
        grd_confs_t = [tile(c) for c in grd_confs]
        gt_depth_t = None if gt_depth is None else tile(gt_depth)

        base_key = self.make_rng("lm")
        init = jax.random.uniform(jax.random.fold_in(base_key, 0x5EED),
                                  (B, P, 3), minval=-1.0, maxval=1.0)
        # hypothesis 0 = reference init (zero) or the warm start
        init = init.at[:, 0, :].set(
            0.0 if init_pose is None else init_pose.astype(jnp.float32))
        if cfg.rotation_range == 0:
            init = init.at[..., 2].set(0.0)
        pose0 = init.reshape(B * P, 3)

        traj, _, _ = self._run_rounds(
            pose0, sat_feats, sat_confs, grd_feats_t, grd_confs_t, base_key,
            collect_aux=False, gt_depth=gt_depth_t, mode="test")
        final = traj[:, -1]  # [B*P, 3]

        # score: normalized residual at the finest level under the final pose
        lvl = len(self._slots) - 1
        slot = self._slots[lvl]
        gH = grd_feats_t[lvl].shape[1]
        half = gH // 2 if cfg.proj == "geo" else 0
        sat_fp, _, _, _, m = self._project(
            sat_feats[lvl], None, final, slot, with_jac=False,
            gt_depth=gt_depth_t, row_start=half)
        g = grd_feats_t[lvl][:, half:] * m[..., None]
        s_f = sat_fp.reshape(B * P, -1)
        g_f = g.reshape(B * P, -1)
        s_n = jnp.sqrt(jnp.maximum(jnp.sum(s_f * s_f, -1), 1e-12))
        g_n = jnp.sqrt(jnp.maximum(jnp.sum(g_f * g_f, -1), 1e-12))
        cost = jnp.sum((s_f / s_n[:, None] - g_f / g_n[:, None]) ** 2, axis=-1)
        best = jnp.argmin(cost.reshape(B, P), axis=1)  # [B]

        final = final.reshape(B, P, 3)[jnp.arange(B), best]
        if with_info:
            cov = self._pose_info(sat_feats0, grd_feats, final,
                                  gt_depth=gt_depth)
            return final[:, 1], final[:, 0], final[:, 2], cov
        return final[:, 1], final[:, 0], final[:, 2]

    def _pose_info(self, sat_feats, grd_feats, pose, gt_depth=None):
        """[B, 3, 3] pose covariance at ``pose`` from the solver's own
        Gauss-Newton information (NEW capability, no reference counterpart):
        one extra finest-level projection via the gather-path implicit
        pieces; see solver.updates.lm_information / pose_covariance."""
        cfg = self.cfg
        if cfg.using_weight:
            # the solver optimized a conf-WEIGHTED residual; reporting the
            # unweighted information would misstate the estimator's
            # covariance — refuse instead of silently lying
            raise ValueError("with_info does not support using_weight=1")
        lvl = len(self._slots) - 1
        slot = self._slots[lvl]
        gH = grd_feats[lvl].shape[1]
        half = gH // 2 if cfg.proj == "geo" else 0
        out, dxs, dys, m2, duv = self._project_derivs(
            sat_feats[lvl], pose, slot, half, gt_depth=gt_depth)
        hess, rss, n_res = lm_information(
            out, dxs, dys, grd_feats[lvl][:, half:], m2, duv,
            cfg.active_pose_dims, normalize=True)
        return pose_covariance(hess, rss, n_res, cfg.active_pose_dims)

    def _run_rounds(self, pose0, sat_feats, sat_confs, grd_feats, grd_confs,
                    base_key, collect_aux: bool, gt_depth, mode: str):
        """Shared (iteration x level) solver loop; returns (traj list,
        aux_feats dict, aux_uvs dict)."""
        cfg = self.cfg
        B = pose0.shape[0]
        n_levels = len(self._slots)
        adam0 = (jnp.zeros((B, len(cfg.active_pose_dims))),
                 jnp.zeros((B, len(cfg.active_pose_dims))))
        # Pallas banded sampler (TPU): differentiable via custom VJP
        # (scatter-free banded-transpose backward), so train uses it too.
        # use_banded_warp=2 forces the path off-TPU (interpret mode, tests).
        banded = (bool(cfg.use_banded_warp)
                  and (jax.default_backend() == "tpu"
                       or cfg.use_banded_warp >= 2))
        # eval never differentiates the solver: use the fused-moment kernel
        # (no [B,V,W,C] HBM intermediates; see _solver_round)
        fused_eval = mode != "train" and bool(cfg.use_fused_moments)

        def round_fn(pose, adam_state, it, lvl_pos):
            slot = self._slots[lvl_pos]
            t = it * n_levels + lvl_pos if not cfg.level_first \
                else lvl_pos * cfg.N_iters + it
            key = jax.random.fold_in(base_key, t)
            return self._solver_round(
                pose, lvl_pos, slot, sat_feats[lvl_pos], sat_confs[lvl_pos],
                grd_feats[lvl_pos], grd_confs[lvl_pos], key, adam_state, t,
                gt_depth=gt_depth, collect=collect_aux, banded=banded,
                fused_eval=fused_eval)

        remat = cfg.remat and mode == "train" and cfg.Optimizer != "NN"

        if cfg.Optimizer == "NN":
            # flax submodule calls can't live inside lax.scan during init —
            # keep the NN optimizer on the unrolled path
            trajectories = []
            aux_feats = {lvl: [] for lvl in range(n_levels)}
            aux_uvs = {lvl: [] for lvl in range(n_levels)}
            pose, adam_state = pose0, adam0
            if cfg.level_first:
                order = [(it, lvl) for lvl in range(n_levels)
                         for it in range(cfg.N_iters)]
            else:
                order = [(it, lvl) for it in range(cfg.N_iters)
                         for lvl in range(n_levels)]
            for (it, lvl) in order:
                pose, adam_state, aux = round_fn(pose, adam_state, it, lvl)
                trajectories.append(pose)
                if collect_aux:
                    aux_feats[lvl].append(aux[0])
                    aux_uvs[lvl].append(aux[1])
            traj = jnp.stack(trajectories, axis=1)  # [B, rounds, 3]
            aux_f = [jnp.stack(aux_feats[l], 1) for l in range(n_levels)] \
                if collect_aux else None
            aux_u = [jnp.stack(aux_uvs[l], 1) for l in range(n_levels)] \
                if collect_aux else None
            return traj, aux_f, aux_u

        # lax.scan over iterations, levels unrolled inside the body — the
        # per-level kernels appear once in the program instead of once per
        # round (SURVEY.md §7.1; also keeps TPU compile payloads small)
        def scan_body_iter_first(carry, it):
            pose, adam_state = carry
            poses, auxs = [], []
            for lvl in range(n_levels):
                pose, adam_state, aux = round_fn(pose, adam_state, it, lvl)
                poses.append(pose)
                if collect_aux:
                    auxs.append(aux)
            return (pose, adam_state), (jnp.stack(poses, 1), tuple(auxs))

        if cfg.level_first:
            # python loop over levels, scan over iterations per level
            traj_parts, aux_f, aux_u = [], [], []
            carry = (pose0, adam0)
            for lvl in range(n_levels):
                def body(c, it, lvl=lvl):
                    pose, adam_state, aux = round_fn(c[0], c[1], it, lvl)
                    return (pose, adam_state), (pose, aux if collect_aux
                                                else ())
                b = jax.checkpoint(body) if remat else body
                carry, (poses, auxs) = jax.lax.scan(
                    b, carry, jnp.arange(cfg.N_iters))
                traj_parts.append(jnp.transpose(poses, (1, 0, 2)))  # [B,I,3]
                if collect_aux:
                    aux_f.append(jnp.transpose(auxs[0], (1, 0, 2, 3, 4)))
                    aux_u.append(jnp.transpose(auxs[1], (1, 0, 2, 3, 4)))
            # rounds order: level-major (lvl0 iters..., lvl1 iters...)
            traj = jnp.concatenate(traj_parts, axis=1)  # [B, L*I, 3]
            return traj, (aux_f if collect_aux else None), \
                (aux_u if collect_aux else None)

        body = jax.checkpoint(scan_body_iter_first) if remat \
            else scan_body_iter_first
        (pose, adam_state), (poses, auxs) = jax.lax.scan(
            body, (pose0, adam0), jnp.arange(cfg.N_iters))
        # poses: [I, B, L, 3] -> rounds-major [B, I*L, 3]
        traj = jnp.transpose(poses, (1, 0, 2, 3)).reshape(B, -1, 3)
        aux_f = aux_u = None
        if collect_aux:
            # auxs: per level (feat [I, B, H, W, C], uv [I, B, H, W, 2])
            aux_f = [jnp.transpose(a[0], (1, 0, 2, 3, 4)) for a in auxs]
            aux_u = [jnp.transpose(a[1], (1, 0, 2, 3, 4)) for a in auxs]
        return traj, aux_f, aux_u

    def __call__(self, sat_map, grd_img, gt_pose=None, mode: str = "train",
                 gt_depth=None, init_pose=None, with_info: bool = False):
        """Run feature extraction + unrolled solver.

        Args:
          sat_map: [B, A, A, 3]; grd_img: [B, H, W, 3] (channel-last).
          gt_pose: [B, 3] normalized (shift_u, shift_v, heading); train only.
          mode: 'train' -> LossDiagnostics, 'test' -> final [B, 3] pose.
          init_pose: optional [B, 3] normalized warm start (tracking mode,
            NEW capability — the reference always solves from zero); also
            seeds hypothesis 0 of the multi-start sweep.
          with_info: test mode only — append the [B, 3, 3] pose covariance
            (normalized units) from the solver's Gauss-Newton information.
        """
        cfg = self.cfg
        B = sat_map.shape[0]
        # trajectory mode always reports the single-start [B, I, L] path
        # (visualization/parity consumers index it as such)
        if mode == "test" and cfg.pose_hypotheses > 1:
            return self.multi_hypothesis_test(sat_map, grd_img,
                                              cfg.pose_hypotheses,
                                              gt_depth=gt_depth,
                                              init_pose=init_pose,
                                              with_info=with_info)
        sat_feats, sat_confs, grd_feats, grd_confs = self.extract_features(
            sat_map, grd_img)

        collect_aux = mode == "train" and cfg.loss_method > 0
        base_key = self.make_rng("lm") if (cfg.dropout > 0 or
                                           len(cfg.active_pose_dims) == 3) \
            else jax.random.PRNGKey(0)

        pose0 = (jnp.zeros((B, 3), dtype=jnp.float32) if init_pose is None
                 else init_pose.astype(jnp.float32))
        n_levels = len(self._slots)

        traj, aux_feats, aux_uvs = self._run_rounds(
            pose0, sat_feats, sat_confs, grd_feats, grd_confs, base_key,
            collect_aux=collect_aux, gt_depth=gt_depth, mode=mode)

        if cfg.level_first:
            traj = traj.reshape(B, n_levels, cfg.N_iters, 3).transpose(0, 2, 1, 3)
        else:
            traj = traj.reshape(B, cfg.N_iters, n_levels, 3)
        shift_lats = traj[..., 1]
        shift_lons = traj[..., 0]
        thetas = traj[..., 2]

        if mode == "trajectory":
            # full [B, N_iters, L] trajectories for visualization
            # (reference plots inside forward, models_kitti.py:1285-1293)
            return shift_lats, shift_lons, thetas
        if mode != "train":
            if with_info:
                final = traj[:, -1, -1, :]  # [B, 3] pose order
                cov = self._pose_info(sat_feats, grd_feats, final,
                                      gt_depth=gt_depth)
                return (shift_lats[:, -1, -1], shift_lons[:, -1, -1],
                        thetas[:, -1, -1], cov)
            return shift_lats[:, -1, -1], shift_lons[:, -1, -1], thetas[:, -1, -1]

        ref_feat_list = pred_feat_list = gt_feat_list = None
        pred_uv_list = gt_uv_list = None
        if collect_aux:
            ref_feat_list = grd_feats
            pred_feat_list = aux_feats
            pred_uv_list = aux_uvs
            gt_feat_list, gt_uv_list = [], []
            for lvl in range(n_levels):
                slot = self._slots[lvl]
                gfp, _, _, guv, _ = self._project(
                    sat_feats[lvl], None, gt_pose, slot, with_jac=False,
                    gt_depth=gt_depth)
                A = sat_feats[lvl].shape[1]
                gt_feat_list.append(gfp)
                gt_uv_list.append(guv / A)

        coe_heading = 0.0 if cfg.rotation_range == 0 else cfg.coe_heading
        return loss_func(
            cfg.loss_method, shift_lats, shift_lons, thetas,
            gt_pose[:, 1], gt_pose[:, 0], gt_pose[:, 2],
            cfg.coe_shift_lat, cfg.coe_shift_lon, coe_heading,
            ref_feat_list, pred_feat_list, gt_feat_list,
            pred_uv_list, gt_uv_list,
            cfg.coe_L1, cfg.coe_L2, cfg.coe_L3, cfg.coe_L4)
