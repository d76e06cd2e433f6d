"""LM_S2GP_Ford: Ford-AV satellite->ground model with calibration extrinsics.

TPU-native re-design of the reference Ford model
(reference: /root/reference/models_ford.py:21-1036).

Structure mirrors LMS2GP with Ford deltas preserved:
  * camera->body extrinsics (R_FL, T_FL from the calibration YAML) feed the
    cam2body2world2sat chain (models_ford.py:173-264);
  * projected confidence is transformed 1/(1+c) (models_ford.py:716);
  * optional learned per-pixel height lift (``estimate_depth``,
    models_ford.py:192-200) via VGGUnet depth heads;
  * optimizer variants LM / GN / SGD(L1) / NN (models_ford.py:380-634);
    Ford's LM re-init is NOT gated on the DoF freeze (models_ford.py:453-458);
  * Ford's trajectory naming: shift_u is LATERAL, shift_v LONGITUDINAL
    (models_ford.py:823-824).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.geometry import ford as fgeom
from highlyaccurate_tpu.losses.losses import loss_func
from highlyaccurate_tpu.models.nnrefine import NNrefine
from highlyaccurate_tpu.models.vggunet import VGGUnet
from highlyaccurate_tpu.ops.grid_sample import grid_sample, grid_sample_derivs
from highlyaccurate_tpu.solver.updates import (LMConfig, gn_update,
                                               lm_information, lm_update,
                                               lm_update_from_moments,
                                               lm_update_implicit,
                                               lm_update_implicit_pixel_norm,
                                               pose_covariance, sgd_update_l1)


class LMS2GPFord(nn.Module):
    cfg: Config
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.SatFeatureNet = VGGUnet(level=cfg.level, dtype=dt,
                                     pad_cin=cfg.pad_input_channels)
        self.GrdFeatureNet = VGGUnet(level=cfg.level, dtype=dt,
                                     pad_cin=cfg.pad_input_channels,
                                     estimate_depth=bool(cfg.estimate_depth))
        self.damping = self.param("damping", nn.initializers.zeros, (1, 3))
        if cfg.Optimizer == "NN":
            self.nn_refine = NNrefine(dtype=dt)

        # built locally then assigned once — flax freezes setup attributes
        self._rays = tuple(
            fgeom.grd_img2cam_ford(cfg.grd_h // (2 ** (3 - lvl)),
                                   cfg.grd_w // (2 ** (3 - lvl)),
                                   cfg.grd_h, cfg.grd_w)
            for lvl in range(4))
        self._slots = {
            -1: [0], -2: [1], -3: [2],
            2: [1, 2], 3: [0, 1, 2], 4: [0, 1, 2, 3],
        }[cfg.level]

    def _project_banded(self, sat_feat, pose, slot: int, R_FL, T_FL,
                        satmap_sidelength_meters, row_start: int,
                        with_jac: bool, implicit: bool = False,
                        moments_grd=None):
        """Pallas banded line sampler for the Ford chain (the cam->body->
        world->sat map is affine per ground row, like KITTI S2GP; see
        ops/pallas/banded_warp.py).  Returns (out, jac, mask2d).

        Fast-path variants mirror ``LMS2GP._project_banded``:
        ``implicit`` returns (out, dx, dy, mask2d, P0, dP) for
        ``lm_update_implicit`` (no [B,V,W,C,3] Jacobian in HBM);
        ``moments_grd`` routes through the fused-moment kernel and returns
        (M [B,V,3,16], P0s, dPs) for ``lm_update_from_moments`` (P0s/dPs
        component-swapped to kernel axis order).  All kernel dispatch is
        shared with the KITTI model (lm_s2gp.banded_project) — only the
        uv/jac geometry differs."""
        from highlyaccurate_tpu.models.lm_s2gp import banded_project
        cfg = self.cfg
        A = sat_feat.shape[1]
        Xc = jnp.asarray(self._rays[slot][0][row_start:])      # [V, W, 3]
        mask_vw = jnp.asarray(self._rays[slot][1][row_start:])  # [V, W]

        Xc01 = Xc[:, :2]
        if moments_grd is not None:
            with_jac = True
        uv01, duv01 = fgeom.ford_uv_jac(
            pose, R_FL, T_FL, Xc01, satmap_sidelength_meters, A,
            cfg.rotation_range, cfg.shift_range_lat, cfg.shift_range_lon,
            require_jac=with_jac)

        return banded_project(cfg, sat_feat, uv01, duv01, mask_vw,
                              with_jac=with_jac, implicit=implicit,
                              moments_grd=moments_grd)

    def _project(self, sat_feat, sat_conf, pose, slot: int, R_FL, T_FL,
                 satmap_sidelength_meters, with_jac: bool, depth=None,
                 row_start: int = 0):
        """Reference models_ford.py:266-378 (project_map_to_grd).

        ``row_start`` restricts sampling to ground rows >= row_start (the
        sky-cropped LM update never reads the top half — see lm_s2gp)."""
        cfg = self.cfg
        A = sat_feat.shape[1]
        if cfg.estimate_depth and depth is not None:
            xyz_w = jnp.asarray(self._rays[slot][2][row_start:])
            Xc, mask2d = fgeom.depth_lift(xyz_w, depth[:, row_start:])
        else:
            Xc = jnp.asarray(self._rays[slot][0][row_start:])
            mask2d = jnp.asarray(self._rays[slot][1][row_start:])[None]

        uv, duv = fgeom.ford_uv_jac(
            pose, R_FL, T_FL, Xc, satmap_sidelength_meters, A,
            cfg.rotation_range, cfg.shift_range_lat, cfg.shift_range_lon,
            require_jac=with_jac)
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

    def _run_rounds(self, pose0, sat_feats, sat_confs, grd_feats,
                    grd_confs, grd_depths, R_FL, T_FL,
                    satmap_sidelength_meters, collect_aux: bool, mode: str):
        """Shared (iteration x level) solver loop over precomputed feature
        pyramids; returns (t_arr [B, rounds, 3], aux_feats, aux_uvs).
        Factored out of __call__ so multi_hypothesis_test can ride the
        batch axis without re-extracting features (see lm_s2gp)."""
        cfg = self.cfg
        lm_cfg = LMConfig(
            active_dims=(0, 1, 2),
            using_weight=bool(cfg.using_weight),
            train_damping=bool(cfg.train_damping),
            damping=cfg.damping,
            use_hessian=bool(cfg.use_hessian),
            dropout=cfg.dropout,
            normalize=True,
            reinit=True,
        )
        base_key = self.make_rng("lm") if cfg.Optimizer in ("LM", "GN") \
            else jax.random.PRNGKey(0)
        n_levels = len(self._slots)

        # use_banded_warp=2 forces the path off-TPU (interpret mode, tests)
        use_banded = (bool(cfg.use_banded_warp) and cfg.proj == "geo"
                      and not cfg.estimate_depth
                      and (jax.default_backend() == "tpu"
                           or cfg.use_banded_warp >= 2))

        def level_round(p, it, lvl):
            t = (it * n_levels + lvl) if not cfg.level_first \
                else (lvl * cfg.N_iters + it)

            def round_fn(p):
                slot = self._slots[lvl]
                grd_H_full = grd_feats[lvl].shape[1]
                # sample only the sky-cropped rows unless collecting full
                # aux maps (see lm_s2gp; halves the hot-loop gather work)
                half = grd_H_full // 2 if cfg.proj == "geo" else 0
                row_start = 0 if collect_aux else half
                key = jax.random.fold_in(base_key, t)
                if (use_banded and cfg.Optimizer == "LM"
                        and cfg.use_implicit_lm and not cfg.using_weight
                        and not collect_aux):
                    # banded implicit-J fast paths (see lm_s2gp): H/g
                    # contract from the kernel outputs + the per-row affine
                    # duv — no [B,V,W,C,3] Jacobian in HBM.  At eval the
                    # fused-moment kernel contracts the 9 LM moments
                    # in-register, so even out/dx/dy never land in HBM.
                    if (mode != "train" and bool(cfg.use_fused_moments)
                            and cfg.dropout == 0):
                        M, P0s, dPs = self._project_banded(
                            sat_feats[lvl], p, slot, R_FL, T_FL,
                            satmap_sidelength_meters, row_start,
                            with_jac=True,
                            moments_grd=grd_feats[lvl][:, row_start:])
                        new_p = lm_update_from_moments(
                            p, M, P0s, dPs, self.damping, lm_cfg, key)
                        return new_p, ()
                    out, dxk, dyk, m2, P0, dP = self._project_banded(
                        sat_feats[lvl], p, slot, R_FL, T_FL,
                        satmap_sidelength_meters, row_start,
                        with_jac=True, implicit=True)
                    new_p = lm_update_implicit(
                        p, out, dxk, dyk, grd_feats[lvl][:, row_start:],
                        m2, P0, dP, self.damping, lm_cfg, key)
                    return new_p, ()
                if (not use_banded and cfg.Optimizer == "LM"
                        and cfg.use_implicit_lm and not cfg.using_weight
                        and not collect_aux and not cfg.estimate_depth):
                    # gather-path implicit-J fast path (see lm_s2gp): H/g
                    # contract from (out, dx, dy) + per-pixel duv — no
                    # [B,H,W,C,3] Jacobian in HBM
                    Xc = jnp.asarray(self._rays[slot][0][row_start:])
                    m2 = jnp.asarray(self._rays[slot][1][row_start:])[None]
                    uv, duv = fgeom.ford_uv_jac(
                        p, R_FL, T_FL, Xc, satmap_sidelength_meters,
                        sat_feats[lvl].shape[1], cfg.rotation_range,
                        cfg.shift_range_lat, cfg.shift_range_lon,
                        require_jac=True)
                    out, dxs, dys = grid_sample_derivs(sat_feats[lvl], uv)
                    new_p = lm_update_implicit_pixel_norm(
                        p, out, dxs, dys, grd_feats[lvl][:, row_start:], m2,
                        duv, self.damping, lm_cfg, key)
                    return new_p, ()
                if use_banded and not collect_aux:
                    sat_fp, jac, m2 = self._project_banded(
                        sat_feats[lvl], p, slot, R_FL, T_FL,
                        satmap_sidelength_meters, row_start,
                        with_jac=cfg.Optimizer != "NN")
                    m = jnp.broadcast_to(m2, sat_fp.shape[:3])
                    # sat conf is unused by every Ford update rule (weight
                    # comes from grd_conf, models_ford.py:432-436)
                    sat_cp, uv = jnp.zeros_like(sat_fp[..., :1]), None
                else:
                    sat_fp, sat_cp, jac, uv, m = self._project(
                        sat_feats[lvl], sat_confs[lvl], p, slot, R_FL, T_FL,
                        satmap_sidelength_meters,
                        with_jac=cfg.Optimizer != "NN", depth=grd_depths[lvl],
                        row_start=row_start)
                    sat_cp = 1.0 / (1.0 + sat_cp)  # models_ford.py:716
                g_feat = grd_feats[lvl][:, row_start:] * m[..., None]
                g_conf = grd_confs[lvl][:, row_start:] * m[..., None]
                crop = half - row_start
                if cfg.proj == "geo":
                    s_f, s_c = sat_fp[:, crop:], sat_cp[:, crop:]
                    g_f, g_c = g_feat[:, crop:], g_conf[:, crop:]
                    j = jac[:, crop:] if jac is not None else None
                else:
                    s_f, s_c, g_f, g_c, j = sat_fp, sat_cp, g_feat, g_conf, jac

                if cfg.Optimizer == "LM":
                    new_p = lm_update(p, s_f, s_c, g_f, g_c, j, self.damping,
                                      lm_cfg, key)
                elif cfg.Optimizer == "GN":
                    new_p = gn_update(p, s_f, g_f, g_c, j, lm_cfg, key)
                elif cfg.Optimizer == "SGD":
                    new_p = sgd_update_l1(p, s_f, g_f, j, lm_cfg)
                elif cfg.Optimizer == "NN":
                    new_p = p + self.nn_refine(s_f, g_f)
                else:
                    raise ValueError(cfg.Optimizer)
                A = sat_feats[lvl].shape[1]
                if collect_aux:
                    return new_p, (sat_fp, uv / A)
                return new_p, ()

            fn = round_fn
            if cfg.remat and mode == "train" and cfg.Optimizer != "NN":
                fn = jax.checkpoint(round_fn)
            return fn(p)

        if cfg.Optimizer == "NN":
            # flax submodule call inside lax.scan breaks init — unrolled path
            traj, aux_f, aux_u = [], {l: [] for l in range(n_levels)}, \
                {l: [] for l in range(n_levels)}
            pose = pose0
            order = ([(it, lvl) for lvl in range(n_levels)
                      for it in range(cfg.N_iters)] if cfg.level_first else
                     [(it, lvl) for it in range(cfg.N_iters)
                      for lvl in range(n_levels)])
            for it, lvl in order:
                pose, aux = level_round(pose, it, lvl)
                traj.append(pose)
                if collect_aux:
                    aux_f[lvl].append(aux[0])
                    aux_u[lvl].append(aux[1])
            t_arr = jnp.stack(traj, axis=1)
            aux_feats = [jnp.stack(aux_f[l], 1) for l in range(n_levels)] \
                if collect_aux else None
            aux_uvs = [jnp.stack(aux_u[l], 1) for l in range(n_levels)] \
                if collect_aux else None
        elif cfg.level_first:
            parts, aux_feats, aux_uvs = [], [], []
            pose = pose0
            for lvl in range(n_levels):
                def body(p, it, lvl=lvl):
                    new_p, aux = level_round(p, it, lvl)
                    return new_p, (new_p, aux)
                pose, (poses, auxs) = jax.lax.scan(
                    body, pose, jnp.arange(cfg.N_iters))
                parts.append(jnp.transpose(poses, (1, 0, 2)))
                if collect_aux:
                    aux_feats.append(jnp.transpose(auxs[0], (1, 0, 2, 3, 4)))
                    aux_uvs.append(jnp.transpose(auxs[1], (1, 0, 2, 3, 4)))
            t_arr = jnp.concatenate(parts, axis=1)
            if not collect_aux:
                aux_feats = aux_uvs = None
        else:
            def body(p, it):
                poses, auxs = [], []
                for lvl in range(n_levels):
                    p, aux = level_round(p, it, lvl)
                    poses.append(p)
                    if collect_aux:
                        auxs.append(aux)
                return p, (jnp.stack(poses, 1), tuple(auxs))
            pose, (poses, auxs) = jax.lax.scan(
                body, pose0, jnp.arange(cfg.N_iters))
            t_arr = jnp.transpose(poses, (1, 0, 2, 3)).reshape(pose0.shape[0], -1, 3)
            aux_feats = aux_uvs = None
            if collect_aux:
                aux_feats = [jnp.transpose(a[0], (1, 0, 2, 3, 4))
                             for a in auxs]
                aux_uvs = [jnp.transpose(a[1], (1, 0, 2, 3, 4)) for a in auxs]
        return t_arr, aux_feats, aux_uvs

    def multi_hypothesis_test(self, sat_map, grd_img,
                              satmap_sidelength_meters, R_FL, T_FL,
                              n_hyp: int, init_pose=None,
                              with_info: bool = False):
        """Multi-start LM inference for the Ford chain (SURVEY.md §2.2 P6;
        mirror of LMS2GP.multi_hypothesis_test): run the solver from
        ``n_hyp`` initial poses per sample (hypothesis 0 at the reference's
        zero init — or at ``init_pose`` when warm-starting — the rest
        uniform in [-1, 1]), pick the hypothesis with the smallest
        normalized finest-level feature residual.  Hypotheses ride the
        batch axis — one jitted program.

        Returns (shift_lat, shift_lon, theta) each [B]; ``with_info``
        appends the winner's [B, 3, 3] pose covariance."""
        cfg = self.cfg
        B = sat_map.shape[0]
        P = n_hyp
        sat_feats0, sat_confs = self.SatFeatureNet(sat_map)
        if cfg.estimate_depth:
            grd_feats0, grd_confs, grd_depths0 = self.GrdFeatureNet(grd_img)
        else:
            grd_feats0, grd_confs = self.GrdFeatureNet(grd_img)
            grd_depths0 = [None] * len(grd_feats0)

        tile = lambda x: jnp.repeat(x, P, axis=0)  # [B,...] -> [B*P,...]
        sat_feats = [tile(f) for f in sat_feats0]
        sat_confs = [tile(c) for c in sat_confs]
        grd_feats = [tile(f) for f in grd_feats0]
        grd_confs = [tile(c) for c in grd_confs]
        grd_depths = [None if d is None else tile(d) for d in grd_depths0]
        R_t, T_t = tile(R_FL), tile(T_FL)

        init_key = self.make_rng("lm")
        init = jax.random.uniform(jax.random.fold_in(init_key, 0x5EED),
                                  (B, P, 3), minval=-1.0, maxval=1.0)
        # hypothesis 0 = reference init (zero) or the warm start
        init = init.at[:, 0, :].set(
            0.0 if init_pose is None else init_pose.astype(jnp.float32))
        if cfg.rotation_range == 0:
            init = init.at[..., 2].set(0.0)
        pose0 = init.reshape(B * P, 3)

        t_arr, _, _ = self._run_rounds(
            pose0, sat_feats, sat_confs, grd_feats, grd_confs, grd_depths,
            R_t, T_t, satmap_sidelength_meters, collect_aux=False,
            mode="test")
        final = t_arr[:, -1]  # [B*P, 3]

        # score: normalized residual at the finest level under the final pose
        lvl = len(self._slots) - 1
        slot = self._slots[lvl]
        gH = grd_feats[lvl].shape[1]
        half = gH // 2 if cfg.proj == "geo" else 0
        sat_fp, _, _, _, m = self._project(
            sat_feats[lvl], None, final, slot, R_t, T_t,
            satmap_sidelength_meters, with_jac=False,
            depth=grd_depths[lvl], row_start=half)
        g = grd_feats[lvl][:, half:] * m[..., None]
        s_f = sat_fp.reshape(B * P, -1)
        g_f = g.reshape(B * P, -1)
        s_n = jnp.sqrt(jnp.maximum(jnp.sum(s_f * s_f, -1), 1e-12))
        g_n = jnp.sqrt(jnp.maximum(jnp.sum(g_f * g_f, -1), 1e-12))
        cost = jnp.sum((s_f / s_n[:, None] - g_f / g_n[:, None]) ** 2,
                       axis=-1)
        best = jnp.argmin(cost.reshape(B, P), axis=1)  # [B]

        final = final.reshape(B, P, 3)[jnp.arange(B), best]
        if with_info:
            cov = self._pose_info(sat_feats0, grd_feats0, grd_depths0,
                                  final, R_FL, T_FL,
                                  satmap_sidelength_meters)
            # Ford pose semantics: u lateral, v longitudinal (see __call__)
            return final[:, 0], final[:, 1], final[:, 2], cov
        return final[:, 0], final[:, 1], final[:, 2]

    def project_at_pose(self, sat_map, grd_img, satmap_sidelength_meters,
                        R_FL, T_FL, pred_pose, gt_pose):
        """Per-level feature maps for ``--visualize`` PCA dumps.

        Ford analogue of LMS2GP.project_at_pose: the reference's Ford debug
        visualization feeds sat/grd features plus projections at the
        predicted and gt poses (reference models_ford.py sat_feat_proj use +
        visualize_utils.py:173-239).  Returns per level
        (sat_feat, grd_feat, proj_at_pred, proj_at_gt)."""
        cfg = self.cfg
        sat_feats, _ = self.SatFeatureNet(sat_map)
        if cfg.estimate_depth:
            grd_feats, _, grd_depths = self.GrdFeatureNet(grd_img)
        else:
            grd_feats, _ = self.GrdFeatureNet(grd_img)
            grd_depths = [None] * len(grd_feats)
        outs = []
        for lvl in range(len(self._slots)):
            slot = self._slots[lvl]
            fp_pred, _, _, _, _ = self._project(
                sat_feats[lvl], None, pred_pose, slot, R_FL, T_FL,
                satmap_sidelength_meters, with_jac=False,
                depth=grd_depths[lvl])
            fp_gt, _, _, _, _ = self._project(
                sat_feats[lvl], None, gt_pose, slot, R_FL, T_FL,
                satmap_sidelength_meters, with_jac=False,
                depth=grd_depths[lvl])
            outs.append((sat_feats[lvl], grd_feats[lvl], fp_pred, fp_gt))
        return outs

    def _pose_info(self, sat_feats, grd_feats, grd_depths, pose, R_FL, T_FL,
                   satmap_sidelength_meters):
        """[B, 3, 3] pose covariance at ``pose`` from the Ford LM
        objective's Gauss-Newton information (NEW capability): one extra
        finest-level projection via the gather-path implicit pieces (see
        solver.updates.lm_information).  ``estimate_depth`` is unsupported
        (the per-pixel duv ignores the depth head's pose-independent lift,
        matching the fast paths which also exclude it)."""
        cfg = self.cfg
        if cfg.estimate_depth:
            raise ValueError("with_info does not support estimate_depth")
        if cfg.using_weight:
            # weighted-residual covariance is not implemented (see lm_s2gp)
            raise ValueError("with_info does not support using_weight=1")
        lvl = len(self._slots) - 1
        slot = self._slots[lvl]
        gH = grd_feats[lvl].shape[1]
        half = gH // 2 if cfg.proj == "geo" else 0
        Xc = jnp.asarray(self._rays[slot][0][half:])
        m2 = jnp.asarray(self._rays[slot][1][half:])[None]
        uv, duv = fgeom.ford_uv_jac(
            pose, R_FL, T_FL, Xc, satmap_sidelength_meters,
            sat_feats[lvl].shape[1], cfg.rotation_range,
            cfg.shift_range_lat, cfg.shift_range_lon, require_jac=True)
        out, dxs, dys = grid_sample_derivs(sat_feats[lvl], uv)
        hess, rss, n_res = lm_information(
            out, dxs, dys, grd_feats[lvl][:, half:], m2, duv,
            cfg.active_pose_dims, normalize=True)
        return pose_covariance(hess, rss, n_res, cfg.active_pose_dims)

    def __call__(self, sat_map, grd_img, satmap_sidelength_meters, R_FL, T_FL,
                 gt_pose=None, mode: str = "train", init_pose=None,
                 with_info: bool = False):
        """sat_map [B,A,A,3]; grd_img [B,H,W,3]; R_FL [B,3,3]; T_FL [B,3].

        ``init_pose`` [B, 3] warm-starts the solver (tracking mode; also
        seeds hypothesis 0 of the multi-start sweep); ``with_info`` appends
        the [B, 3, 3] pose covariance in test mode."""
        cfg = self.cfg
        B = sat_map.shape[0]
        # trajectory mode always reports the single-start [B, I, L] path
        if mode == "test" and cfg.pose_hypotheses > 1:
            return self.multi_hypothesis_test(
                sat_map, grd_img, satmap_sidelength_meters, R_FL, T_FL,
                cfg.pose_hypotheses, init_pose=init_pose,
                with_info=with_info)
        sat_feats, sat_confs = self.SatFeatureNet(sat_map)
        if cfg.estimate_depth:
            grd_feats, grd_confs, grd_depths = self.GrdFeatureNet(grd_img)
        else:
            grd_feats, grd_confs = self.GrdFeatureNet(grd_img)
            grd_depths = [None] * len(grd_feats)

        collect_aux = mode == "train" and cfg.loss_method > 0
        n_levels = len(self._slots)
        pose0 = (jnp.zeros((B, 3), dtype=jnp.float32) if init_pose is None
                 else init_pose.astype(jnp.float32))
        t_arr, aux_feats, aux_uvs = self._run_rounds(
            pose0, sat_feats, sat_confs, grd_feats, grd_confs, grd_depths,
            R_FL, T_FL, satmap_sidelength_meters, collect_aux, mode)

        if cfg.level_first:
            t_arr = t_arr.reshape(B, n_levels, cfg.N_iters, 3).transpose(0, 2, 1, 3)
        else:
            t_arr = t_arr.reshape(B, cfg.N_iters, n_levels, 3)
        # Ford: u is lateral, v longitudinal (models_ford.py:823-824)
        shift_lats = t_arr[..., 0]
        shift_lons = t_arr[..., 1]
        thetas = t_arr[..., 2]

        if mode == "trajectory":
            # full [B, N_iters, L] trajectories (parity tests / visualization)
            return shift_lats, shift_lons, thetas
        if mode != "train":
            if with_info:
                cov = self._pose_info(sat_feats, grd_feats, grd_depths,
                                      t_arr[:, -1, -1, :], R_FL, T_FL,
                                      satmap_sidelength_meters)
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
                    sat_feats[lvl], None, gt_pose, slot, R_FL, T_FL,
                    satmap_sidelength_meters, with_jac=False,
                    depth=grd_depths[lvl])
                A = sat_feats[lvl].shape[1]
                gt_feat_list.append(gfp)
                gt_uv_list.append(guv / A)

        coe_heading = 0.0 if cfg.rotation_range == 0 else cfg.coe_heading
        return loss_func(
            cfg.loss_method, shift_lats, shift_lons, thetas,
            gt_pose[:, 0], gt_pose[:, 1], gt_pose[:, 2],
            cfg.coe_shift_lat, cfg.coe_shift_lon, coe_heading,
            ref_feat_list, pred_feat_list, gt_feat_list,
            pred_uv_list, gt_uv_list,
            cfg.coe_L1, cfg.coe_L2, cfg.coe_L3, cfg.coe_L4)
