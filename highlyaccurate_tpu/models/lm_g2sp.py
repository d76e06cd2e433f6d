"""LM_G2SP: ground->satellite projection + unrolled LM pose solver (KITTI).

TPU-native re-design of the reference's G2SP model
(reference: /root/reference/models_kitti.py:22-595).

Differences from LM_S2GP preserved from the reference:
  * projects *ground* features into the satellite frame via the perspective
    map P = K [R|T] over ground-plane points under each sat pixel
    (models_kitti.py:54-161), or the in-plane SE(2) warp for proj='nn'
    (:289-331) with the VGGUnet_G2S re-laid-out ground branch (:36-39);
  * LM update without feature normalization, identity damping matrix, raw
    trained damping initialized at cfg.damping, no frozen-DoF/re-init logic
    (:333-379);
  * residual direction r = grd_proj - sat (the S2GP residual is sat_proj -
    grd);
  * no sky crop (the projection targets the satellite grid).

Also hosts the dense-correlation localization head ``corr``
(models_kitti.py:501-576) with its soft-margin triplet training loss.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.geometry import kitti as geom
from highlyaccurate_tpu.losses.losses import loss_func, soft_margin_triplet
from highlyaccurate_tpu.models.vggunet import VGGUnet
from highlyaccurate_tpu.ops.grid_sample import grid_sample, grid_sample_derivs
from highlyaccurate_tpu.solver.updates import (LMConfig, lm_information,
                                               lm_update,
                                               lm_update_implicit_pixel,
                                               lm_update_pixel_moments,
                                               pose_covariance)
from highlyaccurate_tpu.utils import geo


class LMG2SP(nn.Module):
    """KITTI model, direction G2SP."""
    cfg: Config
    dtype: Any = jnp.float32

    def setup(self):
        cfg = self.cfg
        dt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        self.SatFeatureNet = VGGUnet(level=cfg.level, dtype=dt,
                                     pad_cin=cfg.pad_input_channels)
        self.GrdFeatureNet = VGGUnet(level=cfg.level, dtype=dt,
                                     pad_cin=cfg.pad_input_channels,
                                     g2s_rearrange=(cfg.proj == "nn"))
        # raw damping parameter init at cfg.damping (models_kitti.py:41)
        self.damping = self.param(
            "damping", lambda k, s: jnp.full(s, cfg.damping, jnp.float32),
            (1, 3))
        # per-level ground-plane points under sat pixels (models_kitti.py:54-84)
        # NOTE: built locally then assigned once — flax freezes setup attrs.
        self._xyz1 = {cfg.sat_size // (2 ** (3 - lvl)):
                      geom.warp_sat2real(cfg.sat_size // (2 ** (3 - lvl)))
                      for lvl in range(4)}
        self._slots = {
            -1: [0], -2: [1], -3: [2],
            2: [1, 2], 3: [0, 1, 2], 4: [0, 1, 2, 3],
        }[cfg.level]
        self.meters_per_pixel = [
            geo.get_meter_per_pixel() * (2 ** (3 - lvl)) for lvl in range(4)]
        # static residual-grid restriction: satellite columns west of the
        # camera's westmost in-range position never project into the ground
        # image — zero rows of J for any pose within 1.5x the ranges
        # (host-side union bound, geometry/kitti.py:g2sp_inview_col_start;
        # measured keep ~82% of columns under reference ranges).
        col_start = {}  # built locally then assigned once (flax freezes)
        for lvl in range(4):
            A = cfg.sat_size // (2 ** (3 - lvl))
            if cfg.g2sp_restrict_grid and cfg.proj == "geo":
                col_start[A] = geom.g2sp_inview_col_start(
                    A, cfg.grd_h // (2 ** (3 - lvl)),
                    cfg.grd_w // (2 ** (3 - lvl)),
                    cfg.rotation_range, cfg.shift_range_lat,
                    cfg.shift_range_lon)
            else:
                col_start[A] = 0
        self._col_start = col_start

    def _project_grd_to_map(self, grd_feat, grd_conf, pose, camera_k, A: int,
                            with_jac: bool = True):
        """Reference models_kitti.py:163-287 (project_grd_to_map)."""
        cfg = self.cfg
        gh, gw = grd_feat.shape[1:3]
        if cfg.proj == "nn":
            uv, duv, mask = geom.inplane_uv_jac(
                pose, A, cfg.rotation_range, cfg.shift_range_lat,
                cfg.shift_range_lon)
        else:
            XYZ1 = jnp.asarray(self._xyz1[A])
            uv, duv, mask = geom.g2sp_uv_jac(
                pose, XYZ1, camera_k, gh, gw, cfg.grd_h, cfg.grd_w,
                cfg.rotation_range, cfg.shift_range_lat, cfg.shift_range_lon)
        if not with_jac:
            duv = None
        feat_proj, jac = grid_sample(grd_feat, uv, duv)
        conf_proj = None
        if grd_conf is not None:
            conf_proj, _ = grid_sample(grd_conf, uv)
        return feat_proj, conf_proj, jac, mask

    def _project_grd_banded(self, grd_feat, pose, camera_k, A: int,
                            diff: bool = False):
        """Projective-line Pallas sampler (G2SP eval fast path; with
        ``diff`` the differentiable custom-VJP variant serving TRAINING).

        Along one sat COLUMN the ground-plane points form a 3D line whose
        perspective image is a straight, near-horizontal line — the
        homogeneous coords are affine in the sat row index, so the banded
        line kernel applies (ops/pallas/banded_warp.py:make_projline_sampler;
        the gather sampler is the round-1 bottleneck here).  Returns
        (g_proj, dx, dy, duv): sampled features + screen derivatives
        [B, A, A, C] in sat-grid order plus the per-pixel duv for
        ``lm_update_implicit_pixel``.
        """
        from highlyaccurate_tpu.models.lm_s2gp import _BANDED_CACHE
        from highlyaccurate_tpu.ops.pallas.banded_warp import (
            make_projline_sampler, pack_projline_coefs)
        cfg = self.cfg
        Hg, Wg, C = grd_feat.shape[1:]
        j0 = self._col_start[A]  # static column restriction (see setup)
        XYZ1 = jnp.asarray(self._xyz1[A][:, j0:])         # [A, A-j0, 4]
        P = geom.g2sp_P(pose, camera_k, Hg, Wg, cfg.grd_h, cfg.grd_w,
                        cfg.rotation_range, cfg.shift_range_lat,
                        cfg.shift_range_lon)

        # rows = sat columns j (constant depth at heading 0); u = sat row i
        X0 = XYZ1[0]                                      # [A-j0(j), 4]
        dX = XYZ1[1] - XYZ1[0]                            # [A-j0(j), 4]
        h0 = jnp.einsum("bik,jk->bji", P, X0)             # [B, A-j0(j), 3]
        dh = jnp.einsum("bik,jk->bji", P, dX)
        coefs = pack_projline_coefs(h0, dh, Hg, Wg, Hg, A)

        # -1 = auto: 0 for the projline kernel — u-windows measured neutral
        # on real G2SP geometry at every chunk size (PERF.md round 5)
        u_chunk = 0 if cfg.banded_u_chunk < 0 else cfg.banded_u_chunk
        key_ = ("projline", Hg, Wg, C, A, j0, diff, u_chunk)
        sampler = _BANDED_CACHE.get(key_)
        if sampler is None:
            sampler = make_projline_sampler(
                AY=Hg, AX=Wg, C=C, V=A - j0, W=A,
                interpret=jax.default_backend() != "tpu",
                differentiable=diff, u_chunk=u_chunk)
            _BANDED_CACHE[key_] = sampler
        out, dx, dy = sampler(grd_feat, coefs)            # [B, j', i, C]
        tr = lambda t: jnp.transpose(t, (0, 2, 1, 3))     # -> [B, i, j', C]

        # per-pixel duv (quotient rule) — same as the gather path's
        _, duv, _ = geom.g2sp_uv_jac(
            pose, XYZ1, camera_k, Hg, Wg, cfg.grd_h, cfg.grd_w,
            cfg.rotation_range, cfg.shift_range_lat, cfg.shift_range_lon)
        return tr(out), tr(dx), tr(dy), duv

    def _project_grd_banded_pixmom(self, grd_feat, sat_line, pose, camera_k,
                                   A: int):
        """Fused pixel-moments projective-line projection (G2SP EVAL fast
        path, round-4 lever): ONE kernel pass emits the five per-pixel
        channel moments of the residual against ``sat_line`` ([B, j', i, C]
        satellite rows pre-transposed to kernel line order), so the
        [B, A, A, C]x3 sampled fields never exist in HBM
        (ops/pallas/banded_warp.py:make_projline_pixmom).  Returns
        (pm [B, i, j', 16], duv [B, i, j', 2, 3]) for
        ``lm_update_pixel_moments`` — numerics identical to the
        _project_grd_banded + lm_update_implicit_pixel pair up to fp32
        contraction order."""
        from highlyaccurate_tpu.models.lm_s2gp import _BANDED_CACHE
        from highlyaccurate_tpu.ops.pallas.banded_warp import (
            make_projline_pixmom, pack_projline_coefs)
        cfg = self.cfg
        Hg, Wg, C = grd_feat.shape[1:]
        j0 = self._col_start[A]
        XYZ1 = jnp.asarray(self._xyz1[A][:, j0:])         # [A, A-j0, 4]
        P = geom.g2sp_P(pose, camera_k, Hg, Wg, cfg.grd_h, cfg.grd_w,
                        cfg.rotation_range, cfg.shift_range_lat,
                        cfg.shift_range_lon)
        X0 = XYZ1[0]
        dX = XYZ1[1] - XYZ1[0]
        h0 = jnp.einsum("bik,jk->bji", P, X0)             # [B, A-j0(j), 3]
        dh = jnp.einsum("bik,jk->bji", P, dX)
        coefs = pack_projline_coefs(h0, dh, Hg, Wg, Hg, A)

        key_ = ("pixmom", Hg, Wg, C, A, j0)
        sampler = _BANDED_CACHE.get(key_)
        if sampler is None:
            sampler = make_projline_pixmom(
                AY=Hg, AX=Wg, C=C, V=A - j0, W=A,
                interpret=jax.default_backend() != "tpu")
            _BANDED_CACHE[key_] = sampler
        pm = sampler(grd_feat, sat_line, coefs)           # [B, j', i, 16]

        _, duv, _ = geom.g2sp_uv_jac(
            pose, XYZ1, camera_k, Hg, Wg, cfg.grd_h, cfg.grd_w,
            cfg.rotation_range, cfg.shift_range_lat, cfg.shift_range_lon)
        return jnp.transpose(pm, (0, 2, 1, 3)), duv

    def _make_level_round(self, sat_feats, grd_feats, grd_confs, camera_k,
                          mode: str, collect_aux: bool):
        """Build the per-(level) solver round over precomputed feature
        pyramids (shared by __call__ and multi_hypothesis_test)."""
        cfg = self.cfg
        lm_cfg = LMConfig(
            active_dims=(0, 1, 2),
            using_weight=bool(cfg.using_weight),
            train_damping=bool(cfg.train_damping),
            damping=cfg.damping,
            use_hessian=False,
            dropout=0,
            normalize=False,
            reinit=False,
            raw_damping=True,
        )

        # projective-line Pallas fast path: geo proj, unweighted LM
        # (using_weight folds conf into the update otherwise); needs the
        # bf16 full-map residency.  Eval uses the VJP-free kernel; TRAIN
        # uses the differentiable custom-VJP variant (the XLA
        # gather/scatter formulation measured 0.43 fps at batch 8 —
        # PERF.md round 3).  use_banded_warp=2 forces the interpret-mode
        # kernel off-TPU (tests).
        banded = (cfg.proj == "geo" and cfg.Optimizer == "LM"
                  and bool(cfg.use_banded_warp) and not cfg.using_weight
                  and bool(cfg.banded_bf16_map) and not collect_aux
                  and (jax.default_backend() == "tpu"
                       or cfg.use_banded_warp >= 2))
        # eval fused pixel-moments path: satellite target rows in kernel
        # line order, transposed ONCE per level (outside the iteration scan)
        fused = banded and mode != "train" and bool(cfg.g2sp_pixel_moments)
        sat_lines = None
        if fused:
            sat_lines = [
                jnp.transpose(f[:, :, self._col_start[f.shape[1]]:],
                              (0, 2, 1, 3)) for f in sat_feats]

        def level_round(p, lvl):
            A = sat_feats[lvl].shape[1]
            Hg, Wg, Cg = grd_feats[lvl].shape[1:]
            from highlyaccurate_tpu.ops.pallas.banded_warp import \
                projline_supported
            if banded and projline_supported(Hg, Wg, Cg):
                if fused:
                    pm, duv = self._project_grd_banded_pixmom(
                        grd_feats[lvl], sat_lines[lvl], p, camera_k, A)
                    new_p = lm_update_pixel_moments(p, pm, duv,
                                                    self.damping, lm_cfg)
                    return new_p, None
                j0 = self._col_start[A]
                g_proj, dx, dy, duv = self._project_grd_banded(
                    grd_feats[lvl], p, camera_k, A, diff=(mode == "train"))
                new_p = lm_update_implicit_pixel(
                    p, g_proj, dx, dy, sat_feats[lvl][:, :, j0:], duv,
                    self.damping, lm_cfg)
                return new_p, g_proj
            if (cfg.Optimizer == "LM" and cfg.use_implicit_lm
                    and not cfg.using_weight and not collect_aux):
                # gather-path implicit-J (train AND eval): the same per-pixel
                # moment contraction as the Pallas path, fed by the gather
                # sampler's (out, dx, dy) — differentiable, no [B,A,A,C,3]
                # Jacobian in HBM (see ops/grid_sample.py)
                if cfg.proj == "nn":
                    uv, duv, _ = geom.inplane_uv_jac(
                        p, A, cfg.rotation_range, cfg.shift_range_lat,
                        cfg.shift_range_lon)
                    sat_t = sat_feats[lvl]
                else:
                    j0 = self._col_start[A]  # zero-J columns dropped
                    uv, duv, _ = geom.g2sp_uv_jac(
                        p, jnp.asarray(self._xyz1[A][:, j0:]), camera_k,
                        Hg, Wg, cfg.grd_h, cfg.grd_w, cfg.rotation_range,
                        cfg.shift_range_lat, cfg.shift_range_lon)
                    sat_t = sat_feats[lvl][:, :, j0:]
                out, dx, dy = grid_sample_derivs(grd_feats[lvl], uv)
                new_p = lm_update_implicit_pixel(
                    p, out, dx, dy, sat_t, duv, self.damping,
                    lm_cfg)
                return new_p, out
            g_proj, c_proj, jac, _m = self._project_grd_to_map(
                grd_feats[lvl], grd_confs[lvl], p, camera_k, A)
            # residual grd_proj - sat; weight grd_conf_proj
            # (reference models_kitti.py:354-364)
            new_p = lm_update(p, g_proj, c_proj, sat_feats[lvl],
                              c_proj, jac, self.damping, lm_cfg)
            return new_p, g_proj
        return level_round

    def multi_hypothesis_test(self, sat_map, grd_img, camera_k,
                              n_hyp: int, init_pose=None,
                              with_info: bool = False):
        """Multi-start LM inference for the G2SP direction (SURVEY.md §2.2
        P6; mirror of LMS2GP.multi_hypothesis_test): ``n_hyp`` initial
        poses per sample ride the batch axis through the eval scan;
        the hypothesis with the smallest finest-level feature residual
        (grd_proj - sat over the satellite grid) wins.

        Returns (shift_lat, shift_lon, theta) each [B]; ``with_info``
        appends the winner's [B, 3, 3] pose covariance."""
        sat_feats, sat_confs = self.SatFeatureNet(sat_map)
        grd_feats, grd_confs = self.GrdFeatureNet(grd_img)
        return self._multi_hypothesis_from_feats(
            sat_feats, grd_feats, grd_confs, camera_k, n_hyp,
            init_pose=init_pose, with_info=with_info)

    def _multi_hypothesis_from_feats(self, sat_feats, grd_feats, grd_confs,
                                     camera_k, n_hyp: int, init_pose=None,
                                     with_info: bool = False):
        """Hypothesis sweep + selection over precomputed feature pyramids
        (separated from feature extraction so the scoring is unit-testable
        on self-consistent synthetic features)."""
        cfg = self.cfg
        B = camera_k.shape[0]
        P = n_hyp
        sat_feats0, grd_feats0 = sat_feats, grd_feats

        tile = lambda x: jnp.repeat(x, P, axis=0)  # [B,...] -> [B*P,...]
        sat_feats = [tile(f) for f in sat_feats]
        grd_feats = [tile(f) for f in grd_feats]
        grd_confs = [tile(c) for c in grd_confs]
        k_t = tile(camera_k)

        init_key = self.make_rng("lm")
        init = jax.random.uniform(jax.random.fold_in(init_key, 0x5EED),
                                  (B, P, 3), minval=-1.0, maxval=1.0)
        # hypothesis 0 = reference init (zero) or the warm start
        init = init.at[:, 0, :].set(
            0.0 if init_pose is None else init_pose.astype(jnp.float32))
        if cfg.rotation_range == 0:
            init = init.at[..., 2].set(0.0)
        pose0 = init.reshape(B * P, 3)

        level_round = self._make_level_round(
            sat_feats, grd_feats, grd_confs, k_t, "test", False)
        n_levels = len(self._slots)

        def iter_body(p, _):
            for lvl in range(n_levels):
                p, _aux = level_round(p, lvl)
            return p, None

        final, _ = jax.lax.scan(iter_body, pose0, None, length=cfg.N_iters)

        # score: feature residual at the finest level under the final pose
        lvl = n_levels - 1
        A = sat_feats[lvl].shape[1]
        g_proj, _, _, m = self._project_grd_to_map(
            grd_feats[lvl], None, final, k_t, A, with_jac=False)
        # normalized residual over the shared valid support (the flagship's
        # hypothesis-comparability fix, lm_s2gp.py: un-normalized energies
        # make a fully-off-map hypothesis's constant sum(sat^2) beat real
        # ones; mask the target so both sides cover the same pixels)
        s_t = sat_feats[lvl] * m[..., None]
        g_f = g_proj.reshape(B * P, -1)
        s_f = s_t.reshape(B * P, -1)
        g_n = jnp.sqrt(jnp.maximum(jnp.sum(g_f * g_f, -1), 1e-12))
        s_n = jnp.sqrt(jnp.maximum(jnp.sum(s_f * s_f, -1), 1e-12))
        cost = jnp.sum((g_f / g_n[:, None] - s_f / s_n[:, None]) ** 2,
                       axis=-1)
        best = jnp.argmin(cost.reshape(B, P), axis=1)  # [B]

        final = final.reshape(B, P, 3)[jnp.arange(B), best]
        if with_info:
            cov = self._pose_info(sat_feats0, grd_feats0, final, camera_k)
            return final[:, 1], final[:, 0], final[:, 2], cov
        return final[:, 1], final[:, 0], final[:, 2]

    def _pose_info(self, sat_feats, grd_feats, pose, camera_k):
        """[B, 3, 3] pose covariance at ``pose`` from the G2SP objective's
        Gauss-Newton information (NEW capability): one extra finest-level
        projection; the G2SP residual is unnormalized grd_proj - sat over
        the full satellite grid (reference models_kitti.py:333-379), so
        normalize=False and an all-ones mask."""
        cfg = self.cfg
        if cfg.using_weight:
            # weighted-residual covariance is not implemented (see lm_s2gp)
            raise ValueError("with_info does not support using_weight=1")
        lvl = len(self._slots) - 1
        A = sat_feats[lvl].shape[1]
        Hg, Wg = grd_feats[lvl].shape[1:3]
        if cfg.proj == "nn":
            uv, duv, _ = geom.inplane_uv_jac(
                pose, A, cfg.rotation_range, cfg.shift_range_lat,
                cfg.shift_range_lon)
        else:
            uv, duv, _ = geom.g2sp_uv_jac(
                pose, jnp.asarray(self._xyz1[A]), camera_k, Hg, Wg,
                cfg.grd_h, cfg.grd_w, cfg.rotation_range,
                cfg.shift_range_lat, cfg.shift_range_lon)
        out, dx, dy = grid_sample_derivs(grd_feats[lvl], uv)
        hess, rss, n_res = lm_information(
            out, dx, dy, sat_feats[lvl], jnp.ones((1, A, A)), duv,
            (0, 1, 2), normalize=False)
        return pose_covariance(hess, rss, n_res, (0, 1, 2))

    def __call__(self, sat_map, grd_img, camera_k, gt_pose=None,
                 mode: str = "train", init_pose=None,
                 with_info: bool = False):
        """sat_map [B,A,A,3], grd_img [B,H,W,3], camera_k [B,3,3].

        ``init_pose`` [B, 3] warm-starts the solver (tracking mode; also
        seeds hypothesis 0 of the multi-start sweep); ``with_info`` appends
        the [B, 3, 3] pose covariance in test mode."""
        cfg = self.cfg
        B = sat_map.shape[0]
        if mode == "test" and cfg.pose_hypotheses > 1:
            return self.multi_hypothesis_test(sat_map, grd_img, camera_k,
                                              cfg.pose_hypotheses,
                                              init_pose=init_pose,
                                              with_info=with_info)
        sat_feats, sat_confs = self.SatFeatureNet(sat_map)
        grd_feats, grd_confs = self.GrdFeatureNet(grd_img)

        pose = (jnp.zeros((B, 3), dtype=jnp.float32) if init_pose is None
                else init_pose.astype(jnp.float32))
        traj = []
        collect_aux = mode == "train" and cfg.loss_method > 0
        aux_feats = {lvl: [] for lvl in range(len(self._slots))}

        level_round = self._make_level_round(
            sat_feats, grd_feats, grd_confs, camera_k, mode, collect_aux)

        n_levels = len(self._slots)
        if mode != "train":
            # lax.scan over iterations, levels unrolled in the body: each
            # level's sampler appears once in the program instead of once per
            # round (the unrolled 15-round program overflowed the remote
            # compile helper with the Pallas fast path; same design as
            # LM_S2GP._run_rounds)
            def iter_body(p, _):
                poses = []
                for lvl in range(n_levels):
                    p, _aux = level_round(p, lvl)
                    poses.append(p)
                return p, jnp.stack(poses, 1)      # [B, L, 3]

            _, scan_traj = jax.lax.scan(iter_body, pose, None,
                                        length=cfg.N_iters)
            t = jnp.transpose(scan_traj, (1, 0, 2, 3))  # [B, I, L, 3]
        else:
            order = [(it, lvl) for it in range(cfg.N_iters)
                     for lvl in range(n_levels)]
            # G2SP train rounds ALWAYS remat: the per-round (out, dx, dy)
            # residuals are sat-grid-sized [B, A, A, C] — 15 unrolled rounds
            # of them exceed v5e HBM at batch 8 on both the gather and the
            # kernel path (measured OOM, PERF.md round 3); recomputing one
            # round's forward in the backward is minor next to its VJP.
            for it, lvl in order:
                fn = jax.checkpoint(lambda p, lvl=lvl: level_round(p, lvl))
                pose, g_proj = fn(pose)
                traj.append(pose)
                if collect_aux:
                    aux_feats[lvl].append(g_proj)
            t = jnp.stack(traj, axis=1).reshape(B, cfg.N_iters, n_levels, 3)
        shift_lats, shift_lons, thetas = t[..., 1], t[..., 0], t[..., 2]

        if mode == "trajectory":
            # full [B, N_iters, L] trajectories (parity tests / visualization)
            return shift_lats, shift_lons, thetas
        if mode != "train":
            if with_info:
                cov = self._pose_info(sat_feats, grd_feats, t[:, -1, -1, :],
                                      camera_k)
                return (shift_lats[:, -1, -1], shift_lons[:, -1, -1],
                        thetas[:, -1, -1], cov)
            return shift_lats[:, -1, -1], shift_lons[:, -1, -1], thetas[:, -1, -1]

        if cfg.loss_method != 0:
            raise ValueError(
                "G2SP supports loss_method 0 only (the reference passes None "
                "feature dicts for G2SP, models_kitti.py:488-492)")
        coe_heading = cfg.coe_heading
        return loss_func(
            cfg.loss_method, shift_lats, shift_lons, thetas,
            gt_pose[:, 1], gt_pose[:, 0], gt_pose[:, 2],
            cfg.coe_shift_lat, cfg.coe_shift_lon, coe_heading)

    # -- dense-correlation localization head --------------------------------
    def corr(self, sat_map, grd_img, camera_k, gt_pose=None,
             mode: str = "train"):
        """Exhaustive translation search by normalized correlation.

        Reference models_kitti.py:501-576: project ground features at zero
        pose, center-crop to the shift search window, correlate against the
        satellite feature map (grouped conv), argmin of the L2 surface.
        TPU-native: the grouped conv2d becomes one
        ``lax.conv_general_dilated`` with feature_group_count=B over a
        [1, B*C] layout — a single big MXU matmul.
        """
        cfg = self.cfg
        B = sat_map.shape[0]
        sat_feats, _ = self.SatFeatureNet(sat_map)
        grd_feats, _ = self.GrdFeatureNet(grd_img)
        pose0 = jnp.zeros((B, 3), dtype=jnp.float32)

        corr_maps = []
        pred_u = pred_v = None
        for lvl in range(len(self._slots)):
            slot = self._slots[lvl]
            mpp = self.meters_per_pixel[slot]
            sat_feat = sat_feats[lvl]
            A = sat_feat.shape[1]
            g_proj, _, _, _m = self._project_grd_to_map(
                grd_feats[lvl], None, pose0, camera_k, A, with_jac=False)

            crop_h = int(A - cfg.shift_range_lat * 2 / mpp)
            crop_w = int(A - cfg.shift_range_lon * 2 / mpp)
            # torchvision center_crop rounds the margin with Python round()
            # (banker's), not floor — matters for odd margins
            # (reference models_kitti.py:549 via TF.center_crop)
            t0 = int(round((A - crop_h) / 2.0))
            l0 = int(round((A - crop_w) / 2.0))
            kernel = g_proj[:, t0:t0 + crop_h, l0:l0 + crop_w, :]  # [B,h,w,C]
            kflat = kernel.reshape(B, -1)
            knorm = jnp.sqrt(jnp.maximum(jnp.sum(kflat * kflat, -1), 1e-24))
            kernel = kernel / knorm[:, None, None, None]

            C = sat_feat.shape[-1]
            # grouped correlation: inputs [1, A, A, B*C], kernel HWIO
            # [h, w, C, B] with feature_group_count=B -> [1, H', W', B]
            x = jnp.transpose(sat_feat, (1, 2, 0, 3)).reshape(1, A, A, B * C)
            k = jnp.transpose(kernel, (1, 2, 3, 0))  # [h, w, C, B]
            corr = jax.lax.conv_general_dilated(
                x, k, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=B)[0]  # [H', W', B]
            corr = jnp.transpose(corr, (2, 0, 1))  # [B, H', W']

            # normalized L2 distance surface (models_kitti.py:554-557)
            sq = jnp.sum(sat_feat ** 2, axis=-1, keepdims=True)  # [B, A, A, 1]
            denom = jax.lax.reduce_window(
                sq, 0.0, jax.lax.add, (1, crop_h, crop_w, 1), (1, 1, 1, 1),
                "VALID")[..., 0]
            denom = jnp.maximum(jnp.sqrt(denom), 1e-6)
            corr = 2 - 2 * corr / denom

            corr_maps.append(corr)
            ch, cw = corr.shape[1:]
            flat_idx = jnp.argmin(corr.reshape(B, -1), axis=1)
            pred_u = (flat_idx % cw - cw / 2) * mpp
            pred_v = -(flat_idx // cw - ch / 2) * mpp

        if mode == "train":
            losses = []
            for lvl, corr in enumerate(corr_maps):
                slot = self._slots[lvl]
                mpp = self.meters_per_pixel[slot]
                ch, cw = corr.shape[1:]
                w = jnp.round(cw / 2 + gt_pose[:, 0] * cfg.shift_range_lon / mpp)
                h = jnp.round(ch / 2 - gt_pose[:, 1] * cfg.shift_range_lat / mpp)
                losses.append(soft_margin_triplet(corr, w, h))
            return jnp.sum(jnp.stack(losses))
        return pred_u, pred_v
