"""Training losses for the unrolled pose solver.

TPU-native re-implementation of the reference loss library
(reference: /root/reference/models_ford.py:1041-1209).

Method 0 (direct weighted-L1 pose error over all iterations x levels) is the
production loss; methods 1-3 are the reference's documented failed trials,
kept for capability parity (a reference comment at models_ford.py:1040 marks
them as such).

All functions are pure; trajectories are [B, N_iters, L] arrays.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax.numpy as jnp


class LossDiagnostics(NamedTuple):
    loss: jnp.ndarray                # scalar
    loss_decrease: jnp.ndarray       # [L]
    shift_lat_decrease: jnp.ndarray  # [L]
    shift_lon_decrease: jnp.ndarray  # [L]
    thetas_decrease: jnp.ndarray     # [L]
    loss_last: jnp.ndarray           # [L]
    shift_lat_last: jnp.ndarray      # [L]
    shift_lon_last: jnp.ndarray      # [L]
    theta_last: jnp.ndarray          # [L]
    L1: Optional[jnp.ndarray] = None
    L2: Optional[jnp.ndarray] = None
    L3: Optional[jnp.ndarray] = None
    L4: Optional[jnp.ndarray] = None


def normalize_feature(x):
    """Whole-map L2 normalization over the trailing 3 axes.

    Reference models_ford.py:1206-1209; here maps are channel-last
    [..., H, W, C].
    """
    flat = x.reshape(x.shape[:-3] + (-1,))
    norm = jnp.sqrt(jnp.maximum(jnp.sum(flat * flat, axis=-1), 1e-24))
    return x / norm[..., None, None, None]


def _pose_terms(shift_lats, shift_lons, thetas, gt_lat, gt_lon, gt_theta):
    lat_d0 = jnp.abs(shift_lats - gt_lat[:, None, None])  # [B, I, L]
    lon_d0 = jnp.abs(shift_lons - gt_lon[:, None, None])
    th_d0 = jnp.abs(thetas - gt_theta[:, None, None])
    lat_d = jnp.mean(lat_d0, axis=0)  # [I, L]
    lon_d = jnp.mean(lon_d0, axis=0)
    th_d = jnp.mean(th_d0, axis=0)
    return lat_d0, lon_d0, th_d0, lat_d, lon_d, th_d


def loss_func(loss_method: int,
              shift_lats, shift_lons, thetas,
              gt_shift_lat, gt_shift_lon, gt_theta,
              coe_shift_lat: float = 100.0, coe_shift_lon: float = 100.0,
              coe_theta: float = 100.0,
              ref_feat_list: Optional[Sequence] = None,
              pred_feat_list: Optional[Sequence] = None,
              gt_feat_list: Optional[Sequence] = None,
              pred_uv_list: Optional[Sequence] = None,
              gt_uv_list: Optional[Sequence] = None,
              coe_L1: float = 100.0, coe_L2: float = 100.0,
              coe_L3: float = 100.0, coe_L4: float = 100.0
              ) -> LossDiagnostics:
    """Reference-parity loss (models_ford.py:1041-1202).

    Args:
      shift_lats/shift_lons/thetas: [B, N_iters, L] normalized trajectories.
      gt_*: [B] normalized ground truth.
      ref_feat_list: per-level target features [B, H, W, C] (methods 1-3).
      pred_feat_list: per-level stacked projected features [B, I, H, W, C].
      gt_feat_list: per-level gt-pose projected features [B, H, W, C].
      pred_uv_list / gt_uv_list: per-level normalized uv ([B, I, H, W, 2] /
        [B, H, W, 2]) for method 3.
    """
    lat_d0, lon_d0, th_d0, lat_d, lon_d, th_d = _pose_terms(
        shift_lats, shift_lons, thetas, gt_shift_lat, gt_shift_lon, gt_theta)

    lat_dec = lat_d[0] - lat_d[-1]
    lon_dec = lon_d[0] - lon_d[-1]
    th_dec = th_d[0] - th_d[-1]

    losses = coe_shift_lat * lat_d + coe_shift_lon * lon_d + coe_theta * th_d
    loss_dec = losses[0] - losses[-1]
    loss0 = jnp.mean(losses)
    loss_last = losses[-1]
    base = dict(loss_decrease=loss_dec, shift_lat_decrease=lat_dec,
                shift_lon_decrease=lon_dec, thetas_decrease=th_dec,
                loss_last=loss_last, shift_lat_last=lat_d[-1],
                shift_lon_last=lon_d[-1], theta_last=th_d[-1])

    if loss_method == 0:
        return LossDiagnostics(loss=loss0, **base)

    if loss_method in (1, 2):
        # feature-triplet auxiliary terms (models_ford.py:1096-1156). The
        # reference's method-1 mask references undefined names (a latent bug);
        # we use the pose deltas per (iter, level) as clearly intended.
        B = gt_shift_lat.shape[0]
        masks = ((lat_d0 > 0.001) & (lon_d0 > 0.001) & (th_d0 > 0.01))  # [B,I,L]
        terms = []
        for lvl in range(len(ref_feat_list)):
            ref = ref_feat_list[lvl]                    # [B, H, W, C]
            gt = normalize_feature(gt_feat_list[lvl])   # [B, H, W, C]
            pos = 2 - 2 * jnp.sum(ref * gt, axis=(-3, -2, -1))  # [B]
            if loss_method == 1:
                pred = normalize_feature(pred_feat_list[lvl])  # [B, I, H, W, C]
                neg = 2 - 2 * jnp.sum(ref[:, None] * pred, axis=(-3, -2, -1))  # [B,I]
                m = masks[..., lvl]
                t = jnp.log1p(jnp.exp(10 * m * (pos[:, None] - neg))) * m
                terms.append(t)  # [B, I]
            else:
                terms.append(pos)  # [B]
        if loss_method == 1:
            tl = jnp.stack(terms, axis=-1)  # [B, I, L]
            L1 = coe_L1 * jnp.sum(tl) / jnp.maximum(jnp.sum(masks), 1)
        else:
            tl = jnp.stack(terms, axis=-1)  # [B, L]
            L1 = coe_L1 * jnp.sum(tl) / B
        return LossDiagnostics(loss=loss0 + L1, L1=L1, **base)

    if loss_method == 3:
        # four-term loss (models_ford.py:1157-1202)
        L1s, L2s, L3s, L4s = [], [], [], []
        for lvl in range(len(ref_feat_list)):
            ref = ref_feat_list[lvl]
            pred = normalize_feature(pred_feat_list[lvl])  # [B, I, H, W, C]
            gt = normalize_feature(gt_feat_list[lvl])
            pos = 2 - 2 * jnp.sum(ref * gt, axis=(-3, -2, -1))  # [B]
            neg = 2 - 2 * jnp.sum(ref[:, None] * pred, axis=(-3, -2, -1))  # [B,I]
            neg_upd = neg[:, 1:] - neg[:, :-1]

            pred_uv = pred_uv_list[lvl]  # [B, I, H, W, 2] in [0, 1]
            gt_uv = gt_uv_list[lvl]      # [B, H, W, 2]
            uv_diff = jnp.mean(jnp.sqrt(jnp.sum(
                jnp.square(pred_uv - gt_uv[:, None]), axis=-1)), axis=(2, 3))  # [B,I]
            mask_neg = uv_diff > 0.002
            L1 = coe_L1 * jnp.log1p(jnp.exp(10 * mask_neg * (pos[:, None] - neg))) * mask_neg
            L2 = coe_L2 * uv_diff
            uv_upd = uv_diff[:, 1:] - uv_diff[:, :-1]
            L3 = coe_L3 * jnp.log1p(jnp.exp(100 * uv_upd))
            sign = jnp.where(uv_upd <= 0.0, 1.0, -1.0)
            L4 = coe_L4 * jnp.log1p(jnp.exp(10 * sign * neg_upd))
            L1s.append(jnp.mean(L1, axis=0))
            L2s.append(jnp.mean(L2, axis=0))
            L3s.append(jnp.mean(L3, axis=0))
            L4s.append(jnp.mean(L4, axis=0))
        L1_loss = jnp.stack(L1s, axis=-1)
        L2_loss = jnp.stack(L2s, axis=-1)
        L3_loss = jnp.stack(L3s, axis=-1)
        L4_loss = jnp.stack(L4s, axis=-1)
        loss = (jnp.sum(L1_loss) + jnp.sum(L2_loss)
                + jnp.sum(L3_loss) + jnp.sum(L4_loss))
        base.update(loss_decrease=L2_loss[0] - L2_loss[-1], loss_last=L2_loss[-1])
        return LossDiagnostics(loss=loss, L1=L1_loss, L2=L2_loss,
                               L3=L3_loss, L4=L4_loss, **base)

    raise ValueError(f"unknown loss_method {loss_method}")


def soft_margin_triplet(corr, gt_u_px, gt_v_px):
    """Soft-margin triplet loss over a dense correlation map.

    Reference models_kitti.py:579-595: positive is the gt cell, negatives all
    others, loss = mean log(1 + exp(10 * (pos - neg))).

    Args:
      corr: [B, H, W]; gt_u_px/gt_v_px: [B] integer cell coordinates.
    """
    B, H, W = corr.shape
    pos = corr[jnp.arange(B), gt_v_px.astype(jnp.int32), gt_u_px.astype(jnp.int32)]
    pos_neg = pos[:, None, None] - corr
    return jnp.sum(jnp.log1p(jnp.exp(pos_neg * 10.0))) / (B * (H * W - 1))
