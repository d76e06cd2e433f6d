"""KITTI train/eval CLI — flag-compatible with the reference driver.

Reference: /root/reference/train_kitti.py (argparse flags :426-485, save-path
scheme :488-521, train loop :319-423, eval protocol :34-315).

TPU-native deltas:
  * one jitted train step / eval step over a data-parallel device mesh (the
    reference is single-GPU python loops);
  * orbax checkpoints (+ ``--import_pth`` to evaluate released reference
    checkpoints);
  * ``--dataset_root`` lifts the reference's hardcoded path; with
    ``--synthetic N`` the pipeline runs on generated data (smoke/benchmark).

Quirks preserved on purpose (SURVEY.md §7.4): Adam is re-created every epoch
with poly-decayed lr; ``--test 1`` loads ``model_1`` like the reference loads
``model_1.pth``.  The eval-time ``loss.backward()`` graph-release hack has no
JAX analogue and is dropped.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from highlyaccurate_tpu.config import Config, config_from_args
from highlyaccurate_tpu.eval.metrics import EvalResults, denormalize


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    # reference flags (train_kitti.py:426-485)
    p.add_argument("--resume", type=int, default=0)
    p.add_argument("--test", type=int, default=1)
    p.add_argument("--debug", type=int, default=0)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--stereo", type=int, default=0)
    p.add_argument("--sequence", type=int, default=1)
    p.add_argument("--rotation_range", type=float, default=10.0)
    p.add_argument("--shift_range_lat", type=float, default=20.0)
    p.add_argument("--shift_range_lon", type=float, default=20.0)
    p.add_argument("--coe_shift_lat", type=float, default=100.0)
    p.add_argument("--coe_shift_lon", type=float, default=100.0)
    p.add_argument("--coe_heading", type=float, default=100.0)
    p.add_argument("--coe_L1", type=float, default=100.0)
    p.add_argument("--coe_L2", type=float, default=100.0)
    p.add_argument("--coe_L3", type=float, default=100.0)
    p.add_argument("--coe_L4", type=float, default=100.0)
    p.add_argument("--metric_distance", type=float, default=5.0)
    p.add_argument("--batch_size", type=int, default=3)
    p.add_argument("--loss_method", type=int, default=0)
    p.add_argument("--level", type=int, default=3)
    p.add_argument("--N_iters", type=int, default=5)
    p.add_argument("--using_weight", type=int, default=0)
    p.add_argument("--damping", type=float, default=0.1)
    p.add_argument("--train_damping", type=int, default=0)
    p.add_argument("--negative_samples", type=int, default=32)
    p.add_argument("--use_conf_metric", type=int, default=0)
    p.add_argument("--direction", type=str, default="S2GP")
    p.add_argument("--Load", type=int, default=0)
    p.add_argument("--Optimizer", type=str, default="LM")
    p.add_argument("--level_first", type=int, default=0)
    p.add_argument("--proj", type=str, default="geo")
    p.add_argument("--use_gt_depth", type=int, default=0)
    p.add_argument("--dropout", type=int, default=0)
    p.add_argument("--use_hessian", type=int, default=0)
    p.add_argument("--visualize", type=int, default=0)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.999)
    # TPU-framework flags
    p.add_argument("--dataset_root", type=str, default=None)
    p.add_argument("--synthetic", type=int, default=0,
                   help="run on N synthetic samples instead of disk data")
    p.add_argument("--import_pth", type=str, default=None,
                   help="path to a reference .pth checkpoint to evaluate")
    p.add_argument("--pretrained_vgg16", type=str, default=None,
                   help="torchvision VGG16 ImageNet .pth: initialize both "
                        "encoder branches like the reference (VGG.py:20)")
    p.add_argument("--save_root", type=str, default=".")
    p.add_argument("--compute_dtype", type=str, default=None,
                   help="feature compute dtype. Default: bfloat16 for "
                        "--test 1 on natively-trained checkpoints (recall-"
                        "neutral, PERF.md study), float32 for training and "
                        "for --import_pth eval (strict reference numerics)")
    p.add_argument("--keep_optimizer_state", type=int, default=0)
    p.add_argument("--profile_dir", type=str, default="",
                   help="capture a jax.profiler device trace of train "
                        "steps 2-4 of the first epoch into this directory "
                        "(TensorBoard/Perfetto-loadable)")
    p.add_argument("--async_ckpt", type=int, default=1,
                   help="epoch checkpoints write on orbax's "
                        "background thread, overlapping the "
                        "following eval (0 = synchronous)")
    p.add_argument("--remat", type=int, default=0,
                   help="checkpoint the solver scan body (memory vs compile "
                        "size tradeoff)")
    p.add_argument("--use_banded_warp", type=int, default=None,
                   help="Pallas banded sampler in S2GP eval (0 = exact "
                        "gather-path numerics). Default 1, except when "
                        "evaluating --import_pth checkpoints (0: reference "
                        "weights were trained through the gather-equivalent "
                        "sampler — see PERF.md recall study)")
    p.add_argument("--pose_hypotheses", type=int, default=1,
                   help="multi-start LM hypotheses at eval (new capability)")
    p.add_argument("--g2sp_restrict_grid", type=int, default=None,
                   help="G2SP: drop satellite columns that can never be in "
                        "view (zero-J; numerically identical for poses "
                        "within 1.5x the ranges). 0 = full A x A grid. "
                        "Default 1, except when evaluating --import_pth "
                        "checkpoints (0: the column bound assumes the "
                        "default KITTI camera_k — strict reference numerics "
                        "must not depend on it)")
    p.add_argument("--seed", type=int, default=2022)
    p.add_argument("--grd_h", type=int, default=256)
    p.add_argument("--grd_w", type=int, default=1024)
    p.add_argument("--sat_size", type=int, default=512)
    return p.parse_args(argv)


def build_model(cfg: Config):
    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
    return {"S2GP": LMS2GP, "G2SP": LMG2SP}[cfg.direction](cfg=cfg)


def make_loaders(cfg: Config, args, split: str):
    from highlyaccurate_tpu.data.kitti import KittiDataset, Loader, SyntheticKitti
    if args.synthetic:
        ds = SyntheticKitti(n=args.synthetic, grd_h=cfg.grd_h, grd_w=cfg.grd_w,
                            sat_size=cfg.sat_size,
                            seed={"train": 0, "test1": 1, "test2": 2}[split])
    else:
        ds = KittiDataset(cfg.dataset_root, split,
                          shift_range_lat=cfg.shift_range_lat,
                          shift_range_lon=cfg.shift_range_lon,
                          rotation_range=cfg.rotation_range,
                          grd_h=cfg.grd_h, grd_w=cfg.grd_w,
                          sat_size=cfg.sat_size)
    return Loader(ds, cfg.batch_size, shuffle=(split == "train"),
                  drop_last=(split == "train"))


def init_model(cfg: Config, model):
    import jax
    import jax.numpy as jnp
    sat = jnp.zeros((1, cfg.sat_size, cfg.sat_size, 3))
    grd = jnp.zeros((1, cfg.grd_h, cfg.grd_w, 3))
    gt = jnp.zeros((1, 3))
    if cfg.direction == "G2SP":
        k = jnp.zeros((1, 3, 3))
        return model.init({"params": jax.random.PRNGKey(0),
                           "lm": jax.random.PRNGKey(1)},
                          sat, grd, k, gt, mode="train")
    return model.init({"params": jax.random.PRNGKey(0),
                       "lm": jax.random.PRNGKey(1)}, sat, grd, gt, mode="train")


def _visualize_batch(model, cfg: Config, params, batch, rng, traj_name: str,
                     feat_prefix: str, loop: int = 0):
    """``--visualize``: trajectory plot + per-level feature-PCA RGBs for the
    first sample of a batch.  The reference triggers these inside both the
    train and *test* forwards (models_kitti.py:1285-1293, :1464-1469);
    shared by the train loop and evaluate()."""
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.utils import geo as _geo
    from highlyaccurate_tpu.viz.visualize import (features_to_rgb,
                                                  pose_trajectory_plot)
    params_h = jax.device_get(params)
    sat1 = jnp.asarray(batch["sat"][:1])
    grd1 = jnp.asarray(batch["grd"][:1])
    lats, lons, ths = model.apply(
        {"params": params_h}, sat1, grd1, mode="trajectory", rngs={"lm": rng})
    save_dir = f"./visualize_rot{cfg.rotation_range}"
    pose_trajectory_plot(
        batch["sat"][0], np.asarray(lats), np.asarray(lons), np.asarray(ths),
        batch["gt_pose"], _geo.get_meter_per_pixel(), cfg.shift_range_lat,
        cfg.shift_range_lon, cfg.rotation_range,
        os.path.join(save_dir, f"traj_{traj_name}.png"))
    pred = jnp.asarray(np.stack([np.asarray(lons)[:, -1, -1],
                                 np.asarray(lats)[:, -1, -1],
                                 np.asarray(ths)[:, -1, -1]], -1))
    gt1 = jnp.asarray(batch["gt_pose"][:1])
    per_level = model.apply({"params": params_h}, sat1, grd1, pred, gt1,
                            method="project_at_pose")
    for lvl, maps in enumerate(per_level):
        features_to_rgb([np.asarray(m) for m in maps], save_dir,
                        prefix=f"{feat_prefix}_L{lvl}", loop=loop)


def evaluate(model, cfg: Config, params, args, split: str, save_path: str,
             epoch: int, best_rank: float, eval_step=None, mesh=None):
    """Reference test1/test2 protocol (train_kitti.py:34-172).

    Inference shards over ALL available chips: when no mesh/step is passed
    (the ``--test 1`` CLI path) a full-device mesh is built and every batch
    is padded to a device multiple (pad rows are duplicates, trimmed from
    the outputs).  One warm-up dispatch runs before the clock so
    ``time_per_image`` excludes jit compilation (reference semantics:
    train_kitti.py:74-75 measures steady-state inference)."""
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.train import step as step_lib
    from highlyaccurate_tpu.train.checkpoint import save_params

    loader = make_loaders(cfg, args, split)
    if eval_step is None:
        if mesh is None and jax.device_count() > 1:
            mesh = step_lib.make_mesh()
        eval_step = step_lib.make_eval_step(model, cfg, mesh)
    if mesh is not None:
        # params may live on a smaller training mesh — replicate onto the
        # eval mesh so inference engages every chip
        params = step_lib.replicate(mesh, jax.device_get(params))
    padded_bs = step_lib.eval_batch_pad(cfg.batch_size, mesh)

    def prep(batch):
        # host pad + async H2D dispatch; used through device_prefetch so
        # batch i+1's transfer overlaps batch i's inference (SURVEY P8)
        n = batch["sat"].shape[0]
        pad = padded_bs - n  # pad ragged/mesh-short batches (trimmed below)
        def p(x):
            if pad > 0:
                x = np.concatenate([x, np.repeat(x[-1:], pad, axis=0)])
            return jnp.asarray(x)
        keys = ["sat", "grd"] + (["camera_k"]
                                 if cfg.direction == "G2SP" else [])
        return batch, n, tuple(p(batch[k]) for k in keys)

    def run_batch(placed, i):
        batch, n, dev = placed
        rng = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
        return batch, n, eval_step(params, *dev, rng)

    # warm-up: compile + first dispatch outside the timing window
    for batch0 in loader:
        batch, _, (lat, _, _) = run_batch(prep(batch0), 0)
        np.asarray(lat)  # fence (device->host fetch; see CLAUDE.md)
        if cfg.visualize and cfg.direction == "S2GP":
            _visualize_batch(model, cfg, params, batch,
                             jax.random.PRNGKey(0),
                             traj_name=f"{split}_{epoch}",
                             feat_prefix=f"feat_{split}_e{epoch}")
        break

    preds_lat, preds_lon, preds_th = [], [], []
    gts = []
    t0 = time.time()
    n_images = 0
    for i, placed in enumerate(step_lib.device_prefetch(loader, prep)):
        batch, n, (lat, lon, th) = run_batch(placed, i)
        preds_lat.append(np.asarray(lat)[:n])
        preds_lon.append(np.asarray(lon)[:n])
        preds_th.append(np.asarray(th)[:n])
        gts.append(batch["gt_pose"])
        n_images += n
        if i % 20 == 0:
            print(i)
    # reference semantics are per IMAGE (train_kitti.py:74-75; it runs batch 1)
    duration = (time.time() - t0) / max(n_images, 1)

    gt = np.concatenate(gts)
    pred_shifts, pred_headings = denormalize(
        np.concatenate(preds_lat), np.concatenate(preds_lon),
        np.concatenate(preds_th), cfg.shift_range_lat, cfg.shift_range_lon,
        cfg.rotation_range)
    gt_shifts, gt_headings = denormalize(gt[:, 1], gt[:, 0], gt[:, 2],
                                         cfg.shift_range_lat,
                                         cfg.shift_range_lon,
                                         cfg.rotation_range)
    res = EvalResults(pred_shifts=pred_shifts, pred_headings=pred_headings,
                      gt_shifts=gt_shifts, gt_headings=gt_headings,
                      time_per_image=duration)
    m = res.compute()
    res.write(save_path, split.capitalize(), epoch)

    rank = m["rank_result"]
    if split == "test1" and rank > best_rank:
        save_params(save_path, "Model_best", params,
                    async_save=bool(cfg.async_ckpt))
    return rank


def train(model, cfg: Config, args, save_path: str):
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.train import step as step_lib
    from highlyaccurate_tpu.train.checkpoint import (epoch_ckpt_name,
                                                     load_params,
                                                     load_train_state,
                                                     save_params,
                                                     save_train_state)
    from highlyaccurate_tpu.train.state import create_train_state, reset_for_epoch

    mesh = step_lib.make_mesh_for_batch(cfg.batch_size)
    variables = init_model(cfg, model)
    params = variables["params"]
    if args.resume:
        params = load_params(save_path, epoch_ckpt_name(args.resume - 1), params)
        print(f"resume from {epoch_ckpt_name(args.resume - 1)}")
    elif getattr(args, "pretrained_vgg16", None):
        # reference from-scratch init: both branches start from ImageNet
        # VGG16 (reference VGG.py:20-28)
        from highlyaccurate_tpu.train.checkpoint import apply_vgg16_init
        params = apply_vgg16_init(params, args.pretrained_vgg16)
        print(f"encoder init from {args.pretrained_vgg16}")

    state = create_train_state(cfg, params)
    if args.resume and cfg.keep_optimizer_state:
        # resume with optimizer moments (the fix path; the reference loses
        # them — it rebuilds Adam every epoch anyway, SURVEY §5.4)
        try:
            state = load_train_state(save_path,
                                     epoch_ckpt_name(args.resume - 1), state)
            print("resumed optimizer state")
        except FileNotFoundError:
            print("no full-state checkpoint; resuming params only")
    state = step_lib.replicate(mesh, state)
    train_step = step_lib.make_train_step(model, cfg, mesh)
    # eval shards over ALL chips even when the train batch size keeps the
    # train mesh smaller (eval pads batches to a device multiple)
    eval_mesh = step_lib.make_mesh() if jax.device_count() > 1 else mesh
    eval_step = step_lib.make_eval_step(model, cfg, eval_mesh)

    best_rank = 0.0
    _prof = None
    for epoch in range(args.resume, cfg.epochs):
        state = reset_for_epoch(state, cfg, epoch)
        loader = make_loaders(cfg, args, "train")
        print("batch_size:", cfg.batch_size, "num batches:", len(loader))

        def _place(batch):
            # async shard_batch dispatch; device_prefetch keeps the next
            # batch's H2D copy in flight under the current step (SURVEY P8)
            return batch, step_lib.shard_batch(mesh, {
                "sat": batch["sat"], "grd": batch["grd"],
                "gt_pose": batch["gt_pose"],
                **({"camera_k": batch["camera_k"]}
                   if cfg.direction == "G2SP" else {})})

        for loop, (batch, b) in enumerate(
                step_lib.device_prefetch(loader, _place)):
            rng = jax.random.fold_in(
                jax.random.PRNGKey(args.seed), epoch * 100000 + loop)
            # device trace of steps 2-4 (steps 0/1 carry compiles; the
            # window still contains step-0/1 async work — acceptable)
            if args.profile_dir and epoch == args.resume and loop == 2:
                from highlyaccurate_tpu.utils.profiling import trace
                _prof = trace(args.profile_dir)
                _prof.__enter__()
            if cfg.direction == "G2SP":
                state, metrics = train_step(state, b["sat"], b["grd"],
                                            b["camera_k"], b["gt_pose"], rng)
            else:
                state, metrics = train_step(state, b["sat"], b["grd"],
                                            b["gt_pose"], rng)
            if cfg.visualize and loop % 100 == 0 and cfg.direction == "S2GP":
                # reference dumps trajectory plots AND per-level feature-PCA
                # RGBs under --visualize (models_kitti.py:1285-1293)
                _visualize_batch(model, cfg, state.params, batch, rng,
                                 traj_name=f"{epoch}_{loop}",
                                 feat_prefix=f"feat_e{epoch}_l{loop}",
                                 loop=loop)
            if _prof is not None and loop == 4:
                np.asarray(metrics["loss_last"])  # fence: capture real work
                _prof.__exit__(None, None, None)
                _prof = None
                print(f"profiler trace written to {args.profile_dir}")
            if loop % 10 == 9:
                lvl = cfg.n_levels - 1
                print(f"Epoch: {epoch} Loop: {loop} Delta: Level-{lvl}"
                      f" loss: {np.round(float(metrics['loss_decrease'][lvl]), 4)}"
                      f" lat: {np.round(float(metrics['shift_lat_decrease'][lvl]), 2)}"
                      f" lon: {np.round(float(metrics['shift_lon_decrease'][lvl]), 2)}"
                      f" rot: {np.round(float(metrics['thetas_decrease'][lvl]), 2)}")
                print(f"Epoch: {epoch} Loop: {loop} Last: Level-{lvl}"
                      f" loss: {np.round(float(metrics['loss_last'][lvl]), 4)}"
                      f" lat: {np.round(float(metrics['shift_lat_last'][lvl]), 2)}"
                      f" lon: {np.round(float(metrics['shift_lon_last'][lvl]), 2)}"
                      f" rot: {np.round(float(metrics['theta_last'][lvl]), 2)}")

        if _prof is not None:  # first epoch ended before step 4
            np.asarray(metrics["loss_last"])
            _prof.__exit__(None, None, None)
            _prof = None
            print(f"profiler trace written to {args.profile_dir} "
                  "(short epoch: fewer than 5 batches)")
        print("taking snapshot ...")
        save_params(save_path, epoch_ckpt_name(epoch),
                    jax.device_get(state.params),
                    async_save=bool(cfg.async_ckpt))
        if cfg.keep_optimizer_state:
            save_train_state(save_path, epoch_ckpt_name(epoch), state,
                             async_save=bool(cfg.async_ckpt))
        cur = evaluate(model, cfg, state.params, args, "test1", save_path,
                       epoch, best_rank, eval_step, eval_mesh)
        best_rank = max(best_rank, cur)
        evaluate(model, cfg, state.params, args, "test2", save_path, epoch,
                 best_rank, eval_step, eval_mesh)
    from highlyaccurate_tpu.train.checkpoint import wait_for_async_saves
    wait_for_async_saves()
    print("Finished Training")


def main(argv=None):
    args = parse_args(argv)
    np.random.seed(args.seed)
    if args.use_banded_warp is None and args.test and args.import_pth:
        # resolution itself lives in config_from_args; just surface it
        print("note: --import_pth defaults to the reference-faithful "
              "gather sampler (--use_banded_warp 0); pass "
              "--use_banded_warp 1 to opt into the banded kernel "
              "(see PERF.md recall study)")
    cfg = config_from_args(args)
    save_path = cfg.save_path(args.save_root)
    os.makedirs(save_path, exist_ok=True)
    print("save_path:", save_path)

    model = build_model(cfg)

    if args.test:
        from highlyaccurate_tpu.train.checkpoint import (epoch_ckpt_name,
                                                         import_pth, load_params)
        variables = init_model(cfg, model)
        params = variables["params"]
        if args.import_pth:
            params = import_pth(args.import_pth, cfg)
            if cfg.use_banded_warp:
                # PERF.md recall study: sampler-path train/eval consistency
                # dominates recall; reference checkpoints were trained
                # through torch's gather-equivalent sampler.
                print("note: evaluating an imported reference checkpoint "
                      "with the banded sampler; the faithful path for "
                      "torch-trained weights is --use_banded_warp 0 "
                      "(see PERF.md recall study)")
        else:
            # reference quirk: --test 1 loads model_1.pth (train_kitti.py:546)
            params = load_params(save_path, "model_1", params)
        evaluate(model, cfg, params, args, "test1", save_path, 0, 1e9)
        evaluate(model, cfg, params, args, "test2", save_path, 0, 1e9)
    else:
        train(model, cfg, args, save_path)


if __name__ == "__main__":
    main()
