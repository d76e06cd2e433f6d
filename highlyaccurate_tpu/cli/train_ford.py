"""Ford-AV train/eval CLI — flag-compatible with the reference driver.

Reference: /root/reference/train_ford.py (flags :343-412, save-path :415-455,
per-log training :190-340, eval :39-186).

Ford specifics preserved: per-log training via --train_log_start/end, eval
seeds np/torch with 2022 before building the test set (:44-46 — here the
fixed perturbations live in the test split file so seeding is moot), the
best-model criterion dist<5m & angle<1deg, per-log results files, and the
``--transformer`` frozen-backbone partial restore (:499-511; the upstream
transformer block itself is dead code, models_ford.py:94-101 — only the
restore/freeze mechanics are live).

TPU-native: the same mesh-sharded jitted train/eval steps as the KITTI CLI
(train/step.py) and the thread-pool prefetch loader.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from highlyaccurate_tpu.config import Config, config_from_args
from highlyaccurate_tpu.eval.metrics import EvalResults, denormalize, write_ford


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    # reference flags (train_ford.py:343-412)
    p.add_argument("--resume", type=int, default=0)
    p.add_argument("--test", type=int, default=0)
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
    p.add_argument("--train_log_start", type=int, default=0)
    p.add_argument("--train_log_end", type=int, default=1)
    p.add_argument("--test_log_ind", type=int, default=0)
    p.add_argument("--transformer", type=int, default=0)
    p.add_argument("--estimate_depth", type=int, default=0)
    p.add_argument("--level_first", type=int, default=0)
    p.add_argument("--proj", type=str, default="geo")
    p.add_argument("--use_gt_depth", type=int, default=0)
    p.add_argument("--dropout", type=int, default=0)
    p.add_argument("--use_hessian", type=int, default=0)
    p.add_argument("--visualize", type=int, default=0)
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.999)
    p.add_argument("--train_whole", type=int, default=0)
    p.add_argument("--test_whole", type=int, default=0)
    # TPU-framework flags
    p.add_argument("--dataset_root", type=str, default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--import_pth", type=str, default=None)
    p.add_argument("--use_banded_warp", type=int, default=None,
                   help="Pallas banded sampler (0 = exact gather-path "
                        "numerics). Default 1, except when evaluating "
                        "--import_pth checkpoints (0: reference weights "
                        "were trained through the gather-equivalent "
                        "sampler — see PERF.md recall study)")
    p.add_argument("--save_root", type=str, default=".")
    p.add_argument("--compute_dtype", type=str, default=None,
                   help="feature compute dtype. Default: bfloat16 for "
                        "--test 1 on natively-trained checkpoints (recall-"
                        "neutral, PERF.md study), float32 for training and "
                        "for --import_pth eval (strict reference numerics)")
    p.add_argument("--pretrained_vgg16", type=str, default=None,
                   help="torchvision VGG16 ImageNet .pth: initialize both "
                        "encoder branches like the reference (VGG.py:20)")
    p.add_argument("--keep_optimizer_state", type=int, default=0)
    p.add_argument("--pose_hypotheses", type=int, default=1,
                   help="multi-start LM at eval: N initial poses per "
                        "sample, best residual wins (NEW capability)")
    p.add_argument("--profile_dir", type=str, default="",
                   help="capture a jax.profiler device trace of train "
                        "steps 2-4 of the first epoch into this directory "
                        "(TensorBoard/Perfetto-loadable)")
    p.add_argument("--async_ckpt", type=int, default=1,
                   help="epoch checkpoints write on orbax's "
                        "background thread, overlapping the "
                        "following eval (0 = synchronous)")
    p.add_argument("--seed", type=int, default=2022)
    p.add_argument("--grd_h", type=int, default=256)
    p.add_argument("--grd_w", type=int, default=1024)
    p.add_argument("--sat_size", type=int, default=512)
    return p.parse_args(argv)


def make_loader(cfg: Config, args, split: str):
    from highlyaccurate_tpu.data.ford import (FordDataset, SyntheticFord,
                                              TEST_LOGS, TEST_LOGS_IMG_INDS,
                                              TRAIN_LOGS, TRAIN_LOGS_IMG_INDS,
                                              collate_ford)
    from highlyaccurate_tpu.data.kitti import Loader
    if args.synthetic:
        ds = SyntheticFord(n=args.synthetic, grd_h=cfg.grd_h, grd_w=cfg.grd_w,
                           sat_size=cfg.sat_size,
                           seed={"train": 0, "test": 1}[split])
    elif split == "train":
        s, e = args.train_log_start, args.train_log_end
        ds = FordDataset(cfg.dataset_root, "train", TRAIN_LOGS[s:e],
                         TRAIN_LOGS_IMG_INDS[s:e],
                         shift_range_lat=cfg.shift_range_lat,
                         shift_range_lon=cfg.shift_range_lon,
                         rotation_range=cfg.rotation_range,
                         whole=bool(args.train_whole),
                         grd_h=cfg.grd_h, grd_w=cfg.grd_w)
    else:
        i = args.test_log_ind
        ds = FordDataset(cfg.dataset_root, "test", TEST_LOGS[i:i + 1],
                         TEST_LOGS_IMG_INDS[i:i + 1],
                         shift_range_lat=cfg.shift_range_lat,
                         shift_range_lon=cfg.shift_range_lon,
                         rotation_range=cfg.rotation_range,
                         whole=bool(args.test_whole),
                         grd_h=cfg.grd_h, grd_w=cfg.grd_w)
    loader = Loader(ds, cfg.batch_size,
                    shuffle=(split == "train" and not cfg.visualize),
                    drop_last=(split == "train"), collate_fn=collate_ford)
    return ds, loader


def _visualize_batch(model, cfg: Config, params, batch, side_m, rng,
                     traj_name: str, feat_prefix: str, loop: int = 0):
    """``--visualize``: trajectory plot + per-level feature-PCA RGBs for the
    first sample of a batch (reference Ford plots:
    /root/reference/visualize_utils.py:173-239 RGB_iterative_pose_ford +
    the models_ford feature-PCA debug dumps).  Shared by train/evaluate."""
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.viz.visualize import (features_to_rgb,
                                                  pose_trajectory_plot)
    params_h = jax.device_get(params)
    args1 = (jnp.asarray(batch["sat"][:1]), jnp.asarray(batch["grd"][:1]),
             side_m, jnp.asarray(batch["R_FL"][:1]),
             jnp.asarray(batch["T_FL"][:1]))
    lats, lons, ths = model.apply({"params": params_h}, *args1,
                                  mode="trajectory", rngs={"lm": rng})
    save_dir = f"./visualize_ford_rot{cfg.rotation_range}"
    # Ford pose is [B,3] = (shift_u=lat, shift_v=lon, heading)
    # (models_ford.py:823-824); the plotter expects (lon, lat, heading)
    gt = np.asarray(batch["gt_pose"])
    gt_plot = np.stack([gt[:, 1], gt[:, 0], gt[:, 2]], -1)
    pose_trajectory_plot(
        batch["sat"][0], np.asarray(lats), np.asarray(lons), np.asarray(ths),
        gt_plot, side_m / cfg.sat_size, cfg.shift_range_lat,
        cfg.shift_range_lon, cfg.rotation_range,
        os.path.join(save_dir, f"traj_{traj_name}.png"))
    pred = jnp.asarray(np.stack([np.asarray(lats)[:, -1, -1],
                                 np.asarray(lons)[:, -1, -1],
                                 np.asarray(ths)[:, -1, -1]], -1))
    per_level = model.apply({"params": params_h}, *args1, pred,
                            jnp.asarray(gt[:1]), method="project_at_pose")
    for lvl, maps in enumerate(per_level):
        features_to_rgb([np.asarray(m) for m in maps], save_dir,
                        prefix=f"{feat_prefix}_L{lvl}", loop=loop)


def evaluate(model, cfg: Config, params, args, save_path: str, epoch: int,
             best_rank: float, eval_step=None, mesh=None, side_m=None):
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.train import step as step_lib
    from highlyaccurate_tpu.train.checkpoint import save_params

    np.random.seed(2022)  # reference parity (train_ford.py:44-46)
    ds, loader = make_loader(cfg, args, "test")
    if side_m is None:
        side_m = ds.satmap_sidelength_meters
    if eval_step is None:
        if mesh is None and jax.device_count() > 1:
            mesh = step_lib.make_mesh()
        eval_step = step_lib.make_eval_step(model, cfg, mesh,
                                            ford_side_m=side_m)
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

        return batch, n, tuple(p(batch[k])
                               for k in ("sat", "grd", "R_FL", "T_FL"))

    def run_batch(placed, i):
        batch, n, dev = placed
        return batch, n, eval_step(
            params, *dev, jax.random.fold_in(jax.random.PRNGKey(2022), i))

    # warm-up: compile + first dispatch outside the timing window
    # (time_per_image must measure steady-state inference, not jit compile)
    for batch0 in loader:
        batch, _, (u, _, _) = run_batch(prep(batch0), 0)
        np.asarray(u)  # fence (device->host fetch; see CLAUDE.md)
        if cfg.visualize:
            _visualize_batch(model, cfg, params, batch, side_m,
                             jax.random.PRNGKey(2022),
                             traj_name=f"test_log{args.test_log_ind}_e{epoch}",
                             feat_prefix=f"feat_test_e{epoch}")
        break

    pu, pv, pt, gts = [], [], [], []
    t0 = time.time()
    n_images = 0
    for i, placed in enumerate(step_lib.device_prefetch(loader, prep)):
        batch, n, (u, v, th) = run_batch(placed, i)
        pu.append(np.asarray(u)[:n])
        pv.append(np.asarray(v)[:n])
        pt.append(np.asarray(th)[:n])
        gts.append(batch["gt_pose"])
        n_images += n
        if i % 20 == 0:
            print(i)
    duration = (time.time() - t0) / max(n_images, 1)

    gt = np.concatenate(gts)
    pred_shifts, pred_headings = denormalize(
        np.concatenate(pu), np.concatenate(pv), np.concatenate(pt),
        cfg.shift_range_lat, cfg.shift_range_lon, cfg.rotation_range)
    gt_shifts, gt_headings = denormalize(gt[:, 0], gt[:, 1], gt[:, 2],
                                         cfg.shift_range_lat,
                                         cfg.shift_range_lon,
                                         cfg.rotation_range)
    res = EvalResults(pred_shifts, pred_headings, gt_shifts, gt_headings,
                      time_per_image=duration)
    rank = write_ford(res, save_path, args.test_log_ind, epoch)
    if rank > best_rank:
        save_params(save_path, "Model_best", params,
                    async_save=bool(cfg.async_ckpt))
    return rank


def train(model, cfg: Config, args, save_path: str, restore_path=None):
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.train import step as step_lib
    from highlyaccurate_tpu.train.checkpoint import (epoch_ckpt_name,
                                                     load_params,
                                                     load_train_state,
                                                     save_params,
                                                     save_train_state)
    from highlyaccurate_tpu.train.state import create_train_state, reset_for_epoch

    ds, loader = make_loader(cfg, args, "train")
    side_m = ds.satmap_sidelength_meters
    sample = ds[0]
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "lm": jax.random.PRNGKey(1)},
                           jnp.asarray(sample.sat[None]),
                           jnp.asarray(sample.grd[None]), side_m,
                           jnp.asarray(sample.R_FL[None]),
                           jnp.asarray(sample.T_FL[None]),
                           jnp.zeros((1, 3)), mode="train")
    params = variables["params"]
    freeze = False
    if args.resume:
        params = load_params(save_path, epoch_ckpt_name(args.resume - 1), params)
    elif getattr(args, "pretrained_vgg16", None):
        # reference from-scratch init: both branches start from ImageNet
        # VGG16 (reference VGG.py:20-28)
        from highlyaccurate_tpu.train.checkpoint import apply_vgg16_init
        params = apply_vgg16_init(params, args.pretrained_vgg16)
        print(f"encoder init from {args.pretrained_vgg16}")
    elif restore_path is not None:
        # frozen-backbone partial restore (reference train_ford.py:499-511)
        params = load_params(restore_path, "Model_best", params)
        freeze = True
        print("Restore model from", restore_path, "done ... (backbones frozen)")

    mesh = step_lib.make_mesh_for_batch(cfg.batch_size)
    state = create_train_state(cfg, params)
    if args.resume and cfg.keep_optimizer_state:
        try:
            state = load_train_state(save_path,
                                     epoch_ckpt_name(args.resume - 1), state)
            print("resumed optimizer state")
        except FileNotFoundError:
            print("no full-state checkpoint; resuming params only")
    state = step_lib.replicate(mesh, state)
    train_step = step_lib.make_train_step(model, cfg, mesh, ford_side_m=side_m,
                                          freeze_backbones=freeze)
    # eval shards over ALL chips even when the train batch size keeps the
    # train mesh smaller (eval pads batches to a device multiple)
    eval_mesh = step_lib.make_mesh() if jax.device_count() > 1 else mesh
    eval_step = step_lib.make_eval_step(model, cfg, eval_mesh,
                                        ford_side_m=side_m)

    best_rank = 0.0
    _prof = None
    for epoch in range(args.resume, cfg.epochs):
        state = reset_for_epoch(state, cfg, epoch)

        def _place(batch):
            # async shard_batch dispatch; device_prefetch keeps the next
            # batch's H2D copy in flight under the current step (SURVEY P8)
            return batch, step_lib.shard_batch(mesh, {
                "sat": batch["sat"], "grd": batch["grd"],
                "R_FL": batch["R_FL"], "T_FL": batch["T_FL"],
                "gt_pose": batch["gt_pose"]})

        for loop, (batch, b) in enumerate(
                step_lib.device_prefetch(loader, _place)):
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed),
                                     epoch * 100000 + loop)
            # device trace of steps 2-4 (steps 0/1 carry compiles; the
            # window still contains step-0/1 async work — acceptable)
            if args.profile_dir and epoch == args.resume and loop == 2:
                from highlyaccurate_tpu.utils.profiling import trace
                _prof = trace(args.profile_dir)
                _prof.__enter__()
            state, metrics = train_step(state, b["sat"], b["grd"], b["R_FL"],
                                        b["T_FL"], b["gt_pose"], rng)
            if cfg.visualize and loop % 100 == 0:
                # reference dumps trajectory plots AND per-level feature-PCA
                # RGBs under --visualize (visualize_utils.py:173-239)
                _visualize_batch(model, cfg, state.params, batch, side_m, rng,
                                 traj_name=f"{epoch}_{loop}",
                                 feat_prefix=f"feat_e{epoch}_l{loop}",
                                 loop=loop)
            if _prof is not None and loop == 4:
                np.asarray(metrics["loss"])  # fence: capture real work
                _prof.__exit__(None, None, None)
                _prof = None
                print(f"profiler trace written to {args.profile_dir}")
            if loop % 10 == 9:
                lvl = cfg.n_levels - 1
                print(f"Epoch: {epoch} Loop: {loop}"
                      f" loss: {float(metrics['loss']):.4f}"
                      f" lat: {float(metrics['shift_lat_last'][lvl]):.2f}"
                      f" lon: {float(metrics['shift_lon_last'][lvl]):.2f}"
                      f" rot: {float(metrics['theta_last'][lvl]):.2f}")
        if _prof is not None:  # first epoch ended before step 4
            np.asarray(metrics["loss"])
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
        best_rank = max(best_rank, evaluate(model, cfg, state.params, args,
                                            save_path, epoch, best_rank,
                                            eval_step, eval_mesh, side_m))
    from highlyaccurate_tpu.train.checkpoint import wait_for_async_saves
    wait_for_async_saves()
    print("Finished Training")


def main(argv=None):
    args = parse_args(argv)
    np.random.seed(args.seed)
    if args.use_banded_warp is None and args.test and args.import_pth:
        # resolution lives in config_from_args; just surface it
        print("note: --import_pth defaults to the reference-faithful "
              "gather sampler (--use_banded_warp 0); pass "
              "--use_banded_warp 1 to opt into the banded kernel "
              "(see PERF.md recall study)")
    cfg = config_from_args(args)
    restore_path, save_path = cfg.ford_paths(args.save_root)
    os.makedirs(save_path, exist_ok=True)
    print("save_path:", save_path)

    from highlyaccurate_tpu.models.ford import LMS2GPFord
    model = LMS2GPFord(cfg=cfg)

    if args.test:
        import jax
        import jax.numpy as jnp
        from highlyaccurate_tpu.train.checkpoint import import_pth, load_params
        ds, _ = make_loader(cfg, args, "test")
        sample = ds[0]
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "lm": jax.random.PRNGKey(1)},
                               jnp.asarray(sample.sat[None]),
                               jnp.asarray(sample.grd[None]),
                               ds.satmap_sidelength_meters,
                               jnp.asarray(sample.R_FL[None]),
                               jnp.asarray(sample.T_FL[None]),
                               jnp.zeros((1, 3)), mode="train")
        params = variables["params"]
        if args.import_pth:
            params = import_pth(args.import_pth, cfg)
        else:
            params = load_params(save_path, "Model_best", params)
        evaluate(model, cfg, params, args, save_path, 0, 1e9)
    else:
        train(model, cfg, args, save_path, restore_path=restore_path)


if __name__ == "__main__":
    main()
