"""Ford-AV train/eval CLI — flag-compatible with the reference driver.

Reference: /root/reference/train_ford.py (flags :343-412, save-path :415-455,
per-log training :190-340, eval :39-186).

Ford specifics preserved: per-log training via --train_log_start/end, eval
seeds np/torch with 2022 before building the test set (:44-46 — here the
fixed perturbations live in the test split file so seeding is moot), the
best-model criterion dist<5m & angle<1deg, and per-log results files.
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
    p.add_argument("--resume", type=int, default=0)
    p.add_argument("--test", type=int, default=0)
    p.add_argument("--debug", type=int, default=0)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--lr", type=float, default=1e-4)
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
    p.add_argument("--batch_size", type=int, default=3)
    p.add_argument("--loss_method", type=int, default=0)
    p.add_argument("--level", type=int, default=3)
    p.add_argument("--N_iters", type=int, default=5)
    p.add_argument("--using_weight", type=int, default=0)
    p.add_argument("--damping", type=float, default=0.1)
    p.add_argument("--train_damping", type=int, default=0)
    p.add_argument("--direction", type=str, default="S2GP")
    p.add_argument("--Optimizer", type=str, default="LM")
    p.add_argument("--level_first", type=int, default=0)
    p.add_argument("--proj", type=str, default="geo")
    p.add_argument("--estimate_depth", type=int, default=0)
    p.add_argument("--dropout", type=int, default=0)
    p.add_argument("--use_hessian", type=int, default=0)
    p.add_argument("--visualize", type=int, default=0)
    p.add_argument("--train_log_start", type=int, default=0)
    p.add_argument("--train_log_end", type=int, default=1)
    p.add_argument("--test_log_ind", type=int, default=0)
    p.add_argument("--train_whole", type=int, default=0)
    p.add_argument("--test_whole", type=int, default=0)
    # TPU-framework flags
    p.add_argument("--dataset_root", type=str, default=None)
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--import_pth", type=str, default=None)
    p.add_argument("--save_root", type=str, default=".")
    p.add_argument("--keep_optimizer_state", type=int, default=0)
    p.add_argument("--seed", type=int, default=2022)
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
    # batches are produced by _batches() with the Ford collate; Loader here
    # only carries batch-size/shuffle bookkeeping
    loader = Loader(ds, cfg.batch_size, shuffle=(split == "train"
                                                 and not cfg.visualize))
    return ds, loader


def _batches(ds, loader):
    """Iterate Ford batches (Loader's default collate is KITTI-shaped)."""
    from highlyaccurate_tpu.data.ford import collate_ford
    order = np.arange(len(ds))
    if loader.shuffle:
        np.random.RandomState(loader.seed + loader._epoch).shuffle(order)
    loader._epoch += 1
    bs = loader.bs
    for i in range(0, len(order), bs):
        yield collate_ford([ds[int(j)] for j in order[i:i + bs]])


def evaluate(model, cfg: Config, params, args, save_path: str, epoch: int,
             best_rank: float):
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.train.checkpoint import save_params

    np.random.seed(2022)  # reference parity (train_ford.py:44-46)
    ds, loader = make_loader(cfg, args, "test")
    side_m = ds.satmap_sidelength_meters

    @jax.jit
    def eval_step(params, sat, grd, R, T, rng):
        return model.apply({"params": params}, sat, grd, side_m, R, T,
                           mode="test", rngs={"lm": rng})

    pu, pv, pt, gts = [], [], [], []
    t0 = time.time()
    n_batches = 0
    for i, batch in enumerate(_batches(ds, loader)):
        u, v, th = eval_step(params, jnp.asarray(batch["sat"]),
                             jnp.asarray(batch["grd"]),
                             jnp.asarray(batch["R_FL"]),
                             jnp.asarray(batch["T_FL"]),
                             jax.random.fold_in(jax.random.PRNGKey(2022), i))
        pu.append(np.asarray(u))
        pv.append(np.asarray(v))
        pt.append(np.asarray(th))
        gts.append(batch["gt_pose"])
        n_batches += 1
        if i % 20 == 0:
            print(i)
    duration = (time.time() - t0) / max(n_batches, 1)

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
        save_params(save_path, "Model_best", params)
    return rank


def train(model, cfg: Config, args, save_path: str):
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.train import step as step_lib
    from highlyaccurate_tpu.train.checkpoint import (epoch_ckpt_name,
                                                     load_params, save_params)
    from highlyaccurate_tpu.train.state import create_train_state, reset_for_epoch

    ds, loader = make_loader(cfg, args, "train")
    side_m = ds.satmap_sidelength_meters
    sample = ds[0]
    sat0 = jnp.asarray(sample.sat[None])
    grd0 = jnp.asarray(sample.grd[None])
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "lm": jax.random.PRNGKey(1)},
                           sat0, grd0, side_m,
                           jnp.asarray(sample.R_FL[None]),
                           jnp.asarray(sample.T_FL[None]),
                           jnp.zeros((1, 3)), mode="train")
    params = variables["params"]
    if args.resume:
        params = load_params(save_path, epoch_ckpt_name(args.resume - 1), params)

    state = create_train_state(cfg, params)

    @jax.jit
    def train_step(state, sat, grd, R, T, gt, rng):
        def loss_fn(p):
            out = model.apply({"params": p}, sat, grd, side_m, R, T, gt,
                              mode="train", rngs={"lm": rng})
            return out.loss, out
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss, "loss_last": out.loss_last,
                           "lat": out.shift_lat_last, "lon": out.shift_lon_last,
                           "rot": out.theta_last}

    best_rank = 0.0
    for epoch in range(args.resume, cfg.epochs):
        state = reset_for_epoch(state, cfg, epoch)
        for loop, batch in enumerate(_batches(ds, loader)):
            rng = jax.random.fold_in(jax.random.PRNGKey(args.seed),
                                     epoch * 100000 + loop)
            state, metrics = train_step(
                state, jnp.asarray(batch["sat"]), jnp.asarray(batch["grd"]),
                jnp.asarray(batch["R_FL"]), jnp.asarray(batch["T_FL"]),
                jnp.asarray(batch["gt_pose"]), rng)
            if loop % 10 == 9:
                lvl = cfg.n_levels - 1
                print(f"Epoch: {epoch} Loop: {loop}"
                      f" loss: {float(metrics['loss']):.4f}"
                      f" lat: {float(metrics['lat'][lvl]):.2f}"
                      f" lon: {float(metrics['lon'][lvl]):.2f}"
                      f" rot: {float(metrics['rot'][lvl]):.2f}")
        print("taking snapshot ...")
        save_params(save_path, epoch_ckpt_name(epoch),
                    jax.device_get(state.params))
        best_rank = max(best_rank, evaluate(model, cfg, state.params, args,
                                            save_path, epoch, best_rank))
    print("Finished Training")


def main(argv=None):
    args = parse_args(argv)
    np.random.seed(args.seed)
    cfg = config_from_args(args)
    save_path = cfg.save_path_ford(args.save_root)
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
        train(model, cfg, args, save_path)


if __name__ == "__main__":
    main()
