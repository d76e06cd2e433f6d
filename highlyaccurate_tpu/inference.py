"""Serving API: load a checkpoint, predict metric poses.

The CLIs (cli/train_kitti.py, cli/train_ford.py) reproduce the reference's
experiment drivers; this module is the production-facing surface for users
embedding the localizer in a system: one object that owns the jitted
program, pads ragged batches to a fixed compiled batch size, and converts
the normalized pose to meters/degrees.

    loc = Localizer(Config(level=3, N_iters=5), save_path="...")   # orbax
    # or Localizer(cfg, pth_path="model_1.pth")  (reference checkpoint)
    out = loc.predict(sat_imgs, grd_imgs)   # numpy [N,A,A,3], [N,H,W,3]
    out["lateral_m"], out["longitudinal_m"], out["heading_deg"]     # [N]

Ford-AV (cam->body->world->sat chain; reference models_ford.py:21-1036):
pass the camera extrinsics from the calibration YAML and the satellite
patch's metric side length —

    loc = Localizer(cfg, pth_path="...", ford_extrinsics=(R_FL, T_FL),
                    ford_side_m=512 * 0.22)
    out = loc.predict(sat_imgs, grd_imgs)          # constructor extrinsics
    out = loc.predict(sat_imgs, grd_imgs, R_FL=R_per_image, T_FL=T_per_image)

Multi-chip: pass ``mesh=make_mesh(jax.devices())`` to shard the batch over
the data axis (same path as the CLIs; see train/step.py).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from highlyaccurate_tpu.config import Config


class Localizer:
    """Batched pose-estimation frontend over the flagship models."""

    def __init__(self, cfg: Config, params=None, save_path: Optional[str] = None,
                 ckpt_name: str = "Model_best", pth_path: Optional[str] = None,
                 batch_size: int = 8, mesh=None, seed: int = 0,
                 random_init: bool = False, ford_extrinsics=None,
                 ford_side_m: Optional[float] = None):
        import jax
        import jax.numpy as jnp

        from highlyaccurate_tpu.train import step as step_lib

        if cfg.direction != "S2GP":
            raise ValueError("Localizer serves the flagship S2GP models; "
                             "use the CLIs for G2SP experiments")
        ford = ford_side_m is not None or ford_extrinsics is not None
        if ford and (ford_side_m is None or ford_extrinsics is None):
            raise ValueError("Ford serving needs BOTH ford_extrinsics="
                             "(R_FL [3,3], T_FL [3]) and ford_side_m= "
                             "(satellite patch side length in meters)")
        if params is None and save_path is None and pth_path is None \
                and not random_init:
            raise ValueError(
                "no weight source: pass params=, save_path= (orbax) or "
                "pth_path= (reference checkpoint) — or random_init=True to "
                "explicitly serve untrained weights (tests only)")
        self.cfg = cfg
        self.batch_size = batch_size
        self._jnp = jnp
        self._jax = jax
        self._ford_side_m = ford_side_m
        if ford:
            R_FL, T_FL = ford_extrinsics
            self._ford_R = np.asarray(R_FL, np.float32).reshape(3, 3)
            self._ford_T = np.asarray(T_FL, np.float32).reshape(3)
            from highlyaccurate_tpu.models.ford import LMS2GPFord
            self.model = LMS2GPFord(cfg=cfg)
        else:
            self._ford_R = self._ford_T = None
            from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
            self.model = LMS2GP(cfg=cfg)

        if params is None:
            if pth_path is not None:
                # the importer builds params from scratch — no init template
                # (and no solver compile) needed
                from highlyaccurate_tpu.train.checkpoint import import_pth
                params = import_pth(pth_path, cfg)
            elif save_path is not None:
                # orbax restore template via abstract init: eval_shape only
                # traces — the multi-round LM solver is never compiled or
                # executed just to obtain the params pytree
                def _init(s, g):
                    rngs = {"params": jax.random.PRNGKey(0),
                            "lm": jax.random.PRNGKey(1)}
                    if ford:
                        return self.model.init(
                            rngs, s, g, ford_side_m,
                            jnp.asarray(self._ford_R)[None],
                            jnp.asarray(self._ford_T)[None],
                            jnp.zeros((1, 3)), mode="train")
                    return self.model.init(
                        rngs, s, g, jnp.zeros((1, 3)), mode="train")
                variables = jax.eval_shape(
                    _init,
                    jax.ShapeDtypeStruct((1, cfg.sat_size, cfg.sat_size, 3),
                                         jnp.float32),
                    jax.ShapeDtypeStruct((1, cfg.grd_h, cfg.grd_w, 3),
                                         jnp.float32))
                from highlyaccurate_tpu.train.checkpoint import load_params
                params = load_params(save_path, ckpt_name,
                                     variables["params"])
            else:  # random_init
                rng = np.random.RandomState(0)
                sat = jnp.asarray(rng.rand(1, cfg.sat_size, cfg.sat_size, 3)
                                  .astype(np.float32))
                grd = jnp.asarray(rng.rand(1, cfg.grd_h, cfg.grd_w, 3)
                                  .astype(np.float32))
                rngs = {"params": jax.random.PRNGKey(0),
                        "lm": jax.random.PRNGKey(1)}
                if ford:
                    variables = self.model.init(
                        rngs, sat, grd, ford_side_m,
                        jnp.asarray(self._ford_R)[None],
                        jnp.asarray(self._ford_T)[None],
                        jnp.zeros((1, 3)), mode="train")
                else:
                    variables = self.model.init(
                        rngs, sat, grd, jnp.zeros((1, 3)), mode="train")
                params = variables["params"]
        self.params = params
        if mesh is not None:
            self.params = step_lib.replicate(mesh, self.params)
        self._mesh = mesh
        self._step = step_lib.make_eval_step(self.model, cfg, mesh,
                                             ford_side_m=ford_side_m)
        self._key = jax.random.PRNGKey(seed)

    def predict(self, sat_imgs, grd_imgs, R_FL=None, T_FL=None) -> dict:
        """sat_imgs [N, A, A, 3], grd_imgs [N, H, W, 3] (float in [0,1] or
        uint8).  Returns numpy arrays of metric poses:
        {"lateral_m", "longitudinal_m", "heading_deg"} each [N] —
        denormalized exactly as the reference eval does
        (reference train_kitti.py:77-80).

        Ford only: ``R_FL`` [N, 3, 3] / ``T_FL`` [N, 3] override the
        constructor extrinsics per image (e.g. mixed camera rigs)."""
        jnp = self._jnp
        jax = self._jax
        cfg = self.cfg
        ford = self._ford_side_m is not None
        if (R_FL is not None or T_FL is not None) and not ford:
            raise ValueError("R_FL/T_FL are Ford-chain extrinsics; this "
                             "Localizer was built for KITTI S2GP")

        sat = np.asarray(sat_imgs)
        grd = np.asarray(grd_imgs)
        if sat.dtype == np.uint8:
            sat = sat.astype(np.float32) / 255.0
        if grd.dtype == np.uint8:
            grd = grd.astype(np.float32) / 255.0
        n = sat.shape[0]
        if n == 0:
            empty = np.zeros((0,), np.float32)
            return {"lateral_m": empty, "longitudinal_m": empty,
                    "heading_deg": empty}
        if ford:
            R = (np.asarray(R_FL, np.float32) if R_FL is not None
                 else np.broadcast_to(self._ford_R, (n, 3, 3)))
            T = (np.asarray(T_FL, np.float32) if T_FL is not None
                 else np.broadcast_to(self._ford_T, (n, 3)))

        lats, lons, ths = [], [], []
        bs = self.batch_size
        for i in range(0, n, bs):
            sb, gb = sat[i:i + bs], grd[i:i + bs]
            pad = bs - sb.shape[0]
            if pad:  # pad the ragged tail to the compiled batch size
                sb = np.concatenate([sb, np.repeat(sb[-1:], pad, 0)])
                gb = np.concatenate([gb, np.repeat(gb[-1:], pad, 0)])
            self._key, sub = jax.random.split(self._key)
            if ford:
                Rb, Tb = R[i:i + bs], T[i:i + bs]
                if pad:
                    Rb = np.concatenate([Rb, np.repeat(Rb[-1:], pad, 0)])
                    Tb = np.concatenate([Tb, np.repeat(Tb[-1:], pad, 0)])
                lat, lon, th = self._step(self.params, jnp.asarray(sb),
                                          jnp.asarray(gb), jnp.asarray(Rb),
                                          jnp.asarray(Tb), sub)
            else:
                lat, lon, th = self._step(self.params, jnp.asarray(sb),
                                          jnp.asarray(gb), sub)
            k = bs - pad
            lats.append(np.asarray(lat)[:k])
            lons.append(np.asarray(lon)[:k])
            ths.append(np.asarray(th)[:k])

        lat = np.concatenate(lats)
        lon = np.concatenate(lons)
        th = np.concatenate(ths)
        return {
            "lateral_m": lat * cfg.shift_range_lat,
            "longitudinal_m": lon * cfg.shift_range_lon,
            "heading_deg": th * cfg.rotation_range,
        }
