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

G2SP (ground->satellite projection; reference models_kitti.py:22-595):
build with ``Config(direction="G2SP")`` and provide camera intrinsics
(scaled to the network input size, as the KITTI loader emits them) at
construction or per call —

    loc = Localizer(Config(direction="G2SP"), pth_path="...", camera_k=K)
    out = loc.predict(sat_imgs, grd_imgs)                 # constructor K
    out = loc.predict(sat_imgs, grd_imgs, camera_k=K_per_image)

Ford-AV (cam->body->world->sat chain; reference models_ford.py:21-1036):
pass the camera extrinsics from the calibration YAML and the satellite
patch's metric side length —

    loc = Localizer(cfg, pth_path="...", ford_extrinsics=(R_FL, T_FL),
                    ford_side_m=512 * 0.22)
    out = loc.predict(sat_imgs, grd_imgs)          # constructor extrinsics
    out = loc.predict(sat_imgs, grd_imgs, R_FL=R_per_image, T_FL=T_per_image)

Multi-chip: pass ``mesh=make_mesh(jax.devices())`` to shard the batch over
the data axis (same path as the CLIs; see train/step.py).

Deployment (ahead-of-time): ``loc.export(path)`` serializes the traced
inference program — weights baked in as StableHLO constants — into one
self-contained artifact; ``ExportedLocalizer(path)`` serves it without the
model code, flax, or the checkpoint (jax.export; the reference has no
deployment story — its eval loop unpickles the full nn.Module each run):

    loc.export("/models/kitti_s2gp.halexp")
    srv = ExportedLocalizer("/models/kitti_s2gp.halexp")
    out = srv.predict(sat_imgs, grd_imgs)

Tracking mode (NEW; the reference always cold-starts the solver from zero):
feed the previous frame's estimate back as the warm start — sequential
frames then need far fewer solver iterations for the same accuracy
(build the Localizer with a reduced ``Config(N_iters=...)``):

    out = loc.predict(sat_t, grd_t, init_pose=out_prev)

Uncertainty (NEW): ``predict(..., return_cov=True)`` adds ``"cov"``
[N, 3, 3] over (lateral_m, longitudinal_m, heading_deg) — the residual-
scaled inverse Gauss-Newton information at the solution, the quantity a
downstream fusion filter (EKF etc.) consumes alongside the point estimate.
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
                 ford_side_m: Optional[float] = None, camera_k=None,
                 cov_scale: float = 1.0):
        import jax
        import jax.numpy as jnp

        from highlyaccurate_tpu.train import step as step_lib

        ford = ford_side_m is not None or ford_extrinsics is not None
        g2sp = cfg.direction == "G2SP"
        if ford and (ford_side_m is None or ford_extrinsics is None):
            raise ValueError("Ford serving needs BOTH ford_extrinsics="
                             "(R_FL [3,3], T_FL [3]) and ford_side_m= "
                             "(satellite patch side length in meters)")
        if ford and g2sp:
            raise ValueError("the Ford chain is S2GP-only "
                             "(direction='G2SP' + ford_* is contradictory)")
        if camera_k is not None and not g2sp:
            raise ValueError("camera_k is a G2SP input (KITTI S2GP "
                             "precomputes rays from the fixed default K); "
                             "build with Config(direction='G2SP')")
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
        # raw GN covariance is optimistic when residuals correlate (PERF.md
        # round-3 calibration study) — cov_scale is the empirical
        # multiplier; fit it with calibrate() or pass a known value
        self.cov_scale = float(cov_scale)
        self._calibrated = self.cov_scale != 1.0
        self._ford_side_m = ford_side_m
        self._g2sp = g2sp
        self._camera_k = None
        if ford:
            R_FL, T_FL = ford_extrinsics
            self._ford_R = np.asarray(R_FL, np.float32).reshape(3, 3)
            self._ford_T = np.asarray(T_FL, np.float32).reshape(3)
            from highlyaccurate_tpu.models.ford import LMS2GPFord
            self.model = LMS2GPFord(cfg=cfg)
        elif g2sp:
            self._ford_R = self._ford_T = None
            if camera_k is not None:
                self._camera_k = np.asarray(camera_k,
                                            np.float32).reshape(3, 3)
            from highlyaccurate_tpu.models.lm_g2sp import LMG2SP
            self.model = LMG2SP(cfg=cfg)
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
                    if g2sp:
                        return self.model.init(
                            rngs, s, g, jnp.asarray(_default_k(cfg))[None],
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
                elif g2sp:
                    variables = self.model.init(
                        rngs, sat, grd, jnp.asarray(_default_k(cfg))[None],
                        jnp.zeros((1, 3)), mode="train")
                else:
                    variables = self.model.init(
                        rngs, sat, grd, jnp.zeros((1, 3)), mode="train")
                params = variables["params"]
        self.params = params
        if mesh is not None:
            self.params = step_lib.replicate(mesh, self.params)
        self._mesh = mesh
        self._step_lib = step_lib
        self._steps = {}
        self._step = self._get_step(False, False)   # default program
        self._key = jax.random.PRNGKey(seed)

    def _get_step(self, warm: bool, info: bool):
        """Jitted eval program for the (warm_start, with_info) variant
        (built lazily; each is its own compiled program)."""
        key = (warm, info)
        if key not in self._steps:
            self._steps[key] = self._step_lib.make_eval_step(
                self.model, self.cfg, self._mesh,
                ford_side_m=self._ford_side_m, warm_start=warm,
                with_info=info)
        return self._steps[key]

    def predict(self, sat_imgs, grd_imgs, R_FL=None, T_FL=None,
                camera_k=None, init_pose=None, return_cov: bool = False
                ) -> dict:
        """sat_imgs [N, A, A, 3], grd_imgs [N, H, W, 3] (float in [0,1] or
        uint8).  Returns numpy arrays of metric poses:
        {"lateral_m", "longitudinal_m", "heading_deg"} each [N] —
        denormalized exactly as the reference eval does
        (reference train_kitti.py:77-80).

        Ford only: ``R_FL`` [N, 3, 3] / ``T_FL`` [N, 3] override the
        constructor extrinsics per image (e.g. mixed camera rigs).
        G2SP only: ``camera_k`` [N, 3, 3] (or [3, 3], one rig) — required
        unless the constructor got ``camera_k=``; scaled to the network
        input size, as the KITTI loader provides it.

        ``init_pose`` warm-starts the solver (tracking mode — e.g. the
        previous frame's estimate; the reference always cold-starts from
        zero): either the dict a previous ``predict`` returned or an
        [N, 3] array of (lateral_m, longitudinal_m, heading_deg).  With
        multi-start inference (cfg.pose_hypotheses > 1) it seeds
        hypothesis 0.

        ``return_cov=True`` adds ``"cov"`` [N, 3, 3]: the pose covariance
        over (lateral_m, longitudinal_m, heading_deg) from the solver's
        Gauss-Newton information at the solution (metric units; zero
        rows/cols on frozen DoFs), times the constructor's ``cov_scale``.
        NOTE: the raw GN covariance ranks uncertainty but is optimistic in
        scale when residuals correlate — calibrate ``cov_scale`` on
        validation data (PERF.md round-3 calibration study)."""
        jnp = self._jnp
        jax = self._jax
        cfg = self.cfg
        ford = self._ford_side_m is not None
        ranges = (cfg.shift_range_lat, cfg.shift_range_lon,
                  cfg.rotation_range)
        sat_imgs = np.asarray(sat_imgs)  # once; _batched_predict's
        n = sat_imgs.shape[0]            # asarray is then a no-op view
        extras = _per_image_extras(n, ford, self._g2sp, self._ford_R,
                                   self._ford_T, self._camera_k,
                                   R_FL, T_FL, camera_k)
        warm = init_pose is not None
        if warm:
            extras["_init_pose"] = _init_to_normalized(init_pose, n, ford,
                                                       ranges)
        step = self._get_step(warm, return_cov)

        def run(sb, gb, eb):
            self._key, sub = jax.random.split(self._key)
            args = [self.params, jnp.asarray(sb), jnp.asarray(gb)]
            if ford:
                args += [jnp.asarray(eb["R_FL"]), jnp.asarray(eb["T_FL"])]
            elif self._g2sp:
                args += [jnp.asarray(eb["camera_k"])]
            if warm:
                args.append(jnp.asarray(eb["_init_pose"]))
            args.append(sub)
            return step(*args)

        out = _batched_predict(run, sat_imgs, grd_imgs, [self.batch_size],
                               ranges, extras, with_cov=return_cov)
        if return_cov:
            if not self._calibrated:
                import warnings
                warnings.warn(
                    "Localizer covariance is UNCALIBRATED (cov_scale=1.0): "
                    "the raw Gauss-Newton covariance ranks uncertainty but "
                    "is strongly optimistic in scale (measured ~5000x on "
                    "synthetic tracking, PERF.md round 3). Fit the scale "
                    "with Localizer.calibrate(validation_batches) or pass "
                    "cov_scale= before fusing 'cov' in a filter.",
                    stacklevel=2)
            out["cov"] = _cov_to_metric(out["cov"], ford,
                                        ranges) * self.cov_scale
        return out

    def calibrate(self, batches, dof_mask=None) -> float:
        """Fit ``cov_scale`` on validation data and store it.

        The solver's raw Gauss-Newton covariance ranks per-image
        uncertainty well but its SCALE is optimistic when residuals
        correlate (neighboring feature-map pixels are not independent
        measurements).  This fits the single scalar that makes the
        Mahalanobis statistic consistent — ``scale = mean(z^2) / dof``
        with ``z^2 = err^T C_raw^{-1} err`` — the exact recipe of the
        round-3 study (scripts/r3_cov_calibration.py), now an API.

        ``batches``: iterable of dicts with ``sat`` [N, A, A, 3], ``grd``
        [N, H, W, 3] and ``gt_pose`` [N, 3] metric
        (lateral_m, longitudinal_m, heading_deg); optional ``R_FL`` /
        ``T_FL`` / ``camera_k`` / ``init_pose`` forward to :meth:`predict`
        (pass ``init_pose`` near GT to calibrate the tracking regime — the
        regime a filter consumer actually operates in).

        ``dof_mask``: optional length-3 bool for frozen DoFs (a zero
        range already auto-freezes — rows/cols of the raw covariance are
        zero there and are excluded from z^2 automatically).

        Sets and returns ``self.cov_scale``; subsequent
        ``predict(return_cov=True)`` and :meth:`export` artifacts use the
        stored scale (an exported consumer reads it from meta.json).
        """
        errs, covs = [], []
        prev = self.cov_scale
        prev_cal = self._calibrated
        self.cov_scale = 1.0  # raw covariance during the fit
        self._calibrated = True  # no uncalibrated-warning inside the fit
        try:
            for b in batches:
                kw = {k: b[k] for k in ("R_FL", "T_FL", "camera_k",
                                        "init_pose") if k in b}
                out = self.predict(b["sat"], b["grd"], return_cov=True,
                                   **kw)
                gt = np.asarray(b["gt_pose"], np.float64)
                pred = np.stack([out["lateral_m"], out["longitudinal_m"],
                                 out["heading_deg"]], -1)
                errs.append(pred.astype(np.float64) - gt)
                covs.append(np.asarray(out["cov"], np.float64))
        finally:
            self.cov_scale = prev
            self._calibrated = prev_cal
        if not errs:
            raise ValueError("calibrate() got an empty batch iterable")
        e = np.concatenate(errs)
        C = np.concatenate(covs)
        z2_sum, dof_sum = 0.0, 0
        for ee, cc in zip(e, C):
            free = np.diagonal(cc) > 0  # frozen DoFs have zero rows/cols
            if dof_mask is not None:
                free = free & np.asarray(dof_mask, bool)
            if not free.any():
                continue
            cf = cc[np.ix_(free, free)]
            ef = ee[free]
            z2_sum += float(ef @ np.linalg.solve(cf, ef))
            dof_sum += int(free.sum())
        if dof_sum == 0:
            raise ValueError("calibrate(): every DoF is frozen — nothing "
                             "to fit (all covariance diagonals are zero)")
        self.cov_scale = z2_sum / dof_sum
        self._calibrated = True
        return self.cov_scale

    def export(self, path: str, platforms=None, batch_sizes=None,
               warm_start: bool = False, return_cov: bool = False) -> None:
        """Serialize the inference program to a self-contained artifact.

        The jitted eval step is traced per batch size with the weights
        closed over (they become StableHLO constants), serialized via
        ``jax.export``, and zipped together with the denormalization
        metadata.  ``ExportedLocalizer(path)`` serves the artifact without
        the model code or checkpoint files.

        ``batch_sizes`` (default ``[self.batch_size]``): trace one program
        per size — e.g. ``[1, 8]`` lets the server run single images at
        batch-1 latency instead of padding to 8; ExportedLocalizer routes
        each chunk to the smallest exported size that fits.

        Export on (a host of) the deployment platform type — the program
        embeds platform-specific kernels (Mosaic on TPU); loading it on a
        different backend raises.  ``platforms`` (e.g. ``["tpu", "cpu"]``)
        forwards to ``jax.export.export`` for multi-platform lowering.

        Single-device programs only (deployment-side sharding is the
        server's concern, not the artifact's); build the Localizer with
        ``mesh=None`` to export.

        ``warm_start`` bakes the tracking-mode signature into the artifact
        (predict then takes ``init_pose``; zero init = cold start);
        ``return_cov`` bakes the covariance output in.
        """
        import io
        import json
        import zipfile

        import jax
        from jax import export as jexport

        if self._mesh is not None:
            raise ValueError("export serializes a single-device program; "
                             "build the Localizer with mesh=None")
        cfg = self.cfg
        ford = self._ford_side_m is not None
        g2sp = self._g2sp
        params = self.params
        step = self._get_step(warm_start, return_cov)

        def fn(sat, grd, *rest):
            return step(params, sat, grd, *rest)

        sizes = sorted(set(batch_sizes or [self.batch_size]))
        f32 = np.float32
        key = jax.random.PRNGKey(0)
        blobs = {}
        exp_platforms = None
        for bs in sizes:
            args = [jax.ShapeDtypeStruct(
                        (bs, cfg.sat_size, cfg.sat_size, 3), f32),
                    jax.ShapeDtypeStruct((bs, cfg.grd_h, cfg.grd_w, 3), f32)]
            if ford:
                args += [jax.ShapeDtypeStruct((bs, 3, 3), f32),
                         jax.ShapeDtypeStruct((bs, 3), f32)]
            elif g2sp:
                args += [jax.ShapeDtypeStruct((bs, 3, 3), f32)]
            if warm_start:
                args.append(jax.ShapeDtypeStruct((bs, 3), f32))
            args.append(jax.ShapeDtypeStruct(key.shape, key.dtype))
            exp = jexport.export(jax.jit(fn), platforms=platforms)(*args)
            exp_platforms = list(exp.platforms)
            blobs[bs] = exp.serialize()
        meta = {
            "format": _EXPORT_FORMAT,
            "batch_size": max(sizes),
            "batch_sizes": sizes,
            "ford": ford,
            "g2sp": g2sp,
            "warm_start": warm_start,
            "return_cov": return_cov,
            "cov_scale": self.cov_scale,
            "shift_range_lat": cfg.shift_range_lat,
            "shift_range_lon": cfg.shift_range_lon,
            "rotation_range": cfg.rotation_range,
            "ford_R": None if not ford else self._ford_R.tolist(),
            "ford_T": None if not ford else self._ford_T.tolist(),
            "camera_k": (None if self._camera_k is None
                         else self._camera_k.tolist()),
            "platforms": exp_platforms,
        }
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
            z.writestr("meta.json", json.dumps(meta, indent=1))
            for bs, blob in blobs.items():
                name = ("program.jaxexport" if bs == max(sizes)
                        else f"program_b{bs}.jaxexport")
                z.writestr(name, blob)
        with open(path, "wb") as f:
            f.write(buf.getvalue())


_EXPORT_FORMAT = "highlyaccurate_tpu.localizer/1"


class ExportedLocalizer:
    """Serve a ``Localizer.export`` artifact: no model code, no flax, no
    checkpoint — just the serialized program and jax runtime."""

    def __init__(self, path: str, seed: int = 0):
        import json
        import zipfile

        import jax
        from jax import export as jexport

        with zipfile.ZipFile(path) as z:
            names = set(z.namelist())
            meta = (json.loads(z.read("meta.json"))
                    if "meta.json" in names else {})
            if meta.get("format") != _EXPORT_FORMAT:
                raise ValueError(f"{path}: not a Localizer export artifact "
                                 f"(format={meta.get('format')!r})")
            sizes = sorted(meta.get("batch_sizes", [meta["batch_size"]]))
            blobs = {bs: z.read("program.jaxexport" if bs == max(sizes)
                                else f"program_b{bs}.jaxexport")
                     for bs in sizes}
        backend = jax.default_backend()
        # jax.export records lowering-platform names ('cuda'/'rocm'), while
        # default_backend() reports the API name ('gpu') — map before
        # comparing so a GPU artifact loads on the GPU host it came from
        aliases = {"gpu": ("gpu", "cuda", "rocm")}.get(backend, (backend,))
        if not any(p in meta["platforms"] for p in aliases):
            raise ValueError(
                f"{path} was exported for {meta['platforms']} but this "
                f"process runs on {backend!r}; re-export on the deployment "
                "platform (or export with platforms=[...])")
        self.meta = meta
        self.batch_size = meta["batch_size"]
        self.batch_sizes = sizes
        self._ford = bool(meta["ford"])
        self._g2sp = bool(meta.get("g2sp", False))
        self._warm = bool(meta.get("warm_start", False))
        self._cov = bool(meta.get("return_cov", False))
        self._ford_R = (np.asarray(meta["ford_R"], np.float32)
                        if self._ford else None)
        self._ford_T = (np.asarray(meta["ford_T"], np.float32)
                        if self._ford else None)
        self._camera_k = (np.asarray(meta["camera_k"], np.float32)
                          if meta.get("camera_k") is not None else None)
        self._calls = {bs: jax.jit(jexport.deserialize(blob).call)
                       for bs, blob in blobs.items()}
        self._key = jax.random.PRNGKey(seed)
        self._jax = jax

    def predict(self, sat_imgs, grd_imgs, R_FL=None, T_FL=None,
                camera_k=None, init_pose=None) -> dict:
        """Same contract as ``Localizer.predict``.  ``init_pose`` requires a
        ``warm_start=True`` artifact (the signature is baked in at export;
        omitting it there runs the baked cold start); a ``return_cov=True``
        artifact always returns ``"cov"``."""
        jax = self._jax
        meta = self.meta
        ranges = (meta["shift_range_lat"], meta["shift_range_lon"],
                  meta["rotation_range"])
        sat_imgs = np.asarray(sat_imgs)
        n = sat_imgs.shape[0]
        extras = _per_image_extras(n, self._ford, self._g2sp, self._ford_R,
                                   self._ford_T, self._camera_k,
                                   R_FL, T_FL, camera_k)
        if init_pose is not None and not self._warm:
            raise ValueError("this artifact was exported without "
                             "warm_start=True; it has no init_pose input")
        if self._warm:
            extras["_init_pose"] = (
                np.zeros((n, 3), np.float32) if init_pose is None
                else _init_to_normalized(init_pose, n, self._ford, ranges))

        def run(sb, gb, eb):
            call = self._calls[sb.shape[0]]
            self._key, sub = jax.random.split(self._key)
            args = [sb, gb]
            if self._ford:
                args += [eb["R_FL"], eb["T_FL"]]
            elif self._g2sp:
                args += [eb["camera_k"]]
            if self._warm:
                args.append(eb["_init_pose"])
            return call(*args, sub)

        out = _batched_predict(run, sat_imgs, grd_imgs, self.batch_sizes,
                               ranges, extras, with_cov=self._cov)
        if self._cov:
            out["cov"] = (_cov_to_metric(out["cov"], self._ford, ranges)
                          * float(meta.get("cov_scale", 1.0)))
        return out


def _default_k(cfg: Config) -> np.ndarray:
    """The fixed KITTI camera K scaled FOV-preserving to the network input
    size — used only as the abstract-init template for G2SP Localizers
    (single source: the model's own helper)."""
    from highlyaccurate_tpu.models.lm_s2gp import _scaled_default_k
    return np.asarray(_scaled_default_k(cfg), np.float32)


def _per_image_extras(n, ford, g2sp, ford_R, ford_T, default_k,
                      R_FL, T_FL, camera_k) -> dict:
    """Resolve per-image model extras ([N, ...] arrays) from per-call
    overrides and constructor/artifact defaults; reject ones the model
    family doesn't take."""
    if (R_FL is not None or T_FL is not None) and not ford:
        raise ValueError("R_FL/T_FL are Ford-chain extrinsics; this "
                         "localizer does not serve the Ford model")
    if camera_k is not None and not g2sp:
        raise ValueError("camera_k is a G2SP input; this localizer serves "
                         "an S2GP model (the fixed-K quirk: KITTI S2GP "
                         "precomputes rays from the default K)")
    def check(name, x, shape):
        x = np.asarray(x, np.float32)
        if x.shape != shape:
            raise ValueError(f"{name} must have shape {shape} to match the "
                             f"{shape[0]} images, got {x.shape}")
        return x

    if ford:
        return {
            "R_FL": (check("R_FL", R_FL, (n, 3, 3)) if R_FL is not None
                     else np.broadcast_to(ford_R, (n, 3, 3))),
            "T_FL": (check("T_FL", T_FL, (n, 3)) if T_FL is not None
                     else np.broadcast_to(ford_T, (n, 3))),
        }
    if g2sp:
        k = camera_k if camera_k is not None else default_k
        if k is None:
            raise ValueError("G2SP serving needs camera intrinsics: pass "
                             "camera_k= ([N,3,3] or [3,3]) to predict(), "
                             "or a default at construction/export")
        k = np.asarray(k, np.float32)
        if k.ndim == 2 and k.shape == (3, 3):
            k = np.broadcast_to(k, (n, 3, 3))
        return {"camera_k": check("camera_k", k, (n, 3, 3))}
    return {}


def _init_to_normalized(init_pose, n, ford, ranges) -> np.ndarray:
    """[N, 3] normalized pose-order warm start from user-facing metric
    input: either the dict a previous predict returned or an [N, 3] array
    of (lateral_m, longitudinal_m, heading_deg).  Pose order is the model
    convention — KITTI (u=lon, v=lat, heading); Ford (u=lat, v=lon,
    heading), see models_ford.py:823-824."""
    if isinstance(init_pose, dict):
        init_pose = np.stack([np.asarray(init_pose["lateral_m"]),
                              np.asarray(init_pose["longitudinal_m"]),
                              np.asarray(init_pose["heading_deg"])], -1)
    p = np.asarray(init_pose, np.float32)
    if p.shape != (n, 3):
        raise ValueError(f"init_pose must have shape ({n}, 3) to match the "
                         f"{n} images, got {p.shape}")
    # a zero range freezes that DoF at 0 (the models' frozen-DoF rule)
    lat = p[:, 0] / ranges[0] if ranges[0] else np.zeros_like(p[:, 0])
    lon = p[:, 1] / ranges[1] if ranges[1] else np.zeros_like(p[:, 1])
    deg = p[:, 2] / ranges[2] if ranges[2] else np.zeros_like(p[:, 2])
    if ford:
        return np.stack([lat, lon, deg], -1).astype(np.float32)
    return np.stack([lon, lat, deg], -1).astype(np.float32)


def _cov_to_metric(cov, ford, ranges) -> np.ndarray:
    """Normalized pose-order [N, 3, 3] covariance -> metric
    (lateral_m, longitudinal_m, heading_deg) order."""
    perm = np.array([0, 1, 2] if ford else [1, 0, 2])
    s = np.array(ranges, np.float32)
    cov = cov[:, perm[:, None], perm[None, :]]
    return cov * s[None, :, None] * s[None, None, :]


def _batched_predict(run, sat_imgs, grd_imgs, sizes, ranges,
                     extras, with_cov: bool = False) -> dict:
    """Shared predict loop: uint8 conversion, padding ragged tails to the
    smallest compiled batch size that fits (``sizes`` sorted ascending —
    a multi-size export serves a tail of 1 at batch-1 latency),
    denormalizing to meters/degrees (reference train_kitti.py:77-80).
    ``run(sat, grd, extras_batch)`` executes one padded batch; ``extras``
    is a dict of per-image [N, ...] arrays chunk-padded alongside.
    ``with_cov``: run returns a 4th output — collected raw (normalized,
    pose-order) under "cov" for the caller to convert."""
    sat = np.asarray(sat_imgs)
    grd = np.asarray(grd_imgs)
    if sat.dtype == np.uint8:
        sat = sat.astype(np.float32) / 255.0
    if grd.dtype == np.uint8:
        grd = grd.astype(np.float32) / 255.0
    n = sat.shape[0]
    if n == 0:
        empty = np.zeros((0,), np.float32)
        out = {"lateral_m": empty, "longitudinal_m": empty,
               "heading_deg": empty}
        if with_cov:
            out["cov"] = np.zeros((0, 3, 3), np.float32)
        return out

    def pad_to(x, bs):
        pad = bs - x.shape[0]
        return x if not pad else np.concatenate(
            [x, np.repeat(x[-1:], pad, 0)])

    max_bs = sizes[-1]
    lats, lons, ths, covs = [], [], [], []
    for i in range(0, n, max_bs):
        chunk = min(max_bs, n - i)
        bs = next(s for s in sizes if s >= chunk)
        sb = pad_to(sat[i:i + chunk], bs)
        gb = pad_to(grd[i:i + chunk], bs)
        eb = {k: pad_to(v[i:i + chunk], bs) for k, v in extras.items()}
        lat, lon, th, *rest = run(sb, gb, eb)
        lats.append(np.asarray(lat)[:chunk])
        lons.append(np.asarray(lon)[:chunk])
        ths.append(np.asarray(th)[:chunk])
        if with_cov:
            covs.append(np.asarray(rest[0])[:chunk])

    out = {
        "lateral_m": np.concatenate(lats) * ranges[0],
        "longitudinal_m": np.concatenate(lons) * ranges[1],
        "heading_deg": np.concatenate(ths) * ranges[2],
    }
    if with_cov:
        out["cov"] = np.concatenate(covs)
    return out
