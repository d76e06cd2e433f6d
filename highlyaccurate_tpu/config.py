"""Experiment configuration.

A frozen, hashable dataclass mirroring the reference's argparse flags
(reference: /root/reference/train_kitti.py:426-485, train_ford.py:343-412) so it
can be passed as a static argument to jitted functions.  The save-path scheme
(reference: train_kitti.py:488-521) is reproduced for drop-in checkpoint lookup
compatibility.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass(frozen=True)
class Config:
    # experiment control
    resume: int = 0
    test: int = 1
    debug: int = 0
    epochs: int = 5
    lr: float = 1e-4
    batch_size: int = 3

    # pose prior ranges
    rotation_range: float = 10.0
    shift_range_lat: float = 20.0
    shift_range_lon: float = 20.0

    # loss coefficients
    coe_shift_lat: float = 100.0
    coe_shift_lon: float = 100.0
    coe_heading: float = 100.0
    coe_L1: float = 100.0
    coe_L2: float = 100.0
    coe_L3: float = 100.0
    coe_L4: float = 100.0
    loss_method: int = 0

    # solver
    level: int = 3
    N_iters: int = 5
    using_weight: int = 0
    damping: float = 0.1
    train_damping: int = 0
    direction: str = "S2GP"  # or G2SP
    Optimizer: str = "LM"  # LM | SGD | ADAM | NN | GN(ford)
    level_first: int = 0
    proj: str = "geo"  # geo | polar | nn
    use_gt_depth: int = 0
    dropout: int = 0
    use_hessian: int = 0
    estimate_depth: int = 0  # Ford only
    beta1: float = 0.9
    beta2: float = 0.999

    # misc reference flags kept for save-path parity
    stereo: int = 0
    sequence: int = 1
    metric_distance: float = 5.0
    negative_samples: int = 32
    use_conf_metric: int = 0
    Load: int = 0
    visualize: int = 0

    # Ford driver flags (reference: train_ford.py:388-389)
    train_log_start: int = 0
    train_log_end: int = 1
    test_log_ind: int = 0
    transformer: int = 0  # reference train_ford.py:402: frozen-backbone
    #   restore from the base experiment dir (the transformer block itself is
    #   dead code upstream, models_ford.py:94-101 — only the restore/freeze
    #   mechanics are live)
    train_whole: int = 0
    test_whole: int = 0

    # --- new, TPU-framework-only knobs (do not affect save-path) ---
    dataset_root: Optional[str] = None  # lifts the reference's hardcoded root
    grd_h: int = 256   # ground image H (reference KITTI_dataset.py:28)
    grd_w: int = 1024  # ground image W
    sat_size: int = 512  # satellite patch side (utils.py:10-11)
    pose_hypotheses: int = 1  # vmapped multi-start LM (reference is always 1)
    compute_dtype: str = "float32"  # "float32" | "bfloat16" feature compute
    # jax.checkpoint the scan body in training. Off by default: with the
    # lax.scan solver the memory win is modest, and remat doubles the Pallas
    # kernel instances in the program (which overflows this environment's
    # remote compile helper at level=3). Enable for very large batches.
    remat: int = 0
    g2sp_restrict_grid: int = 1  # G2SP: drop satellite columns that can
    #   never project into the ground image for any pose within 1.5x the
    #   configured ranges (they contribute zero rows of J — see
    #   geometry/kitti.py:g2sp_inview_col_start).  Numerically identical for
    #   in-range poses; measured union keep ~82% of columns (grid study,
    #   scripts/r4_g2sp_grid_study.py).  geo proj + implicit-LM paths only.
    use_banded_warp: int = 1  # Pallas banded line sampler in S2GP geo solver
    #   (1 = on TPU; 2 = force even off-TPU via interpret mode, tests only)
    use_implicit_lm: int = 1  # contract H/g from (out, dx, dy) + row-affine
    #   duv without materializing the [B,V,W,C,3] Jacobian (banded LM only)
    use_fused_moments: int = 1  # eval-only: banded kernel emits the 9 LM
    #   contraction moments in-register ([B,V,3,16]) instead of [B,V,W,C]
    #   out/dx/dy HBM arrays (implicit-LM banded eval only; S2GP + Ford)
    g2sp_pixel_moments: int = 0  # G2SP projline analogue (per-pixel
    #   [B,V,W,16] moment lanes + lm_update_pixel_moments,
    #   make_projline_pixmom).  Default OFF: measured 27% SLOWER than the
    #   plain projline kernel + XLA contraction on TPU v5e (77.8 vs 106.6
    #   fps eval b8 bf16, scripts/r4_pixmom_probe.py) — the in-kernel
    #   per-pixel contractions add more VPU work per program than the
    #   [B,A,A,C]x3 HBM round-trip they remove.  Kept as a tested
    #   alternative (numerics identical).
    banded_u_chunk: int = -1  # per-(line, column-block) dynamic u-windows in
    #   the blocked Pallas kernels (round-5 lever): restrict the per-block
    #   weight build + banded matmuls to the UC-chunked sample window whose
    #   x(u) actually lands in the block, instead of all W samples.  Value =
    #   chunk size UC (multiple of 8 dividing W; 0 = off; -1 = AUTO, the
    #   measured best per family and batch — 128 for the S2GP/Ford banded
    #   kernels at batch >= 8 (flagship b32 eval 158.0 -> 167.2 fps,
    #   ford_eval 135.1 -> 138.7 on TPU v5e — scripts/r5_uwin_confirm.py),
    #   0 at small batch where the chunk overhead loses (+0.8-1.5 ms at
    #   batch 1 — scripts/r5_b1_uwin_probe.py), and 0 for the G2SP
    #   projline kernel (measured neutral on its real geometry at every
    #   chunk size: the in-view wedge spans few column blocks and nearly
    #   the whole window within a hit block — scripts/r5_uwin_probe.py)).
    #   Outputs are BIT-IDENTICAL at any value (excluded rows have
    #   exactly-zero block weights; parity-tested in
    #   tests/test_banded_warp.py).
    pad_input_channels: int = 0  # zero-pad the RGB input to this channel
    #   count before the first conv (0 = off).  Numerics identical: the
    #   padded input channels are zero, so the extra kernel rows (zero-
    #   padded on .pth import, dead at init) contribute nothing and receive
    #   zero gradient.  Lever for the layout-bound Cin=3 first conv
    #   (measured 24% MXU, PERF.md round-4 early-conv study); adopt only if
    #   scripts/r4_feat_probe.py measures a win.
    banded_bf16_map: int = 1  # sample the satellite map in bfloat16 inside
    #   the banded kernel (fp32 weights/accumulation).  Halves the map's VMEM
    #   footprint, which lets the finest level ride DMA-free in VMEM instead
    #   of re-DMAing an 8MB window per ground row (the round-1 eval
    #   bottleneck).  NOTE: this applies to every banded sampler call — the
    #   banded TRAINING path included (lm_s2gp.py / models/ford.py), so under
    #   fp32 compute the training map is bf16-quantized too (loss-curve
    #   impact measured nil, scripts/r2_bf16_train_check.py; recall impact
    #   quantified in PERF.md).  Set 0 for strictly-fp32 banded training.
    #   Ignored by the gather path; implied when compute_dtype is bfloat16.
    #   CAVEAT (round-4 finding, PERF.md "bf16 MXU matmuls"): 0 restores
    #   fp32 MAP precision only — on TPU, Mosaic's default-precision f32
    #   matmuls truncate the bilinear-weight operands to bf16 anyway (one
    #   MXU pass; proven by an exactly-zero output delta vs explicit bf16
    #   operands).  For true fp32 numerics use the gather path
    #   (use_banded_warp=0), which is the reference-faithful route.
    keep_optimizer_state: int = 0  # fix for the reference's per-epoch Adam reset
    async_ckpt: int = 1  # epoch checkpoints write on orbax's background
    #   thread, overlapping the test1/test2 eval that follows each save
    #   (the reference's torch.save blocks the loop); same-name overwrites
    #   are serialized, loads fence pending writes, and a clean process
    #   exit flushes via atexit (train/checkpoint.py). 0 = synchronous.

    @property
    def n_levels(self) -> int:
        """Number of pyramid levels returned by the feature net for `level`."""
        if self.level in (-1, -2, -3):
            return 1
        return int(self.level)

    @property
    def active_pose_dims(self) -> tuple:
        """Which pose DoFs the solver updates (reference: models_kitti.py:954-957).

        Returns indices into (shift_u, shift_v, heading).
        """
        if self.rotation_range == 0:
            return (0, 1)
        if self.shift_range_lat == 0 and self.shift_range_lon == 0:
            return (2,)
        return (0, 1, 2)

    def save_path(self, root: str = ".") -> str:
        """Reference-identical experiment directory (train_kitti.py:488-521)."""
        p = (
            f"./ModelsKitti/LM_{self.direction}"
            f"/lat{self.shift_range_lat}m_lon{self.shift_range_lon}m_rot{self.rotation_range}"
            f"_Lev{self.level}_Nit{self.N_iters}"
            f"_Wei{self.using_weight}"
            f"_Dam{self.train_damping}"
            f"_Load{self.Load}_{self.Optimizer}"
            f"_loss{self.loss_method}"
            f"_{self.coe_shift_lat}_{self.coe_shift_lon}_{self.coe_heading}"
            f"_{self.coe_L1}_{self.coe_L2}_{self.coe_L3}_{self.coe_L4}"
        )
        if self.level_first:
            p += "_Level1st"
        if self.proj != "geo":
            p += "_" + self.proj
        if self.use_gt_depth:
            p += "_depth"
        if self.use_hessian:
            p += "_Hess"
        if self.dropout > 0:
            p += "_Dropout" + str(self.dropout)
        if self.damping != 0.1:
            p += "_Damping" + str(self.damping)
        return os.path.normpath(os.path.join(root, p))

    def ford_paths(self, root: str = "."):
        """Reference-identical Ford (restore_path, save_path)
        (train_ford.py:415-455).

        ``restore_path`` is non-None only for the ``--transformer`` variant:
        it points at the base experiment directory whose Model_best seeds the
        (frozen) feature backbones (train_ford.py:499-511).
        """
        p = (
            f"./ModelsFord/LM_{self.direction}"
            f"/lat{self.shift_range_lat}m_lon{self.shift_range_lon}m_rot{self.rotation_range}"
            f"_Lev{self.level}_Nit{self.N_iters}"
            f"_Wei{self.using_weight}"
            f"_Dam{self.train_damping}"
            f"_Load{self.Load}_{self.Optimizer}"
            f"_loss{self.loss_method}"
            f"_{self.coe_shift_lat}_{self.coe_shift_lon}_{self.coe_heading}"
            f"_{self.coe_L1}_{self.coe_L2}_{self.coe_L3}_{self.coe_L4}"
            f"_Start{self.train_log_start}_End{self.train_log_end}"
        )
        restore = None
        if self.transformer:
            restore = p
            p += "_transformer"
        if self.estimate_depth:
            p += "_Depth1"
        if self.level_first:
            p += "_Level1st"
        if self.proj != "geo":
            p += "_" + self.proj
        if self.use_hessian:
            p += "_Hess"
        if self.dropout > 0:
            p += "_Dropout" + str(self.dropout)
        if self.train_whole:
            p += "_Whole"
        restore = os.path.normpath(os.path.join(root, restore)) \
            if restore else None
        return restore, os.path.normpath(os.path.join(root, p))

    def save_path_ford(self, root: str = ".") -> str:
        return self.ford_paths(root)[1]


def config_from_args(args) -> Config:
    """Build a Config from an argparse Namespace (unknown fields ignored).

    ``--use_banded_warp`` defaults to None in the CLIs so "unset" is
    distinguishable: imported reference checkpoints (``--test --import_pth``)
    were trained through torch's gather-equivalent sampler, and the PERF.md
    recall study shows cross-sampler-path eval costs recall — so unset
    resolves to the faithful gather path (0) there and to the banded kernel
    (1) everywhere else.  Resolved HERE so every consumer of a parsed
    Namespace gets a concrete int (not just the CLI main()).

    ``--compute_dtype`` likewise defaults to None: unset resolves to
    bfloat16 for evaluation of natively-trained checkpoints (recall-neutral,
    PERF.md round-2 study — the production eval config) and to float32 for
    training and for ``--import_pth`` eval (strict reference numerics)."""
    fields = {f.name for f in dataclasses.fields(Config)}
    kw = {k: v for k, v in vars(args).items() if k in fields}
    faithful = bool(getattr(args, "test", 0)) \
        and getattr(args, "import_pth", None)
    if kw.get("use_banded_warp", 1) is None:
        kw["use_banded_warp"] = 0 if faithful else 1
    if kw.get("compute_dtype", "x") is None:
        kw["compute_dtype"] = ("bfloat16" if getattr(args, "test", 0)
                               and not faithful else "float32")
    # ADVICE r4: the G2SP column restriction derives its bound from the
    # DEFAULT camera K (1.1x FOV slack, 1.5x pose-range margin) — a drive
    # with calibration outside that slack would silently deviate on the
    # path that claims strict reference numerics.  Unset resolves to the
    # full grid on the faithful --import_pth eval route.
    if kw.get("g2sp_restrict_grid", 1) is None:
        kw["g2sp_restrict_grid"] = 0 if faithful else 1
    return Config(**kw)
