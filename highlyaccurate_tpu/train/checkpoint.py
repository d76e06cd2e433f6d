"""Checkpointing: orbax save/restore + reference .pth importer.

Reference behavior (SURVEY.md §5.4): per-epoch ``model_<epoch%100>.pth`` and a
best-model ``Model_best.pth`` gated on eval recall — both plain torch pickles
of the state_dict; optimizer state never saved.  Here:

  * native format: orbax ``model_<n>`` / ``Model_best`` directories with
    params (+ optionally opt state);
  * ``import_pth`` converts a released reference checkpoint to flax params so
    the released pretrained models can be evaluated (BASELINE.md requirement);
  * same file-name scheme inside the same save-path directory layout, so the
    experiment-directory lookup is drop-in compatible.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.vggunet import torch_branch_to_flax


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.StandardCheckpointer()


_ASYNC_CKPT = None


def _async_checkpointer():
    """Process-wide async checkpointer (owns the background write thread)."""
    global _ASYNC_CKPT
    if _ASYNC_CKPT is None:
        import atexit

        import orbax.checkpoint as ocp
        _ASYNC_CKPT = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        atexit.register(wait_for_async_saves)  # flush on clean process exit
    return _ASYNC_CKPT


def wait_for_async_saves() -> None:
    """Barrier on all pending async checkpoint writes (no-op if none).

    Call before reading a just-saved checkpoint, before process exit, and
    before re-saving the same directory name."""
    if _ASYNC_CKPT is not None:
        _ASYNC_CKPT.wait_until_finished()


def save_params(save_path: str, name: str, params: Any,
                async_save: bool = False) -> str:
    """Save params under ``<save_path>/<name>`` (orbax directory).

    ``async_save=True`` returns as soon as the arrays are snapshotted to
    host memory; the directory write proceeds on orbax's background thread
    (overlapping the next epoch's compute — the reference's torch.save
    blocks the train loop, reference train_kitti.py:409-414).  Pending
    writes are fenced by ``wait_for_async_saves``; saves to the SAME name
    are serialized here so an overwrite can never race its predecessor.

    Multi-host contract (jax.distributed): this is a COLLECTIVE call —
    every process must call it with the same path (the natural SPMD train
    loop already does).  Orbax synchronizes the processes internally and
    only the primary host writes array data, so two hosts never race on
    one directory; gating the call to one process instead DEADLOCKS or
    trips orbax's '_Checkpointer:save_start' barrier-name check.  On
    return the write is globally complete (sync path) or snapshot-complete
    (async path).  Exercised by tests/test_multiprocess.py.
    """
    path = os.path.abspath(os.path.join(save_path, name))
    params = jax.device_get(params)
    if async_save:
        ckpt = _async_checkpointer()
        # orbax forbids two in-flight saves; a second save request also
        # must not delete the directory a pending save is still writing
        ckpt.wait_until_finished()
        ckpt.save(path, args=_standard_args(params), force=True)
        return path
    # a sync overwrite must not delete a directory an earlier async save
    # is still writing either
    wait_for_async_saves()
    ckpt = _checkpointer()
    ckpt.save(path, params, force=True)
    ckpt.wait_until_finished()
    return path


def _standard_args(payload):
    import orbax.checkpoint as ocp
    return ocp.args.StandardSave(payload)


def load_params(save_path: str, name: str, like: Any) -> Any:
    """Restore params shaped like ``like`` — concrete arrays or abstract
    ``jax.ShapeDtypeStruct`` leaves (e.g. from ``jax.eval_shape`` over
    ``model.init``, which avoids compiling the model just for a template)."""
    wait_for_async_saves()  # a just-issued async save must be readable
    path = os.path.abspath(os.path.join(save_path, name))
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"no checkpoint '{name}' under {save_path} — train first "
            f"(--test 0), point --save_root/--resume at an existing "
            f"experiment directory, or evaluate a released reference "
            f"checkpoint with --import_pth <model.pth>")
    ckpt = _checkpointer()
    conv = lambda x: x if isinstance(x, jax.ShapeDtypeStruct) else np.asarray(x)
    like = jax.tree_util.tree_map(conv, jax.device_get(like))
    return ckpt.restore(path, like)


def epoch_ckpt_name(epoch: int) -> str:
    """model_<epoch%100> (reference train_kitti.py:409-414)."""
    return f"model_{epoch % 100}"


def save_train_state(save_path: str, name: str, state,
                     async_save: bool = False) -> str:
    """Full-state checkpoint (params + optimizer + step/epoch).

    The reference never checkpoints optimizer state (SURVEY.md §5.4) — this
    is the fix path used with ``keep_optimizer_state=1``.  ``async_save``
    and the multi-host collective-call contract as in :func:`save_params`.
    """
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": int(state.step),
        "epoch": int(state.epoch),
    }
    path = os.path.abspath(os.path.join(save_path, name + "_full"))
    if async_save:
        ckpt = _async_checkpointer()
        # NOTE: this wait also serializes with a just-issued async
        # save_params — with keep_optimizer_state=1 the params snapshot
        # effectively completes here (seconds for this model size) and
        # only the _full write overlaps the following eval
        ckpt.wait_until_finished()
        ckpt.save(path, args=_standard_args(payload), force=True)
        return path
    wait_for_async_saves()
    ckpt = _checkpointer()
    ckpt.save(path, payload, force=True)
    ckpt.wait_until_finished()
    return path


def load_train_state(save_path: str, name: str, state):
    """Restore a full-state checkpoint onto a template TrainState."""
    like = {
        "params": jax.tree_util.tree_map(np.asarray,
                                         jax.device_get(state.params)),
        "opt_state": jax.tree_util.tree_map(np.asarray,
                                            jax.device_get(state.opt_state)),
        "step": 0,
        "epoch": 0,
    }
    wait_for_async_saves()
    path = os.path.abspath(os.path.join(save_path, name + "_full"))
    restored = _checkpointer().restore(path, like)
    import jax.numpy as jnp
    return state.replace(
        params=restored["params"],
        opt_state=jax.tree_util.tree_map(
            lambda a, b: b, state.opt_state, restored["opt_state"]),
        step=jnp.asarray(restored["step"], jnp.int32),
        epoch=jnp.asarray(restored["epoch"], jnp.int32))


def import_pth(path: str, cfg: Config) -> dict:
    """Convert a reference ``state_dict`` .pth into LMS2GP flax params.

    Maps (reference key prefix -> flax param subtree):
      SatFeatureNet.* -> SatFeatureNet, GrdFeatureNet.* -> GrdFeatureNet,
      damping -> damping, NNrefine.* -> nn_refine.
    Conv kernels are transposed OIHW -> HWIO.
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    params: dict = {}
    # depth heads live on the GROUND branch only (reference
    # models_ford.py:36-37: SatFeatureNet = VGGUnet(level),
    # GrdFeatureNet = VGGUnet(level, estimate_depth))
    params["SatFeatureNet"] = torch_branch_to_flax(
        sd, "SatFeatureNet.", estimate_depth=False,
        pad_cin=cfg.pad_input_channels)
    params["GrdFeatureNet"] = torch_branch_to_flax(
        sd, "GrdFeatureNet.", estimate_depth=bool(cfg.estimate_depth),
        pad_cin=cfg.pad_input_channels)
    if "damping" in sd:
        params["damping"] = np.asarray(sd["damping"].detach().cpu().numpy())
    if any(k.startswith("NNrefine.") for k in sd):
        params["nn_refine"] = _import_nnrefine(sd, "NNrefine.")
    return params


# torchvision VGG16 `features` indices of the 7 encoder convs the reference
# slices out (reference VGG.py:20-28)
_VGG16_FEATURE_CONVS = {
    "conv0": 0, "conv2": 2, "conv5": 5, "conv7": 7,
    "conv10": 10, "conv12": 12, "conv14": 14,
}


def import_vgg16_encoder(src) -> dict:
    """torchvision-VGG16 ImageNet weights -> one branch's encoder params.

    The reference initializes every feature branch from
    ``torchvision.models.vgg16(pretrained=True)`` (reference VGG.py:20-28);
    training from scratch without that init will not reach the paper's
    recalls.  ``src`` is a torchvision VGG16 state_dict (keys
    ``features.<i>.weight``/``.bias``), or a path to a ``.pth`` holding one
    (e.g. the torchvision download ``vgg16-397923af.pth``).

    Returns a partial flax params dict {conv0: {kernel, bias}, ...} with
    kernels transposed OIHW -> HWIO.
    """
    import numpy as np

    if isinstance(src, (str, os.PathLike)):
        import torch
        src = torch.load(src, map_location="cpu", weights_only=True)

    def get(name):
        t = src[name]
        try:
            t = t.detach().cpu().numpy()
        except AttributeError:
            t = np.asarray(t)
        return t

    out = {}
    for fname, idx in _VGG16_FEATURE_CONVS.items():
        w = get(f"features.{idx}.weight")
        out[fname] = {"kernel": np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))),
                      "bias": get(f"features.{idx}.bias")}
    return out


def apply_vgg16_init(params: dict, src) -> dict:
    """Overwrite both feature branches' encoder convs with ImageNet weights.

    Mirrors the reference's from-scratch initialization (both SatFeatureNet
    and GrdFeatureNet start from the same pretrained VGG16, VGG.py:20-28).
    Decoder/conf/depth heads keep their fresh random init, as in torch.
    """
    import flax

    enc = import_vgg16_encoder(src)
    params = flax.core.unfreeze(params) if hasattr(params, "unfreeze") \
        else dict(params)
    for branch in ("SatFeatureNet", "GrdFeatureNet"):
        sub = dict(params[branch])
        for conv, kb in enc.items():
            like = sub[conv]
            k = kb["kernel"]
            if conv == "conv0" and like["kernel"].shape[2] > k.shape[2]:
                # model built with pad_input_channels: zero rows for the
                # zero-padded input channels (numerics identical)
                k = np.concatenate(
                    [k, np.zeros(k.shape[:2]
                                 + (like["kernel"].shape[2] - k.shape[2],)
                                 + k.shape[3:], k.dtype)], axis=2)
            assert like["kernel"].shape == k.shape, (
                f"{branch}.{conv}: {like['kernel'].shape} vs {k.shape}")
            sub[conv] = {"kernel": k.astype(np.float32),
                         "bias": kb["bias"].astype(np.float32)}
        params[branch] = sub
    return params


def _import_nnrefine(sd, prefix: str) -> dict:
    """NNrefine (reference RNNs.py:93-126): 4 convs + 2-layer MLP."""

    def t(name):
        return np.asarray(sd[prefix + name].detach().cpu().numpy())

    out = {}
    for i in range(4):
        w = t(f"linear{i}.1.weight")
        out[f"linear{i}"] = {"kernel": np.transpose(w, (2, 3, 1, 0)),
                             "bias": t(f"linear{i}.1.bias")}
    # torch Linear weight is [out, in] -> flax Dense kernel [in, out]
    out["mapping0"] = {"kernel": t("mapping.1.weight").T,
                       "bias": t("mapping.1.bias")}
    out["mapping1"] = {"kernel": t("mapping.3.weight").T,
                       "bias": t("mapping.3.bias")}
    return out
