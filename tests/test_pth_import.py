"""End-to-end .pth import-chain validation against the reference's own
module definitions (VERDICT round-1 item 4).

Constructs the REFERENCE VGGUnet in torch (torchvision stubbed with a
randomly initialized VGG16-features stand-in, since the real download needs
network), converts its state_dict through the repo's importers, and asserts
the flax model reproduces the torch outputs bit-for-bit (fp32 tolerance).
This pins every state_dict key name and every kernel-layout transpose.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

REF = "/root/reference"


def _fake_vgg16(*args, **kwargs):
    """Stand-in for torchvision.models.vgg16: only `.features[i]` for
    i in {0,2,5,7,10,12,14} is accessed (reference VGG.py:20-28)."""
    torch.manual_seed(0)
    feats = tnn.Sequential(
        tnn.Conv2d(3, 64, 3, padding=1), tnn.ReLU(),        # 0, 1
        tnn.Conv2d(64, 64, 3, padding=1), tnn.ReLU(),       # 2, 3
        tnn.MaxPool2d(2),                                   # 4
        tnn.Conv2d(64, 128, 3, padding=1), tnn.ReLU(),      # 5, 6
        tnn.Conv2d(128, 128, 3, padding=1), tnn.ReLU(),     # 7, 8
        tnn.MaxPool2d(2),                                   # 9
        tnn.Conv2d(128, 256, 3, padding=1), tnn.ReLU(),     # 10, 11
        tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),     # 12, 13
        tnn.Conv2d(256, 256, 3, padding=1),                 # 14
    )
    return types.SimpleNamespace(features=feats)


@pytest.fixture(scope="module")
def ref_vgg():
    import os
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    for name in ("torchvision", "torchvision.transforms",
                 "torchvision.transforms.functional", "torchvision.models"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    sys.modules["torchvision"].models = sys.modules["torchvision.models"]
    sys.modules["torchvision.transforms"].functional = \
        sys.modules["torchvision.transforms.functional"]
    sys.modules["torchvision.models"].vgg16 = _fake_vgg16
    sys.modules["torchvision"].models.vgg16 = _fake_vgg16
    sys.path.insert(0, REF)
    try:
        import VGG as ref_VGG
    finally:
        sys.path.remove(REF)
    return ref_VGG


def _randomize(module, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return module


@pytest.mark.parametrize("estimate_depth", [0, 1])
def test_branch_output_parity(ref_vgg, estimate_depth):
    """Reference VGGUnet(state_dict) -> torch_branch_to_flax -> identical
    per-level features/confidences (and depths)."""
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.models.vggunet import (VGGUnet,
                                                   torch_branch_to_flax)

    tnet = _randomize(ref_vgg.VGGUnet(level=3, estimate_depth=estimate_depth),
                      seed=1).eval()
    x = torch.randn(2, 3, 32, 64, generator=torch.Generator().manual_seed(2))
    with torch.no_grad():
        tout = tnet(x)
    tfeats, tconfs = tout[0], tout[1]
    tdepths = tout[2] if estimate_depth else None

    params = torch_branch_to_flax(tnet.state_dict(), prefix="",
                                  estimate_depth=bool(estimate_depth))
    jnet = VGGUnet(level=3, estimate_depth=bool(estimate_depth))
    jx = jnp.asarray(np.transpose(x.numpy(), (0, 2, 3, 1)))
    jout = jnet.apply({"params": params}, jx)
    jfeats, jconfs = jout[0], jout[1]
    jdepths = jout[2] if estimate_depth else None

    for lvl in range(3):
        np.testing.assert_allclose(
            np.asarray(jfeats[lvl]),
            np.transpose(tfeats[lvl].numpy(), (0, 2, 3, 1)),
            rtol=1e-4, atol=1e-6, err_msg=f"feat level {lvl}")
        np.testing.assert_allclose(
            np.asarray(jconfs[lvl]),
            np.transpose(tconfs[lvl].numpy(), (0, 2, 3, 1)),
            rtol=1e-4, atol=1e-6, err_msg=f"conf level {lvl}")
        if estimate_depth:
            np.testing.assert_allclose(
                np.asarray(jdepths[lvl]),
                np.transpose(tdepths[lvl].numpy(), (0, 2, 3, 1)),
                rtol=1e-4, atol=1e-6, err_msg=f"depth level {lvl}")


def test_import_pth_full_model(ref_vgg, tmp_path):
    """torch.save a full LM_S2GP-style state_dict -> import_pth -> the flax
    model runs eval and its feature nets reproduce the torch branches."""
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
    from highlyaccurate_tpu.train.checkpoint import import_pth

    sat_b = _randomize(ref_vgg.VGGUnet(level=3), seed=3).eval()
    grd_b = _randomize(ref_vgg.VGGUnet(level=3), seed=4).eval()
    sd = {}
    for prefix, branch in (("SatFeatureNet.", sat_b), ("GrdFeatureNet.", grd_b)):
        for k, v in branch.state_dict().items():
            sd[prefix + k] = v
    sd["damping"] = torch.full((1, 3), 0.25)
    path = tmp_path / "model_1.pth"
    torch.save(sd, path)

    cfg = Config(grd_h=32, grd_w=128, sat_size=64, N_iters=2, level=3,
                 use_banded_warp=0)
    params = import_pth(str(path), cfg)
    np.testing.assert_allclose(np.asarray(params["damping"]), 0.25)

    model = LMS2GP(cfg=cfg)
    rng = np.random.RandomState(5)
    sat = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(2, 32, 128, 3).astype(np.float32))

    # feature-net parity through the imported params
    tfeats, _ = sat_b(torch.from_numpy(
        np.transpose(np.asarray(sat), (0, 3, 1, 2))))
    jfeats, _, _, _ = model.apply({"params": params}, sat, grd,
                                  method="extract_features")
    np.testing.assert_allclose(
        np.asarray(jfeats[0]),
        np.transpose(tfeats[0].detach().numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-6)

    # and the whole eval forward runs on the imported params
    lat, lon, th = model.apply({"params": params}, sat, grd, mode="test",
                               rngs={"lm": jax.random.PRNGKey(0)})
    assert np.all(np.isfinite(np.asarray(lat)))


def test_cli_pretrained_vgg16_train(tmp_path):
    """--pretrained_vgg16 plumbs through the KITTI CLI train path."""
    import os
    from highlyaccurate_tpu.cli import train_kitti as cli
    from highlyaccurate_tpu.config import config_from_args

    vgg = _fake_vgg16()
    sd = {f"features.{i}.{p}": t
          for i, m in enumerate(vgg.features)
          if isinstance(m, tnn.Conv2d)
          for p, t in (("weight", m.weight.data), ("bias", m.bias.data))}
    pth = tmp_path / "vgg16_imagenet.pth"
    torch.save(sd, pth)

    argv = ["--test", "0", "--epochs", "1", "--synthetic", "2",
            "--batch_size", "2", "--level", "-1", "--N_iters", "1",
            "--save_root", str(tmp_path), "--pretrained_vgg16", str(pth)]
    args = cli.parse_args(argv)
    cfg = config_from_args(args)
    cfg = cfg.__class__(**{**cfg.__dict__, "grd_h": 32, "grd_w": 128,
                           "sat_size": 64})
    save_path = cfg.save_path(str(tmp_path))
    os.makedirs(save_path, exist_ok=True)
    model = cli.build_model(cfg)
    cli.train(model, cfg, args, save_path)
    assert os.path.exists(os.path.join(save_path, "model_0"))


def test_vgg16_imagenet_init(ref_vgg):
    """apply_vgg16_init writes the 7 encoder convs of both branches from a
    torchvision-format VGG16 state_dict and leaves everything else alone."""
    import jax
    import jax.numpy as jnp
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP
    from highlyaccurate_tpu.train.checkpoint import apply_vgg16_init

    vgg = _fake_vgg16()
    sd = {f"features.{i}.{p}": t
          for i, m in enumerate(vgg.features)
          if isinstance(m, tnn.Conv2d)
          for p, t in (("weight", m.weight.data), ("bias", m.bias.data))}

    cfg = Config(grd_h=32, grd_w=128, sat_size=64, N_iters=2, level=3)
    model = LMS2GP(cfg=cfg)
    rng = np.random.RandomState(6)
    sat = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(2, 32, 128, 3).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "lm": jax.random.PRNGKey(1)}, sat, grd,
                           jnp.zeros((2, 3)), mode="train")
    params = variables["params"]

    new = apply_vgg16_init(params, sd)
    for branch in ("SatFeatureNet", "GrdFeatureNet"):
        np.testing.assert_allclose(
            np.asarray(new[branch]["conv0"]["kernel"]),
            np.transpose(vgg.features[0].weight.detach().numpy(),
                         (2, 3, 1, 0)))
        np.testing.assert_allclose(
            np.asarray(new[branch]["conv14"]["bias"]),
            vgg.features[14].bias.detach().numpy())
        # decoder untouched
        np.testing.assert_array_equal(
            np.asarray(new[branch]["dec1"]["conv_a"]["kernel"]),
            np.asarray(params[branch]["dec1"]["conv_a"]["kernel"]))
