"""VGGUnet feature extractor tests: shapes, norms, importer layout parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from highlyaccurate_tpu.models.vggunet import (
    VGGUnet, l2_norm_wholemap, process_depth, torch_branch_to_flax)


@pytest.fixture(scope="module")
def small_outputs():
    net = VGGUnet(level=4)
    x = jnp.asarray(np.random.RandomState(0).rand(1, 32, 64, 3).astype(np.float32))
    params = net.init(jax.random.PRNGKey(0), x)
    feats, confs = net.apply(params, x)
    return feats, confs


def test_pyramid_shapes(small_outputs):
    feats, confs = small_outputs
    # coarse (H/8) -> fine (H), channels 256/128/64/16 (reference VGG.py:121-203)
    assert [f.shape for f in feats] == [
        (1, 4, 8, 256), (1, 8, 16, 128), (1, 16, 32, 64), (1, 32, 64, 16)]
    assert [c.shape for c in confs] == [
        (1, 4, 8, 1), (1, 8, 16, 1), (1, 16, 32, 1), (1, 32, 64, 1)]


def test_features_unit_norm(small_outputs):
    feats, _ = small_outputs
    for f in feats:
        n = np.linalg.norm(np.asarray(f).reshape(1, -1))
        np.testing.assert_allclose(n, 1.0, rtol=1e-4)


def test_confidence_range(small_outputs):
    """c = sigmoid(-sigmoid(conv(...))) in (sigmoid(-1), 0.5) (VGG.py:160-163)."""
    _, confs = small_outputs
    for c in confs:
        arr = np.asarray(c)
        assert (arr > 1 / (1 + np.e)).all() and (arr < 0.5).all()


def test_level_selection():
    x = jnp.zeros((1, 32, 64, 3))
    for level, n in [(-1, 1), (-3, 1), (2, 2), (3, 3), (4, 4)]:
        net = VGGUnet(level=level)
        params = net.init(jax.random.PRNGKey(0), x)
        feats, confs = net.apply(params, x)
        assert len(feats) == n and len(confs) == n


def test_g2s_rearrange_shapes():
    net = VGGUnet(level=3, g2s_rearrange=True)
    x = jnp.zeros((1, 32, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    feats, confs = net.apply(params, x)
    # coarse level re-laid-out [B, 2H, W/2, C] (reference VGG.py:283-308)
    assert feats[0].shape == (1, 8, 4, 256)


def test_estimate_depth_heads():
    net = VGGUnet(level=3, estimate_depth=True)
    x = jnp.zeros((1, 32, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    feats, confs, depths = net.apply(params, x)
    assert len(depths) == 3
    d = np.asarray(depths[0])
    # zero-init final conv -> tanh(0)=0 -> (0+1)/2 scaled 10 / 1.6
    H = d.shape[1]
    np.testing.assert_allclose(d[:, :H // 2], 5.0, atol=1e-5)
    np.testing.assert_allclose(d[:, H // 2:], 0.8, atol=1e-5)


def test_process_depth_ranges():
    d = jnp.ones((1, 4, 4, 1))
    out = np.asarray(process_depth(d))
    np.testing.assert_allclose(out[:, :2], 10.0)
    np.testing.assert_allclose(out[:, 2:], 1.6)


def test_l2_norm_wholemap_zero_safe():
    out = np.asarray(l2_norm_wholemap(jnp.zeros((2, 4, 4, 3))))
    assert np.isfinite(out).all()


def test_torch_importer_layout_parity():
    """Converted torch conv weights must reproduce torch conv outputs."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    w = rng.randn(8, 3, 3, 3).astype(np.float32)  # OIHW
    b = rng.randn(8).astype(np.float32)
    x = rng.randn(1, 3, 10, 12).astype(np.float32)  # NCHW

    want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                    torch.from_numpy(b), padding=1).numpy()

    import flax.linen as fnn
    conv = fnn.Conv(8, (3, 3), padding=1)
    params = {"params": {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
                         "bias": jnp.asarray(b)}}
    got = conv.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-4)


def test_torch_branch_to_flax_structure():
    """Importer maps a reference-shaped state_dict onto VGGUnet params."""
    rng = np.random.RandomState(1)

    def conv_w(o, i):
        return rng.randn(o, i, 3, 3).astype(np.float32)

    sd = {}
    enc = {"conv0": (64, 3), "conv2": (64, 64), "conv5": (128, 64),
           "conv7": (128, 128), "conv10": (256, 128), "conv12": (256, 256),
           "conv14": (256, 256)}
    for k, (o, i) in enc.items():
        sd[f"N.{k}.weight"] = conv_w(o, i)
        sd[f"N.{k}.bias"] = rng.randn(o).astype(np.float32)
    for k, (a, b_, c) in {"conv_dec1": (384, 128, 128),
                          "conv_dec2": (192, 64, 64),
                          "conv_dec3": (128, 32, 16)}.items():
        sd[f"N.{k}.1.weight"] = conv_w(b_, a)
        sd[f"N.{k}.3.weight"] = conv_w(c, b_)
    for k, c in {"conf0": 256, "conf1": 128, "conf2": 64, "conf3": 16}.items():
        sd[f"N.{k}.1.weight"] = conv_w(1, c)

    p = torch_branch_to_flax(sd, prefix="N.")
    net = VGGUnet(level=4)
    x = jnp.zeros((1, 32, 64, 3))
    init_p = net.init(jax.random.PRNGKey(0), x)["params"]

    # identical tree structure and shapes
    flat_ref = jax.tree_util.tree_map(lambda a: a.shape, init_p)
    flat_new = jax.tree_util.tree_map(lambda a: a.shape, p)
    assert flat_ref == flat_new

    feats, confs = net.apply({"params": p}, jnp.asarray(
        np.random.RandomState(2).rand(1, 32, 64, 3).astype(np.float32)))
    assert np.isfinite(np.asarray(feats[0])).all()


def test_pad_cin_numerics_identical():
    """Zero-padding the input channels (Config.pad_input_channels) must not
    change any output: padded input channels are zero, so zero-padded conv0
    kernel rows contribute nothing."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.rand(2, 32, 64, 3).astype(np.float32))

    base = VGGUnet(level=3)
    p0 = base.init(jax.random.PRNGKey(0), x)["params"]
    feats0, confs0 = base.apply({"params": p0}, x)

    # pad conv0's kernel input dim 3 -> 8 with zero rows
    k = np.asarray(p0["conv0"]["kernel"])
    kpad = np.concatenate(
        [k, np.zeros(k.shape[:2] + (5,) + k.shape[3:], k.dtype)], axis=2)
    p8 = dict(p0)
    p8["conv0"] = {"kernel": jnp.asarray(kpad), "bias": p0["conv0"]["bias"]}

    padded = VGGUnet(level=3, pad_cin=8)
    feats8, confs8 = padded.apply({"params": p8}, x)
    for a, b in zip(list(feats0) + list(confs0), list(feats8) + list(confs8)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # importer path: pad_cin widens only conv0's kernel, with zero rows
    sd = {"N.conv0.weight": np.transpose(k, (3, 2, 0, 1)),
          "N.conv0.bias": np.asarray(p0["conv0"]["bias"])}
    enc = {"conv2": (64, 64), "conv5": (128, 64), "conv7": (128, 128),
           "conv10": (256, 128), "conv12": (256, 256), "conv14": (256, 256)}
    for kk, (o, i) in enc.items():
        sd[f"N.{kk}.weight"] = rng.randn(o, i, 3, 3).astype(np.float32)
        sd[f"N.{kk}.bias"] = rng.randn(o).astype(np.float32)
    for kk, (a, b_, c) in {"conv_dec1": (384, 128, 128),
                           "conv_dec2": (192, 64, 64),
                           "conv_dec3": (128, 32, 16)}.items():
        sd[f"N.{kk}.1.weight"] = rng.randn(b_, a, 3, 3).astype(np.float32)
        sd[f"N.{kk}.3.weight"] = rng.randn(c, b_, 3, 3).astype(np.float32)
    for kk, c in {"conf0": 256, "conf1": 128, "conf2": 64,
                  "conf3": 16}.items():
        sd[f"N.{kk}.1.weight"] = rng.randn(1, c, 3, 3).astype(np.float32)
    imp = torch_branch_to_flax(sd, prefix="N.", pad_cin=8)
    assert imp["conv0"]["kernel"].shape == (3, 3, 8, 64)
    np.testing.assert_array_equal(np.asarray(imp["conv0"]["kernel"])[:, :, 3:],
                                  0.0)
    np.testing.assert_allclose(np.asarray(imp["conv0"]["kernel"])[:, :, :3], k,
                               rtol=1e-6)


def test_max_pool_2x2_matches_reduce_window():
    """Reshape-max pool is bit-identical to flax nn.max_pool (2x2, stride 2)."""
    import flax.linen as nn
    from highlyaccurate_tpu.models.vggunet import max_pool_2x2
    x = jnp.asarray(np.random.RandomState(3).randn(2, 16, 24, 7)
                    .astype(np.float32))
    want = nn.max_pool(x, (2, 2), strides=(2, 2))
    got = max_pool_2x2(x)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # gradients agree away from exact ties (randn input: no ties)
    g_want = jax.grad(lambda t: jnp.sum(
        nn.max_pool(t, (2, 2), strides=(2, 2)) ** 2))(x)
    g_got = jax.grad(lambda t: jnp.sum(max_pool_2x2(t) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_want),
                               atol=1e-6)
