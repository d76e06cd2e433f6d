"""VGG16-UNet feature pyramid extractors (flax.linen, NHWC).

TPU-native re-design of the reference's feature networks
(reference: /root/reference/VGG.py:13-345).

Topology preserved exactly:
  * encoder = first three VGG16 conv blocks (conv0/2 -> pool -> conv5/7 ->
    pool -> conv10/12/14 -> pool), ImageNet-pretrained when a converted
    checkpoint is supplied;
  * decoder = 3 nearest-upsample + concat-skip + double-conv stages
    (128, 64, 16 channels);
  * per-level confidence heads c = sigmoid(-sigmoid(conv(relu(x)))) — the
    double sigmoid is a reference quirk (VGG.py:62-81, 160-163) kept for
    checkpoint parity;
  * optional per-level height ("depth") heads with zero-init final conv and
    the ground/sky split post-process (VGG.py:85-118, 348-352);
  * whole-map L2 normalization of each feature level (VGG.py:511-514);
  * ``level`` selects the returned pyramid slice (VGG.py:178-203).

TPU-first deltas: channel-last layout, bf16-friendly compute dtype, and the
G2S re-layout variant implemented as a reshape on NHWC tensors.
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


def l2_norm_wholemap(x):
    """Normalize each sample's whole [H, W, C] map to unit L2 norm.

    Reference VGG.py:511-514 (F.normalize over flattened C*H*W, eps=1e-12).
    """
    B = x.shape[0]
    flat = x.reshape(B, -1).astype(jnp.float32)
    # sqrt(max(sum_sq, eps)) keeps the backward NaN-free at exactly-zero maps
    norm = jnp.sqrt(jnp.maximum(jnp.sum(flat * flat, axis=-1), 1e-24))
    return (x / norm.reshape(B, 1, 1, 1).astype(x.dtype))


def process_depth(d):
    """Tanh height map -> meters, 10 m cap above horizon / 1.6 m below.

    Reference VGG.py:348-352 ([-1,1] -> [0,1], top half x10, bottom x1.6).
    NHWC: d is [B, H, W, 1].
    """
    H = d.shape[1]
    d = (d + 1) / 2
    return jnp.concatenate([d[:, : H // 2] * 10.0, d[:, H // 2:] * 1.6], axis=1)


class _ConvBlock(nn.Module):
    """relu -> conv -> relu -> conv (decoder stage, bias-free convs)."""
    mid: int
    out: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(x)
        x = nn.Conv(self.mid, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv_a")(x)
        x = nn.relu(x)
        x = nn.Conv(self.out, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv_b")(x)
        return x


class _ConfHead(nn.Module):
    """relu -> conv(->1) -> sigmoid; caller applies the outer sigmoid(-x)."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(x)
        x = nn.Conv(1, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv")(x)
        return nn.sigmoid(x)


class _DepthHead(nn.Module):
    """relu -> conv -> relu -> conv(->1, zero-init) -> tanh (VGG.py:85-118)."""
    mid: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(x)
        x = nn.Conv(self.mid, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv_a")(x)
        x = nn.relu(x)
        x = nn.Conv(1, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.zeros, name="conv_b")(x)
        return jnp.tanh(x)


def max_pool_2x2(x):
    """2x2 stride-2 max pool via reshape+max (NHWC, even H and W).

    Bit-identical to ``nn.max_pool(x, (2, 2), strides=(2, 2))`` — the max is
    taken over the same disjoint 2x2 windows — but lowers to a reshape+reduce
    instead of ``lax.reduce_window``, which the round-4 TPU probe measured at
    11.2 ms standalone for the [32, 512, 512, 64] pool (scripts/
    r4_feat_probe.py) — and whose backward is a select_and_scatter, far
    costlier on TPU than the elementwise selects this form differentiates
    to. All reference pool sites have even H, W
    (/root/reference/VGG.py:121-141 pools 512/256/128-sized maps).

    Backward note: on an EXACT tie inside a 2x2 window, reduce_window's
    gradient routes to one window element while ``jnp.maximum`` splits it
    evenly — both are valid subgradients, and ties are measure-zero on the
    continuous conv outputs this pools.
    """
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return jnp.maximum(jnp.maximum(x[:, :, 0, :, 0], x[:, :, 0, :, 1]),
                       jnp.maximum(x[:, :, 1, :, 0], x[:, :, 1, :, 1]))


def _upsample_nearest(x, target_hw):
    B, H, W, C = x.shape
    th, tw = target_hw
    # integer-factor nearest upsample (all reference shapes are 2x)
    if th % H == 0 and tw % W == 0:
        x = jnp.repeat(x, th // H, axis=1)
        x = jnp.repeat(x, tw // W, axis=2)
        return x
    import jax
    return jax.image.resize(x, (B, th, tw, C), method="nearest")


class VGGUnet(nn.Module):
    """Two-branch-shareable VGG16-UNet pyramid extractor.

    Returns (features, confidences[, depths]) lists ordered coarse->fine,
    sliced per ``level`` exactly like reference VGG.py:178-203.
    """
    level: int
    estimate_depth: bool = False
    g2s_rearrange: bool = False  # VGGUnet_G2S re-layout (VGG.py:276-345)
    dtype: Any = jnp.float32
    pad_cin: int = 0  # zero-pad the input to this channel count before the
    #   first conv (see Config.pad_input_channels) — numerics identical

    @nn.compact
    def __call__(self, x) -> Tuple[List[jnp.ndarray], ...]:
        x = x.astype(self.dtype)
        if self.pad_cin > x.shape[-1]:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0),
                            (0, self.pad_cin - x.shape[-1])))
        conv = lambda c, name: nn.Conv(c, (3, 3), padding=1, use_bias=True,
                                       dtype=self.dtype, name=name)
        pool = max_pool_2x2

        # encoder: VGG16 block 1-3 (VGG.py:121-141)
        x2 = conv(64, "conv2")(nn.relu(conv(64, "conv0")(x)))
        x3 = pool(x2)                       # H/2
        x7 = conv(128, "conv7")(nn.relu(conv(128, "conv5")(nn.relu(x3))))
        x8 = pool(x7)                       # H/4
        x14 = conv(256, "conv14")(
            nn.relu(conv(256, "conv12")(nn.relu(conv(256, "conv10")(nn.relu(x8))))))
        x15 = pool(x14)                     # H/8

        def g2s(t):
            # [B, H, W, C] -> [B, 2H, W/2, C] preserving NCHW reshape order
            # (reference VGG.py:283-308 reshapes [B,C,H,W]->[B,C,2H,W/2]).
            B, H, W, C = t.shape
            t = jnp.transpose(t, (0, 3, 1, 2)).reshape(B, C, 2 * H, W // 2)
            return jnp.transpose(t, (0, 2, 3, 1))

        if self.g2s_rearrange:
            x2_, x3_, x8_, x15_ = g2s(x2), g2s(x3), g2s(x8), g2s(x15)
        else:
            x2_, x3_, x8_, x15_ = x2, x3, x8, x15

        # decoder (VGG.py:143-155)
        x16 = _upsample_nearest(x15_, x8_.shape[1:3])
        x18 = _ConvBlock(128, 128, self.dtype, name="dec1")(
            jnp.concatenate([x16, x8_], axis=-1))
        x19 = _upsample_nearest(x18, x3_.shape[1:3])
        x21 = _ConvBlock(64, 64, self.dtype, name="dec2")(
            jnp.concatenate([x19, x3_], axis=-1))
        x22 = _upsample_nearest(x21, x2_.shape[1:3])
        x24 = _ConvBlock(32, 16, self.dtype, name="dec3")(
            jnp.concatenate([x22, x2_], axis=-1))

        # confidences: note heads see the *pre-rearrange* x15 in the G2S
        # variant (reference VGG.py:324-327) — preserved.
        c0 = nn.sigmoid(-_ConfHead(self.dtype, name="conf0")(x15))
        c1 = nn.sigmoid(-_ConfHead(self.dtype, name="conf1")(x18))
        c2 = nn.sigmoid(-_ConfHead(self.dtype, name="conf2")(x21))
        c3 = nn.sigmoid(-_ConfHead(self.dtype, name="conf3")(x24))

        if self.estimate_depth:
            d0 = process_depth(_DepthHead(64, self.dtype, name="depth0")(x15))
            d1 = process_depth(_DepthHead(32, self.dtype, name="depth1")(x18))
            d2 = process_depth(_DepthHead(16, self.dtype, name="depth2")(x21))
            d3 = process_depth(_DepthHead(16, self.dtype, name="depth3")(x24))

        f0 = l2_norm_wholemap(x15_)
        f1 = l2_norm_wholemap(x18)
        f2 = l2_norm_wholemap(x21)
        f3 = l2_norm_wholemap(x24)

        feats, confs = [f0, f1, f2, f3], [c0, c1, c2, c3]
        sel = {
            -1: [0], -2: [1], -3: [2],
            2: [1, 2], 3: [0, 1, 2], 4: [0, 1, 2, 3],
        }[self.level]
        out_f = [feats[i] for i in sel]
        out_c = [confs[i] for i in sel]
        if self.estimate_depth:
            depths = [d0, d1, d2, d3]
            return out_f, out_c, [depths[i] for i in sel]
        return out_f, out_c


# ---------------------------------------------------------------------------
# torch .pth state_dict -> flax params converter
# ---------------------------------------------------------------------------

_ENC_MAP = {
    "conv0": "conv0", "conv2": "conv2", "conv5": "conv5",
    "conv7": "conv7", "conv10": "conv10", "conv12": "conv12",
    "conv14": "conv14",
}
# torch Sequential indices of the two convs in each decoder stage (VGG.py:31-56)
_DEC_MAP = {"conv_dec1": "dec1", "conv_dec2": "dec2", "conv_dec3": "dec3"}
_CONF_MAP = {"conf0": "conf0", "conf1": "conf1", "conf2": "conf2", "conf3": "conf3"}
_DEPTH_MAP = {"depth0": "depth0", "depth1": "depth1", "depth2": "depth2",
              "depth3": "depth3"}


def _oihw_to_hwio(w):
    import numpy as np
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def torch_branch_to_flax(state_dict: dict, prefix: str = "",
                         estimate_depth: bool = False,
                         pad_cin: int = 0) -> dict:
    """Convert one VGGUnet branch of a reference ``state_dict`` to flax params.

    ``prefix`` like ``"SatFeatureNet."``; tensors may be torch.Tensor or numpy.
    Layout: conv kernels OIHW -> HWIO. Returns a flax params dict for VGGUnet.
    ``pad_cin``: zero-pad conv0's input-channel dim to match a model built
    with ``pad_cin`` input padding (numerics identical — padded input
    channels are zero).
    """
    import numpy as np

    def get(name):
        t = state_dict[prefix + name]
        try:
            t = t.detach().cpu().numpy()
        except AttributeError:
            t = np.asarray(t)
        return t

    p: dict = {}
    for tname, fname in _ENC_MAP.items():
        k = _oihw_to_hwio(get(f"{tname}.weight"))
        if fname == "conv0" and pad_cin > k.shape[2]:
            k = np.concatenate(
                [k, np.zeros(k.shape[:2] + (pad_cin - k.shape[2],)
                             + k.shape[3:], k.dtype)], axis=2)
        p[fname] = {"kernel": k,
                    "bias": np.asarray(get(f"{tname}.bias"))}
    for tname, fname in _DEC_MAP.items():
        p[fname] = {
            "conv_a": {"kernel": _oihw_to_hwio(get(f"{tname}.1.weight"))},
            "conv_b": {"kernel": _oihw_to_hwio(get(f"{tname}.3.weight"))},
        }
    for tname, fname in _CONF_MAP.items():
        p[fname] = {"conv": {"kernel": _oihw_to_hwio(get(f"{tname}.1.weight"))}}
    if estimate_depth:
        for tname, fname in _DEPTH_MAP.items():
            p[fname] = {
                "conv_a": {"kernel": _oihw_to_hwio(get(f"{tname}.1.weight"))},
                "conv_b": {"kernel": _oihw_to_hwio(get(f"{tname}.3.weight"))},
            }
    return p
