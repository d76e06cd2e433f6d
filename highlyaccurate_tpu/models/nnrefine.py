"""Learned pose-update head (alternative to the LM step).

TPU-native re-implementation of the reference's NNrefine
(reference: /root/reference/RNNs.py:93-126): residual feature -> a
channel-width-specific 3x3 conv -> global mean pool -> 2-layer MLP -> tanh
delta-pose in [-1, 1]^3.

Channel-last layout; the per-width conv is selected statically by C.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp


class NNrefine(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pred_feat, ref_feat):
        """pred_feat, ref_feat: [B, H, W, C] with C in {256, 128, 64, 16}."""
        r = pred_feat - ref_feat
        C = r.shape[-1]
        name = {256: "linear0", 128: "linear1", 64: "linear2", 16: "linear3"}[C]
        x = nn.Conv(64, (3, 3), padding=1, dtype=self.dtype, name=name)(nn.relu(r))
        x = jnp.mean(x, axis=(1, 2))  # [B, 64]
        x = nn.relu(x)
        x = nn.Dense(16, dtype=self.dtype, name="mapping0")(x)
        x = nn.relu(x)
        x = nn.Dense(3, dtype=self.dtype, name="mapping1")(x)
        return jnp.tanh(x).astype(jnp.float32)
