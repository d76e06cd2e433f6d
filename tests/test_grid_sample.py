"""Sampler parity tests: value vs torch reference semantics, jac vs autodiff."""

import jax
import jax.numpy as jnp
import numpy as np

from highlyaccurate_tpu.ops.grid_sample import grid_sample


def _torch_reference(image_nchw, uv, jac=None):
    """Direct numpy port of the reference sampler (jacobian.py:138-205),
    used as the parity oracle. NCHW like the original."""
    N, C, IH, IW = image_nchw.shape
    ix = uv[..., 0]
    iy = uv[..., 1]
    ix_nw = np.floor(ix); iy_nw = np.floor(iy)
    ix_se = ix_nw + 1; iy_se = iy_nw + 1
    cx_nw = np.clip(ix_nw, 0, IW - 1); cy_nw = np.clip(iy_nw, 0, IH - 1)
    cx_se = np.clip(ix_se, 0, IW - 1); cy_se = np.clip(iy_se, 0, IH - 1)
    mask = ((ix >= 0) & (ix <= IW - 1) & (iy >= 0) & (iy <= IH - 1)).astype(np.float32)
    nw = (cx_se - ix) * (cy_se - iy) * mask
    ne = (ix - cx_nw) * (cy_se - iy) * mask
    sw = (cx_se - ix) * (iy - cy_nw) * mask
    se = (ix - cx_nw) * (iy - cy_nw) * mask
    flat = image_nchw.reshape(N, C, IH * IW)

    def take(cy, cx):
        idx = (cy * IW + cx).astype(np.int64).reshape(N, 1, -1).repeat(C, 1)
        return np.take_along_axis(flat, idx, axis=2).reshape(N, C, *ix.shape[1:])

    nw_v = take(cy_nw, cx_nw); ne_v = take(cy_nw, cx_se)
    sw_v = take(cy_se, cx_nw); se_v = take(cy_se, cx_se)
    out = (nw_v * nw[:, None] + ne_v * ne[:, None]
           + sw_v * sw[:, None] + se_v * se[:, None])
    return out


def test_value_matches_reference_semantics():
    rng = np.random.RandomState(0)
    img = rng.randn(2, 3, 16, 20).astype(np.float32)  # NCHW oracle input
    uv = rng.uniform(-2, 22, size=(2, 8, 9, 2)).astype(np.float32)
    want = _torch_reference(img, uv)

    got, _ = grid_sample(jnp.asarray(img.transpose(0, 2, 3, 1)), jnp.asarray(uv))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-5, atol=1e-5)


def test_out_of_bounds_is_zero():
    img = jnp.ones((1, 8, 8, 2))
    uv = jnp.array([[[[-1.0, 4.0], [9.0, 4.0], [4.0, -0.5], [4.0, 8.5]]]])
    out, _ = grid_sample(img, uv)
    assert np.asarray(out).sum() == 0.0


def test_jac_matches_autodiff():
    """d(sample)/d(pose) chained through duv must equal jax.jacfwd of the
    composed map pose -> uv -> sample (away from integer-grid corners)."""
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(2, 16, 20, 4).astype(np.float32))
    base_uv = jnp.asarray(rng.uniform(1.3, 14.3, size=(2, 5, 6, 2)).astype(np.float32))
    A = jnp.asarray(rng.randn(2, 5, 6, 2, 3).astype(np.float32))  # duv/dpose

    def sample_at_pose(p, b):
        uv = base_uv[b] + jnp.einsum("hwup,p->hwu", A[b], p)
        out, _ = grid_sample(img[b:b + 1], uv[None])
        return out[0]

    pose0 = jnp.zeros(3)
    _, jac = grid_sample(img, base_uv, A)
    for b in range(2):
        auto = jax.jacfwd(sample_at_pose)(pose0, b)  # [5, 6, C, 3]
        np.testing.assert_allclose(np.asarray(jac[b]), np.asarray(auto),
                                   rtol=1e-4, atol=1e-4)


def test_channel_scaling_linearity():
    img = jnp.asarray(np.random.RandomState(2).randn(1, 8, 8, 3).astype(np.float32))
    uv = jnp.asarray(np.random.RandomState(3).uniform(0.5, 6.5, (1, 4, 4, 2)).astype(np.float32))
    out1, _ = grid_sample(img, uv)
    out2, _ = grid_sample(2.0 * img, uv)
    np.testing.assert_allclose(np.asarray(out2), 2 * np.asarray(out1), rtol=1e-6)
