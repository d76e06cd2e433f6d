"""Banded line-sampler parity vs grid_sample (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from highlyaccurate_tpu.ops.grid_sample import grid_sample
from highlyaccurate_tpu.ops.pallas.banded_warp import make_banded_sampler

B, A, C, V, W, RB = 2, 32, 8, 4, 16, 16


def _lines(seed=0, gentle=True):
    """Random per-row affine uv lines with |slope| < 1."""
    rng = np.random.RandomState(seed)
    ax = rng.uniform(-4, A + 4, (B, V))
    ay = rng.uniform(0, A - 1, (B, V))
    bx = rng.uniform(0.5, 2.0, (B, V)) * rng.choice([-1, 1], (B, V))
    by = bx * rng.uniform(-0.6, 0.6, (B, V))  # |slope| < 1
    uv0 = np.stack([ax, ay], -1).astype(np.float32)
    uv1 = np.stack([ax + bx, ay + by], -1).astype(np.float32)
    return jnp.asarray(uv0), jnp.asarray(uv1)


def _uv_grid(uv0, uv1):
    u = jnp.arange(W, dtype=jnp.float32)
    A_ = uv0[:, :, None, :]
    B_ = (uv1 - uv0)[:, :, None, :]
    return A_ + u[None, None, :, None] * B_  # [B, V, W, 2]


@pytest.fixture(scope="module")
def sampler():
    return make_banded_sampler(A=A, C=C, V=V, W=W, RB=RB, interpret=True)


def test_value_and_derivative_parity(sampler):
    rng = np.random.RandomState(1)
    sat = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
    uv0, uv1 = _lines()
    out, dx, dy = sampler(sat, uv0, uv1)

    uv = _uv_grid(uv0, uv1)
    # oracle: grid_sample with duv = identity(2) gives (value, [d/dx, d/dy])
    duv = jnp.broadcast_to(jnp.eye(2), uv.shape[:-1] + (2, 2))
    want, wjac = grid_sample(sat, uv.reshape(B, V * W, 1, 2),
                             duv.reshape(B, V * W, 1, 2, 2))
    want = want.reshape(B, V, W, C)
    wdx = wjac.reshape(B, V, W, C, 2)[..., 0]
    wdy = wjac.reshape(B, V, W, C, 2)[..., 1]

    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(wdx),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(wdy),
                               rtol=1e-5, atol=1e-5)


def test_out_of_bounds_rows_zero(sampler):
    rng = np.random.RandomState(2)
    sat = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
    # lines far outside the map
    uv0 = jnp.full((B, V, 2), -100.0)
    uv1 = jnp.full((B, V, 2), -99.0)
    out, dx, dy = sampler(sat, uv0, uv1)
    assert float(jnp.abs(out).max()) == 0.0
    assert float(jnp.abs(dx).max()) == 0.0


def test_steep_slope_still_exact():
    """|slope| close to 1 exercises the 4-row sheared band edges."""
    sampler = make_banded_sampler(A=A, C=C, V=V, W=W, RB=A, interpret=True)
    rng = np.random.RandomState(3)
    sat = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
    ax = rng.uniform(2, A - 2, (B, V))
    ay = rng.uniform(2, A - 2, (B, V))
    bx = rng.uniform(0.8, 1.2, (B, V))
    by = bx * rng.uniform(-0.95, 0.95, (B, V))
    uv0 = jnp.asarray(np.stack([ax, ay], -1).astype(np.float32))
    uv1 = jnp.asarray(np.stack([ax + bx, ay + by], -1).astype(np.float32))
    out, dx, dy = sampler(sat, uv0, uv1)

    uv = _uv_grid(uv0, uv1)
    want, _ = grid_sample(sat, uv.reshape(B, V * W, 1, 2))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(want).reshape(B, V, W, C),
                               rtol=1e-5, atol=1e-5)


def test_cfirst_layout_parity():
    """Exercise the transposed-window path (C not 128-aligned, A aligned)."""
    A2, C2, V2, W2 = 128, 8, 2, 8
    sampler = make_banded_sampler(A=A2, C=C2, V=V2, W=W2, RB=32,
                                  interpret=True)
    rng = np.random.RandomState(5)
    sat = jnp.asarray(rng.rand(1, A2, A2, C2).astype(np.float32))
    ax = rng.uniform(10, 100, (1, V2))
    ay = rng.uniform(10, 100, (1, V2))
    bx = rng.uniform(0.5, 2.0, (1, V2))
    by = bx * rng.uniform(-0.5, 0.5, (1, V2))
    uv0 = jnp.asarray(np.stack([ax, ay], -1).astype(np.float32))
    uv1 = jnp.asarray(np.stack([ax + bx, ay + by], -1).astype(np.float32))
    out, dx, dy = sampler(sat, uv0, uv1)

    u = jnp.arange(W2, dtype=jnp.float32)
    uv = uv0[:, :, None, :] + u[None, None, :, None] * (uv1 - uv0)[:, :, None, :]
    want, _ = grid_sample(sat, uv.reshape(1, V2 * W2, 1, 2))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(want).reshape(1, V2, W2, C2),
                               rtol=1e-5, atol=1e-5)


def test_custom_vjp_grad_parity():
    """Gradients through the banded sampler (w.r.t. sat and line coefs)
    match autodiff through the grid_sample composition."""
    rng = np.random.RandomState(7)
    sat = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
    uv0, uv1 = _lines(seed=8)
    cw = jnp.asarray(rng.randn(B, V, W, C).astype(np.float32))
    cx = jnp.asarray(rng.randn(B, V, W, C).astype(np.float32))
    cy = jnp.asarray(rng.randn(B, V, W, C).astype(np.float32))

    sampler = make_banded_sampler(A=A, C=C, V=V, W=W, RB=RB, interpret=True)

    def loss_banded(sat, uv0, uv1):
        out, dx, dy = sampler(sat, uv0, uv1)
        return jnp.sum(cw * out) + jnp.sum(cx * dx) + jnp.sum(cy * dy)

    def loss_oracle(sat, uv0, uv1):
        uv = _uv_grid(uv0, uv1)
        duv = jnp.broadcast_to(jnp.eye(2), uv.shape[:-1] + (2, 2))
        out, jac = grid_sample(sat, uv.reshape(B, V * W, 1, 2),
                               duv.reshape(B, V * W, 1, 2, 2))
        out = out.reshape(B, V, W, C)
        dx = jac.reshape(B, V, W, C, 2)[..., 0]
        dy = jac.reshape(B, V, W, C, 2)[..., 1]
        return jnp.sum(cw * out) + jnp.sum(cx * dx) + jnp.sum(cy * dy)

    gb = jax.grad(loss_banded, argnums=(0, 1, 2))(sat, uv0, uv1)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(sat, uv0, uv1)
    for name, a, b in zip(("sat", "uv0", "uv1"), gb, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-3, err_msg=name)


def test_windowed_kernel_still_exact(monkeypatch):
    """Force the windowed (DMA) kernel even at small shapes (the full-map
    variant handles small tests by default)."""
    from highlyaccurate_tpu.ops.pallas import banded_warp as bwmod
    monkeypatch.setattr(bwmod, "_FULLMAP_VMEM_BUDGET", 0)
    sampler = bwmod.make_banded_sampler(A=A, C=C, V=V, W=W, RB=RB,
                                        interpret=True)
    rng = np.random.RandomState(11)
    sat = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
    uv0, uv1 = _lines(seed=12)
    out, dx, dy = sampler(sat, uv0, uv1)
    uv = _uv_grid(uv0, uv1)
    want, _ = grid_sample(sat, uv.reshape(B, V * W, 1, 2))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(want).reshape(B, V, W, C),
                               rtol=1e-5, atol=1e-5)


def test_bf16_map_close():
    sampler = make_banded_sampler(A=A, C=C, V=V, W=W, RB=RB, interpret=True,
                                  bf16_map=True)
    rng = np.random.RandomState(13)
    sat = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
    uv0, uv1 = _lines(seed=14)
    out, _, _ = sampler(sat, uv0, uv1)
    uv = _uv_grid(uv0, uv1)
    want, _ = grid_sample(sat, uv.reshape(B, V * W, 1, 2))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(want).reshape(B, V, W, C),
                               rtol=2e-2, atol=1e-2)


def test_fullmap_kernel_interpret(monkeypatch):
    """Full-map variant ≡ windowed variant bit-for-bit (both scan the same
    RB-row window at oy; full-map reads resident VMEM instead of DMA), and
    exact vs grid_sample on lines within the window guard."""
    from highlyaccurate_tpu.ops.pallas import banded_warp as bwmod
    rng = np.random.RandomState(21)
    sat = jnp.asarray(rng.rand(B, A, A, C).astype(np.float32))
    uv0, uv1 = _lines(seed=22)

    monkeypatch.setattr(bwmod, "_FULLMAP_VMEM_BUDGET", 10 * 2 ** 20)
    full = bwmod.make_banded_sampler(A=A, C=C, V=V, W=W, RB=RB,
                                     interpret=True)(sat, uv0, uv1)
    monkeypatch.setattr(bwmod, "_FULLMAP_VMEM_BUDGET", 0)
    win = bwmod.make_banded_sampler(A=A, C=C, V=V, W=W, RB=RB,
                                    interpret=True)(sat, uv0, uv1)
    for f, w in zip(full, win):
        np.testing.assert_array_equal(np.asarray(f), np.asarray(w))

    # gentle lines stay within the RB window guard -> exact vs grid_sample
    monkeypatch.setattr(bwmod, "_FULLMAP_VMEM_BUDGET", 10 * 2 ** 20)
    uv0, uv1 = _lines(seed=12)
    out, _, _ = bwmod.make_banded_sampler(A=A, C=C, V=V, W=W, RB=RB,
                                          interpret=True)(sat, uv0, uv1)
    uv = _uv_grid(uv0, uv1)
    want, _ = grid_sample(sat, uv.reshape(B, V * W, 1, 2))
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(want).reshape(B, V, W, C),
                               rtol=1e-5, atol=1e-5)


def test_multiblock_backward_parity(monkeypatch):
    """Backward accumulator column-blocking (col0 > 0) — production hits it
    at the finest levels (A=512 C=16 runs cfirst with 2 column blocks) but
    the default test shapes fit one block.  Force 2 blocks in both layouts
    and check map gradients vs autodiff of the grid_sample composition."""
    from highlyaccurate_tpu.ops.pallas import banded_warp as bwmod
    monkeypatch.setattr(
        bwmod, "_bwd_col_blocks",
        lambda A, C, cfirst, target=0: max(128 if cfirst else 8, A // 2))

    for A2, C2 in [(32, 8),     # noncfirst, CB=16 -> 2 blocks
                   (256, 8)]:   # cfirst (A%128==0), CB=128 -> 2 blocks
        V2, W2, RB2 = 4, 8, 16
        sampler = bwmod.make_banded_sampler(A=A2, C=C2, V=V2, W=W2, RB=RB2,
                                            interpret=True)
        rng = np.random.RandomState(31 + A2)
        sat = jnp.asarray(rng.rand(1, A2, A2, C2).astype(np.float32))
        ax = rng.uniform(2, A2 - 6, (1, V2))
        ay = rng.uniform(2, A2 - 6, (1, V2))
        bx = rng.uniform(0.4, 1.0, (1, V2))
        by = bx * rng.uniform(-0.5, 0.5, (1, V2))
        uv0 = jnp.asarray(np.stack([ax, ay], -1).astype(np.float32))
        uv1 = jnp.asarray(np.stack([ax + bx, ay + by], -1).astype(np.float32))
        cw = jnp.asarray(rng.randn(1, V2, W2, C2).astype(np.float32))

        def loss_b(s):
            o, dx, dy = sampler(s, uv0, uv1)
            return jnp.sum(cw * o) + jnp.sum(dx) * 1e-2 + jnp.sum(dy) * 1e-2

        def loss_o(s):
            u = jnp.arange(W2, dtype=jnp.float32)
            uv = (uv0[:, :, None, :]
                  + u[None, None, :, None] * (uv1 - uv0)[:, :, None, :])
            duv = jnp.broadcast_to(jnp.eye(2), uv.shape[:-1] + (2, 2))
            o, jac = grid_sample(s, uv.reshape(1, V2 * W2, 1, 2),
                                 duv.reshape(1, V2 * W2, 1, 2, 2))
            o = o.reshape(1, V2, W2, C2)
            jac = jac.reshape(1, V2, W2, C2, 2)
            return (jnp.sum(cw * o) + jnp.sum(jac[..., 0]) * 1e-2
                    + jnp.sum(jac[..., 1]) * 1e-2)

        gb = jax.grad(loss_b)(sat)
        go = jax.grad(loss_o)(sat)
        np.testing.assert_allclose(np.asarray(gb), np.asarray(go),
                                   rtol=1e-4, atol=1e-4, err_msg=f"A={A2}")


def test_s2gp_uwin_parity():
    """Dynamic u-window S2GP kernels (banded_u_chunk) vs the base blocked
    kernels.  Excluded rows have exactly-zero block weights, so on the MXU
    the forward/moments are bit-identical (asserted on TPU by
    scripts/r5_uwin_probe.py: sum-delta exactly 0); in INTERPRET mode
    XLA:CPU picks different dot microkernels for different row counts, so
    this CPU test allows fp32-ulp differences.  The backward chunks the
    W-contraction (reassociated sum) — fp32 round-off everywhere.  A=64
    with CBW=32 gives two column blocks (the multi-block regime the stats
    script measured on real geometry)."""
    from highlyaccurate_tpu.ops.pallas.banded_warp import (
        make_banded_moments, make_banded_sampler)
    A2, C2, V2, W2, RB2 = 64, 8, 6, 32, 32
    rng = np.random.RandomState(11)
    ax = rng.uniform(-4, A2 + 4, (B, V2))
    ay = rng.uniform(0, A2 - 1, (B, V2))
    bx = rng.uniform(0.5, 2.5, (B, V2)) * rng.choice([-1, 1], (B, V2))
    by = bx * rng.uniform(-0.6, 0.6, (B, V2))
    uv0 = jnp.asarray(np.stack([ax, ay], -1).astype(np.float32))
    uv1 = jnp.asarray(np.stack([ax + bx, ay + by], -1).astype(np.float32))
    sat = jnp.asarray(rng.rand(B, A2, A2, C2).astype(np.float32))

    base = make_banded_sampler(A=A2, C=C2, V=V2, W=W2, RB=RB2,
                               interpret=True)
    uwin = make_banded_sampler(A=A2, C=C2, V=V2, W=W2, RB=RB2,
                               interpret=True, u_chunk=8)
    for a, b, name in zip(base(sat, uv0, uv1), uwin(sat, uv0, uv1),
                          ("out", "dx", "dy")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6, err_msg=name)

    def loss(f, sat, uv0, uv1):
        o, dx, dy = f(sat, uv0, uv1)
        return jnp.sum(o ** 2) + jnp.sum(dx * dy)

    gb = jax.grad(lambda s, a, b: loss(base, s, a, b),
                  argnums=(0, 1, 2))(sat, uv0, uv1)
    gu = jax.grad(lambda s, a, b: loss(uwin, s, a, b),
                  argnums=(0, 1, 2))(sat, uv0, uv1)
    for a, b, name in zip(gb, gu, ("dsat", "duv0", "duv1")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5, err_msg=name)

    grd = jnp.asarray(rng.rand(B, V2, W2, C2).astype(np.float32))
    mask = jnp.asarray((rng.rand(V2, W2) > 0.1).astype(np.float32))
    mbase = make_banded_moments(A=A2, C=C2, V=V2, W=W2, RB=RB2,
                                interpret=True)
    muwin = make_banded_moments(A=A2, C=C2, V=V2, W=W2, RB=RB2,
                                interpret=True, u_chunk=8)
    ma = np.asarray(mbase(sat, grd, mask, uv0, uv1))
    mb = np.asarray(muwin(sat, grd, mask, uv0, uv1))
    np.testing.assert_allclose(ma, mb, rtol=1e-5, atol=1e-5)


def test_projline_sampler_parity():
    """Projective-line sampler (G2SP eval) vs grid_sample at the divided
    coordinates, rectangular map (interpret mode)."""
    from highlyaccurate_tpu.ops.pallas.banded_warp import (
        make_projline_sampler, pack_projline_coefs)
    Bp, AY, AX, Cp, Vp, Wp = 2, 16, 48, 8, 6, 12
    rng = np.random.RandomState(41)
    img = jnp.asarray(rng.rand(Bp, AY, AX, Cp).astype(np.float32))

    # homogeneous lines with near-horizontal image slope and den > 0:
    # start points inside, gentle direction, mild projective distortion
    x0 = rng.uniform(2, AX - 14, (Bp, Vp))
    y0 = rng.uniform(2, AY - 4, (Bp, Vp))
    sl = rng.uniform(-0.4, 0.4, (Bp, Vp))
    step = rng.uniform(1.0, 3.0, (Bp, Vp))
    d0 = rng.uniform(0.8, 1.6, (Bp, Vp))
    dd = rng.uniform(-0.02, 0.02, (Bp, Vp))
    # h(u) = (x(u)*den(u), y(u)*den(u), den(u)) with x,y affine along the line
    u = np.arange(Wp, dtype=np.float32)
    xu = x0[..., None] + step[..., None] * u          # [B, V, W]
    yu = y0[..., None] + sl[..., None] * step[..., None] * u
    den = d0[..., None] + dd[..., None] * u
    # reconstruct affine homogeneous params: hx(u) = xu*den must be affine in
    # u -> only exact when dd*step terms cancel; instead build h0/dh directly
    # and DERIVE the sampled points from them (ground truth = same divide)
    h0 = np.stack([x0 * d0, y0 * d0, d0], -1).astype(np.float32)
    h1x = (x0 + step * (Wp - 1)) * (d0 + dd * (Wp - 1))
    h1y = (y0 + sl * step * (Wp - 1)) * (d0 + dd * (Wp - 1))
    h1 = np.stack([h1x, h1y, d0 + dd * (Wp - 1)], -1).astype(np.float32)
    dh = (h1 - h0) / (Wp - 1)

    coefs = pack_projline_coefs(jnp.asarray(h0), jnp.asarray(dh),
                                AY, AX, AY, Wp)
    sampler = make_projline_sampler(AY=AY, AX=AX, C=Cp, V=Vp, W=Wp,
                                    interpret=True)
    out, dx, dy = sampler(img, coefs)

    # oracle: the same homogeneous divide, sampled by grid_sample
    hu = h0[:, :, None, :] + u[None, None, :, None] * dh[:, :, None, :]
    uv = hu[..., :2] / np.maximum(hu[..., 2:], 1e-6)
    infront = hu[..., 2] > 1e-6
    want, wjac = grid_sample(img, jnp.asarray(uv.reshape(Bp, Vp * Wp, 1, 2)),
                             jnp.broadcast_to(jnp.eye(2),
                                              (Bp, Vp * Wp, 1, 2, 2)))
    want = np.asarray(want).reshape(Bp, Vp, Wp, Cp) * infront[..., None]
    wjac = np.asarray(wjac).reshape(Bp, Vp, Wp, Cp, 2) * infront[..., None, None]

    # bf16 map quantization inside the sampler -> loose value tolerance
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dx), wjac[..., 0], rtol=2e-2,
                               atol=2e-2)
    np.testing.assert_allclose(np.asarray(dy), wjac[..., 1], rtol=2e-2,
                               atol=2e-2)


@pytest.mark.parametrize("Cp", [8, 128])
def test_projline_blocked_matches_fullmap(Cp):
    """Column-blocked projline kernel (x-span block skip + per-block
    y-windows) vs the full-map kernel on identical inputs, both map
    layouts (cfirst C=8, channel-last C=128)."""
    from highlyaccurate_tpu.ops.pallas.banded_warp import (
        make_projline_sampler, pack_projline_coefs)
    Bp, AY, AX, Vp, Wp = 2, 16, 256, 6, 12
    rng = np.random.RandomState(43)
    img = jnp.asarray(rng.rand(Bp, AY, AX, Cp).astype(np.float32))

    # lines spanning various x-extents incl. block boundaries & partial maps
    x0 = rng.uniform(-10, AX - 30, (Bp, Vp))
    y0 = rng.uniform(1, AY - 3, (Bp, Vp))
    sl = rng.uniform(-0.5, 0.5, (Bp, Vp))
    step = rng.uniform(2.0, 24.0, (Bp, Vp))
    d0 = rng.uniform(0.8, 1.6, (Bp, Vp))
    dd = rng.uniform(-0.02, 0.02, (Bp, Vp))
    h0 = np.stack([x0 * d0, y0 * d0, d0], -1).astype(np.float32)
    h1x = (x0 + step * (Wp - 1)) * (d0 + dd * (Wp - 1))
    h1y = (y0 + sl * step * (Wp - 1)) * (d0 + dd * (Wp - 1))
    h1 = np.stack([h1x, h1y, d0 + dd * (Wp - 1)], -1).astype(np.float32)
    dh = (h1 - h0) / (Wp - 1)
    coefs = pack_projline_coefs(jnp.asarray(h0), jnp.asarray(dh),
                                AY, AX, AY, Wp)

    full = make_projline_sampler(AY=AY, AX=AX, C=Cp, V=Vp, W=Wp,
                                 interpret=True, blocked=False)
    blk = make_projline_sampler(AY=AY, AX=AX, C=Cp, V=Vp, W=Wp,
                                interpret=True, blocked=True)
    o_f, dx_f, dy_f = full(img, coefs)
    o_b, dx_b, dy_b = blk(img, coefs)
    np.testing.assert_allclose(np.asarray(o_b), np.asarray(o_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dx_b), np.asarray(dx_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy_b), np.asarray(dy_f),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("Cp", [8, 128], ids=["cfirst", "chanlast"])
def test_projline_uwin_bit_identical(Cp):
    """Dynamic u-window blocked projline kernel (banded_u_chunk, round-5
    lever) vs the plain blocked kernel: outputs must be BIT-IDENTICAL —
    samples excluded from a block's window have exactly-zero weights there,
    so the accumulated sums are the same floats.  Covers partial maps,
    out-of-bounds lines, and block-boundary crossings (same geometry pool
    as the blocked-vs-fullmap test), plus gradient equality through the
    differentiable variant."""
    import jax

    from highlyaccurate_tpu.ops.pallas.banded_warp import (
        make_projline_sampler, pack_projline_coefs)
    Bp, AY, AX, Vp, Wp = 2, 16, 256, 6, 16
    rng = np.random.RandomState(47)
    img = jnp.asarray(rng.rand(Bp, AY, AX, Cp).astype(np.float32))

    x0 = rng.uniform(-10, AX - 30, (Bp, Vp))
    y0 = rng.uniform(1, AY - 3, (Bp, Vp))
    sl = rng.uniform(-0.5, 0.5, (Bp, Vp))
    step = rng.uniform(2.0, 24.0, (Bp, Vp))
    d0 = rng.uniform(0.8, 1.6, (Bp, Vp))
    dd = rng.uniform(-0.02, 0.02, (Bp, Vp))
    h0 = np.stack([x0 * d0, y0 * d0, d0], -1).astype(np.float32)
    h1x = (x0 + step * (Wp - 1)) * (d0 + dd * (Wp - 1))
    h1y = (y0 + sl * step * (Wp - 1)) * (d0 + dd * (Wp - 1))
    h1 = np.stack([h1x, h1y, d0 + dd * (Wp - 1)], -1).astype(np.float32)
    dh = (h1 - h0) / (Wp - 1)
    coefs = pack_projline_coefs(jnp.asarray(h0), jnp.asarray(dh),
                                AY, AX, AY, Wp)

    base = make_projline_sampler(AY=AY, AX=AX, C=Cp, V=Vp, W=Wp,
                                 interpret=True)
    uwin = make_projline_sampler(AY=AY, AX=AX, C=Cp, V=Vp, W=Wp,
                                 interpret=True, u_chunk=8)
    for a, b, name in zip(base(img, coefs), uwin(img, coefs),
                          ("out", "dx", "dy")):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name

    base_d = make_projline_sampler(AY=AY, AX=AX, C=Cp, V=Vp, W=Wp,
                                   interpret=True, differentiable=True)
    uwin_d = make_projline_sampler(AY=AY, AX=AX, C=Cp, V=Vp, W=Wp,
                                   interpret=True, differentiable=True,
                                   u_chunk=8)

    def loss(f, img, coefs):
        o, dx, dy = f(img, coefs)
        return jnp.sum(o ** 2) + jnp.sum(dx * dy)

    gb = jax.grad(lambda i, c: loss(base_d, i, c), argnums=(0, 1))(
        img, coefs)
    gu = jax.grad(lambda i, c: loss(uwin_d, i, c), argnums=(0, 1))(
        img, coefs)
    for a, b, name in zip(gb, gu, ("dimg", "dcoefs")):
        assert np.array_equal(np.asarray(a), np.asarray(b)), name


def _projlines(Bp, AY, AX, Vp, Wp, seed):
    """Random projective lines (h0, dh) with gentle slope and den > 0."""
    rng = np.random.RandomState(seed)
    x0 = rng.uniform(2, AX - 14, (Bp, Vp))
    y0 = rng.uniform(2, AY - 4, (Bp, Vp))
    sl = rng.uniform(-0.4, 0.4, (Bp, Vp))
    step = rng.uniform(1.0, 3.0, (Bp, Vp))
    d0 = rng.uniform(0.8, 1.6, (Bp, Vp))
    dd = rng.uniform(-0.02, 0.02, (Bp, Vp))
    h0 = np.stack([x0 * d0, y0 * d0, d0], -1).astype(np.float32)
    h1x = (x0 + step * (Wp - 1)) * (d0 + dd * (Wp - 1))
    h1y = (y0 + sl * step * (Wp - 1)) * (d0 + dd * (Wp - 1))
    h1 = np.stack([h1x, h1y, d0 + dd * (Wp - 1)], -1).astype(np.float32)
    dh = (h1 - h0) / (Wp - 1)
    return jnp.asarray(h0), jnp.asarray(dh)


@pytest.mark.parametrize("Cp,AX", [(8, 48), (8, 256), (128, 256)],
                         ids=["fullmap", "cfirst-blk", "cl-blk"])
def test_projline_pixmom_parity(Cp, AX):
    """Fused pixel-moments projline kernel vs the plain sampler + the jnp
    channel contractions of lm_update_implicit_pixel (interpret mode,
    full-map and both blocked layouts).  The [W,C]x3 fields never exist for
    the fused path, so this pins the in-kernel contraction itself."""
    from highlyaccurate_tpu.ops.pallas.banded_warp import (
        PIXMOM_IDX, make_projline_pixmom, make_projline_sampler,
        pack_projline_coefs)
    Bp, AY, Vp, Wp = 2, 16, 6, 12
    rng = np.random.RandomState(81)
    img = jnp.asarray(rng.rand(Bp, AY, AX, Cp).astype(np.float32))
    tgt = jnp.asarray(rng.rand(Bp, Vp, Wp, Cp).astype(np.float32))
    h0, dh = _projlines(Bp, AY, AX, Vp, Wp, seed=82)
    coefs = pack_projline_coefs(h0, dh, AY, AX, AY, Wp)

    pix = make_projline_pixmom(AY=AY, AX=AX, C=Cp, V=Vp, W=Wp,
                               interpret=True)
    pm = np.asarray(pix(img, tgt, coefs))              # [B, V, W, 16]

    smp = make_projline_sampler(AY=AY, AX=AX, C=Cp, V=Vp, W=Wp,
                                interpret=True)
    out, dx, dy = (np.asarray(a) for a in smp(img, coefs))
    r = out - np.asarray(tgt)
    want = {
        "sxx": np.sum(dx * dx, -1), "sxy": np.sum(dx * dy, -1),
        "syy": np.sum(dy * dy, -1), "rx": np.sum(dx * r, -1),
        "ry": np.sum(dy * r, -1),
    }
    for name, idx in PIXMOM_IDX.items():
        np.testing.assert_allclose(pm[..., idx], want[name],
                                   rtol=1e-5, atol=1e-5, err_msg=name)
    # unused lanes stay zero
    assert not pm[..., len(PIXMOM_IDX):].any()


def test_g2sp_fused_moments_eval_parity():
    """LMG2SP eval with the fused pixel-moments path (g2sp_pixel_moments=1)
    matches the plain banded path (=0, the default) on full trajectories —
    interpret-mode kernels (use_banded_warp=2), tiny geometry."""
    import dataclasses

    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.models.lm_g2sp import LMG2SP

    cfg0 = Config(level=-1, N_iters=2, grd_h=32, grd_w=128, sat_size=64,
                  use_banded_warp=2, g2sp_pixel_moments=0)
    cfg1 = dataclasses.replace(cfg0, g2sp_pixel_moments=1)
    rng = np.random.RandomState(91)
    B = 2
    sat = jnp.asarray(rng.rand(B, 64, 64, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, 32, 128, 3).astype(np.float32))
    k = jnp.asarray(np.broadcast_to(
        np.array([[72.87, 0.0, 62.03], [0.0, 60.34, 15.63],
                  [0.0, 0.0, 1.0]], np.float32), (B, 3, 3)).copy())

    outs = []
    for cfg in (cfg0, cfg1):
        model = LMG2SP(cfg=cfg)
        v = model.init({"params": jax.random.PRNGKey(0),
                        "lm": jax.random.PRNGKey(1)},
                       sat, grd, k, mode="trajectory")
        outs.append(model.apply(v, sat, grd, k, mode="trajectory",
                                rngs={"lm": jax.random.PRNGKey(2)}))
    for name, a, b in zip(("lat", "lon", "theta"), outs[0], outs[1]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_projline_diff_primal_matches_eval():
    """The differentiable projline sampler's primal equals the eval-only
    kernel bit-for-bit (same inputs, interpret mode)."""
    from highlyaccurate_tpu.ops.pallas.banded_warp import (
        make_projline_sampler, pack_projline_coefs)
    Bp, AY, AX, Cp, Vp, Wp = 2, 16, 48, 8, 6, 12
    rng = np.random.RandomState(51)
    img = jnp.asarray(rng.rand(Bp, AY, AX, Cp).astype(np.float32))
    h0, dh = _projlines(Bp, AY, AX, Vp, Wp, seed=52)
    coefs = pack_projline_coefs(h0, dh, AY, AX, AY, Wp)

    ev = make_projline_sampler(AY=AY, AX=AX, C=Cp, V=Vp, W=Wp,
                               interpret=True)
    df = make_projline_sampler(AY=AY, AX=AX, C=Cp, V=Vp, W=Wp,
                               interpret=True, differentiable=True)
    for a, b in zip(ev(img, coefs), df(img, coefs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0)


@pytest.mark.parametrize("Cp,AX", [(8, 48), (128, 256)], ids=["cfirst", "cl"])
def test_projline_diff_grad_parity(Cp, AX):
    """Gradients through the differentiable projline sampler (w.r.t. the
    image and the homogeneous line params h0/dh) match autodiff through
    the grid_sample composition on the SAME bf16-quantized image, both
    map layouts.  Covers the custom VJP's resident-block backward kernel
    and the analytic quotient-rule coefficient chain."""
    from highlyaccurate_tpu.ops.pallas.banded_warp import (
        make_projline_sampler, pack_projline_coefs)
    Bp, AY, Vp, Wp = 2, 16, 6, 12
    rng = np.random.RandomState(61)
    img = jnp.asarray(rng.rand(Bp, AY, AX, Cp).astype(np.float32))
    h0, dh = _projlines(Bp, AY, AX, Vp, Wp, seed=62)
    cw = jnp.asarray(rng.randn(Bp, Vp, Wp, Cp).astype(np.float32))
    cx = jnp.asarray(rng.randn(Bp, Vp, Wp, Cp).astype(np.float32))
    cy = jnp.asarray(rng.randn(Bp, Vp, Wp, Cp).astype(np.float32))

    df = make_projline_sampler(AY=AY, AX=AX, C=Cp, V=Vp, W=Wp,
                               interpret=True, differentiable=True)

    def loss_kernel(img, h0, dh):
        coefs = pack_projline_coefs(h0, dh, AY, AX, AY, Wp)
        out, dx, dy = df(img, coefs)
        return jnp.sum(cw * out) + jnp.sum(cx * dx) + jnp.sum(cy * dy)

    def loss_oracle(img, h0, dh):
        # same bf16 map quantization as the kernel; same divide + in-front
        # mask semantics as _weights_projline
        img_q = img.astype(jnp.bfloat16).astype(jnp.float32)
        u = jnp.arange(Wp, dtype=jnp.float32)
        hu = h0[:, :, None, :] + u[None, None, :, None] * dh[:, :, None, :]
        infront = (hu[..., 2] > 1e-6).astype(jnp.float32)
        den = jnp.where(hu[..., 2] > 1e-6, hu[..., 2], 1.0)
        uv = hu[..., :2] / den[..., None]
        duv = jnp.broadcast_to(jnp.eye(2), uv.shape[:-1] + (2, 2))
        out, jac = grid_sample(img_q, uv.reshape(Bp, Vp * Wp, 1, 2),
                               duv.reshape(Bp, Vp * Wp, 1, 2, 2))
        out = out.reshape(Bp, Vp, Wp, Cp) * infront[..., None]
        jac = jac.reshape(Bp, Vp, Wp, Cp, 2) * infront[..., None, None]
        return (jnp.sum(cw * out) + jnp.sum(cx * jac[..., 0])
                + jnp.sum(cy * jac[..., 1]))

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2))(img, h0, dh)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2))(img, h0, dh)
    # img: the oracle's astype(bf16) rounds the COTANGENT to bf16 on the way
    # back (convert_element_type transpose); the kernel VJP keeps the fp32
    # bilinear weights — allow bf16-epsilon relative slack there
    tols = {"img": dict(rtol=8e-3, atol=2e-3),
            "h0": dict(rtol=1e-3, atol=2e-3),
            "dh": dict(rtol=1e-3, atol=2e-3)}
    for name, a, b in zip(("img", "h0", "dh"), gk, go):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   err_msg=name, **tols[name])


def test_projline_diff_grad_under_remat():
    """jax.checkpoint around the differentiable projline sampler yields the
    same gradients as the un-rematted call (the G2SP train path always
    remats its rounds, lm_g2sp.py — remat re-runs the with_dxy kernel to
    rebuild the VJP residuals; this pins that the re-run is bit-identical.
    defvjp(optimize_remat=True), which would instead SAVE the residuals,
    measured neutral-fp32 / -22%-bf16 and was rejected — see the note at
    make_projline_sampler and scripts/r3_g2sp_remat_probe.py)."""
    from highlyaccurate_tpu.ops.pallas.banded_warp import (
        make_projline_sampler, pack_projline_coefs)
    Bp, AY, AX, Cp, Vp, Wp = 2, 16, 48, 8, 6, 12
    rng = np.random.RandomState(71)
    img = jnp.asarray(rng.rand(Bp, AY, AX, Cp).astype(np.float32))
    h0, dh = _projlines(Bp, AY, AX, Vp, Wp, seed=72)
    cw = jnp.asarray(rng.randn(Bp, Vp, Wp, Cp).astype(np.float32))

    df = make_projline_sampler(AY=AY, AX=AX, C=Cp, V=Vp, W=Wp,
                               interpret=True, differentiable=True)

    def loss(img, h0, dh):
        coefs = pack_projline_coefs(h0, dh, AY, AX, AY, Wp)
        out, dx, dy = df(img, coefs)
        # touch all three outputs + a nonlinearity so the remat body is
        # non-trivial (mirrors the moment contraction after the sampler)
        return jnp.sum(cw * out * out) + jnp.sum(dx * dy)

    g_plain = jax.grad(loss, argnums=(0, 1, 2))(img, h0, dh)
    g_remat = jax.grad(jax.checkpoint(loss), argnums=(0, 1, 2))(img, h0, dh)
    for name, a, b in zip(("img", "h0", "dh"), g_plain, g_remat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=0, err_msg=name)


def _shear_row_oracle(read_chunk, sj, oy_f, r, *, RB, A, C, cfirst,
                      n_chunks=None):
    """Single-row shear extraction — the pre-round-4 production
    implementation, kept HERE as the oracle for _shear_rows4 (ADVICE r4:
    the unused in-module copy could silently drift from the fused kernel
    it documents).  Must stay bit-identical to _shear_rows4's per-row
    accumulation: same chunk loop, same iota match, same add order."""
    from highlyaccurate_tpu.ops.pallas.banded_warp import _SHEAR_CHUNK
    tgt = sj - oy_f + (r - 1.0)
    if n_chunks is None:
        n_chunks = RB // _SHEAR_CHUNK

    def chunk_body(ci, sh):
        base = ci * _SHEAR_CHUNK
        rr = (jax.lax.broadcasted_iota(jnp.int32, (_SHEAR_CHUNK, A), 0)
              .astype(jnp.float32) + base.astype(jnp.float32))
        sel = (rr == tgt).astype(jnp.float32)
        wchunk = read_chunk(base)
        if cfirst:                                     # [chunk, C, A]
            return sh + jnp.sum(sel[:, None, :] * wchunk, axis=0)
        return sh + jnp.sum(sel[:, :, None] * wchunk, axis=0)

    shape = (C, A) if cfirst else (A, C)
    return jax.lax.fori_loop(0, n_chunks, chunk_body,
                             jnp.zeros(shape, jnp.float32))


@pytest.mark.parametrize("cfirst", [False, True])
def test_shear_rows4_bit_identical_to_single_row_oracle(cfirst):
    """The fused 4-row chunk scan must be BIT-identical to four single-row
    extractions (the fusion's stated contract, banded_warp.py)."""
    from highlyaccurate_tpu.ops.pallas.banded_warp import (
        _SHEAR_CHUNK, _shear_rows4)
    RBt, At, Ct = 4 * _SHEAR_CHUNK, 16, 8
    rng = np.random.RandomState(5)
    win = jnp.asarray(rng.randn(
        RBt, *((Ct, At) if cfirst else (At, Ct))).astype(np.float32))
    # fractional targets: rows land between chunks, some out of window
    sj = jnp.asarray(np.floor(rng.uniform(-2, RBt + 2, (At,)))
                     .astype(np.float32))
    oy_f = jnp.float32(3.0)

    def read_chunk(base):
        return jax.lax.dynamic_slice_in_dim(win, base, _SHEAR_CHUNK, 0)

    fused = jax.jit(lambda: _shear_rows4(
        read_chunk, sj, oy_f, RB=RBt, A=At, C=Ct, cfirst=cfirst))()
    for r in range(4):
        single = jax.jit(lambda r=r: _shear_row_oracle(
            read_chunk, sj, oy_f, r, RB=RBt, A=At, C=Ct, cfirst=cfirst))()
        np.testing.assert_array_equal(np.asarray(fused[r]),
                                      np.asarray(single), err_msg=f"r={r}")


def test_banded_u_chunk_auto_resolution_gate():
    """banded_u_chunk=-1 resolves per batch: 128 at B>=8, 0 below
    (scripts/r5_b1_uwin_probe.py measured the B=1 chunk-overhead loss).
    Pinned via the sampler-cache keys banded_project creates."""
    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.models import lm_s2gp

    cfg = Config(level=3, N_iters=1)
    assert cfg.banded_u_chunk == -1  # auto is the default
    rng = np.random.RandomState(0)
    Wt = 16
    mask = jnp.ones((V, Wt), jnp.float32)

    def run(batch):
        sat = jnp.asarray(rng.rand(batch, A, A, C).astype(np.float32))
        uv0, uv1 = _lines()
        uv01 = jnp.stack([uv0[:1, :, None, :].repeat(batch, 0).squeeze(2),
                          uv1[:1, :, None, :].repeat(batch, 0).squeeze(2)],
                         axis=2)                      # [batch, V, 2, 2]
        lm_s2gp._BANDED_CACHE.clear()
        lm_s2gp.banded_project(cfg, sat, uv01, None, mask, with_jac=False)
        (key,) = lm_s2gp._BANDED_CACHE.keys()
        return key[-1]  # resolved u_chunk is the last key element

    assert run(1) == 0
    assert run(8) == 128
    lm_s2gp._BANDED_CACHE.clear()
