"""Isolate banded_bf16_mm: projline kernel L2 shape, mm on/off.

Checks (1) outputs DIFFER across the FULL array (the bf16 weight cast must
be visible — exactly zero means the flag never engaged), (2) kernel-only
timing delta.  Line geometry kept gently sloped so the pack's validity
guard (y-span <= RB-3) keeps every line live.
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from highlyaccurate_tpu.ops.pallas.banded_warp import (
        make_projline_sampler, pack_projline_coefs)

    print(f"devices: {jax.devices()}", flush=True)
    # L2 production shape: ground map 128x512xC64, V=210 lines, W=256
    B, AY, AX, C, V, W = 8, 128, 512, 64, 210, 256
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(B, AY, AX, C).astype(np.float32))
    x0 = rng.uniform(2, AX - 300, (B, V))
    y0 = rng.uniform(20, AY - 40, (B, V))
    sl = rng.uniform(-0.12, 0.12, (B, V))    # y-span <= 0.12*255 ~ 31 rows
    step = rng.uniform(0.5, 1.0, (B, V))
    d0 = rng.uniform(0.8, 1.6, (B, V))
    dd = rng.uniform(-0.0005, 0.0005, (B, V))
    h0 = np.stack([x0 * d0, y0 * d0, d0], -1).astype(np.float32)
    h1x = (x0 + step * (W - 1)) * (d0 + dd * (W - 1))
    h1y = (y0 + sl * step * (W - 1)) * (d0 + dd * (W - 1))
    h1 = np.stack([h1x, h1y, d0 + dd * (W - 1)], -1).astype(np.float32)
    dh = (jnp.asarray(h1) - jnp.asarray(h0)) / (W - 1)
    coefs = pack_projline_coefs(jnp.asarray(h0), dh, AY, AX, AY, W)

    sums = {}
    for mm in (False, True):
        s = make_projline_sampler(AY=AY, AX=AX, C=C, V=V, W=W,
                                  interpret=jax.default_backend() != "tpu",
                                  mm_bf16=mm)

        @jax.jit
        def run(img, coefs, c):
            o, dx, dy = s(img + c * 1e-38, coefs)
            o = o.astype(jnp.float32)
            return (jnp.sum(o) * 1e-20 + c,
                    jnp.sum(jnp.abs(o)), jnp.max(jnp.abs(o)))

        c, asum, amax = run(img, coefs, jnp.zeros(()))
        np.asarray(c)
        sums[mm] = (float(asum), float(amax))
        t0 = time.perf_counter()
        c = jnp.zeros(())
        for _ in range(20):
            c, _a, _m = run(img, coefs, c)
        np.asarray(c)
        ms = (time.perf_counter() - t0) / 20 * 1e3
        print(f"RESULT projline_L2_mm{int(mm)} {ms:.2f} ms/call "
              f"sum|o|={sums[mm][0]:.6e} max|o|={sums[mm][1]:.4f}",
              flush=True)
    d = abs(sums[True][0] - sums[False][0])
    rel = d / max(sums[False][0], 1e-9)
    print(f"RESULT sum_delta {d:.3e} (rel {rel:.2e}; 0 => mm never engaged; "
          f"expect ~1e-3 rel from the weight cast)", flush=True)


if __name__ == "__main__":
    main()
