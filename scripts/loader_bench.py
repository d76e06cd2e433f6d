"""Host data-pipeline throughput (PARITY backlog host-pipeline item).

Measures the per-sample satellite GT-synthesis chain — the host-side cost
that bounds training data throughput — PIL (rotate+affine+crop, the
reference's eval-parity path) vs the native C++ fused single-pass warp, plus
the thread-pool Loader overhead.  Host-only; this VM has one CPU core, so
these numbers are the single-core floor (the pool pays off on real hosts).

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python scripts/loader_bench.py
"""

import time

import numpy as np

from highlyaccurate_tpu.data import kitti as kdata
from highlyaccurate_tpu.utils import geo


def main():
    from PIL import Image
    rng = np.random.RandomState(0)
    raw = (rng.rand(1280, 1280, 3) * 255).astype(np.uint8)
    sat_map = Image.fromarray(raw)
    N = 50

    t0 = time.perf_counter()
    for i in range(N):
        crop = kdata.synthesize_sat(sat_map, 0.3, 0.1, -0.2, 0.5,
                                    20.0, 20.0, 10.0, 512)
        kdata._to_float_nhwc(crop, (512, 512))
    pil_dt = (time.perf_counter() - t0) / N
    print(f"PIL GT-synthesis chain: {pil_dt*1e3:.1f} ms/sample "
          f"({1/pil_dt:.1f} samples/sec)", flush=True)

    from highlyaccurate_tpu import native
    if native.available():
        t0 = time.perf_counter()
        for i in range(N):
            m = native.fused_synthesize_matrix(
                0.3, 0.1, -0.2, 0.5, 20.0, 20.0, 10.0,
                sat_map.size[0], sat_map.size[1], 512,
                geo.get_meter_per_pixel(scale=1))
            native.affine_warp(raw, m, (512, 512), normalize=True)
        nat_dt = (time.perf_counter() - t0) / N
        print(f"native fused warp:      {nat_dt*1e3:.1f} ms/sample "
              f"({1/nat_dt:.1f} samples/sec, {pil_dt/nat_dt:.1f}x)",
              flush=True)
    else:
        print("native warp unavailable (not built)", flush=True)

    # Loader overhead on the synthetic dataset (no PIL work)
    ds = kdata.SyntheticKitti(n=64, sat_size=512)
    for workers in (1, 2, 4):
        loader = kdata.Loader(ds, batch_size=4, num_workers=workers)
        it = iter(loader)
        next(it)
        t0 = time.perf_counter()
        n = 0
        for b in it:
            n += b["sat"].shape[0]
        dt = time.perf_counter() - t0
        print(f"Loader workers={workers}: {n/dt:.1f} samples/sec "
              f"(synthetic, batch 4)", flush=True)


if __name__ == "__main__":
    main()
