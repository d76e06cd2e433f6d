"""Single-round projection parity: banded kernel vs gather path on TPU."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from highlyaccurate_tpu.config import Config
from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

B = 2


def main():
    cfg = Config(level=3, N_iters=1)
    model = LMS2GP(cfg=cfg)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(B, 512, 512, 3).astype(np.float32))
    grd = jnp.asarray(rng.rand(B, 256, 1024, 3).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd,
                   jnp.zeros((B, 3)), mode="train")
    params = v["params"]
    pose = jnp.asarray(np.array([[0.3, -0.5, 0.4], [-0.2, 0.1, -0.6]],
                                np.float32))

    def compare(p, s, g):
        sat_feats, _, _, _ = model.apply(
            {"params": p}, s, g, method="extract_features")
        outs = {}
        for lvl in range(3):
            slot = model.cfg.level  # placeholder
        return sat_feats

    # use bound module to access internals
    bound = model.bind({"params": params}, rngs={"lm": jax.random.PRNGKey(0)})

    @jax.jit
    def run(s, g, pose):
        sat_feats, _, grd_feats, _ = bound.extract_features(s, g)
        diffs = []
        for lvl in range(3):
            slot = [0, 1, 2][lvl]
            gH = grd_feats[lvl].shape[1]
            half = gH // 2
            fp_g, _, jac_g, _, m_g = bound._project(
                sat_feats[lvl], None, pose, slot, with_jac=True,
                row_start=half)
            fp_b, jac_b, m_b = bound._project_banded(
                sat_feats[lvl], pose, slot, half, with_jac=True)
            diffs.append((jnp.max(jnp.abs(fp_g - fp_b)),
                          jnp.max(jnp.abs(jac_g - jac_b)),
                          jnp.mean(jnp.abs(fp_g)),
                          jnp.mean(jnp.abs(jac_g))))
        return diffs

    diffs = run(sat, grd, pose)
    ok = True
    for lvl, (dv, dj, mv, mj) in enumerate(diffs):
        dv, dj, mv, mj = (float(x) for x in (dv, dj, mv, mj))
        print(f"L{lvl}: value maxdiff {dv:.2e} (mean|v| {mv:.2e}); "
              f"jac maxdiff {dj:.2e} (mean|j| {mj:.2e})", flush=True)
        ok &= dv < 5e-3 * max(mv * 100, 1.0)
    print("SINGLE-ROUND PARITY", "OK" if ok else "SUSPECT", flush=True)


if __name__ == "__main__":
    main()
