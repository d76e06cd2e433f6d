"""Round-5: eval phase split at the adopted (uc=128) tree, b32 bf16.

With the solver ~25% faster since round 4, the feature share of eval has
grown — this records the current split so the next lever hunt starts from
data.  Protocol: chained dispatch, scalar-fetch fence (axon rules).

Run: python scripts/r5_eval_split_probe.py
"""

import sys

sys.path.insert(0, ".")

from scripts.r5_train_probe import timeit


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    print(f"devices: {jax.devices()}", flush=True)

    from highlyaccurate_tpu.config import Config
    from highlyaccurate_tpu.models.lm_s2gp import LMS2GP

    batch = 32
    cfg = Config(level=3, N_iters=5, compute_dtype="bfloat16")
    model = LMS2GP(cfg=cfg)
    rng = np.random.RandomState(0)
    sat = jnp.asarray(rng.rand(batch, cfg.sat_size, cfg.sat_size, 3)
                      .astype(np.float32))
    grd = jnp.asarray(rng.rand(batch, cfg.grd_h, cfg.grd_w, 3)
                      .astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0),
                    "lm": jax.random.PRNGKey(1)}, sat, grd,
                   jnp.zeros((batch, 3)), mode="train")

    @jax.jit
    def feats(params, c, key):
        out = model.apply({"params": params}, sat + c * 1e-38, grd,
                          method=LMS2GP.extract_features)
        # fence EVERY output group — summing only sat_feats lets XLA DCE
        # the ground branch + conf heads (round-3 lesson, backward DCE)
        return c + sum(jnp.sum(t) for grp in out for t in grp) * 1e-30

    @jax.jit
    def full(params, c, key):
        out = model.apply({"params": params}, sat + c * 1e-38, grd,
                          mode="test", rngs={"lm": key})
        return c + jnp.sum(out[0]) * 1e-30

    for name, fn in (("features_b32", feats), ("full_eval_b32", full)):
        try:
            c = fn(v["params"], jnp.zeros(()), jax.random.PRNGKey(0))
            np.asarray(c)
            timeit(name, lambda cc: fn(v["params"], cc,
                                       jax.random.PRNGKey(1)), n=10)
        except Exception as e:
            import traceback
            traceback.print_exc()
            print(f"RESULT {name} FAILED {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
