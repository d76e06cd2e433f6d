"""Async orbax checkpointing: background writes, overwrite serialization,
load-side fencing (train/checkpoint.py async_save paths)."""

import numpy as np

from highlyaccurate_tpu.train import checkpoint as ck


def _params(seed):
    rng = np.random.RandomState(seed)
    return {"w": rng.rand(4, 3).astype(np.float32),
            "b": {"inner": rng.rand(7).astype(np.float32)}}


def test_async_save_load_roundtrip(tmp_path):
    p = _params(0)
    ck.save_params(str(tmp_path), "model_0", p, async_save=True)
    # load_params fences the pending background write itself
    got = ck.load_params(str(tmp_path), "model_0", _params(9))
    np.testing.assert_array_equal(got["w"], p["w"])
    np.testing.assert_array_equal(got["b"]["inner"], p["b"]["inner"])


def test_async_overwrite_same_name_serialized(tmp_path):
    """Two async saves to the SAME directory (the Model_best pattern) must
    not race; the reader sees the second payload."""
    a, b = _params(1), _params(2)
    ck.save_params(str(tmp_path), "Model_best", a, async_save=True)
    ck.save_params(str(tmp_path), "Model_best", b, async_save=True)
    got = ck.load_params(str(tmp_path), "Model_best", _params(9))
    np.testing.assert_array_equal(got["w"], b["w"])


def test_async_train_state_roundtrip(tmp_path):
    import jax.numpy as jnp
    import optax
    from highlyaccurate_tpu.train.state import TrainState

    p = _params(3)
    tx = optax.adam(1e-3)
    state = TrainState(params=p, opt_state=tx.init(p), tx=tx,
                       step=jnp.asarray(5, jnp.int32),
                       epoch=jnp.asarray(2, jnp.int32))
    ck.save_train_state(str(tmp_path), "model_1", state, async_save=True)
    fresh = TrainState(params=_params(9), opt_state=tx.init(_params(9)),
                       tx=tx, step=jnp.asarray(0, jnp.int32),
                       epoch=jnp.asarray(0, jnp.int32))
    got = ck.load_train_state(str(tmp_path), "model_1", fresh)
    np.testing.assert_array_equal(np.asarray(got.params["w"]), p["w"])
    assert int(got.step) == 5 and int(got.epoch) == 2
