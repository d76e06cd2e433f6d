"""Train state and optimizer construction.

The reference rebuilds Adam every epoch with lr = base_lr * (1 - epoch/100)
(reference: /root/reference/train_kitti.py:328-333) — moments reset each
epoch.  Replicated here for training parity (``reset_for_epoch``), with a
``keep_optimizer_state`` config switch documenting the fix.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from highlyaccurate_tpu.config import Config


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    epoch: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def epoch_lr(base_lr: float, epoch: int) -> float:
    """Polynomial decay, power 1 (reference train_kitti.py:329)."""
    return base_lr * (1.0 - float(epoch) / 100.0)


def make_optimizer(cfg: Config):
    """Adam whose lr is read from a mutable schedule slot so the per-epoch lr
    change does not retrigger jit compilation."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)


def create_train_state(cfg: Config, params) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), epoch=jnp.zeros((), jnp.int32),
                      params=params, opt_state=tx.init(params), tx=tx)


def reset_for_epoch(state: TrainState, cfg: Config, epoch: int) -> TrainState:
    """Apply the reference's per-epoch Adam reset + poly-decayed lr."""
    lr = epoch_lr(cfg.lr, epoch)
    if cfg.keep_optimizer_state:
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)  # type: ignore
    else:
        opt_state = state.tx.init(state.params)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr)  # type: ignore
    return state.replace(opt_state=opt_state,
                         epoch=jnp.asarray(epoch, jnp.int32))
