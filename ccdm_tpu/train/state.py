"""Training state: a single pytree holding params, EMA params, optimizer state.

Replaces the reference's (model, average_model, optimizer, scheduler, engine)
object constellation (`ddpm/trainer.py:192-200,357-376`) with one functional
pytree that lives sharded on the device mesh and round-trips through Orbax.

EMA parity: `PolyakAverager.update` computes `avg = α·avg + (1-α)·src` under
`no_grad` (`ddpm/polyak.py:27-34`); here it is a `tree_map` fused into the
jitted train step. The reference EMAs the whole `state_dict` including
buffers; in this design schedule constants are not parameters, so EMA over
`params` is exactly EMA over everything learnable (benign divergence noted in
SURVEY.md §7).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray  # scalar int32
    params: Any
    ema_params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    polyak_alpha: float = struct.field(pytree_node=False, default=0.9999)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        a = self.polyak_alpha
        new_ema = jax.tree.map(lambda e, p: a * e + (1.0 - a) * p, self.ema_params, new_params)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            ema_params=new_ema,
            opt_state=new_opt_state,
        )


def create_train_state(
    params,
    tx: optax.GradientTransformation,
    polyak_alpha: float = 0.9999,
    ema_params: Optional[Any] = None,
) -> TrainState:
    """EMA init copies base -> average (parity: `polyak.py:17-25`)."""
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        ema_params=ema_params if ema_params is not None else jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params),
        tx=tx,
        polyak_alpha=polyak_alpha,
    )
