"""Data-parallel SuperPoint fine-tuning over a device mesh.

The training capability of the reference (``superpoint/train.py``) is a
single-GPU torch loop; here the jitted train step runs under a 1-D mesh
with the batch sharded and parameters/optimizer state replicated — XLA
inserts the gradient ``psum`` (standard DP). Extends to multi-host via
``jax.distributed`` with the same code.
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ur_mvo_tpu.models.train_superpoint import loss_fn


def make_dp_train_step(tx: optax.GradientTransformation, mesh: Mesh, axis: str = "data"):
    """Returns ``step(params, opt_state, batch) -> (params, opt_state, loss)``
    with the batch sharded over ``axis`` and states replicated."""
    batch_sh = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    @jax.jit
    def step(params, opt_state, batch):
        params = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, rep), params)
        batch = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, batch_sh), batch)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step
