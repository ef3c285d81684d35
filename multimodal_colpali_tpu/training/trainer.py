"""ColPali contrastive training on a DP x TP device mesh.

The reference never trains (it consumes trained checkpoints from
colpali-engine); a complete framework must close that loop, so this module
provides the late-interaction contrastive objective ColPali-family models
are trained with (in-batch negatives over the MaxSim score matrix - the
"ColBERT loss") and a pjit-sharded train step:

- ``data`` axis: batch sharding for queries and pages (DP).
- ``model`` axis: tensor parallelism over attention heads / MLP hidden of
  both towers (column/row-parallel placement from parallel/mesh.py); XLA
  inserts the all-reduces over ICI.

PP and EP are non-goals (SURVEY.md §2.3): the encoders are <=3B dense
models; DP x TP covers them.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from multimodal_colpali_tpu.models.colpali import ColPaliModel
from multimodal_colpali_tpu.parallel.mesh import shard_params_for_tp


def colbert_loss(q_emb: jax.Array, d_emb: jax.Array,
                 q_mask: jax.Array, d_mask: jax.Array) -> jax.Array:
    """In-batch contrastive CE over the MaxSim score matrix.

    q_emb: [B, NQ, DIM] (already L2-normalized, masked rows zeroed);
    d_emb: [B, NT, DIM]; masks [B, N] 1=valid. Positive pairs are the
    diagonal; every other page in the batch is a negative.
    """
    sim = jnp.einsum("bqd,ctd->bcqt", q_emb.astype(jnp.float32),
                     d_emb.astype(jnp.float32))
    sim = jnp.where(d_mask[None, :, None, :].astype(bool), sim, -1e30)
    per_q = jnp.max(sim, axis=-1)                        # [B, C, NQ]
    per_q = per_q * q_mask[:, None, :].astype(jnp.float32)
    scores = jnp.sum(per_q, axis=-1)                     # [B, C]
    labels = jnp.arange(scores.shape[0])
    return jnp.mean(
        optax.softmax_cross_entropy_with_integer_labels(scores, labels)
    )


def make_train_step(
    model: ColPaliModel,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    data_axis: str = "data",
    remat: bool = False,
) -> Callable:
    """Build the jitted (params, opt_state, batch) -> (params, opt_state, loss).

    ``batch`` keys: query_ids/query_mask [B, SQ]; doc_ids/doc_mask [B, SD];
    doc_pixels [B, H, W, 3]. With a mesh, the batch is sharded on ``data``
    and params keep their TP placement (sharding propagates from the inputs,
    so the same step runs single-chip or on a dp x tp mesh unchanged).

    ``remat=True`` rematerializes the two encoder forwards in the backward
    pass (jax.checkpoint): activations of a 3B encoder over ~1040-token
    pages dominate training HBM, and trading the extra forward FLOPs for
    that memory is the standard TPU lever to fit larger page batches.
    """

    def loss_fn(params, batch):
        def fwd(params, ids, mask, pixels):
            return model.apply({"params": params}, ids, mask, pixels)

        if remat:
            fwd = jax.checkpoint(fwd, static_argnums=())
        q_emb = fwd(params, batch["query_ids"], batch["query_mask"], None)
        d_emb = fwd(params, batch["doc_ids"], batch["doc_mask"],
                    batch["doc_pixels"])
        return colbert_loss(q_emb, d_emb, batch["query_mask"], batch["doc_mask"])

    def step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    if mesh is None:
        return jax.jit(step)

    batch_sharding = NamedSharding(mesh, P(data_axis))

    def place_batch(batch):
        return {k: jax.device_put(v, batch_sharding) for k, v in batch.items()}

    jit_step = jax.jit(step, donate_argnums=(0, 1))

    def sharded_step(params, opt_state, batch):
        return jit_step(params, opt_state, place_batch(batch))

    return sharded_step


def make_training_setup(
    model: ColPaliModel,
    params: Any,
    mesh: Optional[Mesh] = None,
    learning_rate: float = 1e-4,
    tp_axis: str = "model",
) -> Tuple[Any, Any, optax.GradientTransformation]:
    """Place params (TP over ``model`` axis if present) and init the optimizer."""
    optimizer = optax.adamw(learning_rate)
    if mesh is not None and tp_axis in mesh.shape and mesh.shape[tp_axis] > 1:
        params = shard_params_for_tp(params, mesh, axis=tp_axis)
    elif mesh is not None:
        params = jax.device_put(params, NamedSharding(mesh, P()))
    opt_state = optimizer.init(params)
    return params, opt_state, optimizer
