"""Fused window attention for DaViT-class encoders (ColFlor's hot loss).

TPU ablation (round 3, v5e, batch 16 @448px): ColFlor's windowed
attention einsums cost ~50 ms of a 163 ms forward - ~30% of runtime for
~2% of the FLOPs. The einsum path materializes the per-window fp32
logits ``[B*n_windows, heads, 144, 144]`` in HBM (stage 1: ~1.4 GB per
layer at batch 16) and reads them back for the softmax and the PV
matmul; with 12x12=144-token windows the tensors also pad badly onto
the (16, 128) TPU tile. This kernel keeps the whole
``QK^T -> softmax -> PV`` chain of a block of windows in VMEM: HBM
traffic drops to the q/k/v reads + output write.

Layout: windows and heads are flattened into one leading axis
``[N, S, D]`` (N = batch * n_windows * heads, S = window tokens,
D = head_dim) - every row block is an independent attention problem, so
the grid is a plain 1-D sweep with ``G`` windows per step and batched
``dot_general`` inside. N is padded to a multiple of G by the wrapper.

Numerics match ``models/layers.attention``'s einsum path (fp32 logits
and softmax, bf16 PV inputs); parity pinned in tests/test_window_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def window_attention_xla(q: jax.Array, k: jax.Array, v: jax.Array, *,
                         scale: float) -> jax.Array:
    """Reference: [N, S, D] batched attention with fp32 softmax (the
    exact math models/layers.attention computes per window)."""
    logits = jnp.einsum("nsd,ntd->nst", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("nst,ntd->nsd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
    q = q_ref[...]                                 # [G, S, D]
    k = k_ref[...]
    v = v_ref[...]
    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale          # [G, S, S]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                  # [G, S, D]
    o_ref[...] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "block", "interpret"))
def window_attention(q: jax.Array, k: jax.Array, v: jax.Array, *,
                     scale: float, block: int = 16,
                     interpret: bool = False) -> jax.Array:
    """Fused attention over independent windows. q/k/v: [N, S, D]."""
    if not interpret and jax.default_backend() != "tpu":
        return window_attention_xla(q, k, v, scale=scale)
    n, s, d = q.shape
    g = min(block, n)
    pad = (-n) % g
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0), (0, 0)))
        k = jnp.pad(k, ((0, pad), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, pad), (0, 0), (0, 0)))
    grid = (q.shape[0] // g,)
    spec = pl.BlockSpec((g, s, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out[:n]
