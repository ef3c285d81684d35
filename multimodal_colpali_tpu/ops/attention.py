"""Fused attention Pallas kernel for the encoder hot path.

The einsum attention in models/layers.py materializes the [B, H, S, S]
probability tensor in HBM between the two matmuls (~550 MB per Gemma layer
at B=16, S=1040); this kernel keeps logits/probabilities in VMEM per query
block, reading K/V once. At the encoders' sequence lengths (<=1056) a full
K/V per (batch, head) fits VMEM, so the kernel uses exact row-block softmax
(single K pass, no online rescaling needed).

Enabled automatically on TPU backends for sequences >= 512 (hardware
parity + perf validated on v5e: 1.09x / +4.7 MFU points on ColPali-3B at
S=1056; a loss on short sequences, where XLA's einsum fusion wins - see
models/layers._fused_attention_enabled). Force with
models.layers.set_fused_attention(True/False) or MMCP_FUSED_ATTENTION=1/0;
numerics are interpret-tested against the einsum reference for
bidirectional, padded-KV, and causal cases and hardware-tested by
scripts/tpu_validate.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _attn_kernel(kv_lens_ref, *refs, scale, causal, bq, use_valid):
    """Grid: (B*H, S/BQ). Blocks: q [1, BQ, D]; k/v [1, S, D]; o [1, BQ, D];
    optional kv_valid [1, 1, S] int32 (1 = attendable key) for interspersed
    key padding that a suffix ``kv_lens`` cannot express."""
    if use_valid:
        q_ref, k_ref, v_ref, valid_ref, o_ref = refs
    else:
        q_ref, k_ref, v_ref, o_ref = refs
        valid_ref = None
    bh = pl.program_id(0)
    qb = pl.program_id(1)

    q = q_ref[0]                      # [BQ, D]
    k = k_ref[0]                      # [S, D]
    v = v_ref[0]
    s = k.shape[0]

    logits = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                          # [BQ, S]

    col = jax.lax.broadcasted_iota(jnp.int32, (bq, s), 1)
    kv_len = kv_lens_ref[bh]
    logits = jnp.where(col < kv_len, logits, NEG)
    if use_valid:
        logits = jnp.where(valid_ref[0, 0][None, :] != 0, logits, NEG)
    if causal:
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, s), 0) + qb * bq
        logits = jnp.where(col <= row, logits, NEG)

    m = jnp.max(logits, axis=1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / denom
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "causal", "block_q", "interpret"))
def fused_attention(
    q: jax.Array,                     # [B, S, H, D]
    k: jax.Array,                     # [B, S, H, D] (repeat KV heads first for GQA)
    v: jax.Array,
    kv_lens: Optional[jax.Array] = None,   # [B] valid key lengths
    kv_valid: Optional[jax.Array] = None,  # [B, S] 1 = attendable key
    *,
    scale: float,
    causal: bool = False,
    block_q: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    b, s, h, d = q.shape
    if kv_lens is None:
        kv_lens = jnp.full((b,), s, jnp.int32)

    if block_q is None:
        # one program per (batch, head) when the whole working set fits
        # VMEM: fp32 logits [S, S] + q/k/v/o [S, D] bf16. Fewer, larger
        # programs amortize the K/V block reads and keep the MXU fed -
        # measured 0.77 ms vs 0.95 ms (bq=256) at the ColSmol tower's
        # B=16, S=1024, D=64 on v5e, recovering the inter-matmul HBM
        # traffic the einsum path pays. Fall back to 256-row query
        # blocks when S^2 logits would not fit.
        vmem_need = s * s * 4 + 4 * s * d * 2
        block_q = s if vmem_need <= 12 * 1024 * 1024 else 256
    bq = min(block_q, s)
    s_pad = ((s + bq - 1) // bq) * bq
    qt = jnp.swapaxes(q, 1, 2).reshape(b * h, s, d)
    kt = jnp.swapaxes(k, 1, 2).reshape(b * h, s, d)
    vt = jnp.swapaxes(v, 1, 2).reshape(b * h, s, d)
    if s_pad != s:
        qt = jnp.pad(qt, ((0, 0), (0, s_pad - s), (0, 0)))

    kv_lens_bh = jnp.repeat(kv_lens.astype(jnp.int32), h)

    in_specs = [
        pl.BlockSpec((1, bq, d), lambda i, j, *_: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, d), lambda i, j, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, s, d), lambda i, j, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [kv_lens_bh, qt, kt, vt]
    if kv_valid is not None:
        # NB: index maps must stay Mosaic-trivial - Python // lowers to
        # floor_divide's sign-corrected select chain, which Pallas rejects;
        # lax.div is the plain truncating divide (program ids are >= 0).
        # The [B, 1, S] layout keeps the block's last two dims equal to the
        # array dims (Mosaic's tiling rule for non-8x128-divisible blocks).
        in_specs.append(pl.BlockSpec(
            (1, 1, s), lambda i, j, *_: (jax.lax.div(i, h), 0, 0),
            memory_space=pltpu.VMEM))
        operands.append(kv_valid.astype(jnp.int32)[:, None, :])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * h, s_pad // bq),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bq, d), lambda i, j, *_: (i, j, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, causal=causal, bq=bq,
                          use_valid=kv_valid is not None),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d), q.dtype),
        interpret=interpret,
    )(*operands)
    out = out[:, :s].reshape(b, h, s, d)
    return jnp.swapaxes(out, 1, 2)
