"""Shared transformer building blocks (flax.linen), TPU conventions.

All matmuls accumulate in fp32 (``preferred_element_type``); softmax runs in
fp32 regardless of the activation dtype; parameters are stored fp32 and cast
to the compute dtype at use, so a bf16 forward is numerically the standard
mixed-precision recipe XLA fuses well on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def dense(x: jax.Array, kernel: jax.Array, bias: Optional[jax.Array] = None) -> jax.Array:
    """y = x @ kernel (+ bias) with fp32 accumulation, output in x.dtype.

    When ``kernel`` is a ``quantize_int8`` dict (an encoder tree rewritten
    by ``ops.quant.quantize_encoder_params`` - ``load_retriever(...,
    quantize="int8")``), the matmul runs int8 x int8 -> int32 on the MXU
    at 2x the bf16 rate with dynamic per-token activation scales."""
    if isinstance(kernel, dict):
        from multimodal_colpali_tpu.ops.quant import w8a8_dense

        return w8a8_dense(x, kernel, bias)
    y = jax.lax.dot_general(
        x, kernel.astype(x.dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


class DenseGeneral(nn.Module):
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32) if self.use_bias else None
        return dense(x, kernel, bias)


class RMSNorm(nn.Module):
    """Gemma-style RMSNorm: y = x / rms(x) * (1 + weight), computed in fp32."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        w = self.param("weight", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + self.eps) * (1.0 + w)
        return y.astype(dtype)


class LayerNorm(nn.Module):
    """Standard LayerNorm with weight+bias, fp32 math."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dtype = x.dtype
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps) * w + b
        return y.astype(dtype)


def rope(x: jax.Array, positions: jax.Array, theta: float = 10000.0) -> jax.Array:
    """Rotary position embedding, HF half-split convention.

    Args:
      x: ``[B, S, H, D]``; positions: ``[B, S]`` int32.
    """
    d = x.shape[-1]
    freq = 1.0 / (theta ** (jnp.arange(0, d // 2, dtype=jnp.float32) * 2.0 / d))
    angles = positions[..., None].astype(jnp.float32) * freq  # [B, S, D/2]
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(x.dtype)


# Global toggle for the fused Pallas attention kernel (ops/attention.py).
# None = auto: enabled on TPU backends when the sequence is long enough for
# the kernel to win. Hardware parity validated by scripts/tpu_validate.py
# (round 2: max|diff| <= 0.016 bf16 across bidirectional/GQA/causal/ragged).
# The auto seq threshold comes from round-2 TPU v5e measurements: the kernel
# is a 1.09x win on ColPali-3B (Gemma attention at S=1056, MFU 74.4->79.1%)
# but a 0.95x loss on ColFlor (Florence-2's small DaViT windows/short text
# seqs, where XLA's fused einsum already wins and the [S, S] HBM round-trip
# the kernel saves is small). Override with set_fused_attention(True/False)
# or MMCP_FUSED_ATTENTION=1/0 (True forces it at every length).
_FUSED_ATTENTION: Optional[bool] = None
_FUSED_AUTO_MIN_SEQ = 512


def set_fused_attention(enabled: Optional[bool]) -> None:
    global _FUSED_ATTENTION
    _FUSED_ATTENTION = None if enabled is None else bool(enabled)


def _fused_attention_enabled(seq_len: int) -> bool:
    if _FUSED_ATTENTION is not None:
        return _FUSED_ATTENTION
    if seq_len < _FUSED_AUTO_MIN_SEQ:
        return False
    # resolved lazily at trace time so importing the package never touches
    # the (possibly wedged) remote backend
    return jax.default_backend() == "tpu"


# Global toggle for the fused transformer-LAYER kernel (ops/fused_layer.py:
# the ENTIRE encoder layer - LN1+QKV+attention+proj+residual+LN2+MLP+
# residual - as one Pallas kernel with a raised scoped-VMEM limit,
# eliminating the per-layer activation HBM round-trips that cap ColSmol
# at ~49% MFU). None = auto: enabled on TPU backends when the layer shape
# fits the kernel's VMEM plan (SigLIP-768 does; SO400M does not and keeps
# the unfused path). Override with set_fused_layer(True/False) or
# MMCP_FUSED_LAYER=1/0 (on CPU the kernel runs in interpret mode).
_FUSED_LAYER: Optional[bool] = None

# Which fused sub-kernels the SigLIP encoder layer uses when the fused
# path is enabled: "both" = whole-layer kernel, "attn"/"mlp" isolate the
# partial kernels for hardware A/B runs. Set ONCE at import from
# MMCP_FUSED_PARTS (package __init__) - reading the env var at trace
# time silently kept the previously traced path once a jit cache was
# warm, which could make A/B measurements compare the wrong kernels
# (ADVICE r4).
_FUSED_PARTS: str = "both"


def set_fused_parts(parts: str) -> None:
    if parts not in ("both", "attn", "mlp"):
        raise ValueError(
            f"MMCP_FUSED_PARTS must be both/attn/mlp, got {parts!r}")
    global _FUSED_PARTS
    _FUSED_PARTS = parts


def set_fused_layer(enabled: Optional[bool]) -> None:
    global _FUSED_LAYER
    _FUSED_LAYER = None if enabled is None else bool(enabled)


def _fused_layer_enabled(seq_len: int, hidden: int, inter: int,
                         heads: int, dtype_bytes: int = 2) -> bool:
    if _FUSED_LAYER is False:
        return False
    from multimodal_colpali_tpu.ops.fused_layer import layer_plan

    if layer_plan(seq_len, hidden, inter, heads, dtype_bytes) is None:
        return False
    if _FUSED_LAYER:
        return True
    return jax.default_backend() == "tpu"


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    scale: float,
    kv_lens: Optional[jax.Array] = None,
    causal: bool = False,
    kv_valid: Optional[jax.Array] = None,
) -> jax.Array:
    """Multi-head attention core with fp32 softmax.

    q: [B, S, Hq, D]; k/v: [B, T, Hkv, D] (Hkv may be 1 for MQA, or divide Hq
    for GQA); mask: broadcastable to [B, 1, S, T] with True = attend;
    kv_valid: [B, T] (or [T], broadcast) True = attendable key, for
    interspersed key padding that a suffix ``kv_lens`` cannot express.
    Returns [B, S, Hq, D].

    When the fused kernel is enabled and the mask is expressible as
    (kv_lens, kv_valid, causal), the Pallas kernel runs instead of the
    einsum chain (callers that pass an explicit ``mask`` keep the einsum
    path).
    """
    hq, hkv = q.shape[2], k.shape[2]
    if hkv != hq:
        k = jnp.repeat(k, hq // hkv, axis=2)
        v = jnp.repeat(v, hq // hkv, axis=2)
    if kv_valid is not None and kv_valid.ndim == 1:
        kv_valid = jnp.broadcast_to(kv_valid[None], (q.shape[0], k.shape[1]))
    if (mask is None and q.shape[1] == k.shape[1]
            and _fused_attention_enabled(q.shape[1])):
        from multimodal_colpali_tpu.ops.attention import fused_attention

        return fused_attention(q, k, v, kv_lens, kv_valid, scale=scale,
                               causal=causal)
    logits = jnp.einsum(
        "bshd,bthd->bhst", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.float32(-1e30))
    if kv_valid is not None:
        logits = jnp.where(kv_valid[:, None, None, :], logits,
                           jnp.float32(-1e30))
    if kv_lens is not None:
        t = k.shape[1]
        valid = jnp.arange(t)[None, None, None, :] < kv_lens[:, None, None, None]
        logits = jnp.where(valid, logits, jnp.float32(-1e30))
    if causal:
        s, t = q.shape[1], k.shape[1]
        cm = jnp.tril(jnp.ones((s, t), bool))[None, None]
        logits = jnp.where(cm, logits, jnp.float32(-1e30))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhst,bthd->bshd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(q.dtype)
