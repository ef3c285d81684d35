"""Gemma decoder text tower (flax.linen) - PaliGemma's language model.

For retrieval the whole input is prefix, so attention is full bidirectional
over valid tokens (matching PaliGemma inference masking; the reference
exercises this path through torch at functions.py:837-839 / 887-889).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.models.configs import GemmaTextConfig


class GemmaMLP(nn.Module):
    cfg: GemmaTextConfig

    @nn.compact
    def __call__(self, x):
        gate = L.DenseGeneral(self.cfg.intermediate_size, use_bias=False, name="gate_proj")(x)
        up = L.DenseGeneral(self.cfg.intermediate_size, use_bias=False, name="up_proj")(x)
        act = nn.gelu(gate, approximate=True)  # gelu_pytorch_tanh
        return L.DenseGeneral(self.cfg.hidden_size, use_bias=False, name="down_proj")(act * up)


class GemmaAttention(nn.Module):
    cfg: GemmaTextConfig

    @nn.compact
    def __call__(self, x, positions, mask):
        c = self.cfg
        b, s, _ = x.shape
        q = L.DenseGeneral(c.num_attention_heads * c.head_dim, use_bias=False, name="q_proj")(x)
        k = L.DenseGeneral(c.num_key_value_heads * c.head_dim, use_bias=False, name="k_proj")(x)
        v = L.DenseGeneral(c.num_key_value_heads * c.head_dim, use_bias=False, name="v_proj")(x)
        q = q.reshape(b, s, c.num_attention_heads, c.head_dim)
        k = k.reshape(b, s, c.num_key_value_heads, c.head_dim)
        v = v.reshape(b, s, c.num_key_value_heads, c.head_dim)
        q = L.rope(q, positions, theta=c.rope_theta)
        k = L.rope(k, positions, theta=c.rope_theta)
        out = L.attention(q, k, v, mask=mask, scale=c.head_dim ** -0.5)
        out = out.reshape(b, s, c.num_attention_heads * c.head_dim)
        return L.DenseGeneral(c.hidden_size, use_bias=False, name="o_proj")(out)


class GemmaDecoderLayer(nn.Module):
    cfg: GemmaTextConfig

    @nn.compact
    def __call__(self, x, positions, mask):
        y = L.RMSNorm(eps=self.cfg.rms_norm_eps, name="input_layernorm")(x)
        x = x + GemmaAttention(self.cfg, name="self_attn")(y, positions, mask)
        y = L.RMSNorm(eps=self.cfg.rms_norm_eps, name="post_attention_layernorm")(x)
        x = x + GemmaMLP(self.cfg, name="mlp")(y)
        return x


class GemmaModel(nn.Module):
    """inputs_embeds [B, S, hidden] (already scaled & merged with image
    features by the caller) -> last hidden states [B, S, hidden].

    ``causal=False`` is the retrieval path (bidirectional prefix attention,
    PaliGemma inference masking); ``causal=True`` is the autoregressive LM
    masking used by the generation engine's oracle tests."""

    cfg: GemmaTextConfig

    @nn.compact
    def __call__(self, inputs_embeds, positions,
                 attention_mask: Optional[jax.Array], causal: bool = False):
        c = self.cfg
        x = inputs_embeds
        s = x.shape[1]
        if attention_mask is not None:
            # A position may attend to every valid (non-padding) position...
            mask = attention_mask[:, None, None, :].astype(bool)  # [B,1,1,T]
        else:
            mask = None
        if causal:
            # ...and, for LM use, only to positions at or before itself.
            tril = jnp.tril(jnp.ones((s, s), bool))[None, None]
            mask = tril if mask is None else (mask & tril)
        for i in range(c.num_hidden_layers):
            x = GemmaDecoderLayer(c, name=f"layers_{i}")(x, positions, mask)
        return L.RMSNorm(eps=c.rms_norm_eps, name="norm")(x)


class GemmaEmbedder(nn.Module):
    """Token embedding table with Gemma's sqrt(hidden) scaling."""

    cfg: GemmaTextConfig

    @nn.compact
    def __call__(self, input_ids):
        table = self.param(
            "embed_tokens", nn.initializers.normal(0.02),
            (self.cfg.vocab_size, self.cfg.hidden_size), jnp.float32,
        )
        return jnp.take(table, input_ids, axis=0)
