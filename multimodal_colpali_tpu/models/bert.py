"""BERT encoder (flax.linen) for bge-base-en-v1.5 dense text embeddings.

TPU-native replacement for the reference's ``HuggingFaceEmbeddings`` /
``FastEmbedEmbeddings`` bge encoders (01_create_context_qdrant.py:245-249,
02_experiment01.py:114). bge pooling = CLS token + L2 normalization.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.models.configs import BertConfig


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        b, s, _ = x.shape
        head_dim = c.hidden_size // c.num_attention_heads
        q = L.DenseGeneral(c.hidden_size, name="query")(x)
        k = L.DenseGeneral(c.hidden_size, name="key")(x)
        v = L.DenseGeneral(c.hidden_size, name="value")(x)
        q = q.reshape(b, s, c.num_attention_heads, head_dim)
        k = k.reshape(b, s, c.num_attention_heads, head_dim)
        v = v.reshape(b, s, c.num_attention_heads, head_dim)
        out = L.attention(q, k, v, mask=mask, scale=head_dim ** -0.5)
        return out.reshape(b, s, c.hidden_size)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        attn = BertSelfAttention(c, name="attention")(x, mask)
        attn = L.DenseGeneral(c.hidden_size, name="attention_output")(attn)
        x = L.LayerNorm(eps=c.layer_norm_eps, name="attention_layernorm")(x + attn)
        h = L.DenseGeneral(c.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)  # BERT uses exact gelu
        h = L.DenseGeneral(c.hidden_size, name="output")(h)
        return L.LayerNorm(eps=c.layer_norm_eps, name="output_layernorm")(x + h)


class BertEncoder(nn.Module):
    """input_ids/attention_mask [B, S] -> L2-normalized CLS embedding [B, hidden]."""

    cfg: BertConfig

    @nn.compact
    def __call__(self, input_ids, attention_mask, token_type_ids: Optional[jax.Array] = None):
        c = self.cfg
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        word = self.param("word_embeddings", nn.initializers.normal(0.02),
                          (c.vocab_size, c.hidden_size), jnp.float32)
        pos = self.param("position_embeddings", nn.initializers.normal(0.02),
                         (c.max_position_embeddings, c.hidden_size), jnp.float32)
        typ = self.param("token_type_embeddings", nn.initializers.normal(0.02),
                         (c.type_vocab_size, c.hidden_size), jnp.float32)
        s = input_ids.shape[1]
        x = (jnp.take(word, input_ids, axis=0)
             + pos[None, :s]
             + jnp.take(typ, token_type_ids, axis=0))
        x = L.LayerNorm(eps=c.layer_norm_eps, name="embeddings_layernorm")(x)
        mask = attention_mask[:, None, None, :].astype(bool)
        for i in range(c.num_hidden_layers):
            x = BertLayer(c, name=f"layers_{i}")(x, mask)
        cls = x[:, 0].astype(jnp.float32)
        return cls / jnp.maximum(jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-12)
