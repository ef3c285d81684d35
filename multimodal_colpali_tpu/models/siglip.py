"""SigLIP vision tower (flax.linen) - PaliGemma's image encoder.

JAX/XLA reimplementation of the vision side the reference runs through
torch+flash-attn (reference 01_create_context_qdrant.py:163-205 loads
``vidore/colpali-*`` whose backbone is SigLIP-So400m). Patchify is a single
conv (one big MXU matmul after im2col by XLA); attention is full
bidirectional over the 1024 patch tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.models.configs import SiglipVisionConfig


class SiglipMLP(nn.Module):
    cfg: SiglipVisionConfig

    @nn.compact
    def __call__(self, x):
        x = L.DenseGeneral(self.cfg.intermediate_size, name="fc1")(x)
        x = nn.gelu(x, approximate=True)  # gelu_pytorch_tanh
        return L.DenseGeneral(self.cfg.hidden_size, name="fc2")(x)


class SiglipAttention(nn.Module):
    cfg: SiglipVisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        head_dim = c.hidden_size // c.num_attention_heads
        b, s, _ = x.shape
        q = L.DenseGeneral(c.hidden_size, name="q_proj")(x)
        k = L.DenseGeneral(c.hidden_size, name="k_proj")(x)
        v = L.DenseGeneral(c.hidden_size, name="v_proj")(x)
        q = q.reshape(b, s, c.num_attention_heads, head_dim)
        k = k.reshape(b, s, c.num_attention_heads, head_dim)
        v = v.reshape(b, s, c.num_attention_heads, head_dim)
        out = L.attention(q, k, v, mask=None, scale=head_dim ** -0.5)
        out = out.reshape(b, s, c.hidden_size)
        return L.DenseGeneral(c.hidden_size, name="out_proj")(out)


class SiglipEncoderLayer(nn.Module):
    cfg: SiglipVisionConfig

    @nn.compact
    def __call__(self, x):
        y = L.LayerNorm(eps=self.cfg.layer_norm_eps, name="layer_norm1")(x)
        x = x + SiglipAttention(self.cfg, name="self_attn")(y)
        y = L.LayerNorm(eps=self.cfg.layer_norm_eps, name="layer_norm2")(x)
        x = x + SiglipMLP(self.cfg, name="mlp")(y)
        return x


class SiglipVisionTower(nn.Module):
    """pixel_values [B, H, W, 3] (NHWC, already normalized) -> [B, P, hidden].

    ``pos_index``: optional static per-patch index into the position table.
    SigLIP/PaliGemma uses sequential positions (None); Idefics3/SmolVLM uses
    bucketized fractional coordinates, which its caller precomputes.
    """

    cfg: SiglipVisionConfig
    pos_index: tuple = ()

    @nn.compact
    def __call__(self, pixel_values):
        c = self.cfg
        x = nn.Conv(
            features=c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            name="patch_embedding",
            dtype=pixel_values.dtype,
            param_dtype=jnp.float32,
        )(pixel_values)
        b = x.shape[0]
        x = x.reshape(b, -1, c.hidden_size)  # row-major patch order == torch
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (c.num_patches, c.hidden_size), jnp.float32,
        )
        if self.pos_index:
            pos = pos[jnp.asarray(self.pos_index)]
        x = x + pos.astype(x.dtype)[None]
        for i in range(c.num_hidden_layers):
            x = SiglipEncoderLayer(c, name=f"layers_{i}")(x)
        return L.LayerNorm(eps=c.layer_norm_eps, name="post_layernorm")(x)
