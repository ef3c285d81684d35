"""ColFlor retrieval model: Florence-2 (DaViT + BART encoder) + 128-d head.

TPU-native (flax) equivalent of the ``ahmed-masry/ColFlor`` OCR-free
lightweight retriever the reference evaluates (05_experiment02.py:331-372,
BASELINE.md headline rows). Architecture (validated against transformers'
Florence2 by the tiny-parity test):

- DaViT vision backbone: per stage a ConvEmbed downsampler then pairs of
  (spatial block: depthwise-conv CPE + windowed spatial attention + MLP,
  channel block: depthwise-conv CPE + grouped channel attention + MLP),
  all post-conv residuals and pre-LN attention/MLP.
- Multimodal projector: learned 2D position embeddings + cosine temporal
  embedding, a mean-pooled summary token concatenated ahead of the HW
  tokens, linear projection + LayerNorm into the BART width.
- Language model: BART *encoder* only (bidirectional post-LN transformer,
  learned positions with the +2 offset, layernorm_embedding). ColFlor is an
  encoder-only retriever; the BART decoder is not needed for embeddings.
- Head: linear projection to embedding_dim + L2 normalization + mask.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_colpali_tpu.models import layers as L


@dataclasses.dataclass(frozen=True)
class Florence2VisionConfig:
    depths: Tuple[int, ...] = (1, 1, 9, 1)
    embed_dim: Tuple[int, ...] = (128, 256, 512, 1024)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    num_groups: Tuple[int, ...] = (4, 8, 16, 32)
    patch_size: Tuple[int, ...] = (7, 3, 3, 3)
    patch_stride: Tuple[int, ...] = (4, 2, 2, 2)
    patch_padding: Tuple[int, ...] = (3, 1, 1, 1)
    patch_prenorm: Tuple[bool, ...] = (False, True, True, True)
    window_size: int = 12
    mlp_ratio: float = 4.0
    projection_dim: int = 768
    max_position_embeddings: int = 50
    qkv_bias: bool = True


@dataclasses.dataclass(frozen=True)
class Florence2TextConfig:
    vocab_size: int = 51289
    d_model: int = 768
    encoder_layers: int = 6
    encoder_attention_heads: int = 12
    encoder_ffn_dim: int = 3072
    max_position_embeddings: int = 1024
    scale_embedding: bool = False
    layer_norm_eps: float = 1e-5


@dataclasses.dataclass(frozen=True)
class ColFlorModelConfig:
    vision: Florence2VisionConfig = dataclasses.field(default_factory=Florence2VisionConfig)
    text: Florence2TextConfig = dataclasses.field(default_factory=Florence2TextConfig)
    embedding_dim: int = 128
    image_token_id: int = 51200  # <image> placeholder in the expanded vocab
    image_size: int = 768

    @classmethod
    def colflor(cls) -> "ColFlorModelConfig":
        """ahmed-masry/ColFlor - Florence-2-base encoder stack."""
        return cls()

    @classmethod
    def tiny(cls, vocab_size: int = 64) -> "ColFlorModelConfig":
        return cls(
            vision=Florence2VisionConfig(
                depths=(1, 1), embed_dim=(16, 32), num_heads=(2, 4),
                num_groups=(2, 4), patch_size=(7, 3), patch_stride=(4, 2),
                patch_padding=(3, 1), patch_prenorm=(False, True),
                window_size=4, mlp_ratio=4.0, projection_dim=24,
            ),
            text=Florence2TextConfig(vocab_size=vocab_size, d_model=24,
                                     encoder_layers=1, encoder_attention_heads=2,
                                     encoder_ffn_dim=48,
                                     max_position_embeddings=128),
            embedding_dim=8,
            image_token_id=vocab_size - 1,
            image_size=32,
        )


# ---------------------------------------------------------------------------
# DaViT vision backbone
# ---------------------------------------------------------------------------

class ConvEmbed(nn.Module):
    cfg: Florence2VisionConfig
    stage: int

    @nn.compact
    def __call__(self, x):  # x: [B, H, W, C]
        c = self.cfg
        if c.patch_prenorm[self.stage]:
            x = L.LayerNorm(eps=1e-5, name="norm")(x)
        x = nn.Conv(
            features=c.embed_dim[self.stage],
            kernel_size=(c.patch_size[self.stage],) * 2,
            strides=(c.patch_stride[self.stage],) * 2,
            padding=c.patch_padding[self.stage],
            name="conv",
            param_dtype=jnp.float32,
        )(x)
        if not c.patch_prenorm[self.stage]:
            x = L.LayerNorm(eps=1e-5, name="norm")(x)
        return x


class DepthwiseCPE(nn.Module):
    """3x3 depthwise conv positional encoding with residual."""

    dim: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        y = nn.Conv(self.dim, kernel_size=(3, 3), padding=1,
                    feature_group_count=self.dim, name="conv",
                    param_dtype=jnp.float32)(x)
        return x + y


def _use_window_kernel() -> bool:
    """Fused Pallas window attention (ops/window_attention.py), OPT-IN via
    MMCP_WINDOW_ATTENTION=1.

    Round-3 v5e measurements (batch 16 @448px): the einsum path's window
    attention costs ~50 ms of ColFlor's 163 ms forward (~30% of runtime
    for ~2% of FLOPs), but the fused kernel does NOT beat it - 165.5 ms
    (block 16) / 192 ms (block 24) vs 163.4 ms einsum. The 12x12=144-token
    windows with head_dim 32 are MXU-hostile in any formulation (K=32
    fills a quarter of the systolic array; S=144 pads the lane dim), and
    the VMEM ceiling caps the window block at ~16, leaving the kernel
    grid-overhead-bound. Kept for future tuning; default stays on the
    einsum path that measured fastest."""
    import os

    return os.environ.get("MMCP_WINDOW_ATTENTION") == "1"


class WindowAttention(nn.Module):
    cfg: Florence2VisionConfig
    stage: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        c = self.cfg
        dim = c.embed_dim[self.stage]
        heads = c.num_heads[self.stage]
        head_dim = dim // heads
        ws = c.window_size
        b, h, w, _ = x.shape
        pad_b = (-h) % ws
        pad_r = (-w) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        nh, nw = hp // ws, wp // ws
        xw = x.reshape(b, nh, ws, nw, ws, dim).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(b * nh * nw, ws * ws, dim)
        qkv = L.DenseGeneral(3 * dim, use_bias=c.qkv_bias, name="qkv")(xw)
        q, k, v = jnp.split(
            qkv.reshape(xw.shape[0], ws * ws, 3, heads, head_dim)
            .transpose(2, 0, 1, 3, 4), 3, axis=0)
        n_win = xw.shape[0]
        if _use_window_kernel():
            from multimodal_colpali_tpu.ops.window_attention import (
                window_attention)

            to_rows = lambda t: t[0].transpose(0, 2, 1, 3).reshape(
                n_win * heads, ws * ws, head_dim)
            out = window_attention(to_rows(q), to_rows(k), to_rows(v),
                                   scale=head_dim ** -0.5)
            out = out.reshape(n_win, heads, ws * ws, head_dim
                              ).transpose(0, 2, 1, 3)
        else:
            out = L.attention(q[0], k[0], v[0], mask=None,
                              scale=head_dim ** -0.5)
        out = out.reshape(n_win, ws * ws, dim)
        out = L.DenseGeneral(dim, name="proj")(out)
        out = out.reshape(b, nh, nw, ws, ws, dim).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, hp, wp, dim)
        return out[:, :h, :w]


class ChannelAttention(nn.Module):
    cfg: Florence2VisionConfig
    stage: int

    @nn.compact
    def __call__(self, x):  # [B, N, C]
        c = self.cfg
        dim = c.embed_dim[self.stage]
        g = c.num_groups[self.stage]
        cp = dim // g
        b, n, _ = x.shape
        qkv = L.DenseGeneral(3 * dim, use_bias=c.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, g, cp).transpose(2, 0, 3, 4, 1)  # [3,B,g,C',N]
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = float(n) ** -0.5
        logits = jnp.einsum("bgcn,bgdn->bgcd", q.astype(jnp.float32),
                            k.astype(jnp.float32)) * scale
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bgcd,bgdn->bgcn", probs, v.astype(jnp.float32))
        # [B, g, C', N] -> [B, N, g, C'] -> [B, N, C] (natural channel order;
        # torch's eager_attention_forward transposes before the recombine).
        out = out.transpose(0, 3, 1, 2).reshape(b, n, dim).astype(x.dtype)
        return L.DenseGeneral(dim, name="proj")(out)


class VisionMLP(nn.Module):
    cfg: Florence2VisionConfig
    stage: int

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dim = c.embed_dim[self.stage]
        h = L.DenseGeneral(int(dim * c.mlp_ratio), name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        return L.DenseGeneral(dim, name="fc2")(h)


class SpatialBlock(nn.Module):
    cfg: Florence2VisionConfig
    stage: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, dim = x.shape
        x = DepthwiseCPE(dim, name="conv1")(x)
        y = L.LayerNorm(eps=1e-5, name="norm1")(x.reshape(b, h * w, dim)).reshape(b, h, w, dim)
        x = x + WindowAttention(self.cfg, self.stage, name="window_attn")(y)
        x = DepthwiseCPE(dim, name="conv2")(x)
        flat = x.reshape(b, h * w, dim)
        y = L.LayerNorm(eps=1e-5, name="norm2")(flat)
        flat = flat + VisionMLP(self.cfg, self.stage, name="ffn")(y)
        return flat.reshape(b, h, w, dim)


class ChannelBlock(nn.Module):
    cfg: Florence2VisionConfig
    stage: int

    @nn.compact
    def __call__(self, x):  # [B, H, W, C]
        b, h, w, dim = x.shape
        x = DepthwiseCPE(dim, name="conv1")(x)
        flat = x.reshape(b, h * w, dim)
        y = L.LayerNorm(eps=1e-5, name="norm1")(flat)
        flat = flat + ChannelAttention(self.cfg, self.stage, name="channel_attn")(y)
        x = DepthwiseCPE(dim, name="conv2")(flat.reshape(b, h, w, dim))
        flat = x.reshape(b, h * w, dim)
        y = L.LayerNorm(eps=1e-5, name="norm2")(flat)
        flat = flat + VisionMLP(self.cfg, self.stage, name="ffn")(y)
        return flat.reshape(b, h, w, dim)


class DaViTBackbone(nn.Module):
    """pixel_values [B, H, W, 3] -> final-stage features [B, h, w, C_last]."""

    cfg: Florence2VisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        for stage in range(len(c.depths)):
            x = ConvEmbed(c, stage, name=f"convs_{stage}")(x)
            for d in range(c.depths[stage]):
                x = SpatialBlock(c, stage, name=f"blocks_{stage}_{d}_spatial")(x)
                x = ChannelBlock(c, stage, name=f"blocks_{stage}_{d}_channel")(x)
        return x


# ---------------------------------------------------------------------------
# Multimodal projector
# ---------------------------------------------------------------------------

class Florence2Projector(nn.Module):
    cfg: ColFlorModelConfig

    @nn.compact
    def __call__(self, feats):  # [B, h, w, C_last]
        c = self.cfg
        v = c.vision
        b, h, w, dim = feats.shape
        row = self.param("row_embeddings", nn.initializers.normal(0.02),
                         (v.max_position_embeddings, dim // 2), jnp.float32)
        col = self.param("column_embeddings", nn.initializers.normal(0.02),
                         (v.max_position_embeddings, dim - dim // 2), jnp.float32)
        pos = jnp.concatenate([
            jnp.broadcast_to(col[None, :w], (h, w, dim - dim // 2)),
            jnp.broadcast_to(row[:h, None], (h, w, dim // 2)),
        ], axis=-1).astype(feats.dtype)
        x = (feats + pos[None]).reshape(b, h * w, dim)
        # cosine temporal embedding of position 0 (single frame)
        half = dim // 2
        emb = np.exp(np.arange(half) * (-math.log(10000) / half))
        t0 = np.zeros((dim,), np.float32)
        t0[0::2] = np.sin(0 * emb)
        t0[1::2] = np.cos(0 * emb)
        x = x + jnp.asarray(t0, feats.dtype)[None, None, :]
        pooled = jnp.mean(x, axis=1, keepdims=True)  # [B, 1, C]
        tokens = jnp.concatenate([pooled, x], axis=1)
        tokens = L.DenseGeneral(v.projection_dim, use_bias=False,
                                name="image_projection")(tokens)
        return L.LayerNorm(eps=1e-5, name="image_proj_norm")(tokens)


# ---------------------------------------------------------------------------
# BART encoder + ColFlor head
# ---------------------------------------------------------------------------

class BartSelfAttention(nn.Module):
    cfg: Florence2TextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        b, s, _ = x.shape
        heads = c.encoder_attention_heads
        head_dim = c.d_model // heads
        q = L.DenseGeneral(c.d_model, name="q_proj")(x)
        k = L.DenseGeneral(c.d_model, name="k_proj")(x)
        v = L.DenseGeneral(c.d_model, name="v_proj")(x)
        q = q.reshape(b, s, heads, head_dim)
        k = k.reshape(b, s, heads, head_dim)
        v = v.reshape(b, s, heads, head_dim)
        out = L.attention(q, k, v, mask=mask, scale=head_dim ** -0.5)
        return L.DenseGeneral(c.d_model, name="out_proj")(out.reshape(b, s, c.d_model))


class BartEncoderLayer(nn.Module):
    cfg: Florence2TextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        y = BartSelfAttention(c, name="self_attn")(x, mask)
        x = L.LayerNorm(eps=c.layer_norm_eps, name="self_attn_layer_norm")(x + y)
        h = L.DenseGeneral(c.encoder_ffn_dim, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = L.DenseGeneral(c.d_model, name="fc2")(h)
        return L.LayerNorm(eps=c.layer_norm_eps, name="final_layer_norm")(x + h)


class ColFlorModel(nn.Module):
    cfg: ColFlorModelConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,                 # [B, S]
        attention_mask: jax.Array,            # [B, S]
        pixel_values: Optional[jax.Array] = None,  # [B, H, W, 3]
    ) -> jax.Array:
        c = self.cfg
        t = c.text
        table = self.param("embed_tokens", nn.initializers.normal(0.02),
                           (t.vocab_size, t.d_model), jnp.float32)
        dtype = pixel_values.dtype if pixel_values is not None else jnp.float32
        embeds = jnp.take(
            table, jnp.where(input_ids == c.image_token_id, 0, input_ids), axis=0
        ).astype(dtype)
        if t.scale_embedding:
            embeds = embeds * (t.d_model ** 0.5)

        if pixel_values is not None:
            feats = DaViTBackbone(c.vision, name="vision_tower")(pixel_values)
            tokens = Florence2Projector(c, name="multi_modal_projector")(feats)
            is_img = input_ids == c.image_token_id
            img_pos = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0, tokens.shape[1] - 1)
            gathered = jnp.take_along_axis(tokens, img_pos[..., None], axis=1)
            embeds = jnp.where(is_img[..., None], gathered, embeds)

        s = input_ids.shape[1]
        pos_table = self.param("embed_positions", nn.initializers.normal(0.02),
                               (t.max_position_embeddings + 2, t.d_model),
                               jnp.float32)
        embeds = embeds + pos_table[2: s + 2].astype(dtype)[None]  # BART +2 offset
        x = L.LayerNorm(eps=t.layer_norm_eps, name="layernorm_embedding")(embeds)

        mask = attention_mask[:, None, None, :].astype(bool)
        for i in range(t.encoder_layers):
            x = BartEncoderLayer(t, name=f"layers_{i}")(x, mask)

        proj = L.DenseGeneral(c.embedding_dim, name="embedding_proj_layer")(x)
        proj = proj.astype(jnp.float32)
        proj = proj / jnp.maximum(jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)
        return proj * attention_mask[..., None].astype(proj.dtype)
