"""ColGranite retrieval model: granite-vision (LLaVA-Next) + 128-d head.

TPU-native (flax) equivalent of ``ibm-granite/granite-vision-3.3-2b-embedding``
(the reference's fifth retriever, 01_create_context_qdrant.py:188-194):
a LLaVA-Next architecture - SigLIP vision tower (features taken from a
configurable encoder layer, pre-post-layernorm, as LLaVA-Next does), 2-layer
GELU projector, anyres tile packing with per-row ``image_newline`` tokens,
and a Granite LM (Llama-family decoder with Granite's embedding / attention /
residual multipliers) - followed by a linear 128-d projection + L2 norm.

For jit-stable shapes the framework pins images to the base square
resolution with a single tile (pinpoint == base size), so the packed image
token count is static: g^2 (base) + g*(g+1) (tile rows + newline column),
g = image_size / patch_size. The tile equals the base image at this
resolution, so the vision tower runs once and its features are reused.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.models.configs import SiglipVisionConfig
from multimodal_colpali_tpu.models.idefics3 import LlamaAttention, LlamaTextConfig
from multimodal_colpali_tpu.models.qwen2vl import Qwen2RMSNorm
from multimodal_colpali_tpu.models.siglip import SiglipEncoderLayer


@dataclasses.dataclass(frozen=True)
class GraniteTextConfig(LlamaTextConfig):
    embedding_multiplier: float = 12.0
    attention_multiplier: float = 0.015625
    residual_multiplier: float = 0.22


@dataclasses.dataclass(frozen=True)
class ColGraniteModelConfig:
    vision: SiglipVisionConfig = dataclasses.field(default_factory=lambda: SiglipVisionConfig(
        hidden_size=1152, intermediate_size=4304, num_hidden_layers=27,
        num_attention_heads=16, image_size=384, patch_size=14))
    text: GraniteTextConfig = dataclasses.field(default_factory=lambda: GraniteTextConfig(
        vocab_size=49156, hidden_size=2048, intermediate_size=8192,
        num_hidden_layers=40, num_attention_heads=32, num_key_value_heads=8,
        rope_theta=300_000.0))
    embedding_dim: int = 128
    image_token_id: int = 49155
    vision_feature_layer: int = -1  # pre-post-layernorm encoder layer output

    @property
    def grid(self) -> int:
        return self.vision.image_size // self.vision.patch_size

    @property
    def n_image_tokens(self) -> int:
        g = self.grid
        return g * g + g * (g + 1)

    def n_image_tokens_for(self, tiles) -> int:
        """Packed token count for an anyres layout (ty, tx[, dy, dx]):
        base grid plus the UNPADDED tiled spatial grid (dy/dx feature
        rows/cols cropped from each side, HF unpad_image) with one
        newline token per remaining spatial row."""
        if tiles is None:
            return self.n_image_tokens
        g = self.grid
        ty, tx, dy, dx = (tuple(tiles) + (0, 0))[:4]
        rows = ty * g - 2 * dy
        cols = tx * g - 2 * dx
        return g * g + rows * (cols + 1)

    def default_pinpoints(self, max_tiles: int = 4):
        """anyres resolution candidates: (a*S, b*S) canvases up to
        ``max_tiles`` tiles (granite-vision style multiples of the base)."""
        s = self.vision.image_size
        return [(a * s, b * s)
                for a in range(1, max_tiles + 1)
                for b in range(1, max_tiles + 1)
                if a * b <= max_tiles]

    @classmethod
    def granite_vision_3(cls) -> "ColGraniteModelConfig":
        return cls()

    @classmethod
    def tiny(cls, vocab_size: int = 64) -> "ColGraniteModelConfig":
        return cls(
            vision=SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                                      num_hidden_layers=2, num_attention_heads=2,
                                      image_size=32, patch_size=8),
            text=GraniteTextConfig(vocab_size=vocab_size, hidden_size=24,
                                   intermediate_size=48, num_hidden_layers=2,
                                   num_attention_heads=2, num_key_value_heads=1,
                                   rope_theta=10000.0, embedding_multiplier=2.0,
                                   attention_multiplier=0.5,
                                   residual_multiplier=0.8),
            embedding_dim=8,
            image_token_id=vocab_size - 1,
        )


class SiglipFeatureTower(nn.Module):
    """SigLIP encoder emitting the ``vision_feature_layer`` hidden states
    (LLaVA-Next takes them BEFORE post_layernorm; the post_layernorm params
    exist in checkpoints but are unused for feature extraction)."""

    cfg: SiglipVisionConfig
    feature_layer: int = -1

    @nn.compact
    def __call__(self, pixel_values):
        c = self.cfg
        x = nn.Conv(features=c.hidden_size,
                    kernel_size=(c.patch_size,) * 2, strides=(c.patch_size,) * 2,
                    padding="VALID", name="patch_embedding",
                    dtype=pixel_values.dtype, param_dtype=jnp.float32)(pixel_values)
        b = x.shape[0]
        x = x.reshape(b, -1, c.hidden_size)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.num_patches, c.hidden_size), jnp.float32)
        x = x + pos.astype(x.dtype)[None]
        n = c.num_hidden_layers
        stop = n + 1 + self.feature_layer if self.feature_layer < 0 else self.feature_layer
        for i in range(min(stop, n)):
            x = SiglipEncoderLayer(c, name=f"layers_{i}")(x)
        return x


class GraniteDecoderLayer(nn.Module):
    cfg: GraniteTextConfig

    @nn.compact
    def __call__(self, x, positions, mask):
        c = self.cfg
        y = Qwen2RMSNorm(eps=c.rms_norm_eps, name="input_layernorm")(x)
        attn = GraniteAttention(c, name="self_attn")(y, positions, mask)
        x = x + attn * c.residual_multiplier
        y = Qwen2RMSNorm(eps=c.rms_norm_eps, name="post_attention_layernorm")(x)
        gate = L.DenseGeneral(c.intermediate_size, use_bias=False, name="gate_proj")(y)
        up = L.DenseGeneral(c.intermediate_size, use_bias=False, name="up_proj")(y)
        down = L.DenseGeneral(c.hidden_size, use_bias=False, name="down_proj")(
            jax.nn.silu(gate) * up)
        return x + down * c.residual_multiplier


class GraniteAttention(nn.Module):
    cfg: GraniteTextConfig

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
        # Granite replaces 1/sqrt(head_dim) with a fixed attention multiplier.
        out = L.attention(q, k, v, mask=mask, scale=c.attention_multiplier)
        out = out.reshape(b, s, c.num_attention_heads * c.head_dim)
        return L.DenseGeneral(c.hidden_size, use_bias=False, name="o_proj")(out)


class ColGraniteModel(nn.Module):
    cfg: ColGraniteModelConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,                 # [B, S]
        attention_mask: jax.Array,            # [B, S]
        pixel_values: Optional[jax.Array] = None,  # [B, H, W, 3] or [B, 1+T, H, W, 3]
        tiles: Optional[tuple] = None,        # static anyres tiling (ty, tx)
    ) -> jax.Array:
        """``tiles=None``: the static square layout (one tile == the base
        image). ``tiles=(ty, tx)``: LLaVA-Next anyres - ``pixel_values``
        carries [base, tile_0, ..., tile_{ty*tx-1}] per image (row-major
        canvas order), packed as base tokens + the tiled spatial grid with
        an image_newline token per spatial row (HF pack_image_features).
        Deviation (documented): HF's unpad_image crop is skipped - token
        counts must stay static on TPU - so padded canvas rows keep their
        tokens; the processor picks the best-fit pinpoint to minimize them.
        """
        c = self.cfg
        t = c.text
        table = self.param("embed_tokens", nn.initializers.normal(0.02),
                           (t.vocab_size, t.hidden_size), jnp.float32)
        dtype = pixel_values.dtype if pixel_values is not None else jnp.float32
        embeds = jnp.take(
            table, jnp.where(input_ids == c.image_token_id, 0, input_ids), axis=0
        ).astype(dtype)

        if pixel_values is not None:
            g = c.grid
            bsz = input_ids.shape[0]
            pix = pixel_values
            if tiles is not None:  # flatten base+tiles through the tower
                n_imgs = pix.shape[1]
                pix = pix.reshape((bsz * n_imgs,) + pix.shape[2:])
            vis = SiglipFeatureTower(c.vision, c.vision_feature_layer,
                                     name="vision_tower")(pix)
            h = L.DenseGeneral(t.hidden_size, name="projector_linear_1")(vis)
            h = nn.gelu(h, approximate=False)
            proj = L.DenseGeneral(t.hidden_size, name="projector_linear_2")(h)
            newline = self.param("image_newline", nn.initializers.normal(0.02),
                                 (t.hidden_size,), jnp.float32).astype(proj.dtype)
            if tiles is None:
                # static square layout: base tokens [g*g], then the same
                # image as one tile with a newline token per row.
                tile = proj.reshape(bsz, g, g, t.hidden_size)
                nl = jnp.broadcast_to(newline[None, None, None, :],
                                      (bsz, g, 1, t.hidden_size))
                tile = jnp.concatenate([tile, nl], axis=2).reshape(
                    bsz, g * (g + 1), t.hidden_size)
                feats = jnp.concatenate([proj, tile], axis=1)
            else:
                ty, tx, dy, dx = (tuple(tiles) + (0, 0))[:4]
                proj = proj.reshape(bsz, 1 + ty * tx, g * g, t.hidden_size)
                base = proj[:, 0]                                  # [B, g*g, D]
                sp = proj[:, 1:].reshape(bsz, ty, tx, g, g, t.hidden_size)
                sp = sp.transpose(0, 1, 3, 2, 4, 5).reshape(
                    bsz, ty * g, tx * g, t.hidden_size)
                # HF unpad_image, STATIC: the layout key carries the
                # aspect-derived symmetric feature crop, so the pad
                # rows/cols the canvas introduced never become tokens
                # (exactness restored vs the round-4 quantified skip)
                rows = ty * g - 2 * dy
                cols = tx * g - 2 * dx
                sp = sp[:, dy:dy + rows, dx:dx + cols]
                nl = jnp.broadcast_to(newline[None, None, None, :],
                                      (bsz, rows, 1, t.hidden_size))
                sp = jnp.concatenate([sp, nl], axis=2).reshape(
                    bsz, rows * (cols + 1), t.hidden_size)
                feats = jnp.concatenate([base, sp], axis=1)
            is_img = input_ids == c.image_token_id
            img_pos = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0, feats.shape[1] - 1)
            gathered = jnp.take_along_axis(feats, img_pos[..., None], axis=1)
            embeds = jnp.where(is_img[..., None], gathered, embeds)

        embeds = embeds * jnp.asarray(t.embedding_multiplier, embeds.dtype)

        positions = jnp.cumsum(attention_mask, axis=1) - 1
        s = input_ids.shape[1]
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        mask = causal & attention_mask[:, None, None, :].astype(bool)

        x = embeds
        for i in range(t.num_hidden_layers):
            x = GraniteDecoderLayer(t, name=f"layers_{i}")(x, positions, mask)
        x = Qwen2RMSNorm(eps=t.rms_norm_eps, name="norm")(x)

        proj_out = L.DenseGeneral(c.embedding_dim, name="embedding_proj_layer")(x)
        proj_out = proj_out.astype(jnp.float32)
        proj_out = proj_out / jnp.maximum(
            jnp.linalg.norm(proj_out, axis=-1, keepdims=True), 1e-12)
        return proj_out * attention_mask[..., None].astype(proj_out.dtype)
