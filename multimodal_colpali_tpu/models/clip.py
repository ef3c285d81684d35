"""CLIP vision tower (flax) - LLaVA-NeXT's image encoder.

The reference's old-model AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B
(00_run_docker_old_models.sh:41-52) encodes images with CLIP ViT-L/14-336.
Architecture per HF ``CLIPVisionTransformer``: bias-free conv patch embed,
a learned CLASS token prepended, learned position embeddings over
[CLS + patches], a PRE-layernorm before the encoder, residual blocks with
LayerNorm->attention and LayerNorm->quick-GELU MLP. LLaVA-NeXT takes the
``vision_feature_layer`` (default -2) hidden states and drops the CLS row
(``vision_feature_select_strategy="default"``).

Reuses the SigLIP attention block (same biased q/k/v/out projections);
only the MLP activation (quick-GELU vs tanh-GELU) and the embedding
layout differ.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.models.siglip import SiglipAttention


@dataclasses.dataclass(frozen=True)
class ClipVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    # SiglipAttention reads these off its cfg; identical layout in CLIP
    @property
    def num_positions(self) -> int:
        return self.num_patches + 1          # CLS + patches


@dataclasses.dataclass(frozen=True)
class LlavaNextMMConfig:
    """Full LLaVA-NeXT generator config (CLIP tower + Llama LM)."""

    vision: ClipVisionConfig = dataclasses.field(
        default_factory=ClipVisionConfig)
    text: Any = None                         # LlamaTextConfig (set below)
    image_token_id: int = 128256
    vision_feature_layer: int = -2

    def __post_init__(self):
        if self.text is None:
            from multimodal_colpali_tpu.models.idefics3 import LlamaTextConfig

            object.__setattr__(self, "text", LlamaTextConfig.llama3_8b())

    @property
    def grid(self) -> int:
        return self.vision.image_size // self.vision.patch_size

    @property
    def n_image_tokens(self) -> int:
        """Static square layout: base g^2 + one tile with a newline per
        row, g*(g+1) (ColGranite's pinned-pinpoint layout)."""
        g = self.grid
        return g * g + g * (g + 1)

    @classmethod
    def llava_next_llama3_8b(cls) -> "LlavaNextMMConfig":
        """llama3-llava-next-8b layout (the AdaptLLM biomed tune's base):
        CLIP ViT-L/14-336 + Llama-3-8B; the hf conversion appends the
        <image> token at id 128256 (vocab padded to 128320 - checkpoint
        loads resize to the actual embed rows)."""
        import dataclasses as _dc

        from multimodal_colpali_tpu.models.idefics3 import LlamaTextConfig

        return cls(text=_dc.replace(LlamaTextConfig.llama3_8b(),
                                    vocab_size=128320))

    @classmethod
    def tiny(cls, vocab_size: int = 64) -> "LlavaNextMMConfig":
        from multimodal_colpali_tpu.models.idefics3 import LlamaTextConfig

        return cls(
            vision=ClipVisionConfig(hidden_size=32, intermediate_size=64,
                                    num_hidden_layers=3,
                                    num_attention_heads=2,
                                    image_size=28, patch_size=14),
            text=LlamaTextConfig.tiny_lm(vocab_size=vocab_size),
            image_token_id=vocab_size - 1,
        )


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class ClipMLP(nn.Module):
    cfg: ClipVisionConfig

    @nn.compact
    def __call__(self, x):
        x = L.DenseGeneral(self.cfg.intermediate_size, name="fc1")(x)
        x = _quick_gelu(x)
        return L.DenseGeneral(self.cfg.hidden_size, name="fc2")(x)


class ClipEncoderLayer(nn.Module):
    cfg: ClipVisionConfig

    @nn.compact
    def __call__(self, x):
        y = L.LayerNorm(eps=self.cfg.layer_norm_eps, name="layer_norm1")(x)
        x = x + SiglipAttention(self.cfg, name="self_attn")(y)
        y = L.LayerNorm(eps=self.cfg.layer_norm_eps, name="layer_norm2")(x)
        x = x + ClipMLP(self.cfg, name="mlp")(y)
        return x


class ClipFeatureTower(nn.Module):
    """pixel_values [B, H, W, 3] (normalized NHWC) -> hidden states of the
    ``feature_layer`` encoder layer, CLS row dropped: [B, P, hidden]."""

    cfg: ClipVisionConfig
    feature_layer: int = -2

    @nn.compact
    def __call__(self, pixel_values):
        c = self.cfg
        x = nn.Conv(features=c.hidden_size,
                    kernel_size=(c.patch_size,) * 2,
                    strides=(c.patch_size,) * 2,
                    padding="VALID", use_bias=False, name="patch_embedding",
                    dtype=pixel_values.dtype, param_dtype=jnp.float32)(
                        pixel_values)
        b = x.shape[0]
        x = x.reshape(b, -1, c.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.hidden_size,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype)[None, None],
                              (b, 1, c.hidden_size)), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (c.num_positions, c.hidden_size), jnp.float32)
        x = x + pos.astype(x.dtype)[None]
        x = L.LayerNorm(eps=c.layer_norm_eps, name="pre_layrnorm")(x)
        n = c.num_hidden_layers
        stop = (n + 1 + self.feature_layer if self.feature_layer < 0
                else self.feature_layer)
        for i in range(min(stop, n)):
            x = ClipEncoderLayer(c, name=f"layers_{i}")(x)
        return x[:, 1:]                      # drop CLS ("default" strategy)
