"""ColIdefics3 / ColSmolVLM retrieval model: SmolVLM backbone + 128-d head.

TPU-native (flax) equivalent of the ``vidore/ColSmolVLM``-style retrievers
(the reference's load_retriever lists ColIdefics3 at
01_create_context_qdrant.py:163-205). Architecture (validated against
transformers' Idefics3Model by the tiny-parity test):

- Vision: SigLIP encoder (identical computation to the PaliGemma tower;
  the module is reused directly).
- Connector: pixel shuffle by ``scale_factor`` (space-to-depth over the
  patch grid) then a single bias-less linear into the LM width.
- Language model: Llama decoder (GQA without qkv biases, plain RMSNorm,
  SiLU-gated MLP, standard 1D RoPE, causal attention).
- Head: linear projection to embedding_dim + L2 normalization + mask.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.models.configs import SiglipVisionConfig
from multimodal_colpali_tpu.models.qwen2vl import Qwen2RMSNorm, _rotate_half
from multimodal_colpali_tpu.models.siglip import SiglipVisionTower


@dataclasses.dataclass(frozen=True)
class LlamaTextConfig:
    vocab_size: int = 49280
    hidden_size: int = 576
    intermediate_size: int = 1536
    num_hidden_layers: int = 30
    num_attention_heads: int = 9
    num_key_value_heads: int = 3
    rms_norm_eps: float = 1e-5
    rope_theta: float = 100_000.0
    tie_word_embeddings: bool = True
    # Llama-3.1-style rope frequency scaling (HF rope_type="llama3"):
    # (factor, low_freq_factor, high_freq_factor, original_max_position
    # _embeddings), or None for plain rotary. Applied to inv_freq once in
    # qwen2vl.mrope_cos_sin. Llama-3.2-Vision's text stack uses
    # (8.0, 1.0, 4.0, 8192).
    rope_llama3: Optional[tuple] = None

    # Engine dispatch marker: the Llama decoder body is the Qwen2 body
    # minus the q/k/v biases, and standard rotary IS mrope with every
    # channel routed to the temporal stream (see mrope_section below) -
    # engine.layer_stack serves both through one branch.
    is_llama = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def mrope_section(self):
        return (self.head_dim // 2, 0, 0)   # all-temporal == plain rope

    @classmethod
    def llama3_8b(cls) -> "LlamaTextConfig":
        """Llama-3-8B(-Instruct) text stack - the LM of the reference's
        old-model AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B
        (00_run_docker_old_models.sh:41-52)."""
        return cls(vocab_size=128256, hidden_size=4096,
                   intermediate_size=14336, num_hidden_layers=32,
                   num_attention_heads=32, num_key_value_heads=8,
                   rms_norm_eps=1e-5, rope_theta=500_000.0,
                   tie_word_embeddings=False)

    @classmethod
    def tiny_lm(cls, vocab_size: int = 64) -> "LlamaTextConfig":
        return cls(vocab_size=vocab_size, hidden_size=24,
                   intermediate_size=48, num_hidden_layers=2,
                   num_attention_heads=2, num_key_value_heads=1,
                   rope_theta=10000.0)


@dataclasses.dataclass(frozen=True)
class ColIdefics3ModelConfig:
    vision: SiglipVisionConfig = dataclasses.field(default_factory=lambda: SiglipVisionConfig(
        hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
        num_attention_heads=12, image_size=512, patch_size=16))
    text: LlamaTextConfig = dataclasses.field(default_factory=LlamaTextConfig)
    embedding_dim: int = 128
    image_token_id: int = 49190
    scale_factor: int = 4

    @property
    def n_image_tokens(self) -> int:
        return self.vision.num_patches // (self.scale_factor ** 2)

    @classmethod
    def colsmol_256m(cls) -> "ColIdefics3ModelConfig":
        return cls()

    @classmethod
    def tiny(cls, vocab_size: int = 64) -> "ColIdefics3ModelConfig":
        return cls(
            vision=SiglipVisionConfig(hidden_size=32, intermediate_size=64,
                                      num_hidden_layers=2, num_attention_heads=2,
                                      image_size=32, patch_size=8),
            text=LlamaTextConfig(vocab_size=vocab_size, hidden_size=24,
                                 intermediate_size=48, num_hidden_layers=2,
                                 num_attention_heads=2, num_key_value_heads=1,
                                 rope_theta=10000.0),
            embedding_dim=8,
            image_token_id=vocab_size - 1,
            scale_factor=2,
        )


def idefics3_position_index(num_patches_per_side: int) -> tuple:
    """Bucketized fractional-coordinate position ids (Idefics3VisionEmbeddings
    semantics) for a full-size square image; for an n-wide grid the per-axis
    buckets are NOT sequential (e.g. [0, 0, 1, 2] for n=4)."""
    import numpy as np

    n = num_patches_per_side
    frac = np.arange(n) / n * (1 - 1e-6)
    boundaries = np.arange(1, n) / n
    buckets = np.searchsorted(boundaries, frac, side="right")
    pos = (buckets[:, None] * n + buckets[None, :]).reshape(-1)
    return tuple(int(p) for p in pos)


def pixel_shuffle(x: jax.Array, scale: int) -> jax.Array:
    """[B, S, D] -> [B, S/scale^2, D*scale^2] (Idefics3Connector recipe)."""
    b, seq, d = x.shape
    h = w = int(seq ** 0.5)
    x = x.reshape(b, h, w // scale, d * scale)
    x = x.transpose(0, 2, 1, 3)
    x = x.reshape(b, w // scale, h // scale, d * scale * scale)
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(b, seq // (scale * scale), d * scale * scale)


class LlamaAttention(nn.Module):
    cfg: LlamaTextConfig

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


class LlamaDecoderLayer(nn.Module):
    cfg: LlamaTextConfig

    @nn.compact
    def __call__(self, x, positions, mask):
        c = self.cfg
        y = Qwen2RMSNorm(eps=c.rms_norm_eps, name="input_layernorm")(x)
        x = x + LlamaAttention(c, name="self_attn")(y, positions, mask)
        y = Qwen2RMSNorm(eps=c.rms_norm_eps, name="post_attention_layernorm")(x)
        gate = L.DenseGeneral(c.intermediate_size, use_bias=False, name="gate_proj")(y)
        up = L.DenseGeneral(c.intermediate_size, use_bias=False, name="up_proj")(y)
        down = L.DenseGeneral(c.hidden_size, use_bias=False, name="down_proj")(
            jax.nn.silu(gate) * up)
        return x + down


class ColIdefics3Model(nn.Module):
    cfg: ColIdefics3ModelConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,                 # [B, S]
        attention_mask: jax.Array,            # [B, S]
        pixel_values: Optional[jax.Array] = None,  # [B, H, W, 3] or [B, N, H, W, 3]
        tiles: Optional[tuple] = None,        # static split layout (ty, tx)
    ) -> jax.Array:
        """``tiles=(ty, tx)``: Idefics3/SmolVLM image splitting -
        ``pixel_values`` carries [tile_0..tile_{ty*tx-1}, global] per image
        (row-major tiles, global LAST, the HF sub-image order); every
        sub-image runs the vision tower + pixel shuffle, and the feature
        blocks scatter into the prompt's image-token runs in the same
        order. Tiles are exact encoder-size squares (the processor resizes
        to the canvas and pads), so no pixel attention mask is needed -
        the static-shape adaptation of HF's mask-based variable tiles."""
        c = self.cfg
        t = c.text
        table = self.param("embed_tokens", nn.initializers.normal(0.02),
                           (t.vocab_size, t.hidden_size), jnp.float32)
        dtype = pixel_values.dtype if pixel_values is not None else jnp.float32
        embeds = jnp.take(
            table, jnp.where(input_ids == c.image_token_id, 0, input_ids), axis=0
        ).astype(dtype)

        if pixel_values is not None:
            bsz = input_ids.shape[0]
            pix = pixel_values
            if tiles is not None:
                n_imgs = pix.shape[1]
                pix = pix.reshape((bsz * n_imgs,) + pix.shape[2:])
            nps = c.vision.image_size // c.vision.patch_size
            vis = SiglipVisionTower(
                c.vision, pos_index=idefics3_position_index(nps),
                name="vision_model",
            )(pix)
            feats = pixel_shuffle(vis, c.scale_factor)
            feats = L.DenseGeneral(t.hidden_size, use_bias=False,
                                   name="modality_projection")(feats)
            if tiles is not None:  # [B*N, tok, D] -> [B, N*tok, D] in order
                feats = feats.reshape(bsz, n_imgs * feats.shape[1],
                                      feats.shape[2])
            is_img = input_ids == c.image_token_id
            img_pos = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0, feats.shape[1] - 1)
            gathered = jnp.take_along_axis(feats, img_pos[..., None], axis=1)
            embeds = jnp.where(is_img[..., None], gathered, embeds)

        positions = jnp.cumsum(attention_mask, axis=1) - 1  # 0-indexed
        s = input_ids.shape[1]
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        mask = causal & attention_mask[:, None, None, :].astype(bool)

        x = embeds
        for i in range(t.num_hidden_layers):
            x = LlamaDecoderLayer(t, name=f"layers_{i}")(x, positions, mask)
        x = Qwen2RMSNorm(eps=t.rms_norm_eps, name="norm")(x)

        proj = L.DenseGeneral(c.embedding_dim, name="embedding_proj_layer")(x)
        proj = proj.astype(jnp.float32)
        proj = proj / jnp.maximum(jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)
        return proj * attention_mask[..., None].astype(proj.dtype)
