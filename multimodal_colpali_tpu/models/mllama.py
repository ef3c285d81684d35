"""Mllama (Llama-3.2-Vision) vision tower + model config - flax.

The reference's old-models tier serves
AdaptLLM/biomed-Llama-3.2-11B-Vision-Instruct through a vLLM container
(/root/reference/00_run_docker_old_models.sh:8-22). Architecture per HF
``MllamaVisionModel`` (transformers/models/mllama/modeling_mllama.py):

- bias-free conv patch embed over each TILE;
- PRE-tile positional embedding: a per-aspect-ratio learned embedding
  (one vector per tile slot), tanh-gated;
- a learned CLASS token prepended per tile;
- gated positional embedding: ``(1 - tanh(g)) * per-patch`` plus
  ``tanh(g) * per-(tile, patch)`` table selected by aspect-ratio id;
- pre layernorm, then patches PADDED to a multiple of 8 with zeros;
- a LOCAL encoder (ungated layers) whose per-layer outputs are kept -
  selected ``intermediate_layers_indices`` become extra feature channels;
- post layernorm, POST-tile positional embedding;
- a GLOBAL encoder of tanh-gated layers;
- output = concat(final global hidden, selected local intermediates)
  over the feature axis -> ``hidden * (1 + n_intermediates)`` channels
  (the text model's ``multi_modal_projector`` maps this to LM width).

Faithfulness notes (these are the checkpoint's trained behavior, NOT
bugs to fix): the attention mask built from the aspect-ratio mask only
blocks invalid->invalid pairs - VALID queries still attend to padding
and masked-tile keys (HF ``_prepare_aspect_ratio_attention_mask``
computes ``inv @ inv^T * min``); and the in-encoder zero-padding rows
participate in attention the same way. Both are reproduced exactly.

The text stack is NOT here: Mllama's self-attention layers are a plain
Llama stack (served by ``generation.engine.LlamaDecodeEngine`` after the
converter renumbers them) with gated CROSS-attention layers interleaved
(``generation/mllama_mm.py`` injects them through ``layer_stack``'s
``interleave`` seam).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.models.idefics3 import LlamaTextConfig


@dataclasses.dataclass(frozen=True)
class MllamaVisionConfig:
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_hidden_layers: int = 32          # local (ungated) encoder
    num_global_layers: int = 8           # global (gated) encoder
    attention_heads: int = 16
    image_size: int = 560
    patch_size: int = 14
    max_num_tiles: int = 4
    norm_eps: float = 1e-5
    intermediate_layers_indices: Tuple[int, ...] = (3, 7, 15, 23, 30)
    # len(supported_aspect_ratios) for max_num_tiles=4 (HF offsets ids
    # by 1; id 0 = padding)
    max_aspect_ratio_id: int = 8

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        """Per-tile token count INCLUDING the class token (HF
        ``MllamaVisionModel.num_patches``)."""
        return self.grid * self.grid + 1

    @property
    def num_patches_padded(self) -> int:
        return (self.num_patches + 7) // 8 * 8

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.attention_heads

    @property
    def output_dim(self) -> int:
        """Feature channels of the tower output (HF vision_output_dim)."""
        return self.hidden_size * (1 + len(self.intermediate_layers_indices))

    @property
    def supported_aspect_ratios(self) -> Tuple[Tuple[int, int], ...]:
        """(rows, cols) tile layouts, in HF's enumeration order
        (``get_all_supported_aspect_ratios``: lexicographic over pairs
        with rows*cols <= max_num_tiles); aspect_ratio_id = index + 1
        (id 0 = padding)."""
        out = []
        for r in range(1, self.max_num_tiles + 1):
            for c in range(1, self.max_num_tiles + 1):
                if r * c <= self.max_num_tiles:
                    out.append((r, c))
        return tuple(out)

    def aspect_ratio_id(self, tiles: Tuple[int, int]) -> int:
        ratios = self.supported_aspect_ratios
        if tuple(tiles) not in ratios:
            raise ValueError(
                f"tile layout {tiles} not in the checkpoint's supported "
                f"aspect ratios {ratios}")
        return ratios.index(tuple(tiles)) + 1


@dataclasses.dataclass(frozen=True)
class MllamaMMConfig:
    """Full Llama-3.2-Vision generator config.

    ``text`` describes ONLY the self-attention layers (renumbered 0..n-1
    by the converter) - text-only inputs skip cross layers entirely in HF
    (``MllamaTextModel.forward``'s ``continue`` branch), so the text path
    IS a plain Llama and serves through every existing decode tier.
    ``cross_attention_layers`` keeps the GLOBAL indices (positions in the
    interleaved stack) exactly as the HF config records them."""

    vision: MllamaVisionConfig = dataclasses.field(
        default_factory=MllamaVisionConfig)
    text: LlamaTextConfig = dataclasses.field(
        default_factory=lambda: LlamaTextConfig.llama3_8b())
    cross_attention_layers: Tuple[int, ...] = (3, 8, 13, 18, 23, 28, 33, 38)
    image_token_id: int = 128256

    @property
    def total_layers(self) -> int:
        return self.text.num_hidden_layers + len(self.cross_attention_layers)

    @property
    def cross_schedule(self) -> Tuple[Tuple[int, int], ...]:
        """(global_layer_idx, self_layer_idx_it_precedes) per cross layer
        - the ``interleave`` keys for ``engine.layer_stack``."""
        out = []
        for n_before, g in enumerate(sorted(self.cross_attention_layers)):
            out.append((g, g - n_before))
        return tuple(out)

    @classmethod
    def llama32_11b_vision(cls) -> "MllamaMMConfig":
        """meta-llama/Llama-3.2-11B-Vision(-Instruct) - the base of the
        reference's AdaptLLM biomed tune. 40-layer interleaved stack =
        32 Llama-3.1-8B self layers + 8 cross layers; vision ViT-H/14 at
        560px, 4 tiles; llama3 rope scaling."""
        import dataclasses as _dc

        text = _dc.replace(LlamaTextConfig.llama3_8b(),
                           rope_llama3=(8.0, 1.0, 4.0, 8192))
        return cls(text=text)

    @classmethod
    def tiny(cls, vocab_size: int = 64) -> "MllamaMMConfig":
        import dataclasses as _dc

        return cls(
            vision=MllamaVisionConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=4,
                num_global_layers=2, attention_heads=2, image_size=28,
                patch_size=14, max_num_tiles=2,
                intermediate_layers_indices=(0, 2),
                max_aspect_ratio_id=3),    # [[1,1],[1,2],[2,1]]
            text=_dc.replace(LlamaTextConfig.tiny_lm(vocab_size=vocab_size),
                             num_hidden_layers=3,
                             tie_word_embeddings=False),
            cross_attention_layers=(1, 4),  # 5-layer stack: S C S S C
            image_token_id=vocab_size,      # == vocab_size (HF convention;
        )                                   # embed table has vocab+8 rows


def blocked_masked_attention(q, k, v, mask, scale: float,
                             block: int = 512) -> jnp.ndarray:
    """Exact attention with an arbitrary boolean mask, computed in query
    blocks so the [L, L] logits never materialize (the 11B tower's
    4-tile sequence is 6432 tokens: full f32 logits would be ~2.6 GB x2
    per image, which the 16 GB chip does not have next to 11B of int8
    weights). q/k/v: [B, L, H, D]; mask [B, 1, L, L] True = attend.
    Bit-identical math to ``layers.attention``'s einsum path per block
    (f32 logits + softmax), scanned over query blocks."""
    b, l, h, d = q.shape
    pad = (-l) % block
    if pad:
        q = jnp.pad(q, ((0, 0), (0, pad), (0, 0), (0, 0)))
        # padding QUERIES are sliced off below; padding KEYS never exist
        # (k/v stay length l)
        mask = jnp.pad(mask, ((0, 0), (0, 0), (0, pad), (0, 0)),
                       constant_values=True)
    nb = q.shape[1] // block
    qb = q.reshape(b, nb, block, h, d).transpose(1, 0, 2, 3, 4)
    mb = mask.reshape(b, 1, nb, block, l).transpose(2, 0, 1, 3, 4)

    def body(carry, qm):
        qi, mi = qm                       # [B, block, H, D], [B, 1, block, L]
        logits = jnp.einsum("bshd,bthd->bhst", qi, k,
                            preferred_element_type=jnp.float32) * scale
        logits = jnp.where(mi, logits, jnp.float32(-1e30))
        probs = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhst,bthd->bshd", probs.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        return carry, out.astype(q.dtype)

    _, blocks = jax.lax.scan(body, None, (qb, mb))
    out = blocks.transpose(1, 0, 2, 3, 4).reshape(b, nb * block, h, d)
    return out[:, :l]


class MllamaVisionAttention(nn.Module):
    """Bias-free MHA (HF ``MllamaVisionAttention``); ``mask`` is a
    boolean [B, 1, L, L] (True = attend). Long sequences (the 4-tile
    560px layout) run the query-blocked path to bound the logits
    transient."""

    cfg: MllamaVisionConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        b, s, _ = x.shape
        shp = (b, s, c.attention_heads, c.head_dim)
        q = L.DenseGeneral(c.hidden_size, use_bias=False,
                           name="q_proj")(x).reshape(shp)
        k = L.DenseGeneral(c.hidden_size, use_bias=False,
                           name="k_proj")(x).reshape(shp)
        v = L.DenseGeneral(c.hidden_size, use_bias=False,
                           name="v_proj")(x).reshape(shp)
        if s >= 2048:
            out = blocked_masked_attention(q, k, v, mask,
                                           scale=c.head_dim ** -0.5)
        else:
            out = L.attention(q, k, v, mask=mask, scale=c.head_dim ** -0.5)
        return L.DenseGeneral(c.hidden_size, use_bias=False, name="o_proj")(
            out.reshape(b, s, -1))


class MllamaVisionLayer(nn.Module):
    cfg: MllamaVisionConfig
    gated: bool = False

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        y = L.LayerNorm(eps=c.norm_eps, name="input_layernorm")(x)
        y = MllamaVisionAttention(c, name="self_attn")(y, mask)
        if self.gated:
            gate = self.param("gate_attn", nn.initializers.zeros, (1,),
                              jnp.float32)
            y = jnp.tanh(gate.astype(y.dtype)) * y
        x = x + y
        y = L.LayerNorm(eps=c.norm_eps, name="post_attention_layernorm")(x)
        y = L.DenseGeneral(c.intermediate_size, name="fc1")(y)
        y = jax.nn.gelu(y, approximate=False)  # HF hidden_act="gelu" (erf)
        y = L.DenseGeneral(c.hidden_size, name="fc2")(y)
        if self.gated:
            gate = self.param("gate_ffn", nn.initializers.zeros, (1,),
                              jnp.float32)
            y = jnp.tanh(gate.astype(y.dtype)) * y
        return x + y


class MllamaVisionTower(nn.Module):
    """pixel_values [N, T, H, W, 3] (normalized NHWC; T = max_num_tiles,
    masked tiles zero), aspect_ratio_ids [N] int32, aspect_ratio_mask
    [N, T] (1 = real tile) -> [N, T * num_patches, output_dim] features
    (class token INCLUDED, in-encoder padding removed), feature order
    [final_global(D) | intermediates interleaved (d, layer)] exactly as
    HF concatenates for the multi_modal_projector."""

    cfg: MllamaVisionConfig

    @nn.compact
    def __call__(self, pixel_values, aspect_ratio_ids, aspect_ratio_mask):
        c = self.cfg
        n, t = pixel_values.shape[:2]
        assert t == c.max_num_tiles, (
            f"pixel_values must carry max_num_tiles={c.max_num_tiles} tile "
            f"slots (zero-padded; aspect_ratio_mask marks the real ones), "
            f"got {t}")
        p_real, p_pad = c.num_patches, c.num_patches_padded
        d = c.hidden_size
        x = nn.Conv(features=d, kernel_size=(c.patch_size,) * 2,
                    strides=(c.patch_size,) * 2, padding="VALID",
                    use_bias=False, name="patch_embedding",
                    dtype=pixel_values.dtype, param_dtype=jnp.float32)(
                        pixel_values.reshape((n * t,) + pixel_values.shape[2:]))
        x = x.reshape(n, t, -1, d)                     # [N, T, g*g, D]

        # pre-tile positional embedding (tanh-gated per-tile vectors)
        pre_tab = self.param("pre_tile_embedding",
                             nn.initializers.normal(0.02),
                             (c.max_aspect_ratio_id + 1, t * d), jnp.float32)
        pre_gate = self.param("pre_tile_gate", nn.initializers.zeros, (1,),
                              jnp.float32)
        pre = jnp.take(pre_tab, aspect_ratio_ids, axis=0).reshape(n, t, 1, d)
        x = x + (jnp.tanh(pre_gate) * pre).astype(x.dtype)

        # class token per tile
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (d,), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype)[None, None, None],
                              (n, t, 1, d)), x], axis=2)  # [N, T, P, D]

        # gated positional embedding: (1-tanh g)*per-patch + tanh(g)*tile
        pos = self.param("pos_embedding", nn.initializers.normal(0.02),
                         (p_real, d), jnp.float32)
        pos_gate = self.param("pos_gate", nn.initializers.zeros, (1,),
                              jnp.float32)
        tile_tab = self.param("tile_pos_embedding",
                              nn.initializers.normal(0.02),
                              (c.max_aspect_ratio_id + 1, t * p_real * d),
                              jnp.float32)
        g = jnp.tanh(pos_gate)
        x = x + ((1.0 - g) * pos)[None, None].astype(x.dtype)
        tile_pos = jnp.take(tile_tab, aspect_ratio_ids,
                            axis=0).reshape(n, t, p_real, d)
        x = x + (g * tile_pos).astype(x.dtype)

        x = L.LayerNorm(eps=1e-5, name="layernorm_pre")(x)

        # pad patches to a multiple of 8 (zeros) and build the HF mask:
        # only invalid->invalid pairs are blocked (valid queries DO see
        # padding keys - faithful to _prepare_aspect_ratio_attention_mask)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, p_pad - p_real), (0, 0)))
        valid = (aspect_ratio_mask[:, :, None].astype(bool)
                 & (jnp.arange(p_pad) < p_real)[None, None])   # [N, T, Pp]
        inv = (~valid).reshape(n, t * p_pad)
        mask = ~(inv[:, :, None] & inv[:, None, :])            # [N, L, L]
        mask = mask[:, None]                                   # [N, 1, L, L]

        x = x.reshape(n, t * p_pad, d)
        locals_out = []
        for i in range(c.num_hidden_layers):
            x = MllamaVisionLayer(c, gated=False, name=f"local_{i}")(x, mask)
            locals_out.append(x)

        x = L.LayerNorm(eps=1e-5, name="layernorm_post")(x)

        # post-tile positional embedding, then the gated global encoder
        post_tab = self.param("post_tile_embedding",
                              nn.initializers.normal(0.02),
                              (c.max_aspect_ratio_id + 1, t * d), jnp.float32)
        post_gate = self.param("post_tile_gate", nn.initializers.zeros, (1,),
                               jnp.float32)
        post = jnp.take(post_tab, aspect_ratio_ids,
                        axis=0).reshape(n, t, 1, d)
        x = x.reshape(n, t, p_pad, d) + (jnp.tanh(post_gate) * post).astype(
            x.dtype)
        x = x.reshape(n, t * p_pad, d)
        for i in range(c.num_global_layers):
            x = MllamaVisionLayer(c, gated=True, name=f"global_{i}")(x, mask)

        # unpad + assemble [final | intermediates (d-major, layer-minor)]
        x = x.reshape(n, t, p_pad, d)[:, :, :p_real]
        inter = jnp.stack(
            [locals_out[i].reshape(n, t, p_pad, d)[:, :, :p_real]
             for i in c.intermediate_layers_indices], axis=-1)
        inter = inter.reshape(n, t, p_real, -1)
        out = jnp.concatenate([x, inter], axis=-1)
        return out.reshape(n, t * p_real, c.output_dim)
