"""Model configurations for the TPU encoder family.

Presets mirror the checkpoints the reference loads through
``load_retriever`` (reference 01_create_context_qdrant.py:163-205,
05_experiment02.py:331-372): ColPali v1.x = SigLIP-So400m vision tower +
Gemma-2B text tower + 128-d projection; bge-base-en-v1.5 = 12-layer BERT.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SiglipVisionConfig:
    hidden_size: int = 1152
    intermediate_size: int = 4304
    num_hidden_layers: int = 27
    num_attention_heads: int = 16
    image_size: int = 448
    patch_size: int = 14
    layer_norm_eps: float = 1e-6
    projection_dim: int = 2048  # output dim of the multimodal projector

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


@dataclasses.dataclass(frozen=True)
class GemmaTextConfig:
    vocab_size: int = 257216
    hidden_size: int = 2048
    intermediate_size: int = 16384
    num_hidden_layers: int = 18
    num_attention_heads: int = 8
    num_key_value_heads: int = 1
    head_dim: int = 256
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0


@dataclasses.dataclass(frozen=True)
class Gemma3TextConfig:
    """Gemma-3 text architecture - the reference's ACTUAL generator class
    (vLLM serves google/gemma-3-27b-it, 00_run_docker_containers.sh:26-39;
    this repo's config.py names it as the default local model).

    Differences vs Gemma-1 (``GemmaTextConfig``), per HF
    ``Gemma3TextConfig``/``Gemma3DecoderLayer``:

    - GQA with per-head q/k RMSNorm after the projections, before rope.
    - Interleaved attention: every ``sliding_window_pattern``-th layer is
      global (full causal), the rest attend only the last
      ``sliding_window`` tokens.
    - Dual rope bases: sliding layers use ``rope_local_base_freq``
      (10k, unscaled); global layers use ``rope_theta`` (1M) with LINEAR
      position scaling (positions divided by ``rope_scaling_factor``).
    - Sandwich norms: post-attention + pre/post-feedforward RMSNorms
      wrap each residual branch.
    - Attention scale ``query_pre_attn_scalar ** -0.5`` (not head_dim).

    Defaults are the 27B text tower (hidden 5376, 62 layers, 32 q / 16 kv
    heads, head_dim 128, 5:1 sliding:global at window 1024).
    """

    vocab_size: int = 262208
    hidden_size: int = 5376
    intermediate_size: int = 21504
    num_hidden_layers: int = 62
    num_attention_heads: int = 32
    num_key_value_heads: int = 16
    head_dim: int = 128
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    rope_local_base_freq: float = 10_000.0
    rope_scaling_factor: float = 8.0
    sliding_window: int = 1024
    sliding_window_pattern: int = 6
    layer_types: tuple = ()          # explicit override of the pattern
    query_pre_attn_scalar: float = 168.0   # 27B: hidden // n_heads

    is_gemma3 = True   # engine dispatch marker (layer_stack branches on it)

    @property
    def layer_types_resolved(self) -> tuple:
        """Per-layer "sliding_attention"/"full_attention", HF's pattern
        rule: layer i is global iff ``(i + 1) % sliding_window_pattern``
        is 0."""
        if self.layer_types:
            return tuple(self.layer_types)
        return tuple(
            "full_attention" if (i + 1) % self.sliding_window_pattern == 0
            else "sliding_attention"
            for i in range(self.num_hidden_layers))

    @classmethod
    def gemma3_27b(cls) -> "Gemma3TextConfig":
        return cls()

    # The smaller released family members (published HF config values) -
    # users of the reference pick generator size by GPU budget; the same
    # knob exists here (gemma-3-4b fits ONE v5e chip in bf16, 27B needs
    # the dp x tp sharded serving path).
    @classmethod
    def gemma3_1b(cls) -> "Gemma3TextConfig":
        return cls(vocab_size=262_144, hidden_size=1152,
                   intermediate_size=6912, num_hidden_layers=26,
                   num_attention_heads=4, num_key_value_heads=1,
                   head_dim=256, sliding_window=512,
                   rope_scaling_factor=1.0, query_pre_attn_scalar=256.0)

    @classmethod
    def gemma3_4b(cls) -> "Gemma3TextConfig":
        return cls(hidden_size=2560, intermediate_size=10240,
                   num_hidden_layers=34, num_attention_heads=8,
                   num_key_value_heads=4, head_dim=256,
                   query_pre_attn_scalar=256.0)

    @classmethod
    def gemma3_12b(cls) -> "Gemma3TextConfig":
        return cls(hidden_size=3840, intermediate_size=15360,
                   num_hidden_layers=48, num_attention_heads=16,
                   num_key_value_heads=8, head_dim=256,
                   query_pre_attn_scalar=256.0)

    @classmethod
    def tiny(cls, vocab_size: int = 64) -> "Gemma3TextConfig":
        """Small config for torch-parity tests: both layer types present,
        a window small enough that realistic prompts exercise it."""
        return cls(
            vocab_size=vocab_size, hidden_size=16, intermediate_size=32,
            num_hidden_layers=4, num_attention_heads=2,
            num_key_value_heads=1, head_dim=8, sliding_window=8,
            sliding_window_pattern=2, query_pre_attn_scalar=8.0)


@dataclasses.dataclass(frozen=True)
class ColPaliModelConfig:
    vision: SiglipVisionConfig = dataclasses.field(default_factory=SiglipVisionConfig)
    text: GemmaTextConfig = dataclasses.field(default_factory=GemmaTextConfig)
    embedding_dim: int = 128
    image_token_id: int = 257152

    @classmethod
    def colpali_v1_3(cls) -> "ColPaliModelConfig":
        return cls()

    @classmethod
    def tiny(cls, vocab_size: int = 64) -> "ColPaliModelConfig":
        """Small config for tests / CPU parity against torch."""
        return cls(
            vision=SiglipVisionConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=2, image_size=28, patch_size=14,
                projection_dim=16,
            ),
            text=GemmaTextConfig(
                vocab_size=vocab_size, hidden_size=16, intermediate_size=32,
                num_hidden_layers=2, num_attention_heads=2,
                num_key_value_heads=1, head_dim=8,
            ),
            embedding_dim=8,
            image_token_id=vocab_size - 1,
        )


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """bge-base-en-v1.5 - standard BERT-base."""

    vocab_size: int = 30522
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @classmethod
    def bge_base(cls) -> "BertConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "BertConfig":
        return cls(vocab_size=100, hidden_size=32, intermediate_size=64,
                   num_hidden_layers=2, num_attention_heads=2,
                   max_position_embeddings=64)


@dataclasses.dataclass(frozen=True)
class Gemma3MMConfig:
    """Gemma-3 multimodal (vision + LM) - the FULL generator the
    reference serves (google/gemma-3-27b-it answers IMAGE-context MCQs,
    00_run_docker_containers.sh:26-39 + 05_experiment02.py:155-166).

    The vision tower is plain SigLIP (shared with PaliGemma -
    ``SiglipVisionTower``); the projector avg-pools the patch grid down
    to ``mm_tokens_per_image`` soft tokens (RMSNorm + a bias-free
    projection). Image tokens attend BIDIRECTIONALLY within their own
    image span; everything else is causal (incl. the 5:1 sliding
    interleave)."""

    vision: SiglipVisionConfig = dataclasses.field(
        default_factory=lambda: SiglipVisionConfig(
            hidden_size=1152, intermediate_size=4304, num_hidden_layers=27,
            num_attention_heads=16, image_size=896, patch_size=14))
    text: Gemma3TextConfig = dataclasses.field(
        default_factory=Gemma3TextConfig)
    image_token_id: int = 262144
    mm_tokens_per_image: int = 256

    @classmethod
    def gemma3_27b(cls) -> "Gemma3MMConfig":
        return cls()

    # 4b/12b share the 27B's SigLIP-400M tower + 256-token projector;
    # only the text tower shrinks (published HF configs). 1b is
    # text-only upstream, so no mm variant exists for it.
    @classmethod
    def gemma3_4b(cls) -> "Gemma3MMConfig":
        return cls(text=Gemma3TextConfig.gemma3_4b())

    @classmethod
    def gemma3_12b(cls) -> "Gemma3MMConfig":
        return cls(text=Gemma3TextConfig.gemma3_12b())

    @classmethod
    def tiny(cls, vocab_size: int = 64) -> "Gemma3MMConfig":
        return cls(
            vision=SiglipVisionConfig(
                hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=2, image_size=28, patch_size=14),
            text=Gemma3TextConfig.tiny(vocab_size=vocab_size),
            image_token_id=vocab_size - 1,
            mm_tokens_per_image=1,
        )
