"""ColPali retrieval model: SigLIP + projector + Gemma + 128-d head.

TPU-native (flax/pjit) equivalent of ``ColPaliForRetrieval`` /
``colpali_engine`` models the reference loads in torch
(functions.py:1464-1477, 01_create_context_qdrant.py:163-205). The forward
emits L2-normalized per-token embeddings ``[B, S, embedding_dim]``; MaxSim
scoring over these reproduces ``processor.score_multi_vector``
(05_experiment02.py:214).
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import FrozenDict

from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.models.configs import ColPaliModelConfig
from multimodal_colpali_tpu.models.gemma import GemmaEmbedder, GemmaModel
from multimodal_colpali_tpu.models.siglip import SiglipVisionTower


class ColPaliModel(nn.Module):
    cfg: ColPaliModelConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,                 # [B, S] int32
        attention_mask: jax.Array,            # [B, S] 1=valid
        pixel_values: Optional[jax.Array] = None,  # [B, H, W, 3] NHWC normalized
    ) -> jax.Array:
        c = self.cfg
        embeds = GemmaEmbedder(c.text, name="embed")(
            jnp.where(input_ids == c.image_token_id, 0, input_ids)
        )

        if pixel_values is not None:
            vis = SiglipVisionTower(c.vision, name="vision_tower")(pixel_values)
            img = L.DenseGeneral(c.vision.projection_dim, name="multi_modal_projector")(vis)
            img = img / jnp.asarray(c.text.hidden_size ** 0.5, img.dtype)
            # Scatter image features into the <image> token slots. PaliGemma
            # prompts place all image tokens as a fixed-length prefix, so the
            # slot count per row is static and masked-scatter reduces to a
            # where() over a rolled index map.
            is_img = (input_ids == c.image_token_id)  # [B, S]
            n_patches = img.shape[1]
            # position of each sequence slot among image slots (cumsum-1)
            img_pos = jnp.cumsum(is_img, axis=1) - 1  # [B, S]
            img_pos = jnp.clip(img_pos, 0, n_patches - 1)
            gathered = jnp.take_along_axis(
                img, img_pos[..., None], axis=1
            )  # [B, S, hidden]
            embeds = jnp.where(is_img[..., None], gathered, embeds)

        # Gemma scales embeddings by sqrt(hidden). (Image features were
        # divided by sqrt(hidden) above, so net image scale is 1 - matching
        # HF PaliGemma exactly.)
        embeds = (
            embeds.astype(jnp.float32) * (c.text.hidden_size ** 0.5)
        ).astype(embeds.dtype)

        positions = jnp.cumsum(attention_mask, axis=1)  # 1-indexed like HF
        hidden = GemmaModel(c.text, name="language_model")(
            embeds, positions, attention_mask
        )
        proj = L.DenseGeneral(c.embedding_dim, name="embedding_proj_layer")(hidden)
        proj = proj.astype(jnp.float32)
        proj = proj / jnp.maximum(
            jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12
        )
        return proj * attention_mask[..., None].astype(proj.dtype)

    def init_params(self, rng: jax.Array, seq_len: int = 8,
                    with_image: bool = False) -> FrozenDict:
        c = self.cfg
        ids = jnp.zeros((1, seq_len), jnp.int32)
        mask = jnp.ones((1, seq_len), jnp.int32)
        pix = (
            jnp.zeros((1, c.vision.image_size, c.vision.image_size, 3), jnp.float32)
            if with_image else None
        )
        return self.init(rng, ids, mask, pix)["params"]


@functools.partial(jax.jit, static_argnames=("model", "dtype"))
def colpali_forward(model: ColPaliModel, params: Any, input_ids, attention_mask,
                    pixel_values=None, dtype=jnp.bfloat16):
    """Jitted forward with params cast to ``dtype`` for the compute path."""
    cast = jax.tree.map(
        lambda p: p.astype(dtype) if p.dtype == jnp.float32 else p, params
    )
    if pixel_values is not None:
        pixel_values = pixel_values.astype(dtype)
    return model.apply({"params": cast}, input_ids, attention_mask, pixel_values)
