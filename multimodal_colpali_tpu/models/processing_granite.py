"""Input processing for ColGranite (granite-vision / LLaVA-Next).

SigLIP preprocessing (384px square, 0.5/0.5 normalization); the prompt
carries base + single-tile image placeholders (g^2 + g*(g+1) tokens for the
static square layout) followed by a short instruction; queries as usual.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import numpy as np

from multimodal_colpali_tpu.models.granite import ColGraniteModelConfig
from multimodal_colpali_tpu.models.processing import ImagePreprocessor, SimpleTokenizer

IMAGE_PROMPT = "Describe the image."
QUERY_PREFIX = "Query: "
QUERY_AUGMENTATION_TOKENS = 10


class ColGraniteProcessor:
    def __init__(self, cfg: ColGraniteModelConfig, tokenizer: Optional[Any] = None,
                 query_pad_to_multiple: int = 16):
        self.cfg = cfg
        self.tokenizer = tokenizer or SimpleTokenizer(cfg.text.vocab_size,
                                                      cfg.image_token_id)
        self.query_pad_to_multiple = query_pad_to_multiple
        self.image_preprocessor = ImagePreprocessor(cfg.vision.image_size)
        self.n_image_tokens = cfg.n_image_tokens

    def _ids(self, text: str) -> List[int]:
        try:
            return list(self.tokenizer.encode(text, add_special_tokens=False))
        except TypeError:
            return list(self.tokenizer.encode(text))

    def process_images(self, images: Sequence[Any]) -> dict:
        pix = self.image_preprocessor(images)
        prompt_ids = self._ids(IMAGE_PROMPT + "\n")
        seq = [self.cfg.image_token_id] * self.n_image_tokens + prompt_ids
        b = len(images)
        input_ids = np.tile(np.asarray(seq, np.int32), (b, 1))
        return {
            "input_ids": input_ids,
            "attention_mask": np.ones_like(input_ids),
            "pixel_values": pix,
        }

    def process_queries(self, queries: Sequence[str]) -> dict:
        pad = getattr(self.tokenizer, "pad_id", 0)
        rows = []
        for q in queries:
            ids = self._ids(QUERY_PREFIX + q + "\n")
            ids += [pad] * QUERY_AUGMENTATION_TOKENS
            rows.append(ids)
        m = self.query_pad_to_multiple
        max_len = ((max(len(r) for r in rows) + m - 1) // m) * m
        input_ids = np.full((len(rows), max_len), pad, np.int32)
        attention_mask = np.zeros((len(rows), max_len), np.int32)
        for i, r in enumerate(rows):
            input_ids[i, : len(r)] = r
            attention_mask[i, : len(r)] = 1
        return {"input_ids": input_ids, "attention_mask": attention_mask}

    def score_multi_vector(self, qs, ds):
        from multimodal_colpali_tpu.models.processing import pad_multivectors
        import jax.numpy as jnp
        from multimodal_colpali_tpu.ops.maxsim import maxsim_scores

        q_pad, q_lens = pad_multivectors(qs)
        d_pad, d_lens = pad_multivectors(ds)
        return np.asarray(maxsim_scores(jnp.asarray(q_pad), jnp.asarray(d_pad),
                                        jnp.asarray(q_lens), jnp.asarray(d_lens)))
