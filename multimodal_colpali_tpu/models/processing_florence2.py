"""Input processing for ColFlor: Florence-2 image pipeline + retrieval prompts.

Florence-2 preprocessing: resize to the square canvas (768x768 for base),
ImageNet normalization. The prompt layout mirrors the other families: the
image contributes 1 pooled + (H/16)*(W/16) patch tokens as placeholders,
followed by a short instruction; queries are text + augmentation pads.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import numpy as np

from multimodal_colpali_tpu.models.florence2 import ColFlorModelConfig
from multimodal_colpali_tpu.models.processing import SimpleTokenizer

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

IMAGE_PROMPT = "Describe the image."
QUERY_PREFIX = "Query: "
QUERY_AUGMENTATION_TOKENS = 10


class ColFlorProcessor:
    def __init__(self, cfg: ColFlorModelConfig, tokenizer: Optional[Any] = None,
                 query_pad_to_multiple: int = 16):
        self.cfg = cfg
        self.tokenizer = tokenizer or SimpleTokenizer(cfg.text.vocab_size,
                                                      cfg.image_token_id)
        self.query_pad_to_multiple = query_pad_to_multiple
        # total downsampling = product of patch strides
        ds = 1
        for s in cfg.vision.patch_stride:
            ds *= s
        grid = cfg.image_size // ds
        self.n_image_tokens = 1 + grid * grid  # pooled token + patches

    def _ids(self, text: str) -> List[int]:
        try:
            return list(self.tokenizer.encode(text, add_special_tokens=False))
        except TypeError:
            return list(self.tokenizer.encode(text))

    def preprocess_image(self, img: Any) -> np.ndarray:
        size = self.cfg.image_size
        if Image is not None and isinstance(img, Image.Image):
            arr = np.asarray(img.convert("RGB").resize((size, size), Image.BICUBIC),
                             np.float32)
        else:
            arr = np.asarray(img, np.float32)
            if arr.shape[:2] != (size, size):
                arr = np.asarray(Image.fromarray(arr.astype(np.uint8))
                                 .resize((size, size), Image.BICUBIC), np.float32)
        return (arr / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    def process_images(self, images: Sequence[Any]) -> dict:
        pix = np.stack([self.preprocess_image(im) for im in images])
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
