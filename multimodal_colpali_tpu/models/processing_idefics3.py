"""Input processing for ColIdefics3/ColSmolVLM.

SmolVLM preprocessing: square resize to the vision size, 0.5/0.5
normalization (Idefics convention), single full-frame image (no tiling -
retrieval uses the global view); prompts mirror the other families.
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence

import numpy as np

from multimodal_colpali_tpu.models.idefics3 import ColIdefics3ModelConfig
from multimodal_colpali_tpu.models.processing import ImagePreprocessor, SimpleTokenizer

IMAGE_PROMPT = "Describe the image."
QUERY_PREFIX = "Query: "
QUERY_AUGMENTATION_TOKENS = 10


class ColIdefics3Processor:
    """``image_splitting=True`` enables the Idefics3/SmolVLM tiled layout,
    mirroring HF ``Idefics3ImageProcessor``'s resize chain: longest edge
    scaled to the target (UP or down, even-rounded), then STRETCHED to the
    nearest tile multiples (``resize_for_vision_encoder`` - HF never pads
    single images; its pixel attention masks are all-ones per image and
    only matter when batching differently-sized images), split into exact
    encoder-size tiles; the prompt carries HF's structural markers
    (``<fake_token_around_image>``, ``<row_i_col_j>``, ``<global-img>``)
    between the per-tile image-token runs, global view LAST; the global
    view resizes the stretched canvas (HF ``split_image`` order). Tile
    pixels bit-match HF's (tests/test_static_shape_deviation.py).
    Remaining deviation (documented): ``max_tiles`` clamps very large
    grids to keep jit layouts bounded (HF is unclamped)."""

    def __init__(self, cfg: ColIdefics3ModelConfig, tokenizer: Optional[Any] = None,
                 query_pad_to_multiple: int = 16, image_splitting: bool = False,
                 max_tiles: int = 4, longest_edge: Optional[int] = None):
        self.cfg = cfg
        self.tokenizer = tokenizer or SimpleTokenizer(cfg.text.vocab_size,
                                                      cfg.image_token_id)
        self.query_pad_to_multiple = query_pad_to_multiple
        self.image_preprocessor = ImagePreprocessor(cfg.vision.image_size)
        self.n_image_tokens = cfg.n_image_tokens
        self.image_splitting = image_splitting
        self.dynamic_resolution = image_splitting  # registry grouping protocol
        self.max_tiles = max_tiles
        self.longest_edge = longest_edge or 2 * cfg.vision.image_size

    def _ids(self, text: str) -> List[int]:
        try:
            return list(self.tokenizer.encode(text, add_special_tokens=False))
        except TypeError:
            return list(self.tokenizer.encode(text))

    # -- splitting -------------------------------------------------------------

    def _resize_dims(self, w: int, h: int) -> tuple:
        """HF's two-step output size: (step1 w, h) longest edge == target
        with even-rounded short side (``_resize_output_size_rescale_to_
        max_len``), then (step2 w, h) ceil-stretched to tile multiples
        (``resize_for_vision_encoder``)."""
        import math

        s = self.cfg.vision.image_size
        aspect = w / max(h, 1)
        if w >= h:
            w1 = self.longest_edge
            h1 = int(w1 / aspect)
            h1 += h1 % 2
        else:
            h1 = self.longest_edge
            w1 = int(h1 * aspect)
            w1 += w1 % 2
        w1, h1 = max(w1, 1), max(h1, 1)
        aspect = w1 / max(h1, 1)
        if w1 >= h1:
            w2 = math.ceil(w1 / s) * s
            h2 = math.ceil(int(w2 / aspect) / s) * s
        else:
            h2 = math.ceil(h1 / s) * s
            w2 = math.ceil(int(h2 * aspect) / s) * s
        return (w1, h1), (max(w2, s), max(h2, s))

    def tiling_for(self, img: Any) -> tuple:
        """(ty, tx): the tile grid of HF's stretched canvas."""
        from PIL import Image

        if isinstance(img, Image.Image):
            w, h = img.size
        else:
            h, w = np.asarray(img).shape[:2]
        s = self.cfg.vision.image_size
        _, (w2, h2) = self._resize_dims(w, h)
        ty, tx = h2 // s, w2 // s
        while ty * tx > self.max_tiles:  # shrink the longer axis first
            if ty >= tx and ty > 1:
                ty -= 1
            elif tx > 1:
                tx -= 1
            else:
                break
        return ty, tx

    def group_by_grid(self, images: Sequence[Any]):
        groups = {}
        for i, img in enumerate(images):
            g = self.tiling_for(img) if self.image_splitting else None
            groups.setdefault(g, []).append(i)
        return sorted(groups.items(), key=lambda kv: (kv[0] is not None, kv[0]))

    def _split_tiles(self, img: Any, tiles: tuple) -> np.ndarray:
        """[T+1, S, S, 3] normalized: row-major canvas tiles + global LAST
        (the Idefics3 sub-image order). Two LANCZOS resizes matching HF's
        chain exactly (longest-edge target, then stretch to the tile
        canvas - no padding, so no pixel mask is needed)."""
        from PIL import Image

        s = self.cfg.vision.image_size
        ty, tx = tiles
        if not isinstance(img, Image.Image):
            img = Image.fromarray(np.asarray(img).astype(np.uint8))
        img = img.convert("RGB")
        w, h = img.size
        (w1, h1), _ = self._resize_dims(w, h)
        step1 = img.resize((w1, h1), Image.LANCZOS)
        # the tile canvas honors the (possibly max_tiles-clamped) grid
        th, tw = ty * s, tx * s
        canvas = step1.resize((tw, th), Image.LANCZOS)
        arr = np.asarray(canvas, np.float32)
        parts = []
        for yi in range(ty):
            for xi in range(tx):
                parts.append(arr[yi * s:(yi + 1) * s, xi * s:(xi + 1) * s])
        # global view: HF's split_image resizes the STRETCHED canvas to
        # the encoder size - bit-matched in tests
        parts.append(np.asarray(canvas.resize((s, s), Image.LANCZOS),
                                np.float32))
        stack = np.stack(parts)  # [T+1, S, S, 3], global last
        return ((stack / 255.0) - 0.5) / 0.5

    def _split_prompt_ids(self, tiles: tuple) -> List[int]:
        """HF _prompt_split_image structure with per-tile markers."""
        ty, tx = tiles
        img = self.cfg.image_token_id
        fake = self._ids("<fake_token_around_image>")
        seq: List[int] = []
        for yi in range(ty):
            for xi in range(tx):
                seq += fake + self._ids(f"<row_{yi + 1}_col_{xi + 1}>")
                seq += [img] * self.n_image_tokens
            seq += self._ids("\n")
        seq += self._ids("\n") + fake + self._ids("<global-img>")
        seq += [img] * self.n_image_tokens + fake
        return seq

    def process_images(self, images: Sequence[Any],
                       grid: Optional[tuple] = None,
                       device_preprocess: bool = False) -> dict:
        prompt_ids = self._ids(IMAGE_PROMPT + "\n")
        if grid is not None:
            if device_preprocess:
                raise ValueError(
                    "device_preprocess supports the fixed square layout "
                    "only, not image splitting")
            pix = np.stack([self._split_tiles(im, grid) for im in images])
            seq = self._split_prompt_ids(grid) + prompt_ids
        else:
            pix = (self.image_preprocessor.u8(images) if device_preprocess
                   else self.image_preprocessor(images))
            seq = [self.cfg.image_token_id] * self.n_image_tokens + prompt_ids
        b = len(images)
        input_ids = np.tile(np.asarray(seq, np.int32), (b, 1))
        return {
            "input_ids": input_ids,
            "attention_mask": np.ones_like(input_ids),
            "pixel_values": pix,
            "grid": grid,
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
