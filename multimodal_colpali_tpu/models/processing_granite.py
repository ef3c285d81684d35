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


def select_best_resolution(h: int, w: int, pinpoints) -> tuple:
    """LLaVA-Next best-pinpoint pick (HF ``select_best_resolution``):
    maximize covered original pixels after aspect-preserving fit, break
    ties by minimal wasted canvas area. Pinpoints/returns are (H, W)."""
    best, best_fit, best_waste = None, -1, None
    for ph, pw in pinpoints:
        scale = min(pw / w, ph / h)
        dw, dh = int(w * scale), int(h * scale)
        fit = min(dw * dh, w * h)
        waste = ph * pw - fit
        if fit > best_fit or (fit == best_fit and waste < best_waste):
            best, best_fit, best_waste = (ph, pw), fit, waste
    return best


class ColGraniteProcessor:
    """``anyres=True`` enables LLaVA-Next multi-tile layouts: each image
    picks the best-fit canvas from ``pinpoints`` (aspect-preserving resize
    + centered pad, HF _resize_for_patching/_pad_for_patching), splits into
    base-size tiles row-major, and prepends the square base image -
    matching the reference's granite-vision converter inputs
    (functions.py:85-99 feeds Docling's granite pipeline). Batches must be
    grouped by tiling (``group_by_grid``); the retriever registry does."""

    def __init__(self, cfg: ColGraniteModelConfig, tokenizer: Optional[Any] = None,
                 query_pad_to_multiple: int = 16, anyres: bool = False,
                 pinpoints: Optional[Sequence[tuple]] = None):
        self.cfg = cfg
        self.tokenizer = tokenizer or SimpleTokenizer(cfg.text.vocab_size,
                                                      cfg.image_token_id)
        self.query_pad_to_multiple = query_pad_to_multiple
        self.image_preprocessor = ImagePreprocessor(cfg.vision.image_size)
        self.n_image_tokens = cfg.n_image_tokens
        self.anyres = anyres
        self.dynamic_resolution = anyres  # registry grouping protocol
        self.pinpoints = list(pinpoints) if pinpoints is not None \
            else cfg.default_pinpoints()

    def _ids(self, text: str) -> List[int]:
        try:
            return list(self.tokenizer.encode(text, add_special_tokens=False))
        except TypeError:
            return list(self.tokenizer.encode(text))

    # -- anyres tiling --------------------------------------------------------

    def tiling_for(self, img: Any) -> tuple:
        """(ty, tx, dy, dx) static layout for one image: canvas tiling
        plus the HF ``unpad_image`` crop in FEATURE units (dy/dx feature
        rows/cols removed from EACH side of the assembled spatial grid).
        Including the crop in the layout key is what makes HF's
        aspect-dependent unpad exact under static TPU shapes: each
        distinct crop is its own jit specialization (images of one
        corpus overwhelmingly share a handful of aspects), instead of
        skipping the crop and carrying pad-row tokens (the round-4
        quantified deviation, now gone)."""
        from PIL import Image

        if isinstance(img, Image.Image):
            w, h = img.size
        else:
            h, w = np.asarray(img).shape[:2]
        ph, pw = select_best_resolution(h, w, self.pinpoints)
        s = self.cfg.vision.image_size
        ty, tx = ph // s, pw // s
        # HF unpad_image (modeling_llava_next.py) on the [ty*g, tx*g]
        # feature grid, original size (h, w) - same float comparisons
        # and int(round(, 7)) arithmetic
        g = self.cfg.grid
        ch, cw = ty * g, tx * g
        dy = dx = 0
        if w / h > cw / ch:
            new_h = int(round(h * (cw / w), 7))
            dy = (ch - new_h) // 2
        else:
            new_w = int(round(w * (ch / h), 7))
            dx = (cw - new_w) // 2
        return ty, tx, dy, dx

    def group_by_grid(self, images: Sequence[Any]):
        """Group image indices by tiling (registry grouping protocol)."""
        groups = {}
        for i, img in enumerate(images):
            g = self.tiling_for(img) if self.anyres else None
            groups.setdefault(g, []).append(i)
        return sorted(groups.items(), key=lambda kv: (kv[0] is not None, kv[0]))

    def _canvas_tiles(self, img: Any, tiles: tuple) -> np.ndarray:
        """[1+T, S, S, 3] normalized: base image + row-major canvas tiles
        (aspect-preserving resize, centered zero pad - HF patching)."""
        from PIL import Image

        s = self.cfg.vision.image_size
        ty, tx = tiles
        if not isinstance(img, Image.Image):
            img = Image.fromarray(np.asarray(img).astype(np.uint8))
        img = img.convert("RGB")
        w, h = img.size
        th, tw = ty * s, tx * s
        scale = min(tw / w, th / h)
        nw, nh = min(int(np.ceil(w * scale)), tw), min(int(np.ceil(h * scale)), th)
        resized = img.resize((nw, nh), Image.BICUBIC)
        canvas = Image.new("RGB", (tw, th), (0, 0, 0))
        canvas.paste(resized, ((tw - nw) // 2, (th - nh) // 2))
        arr = np.asarray(canvas, np.float32)
        parts = [np.asarray(img.resize((s, s), Image.BICUBIC), np.float32)]
        for yi in range(ty):
            for xi in range(tx):
                parts.append(arr[yi * s:(yi + 1) * s, xi * s:(xi + 1) * s])
        stack = np.stack(parts)  # [1+T, S, S, 3]
        return ((stack / 255.0) - 0.5) / 0.5

    def process_images(self, images: Sequence[Any], grid: Optional[tuple] = None) -> dict:
        if grid is not None:  # anyres tiling for this group
            pix = np.stack([self._canvas_tiles(im, grid[:2]) for im in images])
            n_tok = self.cfg.n_image_tokens_for(grid)
        else:
            pix = self.image_preprocessor(images)
            n_tok = self.n_image_tokens
        prompt_ids = self._ids(IMAGE_PROMPT + "\n")
        seq = [self.cfg.image_token_id] * n_tok + prompt_ids
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
