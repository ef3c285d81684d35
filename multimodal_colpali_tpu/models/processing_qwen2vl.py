"""Input processing for ColQwen2: Qwen2-VL patch layout, prompts, mrope ids.

Replicates the Qwen2VL image pipeline (smart-resize to a multiple-of-28
bucket, CLIP normalization, temporal doubling, merge-group patch flattening)
and the retrieval prompts of colpali-engine's ColQwen2Processor, plus the
mrope position ids the backbone needs (``get_rope_index`` semantics for the
single-image-prefix layout used in retrieval).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from multimodal_colpali_tpu.models.processing import SimpleTokenizer
from multimodal_colpali_tpu.models.qwen2vl import ColQwen2ModelConfig

try:
    from PIL import Image
except Exception:  # pragma: no cover
    Image = None

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

IMAGE_PROMPT = "Describe the image."
QUERY_PREFIX = "Query: "
QUERY_AUGMENTATION_TOKENS = 10


def flatten_patches(img: np.ndarray, cfg: ColQwen2ModelConfig,
                    grid: Optional[Tuple[int, int]] = None) -> np.ndarray:
    """[H, W, 3] float -> [grid_h*grid_w, C*T*ps*ps] in merge-group order."""
    v = cfg.vision
    ps, m, t = v.patch_size, v.spatial_merge_size, v.temporal_patch_size
    gh, gw = grid if grid is not None else (cfg.grid_h, cfg.grid_w)
    chw = img.transpose(2, 0, 1)                       # [C, H, W]
    frames = np.repeat(chw[None], t, axis=0)           # [T, C, H, W]
    p = frames.reshape(1, t, 3, gh // m, m, ps, gw // m, m, ps)
    p = p.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return p.reshape(gh * gw, 3 * t * ps * ps)


def smart_grid(h_px: int, w_px: int, factor: int,
               min_pixels: int, max_pixels: int) -> Tuple[int, int]:
    """Qwen2-VL smart_resize: native pixel dims -> (H, W) rounded to the
    patch*merge factor, area-clamped into [min_pixels, max_pixels].

    Replicates transformers' image_processing_qwen2_vl.smart_resize so the
    dynamic-resolution pipeline picks the same grid the HF processor picks.
    """
    import math

    h = max(round(h_px / factor), 1) * factor
    w = max(round(w_px / factor), 1) * factor
    if h * w > max_pixels:
        beta = math.sqrt(h_px * w_px / max_pixels)
        h = max(math.floor(h_px / beta / factor), 1) * factor
        w = max(math.floor(w_px / beta / factor), 1) * factor
    elif h * w < min_pixels:
        beta = math.sqrt(min_pixels / (h_px * w_px))
        h = math.ceil(h_px * beta / factor) * factor
        w = math.ceil(w_px * beta / factor) * factor
    return h, w


class ColQwen2Processor:
    """``dynamic_resolution=True`` switches from the single static bucket
    (cfg.grid_h x grid_w) to per-image grids chosen by Qwen2-VL's
    smart_resize, bounded by ``min_pixels``/``max_pixels`` (default budget =
    the static bucket's pixel area, so HBM/MXU cost per image is unchanged).
    Batches must then be grouped by grid (``group_by_grid``); the retriever
    registry does this and keeps one jit cache entry per grid."""

    def __init__(self, cfg: ColQwen2ModelConfig, tokenizer: Optional[Any] = None,
                 query_pad_to_multiple: int = 16,
                 dynamic_resolution: bool = False,
                 min_pixels: Optional[int] = None,
                 max_pixels: Optional[int] = None):
        self.cfg = cfg
        self.tokenizer = tokenizer or SimpleTokenizer(cfg.text.vocab_size,
                                                      cfg.image_token_id)
        self.query_pad_to_multiple = query_pad_to_multiple
        m = cfg.vision.spatial_merge_size
        self.n_image_tokens = (cfg.grid_h // m) * (cfg.grid_w // m)
        self.dynamic_resolution = dynamic_resolution
        ps = cfg.vision.patch_size
        self.factor = ps * m
        self.min_pixels = min_pixels if min_pixels is not None else 4 * self.factor ** 2
        self.max_pixels = (max_pixels if max_pixels is not None
                           else cfg.grid_h * cfg.grid_w * ps * ps)

    def smart_grid(self, img: Any) -> Tuple[int, int]:
        """Per-image (grid_h, grid_w) in patches, by Qwen2-VL smart_resize."""
        if Image is not None and isinstance(img, Image.Image):
            w_px, h_px = img.size
        else:
            h_px, w_px = np.asarray(img).shape[:2]
        h, w = smart_grid(h_px, w_px, self.factor,
                          self.min_pixels, self.max_pixels)
        ps = self.cfg.vision.patch_size
        return h // ps, w // ps

    def group_by_grid(self, images: Sequence[Any]) -> List[Tuple[Tuple[int, int], List[int]]]:
        """Group image indices by their smart grid (static bucket when
        dynamic resolution is off)."""
        groups: Dict[Tuple[int, int], List[int]] = {}
        for i, img in enumerate(images):
            g = (self.smart_grid(img) if self.dynamic_resolution
                 else (self.cfg.grid_h, self.cfg.grid_w))
            groups.setdefault(g, []).append(i)
        return sorted(groups.items())

    def _ids(self, text: str) -> List[int]:
        try:
            return list(self.tokenizer.encode(text, add_special_tokens=False))
        except TypeError:
            return list(self.tokenizer.encode(text))

    # -- images ---------------------------------------------------------------

    def preprocess_image(self, img: Any,
                         grid: Optional[Tuple[int, int]] = None) -> np.ndarray:
        c = self.cfg
        gh, gw = grid if grid is not None else (c.grid_h, c.grid_w)
        h_px = gh * c.vision.patch_size
        w_px = gw * c.vision.patch_size
        if Image is not None and isinstance(img, Image.Image):
            arr = np.asarray(
                img.convert("RGB").resize((w_px, h_px), Image.BICUBIC), np.float32)
        else:
            arr = np.asarray(img, np.float32)
            if arr.shape[:2] != (h_px, w_px):
                arr = np.asarray(Image.fromarray(arr.astype(np.uint8))
                                 .resize((w_px, h_px), Image.BICUBIC), np.float32)
        arr = (arr / 255.0 - CLIP_MEAN) / CLIP_STD
        return flatten_patches(arr, self.cfg, (gh, gw))

    def process_images(self, images: Sequence[Any],
                       grid: Optional[Tuple[int, int]] = None) -> dict:
        """All images of one call share one grid (the static bucket, or the
        group's grid from ``group_by_grid`` under dynamic resolution)."""
        c = self.cfg
        m = c.vision.spatial_merge_size
        gh, gw = grid if grid is not None else (c.grid_h, c.grid_w)
        n_img_tok = (gh // m) * (gw // m)
        pix = np.stack([self.preprocess_image(im, (gh, gw)) for im in images])
        prompt_ids = self._ids(IMAGE_PROMPT + "\n")
        seq = ([c.vision_start_token_id]
               + [c.image_token_id] * n_img_tok
               + [c.vision_end_token_id]
               + prompt_ids)
        b = len(images)
        input_ids = np.tile(np.asarray(seq, np.int32), (b, 1))
        attention_mask = np.ones_like(input_ids)
        return {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "pixel_values": pix,
            "position_ids": self.mrope_position_ids(input_ids, attention_mask,
                                                    grid=(gh, gw)),
            "grid": (gh, gw),
        }

    # -- queries ---------------------------------------------------------------

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
        return {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "position_ids": self.mrope_position_ids(input_ids, attention_mask),
        }

    # -- mrope ----------------------------------------------------------------

    def mrope_position_ids(self, input_ids: np.ndarray,
                           attention_mask: np.ndarray,
                           grid: Optional[Tuple[int, int]] = None) -> np.ndarray:
        """[3, B, S] positions per Qwen2VL get_rope_index for the retrieval
        layout (at most one image block as a prefix; right padding)."""
        c = self.cfg
        m = c.vision.spatial_merge_size
        g = grid if grid is not None else (c.grid_h, c.grid_w)
        gh, gw = g[0] // m, g[1] // m
        b, s = input_ids.shape
        pos = np.zeros((3, b, s), np.int64)
        for i in range(b):
            ids = input_ids[i]
            valid = attention_mask[i] == 1
            img_slots = np.nonzero((ids == c.image_token_id) & valid)[0]
            if img_slots.size == 0:
                seq = np.cumsum(valid) - 1
                pos[:, i, :] = np.where(valid, seq, 0)
                continue
            start = img_slots[0]
            # text before the image block: sequential
            pos[:, i, :start] = np.arange(start)
            # image block: t constant, h/w spatial over the merged grid
            hpos = np.repeat(np.arange(gh), gw)
            wpos = np.tile(np.arange(gw), gh)
            block = slice(start, start + gh * gw)
            pos[0, i, block] = start
            pos[1, i, block] = start + hpos
            pos[2, i, block] = start + wpos
            # text after: sequential from max+1
            nxt = start + max(gh, gw)
            tail = np.nonzero(valid)[0]
            tail = tail[tail >= start + gh * gw]
            for j, t_idx in enumerate(tail):
                pos[:, i, t_idx] = nxt + j
        return pos

    # -- scoring ----------------------------------------------------------------

    def score_multi_vector(self, qs, ds):
        from multimodal_colpali_tpu.models.processing import pad_multivectors
        import jax.numpy as jnp
        from multimodal_colpali_tpu.ops.maxsim import maxsim_scores

        q_pad, q_lens = pad_multivectors(qs)
        d_pad, d_lens = pad_multivectors(ds)
        return np.asarray(maxsim_scores(jnp.asarray(q_pad), jnp.asarray(d_pad),
                                        jnp.asarray(q_lens), jnp.asarray(d_lens)))
