"""Image size normalization for ingestion.

``resize_image`` reproduces the reference's exact semantics
(functions.py:219-233): upscale so the *short* side is >= 224, then
downscale so the *long* side is <= 1300, LANCZOS resampling, preserving
aspect ratio. Page PNGs saved by ingestion all pass through it.
"""

from __future__ import annotations

from PIL import Image

MIN_SIDE = 224
MAX_SIDE = 1300


def resize_image(img: Image.Image, min_side: int = MIN_SIDE, max_side: int = MAX_SIDE) -> Image.Image:
    w, h = img.size
    short, long = min(w, h), max(w, h)
    scale = 1.0
    if short < min_side:
        scale = min_side / short
    if long * scale > max_side:
        scale = max_side / long
    if scale == 1.0:
        return img
    nw, nh = max(1, round(w * scale)), max(1, round(h * scale))
    return img.resize((nw, nh), Image.LANCZOS)
