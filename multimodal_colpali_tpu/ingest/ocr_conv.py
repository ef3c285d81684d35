"""Font-general OCR: segmentation + a small JAX conv glyph classifier.

``TemplateOcr`` (ingest/ocr.py) is exact for the native rasterizer's own
8x13 atlas but produces garbage for any other font - the reference's
EasyOCR (functions.py:78-80) is font-general. This module fills that gap
the TPU-framework way: a conv net *trained on synthetic multi-font
renders* (scripts/train_ocr.py renders every TTF matplotlib ships plus
the built-in atlas, with noise/threshold augmentation), run with plain
``jax.numpy`` - one jitted batched forward per page of glyphs.

Pipeline per page:

1. binarize + despeckle;
2. text lines from the row-ink projection;
3. glyphs from connected components (scipy.ndimage.label), merged when
   their x-spans overlap within a line (i/j dots, '=', ':', '"');
4. every glyph crop normalized to a 16x16 box (aspect preserved) plus
   three layout features the shape alone cannot carry - relative height,
   vertical offset in the line, aspect ratio - which disambiguate
   case pairs like c/C o/O s/S x/X;
5. one batched conv forward -> characters; spaces from the gap
   statistics (inter-word gaps are ~5x inter-letter gaps).

``AutoOcr`` composes the two engines: the template matcher's mean-IoU
score says whether the page is the native dialect (IoU ~0.9 on its own
font, <0.5 on anything else); below the threshold the conv recognizer
reads the page. This is the default ``ocr_fn`` surface.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

# Merged-cluster classes: tightly kerned fonts (Computer Modern - the
# scientific-paper look - especially) render f-sequences as ONE connected
# component, so the segmenter hands the classifier a single box spanning
# several characters. Dedicated classes decode those boxes back to their
# character sequences (EasyOCR's printed models read ligatures the same
# way). CHARSET entries may therefore be multi-char strings; recognition
# joins them, so no caller changes.
LIGATURES = ("ff", "fi", "fl", "ffi", "ffl")
CHARSET = [chr(c) for c in range(33, 127)] + list(LIGATURES)  # space is geometric
PATCH = 16
N_FEATS = 3

_WEIGHTS_PATH = os.path.join(os.path.dirname(__file__),
                             "ocr_conv_weights.npz")


# -- model (plain jax.numpy; params = dict of arrays) -------------------------

def conv_ocr_init(seed: int = 0) -> Dict[str, np.ndarray]:
    """He-init parameters for the glyph classifier."""
    rng = np.random.default_rng(seed)

    def he(*shape):
        fan_in = int(np.prod(shape[:-1]))
        return (rng.standard_normal(shape) * (2.0 / fan_in) ** 0.5
                ).astype(np.float32)

    return {
        "c1": he(3, 3, 1, 16), "b1": np.zeros(16, np.float32),
        "c2": he(3, 3, 16, 32), "b2": np.zeros(32, np.float32),
        "w1": he(4 * 4 * 32 + N_FEATS, 128),
        "bw1": np.zeros(128, np.float32),
        "w2": he(128, len(CHARSET)), "bw2": np.zeros(len(CHARSET),
                                                     np.float32),
    }


def conv_ocr_logits(params, patches, feats):
    """[N, 16, 16] crops + [N, 3] layout features -> [N, n_classes]."""
    import jax
    import jax.numpy as jnp

    x = patches[..., None]                                   # NHWC
    x = jax.lax.conv_general_dilated(
        x, params["c1"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["b1"]
    x = jax.nn.relu(x)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID")
    x = jax.lax.conv_general_dilated(
        x, params["c2"], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + params["b2"]
    x = jax.nn.relu(x)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                              (1, 2, 2, 1), "VALID")
    x = x.reshape(x.shape[0], -1)
    # the layout features are the ONLY signal separating case pairs; scale
    # them up so the 512-dim conv activations don't drown their gradient
    x = jnp.concatenate([x, feats * 8.0], axis=1)
    x = jax.nn.relu(x @ params["w1"] + params["bw1"])
    return x @ params["w2"] + params["bw2"]


# -- segmentation (shared by inference and training-data generation) ---------

def binarize(image, ink_threshold: int = 128) -> np.ndarray:
    arr = np.asarray(image)
    if arr.ndim == 3:
        arr = arr.mean(axis=-1)
    ink = arr < ink_threshold
    n4 = np.zeros_like(ink)
    n4[1:, :] |= ink[:-1, :]
    n4[:-1, :] |= ink[1:, :]
    n4[:, 1:] |= ink[:, :-1]
    n4[:, :-1] |= ink[:, 1:]
    return ink & n4


def _line_spans(ink: np.ndarray, min_row_ink: int = 3) -> List[Tuple[int, int]]:
    rows = ink.sum(axis=1) >= min_row_ink
    idx = np.flatnonzero(rows)
    if idx.size == 0:
        return []
    breaks = np.flatnonzero(np.diff(idx) > 1)
    starts = np.concatenate([[idx[0]], idx[breaks + 1]])
    ends = np.concatenate([idx[breaks], [idx[-1]]])
    spans = list(zip(starts.tolist(), ends.tolist()))
    # merge detached-dot spans (i/j dots float above the body span)
    merged: List[Tuple[int, int]] = []
    for s in spans:
        if merged:
            p0, p1 = merged[-1]
            gap = s[0] - p1 - 1
            h_prev, h_cur = p1 - p0 + 1, s[1] - s[0] + 1
            small, big = min(h_prev, h_cur), max(h_prev, h_cur)
            if small <= max(2, big // 3) and gap <= max(2, big // 3):
                merged[-1] = (p0, s[1])
                continue
        merged.append(s)
    return merged


def segment_glyphs(ink: np.ndarray):
    """-> [(line_y0, line_y1, [glyph boxes (x0, y0, x1, y1)])] per line.

    Components whose x-spans overlap within a line merge into one glyph
    (dots over i/j, the bars of '=', quotes).
    """
    from scipy import ndimage

    labels, n = ndimage.label(ink, structure=np.ones((3, 3), int))
    if n == 0:
        return []
    objs = ndimage.find_objects(labels)
    lines = _line_spans(ink)
    out = []
    for y0, y1 in lines:
        boxes = []
        for sl in objs:
            if sl is None:
                continue
            ys, xs = sl
            cy = (ys.start + ys.stop - 1) / 2.0
            if not (y0 - 1 <= cy <= y1 + 1):
                continue
            boxes.append([xs.start, ys.start, xs.stop - 1, ys.stop - 1])
        if not boxes:
            continue
        boxes.sort(key=lambda b: b[0])
        groups: List[List[int]] = []
        for b in boxes:
            if groups:
                g = groups[-1]
                ov = min(g[2], b[2]) - max(g[0], b[0]) + 1
                if ov > 0.4 * min(g[2] - g[0] + 1, b[2] - b[0] + 1):
                    g[0] = min(g[0], b[0])
                    g[1] = min(g[1], b[1])
                    g[2] = max(g[2], b[2])
                    g[3] = max(g[3], b[3])
                    continue
            groups.append(list(b))
        out.append((y0, y1, [tuple(g) for g in groups]))
    return out


def _glyph_crop(ink: np.ndarray, box) -> np.ndarray:
    from PIL import Image

    x0, y0, x1, y1 = box
    crop = ink[y0:y1 + 1, x0:x1 + 1].astype(np.float32)
    h, w = crop.shape
    scale = (PATCH - 2) / max(h, w)
    nh, nw = max(int(round(h * scale)), 1), max(int(round(w * scale)), 1)
    im = Image.fromarray((crop * 255).astype(np.uint8)).resize(
        (nw, nh), Image.BILINEAR)
    patch = np.zeros((PATCH, PATCH), np.float32)
    oy, ox = (PATCH - nh) // 2, (PATCH - nw) // 2
    patch[oy:oy + nh, ox:ox + nw] = np.asarray(im, np.float32) / 255.0
    return patch


def line_samples(ink: np.ndarray, boxes) -> Tuple[np.ndarray, np.ndarray]:
    """(patches [N, 16, 16], features [N, 3]) for one line's glyph boxes.

    Features are BASELINE- and CAP-HEIGHT-relative, estimated from the
    line's own box statistics (baseline = median glyph bottom, cap
    height = 90th-percentile glyph height) - stable under the content
    mix of a real text line, unlike line-span-relative offsets, and the
    only signal separating case pairs (s/S x/X o/O), ascender bars
    (l vs |) and descenders (p q g j y):

      [height / cap_h, descent-below-baseline / cap_h, aspect w/h]

    Returns (patches, features, baseline, cap_h) so callers that also
    position words (ConvOcr._page_words) consume the SAME line statistics
    the classifier features were built from.
    """
    ys1 = np.asarray([b[3] for b in boxes], np.float32)
    hs = np.asarray([b[3] - b[1] + 1 for b in boxes], np.float32)
    baseline = float(np.median(ys1))
    cap_h = float(max(np.quantile(hs, 0.9), 1.0))
    patches, feats = [], []
    for (x0, y0, x1, y1) in boxes:
        patches.append(_glyph_crop(ink, (x0, y0, x1, y1)))
        h = y1 - y0 + 1
        feats.append([h / cap_h, (y1 - baseline) / cap_h,
                      (x1 - x0 + 1) / max(h, 1)])
    return np.stack(patches), np.asarray(feats, np.float32), baseline, cap_h


class ConvOcr:
    """Font-general glyph recognizer. Callable as ``ocr_fn``."""

    def __init__(self, weights: Optional[Any] = None,
                 ink_threshold: int = 128, dpi: float = 144.0,
                 space_gap: float = 0.33):
        """``space_gap``: inter-glyph gap (fraction of line height) above
        which a word break is emitted (words sit ~0.25-0.35 em apart,
        letters ~0.02-0.08 em)."""
        if weights is None:
            if not os.path.exists(_WEIGHTS_PATH):
                raise FileNotFoundError(
                    f"no trained OCR weights at {_WEIGHTS_PATH}; run "
                    "scripts/train_ocr.py")
            weights = _WEIGHTS_PATH
        if isinstance(weights, (str, os.PathLike)):
            with np.load(weights) as z:
                weights = {k: z[k].astype(np.float32) for k in z.files}
        self.params = weights
        self.ink_threshold = ink_threshold
        self.dpi = dpi
        self.space_gap = space_gap
        self._jit = None

    def _forward(self, patches: np.ndarray, feats: np.ndarray):
        import jax

        if self._jit is None:
            self._jit = jax.jit(conv_ocr_logits)
        return np.asarray(self._jit(self.params, patches, feats))

    def _page_words(self, image):
        """-> ([per line: (baseline_y, cap_h, [(x0_px, word), ...])],
        mean classifier confidence). The shared engine behind text AND
        positioned-run extraction."""
        ink = binarize(image, self.ink_threshold)
        lines = segment_glyphs(ink)
        batches, feats, stats = [], [], []
        for y0, y1, boxes in lines:
            p, f, baseline, cap_h = line_samples(ink, boxes)
            batches.append(p)
            feats.append(f)
            stats.append((baseline, cap_h))
        if not batches:
            return [], 0.0
        logits = self._forward(np.concatenate(batches),
                               np.concatenate(feats))
        ex = np.exp(logits - logits.max(axis=1, keepdims=True))
        probs = ex / ex.sum(axis=1, keepdims=True)
        best = probs.argmax(axis=1)
        conf = probs[np.arange(len(best)), best]
        out = []
        k = 0
        for (y0, y1, boxes), (baseline, cap_h) in zip(lines, stats):
            words = []   # (x0, chars)
            prev_x1 = None
            for box in boxes:
                gap = (box[0] - prev_x1 - 1) if prev_x1 is not None else None
                if gap is None or gap > self.space_gap * cap_h:
                    words.append([box[0], []])
                words[-1][1].append(CHARSET[int(best[k])])
                prev_x1 = box[2]
                k += 1
            out.append((baseline, cap_h,
                        [(x0, "".join(cs)) for x0, cs in words]))
        return out, float(conf.mean()) if len(conf) else 0.0

    def recognize(self, image, return_score: bool = False):
        lines, score = self._page_words(image)
        texts = [" ".join(w for _, w in words)
                 for _, _, words in lines if words]
        text = "\n".join(t for t in texts if t.strip())
        return (text, score) if return_score else text

    def recognize_runs(self, image, dpi: Optional[float] = None):
        """Positioned word runs ``[(x, y, size, text)]`` in PDF points
        (top-left origin) - the exact shape ``PdfDocument.extract_runs``
        produces, so ``tables.detect_tables`` runs unchanged on SCANNED
        pages (the TableFormer-on-images role, reference
        functions.py:85-93)."""
        scale = 72.0 / (dpi or self.dpi)
        lines, _ = self._page_words(image)
        runs = []
        for baseline, cap_h, words in lines:
            for x0, word in words:
                runs.append((x0 * scale, baseline * scale, cap_h * scale,
                             word))
        return runs

    def __call__(self, pdf_path: str) -> List[str]:
        from multimodal_colpali_tpu.ingest.rasterize import PdfDocument

        doc = PdfDocument(pdf_path)
        return [self.recognize(np.asarray(doc.render(i, dpi=self.dpi)))
                for i in range(len(doc))]

    def pdf_text_and_runs(self, pdf_path: str):
        """One pass over the PDF -> (per-page texts, per-page runs)."""
        from multimodal_colpali_tpu.ingest.rasterize import PdfDocument

        doc = PdfDocument(pdf_path)
        texts, runs = [], []
        for i in range(len(doc)):
            arr = np.asarray(doc.render(i, dpi=self.dpi))
            lines, _ = self._page_words(arr)
            texts.append("\n".join(
                " ".join(w for _, w in words)
                for _, _, words in lines if words))
            scale = 72.0 / self.dpi
            runs.append([(x0 * scale, b * scale, c * scale, w)
                         for b, c, words in lines for x0, w in words])
        return texts, runs


class AutoOcr:
    """Default OCR: template matcher for the native dialect, conv net for
    everything else (the font-general path the reference's EasyOCR role
    requires).

    Decision per page: ``TemplateOcr`` reports its best mean IoU - ~0.9 on
    its own atlas font, well under ``threshold`` on any other - and the
    conv recognizer reads pages the template cannot claim. When the conv
    weights are absent (training never ran), the template result is used
    unconditionally, preserving round-2 behavior.
    """

    def __init__(self, threshold: float = 0.7, dpi: float = 144.0):
        from multimodal_colpali_tpu.ingest.ocr import TemplateOcr

        self.template = TemplateOcr(dpi=dpi)
        self.threshold = threshold
        self.dpi = dpi
        try:
            self.conv: Optional[ConvOcr] = ConvOcr(dpi=dpi)
        except FileNotFoundError:
            self.conv = None

    def recognize(self, image) -> str:
        text, score = self.template.recognize(np.asarray(image),
                                              return_score=True)
        if score >= self.threshold or self.conv is None:
            return text
        return self.conv.recognize(image)

    def __call__(self, pdf_path: str) -> List[str]:
        from multimodal_colpali_tpu.ingest.rasterize import PdfDocument

        doc = PdfDocument(pdf_path)
        return [self.recognize(np.asarray(doc.render(i, dpi=self.dpi)))
                for i in range(len(doc))]

    def pdf_text_and_runs(self, pdf_path: str):
        """(per-page texts, per-page positioned word runs). Text comes
        from the per-page engine choice (template when its IoU claims the
        page); runs always come from the conv recognizer's segmentation
        (the template decoder has no positioned-run surface) so scanned
        tables reach ``detect_tables`` regardless of font. Without
        trained conv weights the runs are empty - table detection then
        simply stays text-layer-only, the round-2 behavior."""
        from multimodal_colpali_tpu.ingest.rasterize import PdfDocument

        doc = PdfDocument(pdf_path)
        texts, runs = [], []
        for i in range(len(doc)):
            arr = np.asarray(doc.render(i, dpi=self.dpi))
            texts.append(self.recognize(arr))
            runs.append(self.conv.recognize_runs(arr, dpi=self.dpi)
                        if self.conv is not None else [])
        return texts, runs
