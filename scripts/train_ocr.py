#!/usr/bin/env python
"""Train the font-general OCR glyph classifier (ingest/ocr_conv.py).

Synthetic supervision: render random text lines with every usable TTF the
environment ships (matplotlib's DejaVu / STIX / Computer Modern families +
the system DejaVu set) at several sizes, push each render through the SAME
segmentation the recognizer uses, and label the resulting glyph crops
POSITIONALLY against the font's own advance metrics (merged non-ligature
clusters and glyph fragments get the junk class - the arbitration signal
ConvOcr._arbitrate_boxes votes with). Augmentation: salt noise, stroke
thickness jitter, box blur, 1-px shifts.

Usage:
  python scripts/train_ocr.py [--steps 3000] [--holdout cmr10 STIX]

Writes multimodal_colpali_tpu/ingest/ocr_conv_weights.npz and prints the
held-out-font accuracy (fonts never seen in training).
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_colpali_tpu.ingest.ocr_conv import (   # noqa: E402
    BAD_IDX, CHARSET, LIGATURES, MERGE_PAIRS, _WEIGHTS_PATH, binarize,
    conv_ocr_init,
    conv_ocr_logits, line_samples, segment_glyphs, upscale_if_small,
    weak_ink)


def find_fonts():
    import matplotlib

    ttf_dir = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                           "fonts", "ttf")
    names = [n for n in sorted(os.listdir(ttf_dir)) if n.endswith(".ttf")
             and not n.startswith(("STIXSiz", "STIXNonUni", "cmex", "cmmi",
                                   "cmsy"))]   # symbol-only fonts
    return [os.path.join(ttf_dir, n) for n in names]


def render_line(font, text: str, pad: int = 6) -> np.ndarray:
    from PIL import Image, ImageDraw

    x0, y0, x1, y1 = font.getbbox(text)
    w, h = x1 - x0 + 2 * pad, y1 - y0 + 2 * pad
    im = Image.new("L", (max(w, 8), max(h, 8)), 255)
    ImageDraw.Draw(im).text((pad - x0, pad - y0), text, font=font, fill=0)
    return np.asarray(im)


def _rand_word(rng) -> str:
    letters = "abcdefghijklmnopqrstuvwxyz"
    n = int(rng.integers(2, 9))
    w = "".join(rng.choice(list(letters), size=n))
    r = rng.random()
    if r < 0.15:
        return str(rng.integers(0, 10_000))
    if r < 0.35:
        return w.capitalize()
    if r < 0.42:
        return w.upper()
    return w


def _pos_aligned_labels(boxes, text, font, scale=1, pad=6):
    """POSITIONAL label alignment: each character's advance span - from
    the font's own metrics under the same basic layout the render used -
    is matched to the segment box with maximal x-overlap; boxes that
    collect exactly one character (or a ligature sequence) become labeled
    samples. Returns (kept box indices, labels).

    Replaces the earlier count-based word alignment: whenever one glyph
    SPLIT and another MERGED in the same word the counts coincided and
    every label between the incidents shifted one position - silently
    corrupted samples that poisoned both training and the held-out
    accuracy (a 'v' labeled onto an ascender fragment etc.; the dominant
    residual "confusions" were these, not classifier errors). Font
    metrics pin each label to the pixels it actually names.

    Fragments and merged non-ligature clusters are labeled ``None`` (the
    junk class, ocr_conv.BAD_IDX): the arbitration in
    ``ConvOcr._arbitrate_boxes`` needs the classifier to RECOGNIZE a
    broken-'n' stem or a touching 'ru' pair as not-a-glyph - untrained,
    those crops read as confident 'l'/'m' and the wrong segmentation
    wins its confidence contest.
    """
    x_off = pad - font.getbbox(text)[0]
    spans, chars = [], []
    for k, ch in enumerate(text):
        if ch == " ":
            continue
        spans.append(((x_off + font.getlength(text[:k])) * scale,
                      (x_off + font.getlength(text[:k + 1])) * scale))
        chars.append(ch)
    assign: dict = {}
    frag_boxes: set = set()
    for ci, (sx0, sx1) in enumerate(spans):
        best, bov, claimed = None, 0.0, []
        for bi, b in enumerate(boxes):
            ov = min(sx1, b[2] + 1.0) - max(sx0, b[0])
            if ov > 0.35 * max(sx1 - sx0, 1.0):
                claimed.append(bi)
            if ov > bov:
                best, bov = bi, ov
        if len(claimed) >= 2:
            # the char's ink split across boxes: every piece is a fragment
            frag_boxes.update(claimed)
        # a char whose ink vanished (or sits mostly outside every box)
        # is skipped alone; if it merged into a neighbor the shared box
        # collects 2 chars and is handled below
        if best is not None and bov > 0.3 * max(sx1 - sx0, 1.0):
            assign.setdefault(best, []).append(ci)
    keep, labels = [], []
    for bi in sorted(assign):
        seq = "".join(chars[c] for c in assign[bi])
        if len(seq) == 1 and bi not in frag_boxes:
            keep.append(bi)
            labels.append(seq)
        elif (seq in LIGATURES or seq in MERGE_PAIRS) \
                and bi not in frag_boxes:
            keep.append(bi)
            labels.append(seq)
        else:
            keep.append(bi)
            labels.append(None)   # fragment or merged cluster -> junk
    return keep, labels


def harvest(font_path: str, rng, sizes=(12, 14, 18, 24, 34, 46),
            n_lines: int = 30):
    """Labeled (patch, feats, class) samples from one font.

    Two line styles per size: glyphs spaced wide apart (covers the whole
    charset uniformly) and realistic word lines (so the baseline/cap
    statistics behind the layout features match inference). Labels align
    positionally against the font's own advance metrics (see
    ``_pos_aligned_labels``); merged non-ligature clusters and glyph
    fragments train the junk class the inference-time arbitration votes
    with.
    """
    from PIL import ImageFont

    xs, fs, ys = [], [], []
    chars = "".join(c for c in CHARSET if len(c) == 1)
    for size in sizes:
        try:
            try:  # basic layout: no ligatures, matching simple scanners
                font = ImageFont.truetype(
                    font_path, size, layout_engine=ImageFont.Layout.BASIC)
            except (AttributeError, OSError):
                font = ImageFont.truetype(font_path, size)
        except OSError:
            return xs, fs, ys
        for li in range(3 * n_lines):
            down = 1.0
            if li % 3 == 0:
                toks = [str(c) for c in rng.choice(list(chars), size=12)]
                if li % 6 == 0:
                    # merged-cluster tokens: when the font renders the
                    # f-sequence as ONE component the box gets the
                    # ligature label; when it splits, the word is
                    # dropped - exactly the distribution the recognizer
                    # sees at inference. Only every other spaced line
                    # carries them so non-merging fonts keep coverage.
                    for lig in rng.choice(list(LIGATURES), size=2):
                        toks.insert(int(rng.integers(0, len(toks) + 1)),
                                    str(lig))
                text = " ".join(toks)
            elif li % 3 == 1:
                toks = [_rand_word(rng)
                        for _ in range(int(rng.integers(3, 7)))]
                text = " ".join(toks)
                # scans embedded above render DPI reach the recognizer
                # downsampled (200-DPI scan on a 144-DPI page render);
                # a fraction of word lines trains that regime
                if rng.random() < 0.4:
                    down = float(rng.uniform(0.6, 0.85))
            else:
                # merge-pair-rich lines, rendered downsampled so the
                # pairs actually FUSE: the fused patterns land in their
                # MERGE_PAIRS class via _pos_aligned_labels (pairs that
                # stay separate just yield ordinary single-char samples)
                toks = ["".join(rng.choice(list(MERGE_PAIRS), size=2))
                        for _ in range(6)]
                text = " ".join(toks)
                down = float(rng.uniform(0.6, 0.8))
            arr = render_line(font, text)
            if down < 1.0:
                from PIL import Image
                im = Image.fromarray(arr)
                nw = max(int(im.width * down), 8)
                nh = max(int(im.height * down), 8)
                arr = np.asarray(im.resize((nw, nh), Image.BILINEAR))
            # the recognizer's own scale normalization (small print is
            # pixel-doubled before segmentation) - applied here so the
            # training crop distribution matches inference exactly
            arr, scl = upscale_if_small(arr)
            ink = binarize(arr)
            lines = segment_glyphs(ink, weak_ink(arr))
            if len(lines) != 1:
                continue
            _, _, boxes = lines[0]
            if not boxes:
                continue
            patches, feats, _, cap_h = line_samples(ink, boxes, arr)
            keep, labels = _pos_aligned_labels(boxes, text, font,
                                               down * scl)
            for i, ch in zip(keep, labels):
                xs.append(patches[i])
                fs.append(feats[i])
                ys.append(BAD_IDX if ch is None else CHARSET.index(ch))
    return xs, fs, ys


def _n4(x, op):
    """4-neighbor morphological op over a batch of [N, H, W] patches."""
    y = x.copy()
    y[:, 1:, :] = op(y[:, 1:, :], x[:, :-1, :])
    y[:, :-1, :] = op(y[:, :-1, :], x[:, 1:, :])
    y[:, :, 1:] = op(y[:, :, 1:], x[:, :, :-1])
    y[:, :, :-1] = op(y[:, :, :-1], x[:, :, 1:])
    return y


def _blur3(x):
    """3x3 box blur over a batch of [N, H, W] patches (separable sums)."""
    y = x.copy()
    y[:, 1:, :] += x[:, :-1, :]
    y[:, :-1, :] += x[:, 1:, :]
    z = y.copy()
    z[:, :, 1:] += y[:, :, :-1]
    z[:, :, :-1] += y[:, :, 1:]
    return z / 9.0


def augment(x, rng):
    """Salt noise + edge erosion jitter on a batch of patches, plus
    stroke-thickness jitter (1-px dilate/erode on a random slice of the
    batch) - fonts differ in weight more than in skeleton, so thickness
    invariance is the cheapest unseen-font generalization lever - and
    box blur on another slice (scan softness / low-DPI anti-aliasing,
    the EasyOCR DPI-robustness role)."""
    x = x.copy()
    r = rng.random(len(x))
    thick, thin = r < 0.18, r > 0.85
    if thick.any():
        x[thick] = _n4(x[thick], np.maximum)
    if thin.any():
        x[thin] = _n4(x[thin], np.minimum)
    soft = rng.random(len(x)) < 0.25
    if soft.any():
        x[soft] = _blur3(x[soft])
    noise = rng.random(x.shape) < 0.02
    x = np.clip(x + noise * rng.random(x.shape), 0, 1)
    drop = rng.random(x.shape) < 0.03
    x = x * (1 - drop * 0.8)
    # random 1-px shift
    sh = rng.integers(-1, 2, size=2)
    x = np.roll(x, sh, axis=(1, 2))
    return x.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=9000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--holdout", nargs="*", default=["cmr10", "STIXGeneral."])
    ap.add_argument("--out", default=_WEIGHTS_PATH)
    args = ap.parse_args()

    os.environ.setdefault("MMCP_JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    rng = np.random.default_rng(0)
    fonts = find_fonts()
    train_fonts = [f for f in fonts
                   if not any(h in os.path.basename(f) for h in args.holdout)]
    hold_fonts = [f for f in fonts
                  if any(h in os.path.basename(f) for h in args.holdout)]
    print(f"[train_ocr] {len(train_fonts)} training fonts, "
          f"{len(hold_fonts)} held out: "
          f"{[os.path.basename(f) for f in hold_fonts]}")

    X, F, Y = [], [], []
    for f in train_fonts:
        xs, fs, ys = harvest(f, rng)
        X += xs; F += fs; Y += ys
        print(f"[train_ocr] {os.path.basename(f)}: {len(xs)} glyphs")
    X = np.stack(X); F = np.stack(F); Y = np.asarray(Y, np.int32)
    print(f"[train_ocr] total {len(X)} samples")

    params = {k: jnp.asarray(v) for k, v in conv_ocr_init().items()}
    opt = optax.adam(optax.cosine_decay_schedule(1.5e-3, args.steps, 0.02))
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, x, f, y):
        def loss_fn(p):
            logits = conv_ocr_logits(p, x, f)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.steps):
        idx = rng.integers(0, len(X), args.batch)
        x = augment(X[idx], rng)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(x), jnp.asarray(F[idx]),
                                       jnp.asarray(Y[idx]))
        if i % 500 == 0 or i == args.steps - 1:
            print(f"[train_ocr] step {i}: loss {float(loss):.4f}")

    np_params = {k: np.asarray(v, np.float32) for k, v in params.items()}
    np.savez_compressed(args.out, **np_params)
    print(f"[train_ocr] wrote {args.out} "
          f"({os.path.getsize(args.out) / 1024:.0f} KiB)")

    # held-out-font accuracy (never trained on)
    @jax.jit
    def infer(x, f):
        return jnp.argmax(conv_ocr_logits(params, x, f), axis=1)

    for f in hold_fonts:
        xs, fs, ys = harvest(f, np.random.default_rng(1), sizes=(18, 28))
        if not xs:
            continue
        pred = np.asarray(infer(jnp.asarray(np.stack(xs)),
                                jnp.asarray(np.stack(fs))))
        acc = float((pred == np.asarray(ys)).mean())
        print(f"[train_ocr] holdout {os.path.basename(f)}: "
              f"acc {acc:.3f} over {len(xs)} glyphs")


if __name__ == "__main__":
    main()
