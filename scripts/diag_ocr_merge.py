"""Diagnose the 'ru'/'rp' merged-cluster misreads (VERDICT r4 weak #2).

Reproduces the exact failing image path from
tests/test_ocr_conv.py::test_skewed_scan_roundtrips_to_text_chunks and
prints, for every over-wide box on the failing line, what the classifier
thinks of the whole box vs its valley-split pieces.
"""
import os
import sys

import numpy as np
from PIL import Image, ImageDraw, ImageFont

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("MMCP_JAX_PLATFORMS", "cpu")

from multimodal_colpali_tpu.ingest.ocr_conv import (  # noqa: E402
    CHARSET, BAD_IDX, ConvOcr, _glyph_crop, _valley_split, binarize,
    deskew, estimate_skew, line_samples, segment_glyphs, _to_gray, weak_ink,
    upscale_if_small)


def _font(name="DejaVuSerif.ttf", size=26):
    import matplotlib
    path = os.path.join(os.path.dirname(matplotlib.__file__),
                        "mpl-data", "fonts", "ttf", name)
    return ImageFont.truetype(path, size)


def main():
    lines = ["Glycans mediate selectin adhesion",
             "Binding constants reach 12 nM",
             "Sialylated structures dominate the corpus"]
    im = Image.new("RGB", (1000, 240), (255,) * 3)
    d = ImageDraw.Draw(im)
    for i, t in enumerate(lines):
        d.text((30, 25 + 60 * i), t, font=_font(), fill=(0,) * 3)
    rot = im.rotate(1.5, resample=Image.BILINEAR, fillcolor=(255,) * 3,
                    expand=True)
    # the AutoOcr path renders the embedded 200-DPI scan at 144 DPI:
    scale = 144.0 / 200.0
    page = rot.resize((int(rot.width * scale), int(rot.height * scale)),
                      Image.BILINEAR)
    ocr = ConvOcr()
    print("full recognize:")
    print(ocr.recognize(np.asarray(page)))
    print()

    gray = _to_gray(np.asarray(page))
    ang = estimate_skew(binarize(gray))
    g2 = deskew(gray, ang)
    g2, up = upscale_if_small(g2)
    ink = binarize(g2)
    weak = weak_ink(g2)
    seg, cands = segment_glyphs(ink, weak, return_candidates=True)
    for y0, y1, boxes in seg:
        boxes = ocr._arbitrate_boxes(ink, g2, boxes, cands)
        hs = sorted(b[3] - b[1] + 1 for b in boxes)
        ref_h = hs[len(hs) // 2]
        patches, feats, _bl, _ch = line_samples(ink, boxes, g2)
        logits = np.asarray(ocr._forward(patches, feats))
        p = np.exp(logits - logits.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        txt = "".join(CHARSET[int(np.argmax(l[:BAD_IDX]))] for l in logits)
        print(f"line y0={y0} ref_h={ref_h}: {txt!r}")
        for i, b in enumerate(boxes):
            w = b[2] - b[0] + 1
            h = b[3] - b[1] + 1
            if w <= 1.18 * min(ref_h, h):
                continue
            best = int(np.argmax(logits[i]))
            real = int(np.argmax(logits[i][:BAD_IDX]))
            lbl = "<bad>" if best == BAD_IDX else CHARSET[best]
            print(f"  wide box {b} w={w} h={h} w/ref_h={w/ref_h:.2f} "
                  f"best={lbl!r} p={p[i][best]:.3f} "
                  f"real={CHARSET[real]!r} p_real={p[i][real]:.3f} "
                  f"p_junk={p[i][BAD_IDX]:.3f}")
            ps = _valley_split(ink, b, ref_h)
            if len(ps) > 1:
                pp, ff, _, _ = line_samples(ink, ps, g2)
                ll = np.asarray(ocr._forward(pp, ff))
                q = np.exp(ll - ll.max(-1, keepdims=True))
                q /= q.sum(-1, keepdims=True)
                for j, pb in enumerate(ps):
                    bj = int(np.argmax(ll[j]))
                    rj = int(np.argmax(ll[j][:BAD_IDX]))
                    lb = "<bad>" if bj == BAD_IDX else CHARSET[bj]
                    print(f"    piece {pb} best={lb!r} p={q[j][bj]:.3f} "
                          f"real={CHARSET[rj]!r} p_real={q[j][rj]:.3f}")
            else:
                print("    NO valley split proposed")


if __name__ == "__main__":
    main()
