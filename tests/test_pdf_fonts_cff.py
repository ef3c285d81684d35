"""Embedded-CFF (FontFile3) decode + glyph-faithful rendering.

The pdfTeX mainstream embeds Type1 fonts compacted to CFF (Type1C), and
OTF-based workflows embed CID-keyed CFF (CIDFontType0C); poppler renders
both (reference functions.py:678-713). Fixtures here embed REAL CFF font
programs compiled by fontTools (an independent implementation of the
format) from DejaVu outlines, wrapped in a minimal hand-authored PDF,
plus a hand-rolled CID-keyed CFF that exercises ROS/FDArray/FDSelect and
charset-format-2 parsing with custom Type2 charstrings whose shapes the
8x13 atlas fallback cannot produce.
"""

import struct

import numpy as np

from multimodal_colpali_tpu.ingest.rasterize import PdfDocument

LINE1 = "Sialylated structures dominate the corpus"
LINE2 = "Binding affinity was 12 nM"


# ---------------------------------------------------------------------------
# fixture builders
# ---------------------------------------------------------------------------

def _build_type1c(text):
    """Compile a subset CFF (Type1C) from DejaVu Sans via fontTools."""
    import matplotlib.font_manager as fm
    from fontTools.fontBuilder import FontBuilder
    from fontTools.pens.t2CharStringPen import T2CharStringPen
    from fontTools.ttLib import TTFont

    src = TTFont(fm.findfont("DejaVu Sans"))
    gs = src.getGlyphSet()
    upm = src["head"].unitsPerEm
    cmap = src.getBestCmap()
    names = {ch: cmap[ord(ch)] for ch in sorted(set(text)) if ord(ch) in cmap}
    order = [".notdef"] + sorted(set(names.values()))
    charstrings, widths = {}, {}
    for nm in order:
        g = gs[nm] if nm in gs.keys() else None
        w = g.width if g is not None else upm // 2
        pen = T2CharStringPen(w, gs)
        if g is not None:
            g.draw(pen)
        charstrings[nm] = pen.getCharString()
        widths[nm] = w
    fb = FontBuilder(upm, isTTF=False)
    fb.setupGlyphOrder(order)
    fb.setupCFF("TestCFF", {}, charstrings, {})
    return fb.font["CFF "].compile(fb.font), names, widths, upm


def _assemble_pdf(path, objs):
    out = bytearray(b"%PDF-1.4\n")
    offsets = {}
    for n in sorted(objs):
        offsets[n] = len(out)
        out += b"%d 0 obj\n" % n + objs[n] + b"\nendobj\n"
    xref = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for n in sorted(objs):
        out += b"%010d 00000 n \n" % offsets[n]
    out += (b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, xref))
    open(path, "wb").write(bytes(out))


def _simple_cff_pdf(path, cff_bytes, names, widths, upm, lines):
    """Minimal PDF: simple /Type1 font + /FontFile3 /Type1C, ASCII codes
    named via /Differences (the pdfTeX subset structure)."""
    used = sorted({ch for ln in lines for ch in ln})
    first, last = ord(used[0]), ord(used[-1])
    warr = []
    for c in range(first, last + 1):
        ch = chr(c)
        w = widths.get(names.get(ch, ""), upm // 2) if ch in names else upm // 2
        warr.append(int(round(w * 1000.0 / upm)))
    diffs = " ".join("%d /%s" % (ord(ch), names[ch])
                     for ch in used if ch in names)
    content = ["BT /F1 13 Tf"]
    y = 700
    for ln in lines:
        esc = ln.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        content.append("1 0 0 1 72 %d Tm (%s) Tj" % (y, esc))
        y -= 40
    cbytes = "\n".join(content + ["ET"]).encode()
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cbytes), cbytes),
        5: ("<< /Type /Font /Subtype /Type1 /BaseFont /TestCFF "
            "/FirstChar %d /LastChar %d /Widths [%s] "
            "/Encoding << /Type /Encoding /Differences [%s] >> "
            "/FontDescriptor 6 0 R >>"
            % (first, last, " ".join(map(str, warr)), diffs)).encode(),
        6: (b"<< /Type /FontDescriptor /FontName /TestCFF /Flags 4 "
            b"/FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 800 "
            b"/Descent -200 /CapHeight 700 /StemV 80 /FontFile3 7 0 R >>"),
        7: (b"<< /Subtype /Type1C /Length %d >>\nstream\n" % len(cff_bytes)
            + cff_bytes + b"\nendstream"),
    }
    _assemble_pdf(path, objs)


def _t2num(v):
    v = int(v)
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([(v >> 8) + 247, v & 255])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([(v >> 8) + 251, v & 255])
    return bytes([28, (v >> 8) & 255, v & 255])


def _rect_charstring():
    # contour (50,0)-(550,0)-(550,700)-(50,700): a solid 500x700 slab -
    # no text glyph (and no 8x13 atlas cell) is a filled rectangle
    return (_t2num(50) + _t2num(0) + b"\x15"      # rmoveto
            + _t2num(500) + b"\x06"               # hlineto
            + _t2num(700) + b"\x07"               # vlineto
            + _t2num(-500) + b"\x06"              # hlineto
            + b"\x0e")                            # endchar


def _disc_charstring():
    # circle r=300 centered (300,350): four rrcurveto arcs (k ~ 0.5523r)
    arcs = [(0, 166, -134, 134, -166, 0), (-166, 0, -134, -134, 0, -166),
            (0, -166, 134, -134, 166, 0), (166, 0, 134, 134, 0, 166)]
    cs = _t2num(600) + _t2num(350) + b"\x15"
    for a in arcs:
        cs += b"".join(_t2num(v) for v in a) + b"\x08"  # rrcurveto
    return cs + b"\x0e"


def _index(items, off_size=2):
    """Serialize a CFF INDEX."""
    if not items:
        return b"\x00\x00"
    out = struct.pack(">HB", len(items), off_size)
    off = 1
    offs = [off]
    for it in items:
        off += len(it)
        offs.append(off)
    fmt = {1: ">B", 2: ">H", 4: ">I"}[off_size]
    for o in offs:
        out += struct.pack(fmt, o)
    return out + b"".join(items)


def _int5(v):
    return b"\x1d" + struct.pack(">i", v)


def _build_cid_cff():
    """Hand-rolled CID-keyed CFF: ROS + FDArray/FDSelect(fmt 3) +
    charset format 2 mapping gid1->CID 101, gid2->CID 102; glyphs are
    the rect and disc custom charstrings."""
    header = bytes([1, 0, 4, 2])
    name_ix = _index([b"TestCID"])
    string_ix = _index([b"Adobe", b"Identity"])  # SIDs 391, 392
    gsubr_ix = b"\x00\x00"
    charset = b"\x02" + struct.pack(">HH", 101, 1)  # fmt2: gids 1,2
    fdselect = b"\x03" + struct.pack(">H", 1) + struct.pack(">HB", 0, 0) \
        + struct.pack(">H", 3)  # fmt3: 1 range, gids [0,3) -> fd 0
    charstrings_ix = _index([b"\x0e", _rect_charstring(), _disc_charstring()])
    fontdict = _int5(0) + _int5(0) + b"\x12"  # Private [0 0]
    fdarray_ix = _index([fontdict])

    def top_dict(cs_off, charset_off, fda_off, fds_off):
        return (_int5(391) + _int5(392) + _int5(0) + b"\x0c\x1e"  # ROS
                + _int5(cs_off) + b"\x11"                         # CharStrings
                + _int5(charset_off) + b"\x0f"                    # charset
                + _int5(fda_off) + b"\x0c\x24"                    # FDArray
                + _int5(fds_off) + b"\x0c\x25")                   # FDSelect

    # fixed-size operands (5-byte ints) make the layout stable: lay out
    # once with zeros, then rebuild with real offsets
    top_ix_size = len(_index([top_dict(0, 0, 0, 0)]))
    pre = len(header) + len(name_ix) + top_ix_size + len(string_ix) \
        + len(gsubr_ix)
    charset_off = pre
    fds_off = charset_off + len(charset)
    cs_off = fds_off + len(fdselect)
    fda_off = cs_off + len(charstrings_ix)
    top_ix = _index([top_dict(cs_off, charset_off, fda_off, fds_off)])
    assert len(top_ix) == top_ix_size
    return (header + name_ix + top_ix + string_ix + gsubr_ix
            + charset + fdselect + charstrings_ix + fdarray_ix)


def _cid_cff_pdf(path, cff_bytes):
    """Type0 / Identity-H / CIDFontType0 + FontFile3 CIDFontType0C; the
    content shows CIDs 101 (rect) and 102 (disc) as 2-byte codes."""
    cbytes = (b"BT /F1 48 Tf 1 0 0 1 100 400 Tm "
              b"<00650066> Tj ET")  # CIDs 101, 102
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
        4: b"<< /Length %d >>\nstream\n%s\nendstream" % (len(cbytes), cbytes),
        5: (b"<< /Type /Font /Subtype /Type0 /BaseFont /TestCID "
            b"/Encoding /Identity-H /DescendantFonts [6 0 R] >>"),
        6: (b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /TestCID "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /DW 1000 /W [101 102 600] "
            b"/FontDescriptor 7 0 R >>"),
        7: (b"<< /Type /FontDescriptor /FontName /TestCID /Flags 4 "
            b"/FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 800 "
            b"/Descent -200 /CapHeight 700 /StemV 80 /FontFile3 8 0 R >>"),
        8: (b"<< /Subtype /CIDFontType0C /Length %d >>\nstream\n"
            % len(cff_bytes) + cff_bytes + b"\nendstream"),
    }
    _assemble_pdf(path, objs)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

def test_type1c_text_decode(tmp_path):
    """Simple Type1C subset: /Differences glyph names decode to exact
    text in reading order (no ToUnicode in the fixture)."""
    cff, names, widths, upm = _build_type1c(LINE1 + LINE2)
    p = str(tmp_path / "t1c.pdf")
    _simple_cff_pdf(p, cff, names, widths, upm, (LINE1, LINE2))
    text = PdfDocument(p).extract_text(0)
    assert LINE1 in text
    assert LINE2 in text
    assert text.find(LINE1) < text.find(LINE2)


def test_type1c_render_is_glyph_faithful(tmp_path):
    """Per-glyph ink widths from the real outlines: ten 'i' glyphs span
    far fewer ink columns than ten 'm' glyphs at equal advance counts."""
    lines = ("iiiiiiiiii", "mmmmmmmmmm")
    cff, names, widths, upm = _build_type1c("im")
    p = str(tmp_path / "t1c_im.pdf")
    _simple_cff_pdf(p, cff, names, widths, upm, lines)
    a = np.asarray(PdfDocument(p).render(0, dpi=144)).mean(axis=-1)
    ink = a < 128
    rows = np.flatnonzero(ink.sum(axis=1) > 0)
    assert rows.size
    gaps = np.flatnonzero(np.diff(rows) > 5)
    assert gaps.size >= 1
    r1, r2 = rows[: gaps[0] + 1], rows[gaps[0] + 1:]
    w1 = np.flatnonzero(ink[r1].sum(axis=0) > 0)
    w2 = np.flatnonzero(ink[r2].sum(axis=0) > 0)
    assert (w2[-1] - w2[0]) > 2.2 * (w1[-1] - w1[0])


def test_cid_keyed_cff_renders_custom_charstrings(tmp_path):
    """CID-keyed CFF (ROS/FDArray/FDSelect/charset fmt 2): CID->GID via
    the charset, Type2 rect + disc charstrings rasterize with the right
    geometry - shapes no atlas cell can produce."""
    p = str(tmp_path / "cid.pdf")
    _cid_cff_pdf(p, _build_cid_cff())
    a = np.asarray(PdfDocument(p).render(0, dpi=144)).mean(axis=-1)
    ink = a < 128
    ys, xs = np.nonzero(ink)
    assert ys.size > 1000  # both glyphs rendered
    # two glyphs side by side: split at the advance boundary
    xmid = (xs.min() + xs.max()) / 2
    left = ink[:, : int(xmid)]
    right = ink[:, int(xmid):]
    # rect: ink fraction within its own bbox ~ 1.0
    lys, lxs = np.nonzero(left)
    lbox = (lys.max() - lys.min() + 1) * (lxs.max() - lxs.min() + 1)
    assert left.sum() / lbox > 0.85  # antialiased edges shave the border
    # disc: ink fraction within bbox ~ pi/4, and nearly square bbox
    rys, rxs = np.nonzero(right)
    rh = rys.max() - rys.min() + 1
    rw = rxs.max() - rxs.min() + 1
    assert abs(rh - rw) < 0.15 * max(rh, rw)
    frac = right.sum() / (rh * rw)
    assert 0.6 < frac < 0.9  # pi/4 ~ 0.785; a filled square would be ~1


def test_type1c_pdf_loader_end_to_end(tmp_path):
    """pdf_loader extracts exact text from the Type1C fixture (the
    pdfTeX-mainstream embed structure end-to-end)."""
    from multimodal_colpali_tpu.ingest import check_ocr, pdf_loader
    from multimodal_colpali_tpu.models.processing import SimpleTokenizer
    cff, names, widths, upm = _build_type1c(LINE1 + LINE2)
    p = str(tmp_path / "doc1c.pdf")
    _simple_cff_pdf(p, cff, names, widths, upm, (LINE1, LINE2))
    assert not check_ocr(p)  # decodable text layer: no OCR needed
    docs_multi, docs_text = pdf_loader(
        [p], [""], ["doc1c.pdf"], str(tmp_path / "vd"),
        SimpleTokenizer(1000, 999))
    joined = " ".join(d.page_content for d in docs_text
                      if d.metadata["type"] == "text")
    assert LINE1 in joined
    assert LINE2 in joined
