"""Raw Type1 (/FontFile) decode + glyph rendering.

Pre-CFF Type1 programs (dvips-era LaTeX, pre-2000 producers; the poppler
role, reference functions.py:678-713): eexec-encrypted private section,
charstring encryption with lenIV, /Subrs + /CharStrings, hsbw sidebearing,
seac accent composition. No system Type1 font exists in this image and
fontTools cannot author one, so the fixture generator below follows the
Adobe Type 1 Font Format spec independently (eexec r=55665, charstrings
r=4330); the C++ parser under test was written against the same spec, not
against this generator.
"""

import numpy as np

from multimodal_colpali_tpu.ingest.rasterize import PdfDocument


# ---------------------------------------------------------------------------
# Type1 font program generator (Adobe Type 1 Font Format spec)
# ---------------------------------------------------------------------------

def _t1crypt(data, r):
    c1, c2 = 52845, 22719
    out = bytearray()
    for b in data:
        c = b ^ (r >> 8)
        out.append(c)
        r = ((c + r) * c1 + c2) & 0xFFFF
    return bytes(out)


def _t1num(v):
    v = int(v)
    if -107 <= v <= 107:
        return bytes([v + 139])
    if 108 <= v <= 1131:
        v -= 108
        return bytes([(v >> 8) + 247, v & 255])
    if -1131 <= v <= -108:
        v = -v - 108
        return bytes([(v >> 8) + 251, v & 255])
    import struct
    return b"\xff" + struct.pack(">i", v)  # Type1: plain 32-bit int


_HSBW, _RMOVETO, _RLINETO, _HLINETO, _VLINETO = 13, 21, 5, 6, 7
_RRCURVETO, _CLOSEPATH, _ENDCHAR = 8, 9, 14


def _op(*a):
    return bytes(a)


def _rect_cs(x0=50, y0=0, w=500, h=700, adv=600):
    return (_t1num(x0) + _t1num(adv) + _op(_HSBW)
            + _t1num(0) + _t1num(y0) + _op(_RMOVETO)
            + _t1num(w) + _op(_HLINETO)
            + _t1num(h) + _op(_VLINETO)
            + _t1num(-w) + _op(_HLINETO)
            + _op(_CLOSEPATH) + _op(_ENDCHAR))


def _disc_cs():
    cs = _t1num(0) + _t1num(600) + _op(_HSBW)  # x=0
    cs += _t1num(600) + _t1num(350) + _op(_RMOVETO)  # to (600,350)
    for a in [(0, 166, -134, 134, -166, 0), (-166, 0, -134, -134, 0, -166),
              (0, -166, 134, -134, 166, 0), (166, 0, 134, 134, 0, 166)]:
        cs += b"".join(_t1num(v) for v in a) + _op(_RRCURVETO)
    return cs + _op(_CLOSEPATH) + _op(_ENDCHAR)


def _seac_cs(bchar, achar, adx=0, ady=550):
    # asb adx ady bchar achar seac (12 6)
    return (_t1num(0) + _t1num(600) + _op(_HSBW)
            + _t1num(0) + _t1num(adx) + _t1num(ady)
            + _t1num(bchar) + _t1num(achar) + bytes([12, 6]))


def _build_type1(charstrings, encoding):
    """Assemble a full Type1 font program (clear + eexec + zeros)."""
    enc_lines = "".join("dup %d /%s put\n" % (c, n)
                        for c, n in sorted(encoding.items()))
    clear = ("%!FontType1-1.0: TestT1\n"
             "/FontName /TestT1 def\n"
             "/PaintType 0 def\n"
             "/FontType 1 def\n"
             "/FontMatrix [0.001 0 0 0.001 0 0] readonly def\n"
             "/FontBBox {0 -200 1000 900} readonly def\n"
             "/Encoding 256 array\n"
             "0 1 255 {1 index exch /.notdef put} for\n"
             + enc_lines +
             "readonly def\n"
             "currentdict end\n"
             "currentfile eexec\n").encode()
    subr0 = _t1crypt(b"\x00" * 4 + _op(11), 4330)  # return
    body = bytearray()
    body += b"dup /Private 8 dict dup begin\n"
    body += b"/lenIV 4 def\n"
    body += b"/Subrs 1 array\n"
    body += b"dup 0 %d RD " % len(subr0) + subr0 + b" NP\n"
    body += b"def\n"
    body += b"/CharStrings %d dict dup begin\n" % len(charstrings)
    for name, cs in charstrings.items():
        enc = _t1crypt(b"\x00" * 4 + cs, 4330)
        body += b"/%s %d RD " % (name.encode(), len(enc)) + enc + b" ND\n"
    body += b"end\nend\nmark currentfile closefile\n"
    encrypted = _t1crypt(b"z@\x92k" + bytes(body), 55665)
    trailer = b"\n" + (b"0" * 64 + b"\n") * 8 + b"cleartomark\n"
    return clear, encrypted, trailer


def _type1_pdf(path, lines_codes, charstrings, encoding, widths):
    """Minimal PDF embedding the Type1 program as /FontFile."""
    clear, enc, trailer = _build_type1(charstrings, encoding)
    ff = clear + enc + trailer
    content = b"BT /F1 48 Tf "
    y = 600
    for codes in lines_codes:
        s = bytes(codes)
        esc = s.replace(b"\\", rb"\\").replace(b"(", rb"\(") \
               .replace(b")", rb"\)")
        content += b"1 0 0 1 72 %d Tm (%s) Tj " % (y, esc)
        y -= 120
    content += b"ET"
    codes_used = sorted({c for ln in lines_codes for c in ln})
    first, last = codes_used[0], codes_used[-1]
    warr = " ".join(str(widths.get(c, 600)) for c in range(first, last + 1))
    diffs = " ".join("%d /%s" % (c, encoding[c])
                     for c in codes_used if c in encoding)
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
        4: b"<< /Length %d >>\nstream\n%s\nendstream"
           % (len(content), content),
        5: ("<< /Type /Font /Subtype /Type1 /BaseFont /TestT1 "
            "/FirstChar %d /LastChar %d /Widths [%s] "
            "/Encoding << /Type /Encoding /Differences [%s] >> "
            "/FontDescriptor 6 0 R >>"
            % (first, last, warr, diffs)).encode(),
        6: (b"<< /Type /FontDescriptor /FontName /TestT1 /Flags 4 "
            b"/FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 800 "
            b"/Descent -200 /CapHeight 700 /StemV 80 /FontFile 7 0 R >>"),
        7: (b"<< /Length %d /Length1 %d /Length2 %d /Length3 %d >>"
            b"\nstream\n" % (len(ff), len(clear), len(enc), len(trailer))
            + ff + b"\nendstream"),
    }
    from tests.test_pdf_fonts_cff import _assemble_pdf
    _assemble_pdf(path, objs)


GLYPHS = {
    "A": _rect_cs(),
    "B": _disc_cs(),
    "e": _rect_cs(x0=100, y0=0, w=400, h=400, adv=600),
    "acute": _rect_cs(x0=200, y0=0, w=200, h=150, adv=600),
    "eacute": _seac_cs(ord("e"), 194),  # 194 = acute in StandardEncoding
}
ENCODING = {65: "A", 66: "B", 67: "eacute", 101: "e"}
WIDTHS = {65: 600, 66: 600, 67: 600, 101: 600}


def test_type1_decode_and_render(tmp_path):
    """eexec + charstring decryption end-to-end: /Differences glyph
    names decode (eacute -> U+00E9 via AGL) and the charstrings
    rasterize with the right geometry (solid rect; round disc)."""
    p = str(tmp_path / "t1.pdf")
    _type1_pdf(p, [[65, 66]], GLYPHS, ENCODING, WIDTHS)
    doc = PdfDocument(p)
    assert "AB" in doc.extract_text(0)
    a = np.asarray(doc.render(0, dpi=144)).mean(axis=-1)
    ink = a < 128
    ys, xs = np.nonzero(ink)
    assert ys.size > 1000
    xmid = (xs.min() + xs.max()) / 2
    left, right = ink[:, : int(xmid)], ink[:, int(xmid):]
    lys, lxs = np.nonzero(left)
    lbox = (lys.max() - lys.min() + 1) * (lxs.max() - lxs.min() + 1)
    assert left.sum() / lbox > 0.85  # solid rect
    rys, rxs = np.nonzero(right)
    rh, rw = rys.max() - rys.min() + 1, rxs.max() - rxs.min() + 1
    assert abs(rh - rw) < 0.15 * max(rh, rw)  # round bbox
    frac = right.sum() / (rh * rw)
    assert 0.6 < frac < 0.9  # pi/4 ~ 0.785


def test_type1_seac_accent_composition(tmp_path):
    """seac composes base + accent: 'eacute' carries ink in two vertical
    clusters (base rect 0..400, accent rect offset +550) where plain 'e'
    has one."""
    p = str(tmp_path / "t1seac.pdf")
    _type1_pdf(p, [[67], [101]], GLYPHS, ENCODING, WIDTHS)
    doc = PdfDocument(p)
    assert "é" in doc.extract_text(0)  # AGL decode of /eacute
    a = np.asarray(doc.render(0, dpi=144)).mean(axis=-1)
    ink = a < 128
    rows = np.flatnonzero(ink.sum(axis=1) > 0)
    assert rows.size
    # two text lines: eacute on top, e below
    gaps = np.flatnonzero(np.diff(rows) > 10)
    assert gaps.size >= 2  # accent/base gap + line gap
    # topmost cluster = the accent; its height ~150/1000 em << base 400
    seg_ends = [rows[g] for g in gaps] + [rows[-1]]
    seg_starts = [rows[0]] + [rows[g + 1] for g in gaps]
    heights = [e - s + 1 for s, e in zip(seg_starts, seg_ends)]
    assert heights[0] < heights[1]  # accent shorter than base
    assert len(heights) == 3  # accent, base, plain 'e' line


def test_type1_builtin_encoding_fallback(tmp_path):
    """Without /Differences, codes resolve through the font program's
    built-in /Encoding (dup N /name put) - both decode and render."""
    p = str(tmp_path / "t1enc.pdf")
    clear, enc, trailer = _build_type1(GLYPHS, ENCODING)
    ff = clear + enc + trailer
    content = b"BT /F1 48 Tf 1 0 0 1 72 600 Tm (AB) Tj ET"
    objs = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
        4: b"<< /Length %d >>\nstream\n%s\nendstream"
           % (len(content), content),
        5: (b"<< /Type /Font /Subtype /Type1 /BaseFont /TestT1 "
            b"/FirstChar 65 /LastChar 66 /Widths [600 600] "
            b"/FontDescriptor 6 0 R >>"),
        6: (b"<< /Type /FontDescriptor /FontName /TestT1 /Flags 4 "
            b"/FontBBox [0 -200 1000 900] /ItalicAngle 0 /Ascent 800 "
            b"/Descent -200 /CapHeight 700 /StemV 80 /FontFile 7 0 R >>"),
        7: (b"<< /Length %d /Length1 %d /Length2 %d /Length3 %d >>"
            b"\nstream\n" % (len(ff), len(clear), len(enc), len(trailer))
            + ff + b"\nendstream"),
    }
    from tests.test_pdf_fonts_cff import _assemble_pdf
    _assemble_pdf(p, objs)
    doc = PdfDocument(p)
    a = np.asarray(doc.render(0, dpi=144)).mean(axis=-1)
    assert (a < 128).sum() > 1000  # glyphs rendered via builtin encoding
