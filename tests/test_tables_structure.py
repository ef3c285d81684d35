"""Table structure past rigid grids (VERDICT r3 next #8).

The TableFormer-ACCURATE role (reference functions.py:85-93): spanning
header cells, multi-line cells, right-aligned (irregular) columns, and
borderless tables evidenced by ruled lines - plus the guard that flowing
multi-column body text is NOT a table (reading order owns page columns).
"""

from multimodal_colpali_tpu.ingest.pdfwrite import PdfWriter
from multimodal_colpali_tpu.ingest.rasterize import PdfDocument
from multimodal_colpali_tpu.ingest.tables import detect_tables


def _runs_of(pdf_bytes_or_writer, page=0, rules=False):
    if isinstance(pdf_bytes_or_writer, PdfWriter):
        doc = PdfDocument(pdf_bytes_or_writer.tobytes())
    else:
        doc = PdfDocument(pdf_bytes_or_writer)
    r = doc.extract_runs(page)
    return (r, doc.extract_rules(page)) if rules else r


def test_spanning_header_cell(tmp_path):
    """A header cell straddling two grid columns must not bridge the
    gutters: the table keeps its 3 data columns and the spanning text
    lands in the first column it covers."""
    w = PdfWriter()
    runs = [(72, 700, "Table 2: Affinities by selectin")]
    # header row: col-1 header + ONE cell spanning data columns 2..3
    runs += [(72, 680, "Glycan"), (200, 680, "Binding affinity process")]
    data = [["sLex", "870", "120"],
            ["sLea", "220", "310"],
            ["GM1", "45", "77"]]
    y = 660
    for row in data:
        for x, cell in zip([72, 200, 320], row):
            runs.append((x, y, cell))
        y -= 18
    w.add_page(runs=runs, font_size=10)
    dets = detect_tables(_runs_of(w))
    assert len(dets) == 1
    t = dets[0]
    assert t.caption.startswith("Table 2")
    assert len(t.cells[0]) == 3, "spanning header must not merge columns"
    assert t.cells[0][0] == "Glycan"
    assert t.cells[0][1] == "Binding affinity process"
    assert t.cells[1] == ["sLex", "870", "120"]
    assert t.cells[3] == ["GM1", "45", "77"]
    md = t.to_markdown()
    assert "| sLex" in md and "| 310" in md


def test_right_aligned_irregular_columns():
    """Right-aligned numeric columns (x starts differ per row) align by
    interval overlap: the old shared-x-grid rule missed these."""
    w = PdfWriter()
    runs = [(72, 680, "Ligand"), (260, 680, "Kd")]
    vals = [("sLex", "870"), ("GM1", "5"), ("Lewis-y", "1030")]
    y = 660
    for name, v in vals:
        runs.append((72, y, name))
        runs.append((280 - len(v) * 5, y, v))   # right-aligned at x=280
        y -= 18
    w.add_page(runs=runs, font_size=10)
    dets = detect_tables(_runs_of(w))
    assert len(dets) == 1
    assert dets[0].cells == [["Ligand", "Kd"], ["sLex", "870"],
                             ["GM1", "5"], ["Lewis-y", "1030"]]


def test_multiline_cell_merges_up():
    """A continuation row whose single run sits inside one column band is
    a wrapped cell: its text merges into the row above instead of
    terminating the table."""
    w = PdfWriter()
    runs = [(72, 680, "Glycan"), (200, 680, "Effect"), (360, 680, "Kd")]
    runs += [(72, 662, "sLex"), (200, 662, "binds selectin"), (360, 662, "870")]
    runs += [(200, 650, "weakly")]             # wrapped 2nd line of "Effect"
    runs += [(72, 632, "GM1"), (200, 632, "binds CTB"), (360, 632, "45")]
    w.add_page(runs=runs, font_size=10)
    dets = detect_tables(_runs_of(w))
    assert len(dets) == 1
    t = dets[0]
    assert t.cells[1] == ["sLex", "binds selectin weakly", "870"]
    assert t.cells[2] == ["GM1", "binds CTB", "45"]


def test_borderless_table_via_ruled_lines():
    """Booktabs-style: no x-grid a rigid matcher could lock onto (ragged
    centered cells), but top/mid/bottom rules bound the region - the
    ruled-line second signal accepts it."""
    w = PdfWriter()
    # centered, ragged cells: starts deliberately unaligned row to row
    runs = [(72, 700, "Table 3: Ruled affinities"),
            (80, 680, "Glycan"), (210, 680, "Receptor"),
            (90, 660, "sialyl-Lewis-x"), (205, 660, "E-selectin"),
            (96, 640, "GM1"), (222, 640, "CTB")]
    # (x0, y0, x1, y1) with y from bottom, like the runs: top rule above
    # the header, mid rule under it, bottom rule under the last row
    w.add_page(runs=runs, lines=[(70, 690, 330, 690), (70, 670, 330, 670),
                                 (70, 632, 330, 632)], font_size=10)
    doc = PdfDocument(w.tobytes())
    dets = detect_tables(doc.extract_runs(0), rules=doc.extract_rules(0))
    assert len(dets) == 1
    t = dets[0]
    assert t.caption.startswith("Table 3")
    assert t.cells[0] == ["Glycan", "Receptor"]
    assert t.cells[1] == ["sialyl-Lewis-x", "E-selectin"]
    assert t.cells[2] == ["GM1", "CTB"]


def test_vertical_rules_define_columns():
    """Vertical rules inside a ruled region directly set the column
    separators, even when the text gap alone is ambiguous."""
    w = PdfWriter()
    runs = [(80, 680, "Name"), (210, 680, "Value"),
            (80, 660, "alpha beta gamma"), (210, 660, "one two"),
            (80, 640, "delta"), (210, 640, "three")]
    w.add_page(runs=runs, font_size=10,
               lines=[(70, 690, 330, 690), (70, 630, 330, 630),
                      (200, 630, 200, 690)])
    doc = PdfDocument(w.tobytes())
    dets = detect_tables(doc.extract_runs(0), rules=doc.extract_rules(0))
    assert len(dets) == 1
    assert dets[0].cells[1] == ["alpha beta gamma", "one two"]


def test_two_column_body_text_is_not_a_table():
    """Flowing two-column page text (whole-line runs) must not be detected
    as a table - reading order owns page columns."""
    w = PdfWriter()
    runs = []
    for i in range(10):
        y = 680 - i * 14
        runs.append((72, y, f"Left col line {i} of flowing body text"))
        runs.append((330, y, f"Right col line {i} with more body text"))
    w.add_page(runs=runs, font_size=10)
    assert detect_tables(_runs_of(w)) == []


def test_ocr_word_runs_two_column_text_is_not_a_table():
    """OCR layouts emit one run per word: two-column scanned body text has
    short runs but many words per cell - still not a table."""
    runs = []
    for i in range(8):
        y = 680 - i * 14
        for c, x0 in enumerate([72, 330]):
            x = x0
            for word in f"column {c} body line {i} words".split():
                runs.append((x, y, 10.0, word))
                x += (len(word) + 1) * 5.0
    assert detect_tables(runs) == []


def test_existing_rigid_grid_still_detected():
    """The original aligned-grid case keeps working unchanged."""
    w = PdfWriter()
    runs = [(72, 700, "Table 1: Glycan binding affinities")]
    rows = [["Glycan", "Lectin", "Kd"],
            ["sLex", "E-selectin", "870"],
            ["sLea", "P-selectin", "220"]]
    y = 680
    for row in rows:
        for x, cell in zip([72, 200, 320], row):
            runs.append((x, y, cell))
        y -= 18
    runs.append((72, y - 12, "Ordinary paragraph text continues here."))
    w.add_page(runs=runs)
    dets = detect_tables(_runs_of(w))
    assert len(dets) == 1
    t = dets[0]
    assert t.caption == "Table 1: Glycan binding affinities"
    assert t.cells == rows


def test_independent_writer_ruled_table(tmp_path):
    """INDEPENDENT-writer fixture (VERDICT r4 weak #6): a ruled table
    authored by matplotlib's PDF backend (fonttype 42; runs decoded via
    ToUnicode, rules from stroked Line2D paths) detected with the right
    cells - nothing in the fixture touches the repo's PdfWriter."""
    import matplotlib
    matplotlib.use("pdf")
    with matplotlib.rc_context({"pdf.fonttype": 42}):
        import matplotlib.pyplot as plt
        W, H = 612.0, 792.0
        fig = plt.figure(figsize=(W / 72, H / 72))
        def put(x, y, t, size=10):
            fig.text(x / W, y / H, t, fontsize=size, family="DejaVu Sans")
        def rule(x0, x1, y):
            fig.add_artist(plt.Line2D([x0 / W, x1 / W], [y / H, y / H],
                                      transform=fig.transFigure,
                                      color="black", lw=0.8))
        put(72, 700, "Table 3: Binding affinities")
        header = ["Glycan", "Kd", "Err"]
        data = [["sLex", "870", "120"],
                ["sLea", "220", "310"],
                ["GM1", "45", "77"]]
        xs = [72, 200, 320]
        rule(66, 400, 692)
        y = 676
        for x, cell in zip(xs, header):
            put(x, y, cell)
        rule(66, 400, y - 6)
        for row in data:
            y -= 18
            for x, cell in zip(xs, row):
                put(x, y, cell)
        rule(66, 400, y - 6)
        p = str(tmp_path / "mpl_table.pdf")
        fig.savefig(p)
        plt.close(fig)
    doc = PdfDocument(p)
    runs, rules = doc.extract_runs(0), doc.extract_rules(0)
    assert len(rules) >= 3, rules  # the three horizontal rules survive
    dets = detect_tables(runs, rules=rules)
    assert len(dets) == 1, [getattr(t, "cells", None) for t in dets]
    t = dets[0]
    assert t.caption.startswith("Table 3")
    assert t.cells[0] == ["Glycan", "Kd", "Err"]
    assert t.cells[1] == ["sLex", "870", "120"]
    assert t.cells[3] == ["GM1", "45", "77"]
