"""Table-structure extraction from the PDF text layout.

Fills the capability the reference gets from Docling's TableFormer model
(reference functions.py:85-93, ACCURATE mode): ``data_preparation`` there
emits ``type=table`` documents whose content is the table as markdown with
the caption prepended (functions.py:344-357). Without a table stage, table
content silently vanishes from the text/multimodal collections.

This is a rule-based, layout-driven detector over the native rasterizer's
positioned text runs (``PdfDocument.extract_runs``): machine-generated
tables are grids of short runs whose x positions repeat across consecutive
rows. Detection:

1. cluster runs into visual rows by y (tolerance ~ font size);
2. take maximal blocks of >= 2 consecutive rows that each contain >= 2
   runs and whose x positions align to a shared column grid;
3. map cells to the nearest grid column, first block row = header;
4. caption = the nearest single-run row above/below the block whose text
   starts with "table" (case-insensitive).

A learned layout model can replace this behind the same surface; the
document schema is already exact (documents.py).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

Run = Tuple[float, float, float, str]  # (x, y, font size, text)


@dataclasses.dataclass
class DetectedTable:
    """One table: cell grid plus the layout info needed downstream."""

    cells: List[List[str]]          # [n_rows][n_cols], "" for missing
    bbox: Tuple[float, float, float, float]  # x0, y0, x1, y1 (page units)
    caption: str = ""

    def to_markdown(self) -> str:
        """Pipe-table markdown, header = first row (the reference exports
        pandas ``to_markdown`` of the TableFormer dataframe; same shape)."""
        if not self.cells:
            return ""
        widths = [max(len(r[c]) for r in self.cells)
                  for c in range(len(self.cells[0]))]

        def fmt(row: Sequence[str]) -> str:
            return "| " + " | ".join(c.ljust(w) for c, w in zip(row, widths)) + " |"

        lines = [fmt(self.cells[0]),
                 "|" + "|".join("-" * (w + 2) for w in widths) + "|"]
        lines += [fmt(r) for r in self.cells[1:]]
        return "\n".join(lines)


def _cluster_rows(runs: Sequence[Run]) -> List[List[Run]]:
    """Group runs into visual rows by y; rows sorted top-down, cells by x."""
    rows: List[List[Run]] = []
    for run in sorted(runs, key=lambda r: (r[1], r[0])):
        tol = max(run[2], 4.0) * 0.4
        if rows and abs(rows[-1][0][1] - run[1]) <= tol:
            rows[-1].append(run)
        else:
            rows.append([run])
    return rows


def _grid_of(block: Sequence[Sequence[Run]], tol: float) -> List[float]:
    """Column x positions: the x-set of the widest row in the block."""
    widest = max(block, key=len)
    return [r[0] for r in widest]


def _row_fits_grid(row: Sequence[Run], grid: Sequence[float], tol: float) -> bool:
    return all(any(abs(run[0] - gx) <= tol for gx in grid) for run in row)


def detect_tables(runs: Sequence[Run], min_rows: int = 2,
                  min_cols: int = 2, x_tol: float = 3.0) -> List[DetectedTable]:
    """Find grid-aligned blocks among a page's text runs."""
    rows = _cluster_rows(runs)
    tables: List[DetectedTable] = []
    i = 0
    while i < len(rows):
        if len(rows[i]) < min_cols:
            i += 1
            continue
        # Grow a block of consecutive multi-run rows with compatible grids.
        block = [rows[i]]
        j = i + 1
        while j < len(rows) and len(rows[j]) >= min_cols:
            candidate = block + [rows[j]]
            grid = _grid_of(candidate, x_tol)
            if len(grid) < min_cols or not all(
                _row_fits_grid(r, grid, x_tol) for r in candidate
            ):
                break
            # rows must be vertically adjacent (same table, not two tables)
            size = max(block[-1][0][2], 4.0)
            if rows[j][0][1] - block[-1][0][1] > 3.0 * size:
                break
            block = candidate
            j += 1
        if len(block) >= min_rows:
            grid = sorted(_grid_of(block, x_tol))
            cells = []
            for row in block:
                line = [""] * len(grid)
                for x, _, _, text in row:
                    col = min(range(len(grid)), key=lambda c: abs(grid[c] - x))
                    line[col] = (line[col] + " " + text).strip()
                cells.append(line)
            ys = [r[0][1] for r in block]
            sz = max(block[-1][0][2], 4.0)
            # run x-extent ~ chars * advance (advance = 0.5 * font size)
            xs0 = [run[0] for row in block for run in row]
            xs1 = [run[0] + len(run[3]) * 0.5 * run[2]
                   for row in block for run in row]
            bbox = (min(xs0), min(ys) - sz, max(xs1), max(ys) + sz * 0.4)
            caption = _find_caption(rows, i, j, sz)
            tables.append(DetectedTable(cells=cells, bbox=bbox, caption=caption))
            i = j
        else:
            i += 1
    return tables


def _find_caption(rows: List[List[Run]], start: int, end: int,
                  size: float) -> str:
    """Nearest neighbor row starting with 'table'. The row's runs are
    joined left-to-right: native text layers carry whole-line runs, but
    OCR-recovered layouts (scanned pages) emit one run per word."""
    for idx in (start - 1, end):
        if 0 <= idx < len(rows):
            text = " ".join(r[3] for r in sorted(rows[idx],
                                                 key=lambda r: r[0])).strip()
            if text.lower().startswith("table"):
                return text
    return ""
