"""Tiny PDF writer - test fixture generator for the native rasterizer.

Produces valid classic-xref PDFs with Helvetica text lines and optional
embedded FlateDecode RGB images, exercising the exact subset
``native/src/mmpdf.cpp`` implements. Used by tests and by the synthetic
corpus generator in bench.py; not a user-facing component.
"""

from __future__ import annotations

import zlib
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _esc(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


class PdfWriter:
    def __init__(self, width: float = 612, height: float = 792):
        self.width = width
        self.height = height
        self.pages: List[dict] = []

    def add_page(
        self,
        text_lines: Optional[Sequence[str]] = None,
        image: Optional[np.ndarray] = None,          # [H, W, 3] uint8
        image_rect: Tuple[float, float, float, float] = (100, 400, 300, 200),
        font_size: float = 12,
        start_y: Optional[float] = None,
        runs: Optional[Sequence[Tuple[float, float, str]]] = None,
    ) -> None:
        """``runs``: positioned text as (x, y-from-bottom, text) triples -
        each becomes its own BT/Td/Tj block (for table-layout fixtures)."""
        self.pages.append({
            "text": list(text_lines or []),
            "image": image,
            "image_rect": image_rect,
            "font_size": font_size,
            "start_y": start_y if start_y is not None else self.height - 72,
            "runs": list(runs or []),
        })

    def tobytes(self) -> bytes:
        objs: List[bytes] = []  # 1-indexed

        def add(obj: bytes) -> int:
            objs.append(obj)
            return len(objs)

        font_id = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

        page_ids = []
        kids_placeholder = add(b"PLACEHOLDER_PAGES")  # patched later
        for page in self.pages:
            content = []
            res_parts = [f"/Font << /F1 {font_id} 0 R >>"]
            if page["text"]:
                content.append(b"BT /F1 %.1f Tf" % page["font_size"])
                y = page["start_y"]
                content.append(b"%.1f %.1f Td" % (72, y))
                first = True
                for line in page["text"]:
                    if not first:
                        content.append(b"0 %.1f Td" % (-page["font_size"] * 1.4))
                    content.append(b"(%s) Tj" % _esc(line).encode("latin-1", "replace"))
                    first = False
                content.append(b"ET")
            for x, y, text in page.get("runs", []):
                content.append(
                    b"BT /F1 %.1f Tf %.1f %.1f Td (%s) Tj ET"
                    % (page["font_size"], x, y,
                       _esc(text).encode("latin-1", "replace"))
                )
            if page["image"] is not None:
                img = np.ascontiguousarray(page["image"], dtype=np.uint8)
                h, w, _ = img.shape
                data = zlib.compress(img.tobytes())
                img_id = add(
                    b"<< /Type /XObject /Subtype /Image /Width %d /Height %d "
                    b"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
                    b"/Filter /FlateDecode /Length %d >>\nstream\n%s\nendstream"
                    % (w, h, len(data), data)
                )
                res_parts.append(f"/XObject << /Im1 {img_id} 0 R >>")
                x, y, cw, ch = page["image_rect"]
                content.append(
                    b"q %.1f 0 0 %.1f %.1f %.1f cm /Im1 Do Q" % (cw, ch, x, y)
                )
            stream = b"\n".join(content)
            cont_id = add(
                b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
            )
            page_id = add(
                b"<< /Type /Page /Parent %d 0 R /MediaBox [0 0 %.1f %.1f] "
                b"/Resources << %s >> /Contents %d 0 R >>"
                % (kids_placeholder, self.width, self.height,
                   " ".join(res_parts).encode(), cont_id)
            )
            page_ids.append(page_id)

        kids = " ".join(f"{pid} 0 R" for pid in page_ids)
        objs[kids_placeholder - 1] = (
            b"<< /Type /Pages /Kids [%s] /Count %d >>" % (kids.encode(), len(page_ids))
        )
        catalog_id = add(b"<< /Type /Catalog /Pages %d 0 R >>" % kids_placeholder)

        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0]
        for i, obj in enumerate(objs, start=1):
            offsets.append(len(out))
            out += b"%d 0 obj\n" % i
            out += obj
            out += b"\nendobj\n"
        xref_off = len(out)
        out += b"xref\n0 %d\n" % (len(objs) + 1)
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += b"%010d 00000 n \n" % off
        out += (
            b"trailer\n<< /Size %d /Root %d 0 R >>\nstartxref\n%d\n%%%%EOF\n"
            % (len(objs) + 1, catalog_id, xref_off)
        )
        return bytes(out)

    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            f.write(self.tobytes())


def make_sample_pdf(
    path: str,
    n_pages: int = 3,
    lines_per_page: int = 20,
    with_images: bool = True,
    seed: int = 0,
    title: str = "Glycan structures in biology",
) -> None:
    """A synthetic 'paper' exercising text + images, for tests and benches."""
    rng = np.random.default_rng(seed)
    w = PdfWriter()
    for p in range(n_pages):
        lines = [f"{title} - page {p + 1}"]
        for i in range(lines_per_page):
            lines.append(
                f"Paragraph {i}: glycans such as sialyl-Lewis-x bind selectins "
                f"(sample sentence {rng.integers(0, 10_000)})."
            )
        img = None
        if with_images:
            img = (rng.integers(0, 255, (60, 80, 3))).astype(np.uint8)
        w.add_page(text_lines=lines, image=img)
    w.save(path)
