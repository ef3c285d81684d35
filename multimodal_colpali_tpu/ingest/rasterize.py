"""PDF rasterization & text extraction via the native mmpdf C++ library.

Replaces the reference's poppler path: ``convert_pdfs_to_images`` /
``convert_pdf_dir_to_images`` (reference functions.py:678-713) rasterized
via ``pdf2image.convert_from_path``; here the same surface is served by
``native/src/mmpdf.cpp`` through ctypes, with the same on-disk layout
``{stem}_{page:03d}.png`` (reference functions.py:689).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from PIL import Image

from multimodal_colpali_tpu.ingest.preprocess import resize_image

_LIB: Optional[ctypes.CDLL] = None


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def _build_native() -> str:
    """Compile libmmpdf.so from source if it is missing (first run)."""
    import subprocess

    nd = _native_dir()
    so = os.path.join(nd, "libmmpdf.so")
    src = os.path.join(nd, "src", "mmpdf.cpp")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    subprocess.check_call(
        ["g++", "-O2", "-fPIC", "-shared", "-o", so, src, "-lz", "-ljpeg"]
    )
    return so


def get_lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(_build_native())
        lib.mmpdf_open.restype = ctypes.c_void_p
        lib.mmpdf_open.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.mmpdf_close.argtypes = [ctypes.c_void_p]
        lib.mmpdf_page_count.restype = ctypes.c_int
        lib.mmpdf_page_count.argtypes = [ctypes.c_void_p]
        lib.mmpdf_render_page.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.mmpdf_render_page.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_double,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.mmpdf_extract_text.restype = ctypes.c_void_p
        lib.mmpdf_extract_text.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.mmpdf_page_width.restype = ctypes.c_double
        lib.mmpdf_page_width.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.mmpdf_page_height.restype = ctypes.c_double
        lib.mmpdf_page_height.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.mmpdf_free.argtypes = [ctypes.c_void_p]

        class _ImageDesc(ctypes.Structure):
            _fields_ = [("w", ctypes.c_int), ("h", ctypes.c_int),
                        ("x0", ctypes.c_double), ("y0", ctypes.c_double),
                        ("x1", ctypes.c_double), ("y1", ctypes.c_double),
                        ("rgb", ctypes.POINTER(ctypes.c_uint8))]

        lib._ImageDesc = _ImageDesc
        lib.mmpdf_extract_images.restype = ctypes.POINTER(_ImageDesc)
        lib.mmpdf_extract_images.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                             ctypes.POINTER(ctypes.c_int)]
        lib.mmpdf_free_images.argtypes = [ctypes.POINTER(_ImageDesc), ctypes.c_int]

        class _TextRun(ctypes.Structure):
            _fields_ = [("x", ctypes.c_double), ("y", ctypes.c_double),
                        ("size", ctypes.c_double), ("text", ctypes.c_char_p)]

        lib._TextRun = _TextRun
        lib.mmpdf_extract_runs.restype = ctypes.POINTER(_TextRun)
        lib.mmpdf_extract_runs.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                           ctypes.POINTER(ctypes.c_int)]
        lib.mmpdf_free_runs.argtypes = [ctypes.POINTER(_TextRun), ctypes.c_int]

        class _Rule(ctypes.Structure):
            _fields_ = [("x0", ctypes.c_double), ("y0", ctypes.c_double),
                        ("x1", ctypes.c_double), ("y1", ctypes.c_double)]

        lib._Rule = _Rule
        lib.mmpdf_extract_rules.restype = ctypes.POINTER(_Rule)
        lib.mmpdf_extract_rules.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                            ctypes.POINTER(ctypes.c_int)]
        lib.mmpdf_font_atlas.restype = ctypes.POINTER(ctypes.c_uint8)
        lib.mmpdf_font_atlas.argtypes = []
        _LIB = lib
    return _LIB


def font_atlas() -> "np.ndarray":
    """The rasterizer's built-in 8x13 glyph bitmaps as a bool array.

    Returns [95, 13, 8] for ASCII 32..126 (index = ord(ch) - 32), row-major
    top-to-bottom, column 0 = leftmost. Shared with the OCR stage so
    rendering and recognition agree on glyph shapes.
    """
    lib = get_lib()
    raw = ctypes.string_at(lib.mmpdf_font_atlas(), 95 * 13)
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(95, 13)
    return (rows[..., None] & (0x80 >> np.arange(8))[None, None, :]) != 0


class PdfDocument:
    """A parsed PDF: page count, page rasters, text layer."""

    def __init__(self, path_or_bytes):
        if isinstance(path_or_bytes, (str, Path)):
            with open(path_or_bytes, "rb") as f:
                data = f.read()
            self.name = os.path.basename(str(path_or_bytes))
        else:
            data = bytes(path_or_bytes)
            self.name = "document.pdf"
        self._lib = get_lib()
        self._data = data  # keep alive
        self._h = self._lib.mmpdf_open(data, len(data))
        if not self._h:
            raise ValueError(f"could not parse PDF {self.name!r}")

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.mmpdf_close(self._h)
            self._h = None

    def __len__(self) -> int:
        return self._lib.mmpdf_page_count(self._h)

    def page_size(self, index: int) -> tuple:
        return (self._lib.mmpdf_page_width(self._h, index),
                self._lib.mmpdf_page_height(self._h, index))

    def render(self, index: int, dpi: float = 144.0) -> Image.Image:
        w = ctypes.c_int(0)
        h = ctypes.c_int(0)
        buf = self._lib.mmpdf_render_page(self._h, index, dpi,
                                          ctypes.byref(w), ctypes.byref(h))
        if not buf:
            raise IndexError(f"page {index} out of range")
        try:
            arr = np.ctypeslib.as_array(buf, shape=(h.value, w.value, 3)).copy()
        finally:
            self._lib.mmpdf_free(buf)
        return Image.fromarray(arr, "RGB")

    def extract_text(self, index: int) -> str:
        ptr = self._lib.mmpdf_extract_text(self._h, index)
        if not ptr:
            return ""
        try:
            return ctypes.string_at(ptr).decode("utf-8", "replace")
        finally:
            self._lib.mmpdf_free(ptr)

    def extract_images(self, index: int):
        """Embedded raster figures of a page -> [(PIL.Image, bbox)], bbox in
        PDF units (x0, y0, x1, y1, top-left origin)."""
        count = ctypes.c_int(0)
        arr = self._lib.mmpdf_extract_images(self._h, index, ctypes.byref(count))
        out = []
        try:
            for i in range(count.value):
                d = arr[i]
                buf = np.ctypeslib.as_array(d.rgb, shape=(d.h, d.w, 3)).copy()
                out.append((Image.fromarray(buf, "RGB"), (d.x0, d.y0, d.x1, d.y1)))
        finally:
            if count.value:
                self._lib.mmpdf_free_images(arr, count.value)
        return out

    def extract_runs(self, index: int):
        """Positioned text runs -> [(x, y, size, text)] in PDF units,
        top-left origin. The layout signal for table detection."""
        count = ctypes.c_int(0)
        arr = self._lib.mmpdf_extract_runs(self._h, index, ctypes.byref(count))
        out = []
        try:
            for i in range(count.value):
                r = arr[i]
                out.append((r.x, r.y, r.size,
                            (r.text or b"").decode("utf-8", "replace")))
        finally:
            if count.value:
                self._lib.mmpdf_free_runs(arr, count.value)
        return out

    def extract_rules(self, index: int):
        """Ruled lines -> [(x0, y0, x1, y1)] in PDF units, top-left origin:
        near-axis stroked segments and thin filled rects (table borders /
        booktabs rules). Second structure signal for ``detect_tables``."""
        count = ctypes.c_int(0)
        arr = self._lib.mmpdf_extract_rules(self._h, index, ctypes.byref(count))
        out = []
        try:
            for i in range(count.value):
                r = arr[i]
                out.append((r.x0, r.y0, r.x1, r.y1))
        finally:
            if count.value:
                self._lib.mmpdf_free(arr)
        return out

    def has_text(self, index: int = 0) -> bool:
        """check_ocr probe: does page ``index`` carry a text layer?

        (The reference's ``check_ocr`` at functions.py:133-148 intends this
        but always returns False due to the ``len(text)>=0`` bug; this
        implements the intended semantics.)
        """
        return len(self.extract_text(index).strip()) > 0


def convert_pdfs_to_images(
    papers: List[str], vd_dir: str, dpi: float = 144.0, subdir: str = "pg_images"
) -> Dict[str, List[str]]:
    """Rasterize PDFs to ``{vd_dir}/{subdir}/{stem}_{page:03d}.png``.

    Surface-compatible with reference functions.py:678-694 (which resizes
    through ``resize_image`` before saving; we do the same).
    """
    out_dir = Path(vd_dir) / subdir
    out_dir.mkdir(parents=True, exist_ok=True)
    saved: Dict[str, List[str]] = {}
    for paper in papers:
        doc = PdfDocument(paper)
        stem = Path(paper).stem
        paths = []
        for i in range(len(doc)):
            img = resize_image(doc.render(i, dpi=dpi))
            p = out_dir / f"{stem}_{i + 1:03d}.png"
            img.save(p, format="PNG")
            paths.append(str(p))
        saved[stem] = paths
    return saved


def convert_pdf_dir_to_images(pdf_dir: str, dpi: float = 144.0) -> Dict[str, List[Image.Image]]:
    """In-memory variant: {filename: [PIL pages]} (reference functions.py:697-713)."""
    out: Dict[str, List[Image.Image]] = {}
    for name in sorted(os.listdir(pdf_dir)):
        if not name.lower().endswith(".pdf"):
            continue
        doc = PdfDocument(os.path.join(pdf_dir, name))
        out[name] = [resize_image(doc.render(i, dpi=dpi)) for i in range(len(doc))]
    return out
