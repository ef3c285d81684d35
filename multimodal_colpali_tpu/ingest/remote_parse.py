"""Remote document-parse service client (docling-serve seam).

The reference can offload PDF conversion to a docling-serve HTTP endpoint
with a 10-retry loop (``conv_docs1``/``pdf_loader1``,
functions.py:1357-1449). This keeps that seam: POST the PDF to a conversion
service, retry on failure, fall back to the native local parser when no
endpoint is configured or retries are exhausted.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import httpx

from multimodal_colpali_tpu.documents import Document
from multimodal_colpali_tpu.ingest.pdf_loader import data_preparation
from multimodal_colpali_tpu.ingest.rasterize import PdfDocument


def conv_docs1(
    papers: Sequence[str],
    filenames: Sequence[str],
    doi_links: Sequence[str],
    service_url: Optional[str] = None,
    retries: int = 10,
    backoff: float = 2.0,
) -> List[Dict[str, Any]]:
    """Convert PDFs via the remote service; native fallback per document.

    Remote protocol: POST /v1/convert with the file; response JSON carries
    ``pages: [{text: str}]`` (the subset of docling-serve's output the
    pipeline consumes). Each entry returned matches the local ``conversion``
    record shape consumed by data_preparation.
    """
    out = []
    for paper, fname, link in zip(papers, filenames, doi_links):
        remote_pages: Optional[List[str]] = None
        if service_url:
            for attempt in range(retries):
                try:
                    with open(paper, "rb") as f:
                        r = httpx.post(
                            service_url.rstrip("/") + "/v1/convert",
                            files={"file": (fname, f, "application/pdf")},
                            timeout=300,
                        )
                    r.raise_for_status()
                    remote_pages = [p.get("text", "") for p in r.json().get("pages", [])]
                    break
                except (httpx.HTTPError, ValueError) as e:
                    print(f"remote convert attempt {attempt + 1}/{retries} failed: {e}")
                    time.sleep(backoff)
        doc = PdfDocument(paper)
        if remote_pages is not None:
            doc = _TextOverrideDocument(doc, remote_pages)
        out.append({"filename": fname, "link": link, "document": doc})
    return out


class _TextOverrideDocument:
    """PdfDocument wrapper whose text layer comes from the remote service
    (rasters stay native)."""

    def __init__(self, doc: PdfDocument, pages_text: List[str]):
        self._doc = doc
        self._pages_text = pages_text
        self.name = doc.name

    def __len__(self):
        return len(self._doc)

    def render(self, *a, **k):
        return self._doc.render(*a, **k)

    def page_size(self, *a, **k):
        return self._doc.page_size(*a, **k)

    def extract_text(self, index: int) -> str:
        if index < len(self._pages_text):
            return self._pages_text[index]
        return self._doc.extract_text(index)

    def has_text(self, index: int = 0) -> bool:
        return len(self.extract_text(index).strip()) > 0


def pdf_loader1(
    papers: Sequence[str],
    doi_links: Sequence[str],
    filenames: Sequence[str],
    vd_dir: str,
    vd_tokenizer,
    service_url: Optional[str] = None,
) -> Tuple[List[Document], List[Document]]:
    """Remote-parse variant of pdf_loader (reference functions.py:1432-1449)."""
    conversion = conv_docs1(papers, filenames, doi_links, service_url=service_url)
    docs_multi = data_preparation(conversion, vd_dir, vd_tokenizer)
    docs_text = data_preparation(conversion, vd_dir, vd_tokenizer,
                                 only_text=True, page_images=False)
    return docs_multi, docs_text
