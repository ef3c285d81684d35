"""PDF -> Document pipeline: the reference's ``pdf_loader``/``data_preparation``.

Surface parity with reference functions.py:1336-1355 (pdf_loader) and
functions.py:246-406 (data_preparation): returns ``(docs_multi, docs_text)``
LangChain-shaped Document lists with the exact metadata schema
``{document_name, document_id, document_link, type, page_no, ref, caption,
img_link}`` (functions.py:311-323), and saves page images as
``{vd_dir}/pg_images/{stem}_{page:03d}.png`` (functions.py:269).

The layout/OCR/table models Docling provides (EasyOCR, TableFormer, granite
picture descriptions) are ingestion-time model services, not framework code;
this loader extracts the text layer and page/figure rasters natively
(mmpdf) and exposes hooks (``picture_annotator``, ``ocr_fn``) where those
models plug in. Pages with no text layer are flagged for OCR via
``PdfDocument.has_text`` - the working version of the reference's
``check_ocr`` (functions.py:133-148, which has a ``len(text)>=0`` bug).
"""

from __future__ import annotations

import uuid
from pathlib import Path
from typing import Callable, List, Optional, Sequence, Tuple

from multimodal_colpali_tpu.documents import Document
from multimodal_colpali_tpu.ingest.chunker import HybridChunker
from multimodal_colpali_tpu.ingest.preprocess import resize_image
from multimodal_colpali_tpu.ingest.rasterize import PdfDocument


def data_preparation(
    conversion: List[dict],
    vd_dir: str,
    vd_tokenizer,
    mm_dir: str = "",
    only_text: bool = False,
    page_images: bool = True,
    max_chunk_tokens: int = 512,
) -> List[Document]:
    """Build Document chunks from parsed PDFs (reference functions.py:246-406).

    ``conversion`` entries: {"filename", "link", "document": PdfDocument,
    optional "picture_annotations": [str]}.
    """
    all_docs: List[Document] = []
    for el in conversion:
        filename = el["filename"]
        filename_link = el.get("link", "")
        document_id = str(uuid.uuid4())
        doc: PdfDocument = el["document"]
        doc_stem = Path(filename).stem

        save_root = Path(vd_dir if mm_dir == "" else mm_dir)
        save_root.mkdir(parents=True, exist_ok=True)

        if page_images:
            pg_dir = save_root / "pg_images"
            pg_dir.mkdir(parents=True, exist_ok=True)
            for page_no in range(1, len(doc) + 1):
                img = resize_image(doc.render(page_no - 1))
                img.save(pg_dir / f"{doc_stem}_{page_no:03d}.png", format="PNG")

        pages_text = el.get("ocr_text") or [doc.extract_text(i) for i in range(len(doc))]
        chunks = HybridChunker(vd_tokenizer, max_tokens=max_chunk_tokens).chunk_pages(pages_text)
        texts = [
            Document(
                page_content=ch.text,
                metadata={
                    "document_name": doc.name,
                    "document_id": document_id,
                    "document_link": filename_link,
                    "type": "text",
                    "page_no": ch.page_no,
                    "ref": ch.ref,
                    "caption": "",
                    "img_link": "",
                },
            )
            for ch in chunks
        ]

        if only_text:
            all_docs.extend(texts)
            print(f"For {filename} there were {len(texts)} texts processed only_text={only_text}.")
            continue

        # Figures: embedded raster images extracted natively by mmpdf, saved
        # as images/{stem}_img_{idx:03d}.png (reference functions.py:292-297).
        # VLM descriptions are filled in later by process_models (the
        # reference's flow); table structure still needs a layout model and
        # arrives through the picture_annotations hook.
        pictures: List[Document] = []
        images_dir = save_root / "images"
        picture_counter = 0
        if hasattr(doc, "extract_images"):
            for page_no in range(1, len(doc) + 1):
                for img, _bbox in doc.extract_images(page_no - 1):
                    if min(img.size) < 16:
                        continue  # decorative strips/icons
                    picture_counter += 1
                    if picture_counter == 1:
                        images_dir.mkdir(parents=True, exist_ok=True)
                    link = images_dir / f"{doc_stem}_img_{picture_counter:03d}.png"
                    resize_image(img).save(link, format="PNG")
                    pictures.append(Document(
                        page_content="",
                        metadata={
                            "document_name": doc.name,
                            "document_id": document_id,
                            "document_link": filename_link,
                            "type": "image",
                            "page_no": page_no,
                            "ref": f"#/pictures/{picture_counter - 1}",
                            "caption": "",
                            "img_link": str(link),
                        },
                    ))
        for ann in el.get("picture_annotations", []):
            picture_counter += 1
            pictures.append(Document(
                page_content=ann.get("text", "") if isinstance(ann, dict) else str(ann),
                metadata={
                    "document_name": doc.name,
                    "document_id": document_id,
                    "document_link": filename_link,
                    "type": "image",
                    "page_no": int(ann.get("page_no", 1)) if isinstance(ann, dict) else 1,
                    "ref": f"#/pictures/{picture_counter - 1}",
                    "caption": ann.get("caption", "") if isinstance(ann, dict) else "",
                    "img_link": ann.get("img_link", "") if isinstance(ann, dict) else "",
                },
            ))

        all_docs.extend(texts + pictures)
        print(
            f"For {filename} there were {len(texts)} texts and {len(pictures)} images "
            f"processed, equals {len(texts) + len(pictures)} documents."
        )

    print(f"Total number of elements processed: {len(all_docs)}.")
    return all_docs


def check_ocr(paper: str) -> bool:
    """True if the PDF's first page has no text layer (needs OCR).

    Implements the *intended* semantics of reference functions.py:133-148.
    """
    try:
        return not PdfDocument(paper).has_text(0)
    except ValueError:
        return True


def pdf_loader(
    papers: Sequence[str],
    doi_links: Sequence[str],
    filenames: Sequence[str],
    vd_dir: str,
    vd_tokenizer,
    ocr_fn: Optional[Callable[[str], List[str]]] = None,
) -> Tuple[List[Document], List[Document]]:
    """Parse PDFs twice (multi + text-only), reference functions.py:1336-1355.

    Returns ``(docs_multi, docs_text)``. ``ocr_fn(path) -> [page_texts]``
    runs when ``check_ocr`` fires (scanned/image-only PDF); by default the
    built-in template OCR (ingest/ocr.py) recovers machine-printed text, the
    role EasyOCR plays inside the reference's Docling converter
    (functions.py:78-80). Pass a custom ``ocr_fn`` to plug in another model.
    """
    conversion = []
    for paper, link, fname in zip(papers, doi_links, filenames):
        doc = PdfDocument(paper)
        el = {"filename": fname, "link": link, "document": doc}
        if check_ocr(paper):
            if ocr_fn is None:
                from multimodal_colpali_tpu.ingest.ocr import TemplateOcr

                ocr_fn = TemplateOcr()
            print(f"{fname} has no text layer; running OCR")
            el["ocr_text"] = ocr_fn(paper)
        conversion.append(el)

    docs_multi = data_preparation(conversion, vd_dir, vd_tokenizer)
    docs_text = data_preparation(conversion, vd_dir, vd_tokenizer,
                                 only_text=True, page_images=False)
    return docs_multi, docs_text
