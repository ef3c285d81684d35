#!/usr/bin/env python
"""Ingest & index: build text/multimodal/ColPali collections from PDFs.

CLI-compatible with the reference's 01_create_context_qdrant.py (args at
:100-110, flow at :232-305): pdf_loader -> per-model VLM image summaries ->
dense text + multimodal collections -> page rasters -> per-model ColPali
multivector collections. Everything runs in-process on the TPU stack; the
collections persist under --vd-dir via VectorClient.
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_colpali_tpu import api
from multimodal_colpali_tpu.config import EMBED_MODEL_ID, load_models_config
from multimodal_colpali_tpu.generation import run_sync
from multimodal_colpali_tpu.ingest import convert_pdfs_to_images, pdf_loader
from multimodal_colpali_tpu.models import load_retriever
from multimodal_colpali_tpu.models.text_encoder import BgeEmbeddings
from multimodal_colpali_tpu.store import VectorClient

DEFAULT_PROMPT = {
    "img_summary": (
        "Describe the scientific figure in detail, focusing on the biological "
        "entities, axes, and relationships shown."
    ),
    "text_summary": "Summarize the following passage faithfully and concisely: ",
}


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Create Experiment 01 context collections.")
    p.add_argument("--papers-dir", default=os.environ.get("PAPERS_DIR", "./papers"))
    p.add_argument("--vd-dir", default=os.environ.get("VD_DIR", "./src/vectordb"))
    p.add_argument("--prompts-path", default="prompts_used.pkl")
    p.add_argument("--models-config", default=None)
    p.add_argument("--doi-file", default=None)
    p.add_argument("--device", default=None,
                   help="Accepted for reference parity; placement is jax-managed.")
    p.add_argument("--skip-summaries", action="store_true",
                   help="Skip the VLM image-summary stage (no generation endpoint).")
    p.add_argument("--base-url", default=os.environ.get("OPENAI_BASE_URL"))
    p.add_argument("--dpi", type=float, default=144.0)
    p.add_argument("--dynamic-resolution", action="store_true",
                   help="Per-image resolution layouts (smart grids / anyres / splitting) for families that support them.")
    p.add_argument("--text-encoder-config", default="bge-base",
                   choices=["bge-base", "tiny"])
    return p.parse_args()


def list_papers(papers_dir: Path):
    if not papers_dir.exists():
        raise FileNotFoundError(f"Papers directory not found: {papers_dir}")
    return sorted(p for p in papers_dir.iterdir() if p.suffix.lower() == ".pdf")


def read_doi_file(path, num_papers):
    if path is None:
        return [""] * num_papers
    lines = [ln.strip() for ln in open(path, encoding="utf-8") if ln.strip()]
    if len(lines) != num_papers:
        raise ValueError(f"DOI file contains {len(lines)} entries, but {num_papers} PDFs were found.")
    return lines


def load_prompts(path):
    if path and Path(path).exists():
        with open(path, "rb") as fh:
            return pickle.load(fh)
    return DEFAULT_PROMPT


def main() -> None:
    args = parse_args()
    papers_dir = Path(args.papers_dir)
    vd_dir = Path(args.vd_dir)
    vd_dir.mkdir(parents=True, exist_ok=True)

    papers = list_papers(papers_dir)
    doi_links = read_doi_file(args.doi_file, len(papers))
    prompts = load_prompts(args.prompts_path)
    models_cfg = load_models_config(args.models_config)

    if args.text_encoder_config == "tiny":
        from multimodal_colpali_tpu.models.configs import BertConfig
        embeddings = BgeEmbeddings(cfg=BertConfig.tiny())
    else:
        embeddings = BgeEmbeddings(model_name=EMBED_MODEL_ID)
    tokenizer = embeddings.tokenizer

    processed_multi, processed_text = pdf_loader(
        papers=[str(p) for p in papers],
        doi_links=doi_links,
        filenames=[p.name for p in papers],
        vd_dir=str(vd_dir),
        vd_tokenizer=tokenizer,
    )

    if args.skip_summaries:
        model_outputs = {m["model_short"]: processed_multi for m in models_cfg}
    else:
        model_outputs = run_sync(api.process_models(
            processed_multi, prompts, models_cfg, base_url=args.base_url))
    model_outputs["text_only"] = processed_text

    client = VectorClient(path=str(vd_dir / "storage"))

    emb_dim = embeddings.cfg.hidden_size  # EMB_DIM (768) for bge-base
    text_loaded = False
    for model_cfg in models_cfg:
        if not text_loaded:
            api.qdrant_process(model_outputs["text_only"], client,
                               model_cfg["text_vd"], emb_dim, embeddings)
            text_loaded = True
        api.qdrant_process(model_outputs[model_cfg["model_short"]], client,
                           model_cfg["mm_vd"], emb_dim, embeddings)

    # Page rasters + ColPali collections.
    page_cache = vd_dir / "pg_images"
    saved = convert_pdfs_to_images([str(p) for p in papers], str(vd_dir), dpi=args.dpi)

    from PIL import Image
    dataset = []
    for paper in papers:
        stem = paper.stem
        for page_no, png in enumerate(saved[stem], start=1):
            dataset.append({
                "image": Image.open(png),
                "filename": paper.name,
                "page_no": page_no,
                "img_link": png,
            })

    for model_cfg in models_cfg:
        retriever = load_retriever(model_cfg["late_inter"],
                                   dynamic_resolution=args.dynamic_resolution)
        cfg = retriever.model.cfg
        # Probe the processor for the page-sequence length (family-agnostic).
        # Under dynamic resolution the length varies per layout, so size the
        # collection to the LONGEST layout any corpus page uses - a static
        # probe would make the store silently truncate longer multivectors.
        proc = retriever.processor
        if getattr(proc, "dynamic_resolution", False):
            seq_len = max(
                int(proc.process_images([dataset[idxs[0]]["image"]],
                                        grid=grid)["input_ids"].shape[1])
                for grid, idxs in proc.group_by_grid(
                    [d["image"] for d in dataset])
            )
        else:
            probe = proc.process_images([dataset[0]["image"]])
            seq_len = int(probe["input_ids"].shape[1])
        api.ensure_colpali_collection(
            client, model_cfg["late_inter_short"],
            vector_size=cfg.embedding_dim,
            max_tokens=((seq_len + 7) // 8) * 8,
        )
        api.colpali_qdrant(
            dataset, [str(p) for p in papers], doi_links,
            retriever, retriever.processor, client,
            model_cfg["late_inter_short"],
        )

    client.save()
    print("[done] Context creation completed.")


if __name__ == "__main__":
    main()
