#!/usr/bin/env python
"""Experiment 02: generator x visual-retriever grid with in-memory MaxSim.

CLI- and artifact-compatible with the reference driver (05_experiment02.py:
53-470): same flags, same embedding cache naming
``{retriever}_pdf_emb.pkl``, same per-iteration CSV columns
``{..., Model, Model_ret, Answer, Context_papers, Cor_answer}`` and
``eval_{ret}_{model}_{ts}.csv`` naming, so the 06 aggregator runs unchanged.
Retrieval/scoring run on the TPU stack; generation stays the async OpenAI
seam with structured MCQ output and backoff.
"""

from __future__ import annotations

import argparse
import asyncio
import json
import os
import pickle
import sys
from pathlib import Path
from time import gmtime, strftime
from typing import Iterable, List, Tuple

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_colpali_tpu import api
from multimodal_colpali_tpu.generation import (
    image_context_messages as _image_parts,
    mcq_response_format,
    resolve_endpoint,
    run_sync,
)
from multimodal_colpali_tpu.models import load_retriever
from multimodal_colpali_tpu.utils.io import read_table


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description="Run Experiment 02 multi-modal evaluations.")
    p.add_argument("--qa_path", default="./data/Glycans_q_a_v5.xlsx")
    p.add_argument("--pdf_dir", default="papers_merge")
    p.add_argument("--results_dir", default="results/evals")
    p.add_argument("--cache_dir", default="data")
    p.add_argument("--models", nargs="+", default=["gpt-5", "gpt-5-mini", "gpt-5-nano"])
    p.add_argument("--retrievers", nargs="+", default=[
        "vidore/colpali-v1.3-merged",
    ])
    p.add_argument("--iterations", type=int, default=5)
    p.add_argument("--top_k", type=int, default=5)
    p.add_argument("--chunk", type=int, default=10)
    p.add_argument("--device", default=None,
                   help="Accepted for reference parity; placement is jax-managed.")
    p.add_argument("--context", action="store_true",
                   help="If set, enable retrieval-augmented prompting.")
    p.add_argument("--base-url", default=os.environ.get("OPENAI_BASE_URL"))
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--dynamic-resolution", action="store_true",
                   help="Per-image resolution layouts for supported families.")
    return p.parse_args()


def batched(iterable: List[str], n: int) -> Iterable[List[str]]:
    for idx in range(0, len(iterable), n):
        yield iterable[idx: idx + n]


def build_query_prompts(table_qa: pd.DataFrame) -> Tuple[List[str], List[str]]:
    """Retrieval + generation prompts (reference 05:175-197)."""
    prompts_for_retrieval, prompts_for_model = [], []
    resp_labels = ["A", "B", "C", "D"]
    for _, row in table_qa.iterrows():
        answers = [row["A"], row["B"], row["C"], row["D"]]
        question_string = "".join(
            f"{label}. {option}" for label, option in zip(resp_labels, answers)
        )
        base_prompt = (
            f"You are an experienced senior researcher tasked with providing in-depth analysis.\n"
            f"Use all the information at your disposal, such as uploaded files and other sources. "
            f"Think about the following statement or question: {row['question']}\n"
            f"Below are the possible answers, where letters mark each answer. "
            f"First, exclude the unlikely answer or answers, rethink, and select an output from the rest. "
            f"The output is only ONE letter from the list {resp_labels}. "
            f"Check that you return only one letter; if two letters, choose one. No explanations. The answers are:\n"
            f"{question_string}"
        )
        prompts_for_model.append(base_prompt)
        prompts_for_retrieval.append(f"{row['question']} The answers are: {question_string}")
    return prompts_for_retrieval, prompts_for_model


async def _completion_with_backoff(session, url, headers, body, retries=5):
    for attempt in range(retries):
        try:
            async with session.post(url, headers=headers, json=body, timeout=180) as r:
                if r.status == 429 and attempt < retries - 1:
                    await asyncio.sleep(2 ** attempt)
                    continue
                r.raise_for_status()
                data = await r.json()
                content = data["choices"][0]["message"]["content"]
                try:
                    return json.loads(content)
                except (json.JSONDecodeError, TypeError):
                    return {"answer": str(content).strip()[:1]}
        except Exception:
            if attempt == retries - 1:
                raise
            await asyncio.sleep(2 ** attempt)


async def send_to_model_async(
    gpt_model, qa_table, enable_context, topk, chunk,
    processor, model, dataset, images_per_pdf, base_url=None,
):
    """Async evaluation loop for one model/retriever pair (reference 05:252-301)."""
    import aiohttp

    retrieval_prompts, model_prompts = build_query_prompts(qa_table)
    info_res: List[List[str]] = []
    prompt_messages: List[List[dict]] = []

    if enable_context:
        retrieved_results = []
        for batch in batched(retrieval_prompts, chunk):
            retrieved_results.extend(
                api.score_results(batch, processor, model, dataset, images_per_pdf, topk)
            )
        for base_prompt, retrieved in zip(model_prompts, retrieved_results):
            info_res.append([
                f"{e['file_name'].split('.')[0]}_pg_{e['page_id']}" for e in retrieved
            ])
            images = [e["image"] for e in retrieved]
            content = ([{"type": "text", "text": base_prompt},
                        {"type": "text", "text": "Context information:"}]
                       + _image_parts(images))
            prompt_messages.append([{"role": "user", "content": content}])
    else:
        info_res = [[] for _ in model_prompts]
        prompt_messages = [
            [{"role": "user", "content": [{"type": "text", "text": p}]}]
            for p in model_prompts
        ]

    url, headers = resolve_endpoint(gpt_model, base_url=base_url)
    body_extra = {"response_format": mcq_response_format()}
    conn = aiohttp.TCPConnector(limit=64)
    async with aiohttp.ClientSession(connector=conn) as session:
        tasks = [
            _completion_with_backoff(session, url, headers,
                                     {"model": gpt_model, "messages": msg, **body_extra})
            for msg in prompt_messages
        ]
        completions = await asyncio.gather(*tasks)
    answers = [c["answer"] for c in completions]
    return answers, info_res


def eval_fn(model_name, retriever_name, qa_data, iterations, topk, chunk,
            results_dir: Path, cache_dir: Path, pdf_dir: Path,
            enable_context: bool, base_url=None,
            dynamic_resolution: bool = False):
    """Iterate evaluations for one generator/retriever pair (reference 05:375-434)."""
    retriever = load_retriever(retriever_name,
                               dynamic_resolution=dynamic_resolution)

    # dynamic-resolution runs cache separately (the default filename stays
    # byte-compatible with the reference's {retriever}_pdf_emb.pkl naming)
    suffix = "_dynres" if dynamic_resolution else ""
    cache_path = cache_dir / (
        f"{retriever_name.replace('/', '_')}_pdf_emb{suffix}.pkl")
    if cache_path.exists():
        with cache_path.open("rb") as fp:
            dataset = pickle.load(fp)
    else:
        # Overlapped rasterize/preprocess/forward pipeline keeps the chip fed
        # (same entry schema as api.create_document_embeddings).
        from multimodal_colpali_tpu.ingest.pipeline import PipelinedEmbedder

        dataset = PipelinedEmbedder(retriever, batch_size=32).embed_pdf_dir(str(pdf_dir))
        with cache_path.open("wb") as fp:
            pickle.dump(dataset, fp)

    from multimodal_colpali_tpu.ingest import convert_pdf_dir_to_images
    images_per_pdf = convert_pdf_dir_to_images(str(pdf_dir))

    for iteration in range(iterations):
        print(
            f"Processing iteration {iteration + 1}/{iterations} for "
            f"model {model_name} with retriever {retriever_name}."
        )
        answers, context_info = run_sync(send_to_model_async(
            model_name, qa_data, enable_context, topk, chunk,
            retriever.processor, retriever, dataset, images_per_pdf,
            base_url=base_url,
        ))
        eval_frame = qa_data.copy()
        eval_frame["Model"] = model_name
        eval_frame["Model_ret"] = retriever_name
        eval_frame["Answer"] = answers
        eval_frame["Context_papers"] = [str(ci) for ci in context_info]
        eval_frame["Cor_answer"] = (eval_frame["Answer"] == eval_frame["Correct"]).astype(int)

        output_name = (
            f"eval_{retriever_name.split('/')[-1].split('-')[0]}_{model_name}_"
            f"{strftime('%Y%m%d%H%M%S', gmtime())}.csv"
        )
        eval_path = results_dir / output_name
        # The reference's second-resolution timestamps collide when an
        # iteration finishes in under a second; disambiguate instead of
        # silently overwriting the previous iteration's results.
        k = 1
        while eval_path.exists():
            eval_path = results_dir / output_name.replace(".csv", f"_{k}.csv")
            k += 1
        eval_frame.to_csv(eval_path, index=False)
        print(f"Saved results to {eval_path} | Accuracy: {eval_frame['Cor_answer'].mean():.3f}")


def main() -> None:
    args = parse_args()
    pdf_dir, results_dir, cache_dir = Path(args.pdf_dir), Path(args.results_dir), Path(args.cache_dir)
    for d in (pdf_dir, results_dir, cache_dir):
        d.mkdir(parents=True, exist_ok=True)

    qa_data = read_table(args.qa_path).sample(frac=1, random_state=args.seed).reset_index(drop=True)

    for generator_model in args.models:
        for retriever_model in args.retrievers:
            eval_fn(generator_model, retriever_model, qa_data, args.iterations,
                    args.top_k, args.chunk, results_dir, cache_dir, pdf_dir,
                    args.context, base_url=args.base_url,
                    dynamic_resolution=args.dynamic_resolution)


if __name__ == "__main__":
    main()
