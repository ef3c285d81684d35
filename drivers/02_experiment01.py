#!/usr/bin/env python
"""Experiment 01: single evaluation run (one model x one RAG mode).

CLI- and artifact-compatible with the reference driver
(02_experiment01.py:58-344): same flags, same output pickle schema
``{model, evaluation, elapsed_time, timestamp, permuted_answers}`` with the
``_{timestamp}[_perm_q].pkl`` naming, so the 04 aggregator runs unchanged.
Retrieval runs on the TPU stack (in-process VectorClient + JAX encoders)
instead of Qdrant+torch.
"""

from __future__ import annotations

import argparse
import asyncio
import os
import pickle
import random
import sys
from pathlib import Path
from time import time

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_colpali_tpu import api
from multimodal_colpali_tpu.generation import (
    build_instruction_block,
    build_reference_from_metadata,
    encode_image_to_data_url,
    mcq_response_format,
    resolve_endpoint,
    response_real_out,
    run_sync,
)
from multimodal_colpali_tpu.models import load_retriever
from multimodal_colpali_tpu.models.text_encoder import BgeEmbeddings
from multimodal_colpali_tpu.store import VectorClient
from multimodal_colpali_tpu.utils.io import read_table

DEFAULT_TOP_K = 5
BENCHMARK_PATH = Path("./data/Glycans_q_a_v5.xlsx")


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Run Experiment 01 evaluation for a single model/RAG mode."
    )
    parser.add_argument("--vllm_port", type=int, required=True,
                        help="Port of the vLLM server (ignored for GPT models).")
    parser.add_argument("--model_name", required=True, help="Model identifier.")
    parser.add_argument("--filepath_output", required=True,
                        help="Prefix for the pickle output (timestamp appended).")
    parser.add_argument("--vector_db", default="",
                        help="Collection used for retrieval (if applicable).")
    parser.add_argument("--type", default="", choices=["", "mm_RAG", "colpali"],
                        help="Retrieval type: '' (no RAG), 'mm_RAG', or 'colpali'.")
    parser.add_argument("--perm_quest", default="No",
                        help="Set to 'Yes' to permute answer order per question.")
    parser.add_argument("--top_k", type=int, default=DEFAULT_TOP_K)
    parser.add_argument("--qa_path", default=str(BENCHMARK_PATH))
    parser.add_argument("--storage-path", default=os.environ.get("VD_DIR", "./src/vectordb"),
                        help="VectorClient persistence directory.")
    parser.add_argument("--retriever", default="vidore/colpali-v1.3-hf",
                        help="Late-interaction retriever checkpoint name.")
    parser.add_argument("--base-url", default=os.environ.get("OPENAI_BASE_URL"),
                        help="Override generation endpoint (e.g. a local fake).")
    parser.add_argument("--seed", type=int, default=None,
                        help="Seed question shuffling/permutations (reference is unseeded).")
    parser.add_argument("--dynamic-resolution", action="store_true",
                        help="Per-image resolution layouts for supported families.")
    parser.add_argument("--text-encoder-config", default="bge-base",
                        choices=["bge-base", "tiny"],
                        help="Dense text encoder size for mm_RAG/text_RAG mode.")
    return parser.parse_args()


def load_questions(path: Path, seed=None) -> pd.DataFrame:
    df = read_table(str(path))
    return df.sample(frac=1, random_state=seed).reset_index(drop=True)


def should_permute(flag: str) -> bool:
    return flag.lower() in {"yes", "true", "1"}


class RetrievalManager:
    """Retrieval for the Experiment-01 RAG modes (reference 02:93-165),
    rebuilt on the in-process TPU stores."""

    def __init__(self, retrieval_type: str, vector_db: str, top_k: int,
                 storage_path: str, retriever_name: str,
                 text_encoder_config: str = "bge-base",
                 dynamic_resolution: bool = False):
        self.retrieval_type = retrieval_type
        self.vector_db = vector_db
        self.top_k = top_k
        self.client = None
        self.vector_store = None
        self.colpali = None

        if retrieval_type and vector_db:
            self.client = VectorClient(path=storage_path)
        if retrieval_type == "mm_RAG" and vector_db:
            if text_encoder_config == "tiny":
                from multimodal_colpali_tpu.models.configs import BertConfig
                emb = BgeEmbeddings(cfg=BertConfig.tiny())
            else:
                emb = BgeEmbeddings()
            self.vector_store = api.TpuVectorStore(self.client, vector_db, emb)
        elif retrieval_type == "colpali" and vector_db:
            self.colpali = load_retriever(
                retriever_name, dynamic_resolution=dynamic_resolution)

    def fetch(self, query: str):
        if self.retrieval_type == "" or self.top_k <= 0:
            return []
        if self.retrieval_type == "mm_RAG" and self.vector_store is not None:
            docs = self.vector_store.similarity_search_with_score(query, self.top_k)
            from multimodal_colpali_tpu.generation import document_to_context_entry
            return [document_to_context_entry(doc, score) for doc, score in docs]
        if self.retrieval_type == "colpali" and self.colpali is not None:
            result = api.retrieve_colpali(
                query, self.colpali.processor, self.colpali, self.client,
                "", self.vector_db, self.top_k,
            )
            entries = []
            for point in result.points:
                payload = point.payload or {}
                metadata = payload.get("metadata", payload)
                entries.append({
                    "type": "image",
                    "text": "",
                    "image_path": metadata.get("img_link"),
                    "reference": build_reference_from_metadata(metadata),
                    "score": point.score,
                })
            return entries
        return []


def build_messages(question: str, answers, contexts):
    """Prompt assembly + reference labels (reference 02:168-188)."""
    instruction = build_instruction_block(question, answers)
    content = [{"type": "text", "text": instruction}]
    references = []
    for ctx in contexts:
        reference = ctx.get("reference", "context")
        if ctx.get("image_path") and ctx["type"] == "image":
            data_url = encode_image_to_data_url(ctx["image_path"])
            if data_url:
                content.append({"type": "image_url", "image_url": {"url": data_url}})
                references.append(reference)
        if ctx.get("text"):
            snippet = ctx["text"].strip()
            if snippet:
                content.append({"type": "text", "text": f"[{reference}] {snippet}"})
                if reference not in references:
                    references.append(reference)
    return [{"role": "user", "content": content}], references


def prepare_requests(qa_table: pd.DataFrame, retrieval: RetrievalManager,
                     permute_answers: bool, rng: random.Random):
    messages_list, records = [], []
    for _, row in qa_table.iterrows():
        answers = [row["A"], row["B"], row["C"], row["D"]]
        perm_idx = rng.sample(range(4), 4) if permute_answers else list(range(4))
        shuffled = [answers[i] for i in perm_idx]
        contexts = retrieval.fetch(row["question"])
        messages, refs = build_messages(row["question"], shuffled, contexts)
        messages_list.append(messages)
        records.append({
            "Question_nr": row["Question_nr"],
            "question": row["question"],
            "quest_order": perm_idx,
            "context_refs": refs,
        })
    return messages_list, records


async def run_inference_raw(model_name, messages_list, url, headers, use_schema):
    import aiohttp

    connector = aiohttp.TCPConnector(limit=256)
    payloads = []
    for messages in messages_list:
        body = {"model": model_name, "messages": messages}
        if use_schema:
            body["response_format"] = mcq_response_format()
        payloads.append(body)
    async with aiohttp.ClientSession(connector=connector) as session:
        return await asyncio.gather(*[
            _json_request(session, url, headers, body) for body in payloads
        ])


async def _json_request(session, url, headers, body, retries=4, backoff=1.0):
    import aiohttp
    for attempt in range(retries):
        try:
            async with session.post(url, headers=headers, json=body, timeout=120) as r:
                if r.status == 200:
                    return await r.json()
                text = await r.text()
                raise RuntimeError(f"HTTP {r.status}: {text}")
        except Exception:
            if attempt < retries - 1:
                await asyncio.sleep(backoff * (2 ** attempt))
            else:
                raise


def extract_answer_text(response_payload: dict) -> str:
    choices = response_payload.get("choices", [])
    if not choices:
        return ""
    content = choices[0].get("message", {}).get("content")
    if isinstance(content, str):
        return content
    if isinstance(content, list):
        return "".join(p.get("text", "") for p in content if isinstance(p, dict))
    return ""


def main() -> None:
    args = parse_args()
    rng = random.Random(args.seed)
    qa_table = load_questions(Path(args.qa_path), seed=args.seed)
    permute_answers = should_permute(args.perm_quest)
    retrieval = RetrievalManager(args.type, args.vector_db, args.top_k,
                                 args.storage_path, args.retriever,
                                 text_encoder_config=args.text_encoder_config,
                                 dynamic_resolution=args.dynamic_resolution)
    messages_list, records = prepare_requests(qa_table, retrieval, permute_answers, rng)

    if args.base_url:
        url, headers = resolve_endpoint(args.model_name, args.vllm_port, args.base_url)
        use_schema = args.model_name.startswith("gpt")
    elif args.model_name.startswith("gpt"):
        url = "https://api.openai.com/v1/chat/completions"
        headers = {"Authorization": f"Bearer {os.environ['OPENAI_API_KEY']}",
                   "Content-Type": "application/json"}
        use_schema = True
    else:
        url = f"http://localhost:{args.vllm_port}/v1/chat/completions"
        headers = {"Authorization": f"Bearer {os.environ.get('VLLM_API_KEY', 'EMPTY')}",
                   "Content-Type": "application/json"}
        use_schema = False

    t_start = time()
    responses = run_sync(run_inference_raw(
        args.model_name, messages_list, url, headers, use_schema))

    out_list = []
    for record, raw in zip(records, responses):
        parsed = extract_answer_text(raw)
        filt_resp, answer_letter = response_real_out(parsed, record["quest_order"])
        out_list.append({
            **record,
            "answer": answer_letter,
            "resp_init": (parsed or "")[:50],
            "filt_resp": filt_resp,
        })

    timestamp = pd.Timestamp("now", tz="CET").strftime("%Y%m%d-%H%M%S")
    suffix = "_perm_q" if permute_answers else ""
    eval_results = {
        "model": args.model_name,
        "evaluation": sorted(out_list, key=lambda x: x["Question_nr"]),
        "elapsed_time": time() - t_start,
        "timestamp": timestamp,
        "permuted_answers": permute_answers,
    }
    output_path = Path(f"{args.filepath_output}_{timestamp}{suffix}.pkl")
    output_path.parent.mkdir(parents=True, exist_ok=True)
    with output_path.open("wb") as fh:
        pickle.dump(eval_results, fh)
    print(f"Saved evaluation results to {output_path}")


if __name__ == "__main__":
    main()
