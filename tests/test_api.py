"""API-surface tests: the reference-shaped functions over the TPU engine."""

import asyncio
import os
import pickle

import numpy as np
import pytest
from PIL import Image

from multimodal_colpali_tpu import api
from multimodal_colpali_tpu.documents import Document
from multimodal_colpali_tpu.models import load_retriever
from multimodal_colpali_tpu.models.text_encoder import BgeEmbeddings
from multimodal_colpali_tpu.models.configs import BertConfig
from multimodal_colpali_tpu.store import VectorClient
from multimodal_colpali_tpu.generation import run_sync
from multimodal_colpali_tpu.ingest.pdfwrite import make_sample_pdf
from tests.fake_openai import FakeOpenAIServer


@pytest.fixture(scope="module")
def retriever():
    with pytest.warns(UserWarning):
        return load_retriever("tiny-colpali")


@pytest.fixture(scope="module")
def bge():
    with pytest.warns(UserWarning):
        return BgeEmbeddings(cfg=BertConfig.tiny())


@pytest.fixture(scope="module")
def pdf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("papers")
    make_sample_pdf(str(d / "alpha.pdf"), n_pages=2, lines_per_page=4, seed=1)
    make_sample_pdf(str(d / "beta.pdf"), n_pages=3, lines_per_page=4, seed=2)
    return str(d)


def test_create_document_embeddings(retriever, pdf_dir):
    ds = api.create_document_embeddings(pdf_dir, retriever, batch_size=4)
    assert len(ds) == 5  # 2 + 3 pages
    assert ds[0]["file_name"] == "alpha.pdf" and ds[0]["page_id"] == 0
    assert ds[-1]["file_name"] == "beta.pdf" and ds[-1]["page_id"] == 2
    assert ds[0]["embedding"].ndim == 2


def test_score_results_self_retrieval(retriever, pdf_dir):
    from multimodal_colpali_tpu.ingest import convert_pdf_dir_to_images

    ds = api.create_document_embeddings(pdf_dir, retriever, batch_size=4)
    images = convert_pdf_dir_to_images(pdf_dir)
    res = api.score_results(["some query"], None, retriever, ds, images, top_k=3)
    assert len(res) == 1 and len(res[0]) == 3
    r0 = res[0][0]
    assert set(r0) == {"doc_id", "page_id", "file_name", "image", "score"}
    assert isinstance(r0["image"], Image.Image)
    # scores descending
    scores = [r["score"] for r in res[0]]
    assert scores == sorted(scores, reverse=True)


def test_colpali_index_and_retrieve(retriever, pdf_dir, tmp_path):
    from multimodal_colpali_tpu.ingest import convert_pdf_dir_to_images

    client = VectorClient()
    api.ensure_colpali_collection(client, "colpali", vector_size=8, max_tokens=16)
    images = convert_pdf_dir_to_images(pdf_dir)
    dataset = []
    for fname, pages in images.items():
        for i, img in enumerate(pages):
            dataset.append({"image": img, "filename": fname, "page_no": i + 1,
                            "img_link": f"/tmp/{fname}_{i+1:03d}.png"})
    api.colpali_qdrant(dataset, [f"{pdf_dir}/alpha.pdf", f"{pdf_dir}/beta.pdf"],
                       ["doi:a", "doi:b"], retriever, retriever.processor,
                       client, "colpali", batch_size=4)
    assert client.count("colpali").count == 5
    res = api.retrieve_colpali("glycans in biology", retriever.processor,
                               retriever, client, "", "colpali", top_k=2)
    assert len(res.points) == 2
    p = res.points[0]
    assert p.payload["type"] == "pdf_page"
    assert p.payload["document_link"] in ("doi:a", "doi:b")


def test_dense_pipeline_and_similarity_search(bge):
    client = VectorClient()
    docs = [
        Document("glycans bind lectins", {"document_name": "a.pdf", "type": "text",
                                          "page_no": 1, "document_id": "1",
                                          "document_link": "", "ref": "", "caption": "",
                                          "img_link": ""}),
        Document("the weather is sunny", {"document_name": "b.pdf", "type": "text",
                                          "page_no": 1, "document_id": "2",
                                          "document_link": "", "ref": "", "caption": "",
                                          "img_link": ""}),
    ]
    store = api.TpuVectorStore.from_documents(
        docs, bge, client, "RAG_TEXT", emb_dim=32)
    hits = store.similarity_search_with_score("glycans bind lectins", k=1)
    assert len(hits) == 1
    doc, score = hits[0]
    assert doc.page_content == "glycans bind lectins"
    assert doc.metadata["document_name"] == "a.pdf"
    assert score == pytest.approx(1.0, abs=5e-2)


def test_prompt_prep_and_img_summary():
    docs = [
        Document("text chunk", {"type": "text", "img_link": ""}),
        Document("", {"type": "image", "img_link": "/nonexistent.png"}),
    ]
    # make a real image for encoding
    import tempfile
    img = Image.fromarray(np.zeros((8, 8, 3), np.uint8))
    f = tempfile.NamedTemporaryFile(suffix=".png", delete=False)
    img.save(f.name)
    docs[1].metadata["img_link"] = f.name

    prompts = {"img_summary": "describe image", "text_summary": "summarize"}
    msgs = api.prompt_prep(docs, prompts["img_summary"], prompts["text_summary"])
    assert msgs[0][0]["content"][0]["text"] == "summarizetext chunk"
    assert msgs[1][0]["content"][1]["type"] == "image_url"

    with FakeOpenAIServer(lambda req: "an image of glycans") as srv:
        out = run_sync(api.get_img_summary(docs, prompts, "gemma", 0, "",
                                           base_url=srv.base_url))
    assert out[0].page_content == "text chunk"  # untouched
    assert out[1].page_content == "an image of glycans"  # replaced
    assert docs[1].page_content == ""  # deepcopy: original untouched


def test_process_models_dict(tmp_path):
    docs = [Document("t", {"type": "text", "img_link": ""})]
    with FakeOpenAIServer(lambda req: "x") as srv:
        out = run_sync(api.process_models(
            docs, {"img_summary": "i", "text_summary": "t"},
            [{"model_name": "m", "model_short": "m1", "port": 1}],
            base_url=srv.base_url))
    assert set(out) == {"orig_model", "m1"}


def test_multiuser_management(retriever, pdf_dir, tmp_path):
    client = VectorClient()
    api.ensure_colpali_collection(client, "colpali", vector_size=8, max_tokens=16)
    from multimodal_colpali_tpu.ingest import convert_pdf_dir_to_images
    images = convert_pdf_dir_to_images(pdf_dir)
    dataset = [{"image": images["alpha.pdf"][0], "filename": "alpha.pdf",
                "page_no": 1, "img_link": ""}]
    api.colpali_qdrant(dataset, ["alpha.pdf"], ["doi:a"], retriever, None,
                       client, "colpali", username="base")
    # clone for a new user
    api.update_vd_new_user(client, "alice", ["colpali"])
    dt, links, dois = api.get_vd_elements_colpali(client, "alice", "colpali", pdf_dir)
    assert dt == ["alpha.pdf"]
    assert dois == ["doi:a"]
    assert links and links[0].endswith("alpha.pdf")
    # delete alice's paper
    api.delete_papers("alice", [], ["colpali"], str(tmp_path), ["alpha.pdf"], client)
    dt2, _, _ = api.get_vd_elements_colpali(client, "alice", "colpali", pdf_dir)
    assert dt2 == []
    # base user unaffected
    dt3, _, _ = api.get_vd_elements_colpali(client, "base", "colpali", pdf_dir)
    assert dt3 == ["alpha.pdf"]


def test_tarfile_roundtrip(tmp_path):
    src = tmp_path / "data"
    src.mkdir()
    (src / "x.txt").write_text("hello")
    tar = str(tmp_path / "snap.tar.gz")
    api.make_tarfile(tar, str(src))
    out = tmp_path / "restore"
    api.setup_initial_vector_db(tar, str(out))
    assert (out / "data" / "x.txt").read_text() == "hello"


def test_models_local_against_fake_server():
    import json
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    import threading

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            data = json.dumps({"data": [{"id": "gemma-3-27b-it"}]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        os.environ["API_URL"] = f"http://127.0.0.1:{srv.server_port}/v1"
        out = api.models_local([srv.server_port])
        assert out[0]["model_id"] == "gemma-3-27b-it"
        used = api.models_used([srv.server_port], ["gpt-5"], "RAG_TEXT", ["mm1", "mm2"])
        assert [m["model_id"] for m in used] == ["gemma-3-27b-it", "gpt-5"]
        assert used[0]["vd_MM"] == "mm1"
    finally:
        del os.environ["API_URL"]
        srv.shutdown()


def _meta(name, typ, username="u1", content_img=""):
    return {"document_name": name, "type": typ, "page_no": 1,
            "document_id": name, "document_link": "", "ref": "", "caption": "",
            "img_link": content_img, "username": username}


def test_prompt_prep_query_mm_rag_and_no_rag(bge, tmp_path):
    """prompt_prep_query (reference functions.py:1479-1557): mm_RAG builds
    per-hit prompts from filtered dense retrieval; join_context merges; ''
    yields an empty context."""
    from PIL import Image as PILImage

    img_path = str(tmp_path / "fig.png")
    PILImage.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_path)
    client = VectorClient()
    docs = [
        Document("glycans bind lectins", _meta("a.pdf", "text")),
        Document("", _meta("a.pdf", "image", content_img=img_path)),
        Document("other user's doc", _meta("c.pdf", "text", username="u2")),
    ]
    api.TpuVectorStore.from_documents(docs, bge, client, "mm_vd", emb_dim=32)

    out = api.prompt_prep_query("what binds lectins?", "Answer: {query}",
                                client, "u1", "mm_vd", bge, top_k=3,
                                type="mm_RAG")
    assert len(out["context"]) == 2  # u2's doc filtered out
    assert len(out["q_prompts"]) == 2
    kinds = {c["type"] for p in out["q_prompts"] for c in p[0]["content"]}
    assert "image_url" in kinds and "text" in kinds

    joined = api.prompt_prep_query("q?", "Answer: {query}", client, "u1",
                                   "mm_vd", bge, top_k=3, type="mm_RAG",
                                   join_context=True)
    assert joined["q_prompts"][0]["role"] == "user"  # one merged prompt

    none = api.prompt_prep_query("q?", "Answer: {query}", client, "u1",
                                 "mm_vd", bge, top_k=3, type="")
    assert none["context"] == [] and none["q_prompts"] == []


def test_prompt_prep_query_colpali(retriever, pdf_dir, tmp_path):
    """prompt_prep_query type=colpali goes through retrieve_colpali and
    emits one image prompt per retrieved page."""
    from PIL import Image as PILImage

    img_path = str(tmp_path / "pg.png")
    PILImage.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_path)
    client = VectorClient()
    api.ensure_colpali_collection(client, "cp_vd", vector_size=8, max_tokens=16)
    from multimodal_colpali_tpu.ingest import convert_pdf_dir_to_images as c2i
    images = c2i(pdf_dir)
    dataset = [{"image": img, "filename": fname, "page_no": i + 1,
                "img_link": img_path}
               for fname, pages in images.items()
               for i, img in enumerate(pages)]
    api.colpali_qdrant(dataset, [f"{pdf_dir}/alpha.pdf", f"{pdf_dir}/beta.pdf"],
                       ["doi:a", "doi:b"], retriever, retriever.processor,
                       client, "cp_vd", batch_size=4, username="u1")
    out = api.prompt_prep_query("glycans", "Q: {query}", client, "u1",
                                "cp_vd", None, top_k=2, type="colpali",
                                cp_model=retriever, cp_processor=retriever.processor)
    assert len(out["q_prompts"]) == 2
    assert out["q_prompts"][0][0]["content"][1]["type"] == "image_url"


def test_prompt_prep_query_emb_and_query1(bge, tmp_path):
    """prompt_prep_query_emb consumes a precomputed dense embedding
    (functions.py:1559-1610); prompt_prep_query1 degrades to empty context
    on store errors (functions.py:1612-1665)."""
    client = VectorClient()
    docs = [Document("glycans bind lectins", _meta("a.pdf", "text"))]
    api.TpuVectorStore.from_documents(docs, bge, client, "text_vd", emb_dim=32)
    prompts = {"rag_summary_query": "IMG {query}",
               "text_summary_query": "TXT {query}"}

    qv = bge.embed_query("glycans bind lectins")
    out = api.prompt_prep_query_emb("glycans?", prompts, client, "u1",
                                    "text_vd", qv, top_k=1, type="mm_RAG")
    assert len(out["q_prompts"]) == 1
    assert out["q_prompts"][0][0]["content"][0]["text"].startswith("TXT")

    none = api.prompt_prep_query_emb("q?", prompts, client, "u1", "text_vd",
                                     qv, top_k=1, type="")
    assert none["context"] == ""

    ok = api.prompt_prep_query1("glycans?", "P: {query}", "u1", "text_vd",
                                bge, 1, "text_vd", qdrant_client=client)
    assert len(ok["q_prompts"]) == 1
    # missing collection degrades exactly like the reference (empty context)
    bad = api.prompt_prep_query1("q?", "P: {query}", "u1", "nope", bge, 1,
                                 "mm_vd", qdrant_client=client)
    assert bad["context"] == [] and bad["q_prompts"] == []


def test_modify_orig_and_show_results(capsys):
    docs = [Document("t", _meta("a.pdf", "text")),
            Document("", _meta("a.pdf", "image"))]
    out = api.modify_orig(docs, ["ignored", "summary!"])
    assert out[0].page_content == "t" and out[1].page_content == "summary!"

    shown = api.show_results([(docs[0], 0.9)])
    printed = capsys.readouterr().out
    assert "Score: 0.9" in printed and "a.pdf" in printed
    assert shown == [("text", "t")]


def test_get_response_context_two_phase():
    """get_response_context summarizes each context prompt then answers the
    query over the joined summaries (functions.py:1684-1719; final request
    fixed to post a valid messages list - see the docstring deviation)."""
    from multimodal_colpali_tpu.generation.client import get_response_context
    from multimodal_colpali_tpu.generation.messages import format_msgs

    seen = []

    def answer(req):
        text = req["messages"][0]["content"][0]["text"]
        seen.append(text)
        return f"S({text[:12]})"

    ctx = [format_msgs("summarize one", [], ""),
           format_msgs("summarize two", [], "")]
    with FakeOpenAIServer(answer) as srv:
        got = run_sync(get_response_context(
            "What? ", ctx, "gemma", f"{srv.base_url}/chat/completions", {}))
    assert got.startswith("S(What? Here")
    # the final request carried both phase-1 summaries
    assert "S(summarize on" in seen[-1] and "S(summarize tw" in seen[-1]


def test_get_response_context_degrades_on_contentless_summary():
    """A 200 phase-1 response whose choices carry no message content comes
    back from post_request_with_retries as None; the two-phase ask must
    substitute the retry sentinel and still answer, not crash joining
    summaries."""
    from multimodal_colpali_tpu.generation.client import (
        ERROR_SENTINEL, get_response_context)
    from multimodal_colpali_tpu.generation.messages import format_msgs

    seen = []

    def answer(req):
        text = req["messages"][0]["content"][0]["text"]
        seen.append(text)
        if "summarize two" in text:
            return None          # server emits "content": null
        return f"S({text[:12]})"

    ctx = [format_msgs("summarize one", [], ""),
           format_msgs("summarize two", [], "")]
    with FakeOpenAIServer(answer) as srv:
        got = run_sync(get_response_context(
            "What? ", ctx, "gemma", f"{srv.base_url}/chat/completions", {}))
    assert got.startswith("S(What? Here")
    assert "S(summarize on" in seen[-1] and ERROR_SENTINEL in seen[-1]
