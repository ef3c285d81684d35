"""End-to-end driver pipeline test.

Runs the real CLI drivers as subprocesses over a synthetic corpus with the
tiny retriever and the in-process fake OpenAI server:

  01 ingest -> 02 eval (no_RAG + colpali) -> 04 aggregate
  05 grid eval -> 06 aggregate

Asserts the artifact formats the reference aggregators rely on.
"""

import json
import os
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

from multimodal_colpali_tpu.ingest.pdfwrite import make_sample_pdf
from tests.fake_openai import FakeOpenAIServer

REPO = Path(__file__).resolve().parent.parent
DRIVERS = REPO / "drivers"


def _env(base_url):
    env = dict(os.environ)
    env["OPENAI_BASE_URL"] = base_url
    env["OPENAI_API_KEY"] = "test-key"
    env["JAX_PLATFORMS"] = "cpu"
    env["MMCP_JAX_PLATFORMS"] = "cpu"  # the sitecustomize ignores JAX_PLATFORMS
    env["PYTHONPATH"] = f"{REPO}:{env.get('PYTHONPATH', '')}"
    return env


def _run(cmd, env):
    r = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=420)
    assert r.returncode == 0, f"{cmd}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-2000:]}"
    return r


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("e2e")
    papers = ws / "papers"
    papers.mkdir()
    for i, name in enumerate(["Paper01", "Paper02"]):
        make_sample_pdf(str(papers / f"{name}.pdf"), n_pages=2, lines_per_page=5, seed=i)
    # benchmark with the placeholder schema (benchmark_placeholder.csv)
    bench = pd.DataFrame({
        "Question_nr": [1, 2, 3],
        "Paper_id": ["Paper01", "Paper02", "Paper01"],
        "Nr_data_suppl": [0, 0, 0],
        "doi": ["d1", "d2", "d1"],
        "title": ["t1", "t2", "t1"],
        "question": ["What binds selectins?", "What is page two about?", "Name a glycan."],
        "A": ["sialyl-Lewis-x", "glycans", "chitin"],
        "B": ["starch", "metals", "sialic acid"],
        "C": ["iron", "planets", "iron"],
        "D": ["nothing", "nothing", "starch"],
        "Correct": ["A", "A", "B"],
        "Difficulty": ["Easy", "Medium", "Hard"],
    })
    bench.to_csv(ws / "benchmark.csv", index=False)
    models_cfg = [{
        "model_name": "fake-gemma", "model_short": "gemma3", "port": 1,
        "text_vd": "RAG_TEXT", "mm_vd": "RAG_MM_gemma3",
        "late_inter": "tiny-colpali", "late_inter_short": "colpali",
    }]
    (ws / "models.json").write_text(json.dumps(models_cfg))
    return ws


@pytest.mark.e2e
def test_full_pipeline(workspace):
    ws = workspace
    with FakeOpenAIServer(lambda req: json.dumps({"answer": "A"})
                          if req.get("response_format") else "A") as srv:
        env = _env(srv.base_url)
        # 01: ingest + index
        _run([sys.executable, str(DRIVERS / "01_create_context.py"),
              "--papers-dir", str(ws / "papers"),
              "--vd-dir", str(ws / "vd"),
              "--models-config", str(ws / "models.json"),
              "--prompts-path", "",
              "--text-encoder-config", "tiny"], env)
        storage = ws / "vd" / "storage"
        assert (storage / "RAG_TEXT" / "meta.json").exists()
        assert (storage / "colpali" / "meta.json").exists()
        assert sorted(os.listdir(ws / "vd" / "pg_images")) == [
            "Paper01_001.png", "Paper01_002.png", "Paper02_001.png", "Paper02_002.png",
        ]

        # 02: one run per mode (no_RAG + colpali)
        results = ws / "results" / "eval"
        results.mkdir(parents=True)
        for label, vdb, typ in [("no_RAG", "", ""), ("colpali", "colpali", "colpali"),
                                ("text_RAG", "RAG_TEXT", "mm_RAG")]:
            _run([sys.executable, str(DRIVERS / "02_experiment01.py"),
                  "--vllm_port", "1", "--model_name", "gpt-5",
                  "--filepath_output", str(results / f"eval_gpt5_{label}_no_perm_benchmark"),
                  "--vector_db", vdb, "--type", typ,
                  "--qa_path", str(ws / "benchmark.csv"),
                  "--storage-path", str(storage),
                  "--retriever", "tiny-colpali",
                  "--text-encoder-config", "tiny",
                  "--base-url", srv.base_url, "--seed", "0"], env)
        pkls = sorted(results.glob("*.pkl"))
        assert len(pkls) == 3
        blob = pickle.load(open(pkls[0], "rb"))
        assert set(blob) == {"model", "evaluation", "elapsed_time", "timestamp",
                             "permuted_answers"}
        assert {r["Question_nr"] for r in blob["evaluation"]} == {1, 2, 3}
        assert all(r["answer"] == "A" for r in blob["evaluation"])

        # 04: aggregate
        _run([sys.executable, str(DRIVERS / "04_experiment01_eval.py"),
              "--eval-dir", str(results),
              "--benchmark-path", str(ws / "benchmark.csv"),
              "--summary-path", str(ws / "results" / "eval_results.xlsx"),
              "--majority-path", str(ws / "results" / "eval_maj_results.xlsx"),
              "--full-path", str(ws / "results" / "eval_full_results.xlsx")], env)
        summary = pd.read_csv(ws / "results" / "eval_results.csv")
        assert {"Easy", "Medium", "Hard"} <= set(summary.columns)
        maj = pd.read_csv(ws / "results" / "eval_maj_results.csv")
        # model answered A everywhere; Q1/Q2 correct, Q3 wrong -> maj 2/3
        assert maj["Maj_vote"].iloc[0] == pytest.approx(2 / 3)

        # 05: exp02 grid with context
        _run([sys.executable, str(DRIVERS / "05_experiment02.py"),
              "--qa_path", str(ws / "benchmark.csv"),
              "--pdf_dir", str(ws / "papers"),
              "--results_dir", str(ws / "results" / "evals"),
              "--cache_dir", str(ws / "cache"),
              "--models", "gpt-5",
              "--retrievers", "tiny-colpali",
              "--iterations", "2", "--top_k", "2", "--context",
              "--base-url", srv.base_url, "--seed", "0"], env)
        csvs = sorted((ws / "results" / "evals").glob("eval_*.csv"))
        assert len(csvs) == 2  # two iterations
        df = pd.read_csv(csvs[0])
        assert {"Model", "Model_ret", "Answer", "Context_papers", "Cor_answer"} <= set(df.columns)
        refs = eval(df["Context_papers"].iloc[0])
        assert all("_pg_" in r for r in refs)
        # embedding cache created and reused
        assert (ws / "cache" / "tiny-colpali_pdf_emb.pkl").exists()

        # 06: aggregate
        _run([sys.executable, str(DRIVERS / "06_experiment02_eval.py"),
              "--results_dir", str(ws / "results" / "evals"),
              "--output", str(ws / "results" / "summary.xlsx"),
              "--models", "gpt-5", "--retrievers", "tiny-colpali"], env)
        summary2 = pd.read_csv(ws / "results" / "summary.csv")
        assert "Cor_answer_summary" in summary2.columns
        assert "is_paper_id_in_context_summary" in summary2.columns
        assert "(SD=" in str(summary2["Cor_answer_summary"].iloc[0])


def test_sweep_matrix_stub_matches_aggregator_regex():
    """Driver 03's run matrix and filename stubs must stay consumable by
    driver 04's filename parser (the artifact contract between them)."""
    import argparse
    import importlib.util

    def load(name):
        spec = importlib.util.spec_from_file_location(name, DRIVERS / f"{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[name] = mod  # dataclasses resolves cls.__module__ here
        spec.loader.exec_module(mod)
        return mod

    d03 = load("03_experiment01_run")
    d04 = load("04_experiment01_eval")

    args = argparse.Namespace(
        vd_text_name="RAG_TEXT", vd_mm_name="RAG_MM", vd_colpali_name="colpali",
        repeats=2, top_k=5)
    matrix = d03.build_matrix(args)
    # 2 perms x 2 repeats x 4 modes, every mode covered in both perm settings
    assert len(matrix) == 16
    assert {(s.mode, s.eval_type) for s in matrix} == {
        ("no_RAG", ""), ("text_RAG", "mm_RAG"), ("mm_RAG", "mm_RAG"),
        ("colpali", "colpali")}
    assert {(s.permute, s.repeat) for s in matrix} == {
        (p, r) for p in (True, False) for r in (1, 2)}
    for spec in matrix:
        stem = spec.output_stub("gpt5").name + "_20260816-120000"
        m = d04.RUN_STEM.match(stem)
        assert m, stem
        assert m["vd_name"] == spec.mode
        assert m["perm_flag"] == spec.perm_label


def _wait_for_serve(proc, timeout=180):
    """Wait for driver 07's startup line; surface its output if it dies."""
    import time

    deadline = time.time() + timeout
    while time.time() < deadline:
        line = proc.stdout.readline()
        if "[serve]" in line:
            return line.split(" on ")[1].split()[0]
        if line == "" and proc.poll() is not None:
            break
        if line == "":
            time.sleep(0.1)
    rest = proc.stdout.read() if proc.poll() is not None else ""
    raise AssertionError(f"serve driver did not start: {rest[-2000:]}")


def test_serve_driver_end_to_end(tmp_path):
    """Driver 07 boots the generation tier (the reference's docker/vLLM
    bootstrap role) and answers OpenAI-protocol requests."""
    import json as _json
    import time
    import urllib.request

    env = _env("http://unused")
    env.pop("OPENAI_BASE_URL")
    proc = subprocess.Popen(
        [sys.executable, str(DRIVERS / "07_serve.py"),
         "--model", "tiny-colpali", "--port", "0",  # port 0 -> auto-assign
         "--slots", "2", "--max-seq-len", "128", "--dtype", "float32"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        base = _wait_for_serve(proc)
        with urllib.request.urlopen(base.removesuffix("/v1") + "/health",
                                    timeout=10) as r:
            assert _json.load(r)["status"] == "ok"
        req = urllib.request.Request(
            base + "/chat/completions",
            data=_json.dumps({
                "model": "tiny-colpali", "max_tokens": 4,
                "messages": [{"role": "user", "content": "hi"}],
            }).encode(), headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = _json.load(r)
        assert out["object"] == "chat.completion"
        assert out["choices"][0]["message"]["content"]
        assert out["usage"]["completion_tokens"] == 4
    finally:
        proc.terminate()
        proc.wait(timeout=10)


@pytest.mark.e2e
def test_experiment01_fully_local_generation(workspace):
    """Flagship integration: experiment 01 with ZERO external services -
    driver 07 serves the framework's own engine with constrained MCQ
    structured outputs, and driver 02 evaluates against it."""
    import time
    import urllib.request

    ws = workspace
    env = _env("http://unused")
    env.pop("OPENAI_BASE_URL")
    serve = subprocess.Popen(
        [sys.executable, str(DRIVERS / "07_serve.py"),
         "--model", "tiny-colpali", "--port", "0",
         "--slots", "2", "--max-seq-len", "192", "--dtype", "float32"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        base = _wait_for_serve(serve)

        results = ws / "results" / "local_eval"
        results.mkdir(parents=True, exist_ok=True)
        _run([sys.executable, str(DRIVERS / "02_experiment01.py"),
              "--vllm_port", "1", "--model_name", "gpt-5",  # gpt* -> MCQ schema
              "--filepath_output",
              str(results / "eval_gpt5_no_RAG_no_perm_benchmark"),
              "--vector_db", "", "--type", "",
              "--qa_path", str(ws / "benchmark.csv"),
              "--retriever", "tiny-colpali",
              "--text-encoder-config", "tiny",
              "--base-url", base, "--seed", "0"], _env(base))
        pkls = sorted(results.glob("*.pkl"))
        assert len(pkls) == 1
        blob = pickle.load(open(pkls[0], "rb"))
        answers = [r["answer"] for r in blob["evaluation"]]
        assert len(answers) == 3
        assert all(a in {"A", "B", "C", "D"} for a in answers), answers
    finally:
        serve.terminate()
        serve.wait(timeout=10)


@pytest.mark.e2e
def test_experiment02_fully_local_multimodal(workspace):
    """Experiment 02 with zero external services: image-context MCQ
    requests served by the framework's own multimodal engine (driver 07),
    constrained choices conditioned on the retrieved page images."""
    import time

    ws = workspace
    env = _env("http://unused")
    env.pop("OPENAI_BASE_URL")
    serve = subprocess.Popen(
        [sys.executable, str(DRIVERS / "07_serve.py"),
         "--model", "tiny-colpali", "--port", "0",
         "--no-batcher", "--max-seq-len", "256", "--dtype", "float32"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        base = _wait_for_serve(serve)

        results = ws / "results" / "local_evals"
        _run([sys.executable, str(DRIVERS / "05_experiment02.py"),
              "--qa_path", str(ws / "benchmark.csv"),
              "--pdf_dir", str(ws / "papers"),
              "--results_dir", str(results),
              "--cache_dir", str(ws / "cache_local"),
              "--models", "gpt-5",
              "--retrievers", "tiny-colpali",
              "--iterations", "1", "--top_k", "2", "--context",
              "--base-url", base, "--seed", "0"], _env(base))
        csvs = sorted(results.glob("eval_*.csv"))
        assert len(csvs) == 1
        df = pd.read_csv(csvs[0])
        assert set(df["Answer"]) <= {"A", "B", "C", "D"}, df["Answer"]
        refs = eval(df["Context_papers"].iloc[0])
        # top_k=2: each MCQ request carried TWO context page images (the
        # reference's multi-image prompts, 05_experiment02.py:155-166) and
        # the first-party server conditioned on both
        assert len(refs) == 2 and all("_pg_" in r for r in refs)
    finally:
        serve.terminate()
        serve.wait(timeout=10)


@pytest.mark.e2e
def test_sweep_driver_end_to_end(workspace):
    """Driver 03 drives the full mode x permutation matrix through real 02
    subprocesses; 04 then aggregates every leg (incl. the no_perm runs the
    reference's greedy regex dropped)."""
    ws = workspace
    with FakeOpenAIServer(lambda req: json.dumps({"answer": "B"})
                          if req.get("response_format") else "B") as srv:
        env = _env(srv.base_url)
        # index the corpus first (independent of test_full_pipeline ordering)
        _run([sys.executable, str(DRIVERS / "01_create_context.py"),
              "--papers-dir", str(ws / "papers"),
              "--vd-dir", str(ws / "vd"),
              "--models-config", str(ws / "models.json"),
              "--prompts-path", "",
              "--text-encoder-config", "tiny"], env)
        results = ws / "results" / "eval"   # driver 03 writes ./results/eval
        r = subprocess.run(
            [sys.executable, str(DRIVERS / "03_experiment01_run.py"),
             "--vllm_port", "1", "--model_name", "gpt-5",
             "--model_name_short", "sweep",
             "--vd_mm_name", "RAG_MM_gemma3", "--vd_colpali_name", "colpali",
             "--vd_text_name", "RAG_TEXT", "--repeats", "1", "--top_k", "1",
             "--qa_path", str(ws / "benchmark.csv"),
             "--storage-path", str(ws / "vd" / "storage"),
             "--retriever", "tiny-colpali",
             "--text-encoder-config", "tiny",
             "--base-url", srv.base_url],
            env=env, cwd=str(ws), capture_output=True, text=True, timeout=900)
        assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-1000:]
        pkls = sorted(results.glob("eval_sweep_*.pkl"))
        assert len(pkls) == 8  # 4 modes x 2 permutation settings
        stems = {p.stem for p in pkls}
        for mode in ("no_RAG", "text_RAG", "mm_RAG", "colpali"):
            assert any(f"_{mode}_perm_" in s for s in stems), stems
            assert any(f"_{mode}_no_perm_" in s for s in stems), stems

        _run([sys.executable, str(DRIVERS / "04_experiment01_eval.py"),
              "--eval-dir", str(results),
              "--benchmark-path", str(ws / "benchmark.csv"),
              "--summary-path", str(ws / "results" / "sweep_results.xlsx"),
              "--majority-path", str(ws / "results" / "sweep_maj.xlsx"),
              "--full-path", str(ws / "results" / "sweep_full.xlsx")], env)
        full = pd.read_csv(ws / "results" / "sweep_full.csv")
        assert set(full["vd_name"].unique()) == {
            "no_RAG", "text_RAG", "mm_RAG", "colpali"}
        assert set(full["permuted_answers"].unique()) == {True, False}


@pytest.mark.e2e
@pytest.mark.parametrize("wdtype", ["int8", "int4"])
def test_serve_cli_gemma3(workspace, wdtype):
    """Driver 07 serves a Gemma-3 LM (the reference's actual generator
    class) through the paged batcher with chunked prefill AND weight-only
    quantization enabled (the text and mm engines share one quantized
    tree; int4 is the storage format that fits gemma-3-27b on one
    chip). The int4 leg also quantizes the SigLIP tower (--vision-dtype
    int8, the HBM headroom the 27B multimodal server needs) and sends an
    IMAGE request through the same server."""
    env = _env("http://unused")
    env.pop("OPENAI_BASE_URL")
    serve = subprocess.Popen(
        [sys.executable, str(DRIVERS / "07_serve.py"),
         "--model", "tiny-gemma3", "--port", "0", "--paged",
         "--prefill-chunk", "16", "--max-seq-len", "320",
         "--dtype", "float32", "--weight-dtype", wdtype]
        + (["--vision-dtype", "int8"] if wdtype == "int4" else []),
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        base = _wait_for_serve(serve)
        import urllib.request

        req = urllib.request.Request(
            base.rstrip("/") + "/chat/completions",
            data=json.dumps({
                "model": "g3", "max_tokens": 8,
                "messages": [{"role": "user",
                              "content": "hello " * 30}],  # > prefill chunk
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=240) as r:
            out = json.load(r)
        text = out["choices"][0]["message"]["content"]
        assert text and "error" not in out
        # determinism through the full stack
        with urllib.request.urlopen(req, timeout=240) as r:
            out2 = json.load(r)
        assert out2["choices"][0]["message"]["content"] == text
        if wdtype == "int4":
            # image request through the int8-vision tower
            import base64
            import io

            from PIL import Image

            buf = io.BytesIO()
            Image.new("RGB", (28, 28), (200, 30, 90)).save(buf, "PNG")
            url = ("data:image/png;base64,"
                   + base64.b64encode(buf.getvalue()).decode())
            mreq = urllib.request.Request(
                base.rstrip("/") + "/chat/completions",
                data=json.dumps({
                    "model": "g3", "max_tokens": 6,
                    "messages": [{"role": "user", "content": [
                        {"type": "image_url", "image_url": {"url": url}},
                        {"type": "text", "text": "describe"},
                    ]}],
                }).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(mreq, timeout=240) as r:
                mout = json.load(r)
            assert mout["choices"][0]["message"]["content"]
    finally:
        serve.terminate()
        serve.wait(timeout=10)


@pytest.mark.e2e
def test_serve_cli_qwen2vl(workspace):
    """Driver 07 serves the Qwen2-VL LM class first-party (the
    reference's old-model tier runs AdaptLLM/biomed-Qwen2-VL-2B-Instruct
    in a vLLM container, 00_run_docker_old_models.sh:24-38) through the
    paged batcher with speculative decoding composed on top."""
    env = _env("http://unused")
    env.pop("OPENAI_BASE_URL")
    serve = subprocess.Popen(
        [sys.executable, str(DRIVERS / "07_serve.py"),
         "--model", "tiny-qwen2vl", "--port", "0", "--paged",
         "--speculative", "3", "--max-seq-len", "256",
         "--dtype", "float32"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        base = _wait_for_serve(serve)
        import urllib.request

        req = urllib.request.Request(
            base.rstrip("/") + "/chat/completions",
            data=json.dumps({
                "model": "qwen2-vl", "max_tokens": 8,
                "messages": [{"role": "user", "content": "hello world"}],
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=240) as r:
            out = json.load(r)
        text = out["choices"][0]["message"]["content"]
        assert text and "error" not in out
        with urllib.request.urlopen(req, timeout=240) as r:
            out2 = json.load(r)
        assert out2["choices"][0]["message"]["content"] == text
        # image request through the Qwen2-VL vision tower (the old-model
        # tier is a VLM - exp-02 sends it image-context MCQs)
        import base64
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (56, 56), (30, 200, 90)).save(buf, "PNG")
        url = ("data:image/png;base64,"
               + base64.b64encode(buf.getvalue()).decode())
        mreq = urllib.request.Request(
            base.rstrip("/") + "/chat/completions",
            data=json.dumps({
                "model": "qwen2-vl", "max_tokens": 6,
                "messages": [{"role": "user", "content": [
                    {"type": "image_url", "image_url": {"url": url}},
                    {"type": "text", "text": "describe"},
                ]}],
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(mreq, timeout=240) as r:
            mout = json.load(r)
        assert mout["choices"][0]["message"]["content"]
    finally:
        serve.terminate()
        serve.wait(timeout=10)


@pytest.mark.e2e
def test_serve_cli_llava_next(workspace):
    """Driver 07 serves the LLaVA-NeXT VLM class first-party (the
    reference's old-model tier runs AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B
    in a vLLM container, 00_run_docker_old_models.sh:41-52): text decodes
    through the paged batcher, an image request prefills through the CLIP
    tower + anyres packing."""
    env = _env("http://unused")
    env.pop("OPENAI_BASE_URL")
    serve = subprocess.Popen(
        [sys.executable, str(DRIVERS / "07_serve.py"),
         "--model", "tiny-llava-next", "--port", "0", "--paged",
         "--max-seq-len", "256", "--dtype", "float32"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        base = _wait_for_serve(serve)
        import urllib.request

        req = urllib.request.Request(
            base.rstrip("/") + "/chat/completions",
            data=json.dumps({
                "model": "llava-next", "max_tokens": 8,
                "messages": [{"role": "user", "content": "hello world"}],
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=240) as r:
            out = json.load(r)
        text = out["choices"][0]["message"]["content"]
        assert text and "error" not in out
        # two-image request through the CLIP tower (exp-02 sends
        # image-context MCQs with multiple context pages)
        import base64
        import io

        from PIL import Image

        urls = []
        for color in ((30, 200, 90), (200, 30, 90)):
            buf = io.BytesIO()
            Image.new("RGB", (56, 56), color).save(buf, "PNG")
            urls.append("data:image/png;base64,"
                        + base64.b64encode(buf.getvalue()).decode())
        mreq = urllib.request.Request(
            base.rstrip("/") + "/chat/completions",
            data=json.dumps({
                "model": "llava-next", "max_tokens": 6,
                "messages": [{"role": "user", "content": [
                    {"type": "image_url", "image_url": {"url": urls[0]}},
                    {"type": "image_url", "image_url": {"url": urls[1]}},
                    {"type": "text", "text": "compare"},
                ]}],
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(mreq, timeout=240) as r:
            mout = json.load(r)
        assert mout["choices"][0]["message"]["content"]
    finally:
        serve.terminate()
        serve.wait(timeout=10)


@pytest.mark.e2e
def test_serve_cli_mllama(workspace):
    """Driver 07 serves the Llama-3.2-Vision VLM class first-party (the
    reference's old-model tier runs
    AdaptLLM/biomed-Llama-3.2-11B-Vision-Instruct in a vLLM container,
    00_run_docker_old_models.sh:8-22): text AND image requests decode
    through the PAGED batcher (the renumbered self-attention stack is a
    plain Llama; the image request's gated cross-attention rides the
    tier's per-slot cross-KV pools)."""
    env = _env("http://unused")
    env.pop("OPENAI_BASE_URL")
    serve = subprocess.Popen(
        [sys.executable, str(DRIVERS / "07_serve.py"),
         "--model", "tiny-mllama", "--port", "0", "--paged",
         "--max-seq-len", "256", "--dtype", "float32"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
    try:
        base = _wait_for_serve(serve)
        import urllib.request

        req = urllib.request.Request(
            base.rstrip("/") + "/chat/completions",
            data=json.dumps({
                "model": "mllama", "max_tokens": 8,
                "messages": [{"role": "user", "content": "hello world"}],
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=240) as r:
            out = json.load(r)
        text = out["choices"][0]["message"]["content"]
        assert text and "error" not in out
        # image request through the cross-attention path
        import base64
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (56, 56), (30, 200, 90)).save(buf, "PNG")
        url = ("data:image/png;base64,"
               + base64.b64encode(buf.getvalue()).decode())
        mreq = urllib.request.Request(
            base.rstrip("/") + "/chat/completions",
            data=json.dumps({
                "model": "mllama", "max_tokens": 6,
                "messages": [{"role": "user", "content": [
                    {"type": "image_url", "image_url": {"url": url}},
                    {"type": "text", "text": "describe"},
                ]}],
            }).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(mreq, timeout=240) as r:
            mout = json.load(r)
        assert mout["choices"][0]["message"]["content"]
    finally:
        serve.terminate()
        serve.wait(timeout=10)
