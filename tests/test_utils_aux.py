"""Aux subsystem tests: housekeeping, health checks, remote parse, prompts,
sync summarizer."""

import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.utils.housekeeping import (
    device_memory_stats, free_memory, get_less_used_device, live_arrays_bytes,
    trace,
)
from multimodal_colpali_tpu.utils.health import check_vllm_status, monitor_vllm_process
from multimodal_colpali_tpu.prompts import DEFAULT_PROMPTS, load_prompts, save_default_prompts


def test_housekeeping_basics():
    x = jnp.ones((128, 128))
    assert live_arrays_bytes() >= x.nbytes
    idx = get_less_used_device(debug=False)
    assert 0 <= idx < len(jax.devices())
    free_memory([x])
    with trace("unit", verbose=False):
        _ = jnp.zeros((4,)) + 1


def test_health_check_down_and_up():
    assert not check_vllm_status("http://127.0.0.1:9/health")
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        assert check_vllm_status(f"http://127.0.0.1:{srv.server_port}/health")
    finally:
        srv.shutdown()


def test_monitor_process_failure_path():
    proc = subprocess.Popen([sys.executable, "-c", "import sys; sys.exit(3)"],
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)
    ok, out, err = monitor_vllm_process(proc, check_interval=0,
                                        health_url="http://127.0.0.1:9/health",
                                        max_wait=5)
    assert not ok


def test_prompts_roundtrip(tmp_path):
    p = str(tmp_path / "prompts_used.pkl")
    save_default_prompts(p)
    loaded = load_prompts(p)
    assert set(loaded) == {"img_summary", "text_summary", "img_summary_query",
                           "text_summary_query", "rag_summary_query"}
    assert load_prompts(None) == DEFAULT_PROMPTS
    assert load_prompts(str(tmp_path / "missing.pkl")) == DEFAULT_PROMPTS


def test_remote_parse_fallback(tmp_path):
    """No service configured -> native text layer; dead service -> retries
    then native fallback."""
    from multimodal_colpali_tpu.ingest.pdfwrite import make_sample_pdf
    from multimodal_colpali_tpu.ingest.remote_parse import conv_docs1, pdf_loader1
    from multimodal_colpali_tpu.models.processing import SimpleTokenizer

    p = str(tmp_path / "a.pdf")
    make_sample_pdf(p, n_pages=1, lines_per_page=3)
    conv = conv_docs1([p], ["a.pdf"], ["doi:a"], service_url=None)
    assert "glycans" in conv[0]["document"].extract_text(0)

    conv2 = conv_docs1([p], ["a.pdf"], ["doi:a"],
                       service_url="http://127.0.0.1:9", retries=2, backoff=0.0)
    assert "glycans" in conv2[0]["document"].extract_text(0)

    docs_multi, docs_text = pdf_loader1([p], ["doi:a"], ["a.pdf"],
                                        str(tmp_path / "vd"), SimpleTokenizer(100, 99))
    assert docs_text and docs_text[0].metadata["type"] == "text"


def test_remote_parse_with_service(tmp_path):
    """A live conversion service overrides the text layer."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            _ = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            data = json.dumps({"pages": [{"text": "REMOTE OCR TEXT"}]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        from multimodal_colpali_tpu.ingest.pdfwrite import make_sample_pdf
        from multimodal_colpali_tpu.ingest.remote_parse import conv_docs1

        p = str(tmp_path / "a.pdf")
        make_sample_pdf(p, n_pages=1)
        conv = conv_docs1([p], ["a.pdf"], ["d"],
                          service_url=f"http://127.0.0.1:{srv.server_port}")
        assert conv[0]["document"].extract_text(0) == "REMOTE OCR TEXT"
        assert conv[0]["document"].has_text(0)
    finally:
        srv.shutdown()


def test_api_models_one_img(tmp_path, monkeypatch):
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
    from PIL import Image

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            _ = self.rfile.read(int(self.headers.get("Content-Length", 0)))
            data = json.dumps({"choices": [{"message": {"content": "a summary"}}]}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    monkeypatch.chdir(tmp_path)
    try:
        from multimodal_colpali_tpu.utils.userops import api_models_one_img

        img = tmp_path / "x.jpg"
        Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(img)
        out = api_models_one_img(
            [str(img), ""], ["", "some text"],
            [{"model_id": "m/x", "api_url": f"http://127.0.0.1:{srv.server_port}/v1",
              "api_key": "k"}],
            "describe", "summarize: ",
        )
        assert [o["output"] for o in out] == ["a summary", "a summary"]
        assert (tmp_path / "x.pkl").exists()  # checkpoint written
    finally:
        srv.shutdown()
