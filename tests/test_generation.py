"""Generation layer tests: message formats, async client vs fake server,
retry behavior, answer parsing + de-permutation."""

import asyncio
import json

import numpy as np
import pytest
from PIL import Image

from multimodal_colpali_tpu.generation import (
    ERROR_SENTINEL, build_choice_string, build_instruction_block,
    build_reference_from_metadata, document_to_context_entry,
    encode_image_to_data_url, format_msgs, get_responses, image_context_messages,
    response_real_out, run_inference, run_sync,
)
from multimodal_colpali_tpu.documents import Document
from tests.fake_openai import FakeOpenAIServer


def test_build_choice_and_instruction():
    s = build_choice_string(["one", "two", "three", "four"])
    assert s == "A. one\nB. two\nC. three\nD. four"
    block = build_instruction_block("What is X?", ["a", "b", "c", "d"])
    assert "Question: What is X?" in block
    assert "single capital letter" in block


def test_reference_and_context_entry():
    md = {"document_name": "paper.pdf", "page_no": 3, "type": "text",
          "img_link": ""}
    assert build_reference_from_metadata(md) == "paper.pdf_pg_3"
    entry = document_to_context_entry(Document("body text", md), 0.7)
    assert entry == {"type": "text", "text": "body text", "image_path": "",
                     "reference": "paper.pdf_pg_3", "score": 0.7}
    md_img = {"document_name": "p.pdf", "page_no": 1, "type": "image",
              "img_link": "/tmp/x.png"}
    entry2 = document_to_context_entry(Document("cap", md_img), 0.1)
    assert entry2["type"] == "image" and entry2["text"] == ""


def test_format_msgs_and_data_urls(tmp_path):
    img = Image.fromarray(np.zeros((50, 80, 3), np.uint8), "RGB")
    p = str(tmp_path / "i.png")
    img.save(p)
    msgs = format_msgs("prompt: ", [p], text="ctx")
    assert msgs[0]["role"] == "user"
    parts = msgs[0]["content"]
    assert parts[0] == {"type": "text", "text": "prompt: ctx"}
    assert parts[1]["image_url"]["url"].startswith("data:image/jpeg;base64,")
    url = encode_image_to_data_url(p, fixed_width=64)
    assert url.startswith("data:image/png;base64,")
    assert encode_image_to_data_url(str(tmp_path / "missing.png")) is None
    parts2 = image_context_messages([img], fixed_width=32)
    assert parts2[0]["image_url"]["url"].startswith("data:image/jpeg;base64,")


def test_get_responses_against_fake_server():
    with FakeOpenAIServer(lambda req: "B") as srv:
        msgs = [[{"role": "user", "content": "q1"}],
                [{"role": "user", "content": "q2"}]]
        out = run_sync(get_responses("gpt-5", 0, msgs, base_url=srv.base_url))
        assert out == ["B", "B"]
        assert len(srv.requests) == 2
        assert srv.requests[0]["model"] == "gpt-5"


def test_retry_then_success_and_sentinel():
    with FakeOpenAIServer(lambda req: "C") as srv:
        srv.fail_next = 2
        out = run_sync(get_responses("m", 0, [[{"role": "user", "content": "x"}]],
                                     base_url=srv.base_url))
        assert out == ["C"]  # survived 2 failures via backoff

    # a dead endpoint exhausts retries -> sentinel, no exception
    out = run_sync(get_responses(
        "m", 0, [[{"role": "user", "content": "x"}]],
        base_url="http://127.0.0.1:9/v1",
    ))
    assert out == [ERROR_SENTINEL]


def test_run_inference_schema_body():
    with FakeOpenAIServer(lambda req: json.dumps({"answer": "D"})) as srv:
        from multimodal_colpali_tpu.generation import resolve_endpoint
        url, headers = resolve_endpoint("gpt-5", base_url=srv.base_url)
        out = run_sync(run_inference("gpt-5", [[{"role": "user", "content": "q"}]],
                                     url=url, headers=headers, use_schema=True))
        assert out == ['{"answer": "D"}']
        assert srv.requests[0]["response_format"]["json_schema"]["name"] == "MCQ"


@pytest.mark.parametrize("resp,perm,want", [
    ("A", [0, 1, 2, 3], ("A", "A")),              # identity
    ("A", [2, 0, 1, 3], ("A", "C")),              # pos0 shows original C
    ("B", [2, 0, 1, 3], ("B", "A")),
    ('"B is right"', [0, 1, 2, 3], ("B", "B")),   # JSON string stage
    ('{"answer": "C"}', [0, 1, 2, 3], ("C", "C")),  # structured output
    ("The answer is: D obviously", [0, 1, 2, 3], ("D", "D")),  # cleanup stage
    ("no letters here", [0, 1, 2, 3], ("", "")),
    (None, [0, 1, 2, 3], ("", "")),
    (ERROR_SENTINEL, [0, 1, 2, 3], ("", "")),
])
def test_response_real_out(resp, perm, want):
    assert response_real_out(resp, perm) == want
