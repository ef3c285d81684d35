"""Streaming logprobs + chunked prefill (vLLM serving features the
round-2 tier lacked; PARITY.md known-gaps list).

Oracles: the non-streaming logprobs payload (stream chunks must
concatenate to it) and the isolated engine streams (chunked prefill must
be a pure scheduling change - bit-identical tokens).
"""

import json
import urllib.request

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.engine import (GemmaDecodeEngine,
                                                      ModuloTokenizer)
from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher
from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
from multimodal_colpali_tpu.generation.server import GenerationServer
from multimodal_colpali_tpu.models.colpali import ColPaliModel
from multimodal_colpali_tpu.models.configs import ColPaliModelConfig
from multimodal_colpali_tpu.models.registry import fast_random_params


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    model = ColPaliModel(cfg)
    params = jax.tree.map(jnp.asarray, fast_random_params(model, cfg, seed=3))
    return cfg.text, params


def _post(base, payload):
    req = urllib.request.Request(
        base.rstrip("/") + "/chat/completions",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    return urllib.request.urlopen(req, timeout=120)


def _sse_events(resp):
    events = []
    for line in resp.read().decode().splitlines():
        if line.startswith("data: ") and line != "data: [DONE]":
            events.append(json.loads(line[len("data: "):]))
    return events


# -- streaming logprobs -------------------------------------------------------

def test_stream_logprobs_match_non_streaming(tiny_lm):
    """SSE chunks carry logprobs; concatenated across chunks they equal
    the non-streaming response's logprobs content exactly."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    tok = ModuloTokenizer(tcfg.vocab_size)
    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                            chunk=3).serve()
    try:
        with GenerationServer(bat, tok) as srv:
            payload = {"model": "t", "max_tokens": 8, "logprobs": True,
                       "top_logprobs": 3,
                       "messages": [{"role": "user", "content": "hi there"}]}
            want = json.load(_post(srv.base_url, payload))
            got = _sse_events(_post(srv.base_url,
                                    dict(payload, stream=True)))
    finally:
        bat.shutdown()

    want_lp = want["choices"][0]["logprobs"]["content"]
    stream_lp = []
    stream_text = ""
    for ev in got:
        ch = ev["choices"][0]
        stream_text += ch["delta"].get("content", "")
        if ch.get("logprobs"):
            stream_lp.extend(ch["logprobs"]["content"])
    assert stream_text == want["choices"][0]["message"]["content"]
    assert len(stream_lp) == len(want_lp) > 0
    for a, b in zip(stream_lp, want_lp):
        assert a["token"] == b["token"]
        assert a["logprob"] == pytest.approx(b["logprob"], rel=1e-6)
        assert [t["token"] for t in a["top_logprobs"]] == \
            [t["token"] for t in b["top_logprobs"]]


def test_stream_logprobs_callback_records(tiny_lm):
    """At the scheduler level: on_token receives (tok, lp, tops) triples
    when logprobs are requested, equal to the future's records."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=8)
    seen = []
    fut = bat.submit([5, 9, 17, 3], max_new_tokens=7, logprobs=2,
                     on_token=seen.append)
    bat.drain()
    toks, lps, tops = fut.result(10)
    assert [s[0] for s in seen] == toks
    assert [s[1] for s in seen] == lps
    assert [s[2] for s in seen] == tops


# -- chunked prefill ----------------------------------------------------------

def test_chunked_prefill_streams_bit_match(tiny_lm):
    """Chunked prefill is a pure scheduling change: a long prompt admitted
    in segments produces exactly the monolithic-prefill stream (dense and
    paged batchers; segment K/V accumulate to the same cache rows)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    rng = np.random.default_rng(8)
    long_prompt = rng.integers(2, 60, (41,)).tolist()
    short = [7, 30, 8]
    want_long = eng.generate([long_prompt], max_new_tokens=6)[0]
    want_short = eng.generate([short], max_new_tokens=6)[0]

    for cls, kw in ((ContinuousBatcher, {}),
                    (PagedContinuousBatcher, {"page_size": 8})):
        bat = cls(eng, batch_slots=2, max_seq_len=96, chunk=3,
                  prefill_chunk=8, **kw)
        futs = [bat.submit(long_prompt, max_new_tokens=6),
                bat.submit(short, max_new_tokens=6)]
        bat.drain()
        assert futs[0].result(10) == want_long, cls.__name__
        assert futs[1].result(10) == want_short, cls.__name__
        # 41 tokens at segment size 8 -> 6 segments
        assert bat.chunked_prefill_segments == 6, cls.__name__


def test_chunked_prefill_bounded_stall(tiny_lm):
    """While a long prompt admits in segments, a running slot keeps
    decoding between segments: at most one segment runs per scheduling
    point, so the running request finishes well before the long prompt's
    prefill completes (the cadence guarantee)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    rng = np.random.default_rng(9)
    long_prompt = rng.integers(2, 60, (60,)).tolist()
    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=96, chunk=2,
                            prefill_chunk=6)
    order = []
    short_fut = bat.submit([7, 30, 8], max_new_tokens=4,
                           on_token=lambda t: order.append("short"))
    with bat._lock:
        bat._admit()            # short admits; long not yet submitted
    long_fut = bat.submit(long_prompt, max_new_tokens=4,
                          on_token=lambda t: order.append("long"))
    bat.drain()
    assert short_fut.result(10) == eng.generate([[7, 30, 8]],
                                                max_new_tokens=4)[0]
    assert long_fut.result(10) == eng.generate([long_prompt],
                                               max_new_tokens=4)[0]
    # the short request's tokens all streamed before the long prompt's
    # first token: decode cadence survived the 10-segment prefill
    assert order.index("long") >= order.count("short") - 1
    assert bat.chunked_prefill_segments == 10


def test_chunked_prefill_gemma3(tiny_lm):
    """Chunked prefill composes with Gemma-3's sliding-window layers
    (segment attention must reproduce the windowed masks)."""
    from multimodal_colpali_tpu.models.configs import Gemma3TextConfig
    from multimodal_colpali_tpu.models.registry import gemma3_random_params

    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    params = gemma3_random_params(cfg, seed=5)
    eng = GemmaDecodeEngine(cfg, params)
    rng = np.random.default_rng(10)
    prompt = rng.integers(2, 60, (37,)).tolist()
    want = eng.generate([prompt], max_new_tokens=6)[0]
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=96,
                                 chunk=3, page_size=8, prefill_chunk=8)
    got = bat.generate([prompt], max_new_tokens=6)[0]
    assert got == want
    assert bat.chunked_prefill_segments == 5


def test_chunked_prefill_failure_resolves_future(tiny_lm):
    """A request whose chunked prefill is in flight when the scheduler
    fails must have its future resolved by _fail_all."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    bat = ContinuousBatcher(eng, batch_slots=1, max_seq_len=96, chunk=2,
                            prefill_chunk=8)
    fut = bat.submit(list(range(2, 40)), max_new_tokens=4)
    with bat._lock:
        bat._admit()            # starts the chunked prefill
        assert bat._chunked is not None
        bat._fail_all(RuntimeError("injected"))
    with pytest.raises(RuntimeError, match="injected"):
        fut.result(10)
    assert bat._chunked is None
