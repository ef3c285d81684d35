"""Generation engine tests: cache-vs-full-forward parity, torch parity,
padding invariance, sampling/stop behavior."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.engine import ByteTokenizer, GemmaDecodeEngine
from multimodal_colpali_tpu.models.colpali import ColPaliModel
from multimodal_colpali_tpu.models.configs import ColPaliModelConfig
from multimodal_colpali_tpu.models.gemma import GemmaEmbedder, GemmaModel
from multimodal_colpali_tpu.models.registry import fast_random_params


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    model = ColPaliModel(cfg)
    params = jax.tree.map(jnp.asarray, fast_random_params(model, cfg, seed=3))
    return cfg.text, params


def _oracle_greedy(tcfg, params, prompt, n_steps):
    """Greedy continuation by full recompute each step: embed (scaled) ->
    GemmaModel(causal=True) -> tied logits. The no-cache oracle."""
    emb = GemmaEmbedder(tcfg)
    lm = GemmaModel(tcfg)
    table = params["embed"]["embed_tokens"]
    ids = list(prompt)
    out = []
    for _ in range(n_steps):
        a = jnp.asarray([ids], jnp.int32)
        mask = jnp.ones_like(a)
        x = emb.apply({"params": params["embed"]}, a)
        x = x.astype(jnp.float32) * tcfg.hidden_size ** 0.5
        positions = jnp.cumsum(mask, axis=1) - 1
        h = lm.apply({"params": params["language_model"]}, x, positions,
                     mask, causal=True)
        logits = jnp.einsum("h,vh->v", h[0, -1].astype(jnp.float32),
                            jnp.asarray(table, jnp.float32))
        tok = int(jnp.argmax(logits))
        out.append(tok)
        ids.append(tok)
    return out


def test_cached_decode_matches_full_recompute(tiny_lm):
    """The KV-cache scan must produce exactly the tokens the no-cache
    full-recompute oracle produces (greedy)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompts = [[5, 9, 17, 3], [40, 2]]
    got = eng.generate(prompts, max_new_tokens=6)
    for prompt, g in zip(prompts, got):
        want = _oracle_greedy(tcfg, params, prompt, 6)
        assert g == want, (prompt, g, want)


def test_left_padding_invariance(tiny_lm):
    """The same prompt must generate the same tokens regardless of how much
    left padding the bucket adds (batched with a longer prompt)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    alone = eng.generate([[7, 21, 33]], max_new_tokens=5)[0]
    batched = eng.generate([[7, 21, 33], list(range(3, 30))],
                           max_new_tokens=5, bucket=32)[0]
    assert alone == batched


def test_eos_stops_and_pads(tiny_lm):
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    kw = dict(max_new_tokens=8, temperature=1.5, seed=7)  # diverse + replayable
    free = eng.generate([[5, 9, 17, 3]], **kw)[0]
    # pick as eos a token whose first occurrence is past position 0
    j = next((i for i, t in enumerate(free) if t not in free[:i] and i > 0), None)
    assert j is not None, free
    stopped = eng.generate([[5, 9, 17, 3]], eos_id=free[j], **kw)[0]
    assert stopped == free[:j]


def test_temperature_sampling_deterministic_per_seed(tiny_lm):
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    a = eng.generate([[5, 9]], max_new_tokens=6, temperature=0.8, seed=11)
    b = eng.generate([[5, 9]], max_new_tokens=6, temperature=0.8, seed=11)
    c = eng.generate([[5, 9]], max_new_tokens=6, temperature=0.8, seed=12)
    assert a == b
    assert a != c or True  # different seeds may rarely coincide on tiny vocab


def test_next_token_logits_match_torch_gemma(tiny_lm):
    """Full-stack parity: our prefill logits vs transformers
    GemmaForCausalLM with the same (tiny, ported) weights."""
    torch = pytest.importorskip("torch")
    from transformers import GemmaConfig, GemmaForCausalLM

    tcfg, params = tiny_lm
    hf_cfg = GemmaConfig(
        vocab_size=tcfg.vocab_size, hidden_size=tcfg.hidden_size,
        intermediate_size=tcfg.intermediate_size,
        num_hidden_layers=tcfg.num_hidden_layers,
        num_attention_heads=tcfg.num_attention_heads,
        num_key_value_heads=tcfg.num_key_value_heads,
        head_dim=tcfg.head_dim, rms_norm_eps=tcfg.rms_norm_eps,
        rope_theta=tcfg.rope_theta,
    )
    torch.manual_seed(0)
    hf = GemmaForCausalLM(hf_cfg).eval()

    # port torch weights into our tree
    sd = hf.state_dict()
    lin = lambda k: {"kernel": sd[k + ".weight"].numpy().T}
    rms = lambda k: {"weight": sd[k + ".weight"].numpy()}
    language = {"norm": rms("model.norm")}
    for i in range(tcfg.num_hidden_layers):
        p = f"model.layers.{i}."
        language[f"layers_{i}"] = {
            "self_attn": {n: lin(p + f"self_attn.{n}")
                          for n in ("q_proj", "k_proj", "v_proj", "o_proj")},
            "mlp": {n: lin(p + f"mlp.{n}")
                    for n in ("gate_proj", "up_proj", "down_proj")},
            "input_layernorm": rms(p + "input_layernorm"),
            "post_attention_layernorm": rms(p + "post_attention_layernorm"),
        }
    ported = {"embed": {"embed_tokens": sd["model.embed_tokens.weight"].numpy()},
              "language_model": language}

    prompt = [3, 17, 42, 9, 26, 31]
    eng = GemmaDecodeEngine(tcfg, ported)
    got = eng.next_token_logits([prompt], bucket=len(prompt))[0]
    with torch.no_grad():
        want = hf(input_ids=torch.tensor([prompt])).logits[0, -1].numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_byte_tokenizer_roundtrip():
    tok = ByteTokenizer()
    s = "Glycans bind selectins! éß"
    assert tok.decode(tok.encode(s)) == s
    assert tok.encode(s, add_special_tokens=True)[0] == tok.bos_id


def test_generation_server_end_to_end(tiny_lm):
    """The framework's own client speaks to the framework's own server:
    chat completion round-trips through the engine with the OpenAI schema
    (same seam the reference points at vLLM)."""
    tcfg, params = tiny_lm
    # the tiny LM's vocab (64) can't hold bytes; wrap a modulo tokenizer
    tok = ByteTokenizer()

    class ModTok:
        pad_id, bos_id, eos_id = 0, 1, -1

        def encode(self, text, add_special_tokens=False):
            ids = [2 + (i % 60) for i in tok.encode(text)]
            return ([self.bos_id] + ids) if add_special_tokens else ids

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    from multimodal_colpali_tpu.generation.client import get_responses, run_sync
    from multimodal_colpali_tpu.generation.server import GenerationServer
    from multimodal_colpali_tpu.utils.health import check_vllm_status

    eng = GemmaDecodeEngine(tcfg, params)
    with GenerationServer(eng, ModTok(), model_name="tiny-gemma") as srv:
        assert check_vllm_status(srv.base_url.removesuffix("/v1") + "/health")
        msgs = [[{"role": "user", "content": "What binds selectins?"}]]
        out = run_sync(get_responses(
            "tiny-gemma", 0, msgs, base_url=srv.base_url,
            extra_body={"max_tokens": 6, "seed": 0}))
        out2 = run_sync(get_responses(
            "tiny-gemma", 0, msgs, base_url=srv.base_url,
            extra_body={"max_tokens": 6, "seed": 0}))
    assert out == out2  # greedy determinism through the full HTTP stack
    assert len(out) == 1 and out[0] and "[error]" not in out[0]
    assert all(t.isdigit() for t in out[0].split())


def test_sharded_generation_matches_single_device(tiny_lm, mesh8):
    """dp x tp generation (params column/row-parallel over "model", batch
    and caches over "data") must produce the same tokens as single-device."""
    from jax.sharding import Mesh

    tcfg, params = tiny_lm
    devs = np.array(mesh8.devices).reshape(4, 2)
    mesh = Mesh(devs, ("data", "model"))
    plain = GemmaDecodeEngine(tcfg, params)
    sharded = GemmaDecodeEngine(tcfg, params, mesh=mesh)
    prompts = [[5, 9, 17, 3], [40, 2], [1, 2, 3]]  # 3 rows -> padded to 4
    want = plain.generate(prompts, max_new_tokens=5)
    got = sharded.generate(prompts, max_new_tokens=5)
    assert got == want


def test_continuous_batcher_matches_engine(tiny_lm):
    """Greedy outputs through the slot scheduler must equal isolated
    engine.generate outputs, including staggered admission (a request
    joining mid-flight must not perturb running slots)."""
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompts = [[5, 9, 17, 3], [40, 2], [1, 2, 3, 4, 5], [33], [8, 8, 9]]
    want = [eng.generate([p], max_new_tokens=7)[0] for p in prompts]

    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=3)
    # staggered: 3 requests now (only 2 slots -> one queues), 2 later
    futs = [bat.submit(p, max_new_tokens=7) for p in prompts[:3]]
    with bat._lock:
        bat._admit()
        bat._step_chunk()  # slots mid-flight
    futs += [bat.submit(p, max_new_tokens=7) for p in prompts[3:]]
    bat.drain()
    got = [f.result(timeout=60) for f in futs]
    assert got == want


def test_continuous_batcher_eos_and_lengths(tiny_lm):
    """Per-request budgets: a 3-token budget returns exactly 3 tokens that
    prefix the 8-token generation."""
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=4)
    long = bat.submit([5, 9, 17, 3], max_new_tokens=8)
    short = bat.submit([5, 9, 17, 3], max_new_tokens=3)
    bat.drain()
    lt, st = long.result(timeout=60), short.result(timeout=60)
    assert len(lt) == 8 and len(st) == 3
    assert lt[:3] == st


def test_server_with_continuous_batcher(tiny_lm):
    """GenerationServer over a serving batcher: concurrent requests share
    the slot batch and round-trip the OpenAI schema."""
    from multimodal_colpali_tpu.generation.client import get_responses, run_sync
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
    from multimodal_colpali_tpu.generation.server import GenerationServer

    tcfg, params = tiny_lm

    class ModTok:
        pad_id, bos_id, eos_id = 0, 1, -1

        def encode(self, text, add_special_tokens=False):
            ids = [2 + (b % 60) for b in text.encode("utf-8")]
            return ([self.bos_id] + ids) if add_special_tokens else ids

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    eng = GemmaDecodeEngine(tcfg, params)
    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=96, chunk=4).serve()
    try:
        with GenerationServer(bat, ModTok(), model_name="tiny-gemma") as srv:
            msgs = [[{"role": "user", "content": f"question {i}?"}]
                    for i in range(4)]
            out = run_sync(get_responses(
                "tiny-gemma", 0, msgs, base_url=srv.base_url,
                extra_body={"max_tokens": 5, "seed": 0}))
        assert len(out) == 4 and all(o and "[error]" not in o for o in out)
    finally:
        bat.shutdown()


def test_paligemma_multimodal_generation_matches_hf(tiny_lm):
    """Image-conditioned greedy generation must match torch PaliGemma
    (bidirectional prefix + causal decode, 1-indexed positions) with the
    same ported weights."""
    torch = pytest.importorskip("torch")
    from transformers import ColPaliForRetrieval, ColPaliConfig
    from transformers.models.paligemma import PaliGemmaConfig

    from multimodal_colpali_tpu.generation.engine import PaliGemmaEngine
    from multimodal_colpali_tpu.models import hf_import

    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    hf_cfg = ColPaliConfig(
        vlm_config=PaliGemmaConfig(
            vision_config=dict(
                hidden_size=cfg.vision.hidden_size,
                intermediate_size=cfg.vision.intermediate_size,
                num_hidden_layers=cfg.vision.num_hidden_layers,
                num_attention_heads=cfg.vision.num_attention_heads,
                image_size=cfg.vision.image_size,
                patch_size=cfg.vision.patch_size,
            ),
            text_config=dict(
                hidden_size=cfg.text.hidden_size,
                intermediate_size=cfg.text.intermediate_size,
                num_hidden_layers=cfg.text.num_hidden_layers,
                num_attention_heads=cfg.text.num_attention_heads,
                num_key_value_heads=cfg.text.num_key_value_heads,
                head_dim=cfg.text.head_dim,
                vocab_size=cfg.text.vocab_size,
            ),
            projection_dim=cfg.text.hidden_size,
            image_token_index=cfg.image_token_id,
        ),
        embedding_dim=cfg.embedding_dim,
    )
    torch.manual_seed(0)
    hf = ColPaliForRetrieval(hf_cfg).eval()
    params = hf_import.colpali_params_from_hf(hf.state_dict(), cfg)

    rng = np.random.default_rng(2)
    eng = PaliGemmaEngine(cfg, params)
    text_ids = [5, 9, 11]
    prompt = eng.build_mm_prompt(text_ids, bos_id=2)
    pix = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)

    got = eng.generate([prompt], pix, max_new_tokens=5,
                       bucket=len(prompt))[0]

    vlm = hf.vlm  # the underlying PaliGemmaForConditionalGeneration
    ids_t = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        out = vlm.generate(
            input_ids=ids_t,
            attention_mask=torch.ones_like(ids_t),
            pixel_values=torch.from_numpy(pix.transpose(0, 3, 1, 2)),
            max_new_tokens=5, do_sample=False,
        )
    want = out[0, len(prompt):].tolist()
    assert got == want, (got, want)


def test_batcher_per_request_eos_and_budget_guard(tiny_lm):
    """Review fixes: per-request eos honored through generate(); over-long
    prompts fail their Future instead of crashing the scheduler; budgets
    are clamped to the cache rows left after the prompt."""
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    free = eng.generate([[5, 9, 17, 3]], max_new_tokens=8, temperature=1.5,
                        seed=7)[0]
    j = next(i for i, t in enumerate(free) if t not in free[:i] and i > 0)

    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=48, chunk=4)
    # per-request eos via generate(eos_id=...) must truncate like the engine
    got = bat.generate([[5, 9, 17, 3]], max_new_tokens=8, temperature=1.5,
                       seed=7, eos_id=free[j])
    assert got[0] == free[:j]

    # an over-long prompt fails its own Future, without touching the batch
    bad = bat.submit(list(range(200)), max_new_tokens=4)
    with pytest.raises(ValueError, match="max_seq_len"):
        bad.result(timeout=5)

    # budget exceeding the cache tail is clamped, not corrupted
    long_prompt = [3] * 30  # buckets to 32; only 16 rows left of 48
    out = bat.generate([long_prompt], max_new_tokens=500)[0]
    assert len(out) == 48 - 32
    # ...and matches the engine's tokens for the same budget
    want = eng.generate([long_prompt], max_new_tokens=16, bucket=32)[0]
    assert out == want


def test_batcher_sampling_reproducible_across_admission(tiny_lm):
    """Same (prompt, seed, temperature) must sample the same tokens no
    matter when the request joins the running batch."""
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    kw = dict(max_new_tokens=6, temperature=0.9, seed=13)

    bat1 = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=3)
    alone = bat1.generate([[5, 9, 17]], **kw)[0]

    bat2 = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=3)
    first = bat2.submit([40, 2, 7, 7, 1], max_new_tokens=9)
    with bat2._lock:
        bat2._admit()
        bat2._step_chunk()  # advance the batch before the request joins
    late = bat2.submit([5, 9, 17], **kw)
    bat2.drain()
    assert late.result(timeout=60) == alone
    assert first.result(timeout=60)


def test_full_rag_loop_tpu_native(tiny_lm, tmp_path):
    """Capstone: the whole RAG loop without any external service - rasterize
    PDFs natively, embed pages, MaxSim-retrieve for a query, then generate
    an answer conditioned on the retrieved page image with the PaliGemma
    engine. Every stage is this framework's own code."""
    import warnings

    from multimodal_colpali_tpu.generation.engine import PaliGemmaEngine
    from multimodal_colpali_tpu.ingest.pdfwrite import make_sample_pdf
    from multimodal_colpali_tpu.ingest.rasterize import convert_pdf_dir_to_images
    from multimodal_colpali_tpu.models.registry import load_retriever
    from multimodal_colpali_tpu.ops.maxsim import maxsim_scores
    from multimodal_colpali_tpu.ops.topk import topk_with_stable_ties
    from multimodal_colpali_tpu.models.processing import pad_multivectors

    pdf_dir = tmp_path / "papers"
    pdf_dir.mkdir()
    for i in range(2):
        make_sample_pdf(str(pdf_dir / f"p{i}.pdf"), n_pages=2,
                        lines_per_page=4, seed=i)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        retriever = load_retriever("tiny-colpali", seed=0)
    pages = [img for imgs in convert_pdf_dir_to_images(str(pdf_dir)).values()
             for img in imgs]
    assert len(pages) == 4

    # retrieve
    d = retriever.embed_images(pages, batch_size=2)
    q = retriever.embed_queries(["what binds selectins?"])
    dp, dl = pad_multivectors(d)
    qp, ql = pad_multivectors(q)
    scores = maxsim_scores(jnp.asarray(qp), jnp.asarray(dp),
                           jnp.asarray(ql), jnp.asarray(dl))
    _, top = topk_with_stable_ties(scores, 2)
    best_page = pages[int(np.asarray(top)[0, 0])]

    # generate, conditioned on the retrieved page image
    cfg = retriever.model.cfg
    eng = PaliGemmaEngine(cfg, retriever.params)
    pix = retriever.processor.image_preprocessor([best_page])
    text_ids = retriever.processor._ids("answer the question\n")
    prompt = eng.build_mm_prompt(text_ids, bos_id=2)
    out = eng.generate([prompt], pix, max_new_tokens=6, bucket=len(prompt))[0]
    assert len(out) == 6
    assert all(0 <= t < cfg.text.vocab_size for t in out)
    # deterministic greedy: the same retrieval + generation reproduces
    assert eng.generate([prompt], pix, max_new_tokens=6,
                        bucket=len(prompt))[0] == out


def test_server_multimodal_requests(tiny_lm):
    """Messages carrying image data URLs (the reference's VLM request shape,
    functions.py:715-729) must generate conditioned on the image."""
    from PIL import Image

    from multimodal_colpali_tpu.generation.engine import (
        ModuloTokenizer, PaliGemmaEngine)
    from multimodal_colpali_tpu.generation.messages import pil_image_to_data_url
    from multimodal_colpali_tpu.generation.client import get_responses, run_sync
    from multimodal_colpali_tpu.generation.server import GenerationServer
    from multimodal_colpali_tpu.models.colpali import ColPaliModel
    from multimodal_colpali_tpu.models.processing import ImagePreprocessor
    from multimodal_colpali_tpu.models.registry import fast_random_params

    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    params = jax.tree.map(jnp.asarray,
                          fast_random_params(ColPaliModel(cfg), cfg, seed=3))
    tcfg = cfg.text
    eng = GemmaDecodeEngine(tcfg, params)
    mm = PaliGemmaEngine(cfg, params)
    tok = ModuloTokenizer(tcfg.vocab_size)
    pre = ImagePreprocessor(cfg.vision.image_size)

    def ask(srv, img):
        msg = [{"role": "user", "content": [
            {"type": "text", "text": "describe the figure"},
            {"type": "image_url",
             "image_url": {"url": pil_image_to_data_url(img)}},
        ]}]
        return run_sync(get_responses(
            "tiny", 0, [msg], base_url=srv.base_url,
            extra_body={"max_tokens": 8, "seed": 0}))[0]

    def ask_raw(srv, img):
        import json as _json
        import urllib.request

        msg = [{"role": "user", "content": [
            {"type": "text", "text": "describe the figure"},
            {"type": "image_url",
             "image_url": {"url": pil_image_to_data_url(img)}},
        ]}]
        req = urllib.request.Request(
            srv.base_url + "/chat/completions",
            data=_json.dumps({"model": "tiny", "max_tokens": 8,
                              "messages": msg}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            return _json.load(r)

    black = Image.new("RGB", (64, 64), (0, 0, 0))
    with GenerationServer(eng, tok, mm_engine=mm,
                          image_preprocessor=pre) as srv:
        a1 = ask(srv, black)
        a2 = ask(srv, black)
        raw = ask_raw(srv, black)
    assert a1 and "[error]" not in a1
    assert all(0 <= int(t) < tcfg.vocab_size for t in a1.split())
    assert a1 == a2                       # deterministic greedy
    # proof the MULTIMODAL branch served it: prompt accounting includes the
    # PaliGemma image-token prefix (num_patches), not just the text tokens
    n_text = len(tok.encode("user: describe the figure\nassistant:",
                            add_special_tokens=True))
    assert raw["usage"]["prompt_tokens"] >= n_text + cfg.vision.num_patches


def test_batcher_fuzz_against_engine(tiny_lm):
    """Property test: random prompts/budgets under random admission
    patterns must reproduce isolated engine generations exactly (greedy)."""
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    rng = np.random.default_rng(42)
    reqs = []
    for _ in range(9):
        n = int(rng.integers(1, 24))
        prompt = rng.integers(2, tcfg.vocab_size - 2, n).tolist()
        budget = int(rng.integers(1, 10))
        reqs.append((prompt, budget))
    want = [eng.generate([p], max_new_tokens=b)[0] for p, b in reqs]

    bat = ContinuousBatcher(eng, batch_slots=3, max_seq_len=64, chunk=2)
    futs = []
    for i, (p, b) in enumerate(reqs):
        futs.append(bat.submit(p, max_new_tokens=b))
        if i % 3 == 2:  # interleave admission with decoding
            with bat._lock:
                bat._admit()
                if any(r is not None for r in bat._slots):
                    bat._step_chunk()
    bat.drain()
    got = [f.result(timeout=120) for f in futs]
    assert got == want


def test_prefill_cache_reuses_identical_prompts(tiny_lm):
    """Evaluation sweeps re-ask the same questions: the second identical
    request must skip prefill (cache hit) yet produce identical tokens."""
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    bat = ContinuousBatcher(eng, batch_slots=1, max_seq_len=64, chunk=4)
    first = bat.generate([[5, 9, 17, 3]], max_new_tokens=5)[0]
    assert bat.prefill_cache_hits == 0
    second = bat.generate([[5, 9, 17, 3]], max_new_tokens=5)[0]
    assert bat.prefill_cache_hits == 1
    assert second == first
    # a different prompt misses
    bat.generate([[7, 7]], max_new_tokens=3)
    assert bat.prefill_cache_hits == 1


def test_batcher_multimodal_joins_text_batch(tiny_lm):
    """A multimodal request admitted into a running text batch must produce
    exactly the isolated PaliGemmaEngine generation, and text slots must be
    unaffected by the image neighbor (mixed-modality continuous batching)."""
    from multimodal_colpali_tpu.generation.engine import PaliGemmaEngine
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
    from multimodal_colpali_tpu.models.colpali import ColPaliModel
    from multimodal_colpali_tpu.models.registry import fast_random_params

    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    params = jax.tree.map(jnp.asarray,
                          fast_random_params(ColPaliModel(cfg), cfg, seed=3))
    tcfg = cfg.text
    eng = GemmaDecodeEngine(tcfg, params)
    mm = PaliGemmaEngine(cfg, params)

    rng = np.random.default_rng(4)
    pix = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)
    mm_prompt = mm.build_mm_prompt([5, 9, 11], bos_id=2)
    want_mm = mm.generate([mm_prompt], pix, max_new_tokens=6,
                          bucket=len(mm_prompt))[0]
    want_txt = eng.generate([[40, 2, 7]], max_new_tokens=8)[0]

    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=3,
                            prompt_bucket=len(mm_prompt), mm_engine=mm)
    assert bat.supports_multimodal
    txt_fut = bat.submit([40, 2, 7], max_new_tokens=8)
    with bat._lock:
        bat._admit()
        bat._step_chunk()  # text slot is mid-decode when the image joins
    mm_fut = bat.submit(mm_prompt, max_new_tokens=6, pixel_values=pix)
    bat.drain()
    assert mm_fut.result(timeout=60) == want_mm
    assert txt_fut.result(timeout=60) == want_txt

    # identical multimodal request hits the prefill cache and reproduces
    assert bat.generate([mm_prompt], max_new_tokens=6,
                        pixel_values=[pix])[0] == want_mm
    assert bat.prefill_cache_hits == 1
    # same prompt, different image must MISS (key includes the pixels)
    pix2 = np.zeros_like(pix)
    bat.generate([mm_prompt], max_new_tokens=6, pixel_values=[pix2])
    assert bat.prefill_cache_hits == 1

    # multimodal submit without an mm_engine fails its Future cleanly
    bare = ContinuousBatcher(eng, batch_slots=1, max_seq_len=64)
    bad = bare.submit([5], max_new_tokens=2, pixel_values=pix)
    with pytest.raises(ValueError, match="mm_engine"):
        bad.result(timeout=5)


def test_server_multimodal_through_batcher(tiny_lm):
    """The server must route image requests through a multimodal-capable
    batcher (one slot batch for both modalities) and match the dedicated
    PaliGemmaEngine path token for token."""
    from PIL import Image

    from multimodal_colpali_tpu.generation.engine import (
        ModuloTokenizer, PaliGemmaEngine)
    from multimodal_colpali_tpu.generation.messages import pil_image_to_data_url
    from multimodal_colpali_tpu.generation.client import get_responses, run_sync
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
    from multimodal_colpali_tpu.generation.server import GenerationServer
    from multimodal_colpali_tpu.models.colpali import ColPaliModel
    from multimodal_colpali_tpu.models.processing import ImagePreprocessor
    from multimodal_colpali_tpu.models.registry import fast_random_params

    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    params = jax.tree.map(jnp.asarray,
                          fast_random_params(ColPaliModel(cfg), cfg, seed=3))
    tcfg = cfg.text
    eng = GemmaDecodeEngine(tcfg, params)
    mm = PaliGemmaEngine(cfg, params)
    tok = ModuloTokenizer(tcfg.vocab_size)
    pre = ImagePreprocessor(cfg.vision.image_size)
    img = Image.new("RGB", (64, 64), (30, 60, 90))
    msg = [{"role": "user", "content": [
        {"type": "text", "text": "describe the figure"},
        {"type": "image_url", "image_url": {"url": pil_image_to_data_url(img)}},
    ]}]

    def ask(srv):
        return run_sync(get_responses(
            "tiny", 0, [msg], base_url=srv.base_url,
            extra_body={"max_tokens": 8, "seed": 0}))[0]

    with GenerationServer(eng, tok, mm_engine=mm,
                          image_preprocessor=pre) as srv:
        want = ask(srv)  # dedicated-engine path (no batcher)

    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=256, chunk=4,
                            mm_engine=mm).serve()
    try:
        with GenerationServer(bat, tok, mm_engine=mm,
                              image_preprocessor=pre) as srv:
            got = ask(srv)
            # text requests still served from the same batch
            plain = run_sync(get_responses(
                "tiny", 0, [[{"role": "user", "content": "hi"}]],
                base_url=srv.base_url, extra_body={"max_tokens": 4}))[0]
    finally:
        bat.shutdown()
    assert got == want
    assert plain and "[error]" not in plain


def _sse_events(resp):
    """Parse an SSE body into its `data:` payload strings."""
    out = []
    for line in resp:
        line = line.decode().strip()
        if line.startswith("data: "):
            out.append(line[6:])
    return out


def test_batcher_streaming_callback_matches_result(tiny_lm):
    """submit(on_token=...) streams exactly the tokens future.result()
    returns - including under pool preemption + readmission (paged), where
    the stream must resume where it left off rather than replaying."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompts = [list(range(2, 18)), list(range(5, 17)), list(range(7, 21))]
    # pool sized to force preemption while all three run (same shape as
    # test_paged_pool_oversubscription_preempts_and_completes)
    bat = PagedContinuousBatcher(eng, batch_slots=3, max_seq_len=64,
                                 chunk=4, page_size=8, pool_pages=9)
    streams = [[] for _ in prompts]
    futs = [bat.submit(p, max_new_tokens=10, temperature=0.7, seed=i,
                       on_token=streams[i].append)
            for i, p in enumerate(prompts)]
    bat.drain()
    assert bat.preemptions > 0
    for fut, seen in zip(futs, streams):
        assert seen == fut.result(timeout=10)


def test_server_sse_stream_matches_non_streaming(tiny_lm):
    """stream: true serves OpenAI chat.completion.chunk SSE whose
    concatenated deltas equal the non-streaming content, ending in
    data: [DONE] (the vLLM streaming protocol surface)."""
    import json
    import urllib.request

    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
    from multimodal_colpali_tpu.generation.server import GenerationServer

    tcfg, params = tiny_lm
    tok = ByteTokenizer()

    class ModTok:
        pad_id, bos_id, eos_id = 0, 1, -1

        def encode(self, text, add_special_tokens=False):
            ids = [2 + (i % 60) for i in tok.encode(text)]
            return ([self.bos_id] + ids) if add_special_tokens else ids

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    eng = GemmaDecodeEngine(tcfg, params)
    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=3).serve()
    try:
        with GenerationServer(bat, ModTok(), model_name="tiny-gemma") as srv:
            req = {"model": "tiny-gemma", "max_tokens": 6, "seed": 0,
                   "messages": [{"role": "user", "content": "stream me"}]}
            r = urllib.request.urlopen(urllib.request.Request(
                f"{srv.base_url}/chat/completions",
                data=json.dumps({**req, "stream": True}).encode(),
                headers={"Content-Type": "application/json"}), timeout=120)
            assert r.headers.get("Content-Type") == "text/event-stream"
            events = _sse_events(r)
            assert events[-1] == "[DONE]"
            chunks = [json.loads(e) for e in events[:-1]]
            assert all(c["object"] == "chat.completion.chunk" for c in chunks)
            text = "".join(c["choices"][0]["delta"].get("content", "")
                           for c in chunks)
            assert chunks[0]["choices"][0]["delta"]["role"] == "assistant"
            assert chunks[-1]["choices"][0]["finish_reason"] == "length"
            # content arrived incrementally, not as one terminal blob
            assert sum(1 for c in chunks
                       if c["choices"][0]["delta"].get("content")) > 1

            r2 = urllib.request.urlopen(urllib.request.Request(
                f"{srv.base_url}/chat/completions",
                data=json.dumps(req).encode(),
                headers={"Content-Type": "application/json"}), timeout=120)
            want = json.loads(r2.read())["choices"][0]["message"]["content"]
            assert text == want
    finally:
        bat.shutdown()


def test_server_streaming_constrained_and_plain_engine(tiny_lm):
    """Streaming also covers the non-incremental configurations: a bare
    (non-batcher) engine emits its completion as one SSE content chunk, and
    a constrained enum request streams the full JSON answer."""
    import json
    import urllib.request

    from multimodal_colpali_tpu.generation.client import mcq_response_format
    from multimodal_colpali_tpu.generation.server import GenerationServer

    tcfg, params = tiny_lm
    tok = ByteTokenizer()

    class ModTok:
        pad_id, bos_id, eos_id = 0, 1, -1

        def encode(self, text, add_special_tokens=False):
            ids = [2 + (i % 60) for i in tok.encode(text)]
            return ([self.bos_id] + ids) if add_special_tokens else ids

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    eng = GemmaDecodeEngine(tcfg, params)
    with GenerationServer(eng, ModTok(), model_name="tiny-gemma") as srv:
        req = {"model": "tiny-gemma", "max_tokens": 4, "stream": True,
               "messages": [{"role": "user", "content": "pick"}]}
        r = urllib.request.urlopen(urllib.request.Request(
            f"{srv.base_url}/chat/completions", data=json.dumps(req).encode(),
            headers={"Content-Type": "application/json"}), timeout=120)
        events = _sse_events(r)
        chunks = [json.loads(e) for e in events[:-1]]
        text = "".join(c["choices"][0]["delta"].get("content", "")
                       for c in chunks)
        assert events[-1] == "[DONE]" and text

        req["response_format"] = mcq_response_format()
        r = urllib.request.urlopen(urllib.request.Request(
            f"{srv.base_url}/chat/completions", data=json.dumps(req).encode(),
            headers={"Content-Type": "application/json"}), timeout=120)
        chunks = [json.loads(e) for e in _sse_events(r)[:-1]]
        text = "".join(c["choices"][0]["delta"].get("content", "")
                       for c in chunks)
        assert json.loads(text)["answer"] in {"A", "B", "C", "D"}
        assert chunks[-1]["choices"][0]["finish_reason"] == "stop"


def test_server_tokenizer_without_special_kwarg(tiny_lm):
    """The documented tokenizer contract is just encode/decode; a tokenizer
    whose encode() lacks the add_special_tokens kwarg (SimpleTokenizer
    shape) must work through the server's encode shim, not TypeError."""
    import json
    import urllib.request

    tcfg, params = tiny_lm
    tok = ByteTokenizer()

    from multimodal_colpali_tpu.generation.server import GenerationServer

    class BareTok:
        pad_id, bos_id, eos_id = 0, 1, -1

        def encode(self, text):
            return [2 + (i % 60) for i in tok.encode(text)]

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    eng = GemmaDecodeEngine(tcfg, params)
    with GenerationServer(eng, BareTok(), model_name="tiny-gemma") as srv:
        req = {"model": "tiny-gemma", "max_tokens": 4,
               "messages": [{"role": "user", "content": "no kwarg"}]}
        r = urllib.request.urlopen(urllib.request.Request(
            f"{srv.base_url}/chat/completions", data=json.dumps(req).encode(),
            headers={"Content-Type": "application/json"}), timeout=120)
        out = json.loads(r.read())
        assert out["choices"][0]["message"]["content"]


def test_filter_top_p_top_k_matches_numpy_reference():
    """Nucleus/top-k filtering: top_k keeps exactly the k largest, top_p the
    smallest prefix of the sorted distribution reaching mass p, and default
    parameters are a bit-exact no-op (historical streams unchanged)."""
    from multimodal_colpali_tpu.generation.engine import filter_top_p_top_k

    rng = np.random.default_rng(0)
    logits = rng.standard_normal((4, 32)).astype(np.float32)

    out = np.asarray(filter_top_p_top_k(jnp.asarray(logits), 1.0, 0))
    assert np.array_equal(out, logits)

    out = np.asarray(filter_top_p_top_k(jnp.asarray(logits), 1.0, 3))
    for r in range(4):
        assert set(np.flatnonzero(np.isfinite(out[r]))) == \
            set(np.argsort(logits[r])[-3:])

    def np_top_p(row, p):
        order = np.argsort(row)[::-1]
        probs = np.exp(row - row.max()); probs /= probs.sum()
        n_keep = int(np.searchsorted(np.cumsum(probs[order]), p) + 1)
        return set(order[:n_keep])

    out = np.asarray(filter_top_p_top_k(jnp.asarray(logits), 0.7, 0))
    for r in range(4):
        assert set(np.flatnonzero(np.isfinite(out[r]))) == \
            np_top_p(logits[r], 0.7)

    # per-row parameter arrays broadcast (the batchers' per-slot case)
    out = np.asarray(filter_top_p_top_k(
        jnp.asarray(logits), jnp.asarray([1.0, 0.5, 1.0, 0.9]),
        jnp.asarray([0, 0, 1, 0])))
    assert np.array_equal(out[0], logits[0])
    assert np.isfinite(out[2]).sum() == 1


def test_top_p_top_k_batcher_matches_engine(tiny_lm):
    """top_p/top_k sampling streams bit-match the engine oracle through
    both batchers, and top_k=1 reduces to greedy despite temperature."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompts = [[5, 9, 17, 3], [40, 2], list(range(3, 24))]
    want = [eng.generate([p], max_new_tokens=8, temperature=0.8, seed=i,
                         top_p=0.8, top_k=5)[0]
            for i, p in enumerate(prompts)]

    for batcher in (ContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                      chunk=3),
                    PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                           chunk=3, page_size=8)):
        futs = [batcher.submit(p, max_new_tokens=8, temperature=0.8, seed=i,
                               top_p=0.8, top_k=5)
                for i, p in enumerate(prompts)]
        batcher.drain()
        assert [f.result(10) for f in futs] == want

    greedy = eng.generate(prompts, max_new_tokens=8, temperature=0.0)
    k1 = eng.generate(prompts, max_new_tokens=8, temperature=0.9, seed=7,
                      top_k=1)
    assert greedy == k1


def test_server_accepts_top_p_top_k(tiny_lm):
    """top_p (OpenAI param) and top_k (vLLM extension) flow through the
    server to the engine; a top_k=1 sampled request equals greedy."""
    import json
    import urllib.request

    from multimodal_colpali_tpu.generation.server import GenerationServer

    tcfg, params = tiny_lm
    tok = ByteTokenizer()

    class ModTok:
        pad_id, bos_id, eos_id = 0, 1, -1

        def encode(self, text, add_special_tokens=False):
            ids = [2 + (i % 60) for i in tok.encode(text)]
            return ([self.bos_id] + ids) if add_special_tokens else ids

        def decode(self, ids):
            return " ".join(str(i) for i in ids)

    eng = GemmaDecodeEngine(tcfg, params)
    with GenerationServer(eng, ModTok(), model_name="tiny-gemma") as srv:
        def ask(extra):
            req = {"model": "tiny-gemma", "max_tokens": 6, "seed": 3,
                   "messages": [{"role": "user", "content": "sample me"}],
                   **extra}
            r = urllib.request.urlopen(urllib.request.Request(
                f"{srv.base_url}/chat/completions",
                data=json.dumps(req).encode(),
                headers={"Content-Type": "application/json"}), timeout=120)
            return json.loads(r.read())["choices"][0]["message"]["content"]

        greedy = ask({})
        k1 = ask({"temperature": 0.9, "top_k": 1})
        assert k1 == greedy
        sampled = ask({"temperature": 0.9, "top_p": 0.9})
        assert sampled  # valid completion under nucleus sampling


def test_device_random_params_loads_and_embeds():
    """device_init materializes random weights on the accelerator (ONE jit
    program, no host-generated tree crossing the link - the only practical
    cold-start for the 3B flagship through the TPU tunnel) and the
    Retriever must NOT round-trip those params through the host."""
    import warnings

    from PIL import Image

    from multimodal_colpali_tpu.models.registry import load_retriever

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ret = load_retriever("tiny-colpali", device_init=True)
    leaf = jax.tree_util.tree_leaves(ret.params)[0]
    assert isinstance(leaf, jax.Array) and leaf.dtype == jnp.bfloat16
    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    out = ret.embed_images([img])
    assert out[0].ndim == 2 and np.isfinite(out[0]).all()
    # deterministic per seed
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ret2 = load_retriever("tiny-colpali", device_init=True)
    np.testing.assert_array_equal(np.asarray(leaf, np.float32),
                                  np.asarray(
                                      jax.tree_util.tree_leaves(ret2.params)[0],
                                      np.float32))


def test_batcher_logprobs_match_next_token_oracle(tiny_lm):
    """submit(logprobs=N) resolves the future to (tokens, logprobs, tops);
    each logprob equals the raw next-token log_softmax the engine reports
    for the same context, and the top-N sets match."""
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=3)
    prompt = [5, 9, 17, 3]
    fut = bat.submit(prompt, max_new_tokens=5, logprobs=3)
    bat.drain()
    toks, lps, tops = fut.result(10)
    assert len(toks) == len(lps) == len(tops) == 5
    ctx = list(prompt)
    for tok, lp, top in zip(toks, lps, tops):
        logits = eng.next_token_logits([ctx])[0]
        logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits, jnp.float32)))
        assert tok == int(np.argmax(logits))          # greedy stream
        assert abs(logp[tok] - lp) < 2e-2
        assert set(t for t, _ in top) == set(np.argsort(logp)[-3:])
        ctx.append(tok)


def test_paged_preempted_logprob_stream_matches_uninterrupted(tiny_lm):
    """Preemption + recompute resumes the logprob record where it left off:
    (tokens, logprobs) equal the uninterrupted paged run's."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompts = [list(range(2, 18)), list(range(5, 17)), list(range(7, 21))]

    def run(pool_pages):
        bat = PagedContinuousBatcher(eng, batch_slots=3, max_seq_len=64,
                                     chunk=4, page_size=8,
                                     pool_pages=pool_pages)
        futs = [bat.submit(p, max_new_tokens=10, temperature=0.7, seed=i,
                           logprobs=2) for i, p in enumerate(prompts)]
        bat.drain()
        return bat, [f.result(10) for f in futs]

    tight, res = run(9)
    assert tight.preemptions > 0
    _, base = run(None)
    for (t1, l1, _), (t2, l2, _) in zip(res, base):
        assert t1 == t2
        assert all(abs(a - b) < 2e-2 for a, b in zip(l1, l2))


def test_server_logprobs_surface(tiny_lm):
    """logprobs: true + top_logprobs: N returns the OpenAI logprobs field
    (token string, logprob, top alternatives) through the batcher server."""
    import json
    import urllib.request

    from multimodal_colpali_tpu.generation.engine import ModuloTokenizer
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
    from multimodal_colpali_tpu.generation.server import GenerationServer

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=3).serve()
    try:
        with GenerationServer(bat, ModuloTokenizer(64),
                              max_new_tokens=8) as srv:
            req = {"model": "t", "max_tokens": 4, "logprobs": True,
                   "top_logprobs": 3,
                   "messages": [{"role": "user", "content": "why"}]}
            out = json.loads(urllib.request.urlopen(urllib.request.Request(
                f"{srv.base_url}/chat/completions",
                data=json.dumps(req).encode(),
                headers={"Content-Type": "application/json"}),
                timeout=120).read())
            lp = out["choices"][0]["logprobs"]["content"]
            assert len(lp) == 4
            assert all(len(e["top_logprobs"]) == 3 for e in lp)
            assert all(e["logprob"] <= 0 for e in lp)
            # chosen-token logprob appears in its own top list (greedy)
            assert all(any(abs(t["logprob"] - e["logprob"]) < 1e-6
                           for t in e["top_logprobs"]) for e in lp)
    finally:
        bat.shutdown()


def test_server_multimodal_streaming_and_logprobs(tiny_lm):
    """Image requests through the batcher server work with stream: true and
    logprobs: true (regression: submit() takes the single request's
    [1, H, W, 3] pixel batch - list-wrapping it crashed the scheduler loop
    and failed every in-flight request)."""
    import json
    import urllib.request

    from PIL import Image

    from multimodal_colpali_tpu.generation.engine import (
        ModuloTokenizer, PaliGemmaEngine)
    from multimodal_colpali_tpu.generation.messages import pil_image_to_data_url
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
    from multimodal_colpali_tpu.generation.server import GenerationServer
    from multimodal_colpali_tpu.models.colpali import ColPaliModel
    from multimodal_colpali_tpu.models.processing import ImagePreprocessor
    from multimodal_colpali_tpu.models.registry import fast_random_params

    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    params = jax.tree.map(jnp.asarray,
                          fast_random_params(ColPaliModel(cfg), cfg, seed=3))
    eng = GemmaDecodeEngine(cfg.text, params)
    mm = PaliGemmaEngine(cfg, params)
    pre = ImagePreprocessor(cfg.vision.image_size)
    img = Image.new("RGB", (64, 64), (30, 60, 90))
    msg = [{"role": "user", "content": [
        {"type": "text", "text": "describe"},
        {"type": "image_url", "image_url": {"url": pil_image_to_data_url(img)}},
    ]}]
    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=256, chunk=4,
                            mm_engine=mm).serve()
    try:
        with GenerationServer(bat, ModuloTokenizer(64), mm_engine=mm,
                              image_preprocessor=pre) as srv:
            def post(req):
                return urllib.request.urlopen(urllib.request.Request(
                    f"{srv.base_url}/chat/completions",
                    data=json.dumps(req).encode(),
                    headers={"Content-Type": "application/json"}),
                    timeout=120)

            base = {"model": "t", "messages": msg, "max_tokens": 5, "seed": 0}
            want = json.loads(post(base).read())["choices"][0]["message"]["content"]
            ev = _sse_events(post({**base, "stream": True}))
            text = "".join(json.loads(e)["choices"][0]["delta"].get("content", "")
                           for e in ev[:-1])
            assert ev[-1] == "[DONE]" and text == want

            out = json.loads(post({**base, "logprobs": True,
                                   "top_logprobs": 2}).read())
            lp = out["choices"][0]["logprobs"]["content"]
            assert len(lp) == 5 and all(len(e["top_logprobs"]) == 2 for e in lp)
            assert out["choices"][0]["message"]["content"] == want
    finally:
        bat.shutdown()


def test_server_top_p_zero_is_greedy(tiny_lm):
    """top_p: 0 is OpenAI's greedy extreme: the filter clamps to the top-1
    token (regression: a falsy-zero `or` default coerced it to 1.0 = full
    random sampling; filter also must never mask the whole vocab)."""
    import json
    import urllib.request

    from multimodal_colpali_tpu.generation.engine import ModuloTokenizer
    from multimodal_colpali_tpu.generation.server import GenerationServer

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    with GenerationServer(eng, ModuloTokenizer(64)) as srv:
        def ask(extra):
            req = {"model": "t", "max_tokens": 5, "seed": 4,
                   "messages": [{"role": "user", "content": "zero"}], **extra}
            r = urllib.request.urlopen(urllib.request.Request(
                f"{srv.base_url}/chat/completions",
                data=json.dumps(req).encode(),
                headers={"Content-Type": "application/json"}), timeout=120)
            return json.loads(r.read())["choices"][0]["message"]["content"]

        assert ask({"temperature": 1.0, "top_p": 0}) == ask({})


def test_stream_flush_with_unstable_detokenizer(tiny_lm):
    """A tokenizer whose partial decodes end in the replacement char (how
    HF renders incomplete multi-byte sequences) must still stream the FULL
    final text: trailing U+FFFD is held back, and the post-loop flush
    emits whatever the complete decode holds past the sent prefix."""
    import json
    import urllib.request

    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
    from multimodal_colpali_tpu.generation.server import GenerationServer

    tcfg, params = tiny_lm
    tok = ByteTokenizer()

    class PairTok:
        """ids 7,8 adjacent decode to one char; a trailing 7 is partial."""
        pad_id, bos_id, eos_id = 0, 1, -1

        def encode(self, text, add_special_tokens=False):
            ids = [2 + (i % 60) for i in tok.encode(text)]
            return ([self.bos_id] + ids) if add_special_tokens else ids

        def decode(self, ids):
            ids = list(ids)
            out, i = [], 0
            while i < len(ids):
                if ids[i] == 7 and i + 1 < len(ids) and ids[i + 1] == 8:
                    out.append("é"); i += 2
                elif ids[i] == 7 and i + 1 == len(ids):
                    out.append("�"); i += 1
                else:
                    out.append(str(ids[i])); i += 1
            return " ".join(out)

    class ScriptedBatcher:
        """Emits a FIXED stream exercising pair-merge and a trailing
        partial: [5, 7, 8, 9, 7] -> "5 é 9 <replacement>"."""

        toks = [5, 7, 8, 9, 7]

        def submit(self, ids, max_new_tokens, temperature, eos_id, seed,
                   pixel_values=None, on_token=None, top_p=1.0, top_k=0,
                   logprobs=0):
            import threading
            from concurrent.futures import Future

            fut: Future = Future()

            def run():
                for t in self.toks:
                    on_token(t)
                fut.set_result(list(self.toks))

            threading.Thread(target=run, daemon=True).start()
            return fut

    ptok = PairTok()
    with GenerationServer(ScriptedBatcher(), ptok, max_new_tokens=8) as srv:
        req = {"model": "t", "max_tokens": 6, "stream": True,
               "messages": [{"role": "user", "content": "pairs"}]}
        r = urllib.request.urlopen(urllib.request.Request(
            f"{srv.base_url}/chat/completions",
            data=json.dumps(req).encode(),
            headers={"Content-Type": "application/json"}), timeout=120)
        ev = _sse_events(r)
        chunks = [json.loads(e) for e in ev[:-1]]
        text = "".join(c["choices"][0]["delta"].get("content", "")
                       for c in chunks)
        want = ptok.decode(ScriptedBatcher.toks)
        assert text == want, (text, want)
        # the merged pair streamed incrementally (not one terminal blob)
        assert sum(1 for c in chunks
                   if c["choices"][0]["delta"].get("content")) >= 3


def test_paligemma_two_image_generation_matches_hf(tiny_lm):
    """Multi-image prompts (the reference serves up to 10 images/prompt,
    00_run_docker_containers.sh:37-38; exp-02 builds multi-image context,
    05_experiment02.py:155-166): a 2-image prompt must match torch
    PaliGemma with the same ported weights - patches consumed in image
    order by the masked scatter."""
    torch = pytest.importorskip("torch")
    from transformers import ColPaliForRetrieval, ColPaliConfig
    from transformers.models.paligemma import PaliGemmaConfig

    from multimodal_colpali_tpu.generation.engine import PaliGemmaEngine
    from multimodal_colpali_tpu.models import hf_import

    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    hf_cfg = ColPaliConfig(
        vlm_config=PaliGemmaConfig(
            vision_config=dict(
                hidden_size=cfg.vision.hidden_size,
                intermediate_size=cfg.vision.intermediate_size,
                num_hidden_layers=cfg.vision.num_hidden_layers,
                num_attention_heads=cfg.vision.num_attention_heads,
                image_size=cfg.vision.image_size,
                patch_size=cfg.vision.patch_size,
            ),
            text_config=dict(
                hidden_size=cfg.text.hidden_size,
                intermediate_size=cfg.text.intermediate_size,
                num_hidden_layers=cfg.text.num_hidden_layers,
                num_attention_heads=cfg.text.num_attention_heads,
                num_key_value_heads=cfg.text.num_key_value_heads,
                head_dim=cfg.text.head_dim,
                vocab_size=cfg.text.vocab_size,
            ),
            projection_dim=cfg.text.hidden_size,
            image_token_index=cfg.image_token_id,
        ),
        embedding_dim=cfg.embedding_dim,
    )
    torch.manual_seed(0)
    hf = ColPaliForRetrieval(hf_cfg).eval()
    params = hf_import.colpali_params_from_hf(hf.state_dict(), cfg)

    rng = np.random.default_rng(7)
    eng = PaliGemmaEngine(cfg, params)
    text_ids = [5, 9, 11]
    prompt = eng.build_mm_prompt(text_ids, bos_id=2, n_images=2)
    assert prompt.count(cfg.image_token_id) == 2 * cfg.vision.num_patches
    pix = rng.standard_normal(
        (2, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)

    got = eng.generate([prompt], pix[None], max_new_tokens=5,
                       bucket=len(prompt))[0]

    vlm = hf.vlm
    ids_t = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        out = vlm.generate(
            input_ids=ids_t,
            attention_mask=torch.ones_like(ids_t),
            pixel_values=torch.from_numpy(pix.transpose(0, 3, 1, 2)),
            max_new_tokens=5, do_sample=False,
        )
    want = out[0, len(prompt):].tolist()
    assert got == want, (got, want)


def test_server_multi_image_requests(tiny_lm):
    """Messages carrying SEVERAL image data URLs must condition generation
    on every image (regression: images[1:] were silently dropped). The
    usage accounting proves both image prefixes entered the prompt, and a
    different second image changes the greedy answer."""
    from PIL import Image

    from multimodal_colpali_tpu.generation.engine import (
        ModuloTokenizer, PaliGemmaEngine)
    from multimodal_colpali_tpu.generation.messages import pil_image_to_data_url
    from multimodal_colpali_tpu.generation.server import GenerationServer
    from multimodal_colpali_tpu.models.colpali import ColPaliModel
    from multimodal_colpali_tpu.models.processing import ImagePreprocessor
    from multimodal_colpali_tpu.models.registry import fast_random_params

    import json as _json
    import urllib.request

    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    params = jax.tree.map(jnp.asarray,
                          fast_random_params(ColPaliModel(cfg), cfg, seed=3))
    eng = GemmaDecodeEngine(cfg.text, params)
    mm = PaliGemmaEngine(cfg, params)
    tok = ModuloTokenizer(cfg.text.vocab_size)
    pre = ImagePreprocessor(cfg.vision.image_size)

    def ask(srv, imgs):
        msg = [{"role": "user", "content":
                [{"type": "text", "text": "compare the figures"}]
                + [{"type": "image_url",
                    "image_url": {"url": pil_image_to_data_url(im)}}
                   for im in imgs]}]
        req = urllib.request.Request(
            srv.base_url + "/chat/completions",
            data=_json.dumps({"model": "tiny", "max_tokens": 8,
                              "messages": msg}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return _json.load(r)

    black = Image.new("RGB", (64, 64), (0, 0, 0))
    white = Image.new("RGB", (64, 64), (255, 255, 255))
    noise = Image.fromarray(
        (np.random.default_rng(0).integers(0, 255, (64, 64, 3))
         ).astype(np.uint8))
    with GenerationServer(eng, tok, mm_engine=mm,
                          image_preprocessor=pre) as srv:
        r_bw = ask(srv, [black, white])
        r_bn = ask(srv, [black, noise])
    n_text = len(tok.encode("user: compare the figures\nassistant:",
                            add_special_tokens=True))
    # both image prefixes are in the prompt accounting
    assert r_bw["usage"]["prompt_tokens"] >= \
        n_text + 2 * cfg.vision.num_patches
    # the SECOND image influences the answer
    a_bw = r_bw["choices"][0]["message"]["content"]
    a_bn = r_bn["choices"][0]["message"]["content"]
    assert a_bw != a_bn, "second image did not condition the generation"
