"""Paged-KV decode attention + paged continuous batcher.

Oracle for the kernel: models/layers.attention over the equivalent dense
cache (the same math the contiguous scheduler uses). Oracle for the
batcher: GemmaDecodeEngine.generate / the contiguous ContinuousBatcher.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.ops.paged_attention import (
    paged_attention, paged_attention_xla)


def _make_case(rng, b=3, hq=8, hkv=2, d=64, page=16, nb=4, dtype=jnp.float32):
    p_phys = b * nb + 3  # a few spare pages
    q = jnp.asarray(rng.standard_normal((b, hq, d)), dtype)
    k_pool = jnp.asarray(rng.standard_normal((p_phys, page, hkv, d)), dtype)
    v_pool = jnp.asarray(rng.standard_normal((p_phys, page, hkv, d)), dtype)
    # shuffled non-contiguous page assignment, like a real allocator
    perm = rng.permutation(p_phys)[: b * nb].reshape(b, nb)
    block_tables = jnp.asarray(perm, jnp.int32)
    lengths = jnp.asarray(rng.integers(1, nb * page + 1, (b,)), jnp.int32)
    return q, k_pool, v_pool, block_tables, lengths


def _dense_oracle(q, k_pool, v_pool, block_tables, lengths, scale):
    """Gather the logical view and run the production einsum attention."""
    b, hq, d = q.shape
    _, page, hkv, _ = k_pool.shape
    nb = block_tables.shape[1]
    k = k_pool[block_tables].reshape(b, nb * page, hkv, d)
    v = v_pool[block_tables].reshape(b, nb * page, hkv, d)
    out = L.attention(q[:, None], k, v, mask=None, scale=scale,
                      kv_lens=lengths)
    return out[:, 0]


def test_paged_attention_xla_matches_dense_attention():
    rng = np.random.default_rng(0)
    q, kp, vp, bt, lens = _make_case(rng)
    scale = 0.125
    got = paged_attention_xla(q, kp, vp, bt, lens, scale=scale)
    want = _dense_oracle(q, kp, vp, bt, lens, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("hq,hkv", [(8, 8), (8, 2), (8, 1)])
def test_paged_kernel_interpret_matches_xla(hq, hkv):
    rng = np.random.default_rng(1)
    q, kp, vp, bt, lens = _make_case(rng, hq=hq, hkv=hkv)
    scale = 0.125
    got = paged_attention(q, kp, vp, bt, lens, scale=scale, interpret=True)
    want = paged_attention_xla(q, kp, vp, bt, lens, scale=scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_paged_kernel_zero_length_slot_is_finite():
    rng = np.random.default_rng(2)
    q, kp, vp, bt, lens = _make_case(rng, b=2)
    lens = jnp.asarray([0, 5], jnp.int32)
    out = paged_attention(q, kp, vp, bt, lens, scale=0.125, interpret=True)
    assert np.all(np.isfinite(np.asarray(out)))


# -- paged continuous batcher --------------------------------------------------

from multimodal_colpali_tpu.generation.engine import GemmaDecodeEngine
from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher
from multimodal_colpali_tpu.models.colpali import ColPaliModel
from multimodal_colpali_tpu.models.configs import ColPaliModelConfig
from multimodal_colpali_tpu.models.registry import fast_random_params


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    model = ColPaliModel(cfg)
    params = jax.tree.map(jnp.asarray, fast_random_params(model, cfg, seed=3))
    return cfg.text, params


def test_paged_batcher_matches_engine_greedy(tiny_lm):
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompts = [[5, 9, 17, 3], [40, 2], list(range(3, 24))]
    want = eng.generate(prompts, max_new_tokens=6)
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=8)
    got = bat.generate(prompts, max_new_tokens=6)
    assert got == want


def test_paged_batcher_matches_engine_sampled(tiny_lm):
    """Temperature sampling must replay the engine's per-request stream
    (seed folded with the request's own step index). The batcher contract
    is per-request: each stream matches an ISOLATED engine.generate (the
    engine's batched sampling draws one noise tensor for the whole batch,
    so batched rows are not the per-request streams)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompts = [[5, 9, 17, 3], [40, 2]]
    kw = dict(max_new_tokens=7, temperature=1.3, seed=11)
    want = [eng.generate([p], **kw)[0] for p in prompts]
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=4, page_size=8)
    got = bat.generate(prompts, **kw)
    assert got == want


def test_paged_pool_oversubscription_preempts_and_completes(tiny_lm):
    """A pool too small for all requests at once must still complete every
    request, via preemption + recompute, with bit-identical tokens."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompts = [list(range(2, 18)), list(range(5, 17)), list(range(7, 21))]
    want = eng.generate(prompts, max_new_tokens=10)
    # 3 slots want ~16 prompt + 10 new tokens each (4 pages apiece @ page=8);
    # 8 usable pages force eviction while all three run
    bat = PagedContinuousBatcher(eng, batch_slots=3, max_seq_len=64,
                                 chunk=4, page_size=8, pool_pages=9)
    got = bat.generate(prompts, max_new_tokens=10)
    assert got == want
    assert bat.preemptions > 0, "pool was sized to force preemption"


def test_paged_prompt_exceeding_pool_fails_loudly(tiny_lm):
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=4, page_size=8, pool_pages=3)
    fut = bat.submit(list(range(2, 34)), max_new_tokens=4)  # 4 pages needed
    bat.drain()
    with pytest.raises(ValueError, match="exceeds the KV capacity"):
        fut.result(timeout=10)


def test_paged_infeasible_decode_budget_fails_alone(tiny_lm):
    """A request whose PROMPT fits the free pool but whose decode budget
    can never fit even with the pool to itself must fail with its own
    ValueError - not get admitted and then crash the whole scheduler from
    `_ensure_chunk_capacity` (which would fail every in-flight request)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=8, pool_pages=5)
    ok = bat.submit([5, 9, 17], max_new_tokens=4)        # 1 page, feasible
    # 32-token prompt = all 4 usable pages; budget 8 needs a 5th page
    bad = bat.submit(list(range(1, 33)), max_new_tokens=8)
    bat.drain()
    assert ok.result(timeout=10) == eng.generate(
        [[5, 9, 17]], max_new_tokens=4)[0]
    with pytest.raises(ValueError, match="exceeds the KV capacity"):
        bad.result(timeout=10)
    # a budget that ends at prefill (single token) needs only prompt pages
    one = bat.submit(list(range(1, 33)), max_new_tokens=1)
    bat.drain()
    assert len(one.result(timeout=10)) <= 1


def test_paged_staggered_admission_matches_isolated(tiny_lm):
    """Requests admitted while others are mid-decode produce exactly the
    isolated-generation tokens (the parent scheduler's key invariant)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=2, page_size=8)
    f1 = bat.submit([5, 9, 17, 3], max_new_tokens=8)
    with bat._lock:
        bat._admit()
        bat._step_chunk()          # first request mid-flight
    f2 = bat.submit([40, 2, 7], max_new_tokens=6)
    bat.drain()
    assert f1.result(10) == eng.generate([[5, 9, 17, 3]], max_new_tokens=8)[0]
    assert f2.result(10) == eng.generate([[40, 2, 7]], max_new_tokens=6)[0]


def test_paged_batcher_multimodal_matches_isolated(tiny_lm):
    """A multimodal (image-conditioned) request decodes in the paged slot
    batch next to a text request, matching the isolated PaliGemmaEngine
    stream (prefill goes through the parent's mm path; the paged layout is
    modality-agnostic from the first decode step on)."""
    from multimodal_colpali_tpu.generation.engine import PaliGemmaEngine

    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    params = jax.tree.map(jnp.asarray,
                          fast_random_params(ColPaliModel(cfg), cfg, seed=3))
    eng = GemmaDecodeEngine(cfg.text, params)
    mm = PaliGemmaEngine(cfg, params)

    rng = np.random.default_rng(4)
    pix = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)).astype(np.float32)
    mm_prompt = mm.build_mm_prompt([5, 9, 11], bos_id=2)
    want_mm = mm.generate([mm_prompt], pix, max_new_tokens=6,
                          bucket=len(mm_prompt))[0]
    want_txt = eng.generate([[40, 2, 7]], max_new_tokens=8)[0]

    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=3,
                                 prompt_bucket=len(mm_prompt), mm_engine=mm,
                                 page_size=8)
    txt_fut = bat.submit([40, 2, 7], max_new_tokens=8)
    mm_fut = bat.submit(mm_prompt, max_new_tokens=6, pixel_values=pix)
    bat.drain()
    assert mm_fut.result(timeout=60) == want_mm
    assert txt_fut.result(timeout=60) == want_txt


def test_paged_batcher_fuzz_with_preemption(tiny_lm):
    """Property test: random prompts/budgets under random admission, a
    deliberately tight page pool (forcing preemption + readmission), and
    mixed temperatures must reproduce isolated engine generations exactly."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    rng = np.random.default_rng(7)
    reqs = []
    for i in range(9):
        n = int(rng.integers(1, 24))
        prompt = rng.integers(2, tcfg.vocab_size - 2, n).tolist()
        budget = int(rng.integers(1, 10))
        temp = float(rng.choice([0.0, 1.2]))
        reqs.append((prompt, budget, temp, i))
    want = [eng.generate([p], max_new_tokens=b, temperature=t, seed=s)[0]
            for p, b, t, s in reqs]

    # 3 slots, pool of 10 usable pages @ 8 tokens: three 24-token prompts
    # can't coexist, so growth forces preemptions mid-run
    bat = PagedContinuousBatcher(eng, batch_slots=3, max_seq_len=64, chunk=2,
                                 page_size=8, pool_pages=11)
    futs = []
    for i, (p, b, t, s) in enumerate(reqs):
        futs.append(bat.submit(p, max_new_tokens=b, temperature=t, seed=s))
        if i % 3 == 2:  # interleave admission with decoding
            with bat._lock:
                bat._admit()
                if any(r is not None for r in bat._slots):
                    bat._step_chunk()
    bat.drain()
    got = [f.result(timeout=120) for f in futs]
    assert got == want
    # allocator bookkeeping: every page returned to the free list
    assert sorted(bat._free) == list(range(1, bat.P))
    assert all(not pages for pages in bat._slot_pages)


# -- int8 KV pool --------------------------------------------------------------

from multimodal_colpali_tpu.ops.paged_attention import (
    paged_attention_int8, paged_attention_int8_xla, quantize_kv_rows)


def test_int8_paged_kernel_matches_oracles():
    """The int8 Pallas kernel (interpret) matches the dequantize-then-attend
    XLA oracle, and the int8 path stays within quantization error of the
    bf16 attention on the same underlying K/V."""
    rng = np.random.default_rng(0)
    b, hq, hkv, d, page, nb, P = 3, 8, 2, 64, 8, 4, 13
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.bfloat16)
    kf = rng.standard_normal((P, page, hkv, d)).astype(np.float32)
    vf = rng.standard_normal((P, page, hkv, d)).astype(np.float32)
    bt = jnp.asarray(rng.integers(1, P, (b, nb)), jnp.int32)
    lens = jnp.asarray([5, 17, 32], jnp.int32)

    kq, ks = quantize_kv_rows(jnp.asarray(kf))
    vq, vs = quantize_kv_rows(jnp.asarray(vf))
    o_kern = np.asarray(paged_attention_int8(
        q, kq, ks, vq, vs, bt, lens, scale=0.125, interpret=True), np.float32)
    o_xla = np.asarray(paged_attention_int8_xla(
        q, kq, ks, vq, vs, bt, lens, scale=0.125), np.float32)
    assert np.abs(o_kern - o_xla).max() < 0.035

    o_bf16 = np.asarray(paged_attention(
        q, jnp.asarray(kf, jnp.bfloat16), jnp.asarray(vf, jnp.bfloat16),
        bt, lens, scale=0.125, interpret=True), np.float32)
    assert np.abs(o_kern - o_bf16).max() < 0.08

    # storage: int8 codes + fp32 scales ~ half the bf16 pool bytes
    assert (kq.nbytes + ks.nbytes) < 0.6 * (P * page * hkv * d * 2)


def test_int8_kv_batcher_end_to_end(tiny_lm):
    """kv_dtype='int8': generation completes, respects budgets, and a
    preempted run bit-matches the uninterrupted int8 run (recompute
    re-quantizes identically - prefill and decode produce the same K/V)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompts = [list(range(2, 18)), list(range(5, 17)), list(range(7, 21))]
    base = PagedContinuousBatcher(eng, batch_slots=3, max_seq_len=64,
                                  chunk=4, page_size=8, kv_dtype="int8")
    want = base.generate(prompts, max_new_tokens=10, temperature=0.7, seed=1)
    assert all(len(o) == 10 for o in want)

    tight = PagedContinuousBatcher(eng, batch_slots=3, max_seq_len=64,
                                   chunk=4, page_size=8, pool_pages=9,
                                   kv_dtype="int8")
    got = tight.generate(prompts, max_new_tokens=10, temperature=0.7, seed=1)
    assert tight.preemptions > 0
    assert got == want


def test_paged_admission_bound_is_tight(tiny_lm):
    """The feasibility bound counts what is actually written: n_prompt rows
    at install (not the bucketed s) plus budget-1 decode rows (tok0 comes
    from prefill logits). A request at exactly pool capacity must be
    admitted and complete, not rejected (regression: s+budget over-counted
    by one page)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    # 4 usable pages = 32 rows; prompt 10 + (17-1) decode rows = 26 rows
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=8, pool_pages=5)
    prompt = list(range(2, 12))
    fut = bat.submit(prompt, max_new_tokens=17)
    bat.drain()
    got = fut.result(timeout=10)
    assert got == eng.generate([prompt], max_new_tokens=17)[0]
    # and the genuinely infeasible case still fails alone: 32-token prompt
    # fills the pool, any real decode budget cannot
    bad = bat.submit(list(range(1, 33)), max_new_tokens=8)
    bat.drain()
    with pytest.raises(ValueError, match="exceeds the KV capacity"):
        bad.result(timeout=10)


# -- automatic prefix caching --------------------------------------------------

def test_prefix_caching_shares_pages_and_matches_isolated(tiny_lm):
    """Requests sharing a page-aligned prompt prefix reuse the cached full
    pages (read-only, refcounted) and still produce the isolated-engine
    streams; pool consumption drops by the shared pages."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    shared = list(range(2, 18))                     # two full pages @ 8
    prompts = [shared + [40, 41], shared + [50], shared + [60, 61, 62]]
    want = [eng.generate([p], max_new_tokens=6)[0] for p in prompts]

    bat = PagedContinuousBatcher(eng, batch_slots=3, max_seq_len=64,
                                 chunk=3, page_size=8, prefix_caching=True)
    futs = [bat.submit(p, max_new_tokens=6) for p in prompts]
    bat.drain()
    assert [f.result(10) for f in futs] == want
    # prompts 2 and 3 each reused the 2 shared full pages
    assert bat.prefix_cache_hits == 4
    # the shared pages persist unreferenced in the cache LRU
    assert len(bat._cache_lru) > 0


def test_prefix_caching_no_false_sharing(tiny_lm):
    """Prompts diverging INSIDE a page must not share it: only the common
    full-page-aligned prefix is reused."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    a = list(range(2, 18))                 # pages [2..9], [10..17]
    b = list(range(2, 17)) + [63]          # second page differs in last token
    want = [eng.generate([p], max_new_tokens=5)[0] for p in (a, b)]
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=8, prefix_caching=True)
    futs = [bat.submit(p, max_new_tokens=5) for p in (a, b)]
    bat.drain()
    assert [f.result(10) for f in futs] == want
    assert bat.prefix_cache_hits == 1      # only page 1 shared


def test_prefix_caching_eviction_under_pressure(tiny_lm):
    """When the free list runs dry, unreferenced cached pages are evicted
    (LRU) to serve new allocations, and everything still decodes
    correctly - the cache never wedges the allocator."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=8, pool_pages=8,
                                 prefix_caching=True)
    rng = np.random.default_rng(5)
    for trial in range(6):                 # distinct prompts > pool capacity
        p = rng.integers(2, 60, (rng.integers(6, 20),)).tolist()
        fut = bat.submit(p, max_new_tokens=4)
        bat.drain()
        assert fut.result(10) == eng.generate([p], max_new_tokens=4)[0]


def test_prefix_caching_int8_pools(tiny_lm):
    """Prefix sharing composes with int8 KV pools (codes AND scales are
    shared per page)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    shared = list(range(3, 19))
    prompts = [shared + [40], shared + [50, 51]]
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=8, prefix_caching=True,
                                 kv_dtype="int8")
    want_bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                      chunk=3, page_size=8, kv_dtype="int8")
    want = want_bat.generate(prompts, max_new_tokens=6)
    futs = [bat.submit(p, max_new_tokens=6) for p in prompts]
    bat.drain()
    assert [f.result(10) for f in futs] == want
    assert bat.prefix_cache_hits == 2


def test_prefix_caching_skips_prefix_compute(tiny_lm):
    """With a cached prefix, only the prompt TAIL is prefilled (the prefix
    forward is skipped entirely); streams still match the isolated engine,
    including temperature sampling and logprobs through the tail path, the
    int8 pools (dequantized gather), and exactly-page-aligned prompts
    (reuse capped so the tail keeps the logits-producing token)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    shared = list(range(2, 18))                 # two full pages @ 8
    prompts = [shared + [40, 41], shared + [50], shared + [60, 61, 62]]
    want = [eng.generate([p], max_new_tokens=6)[0] for p in prompts]

    bat = PagedContinuousBatcher(eng, batch_slots=3, max_seq_len=64,
                                 chunk=3, page_size=8, prefix_caching=True)
    futs = [bat.submit(p, max_new_tokens=6) for p in prompts]
    bat.drain()
    assert [f.result(10) for f in futs] == want
    assert bat.prefix_prefill_hits == 2         # prompts 2+3 tail-prefilled
    assert bat.prefix_cache_hits == 4

    fut = bat.submit(shared + [44, 45], max_new_tokens=6, temperature=0.8,
                     seed=5, logprobs=2)
    bat.drain()
    toks, lps, _ = fut.result(10)
    assert toks == eng.generate([shared + [44, 45]], max_new_tokens=6,
                                temperature=0.8, seed=5)[0]
    assert len(lps) == 6

    fut = bat.submit(list(shared), max_new_tokens=4)   # page-aligned prompt
    bat.drain()
    assert fut.result(10) == eng.generate([shared], max_new_tokens=4)[0]

    b8 = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=3,
                                page_size=8, prefix_caching=True,
                                kv_dtype="int8")
    oracle = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                    chunk=3, page_size=8, kv_dtype="int8")
    ps = [shared + [40], shared + [50, 51]]
    want8 = oracle.generate(ps, max_new_tokens=6)
    futs = [b8.submit(p, max_new_tokens=6) for p in ps]
    b8.drain()
    assert [f.result(10) for f in futs] == want8
    assert b8.prefix_prefill_hits == 1


def _tiny_mm():
    from multimodal_colpali_tpu.generation.engine import PaliGemmaEngine
    from multimodal_colpali_tpu.models.processing import ImagePreprocessor

    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    params = jax.tree.map(jnp.asarray,
                          fast_random_params(ColPaliModel(cfg), cfg, seed=3))
    eng = GemmaDecodeEngine(cfg.text, params)
    mm = PaliGemmaEngine(cfg, params)
    pre = ImagePreprocessor(cfg.vision.image_size)
    rng = np.random.default_rng(0)
    from PIL import Image
    img = Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
    pix = pre([img])
    ids = mm.build_mm_prompt([5, 9, 17], bos_id=2)
    return eng, mm, pix, ids


def test_mm_preemption_resumes_causally(tiny_lm):
    """A preempted multimodal request must resume with the generated
    suffix extended CAUSALLY (two-stage _mm_resume_prefill): re-prefilling
    prompt+tokens bidirectionally would let the prefix attend the suffix
    and diverge from the uninterrupted stream."""
    eng, mm, pix, mm_ids = _tiny_mm()

    def run(pool_pages):
        bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                     chunk=2, page_size=8, mm_engine=mm,
                                     pool_pages=pool_pages)
        # older text request so the mm request is the youngest (the victim)
        f_txt = bat.submit(list(range(2, 14)), max_new_tokens=12)
        with bat._lock:
            bat._admit()
            bat._step_chunk()
        f_mm = bat.submit(mm_ids, max_new_tokens=10, pixel_values=[pix])
        bat.drain()
        return bat, f_txt.result(10), f_mm.result(10)

    base, txt0, mm0 = run(None)                 # roomy pool: no preemption
    assert base.preemptions == 0
    # 4 usable pages; text needs 3 and mm needs 3, so decode growth forces
    # evicting the younger (mm) request mid-stream
    tight, txt1, mm1 = run(5)
    assert tight.preemptions > 0
    assert txt1 == txt0
    assert mm1 == mm0, (mm1, mm0)


def test_mm_prompts_never_share_pages(tiny_lm):
    """Multimodal prompts are excluded from prefix-cache page sharing:
    PaliGemma prefill is bidirectional, so identical leading tokens do NOT
    imply identical K/V (a second question would silently answer under the
    first question's context)."""
    eng, mm, pix, mm_ids = _tiny_mm()
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=2, page_size=8, mm_engine=mm,
                                 prefix_caching=True)
    mm_ids2 = mm_ids[:-1] + [24]                # same image tokens, new tail
    futs = [bat.submit(mm_ids, max_new_tokens=4, pixel_values=[pix]),
            bat.submit(mm_ids2, max_new_tokens=4, pixel_values=[pix])]
    bat.drain()
    got = [f.result(10) for f in futs]
    assert bat.prefix_cache_hits == 0 and bat.prefix_prefill_hits == 0
    # oracle: no-prefix-caching batcher
    ref = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=2, page_size=8, mm_engine=mm)
    futs = [ref.submit(mm_ids, max_new_tokens=4, pixel_values=[pix]),
            ref.submit(mm_ids2, max_new_tokens=4, pixel_values=[pix])]
    ref.drain()
    assert got == [f.result(10) for f in futs]


def test_fail_all_releases_pages_and_recovers(tiny_lm):
    """After a scheduler error fails the in-flight requests, the paged
    allocator must be clean (refcounts back to zero, block tables cleared)
    so the NEXT requests admit and complete correctly."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=8, prefix_caching=True)
    shared = list(range(2, 18))
    futs = [bat.submit(shared + [40], max_new_tokens=8),
            bat.submit(shared + [50], max_new_tokens=8)]
    with bat._lock:
        bat._admit()
        bat._step_chunk()               # both slots mid-decode
        bat._fail_all(RuntimeError("injected"))
    for f in futs:
        with pytest.raises(RuntimeError, match="injected"):
            f.result(10)
    assert all(r == 0 for r in bat._page_ref)
    assert not any(bat._slot_pages)
    # the pool serves new requests correctly afterwards
    fut = bat.submit(shared + [60], max_new_tokens=6)
    bat.drain()
    assert fut.result(10) == eng.generate([shared + [60]],
                                          max_new_tokens=6)[0]


def test_fail_all_rebuilds_donated_pools(tiny_lm):
    """_decode_fn donates the pools, so a dispatch that dies mid-flight
    (the TPU-tunnel failure mode) leaves them invalidated. _fail_all must
    rebuild the pools + allocator, or every later chunk/install touches
    deleted buffers and the batcher is permanently bricked while serve()
    claims to keep serving (ADVICE r2, medium)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=8)
    futs = [bat.submit([5, 9, 17, 3], max_new_tokens=8),
            bat.submit([40, 2, 7], max_new_tokens=8)]
    with bat._lock:
        bat._admit()
        # simulate the donated buffers being consumed by the failed call
        for leaf in jax.tree.leaves((bat._kpools, bat._vpools)):
            leaf.delete()
        bat._fail_all(RuntimeError("injected dispatch failure"))
    for f in futs:
        with pytest.raises(RuntimeError, match="injected"):
            f.result(10)
    prompt = [5, 9, 17, 3]
    fut = bat.submit(prompt, max_new_tokens=6)
    bat.drain()
    assert fut.result(10) == eng.generate([prompt], max_new_tokens=6)[0]


def test_fail_all_rebuilds_donated_pools_int8(tiny_lm):
    """Same recovery contract for the int8 pool layout (codes + scales)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=8, kv_dtype="int8")
    fut0 = bat.submit([5, 9, 17, 3], max_new_tokens=8)
    with bat._lock:
        bat._admit()
        for leaf in jax.tree.leaves((bat._kpools, bat._vpools)):
            leaf.delete()
        bat._fail_all(RuntimeError("injected dispatch failure"))
    with pytest.raises(RuntimeError, match="injected"):
        fut0.result(10)
    prompt = [7, 11, 2]
    want = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                  chunk=3, page_size=8, kv_dtype="int8"
                                  ).generate([prompt], max_new_tokens=6)[0]
    fut = bat.submit(prompt, max_new_tokens=6)
    bat.drain()
    assert fut.result(10) == want


def test_prefix_cached_prompt_admits_against_scarce_free_pages(tiny_lm):
    """A prompt whose prefix is LIVE-cached (pages referenced by another
    active request) needs fresh pages only for the non-cached remainder;
    admission must not demand free pages for the whole prompt (ADVICE r2,
    low)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    shared = list(range(2, 18))                 # two full pages @ 8
    a, b = shared + [40], shared + [50]
    want = [eng.generate([p], max_new_tokens=4)[0] for p in (a, b)]
    # 4 usable pages: A holds 3 (2 shared + 1 tail), leaving ONE free page -
    # enough for B's tail only if the 2 cached prefix pages are counted
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=8, pool_pages=5,
                                 prefix_caching=True)
    fut_a = bat.submit(a, max_new_tokens=4)
    with bat._lock:
        bat._admit()
    assert bat._slots[0] is not None            # A active, pages live
    fut_b = bat.submit(b, max_new_tokens=4)
    with bat._lock:
        bat._admit()
    assert bat._slots[1] is not None, \
        "cached-prefix request was deferred despite needing only one page"
    bat.drain()
    assert [fut_a.result(10), fut_b.result(10)] == want


def test_drain_failure_resolves_futures(tiny_lm):
    """If the synchronous drain path raises, in-flight and queued futures
    must be failed (like serve()'s loop does) before the exception
    propagates - not left pending for other holders to time out on
    (ADVICE r2, low)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=8)
    futs = [bat.submit([5, 9, 17], max_new_tokens=8),
            bat.submit([40, 2], max_new_tokens=8),
            bat.submit([7, 7, 7], max_new_tokens=8)]   # third stays queued

    def boom():
        raise RuntimeError("injected step failure")

    bat._step_chunk = boom
    with pytest.raises(RuntimeError, match="injected step"):
        bat.drain()
    for f in futs:
        assert f.done()
        with pytest.raises(RuntimeError, match="injected step"):
            f.result(0)


def test_paged_batcher_multi_image_request(tiny_lm):
    """A request with TWO context images (the reference's serving config
    allows 10 per prompt, 00_run_docker_containers.sh:37-38) admits through
    the paged batcher and matches the isolated 2-image PaliGemmaEngine
    stream; the images genuinely both condition the output."""
    from multimodal_colpali_tpu.generation.engine import PaliGemmaEngine

    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    params = jax.tree.map(jnp.asarray,
                          fast_random_params(ColPaliModel(cfg), cfg, seed=3))
    eng = GemmaDecodeEngine(cfg.text, params)
    mm = PaliGemmaEngine(cfg, params)

    rng = np.random.default_rng(6)
    imgs = rng.standard_normal(
        (2, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    prompt2 = mm.build_mm_prompt([5, 9, 11], bos_id=2, n_images=2)
    want = mm.generate([prompt2], imgs[None], max_new_tokens=6,
                       bucket=len(prompt2))[0]
    # swapping image order must change the stream (both images attended)
    swapped = mm.generate([prompt2], imgs[::-1][None].copy(),
                          max_new_tokens=6, bucket=len(prompt2))[0]
    assert want != swapped

    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=96, chunk=3,
                                 prompt_bucket=len(prompt2), mm_engine=mm,
                                 page_size=8)
    txt_fut = bat.submit([40, 2, 7], max_new_tokens=8)
    mm_fut = bat.submit(prompt2, max_new_tokens=6, pixel_values=imgs)
    bat.drain()
    assert mm_fut.result(timeout=60) == want
    assert txt_fut.result(timeout=60) == eng.generate(
        [[40, 2, 7]], max_new_tokens=8)[0]
