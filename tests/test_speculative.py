"""Prompt-lookup speculative decoding: bit-identical to greedy decode.

Oracle: GemmaDecodeEngine.generate at temperature 0 - speculation is a
pure scheduling change (verify-then-accept), so every stream must match
exactly, whatever the acceptance rate.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.engine import GemmaDecodeEngine
from multimodal_colpali_tpu.generation.speculative import speculative_generate
from multimodal_colpali_tpu.models.colpali import ColPaliModel
from multimodal_colpali_tpu.models.configs import (ColPaliModelConfig,
                                                   Gemma3TextConfig)
from multimodal_colpali_tpu.models.registry import (fast_random_params,
                                                    gemma3_random_params)


@pytest.fixture(scope="module")
def tiny_lm():
    cfg = ColPaliModelConfig.tiny(vocab_size=64)
    model = ColPaliModel(cfg)
    params = jax.tree.map(jnp.asarray, fast_random_params(model, cfg, seed=3))
    return cfg.text, params


def test_speculative_matches_greedy_random_prompts(tiny_lm):
    """Low-acceptance regime (random prompts): still bit-identical."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(2, 60, (n,)).tolist() for n in (5, 11, 3, 19)]
    want = eng.generate(prompts, max_new_tokens=12)
    got, acc = speculative_generate(eng, prompts, max_new_tokens=12, k=4)
    assert got == want
    assert acc >= 1.0   # every verify forward emits at least one token


def test_speculative_matches_greedy_repetitive_output(tiny_lm):
    """High-acceptance regime: greedy decode of the tiny random LM locks
    into short cycles, exactly the pattern prompt lookup drafts from -
    multiple tokens accepted per forward AND bit-identical streams."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    rng = np.random.default_rng(1)
    prompts = [rng.integers(2, 60, (rng.integers(4, 12),)).tolist()
               for _ in range(3)]
    want = eng.generate(prompts, max_new_tokens=24)
    got, acc = speculative_generate(eng, prompts, max_new_tokens=24, k=4)
    assert got == want
    assert acc > 1.3, f"no speculation benefit measured (acc={acc})"


def test_speculative_eos_and_budget(tiny_lm):
    """eos inside an accepted draft window truncates exactly like the
    engine; budgets clamp mid-window."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompts = [[5, 9, 17, 3], [40, 2]]
    free = eng.generate(prompts, max_new_tokens=10)
    # use a token the model actually generates as eos
    eos = free[0][3]
    want = eng.generate(prompts, max_new_tokens=10, eos_id=eos)
    got, _ = speculative_generate(eng, prompts, max_new_tokens=10,
                                  k=4, eos_id=eos)
    assert got == want
    want1 = eng.generate(prompts, max_new_tokens=3)
    got1, _ = speculative_generate(eng, prompts, max_new_tokens=3, k=4)
    assert got1 == want1


def test_speculative_gemma3(tiny_lm):
    """Speculation composes with Gemma-3's sliding-window layers."""
    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    params = gemma3_random_params(cfg, seed=5)
    eng = GemmaDecodeEngine(cfg, params)
    span = [7, 21, 9, 33, 14]
    prompts = [span * 4, [3, 17, 42, 7, 9, 23, 55, 4, 11]]
    want = eng.generate(prompts, max_new_tokens=14)
    got, _ = speculative_generate(eng, prompts, max_new_tokens=14, k=3)
    assert got == want


# -- speculation through the continuous batcher -------------------------------

def _spec_bat(eng, **kw):
    from multimodal_colpali_tpu.generation.speculative import (
        SpeculativeContinuousBatcher)

    return SpeculativeContinuousBatcher(eng, batch_slots=3, max_seq_len=96,
                                        chunk=2, **kw)


def test_spec_batcher_matches_engine_greedy(tiny_lm):
    """Speculative slot decoding is a pure scheduling change: greedy
    streams bit-match the engine, and cycling outputs accept multiple
    tokens per verify forward."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(2, 60, (n,)).tolist() for n in (5, 11, 19, 3)]
    want = [eng.generate([p], max_new_tokens=20)[0] for p in prompts]
    bat = _spec_bat(eng, spec_k=4)
    futs = [bat.submit(p, max_new_tokens=20) for p in prompts]
    bat.drain()
    assert [f.result(30) for f in futs] == want
    assert bat.spec_accepted > bat.spec_forwards, \
        (bat.spec_accepted, bat.spec_forwards)


def test_spec_batcher_mixed_sampling_slots(tiny_lm):
    """Sampled slots decode next to greedy slots: they ignore drafts
    (one token per forward at their own step index) so their streams
    bit-match the non-speculative batcher; greedy slots still match the
    engine."""
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    greedy_p, temp_p = [5, 9, 17, 3], [40, 2, 8]
    want_g = eng.generate([greedy_p], max_new_tokens=10)[0]
    ref = ContinuousBatcher(eng, batch_slots=2, max_seq_len=96, chunk=2)
    want_t = ref.submit(temp_p, max_new_tokens=10, temperature=1.2, seed=7)
    ref.drain()
    want_t = want_t.result(30)

    bat = _spec_bat(eng, spec_k=4)
    fg = bat.submit(greedy_p, max_new_tokens=10)
    ft = bat.submit(temp_p, max_new_tokens=10, temperature=1.2, seed=7)
    bat.drain()
    assert fg.result(30) == want_g
    assert ft.result(30) == want_t


def test_spec_batcher_eos_and_staggered_admission(tiny_lm):
    """eos inside an accepted window truncates exactly; a request
    admitted mid-flight does not perturb running slots."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompts = [[5, 9, 17, 3], [40, 2], [7, 30, 8]]
    free = eng.generate(prompts[:1], max_new_tokens=12)[0]
    eos = free[4]
    want = [eng.generate([p], max_new_tokens=12, eos_id=eos)[0]
            for p in prompts]
    bat = _spec_bat(eng, spec_k=4, eos_id=eos)
    futs = [bat.submit(p, max_new_tokens=12) for p in prompts[:2]]
    with bat._lock:
        bat._admit()
        bat._step_chunk()
    futs.append(bat.submit(prompts[2], max_new_tokens=12))
    bat.drain()
    assert [f.result(30) for f in futs] == want


def test_spec_batcher_logprobs_fall_back(tiny_lm):
    """A logprobs request routes the chunk through the parent's exact
    decode; records match the non-speculative batcher."""
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompt = [5, 9, 17, 3]
    ref = ContinuousBatcher(eng, batch_slots=2, max_seq_len=96, chunk=2)
    fw = ref.submit(prompt, max_new_tokens=8, logprobs=2)
    ref.drain()
    want = fw.result(30)
    bat = _spec_bat(eng, spec_k=4)
    f = bat.submit(prompt, max_new_tokens=8, logprobs=2)
    bat.drain()
    got = f.result(30)
    assert got[0] == want[0]
    assert got[1] == pytest.approx(want[1])


def test_speculative_generate_batch_size_reuse(tiny_lm):
    """Regression: the jit cache must key on the batch size - the run
    closure bakes b into the cache/token-buffer shapes, so reusing one
    engine for calls with different prompt counts (same bucketed s) used
    to retrace with mismatched shapes and crash."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    rng = np.random.default_rng(21)
    prompts = [rng.integers(2, 60, (5,)).tolist(),
               rng.integers(2, 60, (7,)).tolist()]
    got2, _ = speculative_generate(eng, prompts, max_new_tokens=8, k=4)
    got1, _ = speculative_generate(eng, [prompts[0]], max_new_tokens=8, k=4)
    assert got1[0] == got2[0]


def test_spec_batcher_draft_history_survives_logprobs_chunks(tiny_lm):
    """Regression: chunks with a logprobs slot run the PARENT decode,
    which never updates _toks_dev/_nlen; once the logprobs request ends
    and speculation resumes, the draft history must be resynced from
    host truth or drafts come from a stale buffer (silent acceptance
    collapse). Drive the loop manually and check the invariant
    nlen[slot] == len(prompt) + len(tokens) after every speculative
    chunk; streams must stay bit-exact throughout."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    rng = np.random.default_rng(22)
    p_greedy = [rng.integers(2, 60, (n,)).tolist() for n in (6, 9)]
    p_lp = rng.integers(2, 60, (5,)).tolist()
    want = [eng.generate([p], max_new_tokens=24)[0] for p in p_greedy]
    bat = _spec_bat(eng, spec_k=4)
    futs = [bat.submit(p, max_new_tokens=24) for p in p_greedy]
    f_lp = bat.submit(p_lp, max_new_tokens=4, logprobs=1)
    saw_spec_after_parent = False
    saw_parent = False
    with bat._lock:
        while (not bat._queue.empty() or bat._readmit
               or any(r is not None for r in bat._slots)):
            bat._admit()
            if not any(r is not None for r in bat._slots):
                continue
            bat._step_chunk()
            if bat._spec_dirty:
                saw_parent = True
                continue   # parent path ran; buffer legitimately stale
            if saw_parent:
                saw_spec_after_parent = True
            nlen = np.asarray(bat._nlen)
            for slot, req in enumerate(bat._slots):
                if req is None:
                    continue
                assert nlen[slot] == len(req.prompt) + len(req.tokens)
    assert saw_parent and saw_spec_after_parent, \
        "test must exercise parent chunks followed by speculative chunks"
    assert [f.result(30) for f in futs] == want


def test_spec_batcher_gemma3(tiny_lm):
    """Speculative slot decoding composes with Gemma-3's sliding
    layers."""
    from multimodal_colpali_tpu.models.configs import Gemma3TextConfig
    from multimodal_colpali_tpu.models.registry import gemma3_random_params

    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    params = gemma3_random_params(cfg, seed=5)
    eng = GemmaDecodeEngine(cfg, params)
    rng = np.random.default_rng(11)
    prompts = [rng.integers(2, 60, (n,)).tolist() for n in (9, 14)]
    want = [eng.generate([p], max_new_tokens=16)[0] for p in prompts]
    bat = _spec_bat(eng, spec_k=3)
    futs = [bat.submit(p, max_new_tokens=16) for p in prompts]
    bat.drain()
    assert [f.result(30) for f in futs] == want


# -- speculation through the PAGED batcher ------------------------------------

def _spec_paged(eng, **kw):
    from multimodal_colpali_tpu.generation.speculative import (
        SpeculativePagedContinuousBatcher)

    kw.setdefault("batch_slots", 3)
    kw.setdefault("max_seq_len", 96)
    kw.setdefault("chunk", 2)
    kw.setdefault("page_size", 8)
    return SpeculativePagedContinuousBatcher(eng, **kw)


def test_spec_paged_matches_engine_greedy(tiny_lm):
    """Verify rows scatter through the block tables; streams bit-match
    the engine and cycling outputs accept multiple tokens per forward."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    rng = np.random.default_rng(4)
    prompts = [rng.integers(2, 60, (n,)).tolist() for n in (5, 11, 19, 3)]
    want = [eng.generate([p], max_new_tokens=20)[0] for p in prompts]
    bat = _spec_paged(eng, spec_k=4)
    got = bat.generate(prompts, max_new_tokens=20)
    assert got == want
    assert bat.spec_accepted > bat.spec_forwards, \
        (bat.spec_accepted, bat.spec_forwards)


def test_spec_paged_mixed_sampling_slots(tiny_lm):
    """Sampled slots next to greedy ones: both bit-match their
    non-speculative per-request streams."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    greedy_p, temp_p = [5, 9, 17, 3], [40, 2, 8]
    want_g = eng.generate([greedy_p], max_new_tokens=10)[0]
    ref = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=96,
                                 chunk=2, page_size=8)
    want_t = ref.submit(temp_p, max_new_tokens=10, temperature=1.2, seed=7)
    ref.drain()
    want_t = want_t.result(30)

    bat = _spec_paged(eng, spec_k=4)
    fg = bat.submit(greedy_p, max_new_tokens=10)
    ft = bat.submit(temp_p, max_new_tokens=10, temperature=1.2, seed=7)
    bat.drain()
    assert fg.result(30) == want_g
    assert ft.result(30) == want_t


def test_spec_paged_int8_pools(tiny_lm):
    """Speculation over int8 pools: accepted tokens' K/V rows quantize to
    the exact codes sequential decode writes, so streams bit-match the
    non-speculative int8 paged batcher."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    rng = np.random.default_rng(5)
    prompts = [rng.integers(2, 60, (n,)).tolist() for n in (7, 13, 4)]
    ref = PagedContinuousBatcher(eng, batch_slots=3, max_seq_len=96,
                                 chunk=2, page_size=8, kv_dtype="int8")
    want = ref.generate(prompts, max_new_tokens=14)
    bat = _spec_paged(eng, spec_k=4, kv_dtype="int8")
    got = bat.generate(prompts, max_new_tokens=14)
    assert got == want


def test_spec_paged_preemption_completes(tiny_lm):
    """An oversubscribed pool preempts mid-speculation; recompute resumes
    each stream bit-identically (the spec-aware page accounting must
    cover the stale verify rows, or a scatter lands out of table)."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompts = [list(range(2, 18)), list(range(5, 17)), list(range(7, 21))]
    want = [eng.generate([p], max_new_tokens=10)[0] for p in prompts]
    bat = _spec_paged(eng, spec_k=4, max_seq_len=64, chunk=4, pool_pages=10)
    got = bat.generate(prompts, max_new_tokens=10)
    assert got == want
    assert bat.preemptions > 0, "pool was sized to force preemption"


def test_spec_paged_prefix_caching(tiny_lm):
    """Prompt pages shared by content + speculative decode: decode writes
    never touch shared pages, so reuse and bit-match coexist."""
    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    shared = list(range(2, 20))                 # two full 8-token pages
    prompts = [shared + [33], shared + [44, 7]]
    want = [eng.generate([p], max_new_tokens=12)[0] for p in prompts]
    bat = _spec_paged(eng, spec_k=4, prefix_caching=True)
    f0 = bat.submit(prompts[0], max_new_tokens=12)
    bat.drain()
    f1 = bat.submit(prompts[1], max_new_tokens=12)
    bat.drain()
    assert [f0.result(30), f1.result(30)] == want
    assert bat.prefix_cache_hits > 0


def test_spec_paged_logprobs_fall_back(tiny_lm):
    """A logprobs request routes chunks through the exact paged decode;
    records match the non-speculative paged batcher."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    tcfg, params = tiny_lm
    eng = GemmaDecodeEngine(tcfg, params)
    prompt = [5, 9, 17, 3]
    ref = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=96,
                                 chunk=2, page_size=8)
    fw = ref.submit(prompt, max_new_tokens=8, logprobs=2)
    ref.drain()
    want = fw.result(30)
    bat = _spec_paged(eng, spec_k=4)
    f = bat.submit(prompt, max_new_tokens=8, logprobs=2)
    bat.drain()
    got = f.result(30)
    assert got[0] == want[0]
    assert got[1] == pytest.approx(want[1])


def test_spec_paged_gemma3(tiny_lm):
    """Per-query sliding windows through the paged kernel (flattened
    B*k batch) match the engine's dense sliding masks."""
    from multimodal_colpali_tpu.models.configs import Gemma3TextConfig
    from multimodal_colpali_tpu.models.registry import gemma3_random_params

    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    params = gemma3_random_params(cfg, seed=5)
    eng = GemmaDecodeEngine(cfg, params)
    rng = np.random.default_rng(12)
    prompts = [rng.integers(2, 60, (n,)).tolist() for n in (9, 14)]
    want = [eng.generate([p], max_new_tokens=16)[0] for p in prompts]
    bat = _spec_paged(eng, spec_k=3)
    got = bat.generate(prompts, max_new_tokens=16)
    assert got == want
