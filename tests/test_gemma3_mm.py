"""Gemma-3 MULTIMODAL parity: the reference's full generator class
(google/gemma-3-27b-it serves image-context MCQs) against torch
``Gemma3ForConditionalGeneration`` on a tiny config - vision tower,
avg-pool projector, image-span bidirectional attention composed with the
sliding/global interleave, and greedy decode."""

import numpy as np
import pytest
import jax.numpy as jnp

from multimodal_colpali_tpu.models.configs import (Gemma3MMConfig,
                                                   Gemma3TextConfig,
                                                   SiglipVisionConfig)

torch = pytest.importorskip("torch")


def _pair(mm_tokens: int = 4):
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration

    from multimodal_colpali_tpu.generation.gemma3_mm import Gemma3MMEngine
    from multimodal_colpali_tpu.models import hf_import

    cfg = Gemma3MMConfig(
        vision=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14),
        text=Gemma3TextConfig.tiny(vocab_size=64),
        image_token_id=63,
        mm_tokens_per_image=mm_tokens,
    )
    hf_cfg = Gemma3Config(
        vision_config=dict(
            hidden_size=cfg.vision.hidden_size,
            intermediate_size=cfg.vision.intermediate_size,
            num_hidden_layers=cfg.vision.num_hidden_layers,
            num_attention_heads=cfg.vision.num_attention_heads,
            image_size=cfg.vision.image_size,
            patch_size=cfg.vision.patch_size),
        text_config=dict(
            vocab_size=cfg.text.vocab_size,
            hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.intermediate_size,
            num_hidden_layers=cfg.text.num_hidden_layers,
            num_attention_heads=cfg.text.num_attention_heads,
            num_key_value_heads=cfg.text.num_key_value_heads,
            head_dim=cfg.text.head_dim,
            sliding_window=cfg.text.sliding_window,
            layer_types=list(cfg.text.layer_types_resolved),
            rope_theta=cfg.text.rope_theta,
            rope_local_base_freq=cfg.text.rope_local_base_freq,
            rope_scaling={"rope_type": "linear",
                          "factor": cfg.text.rope_scaling_factor},
            query_pre_attn_scalar=cfg.text.query_pre_attn_scalar),
        mm_tokens_per_image=cfg.mm_tokens_per_image,
        image_token_index=cfg.image_token_id,
        boi_token_index=61, eoi_token_index=62,
    )
    torch.manual_seed(0)
    hf = Gemma3ForConditionalGeneration(hf_cfg).eval()
    # HF leaves the projector matrix at its zeros init (raw nn.Parameter,
    # untouched by _init_weights); zero features would make the parity
    # trivially image-blind
    with torch.no_grad():
        hf.model.multi_modal_projector.mm_input_projection_weight.normal_(
            0, 0.3)
    params = hf_import.gemma3_mm_params_from_hf(hf.state_dict(), cfg)
    return cfg, Gemma3MMEngine(cfg, params), hf


def _hf_generate(hf, prompt, pix_nchw, max_new, image_token_id):
    ids_t = torch.tensor([prompt], dtype=torch.long)
    tt = (ids_t == image_token_id).long()
    with torch.no_grad():
        out = hf.generate(
            input_ids=ids_t,
            attention_mask=torch.ones_like(ids_t),
            token_type_ids=tt,
            pixel_values=torch.from_numpy(pix_nchw),
            max_new_tokens=max_new, do_sample=False)
    return out[0, len(prompt):].tolist()


def test_gemma3_mm_prefill_logits_match_torch():
    cfg, eng, hf = _pair()
    rng = np.random.default_rng(0)
    prompt = eng.build_mm_prompt([5, 9, 11, 3], bos_id=2, boi_id=61,
                                 eoi_id=62)
    pix = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    got = eng.next_token_logits([prompt], pix[None], bucket=len(prompt))

    ids_t = torch.tensor([prompt], dtype=torch.long)
    tt = (ids_t == cfg.image_token_id).long()
    with torch.no_grad():
        want = hf(input_ids=ids_t, attention_mask=torch.ones_like(ids_t),
                  token_type_ids=tt,
                  pixel_values=torch.from_numpy(
                      pix.transpose(0, 3, 1, 2))).logits[0, -1].numpy()
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-4)


def test_gemma3_mm_greedy_generation_matches_torch():
    """Greedy decode parity with a single image; generation long enough
    to cross the sliding window."""
    cfg, eng, hf = _pair()
    rng = np.random.default_rng(1)
    prompt = eng.build_mm_prompt([5, 9, 11, 3, 17, 42], bos_id=2,
                                 boi_id=61, eoi_id=62)
    pix = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    got = eng.generate([prompt], pix[None], max_new_tokens=14,
                       bucket=len(prompt))[0]
    want = _hf_generate(hf, prompt, pix.transpose(0, 3, 1, 2), 14,
                        cfg.image_token_id)
    assert got == want, (got, want)


def test_gemma3_mm_two_images_match_torch():
    """TWO context images (the reference's multi-image MCQ prompts): each
    image's soft-token span is its own bidirectional block; swapping the
    images changes the output."""
    cfg, eng, hf = _pair()
    rng = np.random.default_rng(2)
    prompt = eng.build_mm_prompt([5, 9, 11], bos_id=2, n_images=2,
                                 boi_id=61, eoi_id=62)
    assert prompt.count(cfg.image_token_id) == 2 * cfg.mm_tokens_per_image
    pix = rng.standard_normal(
        (2, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    got = eng.generate([prompt], pix[None], max_new_tokens=10,
                       bucket=len(prompt))[0]
    want = _hf_generate(hf, prompt, pix.transpose(0, 3, 1, 2), 10,
                        cfg.image_token_id)
    assert got == want, (got, want)
    # both images condition the output: swapping them moves the logits
    # (the random tiny model's greedy STREAM may still collapse to the
    # same cycle, so compare distributions, not tokens)
    a = eng.next_token_logits([prompt], pix[None], bucket=len(prompt))
    b = eng.next_token_logits([prompt], pix[::-1][None].copy(),
                              bucket=len(prompt))
    assert not np.allclose(a, b)


def _tiny_mm():
    import warnings

    import jax.numpy as jnp

    from multimodal_colpali_tpu.generation.engine import GemmaDecodeEngine
    from multimodal_colpali_tpu.generation.gemma3_mm import Gemma3MMEngine
    from multimodal_colpali_tpu.models.registry import (
        GEMMA3_MM_CONFIGS, gemma3_mm_random_params)

    cfg = GEMMA3_MM_CONFIGS["tiny-gemma3"]()
    params = gemma3_mm_random_params(cfg, seed=4)
    return (cfg, GemmaDecodeEngine(cfg.text, params, dtype=jnp.float32),
            Gemma3MMEngine(cfg, params, dtype=jnp.float32))


def test_gemma3_mm_through_batchers():
    """A Gemma-3 image request decodes in the slot batch next to text
    requests (both batchers), matching the isolated engine stream - the
    scheduler's mm hook routes to the engine's causal+span prefill."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    cfg, eng, mm = _tiny_mm()
    rng = np.random.default_rng(3)
    pix = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    prompt = mm.build_mm_prompt([5, 9, 11], bos_id=2)
    want_mm = mm.generate([prompt], pix[None], max_new_tokens=6,
                          bucket=16)[0]
    want_txt = eng.generate([[40, 2, 7]], max_new_tokens=8)[0]

    for cls, kw in ((ContinuousBatcher, {}),
                    (PagedContinuousBatcher, {"page_size": 8})):
        bat = cls(eng, batch_slots=2, max_seq_len=64, chunk=3,
                  mm_engine=mm, **kw)
        txt_fut = bat.submit([40, 2, 7], max_new_tokens=8)
        mm_fut = bat.submit(prompt, max_new_tokens=6, pixel_values=pix)
        bat.drain()
        assert mm_fut.result(60) == want_mm, cls.__name__
        assert txt_fut.result(60) == want_txt, cls.__name__


def test_gemma3_mm_preemption_resumes():
    """A preempted Gemma-3 image request resumes via the two-stage causal
    extension (0-indexed positions) and still bit-matches the
    uninterrupted stream."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    cfg, eng, mm = _tiny_mm()
    rng = np.random.default_rng(5)
    pix = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    prompt = mm.build_mm_prompt([5, 9, 11, 3, 17], bos_id=2)
    want = mm.generate([prompt], pix[None], max_new_tokens=10, bucket=16)[0]
    # tight pool -> mm request preempted by the text requests
    bat = PagedContinuousBatcher(eng, batch_slots=3, max_seq_len=64,
                                 chunk=3, page_size=8, pool_pages=8,
                                 mm_engine=mm)
    mm_fut = bat.submit(prompt, max_new_tokens=10, pixel_values=pix)
    txt_futs = [bat.submit(list(range(2, 16)), max_new_tokens=8)
                for _ in range(2)]
    bat.drain()
    assert mm_fut.result(60) == want
    for f in txt_futs:
        f.result(60)


def test_gemma3_mm_resume_extension_is_contiguous():
    """Regression: the two-stage resume prefill must keep the
    [prompt | generated] cache rows CONTIGUOUS in the s2 extension.
    Gemma-3 sliding layers measure the window in cache-slot distance
    (engine._chunk), so interior bucket padding between the prompt rows
    and the generated rows shrinks the effective window and the resumed
    request diverges from the uninterrupted stream. Uses n_gen=3 (not a
    bucket multiple, so the extension carries 13 pad rows) on the tiny
    config's sliding_window=8, which spans back into the prompt."""
    import jax.numpy as jnp

    from multimodal_colpali_tpu.generation.scheduler import (
        ContinuousBatcher, _Request, Future)

    cfg, eng, mm = _tiny_mm4()
    rng = np.random.default_rng(11)
    pix = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    prompt = mm.build_mm_prompt([5, 9, 11, 3, 17], bos_id=2)
    want = mm.generate([prompt], pix[None], max_new_tokens=8, bucket=16)[0]
    n_gen = 3
    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=4,
                            mm_engine=mm)
    req = _Request(list(prompt), 8, 0.0, 0, Future(), eos_id=-1,
                   tokens=list(want[:n_gen]), pixel_values=pix)
    prompt_eff = list(prompt) + list(want[:n_gen])
    s = max(((len(prompt_eff) + bat.bucket - 1) // bat.bucket) * bat.bucket,
            bat.bucket)
    assert s - len(prompt_eff) > 0, "extension must carry interior padding"
    _, _, logits, last_pos = bat._full_prefill(req, prompt_eff, s, True,
                                               b"pixdigest")
    assert int(jnp.argmax(logits)) == want[n_gen]
    assert int(last_pos) == len(prompt_eff) - 1  # gemma3 is 0-indexed


def _tiny_mm4():
    """Tiny Gemma-3 MM with 4 soft tokens/image so spans cross page
    boundaries under small pages."""
    import jax.numpy as jnp

    from multimodal_colpali_tpu.generation.engine import GemmaDecodeEngine
    from multimodal_colpali_tpu.generation.gemma3_mm import Gemma3MMEngine
    from multimodal_colpali_tpu.models.registry import gemma3_mm_random_params

    cfg = Gemma3MMConfig(
        vision=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=2, image_size=28, patch_size=14),
        text=Gemma3TextConfig.tiny(vocab_size=64),
        image_token_id=63, mm_tokens_per_image=4)
    params = gemma3_mm_random_params(cfg, seed=6)
    return (cfg, GemmaDecodeEngine(cfg.text, params, dtype=jnp.float32),
            Gemma3MMEngine(cfg, params, dtype=jnp.float32))


def test_gemma3_mm_prefix_caching_shares_image_prefix():
    """Gemma-3 MM prompts share cached pages: requests with the same
    image + preamble and different question tails reuse the prefix pages
    (incl. the span-crossing ones) AND skip the prefix's prefill compute;
    streams match the isolated engine."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    cfg, eng, mm = _tiny_mm4()
    rng = np.random.default_rng(7)
    pix = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    preamble = [5, 9, 11, 3, 17, 8, 2]
    base = mm.build_mm_prompt(preamble, bos_id=2)   # 1+4+7 = 12 tokens
    prompts = [base + [40, 41], base + [50], base + [33, 34, 35]]
    want = [mm.generate([p], pix[None], max_new_tokens=6, bucket=16)[0]
            for p in prompts]

    bat = PagedContinuousBatcher(eng, batch_slots=3, max_seq_len=64,
                                 chunk=3, page_size=4, mm_engine=mm,
                                 prefix_caching=True)
    futs = [bat.submit(p, max_new_tokens=6, pixel_values=pix)
            for p in prompts]
    bat.drain()
    assert [f.result(60) for f in futs] == want
    # the 12-token base = 3 full pages @4, incl the span-crossing page
    assert bat.prefix_cache_hits >= 4
    assert bat.prefix_prefill_hits >= 1   # tail-only compute happened


def test_gemma3_mm_can_admit_counts_live_prefix_reuse():
    """Regression: _can_admit must count reusable prefix pages for
    Gemma-3 MM prompts too (same eligibility as _install_slot, keyed by
    the pixel digest). A second request sharing a LIVE request's image
    prefix needs only its non-cached remainder from the free pool;
    skipping mm reuse deferred it even though install would attach the
    shared pages without drawing on the pool."""
    import hashlib

    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    cfg, eng, mm = _tiny_mm4()
    rng = np.random.default_rng(9)
    pix = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    base = mm.build_mm_prompt([5, 9, 11, 3, 17, 8, 2], bos_id=2)  # 12 toks
    assert len(base) == 12
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=4, pool_pages=7,
                                 mm_engine=mm, prefix_caching=True)
    f1 = bat.submit(base + [40, 41], max_new_tokens=6, pixel_values=pix)
    with bat._lock:
        bat._admit()   # request A active: 4 pages held, 3 full cached+live
    assert any(r is not None for r in bat._slots)
    digest = hashlib.sha1(np.ascontiguousarray(pix).tobytes()).hexdigest()
    p2 = list(base) + [50]   # 13 tokens: 3 cached pages + 1 fresh (free=2)
    assert bat._can_admit(16, len(p2), 2, tokens=p2, mm=True, ctx=digest)
    # a different image shares nothing -> needs 4 fresh pages > 2 free
    assert not bat._can_admit(16, len(p2), 2, tokens=p2, mm=True,
                              ctx="other-digest")
    bat.drain()
    f1.result(30)


def test_gemma3_mm_prefix_caching_different_images_never_alias():
    """The pixel digest lives in the chain root: same token prefix with a
    DIFFERENT image must not reuse pages."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    cfg, eng, mm = _tiny_mm4()
    rng = np.random.default_rng(8)
    pix_a = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    pix_b = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    prompt = mm.build_mm_prompt([5, 9, 11, 3, 17, 8, 2], bos_id=2) + [40]
    want_b = mm.generate([prompt], pix_b[None], max_new_tokens=6,
                         bucket=16)[0]
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=4, mm_engine=mm,
                                 prefix_caching=True)
    fa = bat.submit(prompt, max_new_tokens=6, pixel_values=pix_a)
    bat.drain()
    hits_after_a = bat.prefix_cache_hits
    fb = bat.submit(prompt, max_new_tokens=6, pixel_values=pix_b)
    bat.drain()
    fa.result(60)
    assert fb.result(60) == want_b
    assert bat.prefix_cache_hits == hits_after_a   # no cross-image reuse


def test_gemma3_mm_prefix_caching_malformed_span_disabled():
    """A truncated image-token run (not mm_tokens_per_image long) makes
    the chain keys unsound - such prompts neither register nor reuse,
    and still decode correctly."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    cfg, eng, mm = _tiny_mm4()
    rng = np.random.default_rng(9)
    pix = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    # hand-crafted: only 3 image tokens (span truncated)
    bad = [2] + [cfg.image_token_id] * 3 + [5, 9, 11, 3, 17]
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=4, mm_engine=mm,
                                 prefix_caching=True)
    f1 = bat.submit(bad + [40], max_new_tokens=5, pixel_values=pix)
    f2 = bat.submit(bad + [50], max_new_tokens=5, pixel_values=pix)
    bat.drain()
    f1.result(60)
    f2.result(60)
    assert bat.prefix_cache_hits == 0
    assert bat.prefix_prefill_hits == 0


def test_paligemma_mm_prompts_still_never_share():
    """PaliGemma's bidirectional prefix keeps its mm prompts excluded
    from sharing even with prefix_caching on (regression guard for the
    gemma3-only relaxation)."""
    from multimodal_colpali_tpu.generation.engine import PaliGemmaEngine
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher
    from multimodal_colpali_tpu.models.colpali import ColPaliModel
    from multimodal_colpali_tpu.models.configs import ColPaliModelConfig
    from multimodal_colpali_tpu.models.registry import fast_random_params

    import jax

    ccfg = ColPaliModelConfig.tiny(vocab_size=64)
    params = jax.tree.map(jnp.asarray,
                          fast_random_params(ColPaliModel(ccfg), ccfg, seed=3))
    from multimodal_colpali_tpu.generation.engine import GemmaDecodeEngine

    eng = GemmaDecodeEngine(ccfg.text, params)
    mm = PaliGemmaEngine(ccfg, params)
    rng = np.random.default_rng(10)
    pix = rng.standard_normal(
        (1, ccfg.vision.image_size, ccfg.vision.image_size, 3)
    ).astype(np.float32)
    prompt = mm.build_mm_prompt([5, 9, 11, 3], bos_id=2)
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=4, mm_engine=mm,
                                 prefix_caching=True)
    futs = [bat.submit(prompt + [t], max_new_tokens=5, pixel_values=pix)
            for t in (40, 50)]
    bat.drain()
    for f in futs:
        f.result(60)
    assert bat.prefix_cache_hits == 0


def test_gemma3_mm_vision_int8_close_and_serves():
    """``vision_dtype="int8"`` (the HBM headroom the 27B int4 multimodal
    server needs on one 16 GB v5e) quantizes every SigLIP projection to
    W8A8 without touching the LM: soft image tokens stay within int8
    rounding of the bf16 tower, and an image request still serves through
    the paged batcher end to end."""
    from multimodal_colpali_tpu.generation.gemma3_mm import Gemma3MMEngine
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher
    from multimodal_colpali_tpu.models.registry import (
        GEMMA3_MM_CONFIGS, gemma3_mm_random_params)
    from multimodal_colpali_tpu.generation.engine import GemmaDecodeEngine

    cfg = GEMMA3_MM_CONFIGS["tiny-gemma3"]()
    params = gemma3_mm_random_params(cfg, seed=4)
    eng = GemmaDecodeEngine(cfg.text, params, dtype=jnp.float32)
    mm = Gemma3MMEngine(cfg, params, dtype=jnp.float32)
    mm8 = Gemma3MMEngine(cfg, params, dtype=jnp.float32,
                         vision_dtype="int8")
    # every projection kernel was rewritten to codes+scales
    q = mm8.vision_params["layers_0"]["self_attn"]["q_proj"]["kernel"]
    assert set(q) == {"q8", "scale"} and q["q8"].dtype == jnp.int8

    rng = np.random.default_rng(11)
    pix = rng.standard_normal(
        (1, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32)
    a = np.asarray(mm._image_features(mm._vp, jnp.asarray(pix)))
    b = np.asarray(mm8._image_features(mm8._vp, jnp.asarray(pix)))
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.05, rel

    prompt = mm8.build_mm_prompt([5, 9, 11], bos_id=2)
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=8, mm_engine=mm8)
    fut = bat.submit(prompt, max_new_tokens=6, pixel_values=pix)
    bat.drain()
    toks = fut.result(60)
    assert len(toks) == 6

    with pytest.raises(ValueError):
        Gemma3MMEngine(cfg, params, vision_dtype="fp8")
