"""Mllama (Llama-3.2-Vision) parity: the reference's first old-model VLM
(AdaptLLM/biomed-Llama-3.2-11B-Vision-Instruct via vLLM,
00_run_docker_old_models.sh:8-22) against torch
``MllamaForConditionalGeneration`` on a tiny config - tiled vision tower
(local + gated global encoders, intermediate features, in-encoder
padding quirks), interleaved gated cross-attention decode, text-only
path (cross layers skipped == a plain Llama), llama3 rope scaling.

The cross-attention masks on the torch side come from HF's OWN processor
helpers (get_cross_attention_token_mask + dense conversion), so the
engine's in-jit mask formulation is pinned to the reference rule, not to
a hand-copied approximation of it."""

import numpy as np
import pytest
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.mllama_mm import (
    MllamaImagePreprocessor, MllamaMMEngine)
from multimodal_colpali_tpu.models import hf_import
from multimodal_colpali_tpu.models.mllama import (MllamaMMConfig,
                                                  MllamaVisionTower)

torch = pytest.importorskip("torch")


def _hf_cfg(cfg: MllamaMMConfig):
    from transformers import MllamaConfig
    from transformers.models.mllama.configuration_mllama import (
        MllamaTextConfig, MllamaVisionConfig)

    v = cfg.vision
    ratios = [[1, 1], [1, 2], [2, 1]]
    assert v.max_num_tiles == 2 and v.max_aspect_ratio_id == len(ratios)
    return MllamaConfig(
        vision_config=MllamaVisionConfig(
            hidden_size=v.hidden_size,
            intermediate_size=v.intermediate_size,
            num_hidden_layers=v.num_hidden_layers,
            num_global_layers=v.num_global_layers,
            num_attention_heads=v.attention_heads,
            image_size=v.image_size, patch_size=v.patch_size,
            max_num_tiles=v.max_num_tiles, norm_eps=v.norm_eps,
            intermediate_layers_indices=list(v.intermediate_layers_indices),
            supported_aspect_ratios=ratios,
            vision_output_dim=v.output_dim),
        text_config=MllamaTextConfig(
            vocab_size=cfg.text.vocab_size,
            hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.intermediate_size,
            num_hidden_layers=cfg.total_layers,
            num_attention_heads=cfg.text.num_attention_heads,
            num_key_value_heads=cfg.text.num_key_value_heads,
            cross_attention_layers=list(cfg.cross_attention_layers),
            rope_theta=cfg.text.rope_theta,
            rope_scaling={"rope_type": "default"},
            rms_norm_eps=cfg.text.rms_norm_eps,
            tie_word_embeddings=False,
            pad_token_id=0, eos_token_id=1, bos_token_id=1),
        image_token_index=cfg.image_token_id,
    )


def _pair():
    from transformers import MllamaForConditionalGeneration

    cfg = MllamaMMConfig.tiny(vocab_size=64)
    torch.manual_seed(0)
    hf = MllamaForConditionalGeneration(_hf_cfg(cfg)).eval()
    # HF inits every tanh gate to (near) zero, which turns the cross
    # blocks and tile embeddings into no-ops - a parity test against
    # that would pass with the cross math deleted. Force them open.
    with torch.no_grad():
        for layer in hf.model.language_model.layers:
            if hasattr(layer, "cross_attn_attn_gate"):
                layer.cross_attn_attn_gate.fill_(0.7)
                layer.cross_attn_mlp_gate.fill_(-0.4)
        vm = hf.model.vision_model
        vm.gated_positional_embedding.gate.fill_(0.6)
        vm.pre_tile_positional_embedding.gate.fill_(0.5)
        vm.post_tile_positional_embedding.gate.fill_(-0.5)
        for layer in vm.global_transformer.layers:
            layer.gate_attn.fill_(0.4)
            layer.gate_ffn.fill_(0.3)
    params = hf_import.mllama_params_from_hf(hf.state_dict(), cfg)
    return cfg, MllamaMMEngine(cfg, params), hf


def _images(cfg, rng, n: int) -> np.ndarray:
    """[N, T, H, W, 3] single-tile stacks (tile 1 zero)."""
    sz, t = cfg.vision.image_size, cfg.vision.max_num_tiles
    pix = np.zeros((n, t, sz, sz, 3), np.float32)
    pix[:, 0] = rng.standard_normal((n, sz, sz, 3)).astype(np.float32)
    return pix


def _hf_vision_inputs(cfg, pix: np.ndarray):
    """Our [N, T, H, W, 3] -> HF (pixel_values [1, N, T, 3, H, W],
    aspect_ratio_ids [1, N], aspect_ratio_mask [1, N, T])."""
    n, t = pix.shape[:2]
    pv = torch.from_numpy(pix.transpose(0, 1, 4, 2, 3))[None]
    ar_ids = torch.ones((1, n), dtype=torch.long)
    ar_mask = torch.zeros((1, n, t), dtype=torch.long)
    ar_mask[:, :, 0] = 1
    return pv, ar_ids, ar_mask


def _hf_cross_mask(cfg, prompt) -> "torch.Tensor":
    """Dense [1, S, N, T] mask via HF's OWN processor helpers."""
    from transformers.models.mllama.processing_mllama import (
        convert_sparse_cross_attention_mask_to_dense,
        get_cross_attention_token_mask)

    spans = get_cross_attention_token_mask(list(prompt), cfg.image_token_id)
    dense = convert_sparse_cross_attention_mask_to_dense(
        [spans], num_tiles=[[1] * len(spans)],
        max_num_tiles=cfg.vision.max_num_tiles, length=len(prompt))
    return torch.from_numpy(np.asarray(dense))


def test_mllama_vision_tower_matches_torch():
    cfg, eng, hf = _pair()
    rng = np.random.default_rng(0)
    sz, t = cfg.vision.image_size, cfg.vision.max_num_tiles

    for n_tiles, ar_id in ((1, 1), (2, 3)):     # [1,1] and [2,1] layouts
        pix = np.zeros((2, t, sz, sz, 3), np.float32)
        pix[:, :n_tiles] = rng.standard_normal(
            (2, n_tiles, sz, sz, 3)).astype(np.float32)
        ar_ids = np.full((2,), ar_id, np.int32)
        ar_mask = np.zeros((2, t), np.int32)
        ar_mask[:, :n_tiles] = 1

        got = MllamaVisionTower(cfg.vision).apply(
            {"params": eng.vision_params}, jnp.asarray(pix),
            jnp.asarray(ar_ids), jnp.asarray(ar_mask))
        with torch.no_grad():
            want = hf.model.vision_model(
                pixel_values=torch.from_numpy(
                    pix.transpose(0, 1, 4, 2, 3))[:, None],
                aspect_ratio_ids=torch.from_numpy(ar_ids)[:, None].long(),
                aspect_ratio_mask=torch.from_numpy(
                    ar_mask)[:, None].long()).last_hidden_state
        p = cfg.vision.num_patches
        want = want.reshape(2, t * p, cfg.vision.output_dim).numpy()
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=2e-4, atol=2e-4)


def test_mllama_text_only_matches_torch():
    """Text-only Mllama == the renumbered Llama self-attention stack (HF
    skips cross layers when no image is present)."""
    from multimodal_colpali_tpu.generation.engine import LlamaDecodeEngine

    cfg, eng, hf = _pair()
    lm = LlamaDecodeEngine(cfg.text, eng.lm.params, dtype=jnp.float32)
    prompt = [1, 5, 9, 11, 3, 17]
    got = lm.generate([prompt], max_new_tokens=10)[0]
    ids_t = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        out = hf.generate(input_ids=ids_t,
                          attention_mask=torch.ones_like(ids_t),
                          max_new_tokens=10, do_sample=False)
    assert got == out[0, len(prompt):].tolist()


def test_mllama_prefill_logits_match_torch():
    cfg, eng, hf = _pair()
    rng = np.random.default_rng(1)
    prompt = eng.build_mm_prompt([5, 9, 11, 3], bos_id=1)
    pix = _images(cfg, rng, 1)
    got = eng.next_token_logits([prompt], pix[None], bucket=len(prompt))

    pv, ar_ids, ar_mask = _hf_vision_inputs(cfg, pix)
    ids_t = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        want = hf(input_ids=ids_t, attention_mask=torch.ones_like(ids_t),
                  pixel_values=pv, aspect_ratio_ids=ar_ids,
                  aspect_ratio_mask=ar_mask,
                  cross_attention_mask=_hf_cross_mask(cfg, prompt),
                  ).logits[0, -1].numpy()
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-4)


def _hf_generate(hf, cfg, prompt, pix, max_new):
    pv, ar_ids, ar_mask = _hf_vision_inputs(cfg, pix)
    ids_t = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        out = hf.generate(
            input_ids=ids_t, attention_mask=torch.ones_like(ids_t),
            pixel_values=pv, aspect_ratio_ids=ar_ids,
            aspect_ratio_mask=ar_mask,
            cross_attention_mask=_hf_cross_mask(cfg, prompt),
            max_new_tokens=max_new, do_sample=False)
    return out[0, len(prompt):].tolist()


def test_mllama_greedy_generation_matches_torch():
    cfg, eng, hf = _pair()
    rng = np.random.default_rng(2)
    prompt = eng.build_mm_prompt([5, 9, 11, 3, 17, 42], bos_id=1)
    pix = _images(cfg, rng, 1)
    got = eng.generate([prompt], pix[None], max_new_tokens=12,
                       bucket=len(prompt))[0]
    want = _hf_generate(hf, cfg, prompt, pix, 12)
    assert got == want, (got, want)


def test_mllama_two_images_match_torch():
    cfg, eng, hf = _pair()
    rng = np.random.default_rng(3)
    prompt = eng.build_mm_prompt([5, 9, 11], bos_id=1, n_images=2)
    assert prompt.count(cfg.image_token_id) == 2
    pix = _images(cfg, rng, 2)
    got = eng.generate([prompt], pix[None], max_new_tokens=10,
                       bucket=len(prompt))[0]
    want = _hf_generate(hf, cfg, prompt, pix, 10)
    assert got == want, (got, want)
    a = eng.next_token_logits([prompt], pix[None], bucket=len(prompt))
    b = eng.next_token_logits([prompt], pix[::-1][None].copy(),
                              bucket=len(prompt))
    assert not np.allclose(a, b)


def test_mllama_llama3_rope_scaling_matches_torch():
    """The llama3 frequency-scaled rope (Llama-3.2's text stack) through
    the generic Llama engine vs torch LlamaForCausalLM."""
    import dataclasses as _dc

    from transformers import LlamaConfig, LlamaForCausalLM

    from multimodal_colpali_tpu.generation.engine import LlamaDecodeEngine
    from multimodal_colpali_tpu.models.idefics3 import LlamaTextConfig

    cfg = _dc.replace(LlamaTextConfig.tiny_lm(vocab_size=64),
                      rope_llama3=(8.0, 1.0, 4.0, 16),
                      tie_word_embeddings=False)
    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        rope_scaling={"rope_type": "llama3", "factor": 8.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 16},
        tie_word_embeddings=False, attention_bias=False, mlp_bias=False)
    torch.manual_seed(1)
    hf = LlamaForCausalLM(hf_cfg).eval()
    params = hf_import.llama_lm_params_from_hf(hf.state_dict(), cfg)
    lm = LlamaDecodeEngine(cfg, params, dtype=jnp.float32)
    # positions far past original_max_position_embeddings exercise the
    # low-frequency (divided) band
    prompt = [int(x) for x in
              np.random.default_rng(4).integers(0, 64, size=40)]
    got = lm.generate([prompt], max_new_tokens=8)[0]
    ids_t = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        out = hf.generate(input_ids=ids_t,
                          attention_mask=torch.ones_like(ids_t),
                          max_new_tokens=8, do_sample=False,
                          pad_token_id=0)
    assert got == out[0, len(prompt):].tolist()


def test_mllama_registry_and_preprocessor():
    from multimodal_colpali_tpu.models.registry import (MLLAMA_CONFIGS,
                                                        load_mllama_mm)

    cfg = MLLAMA_CONFIGS["llama-3.2-11b-vision"]()
    assert cfg.total_layers == 40
    assert cfg.cross_attention_layers == (3, 8, 13, 18, 23, 28, 33, 38)
    assert cfg.vision.output_dim == 7680
    assert cfg.text.rope_llama3 == (8.0, 1.0, 4.0, 8192)
    assert (MLLAMA_CONFIGS["AdaptLLM/biomed-Llama-3.2-11B-Vision-Instruct"]()
            == cfg)

    with pytest.warns(UserWarning, match="random init"):
        tcfg, params, tok = load_mllama_mm("tiny-mllama")
    eng = MllamaMMEngine(tcfg, params)
    from PIL import Image

    pre = MllamaImagePreprocessor(tcfg)
    pix = pre([Image.new("RGB", (50, 40), (10, 200, 30))])
    assert pix.shape == (1, tcfg.vision.max_num_tiles,
                         tcfg.vision.image_size, tcfg.vision.image_size, 3)
    prompt = eng.build_mm_prompt([3, 5], bos_id=1)
    out = eng.generate([prompt], pix[None], max_new_tokens=4, bucket=16)
    assert len(out[0]) == 4


def _tiny_mm():
    import warnings

    from multimodal_colpali_tpu.generation.engine import LlamaDecodeEngine
    from multimodal_colpali_tpu.models.registry import load_mllama_mm

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cfg, params, _ = load_mllama_mm("tiny-mllama")
    return (cfg, LlamaDecodeEngine(cfg.text, params, dtype=jnp.float32),
            MllamaMMEngine(cfg, params, dtype=jnp.float32))


def test_mllama_through_dense_batcher():
    """Image requests decode next to text in the dense ContinuousBatcher
    (per-slot cross-KV pools + cross hooks in the decode scan), matching
    the isolated engines' streams bit for bit - including a 2-image
    request and slot REUSE after an mm request finishes (the stale cross
    pool must not leak into the next occupant)."""
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    cfg, eng, mm = _tiny_mm()
    rng = np.random.default_rng(5)
    pix1 = _images(cfg, rng, 1)
    pix2 = _images(cfg, rng, 2)
    p1 = mm.build_mm_prompt([5, 9, 11], bos_id=1)
    p2 = mm.build_mm_prompt([7, 3], bos_id=1, n_images=2)
    want1 = mm.generate([p1], pix1[None], max_new_tokens=6, bucket=16)[0]
    want2 = mm.generate([p2], pix2[None], max_new_tokens=5, bucket=16)[0]
    want_txt = eng.generate([[40, 2, 7]], max_new_tokens=8)[0]

    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=3,
                            mm_engine=mm, cross_max_images=2)
    f_txt = bat.submit([40, 2, 7], max_new_tokens=8)
    f_mm1 = bat.submit(p1, max_new_tokens=6, pixel_values=pix1[0])
    f_mm2 = bat.submit(p2, max_new_tokens=5, pixel_values=pix2)
    bat.drain()
    assert f_txt.result(60) == want_txt
    assert f_mm1.result(60) == want1
    assert f_mm2.result(60) == want2
    # slot reuse after mm: a text request in a previously-mm slot must
    # not see the stale cross pool
    f_txt2 = bat.submit([12, 44], max_new_tokens=6)
    bat.drain()
    assert f_txt2.result(60) == eng.generate([[12, 44]],
                                             max_new_tokens=6)[0]
    # capacity guard: a 3-image request exceeds the 2-image pool
    f_over = bat.submit(mm.build_mm_prompt([5], bos_id=1, n_images=3),
                        max_new_tokens=4,
                        pixel_values=_images(cfg, rng, 3))
    with pytest.raises(ValueError, match="cross-KV rows"):
        f_over.result(60)


def test_mllama_raw_prefill_contract_refuses():
    """The raw batcher-contract ``_prefill`` must refuse (silently
    dropping cross-attention from decode is the failure mode); every
    batcher tier routes through ``_prefill_cross`` instead."""
    cfg, eng, mm = _tiny_mm()
    assert mm.cross_decode is True
    with pytest.raises(RuntimeError, match="cross"):
        mm._prefill(None, None, None, None, None)


def test_mllama_through_speculative_batchers():
    """Image requests decode through BOTH speculative tiers (the verify
    forward injects the cross hooks over its [B, spec_k] window; every
    verify token is a generated continuation, so the decode-time cross
    mask is exact), streaming bit for bit what the isolated engines
    emit - greedy speculation is lossless, cross-attention included."""
    from multimodal_colpali_tpu.generation.speculative import (
        SpeculativeContinuousBatcher, SpeculativePagedContinuousBatcher)

    cfg, eng, mm = _tiny_mm()
    rng = np.random.default_rng(5)
    pix1 = _images(cfg, rng, 1)
    p1 = mm.build_mm_prompt([5, 9, 11], bos_id=1)
    want1 = mm.generate([p1], pix1[None], max_new_tokens=6, bucket=16)[0]
    want_txt = eng.generate([[40, 2, 7]], max_new_tokens=8)[0]

    for cls, kw in ((SpeculativeContinuousBatcher, {}),
                    (SpeculativePagedContinuousBatcher, {"page_size": 8})):
        bat = cls(eng, batch_slots=2, max_seq_len=64, chunk=3, spec_k=3,
                  mm_engine=mm, cross_max_images=2, **kw)
        f_txt = bat.submit([40, 2, 7], max_new_tokens=8)
        f_mm1 = bat.submit(p1, max_new_tokens=6, pixel_values=pix1[0])
        bat.drain()
        assert f_txt.result(60) == want_txt
        assert f_mm1.result(60) == want1
        # slot reuse: text in a previously-mm slot ignores the stale pool
        f_txt2 = bat.submit([12, 44], max_new_tokens=6)
        bat.drain()
        assert f_txt2.result(60) == eng.generate(
            [[12, 44]], max_new_tokens=6)[0]


def test_mllama_through_paged_batcher():
    """Image requests decode next to text through the PAGED tier (per-slot
    cross-KV pools + cross hooks in the paged decode scan; the prompt's
    self-attention rows page like any text request's), matching the
    isolated engines bit for bit - including a 2-image request, int8 KV
    pools, and slot reuse after an mm request finishes."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    cfg, eng, mm = _tiny_mm()
    rng = np.random.default_rng(5)
    pix1 = _images(cfg, rng, 1)
    pix2 = _images(cfg, rng, 2)
    p1 = mm.build_mm_prompt([5, 9, 11], bos_id=1)
    p2 = mm.build_mm_prompt([7, 3], bos_id=1, n_images=2)
    want1 = mm.generate([p1], pix1[None], max_new_tokens=6, bucket=16)[0]
    want2 = mm.generate([p2], pix2[None], max_new_tokens=5, bucket=16)[0]
    want_txt = eng.generate([[40, 2, 7]], max_new_tokens=8)[0]

    for kv_dtype, check in (("native", lambda a, b: a == b),
                            ("int8", lambda a, b: a[:2] == b[:2])):
        bat = PagedContinuousBatcher(
            eng, batch_slots=2, max_seq_len=64, chunk=3, page_size=8,
            mm_engine=mm, cross_max_images=2, kv_dtype=kv_dtype)
        f_txt = bat.submit([40, 2, 7], max_new_tokens=8)
        f_mm1 = bat.submit(p1, max_new_tokens=6, pixel_values=pix1[0])
        f_mm2 = bat.submit(p2, max_new_tokens=5, pixel_values=pix2)
        bat.drain()
        if kv_dtype == "native":
            assert f_txt.result(60) == want_txt
            assert f_mm1.result(60) == want1
            assert f_mm2.result(60) == want2
        else:
            # int8 pools quantize the SELF-attention rows (cross pools
            # stay native): streams are close, not bit-equal - pin that
            # all three requests complete with full budgets
            assert len(f_txt.result(60)) == 8
            assert len(f_mm1.result(60)) == 6
            assert len(f_mm2.result(60)) == 5
        # slot reuse: a text request in a previously-mm slot must not
        # see the stale cross pool
        f_txt2 = bat.submit([12, 44], max_new_tokens=6)
        bat.drain()
        if kv_dtype == "native":
            assert f_txt2.result(60) == eng.generate(
                [[12, 44]], max_new_tokens=6)[0]
        else:
            f_txt2.result(60)


def test_mllama_paged_preemption_resumes_cross():
    """A preempted Mllama image request readmits through the engine's
    CAUSAL ``_prefill_cross`` on prompt+generated (the decode-built rows
    reproduced exactly: generated tokens attend all real tiles at both
    prefill and decode), so the emitted stream equals an uninterrupted
    run - vLLM's recompute preemption, cross-attention included."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    cfg, eng, mm = _tiny_mm()
    rng = np.random.default_rng(9)
    pix = _images(cfg, rng, 1)
    p_mm = mm.build_mm_prompt([5, 9, 11], bos_id=1)
    want_mm = mm.generate([p_mm], pix[None], max_new_tokens=10,
                          bucket=16)[0]
    want_txt = eng.generate([[40, 2, 7, 13]], max_new_tokens=10)[0]

    # pool sized so both requests admit but cannot both reach their
    # budgets: the younger must be preempted and later resumed
    bat = PagedContinuousBatcher(
        eng, batch_slots=2, max_seq_len=64, chunk=2, page_size=8,
        pool_pages=4, mm_engine=mm)
    f_txt = bat.submit([40, 2, 7, 13], max_new_tokens=10)
    f_mm = bat.submit(p_mm, max_new_tokens=10, pixel_values=pix[0])
    bat.drain()
    assert f_txt.result(60) == want_txt
    assert f_mm.result(60) == want_mm
    assert bat.preemptions >= 1


def test_mllama_speculative_paged_preemption_resumes_cross():
    """Same pool-starved preemption, through the SPECULATIVE paged tier
    (ADVICE r3): the verify-window resume (plus its spec_k - 1 rows of
    stale-draft slack in page accounting) must also reproduce the
    uninterrupted stream bit for bit - preemption recompute goes through
    the same ``_preempt``/``_full_prefill`` path, but the resumed slot
    re-enters decode mid-verify-window."""
    from multimodal_colpali_tpu.generation.speculative import (
        SpeculativePagedContinuousBatcher)

    cfg, eng, mm = _tiny_mm()
    rng = np.random.default_rng(9)
    pix = _images(cfg, rng, 1)
    p_mm = mm.build_mm_prompt([5, 9, 11], bos_id=1)
    want_mm = mm.generate([p_mm], pix[None], max_new_tokens=10,
                          bucket=16)[0]
    want_txt = eng.generate([[40, 2, 7, 13]], max_new_tokens=10)[0]

    bat = SpeculativePagedContinuousBatcher(
        eng, batch_slots=2, max_seq_len=64, chunk=2, page_size=8,
        pool_pages=4, spec_k=3, mm_engine=mm)
    f_txt = bat.submit([40, 2, 7, 13], max_new_tokens=10)
    f_mm = bat.submit(p_mm, max_new_tokens=10, pixel_values=pix[0])
    bat.drain()
    assert f_txt.result(60) == want_txt
    assert f_mm.result(60) == want_mm
    assert bat.preemptions >= 1


def test_mllama_quantized_random_serving():
    """The leaf-streamed quantized random builder (the 11B-on-one-chip
    path): LM + cross layers arrive pre-quantized, the engines detect
    them without re-casting the f32 scales, and the batcher stream still
    bit-matches the isolated engine."""
    import warnings

    from multimodal_colpali_tpu.generation.engine import LlamaDecodeEngine
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher
    from multimodal_colpali_tpu.models.registry import load_mllama_mm
    from multimodal_colpali_tpu.ops.quant import is_quantized

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cfg, params, _ = load_mllama_mm("tiny-mllama", weight_dtype="int8")
    assert is_quantized(params["embed"]["embed_tokens"])
    assert is_quantized(
        params["cross_layers"][f"{cfg.cross_attention_layers[0]}"]
        ["cross_attn"]["q_proj"]["kernel"])
    eng = LlamaDecodeEngine(cfg.text, params, dtype=jnp.bfloat16)
    assert eng.weight_dtype == "int8"
    mm = MllamaMMEngine(cfg, params, dtype=jnp.bfloat16)
    # the cross scales must stay f32 (cast-through would degrade them)
    q = mm.cross_params[f"{cfg.cross_attention_layers[0]}"]["cross_attn"][
        "q_proj"]["kernel"]
    assert q["scale"].dtype == jnp.float32

    rng = np.random.default_rng(6)
    pix = _images(cfg, rng, 1)
    prompt = mm.build_mm_prompt([3, 5, 7], bos_id=1)
    want = mm.generate([prompt], pix[None], max_new_tokens=5, bucket=16)[0]
    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=3,
                            mm_engine=mm)
    f_mm = bat.submit(prompt, max_new_tokens=5, pixel_values=pix[0])
    f_tx = bat.submit([11, 13], max_new_tokens=5)
    bat.drain()
    assert f_mm.result(60) == want
    assert f_tx.result(60) == eng.generate([[11, 13]],
                                           max_new_tokens=5)[0]


def test_blocked_masked_attention_matches_direct():
    """The query-blocked vision attention (the 11B tower's memory-bounded
    path) is exact: identical to the one-shot einsum attention under an
    arbitrary mask, including the non-multiple-of-block padding tail."""
    import jax

    from multimodal_colpali_tpu.models import layers as L
    from multimodal_colpali_tpu.models.mllama import blocked_masked_attention

    rng = np.random.default_rng(9)
    b, l, h, d = 2, 700, 4, 16
    q = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, l, h, d)), jnp.float32)
    mask = jnp.asarray(rng.random((b, 1, l, l)) < 0.8)
    want = L.attention(q, k, v, mask=mask, scale=d ** -0.5)
    got = blocked_masked_attention(q, k, v, mask, scale=d ** -0.5,
                                   block=256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)


def test_mllama_multi_tile_layout_matches_torch():
    """The (2, 1) static tile layout (two REAL tiles per image) against
    torch: prefill logits + greedy generation, with the cross mask's
    num_tiles=2 on the HF side coming from its own processor helpers.
    Also through the dense batcher (pools sized by the engine's packed
    row count)."""
    from transformers.models.mllama.processing_mllama import (
        convert_sparse_cross_attention_mask_to_dense,
        get_cross_attention_token_mask)

    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    cfg, _, hf = _pair()
    params = hf_import.mllama_params_from_hf(hf.state_dict(), cfg)
    eng = MllamaMMEngine(cfg, params, tiles=(2, 1))
    assert eng.ar_id == 3 and eng.n_real_tiles == 2
    assert (eng.packed_cross_tokens_per_image
            == 2 * cfg.vision.num_patches)

    rng = np.random.default_rng(11)
    sz, t = cfg.vision.image_size, cfg.vision.max_num_tiles
    pix = rng.standard_normal((1, t, sz, sz, 3)).astype(np.float32)
    prompt = eng.build_mm_prompt([5, 9, 11, 3], bos_id=1)
    got = eng.generate([prompt], pix[None], max_new_tokens=10,
                       bucket=len(prompt))[0]

    ids_t = torch.tensor([prompt], dtype=torch.long)
    spans = get_cross_attention_token_mask(prompt, cfg.image_token_id)
    dense = convert_sparse_cross_attention_mask_to_dense(
        [spans], num_tiles=[[2]], max_num_tiles=t, length=len(prompt))
    pv = torch.from_numpy(pix.transpose(0, 1, 4, 2, 3))[None]
    ar_ids = torch.full((1, 1), 3, dtype=torch.long)
    ar_mask = torch.ones((1, 1, t), dtype=torch.long)
    # this stream happens to emit token 1 (= the tiny config's eos);
    # disable HF's stop so both sides run the full budget
    hf.generation_config.eos_token_id = None
    with torch.no_grad():
        want = hf.generate(
            input_ids=ids_t, attention_mask=torch.ones_like(ids_t),
            pixel_values=pv, aspect_ratio_ids=ar_ids,
            aspect_ratio_mask=ar_mask,
            cross_attention_mask=torch.from_numpy(np.asarray(dense)),
            max_new_tokens=10, do_sample=False)[0, len(prompt):].tolist()
    assert got == want, (got, want)

    # batcher stream with the multi-tile layout bit-matches
    from multimodal_colpali_tpu.generation.engine import LlamaDecodeEngine

    lm = LlamaDecodeEngine(cfg.text, params, dtype=jnp.float32)
    bat = ContinuousBatcher(lm, batch_slots=2, max_seq_len=64, chunk=3,
                            mm_engine=eng)
    assert bat._cross_skv == eng.packed_cross_tokens_per_image
    f = bat.submit(prompt, max_new_tokens=6, pixel_values=pix[0])
    bat.drain()
    assert f.result(60) == eng.generate([prompt], pix[None],
                                        max_new_tokens=6, bucket=16)[0]

    with pytest.raises(ValueError, match="aspect"):
        MllamaMMEngine(cfg, params, tiles=(2, 2))   # max_num_tiles == 2


def test_mllama_multi_tile_preprocessor():
    """(2, 1) preprocessing follows HF's order of operations: aspect-
    preserving resize, RAW zero-pad bottom/right, normalize (padding
    lands at normalized black), row-major tile split."""
    from PIL import Image

    cfg = MllamaMMConfig.tiny()
    pre = MllamaImagePreprocessor(cfg, tiles=(2, 1))
    sz = cfg.vision.image_size                     # 28; canvas 56 x 28
    # a 14x56 (w x h) image scales by min(56/56, 28/14)=1.0 -> no pad
    im = Image.new("RGB", (14, 56), (255, 0, 0))
    pix = pre([im])
    assert pix.shape == (1, 2, sz, sz, 3)
    black = (0.0 - pre.MEAN) / pre.STD             # normalized raw black
    red = (np.asarray([255, 0, 0]) / 255.0 - pre.MEAN) / pre.STD
    np.testing.assert_allclose(pix[0, 0, 0, 0], red, atol=1e-6)
    # right half of each tile is horizontal padding (w 14 < canvas w 28)
    np.testing.assert_allclose(pix[0, 0, :, 20], np.tile(black, (sz, 1)),
                               atol=1e-6)
    np.testing.assert_allclose(pix[0, 1, 0, 0], red, atol=1e-6)
