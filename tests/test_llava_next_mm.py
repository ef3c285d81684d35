"""LLaVA-NeXT MULTIMODAL parity: the reference's third old-model VLM
(AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B via vLLM,
00_run_docker_old_models.sh:41-52) against torch
``LlavaNextForConditionalGeneration`` on a tiny config - CLIP tower
(feature layer -2, CLS dropped), 2-layer projector, anyres packing with
image_newline rows, plain-position causal prefill, batcher integration.

The static serving layout pins one SQUARE pinpoint == the base size, where
HF's unpad crop is a mathematical no-op - so the parity here is exact, not
approximate (the same argument ColGranite's retrieval parity uses)."""

import numpy as np
import pytest
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.llava_next_mm import (
    LlavaNextImagePreprocessor, LlavaNextMMConfig, LlavaNextMMEngine)
from multimodal_colpali_tpu.models import hf_import

torch = pytest.importorskip("torch")


def _pair():
    from transformers import (CLIPVisionConfig, LlamaConfig,
                              LlavaNextConfig,
                              LlavaNextForConditionalGeneration)

    cfg = LlavaNextMMConfig.tiny(vocab_size=64)
    hf_cfg = LlavaNextConfig(
        vision_config=CLIPVisionConfig(
            hidden_size=cfg.vision.hidden_size,
            intermediate_size=cfg.vision.intermediate_size,
            num_hidden_layers=cfg.vision.num_hidden_layers,
            num_attention_heads=cfg.vision.num_attention_heads,
            image_size=cfg.vision.image_size,
            patch_size=cfg.vision.patch_size,
            layer_norm_eps=cfg.vision.layer_norm_eps),
        text_config=LlamaConfig(
            vocab_size=cfg.text.vocab_size,
            hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.intermediate_size,
            num_hidden_layers=cfg.text.num_hidden_layers,
            num_attention_heads=cfg.text.num_attention_heads,
            num_key_value_heads=cfg.text.num_key_value_heads,
            rms_norm_eps=cfg.text.rms_norm_eps,
            rope_theta=cfg.text.rope_theta,
            tie_word_embeddings=cfg.text.tie_word_embeddings,
            attention_bias=False, mlp_bias=False),
        image_token_index=cfg.image_token_id,
        image_grid_pinpoints=[[cfg.vision.image_size,
                               cfg.vision.image_size]],
        vision_feature_layer=cfg.vision_feature_layer,
        vision_feature_select_strategy="default",
    )
    hf_cfg.tie_word_embeddings = cfg.text.tie_word_embeddings
    torch.manual_seed(0)
    hf = LlavaNextForConditionalGeneration(hf_cfg).eval()
    params = hf_import.llava_next_params_from_hf(hf.state_dict(), cfg)
    return cfg, LlavaNextMMEngine(cfg, params), hf


def _image(cfg, rng, n: int) -> np.ndarray:
    sz = cfg.vision.image_size
    return rng.standard_normal((n, sz, sz, 3)).astype(np.float32)


def _hf_pix(pix: np.ndarray) -> "torch.Tensor":
    """[N, H, W, 3] -> HF's [N, 2, 3, H, W]: one batch row PER IMAGE with
    base + one tile patches (both ARE the base image at the square
    pinpoint)."""
    nchw = torch.from_numpy(pix.transpose(0, 3, 1, 2))
    return torch.stack([torch.stack((im, im)) for im in nchw])


def _hf_generate(hf, cfg, prompt, pix, max_new):
    ids_t = torch.tensor([prompt], dtype=torch.long)
    sz = cfg.vision.image_size
    with torch.no_grad():
        out = hf.generate(
            input_ids=ids_t, attention_mask=torch.ones_like(ids_t),
            pixel_values=_hf_pix(pix),
            image_sizes=torch.tensor([[sz, sz]] * pix.shape[0]),
            max_new_tokens=max_new, do_sample=False)
    return out[0, len(prompt):].tolist()


def test_llava_next_tokens_per_image():
    cfg = LlavaNextMMConfig.tiny()
    g = cfg.grid
    assert g == 2 and cfg.n_image_tokens == 4 + 2 * 3   # base + tile+nl


def test_llava_next_prefill_logits_match_torch():
    cfg, eng, hf = _pair()
    rng = np.random.default_rng(0)
    prompt = eng.build_mm_prompt([5, 9, 11, 3])
    pix = _image(cfg, rng, 1)
    got = eng.next_token_logits([prompt], pix[None], bucket=len(prompt))

    ids_t = torch.tensor([prompt], dtype=torch.long)
    sz = cfg.vision.image_size
    with torch.no_grad():
        want = hf(input_ids=ids_t, attention_mask=torch.ones_like(ids_t),
                  pixel_values=_hf_pix(pix),
                  image_sizes=torch.tensor([[sz, sz]]),
                  ).logits[0, -1].numpy()
    np.testing.assert_allclose(got[0], want, rtol=3e-4, atol=3e-4)


def test_llava_next_greedy_generation_matches_torch():
    cfg, eng, hf = _pair()
    rng = np.random.default_rng(1)
    prompt = eng.build_mm_prompt([5, 9, 11, 3, 17, 42])
    pix = _image(cfg, rng, 1)
    got = eng.generate([prompt], pix[None], max_new_tokens=12, bucket=16)[0]
    want = _hf_generate(hf, cfg, prompt, pix, 12)
    assert got == want, (got, want)


def test_llava_next_two_images_match_torch():
    cfg, eng, hf = _pair()
    rng = np.random.default_rng(2)
    prompt = eng.build_mm_prompt([5, 9, 11], n_images=2)
    assert prompt.count(cfg.image_token_id) == 2 * cfg.n_image_tokens
    pix = _image(cfg, rng, 2)
    got = eng.generate([prompt], pix[None], max_new_tokens=10,
                       bucket=len(prompt))[0]
    want = _hf_generate(hf, cfg, prompt, pix, 10)
    assert got == want, (got, want)
    a = eng.next_token_logits([prompt], pix[None], bucket=len(prompt))
    b = eng.next_token_logits([prompt], pix[::-1][None].copy(),
                              bucket=len(prompt))
    assert not np.allclose(a, b)


def _tiny_mm():
    from multimodal_colpali_tpu.generation.engine import LlamaDecodeEngine
    from multimodal_colpali_tpu.models.registry import (
        llava_next_random_params)

    cfg = LlavaNextMMConfig.tiny()
    params = llava_next_random_params(cfg, seed=4)
    return (cfg, LlamaDecodeEngine(cfg.text, params, dtype=jnp.float32),
            LlavaNextMMEngine(cfg, params, dtype=jnp.float32))


def test_llava_next_through_batchers():
    """A LLaVA-NeXT image request decodes next to text in both batchers,
    matching the isolated engine stream."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    cfg, eng, mm = _tiny_mm()
    rng = np.random.default_rng(3)
    pix = _image(cfg, rng, 1)
    prompt = mm.build_mm_prompt([5, 9, 11])
    want_mm = mm.generate([prompt], pix[None], max_new_tokens=6,
                          bucket=16)[0]
    want_txt = eng.generate([[40, 2, 7]], max_new_tokens=8)[0]
    for cls, kw in ((ContinuousBatcher, {}),
                    (PagedContinuousBatcher, {"page_size": 8})):
        bat = cls(eng, batch_slots=2, max_seq_len=64, chunk=3,
                  mm_engine=mm, **kw)
        txt_fut = bat.submit([40, 2, 7], max_new_tokens=8)
        mm_fut = bat.submit(prompt, max_new_tokens=6,
                            pixel_values=pix[0])     # single [H, W, 3]
        bat.drain()
        assert mm_fut.result(60) == want_mm, cls.__name__
        assert txt_fut.result(60) == want_txt, cls.__name__


def test_llava_next_registry_and_preprocessor():
    from multimodal_colpali_tpu.models.registry import (LLAVA_NEXT_CONFIGS,
                                                        load_llava_next_mm)

    cfg = LLAVA_NEXT_CONFIGS["llava-next-llama3-8b"]()
    assert (cfg.vision.hidden_size, cfg.vision.num_hidden_layers,
            cfg.vision.image_size, cfg.grid) == (1024, 24, 336, 24)
    assert cfg.text.num_hidden_layers == 32
    assert cfg.n_image_tokens == 24 * 24 + 24 * 25
    assert (LLAVA_NEXT_CONFIGS["AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B"]()
            == cfg)

    with pytest.warns(UserWarning, match="random init"):
        tcfg, params, tok = load_llava_next_mm("tiny-llava-next")
    eng = LlavaNextMMEngine(tcfg, params)
    from PIL import Image

    pre = LlavaNextImagePreprocessor(tcfg)
    pix = pre([Image.new("RGB", (50, 40), (10, 200, 30))])
    assert pix.shape == (1, tcfg.vision.image_size,
                         tcfg.vision.image_size, 3)
    prompt = eng.build_mm_prompt([3, 5])
    out = eng.generate([prompt], pix[None], max_new_tokens=4, bucket=16)
    assert len(out[0]) == 4


def test_llava_next_quantized_random_serving():
    """The leaf-streamed quantized random builder (the 8B-on-one-chip
    path): the LM arrives pre-quantized, the engines detect it without
    re-casting the f32 scales, and generation runs end-to-end."""
    import warnings

    from multimodal_colpali_tpu.generation.engine import LlamaDecodeEngine
    from multimodal_colpali_tpu.models.registry import load_llava_next_mm
    from multimodal_colpali_tpu.ops.quant import is_quantized

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        cfg, params, _ = load_llava_next_mm("tiny-llava-next",
                                            weight_dtype="int8")
    assert is_quantized(params["embed"]["embed_tokens"])
    eng = LlamaDecodeEngine(cfg.text, params, dtype=jnp.bfloat16)
    assert eng.weight_dtype == "int8"
    mm = LlavaNextMMEngine(cfg, params, dtype=jnp.bfloat16)
    emb = mm.lm.params["embed"]["embed_tokens"]
    assert emb["scale"].dtype == jnp.float32   # scales survived the cast

    rng = np.random.default_rng(7)
    sz = cfg.vision.image_size
    pix = rng.standard_normal((1, sz, sz, 3)).astype(np.float32)
    prompt = mm.build_mm_prompt([3, 5, 7])
    out = mm.generate([prompt], pix[None], max_new_tokens=4, bucket=16)
    assert len(out[0]) == 4
