"""Qwen2(-VL text stack) decode-engine parity + serving integration.

The reference's "old models" tier serves AdaptLLM/biomed-Qwen2-VL-2B-Instruct
through a vLLM container (reference 00_run_docker_old_models.sh:24-38). This
file pins the framework's first-party Qwen2 decode path (plain-multiply
RMSNorm, biased q/k/v, text-degenerate mrope, SiLU MLP, tied/untied LM head)
to torch ``Qwen2VLForConditionalGeneration`` on a tiny config, and checks the
continuous batchers serve it bit-identically to the bare engine.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.engine import Qwen2DecodeEngine
from multimodal_colpali_tpu.models import hf_import
from multimodal_colpali_tpu.models.qwen2vl import ColQwen2ModelConfig

torch = pytest.importorskip("torch")


def _torch_tiny(cfg, tie: bool):
    from transformers import Qwen2VLForConditionalGeneration
    from transformers.models.qwen2_vl import Qwen2VLConfig

    hf_cfg = Qwen2VLConfig(
        vision_config=dict(
            depth=cfg.vision.depth, embed_dim=cfg.vision.embed_dim,
            hidden_size=cfg.vision.hidden_size,
            num_heads=cfg.vision.num_heads, in_chans=3,
            spatial_merge_size=cfg.vision.spatial_merge_size,
            patch_size=cfg.vision.patch_size,
            temporal_patch_size=cfg.vision.temporal_patch_size,
            mlp_ratio=cfg.vision.mlp_ratio,
        ),
        text_config=dict(
            hidden_size=cfg.text.hidden_size,
            intermediate_size=cfg.text.intermediate_size,
            num_hidden_layers=cfg.text.num_hidden_layers,
            num_attention_heads=cfg.text.num_attention_heads,
            num_key_value_heads=cfg.text.num_key_value_heads,
            vocab_size=cfg.text.vocab_size,
            rope_theta=cfg.text.rope_theta,
            rms_norm_eps=cfg.text.rms_norm_eps,
            tie_word_embeddings=tie,
            rope_scaling={"rope_type": "default",
                          "mrope_section": list(cfg.text.mrope_section)},
        ),
        image_token_id=cfg.image_token_id,
        video_token_id=cfg.image_token_id - 3,  # distinct, unused
        vision_start_token_id=cfg.vision_start_token_id,
        vision_end_token_id=cfg.vision_end_token_id,
    )
    torch.manual_seed(0)
    return Qwen2VLForConditionalGeneration(hf_cfg).eval()


def _tiny_cfg(tie: bool) -> ColQwen2ModelConfig:
    import dataclasses

    cfg = ColQwen2ModelConfig.tiny(vocab_size=64)
    return dataclasses.replace(
        cfg, text=dataclasses.replace(cfg.text, tie_word_embeddings=tie))


@pytest.fixture(scope="module", params=[True, False],
                ids=["tied", "untied"])
def tiny_qwen2(request):
    """(cfg, params, hf) for the 2B-class tied head and the 7B-class
    untied head (AdaptLLM's backbone Qwen2-VL-2B ties; 7B does not)."""
    cfg = _tiny_cfg(tie=request.param)
    hf = _torch_tiny(cfg, tie=request.param)
    params = hf_import.qwen2vl_lm_params_from_hf(hf.state_dict(), cfg)
    return cfg, params, hf


def test_qwen2_tree_head_matches_tying(tiny_qwen2):
    cfg, params, _ = tiny_qwen2
    assert ("lm_head" in params["language_model"]) == (
        not cfg.text.tie_word_embeddings)


def test_qwen2_prefill_logits_match_torch(tiny_qwen2):
    """Next-token logits parity over ragged, left-padded prompts - the
    core architecture check (biased projections, plain RMSNorm, mrope's
    text-degenerate case, head tying)."""
    cfg, params, hf = tiny_qwen2
    eng = Qwen2DecodeEngine(cfg.text, params)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(2, 60, (n,)).tolist() for n in (13, 5, 9)]
    got = eng.next_token_logits(prompts, bucket=8)

    for n, prompt in enumerate(prompts):
        ids = torch.tensor([prompt], dtype=torch.long)
        with torch.no_grad():
            out = hf(input_ids=ids,
                     attention_mask=torch.ones_like(ids)).logits[0, -1]
        np.testing.assert_allclose(got[n], out.numpy(),
                                   rtol=2e-4, atol=2e-4)


def test_qwen2_greedy_generation_matches_torch(tiny_qwen2):
    """Greedy decode parity: the scan body reproduces HF's cache decode
    (rope positions advance per generated token)."""
    cfg, params, hf = tiny_qwen2
    eng = Qwen2DecodeEngine(cfg.text, params)
    prompt = [3, 17, 42, 7, 9, 23, 55, 4, 11]
    got = eng.generate([prompt], max_new_tokens=12)[0]

    ids = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        out = hf.generate(input_ids=ids,
                          attention_mask=torch.ones_like(ids),
                          max_new_tokens=12, do_sample=False)
    want = out[0, len(prompt):].tolist()
    assert got == want, (got, want)


def test_qwen2_dense_batcher_matches_engine(tiny_qwen2):
    """The dense continuous batcher serves Qwen2 (layer_stack dispatch on
    is_qwen2) bit-identically to the engine."""
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    cfg, params, _ = tiny_qwen2
    eng = Qwen2DecodeEngine(cfg.text, params)
    prompts = [[5, 9, 17, 3], [40, 2], list(range(3, 20))]
    want = eng.generate(prompts, max_new_tokens=10)
    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=48, chunk=3)
    got = bat.generate(prompts, max_new_tokens=10)
    assert got == want


def test_qwen2_paged_batcher_matches_engine(tiny_qwen2):
    """The paged batcher (block tables, preemption-capable) serves Qwen2
    identically to the engine."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    cfg, params, _ = tiny_qwen2
    eng = Qwen2DecodeEngine(cfg.text, params)
    prompts = [[5, 9, 17, 3], list(range(3, 20))]
    want = eng.generate(prompts, max_new_tokens=10)
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=48,
                                 chunk=3, page_size=8)
    got = bat.generate(prompts, max_new_tokens=10)
    assert got == want


def test_qwen2_int8_engine_close_to_native():
    """Weight-only int8 quantization composes with the Qwen2 tree (biases
    stay f32; the quant walkers only rewrite 2-D kernels)."""
    cfg = _tiny_cfg(tie=True)
    hf = _torch_tiny(cfg, tie=True)
    params = hf_import.qwen2vl_lm_params_from_hf(hf.state_dict(), cfg)
    eng = Qwen2DecodeEngine(cfg.text, params)
    q8 = Qwen2DecodeEngine(cfg.text, params, weight_dtype="int8")
    prompts = [[3, 17, 42, 7, 9]]
    a = eng.next_token_logits(prompts, bucket=8)
    b = q8.next_token_logits(prompts, bucket=8)
    # int8 weights perturb logits but must preserve the greedy argmax on
    # a well-separated tiny model
    assert np.argmax(a) == np.argmax(b)
    np.testing.assert_allclose(a, b, rtol=0.2, atol=0.2)


def test_qwen2vl_registry_configs():
    """Registry entries pin the published HF config values for the
    backbone families the reference's old-model tier serves."""
    from multimodal_colpali_tpu.models.registry import QWEN2VL_CONFIGS

    expect = {
        # name: (layers, hidden, inter, q, kv, tied, vocab)
        "qwen2-vl-2b": (28, 1536, 8960, 12, 2, True, 151936),
        "qwen2-vl-7b": (28, 3584, 18944, 28, 4, False, 152064),
    }
    for name, (L, h, inter, q, kv, tied, v) in expect.items():
        cfg = QWEN2VL_CONFIGS[name]()
        assert (cfg.num_hidden_layers, cfg.hidden_size,
                cfg.intermediate_size, cfg.num_attention_heads,
                cfg.num_key_value_heads, cfg.tie_word_embeddings,
                cfg.vocab_size) == (L, h, inter, q, kv, tied, v), name
        assert cfg.head_dim == 128
    # the reference's actual model id resolves to the 2B backbone
    assert (QWEN2VL_CONFIGS["AdaptLLM/biomed-Qwen2-VL-2B-Instruct"]()
            == QWEN2VL_CONFIGS["qwen2-vl-2b"]())


def test_load_qwen2vl_lm_random_roundtrip():
    """load_qwen2vl_lm falls back to random init shaped exactly like the
    hf_import tree, and the engine decodes from it."""
    from multimodal_colpali_tpu.models.registry import load_qwen2vl_lm

    with pytest.warns(UserWarning, match="random init"):
        cfg, params, tok = load_qwen2vl_lm("tiny-qwen2vl")
    assert tok is None
    eng = Qwen2DecodeEngine(cfg, params)
    out = eng.generate([[3, 5, 7]], max_new_tokens=4)
    assert len(out[0]) == 4

    # shape agreement with the converter tree on the tiny config
    mcfg = _tiny_cfg(tie=cfg.tie_word_embeddings)
    hf = _torch_tiny(mcfg, tie=cfg.tie_word_embeddings)
    want = hf_import.qwen2vl_lm_params_from_hf(hf.state_dict(), mcfg)
    import jax

    ws = jax.tree.map(lambda a: jnp.asarray(a).shape,
                      {"embed": want["embed"],
                       "language_model": want["language_model"]})
    gs = jax.tree.map(lambda a: jnp.asarray(a).shape,
                      {"embed": params["embed"],
                       "language_model": params["language_model"]})
    assert ws == gs
