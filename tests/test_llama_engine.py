"""Llama decode-engine parity + serving integration.

The reference's "old models" tier serves AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B
through a vLLM container (reference 00_run_docker_old_models.sh:41-52); its
LM is Llama-3-8B. This file pins the framework's Llama decode path (the
shared Qwen2/Llama layer branch: bias-free projections, plain RMSNorm,
all-temporal mrope == standard rotary, tied/untied head) to torch
``LlamaForCausalLM`` on a tiny config and checks batcher bit-match.
"""

import dataclasses

import numpy as np
import pytest

from multimodal_colpali_tpu.generation.engine import LlamaDecodeEngine
from multimodal_colpali_tpu.models import hf_import
from multimodal_colpali_tpu.models.idefics3 import LlamaTextConfig

torch = pytest.importorskip("torch")


def _torch_tiny(cfg):
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        rms_norm_eps=cfg.rms_norm_eps, rope_theta=cfg.rope_theta,
        tie_word_embeddings=cfg.tie_word_embeddings,
        attention_bias=False, mlp_bias=False,
    )
    torch.manual_seed(0)
    return LlamaForCausalLM(hf_cfg).eval()


@pytest.fixture(scope="module", params=[True, False],
                ids=["tied", "untied"])
def tiny_llama(request):
    """SmolLM2-class tied head and Llama-3-class untied head."""
    cfg = dataclasses.replace(LlamaTextConfig.tiny_lm(vocab_size=64),
                              tie_word_embeddings=request.param)
    hf = _torch_tiny(cfg)
    params = hf_import.llama_lm_params_from_hf(hf.state_dict(), cfg)
    return cfg, params, hf


def test_llama_prefill_logits_match_torch(tiny_llama):
    cfg, params, hf = tiny_llama
    eng = LlamaDecodeEngine(cfg, params)
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


def test_llama_greedy_generation_matches_torch(tiny_llama):
    cfg, params, hf = tiny_llama
    eng = LlamaDecodeEngine(cfg, params)
    prompt = [3, 17, 42, 7, 9, 23, 55, 4, 11]
    got = eng.generate([prompt], max_new_tokens=12)[0]
    ids = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        out = hf.generate(input_ids=ids,
                          attention_mask=torch.ones_like(ids),
                          max_new_tokens=12, do_sample=False)
    want = out[0, len(prompt):].tolist()
    assert got == want, (got, want)


def test_llama_batchers_match_engine(tiny_llama):
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    cfg, params, _ = tiny_llama
    eng = LlamaDecodeEngine(cfg, params)
    prompts = [[5, 9, 17, 3], list(range(3, 20))]
    want = eng.generate(prompts, max_new_tokens=10)
    for cls, kw in ((ContinuousBatcher, {}),
                    (PagedContinuousBatcher, {"page_size": 8})):
        bat = cls(eng, batch_slots=2, max_seq_len=48, chunk=3, **kw)
        assert bat.generate(prompts, max_new_tokens=10) == want, cls.__name__


def test_llama_registry_and_random_roundtrip():
    from multimodal_colpali_tpu.models.registry import (LLAMA_CONFIGS,
                                                        load_llama_lm)

    cfg = LLAMA_CONFIGS["llama-3-8b"]()
    assert (cfg.num_hidden_layers, cfg.hidden_size, cfg.intermediate_size,
            cfg.num_attention_heads, cfg.num_key_value_heads,
            cfg.vocab_size, cfg.rope_theta, cfg.tie_word_embeddings) == \
        (32, 4096, 14336, 32, 8, 128256, 500_000.0, False)
    assert (LLAMA_CONFIGS["AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B"]() == cfg)

    with pytest.warns(UserWarning, match="random init"):
        tcfg, params, tok = load_llama_lm("tiny-llama")
    assert tok is None
    # bias-free tree (the config marker drives the shared shapes builder)
    attn = params["language_model"]["layers_0"]["self_attn"]
    assert "bias" not in attn["q_proj"]
    eng = LlamaDecodeEngine(tcfg, params)
    out = eng.generate([[3, 5, 7]], max_new_tokens=4)
    assert len(out[0]) == 4


def test_llava_next_nested_state_dict_converts():
    """The converter strips LLaVA-NeXT's language_model nesting (and
    ignores vision/projector keys), so the served LM is byte-identical
    to converting the bare Llama state dict."""
    import jax
    import jax.numpy as jnp

    cfg = LlamaTextConfig.tiny_lm(vocab_size=64)
    hf = _torch_tiny(cfg)
    bare = hf.state_dict()
    nested = {f"model.language_model.{k[len('model.'):]}"
              if k.startswith("model.") else k: v
              for k, v in bare.items()}
    nested["model.vision_tower.blocks.0.proj.weight"] = torch.zeros(2, 2)
    nested["model.multi_modal_projector.linear_1.weight"] = torch.zeros(2, 2)
    a = hf_import.llama_lm_params_from_hf(bare, cfg)
    b = hf_import.llama_lm_params_from_hf(nested, cfg)
    assert jax.tree.all(jax.tree.map(
        lambda x, y: bool(jnp.array_equal(jnp.asarray(x), jnp.asarray(y))),
        a, b))
