"""Gemma-3 architecture parity + serving integration.

The reference's actual generator is google/gemma-3-27b-it served by vLLM
(reference 00_run_docker_containers.sh:26-39). This file pins the
framework's Gemma-3 decode path (GQA + q/k norm, 5:1 sliding/global
interleave, dual rope bases with linear scaling on global layers, sandwich
norms) to torch ``Gemma3ForCausalLM`` on a tiny config, and checks both
continuous batchers serve it bit-identically to the bare engine.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.engine import GemmaDecodeEngine
from multimodal_colpali_tpu.models.configs import Gemma3TextConfig


def _torch_tiny(cfg):
    torch = pytest.importorskip("torch")
    from transformers.models.gemma3 import (Gemma3ForCausalLM,
                                            Gemma3TextConfig as HFCfg)

    hf_cfg = HFCfg(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        head_dim=cfg.head_dim, sliding_window=cfg.sliding_window,
        layer_types=list(cfg.layer_types_resolved),
        rope_theta=cfg.rope_theta,
        rope_local_base_freq=cfg.rope_local_base_freq,
        rope_scaling={"rope_type": "linear",
                      "factor": cfg.rope_scaling_factor},
        query_pre_attn_scalar=cfg.query_pre_attn_scalar,
        rms_norm_eps=cfg.rms_norm_eps,
        attention_dropout=0.0,
    )
    torch.manual_seed(0)
    return Gemma3ForCausalLM(hf_cfg).eval()


@pytest.fixture(scope="module")
def tiny_g3():
    from multimodal_colpali_tpu.models import hf_import

    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    hf = _torch_tiny(cfg)
    params = hf_import.gemma3_params_from_hf(hf.state_dict(), cfg)
    return cfg, params, hf


def test_gemma3_tiny_has_both_layer_types():
    cfg = Gemma3TextConfig.tiny()
    types = set(cfg.layer_types_resolved)
    assert types == {"sliding_attention", "full_attention"}


def test_gemma3_27b_layer_pattern():
    """The 27B default resolves HF's 5:1 sliding:global interleave."""
    cfg = Gemma3TextConfig.gemma3_27b()
    types = cfg.layer_types_resolved
    assert len(types) == 62
    assert types[5] == "full_attention" and types[0] == "sliding_attention"
    assert sum(t == "full_attention" for t in types) == 62 // 6


def test_gemma3_family_configs_match_published():
    """The 1b/4b/12b registry entries pin the published HF config values
    (generator size is a user knob in the reference's serving setup,
    00_run_docker_containers.sh:26-39 parameterizes the model id)."""
    from multimodal_colpali_tpu.models.registry import GEMMA3_CONFIGS

    expect = {
        # name: (layers, hidden, inter, q, kv, hd, window, rope_scale)
        "gemma-3-1b":  (26, 1152, 6912, 4, 1, 256, 512, 1.0),
        "gemma-3-4b":  (34, 2560, 10240, 8, 4, 256, 1024, 8.0),
        "gemma-3-12b": (48, 3840, 15360, 16, 8, 256, 1024, 8.0),
        "gemma-3-27b": (62, 5376, 21504, 32, 16, 128, 1024, 8.0),
    }
    for name, (L, h, inter, q, kv, hd, win, rs) in expect.items():
        cfg = GEMMA3_CONFIGS[name]()
        assert (cfg.num_hidden_layers, cfg.hidden_size,
                cfg.intermediate_size, cfg.num_attention_heads,
                cfg.num_key_value_heads, cfg.head_dim,
                cfg.sliding_window, cfg.rope_scaling_factor) == \
            (L, h, inter, q, kv, hd, win, rs), name
        # all family members share the 5:1 sliding:global interleave
        types = cfg.layer_types_resolved
        assert sum(t == "full_attention" for t in types) == L // 6
        # HF aliases resolve to the same constructor
        assert GEMMA3_CONFIGS[f"google/{name}-it"]() == cfg
        # q/k norm scale: every post-27B size uses 256 (== head_dim)
        if name != "gemma-3-27b":
            assert cfg.query_pre_attn_scalar == 256.0

    # mm variants: 4b/12b wrap the same SigLIP tower around their text
    # config; 1b has no mm variant upstream
    from multimodal_colpali_tpu.models.registry import GEMMA3_MM_CONFIGS

    for name in ("gemma-3-4b", "gemma-3-12b", "gemma-3-27b"):
        mm = GEMMA3_MM_CONFIGS[name]()
        assert mm.text == GEMMA3_CONFIGS[name]()
        assert (mm.vision.image_size, mm.mm_tokens_per_image) == (896, 256)
    assert "gemma-3-1b" not in GEMMA3_MM_CONFIGS


def test_gemma3_prefill_logits_match_torch(tiny_g3):
    """Next-token logits parity on a prompt LONGER than the sliding
    window, so local layers genuinely mask - the core architecture
    check (q/k norm, dual rope, sandwich norms, attn scale)."""
    torch = pytest.importorskip("torch")
    cfg, params, hf = tiny_g3
    eng = GemmaDecodeEngine(cfg, params)
    rng = np.random.default_rng(0)
    prompts = [rng.integers(2, 60, (n,)).tolist() for n in (21, 9, 14)]
    got = eng.next_token_logits(prompts, bucket=8)

    for n, prompt in enumerate(prompts):
        ids = torch.tensor([prompt], dtype=torch.long)
        with torch.no_grad():
            out = hf(input_ids=ids).logits[0, -1].numpy()
        np.testing.assert_allclose(got[n], out, rtol=2e-4, atol=2e-4)


def test_gemma3_greedy_generation_matches_torch(tiny_g3):
    """Greedy decode parity across the sliding-window boundary: prompt 13
    + 16 new tokens crosses window=8 repeatedly on the local layers."""
    torch = pytest.importorskip("torch")
    cfg, params, hf = tiny_g3
    eng = GemmaDecodeEngine(cfg, params)
    prompt = [3, 17, 42, 7, 9, 23, 55, 4, 11, 30, 8, 2, 19]
    got = eng.generate([prompt], max_new_tokens=16)[0]

    ids = torch.tensor([prompt], dtype=torch.long)
    with torch.no_grad():
        out = hf.generate(input_ids=ids,
                          attention_mask=torch.ones_like(ids),
                          max_new_tokens=16, do_sample=False)
    want = out[0, len(prompt):].tolist()
    assert got == want, (got, want)


def test_gemma3_dense_batcher_matches_engine(tiny_g3):
    """The dense continuous batcher serves Gemma-3 (per-layer sliding
    masks in its own decode path) bit-identically to the engine."""
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    cfg, params, _ = tiny_g3
    eng = GemmaDecodeEngine(cfg, params)
    prompts = [[5, 9, 17, 3], [40, 2], list(range(3, 24))]
    want = eng.generate(prompts, max_new_tokens=12)
    bat = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=3)
    got = bat.generate(prompts, max_new_tokens=12)
    assert got == want


@pytest.mark.parametrize("kv_dtype", ["native", "int8"])
def test_gemma3_paged_batcher_matches_engine(tiny_g3, kv_dtype):
    """The paged batcher (block tables + per-layer window through the
    paged-attention kernels) serves Gemma-3 identically to the engine;
    int8 pools compose with the sliding layers."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    cfg, params, _ = tiny_g3
    eng = GemmaDecodeEngine(cfg, params)
    prompts = [[5, 9, 17, 3], list(range(3, 24))]
    want = eng.generate(prompts, max_new_tokens=12)
    bat = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                 chunk=3, page_size=8, kv_dtype=kv_dtype)
    got = bat.generate(prompts, max_new_tokens=12)
    if kv_dtype == "native":
        assert got == want
    else:
        # int8 KV is numerically (not bit-) equivalent; require the first
        # tokens to agree before quantization noise can compound
        assert [g[:4] for g in got] == [w[:4] for w in want]


def test_gemma3_paged_preemption_bit_matches(tiny_g3):
    """Preemption + recompute replays Gemma-3 streams exactly despite the
    sliding layers (re-prefill must reproduce windowed attention)."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    cfg, params, _ = tiny_g3
    eng = GemmaDecodeEngine(cfg, params)
    prompts = [list(range(2, 18)), list(range(5, 17)), list(range(7, 21))]
    want = eng.generate(prompts, max_new_tokens=10)
    bat = PagedContinuousBatcher(eng, batch_slots=3, max_seq_len=64,
                                 chunk=4, page_size=8, pool_pages=9)
    got = bat.generate(prompts, max_new_tokens=10)
    assert got == want
    assert bat.preemptions > 0


def test_paged_attention_window_matches_xla():
    """The Pallas kernel's sliding-window mask (interpret mode) matches
    the XLA oracle, and a windowed result differs from the full one."""
    from multimodal_colpali_tpu.ops.paged_attention import (
        paged_attention, paged_attention_xla)

    rng = np.random.default_rng(3)
    b, hq, hkv, d, page, nb = 3, 8, 2, 64, 16, 4
    p_phys = b * nb + 2
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((p_phys, page, hkv, d)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((p_phys, page, hkv, d)), jnp.float32)
    bt = jnp.asarray(rng.permutation(p_phys)[: b * nb].reshape(b, nb),
                     jnp.int32)
    lens = jnp.asarray([40, 7, 64], jnp.int32)
    for window in (8, 16, 33):
        got = paged_attention(q, kp, vp, bt, lens, scale=0.125,
                              interpret=True, window=window)
        want = paged_attention_xla(q, kp, vp, bt, lens, scale=0.125,
                                   window=window)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
    full = paged_attention_xla(q, kp, vp, bt, lens, scale=0.125)
    win = paged_attention_xla(q, kp, vp, bt, lens, scale=0.125, window=8)
    assert not np.allclose(np.asarray(full), np.asarray(win))


def test_paged_attention_int8_window_matches_oracle():
    from multimodal_colpali_tpu.ops.paged_attention import (
        paged_attention_int8, paged_attention_int8_xla, quantize_kv_rows)

    rng = np.random.default_rng(4)
    b, hq, hkv, d, page, nb = 2, 4, 2, 32, 8, 3
    p_phys = b * nb + 1
    q = jnp.asarray(rng.standard_normal((b, hq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((p_phys, page, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((p_phys, page, hkv, d)), jnp.float32)
    kc, ks = quantize_kv_rows(k)
    vc, vs = quantize_kv_rows(v)
    bt = jnp.asarray(rng.permutation(p_phys)[: b * nb].reshape(b, nb),
                     jnp.int32)
    lens = jnp.asarray([20, 13], jnp.int32)
    got = paged_attention_int8(q, kc, ks, vc, vs, bt, lens, scale=0.2,
                               interpret=True, window=6)
    want = paged_attention_int8_xla(q, kc, ks, vc, vs, bt, lens, scale=0.2,
                                    window=6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_gemma3_text_prefix_caching_sliding_masks(tiny_g3):
    """Regression: the cached-prefix TAIL prefill must place tail tokens
    at their true global slots - right-aligning them inflated slot
    distances past the pad gap and broke Gemma-3's sliding-window masks
    (text prompts sharing a long prefix decoded differently)."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher

    cfg, params, _ = tiny_g3
    eng = GemmaDecodeEngine(cfg, params)
    shared = list(range(2, 18))                    # two full pages @ 8
    prompts = [shared + [40, 41], shared + [50], shared + [33]]
    want = [eng.generate([p], max_new_tokens=8)[0] for p in prompts]
    bat = PagedContinuousBatcher(eng, batch_slots=3, max_seq_len=64,
                                 chunk=3, page_size=8, prefix_caching=True)
    futs = [bat.submit(p, max_new_tokens=8) for p in prompts]
    bat.drain()
    assert [f.result(60) for f in futs] == want
    assert bat.prefix_prefill_hits >= 1
