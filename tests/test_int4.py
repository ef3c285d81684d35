"""Group-wise int4 weight quantization (ops/quant.py, ops/int4_matmul.py,
engine ``weight_dtype="int4"``).

The reference's ACTUAL generator is google/gemma-3-27b-it
(/root/reference/00_run_docker_containers.sh:26-39); its weight-int8 codes
(~25.6 GB) exceed one 16 GB v5e, so int8 capped first-party serving at
12B. Group-wise int4 (the AWQ/GPTQ storage format vLLM serves) halves the
codes again - 27B fits one chip.

Exactness pin mirrors test_quant.py: weights on an int4 x 2^-3 grid with
every (group, column) absmax saturated at 7 make quantization lossless and
the power-of-two scale multiplication exact, so the int4 engine's logits
agree with the native engine to ~1 ulp and greedy decode token-for-token.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.generation.engine import GemmaDecodeEngine
from multimodal_colpali_tpu.models.configs import Gemma3TextConfig
from multimodal_colpali_tpu.models.registry import (
    gemma3_random_params, gemma3_random_params_int8)
from multimodal_colpali_tpu.ops.quant import (
    _int4_group_for, dequantize_int4, int4_group, is_quantized,
    is_quantized_int4, q_dense, quantize_int4, quantize_lm_params_int4)

PROMPTS = [[5, 9, 17, 3, 22, 41], [40, 2], list(range(3, 20)), [33]]


def test_quantize_int4_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 24)).astype(np.float32) * 0.07
    q = quantize_int4(jnp.asarray(w), group=16)
    assert q["q4"].dtype == jnp.uint8 and q["q4"].shape == (32, 24)
    assert q["scale"].shape == (4, 24)
    assert int4_group(q) == 16
    d = np.asarray(dequantize_int4(q))
    bound = np.repeat(np.asarray(q["scale"]), 16, axis=0) / 2 + 1e-8
    assert (np.abs(w - d) <= bound).all()
    # every (group, column) extremum maps to |code| == 7
    dg = np.abs(np.asarray(d).reshape(4, 16, 24))
    sg = np.asarray(q["scale"])
    np.testing.assert_allclose(dg.max(axis=1), sg * 7, rtol=1e-6)


def test_quantize_int4_exact_on_grid():
    """codes x 2^-3 with saturated groups round-trips bit-for-bit."""
    rng = np.random.default_rng(1)
    g, group, n = 3, 8, 12
    codes = rng.integers(-7, 8, (g * group, n)).astype(np.float32)
    codes[::group, :] = 7.0  # saturate every group/column
    w = codes * np.float32(2.0 ** -3)
    q = quantize_int4(jnp.asarray(w), group=group)
    np.testing.assert_array_equal(np.asarray(dequantize_int4(q)), w)
    np.testing.assert_array_equal(np.asarray(q["scale"]),
                                  np.full((g, n), 2.0 ** -3, np.float32))


def test_q_dense_dispatches_int4():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((32, 16)).astype(np.float32) * 0.1
    x = rng.standard_normal((4, 32)).astype(np.float32)
    q = quantize_int4(jnp.asarray(w), group=16)
    assert is_quantized_int4(q) and not is_quantized(q)
    got = np.asarray(q_dense(jnp.asarray(x), q))
    want = x @ np.asarray(dequantize_int4(q))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("m", [1, 4, 16])
def test_pallas_int4_matmul_parity_interpret(m):
    from multimodal_colpali_tpu.ops.int4_matmul import (int4_matmul_kn,
                                                        int4_matmul_xla)

    rng = np.random.default_rng(3)
    k, n, group = 512, 256, 256
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.05
    q = quantize_int4(jnp.asarray(w), group=group)
    x = jnp.asarray(rng.standard_normal((m, k)).astype(np.float32))
    got = np.asarray(int4_matmul_kn(x, q["q4"], q["scale"], block_n=128,
                                    interpret=True))
    want = np.asarray(int4_matmul_xla(x, q["q4"], q["scale"]))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_quantize_lm_params_structure():
    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    params = gemma3_random_params(cfg, seed=0)
    q = jax.jit(quantize_lm_params_int4)(params)
    assert is_quantized(q["embed"]["embed_tokens"])   # embed stays int8
    lm = q["language_model"]
    first = next(k for k in lm if k.startswith("layers_"))
    qk = lm[first]["self_attn"]["q_proj"]["kernel"]
    assert is_quantized_int4(qk)
    assert int4_group(qk) == 16          # hidden 16 -> group 16


def _grid_params_int4(params, seed: int):
    """Every LM kernel onto the int4 x 2^-3 grid with saturated groups
    (per the group quantize_lm_params_int4 will pick); the embed table
    onto the int8 x 2^-7 grid (it stays int8)."""
    rng = np.random.default_rng(seed)

    def kernel_grid(shape):
        g = _int4_group_for(shape[0], 256)
        assert g, shape
        codes = rng.integers(-7, 8, shape).astype(np.float32)
        codes[::g, :] = 7.0
        return codes * np.float32(2.0 ** -3)

    def embed_grid(shape):
        codes = rng.integers(-127, 128, shape).astype(np.float32)
        cols = rng.integers(0, shape[1], shape[0])
        codes[np.arange(shape[0]), cols] = 127.0
        return codes * np.float32(2.0 ** -7)

    def walk(t):
        if isinstance(t, dict):
            return {k: (kernel_grid(np.asarray(v).shape)
                        if k == "kernel" and np.asarray(v).ndim == 2
                        else walk(v)) for k, v in t.items()}
        return t

    out = {"language_model": walk(params["language_model"]),
           "embed": dict(params["embed"])}
    out["embed"]["embed_tokens"] = embed_grid(
        np.asarray(params["embed"]["embed_tokens"]).shape)
    return out


def test_int4_engine_exact_on_grid_weights():
    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    params = _grid_params_int4(gemma3_random_params(cfg, seed=0), seed=7)
    nat = GemmaDecodeEngine(cfg, params, dtype=jnp.float32)
    q = GemmaDecodeEngine(cfg, params, dtype=jnp.float32,
                          weight_dtype="int4")
    assert q.weight_dtype == "int4"
    lp = q.params["language_model"]
    first = next(k for k in lp if k.startswith("layers_"))
    qk = lp[first]["self_attn"]["q_proj"]["kernel"]
    assert is_quantized_int4(qk)
    np.testing.assert_array_equal(
        np.asarray(dequantize_int4(qk)),
        np.asarray(nat.params["language_model"][first]
                   ["self_attn"]["q_proj"]["kernel"]))

    ln = np.asarray(nat.next_token_logits(PROMPTS, bucket=32))
    lq = np.asarray(q.next_token_logits(PROMPTS, bucket=32))
    np.testing.assert_allclose(ln, lq, rtol=0, atol=1e-5)
    assert nat.generate(PROMPTS, max_new_tokens=10) == \
        q.generate(PROMPTS, max_new_tokens=10)


def test_int4_engine_logits_close_on_random_weights():
    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    params = gemma3_random_params(cfg, seed=1)
    nat = GemmaDecodeEngine(cfg, params, dtype=jnp.float32)
    q = GemmaDecodeEngine(cfg, params, dtype=jnp.float32,
                          weight_dtype="int4")
    ln = np.asarray(nat.next_token_logits(PROMPTS, bucket=32))
    lq = np.asarray(q.next_token_logits(PROMPTS, bucket=32))
    scale = np.abs(ln).max()
    # int4 noise is ~16x int8's; the tiny model still keeps logits close
    assert np.abs(ln - lq).max() < 0.5 * scale


def test_batchers_bit_match_engine_with_int4_weights():
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    eng = GemmaDecodeEngine(cfg, gemma3_random_params(cfg, seed=2),
                            dtype=jnp.float32, weight_dtype="int4")
    want = [eng.generate([p], max_new_tokens=7)[0] for p in PROMPTS]
    dense = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=3)
    assert dense.generate(PROMPTS, max_new_tokens=7) == want
    paged = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                   chunk=3, page_size=8)
    assert paged.generate(PROMPTS, max_new_tokens=7) == want


def test_int4_device_init_stream_matches_post_quant():
    """gemma3_random_params_int8(fmt="int4") produces the same tree
    structure the engine's post-load quantization does, and the engine
    detects it as pre-quantized int4."""
    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    pre = gemma3_random_params_int8(cfg, seed=0, fmt="int4")
    eng = GemmaDecodeEngine(cfg, pre, dtype=jnp.float32)
    assert eng.weight_dtype == "int4"
    out = eng.generate(PROMPTS[:2], max_new_tokens=6)
    assert all(len(t) == 6 for t in out)


def test_int4_param_bytes_quartered():
    cfg = Gemma3TextConfig.tiny(vocab_size=2048)
    params = gemma3_random_params(cfg, seed=0)
    bf16 = GemmaDecodeEngine(cfg, params, dtype=jnp.bfloat16)
    q8 = GemmaDecodeEngine(cfg, params, dtype=jnp.bfloat16,
                           weight_dtype="int8")
    q4 = GemmaDecodeEngine(cfg, params, dtype=jnp.bfloat16,
                           weight_dtype="int4")
    size = lambda t: sum(x.size * x.dtype.itemsize
                         for x in jax.tree.leaves(t))
    lm = lambda e: size(e.params["language_model"])
    # tiny dims make norms/scales relatively heavy; real ratios below
    assert lm(q8) < 0.7 * lm(bf16)
    assert lm(q4) < 0.8 * lm(q8)
    # at production shape the int4 bytes are ~0.52x the int8 bytes
    w = jnp.zeros((4096, 4096), jnp.float32)
    b8 = size(jax.jit(lambda w: __import__(
        "multimodal_colpali_tpu.ops.quant", fromlist=["quantize_int8"]
    ).quantize_int8(w, axis=0))(w))
    b4 = size(jax.jit(lambda w: quantize_int4(w, group=256))(w))
    assert b4 < 0.55 * b8


def test_int4_rejects_tp_mesh():
    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    params = gemma3_random_params(cfg, seed=0)
    devs = np.array(jax.devices()[:2]).reshape(1, 2)
    from jax.sharding import Mesh

    with pytest.raises(ValueError, match="does not support TP"):
        GemmaDecodeEngine(cfg, params, dtype=jnp.float32,
                          mesh=Mesh(devs, ("data", "model")),
                          weight_dtype="int4")
