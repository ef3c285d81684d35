"""Weight-only int8 quantization (ops/quant.py + engine ``weight_dtype``).

vLLM exposes ``--quantization`` on the serving surface the reference's
container uses (/root/reference/00_run_docker_containers.sh:26-39 serves
bf16, but the knob is part of the server this framework replaces). On TPU
the payoff is decode bandwidth: serving-batch decode streams every weight
byte per step, so int8 weights are ~2x, and gemma-3-12b (~11.8 GB int8)
fits one 16 GB v5e chip that bf16 (~23.5 GB) cannot.

The exactness pin uses power-of-two scales: scaling by 2^k commutes with
float rounding, so the quantized compute order ((x @ codes) * scale)
carries ZERO quantization error vs the dequantized one
(x @ (codes * scale)); the engines' logits agree to ~1 ulp (XLA may
reassociate f32 sums differently between the two programs) and greedy
decode token-for-token.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from multimodal_colpali_tpu.generation.engine import GemmaDecodeEngine
from multimodal_colpali_tpu.models.configs import (ColPaliModelConfig,
                                                   Gemma3TextConfig)
from multimodal_colpali_tpu.models.registry import (fast_random_params,
                                                    gemma3_random_params)
from multimodal_colpali_tpu.ops.quant import (dequantize, is_quantized,
                                              q_dense, quantize_int8,
                                              quantize_lm_params)

PROMPTS = [[5, 9, 17, 3, 22, 41], [40, 2], list(range(3, 20)), [33]]


def test_quantize_roundtrip_error_bound():
    """|w - dequant(quant(w))| <= scale/2 per channel (symmetric absmax
    with round-to-nearest), and extrema map to ±127 exactly."""
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 24)).astype(np.float32) * 0.07
    q = quantize_int8(jnp.asarray(w), axis=0)
    assert q["q8"].dtype == jnp.int8 and q["scale"].shape == (24,)
    d = np.asarray(dequantize(q, axis=0))
    bound = np.asarray(q["scale"])[None, :] / 2 + 1e-8
    assert (np.abs(w - d) <= bound).all()
    cols = np.argmax(np.abs(w), axis=0)
    assert (np.abs(np.asarray(q["q8"])[cols, np.arange(24)]) == 127).all()


def test_q_dense_matches_dequantized_matmul():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((32, 16)).astype(np.float32) * 0.1
    x = rng.standard_normal((4, 32)).astype(np.float32)
    q = quantize_int8(jnp.asarray(w), axis=0)
    got = np.asarray(q_dense(jnp.asarray(x), q))
    want = x @ np.asarray(dequantize(q, axis=0))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _grid_params(params, seed: int):
    """Rewrite every quantizable leaf onto the int8 x 2^-7 grid with the
    per-channel absmax forced to 127, so ``quantize_int8`` recovers the
    codes and the power-of-two scale EXACTLY."""
    rng = np.random.default_rng(seed)
    s = np.float32(2.0 ** -7)

    def grid(shape, channel_axis):
        codes = rng.integers(-127, 128, shape).astype(np.float32)
        # one ±127 per channel pins scale = 127*s/127 = s exactly
        n_ch = shape[1 - channel_axis] if channel_axis == 0 else shape[0]
        if channel_axis == 0:   # kernels: scale per column
            rows = rng.integers(0, shape[0], shape[1])
            codes[rows, np.arange(shape[1])] = 127.0
        else:                   # embed: scale per row
            cols = rng.integers(0, shape[1], shape[0])
            codes[np.arange(shape[0]), cols] = 127.0
        return codes * s

    def walk(t, in_lm):
        if isinstance(t, dict):
            return {k: (grid(np.asarray(v).shape, 0)
                        if in_lm and k == "kernel"
                        and np.asarray(v).ndim == 2 else walk(v, in_lm))
                    for k, v in t.items()}
        return t

    out = {"language_model": walk(params["language_model"], True),
           "embed": {"embed_tokens": grid(
               np.asarray(params["embed"]["embed_tokens"]).shape, 1)}}
    # carry over any non-kernel leaves the embed subtree might hold
    for k, v in params["embed"].items():
        out["embed"].setdefault(k, v)
    return out


@pytest.mark.parametrize("arch", ["gemma1", "gemma3"])
def test_int8_engine_exact_on_grid_weights(arch):
    """On power-of-two-grid weights in f32 compute, the int8 engine has
    ZERO quantization error end to end (embed, all projections, tied
    logits): dequantization recovers the weights bitwise, and the final
    logits agree to ~1 ulp - the only residual is XLA's contraction
    order, which may differ between the two compiled programs (f32 sums
    reassociate). Greedy decode must agree token-for-token."""
    if arch == "gemma3":
        cfg = Gemma3TextConfig.tiny(vocab_size=64)
        base = gemma3_random_params(cfg, seed=0)
    else:
        ccfg = ColPaliModelConfig.tiny(vocab_size=64)
        from multimodal_colpali_tpu.models.colpali import ColPaliModel
        base = jax.tree.map(
            jnp.asarray, fast_random_params(ColPaliModel(ccfg), ccfg, seed=3))
        cfg = ccfg.text
    params = _grid_params(base, seed=7)
    nat = GemmaDecodeEngine(cfg, params, dtype=jnp.float32)
    q = GemmaDecodeEngine(cfg, params, dtype=jnp.float32,
                          weight_dtype="int8")
    # quantization recovered the grid exactly
    lp = q.params["language_model"]
    first = next(k for k in lp if k.startswith("layers_"))
    qk = lp[first]["self_attn"]["q_proj"]["kernel"]
    assert is_quantized(qk)
    np.testing.assert_array_equal(
        np.asarray(dequantize(qk, axis=0)),
        np.asarray(nat.params["language_model"][first]
                   ["self_attn"]["q_proj"]["kernel"]))

    ln = np.asarray(nat.next_token_logits(PROMPTS, bucket=32))
    lq = np.asarray(q.next_token_logits(PROMPTS, bucket=32))
    # ~1 ulp of f32 at the logit scale; any quantization error proper
    # would be ~scale/2 ~ 4e-3, three orders of magnitude larger
    np.testing.assert_allclose(ln, lq, rtol=0, atol=1e-5)
    gn = nat.generate(PROMPTS, max_new_tokens=10)
    gq = q.generate(PROMPTS, max_new_tokens=10)
    assert gn == gq


@pytest.mark.parametrize("arch", ["gemma1", "gemma3"])
def test_int8_engine_logits_close_on_random_weights(arch):
    """Arbitrary scales: quantization noise on the tiny random model
    stays a small fraction of the logit scale (sanity that per-channel
    absmax is wired per the right axes everywhere)."""
    if arch == "gemma3":
        cfg = Gemma3TextConfig.tiny(vocab_size=64)
        params = gemma3_random_params(cfg, seed=1)
    else:
        ccfg = ColPaliModelConfig.tiny(vocab_size=64)
        from multimodal_colpali_tpu.models.colpali import ColPaliModel
        params = jax.tree.map(
            jnp.asarray, fast_random_params(ColPaliModel(ccfg), ccfg, seed=3))
        cfg = ccfg.text
    nat = GemmaDecodeEngine(cfg, params, dtype=jnp.float32)
    q = GemmaDecodeEngine(cfg, params, dtype=jnp.float32,
                          weight_dtype="int8")
    ln = np.asarray(nat.next_token_logits(PROMPTS, bucket=32))
    lq = np.asarray(q.next_token_logits(PROMPTS, bucket=32))
    scale = np.abs(ln).max()
    assert np.abs(ln - lq).max() < 0.15 * scale


def test_int8_param_bytes_roughly_halved():
    # vocab 2048 so the embed pad (to a multiple of 512) is zero and the
    # byte comparison is clean; real vocabs pad by <0.2%
    cfg = Gemma3TextConfig.tiny(vocab_size=2048)
    params = gemma3_random_params(cfg, seed=0)
    bf16 = GemmaDecodeEngine(cfg, params, dtype=jnp.bfloat16)
    q = GemmaDecodeEngine(cfg, params, dtype=jnp.bfloat16,
                          weight_dtype="int8")
    size = lambda t: sum(x.size * x.dtype.itemsize
                         for x in jax.tree.leaves(t))
    # kernels+embed dominate the tiny tree less than a real one, but the
    # quantized tree must still be well under the bf16 one
    assert size(q.params) < 0.75 * size(bf16.params)


def test_batchers_bit_match_engine_with_int8_weights():
    """Serving contract: every batcher tier streams the int8 engine's own
    generations unchanged (weight quantization is an engine concern; the
    schedulers must not care)."""
    from multimodal_colpali_tpu.generation.paged import PagedContinuousBatcher
    from multimodal_colpali_tpu.generation.scheduler import ContinuousBatcher

    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    eng = GemmaDecodeEngine(cfg, gemma3_random_params(cfg, seed=2),
                            dtype=jnp.float32, weight_dtype="int8")
    want = [eng.generate([p], max_new_tokens=7)[0] for p in PROMPTS]

    dense = ContinuousBatcher(eng, batch_slots=2, max_seq_len=64, chunk=3)
    assert dense.generate(PROMPTS, max_new_tokens=7) == want
    paged = PagedContinuousBatcher(eng, batch_slots=2, max_seq_len=64,
                                   chunk=3, page_size=8)
    assert paged.generate(PROMPTS, max_new_tokens=7) == want


@pytest.mark.parametrize("m", [1, 4, 16])
def test_pallas_int8_matmul_parity_interpret(m):
    """The Pallas weight-int8 kernels (both layouts) match the XLA
    compute order on dividing shapes, including the M sublane pad."""
    from multimodal_colpali_tpu.ops.int8_matmul import (int8_matmul_kn,
                                                        int8_matmul_nk,
                                                        int8_matmul_xla)
    rng = np.random.default_rng(m)
    k, n = 512, 1024
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    codes = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    scale = jnp.asarray(np.abs(rng.standard_normal(n)) * 0.01, jnp.float32)
    got = np.asarray(int8_matmul_kn(x, codes, scale, interpret=True),
                     np.float32)
    want = np.asarray(int8_matmul_xla(x, codes, scale), np.float32)
    assert np.abs(got - want).max() <= 0.02 * np.abs(want).max()

    codes2 = jnp.asarray(rng.integers(-127, 128, (n, k)), jnp.int8)
    got = np.asarray(int8_matmul_nk(x, codes2, scale,
                                    out_dtype=jnp.float32, interpret=True))
    want = np.asarray(int8_matmul_xla(x, codes2, scale,
                                      transpose_codes=True), np.float32)
    assert np.abs(got - want).max() <= 0.02 * np.abs(want).max()


def test_pallas_int8_matmul_fallback_on_odd_shapes():
    """Shapes the tiling cannot divide must fall back to the XLA path
    (same numbers), never silently truncate the grid."""
    from multimodal_colpali_tpu.ops.int8_matmul import (int8_matmul_kn,
                                                        int8_matmul_xla)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((3, 96)), jnp.bfloat16)
    codes = jnp.asarray(rng.integers(-127, 128, (96, 80)), jnp.int8)
    scale = jnp.asarray(np.ones(80), jnp.float32)
    got = np.asarray(int8_matmul_kn(x, codes, scale, interpret=True),
                     np.float32)
    want = np.asarray(int8_matmul_xla(x, codes, scale), np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-2)


def test_native_bf16_logits_avoid_f32_table_cast():
    """q_logits on a bf16 table dots in bf16 with f32 accumulation
    (no [V, H] f32 materialization per decode step); every product is
    exact, so the result matches the f32-cast einsum to ~1 ulp."""
    from multimodal_colpali_tpu.ops.quant import q_logits

    rng = np.random.default_rng(5)
    table = jnp.asarray(rng.standard_normal((640, 32)), jnp.bfloat16)
    hidden = jnp.asarray(rng.standard_normal((4, 32)),
                         jnp.bfloat16).astype(jnp.float32)
    got = np.asarray(q_logits(hidden, table))
    want = np.asarray(jnp.einsum("bh,vh->bv", hidden,
                                 table.astype(jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_quantized_embed_pad_rows_never_leak():
    """quantize_embed_int8 pads the vocab axis to the kernel tile; the
    engine must still emit exactly vocab_size logits and gather only
    real rows."""
    from multimodal_colpali_tpu.ops.quant import quantize_embed_int8

    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    params = gemma3_random_params(cfg, seed=3)
    eng = GemmaDecodeEngine(cfg, params, dtype=jnp.float32,
                            weight_dtype="int8")
    table = eng.params["embed"]["embed_tokens"]
    assert table["q8"].shape[0] % 512 == 0           # padded
    logits = eng.next_token_logits(PROMPTS, bucket=32)
    assert logits.shape == (len(PROMPTS), 64)        # sliced back
    # pad rows are zero codes with scale 1
    q = quantize_embed_int8(jnp.asarray(
        np.random.default_rng(0).standard_normal((70, 8)), jnp.float32))
    assert q["q8"].shape[0] == 512
    assert not np.asarray(q["q8"][70:]).any()
    assert (np.asarray(q["scale"][70:]) == 1.0).all()


def test_pre_quantized_tree_shared_between_engines():
    """07_serve hands the text engine's quantized embed/LM subtrees to
    the mm engine: the second engine must detect them (no re-cast - that
    would degrade the f32 scales to bf16), reuse the SAME buffers, and
    generate identically."""
    cfg = Gemma3TextConfig.tiny(vocab_size=64)
    params = gemma3_random_params(cfg, seed=4)
    e1 = GemmaDecodeEngine(cfg, params, dtype=jnp.bfloat16,
                           weight_dtype="int8")
    shared = {"embed": e1.params["embed"],
              "language_model": e1.params["language_model"]}
    e2 = GemmaDecodeEngine(cfg, shared, dtype=jnp.bfloat16)
    assert e2.weight_dtype == "int8"
    t1 = e1.params["embed"]["embed_tokens"]
    t2 = e2.params["embed"]["embed_tokens"]
    assert t2["q8"] is t1["q8"] and t2["scale"].dtype == jnp.float32
    assert (e2.generate(PROMPTS, max_new_tokens=6)
            == e1.generate(PROMPTS, max_new_tokens=6))


def test_sharded_int8_engine_matches_single_device():
    """dp x tp TP placement shards the int8 CODES like their kernels
    (scales replicate); streams bit-match the unsharded int8 engine -
    the path a 27B int8 deployment runs."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = Gemma3TextConfig(
        vocab_size=64, hidden_size=16, intermediate_size=32,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, sliding_window=8, sliding_window_pattern=2,
        query_pre_attn_scalar=8.0)
    params = gemma3_random_params(cfg, seed=5)
    plain = GemmaDecodeEngine(cfg, params, dtype=jnp.float32,
                              weight_dtype="int8")
    want = plain.generate(PROMPTS, max_new_tokens=8)
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    sh = GemmaDecodeEngine(cfg, params, dtype=jnp.float32, mesh=mesh,
                           weight_dtype="int8")
    assert sh.generate(PROMPTS, max_new_tokens=8) == want
