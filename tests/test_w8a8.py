"""W8A8 int8 encoder quantization (ops/quant.py + load_retriever(quantize)).

The embed hot loop (/root/reference/functions.py:765-809) is MXU
compute-bound in bf16; W8A8 raises the compute ceiling (int8 MXU runs at
2x the bf16 rate on v5e). These tests pin the numerics three ways:

1. exactness: with weights on a power-of-two grid and integer activations
   the int8 path has ZERO quantization error (int32 accumulation is exact),
   so w8a8_dense must match the f32 reference bit-for-bit;
2. noise bound + ranking stability on a real (tiny random) encoder:
   quantized embeddings stay highly aligned with bf16 ones and MaxSim
   rankings keep the same top-1 on separated corpora;
3. surface: load_retriever(..., quantize="int8") rewrites only 2-D
   kernels, keeps convs/norms/embeds intact, and embeds end to end.
"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.models import load_retriever
from multimodal_colpali_tpu.models.layers import dense
from multimodal_colpali_tpu.ops.quant import (
    quantize_act_int8,
    quantize_encoder_params,
    quantize_int8,
    w8a8_dense,
)


def test_w8a8_exact_on_saturated_grid(rng):
    """When every weight column and every activation row contain an entry
    of magnitude exactly equal to 127x their quantization step, absmax
    scaling round-trips both operands exactly; the int32 contraction is
    exact, so the result must equal the same-order f32 reference bit for
    bit (the analog of test_quant.py's power-of-two end-to-end pin)."""
    k, n, m = 64, 32, 8
    # integer codes in [-127, 127] with +/-127 present in every column,
    # so the re-derived per-column scale is exactly 1/127
    codes = rng.integers(-126, 127, (k, n))
    codes[0, :] = 127
    w = (codes / 127.0).astype(np.float32)
    # integer activations with per-row absmax exactly 127 -> scale 1.0
    x = rng.integers(-126, 127, (m, k)).astype(np.float32)
    x[:, 0] = 127.0

    qw = quantize_int8(jnp.asarray(w), axis=0)
    np.testing.assert_array_equal(np.asarray(qw["q8"], np.int64), codes)
    xq, sx = quantize_act_int8(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(xq, np.float32), x)
    np.testing.assert_array_equal(np.asarray(sx), np.ones((m, 1), np.float32))

    got = np.asarray(w8a8_dense(jnp.asarray(x), qw), np.float32)
    acc = (x.astype(np.int64) @ codes).astype(np.float32)  # exact int32 range
    want = acc * np.asarray(qw["scale"])[None, :]
    np.testing.assert_array_equal(got, want)


def test_quantize_act_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(5, 64)).astype(np.float32))
    q, s = quantize_act_int8(x)
    deq = np.asarray(q, np.float32) * np.asarray(s)
    # absmax symmetric: |err| <= scale/2 per element
    np.testing.assert_allclose(deq, np.asarray(x),
                               atol=float(np.max(np.asarray(s))) / 2 + 1e-7)
    # zero rows stay zero with unit scale
    q0, s0 = quantize_act_int8(jnp.zeros((2, 8)))
    assert np.all(np.asarray(q0) == 0)
    np.testing.assert_array_equal(
        np.asarray(s0), np.full((2, 1), np.float32(1.0) / np.float32(127.0)))


def test_dense_dispatches_on_dict(rng):
    x = jnp.asarray(rng.normal(size=(4, 7, 32)).astype(np.float32))
    w = rng.normal(size=(32, 16)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    qw = quantize_int8(jnp.asarray(w), axis=0)
    got = dense(x, qw, jnp.asarray(b))
    ref = x @ w + b
    # int8 noise bound: |err| <~ sqrt(K) * (sx*sw) with K=32 N(0,1) terms
    assert np.max(np.abs(np.asarray(got) - np.asarray(ref))) < 0.35
    cos = np.sum(np.asarray(got) * np.asarray(ref)) / (
        np.linalg.norm(got) * np.linalg.norm(ref))
    assert cos > 0.999


def test_quantize_encoder_params_structure():
    with pytest.warns(UserWarning, match="random init"):
        r = load_retriever("tiny-colpali", seed=0)
    q = quantize_encoder_params(r.params)

    kinds = {"quant": 0, "conv": 0, "other": 0}

    def walk(t, path=()):
        if isinstance(t, dict):
            if "q8" in t and "scale" in t and len(t) == 2:
                kinds["quant"] += 1
                assert t["q8"].dtype == jnp.int8
                return
            for k, v in t.items():
                walk(v, path + (k,))
            return
        if path[-1] == "kernel":
            assert t.ndim != 2, path  # every 2-D kernel must be rewritten
            kinds["conv"] += 1
        else:
            kinds["other"] += 1

    walk(q)
    assert kinds["quant"] > 10          # all projections
    assert kinds["conv"] >= 1           # patch-embedding conv untouched
    assert kinds["other"] > 0           # norms/biases untouched


@pytest.fixture(scope="module")
def pair():
    with pytest.warns(UserWarning, match="random init"):
        bf = load_retriever("tiny-colpali", seed=0)
    with pytest.warns(UserWarning, match="random init"):
        q8 = load_retriever("tiny-colpali", seed=0, quantize="int8")
    return bf, q8


def _imgs(rng, n, size=28):
    return [Image.fromarray(
        rng.integers(0, 255, (size, size, 3), dtype=np.uint8), "RGB")
        for _ in range(n)]


def test_quantized_embeddings_aligned(pair, rng):
    bf, q8 = pair
    imgs = _imgs(rng, 4)
    e_bf = bf.embed_images(imgs)
    e_q8 = q8.embed_images(imgs)
    for a, b in zip(e_bf, e_q8):
        assert a.shape == b.shape
        # both are L2-normalized per token; alignment per token
        cos = np.sum(a * b, axis=-1)
        assert float(np.mean(cos)) > 0.98, float(np.mean(cos))


def test_quantized_ranking_stable(pair, rng):
    """Self-retrieval: every page's own embedding must still rank that
    page first under the quantized encoder (scores via exact MaxSim)."""
    bf, q8 = pair
    imgs = _imgs(rng, 6)
    docs = q8.embed_images(imgs)
    queries = q8.embed_images(imgs)  # same pages as 'queries'
    nt = max(d.shape[0] for d in docs)
    D = np.stack([np.pad(d, ((0, nt - d.shape[0]), (0, 0))) for d in docs])
    for i, q in enumerate(queries):
        scores = np.einsum("qd,ptd->pqt", q, D).max(-1).sum(-1)
        assert int(np.argmax(scores)) == i


def test_quantized_query_path(pair):
    bf, q8 = pair
    a = bf.embed_queries(["what is a glycan?"])[0]
    b = q8.embed_queries(["what is a glycan?"])[0]
    assert a.shape == b.shape
    assert float(np.mean(np.sum(a * b, axis=-1))) > 0.98


def test_bad_quantize_mode_raises():
    with pytest.raises(ValueError, match="unknown quantize mode"):
        with pytest.warns(UserWarning, match="random init"):
            load_retriever("tiny-colpali", quantize="fp4")
