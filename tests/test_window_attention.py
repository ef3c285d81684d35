"""Fused window-attention kernel parity (ops/window_attention.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from multimodal_colpali_tpu.ops.window_attention import (
    window_attention, window_attention_xla)


@pytest.mark.parametrize("n,s,d", [(7, 144, 32), (64, 16, 8), (130, 144, 32)])
def test_window_kernel_matches_xla(n, s, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((n, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((n, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n, s, d)), jnp.float32)
    got = window_attention(q, k, v, scale=d ** -0.5, interpret=True)
    want = window_attention_xla(q, k, v, scale=d ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_window_kernel_matches_layers_attention_math():
    """The [N, S, D] row layout must equal models/layers.attention on the
    equivalent [n_win, S, heads, D] batch (the shape WindowAttention uses)."""
    from multimodal_colpali_tpu.models import layers as L

    rng = np.random.default_rng(1)
    n_win, s, heads, d = 6, 144, 4, 32
    q = jnp.asarray(rng.standard_normal((n_win, s, heads, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((n_win, s, heads, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((n_win, s, heads, d)), jnp.float32)
    want = np.asarray(L.attention(q, k, v, mask=None, scale=d ** -0.5))

    rows = lambda t: t.transpose(0, 2, 1, 3).reshape(n_win * heads, s, d)
    got = window_attention(rows(q), rows(k), rows(v), scale=d ** -0.5,
                           interpret=True)
    got = np.asarray(got).reshape(n_win, heads, s, d).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_colflor_forward_same_with_and_without_kernel(monkeypatch):
    """The model output is identical (numerics aside) whichever dispatch
    WindowAttention takes - pinned off-TPU by forcing both paths."""
    import warnings

    import multimodal_colpali_tpu.models.florence2 as F
    from multimodal_colpali_tpu.models.registry import load_retriever

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = load_retriever("tiny-colflor", dtype=jnp.float32)
    from PIL import Image

    rng = np.random.default_rng(2)
    imgs = [Image.fromarray(rng.integers(0, 255, (64, 64, 3), np.uint8))]

    monkeypatch.setenv("MMCP_WINDOW_ATTENTION", "0")
    a = np.asarray(r.embed_images(imgs)[0])
    r._jit_cache.clear()
    monkeypatch.setenv("MMCP_WINDOW_ATTENTION", "1")
    # off-TPU the kernel wrapper falls back to the XLA reference, which
    # still exercises the [N, S, D] reshape round-trip
    b = np.asarray(r.embed_images(imgs)[0])
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
