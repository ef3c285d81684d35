"""Fused Pallas attention kernel vs the einsum reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.ops.attention import fused_attention


def _qkv(rng, b=2, s=24, h=2, d=128):
    q = rng.standard_normal((b, s, h, d)).astype(np.float32)
    k = rng.standard_normal((b, s, h, d)).astype(np.float32)
    v = rng.standard_normal((b, s, h, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


def test_fused_bidirectional(rng):
    q, k, v = _qkv(rng)
    want = L.attention(q, k, v, mask=None, scale=0.125)
    got = fused_attention(q, k, v, scale=0.125, block_q=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_fused_padded_kv(rng):
    q, k, v = _qkv(rng)
    kv_lens = jnp.asarray([20, 9], jnp.int32)
    want = L.attention(q, k, v, mask=None, scale=0.125, kv_lens=kv_lens)
    got = fused_attention(q, k, v, kv_lens, scale=0.125, block_q=8, interpret=True)
    # Only valid query rows matter downstream (padded rows are masked by
    # callers); compare the valid prefix per batch row.
    for b, n in enumerate([20, 9]):
        np.testing.assert_allclose(np.asarray(got)[b, :n], np.asarray(want)[b, :n],
                                   rtol=2e-4, atol=2e-5)


def test_fused_kv_valid(rng):
    """Interspersed key padding (kv_valid) vs an explicit einsum mask."""
    q, k, v = _qkv(rng)
    valid = rng.integers(0, 2, size=(2, 24)).astype(bool)
    valid[:, 0] = True  # keep every row attendable to something
    mask = jnp.asarray(valid)[:, None, None, :]
    want = L.attention(q, k, v, mask=mask, scale=0.125)
    got = fused_attention(q, k, v, None, jnp.asarray(valid), scale=0.125,
                          block_q=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
    # and through the public surface's einsum fallback
    got2 = L.attention(q, k, v, mask=None, scale=0.125,
                       kv_valid=jnp.asarray(valid))
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_fused_causal(rng):
    q, k, v = _qkv(rng)
    want = L.attention(q, k, v, mask=None, scale=0.125, causal=True)
    got = fused_attention(q, k, v, scale=0.125, causal=True, block_q=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)


def test_layers_toggle_routes_to_kernel(rng, monkeypatch):
    """set_fused_attention(True) must produce the same numbers through the
    public layers.attention surface (GQA broadcast included)."""
    q, k, v = _qkv(rng, h=4)
    k1 = k[:, :, :1]
    v1 = v[:, :, :1]
    want = L.attention(q, k1, v1, mask=None, scale=0.1)
    # The fused path is only exercised in interpret mode off-TPU, so patch
    # the kernel entry to force interpret.
    import multimodal_colpali_tpu.ops.attention as A
    orig = A.fused_attention

    def interp(qq, kk, vv, kv_lens=None, kv_valid=None, **kw):
        kw["interpret"] = True
        kw["block_q"] = 8
        return orig(qq, kk, vv, kv_lens, kv_valid, **kw)

    monkeypatch.setattr(A, "fused_attention", interp)
    L.set_fused_attention(True)
    try:
        got = L.attention(q, k1, v1, mask=None, scale=0.1)
    finally:
        L.set_fused_attention(None)  # restore auto
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5)
