"""Fused transformer-layer kernels (ops/fused_layer.py) vs the flax path.

The kernels fuse LN1+QKV+attention+proj+residual and LN2+MLP+residual of a
SigLIP encoder layer (the ColSmol-256M hot path, reference
functions.py:765-809 with the ColIdefics3 retriever at
05_experiment02.py:331-372). Parity oracle: the unfused
models/siglip.SiglipEncoderLayer with identical params; interpret mode on
CPU, hardware parity via scripts/tpu_validate.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.models.configs import SiglipVisionConfig
from multimodal_colpali_tpu.models.siglip import SiglipEncoderLayer
from multimodal_colpali_tpu.ops.fused_layer import (
    attention_block_plan, fused_mlp_block, fused_vit_attention_block,
    fused_vit_layer, layer_plan, mlp_block_plan)

CFG = SiglipVisionConfig(hidden_size=256, intermediate_size=512,
                         num_hidden_layers=1, num_attention_heads=4,
                         image_size=128, patch_size=8)   # 256 patch tokens


def _layer_params(rng=0):
    layer = SiglipEncoderLayer(CFG)
    x = jnp.zeros((1, 256, CFG.hidden_size), jnp.float32)
    return layer, layer.init(jax.random.PRNGKey(rng), x)


def _flat(p):
    a = p["params"]["self_attn"]
    m = p["params"]["mlp"]
    return (p["params"]["layer_norm1"]["weight"],
            p["params"]["layer_norm1"]["bias"],
            a["q_proj"]["kernel"], a["q_proj"]["bias"],
            a["k_proj"]["kernel"], a["k_proj"]["bias"],
            a["v_proj"]["kernel"], a["v_proj"]["bias"],
            a["out_proj"]["kernel"], a["out_proj"]["bias"],
            p["params"]["layer_norm2"]["weight"],
            p["params"]["layer_norm2"]["bias"],
            m["fc1"]["kernel"], m["fc1"]["bias"],
            m["fc2"]["kernel"], m["fc2"]["bias"])


@pytest.fixture()
def layer_and_params():
    return _layer_params()


def test_attention_block_matches_flax(layer_and_params):
    layer, params = layer_and_params
    (g1, b1, wq, bq, wk, bk, wv, bv, wo, bo, *_) = _flat(params)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 256, 256),
                          jnp.float32).astype(jnp.bfloat16)

    got = fused_vit_attention_block(
        x, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo,
        heads=CFG.num_attention_heads, eps=CFG.layer_norm_eps,
        interpret=True)

    # oracle: the flax sub-path (LN1 + attention + residual only)
    from multimodal_colpali_tpu.models.siglip import SiglipAttention

    def ref(x):
        y = L.LayerNorm(eps=CFG.layer_norm_eps, name="layer_norm1")(x)
        return x + SiglipAttention(CFG, name="self_attn")(y)

    import flax.linen as nn

    class Ref(nn.Module):
        @nn.compact
        def __call__(self, x):
            return ref(x)

    want = Ref().apply(
        {"params": {"layer_norm1": params["params"]["layer_norm1"],
                    "self_attn": params["params"]["self_attn"]}}, x)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_mlp_block_matches_flax(layer_and_params):
    layer, params = layer_and_params
    (*_, g2, b2, w1, bb1, w2, bb2) = _flat(params)
    # 2*256 = 512 rows: not a multiple of the 256-row tile after batch
    # flattening when b=3 (768 rows) - exercise the pad path with b=3, and
    # the exact path with b=2
    for b in (2, 3):
        x = jax.random.normal(jax.random.PRNGKey(2 + b), (b, 256, 256),
                              jnp.float32).astype(jnp.bfloat16)
        got = fused_mlp_block(x, g2, b2, w1, bb1, w2, bb2,
                              eps=CFG.layer_norm_eps, interpret=True)

        import flax.linen as nn

        from multimodal_colpali_tpu.models.siglip import SiglipMLP

        class Ref(nn.Module):
            @nn.compact
            def __call__(self, x):
                y = L.LayerNorm(eps=CFG.layer_norm_eps,
                                name="layer_norm2")(x)
                return x + SiglipMLP(CFG, name="mlp")(y)

        want = Ref().apply(
            {"params": {"layer_norm2": params["params"]["layer_norm2"],
                        "mlp": params["params"]["mlp"]}}, x)
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32),
                                   atol=3e-2, rtol=3e-2)


def test_whole_layer_kernel_matches_flax(layer_and_params):
    """fused_vit_layer (the single whole-layer kernel, raised VMEM limit)
    against the full unfused SiglipEncoderLayer apply."""
    layer, params = layer_and_params
    x = jax.random.normal(jax.random.PRNGKey(7), (3, 256, 256),
                          jnp.float32).astype(jnp.bfloat16)
    want = layer.apply(params, x)
    got = fused_vit_layer(
        x, *_flat(params), heads=CFG.num_attention_heads,
        eps=CFG.layer_norm_eps, interpret=True)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)


def test_full_layer_through_flax_gate(layer_and_params):
    """set_fused_layer(True) routes SiglipEncoderLayer through both kernels
    (interpret mode off-TPU) and matches the unfused apply."""
    layer, params = layer_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 256, 256),
                          jnp.float32).astype(jnp.bfloat16)
    want = layer.apply(params, x)
    L.set_fused_layer(True)
    try:
        got = layer.apply(params, x)
    finally:
        L.set_fused_layer(None)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)
    # and OFF is the default off-TPU: same object, no kernels involved
    again = layer.apply(params, x)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(want))


def test_vmem_plans_gate_shapes():
    # ColSmol's SigLIP-768 tower fits the whole-layer kernel
    assert layer_plan(1024, 768, 3072, 12) is not None
    # and the partial A/B kernels
    assert attention_block_plan(1024, 768, 12) is not None
    assert mlp_block_plan(768, 3072) is not None
    # ColPali's SO400M tower (H=1152, I=4304, head_dim 72) exceeds the
    # plan ceiling - stays on the unfused path
    assert layer_plan(1024, 1152, 4304, 16) is None
    assert mlp_block_plan(1152, 4304) is None
    # sequences that are not 128-multiples (tiny test configs) are rejected
    assert layer_plan(16, 768, 3072, 12) is None
    assert attention_block_plan(16, 768, 12) is None
    # the flax gate composes the plan
    assert not L._fused_layer_enabled(16, 768, 3072, 12)
    assert not L._fused_layer_enabled(1024, 1152, 4304, 16)


def test_fused_layer_in_colsmol_shape():
    """The real ColSmol layer shape (S=1024, H=768, I=3072, 12 heads)
    through both kernels in interpret mode, small batch."""
    cfg = SiglipVisionConfig(hidden_size=768, intermediate_size=3072,
                             num_hidden_layers=1, num_attention_heads=12,
                             image_size=512, patch_size=16)
    layer = SiglipEncoderLayer(cfg)
    x0 = jnp.zeros((1, 1024, 768), jnp.float32)
    params = layer.init(jax.random.PRNGKey(0), x0)
    x = (jax.random.normal(jax.random.PRNGKey(4), (1, 1024, 768))
         .astype(jnp.bfloat16))
    want = layer.apply(params, x)
    L.set_fused_layer(True)
    try:
        got = layer.apply(params, x)
    finally:
        L.set_fused_layer(None)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=3e-2, rtol=3e-2)
