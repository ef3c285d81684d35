"""SigLIP vision tower (flax.linen) - PaliGemma's image encoder.

JAX/XLA reimplementation of the vision side the reference runs through
torch+flash-attn (reference 01_create_context_qdrant.py:163-205 loads
``vidore/colpali-*`` whose backbone is SigLIP-So400m). Patchify is a single
conv (one big MXU matmul after im2col by XLA); attention is full
bidirectional over the 1024 patch tokens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.models.configs import SiglipVisionConfig


class SiglipMLP(nn.Module):
    cfg: SiglipVisionConfig

    @nn.compact
    def __call__(self, x):
        x = L.DenseGeneral(self.cfg.intermediate_size, name="fc1")(x)
        x = nn.gelu(x, approximate=True)  # gelu_pytorch_tanh
        return L.DenseGeneral(self.cfg.hidden_size, name="fc2")(x)


class SiglipAttention(nn.Module):
    cfg: SiglipVisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        head_dim = c.hidden_size // c.num_attention_heads
        b, s, _ = x.shape
        q = L.DenseGeneral(c.hidden_size, name="q_proj")(x)
        k = L.DenseGeneral(c.hidden_size, name="k_proj")(x)
        v = L.DenseGeneral(c.hidden_size, name="v_proj")(x)
        q = q.reshape(b, s, c.num_attention_heads, head_dim)
        k = k.reshape(b, s, c.num_attention_heads, head_dim)
        v = v.reshape(b, s, c.num_attention_heads, head_dim)
        out = L.attention(q, k, v, mask=None, scale=head_dim ** -0.5)
        out = out.reshape(b, s, c.hidden_size)
        return L.DenseGeneral(c.hidden_size, name="out_proj")(out)


class SiglipEncoderLayer(nn.Module):
    cfg: SiglipVisionConfig

    def _fused_layer_params(self, x):
        """This layer's param arrays when the fused-layer kernels apply,
        else None (init pass, shape over VMEM budget, int8-quantized
        kernels, or the gate is off)."""
        c = self.cfg
        if self.is_initializing() or not L._fused_layer_enabled(
                x.shape[1], c.hidden_size, c.intermediate_size,
                c.num_attention_heads, x.dtype.itemsize):
            return None
        try:
            p = self.variables["params"]
        except KeyError:
            return None
        mods = [("layer_norm1", "weight"), ("layer_norm1", "bias")]
        for m in ("q_proj", "k_proj", "v_proj", "out_proj"):
            mods += [("self_attn", m, "kernel"), ("self_attn", m, "bias")]
        mods += [("layer_norm2", "weight"), ("layer_norm2", "bias")]
        for m in ("fc1", "fc2"):
            mods += [("mlp", m, "kernel"), ("mlp", m, "bias")]
        leaves = []
        for path in mods:
            node = p
            for key in path:
                if not isinstance(node, (dict,)) and not hasattr(node, "get"):
                    return None
                node = node.get(key) if hasattr(node, "get") else None
                if node is None:
                    return None
            if isinstance(node, dict):    # int8-quantized kernel dict
                return None
            leaves.append(node)
        return leaves

    @nn.compact
    def __call__(self, x):
        fused = self._fused_layer_params(x)
        # "attn"/"mlp" isolate the partial kernels for hardware A/B runs;
        # the default "both" is the whole-layer kernel. Module-level
        # setting, fixed at import (layers.set_fused_parts)
        parts = L._FUSED_PARTS
        use_attn = fused is not None and parts == "attn"
        use_mlp = fused is not None and parts == "mlp"
        if fused is not None:
            from multimodal_colpali_tpu.ops import fused_layer as FL

            (g1, b1, wq, bq, wk, bk, wv, bv, wo, bo,
             g2, b2, w1, bb1, w2, bb2) = fused
            interp = jax.default_backend() != "tpu"
            if parts == "both":
                return FL.fused_vit_layer(
                    x, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo,
                    g2, b2, w1, bb1, w2, bb2,
                    heads=self.cfg.num_attention_heads,
                    eps=self.cfg.layer_norm_eps, interpret=interp)
        if use_attn:
            x = FL.fused_vit_attention_block(
                x, g1, b1, wq, bq, wk, bk, wv, bv, wo, bo,
                heads=self.cfg.num_attention_heads,
                eps=self.cfg.layer_norm_eps, interpret=interp)
        else:
            y = L.LayerNorm(eps=self.cfg.layer_norm_eps,
                            name="layer_norm1")(x)
            x = x + SiglipAttention(self.cfg, name="self_attn")(y)
        if use_mlp:
            return FL.fused_mlp_block(
                x, g2, b2, w1, bb1, w2, bb2,
                eps=self.cfg.layer_norm_eps, interpret=interp)
        y = L.LayerNorm(eps=self.cfg.layer_norm_eps, name="layer_norm2")(x)
        x = x + SiglipMLP(self.cfg, name="mlp")(y)
        return x


class SiglipVisionTower(nn.Module):
    """pixel_values [B, H, W, 3] (NHWC, already normalized) -> [B, P, hidden].

    ``pos_index``: optional static per-patch index into the position table.
    SigLIP/PaliGemma uses sequential positions (None); Idefics3/SmolVLM uses
    bucketized fractional coordinates, which its caller precomputes.
    """

    cfg: SiglipVisionConfig
    pos_index: tuple = ()

    @nn.compact
    def __call__(self, pixel_values):
        c = self.cfg
        x = nn.Conv(
            features=c.hidden_size,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            name="patch_embedding",
            dtype=pixel_values.dtype,
            param_dtype=jnp.float32,
        )(pixel_values)
        b = x.shape[0]
        x = x.reshape(b, -1, c.hidden_size)  # row-major patch order == torch
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (c.num_patches, c.hidden_size), jnp.float32,
        )
        if self.pos_index:
            pos = pos[jnp.asarray(self.pos_index)]
        x = x + pos.astype(x.dtype)[None]
        for i in range(c.num_hidden_layers):
            x = SiglipEncoderLayer(c, name=f"layers_{i}")(x)
        return L.LayerNorm(eps=c.layer_norm_eps, name="post_layernorm")(x)
