"""ColQwen2 retrieval model: Qwen2-VL backbone + 128-d late-interaction head.

TPU-native (flax) equivalent of the ``vidore/colqwen2*`` retrievers the
reference loads through colpali-engine/torch (05_experiment02.py:331-372,
config #4 "ColQwen2-VL at batch 256"). Architecture notes (validated against
transformers' ColQwen2ForRetrieval by the tiny-parity test):

- Vision tower: linear patch embed over [temporal=2, 14, 14] blocks (images
  are temporally doubled by the processor), full bidirectional attention
  over an image's patches with 2D rotary embeddings (h-angles in the first
  quarter of the head dim, w-angles in the second), quick-GELU MLP,
  LayerNorms with bias, and a 2x2 spatial merger MLP into the LM width.
- Language model: Qwen2 decoder - GQA with q/k/v biases, plain-multiply
  RMSNorm, SiLU-gated MLP, and multimodal 3D RoPE (mrope): channels are
  split into temporal/height/width sections, each rotated by its own
  position stream. Attention is CAUSAL (unlike PaliGemma's full prefix
  attention) - retrieval embeddings come from a causal decoder.
- Head: linear projection to embedding_dim + L2 normalization + mask.

For jit-stable shapes the framework pins each image to a resolution bucket
(static grid), so position_ids and the patch layout are computed host-side
by the processor (processing_qwen2vl.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from multimodal_colpali_tpu.models import layers as L


# ---------------------------------------------------------------------------
# Configs
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Qwen2VisionConfig:
    depth: int = 32
    embed_dim: int = 1280
    hidden_size: int = 3584          # merger output == LM hidden for 2-VL-7B; 2048 for colqwen2 (Qwen2-VL-2B)
    num_heads: int = 16
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    mlp_ratio: float = 4.0
    in_channels: int = 3
    # Qwen2.5-VL variant: RMSNorm blocks, gated SiLU MLP, window attention.
    variant: str = "qwen2"           # "qwen2" | "qwen2_5"
    intermediate_size: int = 0       # 2.5 MLP width (0 -> mlp_ratio * embed)
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @property
    def mlp_hidden(self) -> int:
        return self.intermediate_size or int(self.embed_dim * self.mlp_ratio)


@dataclasses.dataclass(frozen=True)
class Qwen2TextConfig:
    vocab_size: int = 151936
    hidden_size: int = 1536
    intermediate_size: int = 8960
    num_hidden_layers: int = 28
    num_attention_heads: int = 12
    num_key_value_heads: int = 2
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    mrope_section: Tuple[int, int, int] = (16, 24, 24)
    # Qwen2-VL-2B ties the LM head to the embed table; 7B does not.
    tie_word_embeddings: bool = True

    is_qwen2 = True   # engine dispatch marker (layer_stack branches on it)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def qwen2_vl_2b(cls) -> "Qwen2TextConfig":
        """Qwen2-VL-2B-Instruct text stack (HF config values) - the LM of
        the reference's old-model AdaptLLM/biomed-Qwen2-VL-2B-Instruct
        (00_run_docker_old_models.sh:24-38)."""
        return cls()   # the dataclass defaults ARE the 2B values

    @classmethod
    def qwen2_vl_7b(cls) -> "Qwen2TextConfig":
        """Qwen2-VL-7B-Instruct text stack (untied LM head)."""
        return cls(vocab_size=152064, hidden_size=3584,
                   intermediate_size=18944, num_hidden_layers=28,
                   num_attention_heads=28, num_key_value_heads=4,
                   tie_word_embeddings=False)

    @classmethod
    def tiny(cls, vocab_size: int = 64) -> "Qwen2TextConfig":
        """Matches ColQwen2ModelConfig.tiny().text (the parity fixtures)."""
        return cls(vocab_size=vocab_size, hidden_size=24,
                   intermediate_size=48, num_hidden_layers=2,
                   num_attention_heads=2, num_key_value_heads=1,
                   rope_theta=10000.0, mrope_section=(1, 2, 3))


@dataclasses.dataclass(frozen=True)
class ColQwen2ModelConfig:
    vision: Qwen2VisionConfig = dataclasses.field(default_factory=Qwen2VisionConfig)
    text: Qwen2TextConfig = dataclasses.field(default_factory=Qwen2TextConfig)
    embedding_dim: int = 128
    image_token_id: int = 151655
    vision_start_token_id: int = 151652
    vision_end_token_id: int = 151653
    # Static resolution bucket (pixels resized to grid*patch_size).
    grid_h: int = 54
    grid_w: int = 54

    @classmethod
    def colqwen2_v1(cls) -> "ColQwen2ModelConfig":
        """vidore/colqwen2-v1.0 - Qwen2-VL-2B backbone."""
        return cls(
            vision=Qwen2VisionConfig(hidden_size=1536),
            text=Qwen2TextConfig(),
        )

    @classmethod
    def colqwen2_5_v0_2(cls) -> "ColQwen2ModelConfig":
        """vidore/colqwen2.5-v0.2 - Qwen2.5-VL-3B backbone."""
        return cls(
            vision=Qwen2VisionConfig(
                depth=32, embed_dim=1280, hidden_size=2048, num_heads=16,
                variant="qwen2_5", intermediate_size=3420,
                window_size=112, fullatt_block_indexes=(7, 15, 23, 31),
            ),
            text=Qwen2TextConfig(
                vocab_size=151936, hidden_size=2048, intermediate_size=11008,
                num_hidden_layers=36, num_attention_heads=16,
                num_key_value_heads=2, rope_theta=1_000_000.0,
                mrope_section=(16, 24, 24),
            ),
        )

    @classmethod
    def qwen2_vl_2b(cls) -> "ColQwen2ModelConfig":
        """Plain Qwen2-VL-2B-Instruct (no retrieval head) - the backbone
        of the reference's old-model AdaptLLM/biomed-Qwen2-VL-2B-Instruct
        (00_run_docker_old_models.sh:24-38); used to convert its full
        checkpoint (vision tower included) for first-party serving."""
        return cls(vision=Qwen2VisionConfig(hidden_size=1536),
                   text=Qwen2TextConfig.qwen2_vl_2b())

    @classmethod
    def qwen2_vl_7b(cls) -> "ColQwen2ModelConfig":
        return cls(vision=Qwen2VisionConfig(hidden_size=3584),
                   text=Qwen2TextConfig.qwen2_vl_7b())

    @classmethod
    def tiny_25(cls, vocab_size: int = 64) -> "ColQwen2ModelConfig":
        return cls(
            vision=Qwen2VisionConfig(depth=3, embed_dim=32, hidden_size=24,
                                     num_heads=2, variant="qwen2_5",
                                     intermediate_size=64, window_size=56,
                                     fullatt_block_indexes=(1,)),
            text=Qwen2TextConfig(vocab_size=vocab_size, hidden_size=24,
                                 intermediate_size=48, num_hidden_layers=2,
                                 num_attention_heads=2, num_key_value_heads=1,
                                 rope_theta=10000.0, mrope_section=(1, 2, 3)),
            embedding_dim=8,
            image_token_id=vocab_size - 1,
            vision_start_token_id=vocab_size - 2,
            vision_end_token_id=vocab_size - 3,
            grid_h=8, grid_w=8,
        )

    @classmethod
    def tiny(cls, vocab_size: int = 64) -> "ColQwen2ModelConfig":
        return cls(
            vision=Qwen2VisionConfig(depth=2, embed_dim=32, hidden_size=24,
                                     num_heads=2, mlp_ratio=2.0),
            text=Qwen2TextConfig(vocab_size=vocab_size, hidden_size=24,
                                 intermediate_size=48, num_hidden_layers=2,
                                 num_attention_heads=2, num_key_value_heads=1,
                                 rope_theta=10000.0, mrope_section=(1, 2, 3)),
            embedding_dim=8,
            image_token_id=vocab_size - 1,
            vision_start_token_id=vocab_size - 2,
            vision_end_token_id=vocab_size - 3,
            grid_h=4, grid_w=4,
        )


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------

def vision_rotary_cos_sin(cfg: Qwen2VisionConfig, grid_h: int, grid_w: int,
                          theta: float = 10000.0) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin [n_patches, head_dim] for the 2D rotary (static grid, numpy).

    Patch order matches the processor's merge-group layout: groups of
    merge_size x merge_size patches are contiguous.
    """
    m = cfg.spatial_merge_size
    hpos = np.arange(grid_h)[:, None].repeat(grid_w, 1)
    wpos = np.arange(grid_w)[None, :].repeat(grid_h, 0)

    def merge_order(p):
        p = p.reshape(grid_h // m, m, grid_w // m, m)
        return p.transpose(0, 2, 1, 3).reshape(-1)

    hpos, wpos = merge_order(hpos), merge_order(wpos)
    dim = cfg.head_dim // 2
    inv_freq = 1.0 / (theta ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    h_ang = hpos[:, None] * inv_freq[None, :]   # [P, head_dim/4]
    w_ang = wpos[:, None] * inv_freq[None, :]
    rot = np.concatenate([h_ang, w_ang], axis=-1)       # [P, head_dim/2]
    emb = np.concatenate([rot, rot], axis=-1)           # [P, head_dim]
    return np.cos(emb).astype(np.float32), np.sin(emb).astype(np.float32)


# Test/debug knob: force the block-diagonal-mask formulation of windowed
# attention even when every window is the same size (the folded fast path
# is the default there; both compute the same math).
_FORCE_WINDOW_MASK = False


def window_partition(cfg: Qwen2VisionConfig, grid_h: int, grid_w: int):
    """Static Qwen2.5 window layout (get_window_index semantics).

    Returns (window_index [n_units] permutation of merge units into window
    order, unit_window_id [n_units] window id per unit in window order).
    """
    m = cfg.spatial_merge_size
    llm_h, llm_w = grid_h // m, grid_w // m
    vmws = cfg.window_size // m // cfg.patch_size
    pad_h = (-llm_h) % vmws
    pad_w = (-llm_w) % vmws
    idx = np.arange(llm_h * llm_w).reshape(llm_h, llm_w)
    idxp = np.full((llm_h + pad_h, llm_w + pad_w), -100)
    idxp[:llm_h, :llm_w] = idx
    nwh, nww = (llm_h + pad_h) // vmws, (llm_w + pad_w) // vmws
    idxp = (idxp.reshape(nwh, vmws, nww, vmws)
            .transpose(0, 2, 1, 3).reshape(nwh * nww, vmws * vmws))
    window_index, unit_wid = [], []
    for w, row in enumerate(idxp):
        valid = row[row != -100]
        window_index.extend(valid.tolist())
        unit_wid.extend([w] * len(valid))
    return np.asarray(window_index, np.int32), np.asarray(unit_wid, np.int32)


class Qwen2VisionBlock(nn.Module):
    cfg: Qwen2VisionConfig

    @nn.compact
    def __call__(self, x, cos, sin, mask=None, win=None, win_lens=None,
                 kv_valid=None):
        c = self.cfg
        b, s, _ = x.shape
        is_25 = c.variant == "qwen2_5"
        norm = (lambda name: Qwen2RMSNorm(name=name)) if is_25 else (
            lambda name: L.LayerNorm(name=name))
        y = norm("norm1")(x)
        qkv = L.DenseGeneral(3 * c.embed_dim, name="qkv")(y)
        q, k, v = jnp.split(qkv.reshape(b, s, 3, c.num_heads, c.head_dim)
                            .transpose(2, 0, 1, 3, 4), 3, axis=0)
        q, k, v = q[0], k[0], v[0]  # [B, S, H, D]
        qf = q.astype(jnp.float32)
        kf = k.astype(jnp.float32)
        cosb = cos[None, :, None, :]
        sinb = sin[None, :, None, :]
        q = ((qf * cosb) + (_rotate_half(qf) * sinb)).astype(x.dtype)
        k = ((kf * cosb) + (_rotate_half(kf) * sinb)).astype(x.dtype)
        if win is not None:
            # Windows in window order: attention factors into independent
            # w-token windows, so fold them into the batch axis instead of
            # masking the full S x S score matrix (42x fewer attention
            # logits at the production 54x54 grid: 49 windows of <=64
            # patches vs 2916^2). Ragged grids arrive pre-padded to equal
            # window size by the tower; ``win_lens`` then carries the
            # valid-key count per window (padding is a per-window suffix).
            # Same math as the block-diagonal mask.
            n_win, w = win
            fold = lambda t: t.reshape(
                b * n_win, w, c.num_heads, c.head_dim)
            kv = None if win_lens is None else jnp.tile(win_lens, b)
            attn = L.attention(fold(q), fold(k), fold(v), mask=None,
                               scale=c.head_dim ** -0.5, kv_lens=kv)
            attn = attn.reshape(b, s, c.embed_dim)
        else:
            attn = L.attention(q, k, v, mask=mask, scale=c.head_dim ** -0.5,
                               kv_valid=kv_valid)
            attn = attn.reshape(b, s, c.embed_dim)
        x = x + L.DenseGeneral(c.embed_dim, name="attn_proj")(attn)
        y = norm("norm2")(x)
        if is_25:
            gate = L.DenseGeneral(c.mlp_hidden, name="gate_proj")(y)
            up = L.DenseGeneral(c.mlp_hidden, name="up_proj")(y)
            x = x + L.DenseGeneral(c.embed_dim, name="down_proj")(
                jax.nn.silu(gate) * up)
        else:
            h = L.DenseGeneral(c.mlp_hidden, name="fc1")(y)
            h = _quick_gelu(h)
            x = x + L.DenseGeneral(c.embed_dim, name="fc2")(h)
        return x


class Qwen2VisionTower(nn.Module):
    """pixel patches [B, P, patch_dim] -> merged features [B, P/m^2, hidden].

    For the 2.5 variant, merge units are permuted into window order before
    the blocks (windowed attention = block-diagonal mask over window ids,
    full attention on ``fullatt_block_indexes``) and the merged tokens are
    un-permuted at the end, exactly as the torch reference does.
    """

    cfg: Qwen2VisionConfig
    grid_h: int
    grid_w: int

    @nn.compact
    def __call__(self, patches):
        c = self.cfg
        m2 = c.spatial_merge_size ** 2
        x = L.DenseGeneral(c.embed_dim, use_bias=False, name="patch_embed")(patches)
        cos_np, sin_np = vision_rotary_cos_sin(c, self.grid_h, self.grid_w)

        is_25 = c.variant == "qwen2_5"
        win_mask = None
        win_fold = None
        win_lens = None
        full_valid = None
        reverse = None
        if is_25:
            win_idx, unit_wid = window_partition(c, self.grid_h, self.grid_w)
            b, s, dd = x.shape
            x = x.reshape(b, s // m2, m2, dd)[:, win_idx].reshape(b, s, dd)
            cos_np = cos_np.reshape(s // m2, m2, -1)[win_idx].reshape(s, -1)
            sin_np = sin_np.reshape(s // m2, m2, -1)[win_idx].reshape(s, -1)
            counts = np.bincount(unit_wid)
            if _FORCE_WINDOW_MASK:
                # test/debug formulation: block-diagonal mask over the full
                # sequence (the folded paths must compute the same function)
                patch_wid = np.repeat(unit_wid, m2)
                win_mask = jnp.asarray(
                    patch_wid[:, None] == patch_wid[None, :]
                )[None, None]  # [1, 1, S, S]
                reverse = np.argsort(win_idx)
            elif counts.min() == counts.max():
                # every window holds the same patch count: fold windows
                # into the batch axis inside the blocks (no mask at all)
                win_fold = (int(len(counts)), int(counts[0]) * m2)
                reverse = np.argsort(win_idx)
            else:
                # Ragged edge windows (grid not divisible by the window
                # size, e.g. the default bucket's 54x54 grid -> 27 units
                # per side vs 4-unit windows): pad every window to the full
                # vmws^2 units ONCE here, so the blocks still fold windows
                # into the batch axis. Padding costs ~(n_win*u_max/n_units)
                # extra matmul rows (~7.5% at 54x54) and buys the fold's
                # ~42x attention-logit reduction over the mask formulation;
                # padded keys are suffix-masked per window via win_lens and
                # padded rows are dropped again after the merger.
                vmws = c.window_size // c.spatial_merge_size // c.patch_size
                u_max = vmws * vmws
                n_win = int(len(counts))
                offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
                slot_src = np.full(n_win * u_max, -1, np.int64)
                for w in range(n_win):
                    slot_src[w * u_max: w * u_max + counts[w]] = (
                        offs[w] + np.arange(counts[w]))
                unit_gather = np.where(slot_src >= 0, slot_src, 0)
                patch_gather = (unit_gather[:, None] * m2
                                + np.arange(m2)[None]).reshape(-1)
                x = x[:, patch_gather]
                cos_np = cos_np[patch_gather]
                sin_np = sin_np[patch_gather]
                win_fold = (n_win, u_max * m2)
                win_lens = jnp.asarray(counts * m2, jnp.int32)
                # full-attention blocks see interspersed padding: mask the
                # padded KEY columns (padded query rows compute garbage
                # that never reaches the output). kv_valid (not a [S, S]
                # mask) keeps those blocks on the fused kernel - the einsum
                # formulation's f32 logits are 4.8 GB/block at batch 8 on
                # the 54x54 production grid.
                full_valid = jnp.asarray((slot_src >= 0).repeat(m2))
                # original unit o sits at window-order position
                # argsort(win_idx)[o], which lives in padded slot
                # slot_of_pos[...]
                slot_of_pos = np.empty(s // m2, np.int64)
                slot_of_pos[slot_src[slot_src >= 0]] = (
                    np.nonzero(slot_src >= 0)[0])
                reverse = slot_of_pos[np.argsort(win_idx)]

        cos = jnp.asarray(cos_np)
        sin = jnp.asarray(sin_np)
        for i in range(c.depth):
            mask = None
            win = None
            lens = None
            valid = None
            if is_25:
                if i not in c.fullatt_block_indexes:
                    mask, win, lens = win_mask, win_fold, win_lens
                else:
                    valid = full_valid
            x = Qwen2VisionBlock(c, name=f"blocks_{i}")(x, cos, sin, mask,
                                                        win, lens, valid)

        # Merger: norm over embed_dim, group m^2 neighbors, 2-layer MLP.
        x = (Qwen2RMSNorm(name="ln_q") if is_25 else L.LayerNorm(name="ln_q"))(x)
        b, s, _ = x.shape
        x = x.reshape(b, s // m2, m2 * c.embed_dim)
        h = L.DenseGeneral(m2 * c.embed_dim, name="merger_fc1")(x)
        h = nn.gelu(h, approximate=False)
        out = L.DenseGeneral(c.hidden_size, name="merger_fc2")(h)
        if is_25:
            out = out[:, reverse]
        return out


# ---------------------------------------------------------------------------
# Language model (Qwen2 with mrope)
# ---------------------------------------------------------------------------

def _llama3_inv_freq(inv_freq: np.ndarray, scaling) -> np.ndarray:
    """HF ``_compute_llama3_parameters``: frequency-dependent inv_freq
    rescaling (rope_type="llama3"). Long wavelengths divide by ``factor``,
    short ones pass through, the medium band interpolates smoothly.
    ``scaling`` = (factor, low_freq_factor, high_freq_factor,
    original_max_position_embeddings)."""
    factor, low_f, high_f, old_len = scaling
    wavelen = 2.0 * np.pi / inv_freq
    low_wl, high_wl = old_len / low_f, old_len / high_f
    scaled = np.where(wavelen > low_wl, inv_freq / factor, inv_freq)
    smooth = (old_len / wavelen - low_f) / (high_f - low_f)
    smoothed = (1.0 - smooth) * scaled / factor + smooth * scaled
    medium = (wavelen >= high_wl) & (wavelen <= low_wl)
    return np.where(medium, smoothed, scaled).astype(np.float32)


def mrope_cos_sin(cfg: Qwen2TextConfig, position_ids: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """position_ids [3, B, S] -> (cos, sin) [B, S, head_dim] with channels
    routed to their temporal/h/w section (apply_multimodal_rotary_pos_emb).
    Configs carrying ``rope_llama3`` (Llama-3.1/3.2 frequency scaling) get
    the statically rescaled inv_freq."""
    half = cfg.head_dim // 2
    inv_np = 1.0 / (cfg.rope_theta
                    ** (np.arange(0, half, dtype=np.float32) / half))
    scaling = getattr(cfg, "rope_llama3", None)
    if scaling is not None:
        inv_np = _llama3_inv_freq(inv_np, scaling)
    inv_freq = jnp.asarray(inv_np)
    ang = position_ids[..., None].astype(jnp.float32) * inv_freq  # [3, B, S, half]
    emb = jnp.concatenate([ang, ang], axis=-1)                    # [3, B, S, head_dim]
    cos_all, sin_all = jnp.cos(emb), jnp.sin(emb)
    # Static per-channel section selector (mirrored across the two halves).
    sec = np.zeros(cfg.head_dim, dtype=np.int32)
    bounds = np.cumsum(cfg.mrope_section)
    for c_idx in range(half):
        sec[c_idx] = int(np.searchsorted(bounds, c_idx, side="right"))
        sec[c_idx + half] = sec[c_idx]
    sel = jnp.asarray(sec)[None, None, :]  # [1, 1, head_dim]
    cos = jnp.take_along_axis(jnp.moveaxis(cos_all, 0, -1), sel[..., None], axis=-1)
    sin = jnp.take_along_axis(jnp.moveaxis(sin_all, 0, -1), sel[..., None], axis=-1)
    return cos[..., 0], sin[..., 0]


class Qwen2Attention(nn.Module):
    cfg: Qwen2TextConfig

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        c = self.cfg
        b, s, _ = x.shape
        q = L.DenseGeneral(c.num_attention_heads * c.head_dim, name="q_proj")(x)
        k = L.DenseGeneral(c.num_key_value_heads * c.head_dim, name="k_proj")(x)
        v = L.DenseGeneral(c.num_key_value_heads * c.head_dim, name="v_proj")(x)
        q = q.reshape(b, s, c.num_attention_heads, c.head_dim)
        k = k.reshape(b, s, c.num_key_value_heads, c.head_dim)
        v = v.reshape(b, s, c.num_key_value_heads, c.head_dim)
        cosb = cos[:, :, None, :].astype(jnp.float32)
        sinb = sin[:, :, None, :].astype(jnp.float32)
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = ((qf * cosb) + (_rotate_half(qf) * sinb)).astype(x.dtype)
        k = ((kf * cosb) + (_rotate_half(kf) * sinb)).astype(x.dtype)
        out = L.attention(q, k, v, mask=mask, scale=c.head_dim ** -0.5)
        out = out.reshape(b, s, c.num_attention_heads * c.head_dim)
        return L.DenseGeneral(c.hidden_size, use_bias=False, name="o_proj")(out)


class Qwen2RMSNorm(nn.Module):
    """Qwen2 convention: y = x/rms(x) * w (no +1, unlike Gemma)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        xf = x.astype(jnp.float32)
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        return (xf * jax.lax.rsqrt(var + self.eps) * w).astype(x.dtype)


class Qwen2DecoderLayer(nn.Module):
    cfg: Qwen2TextConfig

    @nn.compact
    def __call__(self, x, cos, sin, mask):
        c = self.cfg
        y = Qwen2RMSNorm(eps=c.rms_norm_eps, name="input_layernorm")(x)
        x = x + Qwen2Attention(c, name="self_attn")(y, cos, sin, mask)
        y = Qwen2RMSNorm(eps=c.rms_norm_eps, name="post_attention_layernorm")(x)
        gate = L.DenseGeneral(c.intermediate_size, use_bias=False, name="gate_proj")(y)
        up = L.DenseGeneral(c.intermediate_size, use_bias=False, name="up_proj")(y)
        down = L.DenseGeneral(c.hidden_size, use_bias=False, name="down_proj")(
            jax.nn.silu(gate) * up)
        return x + down


class ColQwen2Model(nn.Module):
    cfg: ColQwen2ModelConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jax.Array,                  # [B, S]
        attention_mask: jax.Array,             # [B, S]
        position_ids: jax.Array,               # [3, B, S] mrope positions
        pixel_values: Optional[jax.Array] = None,  # [B, P, patch_dim]
        grid: Optional[tuple] = None,          # static (grid_h, grid_w) override
    ) -> jax.Array:
        c = self.cfg
        gh, gw = grid if grid is not None else (c.grid_h, c.grid_w)
        table = self.param("embed_tokens", nn.initializers.normal(0.02),
                           (c.text.vocab_size, c.text.hidden_size), jnp.float32)
        embeds = jnp.take(
            table, jnp.where(input_ids == c.image_token_id, 0, input_ids), axis=0
        ).astype(pixel_values.dtype if pixel_values is not None else jnp.float32)

        if pixel_values is not None:
            feats = Qwen2VisionTower(c.vision, gh, gw,
                                     name="visual")(pixel_values)  # [B, P/4, hidden]
            is_img = input_ids == c.image_token_id
            img_pos = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0, feats.shape[1] - 1)
            gathered = jnp.take_along_axis(feats, img_pos[..., None], axis=1)
            embeds = jnp.where(is_img[..., None], gathered, embeds)

        cos, sin = mrope_cos_sin(c.text, position_ids)
        s = input_ids.shape[1]
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        pad = attention_mask[:, None, None, :].astype(bool)
        mask = causal & pad

        x = embeds
        for i in range(c.text.num_hidden_layers):
            x = Qwen2DecoderLayer(c.text, name=f"layers_{i}")(x, cos, sin, mask)
        x = Qwen2RMSNorm(eps=c.text.rms_norm_eps, name="norm")(x)

        proj = L.DenseGeneral(c.embedding_dim, name="embedding_proj_layer")(x)
        proj = proj.astype(jnp.float32)
        proj = proj / jnp.maximum(jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-12)
        return proj * attention_mask[..., None].astype(proj.dtype)
