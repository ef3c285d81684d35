"""TPU-native autoregressive generation engine (KV-cache decode).

The reference outsources ALL generation to a vLLM server
(00_run_docker_containers.sh:26-39) and talks to it over HTTP
(functions.py:1036-1064). This framework keeps that HTTP client seam for
external models, and additionally provides a first-party decode engine so
generation itself can run on TPU: the Gemma LM stack the retrieval models
already carry (models/gemma.py) becomes a causal language model with a KV
cache, greedy/temperature sampling, and an OpenAI-compatible server on top
(generation/server.py).

TPU-first design:

- **Whole-generation-in-one-jit**: prefill AND every decode step run inside
  one jitted function - the decode loop is a ``lax.scan`` writing K/V into
  preallocated ``[B, S+N, H, D]`` cache buffers with
  ``dynamic_update_slice``. Per-dispatch overhead (35-45 ms through this
  environment's TPU tunnel) would otherwise dwarf per-token compute.
- **Static shapes**: prompts are LEFT-padded to a bucket, so the cache stays
  contiguous at the right end, the last prompt slot is always the newest
  token, and masking is one comparison against a global index.
- **One source of math**: each layer mirrors models/gemma.py exactly
  (same rope/RMSNorm/attention helpers); tests pin the prefill logits to
  ``GemmaModel.apply(causal=True)`` and full-stack logits to torch
  ``GemmaForCausalLM``.

Batching is static (B prompts per call); continuous batching/eviction is a
scheduler concern layered above (round-3 candidate), not a kernel concern.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.models import layers as L
from multimodal_colpali_tpu.models.configs import GemmaTextConfig
from multimodal_colpali_tpu.ops.quant import (
    q_dense, q_logits, q_take, quantize_lm_params, quantize_lm_params_int4)


def _detect_quantized_dtype(lm_tree: Any) -> str:
    """\"int4\" / \"int8\" / \"native\" by probing the first kernel dict in a
    language_model subtree (pre-quantized trees carry their format in the
    leaves; the embed table is int8 in BOTH quantized formats)."""
    found: list = []

    def walk(t):
        if found or not isinstance(t, dict):
            return
        if "q4" in t:
            found.append("int4")
            return
        if "q8" in t:
            found.append("int8")
            return
        for v in t.values():
            walk(v)

    walk(lm_tree)
    return found[0] if found else "native"


def _rms(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * (1.0 + w)).astype(x.dtype)


def _lin(x: jax.Array, p: Dict[str, Any]) -> jax.Array:
    # kernels may be weight-only int8 dicts (ops/quant.py); the native
    # path is byte-for-byte the old L.dense call
    return q_dense(x, p["kernel"], p.get("bias"), dense_fn=L.dense)


def filter_top_p_top_k(logits: jax.Array, top_p, top_k) -> jax.Array:
    """Nucleus (top-p) and top-k logit filtering, vLLM-style (the caller
    applies temperature FIRST, then filters, then samples).

    ``logits`` is ``[..., V]``; ``top_p``/``top_k`` broadcast over the
    leading axes (per-slot arrays in the batchers, scalars in the engine).
    ``top_p >= 1`` and ``top_k <= 0`` are exact no-ops - the returned
    logits are bit-identical to the input, so default-parameter sampling
    reproduces historical streams.
    """
    v = logits.shape[-1]
    batch_shape = logits.shape[:-1]
    top_p = jnp.broadcast_to(jnp.asarray(top_p, logits.dtype), batch_shape)
    top_k = jnp.broadcast_to(jnp.asarray(top_k, jnp.int32), batch_shape)
    sorted_desc = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
    # top-k: keep logits >= the kth largest (ties at the boundary all kept)
    k_idx = jnp.clip(jnp.where(top_k > 0, top_k, v) - 1, 0, v - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[..., None], axis=-1)
    # top-p: smallest prefix of the sorted distribution reaching mass top_p
    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    keep = (cum - probs) < top_p[..., None]   # mass BEFORE token < top_p
    # the best token always survives: top_p <= 0 (OpenAI's greedy extreme)
    # must clamp to top-1, not mask the whole vocabulary to -inf
    first = jax.lax.broadcasted_iota(jnp.int32, keep.shape,
                                     keep.ndim - 1) == 0
    keep = keep | first
    cutoff = jnp.min(jnp.where(keep, sorted_desc, jnp.inf), axis=-1,
                     keepdims=True)
    mask = (logits >= kth) & (logits >= cutoff)
    return jnp.where(mask, logits, -jnp.inf)


def sample_per_slot(logits: jax.Array, seed: jax.Array, gen_step: jax.Array,
                    temp: jax.Array, top_p: jax.Array,
                    top_k: jax.Array, use_filter: bool = True) -> jax.Array:
    """Per-slot next-token sampling shared by the continuous batchers
    (dense and paged): each request's PRNGKey(seed) is folded with the
    request's OWN step index, so a (prompt, seed, temperature) triple
    reproduces the same stream regardless of admission timing and matches
    GemmaDecodeEngine.generate's per-request fold. ``temp <= 0`` rows
    decode greedily."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    keys = jax.vmap(jax.random.fold_in)(
        jax.vmap(jax.random.PRNGKey)(seed), gen_step.astype(jnp.uint32))
    scaled = logits / jnp.maximum(temp, 1e-3)[:, None]
    if use_filter:
        # skippable statically: with every slot at defaults the filter is
        # a bit-exact no-op, but it still costs a full-vocab sort +
        # softmax/cumsum per decode step
        scaled = filter_top_p_top_k(scaled, top_p, top_k)
    sampled = jax.vmap(jax.random.categorical)(keys, scaled).astype(jnp.int32)
    return jnp.where(temp > 0, sampled, greedy)


LOGPROB_K = 5   # top alternatives recorded per decode step (OpenAI cap)


def _step_logprobs(logits: jax.Array, nxt: jax.Array):
    """Per-step logprob record for the batchers' decode scans: the chosen
    token's logprob plus the top-``LOGPROB_K`` alternatives, over the RAW
    (temperature-free, unfiltered) model distribution - what the OpenAI /
    vLLM ``logprobs`` field reports."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    lp = jnp.take_along_axis(logp, nxt[:, None].astype(jnp.int32),
                             axis=-1)[:, 0]
    tlp, tid = jax.lax.top_k(logp, LOGPROB_K)
    return lp, tid.astype(jnp.int32), tlp


def attn_scale(c) -> float:
    """Attention logit scale per architecture: Gemma-3 scales by
    ``query_pre_attn_scalar`` (HF Gemma3Attention.scaling), Gemma-1 by
    head_dim."""
    return float(getattr(c, "query_pre_attn_scalar", None)
                 or c.head_dim) ** -0.5


def layer_stack(p, c: "GemmaTextConfig", x: jax.Array, positions: jax.Array,
                kv_write, attend, interleave=None):
    """The Gemma per-layer decode body (rms -> qkv proj -> rope -> attend ->
    o_proj -> rms -> gated mlp), shared by every decode path so the math
    lives in ONE place (CLAUDE.md: must mirror models/gemma.py exactly).

    Configs with ``is_gemma3`` dispatch to the Gemma-3 body (q/k norm,
    dual rope bases, sandwich norms) - same injection contract, so every
    batcher serves both architectures.

    The two things that differ between the dense-chunk, per-slot and
    paged-pool paths are injected:

    - ``kv_write(i, k, v) -> (kc, vc)``: store this chunk's K/V rows
      (``[B, S, n_kv, head_dim]``) for layer ``i``, return the updated
      cache/pool operands the attention reads from.
    - ``attend(i, q, kc, vc) -> att``: attention for layer ``i``; any
      shape that reshapes to ``[B, S, n_heads*head_dim]``. For Gemma-3
      the caller's ``attend`` must apply the sliding-window mask on
      ``c.layer_types_resolved[i] == "sliding_attention"`` layers.

    x: [B, S, H]; positions: [B, S]. Returns (hidden [B, S, H] after the
    final norm, (k_caches, v_caches) as tuples over layers).
    """
    if getattr(c, "is_gemma3", False):
        assert interleave is None, "interleave hooks are a llama/qwen2 path"
        return _layer_stack_gemma3(p, c, x, positions, kv_write, attend)
    if getattr(c, "is_qwen2", False) or getattr(c, "is_llama", False):
        # Llama rides the Qwen2 body: same plain-multiply RMSNorm / SiLU
        # MLP / GQA layout, its projections simply carry no biases
        # (_lin skips absent biases) and its mrope_section routes every
        # channel to the temporal stream (plain rotary).
        return _layer_stack_qwen2(p, c, x, positions, kv_write, attend,
                                  interleave=interleave)
    assert interleave is None, "interleave hooks are a llama/qwen2 path"
    b, s, _ = x.shape
    new_k, new_v = [], []
    for i in range(c.num_hidden_layers):
        lp = p["language_model"][f"layers_{i}"]
        y = _rms(x, lp["input_layernorm"]["weight"], c.rms_norm_eps)
        q = _lin(y, lp["self_attn"]["q_proj"]).reshape(
            b, s, c.num_attention_heads, c.head_dim)
        k = _lin(y, lp["self_attn"]["k_proj"]).reshape(
            b, s, c.num_key_value_heads, c.head_dim)
        v = _lin(y, lp["self_attn"]["v_proj"]).reshape(
            b, s, c.num_key_value_heads, c.head_dim)
        q = L.rope(q, positions, theta=c.rope_theta)
        k = L.rope(k, positions, theta=c.rope_theta)
        kc, vc = kv_write(i, k, v)
        new_k.append(kc)
        new_v.append(vc)
        att = attend(i, q, kc, vc)
        x = x + _lin(att.reshape(b, s, -1), lp["self_attn"]["o_proj"])
        y = _rms(x, lp["post_attention_layernorm"]["weight"], c.rms_norm_eps)
        gate = _lin(y, lp["mlp"]["gate_proj"])
        up = _lin(y, lp["mlp"]["up_proj"])
        x = x + _lin(jax.nn.gelu(gate, approximate=True) * up,
                     lp["mlp"]["down_proj"])
    x = _rms(x, p["language_model"]["norm"]["weight"], c.rms_norm_eps)
    return x, (tuple(new_k), tuple(new_v))


def _layer_stack_gemma3(p, c, x: jax.Array, positions: jax.Array,
                        kv_write, attend):
    """Gemma-3 per-layer body (HF ``Gemma3DecoderLayer.forward``): q/k
    RMSNorm before rope, per-layer rope base (sliding layers
    ``rope_local_base_freq`` unscaled; global layers ``rope_theta`` with
    linear position scaling), and sandwich norms (post-attention and
    pre/post-feedforward) around both residual branches. Same injection
    contract as ``layer_stack``; sliding-window masking is the caller's
    ``attend``'s job (it owns the masks)."""
    b, s, _ = x.shape
    types = c.layer_types_resolved
    new_k, new_v = [], []
    for i in range(c.num_hidden_layers):
        lp = p["language_model"][f"layers_{i}"]
        sliding = types[i] == "sliding_attention"
        theta = c.rope_local_base_freq if sliding else c.rope_theta
        pos = (positions if sliding
               else positions / jnp.float32(c.rope_scaling_factor))
        y = _rms(x, lp["input_layernorm"]["weight"], c.rms_norm_eps)
        q = _lin(y, lp["self_attn"]["q_proj"]).reshape(
            b, s, c.num_attention_heads, c.head_dim)
        k = _lin(y, lp["self_attn"]["k_proj"]).reshape(
            b, s, c.num_key_value_heads, c.head_dim)
        v = _lin(y, lp["self_attn"]["v_proj"]).reshape(
            b, s, c.num_key_value_heads, c.head_dim)
        q = _rms(q, lp["self_attn"]["q_norm"]["weight"], c.rms_norm_eps)
        k = _rms(k, lp["self_attn"]["k_norm"]["weight"], c.rms_norm_eps)
        q = L.rope(q, pos, theta=theta)
        k = L.rope(k, pos, theta=theta)
        kc, vc = kv_write(i, k, v)
        new_k.append(kc)
        new_v.append(vc)
        att = attend(i, q, kc, vc)
        att_out = _lin(att.reshape(b, s, -1), lp["self_attn"]["o_proj"])
        x = x + _rms(att_out, lp["post_attention_layernorm"]["weight"],
                     c.rms_norm_eps)
        y = _rms(x, lp["pre_feedforward_layernorm"]["weight"],
                 c.rms_norm_eps)
        gate = _lin(y, lp["mlp"]["gate_proj"])
        up = _lin(y, lp["mlp"]["up_proj"])
        ff = _lin(jax.nn.gelu(gate, approximate=True) * up,
                  lp["mlp"]["down_proj"])
        x = x + _rms(ff, lp["post_feedforward_layernorm"]["weight"],
                     c.rms_norm_eps)
    x = _rms(x, p["language_model"]["norm"]["weight"], c.rms_norm_eps)
    return x, (tuple(new_k), tuple(new_v))


def _rms_plain(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """Qwen2 RMSNorm convention: y = x/rms(x) * w (no +1, unlike Gemma)."""
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)


def _layer_stack_qwen2(p, c, x: jax.Array, positions, kv_write, attend,
                       interleave=None):
    """Qwen2(-VL) per-layer body (HF ``Qwen2VLDecoderLayer``, mirrored from
    models/qwen2vl.Qwen2DecoderLayer which is torch-parity-tested):
    plain-multiply RMSNorm, BIASED q/k/v projections, multimodal 3D rope
    (``positions`` may be [B, S] - text rows, all three mrope streams
    equal, exactly HF's text-only degenerate case - or [3, B, S] for an
    image prefill's temporal/h/w streams), SiLU-gated MLP, no sandwich
    norms. Same injection contract as ``layer_stack``.

    ``interleave`` maps a self-attention layer index to a hook
    ``fn(x) -> x`` applied BEFORE that layer (index ``num_hidden_layers``
    = after the last layer, before the final norm). Mllama's
    cross-attention decoder layers ride this seam: its text stack is a
    plain Llama self-attention stack with gated cross-attention blocks
    interspersed (HF ``MllamaTextModel``, layers at
    ``config.cross_attention_layers``), so the self-attention math stays
    in this one body for every serving tier.

    This is the text stack of the reference's old-model class
    AdaptLLM/biomed-Qwen2-VL-2B-Instruct (00_run_docker_old_models.sh:24-38),
    served first-party instead of through the vLLM container."""
    from multimodal_colpali_tpu.models.qwen2vl import mrope_cos_sin

    b, s, _ = x.shape
    pos3 = (jnp.broadcast_to(positions[None], (3,) + positions.shape)
            if positions.ndim == 2 else positions)
    cos, sin = mrope_cos_sin(c, pos3)              # [B, S, head_dim]
    cosb = cos[:, :, None, :].astype(jnp.float32)
    sinb = sin[:, :, None, :].astype(jnp.float32)

    def rot(t):
        tf = t.astype(jnp.float32)
        half = tf.shape[-1] // 2
        rh = jnp.concatenate([-tf[..., half:], tf[..., :half]], axis=-1)
        return ((tf * cosb) + (rh * sinb)).astype(t.dtype)

    new_k, new_v = [], []
    for i in range(c.num_hidden_layers):
        if interleave is not None and i in interleave:
            x = interleave[i](x)
        lp = p["language_model"][f"layers_{i}"]
        y = _rms_plain(x, lp["input_layernorm"]["weight"], c.rms_norm_eps)
        q = _lin(y, lp["self_attn"]["q_proj"]).reshape(
            b, s, c.num_attention_heads, c.head_dim)
        k = _lin(y, lp["self_attn"]["k_proj"]).reshape(
            b, s, c.num_key_value_heads, c.head_dim)
        v = _lin(y, lp["self_attn"]["v_proj"]).reshape(
            b, s, c.num_key_value_heads, c.head_dim)
        q, k = rot(q), rot(k)
        kc, vc = kv_write(i, k, v)
        new_k.append(kc)
        new_v.append(vc)
        att = attend(i, q, kc, vc)
        x = x + _lin(att.reshape(b, s, -1), lp["self_attn"]["o_proj"])
        y = _rms_plain(x, lp["post_attention_layernorm"]["weight"],
                       c.rms_norm_eps)
        gate = _lin(y, lp["mlp"]["gate_proj"])
        up = _lin(y, lp["mlp"]["up_proj"])
        x = x + _lin(jax.nn.silu(gate) * up, lp["mlp"]["down_proj"])
    if interleave is not None and c.num_hidden_layers in interleave:
        x = interleave[c.num_hidden_layers](x)
    x = _rms_plain(x, p["language_model"]["norm"]["weight"], c.rms_norm_eps)
    return x, (tuple(new_k), tuple(new_v))


@dataclasses.dataclass
class GemmaDecodeEngine:
    """Causal Gemma LM over a ColPali-style param tree (embed +
    language_model subtrees; the vision tower is ignored).

    With ``mesh`` (axes "data", "model") the engine runs sharded: params are
    placed column/row-parallel over "model" (the TP plan the 27B-class
    generators need - SURVEY §2.3), the batch and KV caches shard over
    "data", and XLA inserts the all-reduces. Tokens are bit-controlled by
    the same math, so sharded and single-device generations agree."""

    cfg: GemmaTextConfig
    params: Any                      # {"embed": {...}, "language_model": {...}}
    dtype: Any = jnp.float32
    mesh: Any = None                 # Optional[jax.sharding.Mesh]
    weight_dtype: str = "native"     # "native" | "int8" | "int4" (weight-only)

    def __post_init__(self):
        if self.weight_dtype not in ("native", "int8", "int4"):
            raise ValueError(
                f"weight_dtype must be 'native', 'int8' or 'int4', "
                f"got {self.weight_dtype!r}")
        keep = {"embed": self.params["embed"],
                "language_model": self.params["language_model"]}
        from multimodal_colpali_tpu.ops.quant import is_quantized
        if is_quantized(keep["embed"].get("embed_tokens")):
            # already cast + quantized by a sibling engine (07_serve
            # shares one quantized tree between the text and mm engines) -
            # must NOT re-cast: the f32 scales would degrade to bf16.
            # The kernel format (int8 vs int4) lives in the leaves.
            self.weight_dtype = _detect_quantized_dtype(
                keep["language_model"])
            params = keep
        else:
            params = jax.tree.map(
                lambda p: jnp.asarray(p, self.dtype)
                if jnp.asarray(p).dtype == jnp.float32
                else jnp.asarray(p), keep)
            if self.weight_dtype == "int8":
                # one jitted pass: device-resident trees quantize
                # on-device (12B/27B must never bounce through the
                # single host core)
                params = jax.jit(quantize_lm_params)(params)
            elif self.weight_dtype == "int4":
                params = jax.jit(quantize_lm_params_int4)(params)
        if self.mesh is not None:
            if self.weight_dtype == "int4":
                # group packing does not split on arbitrary K boundaries;
                # int4 exists to make ONE chip enough (quant.py docstring)
                raise ValueError(
                    "weight_dtype='int4' does not support TP meshes; "
                    "use 'int8' or 'native' when sharding")
            from multimodal_colpali_tpu.parallel.mesh import shard_params_for_tp

            params = shard_params_for_tp(params, self.mesh, axis="model")
        self.params = params
        self._jit_cache: Dict[Tuple, Any] = {}

    # -- layer math (mirrors models/gemma.py bit for bit) -------------------

    def _embed(self, p, ids: jax.Array) -> jax.Array:
        x = q_take(p["embed"]["embed_tokens"], ids, jnp.float32)
        scale = jnp.asarray(self.cfg.hidden_size ** 0.5, jnp.float32)
        return (x * scale).astype(self.dtype)

    def _chunk(self, p, x, positions, kcaches, vcaches, write_idx, kv_valid,
               causal: bool = True, interleave=None):
        """Run a chunk of tokens through all layers, writing K/V into the
        caches at ``write_idx`` and attending under ``kv_valid`` [B, T]
        (True = attendable) plus, when ``causal``, global causality
        (``causal=False`` is PaliGemma's bidirectional prefix prefill).
        ``interleave`` forwards to ``layer_stack`` (Mllama's gated
        cross-attention blocks between self-attention layers).

        x: [B, S, H]; positions: [B, S]; returns (hidden [B, S, H], caches).
        """
        c = self.cfg
        b, s, _ = x.shape
        t = kcaches[0].shape[1]
        mask = kv_valid[:, None, None, :]
        gq = write_idx + jnp.arange(s)                          # [S]
        if causal:
            # chunk token i sits at global slot write_idx+i
            mask = mask & (jnp.arange(t)[None, :] <= gq[:, None])[None, None]
        mask = jnp.broadcast_to(mask, (b, 1, s, t)).astype(bool)
        types = (c.layer_types_resolved
                 if getattr(c, "is_gemma3", False) else None)
        if types is not None:
            # sliding layers attend only the last sliding_window slots;
            # left-padding is safe - pads sit before the real tokens and
            # are already masked by kv_valid, and slot distance equals
            # token distance within a contiguous request
            sl_mask = mask & (jnp.arange(t)[None, :]
                              > (gq - c.sliding_window)[:, None])[None, None]
            sl_mask = jnp.broadcast_to(sl_mask, (b, 1, s, t)).astype(bool)
        sc = attn_scale(c)

        def kv_write(i, k, v):
            kc = jax.lax.dynamic_update_slice(kcaches[i], k, (0, write_idx, 0, 0))
            vc = jax.lax.dynamic_update_slice(vcaches[i], v, (0, write_idx, 0, 0))
            return kc, vc

        def attend(i, q, kc, vc):
            m = mask
            if types is not None and types[i] == "sliding_attention":
                m = sl_mask
            return L.attention(q, kc, vc, mask=m, scale=sc)

        return layer_stack(p, c, x, positions, kv_write, attend,
                           interleave=interleave)

    def _logits(self, p, hidden: jax.Array) -> jax.Array:
        # tied LM head: logits = hidden @ embed_table.T, fp32 (quantized
        # tables may carry pad rows; slice back to the true vocab)
        return q_logits(hidden.astype(jnp.float32),
                        p["embed"]["embed_tokens"],
                        out_dim=self.cfg.vocab_size)

    # -- generation ----------------------------------------------------------

    def _build(self, s: int, max_new: int, temperature: float,
               eos_id: int, pad_id: int, top_p: float = 1.0, top_k: int = 0):
        """Jitted whole-generation function for a (prompt_len, max_new)
        bucket."""
        c = self.cfg
        t = s + max_new

        def sample(logits, rng, step):
            if temperature <= 0.0:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            key = jax.random.fold_in(rng, step)
            scaled = logits / temperature
            if top_p < 1.0 or top_k > 0:
                scaled = filter_top_p_top_k(scaled, top_p, top_k)
            return jax.random.categorical(
                key, scaled, axis=-1).astype(jnp.int32)

        def run(p, ids, mask, rng):
            b = ids.shape[0]
            kcaches = tuple(
                jnp.zeros((b, t, c.num_key_value_heads, c.head_dim), self.dtype)
                for _ in range(c.num_hidden_layers))
            vcaches = kcaches

            # positions: 0-indexed over valid tokens (left padding -> pads
            # clamp to 0 and are masked out of attention anyway)
            positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
            kv_valid = jnp.concatenate(
                [mask.astype(bool), jnp.ones((b, max_new), bool)], axis=1)

            x = self._embed(p, ids)
            hidden, (kcaches, vcaches) = self._chunk(
                p, x, positions, kcaches, vcaches, 0, kv_valid)
            logits = self._logits(p, hidden[:, -1])
            tok = sample(logits, rng, 0)
            last_pos = positions[:, -1]
            done = tok == eos_id

            def body(carry, step):
                kc, vc, tok, done = carry
                x = self._embed(p, tok[:, None])
                pos = (last_pos + step)[:, None]
                hidden, (kc, vc) = self._chunk(
                    p, x, pos, kc, vc, s + step - 1, kv_valid)
                nxt = sample(self._logits(p, hidden[:, -1]), rng, step)
                nxt = jnp.where(done, jnp.int32(pad_id), nxt)
                done = done | (nxt == eos_id)
                return (kc, vc, nxt, done), nxt

            (_, _, _, done), rest = jax.lax.scan(
                body, (kcaches, vcaches, tok, done),
                jnp.arange(1, max_new), length=max_new - 1)
            out = jnp.concatenate([tok[:, None], rest.T], axis=1)  # [B, N]
            return out

        return jax.jit(run)

    def next_token_logits(self, prompts: Sequence[Sequence[int]],
                          pad_id: int = 0, bucket: int = 16) -> np.ndarray:
        """Prefill-only: fp32 logits of the next token per prompt [B, V]
        (the parity surface pinned against torch GemmaForCausalLM)."""
        s = max(max(len(pr) for pr in prompts), 1)
        s = ((s + bucket - 1) // bucket) * bucket
        b = len(prompts)
        ids = np.full((b, s), pad_id, np.int32)
        mask = np.zeros((b, s), np.int32)
        for n, pr in enumerate(prompts):
            if len(pr):
                ids[n, -len(pr):] = pr
                mask[n, -len(pr):] = 1

        key = ("prefill", s)
        if key not in self._jit_cache:
            c = self.cfg

            def run(p, ids, mask):
                bb = ids.shape[0]
                kcaches = tuple(
                    jnp.zeros((bb, s, c.num_key_value_heads, c.head_dim),
                              self.dtype)
                    for _ in range(c.num_hidden_layers))
                positions = jnp.maximum(jnp.cumsum(mask, axis=1) - 1, 0)
                x = self._embed(p, ids)
                hidden, _ = self._chunk(p, x, positions, kcaches, kcaches,
                                        0, mask.astype(bool))
                return self._logits(p, hidden[:, -1])

            self._jit_cache[key] = jax.jit(run)
        return np.asarray(self._jit_cache[key](
            self.params, jnp.asarray(ids), jnp.asarray(mask)))

    def generate(
        self,
        prompts: Sequence[Sequence[int]],
        max_new_tokens: int = 64,
        temperature: float = 0.0,
        eos_id: int = -1,
        pad_id: int = 0,
        seed: int = 0,
        bucket: int = 16,
        top_p: float = 1.0,
        top_k: int = 0,
    ) -> List[List[int]]:
        """Generate continuations for token-id prompts.

        Prompts are LEFT-padded to a shared length bucket (static jit
        shapes); output token lists are truncated at ``eos_id``.
        ``top_p``/``top_k`` filter the sampled distribution (vLLM
        semantics; no effect when temperature is 0).
        """
        if not prompts:
            return []
        s = max(max(len(pr) for pr in prompts), 1)
        s = ((s + bucket - 1) // bucket) * bucket
        b = len(prompts)
        if self.mesh is not None:  # even DP shards over the batch axis
            dp = self.mesh.shape.get("data", 1)
            b = ((b + dp - 1) // dp) * dp
        ids = np.full((b, s), pad_id, np.int32)
        mask = np.zeros((b, s), np.int32)
        for n, pr in enumerate(prompts):
            if len(pr):
                ids[n, -len(pr):] = pr
                mask[n, -len(pr):] = 1
        mask[len(prompts):, -1] = 1  # padding rows: one dummy valid token

        key = (s, max_new_tokens, float(temperature), eos_id, pad_id,
               float(top_p), int(top_k))
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build(
                s, max_new_tokens, float(temperature), eos_id, pad_id,
                top_p=float(top_p), top_k=int(top_k))
        jids, jmask = jnp.asarray(ids), jnp.asarray(mask)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ds = NamedSharding(self.mesh, P("data"))
            jids = jax.device_put(jids, ds)
            jmask = jax.device_put(jmask, ds)
        out = np.asarray(self._jit_cache[key](
            self.params, jids, jmask, jax.random.PRNGKey(seed)))
        results: List[List[int]] = []
        for row in out[: len(prompts)]:
            toks = row.tolist()
            if eos_id in toks:
                toks = toks[: toks.index(eos_id)]
            results.append(toks)
        return results


@dataclasses.dataclass
class Qwen2DecodeEngine(GemmaDecodeEngine):
    """Causal Qwen2(-VL text stack) LM over an engine param tree. The
    per-layer math is ``_layer_stack_qwen2`` (dispatched by the config's
    ``is_qwen2`` marker), so every decode path - dense/paged batchers,
    speculative verify, dp x tp sharding - serves Qwen2 alongside the
    Gemma family. Covers the LM of the reference's old-model class
    AdaptLLM/biomed-Qwen2-VL-2B-Instruct (00_run_docker_old_models.sh)."""

    def _embed(self, p, ids: jax.Array) -> jax.Array:
        # Qwen2 does NOT scale embeddings by sqrt(hidden) (unlike Gemma)
        return q_take(p["embed"]["embed_tokens"], ids,
                      jnp.float32).astype(self.dtype)

    def _logits(self, p, hidden: jax.Array) -> jax.Array:
        lm = p["language_model"]
        if "lm_head" in lm:   # untied head (Qwen2-VL-7B class)
            return q_dense(hidden.astype(jnp.float32),
                           lm["lm_head"]["kernel"], None, dense_fn=L.dense
                           )[..., : self.cfg.vocab_size]
        return q_logits(hidden.astype(jnp.float32),
                        p["embed"]["embed_tokens"],
                        out_dim=self.cfg.vocab_size)


@dataclasses.dataclass
class LlamaDecodeEngine(Qwen2DecodeEngine):
    """Causal Llama LM over an engine param tree. Identical engine math
    to Qwen2 (unscaled embeddings, tied/untied head, plain RMSNorm);
    the layer body dispatches on the config's ``is_llama`` marker to the
    shared Qwen2/Llama branch (bias-free projections, all-temporal
    mrope == standard rotary). Covers the LM of the reference's
    old-model AdaptLLM/biomed-LLaVA-NeXT-Llama3-8B
    (00_run_docker_old_models.sh:41-52) and the SmolLM2 stacks the
    ColIdefics3 retrievers carry."""


class PaliGemmaEngine:
    """Multimodal generation on the ColPali/PaliGemma weights.

    The retrieval models already carry the full PaliGemma stack (SigLIP
    tower + projector + Gemma LM); this engine turns it into an
    image-conditioned generator: page images become the prompt prefix
    (PaliGemma semantics - the prefix attends bidirectionally, generated
    tokens causally; positions are 1-indexed per HF PaliGemma), so the
    answer-generation role the reference delegates to remote VLMs
    (functions.py:1036-1064) can also run on-TPU over retrieved pages.
    """

    def __init__(self, cfg, params, dtype: Any = jnp.float32,
                 weight_dtype: str = "native"):
        # cfg: ColPaliModelConfig (vision + text + image_token_id)
        self.cfg = cfg
        self.lm = GemmaDecodeEngine(cfg.text, params, dtype=dtype,
                                    weight_dtype=weight_dtype)
        cast = lambda t: jax.tree.map(
            lambda p: jnp.asarray(p, dtype)
            if jnp.asarray(p).dtype == jnp.float32 else jnp.asarray(p), t)
        self.vision_params = cast(params["vision_tower"])
        self.projector_params = cast(params["multi_modal_projector"])
        self._jit_cache: Dict[Tuple, Any] = {}

    def _merged_embeds(self, ids: jax.Array, pix: jax.Array) -> jax.Array:
        """Token embeds with projected image features scattered into the
        <image> slots (mirrors ColPaliModel, models/colpali.py).

        ``pix`` is ``[B, H, W, 3]`` (one image per row) or
        ``[B, N, H, W, 3]`` (N images per row - the reference's serving
        config allows 10 images per prompt, 00_run_docker_containers.sh:37-38,
        and exp-02 builds multi-image context prompts,
        05_experiment02.py:155-166). With N images the prompt carries
        ``N * num_patches`` image tokens; patches are consumed in image
        order, exactly like HF's masked-scatter merge."""
        from multimodal_colpali_tpu.models.siglip import SiglipVisionTower

        c = self.cfg
        p = self.lm.params
        embeds = q_take(p["embed"]["embed_tokens"],
                        jnp.where(ids == c.image_token_id, 0, ids),
                        self.lm.dtype)
        if pix.ndim == 4:
            pix = pix[:, None]                       # [B, 1, H, W, 3]
        b, n_img = pix.shape[:2]
        vis = SiglipVisionTower(c.vision).apply(
            {"params": self.vision_params},
            pix.reshape((b * n_img,) + pix.shape[2:]).astype(self.lm.dtype))
        vis = vis.reshape(b, n_img * vis.shape[1], vis.shape[-1])
        img = L.dense(vis, self.projector_params["kernel"],
                      self.projector_params.get("bias"))
        img = img / jnp.asarray(c.text.hidden_size ** 0.5, img.dtype)
        is_img = ids == c.image_token_id
        img_pos = jnp.clip(jnp.cumsum(is_img, axis=1) - 1, 0, img.shape[1] - 1)
        gathered = jnp.take_along_axis(img, img_pos[..., None], axis=1)
        embeds = jnp.where(is_img[..., None], gathered, embeds)
        scale = jnp.asarray(c.text.hidden_size ** 0.5, jnp.float32)
        return (embeds.astype(jnp.float32) * scale).astype(self.lm.dtype)

    def _build(self, s: int, max_new: int, temperature: float,
               eos_id: int, pad_id: int, top_p: float = 1.0, top_k: int = 0):
        c = self.cfg.text
        eng = self.lm
        t = s + max_new

        def sample(logits, rng, step):
            if temperature <= 0.0:
                return jnp.argmax(logits, axis=-1).astype(jnp.int32)
            key = jax.random.fold_in(rng, step)
            scaled = logits / temperature
            if top_p < 1.0 or top_k > 0:
                scaled = filter_top_p_top_k(scaled, top_p, top_k)
            return jax.random.categorical(
                key, scaled, axis=-1).astype(jnp.int32)

        def run(p, ids, mask, pix, rng):
            b = ids.shape[0]
            kcaches = tuple(
                jnp.zeros((b, t, c.num_key_value_heads, c.head_dim), eng.dtype)
                for _ in range(c.num_hidden_layers))
            # PaliGemma positions are 1-indexed (HF cumsum convention).
            positions = jnp.cumsum(mask, axis=1)
            kv_valid = jnp.concatenate(
                [mask.astype(bool), jnp.ones((b, max_new), bool)], axis=1)

            x = self._merged_embeds(ids, pix)
            # PaliGemma prefix attention is bidirectional over the prompt
            # span (causal=False); validity restricted to written slots.
            prefill_valid = jnp.concatenate(
                [mask.astype(bool), jnp.zeros((b, max_new), bool)], axis=1)
            hidden, (kcaches, vcaches) = eng._chunk(
                p, x, positions, kcaches, kcaches, 0,
                prefill_valid, causal=False)
            logits = eng._logits(p, hidden[:, -1])
            tok = sample(logits, rng, 0)
            last_pos = positions[:, -1]
            done = tok == eos_id

            def body(carry, step):
                kc, vc, tok, done = carry
                xx = q_take(p["embed"]["embed_tokens"], tok[:, None],
                            jnp.float32)
                scale = jnp.asarray(c.hidden_size ** 0.5, jnp.float32)
                xx = (xx * scale).astype(eng.dtype)
                pos = (last_pos + step)[:, None]
                hidden, (kc, vc) = eng._chunk(
                    p, xx, pos, kc, vc, s + step - 1, kv_valid)
                nxt = sample(eng._logits(p, hidden[:, -1]), rng, step)
                nxt = jnp.where(done, jnp.int32(pad_id), nxt)
                done = done | (nxt == eos_id)
                return (kc, vc, nxt, done), nxt

            (_, _, _, _), rest = jax.lax.scan(
                body, (kcaches, vcaches, tok, done),
                jnp.arange(1, max_new), length=max_new - 1)
            return jnp.concatenate([tok[:, None], rest.T], axis=1)

        return jax.jit(run)

    def generate(self, prompts: Sequence[Sequence[int]], pixel_values,
                 max_new_tokens: int = 32, temperature: float = 0.0,
                 eos_id: int = -1, pad_id: int = 0, seed: int = 0,
                 bucket: int = 16, top_p: float = 1.0,
                 top_k: int = 0) -> List[List[int]]:
        """Image-conditioned continuations. ``prompts`` are token ids
        already containing the image-token prefix (use ``build_mm_prompt``);
        ``pixel_values`` is [B, H, W, 3] normalized."""
        s = max(max(len(pr) for pr in prompts), 1)
        s = ((s + bucket - 1) // bucket) * bucket
        b = len(prompts)
        ids = np.full((b, s), pad_id, np.int32)
        mask = np.zeros((b, s), np.int32)
        for n, pr in enumerate(prompts):
            ids[n, -len(pr):] = pr
            mask[n, -len(pr):] = 1
        key = (s, max_new_tokens, float(temperature), eos_id, pad_id,
               float(top_p), int(top_k))
        if key not in self._jit_cache:
            self._jit_cache[key] = self._build(
                s, max_new_tokens, float(temperature), eos_id, pad_id,
                top_p=float(top_p), top_k=int(top_k))
        out = np.asarray(self._jit_cache[key](
            self.lm.params, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(pixel_values), jax.random.PRNGKey(seed)))
        results = []
        for row in out:
            toks = row.tolist()
            if eos_id in toks:
                toks = toks[: toks.index(eos_id)]
            results.append(toks)
        return results

    def next_token_logits(self, prompts: Sequence[Sequence[int]],
                          pixel_values, pad_id: int = 0,
                          bucket: int = 16) -> np.ndarray:
        """Image-conditioned prefill-only logits [B, V] (bidirectional
        prefix) - the multimodal constrained-decoding surface."""
        s = max(max(len(pr) for pr in prompts), 1)
        s = ((s + bucket - 1) // bucket) * bucket
        b = len(prompts)
        ids = np.full((b, s), pad_id, np.int32)
        mask = np.zeros((b, s), np.int32)
        for n, pr in enumerate(prompts):
            ids[n, -len(pr):] = pr
            mask[n, -len(pr):] = 1

        key = ("prefill", s)
        if key not in self._jit_cache:
            c = self.cfg.text
            eng = self.lm

            def run(p, ids, mask, pix):
                bb = ids.shape[0]
                kc = tuple(
                    jnp.zeros((bb, s, c.num_key_value_heads, c.head_dim),
                              eng.dtype)
                    for _ in range(c.num_hidden_layers))
                positions = jnp.cumsum(mask, axis=1)
                x = self._merged_embeds(ids, pix)
                hidden, _ = eng._chunk(p, x, positions, kc, kc, 0,
                                       mask.astype(bool), causal=False)
                return eng._logits(p, hidden[:, -1])

            self._jit_cache[key] = jax.jit(run)
        return np.asarray(self._jit_cache[key](
            self.lm.params, jnp.asarray(ids), jnp.asarray(mask),
            jnp.asarray(pixel_values)))

    def build_mm_prompt(self, text_ids: Sequence[int], bos_id: int = 2,
                        newline_ids: Sequence[int] = (),
                        n_images: int = 1) -> List[int]:
        """PaliGemma prompt layout: [image]*n_patches*n_images + bos + text
        (+ the prefix/suffix separator). PaliGemma was trained with a
        trailing "\\n" closing the prefix - pass its token ids as
        ``newline_ids`` (tokenizer-dependent) or include it in ``text_ids``;
        omitting it conditions generation on a malformed prefix.
        ``n_images > 1`` interleaves nothing: all images' patch tokens lead
        the prompt in order, matching ``_merged_embeds``'s consumption."""
        c = self.cfg
        return ([c.image_token_id] * (c.vision.num_patches * max(1, n_images))
                + [bos_id] + list(text_ids) + list(newline_ids))


class ByteTokenizer:
    """Reversible UTF-8 byte tokenizer (ids 0..255, then pad/bos/eos).

    The engine's test/demo tokenizer: any text round-trips exactly, so the
    OpenAI-compatible server works end to end without external vocab files.
    """

    def __init__(self):
        self.pad_id = 256
        self.bos_id = 257
        self.eos_id = 258
        self.vocab_size = 259

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        ids = list(text.encode("utf-8"))
        return ([self.bos_id] + ids) if add_special_tokens else ids

    def decode(self, ids: Sequence[int]) -> str:
        data = bytes(i for i in ids if 0 <= i < 256)
        return data.decode("utf-8", "replace")


class ModuloTokenizer:
    """Byte tokenizer folded into a small model vocab (random-weight
    serving/tests): ids land in [2, vocab-6), distinct single-char texts get
    distinct first tokens when the vocab allows, decode is a readable (but
    non-reversible) id listing.

    The top ids are deliberately left unused: tiny configs place
    image/vision-marker token ids at the top of the vocab, and a text byte
    folding onto image_token_id would silently turn prose into image slots
    in the multimodal paths."""

    def __init__(self, vocab_size: int):
        self.pad_id = 0
        self.bos_id = 1
        self.eos_id = -1  # random LMs have no meaningful eos
        self.vocab_size = vocab_size
        self._span = max(vocab_size - 8, 1)

    def encode(self, text: str, add_special_tokens: bool = False) -> List[int]:
        ids = [2 + (b % self._span) for b in text.encode("utf-8")]
        return ([self.bos_id] + ids) if add_special_tokens else ids

    def decode(self, ids: Sequence[int]) -> str:
        return " ".join(str(i) for i in ids)
