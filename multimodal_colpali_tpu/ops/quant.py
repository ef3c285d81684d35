"""Weight-only int8 quantization for the serving engine.

vLLM exposes ``--quantization`` so a generator can be served on fewer /
smaller GPUs (the reference's serving container is plain bf16,
/root/reference/00_run_docker_containers.sh:26-39, but the knob is part of
the server surface this framework replaces). TPU decode at serving batch
sizes is bound by the HBM weight stream, not the MXU, so weight-only int8
(a) roughly halves decode latency and (b) fits gemma-3-12b (~11.8 GB) on
one 16 GB v5e chip that bf16 (~23.5 GB) cannot.

Representation: each 2-D kernel ``[in, out]`` becomes
``{"q8": int8 codes (same shape), "scale": f32 [out]}`` - symmetric
per-output-channel absmax scaling. The embedding table ``[V, H]``
quantizes per ROW (per vocab entry, ``scale: [V]``) so both the embed
gather and the tied-logits matmul consume the same codes.

TPU-first compute order: the matmul runs on the CODES
(``x @ q8.astype(bf16)``, int8 read from HBM, exact upcast) and the f32
scale multiplies the PRODUCT - a cheap per-column epilogue XLA fuses.
This is numerically equivalent to dequantize-then-matmul up to one
floating-point rounding per output element (post- vs pre-scaling). With
power-of-two scales even that rounding vanishes (exponent shifts commute
with float rounding); the tests exploit this for an end-to-end pin with
zero quantization error - residual differences are only XLA's
contraction order between the two compiled programs (~1 ulp).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp


def quantize_int8(w: jax.Array, axis: int = 0) -> dict:
    """Symmetric absmax int8 quantization of ``w`` along ``axis`` (the
    reduction axis of the matmul it will feed): each slice orthogonal to
    ``axis`` gets one f32 scale. Returns ``{"q8", "scale"}``; ``scale``
    has ``axis`` removed."""
    wf = jnp.asarray(w, jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis)
    scale = jnp.where(amax > 0, amax, 1.0) / 127.0
    codes = jnp.round(wf / jnp.expand_dims(scale, axis))
    return {"q8": jnp.clip(codes, -127, 127).astype(jnp.int8),
            "scale": scale.astype(jnp.float32)}


def is_quantized(p: Any) -> bool:
    return isinstance(p, dict) and "q8" in p


def dequantize(qw: dict, axis: int = 0, dtype: Any = jnp.float32) -> jax.Array:
    """Materialize the bf16/f32 weight (tests / export; the compute paths
    below never call this - they keep the HBM stream int8). ``axis`` is
    the reduction axis passed to ``quantize_int8`` (0 for kernels, 1 for
    the embed table)."""
    s = jnp.expand_dims(qw["scale"], axis)
    return (qw["q8"].astype(jnp.float32) * s).astype(dtype)


def q_dense(x: jax.Array, kernel: Any, bias: Optional[jax.Array] = None,
            dense_fn=None) -> jax.Array:
    """``x @ kernel (+ bias)`` where ``kernel`` is a plain array or a
    ``quantize_int8`` dict (codes ``[in, out]``, scale ``[out]``). The
    quantized path matmuls the codes and applies the scale to the
    product (see module docstring); on TPU it dispatches to the Pallas
    kernel (ops/int8_matmul.py) so the codes stream from HBM as int8
    with no materialized upcast."""
    if is_quantized_int4(kernel):
        from multimodal_colpali_tpu.ops.int4_matmul import (
            int4_matmul_enabled, int4_matmul_kn, int4_matmul_xla)

        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        if int4_matmul_enabled():
            y = int4_matmul_kn(x2, kernel["q4"], kernel["scale"])
        else:
            y = int4_matmul_xla(x2, kernel["q4"], kernel["scale"])
        y = y.reshape(*lead, y.shape[-1])
        return y if bias is None else y + bias
    if not is_quantized(kernel):
        if dense_fn is not None:
            return dense_fn(x, kernel, bias)
        y = x @ kernel
        return y if bias is None else y + bias
    from multimodal_colpali_tpu.ops.int8_matmul import (int8_matmul_enabled,
                                                        int8_matmul_kn)
    if int8_matmul_enabled():
        lead = x.shape[:-1]
        y = int8_matmul_kn(x.reshape(-1, x.shape[-1]), kernel["q8"],
                           kernel["scale"])
        y = y.reshape(*lead, y.shape[-1])
    else:
        y = x @ kernel["q8"].astype(x.dtype)
        y = y * kernel["scale"].astype(x.dtype)
    return y if bias is None else y + bias


def q_take(table: Any, ids: jax.Array, dtype: Any = jnp.float32) -> jax.Array:
    """Embedding-row gather: ``table`` is ``[V, H]`` or a per-row
    quantized dict (``scale: [V]``). Returns rows in ``dtype``, scales
    applied (gathering codes + one f32 multiply keeps the HBM table
    int8)."""
    if not is_quantized(table):
        return jnp.take(table, ids, axis=0).astype(dtype)
    rows = jnp.take(table["q8"], ids, axis=0).astype(jnp.float32)
    s = jnp.take(table["scale"], ids, axis=0)
    return (rows * s[..., None]).astype(dtype)


def q_logits(hidden_f32: jax.Array, table: Any,
             out_dim: Optional[int] = None) -> jax.Array:
    """Tied LM head ``hidden @ table.T`` in f32; per-row scales multiply
    the logit columns. ``hidden_f32``: [B, H]; returns [B, V].

    Quantized tables may carry zero-code pad rows (so the Pallas kernel's
    tiling divides the vocab, see ``quantize_lm_params``); pass
    ``out_dim`` to slice back to the true vocab. On TPU the Pallas path
    computes with bf16 hidden (f32 accumulation) - HF's own bf16
    inference precision; the XLA path keeps f32 products."""
    if not is_quantized(table):
        if table.dtype == jnp.bfloat16:
            # bf16 table: dot in bf16 with f32 accumulation instead of
            # casting the whole table to f32 (a [V, H] materialization
            # EVERY decode step - ~2.7 GB for gemma-3-4b). The hidden
            # state came out of the bf16 layer stack, so the bf16
            # round-trip is exact and every product matches the f32
            # einsum bit for bit; only the sum order may differ (~1 ulp).
            return jax.lax.dot_general(
                hidden_f32.astype(jnp.bfloat16), table,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return jnp.einsum("bh,vh->bv", hidden_f32,
                          table.astype(jnp.float32))
    from multimodal_colpali_tpu.ops.int8_matmul import (int8_matmul_enabled,
                                                        int8_matmul_nk)
    if int8_matmul_enabled():
        logits = int8_matmul_nk(hidden_f32.astype(jnp.bfloat16),
                                table["q8"], table["scale"],
                                out_dtype=jnp.float32)
    else:
        logits = jnp.einsum("bh,vh->bv", hidden_f32,
                            table["q8"].astype(jnp.float32))
        logits = logits * table["scale"][None, :]
    if out_dim is not None and logits.shape[-1] != out_dim:
        logits = logits[:, :out_dim]
    return logits


# -- int4 weight-only (group-wise): the 27B-on-one-chip path -----------------
#
# Weight-only int8 fits gemma-3-12b on a 16 GB v5e; the reference's ACTUAL
# generator is gemma-3-27b (/root/reference/00_run_docker_containers.sh:28),
# whose int8 codes (~25.6 GB) still do not fit. Group-wise int4 (the
# AWQ/GPTQ storage format vLLM serves) halves it again: ~12.8 GB of codes
# + ~0.4 GB of scales, single-chip servable - and decode is bound by the
# weight stream, so halving the bytes also speeds it up.
#
# Representation: a 2-D kernel [K, N] becomes
#   {"q4": uint8 [K/2, N], "scale": f32 [K/G, N]}
# Symmetric absmax per (group g, column n): codes in [-7, 7] stored as
# code+8 in a nibble. PACKING is group-split, not interleaved: within
# group g (rows g*G .. g*G+G-1), packed byte row r holds
#   lo nibble = code[g*G + r],  hi nibble = code[g*G + G/2 + r]
# for r in [0, G/2). The Pallas kernel (ops/int4_matmul.py) then needs NO
# in-kernel interleave: with block_k == G it computes
#   acc += (x[:, :G/2] @ lo + x[:, G/2:] @ hi) * scale[g]
# i.e. two MXU dots per group and a per-group scale epilogue - the exact
# GPTQ dequant math y = sum_g (x_g @ codes_g) * s_g.
#
# The embed table stays per-row int8 (1.4B of 27B params; logits are
# scale-sensitive). TP sharding is NOT supported for int4 (group packing
# does not split on arbitrary K boundaries); int4 exists to make ONE chip
# enough - use int8/bf16 for TP meshes.


def quantize_int4(w: jax.Array, group: int = 256) -> dict:
    """Group-wise symmetric absmax int4 quantization of ``w`` [K, N]
    along the reduction axis. K must divide by ``group`` (Gemma hidden /
    intermediate dims do for group<=256; callers pad otherwise)."""
    wf = jnp.asarray(w, jnp.float32)
    k, n = wf.shape
    if k % group != 0:
        raise ValueError(f"K={k} not divisible by group={group}")
    g = k // group
    wg = wf.reshape(g, group, n)
    amax = jnp.max(jnp.abs(wg), axis=1)                      # [g, n]
    scale = jnp.where(amax > 0, amax, 1.0) / 7.0
    codes = jnp.clip(jnp.round(wg / scale[:, None, :]), -7, 7)
    codes = (codes + 8.0).astype(jnp.uint8)                  # 1..15
    half = group // 2
    lo = codes[:, :half, :]
    hi = codes[:, half:, :]
    packed = (lo | (hi << 4)).reshape(k // 2, n)
    # no "group" key: a Python int leaf would become a traced array under
    # jit tree ops; the group size is recoverable as 2*K/2 / scale rows
    return {"q4": packed, "scale": scale.astype(jnp.float32)}


def is_quantized_int4(p: Any) -> bool:
    return isinstance(p, dict) and "q4" in p


def int4_group(qw: dict) -> int:
    """Group size, from shapes: K / n_groups."""
    return (qw["q4"].shape[0] * 2) // qw["scale"].shape[0]


def dequantize_int4(qw: dict, dtype: Any = jnp.float32) -> jax.Array:
    """Materialize the full-precision weight (tests / XLA fallback)."""
    packed = qw["q4"]
    group = int4_group(qw)
    k2, n = packed.shape
    g = (k2 * 2) // group
    pg = packed.reshape(g, group // 2, n).astype(jnp.int32)
    lo = (pg & 15) - 8
    hi = (pg >> 4) - 8
    full = jnp.concatenate([lo, hi], axis=1).astype(jnp.float32)  # [g, G, n]
    full = full * qw["scale"][:, None, :]
    return full.reshape(g * group, n).astype(dtype)


def _int4_group_for(k_dim: int, group: int) -> int:
    """Largest power-of-two-reduced group <= ``group`` dividing K (tiny
    test configs have K < 256); 0 if no even group divides K."""
    g = min(group, k_dim)
    while g >= 2 and (k_dim % g or g % 2):
        g //= 2
    return g if g >= 2 and k_dim % g == 0 and g % 2 == 0 else 0


def quantize_lm_params_int4(params: Any, group: int = 256) -> Any:
    """Like ``quantize_lm_params`` but kernels go to group-wise int4 (the
    embed table stays per-row int8; a kernel whose K admits no even group
    falls back to int8 - q_dense dispatches per leaf). Runs under jit -
    27B trees quantize on-device."""

    def walk(t):
        if isinstance(t, dict):
            out = {}
            for k, v in t.items():
                if k == "kernel" and getattr(v, "ndim", 0) == 2 \
                        and not isinstance(v, dict):
                    g = _int4_group_for(v.shape[0], group)
                    out[k] = (quantize_int4(v, group=g) if g
                              else quantize_int8(v, axis=0))
                else:
                    out[k] = walk(v)
            return out
        return t

    out = dict(params)
    out["language_model"] = walk(params["language_model"])
    emb = dict(params["embed"])
    if not is_quantized(emb["embed_tokens"]):
        emb["embed_tokens"] = quantize_embed_int8(emb["embed_tokens"])
    out["embed"] = emb
    return out


# -- W8A8 (weights AND activations int8): the ENCODER throughput path -------
#
# Embedding pages is compute-bound on the MXU (ColPali-3B measured at ~80%
# MFU in bf16, BASELINE.md), so the weight-only trick above buys nothing
# there. The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate
# (394 vs 197 TOPS peak; measured 277 vs 149 TOP/s through XLA at 8192^3),
# so quantizing BOTH operands raises the compute ceiling itself - the role
# vLLM's W8A8 quantization plays for GPU serving, applied to the
# reference's corpus-embedding hot loop (/root/reference/functions.py:765-809).
#
# Recipe (the standard dynamic per-token scheme):
#   - weights:     symmetric per-output-channel absmax int8 (quantize_int8)
#   - activations: symmetric per-token (last-dim row) absmax int8, computed
#                  in-jit per call - a cheap VPU pass XLA fuses
#   - dot:         int8 x int8 with int32 accumulation (EXACT - no rounding
#                  inside the contraction), scales applied as a f32 epilogue
# Attention logits/AV products, norms, and embedding gathers stay bf16/f32;
# only the projection/MLP matmuls (where the FLOPs are) run int8.


def quantize_act_int8(x: jax.Array):
    """Per-row (last-dim) symmetric absmax int8 quantization of an
    activation tensor. Returns ``(codes int8, scale f32 [..., 1])``."""
    xf = jnp.asarray(x, jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.where(amax > 0, amax, 1.0) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale


def w8a8_dense(x: jax.Array, qkernel: dict,
               bias: Optional[jax.Array] = None) -> jax.Array:
    """``x @ W (+ bias)`` where ``W`` is a ``quantize_int8(w, axis=0)`` dict:
    dynamic per-token activation int8, int8 x int8 -> int32 MXU dot, f32
    scale epilogue. Output in ``x.dtype``."""
    xq, sx = quantize_act_int8(x)
    y = jax.lax.dot_general(
        xq, qkernel["q8"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * sx * qkernel["scale"]
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def quantize_encoder_params(params: Any) -> Any:
    """Rewrite every 2-D ``kernel`` leaf of an encoder param tree into a
    per-output-channel int8 dict consumed by ``models.layers.dense`` (the
    W8A8 path above). Conv kernels (4-D), norms, biases, and embedding
    tables are left in the compute dtype. Runs fine under jit, so a
    device-resident bf16 tree quantizes on-device without a host bounce."""
    import collections.abc

    def walk(t):
        if isinstance(t, collections.abc.Mapping):
            out = {}
            for k, v in t.items():
                if k == "kernel" and getattr(v, "ndim", 0) == 2 \
                        and not isinstance(v, dict):
                    out[k] = quantize_int8(v, axis=0)
                else:
                    out[k] = walk(v)
            return out
        return t

    return walk(params)


EMBED_PAD = 512   # pad quantized embed rows so vocab % kernel tile == 0


def quantize_embed_int8(table: jax.Array, pad_to: int = EMBED_PAD) -> dict:
    """Per-row quantization of the embed table, padded with zero-code
    rows (scale 1) to a multiple of ``pad_to`` so the tied-logits Pallas
    kernel's N tiling divides the vocab (262208 % 512 != 0). Pad rows
    produce logits == 0 and are sliced off by ``q_logits(out_dim=V)``;
    the embed gather never touches them (ids < V)."""
    q = quantize_int8(table, axis=1)
    pad = (-table.shape[0]) % pad_to
    if pad:
        q = {"q8": jnp.pad(q["q8"], ((0, pad), (0, 0))),
             "scale": jnp.pad(q["scale"], (0, pad), constant_values=1.0)}
    return q


def quantize_lm_params(params: Any) -> Any:
    """Quantize a decode-engine param tree in place of its bf16 kernels:
    every 2-D ``kernel`` under ``language_model`` becomes a per-column
    int8 dict and ``embed.embed_tokens`` a per-row dict. Norm weights
    and biases stay in the compute dtype (tiny, and (1+w) norms are
    scale-sensitive). Runs under jit, so device-resident trees quantize
    on-device (the 12B/27B trees must never bounce to host)."""

    def walk(t):
        if isinstance(t, dict):
            out = {}
            for k, v in t.items():
                if k == "kernel" and getattr(v, "ndim", 0) == 2:
                    out[k] = quantize_int8(v, axis=0)
                else:
                    out[k] = walk(v)
            return out
        return t

    out = dict(params)
    out["language_model"] = walk(params["language_model"])
    emb = dict(params["embed"])
    emb["embed_tokens"] = quantize_embed_int8(emb["embed_tokens"])
    out["embed"] = emb
    return out
