"""Fused transformer-LAYER Pallas kernels for the small-encoder hot path.

VERDICT r3 #2: ColSmol-256M embeds at 503 pages/s (49% MFU) and the gap to
its ~1027 pages/s compute ceiling is per-layer activation HBM traffic, not
FLOPs. At batch 16 / S=1024 / H=768 the unfused SigLIP layer moves ~880 MB
of HBM per layer (LN round-trips, q/k/v writes + the [B*H, S, D] transpose
for the attention kernel, the [B, S, 4H] MLP hidden, every residual): XLA
fuses elementwise chains into matmul epilogues but never fuses one matmul
into the next, so each projection output round-trips HBM.

``fused_vit_layer`` keeps an ENTIRE encoder layer in VMEM:

  y = x2 + fc2(gelu_tanh(LN2(x2) @ fc1)),  x2 = x + out_proj(MHA(LN1(x)))

in ONE kernel, grid (B,): per batch item the full [S, H] residual stream,
the q/k/v projections, every head's [S, S] logits, and the [S, I] MLP
hidden all live in VMEM - zero intermediate HBM traffic. Per-layer HBM
traffic drops from ~880 MB to read-x + write-y + weights-once (~65 MB at
the ColSmol shape). This needs more than the 16 MB default scoped-VMEM
allowance: the kernel raises ``vmem_limit_bytes`` (the chip accepts up to
~120 MB, probed by scripts/tpu_vmem_probe.py) and ``layer_plan`` gates
applicability on an explicit VMEM estimate.

Two partial kernels remain for hardware A/B isolation (MMCP_FUSED_PARTS):

- ``fused_vit_attention_block``: y = x + out_proj(attn(LN1(x))),
  grid (B, S/BQ), K/V in scratch, 16 MB-budget design.
- ``fused_mlp_block``: y = x + fc2(gelu_tanh(LN2(x) @ fc1)), row-tiled.

Numerics match the reference flax path (models/siglip.py): LayerNorm in
fp32, matmuls bf16 x bf16 with fp32 accumulation then cast (layers.dense
semantics), softmax in fp32, gelu_pytorch_tanh on the bf16 activation.
Parity is interpret-tested against the flax layer
(tests/test_fused_layer.py) and hardware-tested by scripts/tpu_validate.py.

Applicability is VMEM-gated (``layer_plan``): the SigLIP-768 tower of
ColSmol/Idefics3 fits (~49 MB estimate vs the 64 MB plan ceiling); SO400M
(H=1152, I=4304, head_dim 72 - lane-misaligned per-head slices) estimates
~80 MB and keeps the unfused path (ColPali-3B is already at ~80% MFU -
its bound is the MXU, not activation traffic).

Reference hot loop this accelerates: create_document_embeddings
(/root/reference/functions.py:765-809) with the ColIdefics3 retriever
(/root/reference/05_experiment02.py:331-372).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 14 * 1024 * 1024   # partial kernels: default 16 MB scoped limit
# The chip accepts kernels up to ~120 MB of scoped VMEM when asked
# (scripts/tpu_vmem_probe.py measured 120 MB OK on v5e); the whole-layer
# kernel plans against a conservative ceiling and requests a raised limit.
_LAYER_VMEM_CEILING = 64 * 1024 * 1024
_LAYER_VMEM_LIMIT = 100 * 1024 * 1024


class LayerPlan(NamedTuple):
    vmem_limit: int


def layer_plan(s: int, h: int, inter: int, heads: int,
               dtype_bytes: int = 2) -> Optional[LayerPlan]:
    """VMEM estimate for the whole-layer kernel, or None if over ceiling.

    Counts the grid-invariant weights, the double-buffered x/y blocks, and
    the peak live temporaries of the two phases (attention: fp32 LN temp +
    q/k/v + two live [S, S] fp32 logits buffers + per-head outputs; MLP:
    fp32 [S, I] accumulator + bf16 activation + residual copies). Mosaic's
    stack allocator reuses dead buffers, so this over-counts - safely."""
    if h % heads or s % 128 or h % 128:
        return None
    db = dtype_bytes
    weights = 4 * h * h * db + 2 * h * inter * db
    io = 4 * s * h * db                       # x in + y out, double-buffered
    attn_peak = (s * h * 4                    # fp32 LN temp
                 + 4 * s * h * db             # xn + q + k + v
                 + 2 * s * s * 4              # logits + exp temp (one head)
                 + s * h * db                 # per-head outputs, concat
                 + s * h * 4                  # out-proj fp32 accumulator
                 + 2 * s * h * db)            # x2 + slack
    mlp_peak = (s * h * 4                     # fp32 LN temp
                + 2 * s * h * db              # x2 + xn2
                + s * inter * 4               # fc1 fp32 accumulator
                + s * inter * db              # gelu activation
                + s * h * 4)                  # fc2 fp32 accumulator
    need = weights + io + max(attn_peak, mlp_peak)
    if need > _LAYER_VMEM_CEILING:
        return None
    return LayerPlan(vmem_limit=_LAYER_VMEM_LIMIT)


class AttnBlockPlan(NamedTuple):
    bq: int


class MlpBlockPlan(NamedTuple):
    bm: int


def attention_block_plan(s: int, h: int, heads: int,
                         dtype_bytes: int = 2) -> Optional[AttnBlockPlan]:
    """VMEM plan for the attention-block kernel, or None if it cannot fit.

    Budget: x in (double-buffered) + attn out (double-buffered) + 3 HxH
    weights (grid-invariant, single-buffered) + persistent K/V scratch +
    live fp32 temporaries (the [BQ, S] logits counted 1.5x for the exp
    intermediate, and ~2 [BQ, H] fp32 values for LN/Q). The out
    projection + residual live OUTSIDE the kernel (XLA fuses them into
    one efficient matmul; keeping them in-kernel pushed the Mosaic
    scoped-VMEM allocation 0.7 MB past the 16 MB limit at the ColSmol
    shape)."""
    # h % 128 mirrors layer_plan: misaligned [H, H] blocks / head slices
    # reach Mosaic as lane-misaligned refs and fail at compile time
    # instead of falling back (ADVICE r4)
    if h % heads or s % 128 or h % 128:
        return None
    fixed = (2 * s * h * dtype_bytes            # x in, double-buffered
             + 3 * h * h * dtype_bytes          # wq wk wv
             + 2 * s * h * dtype_bytes)         # k, v scratch
    for bq in (256, 128):
        if s % bq:
            continue
        need = (fixed
                + 2 * bq * h * dtype_bytes      # attn out, double-buffered
                + (3 * bq * s * 4) // 2         # fp32 logits + exp temp
                + 2 * bq * h * 4)               # LN/q fp32 temps
        if need <= _VMEM_BUDGET:
            return AttnBlockPlan(bq=bq)
    return None


def mlp_block_plan(h: int, inter: int,
                   dtype_bytes: int = 2) -> Optional[MlpBlockPlan]:
    fixed = 2 * h * inter * dtype_bytes         # fc1 + fc2, grid-invariant
    for bm in (256, 128):
        need = (fixed
                + 4 * bm * h * dtype_bytes      # x in + y out, double-buffered
                + bm * inter * 4                # fp32 fc1 accumulator
                + bm * inter * dtype_bytes      # gelu activation
                + 2 * bm * h * 4)               # fp32 LN temp
        if need <= _VMEM_BUDGET:
            return MlpBlockPlan(bm=bm)
    return None


def _layernorm_f32(xf, g_ref, b_ref, eps):
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps)
            * g_ref[0].astype(jnp.float32) + b_ref[0].astype(jnp.float32))


def _attn_block_kernel(x_ref, g_ref, b_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                       wv_ref, bv_ref, o_ref,
                       k_scr, v_scr, *, heads, bq, eps, scale):
    j = pl.program_id(1)
    s, h = k_scr.shape
    dh = h // heads
    dt = o_ref.dtype

    @pl.when(j == 0)
    def _prep():
        # LN + K/V projection in row chunks: the fp32 LN temp and the
        # fp32 dot accumulators stay at [chunk, H] instead of [S, H]
        chunk = min(256, s)
        for r in range(s // chunk):
            rows = pl.ds(r * chunk, chunk)
            xn = _layernorm_f32(x_ref[0, rows, :].astype(jnp.float32),
                                g_ref, b_ref, eps).astype(dt)
            k = jax.lax.dot_general(
                xn, wk_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bk_ref[0].astype(jnp.float32)
            k_scr[rows, :] = k.astype(dt)
            v = jax.lax.dot_general(
                xn, wv_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + bv_ref[0].astype(jnp.float32)
            v_scr[rows, :] = v.astype(dt)

    rows = pl.ds(j * bq, bq)
    x_blk = x_ref[0, rows, :]                                 # [BQ, H]
    xn_blk = _layernorm_f32(x_blk.astype(jnp.float32),
                            g_ref, b_ref, eps).astype(dt)
    q = jax.lax.dot_general(
        xn_blk, wq_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bq_ref[0].astype(jnp.float32)
    q = q.astype(dt)

    outs = []
    for hd in range(heads):
        qh = q[:, hd * dh:(hd + 1) * dh]
        kh = k_scr[:, hd * dh:(hd + 1) * dh]
        vh = v_scr[:, hd * dh:(hd + 1) * dh]
        logits = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # [BQ, S]
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        oh = jax.lax.dot_general(
            p.astype(dt), vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / denom       # [BQ, dh]
        outs.append(oh.astype(dt))
    o_ref[0] = jnp.concatenate(outs, axis=1)                  # [BQ, H]


@functools.partial(jax.jit, static_argnames=("heads", "eps", "interpret"))
def fused_vit_attention_block(
    x: jax.Array,                 # [B, S, H]
    ln_g: jax.Array, ln_b: jax.Array,               # [H]
    wq: jax.Array, bq: jax.Array,                   # [H, H], [H]
    wk: jax.Array, bk: jax.Array,
    wv: jax.Array, bv: jax.Array,
    wo: jax.Array, bo: jax.Array,
    *, heads: int, eps: float = 1e-6, interpret: bool = False,
) -> jax.Array:
    """y = x + out_proj(MHA(LayerNorm(x))) (pre-LN ViT block,
    bidirectional, no mask - models/siglip.py:49-57 semantics).

    The kernel fuses LN1 + QKV + per-head attention (K/V resident in
    VMEM); the out projection + residual run as one XLA matmul on the
    kernel's [B, S, H] attention output (in-kernel they exceeded the
    scoped-VMEM limit at the ColSmol shape)."""
    b, s, h = x.shape
    plan = attention_block_plan(s, h, heads)
    if plan is None:
        raise ValueError(f"attention block does not fit VMEM: S={s} H={h}")
    scale = float((h // heads) ** -0.5)
    dt = x.dtype

    def row(v):
        return v.astype(jnp.float32).reshape(1, -1)

    grid = (b, s // plan.bq)
    w_spec = pl.BlockSpec((h, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    r_spec = pl.BlockSpec((1, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    attn = pl.pallas_call(
        functools.partial(_attn_block_kernel, heads=heads, bq=plan.bq,
                          eps=eps, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, s, h), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            r_spec, r_spec,                       # ln g, b
            w_spec, r_spec, w_spec, r_spec,       # wq bq wk bk
            w_spec, r_spec,                       # wv bv
        ],
        out_specs=pl.BlockSpec((1, plan.bq, h), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h), dt),
        scratch_shapes=[
            pltpu.VMEM((s, h), dt),               # k
            pltpu.VMEM((s, h), dt),               # v
        ],
        interpret=interpret,
    )(x, row(ln_g), row(ln_b),
      wq.astype(dt), row(bq), wk.astype(dt), row(bk),
      wv.astype(dt), row(bv))
    proj = jax.lax.dot_general(
        attn, wo.astype(dt),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bo.astype(jnp.float32)
    return x + proj.astype(dt)


def _vit_layer_kernel(x_ref, g1_ref, b1_ref, wq_ref, bq_ref, wk_ref, bk_ref,
                      wv_ref, bv_ref, wo_ref, bo_ref, g2_ref, b2_ref,
                      w1_ref, bb1_ref, w2_ref, bb2_ref, o_ref,
                      *, heads, eps, scale):
    dt = o_ref.dtype
    x = x_ref[0]                                              # [S, H]
    s, h = x.shape
    dh = h // heads

    def dense(inp, w_ref, b_ref):
        acc = jax.lax.dot_general(
            inp, w_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b_ref[0].astype(jnp.float32)
        return acc.astype(dt)

    xn = _layernorm_f32(x.astype(jnp.float32), g1_ref, b1_ref, eps).astype(dt)
    q = dense(xn, wq_ref, bq_ref)
    k = dense(xn, wk_ref, bk_ref)
    v = dense(xn, wv_ref, bv_ref)

    outs = []
    for hd in range(heads):
        qh = q[:, hd * dh:(hd + 1) * dh]
        kh = k[:, hd * dh:(hd + 1) * dh]
        vh = v[:, hd * dh:(hd + 1) * dh]
        logits = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale       # [S, S] fp32
        m = jnp.max(logits, axis=1, keepdims=True)
        p = jnp.exp(logits - m)
        denom = jnp.sum(p, axis=1, keepdims=True)
        oh = jax.lax.dot_general(
            p.astype(dt), vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / denom       # [S, dh]
        outs.append(oh.astype(dt))
    attn = jnp.concatenate(outs, axis=1)                      # [S, H]
    x2 = x + dense(attn, wo_ref, bo_ref)

    xn2 = _layernorm_f32(x2.astype(jnp.float32),
                         g2_ref, b2_ref, eps).astype(dt)
    hid = dense(xn2, w1_ref, bb1_ref)
    # gelu on the bf16 activation: layers.dense casts the fc1 output to the
    # activation dtype before flax applies nn.gelu - match that exactly
    hid = jax.nn.gelu(hid, approximate=True)
    o_ref[0] = x2 + dense(hid, w2_ref, bb2_ref)


@functools.partial(jax.jit, static_argnames=("heads", "eps", "interpret"))
def fused_vit_layer(
    x: jax.Array,                 # [B, S, H]
    ln1_g: jax.Array, ln1_b: jax.Array,             # [H]
    wq: jax.Array, bq: jax.Array,                   # [H, H], [H]
    wk: jax.Array, bk: jax.Array,
    wv: jax.Array, bv: jax.Array,
    wo: jax.Array, bo: jax.Array,
    ln2_g: jax.Array, ln2_b: jax.Array,             # [H]
    w1: jax.Array, b1: jax.Array,                   # [H, I], [I]
    w2: jax.Array, b2: jax.Array,                   # [I, H], [H]
    *, heads: int, eps: float = 1e-6, interpret: bool = False,
) -> jax.Array:
    """One pre-LN ViT encoder layer (models/siglip.py:49-115 semantics,
    bidirectional, no mask) as a single Pallas kernel, grid (B,).

    Per grid step one batch item's whole layer - LN1, q/k/v projections,
    every head's softmax(QK^T)V, out projection, residual, LN2, fc1, gelu,
    fc2, residual - runs out of VMEM; the only HBM traffic is x in, y out,
    and the (grid-invariant, fetched-once) weights. Needs a raised
    scoped-VMEM limit (see ``layer_plan``); numerics mirror layers.dense
    (bf16 x bf16 matmuls, fp32 accumulation, fp32 bias add, cast) with
    LayerNorm and softmax in fp32."""
    b, s, h = x.shape
    inter = w1.shape[-1]
    plan = layer_plan(s, h, inter, heads)
    if plan is None:
        raise ValueError(f"vit layer does not fit VMEM: S={s} H={h} I={inter}")
    scale = float((h // heads) ** -0.5)
    dt = x.dtype

    def row(v):
        return v.astype(jnp.float32).reshape(1, -1)

    def w_spec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=plan.vmem_limit)
    return pl.pallas_call(
        functools.partial(_vit_layer_kernel, heads=heads, eps=eps,
                          scale=scale),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, s, h), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            w_spec((1, h)), w_spec((1, h)),                   # ln1 g, b
            w_spec((h, h)), w_spec((1, h)),                   # wq bq
            w_spec((h, h)), w_spec((1, h)),                   # wk bk
            w_spec((h, h)), w_spec((1, h)),                   # wv bv
            w_spec((h, h)), w_spec((1, h)),                   # wo bo
            w_spec((1, h)), w_spec((1, h)),                   # ln2 g, b
            w_spec((h, inter)), w_spec((1, inter)),           # fc1
            w_spec((inter, h)), w_spec((1, h)),               # fc2
        ],
        out_specs=pl.BlockSpec((1, s, h), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h), dt),
        interpret=interpret,
        **kwargs,
    )(x, row(ln1_g), row(ln1_b),
      wq.astype(dt), row(bq), wk.astype(dt), row(bk),
      wv.astype(dt), row(bv), wo.astype(dt), row(bo),
      row(ln2_g), row(ln2_b),
      w1.astype(dt), row(b1), w2.astype(dt), row(b2))


def _mlp_block_kernel(x_ref, g_ref, b_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                      o_ref, *, eps):
    dt = o_ref.dtype
    xn = _layernorm_f32(x_ref[:].astype(jnp.float32),
                        g_ref, b_ref, eps).astype(dt)
    hid = jax.lax.dot_general(
        xn, w1_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[0].astype(jnp.float32)
    # gelu on the bf16 activation: layers.dense casts the fc1 output to the
    # activation dtype before flax applies nn.gelu - match that exactly
    hid = jax.nn.gelu(hid.astype(dt), approximate=True)
    out = jax.lax.dot_general(
        hid, w2_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[0].astype(jnp.float32)
    o_ref[:] = x_ref[:] + out.astype(dt)


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def fused_mlp_block(
    x: jax.Array,                 # [B, S, H] (or [N, H])
    ln_g: jax.Array, ln_b: jax.Array,               # [H]
    w1: jax.Array, b1: jax.Array,                   # [H, I], [I]
    w2: jax.Array, b2: jax.Array,                   # [I, H], [H]
    *, eps: float = 1e-6, interpret: bool = False,
) -> jax.Array:
    """y = x + fc2(gelu_tanh(fc1(LayerNorm(x)))) in one kernel
    (models/siglip.py:20-27 + layer_norm2 + residual semantics)."""
    shape = x.shape
    h = shape[-1]
    inter = w1.shape[-1]
    plan = mlp_block_plan(h, inter)
    if plan is None:
        raise ValueError(f"mlp block does not fit VMEM: H={h} I={inter}")
    n = 1
    for d in shape[:-1]:
        n *= d
    xr = x.reshape(n, h)
    pad = (-n) % plan.bm
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
    dt = x.dtype

    def row(v):
        return v.astype(jnp.float32).reshape(1, -1)

    out = pl.pallas_call(
        functools.partial(_mlp_block_kernel, eps=eps),
        grid=((n + pad) // plan.bm,),
        in_specs=[
            pl.BlockSpec((plan.bm, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, inter), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, inter), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((inter, h), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((plan.bm, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(((n + pad), h), dt),
        interpret=interpret,
    )(xr, row(ln_g), row(ln_b), w1.astype(dt), row(b1), w2.astype(dt),
      row(b2))
    if pad:
        out = out[:n]
    return out.reshape(shape)
