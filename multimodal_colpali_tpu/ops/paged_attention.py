"""Paged-KV decode attention (the vLLM PagedAttention role, TPU-native).

The contiguous batcher (generation/scheduler.py) preallocates a dense
``[B, T, Hkv, D]`` cache per slot, so HBM cost is ``B * max_seq_len`` even
when most requests are short. Paged KV replaces that with a shared pool of
fixed-size pages plus per-slot block tables: a slot holding ``n`` tokens
pins only ``ceil(n / page)`` pages, so many long-context slots can share a
pool far smaller than ``B * T_max`` (the memory role vLLM's PagedAttention
plays for the reference's generation server, 00_run_docker_containers.sh:26-39).

Layout:
  k_pool / v_pool : [P, page, Hkv, D]   (P physical pages, shared by slots)
  block_tables    : [B, NB] int32       logical block i of slot b lives in
                                        physical page block_tables[b, i]
                                        (entries past the slot's length may
                                        be any valid index; they are masked)
  lengths         : [B] int32           tokens currently in each slot

Token t of slot b sits at (page block_tables[b, t // page], row t % page).

Two implementations with identical semantics:

- ``paged_attention_xla``: gather-based, runs anywhere (CPU tests, oracle).
- ``paged_attention``: Pallas TPU kernel. Grid (B, NB); the block table is
  a scalar-prefetch operand so each grid step DMAs exactly the physical
  page it needs from HBM into VMEM, with an online-softmax accumulator in
  VMEM scratch across a slot's pages. Falls back to the XLA path off-TPU.

Both use fp32 accumulation and match models/layers.attention (einsum, fp32
softmax) on an equivalent dense cache - pinned by tests/test_paged.py.

int8 KV (``paged_attention_int8`` + ``quantize_kv_rows``): pools store int8
codes with one fp32 absmax scale per (token, kv head) - vLLM's
``kv_cache_dtype=fp8`` role, TPU-native. Halving the pool's bytes doubles
the tokens a fixed HBM budget can hold. The scales factor OUT of both dots
(``q @ (k*s)^T = (q @ k^T) * s`` column-wise, and ``(p*s) @ v`` for the
value side), so the MXU still runs bf16 x bf16 - int8->bf16 is exact for
|code| <= 127. Note the factored order is numerically equivalent to
dequantize-then-attend only within bf16 rounding, not bit-identical: the
XLA oracle rounds ``codes * scale`` to bf16 BEFORE its dot, while the
kernel multiplies the fp32 scale AFTER an int8->bf16 dot (tests pin the
two paths to a small tolerance, not equality).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def paged_attention_xla(
    q: jax.Array,             # [B, Hq, D] one decode token per slot
    k_pool: jax.Array,        # [P, page, Hkv, D]
    v_pool: jax.Array,        # [P, page, Hkv, D]
    block_tables: jax.Array,  # [B, NB] int32
    lengths: jax.Array,       # [B] int32 valid tokens per slot
    *,
    scale: float,
    window: int = 0,
) -> jax.Array:
    """Gather-based reference: materialize each slot's logical KV view and
    run the standard fp32-softmax attention. Returns [B, Hq, D].
    ``window > 0``: sliding-window decode (Gemma-3's local layers) - the
    query at logical position ``lengths-1`` attends only positions
    ``>= lengths - window``."""
    b, hq, d = q.shape
    p, page, hkv, _ = k_pool.shape
    nb = block_tables.shape[1]
    k = k_pool[block_tables].reshape(b, nb * page, hkv, d)
    v = v_pool[block_tables].reshape(b, nb * page, hkv, d)
    if hkv != hq:
        k = jnp.repeat(k, hq // hkv, axis=2)
        v = jnp.repeat(v, hq // hkv, axis=2)
    logits = jnp.einsum("bhd,bthd->bht", q, k,
                        preferred_element_type=jnp.float32) * scale
    pos = jnp.arange(nb * page)[None, None, :]
    valid = pos < lengths[:, None, None]
    if window:
        valid = valid & (pos >= (lengths - window)[:, None, None])
    logits = jnp.where(valid, logits, jnp.float32(NEG))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bht,bthd->bhd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def _paged_kernel(bt_ref, lens_ref, q_ref, k_ref, v_ref, o_ref,
                  m_ref, l_ref, acc_ref, *, scale, page, hkv, group,
                  window=0):
    """Grid: (B, NB). Blocks: q/o [1, Hq, D]; k/v one physical page
    [1, page, Hkv, D] selected via the prefetched block table. Online
    softmax across a slot's pages in VMEM scratch."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                   # [Hq, D]
    k = k_ref[0]                                   # [page, Hkv, D]
    v = v_ref[0]
    hq = q.shape[0]

    # logits for every q head against this page, grouped by kv head
    cols = []
    for h in range(hkv):
        qh = q[h * group:(h + 1) * group]          # [G, D]
        lg = jax.lax.dot_general(
            qh, k[:, h], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # [G, page]
        cols.append(lg)
    logits = jnp.concatenate(cols, axis=0)         # [Hq, page]

    pos = jax.lax.broadcasted_iota(jnp.int32, (hq, page), 1) + i * page
    keep = pos < lens_ref[b]
    if window:   # sliding-window layers (Gemma-3): last `window` tokens only
        keep = keep & (pos >= lens_ref[b] - window)
    logits = jnp.where(keep, logits, NEG)

    m_prev = m_ref[...]                            # [Hq, 1]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    probs = jnp.exp(logits - m_new)                # [Hq, page]
    l_ref[...] = l_ref[...] * alpha + jnp.sum(probs, axis=1, keepdims=True)
    m_ref[...] = m_new

    pv = []
    for h in range(hkv):
        ph = probs[h * group:(h + 1) * group]      # [G, page]
        pv.append(jax.lax.dot_general(
            ph.astype(v.dtype), v[:, h],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))   # [G, D]
    acc_ref[...] = acc_ref[...] * alpha + jnp.concatenate(pv, axis=0)

    @pl.when(i == nb - 1)
    def _emit():
        denom = jnp.maximum(l_ref[...], 1e-30)     # inactive slot: len 0
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "window"))
def paged_attention(
    q: jax.Array,             # [B, Hq, D]
    k_pool: jax.Array,        # [P, page, Hkv, D]
    v_pool: jax.Array,
    block_tables: jax.Array,  # [B, NB] int32
    lengths: jax.Array,       # [B] int32
    *,
    scale: float,
    interpret: bool = False,
    window: int = 0,
) -> jax.Array:
    b, hq, d = q.shape
    p, page, hkv, _ = k_pool.shape
    nb = block_tables.shape[1]
    group = hq // hkv

    if not interpret and jax.default_backend() != "tpu":
        return paged_attention_xla(q, k_pool, v_pool, block_tables, lengths,
                                   scale=scale, window=window)

    bt_flat = block_tables.reshape(-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # block tables + lengths
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda bi, i, *_: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, page, hkv, d),
                         lambda bi, i, bt, lens: (bt[bi * nb + i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, page, hkv, d),
                         lambda bi, i, bt, lens: (bt[bi * nb + i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda bi, i, *_: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hq, 1), jnp.float32),   # running max
            pltpu.VMEM((hq, 1), jnp.float32),   # running denom
            pltpu.VMEM((hq, d), jnp.float32),   # running numerator
        ],
    )
    return pl.pallas_call(
        functools.partial(_paged_kernel, scale=scale, page=page, hkv=hkv,
                          group=group, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        interpret=interpret,
    )(bt_flat, lengths.astype(jnp.int32), q, k_pool, v_pool)


def quantize_kv_rows(x: jax.Array) -> tuple:
    """Per-(token, head) absmax int8 quantization of KV rows.

    x: [..., Hkv, D] -> (codes int8 same shape, scales fp32 [..., Hkv]).
    Dequantization is ``codes * scales[..., None]``.
    """
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1) / 127.0
    safe = jnp.maximum(s, 1e-12)[..., None]
    codes = jnp.round(x.astype(jnp.float32) / safe).astype(jnp.int8)
    return codes, s.astype(jnp.float32)


def paged_attention_int8_xla(
    q: jax.Array,             # [B, Hq, D]
    k_pool: jax.Array,        # [P, page, Hkv, D] int8
    k_scale: jax.Array,       # [P, page, Hkv] fp32
    v_pool: jax.Array,        # int8
    v_scale: jax.Array,
    block_tables: jax.Array,  # [B, NB] int32
    lengths: jax.Array,       # [B] int32
    *,
    scale: float,
    window: int = 0,
) -> jax.Array:
    """Oracle: dequantize the gathered pages and run the bf16 reference."""
    kd = (k_pool.astype(jnp.float32) * k_scale[..., None]).astype(q.dtype)
    vd = (v_pool.astype(jnp.float32) * v_scale[..., None]).astype(q.dtype)
    return paged_attention_xla(q, kd, vd, block_tables, lengths, scale=scale,
                               window=window)


def _paged_kernel_int8(bt_ref, lens_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                       o_ref, m_ref, l_ref, acc_ref, *, scale, page, hkv,
                       group, window=0):
    """int8 variant of ``_paged_kernel``: the per-token scales multiply the
    logit columns (K side) and the prob columns (V side), so the dots stay
    bf16 x bf16 on the MXU and the int8->bf16 casts are exact."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)

    @pl.when(i == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                                   # [Hq, D]
    k = k_ref[0]                                   # [page, Hkv, D] int8
    ks = ks_ref[0]                                 # [page, Hkv] fp32
    v = v_ref[0]
    vs = vs_ref[0]
    hq = q.shape[0]

    cols = []
    for h in range(hkv):
        qh = q[h * group:(h + 1) * group]          # [G, D]
        lg = jax.lax.dot_general(
            qh, k[:, h].astype(qh.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)    # [G, page]
        cols.append(lg * (ks[:, h] * scale)[None, :])
    logits = jnp.concatenate(cols, axis=0)         # [Hq, page]

    pos = jax.lax.broadcasted_iota(jnp.int32, (hq, page), 1) + i * page
    keep = pos < lens_ref[b]
    if window:   # sliding-window layers (Gemma-3)
        keep = keep & (pos >= lens_ref[b] - window)
    logits = jnp.where(keep, logits, NEG)

    m_prev = m_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    probs = jnp.exp(logits - m_new)                # [Hq, page] fp32
    l_ref[...] = l_ref[...] * alpha + jnp.sum(probs, axis=1, keepdims=True)
    m_ref[...] = m_new

    pv = []
    for h in range(hkv):
        ph = probs[h * group:(h + 1) * group] * vs[:, h][None, :]  # [G, page]
        pv.append(jax.lax.dot_general(
            ph.astype(q.dtype), v[:, h].astype(q.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))   # [G, D]
    acc_ref[...] = acc_ref[...] * alpha + jnp.concatenate(pv, axis=0)

    @pl.when(i == nb - 1)
    def _emit():
        denom = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / denom).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "interpret", "window"))
def paged_attention_int8(
    q: jax.Array,             # [B, Hq, D]
    k_pool: jax.Array,        # [P, page, Hkv, D] int8
    k_scale: jax.Array,       # [P, page, Hkv] fp32
    v_pool: jax.Array,
    v_scale: jax.Array,
    block_tables: jax.Array,  # [B, NB] int32
    lengths: jax.Array,       # [B] int32
    *,
    scale: float,
    interpret: bool = False,
    window: int = 0,
) -> jax.Array:
    b, hq, d = q.shape
    p, page, hkv, _ = k_pool.shape
    nb = block_tables.shape[1]
    group = hq // hkv

    if not interpret and jax.default_backend() != "tpu":
        return paged_attention_int8_xla(q, k_pool, k_scale, v_pool, v_scale,
                                        block_tables, lengths, scale=scale,
                                        window=window)

    bt_flat = block_tables.reshape(-1).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,   # block tables + lengths
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda bi, i, *_: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, page, hkv, d),
                         lambda bi, i, bt, lens: (bt[bi * nb + i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, page, hkv),
                         lambda bi, i, bt, lens: (bt[bi * nb + i], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, page, hkv, d),
                         lambda bi, i, bt, lens: (bt[bi * nb + i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, page, hkv),
                         lambda bi, i, bt, lens: (bt[bi * nb + i], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda bi, i, *_: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hq, 1), jnp.float32),   # running max
            pltpu.VMEM((hq, 1), jnp.float32),   # running denom
            pltpu.VMEM((hq, d), jnp.float32),   # running numerator
        ],
    )
    return pl.pallas_call(
        functools.partial(_paged_kernel_int8, scale=scale, page=page,
                          hkv=hkv, group=group, window=window),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, hq, d), q.dtype),
        interpret=interpret,
    )(bt_flat, lengths.astype(jnp.int32), q, k_pool, k_scale, v_pool, v_scale)
