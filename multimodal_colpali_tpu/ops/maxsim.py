"""Fused MaxSim late-interaction scoring.

This is the TPU-native replacement for the two MaxSim implementations the
reference outsources:

- Qdrant's Rust multivector ``MAX_SIM`` comparator, used by
  ``retrieve_colpali`` (reference functions.py:884-929, collection created at
  01_create_context_qdrant.py:208-222), and
- ``processor.score_multi_vector`` from colpali-engine, used by the in-memory
  ``score_results`` path (reference 05_experiment02.py:200-236).

The math (the oracle every kernel here is tested against):

    scores[b, p] = sum_i  max_j  <Q[b, i, :], D[p, j, :]>

where ``i`` ranges over valid query tokens and ``j`` over valid doc (page)
tokens. Padded doc tokens must not win the max; padded query tokens must not
contribute to the sum.

Design notes (TPU-first):
- D is laid out ``[pages, max_tokens, dim]`` with ``dim = 128`` = one MXU/VPU
  lane tile; scoring one page block is a single ``[B*NQ, 128] x [128, NT]``
  matmul per page on the MXU with fp32 accumulation, then a VPU max/sum
  reduction. The op is HBM-bandwidth bound (each page block is streamed
  through VMEM exactly once), so the kernel's job is to keep DMA large and
  sequential; Pallas pipelines the page-block fetches automatically via the
  grid.
- Variable token counts are handled with per-page token counts in SMEM and an
  in-kernel iota mask - no [P, NT] mask array is ever materialised in HBM.
- int8 corpus support: same kernel with int8 page tokens and a per-page-token
  scale, MXU int8 accumulate to int32, dequantised before the max. This is
  the "quantized scan" stage mirrored from Qdrant's scalar quantization
  (search params at reference functions.py:897-903).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
# Masking value for invalid doc tokens. Large-but-finite instead of -inf so
# the per-query aggregation matmul (0 * masked) can never produce NaN; a page
# with zero valid tokens scores ~ -NQ*1e30, ranking it last, matching the
# "never retrieved" semantics of an empty multivector in Qdrant.
MASK_VALUE = -1e30


# ---------------------------------------------------------------------------
# Reference (oracle) implementation - pure jnp, used for tests and CPU paths.
# ---------------------------------------------------------------------------

def maxsim_scores_reference(
    q: jax.Array,
    d: jax.Array,
    q_lens: Optional[jax.Array] = None,
    d_lens: Optional[jax.Array] = None,
) -> jax.Array:
    """MaxSim scores by plain einsum; the numeric oracle.

    Args:
      q: ``[B, NQ, DIM]`` query token embeddings.
      d: ``[P, NT, DIM]`` page token embeddings.
      q_lens: optional ``[B]`` int32 valid query-token counts.
      d_lens: optional ``[P]`` int32 valid page-token counts.

    Returns:
      ``[B, P]`` float32 scores.
    """
    q = q.astype(jnp.float32)
    d = d.astype(jnp.float32)
    # [B, P, NQ, NT]; full fp32 accumulation regardless of backend defaults
    sim = jnp.einsum("bqd,ptd->bpqt", q, d, precision=jax.lax.Precision.HIGHEST)
    if d_lens is not None:
        nt = d.shape[1]
        d_mask = jnp.arange(nt)[None, :] < d_lens[:, None]  # [P, NT]
        sim = jnp.where(d_mask[None, :, None, :], sim, MASK_VALUE)
    per_query_token = jnp.max(sim, axis=-1)  # [B, P, NQ]
    if q_lens is not None:
        nq = q.shape[1]
        q_mask = jnp.arange(nq)[None, :] < q_lens[:, None]  # [B, NQ]
        per_query_token = jnp.where(q_mask[:, None, :], per_query_token, 0.0)
    return jnp.sum(per_query_token, axis=-1)


# ---------------------------------------------------------------------------
# Pallas kernel - bf16/fp32 corpus.
# ---------------------------------------------------------------------------

def _maxsim_kernel(d_lens_ref, q_ref, agg_ref, d_ref, out_ref):
    """One grid step scores a block of pages against all queries.

    Refs:
      d_lens_ref: scalar-prefetch SMEM ``[P_pad]`` int32 valid token counts
                  (whole corpus; indexed globally).
      q_ref:      VMEM ``[B*NQ, DIM]`` query tokens.
      agg_ref:    VMEM ``[B, B*NQ]`` fp32 aggregation matrix: ``A[b, r]`` is
                  1.0 iff row ``r`` is a *valid* token of query ``b``. Folds
                  the query-token mask and the per-query sum into one small
                  MXU matmul (elementwise reshape+reduce over the sublane dim
                  does not lower well in Mosaic for b == 1).
      d_ref:      VMEM ``[BP, NT, DIM]`` page block.
      out_ref:    VMEM ``[1, B, BP]`` fp32 output block (page-block major so
                  the block shape equals the array shape in the tiled dims).
    """
    bp, nt, _ = d_ref.shape
    block = pl.program_id(0)

    qf = q_ref[:]
    rows = qf.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, nt), 1)

    # Static unroll over the page block: per page one [rows,128]x[128,NT] MXU
    # matmul + a VPU masked max; the per-query sums for the whole block are a
    # single [B, rows] x [rows, BP] matmul at the end, written as one aligned
    # [1, B, BP] store (dynamic single-lane stores don't lower well).
    maxcols = []
    for p in range(bp):
        dpage = d_ref[p]  # [NT, DIM]
        sim = jax.lax.dot_general(
            qf,
            dpage,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, NT]
        valid = col_ids < d_lens_ref[block * bp + p]
        sim = jnp.where(valid, sim, MASK_VALUE)
        maxcols.append(jnp.max(sim, axis=1, keepdims=True))  # [rows, 1]
    m = jnp.concatenate(maxcols, axis=1)  # [rows, BP]
    out_ref[0] = jnp.dot(agg_ref[:], m, preferred_element_type=jnp.float32)


def _pick_block_pages(nt: int, dim: int, itemsize: int, vmem_budget: int = 6 * 2**20) -> int:
    """Page-block size so the streamed D block stays within a VMEM budget."""
    per_page = nt * dim * itemsize
    bp = max(1, vmem_budget // max(per_page, 1))
    # Round down to a power of two for clean grids; cap for sane pipelining.
    p2 = 1
    while p2 * 2 <= min(bp, 64):
        p2 *= 2
    return p2


@functools.partial(jax.jit, static_argnames=("block_pages", "interpret"))
def maxsim_scores_pallas(
    q: jax.Array,
    d: jax.Array,
    q_lens: Optional[jax.Array] = None,
    d_lens: Optional[jax.Array] = None,
    *,
    block_pages: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """Fused Pallas MaxSim: ``[B, NQ, DIM] x [P, NT, DIM] -> [B, P]`` fp32.

    The corpus tensor ``d`` may be bf16 (canonical) or fp32; accumulation is
    always fp32 on the MXU. Pages are streamed through VMEM in blocks; the
    per-page token counts ride in SMEM.
    """
    b, nq, dim = q.shape
    p, nt, dim2 = d.shape
    assert dim == dim2, (dim, dim2)

    if q_lens is None:
        q_lens = jnp.full((b,), nq, dtype=jnp.int32)
    if d_lens is None:
        d_lens = jnp.full((p,), nt, dtype=jnp.int32)

    bp = block_pages or _pick_block_pages(nt, dim, d.dtype.itemsize)
    num_blocks = pl.cdiv(p, bp)
    p_pad = num_blocks * bp
    if p_pad != p:
        d = jnp.pad(d, ((0, p_pad - p), (0, 0), (0, 0)))
        d_lens = jnp.pad(d_lens, (0, p_pad - p))

    rows = b * nq
    q2 = q.reshape(rows, dim).astype(d.dtype if d.dtype == jnp.bfloat16 else q.dtype)
    agg = _aggregation_matrix(b, nq, q_lens)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((rows, dim), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, rows), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, nt, dim), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, bp), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        _maxsim_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_blocks, b, bp), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * rows * p_pad * nt * dim,
            bytes_accessed=p_pad * nt * dim * d.dtype.itemsize + rows * dim * q2.dtype.itemsize,
            transcendentals=0,
        ),
    )(d_lens.astype(jnp.int32), q2, agg, d)
    out = jnp.moveaxis(out, 0, 1).reshape(b, p_pad)
    return out[:, :p]


def _aggregation_matrix(b: int, nq: int, q_lens: jax.Array) -> jax.Array:
    """``[B, B*NQ]`` matrix folding the query-token mask and per-query sum."""
    rows = b * nq
    r = jnp.arange(rows)
    owner = r // nq  # which query each row belongs to
    tok = r % nq
    valid = tok < q_lens[owner]
    return (
        (jnp.arange(b)[:, None] == owner[None, :]) & valid[None, :]
    ).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pallas kernel - int8-quantized corpus (Qdrant "quantized scan" equivalent).
# ---------------------------------------------------------------------------

def _maxsim_int8_kernel(d_lens_ref, q_ref, agg_ref, d_ref, dscale_ref, out_ref):
    """Like ``_maxsim_kernel`` but D is int8 with a per-page-token fp32 scale.

    Refs:
      d_ref:      VMEM ``[BP, NT, DIM]`` int8 page block.
      dscale_ref: VMEM ``[BP, NT]`` fp32 per-token dequant scales.
    """
    bp, nt, _ = d_ref.shape
    block = pl.program_id(0)

    # Queries ride at bf16 through the MXU (they already come out of a bf16
    # encoder); corpus codes are exact in bf16 since |int8| <= 127 < 2^8.
    qf = q_ref[:].astype(jnp.bfloat16)
    rows = qf.shape[0]
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, nt), 1)

    maxcols = []
    for p in range(bp):
        # The per-token scale factors out of the dot product:
        #   <q, s_j * v_j> = s_j * <q, v_j>
        # so the matmul runs on the raw int8 codes (cast to bf16, exact for
        # |v| <= 127) and the dequant is one multiply on the [rows, NT] tile.
        dpage = d_ref[p].astype(jnp.bfloat16)  # [NT, DIM]
        sim = jax.lax.dot_general(
            qf,
            dpage,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, NT] raw-code dots
        sim = sim * dscale_ref[p][None, :]
        valid = col_ids < d_lens_ref[block * bp + p]
        sim = jnp.where(valid, sim, MASK_VALUE)
        maxcols.append(jnp.max(sim, axis=1, keepdims=True))
    m = jnp.concatenate(maxcols, axis=1)  # [rows, BP]
    out_ref[0] = jnp.dot(agg_ref[:], m, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("block_pages", "interpret"))
def maxsim_scores_int8_pallas(
    q: jax.Array,
    d_int8: jax.Array,
    d_scale: jax.Array,
    q_lens: Optional[jax.Array] = None,
    d_lens: Optional[jax.Array] = None,
    *,
    block_pages: int = 0,
    interpret: bool = False,
) -> jax.Array:
    """MaxSim over an int8-quantized corpus with per-token scales."""
    b, nq, dim = q.shape
    p, nt, _ = d_int8.shape
    if q_lens is None:
        q_lens = jnp.full((b,), nq, dtype=jnp.int32)
    if d_lens is None:
        d_lens = jnp.full((p,), nt, dtype=jnp.int32)

    bp = block_pages or _pick_block_pages(nt, dim, 1)
    num_blocks = pl.cdiv(p, bp)
    p_pad = num_blocks * bp
    if p_pad != p:
        d_int8 = jnp.pad(d_int8, ((0, p_pad - p), (0, 0), (0, 0)))
        d_scale = jnp.pad(d_scale, ((0, p_pad - p), (0, 0)))
        d_lens = jnp.pad(d_lens, (0, p_pad - p))

    rows = b * nq
    q2 = q.reshape(rows, dim).astype(jnp.float32)
    agg = _aggregation_matrix(b, nq, q_lens)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((rows, dim), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, rows), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, nt, dim), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, nt), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, b, bp), lambda i, *_: (i, 0, 0), memory_space=pltpu.VMEM),
    )

    out = pl.pallas_call(
        _maxsim_int8_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_blocks, b, bp), jnp.float32),
        interpret=interpret,
    )(d_lens.astype(jnp.int32), q2, agg, d_int8, d_scale.astype(jnp.float32))
    out = jnp.moveaxis(out, 0, 1).reshape(b, p_pad)
    return out[:, :p]


# ---------------------------------------------------------------------------
# Dispatcher.
# ---------------------------------------------------------------------------

def maxsim_scores(
    q: jax.Array,
    d: jax.Array,
    q_lens: Optional[jax.Array] = None,
    d_lens: Optional[jax.Array] = None,
    *,
    use_pallas: Optional[bool] = None,
    interpret: bool = False,
) -> jax.Array:
    """Score queries against a page-token corpus with MaxSim.

    Uses the fused Pallas kernel on TPU backends and the einsum reference on
    CPU (where XLA:CPU fuses the einsum adequately and Pallas would have to
    run interpreted). ``use_pallas`` forces either path.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        return maxsim_scores_pallas(q, d, q_lens, d_lens, interpret=interpret)
    return maxsim_scores_reference(q, d, q_lens, d_lens)


def quantize_corpus_int8(d: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-token int8 quantization of a ``[P, NT, DIM]`` corpus.

    Returns (values int8 ``[P, NT, DIM]``, scales fp32 ``[P, NT]``). Mirrors
    Qdrant's scalar quantization role in the two-stage search (reference
    functions.py:897-903: quantized scan + ``rescore=True``).
    """
    d = d.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(d), axis=-1)  # [P, NT]
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.round(d / scale[..., None]).astype(jnp.int8)
    return q, scale
