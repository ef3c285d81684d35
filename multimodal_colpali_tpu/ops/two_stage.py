"""Two-stage MaxSim retrieval: pooled prefilter -> exact rescore.

This is the path that makes "<10 ms p50 over 1M pages" physically possible
(BASELINE.md targets): a full-token MaxSim scan of 1M pages reads ~34 GB/chip
even at int8 - tens of ms at HBM speed and over a v5e's 16 GB anyway. The
scalable layout is:

  stage 1: per-page *pooled* embedding [P, DIM] (mean of L2-normalized page
           tokens). Query relevance ~ sum_i q_i . pool_p = (sum_i q_i) . pool_p:
           one [1, DIM] x [DIM, P] matvec over 2 bytes/page-dim -> microseconds
           per 100k pages.
  stage 2: gather the top (k * oversampling) candidates' full token tensors
           (int8 codes + scales) and rescore with exact MaxSim; return top-k.

This mirrors the role of Qdrant's quantized scan + ``rescore=True,
oversampling=2.0`` (reference functions.py:897-903) with the stage-1
quantization pushed all the way to pooling. Recall is a function of the
oversampling factor; tests measure it against the exact scan.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from multimodal_colpali_tpu.ops.maxsim import MASK_VALUE
from multimodal_colpali_tpu.ops.topk import topk_with_stable_ties


def pool_corpus(d: jax.Array, d_lens: jax.Array) -> jax.Array:
    """[P, NT, DIM] tokens -> [P, DIM] mean-pooled page embeddings (fp32->dtype)."""
    nt = d.shape[1]
    mask = (jnp.arange(nt)[None, :] < d_lens[:, None]).astype(jnp.float32)
    summed = jnp.einsum("ptd,pt->pd", d.astype(jnp.float32), mask)
    denom = jnp.maximum(d_lens.astype(jnp.float32), 1.0)[:, None]
    return (summed / denom).astype(d.dtype)


@functools.partial(jax.jit, static_argnames=("k", "n_candidates"))
def two_stage_maxsim_topk(
    q: jax.Array,            # [NQ, DIM] single query's tokens (fp32/bf16)
    q_len: jax.Array,        # scalar int32
    pooled: jax.Array,       # [P, DIM] stage-1 page embeddings
    d_int8: jax.Array,       # [P, NT, DIM] int8 token codes
    d_scale: jax.Array,      # [P, NT] fp32 scales
    d_lens: jax.Array,       # [P] int32
    k: int = 5,
    n_candidates: int = 32,
) -> Tuple[jax.Array, jax.Array]:
    """-> (scores [k], page indices [k]) for one query."""
    nq, dim = q.shape
    qf = q.astype(jnp.float32)
    qmask = (jnp.arange(nq) < q_len).astype(jnp.float32)
    qsum = jnp.einsum("qd,q->d", qf, qmask)

    # Stage 1: one matvec over the pooled corpus.
    coarse = jnp.einsum(
        "d,pd->p", qsum.astype(pooled.dtype), pooled,
        preferred_element_type=jnp.float32,
    )
    coarse = jnp.where(d_lens > 0, coarse, MASK_VALUE)
    # lax.top_k (not the stable-tie variant): stage-1 order is irrelevant -
    # the exact rescore re-ranks - and a full argsort of a 1M-wide vector
    # would dominate the query latency.
    _, cand = jax.lax.top_k(coarse, n_candidates)

    # Stage 2: gather candidates and rescore exactly.
    dc = jnp.take(d_int8, cand, axis=0).astype(jnp.float32)      # [C, NT, DIM]
    sc = jnp.take(d_scale, cand, axis=0)                          # [C, NT]
    lc = jnp.take(d_lens, cand, axis=0)                           # [C]
    sim = jnp.einsum("qd,ctd->cqt", qf, dc,
                     preferred_element_type=jnp.float32) * sc[:, None, :]
    nt = dc.shape[1]
    tok_valid = jnp.arange(nt)[None, None, :] < lc[:, None, None]
    sim = jnp.where(tok_valid, sim, MASK_VALUE)
    per_q = jnp.max(sim, axis=-1)                                 # [C, NQ]
    exact = jnp.einsum("cq,q->c", per_q, qmask)                   # [C]
    vals, order = topk_with_stable_ties(exact[None, :], k)
    return vals[0], jnp.take(cand, order[0])


def build_two_stage_index(
    d: jax.Array, d_lens: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(pooled, int8 codes, scales) from a bf16/fp32 token corpus."""
    from multimodal_colpali_tpu.ops.maxsim import quantize_corpus_int8

    pooled = pool_corpus(d, d_lens)
    codes, scales = quantize_corpus_int8(d)
    return pooled, codes, scales
