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
           and rescore with exact MaxSim; return top-k. The rescore source is
           the bf16 originals when available (``d_full``, matching the int8
           path's bf16 rescore and Qdrant's rescore-from-originals semantics)
           and the int8 codes + scales otherwise (the 1M-page configuration,
           where the bf16 corpus cannot fit in HBM).

This mirrors the role of Qdrant's quantized scan + ``rescore=True,
oversampling=2.0`` (reference functions.py:897-903) with the stage-1
quantization pushed all the way to pooling. Recall is a function of the
oversampling factor; tests measure it against the exact scan on clustered
corpora (tests/test_two_stage.py).

``sharded_two_stage_maxsim_topk`` runs the same algorithm over a corpus
sharded on the page axis (the 1M-page configuration: pooled prefilter AND
corpus sharding together): per-shard pooled top-C, all-gather of (score,
global id) candidates over ICI, a global top-C re-selection that reproduces
``lax.top_k`` tie semantics exactly, owner-computed exact rescore combined
with ``pmax``, and the same stable final top-k - so the result is
bit-identical to the single-device function on the same corpus.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from multimodal_colpali_tpu.ops.maxsim import MASK_VALUE, NEG_INF
from multimodal_colpali_tpu.ops.topk import topk_with_stable_ties


def pool_corpus(d: jax.Array, d_lens: jax.Array) -> jax.Array:
    """[P, NT, DIM] tokens -> [P, DIM] mean-pooled page embeddings (fp32->dtype)."""
    nt = d.shape[1]
    mask = (jnp.arange(nt)[None, :] < d_lens[:, None]).astype(jnp.float32)
    summed = jnp.einsum("ptd,pt->pd", d.astype(jnp.float32), mask)
    denom = jnp.maximum(d_lens.astype(jnp.float32), 1.0)[:, None]
    return (summed / denom).astype(d.dtype)


@functools.partial(jax.jit, static_argnames=("k",))
def pool_corpus_fps(d: jax.Array, d_lens: jax.Array, k: int = 4) -> jax.Array:
    """[P, NT, DIM] tokens -> [P, k, DIM] representative tokens per page,
    farthest-point sampled.

    Pages are multi-topic (title, figures, body); one mean vector blurs a
    minority topic to ~its token share and the page loses stage 1 to
    uniformly mid-similar distractors. Selecting k REAL tokens per page -
    greedy farthest-point sampling, so the picks cover the page's distinct
    directions - makes stage 1 a k-token subsampled MaxSim: no averaging,
    no dilution. The scan stays one matmul, k columns wider; with stage-1
    score = max over the picks, recall at fixed oversampling dominates the
    mean-pooled prefilter on multi-topic corpora (tests/test_two_stage.py).
    """
    p, nt, dim = d.shape
    df = d.astype(jnp.float32)
    valid = (jnp.arange(nt)[None, :] < d_lens[:, None])          # [P, NT]
    neg = jnp.float32(-1e30)

    def body(j, state):
        picks, mindist = state
        # farthest valid token from the current pick set (first pick:
        # mindist is +inf so argmax over valid picks the first valid token)
        score = jnp.where(valid, mindist, neg)
        idx = jnp.argmax(score, axis=1)                          # [P]
        tok = jnp.take_along_axis(df, idx[:, None, None], axis=1)  # [P, 1, D]
        picks = jax.lax.dynamic_update_slice(picks, tok, (0, j, 0))
        dist = jnp.sum(jnp.square(df - tok), axis=-1)            # [P, NT]
        return picks, jnp.minimum(mindist, dist)

    picks0 = jnp.zeros((p, k, dim), jnp.float32)
    mind0 = jnp.full((p, nt), jnp.float32(1e30))
    picks, _ = jax.lax.fori_loop(0, k, body, (picks0, mind0))
    return picks.astype(d.dtype)


def _coarse_scores(q: jax.Array, q_len: jax.Array, pooled: jax.Array,
                   d_lens: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Stage-1 pooled scores. ``pooled`` is [P, DIM] (mean pooling) or
    [P, K, DIM] (per-page centroids; score = max over centroids). Returns
    (coarse [P], qf [NQ,DIM] fp32, qmask)."""
    nq = q.shape[0]
    qf = q.astype(jnp.float32)
    qmask = (jnp.arange(nq) < q_len).astype(jnp.float32)
    qsum = jnp.einsum("qd,q->d", qf, qmask)
    if pooled.ndim == 3:
        coarse = jnp.max(jnp.einsum(
            "d,pkd->pk", qsum.astype(pooled.dtype), pooled,
            preferred_element_type=jnp.float32), axis=-1)
    else:
        coarse = jnp.einsum(
            "d,pd->p", qsum.astype(pooled.dtype), pooled,
            preferred_element_type=jnp.float32,
        )
    return jnp.where(d_lens > 0, coarse, MASK_VALUE), qf, qmask


def _exact_rescore(
    qf: jax.Array,          # [NQ, DIM] fp32
    qmask: jax.Array,       # [NQ]
    cand: jax.Array,        # [C] page indices into the local arrays
    d_int8: jax.Array,
    d_scale: jax.Array,
    d_lens: jax.Array,
    d_full: Optional[jax.Array],
) -> jax.Array:
    """Exact MaxSim of the candidate pages, in candidate order -> [C] fp32."""
    if d_full is not None:
        dc = jnp.take(d_full, cand, axis=0).astype(jnp.float32)   # [C, NT, DIM]
        sim = jnp.einsum("qd,ctd->cqt", qf, dc,
                         preferred_element_type=jnp.float32)
    else:
        dc = jnp.take(d_int8, cand, axis=0).astype(jnp.float32)
        sc = jnp.take(d_scale, cand, axis=0).astype(jnp.float32)  # [C, NT]
        sim = jnp.einsum("qd,ctd->cqt", qf, dc,
                         preferred_element_type=jnp.float32) * sc[:, None, :]
    lc = jnp.take(d_lens, cand, axis=0)
    nt = dc.shape[1]
    tok_valid = jnp.arange(nt)[None, None, :] < lc[:, None, None]
    sim = jnp.where(tok_valid, sim, MASK_VALUE)
    per_q = jnp.max(sim, axis=-1)                                 # [C, NQ]
    return jnp.einsum("cq,q->c", per_q, qmask)                    # [C]


@functools.partial(jax.jit, static_argnames=("k", "n_candidates"))
def two_stage_maxsim_topk(
    q: jax.Array,            # [NQ, DIM] single query's tokens (fp32/bf16)
    q_len: jax.Array,        # scalar int32
    pooled: jax.Array,       # [P, DIM] stage-1 page embeddings
    d_int8: jax.Array,       # [P, NT, DIM] int8 token codes
    d_scale: jax.Array,      # [P, NT] scales
    d_lens: jax.Array,       # [P] int32
    k: int = 5,
    n_candidates: int = 32,
    d_full: Optional[jax.Array] = None,  # [P, NT, DIM] bf16 originals
) -> Tuple[jax.Array, jax.Array]:
    """-> (scores [k], page indices [k]) for one query."""
    coarse, qf, qmask = _coarse_scores(q, q_len, pooled, d_lens)
    # lax.top_k (not the stable-tie variant): among equal coarse scores it
    # still returns the lower index first, and a full argsort of a 1M-wide
    # vector would dominate the query latency.
    _, cand = jax.lax.top_k(coarse, n_candidates)
    exact = _exact_rescore(qf, qmask, cand, d_int8, d_scale, d_lens, d_full)
    vals, order = topk_with_stable_ties(exact[None, :], k)
    return vals[0], jnp.take(cand, order[0])


def sharded_two_stage_maxsim_topk(
    mesh: Mesh,
    axis: str,
    q: jax.Array,            # [NQ, DIM] (replicated)
    q_len: jax.Array,        # scalar int32
    pooled: jax.Array,       # [P, DIM] sharded on pages
    d_int8: jax.Array,       # [P, NT, DIM] sharded on pages
    d_scale: jax.Array,      # [P, NT] sharded on pages
    d_lens: jax.Array,       # [P] sharded on pages
    k: int = 5,
    n_candidates: int = 32,
    d_full: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage MaxSim over a page-sharded corpus; bit-matches the
    single-device ``two_stage_maxsim_topk`` on the same (unsharded) corpus.

    Communication: one all-gather of ``min(C, P/S)`` (score, id) pairs per
    shard plus one pmax over the C exact candidate scores - O(C) over ICI,
    independent of corpus size. This is BASELINE config #5, the actual
    1M-page configuration (pooled prefilter AND corpus sharding together).
    """
    n_shards = mesh.shape[axis]
    p_total = pooled.shape[0]
    p_local = p_total // n_shards
    c_local = min(n_candidates, p_local)
    c_global = min(n_candidates, p_total)

    def local_fn(qq, ql, pl, di, ds, dl, *rest):
        df = rest[0] if rest else None
        shard_id = jax.lax.axis_index(axis)
        coarse, qf, qmask = _coarse_scores(qq, ql, pl, dl)
        lv, li = jax.lax.top_k(coarse, c_local)
        gid = li + shard_id * p_local
        gv = jax.lax.all_gather(lv, axis).reshape(-1)   # [S * c_local]
        gi = jax.lax.all_gather(gid, axis).reshape(-1)
        # Global top-C with lax.top_k's tie rule (lower global index wins):
        # stable sort by id, then stable sort by -score. Every id is unique,
        # so this reproduces top_k over the full coarse vector exactly.
        id_order = jnp.argsort(gi, stable=True)
        gv, gi = gv[id_order], gi[id_order]
        val_order = jnp.argsort(-gv, stable=True)
        cand_g = gi[val_order][:c_global]               # [C] global page ids

        # Stage 2: the owning shard rescores; others contribute -inf; pmax.
        start = shard_id * p_local
        owned = (cand_g >= start) & (cand_g < start + p_local)
        local_idx = jnp.clip(cand_g - start, 0, p_local - 1)
        exact = _exact_rescore(qf, qmask, local_idx, di, ds, dl, df)
        exact = jnp.where(owned, exact, NEG_INF)
        exact = jax.lax.pmax(exact, axis)               # [C], replicated

        vals, order = topk_with_stable_ties(exact[None, :], k)
        return vals[0], jnp.take(cand_g, order[0])

    spec_p = P(axis)
    in_specs = [P(), P(), spec_p, spec_p, spec_p, spec_p]
    args = [q, q_len, pooled, d_int8, d_scale, d_lens]
    if d_full is not None:
        in_specs.append(spec_p)
        args.append(d_full)
    fn = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=tuple(in_specs), out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(*args)


@functools.partial(jax.jit, static_argnames=("n_candidates",))
def coarse_topk(
    q: jax.Array,            # [NQ, DIM] one query's tokens
    q_len: jax.Array,        # scalar int32
    pooled: jax.Array,       # [P, DIM] or [P, K, DIM]
    d_lens: jax.Array,       # [P] int32 (0 = filtered/padded page)
    n_candidates: int = 32,
) -> jax.Array:
    """Stage 1 alone: the candidate page indices [n_candidates].

    The host-resident ("on_disk") corpus tier splits the two-stage search
    around a host gather: this function runs on device over the pooled
    index, the caller gathers the candidates' original token tensors from
    host memory (Qdrant's on_disk=True role, reference
    01_create_context_qdrant.py:217), and ``rescore_candidates`` finishes on
    device."""
    coarse, _, _ = _coarse_scores(q, q_len, pooled, d_lens)
    _, cand = jax.lax.top_k(coarse, n_candidates)
    return cand


@functools.partial(jax.jit, static_argnames=("k",))
def rescore_candidates(
    q: jax.Array,            # [NQ, DIM]
    q_len: jax.Array,        # scalar int32
    cand_pages: jax.Array,   # [C, NT, DIM] gathered original tokens
    cand_lens: jax.Array,    # [C] int32
    k: int = 5,
) -> Tuple[jax.Array, jax.Array]:
    """Stage 2 over host-gathered candidates -> (scores [k], positions [k]
    into the candidate axis; the caller maps positions to global ids)."""
    nq, nt = q.shape[0], cand_pages.shape[1]
    qf = q.astype(jnp.float32)
    qmask = (jnp.arange(nq) < q_len).astype(jnp.float32)
    sim = jnp.einsum("qd,ctd->cqt", qf, cand_pages.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    tok_valid = jnp.arange(nt)[None, None, :] < cand_lens[:, None, None]
    sim = jnp.where(tok_valid, sim, MASK_VALUE)
    exact = jnp.einsum("cq,q->c", jnp.max(sim, axis=-1), qmask)
    vals, order = topk_with_stable_ties(exact[None, :], k)
    return vals[0], order[0]


def build_two_stage_index(
    d: jax.Array, d_lens: jax.Array, n_centroids: int = 1
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(pooled, int8 codes, scales) from a bf16/fp32 token corpus.

    ``n_centroids > 1`` builds the farthest-point multi-token stage-1
    representation ([P, K, DIM]) instead of one mean vector per page."""
    from multimodal_colpali_tpu.ops.maxsim import quantize_corpus_int8

    if n_centroids > 1:
        pooled = pool_corpus_fps(d, d_lens, k=n_centroids)
    else:
        pooled = pool_corpus(d, d_lens)
    codes, scales = quantize_corpus_int8(d)
    return pooled, codes, scales
