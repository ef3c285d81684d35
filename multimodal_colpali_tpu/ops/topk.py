"""Top-k selection: stable tie handling and sharded (multi-chip) reduction.

Replaces Qdrant's server-side top-k over its HNSW/multivector index
(reference functions.py:893-926 ``client.query_points(limit=top_k)``) and the
in-memory ``scores.topk(top_k)`` (reference 05_experiment02.py:219).

Tie semantics: ``torch.topk`` on a sorted-stable backend returns, among equal
values, the lower index first. We reproduce that exactly by sorting on the
composite key (-value, index), so sharded and single-device results are
bit-identical and rankings can be compared one-to-one with the reference.

Sharded design (corpus axis over ICI): each chip holds a page shard, computes
local MaxSim scores with the Pallas kernel, selects a local top-k, and the
``k * n_shards`` candidates (score, global page id) are all-gathered over ICI
and reduced to the global top-k on every chip. Communication is O(k) per
chip, independent of corpus size.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from multimodal_colpali_tpu.ops import maxsim as maxsim_ops


def topk_with_stable_ties(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Top-k along the last axis; ties broken toward the lower index.

    Args:
      scores: ``[..., N]`` float scores.
      k: number of entries to keep (k <= N).

    Returns:
      (values ``[..., k]``, indices ``[..., k]`` int32), ordered by
      descending value then ascending index.
    """
    n = scores.shape[-1]
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), scores.shape)
    # Sort ascending on value; to get (desc value, asc index) flip the sign of
    # the value and sort the pair lexicographically via two stable sorts.
    neg = -scores.astype(jnp.float32)
    order = jnp.argsort(neg, axis=-1, stable=True)
    vals = jnp.take_along_axis(scores.astype(jnp.float32), order, axis=-1)
    inds = jnp.take_along_axis(idx, order, axis=-1)
    return vals[..., :k], inds[..., :k]


def _merge_candidates(vals: jax.Array, inds: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Reduce gathered per-shard candidates to the global top-k (stable)."""
    # Two-key stable sort: primary descending value, secondary ascending index.
    # argsort(stable) on -vals preserves ascending-index order among ties as
    # long as candidates are already laid out in ascending global-index order,
    # which the all-gather concat does NOT guarantee across shards - so sort
    # explicitly on the index first.
    idx_order = jnp.argsort(inds, axis=-1, stable=True)
    v = jnp.take_along_axis(vals, idx_order, axis=-1)
    i = jnp.take_along_axis(inds, idx_order, axis=-1)
    val_order = jnp.argsort(-v, axis=-1, stable=True)
    v = jnp.take_along_axis(v, val_order, axis=-1)
    i = jnp.take_along_axis(i, val_order, axis=-1)
    return v[..., :k], i[..., :k]


def sharded_maxsim_topk(
    mesh: Mesh,
    axis: str,
    q: jax.Array,
    d_sharded: jax.Array,
    d_lens_sharded: jax.Array,
    k: int,
    *,
    q_lens: Optional[jax.Array] = None,
    score_fn: Optional[Callable] = None,
    use_pallas: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """MaxSim + top-k over a corpus sharded on the page axis.

    Args:
      mesh: device mesh containing ``axis``.
      axis: mesh axis name the corpus page dimension is sharded over.
      q: ``[B, NQ, DIM]`` query tokens (replicated).
      d_sharded: ``[P, NT, DIM]`` corpus, sharded over pages (P divisible by
        the axis size; pad with d_lens=0 pages).
      d_lens_sharded: ``[P]`` per-page token counts, sharded likewise.
      k: global top-k.

    Returns:
      (values ``[B, k]``, global page indices ``[B, k]``), replicated.
    """
    n_shards = mesh.shape[axis]
    p_total = d_sharded.shape[0]
    p_local = p_total // n_shards

    if score_fn is None:
        def score_fn(qq, dd, ql, dl):
            return maxsim_ops.maxsim_scores(qq, dd, ql, dl, use_pallas=use_pallas)

    def local_fn(qq, ql, dd, dl):
        shard_id = jax.lax.axis_index(axis)
        scores = score_fn(qq, dd, ql, dl)  # [B, p_local]
        kk = min(k, p_local)
        lv, li = topk_with_stable_ties(scores, kk)
        li = li + shard_id * p_local  # globalize page ids
        if kk < k:  # pad so gathered width is k per shard
            pad_v = jnp.full(lv.shape[:-1] + (k - kk,), maxsim_ops.NEG_INF, lv.dtype)
            pad_i = jnp.full(li.shape[:-1] + (k - kk,), jnp.int32(2**31 - 1), li.dtype)
            lv = jnp.concatenate([lv, pad_v], axis=-1)
            li = jnp.concatenate([li, pad_i], axis=-1)
        gv = jax.lax.all_gather(lv, axis, axis=0)  # [S, B, k]
        gi = jax.lax.all_gather(li, axis, axis=0)
        gv = jnp.moveaxis(gv, 0, -2).reshape(lv.shape[:-1] + (n_shards * k,))
        gi = jnp.moveaxis(gi, 0, -2).reshape(li.shape[:-1] + (n_shards * k,))
        return _merge_candidates(gv, gi, k)

    spec_d = P(axis)
    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), spec_d, spec_d),
        out_specs=(P(), P()),
        check_vma=False,
    )
    if q_lens is None:
        q_lens = jnp.full((q.shape[0],), q.shape[1], dtype=jnp.int32)
    return fn(q, q_lens, d_sharded, d_lens_sharded)
